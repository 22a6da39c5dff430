"""streamsem queries — populated incrementally (see SURVEY.md §2)."""
