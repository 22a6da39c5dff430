"""Reusable DataFrame-level operators (dedup, similarity, text,
multimodal) — composable transformers designed partition-parallel for
100 TB posture: no driver-side collection, no per-row Python where a
built-in exists."""
