"""Query registry: every operator exposed as (Spark callable, DuckDB oracle).

Each module registers :class:`QuerySpec` entries via :func:`register`.
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this
registry.
"""

from __future__ import annotations

from redis_streams_spark.queries.base import REGISTRY, QuerySpec, register  # noqa: F401


def _load_all() -> None:
    # import for side effect: each module populates REGISTRY
    from redis_streams_spark.queries import (  # noqa: F401
        cdc,
        contamination,
        decimalsem,
        dedup,
        formats,
        llmprep,
        mixing,
        multimodal,
        nullsem,
        pipelines,
        pyudf,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        scale,
        similarity,
        streamsem,
        text,
        timeseries,
    )


def all_queries() -> dict[str, QuerySpec]:
    _load_all()
    return dict(REGISTRY)
