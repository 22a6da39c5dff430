"""QuerySpec registry plumbing shared by all query modules."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Plan-shape traits (r09-verdict ask #2: gate membership must be
# structural, declared at registration, not curated in hand lists a new
# query can silently skip).  Every registration declares a ``shape``
# string of "+"-joined traits; the fleet plan gates in tests/test_plans.py
# derive their query sets FROM these declarations and a registry CI test
# rejects any entry without one.
#
# Cardinality traits (exactly one required):
#   per_row  — output scales with the corpus (one row per document /
#              event / vector / candidate pair).  Gate: the plan must
#              contain NO global Sort (a presentation sort over per-row
#              output is a pure range-shuffle cost at 100 TB).
#   bounded  — output cardinality is fixed or group-bounded (scalar
#              reports, per-category/per-bucket frames); a trailing
#              presentation sort is acceptable.
# Optional trait:
#   prefix_sum — the query is built on the bucketed two-phase prefix sum
#              (operators/prefix.py); its plan must contain ZERO
#              empty-partition windows of any kind (stronger than the
#              fleet-wide aggregate-guard).
_CARDINALITY_TRAITS = frozenset({"per_row", "bounded"})
_OPTIONAL_TRAITS = frozenset({"prefix_sum"})
VALID_TRAITS = _CARDINALITY_TRAITS | _OPTIONAL_TRAITS


def _parse_shape(name: str, shape: str) -> frozenset[str]:
    traits = frozenset(t.strip() for t in shape.split("+") if t.strip())
    unknown = traits - VALID_TRAITS
    if unknown:
        raise ValueError(f"{name}: unknown shape traits {sorted(unknown)}")
    card = traits & _CARDINALITY_TRAITS
    if len(card) != 1:
        raise ValueError(
            f"{name}: shape must declare exactly one of "
            f"{sorted(_CARDINALITY_TRAITS)}, got {shape!r}"
        )
    return traits


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    shape: frozenset[str] = frozenset()  # plan-shape traits, see above


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    shape: str = "",
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            tags=tags,
            doc=fn.__doc__ or "",
            bench=bench,
            shape=_parse_shape(name, shape) if shape else frozenset(),
        )
        return fn

    return deco


REGISTRY: dict[str, QuerySpec] = {}
