"""Physical-plan inspection helpers: the ".explain and iterate" loop
(assert pushdown / broadcast / codegen properties in tests instead of
eyeballing)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_str(df) or "BroadcastNestedLoopJoin" in plan_str(
        df
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan in the plan."""
    out: list[str] = []
    for line in plan_str(df).splitlines():
        if "PushedFilters:" in line:
            out.append(line.split("PushedFilters:", 1)[1].strip())
    return out


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — verifies column pruning."""
    out: list[str] = []
    for line in plan_str(df).splitlines():
        if "ReadSchema:" in line:
            out.append(line.split("ReadSchema:", 1)[1].strip())
    return out


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (pre-AQE plan)."""
    return plan_str(df, mode="codegen").count("WholeStageCodegen subtree")


def _iter_logical_nodes(jplan):
    yield jplan
    children = jplan.children()
    for i in range(children.size()):
        yield from _iter_logical_nodes(children.apply(i))


# Nodes that BOUND their output cardinality regardless of input size —
# everything flowing up from one of these is aggregate/limit-sized, not
# corpus-sized.
_BOUNDING_NODES = {"Aggregate", "GlobalLimit", "LocalLimit", "Deduplicate"}


def _is_bounded(jplan) -> bool:
    """True when EVERY leaf-to-here path passes through a bounding node:
    a join/union is bounded only if all of its branches are.  (Checking
    for 'any Aggregate in the subtree' would wave through the common
    raw_rows.crossJoin(broadcast(scalar_agg)) shape, whose row count is
    still the raw side's — review finding, round 6.)"""
    if jplan.getClass().getSimpleName() in _BOUNDING_NODES:
        return True
    children = jplan.children()
    n = children.size()
    if n == 0:
        return False  # a leaf relation: corpus-sized
    return all(_is_bounded(children.apply(i)) for i in range(n))


def unguarded_global_windows(df: DataFrame) -> list[str]:
    """Window nodes with an EMPTY partition spec whose input is not
    cardinality-bounded — the shape that serializes all raw rows
    through one task at 100 TB.

    Unpartitioned windows are legitimate ONLY above a bounded input
    (hour buckets, k centroids, top-N terms: the documented two-phase
    prefix-sum pattern, where phase 1 shrank the data to |groups| rows).
    Walks the OPTIMIZED logical plan: for each ``Window`` with
    ``partitionSpec().isEmpty()``, requires every leaf path below it to
    cross an Aggregate/Limit/Deduplicate.  Returns a description per
    violation (empty list = clean).
    """
    out: list[str] = []
    root = df._jdf.queryExecution().optimizedPlan()
    for node in _iter_logical_nodes(root):
        if node.getClass().getSimpleName() != "Window":
            continue
        if node.partitionSpec().isEmpty() and not _is_bounded(node):
            out.append(node.simpleString(120))
    return out


def global_windows(df: DataFrame) -> list[str]:
    """EVERY Window node with an empty partition spec, bounded input or
    not — the strict form for queries rewritten on the bucketed
    two-phase prefix sum (operators/prefix.py), whose whole point is
    that no single-task window exists in the plan at all.  The
    aggregate-guard of :func:`unguarded_global_windows` is necessary but
    not sufficient when the aggregate's key is a CONTINUOUS column
    (distinct-score cardinality grows with corpus size — round-8 verdict
    finding on q_roc_auc/q_pr_curve)."""
    out: list[str] = []
    root = df._jdf.queryExecution().optimizedPlan()
    for node in _iter_logical_nodes(root):
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
        ):
            out.append(node.simpleString(120))
    return out


def global_sorts(df: DataFrame) -> list[str]:
    """Global Sort nodes in the optimized logical plan (``global=true``
    — the ones that become a rangepartitioning exchange).  Used by the
    trailing-sort gate: per-row-output queries must not end in a
    presentation sort, because the driver's oracle compare is
    order-insensitive and a range shuffle of per-row output is pure cost
    at 100 TB."""
    out: list[str] = []
    root = df._jdf.queryExecution().optimizedPlan()
    for node in _iter_logical_nodes(root):
        if node.getClass().getSimpleName() == "Sort" and getattr(
            node, "global"
        )():
            out.append(node.simpleString(120))
    return out
