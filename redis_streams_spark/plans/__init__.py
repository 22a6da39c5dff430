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
