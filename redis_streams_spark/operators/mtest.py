"""Multiple-testing corrections over bounded hypothesis families.

The engine's stats toolkit emits one p-value per group; these operators
decide which of the simultaneous claims survive.  Inputs are BOUNDED
frames (per-group aggregates, ≤ |groups| rows above an Aggregate), so
the empty-partition windows here are the gate-admitted shape — callers
must NOT feed per-row corpora.

Reference basis: none (SURVEY §2.2 extension surface); Benjamini &
Hochberg 1995.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd


def bh_stepup(
    df: DataFrame,
    p_col: str = "p_value",
    alpha: float = 0.05,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Benjamini-Hochberg step-up over a bounded family of p-values:
    rank ascending, compute per-rank thresholds rank·α/m, and reject
    EVERY hypothesis up to the LARGEST rank whose p ≤ threshold — note
    the step-up subtlety: a hypothesis whose own p exceeds its own
    threshold is still rejected when a later rank passes (that is what
    distinguishes BH from naive per-rank thresholding, and what the
    unit test pins).

    Adds ``bh_rank`` (ties broken by ``tie_cols`` for cross-engine
    determinism), ``bh_threshold`` (8 dp), and ``rejected``.  All three
    windows run over the input frame itself — callers pass per-group
    aggregates, never raw corpora."""
    order = [F.col(p_col)] + [F.col(c) for c in tie_cols]
    ranked = df.select(
        "*",
        F.row_number().over(W.orderBy(*order)).cast("long").alias("bh_rank"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("_m"),
    )
    thr = ranked.select(
        "*", rnd(F.col("bh_rank") * alpha / F.col("_m"), 8).alias("bh_threshold")
    )
    cut = thr.select(
        "*",
        F.max(
            F.when(F.col(p_col) <= F.col("bh_threshold"), F.col("bh_rank"))
        ).over(W.partitionBy()).alias("_cut_rank"),
    )
    return cut.select(
        *df.columns,
        "bh_rank",
        "bh_threshold",
        (F.col("bh_rank") <= F.coalesce(F.col("_cut_rank"), F.lit(0))).alias(
            "rejected"
        ),
    )
