"""Frontier operators: 2-D skyline (Pareto-optimal rows) and
nearest-in-time event matching (SURVEY §2.2 extension; no counterpart
in the reference).

Both use the sorted-aggregate trick: reduce to a small keyed aggregate,
then resolve dominance / nearest with windows over THAT aggregate (the
skyline's price-group prefix-max generalizes to the bucketed two-phase
prefix pattern at extreme cardinalities, like q_pareto_gini).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.queries.base import register
from redis_streams_spark.queries.timeseries2 import (
    CLICK_PURCHASE_SQL,
    click_purchase_sides,
)
from redis_streams_spark.session import load_table

_MS = "unix_millis(cast(ts as timestamp))"
_NEAR_TOL_MS = 60 * 60_000

_SKYLINE_ORACLE = """
WITH p AS (
  SELECT p_partkey, p_retailprice AS price, p_size AS size FROM part
), gmax AS (
  SELECT price, max(size) AS gmax FROM p GROUP BY price
), cum AS (
  SELECT price, gmax,
         max(gmax) OVER (ORDER BY price
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS cum_strict
  FROM gmax
)
SELECT p.p_partkey, round(5e-10 + p.price, 2) AS price, p.size
FROM p JOIN cum ON cum.price = p.price
WHERE p.size = cum.gmax
  AND (cum.cum_strict IS NULL OR p.size > cum.cum_strict)
ORDER BY p.price, p.p_partkey
"""


@register("q_skyline_2d", shape="bounded", tags=("frontier", "skyline"), oracle=_SKYLINE_ORACLE)
def q_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline of parts: the Pareto frontier minimizing price while
    maximizing size (a part survives iff nothing is cheaper-or-equal AND
    bigger-or-equal with one strict) — the multi-criteria shortlist
    operator (Börzsönyi et al. ICDE'01).  Exact-duplicate (price, size)
    points all survive (neither dominates the other).

    Scale shape: dominance resolves against per-price-group maxima — a
    |distinct prices|-row aggregate — via a strict prefix-max window;
    the full table is only touched by one group-by and one broadcast-
    able re-join.  At extreme price cardinality the prefix-max switches
    to the bucketed two-phase pattern (bucket = monotone function of
    price, as in q_pareto_gini).

    Reference basis: none (published operator)."""
    part = load_table(spark, sf_dir, "part")
    p = part.select(
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").alias("size"),
    )
    gmax = p.groupBy("price").agg(F.max("size").alias("gmax"))
    cum = gmax.withColumn(
        "cum_strict",
        F.max("gmax").over(
            W.orderBy("price").rowsBetween(W.unboundedPreceding, -1)
        ),
    )
    return (
        p.join(F.broadcast(cum), "price")
        .where(
            (F.col("size") == F.col("gmax"))
            & (F.col("cum_strict").isNull() | (F.col("size") > F.col("cum_strict")))
        )
        .select(
            "p_partkey",
            rnd("price", 2).alias("price"),
            "size",
        )
        .orderBy("price", "p_partkey")
    )


_NEAREST_ORACLE = f"""
WITH {CLICK_PURCHASE_SQL}
SELECT p.event_id,
       coalesce((
         SELECT c.click_id FROM c
         WHERE c.k = p.k AND abs(c.cms - p.pms) <= {_NEAR_TOL_MS}
         ORDER BY abs(c.cms - p.pms), (c.cms > p.pms), c.click_id DESC
         LIMIT 1
       ), -1) AS nearest_click_id,
       coalesce((
         SELECT abs(c.cms - p.pms) FROM c
         WHERE c.k = p.k AND abs(c.cms - p.pms) <= {_NEAR_TOL_MS}
         ORDER BY abs(c.cms - p.pms), (c.cms > p.pms), c.click_id DESC
         LIMIT 1
       ), -1) AS abs_delta_ms
FROM p
ORDER BY p.event_id
"""


@register("q_nearest_event", shape="per_row", tags=("join", "nearest"), oracle=_NEAREST_ORACLE)
def q_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time match: each purchase pairs with its CLOSEST click
    either side within 1 h (pandas ``merge_asof(direction='nearest')``)
    — ties at equal distance prefer the earlier click, same-timestamp
    clicks pre-collapse to max event_id, no match emits the -1 sentinel
    (same transport encoding as q_asof_tolerance).

    Scale shape: ONE union+window pass ordered by (t, is_ref desc)
    computes the latest click at-or-before; a second window over the
    SAME partitioning ordered descending computes the earliest click
    after — two window functions, one shuffle on the user key, no
    self-join.  Oracle: correlated nearest-neighbor subquery with the
    identical ordering.

    Reference basis: none."""
    ev = load_table(spark, sf_dir, "events")
    clicks, purchases = click_purchase_sides(ev)
    merged = clicks.unionByName(purchases)
    wb = (
        W.partitionBy("k")
        .orderBy("t", F.desc("is_ref"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wf = (
        W.partitionBy("k")
        .orderBy(F.desc("t"), F.desc("is_ref"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    ref_t = F.when(F.col("is_ref") == 1, F.col("t"))
    scored = merged.select(
        "event_id",
        "is_ref",
        F.col("t").alias("pms"),
        F.last("click_id", ignorenulls=True).over(wb).alias("prev_click"),
        F.last(ref_t, ignorenulls=True).over(wb).alias("prev_cms"),
        F.last("click_id", ignorenulls=True).over(wf).alias("next_click"),
        F.last(ref_t, ignorenulls=True).over(wf).alias("next_cms"),
    ).where(F.col("is_ref") == 0)
    d_prev = F.col("pms") - F.col("prev_cms")  # >= 0 when present
    d_next = F.col("next_cms") - F.col("pms")  # >= 0 when present
    prev_ok = F.col("prev_cms").isNotNull() & (d_prev <= _NEAR_TOL_MS)
    next_ok = F.col("next_cms").isNotNull() & (d_next <= _NEAR_TOL_MS)
    # prefer 'before' on ties (d_prev <= d_next)
    use_prev = prev_ok & (~next_ok | (d_prev <= d_next))
    use_next = next_ok & ~use_prev
    return scored.select(
        "event_id",
        F.when(use_prev, F.col("prev_click"))
        .when(use_next, F.col("next_click"))
        .otherwise(F.lit(-1))
        .alias("nearest_click_id"),
        F.when(use_prev, d_prev)
        .when(use_next, d_next)
        .otherwise(F.lit(-1))
        .alias("abs_delta_ms"),
    )