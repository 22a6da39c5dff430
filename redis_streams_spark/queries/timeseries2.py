"""Second wave of event-time operators over ``events`` (SURVEY §2.2
extension; none of these exist in the reference — it delegates all
payload analytics to user callbacks, `/root/reference/redis_streams/
consumer.py` hands raw dicts to a processing callback).

Timestamp convention matches queries/timeseries.py: epoch milliseconds
(BIGINT) at the engine boundary — Spark ``unix_millis(cast(ts as
timestamp))`` under the UTC session pin, DuckDB ``epoch_ms(ts)``.

The headline scale pattern in this module is the TWO-PHASE DISTRIBUTED
PREFIX SUM (q_concurrency_curve): a running total over a global time
order is computed without a global single-task sort by (1) bucketing
time, (2) a per-bucket windowed running sum (parallel across buckets),
(3) a tiny bucket-level exclusive-prefix offset joined back.  The only
unpartitioned window runs over the bucket aggregate — |buckets| rows,
thousands at most at 100 TB — never over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_MS = "unix_millis(cast(ts as timestamp))"
_HOUR_MS = 3_600_000
_BAR_MS = 6 * _HOUR_MS
_DECAY_TAU_MS = 7 * 86_400_000.0
_ASOF_TOL_MS = 30 * 60_000


@register(
    "q_concurrency_curve",
    shape="bounded",
    tags=("event-time", "prefix-sum"),
    oracle=f"""
WITH iv AS (
  SELECT epoch_ms(ts) AS s,
         epoch_ms(ts) + CAST(floor(value * 1000) AS BIGINT) AS e
  FROM events
), deltas AS (
  SELECT s AS ms, 1 AS d FROM iv
  UNION ALL
  SELECT e AS ms, -1 AS d FROM iv
), per_ms AS (
  SELECT ms, sum(d) AS d FROM deltas GROUP BY ms
), run AS (
  SELECT ms,
         sum(d) OVER (ORDER BY ms ROWS UNBOUNDED PRECEDING) AS conc
  FROM per_ms
)
SELECT (ms // {_HOUR_MS}) * {_HOUR_MS} AS hour_start_ms,
       max(conc)::BIGINT AS max_concurrent,
       min(conc)::BIGINT AS min_concurrent,
       count(*) AS n_boundaries
FROM run
GROUP BY 1
ORDER BY hour_start_ms
""",
)
def q_concurrency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-interval curve (sweep line): each event is an interval
    [ts, ts + value seconds); emit per hour the max/min number of
    simultaneously active intervals, evaluated after each boundary.

    Scale shape — distributed prefix sum: a naive running sum over the
    global boundary order is a single-task window.  Instead boundaries
    are bucketed by hour; phase 1 computes the running sum WITHIN each
    bucket (window partitioned by bucket — parallel), phase 2 computes
    each bucket's starting offset as the exclusive prefix of per-bucket
    delta totals (an unpartitioned window over |buckets| aggregated
    rows only), joined back by bucket key.  ``floor(value*1000)`` (not
    a cast) for the duration: Spark's double→long cast truncates while
    DuckDB's rounds, floor is identical on both.

    Reference basis: none (no interval analytics in redis-streams)."""
    ev = load_table(spark, sf_dir, "events")
    ms = F.expr(_MS)
    iv = ev.select(
        ms.alias("s"),
        (ms + F.floor(F.col("value") * 1000).cast("long")).alias("e"),
    )
    deltas = iv.select(F.col("s").alias("ms"), F.lit(1).alias("d")).unionAll(
        iv.select(F.col("e").alias("ms"), F.lit(-1).alias("d"))
    )
    per_ms = (
        deltas.groupBy("ms")
        .agg(F.sum("d").alias("d"))
        .withColumn("bucket", (F.col("ms") / _HOUR_MS).cast("long"))
    )
    # phase 1: parallel running sum within each hour bucket
    local = per_ms.withColumn(
        "local_run",
        F.sum("d").over(
            W.partitionBy("bucket").orderBy("ms").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    # phase 2: exclusive-prefix offsets over the tiny bucket aggregate
    # (the ONLY unpartitioned window — |buckets| rows, not |events|)
    btot = per_ms.groupBy("bucket").agg(F.sum("d").alias("bd"))
    offsets = btot.select(
        "bucket",
        F.coalesce(
            F.sum("bd").over(
                W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("off"),
    )
    conc = local.join(F.broadcast(offsets), "bucket").select(
        "bucket", "ms", (F.col("local_run") + F.col("off")).alias("conc")
    )
    return (
        conc.groupBy((F.col("bucket") * _HOUR_MS).alias("hour_start_ms"))
        .agg(
            F.max("conc").alias("max_concurrent"),
            F.min("conc").alias("min_concurrent"),
            F.count(F.lit(1)).alias("n_boundaries"),
        )
        .orderBy("hour_start_ms")
    )


@register(
    "q_decay_score",
    shape="per_row",
    tags=("event-time", "decay"),
    oracle=f"""
WITH mx AS (
  SELECT max(epoch_ms(ts)) AS tmax FROM events
)
SELECT user_id,
       count(*) AS n_events,
       round(5e-10 + sum(value * exp(-(mx.tmax - epoch_ms(ts)) / {_DECAY_TAU_MS})), 4)
         AS decayed_score
FROM events, mx
GROUP BY user_id
ORDER BY user_id
""",
)
def q_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay engagement score per user: newer activity
    counts more (tau = 7 days, anchored at the corpus max timestamp).

    Scale shape: the anchor is a 1-row aggregate broadcast into the scan
    projection (BroadcastNestedLoopJoin over a scalar — the cheap plan);
    the decay itself is a pure JVM expression folded into one
    map-side-combined aggregation, a single shuffle of |users| rows.

    Reference basis: none."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.expr(_MS)).alias("tmax"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(
                F.sum(
                    F.col("value")
                    * F.exp(-(F.col("tmax") - F.expr(_MS)) / F.lit(_DECAY_TAU_MS))
                ),
                4,
            ).alias("decayed_score"),
        )
    )


@register(
    "q_time_weighted_avg",
    shape="per_row",
    tags=("event-time", "twa"),
    oracle="""
WITH seq AS (
  SELECT user_id, value, epoch_ms(ts) AS ms,
         lead(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_ms
  FROM events
)
SELECT user_id,
       count(next_ms) AS n_intervals,
       round(5e-10 + sum(value * (next_ms - ms)) / sum(next_ms - ms), 4)
         AS time_weighted_avg,
       round(5e-10 + avg(CASE WHEN next_ms IS NOT NULL THEN value END), 4)
         AS plain_avg
FROM seq
WHERE next_ms IS NOT NULL
GROUP BY user_id
ORDER BY user_id
""",
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user (last-point-hold interpolation):
    each observation holds until the next one, weighted by the hold
    duration — the hypertable/metrics-engine TWA, which a plain avg gets
    wrong under irregular sampling (plain_avg is emitted alongside so
    the difference is visible).

    Scale shape: one window partitioned by user_id (the natural
    distribution key) for lead(), then one map-side-combined agg — no
    global sort, no unpartitioned window.

    Reference basis: none."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        F.expr(_MS).alias("ms"),
        F.lead(F.expr(_MS)).over(w).alias("next_ms"),
    ).where(F.col("next_ms").isNotNull())
    dur = F.col("next_ms") - F.col("ms")
    return (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            rnd(F.sum(F.col("value") * dur) / F.sum(dur), 4).alias(
                "time_weighted_avg"
            ),
            rnd(F.avg("value"), 4).alias("plain_avg"),
        )
    )


@register(
    "q_ohlc_bars",
    shape="bounded",
    tags=("event-time", "ohlc"),
    oracle=f"""
WITH r AS (
  SELECT event_type,
         (epoch_ms(ts) // {_BAR_MS}) * {_BAR_MS} AS bar_start_ms,
         value,
         row_number() OVER (PARTITION BY event_type, epoch_ms(ts) // {_BAR_MS}
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, epoch_ms(ts) // {_BAR_MS}
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, bar_start_ms,
       round(5e-10 + max(CASE WHEN rn_a = 1 THEN value END), 2) AS open,
       round(5e-10 + max(value), 2) AS high,
       round(5e-10 + min(value), 2) AS low,
       round(5e-10 + max(CASE WHEN rn_d = 1 THEN value END), 2) AS close,
       count(*) AS n_ticks
FROM r
GROUP BY event_type, bar_start_ms
ORDER BY event_type, bar_start_ms
""",
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars (6 h) per event_type: open/close are the
    first/last tick by (ts, event_id) — the kdb/TimescaleDB downsampling
    primitive for plotting and feature extraction.

    Scale shape: windows partitioned by (event_type, bar) — the same key
    the final agg shuffles on, so AQE coalesces to one exchange; open and
    close resolve by deterministic row_number rather than min_by on a
    timestamp (duplicate-timestamp ties would be engine-dependent).

    Reference basis: none."""
    ev = load_table(spark, sf_dir, "events")
    bar = (F.expr(_MS) / _BAR_MS).cast("long")
    base = ev.select(
        "event_type", bar.alias("barno"), "value", "ts", "event_id"
    )
    wa = W.partitionBy("event_type", "barno").orderBy("ts", "event_id")
    wd = W.partitionBy("event_type", "barno").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    r = base.select(
        "event_type",
        (F.col("barno") * _BAR_MS).alias("bar_start_ms"),
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return (
        r.groupBy("event_type", "bar_start_ms")
        .agg(
            rnd(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 2).alias("open"),
            rnd(F.max("value"), 2).alias("high"),
            rnd(F.min("value"), 2).alias("low"),
            rnd(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 2).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .orderBy("event_type", "bar_start_ms")
    )




# Shared by q_asof_tolerance and queries/frontier.py::q_nearest_event:
# the click reference side (same-timestamp ties pre-collapsed to max
# event_id) and the purchase probe side, shaped for the union+window
# as-of pattern.  SQL twin below mirrors it for both oracles.
CLICK_PURCHASE_SQL = """c AS (
  SELECT user_id AS k, epoch_ms(ts) AS cms, max(event_id) AS click_id
  FROM events WHERE event_type = 'click'
  GROUP BY 1, 2
), p AS (
  SELECT event_id, user_id AS k, epoch_ms(ts) AS pms
  FROM events WHERE event_type = 'purchase'
)"""


def click_purchase_sides(ev: DataFrame) -> tuple[DataFrame, DataFrame]:
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy(F.col("user_id").alias("k"), F.expr(_MS).alias("t"))
        .agg(F.max("event_id").alias("click_id"))
        .select("k", "t", F.lit(1).alias("is_ref"), "click_id",
                F.lit(None).cast("long").alias("event_id"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"),
        F.expr(_MS).alias("t"),
        F.lit(0).alias("is_ref"),
        F.lit(None).cast("long").alias("click_id"),
        "event_id",
    )
    return clicks, purchases


@register(
    "q_asof_tolerance",
    shape="per_row",
    tags=("join", "asof"),
    oracle=f"""
WITH {CLICK_PURCHASE_SQL}
SELECT p.event_id,
       coalesce(CASE WHEN p.pms - c.cms <= {_ASOF_TOL_MS} THEN c.click_id END,
                -1) AS matched_click_id,
       coalesce(CASE WHEN p.pms - c.cms <= {_ASOF_TOL_MS} THEN p.pms - c.cms END,
                -1) AS staleness_ms
FROM p ASOF LEFT JOIN c ON p.k = c.k AND p.pms >= c.cms
ORDER BY p.event_id
""",
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance bound: each purchase matches the
    latest click at-or-before it (per user) ONLY if that click is within
    30 minutes — older matches are nulled out (the pandas
    ``merge_asof(..., tolerance=)`` / kdb ``wj`` semantics; prevents
    stale state leaking into attribution features).

    Scale shape: same union+window as q_asof_join (one shuffle on the
    user key, no broadcast of either side); the tolerance is a
    post-window expression, so it adds zero extra shuffles.
    Same-timestamp click ties are pre-collapsed with max(event_id) and a
    click dated exactly at the purchase time matches (>= semantics, ref
    rows sort first at equal t).  Oracle: DuckDB native ASOF with the
    same CASE guard.

    Reference basis: none."""
    ev = load_table(spark, sf_dir, "events")
    clicks, purchases = click_purchase_sides(ev)
    w = (
        W.partitionBy("k")
        .orderBy("t", F.desc("is_ref"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    merged = clicks.unionByName(purchases).select(
        "event_id",
        "is_ref",
        F.col("t").alias("pms"),
        F.last("click_id", ignorenulls=True).over(w).alias("last_click"),
        F.last(
            F.when(F.col("is_ref") == 1, F.col("t")), ignorenulls=True
        ).over(w).alias("last_cms"),
    )
    stale = F.col("pms") - F.col("last_cms")
    within = stale <= _ASOF_TOL_MS
    return (
        merged.where(F.col("is_ref") == 0)
        .select(
            "event_id",
            F.coalesce(F.when(within, F.col("last_click")), F.lit(-1)).alias(
                "matched_click_id"
            ),
            F.coalesce(F.when(within, stale), F.lit(-1)).alias("staleness_ms"),
        )
    )
