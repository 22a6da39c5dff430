"""Event-time operators over the ``events`` stream table (SURVEY §2.2:
streaming windows / as-of & range joins — ABSENT in the reference, carried
by Spark built-ins; batch forms here, streaming forms in
redis_streams_spark.streaming).

All timestamps are reduced to epoch milliseconds (BIGINT) at the engine
boundary so Spark TIMESTAMP_NTZ and DuckDB TIMESTAMP never disagree on
rendering.  Spark side: ``unix_millis(cast(ts as timestamp))`` under the
UTC session pin; DuckDB side: ``epoch_ms(ts)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table
from redis_streams_spark.functions.rounding import rnd

_MS = "unix_millis(cast(ts as timestamp))"

SESSION_GAP_MS = 30 * 60 * 1000
SLIDE_MS = 3 * 3600 * 1000
WIDTH_MS = 6 * 3600 * 1000


@register(
    "q_tumbling_daily",
    shape="bounded",
    tags=("event-time", "window-agg"),
    bench=True,
    oracle="""
SELECT (epoch_ms(ts) // 86400000) * 86400000 AS day_start_ms,
       event_type,
       count(*) AS n_events,
       round(5e-10 + sum(value), 2) AS sum_value,
       round(5e-10 + avg(value), 4) AS avg_value,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM events
GROUP BY 1, 2
ORDER BY day_start_ms, event_type
""",
)
def q_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day event-time windows (batch form of the streaming
    window agg; partial agg per partition, shuffle carries days×types)."""
    ev = load_table(spark, sf_dir, "events")
    day_ms = (F.expr(_MS) / F.lit(86400000)).cast("long") * F.lit(86400000)
    return (
        ev.groupBy(day_ms.alias("day_start_ms"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 2).alias("sum_value"),
            rnd(F.avg("value"), 4).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("day_start_ms", "event_type")
    )


@register(
    "q_sliding_windows",
    shape="bounded",
    tags=("event-time", "window-agg"),
    oracle=f"""
WITH slots AS (
  SELECT unnest(generate_series(
           ((epoch_ms(ts) - {WIDTH_MS}) // {SLIDE_MS}) + 1,
           epoch_ms(ts) // {SLIDE_MS})) * {SLIDE_MS} AS win_start_ms,
         event_type, value
  FROM events
)
SELECT win_start_ms, event_type,
       count(*) AS n_events,
       round(5e-10 + sum(value), 2) AS sum_value
FROM slots
WHERE win_start_ms >= 0
GROUP BY win_start_ms, event_type
ORDER BY win_start_ms, event_type
""",
)
def q_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (6h width, 3h slide) in batch: each event explodes
    into the windows containing it — the same expansion Structured
    Streaming's window() performs, kept JVM-side via sequence+explode."""
    ev = load_table(spark, sf_dir, "events")
    ms = F.expr(_MS)
    lo = ((ms - F.lit(WIDTH_MS)) / F.lit(SLIDE_MS)).cast("long") + 1
    hi = (ms / F.lit(SLIDE_MS)).cast("long")
    return (
        ev.select(F.explode(F.sequence(lo, hi)).alias("slot"), "event_type", "value")
        .select(
            (F.col("slot") * F.lit(SLIDE_MS)).alias("win_start_ms"), "event_type", "value"
        )
        .where(F.col("win_start_ms") >= 0)
        .groupBy("win_start_ms", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), rnd(F.sum("value"), 2).alias("sum_value"))
        .orderBy("win_start_ms", "event_type")
    )


@register(
    "q_sessionize",
    shape="per_row",
    tags=("event-time", "session"),
    bench=True,
    oracle=f"""
WITH marked AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms, value,
         CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > {SESSION_GAP_MS}
              OR lag(epoch_ms(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ms, value,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ms, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
), per_session AS (
  SELECT user_id, session_id,
         count(*) AS n_events,
         max(ms) - min(ms) AS duration_ms,
         sum(value) AS session_value
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id,
       count(*) AS n_sessions,
       round(5e-10 + avg(n_events), 4) AS avg_events,
       max(duration_ms) AS max_duration_ms,
       round(5e-10 + sum(session_value), 2) AS total_value
FROM per_session
GROUP BY user_id
ORDER BY user_id
""",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + running sum of
    session starts — the batch analog of session_window(); windows are
    partitioned by user so no global sort exists at any scale."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(_MS).alias("ms"), "value", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ms", "event_id")
    marked = ev.withColumn(
        "is_start",
        F.when(
            (F.col("ms") - F.lag("ms").over(w) > SESSION_GAP_MS)
            | F.lag("ms").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("is_start").over(
            W.partitionBy("user_id")
            .orderBy("ms", "event_id")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ms") - F.min("ms")).alias("duration_ms"),
        F.sum("value").alias("session_value"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            rnd(F.avg("n_events"), 4).alias("avg_events"),
            F.max("duration_ms").alias("max_duration_ms"),
            rnd(F.sum("session_value"), 2).alias("total_value"),
        )
        # no presentation sort: one row per user (r08 verdict ask #3)
    )


@register(
    "q_asof_join",
    shape="per_row",
    tags=("join", "asof"),
    bench=True,
    oracle="""
WITH o AS (
  SELECT o_custkey % 150 AS k,
         epoch_ms(o_orderdate) AS oms,
         max(o_orderkey) AS o_orderkey,
         max(o_totalprice) AS o_totalprice
  FROM orders
  GROUP BY 1, 2
), e AS (
  SELECT event_id, user_id AS k,
         epoch_ms(ts) AS ems
  FROM events
)
SELECT e.event_id,
       -- -1 sentinel, not NULL: a NULL in a BIGINT column float-promotes
       -- the whole column in the pandas canonicalizer path and
       -- type-family-mismatches Spark's int64 (surfaces at sf>=0.1 where
       -- some events precede every order; sf0.01 has full coverage)
       coalesce(o.o_orderkey, -1) AS last_orderkey,
       round(5e-10 + o.o_totalprice, 2) AS last_totalprice
FROM e ASOF LEFT JOIN o ON e.k = o.k AND e.ems >= o.oms
ORDER BY e.event_id
""",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (latest order at-or-before each event, keyed by
    user_id↔custkey%150).  Spark lacks a native ASOF: this uses the
    scale-correct union+window pattern — interleave both sides on
    (key, time), then last_value(ignorenulls) — one shuffle on the key,
    no per-row Python, no broadcast of the big side.  Oracle: DuckDB's
    native ASOF LEFT JOIN.  Same-timestamp order ties are pre-collapsed
    with max() so both engines are deterministic."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            (F.col("o_custkey") % 150).alias("k"),
            F.expr("unix_millis(cast(o_orderdate as timestamp))").alias("oms"),
        )
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max("o_totalprice").alias("o_totalprice"),
        )
    )
    events = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("user_id").alias("k"), F.expr(_MS).alias("ems")
    )
    o_side = orders.select(
        "k",
        F.col("oms").alias("t"),
        F.lit(1).alias("is_order"),
        "o_orderkey",
        "o_totalprice",
        F.lit(None).cast("long").alias("event_id"),
    )
    e_side = events.select(
        "k",
        F.col("ems").alias("t"),
        F.lit(0).alias("is_order"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
        "event_id",
    )
    # orders sort before events at identical t (is_order desc) so an order
    # dated exactly at the event time matches (>= semantics)
    w = (
        W.partitionBy("k")
        .orderBy("t", F.desc("is_order"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    merged = o_side.unionByName(e_side).select(
        "event_id",
        "is_order",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("last_orderkey"),
        F.last("o_totalprice", ignorenulls=True).over(w).alias("last_totalprice"),
    )
    return (
        merged.where(F.col("is_order") == 0)
        .select(
            "event_id",
            # -1 sentinel for no-prior-order events (see oracle comment)
            F.coalesce("last_orderkey", F.lit(-1)).alias("last_orderkey"),
            rnd("last_totalprice", 2).alias("last_totalprice"),
        )
        # no presentation sort: one row per event (r08 verdict ask #3)
    )


@register(
    "q_range_join_bucketed",
    shape="per_row",
    tags=("join", "range"),
    oracle="""
WITH o AS (
  SELECT o_orderkey, epoch_ms(o_orderdate) AS oms
  FROM orders WHERE o_orderkey % 100 = 0
)
SELECT o.o_orderkey,
       count(l_orderkey) AS n_shipments,
       round(5e-10 + coalesce(sum(l_extendedprice), 0.0), 2) AS shipped_value
FROM o LEFT JOIN lineitem
  ON epoch_ms(l_shipdate) >= o.oms
 AND epoch_ms(l_shipdate) <  o.oms + 604800000
GROUP BY o.o_orderkey
ORDER BY o.o_orderkey
""",
)
def q_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (shipments in the week after each sampled order date)
    via week-bucketing: each probe row expands to its two candidate
    buckets, equi-join on bucket, exact range filter after.  Turns an
    O(n·m) theta join into an equi-join Catalyst can hash-partition —
    the 100 TB-safe plan.  Oracle: plain inequality join."""
    week = 604800000
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", F.expr("unix_millis(cast(o_orderdate as timestamp))").alias("oms"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_extendedprice",
        F.expr("unix_millis(cast(l_shipdate as timestamp))").alias("sms"),
    )
    # probe side: window [oms, oms+week) overlaps buckets floor(oms/week) and +1
    probes = orders.select(
        "o_orderkey",
        "oms",
        F.explode(
            F.array(
                (F.col("oms") / week).cast("long"),
                (F.col("oms") / week).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    build = li.withColumn("bucket", (F.col("sms") / week).cast("long"))
    matches = (
        probes.join(build, "bucket")
        .where((F.col("sms") >= F.col("oms")) & (F.col("sms") < F.col("oms") + week))
        .groupBy("o_orderkey")
        .agg(
            F.count("l_orderkey").alias("cnt"),
            F.sum("l_extendedprice").alias("val"),
        )
    )
    # join matches back to the full probe list so zero-match orders keep a
    # row (mirrors the oracle's LEFT JOIN-with-range-ON semantics)
    return (
        orders.select("o_orderkey")
        .join(matches, "o_orderkey", "left")
        .select(
            "o_orderkey",
            F.coalesce("cnt", F.lit(0).cast("long")).alias("n_shipments"),
            rnd(F.coalesce("val", F.lit(0.0)), 2).alias("shipped_value"),
        )
    )


@register(
    "q_interval_join",
    shape="bounded",
    tags=("join", "stream-semantics"),
    oracle="""
WITH c AS (
  SELECT event_id AS click_id, user_id, epoch_ms(ts) AS cms
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS pms
  FROM events WHERE event_type = 'purchase'
)
SELECT c.click_id, p.purchase_id, p.pms - c.cms AS gap_ms
FROM c JOIN p
  ON c.user_id = p.user_id
 AND p.pms >= c.cms
 AND p.pms <= c.cms + 3600000
ORDER BY click_id, purchase_id
""",
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the watermarked stream-stream interval join
    (tests/test_stream_stream_join.py): purchases within one hour after
    each click by the same user.  Identical join predicate — equi-key on
    user_id plus an event-time range — so the driver hash gate verifies
    the interval semantics the streaming test asserts shape-only.  The
    equi-key makes it a hash-partitioned join with the range as a
    post-filter; state at streaming scale is bounded by the watermark,
    here by the key cardinality."""
    ev = load_table(spark, sf_dir, "events")
    ms = F.expr(_MS)
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", ms.alias("cms")
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", ms.alias("pms")
    )
    return (
        clicks.join(
            buys,
            (clicks.user_id == buys.user_id)
            & (F.col("pms") >= F.col("cms"))
            & (F.col("pms") <= F.col("cms") + 3600000),
        )
        .select(
            "click_id", "purchase_id", (F.col("pms") - F.col("cms")).alias("gap_ms")
        )
        .orderBy("click_id", "purchase_id")
    )
