"""Round-8 analytics wave: watermark-delay sizing, seasonality
strength, and position-based multi-touch attribution.

Reference basis: none (SURVEY §2.2 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.hashing import h32, h32_sql
from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_MS = "unix_millis(cast(ts as timestamp))"
_JITTER_MS = 600_000  # synthetic network delay bound: 10 minutes


def _watermark_oracle() -> str:
    jit = f"{h32_sql('event_id::VARCHAR')} % {_JITTER_MS}"
    return f"""
WITH arr AS (
  SELECT event_type,
         epoch_ms(ts) AS ms,
         epoch_ms(ts) + {jit} AS arrival_ms,
         ((epoch_ms(ts) // 86400000) + 1) * 86400000 AS win_end_ms
  FROM events
), late AS (
  SELECT event_type,
         greatest(arrival_ms - win_end_ms, 0) AS late_ms,
         CASE WHEN arrival_ms > win_end_ms THEN 1 ELSE 0 END AS is_late
  FROM arr
)
SELECT event_type,
       count(*)::BIGINT AS n_events,
       sum(is_late)::BIGINT AS n_late,
       {rnd_sql('avg(is_late)', 6)} AS frac_late,
       {rnd_sql('quantile_cont(late_ms::DOUBLE, 0.95)', 2)} AS late_p95_ms,
       {rnd_sql('quantile_cont(late_ms::DOUBLE, 0.99)', 2)} AS late_p99_ms,
       max(late_ms)::BIGINT AS late_max_ms
FROM late
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_watermark_sizing",
    shape="bounded",
    tags=("streaming", "event-time", "watermark"),
    oracle=_watermark_oracle(),
)
def q_watermark_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-delay sizing audit: under a deterministic hash-jittered
    arrival model (event arrives up to 10 min after its event time —
    testdata arrivals are perfectly ordered, so disorder is synthesized
    through the shared md5 hash), how late past its daily window close
    does each event land?  late_p99_ms is the number you'd set
    ``withWatermark`` to; frac_late is what a zero-delay watermark would
    drop.  No sequential running-max: lateness is computed against the
    event's OWN window close, so the whole audit is one scan + one
    aggregate — the shape that survives any scale."""
    ev = load_table(spark, sf_dir, "events")
    ms = F.expr(_MS)
    jit = h32(F.col("event_id").cast("string")) % _JITTER_MS
    win_end = ((ms / F.lit(86400000)).cast("long") + 1) * F.lit(86400000)
    late_ms = F.greatest(ms + jit - win_end, F.lit(0))
    late = ev.select(
        "event_type",
        late_ms.alias("late_ms"),
        F.when(ms + jit > win_end, 1).otherwise(0).alias("is_late"),
    )
    return (
        late.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("is_late").alias("n_late"),
            rnd(F.avg("is_late"), 6).alias("frac_late"),
            rnd(F.expr("percentile(late_ms * 1.0, 0.95)"), 2).alias("late_p95_ms"),
            rnd(F.expr("percentile(late_ms * 1.0, 0.99)"), 2).alias("late_p99_ms"),
            F.max("late_ms").alias("late_max_ms"),
        )
        .orderBy("event_type")
    )


def _seasonality_oracle() -> str:
    return f"""
WITH daily AS (
  SELECT event_type, epoch_ms(ts) // 86400000 AS day, avg(value) AS v
  FROM events GROUP BY 1, 2
), wd AS (
  SELECT event_type, day, v, day % 7 AS weekday,
         avg(v) OVER (PARTITION BY event_type, day % 7) AS wd_mean
  FROM daily
)
SELECT event_type,
       count(*)::BIGINT AS n_days,
       {rnd_sql('var_pop(v)', 6)} AS var_total,
       {rnd_sql('var_pop(v - wd_mean)', 6)} AS var_resid,
       {rnd_sql('greatest(0.0, 1.0 - var_pop(v - wd_mean) / var_pop(v))', 6)}
         AS seasonal_strength
FROM wd
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "q_seasonality_strength",
    shape="bounded",
    tags=("timeseries", "seasonality", "stats"),
    oracle=_seasonality_oracle(),
)
def q_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality strength per event type: 1 - Var(residual)/
    Var(series) after removing the weekday-mean component (the STL
    strength statistic on the cheap weekday decomposition q_seasonal_
    profile/residual use).  Near 1 = strongly weekly, near 0 = none.
    Everything after the daily aggregate is windows over <= n_days rows
    per type."""
    ev = load_table(spark, sf_dir, "events")
    day = (F.expr(_MS) / F.lit(86400000)).cast("long")
    daily = ev.groupBy(F.col("event_type"), day.alias("day")).agg(
        F.avg("value").alias("v")
    )
    wd = daily.withColumn(
        "wd_mean",
        F.avg("v").over(W.partitionBy("event_type", F.col("day") % 7)),
    )
    resid = F.col("v") - F.col("wd_mean")
    return (
        wd.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            rnd(F.var_pop("v"), 6).alias("var_total"),
            rnd(F.var_pop(resid), 6).alias("var_resid"),
            rnd(
                F.greatest(
                    F.lit(0.0), 1.0 - F.var_pop(resid) / F.var_pop("v")
                ),
                6,
            ).alias("seasonal_strength"),
        )
        .orderBy("event_type")
    )


def _position_attr_oracle() -> str:
    return """
WITH seq AS (
  SELECT user_id, event_id, event_type, value, epoch_ms(ts) AS ms,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS purchases_before
  FROM events
), journeys AS (
  SELECT user_id, event_id, event_type, ms,
         coalesce(purchases_before, 0) + 1 AS journey
  FROM seq WHERE event_type <> 'purchase'
), convs AS (
  SELECT user_id, value,
         coalesce(purchases_before, 0) + 1 AS journey
  FROM seq WHERE event_type = 'purchase'
), sized AS (
  SELECT j.user_id, j.journey, j.event_type,
         row_number() OVER (PARTITION BY j.user_id, j.journey
                            ORDER BY j.ms, j.event_id) AS pos,
         count(*) OVER (PARTITION BY j.user_id, j.journey) AS n_touches
  FROM journeys j
), credited AS (
  SELECT s.event_type,
         c.value * (CASE
           WHEN s.n_touches = 1 THEN 1.0
           WHEN s.n_touches = 2 THEN 0.5
           WHEN s.pos = 1 THEN 0.4
           WHEN s.pos = s.n_touches THEN 0.4
           ELSE 0.2 / (s.n_touches - 2)
         END) AS credit
  FROM sized s
  JOIN convs c ON c.user_id = s.user_id AND c.journey = s.journey
)
SELECT event_type AS channel,
       count(*)::BIGINT AS n_touches,
       round(5e-10 + sum(credit), 2) AS attributed_value
FROM credited
GROUP BY event_type
ORDER BY channel
"""


@register(
    "q_attribution_position",
    shape="bounded",
    tags=("attribution", "funnel", "window"),
    oracle=_position_attr_oracle(),
)
def q_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped 40/20/40) multi-touch attribution: each
    purchase's value splits 40% to the journey's first touch, 40% to the
    last, 20% evenly across the middle (solo touch 100%, two touches
    50/50).  A touch belongs to the journey ending at the user's NEXT
    purchase (running purchase count partitions the stream into
    journeys).  Complements q_attribution's single-touch first/last
    models with the fractional-credit algebra.  Scale shape: per-user
    windows (parallel in user_id) + one journey-keyed equi-join + a
    channel-cardinality aggregate."""
    ev = load_table(spark, sf_dir, "events")
    wseq = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    seq = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.expr("unix_millis(cast(ts as timestamp))").alias("ms"),
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).over(wseq),
            F.lit(0),
        ).alias("purchases_before"),
    ).withColumn("journey", F.col("purchases_before") + 1)
    journeys = seq.where(F.col("event_type") != "purchase")
    convs = seq.where(F.col("event_type") == "purchase").select(
        "user_id", "journey", "value"
    )
    wj = W.partitionBy("user_id", "journey")
    sized = journeys.select(
        "user_id",
        "journey",
        "event_type",
        F.row_number().over(wj.orderBy("ms", "event_id")).alias("pos"),
        F.count(F.lit(1)).over(wj).alias("n_touches"),
    )
    weight = (
        F.when(F.col("n_touches") == 1, 1.0)
        .when(F.col("n_touches") == 2, 0.5)
        .when(F.col("pos") == 1, 0.4)
        .when(F.col("pos") == F.col("n_touches"), 0.4)
        .otherwise(F.lit(0.2) / (F.col("n_touches") - 2))
    )
    credited = sized.join(convs, ["user_id", "journey"]).select(
        "event_type", (F.col("value") * weight).alias("credit")
    )
    return (
        credited.groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            rnd(F.sum("credit"), 2).alias("attributed_value"),
        )
        .orderBy("channel")
    )
