"""Round-6 time-series operators: seasonal residuals, inter-arrival
percentiles, year-over-year growth, rolling correlation, activity
streaks.

All heavy lifting is keyed aggregation; every window is either
partitioned by a high-cardinality key (user) or runs over an already
day/month-bounded aggregate — the two shapes the fleet plan gate
accepts.  Reference basis: none (redis-streams has no analytics
surface); these are the standard observability/BI primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_MS = "unix_millis(cast(ts as timestamp))"
_US = "unix_micros(cast(ts as timestamp))"
_DAY_MS = 86_400_000
_HOUR_MS = 3_600_000


@register(
    "q_seasonal_residual",
    shape="bounded",
    tags=("timeseries", "seasonality", "anomaly"),
    oracle=f"""
WITH g AS (
  SELECT event_type,
         (epoch_ms(ts) // {_DAY_MS}) * {_DAY_MS} AS day_ms,
         (epoch_ms(ts) % {_DAY_MS}) // {_HOUR_MS} AS hour,
         value
  FROM events
), actual AS (
  SELECT event_type, day_ms, hour, count(*) AS n, avg(value) AS actual
  FROM g GROUP BY 1, 2, 3
), profile AS (
  SELECT event_type, hour, avg(value) AS expected
  FROM g GROUP BY 1, 2
)
SELECT a.event_type, a.day_ms, a.hour, a.n,
       {rnd_sql('a.actual', 4)} AS actual,
       {rnd_sql('p.expected', 4)} AS expected,
       {rnd_sql('a.actual - p.expected', 4)} AS residual
FROM actual a JOIN profile p
  ON a.event_type = p.event_type AND a.hour = p.hour
ORDER BY a.event_type, a.day_ms, a.hour
""",
)
def q_seasonal_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted residuals: each (event_type, day, hour)
    cell's actual mean value minus the corpus-wide hour-of-day profile
    for that type — the de-seasonalized signal anomaly detectors should
    threshold instead of the raw value (q_seasonal_profile's companion:
    that query builds the profile, this one applies it).

    Scale shape: two partial-aggregated shuffles over the same scan
    (hourly cells; 24-cell profile per type) and an equi-join on
    (type, hour) where the profile side broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    ms = F.expr(_MS)
    g = ev.select(
        "event_type",
        ((ms / _DAY_MS).cast("long") * _DAY_MS).alias("day_ms"),
        ((ms % _DAY_MS) / _HOUR_MS).cast("long").alias("hour"),
        "value",
    )
    actual = g.groupBy("event_type", "day_ms", "hour").agg(
        F.count(F.lit(1)).alias("n"), F.avg("value").alias("actual")
    )
    profile = g.groupBy("event_type", "hour").agg(
        F.avg("value").alias("expected")
    )
    return (
        actual.join(F.broadcast(profile), ["event_type", "hour"])
        .select(
            "event_type",
            "day_ms",
            "hour",
            "n",
            rnd("actual", 4).alias("actual"),
            rnd("expected", 4).alias("expected"),
            rnd(F.col("actual") - F.col("expected"), 4).alias("residual"),
        )
        .orderBy("event_type", "day_ms", "hour")
    )


@register(
    "q_interarrival_stats",
    shape="bounded",
    tags=("timeseries", "percentiles"),
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) AS prev_us
  FROM events
), gaps AS (
  SELECT event_type, (us - prev_us) / 1e6 AS gap_s
  FROM seq WHERE prev_us IS NOT NULL
)
SELECT event_type, count(*) AS n_gaps,
       {rnd_sql('percentile_cont(0.5) WITHIN GROUP (ORDER BY gap_s)', 3)} AS median_gap_s,
       {rnd_sql('percentile_cont(0.9) WITHIN GROUP (ORDER BY gap_s)', 3)} AS p90_gap_s,
       {rnd_sql('avg(gap_s)', 3)} AS mean_gap_s
FROM gaps GROUP BY event_type ORDER BY event_type
""",
)
def q_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time percentiles per event type, measured WITHIN
    each user's stream (lag over a (user, type)-partitioned window) —
    the latency-between-actions signal behind engagement and retry
    analyses.

    Scale shape: the lag window partitions on the high-cardinality
    (user_id, event_type) key — parallel in users — and the exact
    percentiles aggregate to |types| rows."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.expr(_US)
    seq = ev.select(
        "event_type",
        us.alias("us"),
        F.lag(us).over(w).alias("prev_us"),
    )
    gaps = seq.where(F.col("prev_us").isNotNull()).select(
        "event_type", ((F.col("us") - F.col("prev_us")) / 1e6).alias("gap_s")
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            rnd(F.expr("percentile(gap_s, 0.5)"), 3).alias("median_gap_s"),
            rnd(F.expr("percentile(gap_s, 0.9)"), 3).alias("p90_gap_s"),
            rnd(F.avg("gap_s"), 3).alias("mean_gap_s"),
        )
        .orderBy("event_type")
    )


# no real YoY change can be -99999%: the sentinel marks "no prior year"
# without a NULL double (pandas NaN vs None breaks the hash compare)
_YOY_SENTINEL = -99999.0


@register(
    "q_yoy_growth",
    shape="bounded",
    tags=("timeseries", "growth"),
    oracle=f"""
WITH m AS (
  SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2
), g AS (
  SELECT yr, mo, rev,
         lag(rev) OVER (PARTITION BY mo ORDER BY yr) AS prev_rev
  FROM m
)
SELECT yr, mo, {rnd_sql('rev', 2)} AS revenue,
       CASE WHEN prev_rev IS NULL THEN {_YOY_SENTINEL}
            ELSE {rnd_sql('(rev - prev_rev) / prev_rev * 100.0', 4)} END
         AS yoy_pct
FROM g ORDER BY yr, mo
""",
)
def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth — lag across years within
    each calendar month.  First-year months carry the -99999 sentinel
    (no NULL doubles at the engine boundary).

    Scale shape: one aggregation to |years|×12 rows; the lag window
    partitions by month over that bounded aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
    ).agg(F.sum("o_totalprice").alias("rev"))
    w = W.partitionBy("mo").orderBy("yr")
    g = m.withColumn("prev_rev", F.lag("rev").over(w))
    return g.select(
        "yr",
        "mo",
        rnd("rev", 2).alias("revenue"),
        F.when(F.col("prev_rev").isNull(), F.lit(_YOY_SENTINEL))
        .otherwise(
            rnd((F.col("rev") - F.col("prev_rev")) / F.col("prev_rev") * 100.0, 4)
        )
        .alias("yoy_pct"),
    ).orderBy("yr", "mo")


@register(
    "q_rolling_corr",
    shape="bounded",
    tags=("timeseries", "correlation"),
    oracle=f"""
WITH d AS (
  SELECT (epoch_ms(ts) // {_DAY_MS}) * {_DAY_MS} AS day_ms, event_type,
         sum(value) AS v
  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1, 2
), xy AS (
  SELECT a.day_ms, a.v AS x, b.v AS y
  FROM d a JOIN d b ON a.day_ms = b.day_ms
  WHERE a.event_type = 'click' AND b.event_type = 'purchase'
), win AS (
  SELECT day_ms, x, y,
         count(*) OVER w AS n,
         sum(x) OVER w AS sx, sum(y) OVER w AS sy,
         sum(x * y) OVER w AS sxy,
         sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy
  FROM xy
  WINDOW w AS (ORDER BY day_ms ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
)
SELECT day_ms, n,
       CASE WHEN n >= 2 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN {rnd_sql('(n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))', 6)}
            ELSE 0.0 END AS corr_30d
FROM win ORDER BY day_ms
""",
)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day rolling Pearson correlation between daily click volume and
    daily purchase volume — the co-movement signal behind
    marketing-effect dashboards.  Degenerate windows (n < 2 or zero
    variance) emit 0.0.

    Scale shape: the raw scan reduces to one row per (day, type); the
    rolling window runs UNPARTITIONED but over that day-bounded
    aggregate — the exact shape the global-window plan gate admits."""
    ev = load_table(spark, sf_dir, "events")
    ms = F.expr(_MS)
    d = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            ((ms / _DAY_MS).cast("long") * _DAY_MS).alias("day_ms"),
            "event_type",
        )
        .agg(F.sum("value").alias("v"))
    )
    x = d.where(F.col("event_type") == "click").select(
        "day_ms", F.col("v").alias("x")
    )
    y = d.where(F.col("event_type") == "purchase").select(
        "day_ms", F.col("v").alias("y")
    )
    xy = x.join(y, "day_ms")
    w = W.orderBy("day_ms").rowsBetween(-29, 0)
    win = xy.select(
        "day_ms",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return win.select(
        "day_ms",
        "n",
        F.when(
            (F.col("n") >= 2) & (vx > 0) & (vy > 0),
            rnd(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / F.sqrt(vx * vy),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("corr_30d"),
    ).orderBy("day_ms")


@register(
    "q_activity_streaks",
    shape="per_row",
    tags=("timeseries", "islands", "engagement"),
    oracle=f"""
WITH days AS (
  SELECT DISTINCT user_id, epoch_ms(ts) // {_DAY_MS} AS day
  FROM events
), grp AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS g
  FROM days
), streaks AS (
  SELECT user_id, g, count(*) AS len FROM grp GROUP BY user_id, g
)
SELECT user_id,
       sum(len)::BIGINT AS n_active_days,
       count(*) AS n_streaks,
       max(len)::BIGINT AS longest_streak
FROM streaks GROUP BY user_id ORDER BY user_id
""",
)
def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive-day activity streaks via the gaps-and-islands
    technique (day − row_number collapses each run to one group key) —
    the engagement-streak metric.

    Scale shape: distinct-day dedup then a user-partitioned ranking
    window (parallel in users), then two keyed aggregations — no global
    ordering anywhere."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", (F.expr(_MS) / _DAY_MS).cast("long").alias("day")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    grp = days.withColumn("g", F.col("day") - F.row_number().over(w))
    streaks = grp.groupBy("user_id", "g").agg(F.count(F.lit(1)).alias("len"))
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("len").alias("n_active_days"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("len").alias("longest_streak"),
        )
    )
