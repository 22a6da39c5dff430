"""Second-wave analytics / ML-prep operators: feature binning,
winsorization, correlation matrix, cumulative-audience curve (SURVEY
§2.2 extension; the reference has no analytics surface).

Shared scale stance: all heavy work is keyed aggregation / partitioned
windows; percentile bounds and day-level series are TINY aggregates that
broadcast or window over the aggregate, never over row-level data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_MS = "unix_millis(cast(ts as timestamp))"
_DAY_MS = 86_400_000
_NTILES = 10


@register(
    "q_feature_binning",
    shape="bounded",
    tags=("mlprep", "binning"),
    oracle=f"""
WITH b AS (
  SELECT event_type, value,
         ntile({_NTILES}) OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS bin
  FROM events
)
SELECT event_type, bin,
       count(*) AS n,
       round(5e-10 + min(value), 2) AS lo,
       round(5e-10 + max(value), 2) AS hi,
       round(5e-10 + avg(value), 4) AS mean_value
FROM b
GROUP BY event_type, bin
ORDER BY event_type, bin
""",
)
def q_feature_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth decile binning of ``value`` per event type (quantile
    feature discretization for ML prep) with per-bin population and
    bounds — the learned bin edges a trainer would persist.

    Scale shape: one window partitioned by event_type (the shuffle key
    the final agg reuses); ties broken by event_id so ntile assignment
    is deterministic on both engines.

    Reference basis: none."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    b = ev.select(
        "event_type", "value", F.ntile(_NTILES).over(w).alias("bin")
    )
    return (
        b.groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.min("value"), 2).alias("lo"),
            rnd(F.max("value"), 2).alias("hi"),
            rnd(F.avg("value"), 4).alias("mean_value"),
        )
        .orderBy("event_type", "bin")
    )


@register(
    "q_winsorize",
    shape="bounded",
    tags=("mlprep", "robust"),
    oracle="""
WITH bounds AS (
  SELECT event_type,
         round(5e-10 + quantile_cont(value, 0.01), 6) AS lo,
         round(5e-10 + quantile_cont(value, 0.99), 6) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       count(*) AS n,
       sum(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END)::BIGINT AS n_clipped_lo,
       sum(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END)::BIGINT AS n_clipped_hi,
       round(5e-10 + avg(value), 4) AS raw_mean,
       round(5e-10 + avg(least(greatest(e.value, b.lo), b.hi)), 4)
         AS winsorized_mean,
       round(5e-10 + any_value(b.lo), 6) AS p01,
       round(5e-10 + any_value(b.hi), 6) AS p99
FROM events e JOIN bounds b USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
""",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization audit per event type: exact p01/p99 bounds, clipped
    counts each side, and the mean before/after clipping — the robust
    scaling step (and its effect size) for outlier-heavy features.

    Cross-engine note: Spark ``percentile`` and DuckDB ``quantile_cont``
    both interpolate linearly, but associativity can differ at the last
    ulp — bounds are ROUNDED at 6 dp on both engines BEFORE clipping so
    the clip decision is bit-identical.

    Scale shape: bounds are a per-type exact-percentile aggregate
    (|types| rows) broadcast back; everything else is one
    map-side-combined agg.

    Reference basis: none."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        rnd(F.expr("percentile(value, 0.01)"), 6).alias("lo"),
        rnd(F.expr("percentile(value, 0.99)"), 6).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0)).alias(
                "n_clipped_lo"
            ),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0)).alias(
                "n_clipped_hi"
            ),
            rnd(F.avg("value"), 4).alias("raw_mean"),
            rnd(F.avg(clipped), 4).alias("winsorized_mean"),
            rnd(F.first("lo"), 6).alias("p01"),
            rnd(F.first("hi"), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


@register(
    "q_corr_matrix",
    shape="bounded",
    tags=("analytics", "corr"),
    oracle=f"""
WITH daily AS (
  SELECT (epoch_ms(ts) // {_DAY_MS}) AS day, event_type,
         sum(value) AS v
  FROM events GROUP BY 1, 2
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*) AS n_days,
       round(5e-10 + corr(a.v, b.v), 6) AS pearson_r
FROM daily a JOIN daily b
  ON a.day = b.day AND a.event_type < b.event_type
GROUP BY 1, 2
ORDER BY type_a, type_b
""",
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between event types' daily value
    totals — the cross-metric dependence matrix behind anomaly root-
    causing ("errors spike with clicks?").

    Scale shape: the raw data reduces FIRST to a |days|×|types| daily
    aggregate (one shuffle); the pair join and corr() run on that tiny
    series, so the quadratic term is |types|², never row count.

    Reference basis: none."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        (F.expr(_MS) / _DAY_MS).cast("long").alias("day"), "event_type"
    ).agg(F.sum("value").alias("v"))
    a = daily.select("day", F.col("event_type").alias("type_a"), F.col("v").alias("va"))
    b = daily.select("day", F.col("event_type").alias("type_b"), F.col("v").alias("vb"))
    return (
        a.join(b, "day")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            rnd(F.corr("va", "vb"), 6).alias("pearson_r"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "q_cumulative_users",
    shape="bounded",
    tags=("analytics", "growth"),
    oracle=f"""
WITH first_seen AS (
  SELECT user_id, min(epoch_ms(ts) // {_DAY_MS}) AS day FROM events GROUP BY user_id
), daily_new AS (
  SELECT day, count(*) AS n_new FROM first_seen GROUP BY day
)
SELECT day * {_DAY_MS} AS day_start_ms,
       n_new,
       sum(n_new) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)::BIGINT
         AS cumulative_users
FROM daily_new
ORDER BY day_start_ms
""",
)
def q_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience growth curve: new users per day (by first appearance)
    and the running cumulative total — "count distinct over an
    ever-growing window" restated as a first-seen aggregation, which is
    the form that scales (running COUNT(DISTINCT) windows do not).

    Scale shape: min-day per user (one shuffle on user_id), then a day
    aggregate; the only unpartitioned window runs over |days| rows.

    Reference basis: none."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min((F.expr(_MS) / _DAY_MS).cast("long")).alias("day")
    )
    daily_new = first_seen.groupBy("day").agg(F.count(F.lit(1)).alias("n_new"))
    return daily_new.select(
        (F.col("day") * _DAY_MS).alias("day_start_ms"),
        "n_new",
        F.sum("n_new")
        .over(W.orderBy("day").rowsBetween(W.unboundedPreceding, 0))
        .alias("cumulative_users"),
    ).orderBy("day_start_ms")
