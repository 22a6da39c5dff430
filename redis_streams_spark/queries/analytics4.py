"""Fourth-wave analytics: exponential smoothing, Bollinger bands, RFM
segmentation, cohort LTV curves (SURVEY §2.2 extension; the reference
has no analytics surface).

All four reduce the raw scan to a small keyed aggregate FIRST (daily
series, per-customer stats, cohort cells) and run their sequential /
quadratic logic over that aggregate — the shape that keeps classic BI
math scale-free.
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
_WEEK_MS = 7 * _DAY_MS
_ALPHA = 0.3


@register(
    "q_exp_smoothing",
    shape="bounded",
    tags=("timeseries", "smoothing"),
    oracle=f"""
WITH daily AS (
  SELECT event_type, epoch_ms(ts) // {_DAY_MS} AS day, sum(value) AS x
  FROM events GROUP BY 1, 2
), idx AS (
  SELECT event_type, day, x,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
  FROM daily
)
SELECT a.event_type, a.day * {_DAY_MS} AS day_start_ms,
       round(5e-10 + a.x, 2) AS raw,
       round(5e-10 + sum(
         CASE WHEN b.t = 1 THEN pow(1.0 - {_ALPHA}, a.t - 1) * b.x
              ELSE {_ALPHA} * pow(1.0 - {_ALPHA}, a.t - b.t) * b.x END), 4)
         AS smoothed
FROM idx a JOIN idx b
  ON a.event_type = b.event_type AND b.t <= a.t
GROUP BY a.event_type, a.day, a.x
ORDER BY a.event_type, day_start_ms
""",
)
def q_exp_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple exponential smoothing (α = 0.3, S₁ = x₁) of each type's
    daily totals, via the closed form
    Sₜ = (1−α)^(t−1)·x₁ + α·Σᵢ₌₂..ₜ (1−α)^(t−i)·xᵢ — the recursion
    unrolled so both engines compute identical weighted sums instead of
    a sequential fold no SQL engine exposes.

    Scale shape: the raw scan reduces to the |days|×|types| daily
    aggregate first; the triangular self-join runs over that TINY series
    (|days|² per type).  For long horizons the weights vanish
    geometrically, so a real deployment truncates the join to the last
    ~25/α days with identical results to double precision.

    Reference basis: none."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", (F.expr(_MS) / _DAY_MS).cast("long").alias("day")
    ).agg(F.sum("value").alias("x"))
    idx = daily.withColumn(
        "t",
        F.row_number().over(W.partitionBy("event_type").orderBy("day")),
    )
    a = idx.select("event_type", "day", F.col("x").alias("xa"), F.col("t").alias("ta"))
    b = idx.select("event_type", F.col("x").alias("xb"), F.col("t").alias("tb"))
    one_m_a = 1.0 - _ALPHA
    w = F.when(
        F.col("tb") == 1, F.pow(F.lit(one_m_a), F.col("ta") - 1)
    ).otherwise(F.lit(_ALPHA) * F.pow(F.lit(one_m_a), F.col("ta") - F.col("tb")))
    return (
        a.join(b, ["event_type"])
        .where(F.col("tb") <= F.col("ta"))
        .groupBy("event_type", "day", "xa")
        .agg(rnd(F.sum(w * F.col("xb")), 4).alias("smoothed"))
        .select(
            "event_type",
            (F.col("day") * _DAY_MS).alias("day_start_ms"),
            rnd(F.col("xa"), 2).alias("raw"),
            "smoothed",
        )
        .orderBy("event_type", "day_start_ms")
    )


@register(
    "q_bollinger_bands",
    shape="bounded",
    tags=("timeseries", "bands"),
    oracle=f"""
WITH daily AS (
  SELECT event_type, epoch_ms(ts) // {_DAY_MS} AS day, sum(value) AS x
  FROM events GROUP BY 1, 2
), b AS (
  SELECT event_type, day, x,
         avg(x) OVER w AS ma7,
         stddev_samp(x) OVER w AS sd7,
         count(*) OVER w AS n_win
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day * {_DAY_MS} AS day_start_ms,
       round(5e-10 + x, 2) AS raw,
       round(5e-10 + ma7, 4) AS ma7,
       round(5e-10 + coalesce(sd7, 0.0), 4) AS sd7,
       n_win,
       n_win >= 2 AND round(5e-10 + abs(x - ma7) - 2 * sd7, 4) > 0 AS breakout
FROM b
ORDER BY event_type, day_start_ms
""",
)
def q_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over each type's daily totals: 7-day rolling mean
    and sample stddev, flagging days outside ±2σ — the band-breakout
    anomaly view (complements q_mad_anomaly's global robust gate with a
    LOCAL rolling one).

    Warm-up rows (window shorter than 2) report sd7 = 0 and never flag.
    Scale shape: rolling windows over the daily AGGREGATE, partitioned
    by type.

    Reference basis: none."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", (F.expr(_MS) / _DAY_MS).cast("long").alias("day")
    ).agg(F.sum("value").alias("x"))
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    b = daily.select(
        "event_type",
        "day",
        "x",
        F.avg("x").over(w).alias("ma7"),
        F.stddev_samp("x").over(w).alias("sd7"),
        F.count(F.lit(1)).over(w).alias("n_win"),
    )
    return b.select(
        "event_type",
        (F.col("day") * _DAY_MS).alias("day_start_ms"),
        rnd("x", 2).alias("raw"),
        rnd("ma7", 4).alias("ma7"),
        rnd(F.coalesce(F.col("sd7"), F.lit(0.0)), 4).alias("sd7"),
        "n_win",
        # round-before-threshold (repo convention, rounding.py): the
        # window mean/stddev differ by an ulp across engines, so the
        # breakout decision compares the 4dp-stabilized margin
        (
            (F.col("n_win") >= 2)
            & (rnd(F.abs(F.col("x") - F.col("ma7")) - 2 * F.col("sd7"), 4) > 0)
        ).alias("breakout"),
    ).orderBy("event_type", "day_start_ms")


@register(
    "q_rfm_segmentation",
    shape="bounded",
    tags=("analytics", "rfm"),
    oracle="""
WITH base AS (
  SELECT o_custkey,
         max(epoch_ms(o_orderdate)) AS last_ms,
         count(*) AS freq,
         sum(o_totalprice) AS monetary
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT o_custkey, last_ms, freq, monetary,
         ntile(4) OVER (ORDER BY last_ms, o_custkey) AS r_score,
         ntile(4) OVER (ORDER BY freq, o_custkey) AS f_score,
         ntile(4) OVER (ORDER BY monetary, o_custkey) AS m_score
  FROM base
)
SELECT r_score, f_score, m_score,
       r_score * 100 + f_score * 10 + m_score AS segment,
       count(*) AS n_customers,
       round(5e-10 + avg(monetary), 2) AS avg_monetary,
       round(5e-10 + avg(freq), 4) AS avg_frequency
FROM scored
GROUP BY r_score, f_score, m_score
ORDER BY segment
""",
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every customer scored 1–4 on Recency /
    Frequency / Monetary quartiles (ntile with custkey tie-break), then
    the 64-cell segment census — the classic CRM partitioning.

    Scale shape: one per-customer aggregation; the quartile windows run
    over the |customers| AGGREGATE — at extreme customer counts the
    ntile would switch to the two-phase bucketed ranking of
    q_pareto_gini (same monotone-bucket trick).

    Reference basis: none."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy("o_custkey").agg(
        F.max(F.expr("unix_millis(cast(o_orderdate as timestamp))")).alias("last_ms"),
        F.count(F.lit(1)).alias("freq"),
        F.sum("o_totalprice").alias("monetary"),
    )
    scored = base.select(
        "o_custkey",
        "freq",
        "monetary",
        F.ntile(4).over(W.orderBy("last_ms", "o_custkey")).alias("r_score"),
        F.ntile(4).over(W.orderBy("freq", "o_custkey")).alias("f_score"),
        F.ntile(4).over(W.orderBy("monetary", "o_custkey")).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            rnd(F.avg("monetary"), 2).alias("avg_monetary"),
            rnd(F.avg("freq"), 4).alias("avg_frequency"),
        )
        .select(
            "r_score",
            "f_score",
            "m_score",
            (
                F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
            ).alias("segment"),
            "n_customers",
            "avg_monetary",
            "avg_frequency",
        )
        .orderBy("segment")
    )


@register(
    "q_cohort_ltv",
    shape="bounded",
    tags=("analytics", "ltv"),
    oracle=f"""
WITH first_seen AS (
  SELECT user_id, min(epoch_ms(ts) // {_WEEK_MS}) AS cohort_week
  FROM events GROUP BY user_id
), purch AS (
  SELECT e.user_id, f.cohort_week,
         (epoch_ms(e.ts) // {_WEEK_MS}) - f.cohort_week AS age_weeks,
         e.value
  FROM events e JOIN first_seen f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase'
), cell AS (
  SELECT cohort_week, age_weeks,
         count(*) AS n_purchases, sum(value) AS revenue
  FROM purch GROUP BY 1, 2
)
SELECT cohort_week * {_WEEK_MS} AS cohort_week_ms, age_weeks,
       n_purchases,
       round(5e-10 + revenue, 2) AS revenue,
       round(5e-10 + sum(revenue) OVER (PARTITION BY cohort_week
                                        ORDER BY age_weeks
                                        ROWS UNBOUNDED PRECEDING), 2)
         AS cum_revenue
FROM cell
ORDER BY cohort_week_ms, age_weeks
""",
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users grouped by first-seen week,
    purchase revenue accumulated by cohort age — the LTV triangle that
    answers "do newer cohorts monetize faster?".

    Scale shape: first-seen agg (one user-keyed shuffle) joined back
    broadcast-style, then cohort×age cells; the cumulative window runs
    over the tiny cell aggregate partitioned by cohort.

    Reference basis: none."""
    ev = load_table(spark, sf_dir, "events")
    week = (F.expr(_MS) / _WEEK_MS).cast("long")
    first_seen = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", week.alias("w"), "value")
        .join(first_seen, "user_id")
        .select(
            "cohort_week",
            (F.col("w") - F.col("cohort_week")).alias("age_weeks"),
            "value",
        )
    )
    cell = purch.groupBy("cohort_week", "age_weeks").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("value").alias("revenue"),
    )
    wc = (
        W.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return cell.select(
        (F.col("cohort_week") * _WEEK_MS).alias("cohort_week_ms"),
        "age_weeks",
        "n_purchases",
        rnd("revenue", 2).alias("revenue"),
        rnd(F.sum("revenue").over(wc), 2).alias("cum_revenue"),
    ).orderBy("cohort_week_ms", "age_weeks")
