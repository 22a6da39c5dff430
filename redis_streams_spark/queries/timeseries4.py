"""Round-7 time-series / sequence operators: autocorrelation, rolling
OLS slope, Theil-Sen robust trend, second-order Markov transitions,
order-to-ship lag percentiles.

Every heavy input reduces to a day- or key-bounded aggregate before any
window or pair join runs; the two deliberately-quadratic shapes
(autocorrelation's 1-row stats broadcast, Theil-Sen's pairwise slopes)
operate on the DAILY series (≤ n_days rows regardless of corpus size),
so they are corpus-scale-free.  Reference basis: none (redis-streams
has no analytics surface); these are standard forecasting/monitoring
primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_MS = "unix_millis(cast(ts as timestamp))"
_DAY_MS = 86_400_000

_DAILY_SQL = f"""
  SELECT epoch_ms(ts) // {_DAY_MS} AS day, sum(value) AS v
  FROM events GROUP BY 1
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        (F.expr(_MS) / _DAY_MS).cast("long").alias("day")
    ).agg(F.sum("value").alias("v"))


@register(
    "q_autocorr",
    shape="bounded",
    tags=("timeseries", "autocorrelation"),
    oracle=f"""
WITH d AS ({_DAILY_SQL}),
s AS (SELECT avg(v) AS m FROM d),
ss AS (SELECT sum((v - m) * (v - m)) AS denom FROM d, s),
lags(lag) AS (VALUES (1), (7), (14))
SELECT l.lag,
       count(*) AS n_pairs,
       {rnd_sql('sum((a.v - s.m) * (b.v - s.m)) / min(ss.denom)', 6)} AS acf
FROM d a
CROSS JOIN lags l
JOIN d b ON b.day = a.day + l.lag
CROSS JOIN s CROSS JOIN ss
GROUP BY l.lag
ORDER BY l.lag
""",
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily revenue series at lags 1, 7
    and 14 — the seasonality detector behind "is there a weekly cycle"
    dashboards.  Standard ACF estimator: numerator sums the lag-k
    centered cross-products, denominator is the full-series centered sum
    of squares (both around the one global mean).

    Scale shape: the raw scan reduces to one row per day FIRST; the
    1-row (mean, denom) frame then broadcasts onto the daily series (a
    nested-loop join over a scalar — corpus-scale-free), and each lag is
    an equi-join of the day-keyed aggregate to itself shifted by k."""
    d = _daily(spark, sf_dir)
    s = d.agg(F.avg("v").alias("m"))
    ss = d.crossJoin(F.broadcast(s)).agg(
        F.sum((F.col("v") - F.col("m")) * (F.col("v") - F.col("m"))).alias(
            "denom"
        )
    )
    lags = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(7), F.lit(14))).alias("lag")
    )
    a = d.crossJoin(F.broadcast(lags))
    b = d.select(F.col("day").alias("bday"), F.col("v").alias("bv"))
    pairs = a.join(b, a["day"] + a["lag"] == b["bday"])
    return (
        pairs.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ss))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            rnd(
                F.sum((F.col("v") - F.col("m")) * (F.col("bv") - F.col("m")))
                / F.min("denom"),
                6,
            ).alias("acf"),
        )
        .orderBy("lag")
    )


@register(
    "q_rolling_slope",
    shape="bounded",
    tags=("timeseries", "regression", "window"),
    oracle=f"""
WITH d AS ({_DAILY_SQL}),
x AS (
  SELECT day, v, (day - min(day) OVER ())::DOUBLE AS xr FROM d
), win AS (
  SELECT day * {_DAY_MS} AS day_ms, xr,
         count(*) OVER w AS n,
         sum(xr) OVER w AS sx, sum(v) OVER w AS sy,
         sum(xr * v) OVER w AS sxy, sum(xr * xr) OVER w AS sxx
  FROM x
  WINDOW w AS (ORDER BY day ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
)
SELECT day_ms, n,
       CASE WHEN n >= 2 AND (n * sxx - sx * sx) > 0
            THEN {rnd_sql('(n * sxy - sx * sy) / (n * sxx - sx * sx)', 6)}
            ELSE 0.0 END AS slope_30d
FROM win ORDER BY day_ms
""",
)
def q_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-day OLS slope of daily revenue, per day — the local
    trend estimate monitoring systems threshold ("revenue declining for
    N days").  Same sum-decomposition as q_rolling_corr: slope =
    (nΣxy − ΣxΣy) / (nΣxx − (Σx)²) from windowed partial sums.  The
    regressor is the day index RE-BASED to the series start (x − min x):
    raw epoch-day values (~2e4) would put ~7 leading digits of
    cancellation into nΣxx − (Σx)², re-basing keeps x ≤ n_days so both
    engines agree at 6 dp.

    Scale shape: one day-keyed aggregate, then global windows over the
    day-bounded series (the shape the fleet plan gate admits)."""
    d = _daily(spark, sf_dir)
    w_all = W.partitionBy()
    x = d.select(
        "day",
        "v",
        (F.col("day") - F.min("day").over(w_all)).cast("double").alias("xr"),
    )
    w = W.orderBy("day").rowsBetween(-29, 0)
    win = x.select(
        (F.col("day") * _DAY_MS).alias("day_ms"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("xr").over(w).alias("sx"),
        F.sum("v").over(w).alias("sy"),
        F.sum(F.col("xr") * F.col("v")).over(w).alias("sxy"),
        F.sum(F.col("xr") * F.col("xr")).over(w).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return win.select(
        "day_ms",
        "n",
        F.when(
            (F.col("n") >= 2) & (den > 0),
            rnd((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / den, 6),
        )
        .otherwise(F.lit(0.0))
        .alias("slope_30d"),
    ).orderBy("day_ms")


@register(
    "q_theil_sen",
    shape="bounded",
    tags=("timeseries", "regression", "robust"),
    oracle=f"""
WITH d AS ({_DAILY_SQL}),
slopes AS (
  SELECT (b.v - a.v) / (b.day - a.day) AS slope
  FROM d a JOIN d b ON b.day > a.day
)
SELECT (SELECT count(*) FROM d) AS n_days,
       count(*) AS n_pairs,
       {rnd_sql('median(slope)', 6)} AS ts_slope
FROM slopes
""",
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend: the median of all pairwise slopes of the
    daily revenue series — the outlier-resistant alternative to OLS
    (breakdown point 29%), the estimator monitoring pipelines use when
    single spiky days must not swing the trend line.

    Scale shape: deliberately quadratic IN DAYS, never in rows — the
    corpus reduces to ≤ n_days points first, so C(n_days, 2) pairs
    (~16k for a 6-month series) is constant w.r.t. corpus size.  The
    pair join is a nested-loop over that bounded aggregate by design."""
    d = _daily(spark, sf_dir)
    a = d.select(F.col("day").alias("aday"), F.col("v").alias("av"))
    b = d.select(F.col("day").alias("bday"), F.col("v").alias("bv"))
    slopes = a.join(b, F.col("bday") > F.col("aday")).select(
        ((F.col("bv") - F.col("av")) / (F.col("bday") - F.col("aday"))).alias(
            "slope"
        )
    )
    n_days = d.agg(F.count(F.lit(1)).alias("n_days"))
    return (
        slopes.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            rnd(F.expr("median(slope)"), 6).alias("ts_slope"),
        )
        .crossJoin(F.broadcast(n_days))
        .select("n_days", "n_pairs", "ts_slope")
    )


@register(
    "q_markov2",
    shape="bounded",
    tags=("analytics", "markov", "sequence"),
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type, 2) OVER w AS src2,
         lag(event_type, 1) OVER w AS src1
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), t AS (
  SELECT src2, src1, event_type AS dst, count(*) AS n
  FROM s WHERE src2 IS NOT NULL
  GROUP BY 1, 2, 3
)
SELECT src2, src1, dst, n,
       round(5e-10 + n::DOUBLE / sum(n) OVER (PARTITION BY src2, src1), 4)
         AS p
FROM t ORDER BY src2, src1, dst
""",
)
def q_markov2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order Markov transition matrix over per-user event
    sequences: P(next | prev2, prev1) — the memory-2 refinement of
    q_event_transitions that path-prediction and anomaly models use when
    one step of history is not enough.

    Scale shape: ONE user-partitioned window computes both lags in a
    single pass; the trigram count is a ≤ |types|³ aggregate and the
    row-normalizer is a window over that tiny frame."""
    ev = load_table(spark, sf_dir, "events").withColumn("us", F.expr(
        "unix_micros(cast(ts as timestamp))"
    ))
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    s = ev.select(
        "event_type",
        F.lag("event_type", 2).over(w).alias("src2"),
        F.lag("event_type", 1).over(w).alias("src1"),
    ).where(F.col("src2").isNotNull())
    t = s.groupBy("src2", "src1", F.col("event_type").alias("dst")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w_pair = W.partitionBy("src2", "src1")
    return t.select(
        "src2",
        "src1",
        "dst",
        "n",
        rnd(F.col("n").cast("double") / F.sum("n").over(w_pair), 4).alias("p"),
    ).orderBy("src2", "src1", "dst")


@register(
    "q_order_to_ship_lag",
    shape="bounded",
    tags=("relational", "percentiles", "join"),
    oracle=f"""
SELECT o.o_orderpriority,
       count(*) AS n_lines,
       {rnd_sql("percentile_cont(0.5) WITHIN GROUP "
                "(ORDER BY datediff('day', o.o_orderdate, l.l_shipdate))", 2)}
         AS p50_days,
       {rnd_sql("percentile_cont(0.9) WITHIN GROUP "
                "(ORDER BY datediff('day', o.o_orderdate, l.l_shipdate))", 2)}
         AS p90_days,
       {rnd_sql("percentile_cont(0.99) WITHIN GROUP "
                "(ORDER BY datediff('day', o.o_orderdate, l.l_shipdate))", 2)}
         AS p99_days,
       {rnd_sql("avg(datediff('day', o.o_orderdate, l.l_shipdate))", 4)}
         AS mean_days
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
)
def q_order_to_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship fulfillment lag (days between order date and line
    ship date): exact p50/p90/p99 + mean per order priority — the SLA
    percentile report every fulfillment dashboard carries.

    Scale shape: the one heavy op is the lineitem⋈orders equi-join on
    orderkey — both sides shuffle-partition on the same key (the
    canonical co-partitioned fact-fact join; bucketed layouts make it
    shuffle-free).  Exact percentiles then aggregate per priority (5
    groups), partial-merged map-side."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        F.datediff(
            F.to_date("l_shipdate"), F.to_date("o_orderdate")
        ).cast("double").alias("lag_days"),
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            rnd(F.expr("percentile(lag_days, 0.5)"), 2).alias("p50_days"),
            rnd(F.expr("percentile(lag_days, 0.9)"), 2).alias("p90_days"),
            rnd(F.expr("percentile(lag_days, 0.99)"), 2).alias("p99_days"),
            rnd(F.avg("lag_days"), 4).alias("mean_days"),
        )
        .orderBy("o_orderpriority")
    )
