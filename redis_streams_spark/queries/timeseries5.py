"""Round-8 time-series wave: SAX symbolization and a parallel LTTB
downsample — both corpus-scale-free after the daily aggregate (the
day-grain frame is bounded by the time horizon, not the event count).

Reference basis: none (SURVEY §2.2 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_MS = "unix_millis(cast(ts as timestamp))"
_SAX_SEGS = 8
_LTTB_B = 12

_DAILY_SQL = """
daily AS (
  SELECT event_type, epoch_ms(ts) // 86400000 AS day, avg(value) AS v
  FROM events GROUP BY 1, 2
)"""


def _sax_oracle() -> str:
    return f"""
WITH {_DAILY_SQL},
norm AS (
  SELECT event_type, day, v,
         avg(v) OVER (PARTITION BY event_type) AS mu,
         stddev_pop(v) OVER (PARTITION BY event_type) AS sd,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS r,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily
), z AS (
  SELECT event_type, n,
         CASE WHEN sd > 0 THEN (v - mu) / sd ELSE 0.0 END AS z,
         ((r - 1) * {_SAX_SEGS}) // n AS seg
  FROM norm
), segs AS (
  SELECT event_type, seg, max(n) AS n_days, avg(z) AS zbar
  FROM z GROUP BY event_type, seg
), syms AS (
  SELECT event_type, seg, n_days,
         CASE WHEN zbar < -0.6745 THEN 'a'
              WHEN zbar < 0 THEN 'b'
              WHEN zbar < 0.6745 THEN 'c'
              ELSE 'd' END AS sym
  FROM segs
)
SELECT event_type,
       max(n_days)::BIGINT AS n_days,
       string_agg(sym, '' ORDER BY seg) AS sax
FROM syms GROUP BY event_type
ORDER BY event_type
"""


@register("q_sax_symbols", shape="bounded", tags=("timeseries", "symbolic"), oracle=_sax_oracle())
def q_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation) of each event type's daily
    series: z-normalize per series, PAA into 8 equal-count segments,
    quantize segment means at the standard gaussian breakpoints
    (-0.6745, 0, 0.6745) into an 'a'-'d' word — the shape index used for
    motif/anomaly search over millions of series.  After the daily
    aggregate everything is windows over a <= n_days frame per type:
    corpus size only changes the first scan."""
    ev = load_table(spark, sf_dir, "events")
    day = (F.expr(_MS) / F.lit(86400000)).cast("long")
    daily = ev.groupBy(F.col("event_type"), day.alias("day")).agg(
        F.avg("value").alias("v")
    )
    wt = W.partitionBy("event_type")
    norm = daily.select(
        "event_type",
        "day",
        "v",
        F.avg("v").over(wt).alias("mu"),
        F.stddev_pop("v").over(wt).alias("sd"),
        F.row_number().over(wt.orderBy("day")).alias("r"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    z = norm.select(
        "event_type",
        "n",
        F.when(F.col("sd") > 0, (F.col("v") - F.col("mu")) / F.col("sd"))
        .otherwise(0.0)
        .alias("z"),
        ((F.col("r") - 1) * _SAX_SEGS / F.col("n")).cast("long").alias("seg"),
    )
    segs = z.groupBy("event_type", "seg").agg(
        F.max("n").alias("n_days"), F.avg("z").alias("zbar")
    )
    sym = (
        F.when(F.col("zbar") < -0.6745, "a")
        .when(F.col("zbar") < 0, "b")
        .when(F.col("zbar") < 0.6745, "c")
        .otherwise("d")
    )
    return (
        segs.select("event_type", "seg", "n_days", sym.alias("sym"))
        .groupBy("event_type")
        .agg(
            F.max("n_days").alias("n_days"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg", "sym"))),
                    lambda x: x.sym,
                ),
                "",
            ).alias("sax"),
        )
        .orderBy("event_type")
    )


def _lttb_oracle() -> str:
    nb = _LTTB_B
    return f"""
WITH {_DAILY_SQL},
idx AS (
  SELECT event_type, day, v,
         row_number() OVER (PARTITION BY event_type ORDER BY day) - 1 AS r,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily
), bucketed AS (
  SELECT event_type, day, v, r, n,
         CASE WHEN r = 0 THEN 0
              WHEN r = n - 1 THEN {nb} - 1
              ELSE 1 + ((r - 1) * ({nb} - 2)) // (n - 2)
         END AS bucket
  FROM idx
), anchors AS (
  SELECT event_type, bucket, avg(r) AS ax, avg(v) AS ay
  FROM bucketed GROUP BY event_type, bucket
), scored AS (
  SELECT b.event_type, b.day, b.v, b.bucket,
         -- round-before-argmax (rounding.py convention, like
         -- sim_mmr_rerank's cosines): the anchors are cross-engine
         -- float averages, so a near-tie in raw area could argmax
         -- differently under Spark vs DuckDB summation order
         {rnd_sql(
             'abs((p.ax - q.ax) * (b.v - p.ay)'
             ' - (p.ax - b.r) * (q.ay - p.ay))', 6)}
           AS area
  FROM bucketed b
  JOIN anchors p ON p.event_type = b.event_type AND p.bucket = b.bucket - 1
  JOIN anchors q ON q.event_type = b.event_type AND q.bucket = b.bucket + 1
  WHERE b.bucket BETWEEN 1 AND {nb} - 2
), picked AS (
  SELECT event_type, day, v, bucket
  FROM (SELECT *, row_number() OVER (PARTITION BY event_type, bucket
                                     ORDER BY area DESC, day) AS rk
        FROM scored) t
  WHERE rk = 1
)
SELECT event_type, bucket, day * 86400000 AS day_ms,
       {rnd_sql('v', 4)} AS sel_value
FROM (
  SELECT event_type, day, v, bucket FROM picked
  UNION ALL
  SELECT event_type, day, v, bucket FROM bucketed
  WHERE bucket IN (0, {nb} - 1)
)
ORDER BY event_type, bucket
"""


@register(
    "q_lttb_downsample",
    shape="bounded",
    tags=("timeseries", "downsample", "viz"),
    oracle=_lttb_oracle(),
)
def q_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling, PARALLEL variant:
    classic LTTB anchors each bucket's triangle on the previously
    SELECTED point (a sequential dependency); this variant anchors on
    the neighbor buckets' mean points, making every bucket independently
    computable — the formulation that distributes (and what plotting
    front-ends actually ship for big data).  First/last points are kept
    verbatim; middle buckets keep their max-triangle-area point with a
    deterministic (area desc, day) tie-break.  x-coordinates are the
    per-series day rank so the area arithmetic is scale-free."""
    ev = load_table(spark, sf_dir, "events")
    day = (F.expr(_MS) / F.lit(86400000)).cast("long")
    daily = ev.groupBy(F.col("event_type"), day.alias("day")).agg(
        F.avg("value").alias("v")
    )
    wt = W.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "day",
        "v",
        (F.row_number().over(wt.orderBy("day")) - 1).alias("r"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    nb = _LTTB_B
    bucket = (
        F.when(F.col("r") == 0, 0)
        .when(F.col("r") == F.col("n") - 1, nb - 1)
        .otherwise(
            (1 + ((F.col("r") - 1) * (nb - 2)) / (F.col("n") - 2)).cast("long")
        )
    )
    bucketed = idx.withColumn("bucket", bucket)
    anchors = bucketed.groupBy("event_type", "bucket").agg(
        F.avg("r").alias("ax"), F.avg("v").alias("ay")
    )
    p = anchors.select(
        F.col("event_type").alias("pet"),
        (F.col("bucket") + 1).alias("pb"),
        F.col("ax").alias("pax"),
        F.col("ay").alias("pay"),
    )
    q = anchors.select(
        F.col("event_type").alias("qet"),
        (F.col("bucket") - 1).alias("qb"),
        F.col("ax").alias("qax"),
        F.col("ay").alias("qay"),
    )
    mids = bucketed.where(F.col("bucket").between(1, nb - 2))
    scored = (
        mids.join(
            F.broadcast(p),
            (F.col("pet") == F.col("event_type")) & (F.col("pb") == F.col("bucket")),
        )
        .join(
            F.broadcast(q),
            (F.col("qet") == F.col("event_type")) & (F.col("qb") == F.col("bucket")),
        )
        .select(
            "event_type",
            "day",
            "v",
            "bucket",
            # round-before-argmax (matches the oracle's 6dp rounding;
            # see the oracle comment)
            rnd(
                F.abs(
                    (F.col("pax") - F.col("qax")) * (F.col("v") - F.col("pay"))
                    - (F.col("pax") - F.col("r"))
                    * (F.col("qay") - F.col("pay"))
                ),
                6,
            ).alias("area"),
        )
    )
    wk = W.partitionBy("event_type", "bucket").orderBy(F.desc("area"), "day")
    picked = (
        scored.withColumn("rk", F.row_number().over(wk))
        .where(F.col("rk") == 1)
        .select("event_type", "day", "v", "bucket")
    )
    ends = bucketed.where(F.col("bucket").isin(0, nb - 1)).select(
        "event_type", "day", "v", "bucket"
    )
    return (
        picked.unionByName(ends)
        .select(
            "event_type",
            "bucket",
            (F.col("day") * 86400000).alias("day_ms"),
            rnd("v", 4).alias("sel_value"),
        )
        .orderBy("event_type", "bucket")
    )


_CCF_LAGS = (-3, -2, -1, 0, 1, 2, 3)


@register(
    "q_cross_correlation",
    shape="bounded",
    tags=("timeseries", "stats", "correlation"),
    oracle=f"""
WITH d AS (
  SELECT epoch_ms(ts) // 86400000 AS day,
         sum(value) AS rev, count(*)::DOUBLE AS n
  FROM events GROUP BY 1
), lags AS (SELECT * FROM (VALUES {", ".join(f"({L})" for L in _CCF_LAGS)}) lags(lag)),
j AS (
  SELECT lags.lag, a.rev, b.n
  FROM lags
  JOIN d a ON true
  JOIN d b ON b.day = a.day + lags.lag
)
SELECT lag::BIGINT AS lag, count(*)::BIGINT AS n_days,
       {rnd_sql('corr(rev, n)', 6)} AS ccf
FROM j GROUP BY 1 ORDER BY lag
""",
)
def q_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between daily revenue and daily event
    count (CCF at lags -3..+3): does volume LEAD revenue or follow it —
    the lead/lag detector behind demand forecasting and anomaly
    root-causing (the two-series generalization of q_autocorr).

    Scale shape: one day-keyed aggregate, then a self-join shifted by
    each lag over the bounded daily frame (≤ n_days rows, broadcast) and
    one corr() per lag — corpus-scale-free past the first aggregate."""
    ev = load_table(spark, sf_dir, "events")
    day = (F.expr(_MS) / F.lit(86400000)).cast("long")
    d = ev.groupBy(day.alias("day")).agg(
        F.sum("value").alias("rev"), F.count(F.lit(1)).cast("double").alias("n")
    )
    lags = spark.createDataFrame([(L,) for L in _CCF_LAGS], "lag long")
    a = d.select(F.col("day").alias("aday"), "rev")
    b = d.select(F.col("day").alias("bday"), "n")
    j = (
        lags.crossJoin(F.broadcast(a))
        .join(
            F.broadcast(b),
            F.col("bday") == F.col("aday") + F.col("lag"),
        )
    )
    return (
        j.groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            rnd(F.corr("rev", "n"), 6).alias("ccf"),
        )
        .orderBy("lag")
    )


@register(
    "q_forecast_backtest",
    shape="bounded",
    tags=("timeseries", "forecast", "model-eval"),
    oracle=f"""
WITH d AS (
  SELECT epoch_ms(ts) // 86400000 AS day, sum(value) AS v
  FROM events GROUP BY 1
), lagged AS (
  SELECT day, v,
         lag(v, 1) OVER (ORDER BY day) AS f_naive1,
         lag(day, 1) OVER (ORDER BY day) AS d1,
         lag(v, 7) OVER (ORDER BY day) AS f_snaive7,
         lag(day, 7) OVER (ORDER BY day) AS d7
  FROM d
), m AS (
  SELECT 'naive1' AS method, v, f_naive1 AS f FROM lagged
  WHERE d1 = day - 1 AND d7 = day - 7
  UNION ALL
  SELECT 'snaive7', v, f_snaive7 FROM lagged
  WHERE d1 = day - 1 AND d7 = day - 7
)
SELECT method, count(*)::BIGINT AS n_days_eval,
       {rnd_sql('avg(abs(f - v))', 4)} AS mae,
       {rnd_sql('sqrt(avg((f - v) * (f - v)))', 4)} AS rmse,
       {rnd_sql('avg(2.0 * abs(f - v) / (abs(f) + abs(v)))', 6)} AS smape
FROM m GROUP BY method ORDER BY method
""",
)
def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest of the two standard baselines every real model
    must beat — naive (yesterday's value) and seasonal-naive (same
    weekday last week) — over the daily revenue series: MAE, RMSE, and
    sMAPE on the days where BOTH calendar forecasts exist (so the two
    rows are directly comparable).  The lag values are guarded by
    lagged-DAY equality checks (d-1 and d-7 exactly), so on a series
    with gaps a day whose "last week" is missing is excluded rather
    than silently scored against the wrong weekday — row-offset lag
    alone would corrupt the seasonal baseline identically on both
    engines, where the oracle gate cannot see it.  If a trained model's
    backtest doesn't beat snaive7 here, ship the baseline.

    Scale shape: ONE day-keyed aggregate and one scan (both methods are
    melted from the same lagged rows via explode, not a self-union that
    would re-scan the corpus), lag windows over the bounded daily frame
    (≤ n_days rows, above the Aggregate — the gate-admitted shape),
    then one aggregate per method."""
    ev = load_table(spark, sf_dir, "events")
    day = (F.expr(_MS) / F.lit(86400000)).cast("long")
    d = ev.groupBy(day.alias("day")).agg(F.sum("value").alias("v"))
    wd = W.orderBy("day")
    lagged = d.select(
        "day",
        "v",
        F.lag("v", 1).over(wd).alias("f_naive1"),
        F.lag("day", 1).over(wd).alias("d1"),
        F.lag("v", 7).over(wd).alias("f_snaive7"),
        F.lag("day", 7).over(wd).alias("d7"),
    ).where(
        (F.col("d1") == F.col("day") - 1) & (F.col("d7") == F.col("day") - 7)
    )
    m = lagged.select(
        "v",
        F.explode(
            F.array(
                F.struct(
                    F.lit("naive1").alias("method"),
                    F.col("f_naive1").alias("f"),
                ),
                F.struct(
                    F.lit("snaive7").alias("method"),
                    F.col("f_snaive7").alias("f"),
                ),
            )
        ).alias("mf"),
    ).select(F.col("mf.method").alias("method"), "v", F.col("mf.f").alias("f"))
    err = F.col("f") - F.col("v")
    return (
        m.groupBy("method")
        .agg(
            F.count(F.lit(1)).alias("n_days_eval"),
            rnd(F.avg(F.abs(err)), 4).alias("mae"),
            rnd(F.sqrt(F.avg(err * err)), 4).alias("rmse"),
            rnd(
                F.avg(
                    2.0 * F.abs(err) / (F.abs(F.col("f")) + F.abs(F.col("v")))
                ),
                6,
            ).alias("smape"),
        )
        .orderBy("method")
    )
