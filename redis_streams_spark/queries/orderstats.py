"""Round-9 exact order statistics WITHOUT a global sort: quantiles,
weighted median, trimmed/winsorized means, and an equi-depth histogram
audit — all on the bucketed two-phase prefix sum (operators/prefix.py),
so no plan here contains an empty-partition window or a rangepartition
exchange.

Why this family matters at 100 TB: ``percentile_approx`` trades accuracy
for one pass, and ``ORDER BY``-based exact quantiles serialize the
corpus through a range shuffle.  The histogram-rank identity gives EXACT
order statistics from (value, count) aggregates plus prefix sums over
the distinct-value frame — the only shuffles are a groupBy and a tiny
bucket-offset broadcast, and tie mass is handled exactly (partial
inclusion at trim boundaries, fill-ratio skew from ties in the
equi-depth audit).

Reference basis: none (SURVEY §2.2 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.operators.prefix import (
    EVENTS_VALUE_BUCKET,
    NCHARS_BUCKET,
    bucketed_cumsum,
)
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

# prefix-sum bucket widths (see operators/prefix.py: bucket count =
# value-range/width, per-bucket work = distinct values in bucket)
_VALUE_BUCKET = EVENTS_VALUE_BUCKET  # events.value spans ~0-560
_PRICE_BUCKET = 2048.0  # l_extendedprice spans ~900-105000

_QUANTILE_PS = (0.25, 0.5, 0.75, 0.9, 0.99)
_GROUP_PS = (0.5, 0.95)
_NCHARS_BUCKET = NCHARS_BUCKET  # documents.n_chars spans ~44-577
_WEIGHTED_PS = (0.25, 0.5, 0.75)
_TRIM_FRAC = 10  # drop n//10 rows from each tail
_DEPTH_BUCKETS = 10


@register(
    "q_exact_quantiles_hist",
    shape="bounded+prefix_sum",
    tags=("orderstats", "percentiles", "agg"),
    oracle=f"""
WITH h AS (
  SELECT value AS val, count(*)::BIGINT AS cnt FROM events GROUP BY 1
), c AS (
  SELECT val, sum(cnt) OVER (ORDER BY val ROWS UNBOUNDED PRECEDING) AS cum
  FROM h
), t AS (SELECT count(*)::BIGINT AS n FROM events),
ps AS (SELECT * FROM (VALUES {", ".join(f"({p})" for p in _QUANTILE_PS)}) ps(p))
SELECT ps.p::DOUBLE AS p, min(c.val) AS q_value, t.n AS n
FROM ps CROSS JOIN t JOIN c ON c.cum >= ceil(ps.p * t.n)
GROUP BY ps.p, t.n
ORDER BY p
""",
)
def q_exact_quantiles_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT lower-discrete quantiles (p25/p50/p75/p90/p99) of
    ``events.value``: the p-quantile is the smallest distinct value
    whose cumulative count reaches ceil(p·n).  One histogram aggregate +
    the bucketed prefix sum + a 5-row broadcast threshold join — exact
    answers with no sort, no single-task window, and no approx sketch
    (compare q_percentiles' percentile_cont and q_quantile_sketch_audit's
    log-histogram: this is the exact path both are measured against).
    The ceil(p·n) threshold is scalar arithmetic, bit-identical across
    engines."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(F.col("value").alias("val")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    c = bucketed_cumsum(h, "val", [("cnt", "cum", True)], _VALUE_BUCKET)
    tot = ev.agg(F.count(F.lit(1)).alias("n"))
    ps = spark.createDataFrame([(p,) for p in _QUANTILE_PS], "p double")
    thr = ps.crossJoin(tot).withColumn("thr", F.ceil(F.col("p") * F.col("n")))
    return (
        c.join(F.broadcast(thr), F.col("cum") >= F.col("thr"))
        .groupBy("p", "n")
        .agg(F.min("val").alias("q_value"))
        .select("p", "q_value", "n")
        .orderBy("p")
    )


@register(
    "q_group_exact_quantiles",
    shape="bounded+prefix_sum",
    tags=("orderstats", "percentiles", "agg"),
    oracle=f"""
WITH h AS (
  SELECT source, n_chars AS val, count(*)::BIGINT AS cnt
  FROM documents GROUP BY 1, 2
), c AS (
  SELECT source, val,
         sum(cnt) OVER (PARTITION BY source ORDER BY val
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM h
), t AS (
  SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY 1
), ps AS (SELECT * FROM (VALUES {", ".join(f"({p})" for p in _GROUP_PS)}) ps(p))
SELECT t.source AS source, ps.p::DOUBLE AS p,
       min(c.val)::BIGINT AS q_value, t.n
FROM ps CROSS JOIN t
JOIN c ON c.source = t.source AND c.cum >= ceil(ps.p * t.n)
GROUP BY t.source, ps.p, t.n
ORDER BY t.source, p
""",
)
def q_group_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group quantiles (p50/p95 of document length per
    source) — the per-key form of q_exact_quantiles_hist, on the
    partitioned bucketed prefix sum: cumulation restarts per source but
    every frame stays keyed by (source, value-bucket), so ONE skewed
    source still fans out across its value buckets instead of
    serializing through a single window task (the trap of the naive
    ``PARTITION BY source ORDER BY val`` when one group dominates — the
    very thing ``percentile_approx`` is usually reached for; this is the
    exact answer at the same shuffle count)."""
    docs = load_table(spark, sf_dir, "documents")
    h = docs.groupBy("source", F.col("n_chars").alias("val")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    c = bucketed_cumsum(
        h,
        "val",
        [("cnt", "cum", True)],
        _NCHARS_BUCKET,
        partition_cols=["source"],
    )
    tot = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    ps = spark.createDataFrame([(p,) for p in _GROUP_PS], "p double")
    thr = ps.crossJoin(tot).withColumn("thr", F.ceil(F.col("p") * F.col("n")))
    return (
        c.join(F.broadcast(thr), ["source"])
        .where(F.col("cum") >= F.col("thr"))
        .groupBy("source", "p", "n")
        .agg(F.min("val").cast("long").alias("q_value"))
        .select("source", "p", "q_value", "n")
        .orderBy("source", "p")
    )


@register(
    "q_weighted_median_price",
    shape="bounded+prefix_sum",
    tags=("orderstats", "percentiles", "weighted"),
    oracle=f"""
WITH h AS (
  SELECT l_extendedprice AS val, sum(l_quantity::BIGINT) AS w
  FROM lineitem GROUP BY 1
), c AS (
  SELECT val, sum(w) OVER (ORDER BY val ROWS UNBOUNDED PRECEDING) AS cumw
  FROM h
), t AS (SELECT sum(l_quantity::BIGINT) AS tw FROM lineitem),
ps AS (SELECT * FROM (VALUES {", ".join(f"({p})" for p in _WEIGHTED_PS)}) ps(p))
SELECT ps.p::DOUBLE AS p, min(c.val) AS q_value, t.tw::BIGINT AS total_weight
FROM ps CROSS JOIN t JOIN c ON c.cumw >= ps.p * t.tw
GROUP BY ps.p, t.tw
ORDER BY p
""",
)
def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED quantiles (p25/median/p75) of unit price weighted
    by quantity — "the price of the median shipped unit", which no
    built-in percentile computes.  Same histogram + prefix-sum shape as
    q_exact_quantiles_hist with integer weight mass (l_quantity is
    integral, summed as BIGINT so cumulative weights are exact on both
    engines; only the p·W threshold is float, computed scalar-identical)."""
    li = load_table(spark, sf_dir, "lineitem")
    h = li.groupBy(F.col("l_extendedprice").alias("val")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("w")
    )
    c = bucketed_cumsum(h, "val", [("w", "cumw", True)], _PRICE_BUCKET)
    tot = li.agg(F.sum(F.col("l_quantity").cast("long")).alias("tw"))
    ps = spark.createDataFrame([(p,) for p in _WEIGHTED_PS], "p double")
    thr = ps.crossJoin(tot)
    return (
        c.join(F.broadcast(thr), F.col("cumw") >= F.col("p") * F.col("tw"))
        .groupBy("p", "tw")
        .agg(F.min("val").alias("q_value"))
        .select("p", "q_value", F.col("tw").alias("total_weight"))
        .orderBy("p")
    )


@register(
    "q_trimmed_winsor_mean",
    shape="bounded+prefix_sum",
    tags=("orderstats", "robust", "agg"),
    oracle=f"""
WITH h AS (
  SELECT value AS val, count(*)::BIGINT AS cnt FROM events GROUP BY 1
), c AS (
  SELECT val, cnt,
         sum(cnt) OVER (ORDER BY val ROWS UNBOUNDED PRECEDING) AS cum_incl,
         coalesce(sum(cnt) OVER (ORDER BY val
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
  FROM h
), t AS (SELECT count(*)::BIGINT AS n,
                (count(*) // {_TRIM_FRAC})::BIGINT AS k FROM events),
kept AS (
  SELECT c.val,
         greatest(least(c.cum_incl, t.n - t.k) - greatest(c.cum_excl, t.k), 0)
           AS kc,
         t.n, t.k,
         min(CASE WHEN c.cum_incl >= t.k + 1 THEN c.val END) OVER () AS lo_b,
         min(CASE WHEN c.cum_incl >= t.n - t.k THEN c.val END) OVER () AS hi_b
  FROM c CROSS JOIN t
)
SELECT n, k,
       {rnd_sql('sum(val * kc) / (n - 2 * k)', 6)} AS trimmed_mean,
       {rnd_sql(
           '(sum(val * kc) + any_value(lo_b) * k + any_value(hi_b) * k) / n', 6
       )} AS winsorized_mean
FROM kept GROUP BY n, k
""",
)
def q_trimmed_winsor_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10%-trimmed and winsorized means of ``events.value`` — the
    robust location estimates quality monitors prefer over the raw mean.
    Row-count trimming with EXACT tie handling: a distinct value
    straddling the trim boundary contributes only its surviving
    multiplicity (clamp of its cumulative range against [k, n−k]);
    winsorizing adds the boundary values (ranks k+1 and n−k) back with
    weight k each.  Histogram + prefix sums only — the classic
    formulation sorts the corpus twice."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(F.col("value").alias("val")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    c = bucketed_cumsum(
        h,
        "val",
        [("cnt", "cum_incl", True), ("cnt", "cum_excl", False)],
        _VALUE_BUCKET,
    )
    tot = ev.agg(
        F.count(F.lit(1)).alias("n"),
        # integer div, not float /: exact floor at any corpus size
        F.expr(f"count(1) div {_TRIM_FRAC}").alias("k"),
    )
    j = c.crossJoin(F.broadcast(tot))
    kc = F.greatest(
        F.least(F.col("cum_incl"), F.col("n") - F.col("k"))
        - F.greatest(F.col("cum_excl"), F.col("k")),
        F.lit(0),
    )
    lo_b = F.min(
        F.when(F.col("cum_incl") >= F.col("k") + 1, F.col("val"))
    )
    hi_b = F.min(
        F.when(F.col("cum_incl") >= F.col("n") - F.col("k"), F.col("val"))
    )
    return j.groupBy("n", "k").agg(
        rnd(
            F.sum(F.col("val") * kc) / (F.col("n") - 2 * F.col("k")), 6
        ).alias("trimmed_mean"),
        rnd(
            (F.sum(F.col("val") * kc) + lo_b * F.col("k") + hi_b * F.col("k"))
            / F.col("n"),
            6,
        ).alias("winsorized_mean"),
    )


@register(
    "q_equi_depth_hist",
    shape="bounded+prefix_sum",
    tags=("orderstats", "histogram", "layout"),
    oracle=f"""
WITH h AS (
  SELECT value AS val, count(*)::BIGINT AS cnt FROM events GROUP BY 1
), c AS (
  SELECT val, cnt,
         coalesce(sum(cnt) OVER (ORDER BY val
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
  FROM h
), t AS (SELECT count(*)::BIGINT AS n FROM events)
SELECT least((c.cum_excl * {_DEPTH_BUCKETS}) // t.n,
             {_DEPTH_BUCKETS - 1})::BIGINT AS bucket,
       sum(c.cnt)::BIGINT AS n_rows,
       min(c.val) AS lo, max(c.val) AS hi,
       {rnd_sql(f'sum(c.cnt) * {_DEPTH_BUCKETS} * 1.0 / t.n', 6)}
         AS fill_ratio
FROM c CROSS JOIN t
GROUP BY 1, t.n
ORDER BY bucket
""",
)
def q_equi_depth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) histogram audit: assign each
    DISTINCT value to the decile its cumulative rank starts in (exact
    integer arithmetic: (cum_excl·10) div n) and report realized bucket
    boundaries and fill ratio — >1.0 exposes tie mass that equi-depth
    binning cannot split, the number that decides between quantile
    bucketing and hash bucketing for a layout key (complements the
    equal-WIDTH q_histogram and the zonemap/zorder layout audits).
    Histogram + prefix sum + one 10-row aggregate."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(F.col("value").alias("val")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    c = bucketed_cumsum(h, "val", [("cnt", "cum_excl", False)], _VALUE_BUCKET)
    tot = ev.agg(F.count(F.lit(1)).alias("n"))
    j = c.crossJoin(F.broadcast(tot))
    bucket = F.least(
        F.expr(f"(cum_excl * {_DEPTH_BUCKETS}) div n"),
        F.lit(_DEPTH_BUCKETS - 1),
    ).cast("long")
    return (
        j.groupBy(bucket.alias("bucket"), "n")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.min("val").alias("lo"),
            F.max("val").alias("hi"),
            rnd(F.sum("cnt") * _DEPTH_BUCKETS * 1.0 / F.first("n"), 6).alias(
                "fill_ratio"
            ),
        )
        .select("bucket", "n_rows", "lo", "hi", "fill_ratio")
        .orderBy("bucket")
    )
