"""Scale-technique queries: the oracle for each salted operator is the
PLAIN (unsalted) SQL — proving the skew-safe plan computes identical
results."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.operators.skew import salted_groupby, salted_join
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table


@register(
    "q_salted_agg",
    tags=("scale", "skew", "agg"),
    oracle="""
SELECT l_returnflag,
       round(5e-10 + sum(l_quantity), 2) AS sum_qty,
       count(*) AS cnt,
       round(5e-10 + max(l_extendedprice), 2) AS max_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a low-cardinality (= maximally
    skewed) grouping key; oracle = the plain aggregation.  At 100 TB a
    3-value groupBy funnels everything into 3 reducers — the salt stage
    spreads each key over 8 sub-aggregations first."""
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_groupby(
        li,
        keys=["l_returnflag"],
        salt_source="l_orderkey",
        n_salt=8,
        partials={
            "raw_sum": (F.sum("l_quantity"), F.sum("raw_sum")),
            "cnt": (F.count(F.lit(1)), F.sum("cnt")),
            "raw_max": (F.max("l_extendedprice"), F.max("raw_max")),
        },
    )
    return (
        out.select(
            "l_returnflag",
            rnd("raw_sum", 2).alias("sum_qty"),
            "cnt",
            rnd("raw_max", 2).alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_salted_join",
    tags=("scale", "skew", "join"),
    bench=True,
    oracle="""
SELECT o_orderpriority,
       count(*) AS n_lines,
       round(5e-10 + sum(l_extendedprice), 2) AS total
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (build side replicated 4×, probe rows routed by
    deterministic salt) aggregated after; oracle = the plain join.  This
    is the manual fallback for skew AQE can't fix (e.g. when the build
    side must broadcast-replicate)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(
        li,
        orders,
        probe_key="l_orderkey",
        build_key="o_orderkey",
        salt_source="l_linenumber",
        n_salt=4,
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            rnd(F.sum("l_extendedprice"), 2).alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_heavy_hitters",
    tags=("scale", "skew", "diagnostics"),
    oracle="""
WITH per_key AS (
  SELECT l_suppkey AS key, count(*) AS n
  FROM lineitem GROUP BY l_suppkey
), stats AS (
  SELECT key, n,
         sum(n) OVER () AS total,
         avg(n) OVER () AS mean_n
  FROM per_key
)
SELECT key, n,
       round(5e-10 + n * 1.0 / total, 6) AS share,
       round(5e-10 + n / mean_n, 4) AS skew_factor
FROM stats
ORDER BY n DESC, key
LIMIT 20
""",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter audit for a prospective join/agg key: top-20 keys by
    row count with corpus share and skew factor (count / mean count) —
    the diagnostic that decides WHICH keys need the salting treatment
    (`q_salted_agg`/`q_salted_join`) before a 100 TB shuffle.

    Scale shape: one partial-aggregated groupBy to key cardinality, then
    windows + top-k over the (small) per-key aggregate.  At extreme key
    cardinality the exact count can be swapped for a count-min sketch;
    the exact form is the auditable baseline."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w_all = Window.partitionBy()
    return (
        per_key.select(
            "key",
            "n",
            rnd(F.col("n") * 1.0 / F.sum("n").over(w_all), 6).alias("share"),
            rnd(F.col("n") / F.avg("n").over(w_all), 4).alias("skew_factor"),
        )
        .orderBy(F.desc("n"), "key")
        .limit(20)
    )
