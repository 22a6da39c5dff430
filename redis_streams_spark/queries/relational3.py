"""Third relational batch: correlated-min subquery (Q2 shape), array/map
function gallery, arg-min/max aggregates, RANGE window frames, unpivot."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table


@register(
    "q02_cheapest_supplier",
    shape="bounded",
    tags=("join", "subquery", "agg"),
    oracle="""
WITH nat AS (
  SELECT n_nationkey, n_name FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), min_bal AS (
  SELECT s_nationkey, min(s_acctbal) AS mb
  FROM supplier JOIN nat ON s_nationkey = n_nationkey
  GROUP BY s_nationkey
)
SELECT n_name, s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier
JOIN nat ON s_nationkey = n_nationkey
JOIN min_bal ON supplier.s_nationkey = min_bal.s_nationkey
            AND s_acctbal = min_bal.mb
ORDER BY n_name, s_suppkey
""",
)
def q02_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-group minimum via a correlated aggregate
    subquery, rewritten as aggregate + re-join (the decorrelated plan
    Catalyst itself produces)."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    nat = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    sup_nat = supplier.join(F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey)
    min_bal = sup_nat.groupBy(F.col("s_nationkey").alias("mk")).agg(
        F.min("s_acctbal").alias("mb")
    )
    return (
        sup_nat.join(
            F.broadcast(min_bal),
            (sup_nat.s_nationkey == min_bal.mk) & (sup_nat.s_acctbal == min_bal.mb),
        )
        .select("n_name", "s_suppkey", "s_name", rnd("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("n_name", "s_suppkey")
    )


@register(
    "q_array_gallery",
    shape="bounded",
    tags=("scalar", "array"),
    oracle="""
SELECT vec_id,
       len(embedding)::BIGINT AS dim,
       round(5e-10 + embedding[1]::DOUBLE, 6) AS first_val,
       round(5e-10 + embedding[len(embedding)]::DOUBLE, 6) AS last_val,
       round(5e-10 + list_aggregate(list_transform(embedding, x -> x::DOUBLE), 'max'), 6) AS max_val,
       round(5e-10 + list_aggregate(list_transform(embedding, x -> x::DOUBLE), 'min'), 6) AS min_val,
       len(list_filter(embedding, x -> x > 0))::BIGINT AS n_positive,
       round(5e-10 + list_reduce(list_transform(embedding[1:8], x -> x::DOUBLE),
                        (a, b) -> a + b), 6) AS head8_sum,
       round(5e-10 + list_reduce(list_transform(list_reverse(embedding)[1:4],
                                       x -> x::DOUBLE), (a, b) -> a + b), 6) AS tail4_sum
FROM embeddings
ORDER BY vec_id
""",
)
def q_array_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over embeddings: indexing, slice, reverse,
    filter, min/max, folds — all JVM higher-order functions."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    v = F.col("v")
    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    return (
        base.select(
            "vec_id",
            F.size(v).cast("long").alias("dim"),
            rnd(F.element_at(v, 1), 6).alias("first_val"),
            rnd(F.element_at(v, -1), 6).alias("last_val"),
            rnd(F.array_max(v), 6).alias("max_val"),
            rnd(F.array_min(v), 6).alias("min_val"),
            F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_positive"),
            rnd(fold(F.slice(v, 1, 8)), 6).alias("head8_sum"),
            rnd(fold(F.slice(F.reverse(v), 1, 4)), 6).alias("tail4_sum"),
        )
        .orderBy("vec_id")
    )


@register(
    "q_argminmax",
    shape="bounded",
    tags=("agg", "argmax"),
    oracle="""
SELECT l_returnflag,
       arg_max(l_orderkey, l_extendedprice + l_orderkey * 1e-9) AS priciest_order,
       arg_min(l_orderkey, l_extendedprice - l_orderkey * 1e-9) AS cheapest_order,
       round(max(l_extendedprice), 2) AS max_price,
       round(min(l_extendedprice), 2) AS min_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-min/max aggregates (Spark max_by/min_by ≡ DuckDB
    arg_max/arg_min); the 1e-9·orderkey tiebreak makes the winning row
    unique so both engines agree deterministically."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "max_by(l_orderkey, l_extendedprice + l_orderkey * 1e-9)"
            ).alias("priciest_order"),
            F.expr(
                "min_by(l_orderkey, l_extendedprice - l_orderkey * 1e-9)"
            ).alias("cheapest_order"),
            rnd(F.max("l_extendedprice"), 2).alias("max_price"),
            rnd(F.min("l_extendedprice"), 2).alias("min_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_range_frame",
    shape="per_row",
    tags=("window", "range-frame"),
    oracle="""
SELECT o_orderkey, o_custkey,
       count(*) OVER w AS n_similar_price,
       round(5e-10 + sum(o_totalprice) OVER w, 2) AS sum_similar_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
ORDER BY o_orderkey
""",
)
def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based, not row-based): orders within
    ±1000 of each order's price AMONG THAT CUSTOMER'S ORDERS.

    Partitioned by o_custkey so the value-ordered frame parallelizes by
    key — an unpartitioned RANGE frame serializes the whole table
    through one task, the shape the fleet plan gate
    (test_no_unguarded_global_windows) now rejects.  The global-range
    semantics, when genuinely needed, use the binned two-phase pattern:
    aggregate per fixed-width price bin, then window over the bounded
    bin marginals."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-1000, 1000)
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.count(F.lit(1)).over(w).alias("n_similar_price"),
            # frame SUM, not AVG: sums of 2dp money values are exact
            # decimals, so incremental-window float noise (~1e-7) can
            # never flip the 2dp rounding; an avg (sum/count) lands on
            # arbitrary reals and straddles boundaries at high row counts
            rnd(F.sum("o_totalprice").over(w), 2).alias("sum_similar_price"),
        )
    )


@register(
    "q_unpivot",
    shape="bounded",
    tags=("unpivot",),
    oracle="""
SELECT c_custkey, metric, round(5e-10 + value, 4) AS value
FROM (
  SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
  UNION ALL
  SELECT c_custkey, 'nationkey' AS metric, c_nationkey::DOUBLE AS value FROM customer
) t
WHERE c_custkey <= 200
ORDER BY c_custkey, metric
""",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt (wide → long) via the native unpivot operator."""
    customer = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 200)
    wide = customer.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return (
        wide.unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "value")
        .select("c_custkey", "metric", rnd("value", 4).alias("value"))
        .orderBy("c_custkey", "metric")
    )
