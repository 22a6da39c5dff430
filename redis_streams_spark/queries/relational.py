"""Core relational operator surface (SURVEY §2.2), Spark built-ins only.

The reference delegates all relational processing to a user callback
(`/root/reference/example_implementation/consumer.py:10-16`), so this module
is where the Spark DataFrame/SQL layer supplies scans, projection/filter,
joins (inner/outer/semi/anti), hash aggregation, grouping sets
(rollup/cube), window functions, sorts/limits/top-k, set ops, scalar
functions, exact/distinct/statistical aggregates, and pivot.

Determinism policy (shared with the DuckDB oracles):
- money sums rounded to 2 dp, averages 4 dp, ratios/stats 6 dp — buries
  double summation-order noise (~1e-10 relative) far below the rounding.
- counts are BIGINT on both sides; DuckDB integer SUMs cast ``::BIGINT``.
- timestamps are TIMESTAMP_NTZ on both sides (see session.load_table).

Scale notes are on each query: broadcast hints for dimension tables,
partial aggregation everywhere (groupBy().agg of algebraic functions),
windows partitioned by high-cardinality keys so no single-partition sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table, register_views
from redis_streams_spark.functions.rounding import rnd


@register(
    "q01_pricing_summary",
    shape="bounded",
    bench=True,
    tags=("agg", "scan", "filter"),
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(5e-10 + sum(l_quantity), 2)                                      AS sum_qty,
       round(5e-10 + sum(l_extendedprice), 2)                                 AS sum_base_price,
       round(5e-10 + sum(l_extendedprice * (1 - l_discount)), 2)              AS sum_disc_price,
       round(5e-10 + sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(5e-10 + avg(l_quantity), 4)                                      AS avg_qty,
       round(5e-10 + avg(l_extendedprice), 4)                                 AS avg_price,
       round(5e-10 + avg(l_discount), 4)                                      AS avg_disc,
       count(*)                                                       AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan→filter→hash agg (8 aggregates)→sort.

    Scale: filter + column pruning push to the parquet scan; all aggregates
    are algebraic → map-side partial agg; shuffle carries only 6 groups.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
            rnd(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            rnd(F.sum(disc_price), 2).alias("sum_disc_price"),
            rnd(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            rnd(F.avg("l_quantity"), 4).alias("avg_qty"),
            rnd(F.avg("l_extendedprice"), 4).alias("avg_price"),
            rnd(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q03_shipping_priority",
    shape="bounded",
    bench=True,
    tags=("join", "agg", "topk"),
    oracle="""
SELECT l_orderkey,
       round(5e-10 + sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → 3-way join → agg → top-k.

    Scale: ``customer`` filtered on segment is ~1/5 of an already small
    dim → broadcast to both fact joins; lineitem/orders join shuffles on
    orderkey (co-partitioned keys).  Top-k is a sort of the aggregated
    (small) side only.
    """
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q05_local_supplier",
    shape="bounded",
    bench=True,
    tags=("join", "agg"),
    oracle="""
SELECT n_name,
       round(5e-10 + sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def q05_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with region restriction.

    Scale: region/nation/supplier/customer are dims → broadcast chain; the
    only big-big join is lineitem⋈orders on orderkey.
    """
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    nr = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    sup = supplier.join(F.broadcast(nr), supplier.s_nationkey == nr.n_nationkey)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(
            F.broadcast(customer),
            (orders.o_custkey == customer.c_custkey)
            & (sup.s_nationkey == customer.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q06_revenue_forecast",
    shape="bounded",
    tags=("agg", "filter"),
    oracle="""
SELECT round(5e-10 + sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q06_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: multi-predicate scan → scalar aggregate.

    Scale: all four predicates push down to parquet; result is one row —
    the whole query is a map-side partial sum + single-row final.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q10_returned_items",
    shape="bounded",
    bench=True,
    tags=("join", "agg", "topk"),
    oracle="""
SELECT c_custkey, c_name,
       round(5e-10 + sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(5e-10 + c_acctbal, 2) AS c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            rnd(F.col("c_acctbal"), 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q_market_share",
    shape="bounded",
    tags=("join", "window", "agg"),
    oracle="""
WITH rev AS (
  SELECT r_name AS region,
         year(o_orderdate)::BIGINT AS o_year,
         n2.n_name AS supp_nation,
         sum(l_extendedprice * (1 - l_discount)) AS revenue
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  GROUP BY 1, 2, 3
)
SELECT region, o_year, supp_nation,
       round(5e-10 + revenue, 2) AS revenue,
       round(5e-10 + revenue / sum(revenue) OVER (PARTITION BY region, o_year), 6) AS mkt_share
FROM rev
ORDER BY region, o_year, supp_nation
""",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: supplier-nation market share inside each
    customer-region/year — join pyramid + windowed share-of-total."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n1 = nation.alias("n1")
    n2 = nation.alias("n2")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), customer.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n2), supplier.s_nationkey == F.col("n2.n_nationkey"))
        .groupBy(
            F.col("r_name").alias("region"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.col("n2.n_name").alias("supp_nation"),
        )
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("raw_rev"))
    )
    w = W.partitionBy("region", "o_year")
    return (
        rev.select(
            "region",
            "o_year",
            "supp_nation",
            rnd(F.col("raw_rev"), 2).alias("revenue"),
            rnd(F.col("raw_rev") / F.sum("raw_rev").over(w), 6).alias("mkt_share"),
        )
        .orderBy("region", "o_year", "supp_nation")
    )


@register(
    "q_top_parts_per_brand",
    shape="bounded",
    tags=("window", "topk"),
    oracle="""
SELECT p_brand, p_partkey, p_name, p_retailprice, rn
FROM (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
) t
WHERE rn <= 3
ORDER BY p_brand, rn
""",
)
def q_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window (the scalable top-k idiom: no
    global sort, per-brand partitions rank independently)."""
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.col("p_partkey"))
    return (
        part.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rn")
        .orderBy("p_brand", "rn")
    )


@register(
    "q_customer_running",
    shape="per_row",
    tags=("window",),
    oracle="""
SELECT o_custkey, o_orderkey,
       round(5e-10 + sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING), 2)  AS running_total,
       round(5e-10 + avg(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3,
       round(5e-10 + coalesce(lag(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey), 0.0), 2) AS prev_price,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
ORDER BY o_custkey, order_seq
""",
)
def q_customer_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: running total, moving average, lag — partitioned
    by customer so frames never cross executor partitions."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            rnd(
                F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2
            ).alias("running_total"),
            rnd(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
            rnd(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 2).alias(
                "prev_price"
            ),
            F.row_number().over(w).alias("order_seq"),
        )
    )


@register(
    "q_rollup_lineitem",
    shape="bounded",
    tags=("agg", "grouping-sets"),
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       (grouping(l_returnflag) + grouping(l_linestatus))::BIGINT AS lvl,
       count(*) AS n,
       round(5e-10 + sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus, lvl
""",
)
def q_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets with GROUPING() disambiguation."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") + F.grouping("l_linestatus")).cast("long").alias("lvl"),
            F.count(F.lit(1)).alias("n"),
            rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "lvl",
            "n",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus", "lvl")
    )


@register(
    "q_cube_orders",
    shape="bounded",
    tags=("agg", "grouping-sets"),
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL')   AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n,
       round(5e-10 + sum(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
""",
)
def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over order status × priority."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), rnd(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .orderBy("status", "priority")
    )


@register(
    "q_setops_customers",
    shape="bounded",
    tags=("setops",),
    oracle="""
WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
               AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'),
     y97 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
               AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
SELECT 'both'      AS bucket, count(*) AS n FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97) t
UNION ALL
SELECT 'only_1996' AS bucket, count(*) AS n FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97) t
UNION ALL
SELECT 'only_1997' AS bucket, count(*) AS n FROM (SELECT * FROM y97 EXCEPT SELECT * FROM y96) t
ORDER BY bucket
""",
)
def q_setops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over yearly active-customer sets."""
    orders = load_table(spark, sf_dir, "orders")

    def active(y: int) -> DataFrame:
        return (
            orders.where(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp_ntz"))
            )
            .select("o_custkey")
            .distinct()
        )

    y96, y97 = active(1996), active(1997)
    both = y96.intersect(y97).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("bucket"), "n"
    )
    only96 = y96.exceptAll(y97).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("only_1996").alias("bucket"), "n"
    )
    only97 = y97.exceptAll(y96).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("only_1997").alias("bucket"), "n"
    )
    return both.unionAll(only96).unionAll(only97).orderBy("bucket")


@register(
    "q_semi_anti_join",
    shape="bounded",
    tags=("join",),
    oracle="""
SELECT 'customers_without_orders' AS bucket, count(*) AS n
FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
UNION ALL
SELECT 'suppliers_with_shipments' AS bucket, count(*) AS n
FROM supplier WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)
ORDER BY bucket
""",
)
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (NOT EXISTS) and LEFT SEMI (EXISTS) joins."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    no_orders = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("customers_without_orders").alias("bucket"), "n")
    )
    with_ship = (
        supplier.join(li, supplier.s_suppkey == li.l_suppkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("suppliers_with_shipments").alias("bucket"), "n")
    )
    return no_orders.unionAll(with_ship).orderBy("bucket")


@register(
    "q_scalar_gallery",
    shape="per_row",
    tags=("scalar",),
    oracle="""
SELECT p_partkey,
       upper(p_name)                                   AS name_upper,
       substr(p_type, 1, 5)                            AS type_prefix,
       concat(p_brand, ':', p_type)                    AS brand_type,
       length(p_name)                                  AS name_len,
       replace(p_brand, 'Brand#', 'B')                 AS brand_short,
       lpad(p_size::VARCHAR, 4, '0')                   AS size_padded,
       abs(p_retailprice - 1000.0)                     AS price_dist,
       round(5e-10 + sqrt(p_retailprice), 6)                   AS price_sqrt,
       round(5e-10 + ln(p_retailprice + 1), 6)                 AS price_ln,
       round(5e-10 + pow(p_size, 2.0), 1)                      AS size_sq,
       floor(p_retailprice)::BIGINT                    AS price_floor,
       ceil(p_retailprice)::BIGINT                     AS price_ceil,
       sign(p_retailprice - 1000.0)::BIGINT            AS price_sign,
       CASE WHEN p_size < 10 THEN 'small'
            WHEN p_size < 30 THEN 'medium'
            ELSE 'large' END                           AS size_class,
       coalesce(nullif(p_brand, 'Brand#1'), 'DEFAULT') AS brand_or_default,
       greatest(p_size, 25)                            AS size_floor25,
       least(p_size, 25)                               AS size_cap25
FROM part
ORDER BY p_partkey
""",
)
def q_scalar_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function projection gallery: string / math / conditional."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.substring("p_type", 1, 5).alias("type_prefix"),
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
            F.length("p_name").alias("name_len"),
            F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias("brand_short"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
            F.abs(F.col("p_retailprice") - 1000.0).alias("price_dist"),
            rnd(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
            rnd(F.log(F.col("p_retailprice") + 1), 6).alias("price_ln"),
            rnd(F.pow("p_size", F.lit(2.0)), 1).alias("size_sq"),
            F.floor("p_retailprice").alias("price_floor"),
            F.ceil("p_retailprice").alias("price_ceil"),
            F.signum(F.col("p_retailprice") - 1000.0).cast("long").alias("price_sign"),
            F.when(F.col("p_size") < 10, "small")
            .when(F.col("p_size") < 30, "medium")
            .otherwise("large")
            .alias("size_class"),
            F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#1")), F.lit("DEFAULT")).alias(
                "brand_or_default"
            ),
            F.greatest(F.col("p_size"), F.lit(25)).alias("size_floor25"),
            F.least(F.col("p_size"), F.lit(25)).alias("size_cap25"),
        )
    )


@register(
    "q_percentiles",
    shape="bounded",
    tags=("agg", "percentile"),
    oracle="""
SELECT l_returnflag,
       round(5e-10 + median(l_extendedprice), 4) AS median_price,
       round(5e-10 + percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p25,
       round(5e-10 + percentile_cont(0.75) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p75,
       round(5e-10 + percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p95
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == duckdb
    ``percentile_cont``); approx variants are covered by the bench path."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            rnd(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
            rnd(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("p25"),
            rnd(F.expr("percentile(l_extendedprice, 0.75)"), 4).alias("p75"),
            rnd(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_stats_agg",
    shape="bounded",
    tags=("agg", "stats"),
    oracle="""
SELECT l_returnflag,
       round(5e-10 + stddev_samp(l_extendedprice), 4) AS sd_price,
       round(5e-10 + var_samp(l_quantity), 4)         AS var_qty,
       round(5e-10 + corr(l_quantity, l_extendedprice), 6)        AS corr_qty_price,
       round(5e-10 + covar_samp(l_quantity, l_extendedprice), 4)  AS covar_qty_price,
       round(5e-10 + min(l_extendedprice), 2) AS min_price,
       round(5e-10 + max(l_extendedprice), 2) AS max_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/var/corr/covar (algebraic → map-side
    partials combine exactly like sum/count)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            rnd(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
            rnd(F.var_samp("l_quantity"), 4).alias("var_qty"),
            rnd(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            rnd(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
            rnd(F.min("l_extendedprice"), 2).alias("min_price"),
            rnd(F.max("l_extendedprice"), 2).alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_distinct_agg",
    shape="bounded",
    tags=("agg", "distinct"),
    oracle="""
SELECT c_mktsegment,
       count(DISTINCT c_nationkey)::BIGINT AS n_nations,
       count(*)                            AS n_customers,
       sum(DISTINCT c_nationkey)::BIGINT AS sum_distinct_nation
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregates (expand + two-phase agg under the hood)."""
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
            F.sum_distinct(F.col("c_nationkey")).cast("long").alias("sum_distinct_nation"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q_string_agg",
    shape="bounded",
    tags=("agg", "string"),
    oracle="""
SELECT c_mktsegment,
       string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (collect_set → sort → join: deterministic
    on both engines)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("nations")
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q_pivot_status",
    shape="bounded",
    tags=("pivot",),
    oracle="""
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS status_p,
       round(5e-10 + sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS total_f,
       round(5e-10 + sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS total_o,
       round(5e-10 + sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2) AS total_p
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (explicit values avoid the extra
    distinct-scan Spark needs to discover pivot columns)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("status_f"),
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("status_o"),
            F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("status_p"),
            rnd(F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))), 2).alias("total_f"),
            rnd(F.sum(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))), 2).alias("total_o"),
            rnd(F.sum(F.when(F.col("o_orderstatus") == "P", F.col("o_totalprice"))), 2).alias("total_p"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_full_outer_balance",
    shape="bounded",
    tags=("join", "outer"),
    oracle="""
SELECT n_name,
       coalesce(cust.n_cust, 0)  AS n_customers,
       coalesce(supp.n_supp, 0)  AS n_suppliers,
       round(5e-10 + coalesce(cust.cust_bal, 0.0), 2) AS customer_balance,
       round(5e-10 + coalesce(supp.supp_bal, 0.0), 2) AS supplier_balance
FROM nation
LEFT JOIN (SELECT c_nationkey, count(*) AS n_cust, sum(c_acctbal) AS cust_bal
           FROM customer GROUP BY c_nationkey) cust ON n_nationkey = cust.c_nationkey
LEFT JOIN (SELECT s_nationkey, count(*) AS n_supp, sum(s_acctbal) AS supp_bal
           FROM supplier GROUP BY s_nationkey) supp ON n_nationkey = supp.s_nationkey
ORDER BY n_name
""",
)
def q_full_outer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer joins of pre-aggregated fact sides against the nation dim
    (aggregate-then-join: shuffles carry one row per nation, not per
    customer)."""
    nation = load_table(spark, sf_dir, "nation")
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"), F.sum("c_acctbal").alias("cust_bal"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"), F.sum("s_acctbal").alias("supp_bal"))
    )
    return (
        nation.join(cust, nation.n_nationkey == cust.c_nationkey, "left")
        .join(supp, nation.n_nationkey == supp.s_nationkey, "left")
        .select(
            "n_name",
            F.coalesce("n_cust", F.lit(0)).alias("n_customers"),
            F.coalesce("n_supp", F.lit(0)).alias("n_suppliers"),
            rnd(F.coalesce("cust_bal", F.lit(0.0)), 2).alias("customer_balance"),
            rnd(F.coalesce("supp_bal", F.lit(0.0)), 2).alias("supplier_balance"),
        )
        .orderBy("n_name")
    )


@register(
    "q_exists_subquery",
    shape="bounded",
    tags=("join", "subquery"),
    oracle="""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_quantity > 45
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS via Spark SQL (planned as a left-semi join)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_quantity > 45
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )
