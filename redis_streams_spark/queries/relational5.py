"""TPC-H query-shape completion (Q7/Q9/Q11/Q13/Q15/Q16/Q17/Q20/Q21).

Together with relational.py (Q1/Q3/Q5/Q6/Q10, Q8 as q_market_share,
Q2/Q4/Q12/Q14/Q18/Q19/Q22 elsewhere) this closes out the classic TPC-H
operator shapes over the driver's trimmed schemas.  The fixtures carry no
``partsupp`` table and no comment columns, so three queries substitute a
documented stand-in (distinct ``(l_partkey, l_suppkey)`` pairs as the
part-supplier relation; ``p_retailprice``-derived cost; attribute filters
in place of comment LIKEs) while keeping the plan shape that matters —
the joins, correlations, and aggregation structure are the TPC-H ones.

Scale notes per query; all dims broadcast, facts shuffle on their keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table


@register(
    "q07_volume_shipping",
    shape="bounded",
    tags=("join", "agg"),
    oracle="""
SELECT supp_nation, cust_nation, l_year, round(5e-10 + sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume by year between two nations.

    Scale: both nation filters broadcast through supplier/customer; the
    only big-big join is lineitem⋈orders on orderkey."""
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    )
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            rnd(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q09_product_profit",
    shape="bounded",
    tags=("join", "agg"),
    oracle="""
SELECT nation, o_year, round(5e-10 + sum(amount), 2) AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount)
           - 0.1 * p_retailprice * l_quantity AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_type = 'PROMO'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by nation and year over a part filter.

    The fixtures have no partsupp/ps_supplycost, so cost is the documented
    stand-in ``0.1 * p_retailprice * l_quantity`` — the 5-way join +
    reaggregation shape is Q9's.  Scale: part filter broadcast, supplier→
    nation broadcast chain; lineitem⋈orders shuffles on orderkey."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(load_table(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.1) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(rnd(F.sum(amount), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q11_important_stock",
    shape="bounded",
    tags=("agg", "scalar-subquery"),
    oracle="""
WITH v AS (
  SELECT s_nationkey, round(5e-10 + sum(l_extendedprice * l_quantity), 2) AS val
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY s_nationkey
)
SELECT n_name, val AS value
FROM v JOIN nation ON s_nationkey = n_nationkey
WHERE val > (SELECT round(5e-10 + sum(val) * 0.09, 2) FROM v)
ORDER BY value DESC, n_name
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: group value filtered against a global-total scalar
    subquery (HAVING share > fraction).  partsupp stand-in: supplier-keyed
    lineitem value.  Both comparison operands are rounded to 2 dp BEFORE
    the filter so the engines compare identical decimals — comparing raw
    double sums is order-dependent at the ulp level and can flip row
    membership across engines (same convention as q15's max).  Scale: the
    scalar global total is a 1-row broadcast cross join, not a driver
    collect; the per-nation agg is partial+final."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    v = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2).alias("val")
        )
    )
    total = v.agg(rnd(F.sum("val") * 0.09, 2).alias("threshold"))
    return (
        v.crossJoin(F.broadcast(total))
        .where(F.col("val") > F.col("threshold"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", F.col("val").alias("value"))
        .orderBy(F.desc("value"), "n_name")
    )


@register(
    "q13_customer_distribution",
    shape="bounded",
    tags=("join", "outer", "agg"),
    oracle="""
WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT JOIN with an extra ON-clause predicate (the
    comment LIKE becomes a priority filter), per-customer count, then the
    count-of-counts distribution.  Scale: two partial+final aggs; the
    outer join shuffles on custkey; zero-order customers survive via the
    left join (count(o_orderkey) ignores the null)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(
        orders,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderpriority") != "1-URGENT"),
        "left",
    )
    c_orders = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q15_top_supplier",
    shape="bounded",
    tags=("agg", "scalar-subquery"),
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(5e-10 + sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue view, suppliers at the global
    maximum (ties kept).  The max comparison runs on the 2-dp-rounded
    revenue so both engines compare identical decimals.  Scale: revenue
    agg is partial+final on suppkey; the max is a 1-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    sup = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(sup), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_cnt",
    shape="bounded",
    tags=("join", "anti", "distinct-agg"),
    oracle="""
SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey)::BIGINT AS supplier_cnt
FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      FROM lineitem) ps
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 15, 23, 36, 45, 49)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct part-supplier relation (stand-in: distinct
    lineitem pairs), attribute filters, NOT IN exclusion (anti join),
    count-distinct suppliers per (brand, type, size).  The comment-LIKE
    exclusion becomes negative-balance suppliers.  Scale: the exclusion
    list is a broadcast anti join; distinct runs partial+final."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).distinct()
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 15, 23, 36, 45, 49)
    )
    bad_sup = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    return (
        ps.join(
            F.broadcast(bad_sup),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_quantity",
    shape="bounded",
    tags=("join", "correlated"),
    oracle="""
SELECT round(5e-10 + sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23' AND p_size < 25
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average threshold.  The
    correlated scalar subquery decorrelates into a per-part aggregate
    joined back — at 100 TB that is one partial+final agg on partkey plus
    an equi-join, never a per-row subquery execution.  Container filter
    becomes a size filter (fixtures carry no p_container)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") < 25)
    )
    # per-part thresholds over ALL lineitems of that part (not only the
    # brand-filtered ones) — matches the correlated subquery's scope
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(thresholds, F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(rnd(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q20_part_promotion",
    shape="bounded",
    tags=("join", "semi", "having"),
    oracle="""
SELECT s_name, round(5e-10 + s_acctbal, 2) AS s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'SMALL'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 50
  )
ORDER BY s_name
""",
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN — suppliers in one nation who moved more
    than a threshold quantity of some filtered part.  The partsupp
    availability check becomes the shipped-quantity HAVING (no partsupp
    table).  Scale: inner agg shuffles on (suppkey, partkey); the IN is a
    semi join on the (small) qualifying-supplier set; nation broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "SMALL")
    qualifying = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        sup.join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", rnd(F.col("s_acctbal"), 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


@register(
    "q21_waiting_supplier",
    shape="bounded",
    tags=("join", "exists", "anti"),
    oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: double-correlated EXISTS / NOT EXISTS self-joins on
    lineitem — the supplier who alone returned items on a multi-supplier
    finished order (receipt/commit dates absent, returnflag carries the
    "late" role).  Scale: both correlations are semi/anti self-joins
    equi-keyed on orderkey (the non-equi suppkey inequality rides as a
    join residual), so everything hash-partitions on orderkey — the
    classic decorrelation; no per-row subqueries."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l1 = li.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    base = (
        l1.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey")),
            "left_anti",
        )
    )
    return (
        base.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "q_datetime_gallery",
    shape="bounded",
    tags=("scalar", "datetime"),
    oracle="""
SELECT o_orderkey,
       year(o_orderdate)    AS yr,
       month(o_orderdate)   AS mth,
       quarter(o_orderdate) AS qtr,
       day(o_orderdate)     AS dom,
       isodow(o_orderdate) - 1 AS wd,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(o_orderdate::DATE + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
       date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS days_since_epoch_95,
       strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS eom,
       strftime(o_orderdate, '%Y-%m') AS ym
FROM orders
WHERE o_orderkey < 2000
ORDER BY o_orderkey
""",
)
def q_datetime_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar gallery: extraction (year/month/quarter/day/
    weekday), truncation, date arithmetic, day difference, end-of-month,
    and formatting — all pure projections that stay in whole-stage
    codegen.  Date-typed results are rendered as strings so both engines
    emit identical values (weekday normalized to Monday=0 on both)."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate")
    return (
        orders.select(
            "o_orderkey",
            F.year(d).cast("long").alias("yr"),
            F.month(d).cast("long").alias("mth"),
            F.quarter(d).cast("long").alias("qtr"),
            F.dayofmonth(d).cast("long").alias("dom"),
            F.weekday(d).cast("long").alias("wd"),
            F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
            F.date_format(F.date_add(F.to_date(d), 30), "yyyy-MM-dd").alias("plus30"),
            F.datediff(F.to_date(d), F.lit("1995-01-01").cast("date"))
            .cast("long")
            .alias("days_since_epoch_95"),
            F.date_format(F.last_day(F.to_date(d)), "yyyy-MM-dd").alias("eom"),
            F.date_format(d, "yyyy-MM").alias("ym"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q_lateral_topn",
    shape="bounded",
    tags=("join", "lateral", "topn"),
    oracle="""
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2
) t
ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
""",
)
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join (SQL:1999 lateral derived table,
    Spark 3.2+ `LATERAL`): per-nation top-2 customers by balance.
    Exercises the lateral-join planner surface directly; Catalyst
    decorrelates this into the same window-rank-filter plan the
    DataFrame `row_number() <= k` idiom produces, so the per-driving-row
    re-execution a naive reading implies never happens — the plan
    survives any nation/customer cardinality."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_lv")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_lv")
    return spark.sql(
        """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation_lv n,
LATERAL (
  SELECT c_name, c_acctbal FROM customer_lv c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2
) t
ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
"""
    )
