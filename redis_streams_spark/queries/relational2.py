"""Second batch of relational shapes: existence-agg, conditional ratios,
HAVING filters, anti-join + scalar subquery, OR-of-ANDs predicates,
approximate aggregates (rows-only)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table


@register(
    "q04_order_priority",
    shape="bounded",
    tags=("join", "semi", "agg"),
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a correlated non-equi condition →
    planned as a left-semi join on orderkey with the date predicate as a
    join-side filter."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q12_shipmode_priority",
    shape="bounded",
    tags=("join", "agg", "case"),
    oracle="""
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counting over a fact-fact join."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q14_promo_revenue",
    shape="bounded",
    tags=("join", "agg", "ratio"),
    oracle="""
SELECT round(5e-10 + 100.0 * sum(CASE WHEN p_type LIKE 'TYPE_1%'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-08-01 00:00:00'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-revenue ratio with a broadcast dim
    join (part is the small side)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-08-01").cast("timestamp_ntz"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("TYPE_1%"), rev).otherwise(0.0)
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        rnd(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q18_large_orders",
    shape="bounded",
    tags=("agg", "having", "join"),
    oracle="""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
)
SELECT c_custkey, c_name, o_orderkey,
       round(o_totalprice, 2) AS o_totalprice,
       round(total_qty, 2) AS total_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING filter on an aggregate, then join the
    survivors (aggregate-then-join keeps the join probe side tiny)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .where(F.col("raw_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            rnd("o_totalprice", 2).alias("o_totalprice"),
            rnd("raw_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


@register(
    "q19_disjunctive_filter",
    shape="bounded",
    tags=("join", "filter"),
    oracle="""
SELECT round(5e-10 + sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 30)
""",
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides
    (Catalyst extracts the common join key and pushes per-side
    conjuncts)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & (F.col("l_quantity") >= 30))
    )
    return j.where(cond).agg(
        rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q22_global_sales_opportunity",
    shape="bounded",
    tags=("anti", "subquery", "agg"),
    oracle="""
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey,
       count(*) AS numcust,
       round(5e-10 + sum(c_acctbal), 2) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery threshold + anti join
    (above-average-balance customers with no orders since 1999)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz")
    )
    avg_bal = customer.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    rich = customer.crossJoin(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("ab")
    )
    no_orders = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return (
        no_orders.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            rnd(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q_approx_aggs",
    shape="bounded",
    tags=("agg", "approx"),
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_orderkey)::BIGINT AS exact_orders,
       round(5e-10 + percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 2)
         AS exact_median,
       count(*) AS n,
       TRUE AS orders_ok,
       TRUE AS median_ok
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL distinct + quantile sketch).  Sketch
    internals are engine-specific, so the sketch outputs themselves are
    not compared; instead the query emits exact values (hash-compared)
    plus deterministic bounded-error booleans — Spark computes
    ``|approx − exact| / exact ≤ 0.05`` from its own sketches while the
    oracle asserts TRUE, so a sketch drifting out of bound flips the
    boolean and fails the driver hash gate.  At 100 TB the approx forms
    replace exact distinct/percentile where bounded error is acceptable:
    no expand, single pass, mergeable."""
    li = load_table(spark, sf_dir, "lineitem")
    exact_median = F.expr("percentile(l_extendedprice, 0.5)")
    agg = li.groupBy("l_returnflag").agg(
        # rsd 0.02 / accuracy 1000 (not 0.01/10000): the tighter sketches
        # cost 14 s vs 2.7 s at sf0.01 — the count_distinct Expand doubles
        # the rows every sketch ingests — and the 5% bound below has ample
        # margin at either setting (sketches are deterministic per input,
        # verified green at sf0.001/0.01/0.1)
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median"),
        rnd(exact_median, 2).alias("exact_median"),
        F.count(F.lit(1)).alias("n"),
    )
    rel_err = lambda approx, exact: F.abs(approx - F.col(exact)) / F.col(exact)  # noqa: E731
    return (
        agg.select(
            "l_returnflag",
            "exact_orders",
            "exact_median",
            "n",
            (rel_err(F.col("approx_orders"), "exact_orders") <= 0.05).alias("orders_ok"),
            (rel_err(F.col("approx_median"), "exact_median") <= 0.05).alias("median_ok"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_map_json_functions",
    shape="per_row",
    tags=("scalar", "json", "map"),
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k')::BIGINT AS k_value,
       upper(event_type) AS event_upper,
       concat('u', user_id::VARCHAR) AS user_tag
FROM events
WHERE json_extract_string(props, '$.k')::BIGINT > 90
ORDER BY event_id
""",
)
def q_map_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over the events props column (schema-on-read of a
    semi-structured payload — the typed-projection step of SURVEY §1.2
    applied to JSON instead of a map)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select(
            "event_id",
            k.alias("k_value"),
            F.upper("event_type").alias("event_upper"),
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("user_tag"),
        )
        .where(F.col("k_value") > 90)
    )
