"""Fourth relational batch: rank-function family, value window functions,
explicit GROUPING SETS."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table


@register(
    "q_rank_functions",
    shape="per_row",
    tags=("window", "rank"),
    oracle="""
SELECT s_suppkey, s_nationkey,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       ntile(4)       OVER w AS quartile,
       round(5e-10 + percent_rank() OVER w, 6) AS pct_rank,
       round(5e-10 + cume_dist() OVER w, 6) AS cdist
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
ORDER BY s_nationkey, rnk, s_suppkey
""",
)
def q_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function family (rank/dense_rank/ntile/percent_rank/
    cume_dist) partitioned per nation."""
    sup = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), "s_suppkey")
    return (
        sup.select(
            "s_suppkey",
            "s_nationkey",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            rnd(F.percent_rank().over(w), 6).alias("pct_rank"),
            rnd(F.cume_dist().over(w), 6).alias("cdist"),
        )
    )


@register(
    "q_value_windows",
    shape="per_row",
    tags=("window", "value"),
    oracle="""
SELECT o_custkey, o_orderkey,
       round(first_value(o_totalprice) OVER w, 2) AS first_price,
       round(last_value(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
         AS final_price,
       round(coalesce(nth_value(o_totalprice, 2) OVER w, -1.0), 2) AS second_price,
       round(coalesce(lead(o_totalprice) OVER w, 0.0), 2) AS next_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
)
def q_value_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value window functions: first/last/nth_value + lead, with the
    full-partition frame for last_value (the classic default-frame
    gotcha made explicit)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
            F.round(F.last("o_totalprice").over(wfull), 2).alias("final_price"),
            F.round(
                F.coalesce(F.nth_value("o_totalprice", 2).over(w), F.lit(-1.0)), 2
            ).alias("second_price"),
            F.round(F.coalesce(F.lead("o_totalprice").over(w), F.lit(0.0)), 2).alias(
                "next_price"
            ),
        )
    )


@register(
    "q_grouping_sets",
    shape="bounded",
    tags=("agg", "grouping-sets"),
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n,
       round(5e-10 + sum(l_extendedprice), 2) AS total
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY returnflag, linestatus
""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): per-flag,
    per-status, and grand-total rows in one aggregation pass."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n,
               round(5e-10 + sum(l_extendedprice), 2) AS total
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY returnflag, linestatus
        """
    )


_HINT_AGG_SQL = """
  SELECT '{label}' AS strategy, count(*) AS n,
         round(5e-10 + sum(o_totalprice), 2) AS total
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'BUILDING'
"""


@register(
    "q_join_hints",
    shape="bounded",
    tags=("join", "hints", "optimizer"),
    oracle="UNION ALL".join(
        _HINT_AGG_SQL.format(label=s) for s in ("broadcast", "merge", "shuffle_hash")
    )
    + "ORDER BY strategy",
)
def q_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy hint gallery: the SAME join executed under
    broadcast / merge (sort-merge) / shuffle_hash hints, each aggregated
    to (n, total) — three identical result rows proving the physical
    strategy never changes the answer, while `tests/test_plans.py`
    asserts each hint actually took effect (BroadcastHashJoin /
    SortMergeJoin / ShuffledHashJoin nodes).

    Scale relevance: hints are the manual override when AQE's estimates
    miss — a skewed-but-small build side worth broadcasting, or a
    shuffle-hash build that avoids a sort of a huge probe side."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )

    def agg(label: str) -> DataFrame:
        joined = orders.join(cust.hint(label), orders.o_custkey == cust.c_custkey)
        return joined.agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.sum("o_totalprice"), 2).alias("total"),
        ).select(F.lit(label).alias("strategy"), "n", "total")

    return (
        agg("broadcast")
        .unionAll(agg("merge"))
        .unionAll(agg("shuffle_hash"))
        .orderBy("strategy")
    )


@register(
    "q_regression_agg",
    shape="bounded",
    tags=("agg", "stats", "regression"),
    oracle="""
SELECT l_returnflag,
       round(5e-10 + regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(5e-10 + regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(5e-10 + regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       round(5e-10 + corr(l_quantity, l_extendedprice), 6) AS corr_qp,
       round(5e-10 + covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp,
       round(5e-10 + median(l_quantity), 2) AS median_qty,
       regr_count(l_extendedprice, l_quantity)::BIGINT AS n_pairs
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_regression_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate-statistics aggregate family: regr_slope / intercept /
    r2 / count, corr, covar_samp, and exact median per group — the
    moment-based aggregates both engines compute from co-moment sketches
    (single-pass, partial-mergeable, so they distribute like any sum).

    Rounding is calibrated to moment noise: unnormalized moments
    (slope/intercept/covariance) carry summation-order noise up to
    ~1e-8 absolute at this row count, so they round at 4 dp; normalized
    ratios (corr, r2) are ulp-stable and round at 6 dp."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            rnd(F.expr("regr_slope(l_extendedprice, l_quantity)"), 4).alias("slope"),
            rnd(F.expr("regr_intercept(l_extendedprice, l_quantity)"), 4).alias(
                "intercept"
            ),
            rnd(F.expr("regr_r2(l_extendedprice, l_quantity)"), 6).alias("r2"),
            rnd(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
            rnd(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qp"),
            rnd(F.expr("median(l_quantity)"), 2).alias("median_qty"),
            F.expr("regr_count(l_extendedprice, l_quantity)")
            .cast("long")
            .alias("n_pairs"),
        )
        .orderBy("l_returnflag")
    )
