"""NULL-semantics coverage: null-skipping aggregates, null grouping keys,
null-safe equality joins, and three-valued-logic filters.

The synthetic test tables are NULL-free, so each query DERIVES nullable
columns in-query (``nullif`` / guarded CASE) and then exercises the engine
semantics that differ between naive and correct implementations: COUNT(col)
vs COUNT(*), AVG over nulls, GROUP BY a null key, ``<=>`` (Spark) vs
``IS NOT DISTINCT FROM`` (DuckDB) as a join predicate, and NOT IN's
three-valued-logic trap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table


@register(
    "q_null_gallery",
    shape="bounded",
    tags=("nulls", "aggregation"),
    oracle=f"""
WITH d AS (
  SELECT nullif(c_mktsegment, 'MACHINERY') AS seg,
         CASE WHEN c_acctbal > 5000 THEN c_acctbal END AS rich_bal,
         c_acctbal
  FROM customer
)
SELECT coalesce(seg, '<null>') AS seg_key,
       count(*) AS cnt_all,
       count(seg)::BIGINT AS cnt_seg,
       count(rich_bal)::BIGINT AS cnt_rich,
       {rnd_sql('coalesce(sum(rich_bal), 0.0)', 2)} AS sum_rich,
       {rnd_sql('coalesce(avg(rich_bal), -1.0)', 2)} AS avg_rich,
       sum(CASE WHEN rich_bal IS NULL THEN 1 ELSE 0 END)::BIGINT AS cnt_null_rich,
       sum(CASE WHEN seg IS NOT DISTINCT FROM 'BUILDING' THEN 1 ELSE 0 END)::BIGINT
         AS nullsafe_building
FROM d
GROUP BY seg
ORDER BY seg_key
""",
)
def q_null_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate NULL semantics in one sweep: COUNT(col) skips nulls while
    COUNT(*) doesn't, SUM/AVG ignore nulls (and return null for all-null
    groups — coalesced to sentinels so both engines emit identical
    values), and GROUP BY keeps a dedicated null-key group.  One
    partial-agg shuffle on the derived key; nothing here changes shape
    with scale."""
    cust = load_table(spark, sf_dir, "customer")
    d = cust.select(
        F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("seg"),
        F.when(F.col("c_acctbal") > 5000, F.col("c_acctbal")).alias("rich_bal"),
    )
    return (
        d.groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("cnt_all"),
            F.count("seg").cast("long").alias("cnt_seg"),
            F.count("rich_bal").cast("long").alias("cnt_rich"),
            rnd(F.coalesce(F.sum("rich_bal"), F.lit(0.0)), 2).alias("sum_rich"),
            rnd(F.coalesce(F.avg("rich_bal"), F.lit(-1.0)), 2).alias("avg_rich"),
            F.sum(F.when(F.col("rich_bal").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("cnt_null_rich"),
            F.sum(F.when(F.col("seg").eqNullSafe(F.lit("BUILDING")), 1).otherwise(0))
            .cast("long")
            .alias("nullsafe_building"),
        )
        .select(
            F.coalesce(F.col("seg"), F.lit("<null>")).alias("seg_key"),
            "cnt_all",
            "cnt_seg",
            "cnt_rich",
            "sum_rich",
            "avg_rich",
            "cnt_null_rich",
            "nullsafe_building",
        )
        .orderBy("seg_key")
    )


@register(
    "q_null_safe_join",
    shape="bounded",
    tags=("nulls", "join"),
    oracle="""
WITH facts AS (
  SELECT o_orderkey,
         nullif(o_orderpriority, '3-MEDIUM') AS prio
  FROM orders
), dim AS (
  SELECT nullif(x.prio, '3-MEDIUM') AS prio, x.score
  FROM (VALUES ('1-URGENT', 100), ('2-HIGH', 80), ('3-MEDIUM', 50),
               ('4-NOT SPECIFIED', 10), ('5-LOW', 20)) AS x(prio, score)
)
SELECT coalesce(f.prio, '<null>') AS prio_key,
       count(*) AS n_orders,
       any_value(d.score) AS score
FROM facts f JOIN dim d ON f.prio IS NOT DISTINCT FROM d.prio
GROUP BY f.prio
ORDER BY prio_key
""",
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join: Spark's ``<=>`` (EqualNullSafe) joins the
    null-priority fact rows to the null dim row instead of dropping them —
    the semantics an outer-join-plus-filter rewrite gets wrong.  The dim
    side is a 5-row literal frame and broadcast, so the null-safe
    comparison never forces a shuffle of the fact side."""
    orders = load_table(spark, sf_dir, "orders")
    facts = orders.select(
        "o_orderkey", F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("prio")
    )
    dim = spark.createDataFrame(
        [
            ("1-URGENT", 100),
            ("2-HIGH", 80),
            ("3-MEDIUM", 50),
            ("4-NOT SPECIFIED", 10),
            ("5-LOW", 20),
        ],
        "prio string, score int",
    ).select(F.nullif(F.col("prio"), F.lit("3-MEDIUM")).alias("prio"), "score")
    return (
        facts.join(F.broadcast(dim), facts["prio"].eqNullSafe(dim["prio"]))
        .groupBy(facts["prio"])
        .agg(F.count(F.lit(1)).alias("n_orders"), F.any_value(F.col("score")).alias("score"))
        .select(
            F.coalesce(facts["prio"], F.lit("<null>")).alias("prio_key"),
            "n_orders",
            "score",
        )
        .orderBy("prio_key")
    )


@register(
    "q_not_in_nulls",
    shape="bounded",
    tags=("nulls", "subquery"),
    oracle="""
WITH probe AS (
  SELECT c_custkey, nullif(c_nationkey, 7) AS nk FROM customer
)
SELECT
  (SELECT count(*) FROM probe WHERE nk NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey < 5))::BIGINT
    AS cnt_not_in_clean,
  (SELECT count(*) FROM probe
   WHERE nk NOT IN (SELECT nullif(n_nationkey, 3) FROM nation WHERE n_nationkey < 5))::BIGINT
    AS cnt_not_in_with_null,
  (SELECT count(*) FROM probe
   WHERE nk IS NOT NULL AND NOT EXISTS (
     SELECT 1 FROM nation WHERE nullif(n_nationkey, 3) = probe.nk AND n_nationkey < 5))::BIGINT
    AS cnt_not_exists
""",
)
def q_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN three-valued-logic trap, measured: a NULL in the
    subquery list makes ``x NOT IN (...)`` UNKNOWN for every non-matching
    row, collapsing the count toward 0, while NOT EXISTS keeps row-by-row
    semantics.  All three counts in one row — the regression canary for
    anyone 'optimizing' NOT IN into an anti-join without the null guard.
    (Spark plans the null-aware case as a BroadcastHashJoin in NAAJ mode
    — a hash join, so the plan gate's cartesian/BNLJ sweep passes it
    without any whitelist entry.)"""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cust.select(
        "c_custkey", F.nullif(F.col("c_nationkey"), F.lit(7)).alias("nk")
    ).createOrReplaceTempView("probe_nn")
    nation.createOrReplaceTempView("nation_nn")
    return spark.sql(
        """
SELECT
  (SELECT count(*) FROM probe_nn
   WHERE nk NOT IN (SELECT n_nationkey FROM nation_nn WHERE n_nationkey < 5))
    AS cnt_not_in_clean,
  (SELECT count(*) FROM probe_nn
   WHERE nk NOT IN (SELECT nullif(n_nationkey, 3) FROM nation_nn WHERE n_nationkey < 5))
    AS cnt_not_in_with_null,
  (SELECT count(*) FROM probe_nn
   WHERE nk IS NOT NULL AND NOT EXISTS (
     SELECT 1 FROM nation_nn WHERE nullif(n_nationkey, 3) = probe_nn.nk
       AND n_nationkey < 5))
    AS cnt_not_exists
"""
    )
