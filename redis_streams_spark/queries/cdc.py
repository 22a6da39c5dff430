"""CDC / upsert / sampling queries with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.hashing import h32, h32_sql
from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.operators.upsert import merge_upsert, scd2_from_stream
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_MS = "unix_millis(cast(ts as timestamp))"


@register(
    "q_upsert_merge",
    shape="bounded",
    tags=("cdc", "upsert"),
    oracle="""
WITH changes AS (
  SELECT c_custkey, c_name, c_nationkey,
         round(c_acctbal + 500.0, 2) AS c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 10 = 0
), unioned AS (
  SELECT *, 0 AS prio FROM customer
  UNION ALL
  SELECT * , 1 AS prio FROM changes
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY prio DESC) AS rn
  FROM unioned
)
SELECT c_nationkey,
       count(*) AS n_customers,
       round(5e-10 + sum(c_acctbal), 2) AS total_balance,
       count(*) FILTER (WHERE c_custkey % 10 = 0) AS n_updated
FROM ranked WHERE rn = 1
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-INTO emulation (latest-wins upsert): a change set (+500.0
    balance for every 10th customer) merged into the customer dim, then
    aggregated.  One shuffle, no join (union + priority pick)."""
    customer = load_table(spark, sf_dir, "customer")
    changes = customer.where(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") + 500.0, 2)
    )
    merged = merge_upsert(customer, changes, key="c_custkey")
    return (
        merged.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            rnd(F.sum("c_acctbal"), 2).alias("total_balance"),
            F.count(F.when(F.col("c_custkey") % 10 == 0, 1)).alias("n_updated"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q_scd2_events",
    shape="per_row",
    tags=("cdc", "scd2"),
    oracle=f"""
WITH ordered AS (
  SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), changes AS (
  SELECT user_id, event_type, ms, event_id FROM ordered
  WHERE prev IS NULL OR event_type <> prev
)
SELECT user_id, event_type,
       ms AS valid_from_ms,
       -- sentinel -1 instead of NULL: a nullable BIGINT column gets
       -- float-promoted by pandas-based canonicalizers (NaN), breaking
       -- the int-vs-float type-family check against Spark's bigint
       coalesce(lead(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id), -1)
         AS valid_to_ms,
       lead(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) IS NULL AS is_current
FROM changes
ORDER BY user_id, valid_from_ms
""",
)
def q_scd2_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 from a change stream: per-user event_type history as
    validity intervals (consecutive duplicates collapsed, open-ended
    current row)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr(_MS).alias("ms"), "event_id"
    )
    hist = scd2_from_stream(
        ev, key="user_id", attr="event_type", ts_col="ms", order_col="event_id"
    )
    return (
        hist.select(
            "user_id",
            "event_type",
            F.col("valid_from").alias("valid_from_ms"),
            F.coalesce(F.col("valid_to"), F.lit(-1)).alias("valid_to_ms"),
            "is_current",
        )
    )


@register(
    "q_hash_sample",
    shape="bounded",
    tags=("sampling",),
    oracle=f"""
SELECT count(*) AS n_sampled,
       round(5e-10 + avg(o_totalprice), 4) AS avg_price,
       round(5e-10 + 100.0 * count(*) /
             (SELECT count(*) FROM orders), 4) AS sample_pct
FROM orders
WHERE {h32_sql("o_orderkey::VARCHAR")} % 100 < 10
""",
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~10% sample via key hashing (h32(key)%100 < 10) — the
    deterministic alternative to RNG TABLESAMPLE: stable across runs,
    engines, and re-partitioning, so samples are joinable across tables
    sampled on the same key."""
    orders = load_table(spark, sf_dir, "orders")
    total = orders.count()
    sampled = orders.where(h32(F.col("o_orderkey").cast("string")) % 100 < 10)
    return sampled.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        rnd(F.avg("o_totalprice"), 4).alias("avg_price"),
        rnd(100.0 * F.count(F.lit(1)) / F.lit(total), 4).alias("sample_pct"),
    )


@register(
    "q_hash_sample_join",
    shape="bounded",
    tags=("sampling", "join"),
    oracle=f"""
WITH so AS (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE {h32_sql("o_orderkey::VARCHAR")} % 100 < 10
), sl AS (
  SELECT l_orderkey, l_extendedprice FROM lineitem
  WHERE {h32_sql("l_orderkey::VARCHAR")} % 100 < 10
)
SELECT count(DISTINCT o_orderkey)::BIGINT AS n_orders,
       count(*) AS n_lines,
       round(5e-10 + sum(l_extendedprice), 2) AS line_value
FROM so JOIN sl ON o_orderkey = l_orderkey
""",
)
def q_hash_sample_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The payoff of key-hash sampling (vs RNG TABLESAMPLE): two tables
    sampled INDEPENDENTLY on the same key stay joinable — every sampled
    order keeps ALL its sampled lineitems, because membership depends
    only on h32(orderkey).  A 10% row sample of each side would keep
    ~1% of pairs; this keeps 10% of complete order groups."""
    orders = load_table(spark, sf_dir, "orders").where(
        h32(F.col("o_orderkey").cast("string")) % 100 < 10
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        h32(F.col("l_orderkey").cast("string")) % 100 < 10
    )
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .agg(
            F.count_distinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_lines"),
            rnd(F.sum("l_extendedprice"), 2).alias("line_value"),
        )
    )


@register(
    "q_reservoir_group_sample",
    shape="bounded",
    tags=("sampling",),
    oracle=f"""
WITH ranked AS (
  SELECT o_orderstatus, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_orderstatus
           ORDER BY {h32_sql("o_orderkey::VARCHAR")}, o_orderkey) AS rk
  FROM orders
)
SELECT o_orderstatus, rk AS sample_rank, o_orderkey, o_totalprice
FROM ranked WHERE rk <= 5 ORDER BY o_orderstatus, rk
""",
)
def q_reservoir_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size-per-group sample (the distributed,
    replayable equivalent of per-group reservoir sampling): rank rows
    inside each group by the key hash — a uniform-but-stable order — and
    keep the first k.  Unlike rand()-based reservoirs the sample is
    identical across runs, engines, and repartitioning, so downstream
    fixtures and debug slices never churn.

    Scale shape: TWO-PHASE top-k — a single per-group window would sort
    each group in ONE task (measured: 6× degradation at 10× data with
    only 3 status groups).  Phase 1 ranks within (group, salt-of-key)
    sub-partitions — |groups|×64-way parallel — and keeps each salt's
    top k; the group's true top k by hash order is necessarily inside
    some salt's top k, so phase 2's window runs over ≤ 64·k rows per
    group and emits the identical result."""
    orders = load_table(spark, sf_dir, "orders")
    hkey = h32(F.col("o_orderkey").cast("string"))
    salt = F.pmod(F.col("o_orderkey"), F.lit(64))
    w1 = W.partitionBy("o_orderstatus", salt).orderBy(hkey, "o_orderkey")
    cand = (
        orders.select(
            "o_orderstatus",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w1).alias("r1"),
        )
        .where(F.col("r1") <= 5)
    )
    w2 = W.partitionBy("o_orderstatus").orderBy(hkey, "o_orderkey")
    return (
        cand.select(
            "o_orderstatus",
            F.row_number().over(w2).cast("long").alias("sample_rank"),
            "o_orderkey",
            "o_totalprice",
        )
        .where(F.col("sample_rank") <= 5)
        .orderBy("o_orderstatus", "sample_rank")
    )
