"""Data-quality / table-management operators (SURVEY §2.2: absent in the
reference — a stream consumer framework has no table layer — supplied here
as the dbt-test-style validation surface every large ingest pipeline runs
before promoting a snapshot): declarative constraint checks, snapshot
diffing, and column profiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.hashing import h32, h32_sql
from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table


@register(
    "q_dq_constraints",
    shape="bounded",
    tags=("quality", "constraints"),
    oracle="""
WITH o AS (
  SELECT count(*) AS n,
         sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust,
         count(*) - count(DISTINCT o_orderkey) AS dup_keys,
         sum(CASE WHEN o_orderstatus NOT IN ('O', 'F') THEN 1 ELSE 0 END)
           AS bad_status,
         sum(CASE WHEN o_totalprice <= 0 OR o_totalprice > 450000
                  THEN 1 ELSE 0 END) AS bad_price
  FROM orders
), l AS (
  SELECT sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                  THEN 1 ELSE 0 END) AS bad_disc
  FROM lineitem
), fk AS (
  SELECT count(*) AS orphans
  FROM lineitem li LEFT JOIN orders od ON li.l_orderkey = od.o_orderkey
  WHERE od.o_orderkey IS NULL
)
SELECT * FROM (
  SELECT 'not_null_o_custkey' AS check_name, 'orders' AS table_name,
         null_cust::BIGINT AS n_violations, null_cust = 0 AS passed FROM o
  UNION ALL
  SELECT 'unique_o_orderkey', 'orders', dup_keys::BIGINT, dup_keys = 0 FROM o
  UNION ALL
  SELECT 'accepted_values_o_orderstatus', 'orders', bad_status::BIGINT,
         bad_status = 0 FROM o
  UNION ALL
  SELECT 'range_o_totalprice', 'orders', bad_price::BIGINT,
         bad_price = 0 FROM o
  UNION ALL
  SELECT 'range_l_discount', 'lineitem', bad_disc::BIGINT,
         bad_disc = 0 FROM l
  UNION ALL
  SELECT 'fk_lineitem_orders', 'lineitem', orphans::BIGINT,
         orphans = 0 FROM fk
) ORDER BY check_name
""",
)
def q_dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt-test-style constraint suite: not-null, uniqueness,
    accepted-values, numeric-range and referential-integrity checks,
    one result row per check with the violation count.  (The
    accepted-values check deliberately omits status 'P' so the suite
    demonstrably COUNTS violations rather than rubber-stamping.)

    Scale shape: all same-table checks fold into ONE conditional
    aggregation per table (single scan, map-side combined); only the FK
    check needs a join, expressed as a LEFT-ANTI count on the join key.
    Every branch reduces to a 1-row frame before the tiny union."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    cnt = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731
    o = orders.agg(
        cnt(F.col("o_custkey").isNull()).alias("null_cust"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_keys"),
        cnt(~F.col("o_orderstatus").isin("O", "F")).alias("bad_status"),
        cnt(
            (F.col("o_totalprice") <= 0) | (F.col("o_totalprice") > 450000)
        ).alias("bad_price"),
    )
    l = li.agg(
        cnt((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).alias(
            "bad_disc"
        )
    )
    fk = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphans"))
    )

    def row(src: DataFrame, col: str, check: str, table: str) -> DataFrame:
        return src.select(
            F.lit(check).alias("check_name"),
            F.lit(table).alias("table_name"),
            F.col(col).cast("long").alias("n_violations"),
            (F.col(col) == 0).alias("passed"),
        )

    out = (
        row(o, "null_cust", "not_null_o_custkey", "orders")
        .unionAll(row(o, "dup_keys", "unique_o_orderkey", "orders"))
        .unionAll(row(o, "bad_status", "accepted_values_o_orderstatus", "orders"))
        .unionAll(row(o, "bad_price", "range_o_totalprice", "orders"))
        .unionAll(row(l, "bad_disc", "range_l_discount", "lineitem"))
        .unionAll(row(fk, "orphans", "fk_lineitem_orders", "lineitem"))
    )
    return out.orderBy("check_name")


@register(
    "q_table_diff",
    shape="bounded",
    tags=("quality", "snapshot-diff"),
    oracle=f"""
WITH new_snap AS (
  SELECT o_orderkey,
         CASE WHEN {h32_sql("o_orderkey::VARCHAR")} % 20 = 1
              THEN round(5e-10 + o_totalprice * 1.1, 2)
              ELSE o_totalprice END AS o_totalprice
  FROM orders
  WHERE {h32_sql("o_orderkey::VARCHAR")} % 20 <> 0
), joined AS (
  SELECT CASE WHEN n.o_orderkey IS NULL THEN 'removed'
              WHEN o.o_totalprice <> n.o_totalprice THEN 'changed'
              ELSE 'unchanged' END AS change_type,
         coalesce(n.o_totalprice, 0) - o.o_totalprice AS delta
  FROM orders o LEFT JOIN new_snap n USING (o_orderkey)
)
SELECT change_type, count(*) AS n_rows,
       round(5e-10 + sum(delta), 2) AS total_price_delta
FROM joined GROUP BY change_type ORDER BY change_type
""",
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff: compare a table against its next version (here
    simulated deterministically — every h32%20==0 key deleted, every
    h32%20==1 key repriced +10%) and classify each key as
    removed/changed/unchanged with the aggregate value drift — the audit
    step behind incremental publishing / CDC reconciliation.

    Scale shape: both sides partition on the SAME join key, so the diff
    is one co-partitioned sort-merge join followed by a tiny class agg;
    nothing is collected and the simulated side is a filter+projection
    of the same scan (no second read in the logical plan)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    h = h32(F.col("o_orderkey").cast("string")) % 20
    new_snap = orders.where(h != 0).select(
        "o_orderkey",
        F.when(h == 1, rnd(F.col("o_totalprice") * 1.1, 2))
        .otherwise(F.col("o_totalprice"))
        .alias("n_totalprice"),
    )
    joined = orders.join(new_snap, "o_orderkey", "left").select(
        F.when(F.col("n_totalprice").isNull(), "removed")
        .when(F.col("n_totalprice") != F.col("o_totalprice"), "changed")
        .otherwise("unchanged")
        .alias("change_type"),
        (F.coalesce("n_totalprice", F.lit(0.0)) - F.col("o_totalprice")).alias(
            "delta"
        ),
    )
    return (
        joined.groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            rnd(F.sum("delta"), 2).alias("total_price_delta"),
        )
        .orderBy("change_type")
    )


_HIST_WIDTH = 25000
_HIST_NBINS = 20


@register(
    "q_histogram",
    shape="bounded",
    tags=("quality", "profiling", "histogram"),
    oracle=f"""
WITH b AS (
  SELECT least(floor(o_totalprice / {_HIST_WIDTH})::BIGINT,
               {_HIST_NBINS - 1}) AS bucket,
         o_totalprice
  FROM orders
), h AS (
  SELECT bucket, bucket * {_HIST_WIDTH} AS bucket_lo,
         count(*) AS n,
         round(5e-10 + avg(o_totalprice), 2) AS avg_price
  FROM b GROUP BY bucket
)
SELECT bucket, bucket_lo, n, avg_price,
       round(5e-10 + sum(n) OVER (ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         * 1.0 / sum(n) OVER (), 4) AS cum_share
FROM h ORDER BY bucket
""",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram of o_totalprice (20 × 25k buckets,
    top bucket open-ended) with per-bucket count/mean and the cumulative
    distribution share — the equi-width profile a table-stats collector
    materializes for optimizer/skew diagnostics.

    Scale shape: bucketing is a pure projection so the histogram is one
    map-side-combined aggregation to ≤20 rows; the CDF window runs over
    those 20 rows only.  Fixed LITERAL bucket bounds keep the float
    division bit-identical across engines (data-derived bounds would
    round-trip through a second aggregate)."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / _HIST_WIDTH), F.lit(_HIST_NBINS - 1)
    )
    h = (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
        .withColumn("bucket_lo", F.col("bucket") * _HIST_WIDTH)
    )
    wcum = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.partitionBy()
    return h.select(
        "bucket",
        "bucket_lo",
        "n",
        "avg_price",
        rnd(
            F.sum("n").over(wcum) * 1.0 / F.sum("n").over(wall), 4
        ).alias("cum_share"),
    ).orderBy("bucket")


@register(
    "q_profile_table",
    shape="bounded",
    tags=("quality", "profiling"),
    oracle="""
WITH s AS (
  SELECT count(*) AS n,
         count(o_orderkey) AS nn_orderkey,
         count(DISTINCT o_orderkey) AS nd_orderkey,
         count(o_custkey) AS nn_custkey,
         count(DISTINCT o_custkey) AS nd_custkey,
         count(o_orderstatus) AS nn_status,
         count(DISTINCT o_orderstatus) AS nd_status,
         count(o_totalprice) AS nn_price,
         count(DISTINCT o_totalprice) AS nd_price,
         count(o_orderpriority) AS nn_prio,
         count(DISTINCT o_orderpriority) AS nd_prio
  FROM orders
)
SELECT * FROM (
  SELECT 'o_orderkey' AS column_name, n::BIGINT AS n_rows,
         (n - nn_orderkey)::BIGINT AS n_null, nd_orderkey::BIGINT AS n_distinct
  FROM s
  UNION ALL
  SELECT 'o_custkey', n::BIGINT, (n - nn_custkey)::BIGINT, nd_custkey::BIGINT
  FROM s
  UNION ALL
  SELECT 'o_orderstatus', n::BIGINT, (n - nn_status)::BIGINT,
         nd_status::BIGINT FROM s
  UNION ALL
  SELECT 'o_totalprice', n::BIGINT, (n - nn_price)::BIGINT,
         nd_price::BIGINT FROM s
  UNION ALL
  SELECT 'o_orderpriority', n::BIGINT, (n - nn_prio)::BIGINT,
         nd_prio::BIGINT FROM s
) ORDER BY column_name
""",
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (row count, NULL count, exact distinct count) for
    five orders columns, long format — the schema-drift fingerprint a
    pipeline records per snapshot to catch silent upstream changes.

    Scale shape: one aggregation computes every per-column statistic in
    a single scan (Catalyst plans the multi-distinct via Expand — one
    shuffle, no per-column re-reads); the wide→long pivot happens on the
    1-row result.  At 100 TB swap the exact distincts for
    approx_count_distinct and the plan collapses to map-side sketches."""
    orders = load_table(spark, sf_dir, "orders")
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
    ]
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    s = orders.agg(*aggs)
    out = None
    for c in cols:
        part = s.select(
            F.lit(c).alias("column_name"),
            F.col("n").alias("n_rows"),
            (F.col("n") - F.col(f"nn_{c}")).alias("n_null"),
            F.col(f"nd_{c}").alias("n_distinct"),
        )
        out = part if out is None else out.unionAll(part)
    return out.orderBy("column_name")
