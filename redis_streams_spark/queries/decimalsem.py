"""DECIMAL (money) semantics: exact fixed-point sums, explicit-scale
division, and decimal↔double boundary behavior.

Float money drifts; engines differ in *promotion* rules (Spark sums
DECIMAL(18,2) into DECIMAL(28,2), DuckDB into DECIMAL(38,2)), so every
output is explicitly cast to a fixed scale both sides — the discipline a
real money pipeline needs anyway.  Values then hash identically because
fixed-point arithmetic is exact: no epsilon, no rnd().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table


@register(
    "q_decimal_money",
    shape="bounded",
    tags=("decimal", "sql-surface"),
    oracle="""
WITH d AS (
  SELECT c_mktsegment, c_acctbal::DECIMAL(18,2) AS bal FROM customer
)
SELECT c_mktsegment,
       count(*) AS n,
       sum(bal)::DECIMAL(18,2) AS total_bal,
       (sum(bal) / count(*))::DECIMAL(18,6) AS avg_bal,
       max(bal)::DECIMAL(18,2) AS max_bal,
       (sum(bal) * 3 / 100)::DECIMAL(18,4) AS fee_3pct,
       sum((bal * 100)::BIGINT)::BIGINT AS cents_sum
FROM d
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q_decimal_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point money aggregation: balances cast to DECIMAL(18,2) at
    the source, summed exactly (no float drift at ANY row count — the
    100 TB argument for decimal money columns), divided at an explicit
    scale, and cross-checked by an integer cents sum.  Every output is
    pinned to a declared scale because Spark and DuckDB promote decimal
    sums to different precisions."""
    cust = load_table(spark, sf_dir, "customer")
    d = cust.select(
        "c_mktsegment", F.col("c_acctbal").cast("decimal(18,2)").alias("bal")
    )
    return (
        d.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("bal").cast("decimal(18,2)").alias("total_bal"),
            (F.sum("bal") / F.count(F.lit(1)))
            .cast("decimal(18,6)")
            .alias("avg_bal"),
            F.max("bal").cast("decimal(18,2)").alias("max_bal"),
            (F.sum("bal") * 3 / 100).cast("decimal(18,4)").alias("fee_3pct"),
            F.sum((F.col("bal") * 100).cast("long")).cast("long").alias("cents_sum"),
        )
        .orderBy("c_mktsegment")
    )
