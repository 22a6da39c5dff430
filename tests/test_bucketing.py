"""Bucketed co-located join: correctness + shuffle-free plan."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from redis_streams_spark.operators.bucketing import colocated_join, write_bucketed
from redis_streams_spark.plans import plan_str
from redis_streams_spark.session import load_table


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    import shutil

    for t in ("li_b", "ord_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"/tmp/spark-graft-warehouse/{t}", ignore_errors=True)
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"), "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"), "o_totalprice"
    )
    write_bucketed(li, "li_b", "orderkey", n_buckets=4)
    write_bucketed(orders, "ord_b", "orderkey", n_buckets=4)

    # disable auto-broadcast: at test scale both sides fit the broadcast
    # threshold, which hides the bucketing (at 100 TB they would not)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "li_b", "ord_b", "orderkey")
        plan = plan_str(joined)
        # the join must contain no shuffle Exchange (bucket layout
        # satisfies the required HashPartitioning on both sides)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        n_exchanges = len(re.findall(r"\bExchange\b", plan))
        assert n_exchanges == 0, f"bucketed join still shuffles:\n{plan[:800]}"

        # correctness: same count as the plain join
        expected = li.join(orders, "orderkey").count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
