"""Runtime bloom-filter join pruning evidence (SCALE.md).

A selective dim filter (URGENT + high-value orders) joined against the
full fact table: Spark's runtime row-level filtering builds a bloom
filter over the dim join keys (`bloom_filter_agg`) and injects a
`might_contain` predicate into the FACT SCAN, so non-matching fact rows
die before the shuffle instead of after it.  At 100 TB this is the
difference between shuffling the whole fact table and shuffling only the
~selectivity fraction that can possibly join.

Locally the injection thresholds must come down
(`applicationSideScanSizeThreshold` defaults to 10 GB — sized for real
clusters); at production scale the DEFAULTS fire on exactly this shape.

Usage: python tools/bloom_filter_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from redis_streams_spark.plans import plan_str  # noqa: E402
from redis_streams_spark.session import get_spark, load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bloom-demo")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    # local-scale thresholds; cluster-scale defaults (10 MB creation /
    # 10 GB application) trip on the same shape at 100 TB
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "1KB",
    )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 300000)
    )
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = plan_str(j)
    agg_lines = [ln.strip() for ln in plan.splitlines() if "bloom_filter_agg" in ln]
    mc_lines = [ln.strip() for ln in plan.splitlines() if "might_contain" in ln]
    assert agg_lines, "no bloom_filter_agg on the creation (dim) side"
    assert mc_lines, "no might_contain runtime filter on the fact scan"
    print("creation side:", agg_lines[0][:120])
    print("fact-scan filter:", mc_lines[0][:160])

    t0 = time.perf_counter()
    rows = j.collect()
    print(f"wall: {time.perf_counter() - t0:.2f}s, result: {rows}")
    print("OK: runtime bloom filter prunes the fact scan before the shuffle")
    spark.stop()


if __name__ == "__main__":
    main()
