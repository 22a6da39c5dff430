"""AQE skew-join evidence (SCALE.md): the same hot-key join shape that
q_salted_join handles with MANUAL salting, left UNSALTED and handed to
adaptive execution instead.

Builds a deliberately skewed fact side (~90% of lineitem rows collapse
onto one join key), disables broadcast so the join is a sort-merge, and
lowers the skew thresholds so sf0.1 partition sizes trip the same logic
a 100 TB run trips at the defaults (256 MB / 5x median).  Asserts the
final adaptive plan shows `SortMergeJoin(skew=true)` with an
`AQEShuffleRead ... skewed` on the fact side.

Two constraints discovered while building this — both are why the manual
salted path (operators/skew.py) still exists next to AQE:

1. OptimizeSkewedJoin only fires on the exact physical pattern
   ``SMJ(Sort(Shuffle), Sort(Shuffle))``.  Any operator between the
   shuffle and the join — e.g. the SortAggregate a ``dropDuplicates``
   puts on the dim side — blocks the rewrite entirely (splitting an
   aggregation's input would duplicate groups).  The dim here is
   therefore built unique-by-construction.
2. Skewed partitions are split by MAPPER RANGES, so a shuffle whose map
   stage has one task (locally: one parquet row group) can never be
   split — detection reports the skew (5 MB vs 24 KB median) but
   "number of skewed partitions: 0".  The ``repartition(16)`` below
   simulates the many-mapper map stage every real cluster scan has; at
   100 TB this constraint is unreachable (thousands of mappers).

Usage: python tools/aqe_skew_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from redis_streams_spark.session import get_spark, load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("aqe-skew-demo")
    # force the shuffle join (no broadcast escape hatch) and make the
    # sf0.1-sized hot partition cross AQE's skew detection bar; at real
    # scale the DEFAULTS (256 MB, 5x median) trip on the same shape
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")

    # repartition = stand-in for a real cluster's many-mapper scan stage
    # (see module docstring, constraint 2)
    li = load_table(spark, sf_dir, "lineitem").repartition(16)
    # ~90% of rows collapse onto key 0 — the unsalted version of the skew
    # q_salted_join spreads manually
    fact = li.select(
        F.when(F.col("l_orderkey") % 10 != 0, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
        "l_extendedprice",
    )
    # dim keys unique BY CONSTRUCTION — a dropDuplicates here would park a
    # SortAggregate between shuffle and join and block OptimizeSkewedJoin
    # (see module docstring, constraint 1)
    dim = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 10 == 0)
        .select(F.col("o_orderkey").alias("k"), "o_orderpriority")
        .unionByName(
            spark.createDataFrame([(0, "0-HOT")], "k bigint, o_orderpriority string")
        )
    )
    joined = (
        fact.join(dim, "k")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_extendedprice").alias("total"))
    )
    t0 = time.perf_counter()
    rows = joined.collect()
    elapsed = time.perf_counter() - t0

    plan = joined._jdf.queryExecution().executedPlan().toString()
    join_lines = [
        ln.strip()
        for ln in plan.split("== Initial Plan ==")[0].splitlines()
        if "SortMergeJoin" in ln or "AQEShuffleRead" in ln
    ]
    print(f"wall: {elapsed:.2f}s, groups: {len(rows)}")
    for ln in join_lines:
        print(ln)
    assert any("skew=true" in ln for ln in join_lines), (
        "AQE did not mark the join skewed — thresholds no longer trip?"
    )
    assert any("skewed" in ln for ln in join_lines if "AQEShuffleRead" in ln)
    print("OK: AQE split the hot key's partition (skew=true)")
    spark.stop()


if __name__ == "__main__":
    main()
