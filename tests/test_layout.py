"""Partition pruning: the date filter must prune directories at plan
time, and results must match the unpartitioned filter."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from redis_streams_spark.operators.layout import read_pruned, write_date_partitioned
from redis_streams_spark.plans import plan_str
from redis_streams_spark.session import load_table


def test_partition_pruning(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_day")
    write_date_partitioned(ev, path, ts_col="ts")
    n_days = len([d for d in os.listdir(path) if d.startswith("dt=")])
    assert n_days > 5  # one dir per day

    pruned = read_pruned(spark, path, "dt", "2024-01-03", "2024-01-05")
    plan = plan_str(pruned)
    assert "PartitionFilters" in plan
    # plan-level pruning: the partition filter appears in the scan, and
    # row counts match the logical filter on the original table
    expected = ev.where(
        (F.to_date("ts") >= "2024-01-03") & (F.to_date("ts") < "2024-01-05")
    ).count()
    assert pruned.count() == expected
    assert expected > 0
