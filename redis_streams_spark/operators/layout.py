"""Partitioned table layout: directory partitioning for partition pruning
(the scan-layer complement to bucketing.py's shuffle elimination).

At 100 TB, time-partitioned fact tables are the default physical layout:
a filter on the partition column prunes whole directories before any IO
(``PartitionFilters`` in the scan node), which is the difference between
scanning a day and scanning a decade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame, path: str, ts_col: str, partition_col: str = "dt"
) -> None:
    """Persist with a derived date partition column."""
    (
        df.withColumn(partition_col, F.to_date(F.col(ts_col)))
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )


def read_pruned(
    spark: SparkSession, path: str, partition_col: str, start: str, end: str
) -> DataFrame:
    """Read with a partition-range filter (prunes directories, not rows)."""
    return spark.read.parquet(path).where(
        (F.col(partition_col) >= start) & (F.col(partition_col) < end)
    )
