"""Bucketed table layout: pre-shuffle once at write time so every later
join/aggregation on the bucket key is shuffle-free (SURVEY 'Partitioning
& shuffle': co-located joins via bucketing).

At 100 TB this is the difference between re-shuffling 100 TB per join and
reading co-located buckets: fact tables get bucketed by their join key at
ingest, and Catalyst's EnsureRequirements sees the matching
HashPartitioning on both sides and drops the Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on ``key`` — no Exchange on either side
    (assert with plans.plan_str: the SortMergeJoin's children go straight
    to the scans)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=key, how=how)
