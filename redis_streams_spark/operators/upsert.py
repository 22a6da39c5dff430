"""Upsert / CDC patterns without a table format (SURVEY guide: 'CDC/SCD2
→ MERGE INTO needs Delta; emulate with anti-join + union + window').

- ``merge_upsert``: latest-wins merge of a change set into a target
  (the MERGE INTO WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT shape).
- ``scd2_from_stream``: slowly-changing-dimension type 2 — turn a change
  stream into validity intervals via lead() windows.

Both are pure DataFrame ops: the merge is one shuffle on the key; SCD2 is
one window per key partition.  At 100 TB the upsert target would be a
bucketed table on the merge key so the shuffle disappears (see
operators/bucketing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """Latest-wins upsert: rows from ``changes`` replace same-key rows in
    ``target``; unmatched change rows are inserts.  Both inputs must share
    a schema.  Implemented as union + per-key priority pick (change=1
    beats target=0) — one hash shuffle, no join at all."""
    t = target.withColumn("__prio", F.lit(0))
    c = changes.withColumn("__prio", F.lit(1))
    w = W.partitionBy(key).orderBy(F.desc("__prio"))
    return (
        t.unionByName(c)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__prio", "__rn")
    )


def scd2_from_stream(
    changes: DataFrame, key: str, attr: str, ts_col: str, order_col: str
) -> DataFrame:
    """Type-2 history: one row per (key, change) with [valid_from,
    valid_to) and is_current; consecutive duplicate attribute values are
    collapsed (only true changes open a new version)."""
    w = W.partitionBy(key).orderBy(ts_col, order_col)
    marked = changes.withColumn("__prev", F.lag(attr).over(w)).where(
        F.col("__prev").isNull() | (F.col(attr) != F.col("__prev"))
    )
    w2 = W.partitionBy(key).orderBy(ts_col, order_col)
    return (
        marked.withColumn("valid_to", F.lead(ts_col).over(w2))
        .select(
            F.col(key),
            F.col(attr),
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
