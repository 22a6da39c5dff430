"""Streaming near-duplicate detection: MinHash-LSH over a document
stream (the streaming composition of the batch dedup machinery —
operators.dedup.band_rows_from_sets — with the redislog source).

Each micro-batch:
1. builds LSH band rows for the batch's documents (same 32-perm/16-band
   signature arithmetic as the batch operator, so batch and streaming
   verdicts agree);
2. equi-joins them against the accumulated band store (parquet) to flag
   documents whose signature collides with ANY previously seen document
   in ≥1 band — the same candidate rule as the batch self-join;
3. appends the batch's own bands to the store, so later documents check
   against these too.

Scale shape: the store lookup is an equi-join on (band_idx, band_hash) —
at scale the store is a partitioned table and the join prunes to
colliding buckets; nothing driver-side.  Exactly-once-ish: the store
append is deduplicated by (doc_id, band_idx) on read, so an epoch replay
(at-least-once) cannot double-count a document against itself.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.operators.dedup import band_rows_from_sets, shingle_sets


class StreamingNearDup:
    """foreachBatch handler flagging near-dup candidates incrementally.

    Usage::

        nd = StreamingNearDup(spark, store_dir)
        q = (typed_stream.writeStream.foreachBatch(nd)
             .option("checkpointLocation", ck).start())

    ``typed_stream`` needs (doc_id long, text string).  Flagged rows
    accumulate in ``nd.flags`` (a list of (doc_id, n_collisions) per
    epoch) and in the ``flags`` parquet next to the store.
    """

    def __init__(self, spark: SparkSession, store_dir: str, n: int = 3):
        self.spark = spark
        self.store = os.path.join(store_dir, "bands")
        self.flags_path = os.path.join(store_dir, "flags")
        self.n = n

    def _existing_bands(self) -> DataFrame | None:
        if not os.path.isdir(self.store):
            return None
        df = self.spark.read.parquet(self.store)
        # replay-safety: collapse duplicate (doc_id, band_idx) rows a
        # re-run epoch may have appended
        return df.dropDuplicates(["doc_id", "band_idx"])

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        docs = batch_df.select("doc_id", "text")
        bands = band_rows_from_sets(shingle_sets(docs, self.n)).persist()
        prior = self._existing_bands()
        if prior is not None:
            hits = (
                bands.alias("new")
                .join(
                    prior.alias("old"),
                    (F.col("new.band_idx") == F.col("old.band_idx"))
                    & (F.col("new.band_hash") == F.col("old.band_hash"))
                    & (F.col("new.doc_id") != F.col("old.doc_id")),
                )
                .groupBy(F.col("new.doc_id").alias("doc_id"))
                .agg(F.count_distinct("old.doc_id").alias("n_collisions"))
                .withColumn("epoch", F.lit(epoch_id))
            )
            hits.write.mode("append").parquet(self.flags_path)
        bands.write.mode("append").parquet(self.store)
        bands.unpersist()

    def flagged(self) -> DataFrame:
        """All near-dup flags so far: (doc_id, n_collisions, epoch)."""
        if not os.path.isdir(self.flags_path):
            return self.spark.createDataFrame(
                [], "doc_id long, n_collisions long, epoch long"
            )
        return self.spark.read.parquet(self.flags_path)
