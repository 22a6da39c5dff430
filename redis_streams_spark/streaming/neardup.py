"""Streaming near-duplicate detection: MinHash-LSH over a document
stream (the streaming composition of the batch dedup machinery —
operators.dedup.minhash_band_rows — with the redislog source).

Each micro-batch:
1. builds LSH band rows for the batch's documents (same 32-perm/16-band
   signature arithmetic as the batch operator, so batch and streaming
   verdicts agree);
2. flags documents whose signature collides in ≥1 band with (a) any
   document from a PRIOR epoch (equi-join against the band store,
   restricted to epochs < this one) or (b) an earlier document in the
   SAME batch (self-join on a_id < b_id — the batch operator's candidate
   rule, so batch-mates are not missed);
3. writes this epoch's bands and flags into ``epoch=<id>`` partitions
   with overwrite, so an at-least-once replay of the epoch rewrites the
   same partitions instead of appending duplicates — the store and the
   flag log are deterministic under replay.

Scale shape: the store lookup is an equi-join on (band_idx, band_hash) —
at scale the store is a partitioned table and the join prunes to
colliding buckets; nothing driver-side, no full-history shuffles (the
epoch partitioning replaces the dedup-on-read a naive append would
need).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.operators.dedup import minhash_band_rows


class StreamingNearDup:
    """foreachBatch handler flagging near-dup candidates incrementally.

    Usage::

        nd = StreamingNearDup(spark, store_dir)
        q = (typed_stream.writeStream.foreachBatch(nd)
             .option("checkpointLocation", ck).start())

    ``typed_stream`` needs (doc_id long, text string).  Flags accumulate
    in the ``flags`` parquet next to the band store; read them with
    :meth:`flagged` — (doc_id, n_collisions, epoch), where doc_id
    collided with a previously-seen or earlier-in-batch document.
    """

    def __init__(self, spark: SparkSession, store_dir: str, n: int = 3):
        self.spark = spark
        self.store = os.path.join(store_dir, "bands")
        self.flags_path = os.path.join(store_dir, "flags")
        self.n = n

    def _prior_bands(self, epoch_id: int) -> DataFrame | None:
        """Bands from epochs strictly before this one — a replayed epoch
        must not see its own first attempt's bands."""
        if not os.path.isdir(self.store):
            return None
        df = self.spark.read.parquet(self.store)
        return df.where(F.col("epoch") < epoch_id)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        docs = batch_df.select("doc_id", "text")
        bands = minhash_band_rows(docs, self.n).persist()

        # (a) collisions against prior epochs
        prior = self._prior_bands(epoch_id)
        hit_parts = []
        if prior is not None:
            hit_parts.append(
                bands.alias("new")
                .join(
                    prior.alias("old"),
                    (F.col("new.band_idx") == F.col("old.band_idx"))
                    & (F.col("new.band_hash") == F.col("old.band_hash"))
                    & (F.col("new.doc_id") != F.col("old.doc_id")),
                )
                .select(
                    F.col("new.doc_id").alias("doc_id"),
                    F.col("old.doc_id").alias("other_id"),
                )
            )
        # (b) collisions between batch-mates: the later (higher) doc_id is
        # flagged against the earlier one — same candidate rule as the
        # batch self-join
        a, b = bands.alias("a"), bands.alias("b")
        hit_parts.append(
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") > F.col("b.doc_id")),
            ).select(
                F.col("a.doc_id").alias("doc_id"),
                F.col("b.doc_id").alias("other_id"),
            )
        )
        hits = hit_parts[0]
        for part in hit_parts[1:]:
            hits = hits.unionByName(part)
        flags = (
            hits.groupBy("doc_id")
            .agg(F.count_distinct("other_id").alias("n_collisions"))
        )
        # epoch-partition overwrite = replay-idempotent (same epoch id
        # rewrites the same directory)
        flags.write.mode("overwrite").parquet(
            os.path.join(self.flags_path, f"epoch={epoch_id}")
        )
        bands.write.mode("overwrite").parquet(
            os.path.join(self.store, f"epoch={epoch_id}")
        )
        bands.unpersist()

    def flagged(self) -> DataFrame:
        """All near-dup flags so far: (doc_id, n_collisions, epoch)."""
        if not os.path.isdir(self.flags_path):
            return self.spark.createDataFrame(
                [], "doc_id long, n_collisions long, epoch long"
            )
        return self.spark.read.parquet(self.flags_path).select(
            "doc_id", "n_collisions", F.col("epoch").cast("long").alias("epoch")
        )
