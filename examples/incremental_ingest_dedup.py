"""Continuously-deduplicated corpus construction — the engine's
flagship composition, end to end:

  stream log (the reference's S1 producer surface)
    → micro-batches (foreachBatch, at-least-once)
    → online dedup verdicts against the PERSISTED signature index
      (operators/dupindex.py: exact digests + MinHash-LSH bands +
       shingle sets, probed without re-hashing the accumulated corpus)
    → keepers appended as the batch's index segment (replay-safe
      dynamic partition overwrite keyed on the batch id)
    → maintenance: refresh changed docs (replace=True tombstones the
      stale copies), retention drops the oldest batch for one manifest
      flip, compaction collapses the accumulated segments.

At 100 TB the index stores signature-sized rows (40-byte digests,
8-byte band hashes) plus the shingle sets; each batch pays batch-sized
hashing and candidate-sized verification — never a corpus re-scan.

Run: python examples/incremental_ingest_dedup.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from redis_streams_spark.operators.dupindex import (  # noqa: E402
    compact_dedup_index,
    dedup_index_status,
    dedup_ingest_batch,
    drop_dedup_segment,
    gc_dedup_index,
    init_dedup_index,
    update_dedup_index,
)
from redis_streams_spark.session import get_spark, load_table  # noqa: E402
from redis_streams_spark.sources.stream_log import StreamLog  # noqa: E402
from redis_streams_spark.streaming import Producer  # noqa: E402
from redis_streams_spark.streaming.bridge import open_stream  # noqa: E402
from redis_streams_spark.streaming.windows import project  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("incremental-ingest")
    work = tempfile.mkdtemp(prefix="ingest-dedup-")
    import atexit

    atexit.register(shutil.rmtree, work, ignore_errors=True)
    root = os.path.join(work, "dupidx")
    vpath = os.path.join(work, "verdicts")
    # managed from the start: a streaming-built corpus still gets the
    # manifest lifecycle (retention, compaction, gc)
    init_dedup_index(root)

    # 1. documents arrive on the stream log (the reference's producer
    # surface, SURVEY S1)
    docs = load_table(spark, sf_dir, "documents").where("doc_id < 2000")
    rows = docs.select("doc_id", "text").collect()
    log = StreamLog(work, "docs")
    Producer(log, "docs").add_many(
        [{"doc_id": r.doc_id, "text": r.text} for r in rows]
    )
    print(f"== 1. stream log loaded: {len(rows)} docs ==")

    # 2. the ingest loop: each micro-batch is verdicted against the
    # accumulated index, keepers become the batch's segment
    def ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        dedup_ingest_batch(
            batch_df.select("doc_id", "text"), root, f"b{batch_id}", vpath
        )

    src = open_stream(spark, work, "docs", group="dd", batch_size=100)
    typed = project(src, {"doc_id": "long", "text": "string"}).select(
        "doc_id", "text"
    )
    t0 = time.perf_counter()
    q = (
        typed.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    dt = time.perf_counter() - t0
    verdicts = spark.read.parquet(vpath)
    print(f"== 2. ingest loop done in {dt:.1f}s ==")
    verdicts.groupBy("verdict").count().orderBy("verdict").show()
    print("per-batch segments:")
    dedup_index_status(spark, root).show()

    # 3. refresh: a slice of the corpus changed upstream — re-ingest
    # with replace=True (tombstones the stale copies, new segment)
    kept = verdicts.where("verdict = 'keep'").select("doc_id")
    changed = (
        docs.join(kept, "doc_id")
        .where("doc_id % 17 = 3")
        .withColumn("text", F.concat("text", F.lit(" revised")))
    )
    update_dedup_index(changed, root, segment="refresh1", replace=True)
    print(f"== 3. refreshed {changed.count()} changed docs (tombstone+segment) ==")

    # 4. retention: age out the oldest ingest batch — one manifest flip
    oldest = dedup_index_status(spark, root).collect()[0].segment
    drop_dedup_segment(spark, root, oldest)
    print(f"== 4. dropped oldest segment {oldest} (O(metadata) retention) ==")

    # 5. compaction: collapse segments, physically drop tombstones,
    # flip the generation pointer; gc reclaims the old generation
    compact_dedup_index(spark, root)
    removed = gc_dedup_index(root)
    print(f"== 5. compacted; gc reclaimed {len(removed)} paths ==")
    dedup_index_status(spark, root).show()
    spark.stop()


if __name__ == "__main__":
    main()
