"""Continuously SEMANTICALLY-deduplicated corpus — the vector-family
twin of examples/incremental_ingest_dedup.py:

  stream log (the reference's S1 producer surface)
    → micro-batches (foreachBatch, at-least-once)
    → online semantic verdicts against the MANAGED VECTOR INDEX
      (operators/vecindex.semantic_ingest_batch: each batch vector
       probes its nearest learned cells and removes on exact cosine
       ≥ τ against the accepted corpus — online SemDeDup)
    → keepers appended as the batch's index segment (replay-safe)
    → maintenance: retention drops an aged batch for one manifest
      flip; compaction with retrain=True re-learns the codebook on
      the accumulated corpus (the Lucene merge-time-rebuild story).

Embeddings ride the log's map<string,string> payload as comma-joined
floats — the explicit schema-on-read step decodes them; no inference
magic anywhere.

At 100 TB each batch pays |batch| × n_cells probe selection against
the tiny merged-centroid table plus a probed-cells-only scan; the
corpus is never re-scanned.

Run: python examples/streaming_semantic_dedup.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from redis_streams_spark.operators.vecindex import (  # noqa: E402
    build_vector_index,
    compact_vector_index,
    drop_vector_segment,
    gc_vector_index,
    semantic_ingest_batch,
    vector_index_status,
    vector_topk_indexed,
)
from redis_streams_spark.session import get_spark, load_table  # noqa: E402
from redis_streams_spark.sources.stream_log import StreamLog  # noqa: E402
from redis_streams_spark.streaming import Producer  # noqa: E402
from redis_streams_spark.streaming.bridge import open_stream  # noqa: E402
from redis_streams_spark.streaming.windows import project  # noqa: E402

TAU = 0.35


def decode_embedding(df, col: str = "embedding"):
    """map-payload string → array<float> (comma-joined)."""
    return df.withColumn(
        col, F.transform(F.split(F.col(col), ","), lambda x: x.cast("float"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("streaming-semdedup")
    work = tempfile.mkdtemp(prefix="sem-dedup-")
    import atexit

    atexit.register(shutil.rmtree, work, ignore_errors=True)
    root = os.path.join(work, "vecidx")

    emb = load_table(spark, sf_dir, "embeddings")
    # founding slice builds the index (codebook trained here); the
    # rest arrives on the stream
    founders = emb.where("vec_id % 4 = 0")
    build_vector_index(founders, root, managed=True, n_cells=8)
    print(f"== 1. founded index with {founders.count()} vectors ==")

    arriving = emb.where("vec_id % 4 != 0").select(
        "vec_id",
        F.array_join(F.col("embedding").cast("array<string>"), ",").alias(
            "embedding"
        ),
        "label",
    )
    rows = arriving.collect()
    log = StreamLog(work, "emb")
    Producer(log, "emb").add_many(
        [
            {"vec_id": r.vec_id, "embedding": r.embedding, "label": r.label}
            for r in rows
        ]
    )
    print(f"== 2. stream log loaded: {len(rows)} vectors ==")

    def ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        semantic_ingest_batch(
            decode_embedding(
                batch_df.select("vec_id", "embedding", "label")
            ),
            root,
            f"b{batch_id}",
            tau=TAU,
            # the log carries each vec_id once; skip the reuse scan
            assume_fresh_ids=True,
        )

    src = open_stream(spark, work, "emb", group="sd", batch_size=150)
    typed = project(
        src, {"vec_id": "long", "embedding": "string", "label": "int"}
    ).select("vec_id", "embedding", "label")
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
    verdicts = spark.read.parquet(os.path.join(root, "_verdicts"))
    print(f"== 3. semantic ingest loop done in {dt:.1f}s ==")
    verdicts.groupBy("verdict").count().orderBy("verdict").show()
    vector_index_status(spark, root).show()

    # retention: age out the oldest streamed batch
    segs = [
        r.segment
        for r in vector_index_status(spark, root).collect()
        if r.segment.startswith("b")
    ]
    if segs:
        drop_vector_segment(spark, root, segs[0])
        print(f"== 4. dropped aged segment {segs[0]} ==")

    # compaction + codebook retrain on the accumulated corpus
    compact_vector_index(spark, root, retrain=True)
    removed = gc_vector_index(root)
    print(f"== 5. compacted with retrain; gc reclaimed {len(removed)} paths ==")
    vector_topk_indexed(spark, root, k=5, query_mod=100).show(5)
    spark.stop()


if __name__ == "__main__":
    main()
