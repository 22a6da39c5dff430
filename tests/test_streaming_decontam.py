"""Streaming decontamination: stream-static broadcast membership test,
epoch-partitioned idempotent verdict log, batch/streaming agreement."""

from __future__ import annotations

from pyspark.sql import functions as F

from redis_streams_spark.queries import all_queries
from redis_streams_spark.session import load_table
from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming import Producer
from redis_streams_spark.streaming.bridge import open_stream
from redis_streams_spark.streaming.decontam import (
    StreamingDecontaminator,
    benchmark_grams,
    decontaminate_stream,
)
from redis_streams_spark.streaming.windows import project


def test_streaming_decontam_matches_batch(spark, tmp_path, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bench = benchmark_grams(docs.where(F.col("source") == "src19"))

    # stream the corpus documents through the redislog source
    log = StreamLog(str(tmp_path / "log"), "docs")
    prod = Producer(log, "docs")
    corpus = docs.where(F.col("source") != "src19").select("doc_id", "text").collect()
    for r in corpus[:40]:
        prod.add({"doc_id": r.doc_id, "text": r.text})

    src = open_stream(spark, str(tmp_path / "log"), "docs", group="g", batch_size=1000)
    typed = project(src, {"doc_id": "long", "text": "string"})
    out_dir = str(tmp_path / "verdicts")
    handler = StreamingDecontaminator(bench, out_dir)
    q = (
        typed.writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r.doc_id: (r.n_grams, r.n_contaminated, r.flagged)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert len(got) == 40

    # batch operator is the oracle for the streamed subset
    batch = all_queries()["text_decontaminate"].fn(spark, sf_dir)
    want = {
        r.doc_id: (r.n_grams, r.n_contaminated, r.flagged)
        for r in batch.collect()
        if r.doc_id in got
    }
    assert got == want


def test_streaming_decontam_epoch_replay_idempotent(spark, tmp_path, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bench = benchmark_grams(docs.where(F.col("source") == "src19"))
    sample = docs.where(F.col("source") != "src19").limit(10).select("doc_id", "text")

    out_dir = str(tmp_path / "verdicts")
    handler = StreamingDecontaminator(bench, out_dir)
    handler(sample, epoch_id=7)
    first = sorted(
        (r.doc_id, r.n_contaminated) for r in spark.read.parquet(out_dir).collect()
    )
    handler(sample, epoch_id=7)  # at-least-once replay of the same epoch
    second = sorted(
        (r.doc_id, r.n_contaminated) for r in spark.read.parquet(out_dir).collect()
    )
    assert first == second  # overwrite, not append


def test_decontaminate_stream_dedups_intra_batch_duplicates(spark, sf_dir):
    # at-least-once delivery can hand the same doc to one epoch twice;
    # hit counts must not double (contam_ratio would inflate past truth)
    docs = load_table(spark, sf_dir, "documents")
    bench = benchmark_grams(docs.where(F.col("source") == "src19"))
    sample = docs.where(F.col("source") != "src19").limit(10).select("doc_id", "text")
    doubled = sample.unionAll(sample)
    got = {
        r.doc_id: (r.n_grams, r.n_contaminated)
        for r in decontaminate_stream(doubled, bench).collect()
    }
    want = {
        r.doc_id: (r.n_grams, r.n_contaminated)
        for r in decontaminate_stream(sample, bench).collect()
    }
    assert got == want


def test_decontaminate_stream_is_batch_equivalent_transform(spark, sf_dir):
    # the transformation itself is engine-agnostic: applied to a plain
    # batch frame it reproduces the registered query's verdict columns
    docs = load_table(spark, sf_dir, "documents")
    bench = benchmark_grams(docs.where(F.col("source") == "src19"))
    corpus = docs.where(F.col("source") != "src19").select("doc_id", "text")
    got = {
        r.doc_id: (r.n_grams, r.n_contaminated, r.flagged)
        for r in decontaminate_stream(corpus, bench).collect()
    }
    want = {
        r.doc_id: (r.n_grams, r.n_contaminated, r.flagged)
        for r in all_queries()["text_decontaminate"].fn(spark, sf_dir).collect()
    }
    assert got == want
