"""Persisted inverted index (operators/invindex.py): value-identity
with the from-scratch BM25 scorer, and the partition-pruning contract —
a query's scan must touch only its terms' buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from redis_streams_spark.functions.hashing import h32_py
from redis_streams_spark.operators.invindex import (
    N_TERM_BUCKETS,
    bm25_topk_indexed,
    build_inverted_index,
    update_inverted_index,
)

_QUERIES = {0: ("spark", "stream", "window"), 1: ("hash", "join", "merge")}


def _build(spark, tmp_path):
    from redis_streams_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "idx")
    build_inverted_index(docs, path)
    return docs, path


def test_indexed_bm25_matches_from_scratch(spark, tmp_path):
    from redis_streams_spark.queries import all_queries

    docs, path = _build(spark, tmp_path)
    got = {
        (r.query_id, r.rank): (r.doc_id, r.bm25)
        for r in bm25_topk_indexed(spark, path, _QUERIES, k=10).collect()
    }
    # from-scratch scorer over the same corpus, restricted to the same
    # two queries (the registered query uses all three)
    full = all_queries()["text_bm25_topk"].fn(
        spark, "/root/testdata/sf0.001"
    )
    want = {
        (r.query_id, r.rank): (r.doc_id, r.bm25)
        for r in full.where(F.col("query_id").isin(0, 1)).collect()
    }
    assert got == want
    assert len({q for q, _ in got}) == 2


def test_query_scan_prunes_to_query_buckets(spark, tmp_path):
    """The bucket IN-filter must reach the postings scan as a partition
    filter: the executed plan reads only the query terms' buckets, so
    scan cost follows the query, not the corpus."""
    _, path = _build(spark, tmp_path)
    df = bm25_topk_indexed(spark, path, _QUERIES, k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    want_buckets = {
        h32_py(t) % N_TERM_BUCKETS for ts in _QUERIES.values() for t in ts
    }
    # the pruned postings read surfaces exactly the probed buckets
    read = spark.read.parquet(f"{path}/postings").where(
        F.col("bucket").isin(sorted(want_buckets))
    )
    seen = {r.bucket for r in read.select("bucket").distinct().collect()}
    assert seen <= want_buckets
    # and pruning is real: unprobed buckets exist in the full index
    all_b = {
        r.bucket
        for r in spark.read.parquet(f"{path}/postings")
        .select("bucket")
        .distinct()
        .collect()
    }
    assert len(all_b) > len(want_buckets)


def test_build_layout_and_denormalized_dl(spark, tmp_path):
    """Postings carry (tok, doc_id, tf, dl): dl matches the document's
    token count, so scoring needs no corpus-sized join; terms/ carries
    per-term df consistent with the postings."""
    docs, path = _build(spark, tmp_path)
    postings = spark.read.parquet(f"{path}/postings")
    assert set(postings.columns) == {"tok", "doc_id", "tf", "dl", "positions", "bucket", "segment"}
    terms = spark.read.parquet(f"{path}/terms")
    df_from_postings = {
        (r.tok): r.n
        for r in postings.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in terms.collect():
        assert df_from_postings[r.tok] == r.df
    stats = spark.read.parquet(f"{path}/stats").collect()
    assert len(stats) == 1 and stats[0].n == docs.count()


def test_incremental_update_matches_full_rebuild(spark, tmp_path):
    """Segment-style maintenance: build on half the corpus, append the
    other half with update_inverted_index, and require query results
    IDENTICAL to a from-scratch build over the full corpus — the
    read-time partial merge (df sums, avgdl from stats partials) must be
    value-exact."""
    from redis_streams_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    inc_path, full_path = str(tmp_path / "inc"), str(tmp_path / "full")
    build_inverted_index(docs.where(F.col("doc_id") % 2 == 0), inc_path)
    update_inverted_index(docs.where(F.col("doc_id") % 2 == 1), inc_path)
    build_inverted_index(docs, full_path)

    def result(path):
        return {
            (r.query_id, r.rank): (r.doc_id, r.bm25)
            for r in bm25_topk_indexed(spark, path, _QUERIES, k=10).collect()
        }

    got, want = result(inc_path), result(full_path)
    assert got == want and len(want) == 20
    # two stats partials exist (one per segment) and merge to the corpus
    stats = spark.read.parquet(f"{inc_path}/stats")
    assert stats.count() == 2
    assert (
        stats.agg(F.sum("n")).first()[0]
        == spark.read.parquet(f"{full_path}/stats").agg(F.sum("n")).first()[0]
    )


def test_compaction_collapses_segments_and_preserves_results(spark, tmp_path):
    """Build + two segment updates, then compact to a new path: query
    results identical, terms collapse to one row per (term, bucket),
    stats to one row."""
    from redis_streams_spark.operators.invindex import compact_inverted_index
    from redis_streams_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    src, dst = str(tmp_path / "multi"), str(tmp_path / "compacted")
    build_inverted_index(docs.where(F.col("doc_id") % 3 == 0), src)
    update_inverted_index(docs.where(F.col("doc_id") % 3 == 1), src)
    update_inverted_index(docs.where(F.col("doc_id") % 3 == 2), src)
    assert spark.read.parquet(f"{src}/stats").count() == 3
    compact_inverted_index(spark, src, dst)

    def result(path):
        return {
            (r.query_id, r.rank): (r.doc_id, r.bm25)
            for r in bm25_topk_indexed(spark, path, _QUERIES, k=10).collect()
        }

    assert result(dst) == result(src)
    assert spark.read.parquet(f"{dst}/stats").count() == 1
    terms = spark.read.parquet(f"{dst}/terms")
    assert terms.count() == terms.select("tok").distinct().count()


def test_streaming_ingest_builds_queryable_index(spark, tmp_path):
    """The continuously-indexed-corpus shape: documents arrive on the
    stream log, each micro-batch appends a segment via
    update_inverted_index inside foreachBatch, and the resulting index
    answers BM25 queries identically to a batch build over the same
    documents — the reference's batch-collecting consumer surface
    feeding the engine's retrieval index end-to-end."""
    from redis_streams_spark.session import load_table
    from redis_streams_spark.sources.stream_log import StreamLog
    from redis_streams_spark.streaming import Producer
    from redis_streams_spark.streaming.bridge import open_stream
    from redis_streams_spark.streaming.windows import project

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").where(
        F.col("doc_id") < 200
    )
    rows = docs.select("doc_id", "text").collect()
    log = StreamLog(str(tmp_path), "docs")
    Producer(log, "docs").add_many(
        [{"doc_id": r.doc_id, "text": r.text} for r in rows]
    )

    idx_path = str(tmp_path / "stream_idx")

    def index_batch(batch_df, batch_id):
        # deterministic segment name = replay-safe: a re-delivered
        # micro-batch overwrites its own segment (at-least-once sink)
        update_inverted_index(
            batch_df.select("doc_id", "text"),
            idx_path,
            segment=f"b{batch_id}",
        )

    src = open_stream(spark, str(tmp_path), "docs", group="ix", batch_size=60)
    typed = project(src, {"doc_id": "long", "text": "string"}).select(
        "doc_id", "text"
    )
    q = (
        typed.writeStream.foreachBatch(index_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # >= 2 micro-batch segments landed (200 docs / batch_size 60)
    assert spark.read.parquet(f"{idx_path}/stats").count() >= 2
    batch_path = str(tmp_path / "batch_idx")
    build_inverted_index(docs, batch_path)

    def result(path):
        return {
            (r.query_id, r.rank): (r.doc_id, r.bm25)
            for r in bm25_topk_indexed(spark, path, _QUERIES, k=10).collect()
        }

    assert result(idx_path) == result(batch_path)
    # replay a batch (at-least-once delivery): the deterministic segment
    # name makes the re-write idempotent — results must not change
    update_inverted_index(
        docs.where(F.col("doc_id") < 60).select("doc_id", "text"),
        idx_path,
        segment="b0",
    )
    assert result(idx_path) == result(batch_path)
