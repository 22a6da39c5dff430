"""Semantic invariants for the round-4 LLM-prep additions: overlapping
token chunking, temperature mixing, and the dedup apply/report step.
(Cross-engine value parity is covered by test_oracle_parity.py.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from redis_streams_spark.queries import all_queries
from redis_streams_spark.queries.llmprep import _CHUNK_STRIDE, _CHUNK_TOKENS
from redis_streams_spark.session import load_table


def test_text_chunks_cover_and_overlap(spark, sf_dir):
    chunks = all_queries()["text_chunks"].fn(spark, sf_dir)
    bad = chunks.where(
        (F.col("chunk_tokens") <= 0)
        | (F.col("chunk_tokens") > _CHUNK_TOKENS)
        | (F.col("start_tok") != F.col("chunk_idx") * _CHUNK_STRIDE)
        | (F.col("end_tok") - F.col("start_tok") != F.col("chunk_tokens"))
        | (
            F.size(F.split("chunk_text", " ")) != F.col("chunk_tokens")
        )
    ).count()
    assert bad == 0
    # windows tile each document: the last chunk ends at n_tokens, and every
    # non-final chunk is full-width (so with stride < width they overlap)
    per_doc = chunks.groupBy("doc_id").agg(
        F.max("end_tok").alias("last_end"),
        F.max("chunk_idx").alias("last_idx"),
        F.count(F.lit(1)).alias("n_chunks"),
    )
    assert per_doc.where(F.col("n_chunks") != F.col("last_idx") + 1).count() == 0
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert per_doc.count() == n_docs  # every doc chunked, none lost
    short_nonfinal = (
        chunks.join(per_doc, "doc_id")
        .where(
            (F.col("chunk_idx") < F.col("last_idx"))
            & (F.col("chunk_tokens") != _CHUNK_TOKENS)
        )
        .count()
    )
    assert short_nonfinal == 0


def test_mix_temperature_is_a_distribution(spark, sf_dir):
    mix = all_queries()["mix_temperature"].fn(spark, sf_dir).collect()
    assert abs(sum(r.raw_share for r in mix) - 1.0) < 1e-3
    assert abs(sum(r.temp_share for r in mix) - 1.0) < 1e-3
    # temperature flattens: smallest source gains, largest loses
    smallest = min(mix, key=lambda r: r.n_tokens)
    largest = max(mix, key=lambda r: r.n_tokens)
    assert smallest.boost >= 1.0 >= largest.boost


def test_dedup_apply_report_accounting(spark, sf_dir):
    rep = all_queries()["dedup_apply_report"].fn(spark, sf_dir)
    assert rep.where(
        F.col("n_kept") + F.col("n_dropped") != F.col("n_docs")
    ).count() == 0
    totals = rep.agg(
        F.sum("n_docs").alias("docs"), F.sum("n_kept").alias("kept")
    ).first()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    from redis_streams_spark.operators.dedup import exact_dedup

    n_hashes = exact_dedup(docs).select("content_hash").distinct().count()
    assert totals.docs == n_docs
    assert totals.kept == n_hashes  # exactly one keeper per content hash
