"""Composed-pipeline scale measurement (round-7 verdict ask #7):
time the END-TO-END llm_corpus_pipeline composition — quality filter →
exact dedup → near-dup clustering → decontamination → stratified
sampling → packing → sharding — against an arbitrary sf directory,
with per-stage wall seconds and row counts.

Individual operators are measured in SCALE.md's 1×/10×/100× tables;
this tool measures the COMPOSITION, where persist/reuse boundaries
matter most: every stage feeds both its own count and the next stage,
so each boundary is persisted once and unpersisted when its consumer
finishes — without those persists the quality filter would re-execute
five times by the final shard count (lazy evaluation re-derives the
whole lineage per action).

Usage:
    python tools/bench_pipeline.py <sf_dir>
Prints one JSON line:
    {"sf_dir": ..., "total_sec": ..., "stages": {name: sec},
     "counts": {name: rows}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from redis_streams_spark.functions.hashing import h32
from redis_streams_spark.functions.textfns import words
from redis_streams_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    minhash_lsh_star_edges,
)
from redis_streams_spark.queries import all_queries
from redis_streams_spark.session import get_spark, load_table


def main() -> None:
    sf_dir = sys.argv[1]
    spark = get_spark("bench-pipeline")
    queries = all_queries()
    stages: dict[str, float] = {}
    counts: dict[str, int] = {}

    # warm-up: codegen + parquet footer caches, same discipline as
    # scale_run.py — cold compile must not pollute the first stage
    spark.range(1000).selectExpr("sum(id)").collect()
    load_table(spark, "/root/testdata/sf0.001", "documents").count()

    t_total = time.perf_counter()
    docs = load_table(spark, sf_dir, "documents")

    def timed(name: str, df, prev=None):
        """Persist the stage boundary, force it with count(), release
        the previous boundary (its lineage is now materialized here)."""
        t0 = time.perf_counter()
        df = df.persist()
        counts[name] = df.count()
        stages[name] = round(time.perf_counter() - t0, 2)
        if prev is not None:
            prev.unpersist()
        return df

    docs0 = timed("input", docs)

    # 1. quality filter.  The persist() on the profile table is
    # load-bearing, not a cache nicety: filtering the UNMATERIALIZED
    # profile lets Catalyst push the predicate through the projection,
    # inlining the words(text) array expr into every element_at lambda
    # of the bigram shingle — the split+filter re-executes per element,
    # O(n_words^2) per doc (measured: 55 s vs 1 s at 10x).  The
    # InMemoryRelation is a pushdown barrier; the same pattern applies
    # to every profile-then-filter composition below.
    rep = queries["text_repetition"].fn(spark, sf_dir).persist()
    keep_q = rep.where(~F.col("repetitive")).select("doc_id")
    docs_q = timed("quality_filter", docs0.join(keep_q, "doc_id"), docs0)
    rep.unpersist()

    # 2. exact dedup
    canon = exact_dedup(docs_q).where(F.col("is_canonical"))
    uniq = timed(
        "exact_dedup", docs_q.join(canon.select("doc_id"), "doc_id"), docs_q
    )

    # 3. near-dup clusters (minhash-LSH STAR edges → connected
    # components → keep cluster minimum).  Star edges (bucket-min →
    # member, Jaccard-verified) are linear in corpus size; the round-7
    # all-pairs form made this stage 295 s of the 364 s composed 100×
    # run purely from C(clique,2) pair enumeration CC never needed.
    # NOTE the switch changed semantics TWICE (review finding r08): the
    # old code fed CC the raw candidate list (no is_dup filter — any
    # band collision merged clusters); star edges both verify Jaccard ≥
    # threshold AND span buckets with k-1 edges, so survivor counts
    # shifted for verification reasons as well as enumeration ones.
    # connected_components iterates EAGERLY at call time (its
    # convergence loop runs counts), so the whole block is timed
    # manually — a timed() around only the anti-join would leave the CC
    # rounds unattributed.  uniq stays persisted because the anti-join
    # consumes it again after CC finishes.
    t0 = time.perf_counter()
    pairs = minhash_lsh_star_edges(uniq, threshold=0.5)
    clusters = connected_components(pairs)
    losers = clusters.where(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    survivors = uniq.join(losers, "doc_id", "left_anti").persist()
    counts["near_dup"] = survivors.count()
    stages["near_dup"] = round(time.perf_counter() - t0, 2)
    uniq.unpersist()

    # 4. decontamination — removal gate at 0.5 majority overlap (the
    # registered query's 0.05 AUDIT threshold flags nearly the whole
    # templated synthetic corpus, which would degenerate every
    # downstream stage to a handful of rows; same cut as the example)
    decon = queries["text_decontaminate"].fn(spark, sf_dir).persist()
    clean = timed(
        "decontam",
        survivors.join(
            decon.where(F.col("contam_ratio") < 0.5).select("doc_id"), "doc_id"
        ),
        survivors,
    )
    decon.unpersist()

    # 5. stratified sample toward target mixture — the SAME all-integer
    # hash gate as q_stratified_sample, but with per-source counts from
    # the CLEANED corpus.  Composition order matters here: the raw-corpus
    # registered query targets N docs per RAW source, so after dedup
    # collapses the scale fixture's 100-member cliques the raw-rate gate
    # passes ~1% of survivors and STARVES (measured: 0 rows at 100x).
    # Sampling rates must be derived from the post-dedup population.
    src_counts = clean.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    mixed = timed(
        "mixing_sample",
        clean.join(F.broadcast(src_counts), "source").where(
            h32(F.col("doc_id").cast("string")) * F.col("n_s")
            < F.lit(15) * F.lit(4_294_967_296)
        ),
        clean,
    )

    # 6. sequence packing (512-token chunks per source)
    t0 = time.perf_counter()
    toks = mixed.select(
        "doc_id", "source", F.size(words("text")).cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    packing = toks.select("source", cum_before.alias("cum_before")).select(
        "source", F.expr("cum_before div 512").alias("chunk_id")
    )
    counts["packed_chunks"] = packing.distinct().count()
    stages["packing"] = round(time.perf_counter() - t0, 2)

    # 7. sharding manifest (deterministic hash assignment)
    t0 = time.perf_counter()
    manifest = (
        mixed.select(
            "doc_id", (h32(F.col("doc_id").cast("string")) % 16).alias("shard")
        )
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    counts["shards"] = manifest.count()
    stages["sharding"] = round(time.perf_counter() - t0, 2)
    mixed.unpersist()

    total = round(time.perf_counter() - t_total, 2)
    print(
        json.dumps(
            {"sf_dir": sf_dir, "total_sec": total, "stages": stages, "counts": counts}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
