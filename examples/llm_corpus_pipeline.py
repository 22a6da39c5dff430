"""End-to-end LLM training-data pipeline over the `documents` corpus:

  quality filter → exact dedup → near-dup (MinHash-LSH) clustering →
  benchmark decontamination → stratified domain sampling →
  sequence packing

Every stage is one of the engine's registered operators composed as plain
DataFrames — nothing here collects to the driver except the final summary
counts.  At 100 TB the same composition holds: the stages are
shuffle-bounded by doc keys and gram/band joins, never doc×doc pairs.

Run: python examples/llm_corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("llm-corpus-pipeline")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality filter: keep docs that aren't pathologically repetitive.
    # persist() is a predicate-pushdown BARRIER, not a cache nicety:
    # filtering the unmaterialized profile lets Catalyst inline the
    # words(text) array expr into every bigram-shingle lambda reference
    # (O(n_words^2) per doc — 55x slower at 10x, see tools/bench_pipeline.py)
    rep = all_queries()["text_repetition"].fn(spark, sf_dir).persist()
    keep_q = rep.where(~F.col("repetitive")).select("doc_id")
    docs_q = docs.join(keep_q, "doc_id")
    n1 = docs_q.count()

    # 2. exact dedup (md5 of normalized text; digests shuffle, docs don't);
    # exact_dedup returns per-doc hash metadata — join the canonical ids
    # back to recover the document columns for the near-dup stage
    canon = exact_dedup(docs_q).where(F.col("is_canonical"))
    uniq = docs_q.join(canon.select("doc_id"), "doc_id")
    n2 = uniq.count()

    # 3. near-dup clusters: keep each cluster's min doc_id.  STAR edges
    # (bucket-min -> member, Jaccard-verified) are linear in corpus size;
    # all-pairs enumeration is only needed when the PAIRS are the product
    # (dedup_minhash_lsh / dedup_threshold_curve), never for clustering.
    # Semantics note: clustering is on VERIFIED edges (Jaccard >= 0.5) --
    # the pre-round-8 version clustered raw band collisions, which could
    # merge docs with low true similarity.
    pairs = minhash_lsh_star_edges(uniq, threshold=0.5)
    clusters = connected_components(pairs)  # (node, cluster_id=min reachable id)
    losers = clusters.where(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    survivors = uniq.join(losers, "doc_id", "left_anti")
    n3 = survivors.count()

    # 4. decontamination: drop docs HEAVILY overlapping the benchmark
    # source.  The registered query's 0.05 audit threshold flags nearly
    # the whole synthetic corpus (templated text shares many common
    # 5-grams) — as a removal gate the pipeline cuts at 0.5 majority
    # overlap, the audit-vs-removal distinction real pipelines draw.
    decon = all_queries()["text_decontaminate"].fn(spark, sf_dir).persist()
    clean = survivors.join(
        decon.where(F.col("contam_ratio") < 0.5).select("doc_id"), "doc_id"
    )
    n4 = clean.count()

    # 5. stratified sample toward the target mixture — q_stratified_sample's
    # all-integer hash gate, with per-source counts from the CLEANED corpus
    # (raw-corpus rates starve after dedup collapses duplicate cliques;
    # see tools/bench_pipeline.py for the measured 100x failure)
    counts5 = clean.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    mixed = clean.join(F.broadcast(counts5), "source").where(
        h32(F.col("doc_id").cast("string")) * F.col("n_s")
        < F.lit(15) * F.lit(4_294_967_296)
    )
    n5 = mixed.count()

    # 6. REPACK the survivors into 512-token sequences — packing must run
    # on the cleaned corpus (the registered q_seq_packing packs the raw
    # corpus, whose chunk ids would have holes where removed docs sat)
    from pyspark.sql import Window

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
    n_chunks = packing.distinct().count()

    # 7. shard the packed corpus for the training job: deterministic
    # doc_id-hash assignment (replay-stable membership), manifest row per
    # shard — this is the write-side `repartition(N, hash).write` step
    n_shards = 16
    manifest = (
        mixed.select(
            "doc_id", (h32(F.col("doc_id").cast("string")) % n_shards).alias("shard")
        )
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    n_shards_used = manifest.count()

    print(f"documents           : {n0}")
    print(f"after quality filter: {n1}")
    print(f"after exact dedup   : {n2}")
    print(f"after near-dup      : {n3}")
    print(f"after decontam      : {n4}")
    print(f"after mixing sample : {n5}")
    print(f"packed chunks       : {n_chunks}")
    print(f"output shards       : {n_shards_used}")
    spark.stop()


if __name__ == "__main__":
    main()
