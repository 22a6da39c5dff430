"""Composed retrieval-quality session (round-8/9 families end-to-end):

  ANN candidate generation (IVF 2-probe over the embeddings table)
    → MMR diversity re-rank of the candidate pool (λ=0.7)
    → recall audits: IVF and binary-Hamming vs the exact baseline
    → classifier-quality metrics on the relevance signal
      (ROC AUC / calibration bins / precision-recall@k)

This is the evaluation loop a retrieval stack runs after every index or
encoder change: generate candidates cheaply, diversify what the LLM
sees, then measure BOTH the index (recall vs exact) and the scoring
model (AUC / calibration / P@k) before shipping.  Every stage is a
registered, oracle-verified query — this script just composes them.

Run: python examples/retrieval_quality_session.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redis_streams_spark.queries import all_queries
from redis_streams_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("retrieval-quality")
    q = all_queries()

    # 1. ANN candidates: IVF 2-probe (the scale path)
    approx = q["sim_ivf_topk"].fn(spark, sf_dir)
    print(f"-- IVF top-k candidates: {approx.count()} (probe queries x k)")
    approx.show(5, truncate=False)

    # 2. MMR re-rank: 3 diverse picks per query from the candidate pool
    reranked = q["sim_mmr_rerank"].fn(spark, sf_dir)
    print("-- MMR picks (position 1-3 per query):")
    reranked.show(9, truncate=False)

    # 3. index recall: IVF vs exact, and the binary-Hamming tier
    print("-- recall report (IVF vs exact brute force):")
    q["sim_recall_report"].fn(spark, sf_dir).show(truncate=False)
    print("-- binary-signature Hamming recall (1-bit/dim compression):")
    q["sim_binary_hamming_recall"].fn(spark, sf_dir).show(truncate=False)

    # 3b. ranking quality, not just set overlap: nDCG@10 / MRR of the
    # LSH path, and RRF fusion of the cosine + MIPS scorers
    print("-- nDCG@10 / MRR / top-1 hit rate (LSH vs exact order):")
    q["sim_ndcg_mrr"].fn(spark, sf_dir).show(truncate=False)
    print("-- reciprocal-rank fusion of cosine + dot-product lists:")
    q["sim_rrf_fusion"].fn(spark, sf_dir).show(10, truncate=False)

    # 3c. the lexical leg (round 10): BM25 keyword ranking — once from
    # scratch, once against the persisted bucket-partitioned inverted
    # index (value-identical, partition-pruned) — and the hybrid
    # BM25 + token-Jaccard fusion through the same rrf_fuse combiner
    print("-- BM25 top-10 per keyword query (from scratch):")
    q["text_bm25_topk"].fn(spark, sf_dir).show(10, truncate=False)
    print("-- BM25 against the persisted inverted index (same values):")
    q["text_bm25_indexed"].fn(spark, sf_dir).show(10, truncate=False)
    print("-- hybrid lexical fusion (BM25 x query-token Jaccard, RRF):")
    q["sim_hybrid_lexical_rrf"].fn(spark, sf_dir).show(10, truncate=False)
    print("-- exact phrase matching (positional index, bucket-pruned):")
    q["text_phrase_indexed"].fn(spark, sf_dir).show(6, truncate=False)

    # 4. scoring-model quality: AUC, calibration, P/R at cutoffs
    print("-- ROC AUC of the relevance score (rank-sum identity,")
    print("   bucketed prefix sum — no single-task window):")
    q["q_roc_auc"].fn(spark, sf_dir).show(truncate=False)
    print("-- calibration bins (predicted score vs observed rate):")
    q["q_calibration_bins"].fn(spark, sf_dir).show(truncate=False)
    print("-- precision/recall at k cutoffs:")
    q["q_pr_curve"].fn(spark, sf_dir).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
