"""Guards for the vectorized brute-force path: the enforced broadcast-
queries bound and the tie-safe local cut (a dense rounded-tie cluster at
the pruning boundary must never evict a row the global rounded ordering
ranks first)."""

from __future__ import annotations

import pytest

from redis_streams_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_np,
)
from redis_streams_spark.session import load_table


def test_np_probe_collect_is_capped(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="max_queries"):
        # every row is a probe; cap far below the row count
        brute_force_topk_np(emb, k=2, query_mod=1, max_queries=10).collect()


def test_np_matches_hof_under_dense_rounded_ties(spark):
    """Adversarial tie load for the local cut: a 40-member cluster whose
    raw cosines differ by ~1e-7 (survives float32, vanishes under the 6dp
    rounding) with HIGHER cand_id getting the HIGHER raw cosine — a
    fixed-count cut ordered by raw cosine would keep the high-cand_id
    rows and evict the low-cand_id rows the global (rounded cosine,
    cand_id) ordering ranks first.  One partition so the whole cluster
    lands in a single Arrow batch, local_margin=1 so the cut is as tight
    as possible: only the threshold (keep-every-boundary-quantum-row) cut
    reproduces the exact HOF baseline."""
    rows = []
    for vid in range(50):
        if vid % 10 == 0:
            vec = [1.0, float(vid % 3), 0.5]  # distinct-ish (queries too)
        else:
            # perturbation ~2e-7 per id: representable in float32 near
            # 0.8 (spacing ~6e-8), collapsed by round(·, 6)
            vec = [0.6, 0.8 + vid * 2e-7, 0.0]
        rows.append((vid, [float(x) for x in vec]))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    ).repartition(1)
    hof = [
        (r.query_id, r.rank, r.cand_id, r.cosine)
        for r in brute_force_topk(emb, k=4, query_mod=10).collect()
    ]
    np_ = [
        (r.query_id, r.rank, r.cand_id, r.cosine)
        for r in brute_force_topk_np(
            emb, k=4, query_mod=10, local_margin=1
        ).collect()
    ]
    assert np_ == hof
    assert hof  # non-trivial


def test_rrf_fuse_scores_sentinels_and_order(spark):
    """rrf_fuse on two hand-built ranked lists: a candidate in both
    lists must outrank any one-list candidate (2/(60+10) > 1/61), the
    missing-list rank must surface as the -1 sentinel (never NULL — the
    BIGINT float-promotion trap), and ties must break by cand_id."""
    a = spark.createDataFrame(
        [(1, 100, 1), (1, 101, 2), (1, 102, 3)],
        "query_id long, cand_id long, cos_rank long",
    )
    b = spark.createDataFrame(
        [(1, 100, 2), (1, 200, 1), (1, 201, 3)],
        "query_id long, cand_id long, dot_rank long",
    )
    from redis_streams_spark.operators.similarity import rrf_fuse

    rows = {r["cand_id"]: r for r in rrf_fuse(a, b, k=10).collect()}
    assert len(rows) == 5
    # both-list candidate 100: 1/61 + 1/62, the only two-term score
    assert rows[100]["fused_rank"] == 1
    assert rows[100]["cos_rank"] == 1 and rows[100]["dot_rank"] == 2
    assert abs(rows[100]["rrf_score"] - round(1 / 61 + 1 / 62, 6)) < 1e-9
    # one-list candidates carry the -1 sentinel, not NULL
    assert rows[200]["cos_rank"] == -1 and rows[200]["dot_rank"] == 1
    assert rows[101]["dot_rank"] == -1
    # equal one-list scores (101 at cos 2 vs a hypothetical dot 2) break
    # by cand_id; here check the full deterministic order
    order = sorted(rows.values(), key=lambda r: r["fused_rank"])
    assert [r["cand_id"] for r in order] == [100, 200, 101, 102, 201]


def test_rrf_fuse_rejects_missing_or_ambiguous_rank_columns(spark):
    """Each rrf_fuse input must carry exactly one *_rank column — zero
    or several raises a descriptive ValueError instead of a bare
    IndexError / silent first-match pick (r09 advice)."""
    import pytest

    from redis_streams_spark.operators.similarity import rrf_fuse

    ranked = spark.createDataFrame(
        [(1, 10, 1)], "query_id long, cand_id long, exact_rank long"
    )
    no_rank = spark.createDataFrame(
        [(1, 10, 0.5)], "query_id long, cand_id long, score double"
    )
    two_ranks = ranked.withColumn("lsh_rank", ranked.exact_rank)
    with pytest.raises(ValueError, match="exactly one \\*_rank"):
        rrf_fuse(ranked, no_rank)
    with pytest.raises(ValueError, match="exactly one \\*_rank"):
        rrf_fuse(two_ranks, ranked)


def test_sq8_codes_bounded_and_recall_vs_exact(spark, sf_dir):
    """SQ8 quantized codes stay in [-127, 127]; the two-stage
    SQ8+rerank top-10 recovers nearly all of the exact brute-force
    top-10 (the rerank stage makes ranks of recovered neighbors exact,
    so misses are ONLY stage-1 candidate-cut losses)."""
    from pyspark.sql import functions as F

    from redis_streams_spark.operators.similarity import (
        brute_force_topk,
        sq8_quantize,
        sq8_rerank_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    codes = sq8_quantize(emb).select(
        F.array_min("q").alias("lo"), F.array_max("q").alias("hi")
    ).agg(F.min("lo"), F.max("hi")).collect()[0]
    assert codes[0] >= -127 and codes[1] <= 127

    exact = {
        (r.query_id, r.cand_id)
        for r in brute_force_topk(emb, k=10, query_mod=25).collect()
    }
    got = {
        (r.query_id, r.cand_id): (r.rank, r.cosine)
        for r in sq8_rerank_topk(emb, k=10, query_mod=25, oversample=4).collect()
    }
    recall = len(exact & set(got)) / len(exact)
    assert recall >= 0.9, f"sq8 recall@10 too low: {recall:.3f}"
    # recovered neighbors carry the EXACT cosine (rerank is full
    # precision): spot-check agreement with brute force on overlap
    exact_scores = {
        (r.query_id, r.cand_id): r.cosine
        for r in brute_force_topk(emb, k=10, query_mod=25).collect()
    }
    for key in exact & set(got):
        assert got[key][1] == exact_scores[key]
