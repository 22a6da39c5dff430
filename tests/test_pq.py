"""Product-quantization ANN (operators/similarity.py PQ block):
codebook structure, code assignment, determinism, subspace split, and
agreement with brute force on well-separated data."""

from __future__ import annotations

from pyspark.sql import functions as F

from redis_streams_spark.operators.similarity import (
    as_double_vec,
    brute_force_topk,
    pq_rerank_topk,
    pq_subvectors,
    pq_train_codebooks,
    _pq_assign,
)
from redis_streams_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return load_table(spark, SF, "embeddings")


def test_subvector_split_reconstructs(spark):
    e = as_double_vec(_emb(spark)).limit(20)
    sub = pq_subvectors(e, m=4)
    rows = sub.groupBy("vec_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "sv"))),
                lambda r: r["sv"],
            )
        ).alias("rebuilt")
    )
    back = {r.vec_id: r.rebuilt for r in rows.collect()}
    orig = {r.vec_id: r.v for r in e.select("vec_id", "v").collect()}
    assert back == orig


def test_codebook_shape_and_codes(spark):
    e = as_double_vec(_emb(spark))
    cent = pq_train_codebooks(e, m=4, k_sub=8, iters=2)
    rows = cent.collect()
    by_s = {}
    for r in rows:
        by_s.setdefault(r.s, set()).add(r.code)
        assert len(r.cv) == 16  # 64 dims / 4 subspaces
    assert set(by_s) == {0, 1, 2, 3}
    assert all(codes <= set(range(8)) for codes in by_s.values())
    codes = _pq_assign(pq_subvectors(e, 4), cent)
    n = e.count()
    per_vec = codes.groupBy("vec_id").count().collect()
    assert len(per_vec) == n and all(r["count"] == 4 for r in per_vec)


def test_training_deterministic(spark):
    e = as_double_vec(_emb(spark))
    a = {(r.s, r.code): r.cv for r in pq_train_codebooks(e, 4, 8, 2).collect()}
    b = {(r.s, r.code): r.cv for r in pq_train_codebooks(e, 4, 8, 2).collect()}
    assert a == b


def test_pq_rerank_output_contract(spark):
    got = pq_rerank_topk(_emb(spark), k=5, query_mod=50, oversample=4).collect()
    assert got
    per_q = {}
    for r in got:
        assert r.cand_id != r.query_id
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())
    # rerank stage is exact: cosines must match brute force's values
    bf = {
        (r.query_id, r.cand_id): r.cosine
        for r in brute_force_topk(_emb(spark), k=50, query_mod=50).collect()
    }
    for r in got:
        key = (r.query_id, r.cand_id)
        if key in bf:
            assert bf[key] == r.cosine


def test_pq_top1_on_separated_clusters(spark):
    # two far-apart clusters: compressed-domain scoring cannot confuse
    # them — every query's PQ top-1 must come from its own cluster, and
    # once oversample covers the in-cluster code-tie group (same-cluster
    # vectors share codes, so stage-1 ties on pq_dot), the exact rerank
    # must recover brute force's top-1 exactly
    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        base = 10.0 if i % 2 == 0 else -10.0
        rows.append(
            (i, [base + rng.uniform(-0.1, 0.1) for _ in range(8)], i % 2)
        )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    small = {
        r.query_id: r.cand_id
        for r in pq_rerank_topk(
            emb, k=1, query_mod=10, oversample=4, m=2, k_sub=4, iters=2
        ).collect()
    }
    assert all(q % 2 == c % 2 for q, c in small.items())  # own cluster
    wide = {
        r.query_id: r.cand_id
        for r in pq_rerank_topk(
            emb, k=1, query_mod=10, oversample=20, m=2, k_sub=4, iters=2
        ).collect()
    }
    bf = {
        r.query_id: r.cand_id
        for r in brute_force_topk(emb, k=1, query_mod=10).collect()
    }
    assert wide == bf
