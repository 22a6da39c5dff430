"""SemDeDup-style semantic dedup (operators/similarity.semantic_dedup):
verdict semantics on constructed geometry, keep-first determinism, the
pairwise (non-transitive) rule, and cluster scoping."""

from __future__ import annotations

import math

from redis_streams_spark.operators.similarity import semantic_dedup


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows],
        "vec_id long, embedding array<float>, label int",
    )


def _verdicts(df):
    return {r.vec_id: (r.verdict, r.dup_of) for r in df.collect()}


def test_semantic_dedup_keep_first_and_sentinel(spark):
    """Two near-identical vectors: the smaller id keeps, the larger is
    removed with dup_of = the keeper; unrelated vectors keep with the
    -1 sentinel."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # ~cos 1.0 with 0
        (2, [0.0, 0.0, 1.0, 0.0]),      # orthogonal
        (3, [0.0, 0.0, 0.0, 1.0]),
    ]
    got = _verdicts(semantic_dedup(_emb(spark, rows), k=2, iters=1, tau=0.9))
    assert got[0] == ("keep", -1)
    assert got[1] == ("remove", 0)
    assert got[2][0] == "keep" and got[3][0] == "keep"


def test_semantic_dedup_pairwise_not_transitive(spark):
    """A chain a~b, b~c with cos(a,c) below tau: b removed (dup_of=a);
    c's verdict depends only on its DIRECT neighbors — it matches b
    (removed), so c is removed with dup_of pointing at b, the
    documented one-pass SemDeDup shape."""
    # unit vectors in a plane at 0°, 20°, 40°; tau between cos40°≈.766
    # and cos20°≈.940
    def at(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r), 0.0, 0.0]

    rows = [(0, at(0)), (1, at(20)), (2, at(40))]
    got = _verdicts(semantic_dedup(_emb(spark, rows), k=1, iters=1, tau=0.9))
    assert got[0] == ("keep", -1)
    assert got[1] == ("remove", 0)
    assert got[2] == ("remove", 1)  # matched only b; pairwise rule


def test_semantic_dedup_cluster_scoped(spark):
    """Near-duplicates that land in DIFFERENT clusters are not
    compared — the paper's explicit approximation (cluster first,
    quadratic verify only within cells)."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [-1.0, 0.0, 0.0, 0.0]),     # seed 2nd cluster (opposite)
        (2, [0.98, 0.2, 0.0, 0.0]),     # near 0 → cluster of 0
        (3, [-0.98, -0.2, 0.0, 0.0]),   # near 1 → cluster of 1
    ]
    df = semantic_dedup(_emb(spark, rows), k=2, iters=1, tau=0.9)
    got = {r.vec_id: (r.cluster_id, r.verdict) for r in df.collect()}
    # the two clusters each keep their seed and remove their satellite
    assert got[0][1] == "keep" and got[1][1] == "keep"
    assert got[2][1] == "remove" and got[3][1] == "remove"
    assert got[0][0] == got[2][0] and got[1][0] == got[3][0]
    assert got[0][0] != got[1][0]


# --------------------------------------- incremental loop (vector index)


def _eidx(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows],
        "vec_id long, embedding array<float>, label int",
    )


def test_semantic_ingest_batch_replay_safe(spark, tmp_path):
    """The online loop: batch verdicted against accepted history
    (probed cells, cosine >= tau), verdicts durable, keepers appended;
    at-least-once redelivery of the same (batch, segment) yields
    identical verdicts and index state."""
    import os

    from redis_streams_spark.operators.vecindex import (
        build_vector_index,
        semantic_ingest_batch,
        vector_index_status,
    )

    hist = _eidx(
        spark,
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 1.0, 0.0]),
        ],
    )
    root = str(tmp_path / "idx")
    build_vector_index(hist, root, managed=True, n_cells=2, train_iters=1)
    batch = _eidx(
        spark,
        [
            (10, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0 → remove
            (11, [0.0, 0.0, 0.0, 1.0]),      # fresh → keep
        ],
    )
    got = {
        r.vec_id: (r.verdict, r.match_id)
        for r in semantic_ingest_batch(batch, root, segment="b1", tau=0.9)
    .collect()
    }
    assert got[10] == ("remove", 0)
    assert got[11] == ("keep", -1)
    assert os.path.isdir(os.path.join(root, "_verdicts"))
    # redelivery: same verdicts (own segment excluded from the probe),
    # same index state (dynamic overwrite replaces)
    again = {
        r.vec_id: (r.verdict, r.match_id)
        for r in semantic_ingest_batch(batch, root, segment="b1", tau=0.9)
    .collect()
    }
    assert again == got
    st = {r.segment: r for r in vector_index_status(spark, root).collect()}
    assert "b1" in st
    # a LATER batch near the kept 11 now matches history
    batch2 = _eidx(spark, [(20, [0.0, 0.0, 0.01, 0.999])])
    got2 = {
        r.vec_id: (r.verdict, r.match_id)
        for r in semantic_ingest_batch(batch2, root, segment="b2", tau=0.9)
    .collect()
    }
    assert got2[20] == ("remove", 11)


def test_semantic_ingest_refuses_reused_live_id(spark, tmp_path):
    """A batch vec_id already live in another segment is refused
    loudly (this loop dedups new docs; refreshes go through
    replace=True) — and assume_fresh_ids=True skips the guard."""
    import pytest as _pytest

    from redis_streams_spark.operators.vecindex import (
        build_vector_index,
        semantic_ingest_batch,
    )

    hist = _eidx(spark, [(0, [1.0, 0.0, 0.0, 0.0]),
                         (1, [0.0, 1.0, 0.0, 0.0])])
    root = str(tmp_path / "idx")
    build_vector_index(hist, root, managed=True, n_cells=1, train_iters=1)
    reuse = _eidx(spark, [(0, [0.0, 0.0, 1.0, 0.0])])  # re-embedded id 0
    with _pytest.raises(ValueError, match="already live"):
        semantic_ingest_batch(reuse, root, segment="b1", tau=0.9)
    # replay of the SAME batch under its own segment stays allowed:
    # the guard ignores the batch's own prior segment
    fresh = _eidx(spark, [(10, [0.0, 0.0, 0.0, 1.0])])
    semantic_ingest_batch(fresh, root, segment="b2", tau=0.9)
    again = semantic_ingest_batch(fresh, root, segment="b2", tau=0.9)
    assert {r.vec_id for r in again.collect()} == {10}
