"""Learned k-means codebook on the managed vector index (r11 verdict
ask #1) and the Arrow/BLAS probed-cell scoring path (ask #2):
segment-granularity invariance under a frozen codebook, np==hof value
identity in both quantizer modes, codebook carry-over through
compaction, and retrain-on-compact equivalence with a fresh build."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from redis_streams_spark.operators.vecindex import (
    build_vector_index,
    compact_vector_index,
    delete_from_vector_index,
    update_vector_index,
    vector_index_status,
    vector_topk_indexed,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    from redis_streams_spark.session import load_table

    return load_table(spark, SF, "embeddings")


def _res(df):
    return {
        (r.query_id, r.rank): (r.cand_id, r.probed_label, r.cosine)
        for r in df.collect()
    }


def test_learned_segment_granularity_invariance(spark, tmp_path):
    """Under a FROZEN codebook, how the post-build corpus arrives (one
    append vs many, replace churn) must never change answers: cells are
    pinned per vector and the centroid partials merge associatively."""
    emb = _emb(spark)
    a = str(tmp_path / "a")
    build_vector_index(
        emb.where("vec_id % 3 = 0"), a, managed=True, n_cells=8
    )
    update_vector_index(emb.where("vec_id % 3 = 1"), a, segment="t1")
    update_vector_index(emb.where("vec_id % 3 = 2"), a, segment="t2")
    b = str(tmp_path / "b")
    build_vector_index(
        emb.where("vec_id % 3 = 0"), b, managed=True, n_cells=8
    )
    update_vector_index(emb.where("vec_id % 3 != 0"), b, segment="all")
    assert _res(vector_topk_indexed(spark, a)) == _res(
        vector_topk_indexed(spark, b)
    )
    # replay of a named segment keeps counts identical
    update_vector_index(emb.where("vec_id % 3 = 2"), a, segment="t2")
    assert _res(vector_topk_indexed(spark, a)) == _res(
        vector_topk_indexed(spark, b)
    )


def test_np_scoring_value_identity_both_modes(spark, tmp_path):
    emb = _emb(spark)
    for mode, kwargs in (("label", {}), ("kmeans", {"n_cells": 8})):
        root = str(tmp_path / mode)
        build_vector_index(
            emb.where("vec_id % 3 != 2"), root, managed=True, **kwargs
        )
        update_vector_index(emb.where("vec_id % 3 = 2"), root, segment="u1")
        delete_from_vector_index(
            spark, root, emb.where("vec_id % 11 = 5").select("vec_id"),
            segment="d1",
        )
        hof = vector_topk_indexed(spark, root, scoring="hof")
        np_ = vector_topk_indexed(spark, root, scoring="np")
        assert _res(hof) == _res(np_), mode


def test_compact_carries_codebook_and_preserves_answers(spark, tmp_path):
    emb = _emb(spark)
    root = str(tmp_path / "idx")
    build_vector_index(
        emb.where("vec_id % 3 != 2"), root, managed=True, n_cells=8
    )
    update_vector_index(emb.where("vec_id % 3 = 2"), root, segment="u1")
    want = _res(vector_topk_indexed(spark, root))
    out = compact_vector_index(spark, root)
    assert os.path.isdir(os.path.join(out, "codebook"))
    assert _res(vector_topk_indexed(spark, root)) == want
    # the carried codebook still pins appends identically: replaying a
    # slice as a fresh segment after compaction answers like before
    delete_from_vector_index(
        spark, root, emb.where("vec_id % 3 = 2").select("vec_id"),
        segment="d-slice",
    )
    update_vector_index(emb.where("vec_id % 3 = 2"), root, segment="u2")
    assert _res(vector_topk_indexed(spark, root)) == want


def test_retrain_on_compact_equals_fresh_build(spark, tmp_path):
    """compact(retrain=True, k) must answer exactly like a from-scratch
    build with n_cells=k over the live corpus — same deterministic
    seeds (k smallest vec_ids), same Lloyd rounds, same assignments."""
    emb = _emb(spark)
    root = str(tmp_path / "idx")
    build_vector_index(
        emb.where("vec_id % 3 != 2"), root, managed=True, n_cells=8
    )
    update_vector_index(emb.where("vec_id % 3 = 2"), root, segment="u1")
    delete_from_vector_index(
        spark, root, emb.where("vec_id % 11 = 5").select("vec_id"),
        segment="d1",
    )
    compact_vector_index(spark, root, retrain=True, n_cells=6)
    fresh = str(tmp_path / "fresh")
    build_vector_index(
        emb.where("vec_id % 11 != 5"), fresh, managed=True, n_cells=6
    )
    assert _res(vector_topk_indexed(spark, root)) == _res(
        vector_topk_indexed(spark, fresh)
    )
    # a label index converts via retrain too
    lab = str(tmp_path / "lab")
    build_vector_index(emb, lab, managed=True)
    compact_vector_index(spark, lab, retrain=True, n_cells=6)
    fresh2 = str(tmp_path / "fresh2")
    build_vector_index(emb, fresh2, managed=True, n_cells=6)
    assert _res(vector_topk_indexed(spark, lab)) == _res(
        vector_topk_indexed(spark, fresh2)
    )


def test_learned_status_and_ncells_decoupled_from_labels(spark, tmp_path):
    """n_cells is a config knob, not label cardinality: a 4-cell and a
    16-cell index over the same 10-label data both work, and status
    reports per-segment counts regardless of quantizer mode."""
    emb = _emb(spark)
    n = emb.count()
    for k in (4, 16):
        root = str(tmp_path / f"k{k}")
        build_vector_index(emb, root, managed=True, n_cells=k)
        got = vector_topk_indexed(spark, root, k=5)
        assert got.count() > 0
        cells = {
            r.probed_label
            for r in got.select("probed_label").distinct().collect()
        }
        assert cells <= set(range(k))
        st = vector_index_status(spark, root).collect()
        assert [(r.segment, r.n_vectors) for r in st] == [("base", n)]


def test_streaming_ingest_pins_against_frozen_codebook(spark, tmp_path):
    """Streaming appends into a LEARNED-codebook index: the bootstrap
    build trains the quantizer, each micro-batch's vectors are pinned
    against it inside foreachBatch, and the streamed index answers
    exactly like the same bootstrap plus ONE batch append of all
    streamed vectors (granularity invariance, streaming edition)."""
    from pyspark.sql import functions as F

    from redis_streams_spark.sources.stream_log import StreamLog
    from redis_streams_spark.streaming import Producer
    from redis_streams_spark.streaming.bridge import open_stream
    from redis_streams_spark.streaming.windows import project

    emb = _emb(spark)
    boot = emb.where("vec_id % 3 = 0")
    streamed = emb.where("vec_id % 3 != 0")
    root = str(tmp_path / "stream_kidx")
    build_vector_index(boot, root, managed=True, n_cells=8)

    rows = streamed.select("vec_id", "embedding", "label").collect()
    log = StreamLog(str(tmp_path), "vecs")
    Producer(log, "vecs").add_many(
        [
            {
                "vec_id": r.vec_id,
                "label": r.label,
                "emb": ",".join(str(x) for x in r.embedding),
            }
            for r in rows
        ]
    )

    def ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        typed = batch_df.select(
            "vec_id",
            "label",
            F.split("emb", ",").cast("array<float>").alias("embedding"),
        )
        update_vector_index(typed, root, segment=f"b{batch_id}")

    src = open_stream(spark, str(tmp_path), "vecs", group="kx", batch_size=120)
    typed = project(
        src, {"vec_id": "long", "label": "int", "emb": "string"}
    ).select("vec_id", "label", "emb")
    q = (
        typed.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    st = vector_index_status(spark, root).collect()
    assert len(st) >= 3  # bootstrap + >=2 micro-batches
    assert sum(r.n_vectors for r in st) == emb.count()
    ref = str(tmp_path / "ref_kidx")
    build_vector_index(boot, ref, managed=True, n_cells=8)
    update_vector_index(streamed, ref, segment="all")
    assert _res(vector_topk_indexed(spark, root)) == _res(
        vector_topk_indexed(spark, ref)
    )


def test_filtered_ann_prefilter_semantics(spark, tmp_path):
    """filter_ids restricts CANDIDATES only, before scoring: every query
    still gets k rows (true top-k among allowed — pre-filter), every
    cand_id is allowed, queries are drawn from the full corpus, and the
    hof/np physical paths agree under the filter."""
    emb = _emb(spark)
    path = str(tmp_path / "fidx")
    build_vector_index(emb, path, managed=True, n_cells=8)
    allowed = emb.where("label % 3 = 0").select("vec_id")
    allowed_ids = {r.vec_id for r in allowed.collect()}

    hof = vector_topk_indexed(spark, path, k=5, filter_ids=allowed)
    rows = hof.collect()
    assert rows
    assert {r.cand_id for r in rows} <= allowed_ids
    # queries unrestricted: some query_id outside the allowed set
    assert any(r.query_id not in allowed_ids for r in rows)
    # pre-filter: full k rows per query (allowed candidates are dense
    # enough in every probed cell at this scale)
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())

    np_ = vector_topk_indexed(
        spark, path, k=5, filter_ids=allowed, scoring="np"
    )
    assert _res(hof) == _res(np_)


def test_filtered_ann_excludes_tombstoned_and_unfiltered(spark, tmp_path):
    """A vec_id that is allowed but tombstone-deleted stays out; a
    nearest neighbor outside the filter never appears even when it
    would top the unfiltered ranking."""
    emb = _emb(spark)
    path = str(tmp_path / "fidx2")
    build_vector_index(emb, path, managed=True, n_cells=8)
    unfiltered = vector_topk_indexed(spark, path, k=3)
    top = unfiltered.where("rank = 1").collect()
    # filter away every unfiltered rank-1 candidate
    banned = {r.cand_id for r in top}
    allowed = emb.where(
        ~F.col("vec_id").isin(list(banned))
    ).select("vec_id")
    filt = vector_topk_indexed(spark, path, k=3, filter_ids=allowed)
    got = {r.cand_id for r in filt.collect()}
    assert not (got & banned)
    # tombstone one allowed candidate; it must vanish from results
    victim = sorted(got)[0]
    delete_from_vector_index(
        spark, path,
        emb.where(F.col("vec_id") == victim).select("vec_id"),
        segment="fdel",
    )
    after = vector_topk_indexed(spark, path, k=3, filter_ids=allowed)
    assert victim not in {r.cand_id for r in after.collect()}
