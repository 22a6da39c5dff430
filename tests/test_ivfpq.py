"""IVF-PQ on the managed vector index: codes pinned at write time,
lifecycle (append/replace/delete/compact/retrain), rerank exactness,
filter composition, and the codes column's column-pruned scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from redis_streams_spark.operators.vecindex import (
    build_vector_index,
    compact_vector_index,
    delete_from_vector_index,
    update_vector_index,
    vector_topk_pq,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    from redis_streams_spark.session import load_table

    return load_table(spark, SF, "embeddings")


def _res(df):
    return {
        (r.query_id, r.rank): (r.cand_id, r.pq_dot, r.cosine)
        for r in df.collect()
    }


def _build(emb, path, **kw):
    return build_vector_index(
        emb, path, managed=True, n_cells=8, pq_m=4, pq_ksub=8, **kw
    )


def test_ivfpq_segment_granularity_invariance(spark, tmp_path):
    """Under frozen books, arrival granularity never changes answers:
    codes and cells are pinned per vector, centroid partials merge
    associatively."""
    emb = _emb(spark)
    a = str(tmp_path / "a")
    _build(emb.where("vec_id % 3 = 0"), a)
    update_vector_index(emb.where("vec_id % 3 = 1"), a, segment="t1")
    update_vector_index(emb.where("vec_id % 3 = 2"), a, segment="t2")
    b = str(tmp_path / "b")
    _build(emb.where("vec_id % 3 = 0"), b)
    update_vector_index(emb.where("vec_id % 3 != 0"), b, segment="all")
    assert _res(vector_topk_pq(spark, a)) == _res(vector_topk_pq(spark, b))


def test_ivfpq_delete_and_replace(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "idx")
    _build(emb, path)
    before = vector_topk_pq(spark, path, k=3)
    victim = before.where("rank = 1").first().cand_id
    delete_from_vector_index(
        spark, path,
        emb.where(F.col("vec_id") == victim).select("vec_id"),
        segment="d1",
    )
    after = vector_topk_pq(spark, path, k=3)
    assert victim not in {r.cand_id for r in after.collect()}
    # replace: re-embedded vectors get NEW codes pinned at write
    mod = emb.where("vec_id % 7 = 3").withColumn(
        "embedding",
        F.transform(
            "embedding",
            lambda x, i: F.when(
                i == 0, x.cast("double") + F.lit(0.5)
            ).otherwise(x.cast("double")),
        ),
    )
    update_vector_index(mod, path, segment="r1", replace=True)
    vector_topk_pq(spark, path, k=3).collect()  # no duplicate survivors


def test_ivfpq_compact_carries_books(spark, tmp_path):
    """Plain compaction carries both frozen books: answers identical
    before and after; retrain-on-compact retrains BOTH quantizers and
    still returns a full valid top-k."""
    emb = _emb(spark)
    path = str(tmp_path / "idx")
    _build(emb.where("vec_id % 3 != 2"), path)
    update_vector_index(emb.where("vec_id % 3 = 2"), path, segment="u1")
    before = _res(vector_topk_pq(spark, path))
    compact_vector_index(spark, path)
    assert _res(vector_topk_pq(spark, path)) == before
    compact_vector_index(spark, path, retrain=True, n_cells=6)
    out = vector_topk_pq(spark, path).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, 11)) for v in per_q.values())


def test_ivfpq_rerank_is_exact_cosine(spark, tmp_path):
    """Stage 2 must produce the same cosine values as the exact
    brute-force scorer for every surviving (query, cand) pair."""
    from redis_streams_spark.operators.similarity import brute_force_topk

    emb = _emb(spark)
    path = str(tmp_path / "idx")
    _build(emb, path)
    got = vector_topk_pq(spark, path, k=5).collect()
    bf = {
        (r.query_id, r.cand_id): r.cosine
        for r in brute_force_topk(emb, k=200, query_mod=25).collect()
    }
    hits = 0
    for r in got:
        key = (r.query_id, r.cand_id)
        if key in bf:
            assert bf[key] == r.cosine
            hits += 1
    assert hits > 0


def test_ivfpq_filter_composes(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "idx")
    _build(emb, path)
    allowed = emb.where("label % 3 = 0").select("vec_id")
    allowed_ids = {r.vec_id for r in allowed.collect()}
    got = vector_topk_pq(spark, path, k=5, filter_ids=allowed).collect()
    assert got
    assert {r.cand_id for r in got} <= allowed_ids
    assert any(r.query_id not in allowed_ids for r in got)


def test_ivfpq_requires_pq_build(spark, tmp_path):
    import pytest

    emb = _emb(spark)
    path = str(tmp_path / "plain")
    build_vector_index(emb, path, managed=True, n_cells=8)
    with pytest.raises(ValueError, match="pq_m"):
        vector_topk_pq(spark, path)


def test_ivfpq_np_equals_rel(spark, tmp_path):
    """The Arrow LUT-gather kernel and the relational explode/join/sum
    path are value-identical — including pq_dot itself (both consume
    the SAME Spark-computed integer LUT), with and without a filter."""
    emb = _emb(spark)
    path = str(tmp_path / "idx")
    _build(emb, path)
    rel = vector_topk_pq(spark, path)
    np_ = vector_topk_pq(spark, path, scoring="np")
    assert _res(rel) == _res(np_)
    allowed = emb.where("label % 3 = 0").select("vec_id")
    relf = vector_topk_pq(spark, path, filter_ids=allowed)
    npf = vector_topk_pq(spark, path, filter_ids=allowed, scoring="np")
    assert _res(relf) == _res(npf)


def test_streaming_ingest_pins_codes_against_frozen_pqbook(spark, tmp_path):
    """Streaming appends into an IVF-PQ index: the bootstrap build
    trains BOTH quantizers, each micro-batch pins coarse cells AND PQ
    codes against the frozen books inside foreachBatch, and the
    streamed index answers the compressed-domain search exactly like
    the same bootstrap plus one batch append of all streamed vectors."""
    from redis_streams_spark.operators.vecindex import vector_index_status
    from redis_streams_spark.sources.stream_log import StreamLog
    from redis_streams_spark.streaming import Producer
    from redis_streams_spark.streaming.bridge import open_stream
    from redis_streams_spark.streaming.windows import project

    emb = _emb(spark)
    boot = emb.where("vec_id % 3 = 0")
    streamed = emb.where("vec_id % 3 != 0")
    root = str(tmp_path / "stream_pq")
    _build(boot, root)

    rows = streamed.select("vec_id", "embedding", "label").collect()
    log = StreamLog(str(tmp_path), "pqvecs")
    Producer(log, "pqvecs").add_many(
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

    src = open_stream(
        spark, str(tmp_path), "pqvecs", group="pqx", batch_size=120
    )
    typed = project(
        src, {"vec_id": "long", "label": "int", "emb": "string"}
    ).select("vec_id", "label", "emb")
    q = (
        typed.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpq"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    st = vector_index_status(spark, root).collect()
    assert sum(r.n_vectors for r in st) == emb.count()
    ref = str(tmp_path / "ref_pq")
    _build(boot, ref)
    update_vector_index(streamed, ref, segment="all")
    assert _res(vector_topk_pq(spark, root)) == _res(
        vector_topk_pq(spark, ref)
    )
