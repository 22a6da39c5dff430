"""Managed vector (IVF) index (operators/vecindex.py): query
value-identity with from-scratch ``ivf_topk`` over the live corpus
after every lifecycle op, replay-safety, centroid-partial merging, and
the drop/entanglement contract."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from redis_streams_spark.operators.similarity import ivf_topk
from redis_streams_spark.operators.vecindex import (
    build_vector_index,
    compact_vector_index,
    delete_from_vector_index,
    drop_vector_segment,
    gc_vector_index,
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


def _as_double(emb):
    return emb.withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )


def _bump_first_dim(emb):
    return emb.withColumn(
        "embedding",
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x.cast("double") + F.lit(0.5)).otherwise(
                x.cast("double")
            ),
        ),
    )


def test_update_merges_centroid_partials_exactly(spark, tmp_path):
    """base + appended segment must answer exactly like ivf_topk over
    the union corpus — including PROBE SELECTION, which depends on the
    read-time-merged centroids being the live-corpus centroids."""
    emb = _emb(spark)
    root = str(tmp_path / "vidx")
    build_vector_index(emb.where("vec_id % 3 != 2"), root, managed=True)
    update_vector_index(emb.where("vec_id % 3 = 2"), root, segment="u1")
    assert _res(vector_topk_indexed(spark, root)) == _res(
        ivf_topk(emb, k=10, query_mod=25, n_probe=2)
    )
    # replay the segment: dynamic overwrite keeps counts identical
    update_vector_index(emb.where("vec_id % 3 = 2"), root, segment="u1")
    assert _res(vector_topk_indexed(spark, root)) == _res(
        ivf_topk(emb, k=10, query_mod=25, n_probe=2)
    )
    st = {r.segment: r.n_vectors for r in vector_index_status(spark, root).collect()}
    assert st == {
        "base": emb.where("vec_id % 3 != 2").count(),
        "u1": emb.where("vec_id % 3 = 2").count(),
    }


def test_replace_and_delete_match_rebuild(spark, tmp_path):
    emb = _emb(spark)
    root = str(tmp_path / "vidx")
    build_vector_index(emb, root, managed=True)
    mod = _bump_first_dim(emb.where("vec_id % 7 = 3"))
    update_vector_index(mod, root, segment="r1", replace=True)
    current = _as_double(emb.where("vec_id % 7 != 3")).unionByName(mod)
    assert _res(vector_topk_indexed(spark, root)) == _res(
        ivf_topk(current, k=10, query_mod=25, n_probe=2)
    )
    delete_from_vector_index(
        spark, root, emb.where("vec_id % 11 = 5").select("vec_id"), segment="d1"
    )
    survivors = current.where("vec_id % 11 != 5")
    want = _res(ivf_topk(survivors, k=10, query_mod=25, n_probe=2))
    assert _res(vector_topk_indexed(spark, root)) == want
    # compact into the next generation: values unchanged, MANIFEST flipped
    out = compact_vector_index(spark, root)
    assert out.endswith("g00000002")
    with open(os.path.join(root, "MANIFEST"), encoding="utf-8") as fh:
        assert json.load(fh)["generation"] == "g00000002"
    assert _res(vector_topk_indexed(spark, root)) == want
    assert not os.path.isdir(os.path.join(out, "tombstones"))
    st = vector_index_status(spark, root).collect()
    assert [r.segment for r in st] == ["base"]
    assert st[0].n_tombstoned == 0


def test_drop_segment_retention_and_entanglement_refusal(spark, tmp_path):
    import pytest

    emb = _emb(spark)
    root = str(tmp_path / "vidx")
    b1 = emb.where("vec_id % 3 != 2")
    build_vector_index(b1, root, managed=True)
    update_vector_index(emb.where("vec_id % 3 = 2"), root, segment="u1")
    drop_vector_segment(spark, root, "u1")
    drop_vector_segment(spark, root, "u1")  # idempotent
    want = _res(ivf_topk(b1, k=10, query_mod=25, n_probe=2))
    assert _res(vector_topk_indexed(spark, root)) == want
    removed = gc_vector_index(root)
    assert any("segment=u1" in p for p in removed)
    assert _res(vector_topk_indexed(spark, root)) == want
    # a deleted-into segment is entangled: its negative partials live
    # under the delete batch — dropping the victim alone would skew
    # the merged centroids
    update_vector_index(emb.where("vec_id % 3 = 2"), root, segment="u2")
    delete_from_vector_index(spark, root, [2, 5], segment="d1")
    with pytest.raises(ValueError, match="entangled"):
        drop_vector_segment(spark, root, "u2")


def test_fully_deleted_label_drops_out_of_probes(spark, tmp_path):
    """Deleting every vector of a label must remove its centroid from
    probe ranking (cnt nets to 0), matching a rebuild without it."""
    emb = _emb(spark)
    labels = [r[0] for r in emb.select("label").distinct().collect()]
    victim = sorted(labels)[0]
    root = str(tmp_path / "vidx")
    build_vector_index(emb, root, managed=True)
    delete_from_vector_index(
        spark,
        root,
        emb.where(F.col("label") == victim).select("vec_id"),
        segment="d1",
    )
    survivors = emb.where(F.col("label") != victim)
    assert _res(vector_topk_indexed(spark, root)) == _res(
        ivf_topk(survivors, k=10, query_mod=25, n_probe=2)
    )


def test_streaming_embedding_ingest_matches_batch_build(spark, tmp_path):
    """The continuously-embedded-corpus shape: vectors arrive on the
    stream log, each micro-batch appends a segment inside foreachBatch
    (replay-safe deterministic names), and the resulting index answers
    exactly like a batch build over the same vectors — probe selection
    included, since centroid partials merge per read."""
    from redis_streams_spark.sources.stream_log import StreamLog
    from redis_streams_spark.streaming import Producer
    from redis_streams_spark.streaming.bridge import open_stream
    from redis_streams_spark.streaming.windows import project

    emb = _emb(spark).where("vec_id < 400")
    rows = emb.select("vec_id", "embedding", "label").collect()
    log = StreamLog(str(tmp_path), "vecs")
    Producer(log, "vecs").add_many(
        [
            {
                "vec_id": r.vec_id,
                "label": r.label,
                # the stream log carries flat payloads; ship the vector
                # as a CSV string and reparse in the sink
                "emb": ",".join(str(x) for x in r.embedding),
            }
            for r in rows
        ]
    )

    root = str(tmp_path / "stream_vidx")

    def ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        typed = batch_df.select(
            "vec_id",
            "label",
            F.split("emb", ",").cast("array<float>").alias("embedding"),
        )
        update_vector_index(typed, root, segment=f"b{batch_id}")

    src = open_stream(spark, str(tmp_path), "vecs", group="vx", batch_size=150)
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
    assert len(st) >= 2  # 400 vecs / batch_size 150
    assert sum(r.n_vectors for r in st) == emb.count()
    # round-trip precision: float -> str -> float is exact for repr
    # strings, so the streamed index must answer EXACTLY like a batch
    # build over the same vectors
    batch_root = str(tmp_path / "batch_vidx")
    build_vector_index(emb, batch_root)
    assert _res(vector_topk_indexed(spark, root)) == _res(
        vector_topk_indexed(spark, batch_root)
    )


def test_vector_maintenance_advice_ladder(spark, tmp_path):
    from redis_streams_spark.operators.vecindex import (
        vector_index_maintenance_advice,
    )

    emb = _emb(spark)
    root = str(tmp_path / "vidx")
    build_vector_index(emb, root, managed=True)
    assert vector_index_maintenance_advice(spark, root) == []
    heavy = emb.where("vec_id % 5 != 0").select("vec_id")
    delete_from_vector_index(spark, root, heavy, segment="d1")
    advice = vector_index_maintenance_advice(spark, root)
    assert any("compact_vector_index" in a and "tombstoned" in a for a in advice)
