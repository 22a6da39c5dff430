"""Round-12 review fixes on the shared segment/MANIFEST lifecycle
(r11 ADVICE.md items): live-segment name reuse with changed content,
probe cache-leak control, the bsets-count sizing job, gc vs in-flight
merge, and the reserved delete-batch namespace."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from redis_streams_spark.operators.dedup import incremental_dedup
from redis_streams_spark.operators.dupindex import (
    build_dedup_index,
    init_dedup_index,
    probe_dedup_index,
    probe_dedup_session,
    update_dedup_index,
)
from redis_streams_spark.operators.segstore import (
    MERGE_LOCK,
    acquire_merge_lock,
    release_merge_lock,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    from redis_streams_spark.session import load_table

    return load_table(spark, SF, "documents")


def _rows(df):
    return [tuple(r) for r in df.collect()]


# ------------------------------------------------ segment name reuse


def test_dedup_segment_name_reuse_replaces_content(spark, tmp_path):
    """Re-ingesting CHANGED content under an existing live segment name
    must fully supersede the old content — the old content hashes land
    in different (segment, bucket) partitions, and before the r12 fix
    those stale buckets stayed live (probes matched superseded text)."""
    docs = _docs(spark)
    hist = docs.where("doc_id % 10 != 7")
    batch = docs.where("doc_id % 10 = 7")
    root = str(tmp_path / "idx")
    init_dedup_index(root)
    wave1 = hist.withColumn("text", F.concat("text", F.lit(" wave-one zz")))
    update_dedup_index(wave1, root, segment="refresh")
    wave2 = hist  # same doc_ids, different content, SAME segment name
    update_dedup_index(wave2, root, segment="refresh")
    # probe a batch that exact-matches wave1's texts: must all be KEEP
    # (wave1 content no longer in the index), while wave2's content
    # still matches
    probe1 = batch.withColumn(
        "text", F.concat("text", F.lit(" wave-one zz"))
    )
    got = probe_dedup_index(probe1, root, persist=False)
    want = incremental_dedup(wave2, probe1, hashed=True)
    assert _rows(got) == _rows(want)
    got2 = probe_dedup_index(batch, root, persist=False)
    want2 = incremental_dedup(wave2, batch, hashed=True)
    assert _rows(got2) == _rows(want2)


def test_vector_segment_name_reuse_replaces_content(spark, tmp_path):
    """Same hazard on the vector index's (segment, label) cells: a
    reused name whose new batch covers different labels must not leave
    the old labels' cells (or their centroid influence) alive."""
    from redis_streams_spark.operators.vecindex import (
        build_vector_index,
        update_vector_index,
        vector_topk_indexed,
    )
    from redis_streams_spark.session import load_table

    emb = load_table(spark, SF, "embeddings")
    root = str(tmp_path / "vidx")
    build_vector_index(emb.where("vec_id % 3 = 0"), root, managed=True)
    # wave 1: labels shifted so the segment covers DIFFERENT cells
    wave1 = emb.where("vec_id % 3 != 0").withColumn(
        "label", (F.col("label") + 5) % 10
    )
    update_vector_index(wave1, root, segment="u")
    wave2 = emb.where("vec_id % 3 != 0")
    update_vector_index(wave2, root, segment="u")
    got = vector_topk_indexed(spark, root, k=5, query_mod=25, n_probe=2)
    # rebuild over the intended live corpus (base + wave2 only)
    root2 = str(tmp_path / "vidx2")
    build_vector_index(emb, root2, managed=True)
    want = vector_topk_indexed(spark, root2, k=5, query_mod=25, n_probe=2)
    key = ["query_id", "rank"]
    assert _rows(got.orderBy(*key)) == _rows(want.orderBy(*key))


def test_invindex_segment_name_reuse_replaces_content(spark, tmp_path):
    from redis_streams_spark.operators.invindex import (
        bm25_topk_indexed,
        build_inverted_index,
        update_inverted_index,
    )

    docs = _docs(spark)
    root = str(tmp_path / "iidx")
    build_inverted_index(docs.where("doc_id % 10 < 5"), root, managed=True)
    seg_docs = docs.where("doc_id % 10 >= 5")
    wave1 = seg_docs.withColumn(
        "text", F.concat("text", F.lit(" zqxj zqxj unique-wave-one"))
    )
    update_inverted_index(wave1, root, segment="u")
    update_inverted_index(seg_docs, root, segment="u")
    queries = {1: ("zqxj",), 2: ("data", "stream")}
    got = bm25_topk_indexed(spark, root, queries, k=5)
    root2 = str(tmp_path / "iidx2")
    build_inverted_index(docs, root2, managed=True)
    want = bm25_topk_indexed(spark, root2, queries, k=5)
    key = ["query_id", "rank"]
    assert _rows(got.orderBy(*key)) == _rows(want.orderBy(*key))
    # wave1's unique token must be gone entirely
    assert got.where("query_id = 1").count() == 0


# ------------------------------------------------ probe cache control


def test_probe_session_and_persist_false_leave_no_cache(spark, tmp_path):
    docs = _docs(spark)
    hist = docs.where("doc_id % 10 != 7")
    batch = docs.where("doc_id % 10 = 7").limit(20)
    root = str(tmp_path / "idx")
    build_dedup_index(hist, root)
    def n_cached():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    before = n_cached()
    with probe_dedup_session(batch, root) as verdicts:
        rows = _rows(verdicts)
        assert rows  # consumed inside the scope
    assert n_cached() == before
    out = probe_dedup_index(batch, root, persist=False)
    assert _rows(out) == rows
    assert n_cached() == before


def test_probe_batch_count_hint_skips_sizing_job(spark, tmp_path):
    """The caller-supplied hint must produce identical verdicts on both
    sides of the pruning gate (the gate is an optimization, never a
    semantic switch)."""
    docs = _docs(spark)
    hist = docs.where("doc_id % 10 != 7")
    batch = docs.where("doc_id % 10 = 7")
    root = str(tmp_path / "idx")
    build_dedup_index(hist, root)
    want = _rows(probe_dedup_index(batch, root, persist=False))
    small = _rows(
        probe_dedup_index(batch, root, batch_count=1, persist=False)
    )
    large = _rows(
        probe_dedup_index(batch, root, batch_count=10**6, persist=False)
    )
    assert small == want
    assert large == want


# ------------------------------------------------ gc vs in-flight merge


def test_gc_refuses_while_merge_in_flight(spark, tmp_path):
    from redis_streams_spark.operators.invindex import (
        build_inverted_index,
        gc_index,
        merge_segments,
        update_inverted_index,
    )

    docs = _docs(spark)
    root = str(tmp_path / "iidx")
    build_inverted_index(docs.where("doc_id % 10 < 6"), root, managed=True)
    update_inverted_index(
        docs.where("doc_id % 10 = 6"), root, segment="s6"
    )
    update_inverted_index(
        docs.where("doc_id % 10 = 7"), root, segment="s7"
    )
    # simulate the staged-but-not-flipped window: lock held
    acquire_merge_lock(root, "test")
    with pytest.raises(ValueError, match="merge in flight"):
        gc_index(root)
    # force=True is the crash-recovery path and removes the marker
    gc_index(root, force=True)
    assert not os.path.exists(os.path.join(root, MERGE_LOCK))
    # a real merge acquires and releases cleanly
    merged = merge_segments(spark, root, ["s6", "s7"])
    assert not os.path.exists(os.path.join(root, MERGE_LOCK))
    gc_index(root)  # no lock -> no error
    # double-acquire is refused (single-writer guard)
    acquire_merge_lock(root, "test")
    with pytest.raises(ValueError, match="already in flight"):
        acquire_merge_lock(root, "test")
    release_merge_lock(root)
    assert merged  # merge result intact after the dance


# ------------------------------------------------ reserved namespace


def test_delete_batch_namespace_reserved(spark, tmp_path):
    from redis_streams_spark.operators.invindex import (
        build_inverted_index,
        update_inverted_index,
    )
    from redis_streams_spark.operators.vecindex import (
        build_vector_index,
        update_vector_index,
    )
    from redis_streams_spark.session import load_table

    docs = _docs(spark)
    emb = load_table(spark, SF, "embeddings")
    d_root = str(tmp_path / "didx")
    build_dedup_index(docs.limit(50), d_root)
    i_root = str(tmp_path / "iidx")
    build_inverted_index(docs.limit(50), i_root)
    v_root = str(tmp_path / "vidx")
    build_vector_index(emb.limit(50), v_root)
    for bad in ("del-abc", "batch.del"):
        with pytest.raises(ValueError, match="reserved"):
            update_dedup_index(docs.limit(5), d_root, segment=bad)
        with pytest.raises(ValueError, match="reserved"):
            update_inverted_index(docs.limit(5), i_root, segment=bad)
        with pytest.raises(ValueError, match="reserved"):
            update_vector_index(emb.limit(5), v_root, segment=bad)
