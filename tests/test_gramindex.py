"""Persisted n-gram frequency index (incremental substring dedup):
probe ≡ whole-corpus duplicated_spans, negative-partial deletes,
netting compaction, replay-safe ingest loop, drop entanglement rule."""

from __future__ import annotations

import pytest

from redis_streams_spark.operators.dedup import duplicated_spans
from redis_streams_spark.operators.gramindex import (
    build_gram_index,
    compact_gram_index,
    delete_from_gram_index,
    drop_gram_segment,
    gram_index_status,
    ingest_gram_batch,
    probe_gram_spans,
    update_gram_index,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(df):
    return {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in df.collect()
    }


RUN = "r1 r2 r3 r4 r5 r6 r7 r8"
RUN2 = "q1 q2 q3 q4 q5 q6 q7 q8"


@pytest.fixture()
def corpus(spark):
    hist = _docs(
        spark,
        [
            (1, f"{RUN} alpha beta"),
            (2, f"{RUN2} gamma delta"),
            (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
        ],
    )
    batch = _docs(
        spark,
        [
            (10, f"pre1 pre2 {RUN} post1"),  # duplicates history
            (11, f"{RUN2}"),  # duplicates history exactly
            (12, "w1 w2 w3 w4 w5 w6 w7 w8 w9"),  # all fresh
            (13, f"x1 {RUN2} x2"),  # also duplicates history
        ],
    )
    return hist, batch


def test_probe_equals_whole_corpus_spans(spark, tmp_path, corpus):
    hist, batch = corpus
    root = str(tmp_path / "g")
    build_gram_index(hist, root, n=8, managed=True)
    got = _spans(probe_gram_spans(batch, root))
    ref = _spans(
        duplicated_spans(hist.unionByName(batch), n=8).where("doc_id >= 10")
    )
    assert got == ref
    assert (10, 3, 10, 8) in got and (11, 1, 8, 8) in got


def test_batch_internal_repeats_count(spark, tmp_path):
    hist = _docs(spark, [(1, "h1 h2 h3 h4 h5 h6 h7 h8 h9")])
    batch = _docs(
        spark,
        [(10, f"{RUN} mid1 mid2 {RUN}")],  # repeats only WITHIN the batch
    )
    root = str(tmp_path / "g")
    build_gram_index(hist, root, n=8, managed=True)
    got = _spans(probe_gram_spans(batch, root))
    assert got == {(10, 1, 8, 8), (10, 11, 18, 8)}


def test_delete_negative_partials(spark, tmp_path, corpus):
    hist, batch = corpus
    root = str(tmp_path / "g")
    build_gram_index(hist, root, n=8, managed=True)
    # retire doc 2 (the RUN2 source): batch docs 11/13 stop matching it,
    # but they still duplicate EACH OTHER (batch-internal)
    delete_from_gram_index(
        spark, root, hist.where("doc_id = 2"), segment="del-d2"
    )
    got = _spans(probe_gram_spans(batch, root))
    ref = _spans(
        duplicated_spans(
            hist.where("doc_id != 2").unionByName(batch), n=8
        ).where("doc_id >= 10")
    )
    assert got == ref
    # compaction nets the negative mass; answers unchanged
    compact_gram_index(spark, root)
    assert _spans(probe_gram_spans(batch, root)) == ref
    st = {r.segment: r.net_gram_mass for r in gram_index_status(spark, root).collect()}
    assert set(st) == {"base"}


def test_ingest_loop_replay_safe(spark, tmp_path, corpus):
    hist, batch = corpus
    root = str(tmp_path / "g")
    build_gram_index(hist, root, n=8, managed=True)
    first = _spans(ingest_gram_batch(batch, root, segment="b1"))
    # at-least-once redelivery: same batch, same segment — verdicts
    # identical, index state identical (probe excluded its own segment)
    again = _spans(ingest_gram_batch(batch, root, segment="b1"))
    assert first == again
    # a LATER batch repeating batch-1 text now matches history
    batch2 = _docs(spark, [(20, f"z1 {RUN} z2 z3")])
    got2 = _spans(ingest_gram_batch(batch2, root, segment="b2"))
    assert (20, 2, 9, 8) in got2


def test_drop_refused_while_delete_segments_live(spark, tmp_path, corpus):
    hist, batch = corpus
    root = str(tmp_path / "g")
    build_gram_index(hist, root, n=8, managed=True)
    update_gram_index(batch, root, segment="u1")
    delete_from_gram_index(
        spark, root, hist.where("doc_id = 2"), segment="del-d2"
    )
    with pytest.raises(ValueError, match="compact"):
        drop_gram_segment(spark, root, "u1")
    compact_gram_index(spark, root)
    # post-compaction there is only 'base'; dropping a gone segment errors
    with pytest.raises(ValueError, match="no live segment"):
        drop_gram_segment(spark, root, "u1")


def test_drop_segment_without_deletes(spark, tmp_path, corpus):
    hist, batch = corpus
    root = str(tmp_path / "g")
    build_gram_index(hist, root, n=8, managed=True)
    update_gram_index(batch, root, segment="u1")
    drop_gram_segment(spark, root, "u1")
    # batch gram mass gone: a reprobe behaves like it was never ingested
    got = _spans(probe_gram_spans(batch, root))
    ref = _spans(
        duplicated_spans(hist.unionByName(batch), n=8).where("doc_id >= 10")
    )
    assert got == ref
