"""Round-13 review fixes (r12 ADVICE.md items): gram-index delete
namespace enforcement, idempotent gram-segment drop, live-name reuse
on the gram family (completing the four-family sweep started in
test_segstore_r12.py), durable ingest verdicts (no driver collect in
the hot loop), PQ subvector divisibility, and the n_probe-aware
kernel sizing bound."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from redis_streams_spark.operators.dedup import duplicated_spans
from redis_streams_spark.operators.gramindex import (
    build_gram_index,
    delete_from_gram_index,
    drop_gram_segment,
    ingest_gram_batch,
    probe_gram_spans,
    update_gram_index,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(df):
    return {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in df.collect()
    }


RUN = "r1 r2 r3 r4 r5 r6 r7 r8"
RUN2 = "q1 q2 q3 q4 q5 q6 q7 q8"


# ------------------------------------------------ delete-batch namespace


def test_gram_delete_namespace_enforced(spark, tmp_path):
    """A negative-count partial outside the reserved 'del-*'/'*.del'
    namespace would dodge drop_gram_segment's entanglement guard and
    let a later drop silently skew net counts — refused at write time
    (r12 advice, medium)."""
    root = str(tmp_path / "g")
    hist = _docs(spark, [(1, f"{RUN} alpha")])
    build_gram_index(hist, root, n=8, managed=True)
    with pytest.raises(ValueError, match="reserved delete-batch"):
        delete_from_gram_index(spark, root, hist, segment="d1")
    # both reserved spellings pass
    delete_from_gram_index(spark, root, hist.limit(0), segment="del-ok")
    delete_from_gram_index(spark, root, hist.limit(0), segment="x.del")


def test_drop_gram_segment_idempotent_when_already_dead(spark, tmp_path):
    """A retried retention job that partially applied must converge,
    matching drop_vector_segment's contract (r12 advice)."""
    root = str(tmp_path / "g")
    build_gram_index(_docs(spark, [(1, f"{RUN} a")]), root, n=8, managed=True)
    update_gram_index(_docs(spark, [(2, f"{RUN2} b")]), root, segment="u1")
    drop_gram_segment(spark, root, "u1")
    drop_gram_segment(spark, root, "u1")  # retry: silent no-op
    with pytest.raises(ValueError, match="no live segment"):
        drop_gram_segment(spark, root, "never-existed")


# ------------------------------------------------ live-name reuse


def test_gram_segment_name_reuse_replaces_content(spark, tmp_path):
    """Re-ingesting CHANGED content under a reused live segment name
    must fully replace the old counts (the r11-advice hazard class,
    closed by segstore.clear_segment_partitions — this extends the
    three-family regression in test_segstore_r12.py to the gram
    family): gram buckets derive from content hashes, so a changed
    batch writes a different partition set and stale buckets would
    otherwise linger live."""
    root = str(tmp_path / "g")
    hist = _docs(spark, [(1, "h1 h2 h3 h4 h5 h6 h7 h8 h9")])
    build_gram_index(hist, root, n=8, managed=True)
    v1 = _docs(spark, [(5, f"{RUN} one")])
    update_gram_index(v1, root, segment="wave")
    # changed content, SAME segment name
    v2 = _docs(spark, [(5, f"{RUN2} two")])
    update_gram_index(v2, root, segment="wave")
    probe = _docs(spark, [(10, f"{RUN} pad"), (11, f"{RUN2} pad")])
    got = _spans(probe_gram_spans(probe, root))
    ref = _spans(
        duplicated_spans(
            hist.unionByName(v2).unionByName(probe), n=8
        ).where("doc_id >= 10")
    )
    # v1's RUN grams are gone: only the RUN2 probe doc matches
    assert got == ref
    assert all(d == 11 for d, *_ in got)


# ------------------------------------------------ durable ingest verdicts


def test_ingest_gram_batch_verdicts_are_durable(spark, tmp_path):
    """The online loop persists verdicts to parquet (default
    <root>/_verdicts, partitioned by segment) and returns the frame
    read back from disk — the hot ingest path never materializes
    span rows on the driver (r12 verdict 'what's wrong')."""
    root = str(tmp_path / "g")
    hist = _docs(spark, [(1, f"{RUN} alpha beta")])
    build_gram_index(hist, root, n=8, managed=True)
    batch = _docs(spark, [(10, f"pre {RUN} post"), (11, "f1 f2 f3")])
    got = _spans(ingest_gram_batch(batch, root, segment="b1"))
    vdir = os.path.join(root, "_verdicts")
    assert os.path.isdir(vdir)
    stored = spark.read.parquet(vdir).where("segment = 'b1'")
    assert _spans(stored) == got
    # replay under the same segment overwrites in place — one copy
    again = _spans(ingest_gram_batch(batch, root, segment="b1"))
    assert again == got
    assert _spans(spark.read.parquet(vdir).where("segment = 'b1'")) == got
    # a custom verdicts_path is honored
    other = str(tmp_path / "v2")
    batch2 = _docs(spark, [(20, f"z {RUN} z2")])
    ingest_gram_batch(batch2, root, segment="b2", verdicts_path=other)
    assert os.path.isdir(other)


# ------------------------------------------------ PQ contract checks


def test_pq_subvectors_rejects_nondivisible_width(spark):
    """size(v) % m != 0 used to silently drop trailing dims (and
    size(v) < m yielded degenerate all-zero-distance codes) — now a
    loud row-side failure (r12 advice)."""
    from redis_streams_spark.operators.similarity import pq_subvectors

    e = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0, 5.0])], "vec_id long, v array<double>"
    )
    with pytest.raises(Exception, match="not divisible"):
        pq_subvectors(e, m=4).collect()
    ok = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0])], "vec_id long, v array<double>"
    )
    assert pq_subvectors(ok, m=4).count() == 4


def test_np_pq_bound_scales_with_n_probe(spark, tmp_path):
    """The kernel's driver-sizing guard is max_queries × n_probe, not
    a hard-coded ×8 — a high-n_probe run within the query budget must
    pass, and both scoring paths stay value-identical (r12 advice)."""
    from redis_streams_spark.operators.vecindex import (
        build_vector_index,
        vector_topk_pq,
    )
    from redis_streams_spark.session import load_table

    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "idx")
    build_vector_index(
        emb, path, managed=True, n_cells=16, pq_m=4, pq_ksub=8
    )
    nq = emb.where(F.col("vec_id") % 25 == 0).count()
    kw = dict(k=5, query_mod=25, n_probe=12, max_queries=nq)
    got = vector_topk_pq(spark, path, scoring="np", **kw)
    ref = vector_topk_pq(spark, path, scoring="rel", **kw)

    def _r(df):
        return {
            (r.query_id, r.rank): (r.cand_id, r.pq_dot) for r in df.collect()
        }

    assert _r(got) == _r(ref)
    # the guard still fires when the probe set genuinely exceeds it
    with pytest.raises(ValueError, match="probe set exceeds"):
        vector_topk_pq(
            spark, path, scoring="np", k=5, query_mod=25, n_probe=12,
            max_queries=max(1, nq // 4),
        )


# ------------------------------------------------ BLAS Lloyd rebuild


def test_codebook_rebuild_np_equals_relational(spark):
    """The Arrow partial-sum centroid rebuild (r12 verdict ask #7)
    must yield a codebook value-identical to the relational
    posexplode/avg path — the 6-dp rnd absorbs the partial-sum
    reassociation, so every (cell, dim) value matches exactly."""
    from redis_streams_spark.operators.similarity import as_double_vec
    from redis_streams_spark.operators.vecindex import _train_codebook
    from redis_streams_spark.session import load_table

    e = as_double_vec(load_table(spark, SF, "embeddings"))
    for k, iters in ((8, 2), (5, 1)):
        np_cb = {
            r["cell"]: (tuple(r["cv"]), r["cnorm"])
            for r in _train_codebook(e, k, iters, rebuild="np").collect()
        }
        rel_cb = {
            r["cell"]: (tuple(r["cv"]), r["cnorm"])
            for r in _train_codebook(e, k, iters, rebuild="rel").collect()
        }
        assert np_cb == rel_cb
