"""Persisted dedup-signature index (operators/dupindex.py): probe
value-identity with the from-scratch ``incremental_dedup``, lifecycle
identity with rebuilds (update / replace / delete / compact / drop),
replay-safety of deterministic segments, and the candidate-bucket
pruning contract on the shingle verify scan."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from redis_streams_spark.operators.dedup import incremental_dedup
from redis_streams_spark.operators.dupindex import (
    N_BUCKETS,
    build_dedup_index,
    compact_dedup_index,
    dedup_index_status,
    delete_from_dedup_index,
    drop_dedup_segment,
    gc_dedup_index,
    probe_dedup_index,
    update_dedup_index,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    from redis_streams_spark.session import load_table

    return load_table(spark, SF, "documents")


def _split(spark):
    docs = _docs(spark)
    return docs.where("doc_id % 10 != 7"), docs.where("doc_id % 10 = 7")


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_probe_matches_incremental_dedup(spark, tmp_path):
    hist, batch = _split(spark)
    root = str(tmp_path / "idx")
    build_dedup_index(hist, root)
    got = _rows(probe_dedup_index(batch, root))
    want = _rows(incremental_dedup(hist, batch, hashed=True))
    assert got == want
    assert len(got) == batch.count()
    verdicts = {v for _, v, _ in got}
    assert "keep" in verdicts  # non-degenerate corpus


def test_update_segment_matches_union_build(spark, tmp_path):
    hist, batch = _split(spark)
    h1 = hist.where("doc_id % 10 < 5")
    h2 = hist.where("doc_id % 10 >= 5")
    root = str(tmp_path / "idx")
    build_dedup_index(h1, root, managed=True)
    update_dedup_index(h2, root, segment="b1")
    assert _rows(probe_dedup_index(batch, root)) == _rows(
        incremental_dedup(hist, batch, hashed=True)
    )


def test_update_replay_is_idempotent(spark, tmp_path):
    """A re-delivered batch (at-least-once foreachBatch) with a
    deterministic segment name replaces its own partitions instead of
    double-counting."""
    hist, batch = _split(spark)
    h1 = hist.where("doc_id % 10 < 5")
    h2 = hist.where("doc_id % 10 >= 5")
    root = str(tmp_path / "idx")
    build_dedup_index(h1, root, managed=True)
    update_dedup_index(h2, root, segment="b1")
    want = _rows(probe_dedup_index(batch, root))
    update_dedup_index(h2, root, segment="b1")  # replay
    assert _rows(probe_dedup_index(batch, root)) == want
    st = {r.segment: r.n_docs for r in dedup_index_status(spark, root).collect()}
    assert st == {"base": h1.count(), "b1": h2.count()}


def test_replace_reingest_matches_rebuild(spark, tmp_path):
    """Refresh: changed documents re-ingested with replace=True stop
    matching their own stale copies — probe equals a from-scratch
    index over the current corpus."""
    hist, batch = _split(spark)
    root = str(tmp_path / "idx")
    build_dedup_index(hist, root, managed=True)
    mod = hist.where("doc_id % 10 = 3").withColumn(
        "text", F.concat(F.col("text"), F.lit(" refreshed zz"))
    )
    update_dedup_index(mod, root, segment="r1", replace=True)
    current = hist.where("doc_id % 10 != 3").unionByName(mod)
    assert _rows(probe_dedup_index(batch, root)) == _rows(
        incremental_dedup(current, batch, hashed=True)
    )
    # replay of the same replace batch recomputes identical corrections
    update_dedup_index(mod, root, segment="r1", replace=True)
    assert _rows(probe_dedup_index(batch, root)) == _rows(
        incremental_dedup(current, batch, hashed=True)
    )


def test_delete_matches_rebuild_on_survivors(spark, tmp_path):
    hist, batch = _split(spark)
    root = str(tmp_path / "idx")
    build_dedup_index(hist, root, managed=True)
    dels = hist.where("doc_id % 10 = 1").select("doc_id")
    delete_from_dedup_index(spark, root, dels, segment="d1")
    survivors = hist.where("doc_id % 10 != 1")
    assert _rows(probe_dedup_index(batch, root)) == _rows(
        incremental_dedup(survivors, batch, hashed=True)
    )


def test_compact_preserves_probe_and_drops_tombstones(spark, tmp_path):
    hist, batch = _split(spark)
    root = str(tmp_path / "idx")
    build_dedup_index(hist, root, managed=True)
    delete_from_dedup_index(spark, root, [11, 21, 31], segment="d1")
    before = probe_dedup_index(batch, root)  # lazy, old generation
    want = _rows(before)
    out = compact_dedup_index(spark, root)
    assert out.endswith("g00000002")
    with open(os.path.join(root, "MANIFEST"), encoding="utf-8") as fh:
        assert json.load(fh) == {
            "generation": "g00000002",
            "dead": [],
            "pending": [],
        }
    # pre-flip reader still drains the old generation's intact files
    assert _rows(before) == want
    # fresh probe resolves the compacted generation, value-identical
    assert _rows(probe_dedup_index(batch, root)) == want
    # tombstoned rows physically gone: one segment, no tombstone dir
    assert not os.path.isdir(os.path.join(out, "tombstones"))
    st = dedup_index_status(spark, root).collect()
    assert [r.segment for r in st] == ["base"]
    assert st[0].n_docs == hist.count() - 3
    assert st[0].n_tombstoned == 0


def test_drop_segment_is_metadata_only_retention(spark, tmp_path):
    hist, batch = _split(spark)
    h1 = hist.where("doc_id % 10 < 5")
    h2 = hist.where("doc_id % 10 >= 5")
    root = str(tmp_path / "idx")
    build_dedup_index(h1, root, managed=True)
    update_dedup_index(h2, root, segment="b1")
    # mtime snapshot: drop must not touch data files
    files = {
        os.path.join(dp, f): os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet")
    }
    drop_dedup_segment(spark, root, "b1")
    drop_dedup_segment(spark, root, "b1")  # idempotent
    after = {
        os.path.join(dp, f): os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet")
    }
    assert after == files
    assert _rows(probe_dedup_index(batch, root)) == _rows(
        incremental_dedup(h1, batch, hashed=True)
    )
    removed = gc_dedup_index(root)
    assert any("segment=b1" in p for p in removed)
    assert _rows(probe_dedup_index(batch, root)) == _rows(
        incremental_dedup(h1, batch, hashed=True)
    )


def test_empty_index_probe_keeps_everything(spark, tmp_path):
    _, batch = _split(spark)
    root = str(tmp_path / "never-built")
    os.makedirs(root)
    got = probe_dedup_index(batch, root).collect()
    assert {r.verdict for r in got} == {"keep"}
    assert all(r.match_id is None for r in got)
    assert len(got) == batch.count()


def test_verify_scan_prunes_to_candidate_buckets(spark, tmp_path):
    """The shingle store is read through a bucket IN-filter derived
    from the actual candidates — the verify scan's PartitionFilters
    must carry it, so exact-Jaccard verification reads candidate
    buckets' files, not the corpus."""
    hist, batch = _split(spark)
    root = str(tmp_path / "idx")
    build_dedup_index(hist, root)
    df = probe_dedup_index(batch, root)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the shingles scan carries a bucket IN-filter (candidate pruning);
    # N_BUCKETS is small enough that sf0.001 candidates hit a strict
    # subset of buckets
    import re

    # identify the shingle-store scan by its output column (the
    # Location path may be truncated in the rendered plan)
    scans = [
        s
        for s in plan.split("FileScan")
        if re.search(r"[\[,]sh#\d+", s.split("\n")[0])
    ]
    assert scans, "no shingles FileScan in plan"
    m = re.search(r"bucket#\d+ IN \(([^)]*)\)", scans[0])
    assert m, f"no bucket IN-filter on the shingles scan: {scans[0][:400]}"
    n_probed = len(m.group(1).split(","))
    assert n_probed < N_BUCKETS


def test_streaming_ingest_with_online_dedup(spark, tmp_path):
    """The continuously-deduplicated-corpus shape: documents arrive on
    the stream log, each micro-batch is verdicted against the
    accumulated index and only the keepers are appended
    (dedup_ingest_batch inside foreachBatch).  The result must equal a
    driver-side sequential simulation over the SAME micro-batches
    (greedy first-seen-wins), and a re-delivered batch must be
    idempotent."""
    from redis_streams_spark.operators.dupindex import dedup_ingest_batch
    from redis_streams_spark.sources.stream_log import StreamLog
    from redis_streams_spark.streaming import Producer
    from redis_streams_spark.streaming.bridge import open_stream
    from redis_streams_spark.streaming.windows import project

    docs = _docs(spark).where(F.col("doc_id") < 300)
    rows = docs.select("doc_id", "text").collect()
    log = StreamLog(str(tmp_path), "docs")
    Producer(log, "docs").add_many(
        [{"doc_id": r.doc_id, "text": r.text} for r in rows]
    )

    root = str(tmp_path / "stream_dupidx")
    vpath = str(tmp_path / "verdicts")
    seen_batches: dict[int, list[int]] = {}

    def ingest(batch_df, batch_id):
        ids = [r.doc_id for r in batch_df.select("doc_id").collect()]
        if ids:
            seen_batches[batch_id] = ids
            dedup_ingest_batch(
                batch_df.select("doc_id", "text"), root, f"b{batch_id}", vpath
            )

    src = open_stream(spark, str(tmp_path), "docs", group="dd", batch_size=80)
    typed = project(src, {"doc_id": "long", "text": "string"}).select(
        "doc_id", "text"
    )
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

    assert len(seen_batches) >= 2  # 300 docs / batch_size 80

    # sequential reference: replay the observed batches in order with
    # the from-scratch incremental_dedup over accumulated keepers
    kept: list[int] = []
    want_verdicts: dict[int, str] = {}
    for bid in sorted(seen_batches):
        batch = docs.where(F.col("doc_id").isin(seen_batches[bid]))
        history = docs.where(F.col("doc_id").isin(kept or [-1]))
        for r in incremental_dedup(history, batch, hashed=True).collect():
            want_verdicts[r.doc_id] = r.verdict
            if r.verdict == "keep":
                kept.append(r.doc_id)

    got_verdicts = {
        r.doc_id: r.verdict
        for r in spark.read.parquet(vpath).select("doc_id", "verdict").collect()
    }
    assert got_verdicts == want_verdicts
    st = dedup_index_status(spark, root).collect()
    assert sum(r.n_docs for r in st) == len(kept)

    # replay the first batch (at-least-once delivery): excluded own
    # segment + dynamic overwrite → identical verdicts, same index
    bid0 = sorted(seen_batches)[0]
    batch0 = docs.where(F.col("doc_id").isin(seen_batches[bid0]))
    dedup_ingest_batch(
        batch0.select("doc_id", "text"), root, f"b{bid0}", vpath
    )
    got_again = {
        r.doc_id: r.verdict
        for r in spark.read.parquet(vpath).select("doc_id", "verdict").collect()
    }
    assert got_again == want_verdicts
    st2 = dedup_index_status(spark, root).collect()
    assert sum(r.n_docs for r in st2) == len(kept)


def test_meta_pins_shingle_width(spark, tmp_path):
    """A probe reuses the build's shingle n (META), so an index built
    with n=2 verifies with 2-gram sets."""
    hist, batch = _split(spark)
    root = str(tmp_path / "idx")
    build_dedup_index(hist, root, n=2)
    assert _rows(probe_dedup_index(batch, root)) == _rows(
        incremental_dedup(hist, batch, n=2, hashed=True)
    )


def test_hashed_verify_agrees_with_string_verify(spark):
    """incremental_dedup's hashed form (what the index stores) and its
    string form (collision-free reference) produce identical verdicts
    on the test corpus — h32 collisions are the ONLY possible
    divergence and none occur at this shingle cardinality."""
    hist, batch = _split(spark)
    assert _rows(incremental_dedup(hist, batch, hashed=True)) == _rows(
        incremental_dedup(hist, batch)
    )


def test_drop_refuses_delete_batches(spark, tmp_path):
    """Dropping a DELETE batch must be refused: the manifest dead-list
    governs store partitions, not tombstone tseg partitions, so the
    drop would report success while the deletions stayed in force
    (r11 review finding)."""
    import pytest

    hist, _ = _split(spark)
    root = str(tmp_path / "idx")
    build_dedup_index(hist, root, managed=True)
    delete_from_dedup_index(spark, root, [11, 21], segment="d1")
    with pytest.raises(ValueError, match="delete batch"):
        drop_dedup_segment(spark, root, "d1")


def test_maintenance_advice_ladder(spark, tmp_path):
    """Healthy single-segment index → no advice; heavy tombstone churn
    → compaction advice; manifest dead segments → gc advice."""
    from redis_streams_spark.operators.dupindex import (
        dedup_index_maintenance_advice,
    )

    hist, _ = _split(spark)
    root = str(tmp_path / "idx")
    build_dedup_index(hist, root, managed=True)
    assert dedup_index_maintenance_advice(spark, root) == []
    heavy = hist.where("doc_id % 5 != 0").select("doc_id")  # 80% deleted
    delete_from_dedup_index(spark, root, heavy, segment="d1")
    advice = dedup_index_maintenance_advice(spark, root)
    assert any("compact_dedup_index" in a and "tombstoned" in a for a in advice)
    update_dedup_index(hist.limit(5), root, segment="tiny1")
    drop_dedup_segment(spark, root, "tiny1")
    advice = dedup_index_maintenance_advice(spark, root)
    assert any("gc_dedup_index" in a for a in advice)


def test_minhash_verify_budget_mode(spark, tmp_path):
    """store_shingles=False: no corpus-sized store on disk, probes
    auto-route to band-agreement verification, exact-dup detection is
    unchanged, and the explicit-exact request fails loudly."""
    import pytest
    from pyspark.sql import functions as F

    hist, batch = _split(spark)
    root = str(tmp_path / "idx")
    build_dedup_index(hist, root, store_shingles=False)
    assert not os.path.isdir(os.path.join(root, "shingles"))
    got = probe_dedup_index(batch, root, persist=False)
    rows = _rows(got)
    assert len(rows) == batch.count()
    # exact stage is digest-based and identical to the exact-verify
    # index: every exact_dup verdict matches the full probe's
    full_root = str(tmp_path / "full")
    build_dedup_index(hist, full_root)
    want_exact = {
        (d, m) for d, v, m in _rows(probe_dedup_index(batch, full_root, persist=False))
        if v == "exact_dup"
    }
    got_exact = {(d, m) for d, v, m in rows if v == "exact_dup"}
    assert got_exact == want_exact
    # near/keep may flip (the quantified budget trade) but every
    # near_dup must still come from a real band-bucket candidate:
    # spot-check one via the operator's own counting rule
    with pytest.raises(ValueError, match="store_shingles=False"):
        probe_dedup_index(batch, root, verify="exact", persist=False)
    # updates inherit the flag: the appended segment writes no shingles
    update_dedup_index(batch.limit(10), root, segment="u1")
    assert not os.path.isdir(os.path.join(root, "shingles"))
    # and a full index still honors an explicit minhash request
    mh = probe_dedup_index(batch, full_root, verify="minhash", persist=False)
    assert _rows(mh) == rows
