"""Ingest-dedup cost at scale: the persisted dedup-signature index
(operators/dupindex.py) vs the from-scratch ``incremental_dedup``.

The production shape: a corpus accumulates, every new ingest batch is
verdicted against it.  From scratch, each batch pays a full-corpus
tokenize + minhash of the HISTORY side; with the index, history costs
are paid ONCE at build and each probe pays batch-sized hashing plus
signature-sized equi-joins (the shingle verify scan pruned to the
candidates' buckets).  This script times both per batch at a scaled
corpus, plus the maintenance ops (replace-refresh, tombstone delete,
compact) — the SCALE.md evidence that per-batch cost follows the
batch.

Usage: python tools/dupindex_scale.py [sf_dir] [n_batches]
  (sf_dir defaults to /root/testdata/sf0.1; scale it up first with
   tools/make_scale_data.py for the 100x measurement)

       python tools/dupindex_scale.py [sf_dir] budget
  the byte-budget comparison (r11 advice #6): exact-verify index
  (with the corpus-sized shingle store) vs store_shingles=False +
  minhash band-agreement verification — store bytes, probe wall, and
  the verdict-flip rate between the two modes on the same batch.
"""

from __future__ import annotations

import atexit
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from redis_streams_spark.operators.dedup import incremental_dedup  # noqa: E402
from redis_streams_spark.operators.dupindex import (  # noqa: E402
    build_dedup_index,
    compact_dedup_index,
    delete_from_dedup_index,
    probe_dedup_index,
    update_dedup_index,
)
from redis_streams_spark.session import get_spark, load_table  # noqa: E402


def timed(label: str, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    # leading newline: survive Spark's \r progress-bar overwrites
    print(f"\n{label}: {dt:.1f}s", flush=True)
    return out, dt


def _du(path: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def budget_mode(sf_dir: str) -> None:
    spark = get_spark("dupindex-budget")
    docs = load_table(spark, sf_dir, "documents")
    hist = docs.where("doc_id % 10 != 7")
    batch = docs.where("doc_id % 10 = 7")
    print(f"corpus: {docs.count()} docs, history {hist.count()}, "
          f"batch {batch.count()}")
    full = tempfile.mkdtemp(prefix="dupidx-full-")
    slim = tempfile.mkdtemp(prefix="dupidx-slim-")
    atexit.register(shutil.rmtree, full, ignore_errors=True)
    atexit.register(shutil.rmtree, slim, ignore_errors=True)
    timed("build exact-verify index", lambda: build_dedup_index(hist, full))
    timed(
        "build budget index (store_shingles=False)",
        lambda: build_dedup_index(hist, slim, store_shingles=False),
    )
    per_store = {
        sub: _du(os.path.join(full, sub))
        for sub in ("digests", "bands", "shingles")
    }
    print("\nexact index bytes: "
          + ", ".join(f"{k}={v / 1e6:.0f}MB" for k, v in per_store.items()))
    print(f"budget index bytes: {_du(slim) / 1e6:.0f}MB total "
          f"(vs {_du(full) / 1e6:.0f}MB)")
    (ex_rows, _) = timed(
        "probe exact (warm 2nd)",
        lambda: [
            probe_dedup_index(batch, full, persist=False).collect(),
            probe_dedup_index(batch, full, persist=False).collect(),
        ][-1],
    )
    (mh_rows, _) = timed(
        "probe minhash-verify (warm 2nd)",
        lambda: [
            probe_dedup_index(batch, slim, persist=False).collect(),
            probe_dedup_index(batch, slim, persist=False).collect(),
        ][-1],
    )
    ex = {r.doc_id: (r.verdict, r.match_id) for r in ex_rows}
    mh = {r.doc_id: (r.verdict, r.match_id) for r in mh_rows}
    assert ex.keys() == mh.keys()
    flips = {d for d in ex if ex[d][0] != mh[d][0]}
    match_moves = {
        d for d in ex
        if ex[d][0] == mh[d][0] != "keep" and ex[d][1] != mh[d][1]
    }
    n = len(ex)
    print(f"\nverdicts: {n}; verdict flips {len(flips)} "
          f"({len(flips) / n:.2%}); same-verdict match_id moves "
          f"{len(match_moves)} ({len(match_moves) / n:.2%})")
    from collections import Counter

    dirs = Counter((ex[d][0], mh[d][0]) for d in flips)
    for (a, b), c in sorted(dirs.items()):
        print(f"  {a} -> {b}: {c}")
    spark.stop()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    if len(sys.argv) > 2 and sys.argv[2] == "budget":
        budget_mode(sf_dir)
        return
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("dupindex-scale")
    docs = load_table(spark, sf_dir, "documents")
    # history = 90% of the corpus; batches = slices of the last 10%
    hist = docs.where("doc_id % 10 != 7")
    print(f"corpus: {docs.count()} docs, history {hist.count()}")
    root = tempfile.mkdtemp(prefix="dupidx-")
    atexit.register(shutil.rmtree, root, ignore_errors=True)

    _, t_build = timed("index build (one-time)", lambda: build_dedup_index(hist, root, managed=True))

    t_probe = t_scratch = t_warm = 0.0
    for i in range(n_batches):
        batch = docs.where(f"doc_id % 10 = 7 AND doc_id % {n_batches} = {i}")
        _, dt = timed(
            f"probe batch {i} (indexed)",
            lambda b=batch: probe_dedup_index(b, root).count(),
        )
        t_probe += dt
        # the from-scratch comparator must actually pay the history
        # recompute: incremental_dedup persists the history shingle
        # sets, and Spark's CacheManager matches the identical plan on
        # the next call — without the clear, batches 2..n would probe
        # an accidental in-memory signature index (which is the
        # "warm" line below: real for a long-lived driver, gone on
        # restart, and not pinnable at 100 TB)
        spark.catalog.clearCache()
        _, dt = timed(
            f"probe batch {i} (from scratch, cold)",
            lambda b=batch: incremental_dedup(hist, b).count(),
        )
        t_scratch += dt
        _, dt = timed(
            f"probe batch {i} (from scratch, warm cache)",
            lambda b=batch: incremental_dedup(hist, b).count(),
        )
        t_warm += dt
        spark.catalog.clearCache()

    # maintenance: refresh 2% of history, retire 2%, compact
    mod = hist.where("doc_id % 50 = 3").withColumn(
        "text", F.concat(F.col("text"), F.lit(" refreshed zz"))
    )
    timed("refresh (replace 2%)", lambda: update_dedup_index(mod, root, segment="r1", replace=True))
    timed(
        "delete (tombstone 2%)",
        lambda: delete_from_dedup_index(
            spark, root, hist.where("doc_id % 50 = 9").select("doc_id"), segment="d1"
        ),
    )
    batch0 = docs.where(f"doc_id % 10 = 7 AND doc_id % {n_batches} = 0")
    timed("probe after maintenance", lambda: probe_dedup_index(batch0, root).count())
    timed("compact", lambda: compact_dedup_index(spark, root))
    timed("probe after compact", lambda: probe_dedup_index(batch0, root).count())

    saved = t_scratch / n_batches - t_probe / n_batches
    print(
        f"\nper-batch: indexed {t_probe / n_batches:.1f}s vs "
        f"from-scratch cold {t_scratch / n_batches:.1f}s "
        f"(warm cache {t_warm / n_batches:.1f}s)"
        + (
            f"; build amortizes after ~{t_build / saved:.1f} batches"
            if saved > 0
            else "; from-scratch still wins at this corpus size"
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
