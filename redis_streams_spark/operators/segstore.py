"""Shared machinery for SEGMENTED, MANIFEST-committed on-disk indexes.

Factored out of ``operators/invindex.py`` (r11) when the persisted
dedup-signature index (``operators/dupindex.py``) needed the identical
lifecycle: an index ROOT may be MANAGED — it holds generation
subdirectories (``g00000001``, …) plus a ``MANIFEST`` file — JSON
``{"generation": …, "dead": […], "pending": […]}`` — always written
LAST via an atomic rename.  Readers resolve the live generation through
the manifest and exclude ``dead``/``pending`` segments with a
partition-pruned NOT-IN, which is what makes compaction a pointer flip
and retention/merge O(metadata) commit points.

Store contract: every parquet subtree of a generation is partitioned by
a ``segment`` column (plus store-specific subpartitions); one ingest
batch = one segment, written with a deterministic name under dynamic
partition overwrite so at-least-once replay replaces rather than
double-counts.

Reference basis: none (SURVEY §2.2 extension surface — the reference
has no persistence layer); the discipline is Lucene's commit points
re-expressed as parquet partitions + an atomic pointer file.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

MANIFEST = "MANIFEST"
MERGE_LOCK = "MERGE_IN_PROGRESS"
LAYOUT = "LAYOUT"


def write_layout(gpath: str, layout: dict) -> None:
    """Persist per-generation physical-layout constants (e.g. the term
    bucket count) next to the data they describe.  Written once by the
    first segment write of a generation and copied by compaction, so
    every reader and every later ingest of that generation agrees on
    the layout without a global constant (r14 optimization: the bucket
    count is scale-derived at build time, guide §6 — fewer, larger
    files at small corpora, more pruning partitions at large ones).
    Atomic rename like the MANIFEST."""
    local = _local_path(gpath)
    os.makedirs(local, exist_ok=True)
    tmp = os.path.join(local, f".{LAYOUT}.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(layout, fh)
        fh.write("\n")
    os.replace(tmp, os.path.join(local, LAYOUT))


def read_layout(gpath: str) -> dict | None:
    """Layout constants of a generation dir, or None (pre-layout tree:
    readers fall back to the historical defaults)."""
    p = os.path.join(_local_path(gpath), LAYOUT)
    if not os.path.isfile(p):
        return None
    with open(p, encoding="utf-8") as fh:
        return json.load(fh)


def _local_path(p: str) -> str:
    """The ``file://``-stripping seam (see :func:`read_optional`) for
    driver-side filesystem ops on index trees."""
    return p[7:] if p.startswith("file://") else p


def check_segment_name(seg: str, op: str) -> None:
    """Reject segment names in the delete-batch namespace.  Tombstone
    batches are stored under ``<segment>.del`` / ``del-<uuid>`` names;
    an ORDINARY ingest segment wearing such a name would be
    misclassified by entanglement checks (permanently undroppable with
    a misleading error — r11 advice), so the namespace is reserved at
    write time."""
    if seg.endswith(".del") or seg.startswith("del-"):
        raise ValueError(
            f"{op}: segment name {seg!r} is in the reserved delete-batch "
            "namespace ('*.del' / 'del-*') — pick a different name"
        )


def clear_segment_partitions(
    gpath: str, stores: tuple[str, ...], segment: str
) -> list[str]:
    """Remove an existing segment's partition directories ahead of a
    named-segment rewrite.  Stores are partitioned by ``(segment,
    <subkey>)``, and dynamic partition overwrite replaces only the
    (segment, subkey) pairs PRESENT in the new batch — re-ingesting
    CHANGED content under an existing live segment name would leave the
    old content's other subkey partitions alive (r11 advice: probes
    silently matching superseded rows).  Clearing first makes a named
    write mean "this batch IS the segment" unconditionally; for an
    at-least-once REPLAY (identical content) the clear+rewrite is a
    no-op on the end state.  Crash window: a crash between clear and
    rewrite loses the segment until the batch is re-delivered — the
    same at-least-once contract deterministic segment names already
    assume.  Driver-side filesystem ops (local/HDFS seam).  Returns
    the removed paths."""
    import shutil

    removed: list[str] = []
    for sub in stores:
        part = os.path.join(_local_path(gpath), sub, f"segment={segment}")
        if os.path.isdir(part):
            shutil.rmtree(part)
            removed.append(part)
    return removed


def acquire_merge_lock(path: str, op: str) -> None:
    """Mark a staged-but-uncommitted merge in flight.  ``gc`` refuses
    to reclaim pending segments while the marker exists — without it,
    a gc run between a merge's stage flip and commit flip would
    destroy the staged output AND erase the pending record (r11
    advice).  Single-writer contract: a pre-existing marker means a
    crashed merge; the caller decides (gc with force=True cleans
    up)."""
    lock = os.path.join(_local_path(path), MERGE_LOCK)
    if os.path.exists(lock):
        raise ValueError(
            f"{op}: a merge is already in flight (or crashed) — "
            f"{lock} exists; finish/abort it, or reclaim with "
            "gc(force=True) after verifying no merge is running"
        )
    with open(lock, "w", encoding="utf-8") as fh:
        fh.write(f"{op} pid={os.getpid()}\n")


def release_merge_lock(path: str) -> None:
    try:
        os.unlink(os.path.join(_local_path(path), MERGE_LOCK))
    except FileNotFoundError:
        pass


def _dir_signature(local: str) -> int:
    """Cheap content signature of a parquet tree: a hash over every
    file's (relative path, size, mtime_ns).  Any write Spark can make —
    append (new part files), dynamic partition overwrite (replaced part
    files with fresh names/mtimes), delete/rename — changes it, so it
    is a sound invalidation key for plan reuse.  Walking the few
    hundred files of an index store is microseconds against the
    partition-discovery + footer-read job a fresh
    ``spark.read.parquet`` schedules."""
    acc = 0
    n = 0
    for root, _dirs, files in os.walk(local):
        rel = os.path.relpath(root, local)
        for f in files:
            try:
                st = os.stat(os.path.join(root, f))
            except OSError:
                continue
            n += 1
            acc ^= hash((rel, f, st.st_size, st.st_mtime_ns))
    return hash((n, acc))


def read_optional(spark: SparkSession, p: str) -> DataFrame | None:
    """Read a parquet tree that may not exist yet (empty index, no
    tombstones) — driver-side existence probe for local paths, with the
    AnalysisException fallback for remote schemes.  The one copy of the
    ``file://``-stripping seam an object-store port would extend.

    For local paths the returned DataFrame (an immutable plan) is
    memoized per session, keyed by a directory signature over the
    tree's (name, size, mtime) set: every index read funnels through
    here, and profiling (OPTIMIZATION_r13.md) showed repeated
    ``spark.read.parquet`` partition-discovery jobs over the same
    unchanged store dominating the *_indexed query paths.  Any mutation
    of the tree changes the signature and forces a fresh read, so
    readers never see a stale file listing.  Set
    SPARK_GRAFT_NO_TABLE_CACHE=1 to disable (same switch as
    ``session.load_table``)."""
    local = p[7:] if p.startswith("file://") else p
    if "://" not in local and not os.path.isdir(local):
        return None
    if "://" in local or os.environ.get("SPARK_GRAFT_NO_TABLE_CACHE"):
        try:
            return spark.read.parquet(p)
        except AnalysisException:
            return None
    cache = getattr(spark, "_rss_read_cache", None)
    if cache is None:
        cache = spark._rss_read_cache = {}
    sig = _dir_signature(local)
    hit = cache.get(local)
    if hit is not None and hit[0] == sig:
        return hit[1]
    try:
        df = spark.read.parquet(p)
    except AnalysisException:
        return None
    cache[local] = (sig, df)
    return df


def read_manifest(path: str) -> dict | None:
    """Parse the MANIFEST commit point: ``{"generation": g, "dead":
    [...], "pending": [...]}``, or the legacy one-line generation
    pointer, or None for an unmanaged root.

    ``dead`` segments have been dropped or merged away — readers
    exclude their partitions (a partition-pruned NOT-IN, so exclusion
    is free); ``pending`` segments are mid-commit (a merge staged its
    output but has not flipped yet) and are excluded the same way, so
    a crash between staging and commit leaves the index exactly as it
    was."""
    m = os.path.join(path, MANIFEST)
    if not os.path.isfile(m):
        return None
    with open(m, encoding="utf-8") as fh:
        raw = fh.read().strip()
    if raw.startswith("{"):
        d = json.loads(raw)
        return {
            "generation": d["generation"],
            "dead": list(d.get("dead", [])),
            "pending": list(d.get("pending", [])),
        }
    return {"generation": raw, "dead": [], "pending": []}


def resolve_index_path(path: str) -> str:
    """Resolve an index root to its current generation directory: if a
    ``MANIFEST`` pointer exists the root is managed and the pointer
    names the live generation; otherwise the root IS the index.  Every
    reader and maintenance op resolves through this, which is what
    makes compaction's pointer flip atomic from the reader's side."""
    man = read_manifest(path)
    return os.path.join(path, man["generation"]) if man else path


def open_index(path: str) -> tuple[str, list[str]]:
    """(generation path, segments to EXCLUDE) for an index root —
    excluded = manifest dead + pending (see :func:`read_manifest`)."""
    man = read_manifest(path)
    if man is None:
        return path, []
    return (
        os.path.join(path, man["generation"]),
        man["dead"] + man["pending"],
    )


def drop_dead(df: DataFrame, dead: list[str]) -> DataFrame:
    """Partition-pruned NOT-IN on the ``segment`` partition column."""
    return df if not dead else df.where(~F.col("segment").isin(dead))


def write_manifest(
    path: str,
    gen: str,
    dead: list[str] | tuple[str, ...] = (),
    pending: list[str] | tuple[str, ...] = (),
) -> None:
    """Write the commit point LAST, via rename: readers see either the
    old commit point or the new one, never a partial file (POSIX/HDFS
    rename is atomic; an object-store port would use a conditional put
    here)."""
    tmp = os.path.join(path, f".{MANIFEST}.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(
            {
                "generation": gen,
                "dead": sorted(dead),
                "pending": sorted(pending),
            },
            fh,
        )
        fh.write("\n")
    os.replace(tmp, os.path.join(path, MANIFEST))


def next_generation(path: str) -> str:
    cur = os.path.basename(resolve_index_path(path))
    n = int(cur[1:]) if cur.startswith("g") and cur[1:].isdigit() else 0
    return f"g{n + 1:08d}"


def require_managed(path: str, op: str) -> dict:
    """Manifest of a managed root, or a descriptive error naming the
    maintenance op that needs one."""
    man = read_manifest(path)
    if man is None:
        raise ValueError(
            f"{op} requires a managed index root (build with "
            "managed=True)"
        )
    return man


def drop_segment_metadata(path: str, segment: str) -> None:
    """The generic O(metadata) retention commit: mark ``segment`` dead
    in the MANIFEST — one atomic pointer flip, no data read or
    written.  Callers enforce their own entanglement policy FIRST
    (the inverted/vector indexes refuse tombstone-entangled segments;
    the dedup index has none to refuse)."""
    man = require_managed(path, "drop_segment")
    if segment in man["dead"]:
        return  # idempotent
    write_manifest(
        path, man["generation"], man["dead"] + [segment], man["pending"]
    )


def gc_generations(
    path: str, stores: tuple[str, ...], force: bool = False
) -> list[str]:
    """Generic storage reclamation for a managed root: remove
    generation directories other than the live one, and the live
    generation's dead/pending segment partitions under each store
    subtree.  Driver-side filesystem walk (local/HDFS seam); run after
    the reader-drain window.  Returns removed paths and commits a
    clean manifest.

    Pending segments are normally crashed-merge leftovers, safe to
    bulldoze — but a merge STAGED AND STILL RUNNING also sits on the
    pending list, and gc'ing it would destroy the staged output and
    erase the record.  Merges hold a ``MERGE_IN_PROGRESS`` marker for
    exactly that window; gc refuses while it exists unless ``force=
    True`` (crash recovery: verify no merge is running first — the
    forced gc removes the marker along with the pending partitions)."""
    import re
    import shutil

    man = require_managed(path, "gc")
    lock = os.path.join(_local_path(path), MERGE_LOCK)
    if os.path.exists(lock):
        if not force:
            raise ValueError(
                f"gc: merge in flight ({lock} exists) — gc would destroy "
                "its staged pending segments; retry after the merge "
                "commits, or pass force=True if the merge crashed"
            )
        os.unlink(lock)
    removed: list[str] = []
    for entry in sorted(os.listdir(path)):
        full = os.path.join(path, entry)
        if (
            os.path.isdir(full)
            and re.fullmatch(r"g\d{8}", entry)
            and entry != man["generation"]
        ):
            shutil.rmtree(full)
            removed.append(full)
    gpath = os.path.join(path, man["generation"])
    for sub in stores:
        for seg in man["dead"] + man["pending"]:
            part = os.path.join(gpath, sub, f"segment={seg}")
            if os.path.isdir(part):
                shutil.rmtree(part)
                removed.append(part)
    write_manifest(path, man["generation"], [], [])
    return removed
