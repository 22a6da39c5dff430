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


def read_optional(spark: SparkSession, p: str) -> DataFrame | None:
    """Read a parquet tree that may not exist yet (empty index, no
    tombstones) — driver-side existence probe for local paths, with the
    AnalysisException fallback for remote schemes.  The one copy of the
    ``file://``-stripping seam an object-store port would extend."""
    local = p[7:] if p.startswith("file://") else p
    if "://" not in local and not os.path.isdir(local):
        return None
    try:
        return spark.read.parquet(p)
    except AnalysisException:
        return None


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


def gc_generations(path: str, stores: tuple[str, ...]) -> list[str]:
    """Generic storage reclamation for a managed root: remove
    generation directories other than the live one, and the live
    generation's dead/pending segment partitions under each store
    subtree.  Driver-side filesystem walk (local/HDFS seam); run after
    the reader-drain window.  Returns removed paths and commits a
    clean manifest."""
    import re
    import shutil

    man = require_managed(path, "gc")
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
