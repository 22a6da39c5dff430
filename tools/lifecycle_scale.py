"""Index-lifecycle cost at scale: build → incremental segment → refresh
(replace) → delete → query-after-maintenance → compact, each timed in a
warm session.  The SCALE.md evidence that maintenance never rewrites
corpus-sized state: refresh/delete cost follows the BATCH (one postings
scan + batch-sized writes), query cost is unchanged, compaction is the
only corpus-sized rewrite and runs behind the manifest flip.

Usage: python tools/lifecycle_scale.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import shutil
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from redis_streams_spark.operators.invindex import (  # noqa: E402
    bm25_topk_indexed,
    build_inverted_index,
    compact_inverted_index,
    delete_from_inverted_index,
    update_inverted_index,
)
from redis_streams_spark.session import get_spark, load_table  # noqa: E402

QUERIES = {0: ("spark", "stream", "window"), 1: ("hash", "join", "merge")}


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label}: {time.perf_counter() - t0:.1f}s", flush=True)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("lifecycle-scale")
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    root = tempfile.mkdtemp(prefix="lcidx-")
    import atexit
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    print(f"corpus: {n} docs")
    timed(
        "build (managed, 99% of corpus)",
        lambda: build_inverted_index(
            docs.where(F.col("doc_id") % 100 != 0), root, managed=True
        ),
    )
    timed(
        "incremental segment (1% batch)",
        lambda: update_inverted_index(
            docs.where(F.col("doc_id") % 100 == 0), root, segment="b1"
        ),
    )
    changed = docs.where(F.col("doc_id") % 100 == 7).withColumn(
        "text", F.concat(F.col("text"), F.lit(" dup"))
    )
    timed(
        "refresh 1% (replace=True)",
        lambda: update_inverted_index(changed, root, segment="r1", replace=True),
    )
    timed(
        "delete 1%",
        lambda: delete_from_inverted_index(
            spark, root, docs.where(F.col("doc_id") % 100 == 23).select("doc_id"),
            segment="d1",
        ),
    )
    q = lambda: bm25_topk_indexed(spark, root, QUERIES, k=10).write.format(  # noqa: E731
        "noop"
    ).mode("overwrite").save()
    q()  # warm
    timed("query after maintenance (warm)", q)
    timed("compact + manifest flip", lambda: compact_inverted_index(spark, root))
    timed("query after compact (warm)", q)
    spark.stop()


def segment_ops(sf_dir: str) -> None:
    """Second phase: segment-liveness ops on a tombstone-free index —
    drop is O(metadata), merge cost follows the merged batches."""
    from redis_streams_spark.operators.invindex import (
        drop_segment,
        gc_index,
        merge_segments,
    )

    spark = get_spark("lifecycle-scale")
    docs = load_table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="lcseg-")
    import atexit
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    timed(
        "build big base (94% of corpus)",
        lambda: build_inverted_index(
            docs.where(F.col("doc_id") % 50 > 2), root, managed=True
        ),
    )
    for i in range(3):
        timed(
            f"small segment s{i} (2% batch)",
            lambda i=i: update_inverted_index(
                docs.where(F.col("doc_id") % 50 == i), root, segment=f"s{i}"
            ),
        )
    q = lambda: bm25_topk_indexed(spark, root, QUERIES, k=10).write.format(  # noqa: E731
        "noop"
    ).mode("overwrite").save()
    q()
    timed("query 4 segments (warm)", q)
    timed(
        "tiered merge of the 3 small segments",
        lambda: merge_segments(spark, root, ["s0", "s1", "s2"]),
    )
    timed("query after merge (warm)", q)
    timed("drop merged segment (retention)", lambda: drop_segment(
        spark, root, "m-" + __import__("hashlib").md5(b"s0|s1|s2").hexdigest()[:12]
    ))
    timed("query after drop (warm)", q)
    timed("gc (reclaim dead partitions)", lambda: gc_index(root))
    spark.stop()


if __name__ == "__main__":
    sfd = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    if len(sys.argv) > 2 and sys.argv[2] == "segments":
        segment_ops(sfd)
    else:
        main()
