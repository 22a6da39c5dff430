"""Managed vector-index lifecycle cost at scale: build → segment append
→ query (merged-centroid probes) → replace → delete → compact, timed in
a warm session — the SCALE.md evidence that vector maintenance never
rewrites corpus-sized state and that probe selection stays exact (the
centroid merge is a tiny partials aggregate, not a corpus scan).

Usage: python tools/vecindex_scale.py [sf_dir]
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

from redis_streams_spark.operators.similarity import ivf_topk  # noqa: E402
from redis_streams_spark.operators.vecindex import (  # noqa: E402
    build_vector_index,
    compact_vector_index,
    delete_from_vector_index,
    update_vector_index,
    vector_topk_indexed,
)
from redis_streams_spark.session import get_spark, load_table  # noqa: E402


def timed(label: str, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"\n{label}: {time.perf_counter() - t0:.1f}s", flush=True)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # hold the QUERY COUNT constant as the corpus scales (vec_id % mod
    # == 0 picks ~n/mod queries): the lifecycle measurement is about
    # maintenance + per-query cost, not about scaling the query set
    # 100x along with the corpus
    qmod = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    spark = get_spark("vecindex-scale")
    emb = load_table(spark, sf_dir, "embeddings")
    print(f"corpus: {emb.count()} vectors, query_mod {qmod}")
    root = tempfile.mkdtemp(prefix="vecidx-")
    atexit.register(shutil.rmtree, root, ignore_errors=True)

    base = emb.where("vec_id % 10 != 7")
    batch = emb.where("vec_id % 10 = 7")
    timed("build (90%)", lambda: build_vector_index(base, root, managed=True))
    timed("append segment (10%)", lambda: update_vector_index(batch, root, segment="u1"))
    timed(
        "query (indexed, merged centroids)",
        lambda: vector_topk_indexed(spark, root, query_mod=qmod).count(),
    )
    timed(
        "query (from scratch)",
        lambda: ivf_topk(emb, k=10, query_mod=qmod, n_probe=2).count(),
    )
    mod = emb.where("vec_id % 50 = 3").withColumn(
        "embedding",
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x.cast("double") + F.lit(0.5)).otherwise(
                x.cast("double")
            ),
        ),
    )
    timed("replace 2% (re-embed)", lambda: update_vector_index(mod, root, segment="r1", replace=True))
    timed(
        "delete 2% (tombstone + negative partials)",
        lambda: delete_from_vector_index(
            spark, root, emb.where("vec_id % 50 = 9").select("vec_id"), segment="d1"
        ),
    )
    timed("query after maintenance", lambda: vector_topk_indexed(spark, root, query_mod=qmod).count())
    timed("compact", lambda: compact_vector_index(spark, root))
    timed("query after compact", lambda: vector_topk_indexed(spark, root, query_mod=qmod).count())
    spark.stop()


if __name__ == "__main__":
    main()
