"""Managed vector-index lifecycle cost at scale: build → segment append
→ query (merged-centroid probes) → replace → delete → compact, timed in
a warm session — the SCALE.md evidence that vector maintenance never
rewrites corpus-sized state and that probe selection stays exact (the
centroid merge is a tiny partials aggregate, not a corpus scan).

Usage: python tools/vecindex_scale.py [sf_dir] [query_mod] [mode]

mode "lifecycle" (default): the maintenance-cost table.
mode "cells": the learned-codebook sweep (r11 verdict ask #1 "done"
criterion) — build with n_cells ∈ {10, 45, 141, 447} (label-parity,
and ~N^(1/3) / ~sqrt(N)/3 / ~sqrt(N) for the 200k corpus), timing
train+build, then the SAME fixed query set through both scoring
paths (HOF vs Arrow/BLAS, ask #2) at each cell count.

mode "filter": filtered-ANN cost/coverage — one learned index, the
same query set unfiltered vs allowed-set selectivities ~1/3 and
~1/30, both scoring paths; prints result-row counts so the sparse-
filter starvation (fewer than k allowed candidates inside n_probe
cells) and its n_probe remedy are visible numbers, not prose.

mode "pq": IVF-PQ — one index built with pq_m=4 (learned coarse
cells + PQ codes persisted), the same query set through
vector_topk_pq (compressed candidates + rerank) vs
vector_topk_indexed scoring="np" (full-precision BLAS) vs "hof";
the persisted-codes answer to pq_scale.py's finding that the
self-contained pq_rerank_topk is training-dominated per call.
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


def cells_sweep(sf_dir: str, qmod: int) -> None:
    spark = get_spark("vecindex-cells")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    print(f"\ncorpus: {n} vectors, query_mod {qmod} (~{n // qmod} queries)", flush=True)
    for n_cells in (10, 45, 141, 447):
        root = tempfile.mkdtemp(prefix=f"vecidx-k{n_cells}-")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        timed(
            f"n_cells={n_cells}: train+build",
            lambda r=root, k=n_cells: build_vector_index(
                emb, r, managed=True, n_cells=k
            ),
        )
        for scoring in ("hof", "np"):
            # warm once (parquet footer/page cache), then time
            vector_topk_indexed(
                spark, root, query_mod=qmod, scoring=scoring
            ).count()
            timed(
                f"n_cells={n_cells}: query x2 ({scoring})",
                lambda r=root, s_=scoring: [
                    vector_topk_indexed(
                        spark, r, query_mod=qmod, scoring=s_
                    ).count()
                    for _ in range(2)
                ],
            )
    spark.stop()


def filter_sweep(sf_dir: str, qmod: int) -> None:
    spark = get_spark("vecindex-filter")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    print(f"\ncorpus: {n} vectors, query_mod {qmod} (~{n // qmod} queries)", flush=True)
    root = tempfile.mkdtemp(prefix="vecidx-filter-")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    timed(
        "train+build (n_cells=141)",
        lambda: build_vector_index(emb, root, managed=True, n_cells=141),
    )
    filters = [
        ("none", None),
        ("~1/3 (label % 3 = 0)", emb.where("label % 3 = 0").select("vec_id")),
        ("~1/30 (vec_id % 30 = 0)", emb.where("vec_id % 30 = 0").select("vec_id")),
    ]
    for fname, fids in filters:
        for scoring in ("hof", "np"):
            for n_probe in (2, 8) if fids is not None else (2,):
                q = vector_topk_indexed(
                    spark, root, query_mod=qmod, scoring=scoring,
                    n_probe=n_probe, filter_ids=fids,
                )
                q.count()  # warm
                t0 = time.perf_counter()
                rows = q.count()
                print(
                    f"\nfilter={fname} scoring={scoring} n_probe={n_probe}: "
                    f"{time.perf_counter() - t0:.1f}s, {rows} result rows",
                    flush=True,
                )
    spark.stop()


def pq_sweep(sf_dir: str, qmod: int) -> None:
    from redis_streams_spark.operators.vecindex import vector_topk_pq

    spark = get_spark("vecindex-pq")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    print(f"\ncorpus: {n} vectors, query_mod {qmod} (~{n // qmod} queries)", flush=True)
    root = tempfile.mkdtemp(prefix="vecidx-pq-")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    timed(
        "train+build (n_cells=141, pq_m=4)",
        lambda: build_vector_index(
            emb, root, managed=True, n_cells=141, pq_m=4
        ),
    )
    runs = [
        ("ivfpq rel (codes + rerank)",
         lambda: vector_topk_pq(spark, root, query_mod=qmod).count()),
        ("ivfpq np (LUT-gather kernel + rerank)",
         lambda: vector_topk_pq(
             spark, root, query_mod=qmod, scoring="np").count()),
        ("indexed np (full precision)",
         lambda: vector_topk_indexed(
             spark, root, query_mod=qmod, scoring="np").count()),
        ("indexed hof (full precision)",
         lambda: vector_topk_indexed(
             spark, root, query_mod=qmod, scoring="hof").count()),
    ]
    for label, fn in runs:
        fn()  # warm
        t0 = time.perf_counter()
        rows = fn()
        print(
            f"\n{label}: {time.perf_counter() - t0:.1f}s, {rows} rows",
            flush=True,
        )
    spark.stop()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # hold the QUERY COUNT constant as the corpus scales (vec_id % mod
    # == 0 picks ~n/mod queries): the lifecycle measurement is about
    # maintenance + per-query cost, not about scaling the query set
    # 100x along with the corpus
    qmod = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    if len(sys.argv) > 3 and sys.argv[3] == "cells":
        cells_sweep(sf_dir, qmod)
        return
    if len(sys.argv) > 3 and sys.argv[3] == "filter":
        filter_sweep(sf_dir, qmod)
        return
    if len(sys.argv) > 3 and sys.argv[3] == "pq":
        pq_sweep(sf_dir, qmod)
        return
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
