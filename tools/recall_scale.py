"""Recall@10 vs compression parameters at 100× — the dial table
behind `sim_recall_compressed` (r12 verdict ask #4's SCALE.md half):
how ``pq_m`` (bytes/vector), ``oversample`` (rerank depth), and
``n_probe`` (IVF-PQ scan width) trade against neighbor fidelity on
the 200 k-vector corpus, measured against the exact BLAS baseline.

Every path uses the registered operators (pq_rerank_topk /
sq8_rerank_topk / vector_topk_pq on a built index), so the numbers
describe the real physical paths the driver grades.

Usage: python tools/recall_scale.py [sf_dir] [query_mod]
       # defaults: /tmp/sfscale100 2500  (→ 80 queries at 200 k)
"""

from __future__ import annotations

import atexit
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redis_streams_spark.operators.similarity import (  # noqa: E402
    brute_force_topk_np,
    pq_rerank_topk,
    sq8_rerank_topk,
)
from redis_streams_spark.operators.vecindex import (  # noqa: E402
    build_vector_index,
    vector_topk_pq,
)
from redis_streams_spark.session import get_spark, load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale100"
    qmod = int(sys.argv[2]) if len(sys.argv) > 2 else 2500
    spark = get_spark("recall-scale")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    print(f"corpus: {n} vectors, query_mod {qmod} (~{n // qmod} queries)",
          flush=True)

    bf = set(
        (r.query_id, r.cand_id)
        for r in brute_force_topk_np(emb, k=10, query_mod=qmod)
        .select("query_id", "cand_id")
        .collect()
    )
    print(f"exact baseline: {len(bf)} (query, cand) rows", flush=True)

    def recall(label: str, df) -> None:
        t0 = time.perf_counter()
        got = set(
            (r.query_id, r.cand_id)
            for r in df.select("query_id", "cand_id").collect()
        )
        r = len(bf & got) / len(bf)
        print(
            f"{label}: recall@10 = {r:.4f}  ({time.perf_counter() - t0:.1f}s)",
            flush=True,
        )

    # SQ8: oversample dial
    for ov in (1, 4):
        recall(
            f"sq8 oversample={ov}",
            sq8_rerank_topk(emb, k=10, query_mod=qmod, oversample=ov),
        )

    # PQ: m dial at oversample=4, then oversample dial at m=4
    for m in (4, 8, 16):
        recall(
            f"pq m={m} oversample=4",
            pq_rerank_topk(emb, k=10, query_mod=qmod, m=m, oversample=4),
        )
    for ov in (1, 2):
        recall(
            f"pq m=4 oversample={ov}",
            pq_rerank_topk(emb, k=10, query_mod=qmod, m=4, oversample=ov),
        )

    # IVF-PQ on the managed index: n_probe dial (folds in probe misses)
    root = tempfile.mkdtemp(prefix="recallscale-")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    build_vector_index(emb, root, managed=True, n_cells=141, pq_m=4)
    for np_ in (1, 2, 4, 8):
        recall(
            f"ivfpq n_cells=141 n_probe={np_} oversample=4",
            vector_topk_pq(
                spark, root, k=10, query_mod=qmod, n_probe=np_,
                oversample=4, scoring="np",
            ),
        )
    spark.stop()


if __name__ == "__main__":
    main()
