"""Product-quantization ANN at scale: train/query wall clock, the
compression ratio, and recall@k vs exact brute force
(operators/similarity.py pq_rerank_topk).

Usage: python tools/pq_scale.py [sf_dir] [oversample] [query_mod]
  (sf_dir defaults to /root/testdata/sf0.1; scale with
   tools/make_scale_data.py for the 100x row.  query_mod defaults to
   4000 — the relational ADC join scans N·m code rows PER QUERY, so
   the scale run sizes the query set to ~50; bulk query volumes belong
   on an Arrow LUT kernel, see pq_rerank_topk's docstring)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from redis_streams_spark.operators.similarity import (  # noqa: E402
    as_double_vec,
    brute_force_topk_np,
    pq_rerank_topk,
    pq_subvectors,
    pq_train_codebooks,
    _pq_assign,
)
from redis_streams_spark.session import get_spark, load_table  # noqa: E402

K = 10
M = 4
K_SUB = 8


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    oversample = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    query_mod = int(sys.argv[3]) if len(sys.argv) > 3 else 4000
    spark = get_spark("pq-scale")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    d = len(emb.select("embedding").first()[0])

    t0 = time.time()
    e = as_double_vec(emb)
    cent = pq_train_codebooks(e, M, K_SUB, 2)
    cent.count()
    t_train = time.time() - t0

    t0 = time.time()
    codes = _pq_assign(pq_subvectors(e, M), cent).select("vec_id", "s", "code")
    codes.count()
    t_encode = time.time() - t0

    t0 = time.time()
    pq = pq_rerank_topk(
        emb, k=K, query_mod=query_mod, oversample=oversample, m=M, k_sub=K_SUB
    )
    pq_rows = {(r.query_id, r.cand_id) for r in pq.collect()}
    t_query = time.time() - t0

    t0 = time.time()
    bf = brute_force_topk_np(emb, k=K, query_mod=query_mod)
    bf_rows = {(r.query_id, r.cand_id) for r in bf.collect()}
    t_bf = time.time() - t0

    recall = len(pq_rows & bf_rows) / max(1, len(bf_rows))
    code_bytes = n * M  # one byte per subspace code
    vec_bytes = n * d * 4  # float32 source column
    print(
        f"vectors={n} d={d} m={M} k_sub={K_SUB} oversample={oversample} | "
        f"train={t_train:.1f}s encode={t_encode:.1f}s | "
        f"pq_query={t_query:.1f}s (incl. train+encode lineage) "
        f"bruteforce_np={t_bf:.1f}s | "
        f"recall@{K}={recall:.3f} | "
        f"bytes codes/raw = {code_bytes}/{vec_bytes} "
        f"({vec_bytes / code_bytes:.0f}x smaller)"
    )


if __name__ == "__main__":
    main()
