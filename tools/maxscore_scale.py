"""MaxScore vs exhaustive indexed BM25 at scale (r10 verdict ask #3's
"Done" evidence): build the index once, then measure query-only wall
and POSTINGS SCORED (rows entering the scoring aggregate) for
bm25_topk_indexed vs bm25_topk_maxscore in one warm session.

Usage: python tools/maxscore_scale.py [sf_dir] [k]
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
    N_TERM_BUCKETS,
    bm25_topk_indexed,
    bm25_topk_maxscore,
    build_inverted_index,
)
from redis_streams_spark.functions.hashing import h32_py  # noqa: E402
from redis_streams_spark.session import get_spark, load_table  # noqa: E402

QUERIES = {0: ("dup", "the", "a"), 1: ("spark", "stream", "window"),
           2: ("dup", "vector")}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("maxscore-scale")
    docs = load_table(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="msidx-")
    import atexit
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    t0 = time.perf_counter()
    build_inverted_index(docs, path)
    t_build = time.perf_counter() - t0
    print(f"build: {t_build:.1f}s over {docs.count()} docs")

    # postings scored: exhaustive = every posting of every query term;
    # maxscore = essential postings + candidate-restricted common rows
    pairs = [(q, t) for q, ts in QUERIES.items() for t in ts]
    buckets = sorted({h32_py(t) % N_TERM_BUCKETS for _, t in pairs})
    postings = spark.read.parquet(f"{path}/postings").where(
        F.col("bucket").isin(buckets)
    )
    qf = F.broadcast(
        spark.createDataFrame(pairs, "query_id INT, term STRING")
    )
    exact_by_q = {
        r.query_id: r.n
        for r in postings.join(qf, postings["tok"] == qf["term"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    exact_rows = sum(exact_by_q.values())
    _, plan = bm25_topk_maxscore(
        spark, path, QUERIES, k=k, return_plan=True
    )
    ess = [(q, t) for q, p in plan.items() for t in p["essential"]]
    ef = F.broadcast(spark.createDataFrame(ess, "query_id INT, term STRING"))
    cand = (
        postings.join(ef, postings["tok"] == ef["term"])
        .select("query_id", "doc_id")
        .distinct()
    )
    pruned_by_q = {
        r.query_id: r.n
        for r in postings.join(qf, postings["tok"] == qf["term"])
        .join(cand, ["query_id", "doc_id"], "semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # a query with no skipped terms scores its full matched set (the
    # straight-scoring union branch, not the candidate semi-join)
    corrected = {
        q: (exact_by_q[q] if not plan[q]["skipped"] else pruned_by_q.get(q, 0))
        for q in exact_by_q
    }
    pruned_rows = sum(corrected.values())
    print(f"postings scored: exhaustive {exact_rows} -> maxscore "
          f"{pruned_rows} ({pruned_rows / exact_rows:.1%})")
    for q in sorted(exact_by_q):
        e, p = exact_by_q[q], corrected[q]
        print(f"  q{q} {QUERIES[q]}: {e} -> {p} ({p / e:.1%})")
    for q, p in plan.items():
        print(f"  q{q}: skipped {p['skipped']} theta {p['theta']:.3f}"
              if p["theta"] is not None else f"  q{q}: no seed")

    # warm then time query-only, interleaved
    for fn in (bm25_topk_indexed, bm25_topk_maxscore):
        fn(spark, path, QUERIES, k=k).write.format("noop").mode(
            "overwrite"
        ).save()
    for name, fn in (("exact", bm25_topk_indexed),
                     ("maxscore", bm25_topk_maxscore)):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, path, QUERIES, k=k).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.perf_counter() - t0)
        print(f"{name} query-only: median {sorted(ts)[1]:.2f}s ({ts})")
    spark.stop()


if __name__ == "__main__":
    main()
