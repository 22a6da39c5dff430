"""Substring-span dedup cost at scale (operators/dedup.py
duplicated_spans / strip_duplicated_spans).

The pipeline's three shuffles are all signature-sized (8-byte h60
fingerprints / (doc_id, pos) pairs), never document text — this script
measures the wall clock and the stage row volumes at a scaled corpus
so SCALE.md can state the claim with numbers: grams = one row per
corpus token, duplicated-gram frame = true duplicate density, covered
positions = duplicate mass.

Usage: python tools/spandedup_scale.py [sf_dir] [n]
       python tools/spandedup_scale.py [sf_dir] index
  "index" mode: the INCREMENTAL path (operators/gramindex.py) — build
  the gram-count index on 90% of the corpus once, then time a 10%-batch
  probe vs the from-scratch whole-corpus duplicated_spans, plus the
  maintenance ops (delete via negative partials, netting compaction).
  (sf_dir defaults to /root/testdata/sf0.1; scale it up first with
   tools/make_scale_data.py for the 100x measurement.  NOTE
   make_scale_data appends a per-replica suffix token, so replica
   texts stay near-identical — a replica's first len-n+1 grams all
   repeat across replicas, which is exactly the worst-case duplicate
   density for this operator: the numbers below are an upper bound.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redis_streams_spark.operators.dedup import (  # noqa: E402
    duplicated_span_profile,
    duplicated_spans,
    positioned_ngrams,
    strip_duplicated_spans,
)
from redis_streams_spark.session import get_spark, load_table  # noqa: E402


def index_mode(sf_dir: str) -> None:
    import atexit
    import shutil
    import tempfile

    from redis_streams_spark.operators.gramindex import (
        build_gram_index,
        compact_gram_index,
        delete_from_gram_index,
        probe_gram_spans,
    )

    spark = get_spark("spandedup-index")
    docs = load_table(spark, sf_dir, "documents")
    hist = docs.where("doc_id % 10 != 7")
    batch = docs.where("doc_id % 10 = 7")
    root = tempfile.mkdtemp(prefix="gramidx-")
    atexit.register(shutil.rmtree, root, ignore_errors=True)

    t0 = time.time()
    build_gram_index(hist, root, n=8, managed=True)
    t_build = time.time() - t0

    probe_gram_spans(batch, root).count()  # warm
    t0 = time.time()
    n_spans = probe_gram_spans(batch, root).count()
    t_probe = time.time() - t0

    t0 = time.time()
    from redis_streams_spark.operators.dedup import duplicated_spans

    n_ref = duplicated_spans(docs, n=8).where("doc_id % 10 = 7").count()
    t_scratch = time.time() - t0

    t0 = time.time()
    delete_from_gram_index(
        spark, root, hist.where("doc_id % 50 = 9"), segment="del-d"
    )
    t_del = time.time() - t0
    t0 = time.time()
    compact_gram_index(spark, root)
    t_comp = time.time() - t0

    print(
        f"\nbuild(90%)={t_build:.1f}s | probe(10% batch)={t_probe:.1f}s "
        f"({n_spans} spans) vs from-scratch full-corpus={t_scratch:.1f}s "
        f"({n_ref} spans, equal={n_spans == n_ref}) | "
        f"delete(2%)={t_del:.1f}s compact={t_comp:.1f}s",
        flush=True,
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    if len(sys.argv) > 2 and sys.argv[2] == "index":
        index_mode(sf_dir)
        return
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("spandedup-scale")
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    t0 = time.time()
    grams = positioned_ngrams(docs, n)
    n_grams = grams.count()
    t_grams = time.time() - t0

    t0 = time.time()
    spans = duplicated_spans(docs, n)
    n_spans = spans.count()
    t_spans = time.time() - t0

    t0 = time.time()
    prof = duplicated_span_profile(docs, n)
    n_prof = prof.count()
    t_prof = time.time() - t0

    t0 = time.time()
    clean = strip_duplicated_spans(docs, n)
    # aggregate over the text, not count(): counting a left join on
    # unique keys lets Catalyst eliminate the join and skip the whole
    # rebuild (measured: 2.2 s "clean" at 500 k docs — a non-number)
    from pyspark.sql import functions as F

    n_clean, clean_bytes = clean.agg(
        F.count(F.lit(1)), F.sum(F.length("clean_text"))
    ).first()
    t_clean = time.time() - t0

    print(
        f"docs={n_docs} n={n} | grams={n_grams} ({t_grams:.1f}s) | "
        f"spans={n_spans} ({t_spans:.1f}s incl. gram recompute) | "
        f"profile_docs={n_prof} ({t_prof:.1f}s) | "
        f"clean_rows={n_clean}, clean_chars={clean_bytes} ({t_clean:.1f}s)"
    )


if __name__ == "__main__":
    main()
