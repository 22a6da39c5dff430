"""Retrieval (RAG-shape) pipeline composing the engine's operators:

  token-window chunking (text_chunks shape) → deterministic chunk ids →
  ANN search over the embeddings table (IVF 2-probe, with the exact
  brute-force baseline for recall) → top-k hits joined back to chunk text

plus the LEXICAL index lifecycle (r11): managed inverted-index build →
incremental segment ingest → document refresh (replace) → delete →
MaxScore-pruned BM25 + n-word phrase queries → manifest-flip compaction
WHILE a pre-flip reader stays open — the maintenance loop a dedup-
refresh corpus pipeline runs continuously.

The embeddings table stands in for the chunk-embedding output of an
encoder (the encoder itself is out of engine scope — at production scale
it runs as a mapInPandas batch-inference stage, same plumbing as
mm_decode_features).

Run: python examples/retrieval_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from redis_streams_spark.operators.similarity import brute_force_topk, ivf_topk
from redis_streams_spark.queries import all_queries
from redis_streams_spark.session import get_spark, load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("retrieval-pipeline")

    # 1. chunk the corpus (the indexable retrieval units)
    chunks = all_queries()["text_chunks"].fn(spark, sf_dir)
    n_chunks = chunks.count()

    # 2. ANN search: IVF 2-probe (scale path) + exact baseline
    emb = load_table(spark, sf_dir, "embeddings")
    exact = brute_force_topk(emb, k=10, query_mod=25).select(
        "query_id", "cand_id", "rank"
    )
    approx = ivf_topk(emb, k=10, query_mod=25).select("query_id", "cand_id", "rank")

    # 3. measured recall of the scale path against the exact baseline
    hits = exact.join(approx, ["query_id", "cand_id"], "left_semi").count()
    total = exact.count()

    # 4. join approx hits back to chunk text (vec_id ~ chunk row stand-in:
    # map candidate ids onto chunk rows deterministically)
    keyed = chunks.withColumn(
        "chunk_key",
        F.dense_rank().over(Window.orderBy("doc_id", "chunk_idx")) - 1,
    )
    answers = (
        approx.where(F.col("rank") <= 3)
        .join(keyed, F.col("cand_id") % n_chunks == F.col("chunk_key"))
        .select("query_id", "rank", "doc_id", "chunk_idx", "chunk_text")
    )
    n_answers = answers.count()

    print(f"chunks indexed      : {n_chunks}")
    print(f"ivf recall@10       : {hits}/{total} = {hits / max(total, 1):.3f}")
    print(f"retrieved passages  : {n_answers}")

    # 5. lexical index lifecycle: ingest → refresh → delete → query →
    # compact-under-reader (all through the MANIFEST pointer)
    import tempfile
    import time

    from redis_streams_spark.operators.invindex import (
        bm25_topk_indexed,
        bm25_topk_maxscore,
        build_inverted_index,
        compact_inverted_index,
        delete_from_inverted_index,
        phrase_match_indexed,
        update_inverted_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="retrieval-idx-")
    queries = {0: ("dup", "the", "a"), 1: ("spark", "stream", "window")}
    phrases = {0: ("hash", "scan", "join"), 1: ("order", "sort", "table", "scan")}

    t0 = time.perf_counter()
    build_inverted_index(docs.where(F.col("doc_id") % 4 != 0), root, managed=True)
    update_inverted_index(docs.where(F.col("doc_id") % 4 == 0), root, segment="b1")
    t_build = time.perf_counter() - t0

    # refresh: a changed slice re-ingested (tombstone old copy + new segment)
    changed = docs.where(F.col("doc_id") % 9 == 2).withColumn(
        "text", F.concat(F.col("text"), F.lit(" dup"))
    )
    t0 = time.perf_counter()
    update_inverted_index(changed, root, segment="refresh1", replace=True)
    delete_from_inverted_index(
        spark, root, docs.where(F.col("doc_id") % 50 == 7).select("doc_id"),
        segment="purge1",
    )
    t_maint = time.perf_counter() - t0

    t0 = time.perf_counter()
    ms, plan = bm25_topk_maxscore(spark, root, queries, k=10, return_plan=True)
    n_ms = ms.count()
    t_query = time.perf_counter() - t0
    n_phrase = phrase_match_indexed(spark, root, phrases).count()
    skipped = {q: p["skipped"] for q, p in plan.items()}

    # compact while a pre-flip reader is open: the flip is invisible to it
    pre_flip = bm25_topk_indexed(spark, root, queries, k=10)
    before = {(r.query_id, r.rank): r.doc_id for r in pre_flip.collect()}
    t0 = time.perf_counter()
    compact_inverted_index(spark, root)  # writes g00000002, flips MANIFEST
    t_compact = time.perf_counter() - t0
    after_old_reader = {
        (r.query_id, r.rank): r.doc_id for r in pre_flip.collect()
    }
    after_new = {
        (r.query_id, r.rank): r.doc_id
        for r in bm25_topk_indexed(spark, root, queries, k=10).collect()
    }
    assert before == after_old_reader == after_new

    print(f"index build+ingest  : {t_build:.2f}s (2 segments)")
    print(f"refresh+delete      : {t_maint:.2f}s (tombstones, no rewrite)")
    print(f"maxscore bm25 top-10: {n_ms} rows in {t_query:.2f}s, "
          f"skipped terms {skipped}")
    print(f"phrase (3+4-gram)   : {n_phrase} matching docs")
    print(f"compact+flip        : {t_compact:.2f}s "
          f"(pre-flip reader unaffected)")

    # 6. segment-liveness ops (manifest commit point): small ingest
    # batches accumulate → the advice ladder flags them → tiered merge
    # collapses them (cost follows the merged batches) → retention
    # drops the oldest batch O(1) → gc reclaims
    from redis_streams_spark.operators.invindex import (
        drop_segment,
        gc_index,
        index_maintenance_advice,
        merge_segments,
    )

    for i in range(3):
        update_inverted_index(
            docs.where(F.col("doc_id") % 40 == i).withColumn(
                "doc_id", F.col("doc_id") + 1_000_000 * (i + 1)
            ),
            root,
            segment=f"tail{i}",
        )
    advice = index_maintenance_advice(spark, root)
    print(f"advice              : {advice}")
    merged = merge_segments(spark, root, ["tail0", "tail1", "tail2"])
    t0 = time.perf_counter()
    drop_segment(spark, root, merged)  # retention: age the batch out
    t_drop = time.perf_counter() - t0
    gc_index(root)
    after_lifecycle = {
        (r.query_id, r.rank): r.doc_id
        for r in bm25_topk_indexed(spark, root, queries, k=10).collect()
    }
    assert after_lifecycle == before  # tail batches came and went
    print(f"merge+drop+gc       : drop was {t_drop * 1000:.0f}ms "
          f"(one manifest flip); queries unchanged")
    spark.stop()


if __name__ == "__main__":
    main()
