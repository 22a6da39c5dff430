"""Retrieval (RAG-shape) pipeline composing the engine's operators:

  token-window chunking (text_chunks shape) → deterministic chunk ids →
  ANN search over the embeddings table (IVF 2-probe, with the exact
  brute-force baseline for recall) → top-k hits joined back to chunk text

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
    spark.stop()


if __name__ == "__main__":
    main()
