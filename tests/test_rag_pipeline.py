"""Cross-index RAG composition (examples/rag_corpus_pipeline.py, r11
verdict ask #5): two ingest batches end-to-end through all three index
families with duplicate traffic and an at-least-once replay — verdicts,
index contents, and hybrid search must all be replay-stable and
duplicate-free."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from examples.rag_corpus_pipeline import (
    RagCorpus,
    hybrid_search,
    rag_ingest_batch,
)
from redis_streams_spark.operators.invindex import index_status
from redis_streams_spark.operators.vecindex import vector_index_status

SF = "/root/testdata/sf0.001"


def _tables(spark):
    from redis_streams_spark.session import load_table

    return (
        load_table(spark, SF, "documents"),
        load_table(spark, SF, "embeddings"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    """Two batches driven through the composition once, shared by the
    assertions below (the ingest is the expensive part)."""
    docs, emb = _tables(spark)
    corpus = RagCorpus(str(tmp_path_factory.mktemp("rag")))
    max_id = docs.agg(F.max("doc_id")).first()[0]
    b1 = docs.where("doc_id % 2 = 0")
    v1 = rag_ingest_batch(corpus, b1, emb, "b1")
    # batch 2 carries re-submissions of even docs under fresh ids
    dups = docs.where("doc_id % 2 = 0 AND doc_id % 10 = 4").withColumn(
        "doc_id", F.col("doc_id") + max_id + 1
    )
    dup_emb = emb.join(
        dups.select((F.col("doc_id") - max_id - 1).alias("vec_id")), "vec_id"
    ).withColumn("vec_id", F.col("vec_id") + max_id + 1)
    b2 = docs.where("doc_id % 2 = 1").unionByName(dups)
    e2 = emb.unionByName(dup_emb)
    v2 = rag_ingest_batch(corpus, b2, e2, "b2")
    # materialize the verdict rows NOW: the frames read the durable
    # verdict store, and the replay test rewrites its files
    v2_rows = _rows(v2)
    return corpus, docs, emb, (b2, e2), v1, (v2, v2_rows), max_id


def test_duplicate_traffic_dropped_everywhere(spark, pipeline):
    corpus, docs, emb, _, v1, (v2, _v2_rows), max_id = pipeline
    n_dups = docs.where("doc_id % 2 = 0 AND doc_id % 10 = 4").count()
    assert v1.where("verdict != 'keep'").count() == 0
    # every re-submitted doc was flagged exact-dup against its original
    flagged = v2.where(f"doc_id > {max_id}")
    assert flagged.count() == n_dups
    assert flagged.where("verdict = 'exact_dup'").count() == n_dups
    assert (
        flagged.where(f"match_id = doc_id - {max_id + 1}").count() == n_dups
    )
    # and reached NEITHER downstream index
    keepers = v1.unionByName(v2).where("verdict = 'keep'").count()
    vec_total = sum(
        r.n_vectors for r in vector_index_status(spark, corpus.vec).collect()
    )
    lex_total = sum(
        r.n_docs for r in index_status(spark, corpus.lex).collect()
    )
    assert vec_total == keepers
    assert lex_total == keepers
    assert vec_total < docs.count() + n_dups  # something was dropped


def test_replay_is_idempotent_across_all_three(spark, pipeline):
    corpus, docs, emb, (b2, e2), _, (_v2, v2_rows), _ = pipeline
    term_queries = {0: ("data", "stream"), 50: ("hash", "join")}
    before = _rows(hybrid_search(spark, corpus, term_queries))
    assert before
    vec_before = _rows(vector_index_status(spark, corpus.vec))
    lex_before = _rows(index_status(spark, corpus.lex))
    v2_replay = rag_ingest_batch(corpus, b2, e2, "b2")
    assert _rows(v2_replay) == v2_rows
    assert _rows(hybrid_search(spark, corpus, term_queries)) == before
    assert _rows(vector_index_status(spark, corpus.vec)) == vec_before
    assert _rows(index_status(spark, corpus.lex)) == lex_before


def test_hybrid_search_fuses_both_paths(spark, pipeline):
    corpus, *_ = pipeline
    term_queries = {0: ("data", "stream"), 50: ("hash", "join")}
    fused = hybrid_search(spark, corpus, term_queries, k=5)
    rows = fused.collect()
    assert rows
    # fusion genuinely drew from both rankers
    assert any(r.bm25_rank > 0 for r in rows)
    assert any(r.ann_rank > 0 for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.fused_rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q


def test_semantic_gate_catches_paraphrased_resubmission(spark, tmp_path):
    """With semantic_tau armed, a resubmission whose TEXT is fully
    rewritten (signature probe misses) but whose EMBEDDING matches the
    accepted corpus is dropped as semantic_dup; fresh content passes
    both gates; the lexical index only receives the double-keepers."""
    corpus = RagCorpus(str(tmp_path / "rag"), n_cells=2)
    docs1 = spark.createDataFrame(
        [(0, "alpha bravo charlie delta echo foxtrot"),
         (1, "golf hotel india juliet kilo lima")],
        "doc_id long, text string",
    )
    emb1 = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0], 0), (1, [0.0, 1.0, 0.0, 0.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    rag_ingest_batch(corpus, docs1, emb1, "b1", semantic_tau=0.9)
    # doc 10: paraphrase of 0 — disjoint tokens, near-identical vector;
    # doc 11: genuinely new
    docs2 = spark.createDataFrame(
        [(10, "one two three four five six seven"),
         (11, "mike november oscar papa quebec romeo")],
        "doc_id long, text string",
    )
    emb2 = spark.createDataFrame(
        [(10, [0.999, 0.01, 0.0, 0.0], 0), (11, [0.0, 0.0, 1.0, 0.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    v2 = {r.doc_id: (r.verdict, r.match_id)
          for r in rag_ingest_batch(
              corpus, docs2, emb2, "b2", semantic_tau=0.9
          ).collect()}
    assert v2[10] == ("semantic_dup", 0)
    assert v2[11][0] == "keep"
    lex_total = sum(
        r.n_docs for r in index_status(spark, corpus.lex).collect()
    )
    vec_total = sum(
        r.n_vectors for r in vector_index_status(spark, corpus.vec).collect()
    )
    assert lex_total == 3  # 0, 1, 11 — never 10
    assert vec_total == 3
    # replay of the gated batch is idempotent
    again = {r.doc_id: (r.verdict, r.match_id)
             for r in rag_ingest_batch(
                 corpus, docs2, emb2, "b2", semantic_tau=0.9
             ).collect()}
    assert again == v2
