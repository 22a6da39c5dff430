"""Round-13 RAG composition row (VERDICT r12 ask #5): the
cross-index hybrid retrieval stage of ``examples/rag_corpus_pipeline
.py`` as ONE driver-graded query — cost-routed BM25 against the
persisted positional inverted index ∪ learned-cell ANN against the
managed vector index, fused by reciprocal rank.

Until now each stage was oracle-verified separately
(``text_bm25_auto``, ``sim_ann_learned``, ``sim_rrf_fusion``) but the
COMPOSITION — two different index families answering the same query
set and a training-free combiner over their lists — had no single
green row.  The query set here is the shared id space the RAG example
uses: query documents are ``doc_id % 25 == 0``, their BM25 terms are
the first three tokens of their own text (derived IN the query, so
the oracle derives them relationally too — no fixture list), and the
ANN side selects the same ids' embeddings (``vec_id % 25 == 0``,
documents and embeddings share the 0..N id space in the synthetic
corpus).  A query with empty text simply has no lexical list — RRF's
one-sided-term semantics cover it on both engines.

Scale shape: the BM25 side is the audited cost-routed indexed path
(bounded per-query metadata collect, bucket-pruned postings); the ANN
side is the audited learned-quantizer 2-probe Arrow kernel (probe-
bounded cell scan); the combiner is one (query_id, cand_id)
full-outer join over ≤ 2k rows per query plus a per-query window —
each side stays partition/bucket-pruned, nothing corpus-sized meets
anything corpus-sized.

Reference basis: none (SURVEY §2.2 extension surface — this is the
retrieval stage a production RAG corpus runs); Cormack et al. 2009
for RRF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd_sql
from redis_streams_spark.functions.textfns import words, words_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.queries.retrieval import (
    _BM25_SCORE_SQL,
    _shared_index,
)
from redis_streams_spark.session import load_table

_QUERY_MOD = 25
_N_TERMS = 3
_LIST_K = 10
_FUSED_K = 5
_RRF_K = 60


def _rag_hybrid_oracle() -> str:
    """BM25 chain with RELATIONALLY-DERIVED query terms (first
    ``_N_TERMS`` tokens of each query doc, DISTINCT — the Spark side
    dedupes the same way) composed with the full learned-ANN replay
    (``sim_ann_learned``'s registered oracle as a CTE) and the proven
    RRF combiner (``sim_rrf_fusion``'s shape: -1 sentinels for
    one-list ranks, 6dp-rounded score, cand_id tie-break)."""
    # import the module (not REGISTRY) so load order doesn't matter —
    # module caching makes the side-effect registration idempotent
    from redis_streams_spark.queries.similarity6 import _LEARNED_ORACLE

    ann = _LEARNED_ORACLE
    return f"""
WITH base AS (
  SELECT doc_id, {words_sql('text')} AS w FROM documents
), dl AS (
  SELECT doc_id, len(w)::BIGINT AS dl FROM base WHERE len(w) > 0
), toks AS (
  SELECT doc_id, unnest(w) AS tok FROM base
), qterms AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT doc_id AS query_id, unnest(w[1:{_N_TERMS}]) AS term
    FROM base WHERE doc_id % {_QUERY_MOD} = 0) t
), tf AS (
  SELECT q.query_id, t.doc_id, q.term, count(*) AS tf
  FROM toks t JOIN qterms q ON q.term = t.tok
  GROUP BY 1, 2, 3
), dfreq AS (
  SELECT q.term, count(DISTINCT t.doc_id) AS df
  FROM toks t JOIN (SELECT DISTINCT term FROM qterms) q ON q.term = t.tok
  GROUP BY 1
), tot AS (
  SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl
), scored AS ({_BM25_SCORE_SQL}),
bm25 AS (
  SELECT query_id, doc_id AS cand_id, rank FROM (
    SELECT query_id, doc_id, bm25,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY bm25 DESC, doc_id) AS rank
    FROM scored) t
  WHERE rank <= {_LIST_K}
),
ann AS (
  SELECT query_id, cand_id, rank FROM ({ann}) a
),
u AS (
  SELECT coalesce(b.query_id, a.query_id) AS query_id,
         coalesce(b.cand_id, a.cand_id) AS cand_id,
         coalesce(b.rank, -1) AS bm25_rank,
         coalesce(a.rank, -1) AS ann_rank,
         coalesce(1.0 / ({_RRF_K} + b.rank), 0.0)
           + coalesce(1.0 / ({_RRF_K} + a.rank), 0.0) AS rrf
  FROM bm25 b
  FULL OUTER JOIN ann a
    ON b.query_id = a.query_id AND b.cand_id = a.cand_id
)
SELECT query_id, cand_id, bm25_rank, ann_rank,
       {rnd_sql('rrf', 6)} AS rrf_score, fused_rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY {rnd_sql('rrf', 6)} DESC, cand_id) AS fused_rank
  FROM u) t
WHERE fused_rank <= {_FUSED_K}
ORDER BY query_id, fused_rank
"""


@register(
    "rag_hybrid_indexed",
    shape="bounded",
    tags=("retrieval", "rag", "bm25", "ann", "index", "llm-pipeline"),
    oracle=_rag_hybrid_oracle(),
)
def rag_hybrid_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RAG pipeline's hybrid query stage, end to end through BOTH
    persisted index families: query docs (``doc_id % 25``) derive
    their own BM25 terms (first 3 tokens, deduped), the cost-based
    router (``bm25_topk_auto``) answers them from the shared inverted
    index, the learned-quantizer managed vector index answers the same
    ids' embeddings 2-probe through the Arrow kernel
    (``sim_ann_learned``'s registered path), and ``rrf_fuse`` combines
    the two top-10 lists into a fused top-5 with both source ranks
    carried (-1 sentinel for one-list candidates).  The oracle replays
    every stage — tokenize, derive terms, exhaustive BM25, coarse-
    quantizer training + pinned cells + live means + probed search,
    and the RRF arithmetic — from first principles."""
    from redis_streams_spark.operators.invindex import bm25_topk_auto
    from redis_streams_spark.operators.similarity import rrf_fuse
    from redis_streams_spark.queries.similarity6 import sim_ann_learned

    docs = load_table(spark, sf_dir, "documents")
    # bounded: one row per query doc (N/25 rows) — the same class of
    # driver round-trip the BM25 router itself pays for term metadata
    qdocs = (
        docs.where(F.col("doc_id") % _QUERY_MOD == 0)
        .select(
            "doc_id", F.slice(words("text"), 1, _N_TERMS).alias("w")
        )
        .collect()
    )
    term_queries = {
        int(r.doc_id): tuple(dict.fromkeys(r.w)) for r in qdocs if r.w
    }
    lex_path = _shared_index(spark, sf_dir)
    bm25 = bm25_topk_auto(
        spark, lex_path, term_queries, k=_LIST_K, postings_threshold=1
    ).select(
        "query_id",
        F.col("doc_id").alias("cand_id"),
        F.col("rank").alias("bm25_rank"),
    )
    ann = sim_ann_learned(spark, sf_dir).select(
        "query_id", "cand_id", F.col("rank").alias("ann_rank")
    )
    return rrf_fuse(bm25, ann, k=_FUSED_K, rrf_k=_RRF_K).orderBy(
        "query_id", "fused_rank"
    )
