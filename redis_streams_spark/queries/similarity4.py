"""Round-9 retrieval-evaluation wave: ranking-quality metrics (nDCG@10,
MRR) for the approximate retrieval path, and reciprocal-rank fusion of
two heterogeneous scorers — the two standard moves between "we have ANN
indexes" and "we trust what they return" in a retrieval pipeline.

``sim_recall_report`` answers *how many* of the true neighbors each ANN
path finds; these queries answer *how well-ordered* the result list is
(graded, position-discounted) and how to combine scorers that disagree.

Reference basis: none (SURVEY §2.2 extension surface — LLM-pipeline
retrieval evaluation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.operators.similarity import (
    brute_force_topk_np,
    dot_topk,
    lsh_topk,
    rrf_fuse,
)
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

# oracle composition below reads REGISTRY entries registered by these
# modules — import them explicitly so similarity4 also works when
# imported standalone (outside queries.__init__._load_all's order)
from redis_streams_spark.queries import analytics5 as _analytics5  # noqa: F401
from redis_streams_spark.queries import similarity as _similarity  # noqa: F401

_K = 10
_RRF_K = 60  # the standard RRF constant from Cormack et al.


def _ndcg_oracle() -> str:
    """Compose the registered exact / LSH top-10 oracles as CTEs; graded
    relevance of a candidate is its exact-ranking gain 11-rank (top-1
    worth 10, ..., rank-10 worth 1, everything outside the exact top-10
    worth 0), so both engines derive the SAME integer gains and the only
    float work is the log2 discount and two bounded averages."""
    from redis_streams_spark.queries.base import REGISTRY

    bf = REGISTRY["sim_bruteforce_topk"].oracle
    lsh = REGISTRY["sim_lsh_topk"].oracle
    return f"""
WITH bf AS ({bf}),
lsh AS ({lsh}),
qrel AS (
  SELECT query_id, cand_id, {_K + 1} - rank AS rel, rank FROM bf
),
idcg AS (
  SELECT query_id,
         sum(({_K + 1} - rank) / log2(rank + 1.0)) AS idcg
  FROM bf GROUP BY query_id
),
dcg AS (
  SELECT l.query_id,
         sum(coalesce(r.rel, 0) / log2(l.rank + 1.0)) AS dcg
  FROM lsh l
  LEFT JOIN qrel r ON r.query_id = l.query_id AND r.cand_id = l.cand_id
  GROUP BY l.query_id
),
rr AS (
  SELECT r.query_id, coalesce(max(1.0 / l.rank), 0.0) AS rr
  FROM qrel r
  LEFT JOIN lsh l ON l.query_id = r.query_id AND l.cand_id = r.cand_id
  WHERE r.rank = 1
  GROUP BY r.query_id
),
perq AS (
  SELECT i.query_id,
         round(5e-10 + coalesce(d.dcg, 0) / i.idcg, 6) AS ndcg,
         rr.rr
  FROM idcg i
  LEFT JOIN dcg d ON d.query_id = i.query_id
  JOIN rr ON rr.query_id = i.query_id
)
SELECT count(*)::BIGINT AS n_queries,
       {rnd_sql('avg(ndcg)', 6)} AS mean_ndcg_at_10,
       {rnd_sql('min(ndcg)', 6)} AS worst_ndcg,
       {rnd_sql('avg(rr)', 6)} AS mean_mrr,
       {rnd_sql('avg(CASE WHEN rr > 0 THEN 1.0 ELSE 0.0 END)', 6)}
         AS top1_hit_rate
FROM perq
"""


@register(
    "sim_ndcg_mrr",
    shape="bounded",
    tags=("similarity", "ann", "quality", "llm-pipeline"),
    oracle=_ndcg_oracle(),
)
def sim_ndcg_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking quality of the sign-LSH retrieval path against the exact
    cosine ground truth: nDCG@10 (graded gain 11-rank from the exact
    list, log2 position discount, per-query ideal normalization), MRR of
    the exact top-1 candidate, and the top-1 hit rate.  Recall counts
    set overlap; this scores ORDER — an ANN path can have recall 0.9 and
    still bury the best document at position 10, and this is the query
    that catches it.

    Scale shape: both rankings are the audited operators (broadcast
    queries, per-query ranking windows), each computed EXACTLY ONCE —
    the metric algebra is folded into a single exact→approx left join
    and one query_id-keyed aggregate, because an approximate result
    outside the exact top-10 has gain 0 and contributes nothing to any
    term (the naive three-branch formulation re-evaluated the ranking
    subtrees per branch; column pruning makes the copies non-identical,
    so ReuseExchange cannot dedupe them)."""
    emb = load_table(spark, sf_dir, "embeddings")
    bf = brute_force_topk_np(emb, k=_K, query_mod=25).select(
        "query_id", "cand_id", F.col("rank").alias("bf_rank")
    )
    lsh = lsh_topk(emb, k=_K, query_mod=25, n_planes=16, bands=4).select(
        "query_id", "cand_id", F.col("rank").alias("lsh_rank")
    )
    j = bf.join(lsh, ["query_id", "cand_id"], "left")
    gain = F.lit(_K + 1) - F.col("bf_rank")
    perq = j.groupBy("query_id").agg(
        F.sum(gain / F.log2(F.col("bf_rank") + F.lit(1.0))).alias("idcg"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("lsh_rank").isNotNull(),
                    gain / F.log2(F.col("lsh_rank") + F.lit(1.0)),
                )
            ),
            F.lit(0.0),
        ).alias("dcg"),
        F.coalesce(
            F.max(
                F.when(F.col("bf_rank") == 1, F.lit(1.0) / F.col("lsh_rank"))
            ),
            F.lit(0.0),
        ).alias("rr"),
    )
    perq = perq.select(
        rnd(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"), "rr"
    )
    return perq.agg(
        F.count(F.lit(1)).alias("n_queries"),
        rnd(F.avg("ndcg"), 6).alias("mean_ndcg_at_10"),
        rnd(F.min("ndcg"), 6).alias("worst_ndcg"),
        rnd(F.avg("rr"), 6).alias("mean_mrr"),
        rnd(
            F.avg(F.when(F.col("rr") > 0, 1.0).otherwise(0.0)), 6
        ).alias("top1_hit_rate"),
    )


def _rrf_oracle() -> str:
    """Compose the registered cosine / MIPS top-10 oracles and fuse with
    reciprocal-rank scores 1/(60+rank): pure rational arithmetic on
    small integers, bit-identical across engines, tie-broken by
    cand_id."""
    from redis_streams_spark.queries.base import REGISTRY

    bf = REGISTRY["sim_bruteforce_topk"].oracle
    dt = REGISTRY["sim_dot_topk"].oracle
    return f"""
WITH bf AS ({bf}),
dotl AS ({dt}),
u AS (
  SELECT coalesce(b.query_id, d.query_id) AS query_id,
         coalesce(b.cand_id, d.cand_id) AS cand_id,
         coalesce(b.rank, -1) AS cos_rank, coalesce(d.rank, -1) AS dot_rank,
         coalesce(1.0 / ({_RRF_K} + b.rank), 0.0)
           + coalesce(1.0 / ({_RRF_K} + d.rank), 0.0) AS rrf
  FROM bf b
  FULL OUTER JOIN dotl d
    ON b.query_id = d.query_id AND b.cand_id = d.cand_id
)
SELECT query_id, cand_id, cos_rank, dot_rank,
       {rnd_sql('rrf', 6)} AS rrf_score, fused_rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY {rnd_sql('rrf', 6)} DESC, cand_id) AS fused_rank
  FROM u) t
WHERE fused_rank <= 5
"""


@register(
    "sim_rrf_fusion",
    shape="per_row",
    tags=("similarity", "rerank", "llm-pipeline"),
    oracle=_rrf_oracle(),
)
def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two heterogeneous scorers — cosine
    (direction) and raw dot product (direction x magnitude) — into one
    top-5 per query: score = sum over lists of 1/(60+rank), the
    training-free hybrid-retrieval combiner (Cormack et al.; the same
    shape fuses BM25 + vector lists in production RAG stacks).  A
    candidate in only one list contributes one term; ranks from both
    lists are carried through so the output shows WHY each winner won
    (a one-list rank is the repo's -1 sentinel, not NULL — a NULL in a
    BIGINT column float-promotes the oracle's pandas path at scales
    where the two scorers disagree on 5+ of a query's candidates).

    Scale shape: two broadcast-query rankings (the shared audited
    operators), a full-outer equi-join on (query_id, cand_id) — at most
    2k rows per query — and a per-query ranking window; no global sort,
    no cross product."""
    emb = load_table(spark, sf_dir, "embeddings")
    bf = brute_force_topk_np(emb, k=_K, query_mod=25).select(
        "query_id", "cand_id", F.col("rank").alias("cos_rank")
    )
    dt = dot_topk(emb, k=_K, query_mod=25).select(
        "query_id", "cand_id", F.col("rank").alias("dot_rank")
    )
    return rrf_fuse(bf, dt, k=5, rrf_k=_RRF_K)
