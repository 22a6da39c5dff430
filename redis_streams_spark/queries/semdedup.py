"""Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster-
scoped embedding-cosine dedup with keep/remove VERDICTS — the missing
member of the dedup family: exact (digest), MinHash/LSH (lexical
near-dup), SimHash, n-gram Jaccard, substring-span, and embedding
PAIRS all exist; this adds the standard semantic-level corpus pruning
used for LLM pretraining data (cluster first so the quadratic
verification never leaves a cell, then keep one representative per
near-duplicate relation).

The whole chain is oracle-replayable because every stage already has
a proven deterministic form: the unrolled Lloyd k-means CTE chain
(``sim_kmeans_clusters``), the 6dp-rounded cosine, and a pairwise
keep-first rule (no connected components — the documented
one-pass-over-the-similarity-matrix shape real SemDeDup
implementations use).

Reference basis: none (SURVEY §2.2 extension surface — deduplication);
Abbas et al. 2023 (SemDeDup) for the cluster-then-dedup semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from redis_streams_spark.queries.base import register
from redis_streams_spark.queries.similarity import (
    _E_CTE,
    _cos,
    _kmeans_oracle,
)
from redis_streams_spark.session import load_table

_K = 8
_ITERS = 2
_TAU = 0.35


def _semdedup_oracle() -> str:
    km = _kmeans_oracle(_K, _ITERS)
    return f"""
WITH km AS ({km}),
{_E_CTE},
a AS (
  SELECT k2.vec_id, k2.cluster_id, e.v, e.norm
  FROM km k2 JOIN e ON e.vec_id = k2.vec_id
),
dups AS (
  SELECT y.vec_id AS b_id, min(x.vec_id) AS dup_of
  FROM a x JOIN a y
    ON x.cluster_id = y.cluster_id AND x.vec_id < y.vec_id
  WHERE {_cos('x.v', 'x.norm', 'y.v', 'y.norm')} >= {_TAU}
  GROUP BY y.vec_id
)
SELECT a.vec_id, a.cluster_id,
       CASE WHEN d.dup_of IS NOT NULL THEN 'remove' ELSE 'keep' END
         AS verdict,
       coalesce(d.dup_of, -1)::BIGINT AS dup_of
FROM a LEFT JOIN dups d ON d.b_id = a.vec_id
ORDER BY a.vec_id
"""


@register(
    "dedup_semantic",
    shape="per_row",
    tags=("dedup", "similarity", "kmeans", "llm-pipeline"),
    oracle=_semdedup_oracle(),
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup verdicts over the embedding corpus: deterministic
    Lloyd clustering (8 cells, 2 rounds — the ``sim_kmeans_clusters``
    machinery), within-cluster exact-cosine pairs at τ=0.35 (the
    corpus's near-dup level — synthetic embeddings top out near 0.5),
    remove-if-a-smaller-id-neighbor-matches.  One row per vector with
    its cluster, verdict, and retained ``dup_of`` (-1 for keepers).
    The oracle replays clustering, pair generation, and the verdict
    rule from first principles — the kept/removed PARTITION of the
    corpus is hash-verified, not just the pair list."""
    from redis_streams_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, k=_K, iters=_ITERS, tau=_TAU)
