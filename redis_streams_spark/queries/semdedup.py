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


# --------------------------------------------- incremental (index probe)

_N_CELLS = 8
_N_PROBE = 2


def _semdedup_incr_oracle() -> str:
    """Full replay of the index-probed online form: codebook trained on
    the accepted corpus (similarity6's unrolled-Lloyd CTEs), pinned
    cells + live cell means over it, the BATCH's 2-probe cell
    selection against those means, exact-cosine matching inside probed
    cells at τ, best-match verdicts with keep sentinels."""
    from redis_streams_spark.queries.similarity6 import _codebook_ctes

    cos_pin = _cos("l.v", "l.norm", "c.cv", "c.cnorm")
    cos_probe = _cos("b.v", "b.norm", "c.cv", "c.cnorm")
    cos_match = _cos("pr.qv", "pr.qn", "l.v", "l.norm")
    parts = [
        _E_CTE.strip(),
        "hist AS (SELECT vec_id, v, norm FROM e WHERE vec_id % 10 != 7)",
        "batch AS (SELECT vec_id, v, norm FROM e WHERE vec_id % 10 = 7)",
    ]
    parts += _codebook_ctes("hist", _N_CELLS, _ITERS)
    parts.append(
        f"""pinned AS (
  SELECT vec_id, v, norm, cell FROM (
    SELECT l.vec_id, l.v, l.norm, c.cell,
           row_number() OVER (PARTITION BY l.vec_id
                              ORDER BY {cos_pin} DESC, c.cell) AS rn
    FROM hist l CROSS JOIN cent{_ITERS} c) t
  WHERE rn = 1)"""
    )
    parts.append(
        """cmbd AS (
  SELECT cell, dim, round(5e-10 + avg(val), 6) AS cval
  FROM (SELECT cell, unnest(v) AS val, generate_subscripts(v, 1) AS dim
        FROM pinned) t
  GROUP BY cell, dim)"""
    )
    parts.append(
        """cmeans AS (
  SELECT cell, cv,
         sqrt(list_reduce(list_transform(cv, x -> x * x),
                          (a, b) -> a + b)) AS cnorm
  FROM (SELECT cell, list(cval ORDER BY dim) AS cv
        FROM cmbd GROUP BY cell) t)"""
    )
    parts.append(
        f"""bprobes AS (
  SELECT query_id, qv, qn, cell FROM (
    SELECT b.vec_id AS query_id, b.v AS qv, b.norm AS qn, c.cell,
           row_number() OVER (PARTITION BY b.vec_id
                              ORDER BY {cos_probe} DESC, c.cell) AS pr
    FROM batch b CROSS JOIN cmeans c) t
  WHERE pr <= {_N_PROBE})"""
    )
    parts.append(
        f"""best AS (
  SELECT query_id, cand_id, mcos FROM (
    SELECT query_id, cand_id, mcos,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY mcos DESC, cand_id) AS rn
    FROM (
      SELECT pr.query_id, l.vec_id AS cand_id, {cos_match} AS mcos
      FROM bprobes pr JOIN pinned l ON l.cell = pr.cell) s
    WHERE mcos >= {_TAU}) t
  WHERE rn = 1)"""
    )
    body = ",\n".join(parts)
    return f"""WITH {body}
SELECT b.vec_id,
       CASE WHEN m.cand_id IS NOT NULL THEN 'remove' ELSE 'keep' END
         AS verdict,
       coalesce(m.cand_id, -1)::BIGINT AS match_id,
       coalesce(m.mcos, -1.0) AS match_cos
FROM batch b LEFT JOIN best m ON m.query_id = b.vec_id
ORDER BY b.vec_id
"""


@register(
    "dedup_semantic_incremental",
    shape="per_row",
    tags=("dedup", "similarity", "index", "kmeans", "llm-pipeline"),
    oracle=_semdedup_incr_oracle(),
)
def dedup_semantic_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE semantic dedup through the managed vector index: the
    accepted corpus (vec_id % 10 != 7) is indexed with a learned
    codebook, and the ingest batch (% 10 = 7) is verdicted against it
    by ``vector_match_index`` — each batch vector probes its 2 nearest
    cells by merged-centroid cosine and removes on any exact-cosine
    match ≥ τ=0.35 among the indexed vectors there (probed-cell
    scoping is the online form of SemDeDup's cluster scoping).  The
    oracle replays codebook training, pinned cells, live means, the
    batch's probe selection, and the match-or-keep verdict from first
    principles — the index path's verdicts must equal a from-scratch
    recomputation over the accepted corpus.

    Builds a private throwaway index per call (mutating query)."""
    import atexit
    import os
    import shutil
    import uuid

    from redis_streams_spark.operators.vecindex import (
        build_vector_index,
        vector_match_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = os.path.join(
        "/tmp/spark-graft-vecidx",
        f"semincr-{os.getpid()}-{uuid.uuid4().hex[:8]}",
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    build_vector_index(
        emb.where("vec_id % 10 != 7"), path, managed=True,
        n_cells=_N_CELLS, train_iters=_ITERS,
    )
    return vector_match_index(
        spark, path, emb.where("vec_id % 10 = 7"),
        tau=_TAU, n_probe=_N_PROBE,
    )
