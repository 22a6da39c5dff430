"""Round-13 compressed-ANN quality wave: recall@k of the three
compressed search paths (SQ8, PQ+ADC, managed-index IVF-PQ) against
the exact brute-force baseline — closing VERDICT r12's top "what's
missing" item: the compressed paths shipped with exactness proofs of
the MECHANISM but no registered recall number, so a user choosing
``pq_m`` or ``oversample`` was flying blind.

This is the ``sim_recall_report`` pattern applied to the quantized
family: every path's top-10 per query is deterministic (integer
stage-1 scores, 6dp-rounded cosine rerank, cand_id tie-breaks), so
the per-path overlap with the exact top-10 is a hash-verifiable
scalar on both engines.  The oracle composes the three paths'
already-proven full replays (similarity5's SQ8 chain, similarity7's
PQ and IVFADC chains) as CTEs and counts overlap — one green row
certifies the recall numbers are computed from the REAL physical
paths, index build included.

At 100 TB this is the query you run on a sample to pick the
accuracy/cost point before committing a sweep: SQ8 (4× byte cut, high
recall), PQ (8·d/m× cut, mid recall), IVF-PQ (adds probe-bounded scan).

Reference basis: none (SURVEY §2.2 extension surface — similarity
search quality measurement); Jégou et al. 2011 §V's recall@R
evaluation protocol restated relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.queries.base import REGISTRY, register
from redis_streams_spark.session import load_table

_K = 10
_QUERY_MOD = 25


def _recall_compressed_oracle() -> str:
    """bf/sq8/pq/ivfpq top-10 CTEs (each the path's full registered
    replay — nested WITH is legal in a parenthesized CTE body) joined
    into per-path overlap counts over the shared exact baseline."""
    bf = REGISTRY["sim_bruteforce_topk"].oracle
    sq8 = REGISTRY["sim_sq8_rerank"].oracle
    pq = REGISTRY["sim_pq_rerank"].oracle
    ivfpq = REGISTRY["sim_ann_ivfpq"].oracle
    return f"""
WITH bf AS ({bf}),
sq8 AS ({sq8}),
pq AS ({pq}),
ivfpq AS ({ivfpq})
SELECT
  round(5e-10 + (SELECT count(*) FROM bf b JOIN sq8 s
                 ON b.query_id = s.query_id AND b.cand_id = s.cand_id) * 1.0
        / (SELECT count(*) FROM bf), 4) AS sq8_recall_at_10,
  round(5e-10 + (SELECT count(*) FROM bf b JOIN pq p
                 ON b.query_id = p.query_id AND b.cand_id = p.cand_id) * 1.0
        / (SELECT count(*) FROM bf), 4) AS pq_recall_at_10,
  round(5e-10 + (SELECT count(*) FROM bf b JOIN ivfpq i
                 ON b.query_id = i.query_id AND b.cand_id = i.cand_id) * 1.0
        / (SELECT count(*) FROM bf), 4) AS ivfpq_recall_at_10,
  (SELECT count(DISTINCT query_id) FROM bf) AS n_queries
"""


@register(
    "sim_recall_compressed",
    shape="bounded",
    tags=("similarity", "ann", "quality", "pq", "quantization"),
    oracle=_recall_compressed_oracle(),
)
def sim_recall_compressed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of every COMPRESSED ANN path against the exact
    brute-force baseline, at each path's registered parameters: SQ8
    (int8 scalar quantization + rerank), PQ+ADC (m=4 codebooks,
    oversample 4), and IVF-PQ through the managed index (learned
    coarse cells, n_probe=2 — its recall folds in both quantization
    loss AND probe misses).  Each path runs its real physical pipeline
    (the IVF-PQ branch builds the index); the oracle replays all four
    chains from first principles and measures the same overlaps — the
    recall numbers themselves are hash-verified, not just the
    rankings they derive from.

    Scale shape: the baseline feeds all three overlap joins and is
    persisted once; each path contributes k rows per query, so every
    join is output-sized (queries × k) regardless of corpus size."""
    # NB: deliberately the HOF brute_force_topk, not the Arrow kernel —
    # this query is dominated by the SQ8/PQ/IVF-PQ builds and the
    # interleaved A/B (OPTIMIZATION_r13.md §11) showed the np kernel's
    # extra probe-collect job costing a consistent ~1.7 s here with no
    # offsetting win (the bf slice is tiny); the four queries where the
    # kernel measurably wins use brute_force_topk_np.
    from redis_streams_spark.operators.similarity import brute_force_topk
    from redis_streams_spark.queries.similarity5 import sim_sq8_rerank
    from redis_streams_spark.queries.similarity7 import (
        sim_ann_ivfpq,
        sim_pq_rerank,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    bf = (
        brute_force_topk(emb, k=_K, query_mod=_QUERY_MOD)
        .select("query_id", "cand_id")
        .persist()
    )
    labeled = (
        sim_sq8_rerank(spark, sf_dir)
        .select("query_id", "cand_id")
        .withColumn("path", F.lit("sq8"))
        .unionByName(
            sim_pq_rerank(spark, sf_dir)
            .select("query_id", "cand_id")
            .withColumn("path", F.lit("pq"))
        )
        .unionByName(
            sim_ann_ivfpq(spark, sf_dir)
            .select("query_id", "cand_id")
            .withColumn("path", F.lit("ivfpq"))
        )
    )

    def _hits(path: str, alias: str):
        return F.coalesce(
            F.sum(F.when(F.col("path") == path, 1)), F.lit(0)
        ).alias(alias)

    hits = bf.join(labeled, ["query_id", "cand_id"]).agg(
        _hits("sq8", "sq8_hits"),
        _hits("pq", "pq_hits"),
        _hits("ivfpq", "ivfpq_hits"),
    )
    totals = bf.agg(
        F.count(F.lit(1)).alias("n_bf"),
        F.count_distinct("query_id").alias("n_queries"),
    )

    def _recall(hits_col: str, alias: str):
        return rnd(F.col(hits_col) * 1.0 / F.col("n_bf"), 4).alias(alias)

    return totals.crossJoin(hits).select(
        _recall("sq8_hits", "sq8_recall_at_10"),
        _recall("pq_hits", "pq_recall_at_10"),
        _recall("ivfpq_hits", "ivfpq_recall_at_10"),
        "n_queries",
    )


# ------------------------------------------------- matryoshka truncation

_TRUNC_TOPK = """
  SELECT query_id, cand_id FROM (
    SELECT q.query_id, c.vec_id AS cand_id,
           round(5e-10 + list_reduce(list_transform(
                     range(1, len(q.qv) + 1), i -> q.qv[i] * c.v[i]),
                     (x, y) -> x + y) / (q.qn * c.norm), 6) AS cosine,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY round(5e-10 + list_reduce(
                                list_transform(range(1, len(q.qv) + 1),
                                i -> q.qv[i] * c.v[i]), (x, y) -> x + y)
                                / (q.qn * c.norm), 6) DESC,
                              c.vec_id) AS rank
    FROM (SELECT vec_id AS query_id, v AS qv, norm AS qn FROM {src}
          WHERE vec_id % {mod} = 0) q
    JOIN {src} c ON c.vec_id <> q.query_id) t
  WHERE rank <= {k}
"""


def _matryoshka_oracle() -> str:
    def trunc_cte(name: str, den: int) -> str:
        return f"""{name} AS (
  SELECT vec_id, v[1:(len(v) // {den})] AS v,
         sqrt(list_reduce(list_transform(v[1:(len(v) // {den})],
              x -> x * x), (a, b) -> a + b)) AS norm
  FROM e)"""

    def topk(src: str) -> str:
        return _TRUNC_TOPK.format(src=src, mod=_QUERY_MOD, k=_K)

    from redis_streams_spark.queries.similarity import _E_CTE

    return f"""
WITH {_E_CTE},
{trunc_cte('eh', 2)},
{trunc_cte('eq', 4)},
bf AS ({topk('e')}),
hf AS ({topk('eh')}),
qf AS ({topk('eq')})
SELECT
  round(5e-10 + (SELECT count(*) FROM bf b JOIN hf h
                 ON b.query_id = h.query_id AND b.cand_id = h.cand_id) * 1.0
        / (SELECT count(*) FROM bf), 4) AS half_recall_at_10,
  round(5e-10 + (SELECT count(*) FROM bf b JOIN qf q2
                 ON b.query_id = q2.query_id AND b.cand_id = q2.cand_id) * 1.0
        / (SELECT count(*) FROM bf), 4) AS quarter_recall_at_10,
  (SELECT count(DISTINCT query_id) FROM bf) AS n_queries
"""


@register(
    "sim_matryoshka_recall",
    shape="bounded",
    tags=("similarity", "ann", "quality", "embeddings"),
    oracle=_matryoshka_oracle(),
)
def sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of PREFIX-TRUNCATED embeddings (d/2 and d/4 head
    dimensions, renormalized) against the full-dimension exact top-10
    — the Matryoshka-representation storage dial (Kusupati et al.
    2022): truncating the stored vector cuts scan bytes and index
    size linearly, and this row measures exactly what that costs in
    neighbor fidelity on THIS corpus.  All three rankings run the
    audited brute-force operator (truncation is just a column
    expression feeding it), so the number reflects the real physical
    path; the oracle replays slice, renorm, all three rankings, and
    the overlap arithmetic.

    At 100 TB the same row (on a sample) decides whether the vector
    store keeps 64, 32, or 16 dims hot — combine with
    ``sim_recall_compressed`` for the truncate-then-quantize
    frontier."""
    from redis_streams_spark.operators.similarity import (
        brute_force_topk_np,
    )

    emb = load_table(spark, sf_dir, "embeddings")

    def trunc(den: int) -> DataFrame:
        return emb.select(
            "vec_id",
            F.slice(
                "embedding", 1, (F.size("embedding") / den).cast("int")
            ).alias("embedding"),
        )

    def topk_ids(src: DataFrame) -> DataFrame:
        return brute_force_topk_np(src, k=_K, query_mod=_QUERY_MOD).select(
            "query_id", "cand_id"
        )

    bf = topk_ids(emb).persist()
    labeled = (
        topk_ids(trunc(2))
        .withColumn("path", F.lit("half"))
        .unionByName(topk_ids(trunc(4)).withColumn("path", F.lit("quarter")))
    )
    hits = bf.join(labeled, ["query_id", "cand_id"]).agg(
        F.coalesce(
            F.sum(F.when(F.col("path") == "half", 1)), F.lit(0)
        ).alias("half_hits"),
        F.coalesce(
            F.sum(F.when(F.col("path") == "quarter", 1)), F.lit(0)
        ).alias("quarter_hits"),
    )
    totals = bf.agg(
        F.count(F.lit(1)).alias("n_bf"),
        F.count_distinct("query_id").alias("n_queries"),
    )
    return totals.crossJoin(hits).select(
        rnd(F.col("half_hits") * 1.0 / F.col("n_bf"), 4).alias(
            "half_recall_at_10"
        ),
        rnd(F.col("quarter_hits") * 1.0 / F.col("n_bf"), 4).alias(
            "quarter_recall_at_10"
        ),
        "n_queries",
    )
