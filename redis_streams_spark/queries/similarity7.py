"""Product-quantization ANN through the oracle gate: per-subspace
Lloyd codebooks, m-byte codes, integer LUT-sum candidate scoring
(asymmetric distance computation), exact-cosine rerank — the
quantized-ANN family's third member after SQ8 (r11) and the learned
IVF coarse quantizer (r12 wave 1).

DuckDB replays the ENTIRE chain from first principles: subvector
split, the unrolled per-subspace Lloyd (shared seeds/rounding/tiebreak
discipline with the coarse-quantizer oracle in similarity6.py), frozen
codebook assignment, the per-query LUT in integer micro-units, the
order-free integer candidate sum, and both ranking stages.

Public-knowledge basis: Jégou, Douze, Schmid 2011 (PQ/ADC); FAISS PQ
training defaults.  Reference basis: none (SURVEY §2.2 extension
surface — similarity search).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from redis_streams_spark.queries.base import register
from redis_streams_spark.queries.similarity import _E_CTE, _cos
from redis_streams_spark.session import load_table

_K = 10
_QUERY_MOD = 25
_OVERSAMPLE = 4
_M = 4
_K_SUB = 8
_ITERS = 2

# 6dp-rounded squared L2 between subvector b.sv and centroid c.cv
_L2 = (
    "round(5e-10 + list_reduce(list_transform(range(1, len(b.sv) + 1),"
    " i -> (b.sv[i] - c.cv[i]) * (b.sv[i] - c.cv[i])), (x, y) -> x + y), 6)"
)

_QDOT = (
    "list_reduce(list_transform(range(1, len(q.qsv) + 1),"
    " i -> q.qsv[i] * c.cv[i]), (x, y) -> x + y)"
)


def _pq_ctes(m: int, k_sub: int, iters: int) -> list[str]:
    """sub → seeded cent0 → iters×(assign, rebuild) → codes over the
    frozen cent{iters} — the Spark pq_train_codebooks/_pq_assign chain
    unrolled; the subspace id is a column, so the m codebooks train in
    the same relational steps."""
    parts = [
        f"""sub AS (
  SELECT vec_id, s,
         v[(s * (len(v) // {m}) + 1):((s + 1) * (len(v) // {m}))] AS sv
  FROM e, (SELECT unnest(range(0, {m})) AS s) ss)""",
        f"""cent0 AS (
  SELECT s, (rn - 1)::INT AS code, sv AS cv FROM (
    SELECT s, sv, row_number() OVER (PARTITION BY s ORDER BY vec_id) AS rn
    FROM sub) t
  WHERE rn <= {k_sub})""",
    ]
    for i in range(iters):
        parts.append(
            f"""pasg{i + 1} AS (
  SELECT vec_id, s, sv, code FROM (
    SELECT b.vec_id, b.s, b.sv, c.code,
           row_number() OVER (PARTITION BY b.vec_id, b.s
                              ORDER BY {_L2}, c.code) AS rn
    FROM sub b JOIN cent{i} c ON c.s = b.s) t
  WHERE rn = 1)"""
        )
        parts.append(
            f"""pbd{i + 1} AS (
  SELECT s, code, dim, round(5e-10 + avg(val), 6) AS cval
  FROM (SELECT s, code, unnest(sv) AS val, generate_subscripts(sv, 1) AS dim
        FROM pasg{i + 1}) t
  GROUP BY s, code, dim)"""
        )
        parts.append(
            f"""cent{i + 1} AS (
  SELECT s, code, list(cval ORDER BY dim) AS cv
  FROM pbd{i + 1} GROUP BY s, code)"""
        )
    parts.append(
        f"""codes AS (
  SELECT vec_id, s, code FROM (
    SELECT b.vec_id, b.s, c.code,
           row_number() OVER (PARTITION BY b.vec_id, b.s
                              ORDER BY {_L2}, c.code) AS rn
    FROM sub b JOIN cent{iters} c ON c.s = b.s) t
  WHERE rn = 1)"""
    )
    return parts


def _pq_oracle() -> str:
    parts = [_E_CTE.strip()]
    parts += _pq_ctes(_M, _K_SUB, _ITERS)
    parts.append(
        f"""q AS (
  SELECT vec_id AS query_id, s, sv AS qsv FROM sub
  WHERE vec_id % {_QUERY_MOD} = 0)"""
    )
    parts.append(
        f"""lut AS (
  SELECT q.query_id, c.s, c.code,
         CAST(floor({_QDOT} * 1e6 + 0.5) AS BIGINT) AS pd
  FROM q JOIN cent{_ITERS} c ON c.s = q.s)"""
    )
    parts.append(
        """adot AS (
  SELECT l.query_id, co.vec_id AS cand_id, sum(l.pd)::BIGINT AS pq_dot
  FROM codes co JOIN lut l
    ON l.s = co.s AND l.code = co.code AND co.vec_id <> l.query_id
  GROUP BY l.query_id, co.vec_id)"""
    )
    parts.append(
        f"""kept AS (
  SELECT query_id, cand_id, pq_dot FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY pq_dot DESC, cand_id) AS ar
    FROM adot) t
  WHERE ar <= {_K * _OVERSAMPLE})"""
    )
    cos = _cos("eq.v", "eq.norm", "ec.v", "ec.norm")
    parts.append(
        f"""rer AS (
  SELECT k.query_id, k.cand_id, k.pq_dot, {cos} AS cosine
  FROM kept k
  JOIN e eq ON eq.vec_id = k.query_id
  JOIN e ec ON ec.vec_id = k.cand_id)"""
    )
    body = ",\n".join(parts)
    return f"""WITH {body}
SELECT query_id, cand_id, pq_dot, cosine, rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id) AS rank
      FROM rer) t
WHERE rank <= {_K}
ORDER BY query_id, rank"""


@register(
    "sim_pq_rerank",
    shape="bounded",
    tags=("similarity", "ann", "pq", "kmeans"),
    oracle=_pq_oracle(),
)
def sim_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ+ADC two-stage ANN: m=4 per-subspace codebooks (8 codes, 2
    Lloyd rounds on subvector L2), candidates scored as the exact
    INTEGER sum of per-subspace LUT micro-units (no summation-order
    seam), top-40 per query reranked by exact cosine to the top-10.
    The oracle replays subspace split, per-subspace training, code
    assignment, LUT quantization, and both rankings from first
    principles — a green row proves the whole compressed-domain chain,
    not just the rerank."""
    from redis_streams_spark.operators.similarity import pq_rerank_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_rerank_topk(
        emb,
        k=_K,
        query_mod=_QUERY_MOD,
        oversample=_OVERSAMPLE,
        m=_M,
        k_sub=_K_SUB,
        iters=_ITERS,
    )
