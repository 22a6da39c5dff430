"""Round-11 quantized-retrieval wave: int8 scalar quantization (SQ8)
with exact rerank — the standard memory-bound ANN recipe between
"brute force is too many bytes" and "train an IVF/PQ codebook".

The first stage scores candidates on per-dimension int8 codes (4x
fewer bytes than float32 on the scan, exact integer dot products — no
cross-engine float seam), the second reranks the small survivor set
with full-precision cosine.  The quantization rule is
``floor(t + 0.5)`` on IEEE doubles, bit-identical in Spark and DuckDB,
so the ENTIRE two-stage pipeline is oracle-verified value-for-value.

Reference basis: none (SURVEY §2.2 extension surface — similarity
search; the SQ8+rerank shape follows the published FAISS
ScalarQuantizer / Lucene int8 HNSW designs restated as DataFrame ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from redis_streams_spark.operators.similarity import sq8_rerank_topk
from redis_streams_spark.queries.base import register
from redis_streams_spark.queries.similarity import _cos, _E_CTE
from redis_streams_spark.session import load_table

_K = 10
_OVERSAMPLE = 4
_QUERY_MOD = 25

_SQ8_ORACLE = f"""
WITH {_E_CTE},
ex AS (
  SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM e
), ds AS (
  SELECT dim, min(x) AS mn, max(x) AS mx FROM ex GROUP BY dim
), qz AS (
  SELECT vec_id, dim,
         CASE WHEN mx = mn THEN 0
              ELSE floor((x - mn) / (mx - mn) * 254.0 + 0.5)::INT - 127
         END AS q
  FROM ex JOIN ds USING (dim)
), qq AS (
  SELECT vec_id AS query_id, dim, q FROM qz WHERE vec_id % {_QUERY_MOD} = 0
), iscore AS (
  SELECT qq.query_id, c.vec_id AS cand_id, sum(qq.q * c.q)::BIGINT AS int8_dot
  FROM qq JOIN qz c ON c.dim = qq.dim AND c.vec_id <> qq.query_id
  GROUP BY qq.query_id, c.vec_id
), kept AS (
  SELECT query_id, cand_id, int8_dot
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY int8_dot DESC, cand_id) AS arank
        FROM iscore) t
  WHERE arank <= {_K * _OVERSAMPLE}
), rer AS (
  SELECT k.query_id, k.cand_id, k.int8_dot,
         {_cos('q.v', 'q.norm', 'c.v', 'c.norm')} AS cosine
  FROM kept k
  JOIN e q ON q.vec_id = k.query_id
  JOIN e c ON c.vec_id = k.cand_id
)
SELECT query_id, cand_id, int8_dot, cosine, rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id) AS rank
      FROM rer) t
WHERE rank <= {_K}
ORDER BY query_id, rank
"""


@register(
    "sim_sq8_rerank",
    shape="per_row",
    tags=("similarity", "ann", "quantization"),
    oracle=_SQ8_ORACLE,
)
def sim_sq8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantized top-40 candidate generation + exact-cosine
    rerank to top-10 for the query subset (vec_id % 25 == 0).  The
    oracle replays BOTH stages (quantized integer scoring included)
    from first principles in SQL — quantization codes, candidate cut,
    and final ranking all value-checked.  Spark side scores arrays
    in-row (zip_with/aggregate, JVM codegen); the oracle scores the
    exploded (vec_id, dim) form — identical results because the stage-1
    arithmetic is integer-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sq8_rerank_topk(
        emb, k=_K, query_mod=_QUERY_MOD, oversample=_OVERSAMPLE
    ).select("query_id", "cand_id", "int8_dot", "cosine", "rank")
