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


def _ann_lifecycle_oracle() -> str:
    """The managed vector index's lifecycle contract in SQL: centroids
    and search recomputed from first principles over the CURRENT live
    corpus (the ``%7=3`` slice re-embedded with its first dimension
    shifted, the ``%11=5`` slice deleted) — exactly what the index
    answers after update/replace/delete through read-time-merged
    centroid partials (operators/vecindex.py)."""
    from redis_streams_spark.queries.base import REGISTRY

    ivf = REGISTRY["sim_ivf_topk"].oracle
    corpus_cte = """
WITH corpus AS (
  SELECT vec_id, label,
         CASE WHEN vec_id % 7 = 3
              THEN list_concat([embedding[1]::DOUBLE + 0.5],
                               list_transform(embedding[2:], y -> y::DOUBLE))
              ELSE list_transform(embedding, y -> y::DOUBLE) END AS v0
  FROM embeddings
  WHERE NOT (vec_id % 11 = 5)
),
e AS (
  SELECT vec_id, label, v0 AS v,
         sqrt(list_reduce(list_transform(v0, x -> x * x),
                          (a, b) -> a + b)) AS norm
  FROM corpus
),"""
    assert ivf.lstrip().startswith("WITH ") and _E_CTE in ivf
    return ivf.replace("WITH " + _E_CTE + ",", corpus_cte, 1)


@register(
    "sim_ann_lifecycle",
    shape="bounded",
    tags=("similarity", "ann", "index", "lifecycle"),
    oracle=_ann_lifecycle_oracle(),
)
def sim_ann_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The managed vector index's LIFECYCLE through the oracle gate:
    build on the ``vec_id % 3 != 2`` slice, append the rest as a
    segment, re-embed the ``%7=3`` slice (first dimension +0.5,
    ``replace=True``), tombstone-delete ``%11=5``, then run the 2-probe
    IVF search.  DuckDB replays centroids + search from first
    principles over the resulting live corpus — a green row proves
    that segment append, negative centroid partials, and tombstones
    leave the index answering exactly like a rebuild.

    Mutating query: private throwaway index per call (the
    dedup_refresh_indexed precedent)."""
    import atexit
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from redis_streams_spark.operators.vecindex import (
        build_vector_index,
        delete_from_vector_index,
        update_vector_index,
        vector_topk_indexed,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = os.path.join(
        "/tmp/spark-graft-vecidx",
        f"{os.getpid()}-{uuid.uuid4().hex[:8]}",
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    build_vector_index(emb.where("vec_id % 3 != 2"), path, managed=True)
    update_vector_index(emb.where("vec_id % 3 = 2"), path, segment="u1")
    mod = emb.where("vec_id % 7 = 3").withColumn(
        "embedding",
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x.cast("double") + F.lit(0.5)).otherwise(
                x.cast("double")
            ),
        ),
    )
    update_vector_index(mod, path, segment="r1", replace=True)
    delete_from_vector_index(
        spark, path, emb.where("vec_id % 11 = 5").select("vec_id"), segment="d1"
    )
    return vector_topk_indexed(spark, path, k=10, query_mod=25, n_probe=2).select(
        "query_id", "cand_id", "probed_label", "cosine", "rank"
    )
