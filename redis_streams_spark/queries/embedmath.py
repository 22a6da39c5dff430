"""Distributed linear algebra over the embedding table: covariance-
matrix build and PCA top-component extraction by power iteration —
expressed entirely as DataFrame joins/aggregations (SURVEY §2.2
extension; no counterpart in the reference).

Scale shape: the ONLY data-sized stage is the Gram-matrix aggregation
Σ x·xᵀ — a posexplode self-join keyed on vec_id whose map-side combine
reduces every partition to at most d² = 4096 partial cells, so the
shuffle carries O(partitions · d²), independent of row count.  Every
subsequent step (centering, two mat-vec products, normalization, sign
fix) operates on d²- or d-row aggregates.  This is exactly how a 100 TB
PCA runs: one pass for (n, Σx, Σxxᵀ), then driver-scale linear algebra —
kept here in DataFrames so the oracle can replay it.

Float pin: embeddings are float32; every element is cast to DOUBLE at
extraction on BOTH engines (float×float stays float in Spark but
promotes in DuckDB — casting first makes the arithmetic identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_PCA_ORACLE = """
WITH x AS (
  SELECT vec_id,
         unnest(range(0, len(embedding))) AS i,
         unnest(embedding)::DOUBLE AS xi
  FROM embeddings
), mu AS (
  SELECT i, avg(xi) AS mu FROM x GROUP BY i
), n AS (
  SELECT count(*)::DOUBLE AS n FROM embeddings
), gram AS (
  SELECT a.i AS i, b.i AS j, sum(a.xi * b.xi) AS s
  FROM x a JOIN x b USING (vec_id)
  GROUP BY 1, 2
), cov AS (
  SELECT gram.i, gram.j, gram.s / n.n - ma.mu * mb.mu AS cv
  FROM gram
  JOIN mu ma ON ma.i = gram.i
  JOIN mu mb ON mb.i = gram.j
  CROSS JOIN n
), v1 AS (
  SELECT i, sum(cv) AS val FROM cov GROUP BY i
), v2 AS (
  SELECT cov.i AS i, sum(cov.cv * v1.val) AS val
  FROM cov JOIN v1 ON v1.i = cov.j
  GROUP BY cov.i
), nrm AS (
  SELECT sqrt(sum(val * val)) AS z FROM v2
), sgn AS (
  SELECT CASE WHEN val >= 0 THEN 1.0 ELSE -1.0 END AS s
  FROM v2 ORDER BY abs(val) DESC, i LIMIT 1
)
SELECT i AS dim_idx,
       round(5e-10 + sgn.s * val / nrm.z, 6) AS loading
FROM v2 CROSS JOIN nrm CROSS JOIN sgn
ORDER BY dim_idx
"""


@register("q_embed_pca_power", shape="bounded", tags=("embedding", "linalg"), oracle=_PCA_ORACLE)
def q_embed_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding cloud by two fixed power
    iterations over the exact covariance matrix (start vector = all-ones,
    normalized once at the end; sign fixed so the largest-|loading|
    component is positive) — the dimensionality-reduction / drift-
    detection primitive, and the iterative-mat-vec pattern any Krylov
    method at scale uses.

    Fixed iteration count keeps it deterministic and the oracle an
    unrolled CTE chain (same stance as q_pagerank / sim_kmeans_clusters).

    Reference basis: none."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "xi")
    ).withColumn("xi", F.col("xi").cast("double"))
    mu = x.groupBy("i").agg(F.avg("xi").alias("mu"))
    n = emb.agg(F.count(F.lit(1)).cast("double").alias("n"))
    a = x.select("vec_id", F.col("i").alias("ai"), F.col("xi").alias("ax"))
    b = x.select("vec_id", F.col("i").alias("bj"), F.col("xi").alias("bx"))
    gram = (
        a.join(b, "vec_id")
        .groupBy(F.col("ai").alias("i"), F.col("bj").alias("j"))
        .agg(F.sum(F.col("ax") * F.col("bx")).alias("s"))
    )
    ma = mu.select(F.col("i"), F.col("mu").alias("mu_i"))
    mb = mu.select(F.col("i").alias("j"), F.col("mu").alias("mu_j"))
    # cov's lineage (the Gram aggregation over the data) appears 3× in
    # the final plan (v1, v2's join side, v2's probe) — left UNpersisted
    # on purpose: the duplicated subtrees end in IDENTICAL exchanges, so
    # runtime exchange reuse dedupes the O(rows·d²) work to one
    # execution (measured: persisting cov is ~70% SLOWER at sf0.1 and
    # 10×, because the extra materialization barrier blocks pipelining
    # while saving nothing the reuse didn't already save).
    cov = (
        gram.join(F.broadcast(ma), "i")
        .join(F.broadcast(mb), "j")
        .crossJoin(F.broadcast(n))
        .select(
            "i", "j", (F.col("s") / F.col("n") - F.col("mu_i") * F.col("mu_j")).alias("cv")
        )
    )
    v1 = cov.groupBy("i").agg(F.sum("cv").alias("val"))
    v2 = (
        cov.join(
            F.broadcast(v1.select(F.col("i").alias("j"), F.col("val").alias("v1"))),
            "j",
        )
        .groupBy("i")
        .agg(F.sum(F.col("cv") * F.col("v1")).alias("val"))
    )
    nrm = v2.agg(F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("z"))
    sgn = (
        v2.withColumn(
            "rn",
            F.row_number().over(W.orderBy(F.abs(F.col("val")).desc(), F.col("i"))),
        )
        .where(F.col("rn") == 1)
        .select(
            F.when(F.col("val") >= 0, F.lit(1.0)).otherwise(F.lit(-1.0)).alias("s")
        )
    )
    return (
        v2.crossJoin(F.broadcast(nrm))
        .crossJoin(F.broadcast(sgn))
        .select(
            F.col("i").alias("dim_idx"),
            rnd(F.col("s") * F.col("val") / F.col("z"), 6).alias("loading"),
        )
        .orderBy("dim_idx")
    )
