"""kNN classification eval over the embeddings table.

Reference basis: none (north-star similarity extension) — this is the
standard leave-one-out kNN quality check a vector index ships with:
if the labels are learnable from the embedding space, neighbor-majority
classification should beat chance, and a drop after an index change is
the first sign the index is returning the wrong neighborhoods.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.operators.similarity import brute_force_topk
from redis_streams_spark.queries.base import register
from redis_streams_spark.queries.similarity import _E_CTE
from redis_streams_spark.session import load_table


@register(
    "sim_knn_classify",
    tags=("similarity", "knn", "evaluation"),
    oracle=f"""
WITH {_E_CTE},
q AS (SELECT vec_id AS query_id, v AS qv, norm AS qn FROM e WHERE vec_id % 25 = 0),
scored AS (
  SELECT q.query_id, e.vec_id AS cand_id, e.label AS cand_label,
         round(5e-10 + list_reduce(list_transform(range(1, len(q.qv) + 1),
                                                  i -> q.qv[i] * e.v[i]),
                                   (x, y) -> x + y) / (q.qn * e.norm), 6) AS cosine
  FROM q JOIN e ON e.vec_id <> q.query_id
), topk AS (
  SELECT query_id, cand_label
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, cand_id) AS rank
        FROM scored) t
  WHERE rank <= 10
), votes AS (
  SELECT query_id, cand_label, count(*) AS n_votes
  FROM topk GROUP BY query_id, cand_label
), majority AS (
  SELECT query_id, cand_label AS predicted
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY n_votes DESC, cand_label) AS r
        FROM votes) t
  WHERE r = 1
), judged AS (
  SELECT e.label AS true_label,
         CASE WHEN m.predicted = e.label THEN 1 ELSE 0 END AS correct
  FROM majority m JOIN e ON e.vec_id = m.query_id
)
SELECT true_label, count(*) AS n_queries,
       sum(correct)::BIGINT AS n_correct,
       {rnd_sql('sum(correct) * 1.0 / count(*)', 4)} AS accuracy
FROM judged GROUP BY true_label ORDER BY true_label
""",
)
def sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 10-NN majority-vote classification accuracy per
    label: each query vector (vec_id % 25 == 0) is classified by its 10
    nearest neighbors' majority label (ties → smallest label) and
    compared to its own — the standard embedding-space quality check
    behind every index-change signoff.

    Scale shape: reuses brute_force_topk (broadcast queries, streaming
    candidates, per-query ranking window); the vote/majority/judgment
    stages are all windows and aggregates over the k×|queries| top-k
    rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    labels = emb.select("vec_id", "label")
    topk = brute_force_topk(emb, k=10, query_mod=25).join(
        labels.select(
            F.col("vec_id").alias("cand_id"), F.col("label").alias("cand_label")
        ),
        "cand_id",
    )
    votes = topk.groupBy("query_id", "cand_label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wv = W.partitionBy("query_id").orderBy(F.desc("n_votes"), "cand_label")
    majority = (
        votes.withColumn("r", F.row_number().over(wv))
        .where(F.col("r") == 1)
        .select("query_id", F.col("cand_label").alias("predicted"))
    )
    judged = majority.join(
        labels.select(
            F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
        ),
        "query_id",
    ).select(
        "true_label",
        (F.col("predicted") == F.col("true_label")).cast("long").alias("correct"),
    )
    return (
        judged.groupBy("true_label")
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum("correct").alias("n_correct"),
            rnd(F.sum("correct") * 1.0 / F.count(F.lit(1)), 4).alias("accuracy"),
        )
        .orderBy("true_label")
    )
