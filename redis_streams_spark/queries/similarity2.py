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
from redis_streams_spark.operators.similarity import brute_force_topk_np
from redis_streams_spark.queries.base import register
from redis_streams_spark.queries.similarity import _DOT, _E_CTE
from redis_streams_spark.session import load_table


@register(
    "sim_knn_classify",
    shape="bounded",
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

    Scale shape: reuses the vectorized exact top-k (broadcast queries,
    BLAS-scored candidate batches, per-query ranking window — the
    r13-audited physical path of sim_bruteforce_topk, value-identical
    to the HOF form); the vote/majority/judgment
    stages are all windows and aggregates over the k×|queries| top-k
    rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    labels = emb.select("vec_id", "label")
    topk = brute_force_topk_np(emb, k=10, query_mod=25).join(
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


@register(
    "sim_cos_histogram",
    shape="bounded",
    tags=("similarity", "diagnostics", "histogram"),
    oracle=f"""
WITH {_E_CTE},
s AS (SELECT vec_id, v, norm FROM e WHERE vec_id % 7 = 0),
p AS (
  SELECT {_DOT.format(a='a.v', b='b.v')} / (a.norm * b.norm) AS cos
  FROM s a JOIN s b ON b.vec_id > a.vec_id
), binned AS (
  SELECT floor(cos * 20)::BIGINT AS bin, count(*)::BIGINT AS n_pairs,
         {rnd_sql('avg(cos)', 6)} AS avg_cos
  FROM p GROUP BY 1
)
SELECT bin, n_pairs, avg_cos,
       {rnd_sql('n_pairs::DOUBLE / sum(n_pairs) OVER ()', 6)} AS pct
FROM binned ORDER BY bin
""",
)
def sim_cos_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine histogram over a deterministic 1-in-7 id sample
    of the embedding corpus (0.05-wide bins): the geometry diagnostic
    behind near-dup threshold tuning — a healthy embedding space shows
    a unimodal bulk well below the dedup threshold; a hub/collapse
    pathology shows mass near 1.0.

    Scale shape: the quadratic pair join runs ONLY over the fixed id
    sample (the modulus is the knob: resize it so the sample stays
    O(thousands) at any corpus size); cosines fold left-to-right
    identically on both engines, so bin assignment is exact.  The pct
    normalizer is a global window above the ≤ 41-bin aggregate."""
    e = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") % 7 == 0
    )
    v = F.transform("embedding", lambda x: x.cast("double"))
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    s = e.select("vec_id", v.alias("v"), nrm.alias("norm"))
    a = s.select(
        F.col("vec_id").alias("aid"), F.col("v").alias("av"),
        F.col("norm").alias("an"),
    )
    b = s.select(
        F.col("vec_id").alias("bid"), F.col("v").alias("bv"),
        F.col("norm").alias("bn"),
    )
    dot = F.aggregate(
        F.zip_with("av", "bv", lambda x, y: x * y), F.lit(0.0),
        lambda acc, x: acc + x,
    )
    p = a.join(b, F.col("bid") > F.col("aid")).select(
        (dot / (F.col("an") * F.col("bn"))).alias("cos")
    )
    binned = p.groupBy(F.floor(F.col("cos") * 20).alias("bin")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        rnd(F.avg("cos"), 6).alias("avg_cos"),
    )
    return binned.select(
        "bin",
        "n_pairs",
        "avg_cos",
        rnd(
            F.col("n_pairs").cast("double") / F.sum("n_pairs").over(W.partitionBy()),
            6,
        ).alias("pct"),
    ).orderBy("bin")
