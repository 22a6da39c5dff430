"""Round-6 closing wave: corpus length profiling, user-activity
distribution, and cluster-separation diagnostics.

Reference basis: none.  All three are aggregate-first; the centroid
matrix is k×k (broadcast-sized) by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.functions.textfns import words_sql, words
from redis_streams_spark.operators.similarity import cosine, label_centroids
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table


@register(
    "text_length_profile",
    shape="bounded",
    tags=("text", "profiling", "llm-pipeline"),
    oracle=f"""
WITH sig AS (
  SELECT source, n_chars, len({words_sql('text')}) AS n_words FROM documents
)
SELECT source, count(*) AS n_docs,
       {rnd_sql('percentile_cont(0.1) WITHIN GROUP (ORDER BY n_chars)', 2)} AS chars_p10,
       {rnd_sql('percentile_cont(0.5) WITHIN GROUP (ORDER BY n_chars)', 2)} AS chars_p50,
       {rnd_sql('percentile_cont(0.9) WITHIN GROUP (ORDER BY n_chars)', 2)} AS chars_p90,
       {rnd_sql('percentile_cont(0.5) WITHIN GROUP (ORDER BY n_words)', 2)} AS words_p50,
       max(n_chars)::BIGINT AS chars_max
FROM sig GROUP BY source ORDER BY source
""",
)
def text_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length percentiles per source (chars p10/p50/p90, words
    p50, max) — the truncation-budget profile sequence-packing and
    context-length decisions start from.  One scan, exact percentiles
    per source key."""
    docs = load_table(spark, sf_dir, "documents")
    sig = docs.select("source", "n_chars", F.size(words("text")).alias("n_words"))
    return (
        sig.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            rnd(F.expr("percentile(n_chars, 0.1)"), 2).alias("chars_p10"),
            rnd(F.expr("percentile(n_chars, 0.5)"), 2).alias("chars_p50"),
            rnd(F.expr("percentile(n_chars, 0.9)"), 2).alias("chars_p90"),
            rnd(F.expr("percentile(n_words, 0.5)"), 2).alias("words_p50"),
            F.max("n_chars").alias("chars_max"),
        )
        .orderBy("source")
    )


@register(
    "q_user_activity_histogram",
    shape="bounded",
    tags=("analytics", "histogram"),
    oracle="""
WITH u AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY user_id
)
SELECT length(bin(n))::BIGINT AS activity_bucket,
       count(*) AS n_users, min(n)::BIGINT AS min_events,
       max(n)::BIGINT AS max_events, sum(n)::BIGINT AS total_events
FROM u GROUP BY 1 ORDER BY activity_bucket
""",
)
def q_user_activity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed histogram of per-user event counts — the
    activity-distribution fingerprint (power users vs long tail) that
    sizes per-user state budgets; bucket = exact binary digit count,
    immune to the float-log2 ulp hazard (same trick as
    q_degree_distribution).  Two partial-aggregated shuffles."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        u.groupBy(F.length(F.bin("n")).cast("long").alias("activity_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("n").alias("min_events"),
            F.max("n").alias("max_events"),
            F.sum("n").alias("total_events"),
        )
        .orderBy("activity_bucket")
    )


@register(
    "sim_centroid_separation",
    shape="bounded",
    tags=("similarity", "clustering", "evaluation"),
    oracle="""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
), by_dim AS (
  SELECT label, dim, round(5e-10 + avg(val), 6) AS cval
  FROM (SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS dim FROM e) t
  GROUP BY label, dim
), cent AS (
  SELECT label, list(cval ORDER BY dim) AS cv FROM by_dim GROUP BY label
), cn AS (
  SELECT label, cv,
         sqrt(list_reduce(list_transform(cv, x -> x * x), (a, b) -> a + b)) AS cnorm
  FROM cent
)
SELECT a.label AS label_a, b.label AS label_b,
       round(5e-10 + list_reduce(list_transform(range(1, len(a.cv) + 1),
                                                i -> a.cv[i] * b.cv[i]),
                                 (x, y) -> x + y) / (a.cnorm * b.cnorm), 6)
         AS centroid_cosine
FROM cn a JOIN cn b ON a.label < b.label
ORDER BY label_a, label_b
""",
)
def sim_centroid_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between label centroids — the cluster-separation
    diagnostic behind the IVF cell layout: cells whose centroids sit
    close (cosine near 1) will leak candidates into each other's probes
    and deserve a higher n_probe (or a re-clustering).

    Scale shape: the centroid build is the same distributed (label, dim)
    aggregation as sim_ivf_topk; the pair matrix is k×k over the
    k-row broadcast-sized centroid table — scale-free in the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    cent = label_centroids(emb)
    a = cent.select(
        F.col("label").alias("label_a"),
        F.col("cv").alias("cva"),
        F.col("cnorm").alias("cna"),
    )
    b = cent.select(
        F.col("label").alias("label_b"),
        F.col("cv").alias("cvb"),
        F.col("cnorm").alias("cnb"),
    )
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            cosine(
                F.col("cva"), F.col("cna"), F.col("cvb"), F.col("cnb")
            ).alias("centroid_cosine"),
        )
        .orderBy("label_a", "label_b")
    )
