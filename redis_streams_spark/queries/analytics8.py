"""Round-6 final wave: join-key skew summary and curriculum phase
assignment.

Reference basis: none.  Both follow the percentile-boundary pattern:
exact quantiles computed once over an aggregate, broadcast back, rows
bucket by comparison — never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.functions.textfns import STOPWORDS, sql_str_list, words, words_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_STOP_SQL = sql_str_list(STOPWORDS)


@register(
    "q_key_skew_stats",
    shape="bounded",
    tags=("skew", "data-quality", "join"),
    oracle=f"""
WITH k AS (
  SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY l_partkey
)
SELECT count(*) AS n_keys, sum(n)::BIGINT AS total_rows,
       max(n)::BIGINT AS max_group,
       {rnd_sql('percentile_cont(0.5) WITHIN GROUP (ORDER BY n)', 2)} AS p50_group,
       {rnd_sql('percentile_cont(0.99) WITHIN GROUP (ORDER BY n)', 2)} AS p99_group,
       {rnd_sql('max(n) * 100.0 / sum(n)', 6)} AS top1_share_pct,
       {rnd_sql('max(n) * 1.0 / (sum(n) * 1.0 / count(*))', 4)} AS max_over_mean
FROM k
""",
)
def q_key_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row skew summary for a prospective join/agg key (l_partkey):
    group-size percentiles, the biggest group's share, and the
    max-over-mean ratio — the number that decides between a plain
    shuffle, AQE skew handling, and manual salting (the summary
    companion to q_join_fanout_audit's top-key list; AQE's own trigger
    is ~max > 5× median).

    Scale shape: one key-count aggregate, then exact percentiles over
    the key-cardinality frame — no sort of the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    return k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("total_rows"),
        F.max("n").alias("max_group"),
        rnd(F.expr("percentile(n, 0.5)"), 2).alias("p50_group"),
        rnd(F.expr("percentile(n, 0.99)"), 2).alias("p99_group"),
        rnd(F.max("n") * 100.0 / F.sum("n"), 6).alias("top1_share_pct"),
        rnd(
            F.max("n") * 1.0 / (F.sum("n") * 1.0 / F.count(F.lit(1))), 4
        ).alias("max_over_mean"),
    )


@register(
    "mix_curriculum_phases",
    shape="bounded",
    tags=("mixing", "curriculum", "llm-pipeline"),
    oracle=f"""
WITH sig AS (
  SELECT doc_id, source,
         len({words_sql('text')}) AS n_words,
         len(list_filter({words_sql('text')}, x -> list_contains({_STOP_SQL}, x)))
           * 1.0 / greatest(len({words_sql('text')}), 1) AS stop_ratio
  FROM documents
), scored AS (
  SELECT doc_id, source, n_words,
         round(5e-10 + stop_ratio, 6) AS quality FROM sig
), b AS (
  SELECT quantile_cont(quality, [1.0/3, 2.0/3]) AS bounds FROM scored
), phased AS (
  SELECT s.*, 1 + len(list_filter(b.bounds, x -> x < s.quality)) AS phase
  FROM scored s CROSS JOIN b
)
SELECT phase, count(*) AS n_docs, sum(n_words)::BIGINT AS tokens,
       {rnd_sql('min(quality)', 6)} AS min_quality,
       {rnd_sql('max(quality)', 6)} AS max_quality,
       count(DISTINCT source) AS n_sources
FROM phased GROUP BY phase ORDER BY phase
""",
)
def mix_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum phase assignment: documents split into three phases by
    exact tertiles of a quality proxy (stopword ratio — higher reads as
    more natural prose), lowest-quality phase first — the
    easy-to-hard data ordering curriculum-training pipelines feed from.

    Scale shape: the tertile BOUNDARIES come from one exact-percentile
    aggregate (1-row broadcast); every document buckets by comparison —
    the same no-global-sort pattern as q_decile_lift, at any corpus
    size."""
    docs = load_table(spark, sf_dir, "documents")
    w = words("text")
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    sig = docs.select(
        "doc_id",
        "source",
        F.size(w).alias("n_words"),
        (
            F.size(F.filter(w, lambda x: F.array_contains(stops, x)))
            * 1.0
            / F.greatest(F.size(w), F.lit(1))
        ).alias("stop_ratio"),
    )
    scored = sig.select(
        "doc_id", "source", "n_words", rnd("stop_ratio", 6).alias("quality")
    )
    b = scored.agg(
        F.expr("percentile(quality, array(0.3333333333333333, 0.6666666666666666))").alias(
            "bounds"
        )
    )
    phased = scored.crossJoin(F.broadcast(b)).select(
        "n_words",
        "source",
        "quality",
        (1 + F.size(F.filter("bounds", lambda x: x < F.col("quality")))).alias(
            "phase"
        ),
    )
    return (
        phased.groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("tokens"),
            rnd(F.min("quality"), 6).alias("min_quality"),
            rnd(F.max("quality"), 6).alias("max_quality"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("phase")
    )
