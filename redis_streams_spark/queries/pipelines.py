"""Composed training-data pipeline: quality filter → exact dedup →
deterministic sample, as ONE declarative DataFrame chain.

This is the end-to-end shape the north-star extensions exist for
(BASELINE.json): the individual operators (text quality, content-hash
dedup, hash sampling) are each oracle-verified on their own; these
queries verify their COMPOSITION — Catalyst fuses the whole chain, so
the corpus is scanned once, the only shuffle is the dedup window on the
32-byte content hash, and the sample predicate costs one md5 per
surviving row.  At 100 TB every stage is embarrassingly parallel except
that single digest-keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.hashing import h32, h32_sql
from redis_streams_spark.functions.textfns import PUNCT_RE, words, words_sql
from redis_streams_spark.operators.dedup import normalized_text
from redis_streams_spark.queries.base import register
from redis_streams_spark.queries.dedup import _NORM_SQL
from redis_streams_spark.session import load_table

MIN_WORDS = 20
MAX_PUNCT_RATIO = 0.1
SAMPLE_PCT = 30  # keep h32(doc_id) % 100 < 30

_STAGES_SQL = f"""
WITH base AS (
  SELECT doc_id, lang,
         len({words_sql('text')})::BIGINT AS n_words,
         len(regexp_extract_all(text, '{PUNCT_RE}')) * 1.0
           / greatest(length(text), 1) AS punct_ratio,
         md5({_NORM_SQL}) AS content_hash
  FROM documents
), quality AS (
  SELECT * FROM base
  WHERE n_words >= {MIN_WORDS} AND punct_ratio <= {MAX_PUNCT_RATIO}
), canon AS (
  SELECT *, row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
  FROM quality
), deduped AS (
  SELECT * FROM canon WHERE rn = 1
), sampled AS (
  SELECT * FROM deduped
  WHERE {h32_sql('doc_id::VARCHAR')} % 100 < {SAMPLE_PCT}
)
"""


def _cleaned(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        words("text").alias("w"),
        (
            F.regexp_count("text", F.lit(PUNCT_RE))
            * 1.0
            / F.greatest(F.length("text"), F.lit(1))
        ).alias("punct_ratio"),
        F.md5(normalized_text()).alias("content_hash"),
    ).select(
        "doc_id",
        "lang",
        F.size("w").cast("long").alias("n_words"),
        "punct_ratio",
        "content_hash",
    )
    quality = base.where(
        (F.col("n_words") >= MIN_WORDS) & (F.col("punct_ratio") <= MAX_PUNCT_RATIO)
    )
    rn = F.row_number().over(W.partitionBy("content_hash").orderBy("doc_id"))
    deduped = quality.withColumn("rn", rn).where(F.col("rn") == 1)
    return deduped.where(h32(F.col("doc_id").cast("string")) % 100 < SAMPLE_PCT)


@register(
    "pipeline_corpus_clean",
    shape="per_row",
    tags=("pipeline", "dedup", "quality", "sampling"),
    oracle=_STAGES_SQL
    + """
SELECT doc_id, lang, n_words, content_hash
FROM sampled
ORDER BY doc_id
""",
)
def pipeline_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surviving corpus after quality filter (≥20 words, ≤10%
    punctuation) → exact dedup (canonical = min doc_id per content hash)
    → deterministic 30% hash sample.  One scan, one digest-keyed
    shuffle; the sample is reproducible across engines and runs
    (h32(doc_id) % 100), so downstream tables sampled on the same key
    stay joinable."""
    return _cleaned(spark, sf_dir).select(
        "doc_id", "lang", "n_words", "content_hash"
    )


@register(
    "pipeline_corpus_stats",
    shape="bounded",
    tags=("pipeline", "stats"),
    oracle=_STAGES_SQL
    + """
SELECT (SELECT count(*) FROM base)    AS n_total,
       (SELECT count(*) FROM quality) AS n_quality,
       (SELECT count(*) FROM deduped) AS n_deduped,
       (SELECT count(*) FROM sampled) AS n_sampled
""",
)
def pipeline_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-attrition report for the cleaning pipeline: how many
    documents survive each stage.  Spark computes all four counts in one
    pass with conditional aggregation over stage flags (no four separate
    jobs): each row carries booleans for the stages it survives."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        words("text").alias("w"),
        (
            F.regexp_count("text", F.lit(PUNCT_RE))
            * 1.0
            / F.greatest(F.length("text"), F.lit(1))
        ).alias("punct_ratio"),
        F.md5(normalized_text()).alias("content_hash"),
    ).select(
        "doc_id",
        F.size("w").cast("long").alias("n_words"),
        "punct_ratio",
        "content_hash",
    )
    passes_q = (F.col("n_words") >= MIN_WORDS) & (
        F.col("punct_ratio") <= MAX_PUNCT_RATIO
    )
    rn = F.row_number().over(W.partitionBy("content_hash").orderBy("doc_id"))
    flags = (
        base.withColumn("q", passes_q)
        # rank only among quality survivors: non-survivors get rn=null via
        # a partition trick — simpler: filter-stage counts from flags
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("content_hash", "q").orderBy("doc_id")
            ),
        )
        .withColumn("d", F.col("q") & (F.col("rn") == 1))
        .withColumn(
            "s",
            F.col("d") & (h32(F.col("doc_id").cast("string")) % 100 < SAMPLE_PCT),
        )
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("q").cast("long")).alias("n_quality"),
        F.sum(F.col("d").cast("long")).alias("n_deduped"),
        F.sum(F.col("s").cast("long")).alias("n_sampled"),
    )
