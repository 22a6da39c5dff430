"""Round-7 lexical-diversity profiling: type-token ratio family.

Reference basis: none (LLM-data extension); TTR / root TTR / hapax rate
are the standard lexical-richness screens corpus-quality pipelines run
per source — templated or machine-generated text shows anomalously LOW
diversity, OCR noise anomalously HIGH hapax rates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.functions.textfns import words, words_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table


@register(
    "text_ttr",
    shape="bounded",
    tags=("text-quality", "llm-prep", "diversity"),
    oracle=f"""
WITH tok AS (
  SELECT source, unnest({words_sql('text')}) AS tok FROM documents
), c AS (
  SELECT source, tok, count(*)::BIGINT AS cnt FROM tok GROUP BY 1, 2
)
SELECT source,
       sum(cnt)::BIGINT AS n_tokens,
       count(*)::BIGINT AS n_types,
       sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
       {rnd_sql('count(*)::DOUBLE / sum(cnt)', 6)} AS ttr,
       {rnd_sql('count(*)::DOUBLE / sqrt(sum(cnt)::DOUBLE)', 4)} AS root_ttr,
       {rnd_sql('sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)::DOUBLE'
                ' / count(*)', 6)} AS hapax_rate
FROM c GROUP BY source ORDER BY source
""",
)
def text_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per source: type-token ratio, Guiraud's root
    TTR (length-compensated), and hapax-legomenon rate (share of types
    occurring exactly once) — the template/boilerplate detector that
    flags sources whose vocabulary is too small for their volume.

    Scale shape: explode tokens in the scan stage, aggregate by
    (source, token) so the shuffle carries one row per distinct pair
    (map-side partials collapse repeats), then a per-source rollup of
    the type frame — never a global distinct over raw tokens."""
    docs = load_table(spark, sf_dir, "documents")
    c = (
        docs.select("source", F.explode(words("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hapax = F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).cast("long")
    return (
        c.groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            hapax.alias("n_hapax"),
            rnd(F.count(F.lit(1)).cast("double") / F.sum("cnt"), 6).alias("ttr"),
            rnd(
                F.count(F.lit(1)).cast("double")
                / F.sqrt(F.sum("cnt").cast("double")),
                4,
            ).alias("root_ttr"),
            rnd(hapax.cast("double") / F.count(F.lit(1)), 6).alias("hapax_rate"),
        )
        .orderBy("source")
    )
