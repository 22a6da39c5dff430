"""Round-9 text wave: sentence segmentation statistics.

Reference basis: none — training-data-pipeline extension surface
(SURVEY §2.2 last rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_SENT_RE = "[.!?]+"


@register(
    "text_sentence_stats",
    shape="per_row",
    tags=("text", "quality", "llm-pipeline"),
    oracle=f"""
WITH sents AS (
  SELECT doc_id,
         list_transform(
           list_filter(regexp_split_to_array(text, '{_SENT_RE}'),
                       s -> length(trim(s)) > 0),
           s -> length(trim(s))) AS lens
  FROM documents
)
SELECT doc_id,
       len(lens)::BIGINT AS n_sentences,
       CASE WHEN len(lens) > 0 THEN
         {rnd_sql('list_sum(lens) * 1.0 / len(lens)', 4)} END
         AS avg_sentence_chars,
       CASE WHEN len(lens) > 0 THEN list_max(lens)::BIGINT END
         AS max_sentence_chars
FROM sents
ORDER BY doc_id
""",
)
def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation profile per document: count, mean and max
    sentence length (chars, after trimming) splitting on terminal
    punctuation runs — the granularity quality filters use for
    "wall-of-text" and "fragment spam" rules that document-level stats
    miss.  Pure scan-stage HOF expressions (split → filter → transform →
    aggregate), no explode, no shuffle, no Python; per-doc output with
    no presentation sort (r09 discipline)."""
    docs = load_table(spark, sf_dir, "documents")
    lens = F.transform(
        F.filter(
            F.split(F.col("text"), _SENT_RE),
            lambda s: F.length(F.trim(s)) > 0,
        ),
        lambda s: F.length(F.trim(s)).cast("long"),
    )
    d = docs.select("doc_id", lens.alias("lens"))
    n = F.size("lens")
    total = F.aggregate(
        "lens", F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return d.select(
        "doc_id",
        n.cast("long").alias("n_sentences"),
        F.when(n > 0, rnd(total * 1.0 / n, 4)).alias("avg_sentence_chars"),
        F.when(n > 0, F.array_max("lens")).alias("max_sentence_chars"),
    )
