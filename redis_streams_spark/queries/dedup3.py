"""Span-level duplication diagnostics and soft-dedup weighting over
``documents`` — the operators a training pipeline runs AFTER detection
to decide what to cut and how to weight what remains.

- text_dup_spans: window-level cross-doc duplication merged into maximal
  SPANS per document (the window-granular approximation of exact
  substring dedup, Lee et al. 2022 "Deduplicating Training Data Makes
  Language Models Better") via the gaps-and-islands pattern.
- mix_dedup_weighting: 1/cluster-size sampling weights (soft dedup —
  keep every copy but make each duplicate cluster count once).
- text_ngram_novelty: per-doc fraction of shingles FIRST seen in that
  doc over the doc_id order — the novelty curve that shows a corpus
  going stale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.functions.textfns import word_shingles_sql, words, words_sql
from redis_streams_spark.operators.dedup import exact_dedup, fanout
from redis_streams_spark.queries.dedup import _NORM_SQL
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_WIN = 8  # tokens per duplication window

_SPANS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {words_sql('text')} AS w FROM documents
), wins AS (
  SELECT doc_id, i AS pos, gram
  FROM (
    SELECT doc_id,
           unnest(range(1, len(w) - {_WIN - 2})) AS i,
           unnest(list_transform(range(1, len(w) - {_WIN - 2}),
                  i -> array_to_string(w[i:i + {_WIN - 1}], ' '))) AS gram
    FROM toks WHERE len(w) >= {_WIN}
  ) t
), dupgram AS (
  SELECT gram FROM wins GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), duppos AS (
  SELECT w.doc_id, w.pos FROM wins w JOIN dupgram d ON d.gram = w.gram
), marked AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {_WIN} THEN 0 ELSE 1 END AS is_break
  FROM duppos
), islands AS (
  SELECT doc_id, pos,
         sum(is_break) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS grp
  FROM marked
), spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + {_WIN - 1} AS e
  FROM islands GROUP BY doc_id, grp
), lens AS (
  SELECT doc_id, len(w) AS n_tokens FROM toks
)
SELECT s.doc_id,
       count(*) AS n_dup_spans,
       max(s.e - s.s + 1) AS longest_span_tokens,
       round(5e-10 + sum(s.e - s.s + 1) * 1.0 / any_value(l.n_tokens), 6)
         AS dup_token_fraction
FROM spans s JOIN lens l ON l.doc_id = s.doc_id
GROUP BY s.doc_id
ORDER BY s.doc_id
"""


@register("text_dup_spans", shape="per_row", tags=("dedup", "spans", "llm-pipeline"), oracle=_SPANS_ORACLE)
def text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated SPANS: every 8-token window appearing in
    ≥ 2 documents marks its positions; overlapping/adjacent positions
    merge into maximal spans (gaps-and-islands with a gap-aware break:
    consecutive dup windows join one span whenever their positions are
    within WIN of each other, so overlapping coverage never double-counts),
    reported per doc as span count, longest span, and
    the fraction of tokens covered — the cut-list for span-level dedup.

    Cross-engine note: windows join on the literal gram STRING so both
    engines share keys exactly; at 100 TB the gram would be h32-hashed
    first (64-bit keys, same shuffle shape) with a negligible collision
    rate — the string form keeps the oracle byte-exact.

    Scale shape: one window explode in the scan stage, one gram-keyed
    aggregation (map-side combined), one postings re-join, per-doc
    islands via a doc-partitioned window.

    Reference basis: none (published method)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = fanout(docs).select("doc_id", words("text").alias("w"))
    wins = (
        toks.where(F.size("w") >= _WIN)
        .select(
            "doc_id",
            F.size("w").alias("n_tokens"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - (_WIN - 1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.concat_ws(
                            " ", F.slice(F.col("w"), i, _WIN)
                        ).alias("gram"),
                    ),
                )
            ).alias("x"),
        )
        .select("doc_id", "n_tokens", F.col("x.pos").alias("pos"), F.col("x.gram").alias("gram"))
    )
    dupgram = (
        wins.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gram")
    )
    duppos = wins.join(dupgram, "gram").select("doc_id", "n_tokens", "pos")
    # island break when the gap to the previous dup window exceeds WIN:
    # windows at positions p1 < p2 cover overlapping-or-adjoining token
    # intervals iff p2 - p1 <= WIN, so only larger gaps start a new span.
    # (A first cut used pos - row_number consecutive-run grouping, which
    # splits overlapping windows at gaps 2..WIN-1 into overlapping
    # "spans" and double-counts their tokens — caught in review; the
    # oracle shared the flaw, so only a semantic test could see it.)
    wdoc = W.partitionBy("doc_id").orderBy("pos")
    marked = duppos.withColumn(
        "is_break",
        F.when(
            F.col("pos") - F.lag("pos").over(wdoc) <= _WIN, F.lit(0)
        ).otherwise(F.lit(1)),
    )
    islands = marked.withColumn(
        "grp",
        F.sum("is_break").over(wdoc.rowsBetween(W.unboundedPreceding, 0)),
    )
    spans = islands.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("s"),
        (F.max("pos") + (_WIN - 1)).alias("e"),
        F.first("n_tokens").alias("n_tokens"),
    )
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_dup_spans"),
            F.max(F.col("e") - F.col("s") + 1).alias("longest_span_tokens"),
            rnd(
                F.sum(F.col("e") - F.col("s") + 1)
                * 1.0
                / F.first("n_tokens"),
                6,
            ).alias("dup_token_fraction"),
        )
    )


_WEIGHT_ORACLE = f"""
WITH h AS (
  SELECT doc_id, md5({_NORM_SQL}) AS content_hash FROM documents
), g AS (
  SELECT content_hash, count(*) AS group_size FROM h GROUP BY content_hash
)
SELECT h.doc_id, g.group_size,
       round(5e-10 + 1.0 / g.group_size, 6) AS sample_weight
FROM h JOIN g ON g.content_hash = h.content_hash
ORDER BY h.doc_id
"""


@register(
    "mix_dedup_weighting",
    shape="per_row",
    tags=("mixing", "dedup", "llm-pipeline"),
    oracle=_WEIGHT_ORACLE,
)
def mix_dedup_weighting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup: every document keeps a sampling weight 1/|cluster|
    over its exact-dup cluster, so each distinct content counts once in
    expectation without dropping any copy (the downweight-don't-delete
    alternative when provenance diversity matters).

    Scale shape: one digest aggregation + one digest-keyed re-join —
    the same single-shuffle shape as dedup_exact.

    Reference basis: none."""
    docs = load_table(spark, sf_dir, "documents")
    # reuse the exact-dedup operator — one digest shuffle, same
    # normalization/hash as dedup_exact by construction
    return (
        exact_dedup(docs)
        .select(
            "doc_id",
            "group_size",
            rnd(F.lit(1.0) / F.col("group_size"), 6).alias("sample_weight"),
        )
    )


_NOVELTY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {words_sql('text')} AS w FROM documents
), sh AS (
  SELECT doc_id, unnest({word_shingles_sql('w', 3)}) AS g
  FROM toks
), firsts AS (
  SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g
)
SELECT sh.doc_id,
       count(*) AS n_shingles,
       round(5e-10 + avg(CASE WHEN f.first_doc = sh.doc_id
                              THEN 1.0 ELSE 0.0 END), 6) AS novelty_frac
FROM sh JOIN firsts f ON f.g = sh.g
GROUP BY sh.doc_id
ORDER BY sh.doc_id
"""


@register(
    "text_ngram_novelty",
    shape="per_row",
    tags=("text", "novelty", "llm-pipeline"),
    oracle=_NOVELTY_ORACLE,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shingle novelty: the fraction of a doc's distinct
    3-shingles whose FIRST appearance (by doc_id order) is that doc —
    the freshness curve of an accumulating corpus (falling novelty =
    crawl going stale / dup pressure building).

    Scale shape: one shingle-keyed min aggregation, one postings
    re-join, one per-doc aggregation — all equi-keyed.

    Reference basis: none."""
    from redis_streams_spark.operators.dedup import shingle_sets

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_sets(docs, 3).select(
        "doc_id", F.explode("shingles").alias("g")
    )
    firsts = sh.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(firsts, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            rnd(
                F.avg(
                    F.when(F.col("first_doc") == F.col("doc_id"), 1.0).otherwise(
                        0.0
                    )
                ),
                6,
            ).alias("novelty_frac"),
        )
    )
