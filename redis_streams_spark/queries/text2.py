"""Information-theoretic text diagnostics over ``documents`` (north-star
LLM-prep extensions, continuing queries/text.py): per-document token
entropy and corpus Zipf fit — the standard signals for detecting
degenerate/templated text and tokenizer-hostile corpora.

Shares the exact tokenizer with text.py (functions.textfns.words /
words_sql) so every number is engine-agnostic deterministic arithmetic
with a full-value DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.functions.textfns import words, words_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table


@register(
    "text_entropy",
    shape="per_row",
    tags=("text", "entropy"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({words_sql('text')}) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, count(*)::DOUBLE AS c FROM toks GROUP BY 1, 2
), d AS (
  SELECT doc_id, sum(c) AS n, count(*) AS nd,
         sum(c * log2(c)) AS sclogc
  FROM tf GROUP BY doc_id
)
SELECT doc_id, n::BIGINT AS n_tokens, nd::BIGINT AS n_distinct,
       round(5e-10 + (log2(n) - sclogc / n), 4) AS entropy_bits,
       CASE WHEN nd > 1
            THEN round(5e-10 + (log2(n) - sclogc / n) / log2(nd::DOUBLE), 4)
            ELSE 0.0 END AS norm_entropy
FROM d ORDER BY doc_id
""",
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (bits),
    plus entropy normalized by log2(vocabulary) — near-0 flags
    degenerate repetition, near-1 flags natural usage.  Uses the
    algebraic form H = log2(n) − Σc·log2(c)/n so both engines sum the
    SAME per-token terms (no per-row division before the aggregate).

    Scale shape: explode → (doc, token) count → per-doc agg; both
    aggregations partial-combine map-side and shuffle only (doc, token)
    counts, never token text per occurrence."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(words("text")).alias("tok"))
    tf = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    d = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("nd"),
        F.sum(F.col("c") * F.log2("c")).alias("sclogc"),
    )
    h = F.log2("n") - F.col("sclogc") / F.col("n")
    return d.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("nd").cast("long").alias("n_distinct"),
        rnd(h, 4).alias("entropy_bits"),
        F.when(F.col("nd") > 1, rnd(h / F.log2(F.col("nd").cast("double")), 4))
        .otherwise(0.0)
        .alias("norm_entropy"),
    )


_ZIPF_TOP = 100


@register(
    "text_zipf",
    shape="bounded",
    tags=("text", "zipf"),
    oracle=f"""
WITH toks AS (
  SELECT unnest({words_sql('text')}) AS tok FROM documents
), freq AS (
  SELECT tok, count(*)::DOUBLE AS f FROM toks GROUP BY tok
), ranked AS (
  SELECT tok, f, row_number() OVER (ORDER BY f DESC, tok) AS r FROM freq
)
SELECT count(*) AS n_top,
       round(5e-10 + regr_slope(ln(f), ln(r::DOUBLE)), 4) AS zipf_slope,
       round(5e-10 + regr_r2(ln(f), ln(r::DOUBLE)), 4) AS fit_r2,
       round(5e-10 + min(f), 1) AS min_freq,
       round(5e-10 + max(f), 1) AS max_freq
FROM ranked WHERE r <= {_ZIPF_TOP}
""",
)
def text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus Zipf diagnostic: OLS slope and R² of ln(frequency) vs
    ln(rank) over the top-100 tokens (rank ties broken by token text so
    the cut is deterministic).  Natural corpora fit slope ≈ −1 with high
    R²; templated/synthetic text departs visibly.

    Scale shape: the token count partial-aggregates map-side; the
    top-100 cut is `orderBy().limit()` so Catalyst plans a distributed
    TakeOrderedAndProject (per-partition partial top-k, NO
    single-partition sort of the vocabulary); the rank window then runs
    over exactly 100 rows."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(words("text")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("f"))
    top = freq.orderBy(F.desc("f"), "tok").limit(_ZIPF_TOP)
    ranked = top.select(
        "f",
        F.row_number().over(W.orderBy(F.desc("f"), "tok")).alias("r"),
    )
    lnf, lnr = F.log("f"), F.log(F.col("r").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_top"),
        rnd(F.regr_slope(lnf, lnr), 4).alias("zipf_slope"),
        rnd(F.regr_r2(lnf, lnr), 4).alias("fit_r2"),
        rnd(F.min("f"), 1).alias("min_freq"),
        rnd(F.max("f"), 1).alias("max_freq"),
    )
