"""Round-8 LLM-text wave: BPE merge candidates, perplexity-filter
threshold curve, and Heaps'-law vocabulary growth.

Reference basis: none — training-data-pipeline extension surface
(SURVEY §2.2 last rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.functions.textfns import words, words_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_TOP_MERGES = 20
_PPL_THRESHOLDS = (-7.0, -6.5, -6.0, -5.5, -5.0)
_HEAPS_BUCKETS = 10


def _bpe_oracle() -> str:
    return f"""
WITH wf AS (
  SELECT tok, count(*) AS freq
  FROM (SELECT unnest({words_sql('text')}) AS tok FROM documents) t
  GROUP BY tok
), pairs AS (
  SELECT substr(tok, i, 1) AS left_sym, substr(tok, i + 1, 1) AS right_sym,
         freq
  FROM wf, (SELECT unnest(range(1, 40)) AS i) pos
  WHERE i < len(tok)
), merged AS (
  SELECT left_sym, right_sym, sum(freq)::BIGINT AS pair_count
  FROM pairs GROUP BY left_sym, right_sym
)
SELECT rank, left_sym, right_sym, pair_count
FROM (SELECT *, row_number() OVER (ORDER BY pair_count DESC,
                                   left_sym, right_sym) AS rank
      FROM merged) t
WHERE rank <= {_TOP_MERGES}
ORDER BY rank
"""


@register(
    "text_bpe_merge_candidates",
    shape="bounded",
    tags=("text", "tokenizer", "llm-pipeline"),
    oracle=_bpe_oracle(),
)
def text_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE training round: adjacent-character pair frequencies
    over the word-frequency table (each pair weighted by its word's
    corpus frequency), top-20 merge candidates — the inner loop of
    tokenizer training as one aggregation.  Scale shape: the word
    table is vocabulary-sized (collapsed map-side before the shuffle);
    the pair explode runs over the VOCABULARY, not the corpus, so a
    100 TB corpus costs the same as its distinct-word table.  Word
    length capped at 40 chars on both engines (range bound)."""
    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(words("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # split once to a char array, pair adjacent positions: i is the
    # 0-based LEFT char, right is substr(i+2) in 1-based substr terms
    chars = wf.select(
        "tok",
        "freq",
        F.posexplode(F.split(F.col("tok"), "(?!^)")).alias("i", "left_sym"),
    ).where(F.col("i") < F.least(F.length("tok") - 1, F.lit(39)))
    paired = chars.select(
        "freq",
        "left_sym",
        F.expr("substr(tok, i + 2, 1)").alias("right_sym"),
    )
    merged = paired.groupBy("left_sym", "right_sym").agg(
        F.sum("freq").alias("pair_count")
    )
    wr = W.orderBy(F.desc("pair_count"), "left_sym", "right_sym")
    return (
        merged.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= _TOP_MERGES)
        .select("rank", "left_sym", "right_sym", "pair_count")
        .orderBy("rank")
    )


_PPL_CORE = f"""
toks AS (
  SELECT doc_id, unnest({words_sql('text')}) AS tok FROM documents
), freq AS (
  SELECT tok, count(*) AS n FROM toks GROUP BY tok
), v AS (
  SELECT tok, n, sum(n) OVER () AS total FROM freq
), per_doc AS (
  SELECT t.doc_id, count(*) AS n_tokens,
         avg(ln(v.n * 1.0 / v.total)) AS lp
  FROM toks t JOIN v ON v.tok = t.tok
  GROUP BY t.doc_id
)"""


def _ppl_curve_oracle() -> str:
    ts = ", ".join(f"({t})" for t in _PPL_THRESHOLDS)
    return f"""
WITH {_PPL_CORE}
SELECT t.threshold::DOUBLE AS threshold,
       sum(CASE WHEN d.lp >= t.threshold THEN 1 ELSE 0 END)::BIGINT AS n_docs_kept,
       sum(CASE WHEN d.lp >= t.threshold THEN d.n_tokens ELSE 0 END)::BIGINT
         AS n_tokens_kept,
       {rnd_sql("sum(CASE WHEN d.lp >= t.threshold THEN 1 ELSE 0 END) * 1.0"
                " / count(*)", 6)} AS frac_docs_kept
FROM (VALUES {ts}) t(threshold)
CROSS JOIN per_doc d
GROUP BY t.threshold
ORDER BY t.threshold
"""


@register(
    "text_ppl_filter_curve",
    shape="bounded",
    tags=("text", "quality", "lm", "llm-pipeline"),
    oracle=_ppl_curve_oracle(),
)
def text_ppl_filter_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-filter tuning curve: documents/tokens retained at each
    unigram avg-logprob cutoff — the what-does-moving-the-knob-cost view
    for the perplexity gate (same design as dedup_threshold_curve: the
    expensive per-doc score computes ONCE; the curve is a 5-row
    broadcast threshold frame aggregated over it)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(words("text")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    v = freq.select("tok", "n", F.sum("n").over(W.partitionBy()).alias("total"))
    per_doc = (
        toks.join(v, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(F.log(F.col("n") * 1.0 / F.col("total"))).alias("lp"),
        )
    )
    th = docs.sparkSession.createDataFrame(
        [(t,) for t in _PPL_THRESHOLDS], "threshold DOUBLE"
    )
    kept = F.when(F.col("lp") >= F.col("threshold"), 1).otherwise(0)
    return (
        per_doc.crossJoin(F.broadcast(th))
        .groupBy("threshold")
        .agg(
            F.sum(kept).alias("n_docs_kept"),
            F.sum(
                F.when(F.col("lp") >= F.col("threshold"), F.col("n_tokens")).otherwise(
                    0
                )
            ).alias("n_tokens_kept"),
            rnd(F.sum(kept) * 1.0 / F.count(F.lit(1)), 6).alias("frac_docs_kept"),
        )
        .orderBy("threshold")
    )


def _heaps_oracle() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({words_sql('text')}) AS tok FROM documents
), nd AS (SELECT max(doc_id) + 1 AS n_docs FROM documents),
bucketed AS (
  SELECT (t.doc_id * {_HEAPS_BUCKETS}) // nd.n_docs AS bucket, t.tok
  FROM toks t CROSS JOIN nd
), firsts AS (
  SELECT tok, min(bucket) AS first_bucket FROM bucketed GROUP BY tok
), per_bucket AS (
  SELECT b.bucket,
         count(*) AS n_tokens,
         (SELECT count(*) FROM firsts f WHERE f.first_bucket = b.bucket)
           AS new_vocab
  FROM bucketed b GROUP BY b.bucket
)
SELECT bucket,
       sum(n_tokens) OVER (ORDER BY bucket)::BIGINT AS cum_tokens,
       sum(new_vocab) OVER (ORDER BY bucket)::BIGINT AS cum_vocab,
       {rnd_sql("ln(sum(new_vocab) OVER (ORDER BY bucket))"
                " / ln(sum(n_tokens) OVER (ORDER BY bucket))", 6)}
         AS heaps_beta
FROM per_bucket
ORDER BY bucket
"""


@register(
    "text_heaps_law",
    shape="bounded",
    tags=("text", "vocabulary", "llm-pipeline"),
    oracle=_heaps_oracle(),
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: cumulative distinct vocabulary vs
    cumulative token count over 10 equal doc-id slices of the corpus,
    plus the implied beta = ln V / ln N per prefix — the curve that
    predicts tokenizer vocab coverage as a corpus grows.  Token first
    occurrence is a (token → min bucket) aggregate, so no per-doc
    sequential scan exists; the cumulative window runs over 10 rows."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg((F.max("doc_id") + 1).alias("n_docs"))
    toks = docs.select("doc_id", F.explode(words("text")).alias("tok"))
    bucketed = toks.crossJoin(F.broadcast(n_docs)).select(
        ((F.col("doc_id") * _HEAPS_BUCKETS) / F.col("n_docs"))
        .cast("long")
        .alias("bucket"),
        "tok",
    )
    firsts = bucketed.groupBy("tok").agg(F.min("bucket").alias("first_bucket"))
    new_vocab = firsts.groupBy(F.col("first_bucket").alias("bucket")).agg(
        F.count(F.lit(1)).alias("new_vocab")
    )
    n_tokens = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    wc = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    return (
        # LEFT join: a bucket that introduces zero new vocabulary (every
        # token already seen — the steady state of a templated corpus)
        # must still emit its row
        n_tokens.join(new_vocab, "bucket", "left")
        .select(
            "bucket",
            F.sum("n_tokens").over(wc).alias("cum_tokens"),
            F.sum(F.coalesce("new_vocab", F.lit(0))).over(wc).alias("cum_vocab"),
        )
        .select(
            "bucket",
            "cum_tokens",
            "cum_vocab",
            rnd(F.log("cum_vocab") / F.log("cum_tokens"), 6).alias("heaps_beta"),
        )
        .orderBy("bucket")
    )
