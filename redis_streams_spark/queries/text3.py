"""Gopher-style document quality-filter rules over ``documents``.

The rule battery follows the published Gopher data-curation filters
(Rae et al. 2021, "Scaling Language Models: ... Gopher", §A1.1) and the
C4 line-level heuristics: word-count bounds, mean-word-length bounds,
symbol-to-word ratio, bullet-/ellipsis-line fractions, alphabetic-word
fraction, and a required-stopword count.  This is the keep/drop gate a
training-data pipeline runs FIRST at 100 TB — every signal is a per-row
JVM expression (no shuffle, no Python), so the gate runs at scan
bandwidth and the decision columns push down to later stages.

Thresholds are compared on RAW double ratios (identical IEEE arithmetic
on both engines — quotients of the same ints), while the REPORTED signal
columns are rounded through the shared rnd() pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.functions.textfns import words, words_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

# Gopher's required-stopword list (the paper's "must contain >= 2 of")
GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# rule battery: (name, min, max) over the signal columns computed below
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WLEN, MAX_MEAN_WLEN = 3.0, 10.0
MAX_SYMBOL_RATIO = 0.1
MAX_BULLET_FRAC = 0.9
MAX_ELLIPSIS_FRAC = 0.3
MIN_ALPHA_FRAC = 0.8
MIN_STOP_HITS = 2

_ELLIPSIS_RE = r"\.\.\.|…"
_BULLET_CHARS = ("-", "*", "•")

_STOP_LIST_SQL = "[" + ", ".join(f"'{s}'" for s in GOPHER_STOPS) + "]"

_ORACLE_SIGNALS = f"""
base AS (
  SELECT doc_id,
         {words_sql('text')} AS w,
         string_split(text, chr(10)) AS lines,
         len(regexp_extract_all(text, '#'))
           + len(regexp_extract_all(text, '{_ELLIPSIS_RE}')) AS n_symbols
  FROM documents
),
sig AS (
  SELECT doc_id,
         len(w)::BIGINT AS n_words,
         CASE WHEN len(w) > 0
              THEN length(list_aggregate(w, 'string_agg', '')) * 1.0 / len(w)
              ELSE 0.0 END AS mean_wlen_raw,
         n_symbols * 1.0 / greatest(len(w), 1) AS symbol_ratio_raw,
         len(list_filter(lines, x -> left(ltrim(x), 1) IN ('-', '*', '•')))
           * 1.0 / greatest(len(lines), 1) AS bullet_frac_raw,
         len(list_filter(lines, x -> rtrim(x) LIKE '%...'
                                      OR rtrim(x) LIKE '%…'))
           * 1.0 / greatest(len(lines), 1) AS ellipsis_frac_raw,
         CASE WHEN len(w) > 0
              THEN len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
                   * 1.0 / len(w)
              ELSE 0.0 END AS alpha_frac_raw,
         len(list_filter({_STOP_LIST_SQL}, s -> list_contains(w, s)))::BIGINT
           AS stop_hits
  FROM base
),
flags AS (
  SELECT *,
         (n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}) AS ok_words,
         (mean_wlen_raw BETWEEN {MIN_MEAN_WLEN} AND {MAX_MEAN_WLEN}) AS ok_wlen,
         (symbol_ratio_raw <= {MAX_SYMBOL_RATIO}) AS ok_symbols,
         (bullet_frac_raw <= {MAX_BULLET_FRAC}) AS ok_bullets,
         (ellipsis_frac_raw <= {MAX_ELLIPSIS_FRAC}) AS ok_ellipsis,
         (alpha_frac_raw >= {MIN_ALPHA_FRAC}) AS ok_alpha,
         (stop_hits >= {MIN_STOP_HITS}) AS ok_stops
  FROM sig
)"""

_VIOLATION_SQL = """concat_ws(',',
  CASE WHEN NOT ok_words THEN 'word_count' END,
  CASE WHEN NOT ok_wlen THEN 'mean_word_len' END,
  CASE WHEN NOT ok_symbols THEN 'symbol_ratio' END,
  CASE WHEN NOT ok_bullets THEN 'bullet_lines' END,
  CASE WHEN NOT ok_ellipsis THEN 'ellipsis_lines' END,
  CASE WHEN NOT ok_alpha THEN 'alpha_words' END,
  CASE WHEN NOT ok_stops THEN 'stopword_hits' END)"""

_N_VIOLATIONS_SQL = """
 (CASE WHEN ok_words THEN 0 ELSE 1 END + CASE WHEN ok_wlen THEN 0 ELSE 1 END
  + CASE WHEN ok_symbols THEN 0 ELSE 1 END
  + CASE WHEN ok_bullets THEN 0 ELSE 1 END
  + CASE WHEN ok_ellipsis THEN 0 ELSE 1 END
  + CASE WHEN ok_alpha THEN 0 ELSE 1 END
  + CASE WHEN ok_stops THEN 0 ELSE 1 END)::BIGINT"""


def _signals(docs: DataFrame) -> DataFrame:
    """Per-doc raw signals + rule booleans, all scan-stage expressions.
    Two-stage shape like text_stats: integer counts once (Catalyst does
    not CSE interpreted HOF lambdas), ratio arithmetic over plain ints."""
    base = docs.select(
        "doc_id",
        words("text").alias("w"),
        F.split("text", "\n").alias("lines"),
        (
            F.regexp_count("text", F.lit("#"))
            + F.regexp_count("text", F.lit(_ELLIPSIS_RE))
        ).alias("n_symbols"),
    )
    counts = base.select(
        "doc_id",
        F.size("w").alias("n_words_i"),
        F.length(F.array_join("w", "")).alias("word_chars"),
        "n_symbols",
        F.size("lines").alias("n_lines"),
        F.size(
            F.filter(
                F.col("lines"),
                lambda x: F.substring(F.ltrim(x), 1, 1).isin(*_BULLET_CHARS),
            )
        ).alias("n_bullet"),
        F.size(
            F.filter(
                F.col("lines"),
                lambda x: F.rtrim(x).endswith("...") | F.rtrim(x).endswith("…"),
            )
        ).alias("n_ellipsis"),
        F.size(F.filter(F.col("w"), lambda x: x.rlike("[a-z]"))).alias("n_alpha"),
        F.size(
            F.filter(
                F.array(*[F.lit(s) for s in GOPHER_STOPS]),
                lambda s: F.array_contains(F.col("w"), s),
            )
        )
        .cast("long")
        .alias("stop_hits"),
    )
    nw = F.col("n_words_i")
    mean_wlen = F.when(nw > 0, F.col("word_chars") * 1.0 / nw).otherwise(0.0)
    symbol_ratio = F.col("n_symbols") * 1.0 / F.greatest(nw, F.lit(1))
    bullet_frac = F.col("n_bullet") * 1.0 / F.greatest(F.col("n_lines"), F.lit(1))
    ellipsis_frac = F.col("n_ellipsis") * 1.0 / F.greatest(F.col("n_lines"), F.lit(1))
    alpha_frac = F.when(nw > 0, F.col("n_alpha") * 1.0 / nw).otherwise(0.0)
    return counts.select(
        "doc_id",
        nw.cast("long").alias("n_words"),
        mean_wlen.alias("mean_wlen_raw"),
        symbol_ratio.alias("symbol_ratio_raw"),
        bullet_frac.alias("bullet_frac_raw"),
        ellipsis_frac.alias("ellipsis_frac_raw"),
        alpha_frac.alias("alpha_frac_raw"),
        "stop_hits",
        nw.between(MIN_WORDS, MAX_WORDS).alias("ok_words"),
        mean_wlen.between(MIN_MEAN_WLEN, MAX_MEAN_WLEN).alias("ok_wlen"),
        (symbol_ratio <= MAX_SYMBOL_RATIO).alias("ok_symbols"),
        (bullet_frac <= MAX_BULLET_FRAC).alias("ok_bullets"),
        (ellipsis_frac <= MAX_ELLIPSIS_FRAC).alias("ok_ellipsis"),
        (alpha_frac >= MIN_ALPHA_FRAC).alias("ok_alpha"),
        (F.col("stop_hits") >= MIN_STOP_HITS).alias("ok_stops"),
    )


_OK_COLS = (
    "ok_words",
    "ok_wlen",
    "ok_symbols",
    "ok_bullets",
    "ok_ellipsis",
    "ok_alpha",
    "ok_stops",
)

_RULE_NAMES = {
    "ok_words": "word_count",
    "ok_wlen": "mean_word_len",
    "ok_symbols": "symbol_ratio",
    "ok_bullets": "bullet_lines",
    "ok_ellipsis": "ellipsis_lines",
    "ok_alpha": "alpha_words",
    "ok_stops": "stopword_hits",
}


@register(
    "text_gopher_rules",
    shape="per_row",
    tags=("text", "quality", "llm-pipeline"),
    oracle=f"""
WITH {_ORACLE_SIGNALS}
SELECT doc_id, n_words,
       round(5e-10 + mean_wlen_raw, 4) AS mean_word_len,
       round(5e-10 + symbol_ratio_raw, 6) AS symbol_ratio,
       round(5e-10 + bullet_frac_raw, 6) AS bullet_frac,
       round(5e-10 + ellipsis_frac_raw, 6) AS ellipsis_frac,
       round(5e-10 + alpha_frac_raw, 6) AS alpha_frac,
       stop_hits,
       {_N_VIOLATIONS_SQL} AS n_violations,
       ({_N_VIOLATIONS_SQL} = 0) AS keep,
       {_VIOLATION_SQL} AS violations
FROM flags
ORDER BY doc_id
""",
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document quality gate (Rae et al. 2021 §A1.1):
    word-count and mean-word-length bounds, symbol-to-word ratio,
    bullet-/ellipsis-line fractions, alphabetic-word fraction, and the
    required-stopword count — plus the keep/drop verdict and the named
    violation list.  100 TB posture: every signal and the verdict are
    scan-stage row expressions (zero shuffles besides the presentation
    sort), so the gate is free relative to the scan it shares with
    whatever runs next."""
    docs = load_table(spark, sf_dir, "documents")
    sig = _signals(docs)
    n_viol = sum(
        (F.when(F.col(c), 0).otherwise(1) for c in _OK_COLS), F.lit(0)
    ).cast("long")
    violations = F.concat_ws(
        ",",
        *[
            F.when(~F.col(c), F.lit(_RULE_NAMES[c])).otherwise(F.lit(None))
            for c in _OK_COLS
        ],
    )
    return sig.select(
        "doc_id",
        "n_words",
        rnd(F.col("mean_wlen_raw"), 4).alias("mean_word_len"),
        rnd(F.col("symbol_ratio_raw"), 6).alias("symbol_ratio"),
        rnd(F.col("bullet_frac_raw"), 6).alias("bullet_frac"),
        rnd(F.col("ellipsis_frac_raw"), 6).alias("ellipsis_frac"),
        rnd(F.col("alpha_frac_raw"), 6).alias("alpha_frac"),
        "stop_hits",
        n_viol.alias("n_violations"),
        (n_viol == 0).alias("keep"),
        violations.alias("violations"),
    )


@register(
    "text_gopher_report",
    shape="bounded",
    tags=("text", "quality", "llm-pipeline"),
    oracle=f"""
WITH {_ORACLE_SIGNALS}
SELECT count(*) AS n_docs,
       sum(CASE WHEN {_N_VIOLATIONS_SQL} = 0 THEN 1 ELSE 0 END)::BIGINT
         AS n_keep,
       round(5e-10 + sum(CASE WHEN {_N_VIOLATIONS_SQL} = 0 THEN 1 ELSE 0 END)
             * 1.0 / count(*), 6) AS keep_rate,
       sum(CASE WHEN ok_words THEN 0 ELSE 1 END)::BIGINT AS v_word_count,
       sum(CASE WHEN ok_wlen THEN 0 ELSE 1 END)::BIGINT AS v_mean_word_len,
       sum(CASE WHEN ok_symbols THEN 0 ELSE 1 END)::BIGINT AS v_symbol_ratio,
       sum(CASE WHEN ok_bullets THEN 0 ELSE 1 END)::BIGINT AS v_bullet_lines,
       sum(CASE WHEN ok_ellipsis THEN 0 ELSE 1 END)::BIGINT AS v_ellipsis_lines,
       sum(CASE WHEN ok_alpha THEN 0 ELSE 1 END)::BIGINT AS v_alpha_words,
       sum(CASE WHEN ok_stops THEN 0 ELSE 1 END)::BIGINT AS v_stopword_hits
FROM flags
""",
)
def text_gopher_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level roll-up of the Gopher gate: total keep rate plus the
    per-rule violation census — the tuning dashboard you check before
    committing a 100 TB filter sweep (one partial-aggregated reduction to
    a single row; the signal expressions stay in the scan stage)."""
    docs = load_table(spark, sf_dir, "documents")
    sig = _signals(docs)
    n_viol = sum(
        (F.when(F.col(c), 0).otherwise(1) for c in _OK_COLS), F.lit(0)
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(n_viol == 0, 1).otherwise(0)).cast("long").alias("n_keep"),
        rnd(
            F.sum(F.when(n_viol == 0, 1).otherwise(0)) * 1.0 / F.count(F.lit(1)), 6
        ).alias("keep_rate"),
    ]
    for c in _OK_COLS:
        aggs.append(
            F.sum(F.when(F.col(c), 0).otherwise(1))
            .cast("long")
            .alias(f"v_{_RULE_NAMES[c]}")
        )
    return sig.agg(*aggs)


_BIGRAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {words_sql('text')} AS w FROM documents
), big AS (
  SELECT doc_id,
         unnest(w[1:len(w) - 1]) AS w1,
         unnest(w[2:len(w)]) AS w2
  FROM toks WHERE len(w) >= 2
), cnt AS (
  SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2
), uni AS (
  SELECT w1, count(*) AS c1 FROM big GROUP BY w1
), v AS (
  SELECT count(DISTINCT w2)::DOUBLE AS v FROM big
)
SELECT b.doc_id,
       count(*) AS n_bigrams,
       round(5e-10 + avg(ln((c.c12 + 1.0) / (u.c1 + v.v))), 6) AS avg_logprob
FROM big b
JOIN cnt c ON c.w1 = b.w1 AND c.w2 = b.w2
JOIN uni u ON u.w1 = b.w1
CROSS JOIN v
GROUP BY b.doc_id
ORDER BY b.doc_id
"""


@register(
    "text_bigram_lm",
    shape="per_row",
    tags=("text", "quality", "lm", "llm-pipeline"),
    oracle=_BIGRAM_ORACLE,
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality signal: per-document average log P(w₂|w₁) under
    the corpus bigram model with add-one smoothing — the next step up
    from text_unigram_lm's context-free score; documents whose word
    ORDER is unusual (shuffled/generated text) score low here even when
    their unigram mix is normal.

    Scale shape: bigram postings explode in the scan stage; counts are
    two keyed aggregations (bigram key, unigram key); scoring re-joins
    postings to the count tables on their natural keys (at 100 TB the
    count tables are vocabulary²-bounded and heavily skew-cut by the
    Zipf head — the join keys are the distribution keys); the smoothing
    vocabulary V is a 1-row broadcast scalar.

    Reference basis: none."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", words("text").alias("w"))
    big = (
        toks.where(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr("transform(sequence(1, size(w) - 1), i -> struct(w[i-1] as w1, w[i] as w2))")
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    cnt = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = big.agg(F.countDistinct("w2").cast("double").alias("v"))
    return (
        big.join(cnt, ["w1", "w2"])
        .join(uni, ["w1"])
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            rnd(
                F.avg(F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("v")))), 6
            ).alias("avg_logprob"),
        )
    )
