"""Text-analysis operators over ``documents`` (north-star extensions:
language-ID, quality scoring, token counting, fingerprinting — SURVEY §2.2
last row).  All computations are engine-agnostic deterministic arithmetic
so every query has a full-value DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.hashing import h32, h32_sql
from redis_streams_spark.functions.textfns import (
    BPE_RE,
    LANG_LEXICONS,
    PUNCT_RE,
    STOPWORDS,
    sql_str_list,
    word_shingles_sql,
    words,
    words_sql,
)
from redis_streams_spark.operators.dedup import shingle_sets
from redis_streams_spark.operators.prefix import top_k_by_freq
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table
from redis_streams_spark.functions.rounding import rnd, rnd_sql

_FP_TOKEN_MOD = 1_000_003
_FP_PRIME = 1_000_000_007


@register(
    "text_stats",
    shape="per_row",
    tags=("text", "quality"),
    bench=True,
    oracle=f"""
WITH toks AS (
  SELECT doc_id, text, {words_sql('text')} AS w FROM documents
)
SELECT doc_id,
       length(text) AS n_chars,
       len(w)::BIGINT AS n_words,
       len(regexp_extract_all(lower(text), '{BPE_RE}'))::BIGINT AS n_tokens_bpe,
       CASE WHEN len(w) > 0
            THEN round(5e-10 + list_aggregate(list_transform(w, x -> len(x)), 'sum')
                       * 1.0 / len(w), 4)
            ELSE 0.0 END AS avg_word_len,
       round(5e-10 + len(regexp_extract_all(text, '{PUNCT_RE}')) * 1.0
             / greatest(length(text), 1), 6) AS punct_ratio,
       CASE WHEN len(w) > 0
            THEN round(5e-10 + len(list_filter(w, x -> list_contains({sql_str_list(STOPWORDS)}, x)))
                       * 1.0 / len(w), 6)
            ELSE 0.0 END AS stopword_ratio,
       round(5e-10 + 1.0 / (1.0 + exp(-(
            0.2 * ln(1 + len(w))
            + 2.0 * (CASE WHEN len(w) > 0
                     THEN len(list_filter(w, x -> list_contains({sql_str_list(STOPWORDS)}, x)))
                          * 1.0 / len(w) ELSE 0.0 END)
            - 5.0 * (len(regexp_extract_all(text, '{PUNCT_RE}')) * 1.0
                     / greatest(length(text), 1))))), 6) AS quality_score
FROM toks
ORDER BY doc_id
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality statistics: char/word/BPE-ish token counts,
    punctuation + stopword ratios, and a logistic quality score.  All
    JVM-side built-ins (no Python UDF): higher-order array functions over
    the token array — embarrassingly parallel per row at any scale."""
    from redis_streams_spark.operators.dedup import fanout

    docs = load_table(spark, sf_dir, "documents")
    # Two-stage shape: one projection computes each expensive expression
    # EXACTLY ONCE as an integer count (the interpreted stopword-filter
    # HOF and the punct regex each fed two output columns before —
    # Catalyst does not CSE interpreted lambdas), then the ratio/score
    # arithmetic runs over plain ints inside whole-stage codegen.  The
    # word-char sum is length(array_join(w)) — a codegen built-in with
    # the same value as the aggregate() fold it replaces.
    # fanout (r13): the sf bench inputs are single-row-group files, so
    # without it the whole regex/HOF pipeline ran on ONE core (the plan
    # had zero exchanges); the conditional repartition spreads it and is
    # a no-op on any input that already has >= cluster-core splits.
    base = fanout(docs).select("doc_id", "text", words("text").alias("w"))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    counts = base.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.size("w").alias("n_words_i"),
        F.regexp_count(F.lower("text"), F.lit(BPE_RE)).cast("long").alias("n_tokens_bpe"),
        F.length(F.array_join("w", "")).alias("word_chars"),
        F.size(
            F.filter(F.col("w"), lambda x: F.array_contains(stop_arr, x))
        ).alias("n_stop"),
        F.regexp_count(F.col("text"), F.lit(PUNCT_RE)).alias("n_punct"),
    )
    n_words = F.col("n_words_i")
    raw_stop = F.when(n_words > 0, F.col("n_stop") * 1.0 / n_words).otherwise(0.0)
    raw_punct = F.col("n_punct") * 1.0 / F.greatest(F.col("n_chars"), F.lit(1))
    quality = rnd(
        1.0
        / (
            1.0
            + F.exp(-(0.2 * F.log(1 + n_words) + 2.0 * raw_stop - 5.0 * raw_punct))
        ),
        6,
    )
    return (
        counts.select(
            "doc_id",
            "n_chars",
            n_words.cast("long").alias("n_words"),
            "n_tokens_bpe",
            F.when(n_words > 0, rnd(F.col("word_chars") * 1.0 / n_words, 4))
            .otherwise(0.0)
            .alias("avg_word_len"),
            rnd(raw_punct, 6).alias("punct_ratio"),
            F.when(n_words > 0, rnd(F.col("n_stop") * 1.0 / n_words, 6))
            .otherwise(0.0)
            .alias("stopword_ratio"),
            quality.alias("quality_score"),
        )
        # no presentation sort: per-doc output, and a global doc_id sort
        # is a full-corpus range shuffle at scale (r08 verdict ask #3)
    )


def _lang_score_sql(toks: str, lang: str) -> str:
    lex = sql_str_list(LANG_LEXICONS[lang])
    return f"len(list_filter({toks}, x -> list_contains({lex}, x)))::BIGINT"


def _langid_case_sql(de: str, en: str, es: str, fr: str) -> str:
    """The classifier's argmax CASE (de>en>es>fr tie order, 'unknown' on
    zero hits) over four score expressions — ONE source of truth shared
    by the text_langid oracle and the text_langid_eval oracle so the
    eval can never diverge from the classifier it audits."""
    return f"""CASE WHEN greatest({de}, {en}, {es}, {fr}) = 0 THEN 'unknown'
            WHEN {de} >= greatest({en}, {es}, {fr}) THEN 'de'
            WHEN {en} >= greatest({es}, {fr}) THEN 'en'
            WHEN {es} >= {fr} THEN 'es'
            ELSE 'fr' END"""


@register(
    "text_langid",
    shape="per_row",
    tags=("text", "langid"),
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang AS labeled_lang,
         {_lang_score_sql(words_sql('text'), 'de')} AS score_de,
         {_lang_score_sql(words_sql('text'), 'en')} AS score_en,
         {_lang_score_sql(words_sql('text'), 'es')} AS score_es,
         {_lang_score_sql(words_sql('text'), 'fr')} AS score_fr
  FROM documents
)
SELECT doc_id, labeled_lang, score_de, score_en, score_es, score_fr,
       {_langid_case_sql('score_de', 'score_en', 'score_es', 'score_fr')} AS predicted_lang
FROM scored
ORDER BY doc_id
""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-lexicon language ID (n-gram-heuristic family): score each
    language by lexicon hits over the token multiset; argmax with a fixed
    de>en>es>fr tie order.  Pure array built-ins, no shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "lang", words("text").alias("w"))
    w = F.col("w")

    def score(lang: str):
        lex = F.array(*[F.lit(s) for s in LANG_LEXICONS[lang]])
        return F.size(F.filter(w, lambda x: F.array_contains(lex, x))).cast("long")

    scored = base.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        score("de").alias("score_de"),
        score("en").alias("score_en"),
        score("es").alias("score_es"),
        score("fr").alias("score_fr"),
    )
    best = F.greatest("score_de", "score_en", "score_es", "score_fr")
    return (
        scored.withColumn(
            "predicted_lang",
            F.when(best == 0, "unknown")
            .when(F.col("score_de") >= F.greatest("score_en", "score_es", "score_fr"), "de")
            .when(F.col("score_en") >= F.greatest("score_es", "score_fr"), "en")
            .when(F.col("score_es") >= F.col("score_fr"), "es")
            .otherwise("fr"),
        )
    )


@register(
    "text_fingerprint",
    shape="per_row",
    tags=("text", "fingerprint"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {words_sql('text')} AS w FROM documents
), pos AS (
  SELECT doc_id,
         unnest(w) AS tok,
         generate_subscripts(w, 1) - 1 AS p
  FROM toks
)
SELECT doc_id,
       count(*) AS n_tokens,
       -- DuckDB sum(BIGINT) yields HUGEINT, which pandas-based
       -- canonicalizers float-promote; the mod-P result fits in 64 bits,
       -- so pin it back to BIGINT to match Spark's bigint
       CAST(sum(({h32_sql('tok')} % {_FP_TOKEN_MOD}) * ((p % 64) + 1))
         % {_FP_PRIME} AS BIGINT) AS fingerprint
FROM pos
GROUP BY doc_id
ORDER BY doc_id
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-weighted rolling document fingerprint:
    sum((h32(token) mod m) * ((pos mod 64)+1)) mod P — order-sensitive,
    overflow-free in 64-bit on both engines.  posexplode keeps the hash
    arithmetic JVM-side; one narrow shuffle on doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", words("text").alias("w"))
    pos = toks.select("doc_id", F.posexplode("w").alias("p", "tok"))
    return (
        pos.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum((h32(F.col("tok")) % _FP_TOKEN_MOD) * ((F.col("p") % 64) + 1))
                % _FP_PRIME
            ).alias("fingerprint"),
        )
    )


@register(
    "text_vocabulary",
    shape="bounded",
    tags=("text", "tokens"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({words_sql('text')}) AS tok FROM documents
), counts AS (
  SELECT tok, count(*) AS n, count(DISTINCT doc_id)::BIGINT AS df
  FROM toks GROUP BY tok
)
SELECT tok, n, df
FROM (SELECT *, row_number() OVER (ORDER BY n DESC, tok) AS rn FROM counts) t
WHERE rn <= 50
ORDER BY n DESC, tok
""",
)
def text_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-50 tokens by term frequency with document
    frequency — explode → two-level agg (partial agg makes the shuffle
    carry one row per distinct token, not per occurrence)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(words("text")).alias("tok"))
    counts = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("doc_id").alias("df")
    )
    return (
        counts.orderBy(F.desc("n"), "tok")
        .limit(50)
        .select("tok", "n", "df")
        .orderBy(F.desc("n"), "tok")
    )


@register(
    "text_dup_ngram_fraction",
    shape="per_row",
    tags=("text", "dedup", "quality"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {words_sql('text')} AS w FROM documents
), sets AS (
  SELECT doc_id, {word_shingles_sql('w', 5)} AS grams FROM toks
), ex AS (
  SELECT doc_id, unnest(grams) AS gram FROM sets
), hashed AS (
  SELECT doc_id, md5(gram) AS g FROM ex
), counted AS (
  SELECT doc_id, count(*) OVER (PARTITION BY g) AS n_docs FROM hashed
)
SELECT doc_id,
       count(*)::BIGINT AS n_grams,
       sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END)::BIGINT AS dup_grams,
       {rnd_sql('sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*)', 6)}
         AS dup_fraction
FROM counted GROUP BY doc_id ORDER BY doc_id
""",
)
def text_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicated n-gram fraction per document (the
    cross-document repetition signal from web-corpus cleaning recipes:
    what share of a doc's distinct word 5-grams also occur in some OTHER
    document — or twice in this one via distinct-set semantics never, so
    n_docs counts documents).

    Scale shape: shingles are per-doc DISTINCT, so after explode the key
    ``md5(gram)`` appears once per containing document; a window count
    over that 16-byte digest gives document frequency without a big-big
    self-join, and the only shuffles are (1) by gram digest, (2) by
    doc_id for the final roll-up.  The shuffle rows carry
    (doc_id, digest) — never document text.  Complements
    ``text_repetition`` (within-doc dup fractions): this is the
    between-doc signal used to kill boilerplate-heavy pages.
    """
    docs = load_table(spark, sf_dir, "documents")
    sets_ = shingle_sets(docs, n=5)
    hashed = sets_.select("doc_id", F.explode("shingles").alias("gram")).select(
        "doc_id", F.md5("gram").alias("g")
    )
    counted = hashed.select(
        "doc_id", F.count(F.lit(1)).over(W.partitionBy("g")).alias("n_docs")
    )
    return (
        counted.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("n_docs") >= 2).cast("long")).alias("dup_grams"),
        )
        .select(
            "doc_id",
            "n_grams",
            "dup_grams",
            rnd(F.col("dup_grams") * 1.0 / F.col("n_grams"), 6).alias("dup_fraction"),
        )
    )


_LM_VOCAB_K = 500  # in-vocabulary = the top-K corpus unigrams


@register(
    "text_unigram_lm",
    shape="per_row+prefix_sum",
    tags=("text", "quality", "lm", "llm-pipeline"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({words_sql('text')}) AS tok FROM documents
), freq AS (
  SELECT tok, count(*) AS n FROM toks GROUP BY tok
), scored_vocab AS (
  SELECT tok, n,
         sum(n) OVER () AS total,
         row_number() OVER (ORDER BY n DESC, tok) AS rnk
  FROM freq
)
SELECT t.doc_id,
       count(*) AS n_tokens,
       {rnd_sql('avg(ln(v.n * 1.0 / v.total))', 6)} AS avg_logprob,
       {rnd_sql('avg(CASE WHEN v.rnk <= {k} THEN 0.0 ELSE 1.0 END)', 6)} AS oov_rate
FROM toks t JOIN scored_vocab v ON t.tok = v.tok
GROUP BY t.doc_id
ORDER BY t.doc_id
""".replace("{k}", str(_LM_VOCAB_K)),
)
def text_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality signals: per-document average token log-prob
    under the corpus unigram distribution (the perplexity-filter proxy)
    and out-of-vocabulary rate against the top-{500} unigram vocabulary.
    Low avg_logprob / high oov_rate = unusual token mix, the standard
    drop/downweight signal in training-data pipelines.

    Scale shape (r10 rewrite, zero global windows): one token-count
    aggregation (shuffle keyed on token); the corpus total is a plain
    one-row aggregate broadcast back (not ``sum OVER ()`` — at 100 TB
    the vocabulary aggregate is 10^8-10^9 hapax-heavy rows and a global
    window serializes it); vocabulary membership comes from the
    frequency-threshold top-k (operators/prefix.py::top_k_by_freq —
    bucketed prefix sum over log-frequency buckets, only the
    broadcast-sized survivors ranked); one equi-join of token postings
    to frequencies, one per-doc aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(words("text")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    total = freq.agg(F.sum("n").alias("total"))
    topv = top_k_by_freq(freq, "n", "tok", _LM_VOCAB_K).select(
        "tok", F.lit(1).alias("__in_vocab")
    )
    vocab = (
        freq.crossJoin(F.broadcast(total))
        .join(F.broadcast(topv), "tok", "left")
    )
    return (
        toks.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            rnd(F.avg(F.log(F.col("n") * 1.0 / F.col("total"))), 6).alias(
                "avg_logprob"
            ),
            rnd(
                F.avg(
                    F.when(F.col("__in_vocab").isNotNull(), 0.0).otherwise(1.0)
                ),
                6,
            ).alias("oov_rate"),
        )
    )


_LANGID_PRED_SQL = f"""
  WITH scored AS (
    SELECT doc_id, lang AS labeled_lang,
           {_lang_score_sql(words_sql('text'), 'de')} AS score_de,
           {_lang_score_sql(words_sql('text'), 'en')} AS score_en,
           {_lang_score_sql(words_sql('text'), 'es')} AS score_es,
           {_lang_score_sql(words_sql('text'), 'fr')} AS score_fr
    FROM documents
  )
  SELECT doc_id, labeled_lang,
         {_langid_case_sql('score_de', 'score_en', 'score_es', 'score_fr')}
           AS predicted_lang
  FROM scored
"""

@register(
    "text_langid_eval",
    shape="bounded",
    tags=("text", "langid", "evaluation"),
    oracle=f"""
WITH pred AS ({_LANGID_PRED_SQL}),
cells AS (
  SELECT labeled_lang, predicted_lang, count(*) AS n
  FROM pred GROUP BY 1, 2
)
SELECT labeled_lang, predicted_lang, n,
       round(5e-10 + n * 1.0 / sum(n) OVER (PARTITION BY labeled_lang), 6)
         AS row_frac,
       labeled_lang = predicted_lang AS is_correct
FROM cells
ORDER BY labeled_lang, predicted_lang
""",
)
def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: the lexicon classifier's
    predictions crossed with the labeled ``lang`` column — per-cell
    count, per-label row fraction (recall on the diagonal), and the
    correctness flag.  The eval-harness pattern: a model-quality audit
    as a first-class query over the same engine.

    Scale shape: classification is scan-stage expressions (zero
    shuffle); the matrix is one (label × prediction)-keyed aggregation;
    the row fraction windows over the ≤ |langs|² aggregate.

    Reference basis: none."""
    pred = text_langid(spark, sf_dir).select("labeled_lang", "predicted_lang")
    cells = pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    return cells.select(
        "labeled_lang",
        "predicted_lang",
        "n",
        rnd(
            F.col("n") * 1.0 / F.sum("n").over(W.partitionBy("labeled_lang")), 6
        ).alias("row_frac"),
        (F.col("labeled_lang") == F.col("predicted_lang")).alias("is_correct"),
    ).orderBy("labeled_lang", "predicted_lang")
