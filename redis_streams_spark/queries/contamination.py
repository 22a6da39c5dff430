"""Corpus-hygiene operators for LLM training pipelines: benchmark
decontamination, PII scrubbing, and repetition-quality scoring.

These extend the north-star text family (SURVEY §2.2 last rows) with the
standard pre-training hygiene passes: drop/flag documents that overlap an
evaluation benchmark, redact PII-shaped spans, and score pathological
repetition (the Gopher-style quality rules).

All three are engine-agnostic deterministic computations, so each query
carries a full-value DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.functions.textfns import (
    word_shingles,
    word_shingles_sql,
    words,
    words_sql,
)
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

# Documents from this source play the role of the held-out evaluation
# benchmark; everything else is the training corpus.
_BENCH_SOURCE = "src19"
_DECON_N = 3  # word n-gram size for overlap detection
_DECON_THRESHOLD = 0.05  # flag when >= 5% of a doc's grams appear in the benchmark


@register(
    "text_decontaminate",
    shape="per_row",
    tags=("text", "decontamination", "llm-pipeline"),
    oracle=f"""
WITH sets_ AS MATERIALIZED (
  SELECT doc_id, source,
         {word_shingles_sql(words_sql('text'), _DECON_N)} AS grams
  FROM documents
), bench AS (
  SELECT DISTINCT unnest(grams) AS gram FROM sets_ WHERE source = '{_BENCH_SOURCE}'
), corpus AS (
  SELECT doc_id, len(grams)::BIGINT AS n_grams, unnest(grams) AS gram
  FROM sets_ WHERE source <> '{_BENCH_SOURCE}'
), hits AS (
  SELECT doc_id, count(*) AS n_contaminated
  FROM corpus JOIN bench USING (gram)
  GROUP BY doc_id
), base AS (
  SELECT doc_id, len(grams)::BIGINT AS n_grams
  FROM sets_ WHERE source <> '{_BENCH_SOURCE}'
)
SELECT b.doc_id,
       b.n_grams,
       coalesce(h.n_contaminated, 0)::BIGINT AS n_contaminated,
       CASE WHEN b.n_grams > 0
            THEN {rnd_sql('coalesce(h.n_contaminated, 0) * 1.0 / b.n_grams', 6)}
            ELSE 0.0 END AS contam_ratio,
       (b.n_grams > 0 AND
        coalesce(h.n_contaminated, 0) * 1.0 / b.n_grams >= {_DECON_THRESHOLD})
         AS flagged
FROM base b LEFT JOIN hits h USING (doc_id)
ORDER BY doc_id
""",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by word n-gram overlap.

    The benchmark's distinct gram set is BROADCAST to every executor —
    eval suites are tiny relative to a 100 TB corpus, so the corpus side
    is never shuffled for the membership test (a map-side hash-join per
    partition).  The only shuffle is the per-doc hit count, which carries
    one row per (doc, matched gram) — proportional to contamination, not
    corpus size.  Inverted-index shape: explode grams → equi-join, never
    doc×doc pairs.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "source", words("text").alias("w"))
    sets_ = toks.select(
        "doc_id", "source", word_shingles(F.col("w"), _DECON_N).alias("grams")
    )
    bench = (
        sets_.where(F.col("source") == _BENCH_SOURCE)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    corpus_sets = sets_.where(F.col("source") != _BENCH_SOURCE)
    corpus = corpus_sets.select("doc_id", F.explode("grams").alias("gram"))
    hits = (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    base = corpus_sets.select(
        "doc_id", F.size("grams").cast("long").alias("n_grams")
    )
    n_hit = F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long")
    return (
        base.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            n_hit.alias("n_contaminated"),
            F.when(F.col("n_grams") > 0, rnd(n_hit * 1.0 / F.col("n_grams"), 6))
            .otherwise(0.0)
            .alias("contam_ratio"),
            (
                (F.col("n_grams") > 0)
                & (n_hit * 1.0 / F.col("n_grams") >= _DECON_THRESHOLD)
            ).alias("flagged"),
        )
    )


# Regexes restricted to the Java ∩ RE2 common subset (no backrefs, no
# lookaround): identical matching on both engines.
_EMAIL_RE = "[a-z0-9.]+@[a-z0-9.]+[a-z]"
_LONGNUM_RE = "[0-9]{4,}"


@register(
    "text_pii_scrub",
    shape="per_row",
    tags=("text", "pii", "llm-pipeline"),
    oracle=f"""
WITH profiles AS (
  SELECT c_custkey,
         c_name || ' <' || replace(lower(c_name), '#', '.')
           || '@example.com> card ' || (c_custkey * 7919 + 100000000)
           || ' segment ' || c_mktsegment AS profile
  FROM customer
)
SELECT c_custkey,
       len(regexp_extract_all(profile, '{_EMAIL_RE}'))::BIGINT AS n_emails,
       len(regexp_extract_all(
         regexp_replace(profile, '{_EMAIL_RE}', '[EMAIL]', 'g'),
         '{_LONGNUM_RE}'))::BIGINT AS n_longnums,
       regexp_replace(
         regexp_replace(profile, '{_EMAIL_RE}', '[EMAIL]', 'g'),
         '{_LONGNUM_RE}', '[NUM]', 'g') AS scrubbed
FROM profiles
ORDER BY c_custkey
""",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction: count and mask email-shaped spans and
    long digit runs.  The PII-bearing profile string is derived
    deterministically from customer columns inside the query (the slim
    test tables carry no raw PII), then scrubbed by the actual operator
    under test: ordered regexp_replace passes — emails first, then digit
    runs, so account-number digits inside an address aren't double-counted.

    Pure per-row codegen expressions: no shuffle, no Python — at 100 TB
    this runs at parquet-scan speed per partition.
    """
    cust = load_table(spark, sf_dir, "customer")
    profile = F.concat(
        F.col("c_name"),
        F.lit(" <"),
        F.regexp_replace(F.lower("c_name"), "#", "."),
        F.lit("@example.com> card "),
        (F.col("c_custkey") * 7919 + 100000000).cast("string"),
        F.lit(" segment "),
        F.col("c_mktsegment"),
    )
    p = cust.select("c_custkey", profile.alias("profile"))
    no_email = F.regexp_replace(F.col("profile"), _EMAIL_RE, "[EMAIL]")
    return (
        p.select(
            "c_custkey",
            F.regexp_count(F.col("profile"), F.lit(_EMAIL_RE))
            .cast("long")
            .alias("n_emails"),
            F.regexp_count(no_email, F.lit(_LONGNUM_RE)).cast("long").alias("n_longnums"),
            F.regexp_replace(no_email, _LONGNUM_RE, "[NUM]").alias("scrubbed"),
        )
    )


_REPET_FLAG_DUP2 = 0.2  # flag when >= 20% of bigram slots are repeats


@register(
    "text_repetition",
    shape="per_row",
    tags=("text", "quality", "llm-pipeline"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {words_sql('text')} AS w FROM documents
), base AS (
  SELECT doc_id,
         len(w)::BIGINT AS n_words,
         len(list_distinct(w))::BIGINT AS n_distinct,
         len({word_shingles_sql('w', 2)})::BIGINT AS d2
  FROM toks
), tok_counts AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(w) AS tok FROM toks) t
  GROUP BY doc_id, tok
), top_ AS (
  SELECT doc_id, max(c) AS top_count FROM tok_counts GROUP BY doc_id
)
SELECT b.doc_id,
       b.n_words,
       CASE WHEN b.n_words > 0
            THEN {rnd_sql('1.0 - b.n_distinct * 1.0 / b.n_words', 6)}
            ELSE 0.0 END AS dup_word_frac,
       CASE WHEN b.n_words > 0
            THEN {rnd_sql('t.top_count * 1.0 / b.n_words', 6)}
            ELSE 0.0 END AS top_word_frac,
       CASE WHEN b.n_words > 1
            THEN {rnd_sql('(b.n_words - 1 - b.d2) * 1.0 / (b.n_words - 1)', 6)}
            ELSE 0.0 END AS dup_bigram_frac,
       (b.n_words > 1 AND
        (b.n_words - 1 - b.d2) * 1.0 / (b.n_words - 1) >= {_REPET_FLAG_DUP2})
         AS repetitive
FROM base b LEFT JOIN top_ t USING (doc_id)
ORDER BY doc_id
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality: duplicate-word fraction,
    most-common-word share, and duplicate-bigram fraction, with a
    repetitiveness flag.

    The distinct/bigram fractions are per-row array expressions; the
    top-word share goes through explode → two-level aggregation (partial
    agg per partition means the shuffle carries one row per distinct
    (doc, token), never per occurrence).  No all-pairs anything.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", words("text").alias("w"))
    w = F.col("w")
    base = toks.select(
        "doc_id",
        F.size(w).cast("long").alias("n_words"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct"),
        F.size(word_shingles(w, 2)).cast("long").alias("d2"),
    )
    top = (
        toks.select("doc_id", F.explode(w).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_count"))
    )
    n, d2 = F.col("n_words"), F.col("d2")
    return (
        base.join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.when(n > 0, rnd(1.0 - F.col("n_distinct") * 1.0 / n, 6))
            .otherwise(0.0)
            .alias("dup_word_frac"),
            F.when(n > 0, rnd(F.col("top_count") * 1.0 / n, 6))
            .otherwise(0.0)
            .alias("top_word_frac"),
            F.when(n > 1, rnd((n - 1 - d2) * 1.0 / (n - 1), 6))
            .otherwise(0.0)
            .alias("dup_bigram_frac"),
            ((n > 1) & ((n - 1 - d2) * 1.0 / (n - 1) >= _REPET_FLAG_DUP2)).alias(
                "repetitive"
            ),
        )
    )
