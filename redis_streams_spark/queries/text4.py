"""Round-6 text/corpus operators: C4-style line-level dedup, PMI
collocations, character-class composition, tokenizer fertility.

All candidate generation is keyed aggregation (line hash, bigram, source,
lang) — linear scan-stage work plus partial-aggregated shuffles; the only
windows are bounded-aggregate top-k cuts.  Reference basis: none
(redis-streams has no text surface); the line-dedup rule follows the
published C4 pipeline (Raffel et al. 2020, §2.2: discard duplicated
three-sentence spans / boilerplate lines) and fertility is the standard
tokens-per-word tokenizer metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.functions.textfns import BPE_RE, words, words_sql
from redis_streams_spark.operators.prefix import top_k_by_freq
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table


@register(
    "text_line_dedup",
    shape="bounded",
    tags=("text", "dedup", "llm-pipeline"),
    oracle="""
WITH lines AS (
  SELECT doc_id, lower(trim(l)) AS line
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM documents) t
  WHERE lower(trim(l)) <> ''
), freq AS (
  SELECT md5(line) AS h, min(line) AS line,
         count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
  FROM lines GROUP BY md5(line)
)
SELECT line, n_docs, n_occurrences
FROM freq
WHERE n_docs >= 2
ORDER BY n_docs DESC, n_occurrences DESC, line
LIMIT 100
""",
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate-line report: normalized lines appearing in 2+
    documents, with document and occurrence counts — the rule that strips
    repeated navigation/footer text before training.

    Scale shape: explode lines in the scan stage, aggregate by md5(line)
    (16-byte shuffle keys instead of raw line strings; the line text rides
    along as min()), then a global top-100 TakeOrdered — never a full
    sort.  Filtering a 100 TB corpus against the resulting line list is
    a broadcast semi-join on the same hash."""
    docs = load_table(spark, sf_dir, "documents")
    lines = (
        docs.select("doc_id", F.explode(F.split("text", "\n")).alias("l"))
        .select("doc_id", F.lower(F.trim("l")).alias("line"))
        .where(F.col("line") != "")
    )
    freq = lines.groupBy(F.md5("line").alias("h")).agg(
        F.min("line").alias("line"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )
    return (
        freq.where(F.col("n_docs") >= 2)
        .select("line", "n_docs", "n_occurrences")
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), "line")
        .limit(100)
    )


@register(
    "text_pmi_collocations",
    shape="bounded",
    tags=("text", "collocations", "llm-pipeline"),
    oracle=f"""
WITH base AS (
  SELECT doc_id, {words_sql('text')} AS w FROM documents
), toks AS (
  SELECT doc_id, unnest(w) AS term, generate_subscripts(w, 1) AS pos FROM base
), big AS (
  SELECT a.term AS w1, b.term AS w2
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
), bc AS (
  SELECT w1, w2, count(*) AS c_ab FROM big GROUP BY w1, w2
), uc AS (
  SELECT term, count(*) AS c FROM toks GROUP BY term
), tot AS (
  SELECT (SELECT count(*) FROM toks) * 1.0 AS t,
         (SELECT count(*) FROM big) * 1.0 AS b
)
SELECT w1, w2, c_ab,
       {rnd_sql('ln((c_ab / tot.b) / ((u1.c / tot.t) * (u2.c / tot.t)))', 6)} AS pmi
FROM bc JOIN uc u1 ON u1.term = bc.w1
        JOIN uc u2 ON u2.term = bc.w2
        CROSS JOIN tot
WHERE c_ab >= 5
ORDER BY pmi DESC, w1, w2
LIMIT 40
""",
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-40 adjacent-word collocations by pointwise mutual information
    (PMI = ln(p(ab) / p(a)p(b)), min pair count 5) — the classic
    multi-word-expression detector for tokenizer/vocab design.

    Scale shape: bigrams are built with an in-row array transform (no
    positional self-join on the big side), pair and unigram counts are
    partial-aggregated shuffles over vocabulary-sized keys, the corpus
    totals enter as a lazy 1-row broadcast scalar, and the result is a
    global top-40 TakeOrdered."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", words("text").alias("w"))
    bigrams = base.select(
        F.explode(
            F.when(
                F.size("w") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 1),
                    lambda i: F.struct(
                        F.element_at("w", i).alias("w1"),
                        F.element_at("w", i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bc = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    toks = base.select(F.explode("w").alias("term"))
    uc = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = toks.agg(F.count(F.lit(1)).cast("double").alias("t")).crossJoin(
        bigrams.agg(F.count(F.lit(1)).cast("double").alias("b"))
    )
    u1 = uc.select(F.col("term").alias("w1"), F.col("c").alias("c1"))
    u2 = uc.select(F.col("term").alias("w2"), F.col("c").alias("c2"))
    return (
        bc.where(F.col("c_ab") >= 5)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c_ab",
            rnd(
                F.log(
                    (F.col("c_ab") / F.col("b"))
                    / ((F.col("c1") / F.col("t")) * (F.col("c2") / F.col("t")))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(40)
    )


_ALPHA = "[A-Za-z]"
_DIGIT = "[0-9]"
_SPACE = "[ ]"


def _cc_sql(cls: str) -> str:
    return f"length(text) - length(regexp_replace(text, '{cls}', '', 'g'))"


@register(
    "text_charclass_profile",
    shape="bounded",
    tags=("text", "quality", "llm-pipeline"),
    oracle=f"""
WITH sig AS (
  SELECT source, length(text) AS n,
         {_cc_sql(_ALPHA)} AS n_alpha,
         {_cc_sql(_DIGIT)} AS n_digit,
         {_cc_sql(_SPACE)} AS n_space
  FROM documents WHERE length(text) > 0
)
SELECT source, count(*) AS n_docs, sum(n)::BIGINT AS n_chars,
       {rnd_sql('sum(n_alpha) * 1.0 / sum(n)', 6)} AS alpha_frac,
       {rnd_sql('sum(n_digit) * 1.0 / sum(n)', 6)} AS digit_frac,
       {rnd_sql('sum(n_space) * 1.0 / sum(n)', 6)} AS space_frac,
       {rnd_sql('sum(n - n_alpha - n_digit - n_space) * 1.0 / sum(n)', 6)} AS other_frac
FROM sig GROUP BY source ORDER BY source
""",
)
def text_charclass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per source (alpha / digit / space /
    other fractions) — the cheap corpus-mix fingerprint that flags
    tables-of-numbers, code dumps, or whitespace-padded sources before
    expensive downstream passes.  Pure scan-stage row expressions + one
    partial-aggregated shuffle on source."""
    docs = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)

    def cc(cls: str):
        return F.length("text") - F.length(F.regexp_replace("text", cls, ""))

    sig = docs.select(
        "source",
        F.length("text").alias("n"),
        cc(_ALPHA).alias("n_alpha"),
        cc(_DIGIT).alias("n_digit"),
        cc(_SPACE).alias("n_space"),
    )
    return (
        sig.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("n_chars"),
            rnd(F.sum("n_alpha") * 1.0 / F.sum("n"), 6).alias("alpha_frac"),
            rnd(F.sum("n_digit") * 1.0 / F.sum("n"), 6).alias("digit_frac"),
            rnd(F.sum("n_space") * 1.0 / F.sum("n"), 6).alias("space_frac"),
            rnd(
                (F.sum("n") - F.sum("n_alpha") - F.sum("n_digit") - F.sum("n_space"))
                * 1.0
                / F.sum("n"),
                6,
            ).alias("other_frac"),
        )
        .orderBy("source")
    )


@register(
    "text_token_fertility",
    shape="bounded",
    tags=("text", "tokenizer", "llm-pipeline"),
    oracle=f"""
WITH sig AS (
  SELECT lang,
         len({words_sql('text')}) AS n_words,
         length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS n_word_chars,
         len(regexp_extract_all(lower(text), '{BPE_RE}')) AS n_bpe
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       {rnd_sql('avg(n_words)', 4)} AS words_per_doc,
       {rnd_sql('sum(n_word_chars) * 1.0 / greatest(sum(n_words), 1)', 4)} AS chars_per_word,
       {rnd_sql('sum(n_bpe) * 1.0 / greatest(sum(n_words), 1)', 4)} AS tokens_per_word
FROM sig GROUP BY lang ORDER BY lang
""",
)
def text_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: words/doc, chars/word, and
    BPE-ish tokens/word (the regex tokenizer from text_stats) — the
    standard signal for how expensive each language is per word under a
    given tokenizer, which drives sampling-budget math.  Scan-stage
    expressions + one shuffle on lang."""
    docs = load_table(spark, sf_dir, "documents")
    sig = docs.select(
        "lang",
        F.size(words("text")).alias("n_words"),
        F.length(F.regexp_replace(F.lower("text"), "[^a-z0-9]", "")).alias(
            "n_word_chars"
        ),
        F.size(F.expr(f"regexp_extract_all(lower(text), '{BPE_RE}', 0)")).alias(
            "n_bpe"
        ),
    )
    return (
        sig.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            rnd(F.avg("n_words"), 4).alias("words_per_doc"),
            rnd(
                F.sum("n_word_chars") * 1.0 / F.greatest(F.sum("n_words"), F.lit(1)),
                4,
            ).alias("chars_per_word"),
            rnd(
                F.sum("n_bpe") * 1.0 / F.greatest(F.sum("n_words"), F.lit(1)), 4
            ).alias("tokens_per_word"),
        )
        .orderBy("lang")
    )


_COVERAGE_CUTOFFS = (100, 1000, 10000)


@register(
    "text_vocab_coverage",
    shape="bounded+prefix_sum",
    tags=("text", "tokenizer", "llm-pipeline"),
    oracle=f"""
WITH toks AS (
  SELECT unnest({words_sql('text')}) AS term FROM documents
), vc AS (
  SELECT term, count(*) AS freq FROM toks GROUP BY term
), ranked AS (
  SELECT term, freq,
         row_number() OVER (ORDER BY freq DESC, term) AS rnk
  FROM vc
), tot AS (
  SELECT sum(freq) * 1.0 AS total, count(*) AS vocab FROM vc
)
SELECT c.cutoff,
       least(c.cutoff, tot.vocab)::BIGINT AS vocab_used,
       sum(r.freq)::BIGINT AS covered_tokens,
       {rnd_sql('sum(r.freq) / tot.total * 100.0', 4)} AS coverage_pct
FROM (VALUES (100), (1000), (10000)) c(cutoff)
JOIN ranked r ON r.rnk <= c.cutoff
CROSS JOIN tot
GROUP BY c.cutoff, tot.vocab, tot.total
ORDER BY c.cutoff
""",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of all corpus tokens the
    top-100 / top-1k / top-10k most frequent terms cover — the
    vocabulary-size budget curve tokenizer design starts from (the
    cumulative complement of text_zipf's rank-frequency view).

    Scale shape (r10 rewrite, zero global windows): one
    vocabulary-sized count aggregate; the top-10k selection is the
    frequency-threshold prefix-sum top-k
    (operators/prefix.py::top_k_by_freq) so no unpartitioned
    ``row_number`` ever sees the full web-scale vocabulary — only the
    ≤10k+ties survivors are ranked; totals are a one-row aggregate
    broadcast back; the cutoff join fans the ranked survivors against a
    3-row literal frame."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(words("text")).alias("term"))
    vc = toks.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    ranked = top_k_by_freq(vc, "freq", "term", max(_COVERAGE_CUTOFFS))
    tot = vc.agg(
        (F.sum("freq") * 1.0).alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    cuts = docs.sparkSession.createDataFrame(
        [(c,) for c in _COVERAGE_CUTOFFS], "cutoff INT"
    )
    return (
        ranked.join(F.broadcast(cuts), F.col("rnk") <= F.col("cutoff"))
        .crossJoin(F.broadcast(tot))
        .groupBy("cutoff", "vocab", "total")
        .agg(F.sum("freq").alias("covered_tokens"))
        .select(
            F.col("cutoff").cast("long").alias("cutoff"),
            F.least(F.col("cutoff").cast("long"), F.col("vocab")).alias(
                "vocab_used"
            ),
            "covered_tokens",
            rnd(F.col("covered_tokens") / F.col("total") * 100.0, 4).alias(
                "coverage_pct"
            ),
        )
        .orderBy("cutoff")
    )


_DIVERGENCE_TOPV = 200


@register(
    "text_source_divergence",
    shape="bounded+prefix_sum",
    tags=("text", "mixing", "llm-pipeline"),
    oracle=f"""
WITH toks AS (
  SELECT source, unnest({words_sql('text')}) AS term FROM documents
), corpus AS (
  SELECT term, count(*) AS cf FROM toks GROUP BY term
), topv AS (
  SELECT term, cf FROM (
    SELECT term, cf, row_number() OVER (ORDER BY cf DESC, term) AS r FROM corpus
  ) t WHERE r <= {_DIVERGENCE_TOPV}
), sc AS (
  SELECT t.source, t.term, count(*) AS sf
  FROM toks t JOIN topv v ON v.term = t.term
  GROUP BY t.source, t.term
), grid AS (
  SELECT s.source, v.term, v.cf, coalesce(sc.sf, 0) AS sf
  FROM (SELECT DISTINCT source FROM documents) s
  CROSS JOIN topv v
  LEFT JOIN sc ON sc.source = s.source AND sc.term = v.term
), norm AS (
  SELECT source, term,
         (sf + 1.0) / (sum(sf) OVER (PARTITION BY source) + {_DIVERGENCE_TOPV})
           AS p,
         (cf + 1.0) / (sum(cf) OVER (PARTITION BY source) + {_DIVERGENCE_TOPV})
           AS q
  FROM grid
)
SELECT source,
       {rnd_sql('sum(0.5 * p * ln(2.0 * p / (p + q)) + 0.5 * q * ln(2.0 * q / (p + q)))', 6)}
         AS js_divergence
FROM norm GROUP BY source ORDER BY source
""",
)
def text_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's unigram distribution
    from the corpus distribution, over the top-200 corpus terms with
    add-one smoothing — the drifted-source detector a mixing stage runs
    before trusting per-source weights.

    Scale shape (r10 rewrite, zero global windows): token counts
    aggregate to vocabulary-sized frames; the top-200 selection is the
    frequency-threshold prefix-sum top-k
    (operators/prefix.py::top_k_by_freq) so the full vocabulary never
    crosses an unpartitioned window; the top-200 vocabulary and the
    |sources|×200 grid are broadcast-sized; every join is an equi-join
    on the term or source key."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(words("text")).alias("term"))
    corpus = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    topv = top_k_by_freq(corpus, "cf", "term", _DIVERGENCE_TOPV).select(
        "term", "cf"
    )
    sc = (
        toks.join(F.broadcast(topv.select("term")), "term")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("sf"))
    )
    sources = docs.select("source").distinct()
    grid = (
        sources.crossJoin(F.broadcast(topv))
        .join(sc, ["source", "term"], "left")
        .withColumn("sf", F.coalesce("sf", F.lit(0)))
    )
    ws = Window.partitionBy("source")
    norm = grid.select(
        "source",
        ((F.col("sf") + 1.0) / (F.sum("sf").over(ws) + _DIVERGENCE_TOPV)).alias(
            "p"
        ),
        ((F.col("cf") + 1.0) / (F.sum("cf").over(ws) + _DIVERGENCE_TOPV)).alias(
            "q"
        ),
    )
    js_term = 0.5 * F.col("p") * F.log(2.0 * F.col("p") / (F.col("p") + F.col("q"))) + (
        0.5 * F.col("q") * F.log(2.0 * F.col("q") / (F.col("p") + F.col("q")))
    )
    return (
        norm.groupBy("source")
        .agg(rnd(F.sum(js_term), 6).alias("js_divergence"))
        .orderBy("source")
    )
