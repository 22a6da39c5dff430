"""Round-7 LLM-pipeline wave: readability scoring, decontamination
n-gram sensitivity, and token-balanced sharding.

Reference basis: none (the reference delivers messages; corpus
preparation is the engine surface the build mandate adds).  All three
stay JVM-side — regex/array expressions and hash math, no Python in
any plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redis_streams_spark.functions.hashing import h32, h32_sql
from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.functions.textfns import (
    word_shingles,
    word_shingles_sql,
    words,
    words_sql,
)
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_BENCH_SOURCE = "src19"  # same held-out eval source as text_decontaminate
_VOWEL_RE = "[aeiouy]+"
_SENT_RE = "[.!?]+"


@register(
    "text_readability",
    shape="bounded",
    tags=("text-quality", "llm-prep", "scoring"),
    oracle=f"""
WITH per_doc AS (
  SELECT source,
         len({words_sql('text')})::BIGINT AS n_words,
         greatest(1, len(list_filter(string_split_regex(text, '{_SENT_RE}'),
                                     s -> length(trim(s)) > 0)))::BIGINT AS n_sents,
         greatest(len({words_sql('text')}),
                  len(regexp_extract_all(lower(text), '{_VOWEL_RE}')))::BIGINT AS n_syll
  FROM documents
)
SELECT source, count(*)::BIGINT AS n_docs,
       {rnd_sql('avg(n_words * 1.0 / n_sents)', 3)} AS avg_words_per_sentence,
       {rnd_sql('avg(n_syll * 1.0 / n_words)', 4)} AS avg_syllables_per_word,
       {rnd_sql('avg(206.835 - 1.015 * (n_words * 1.0 / n_sents) - 84.6 * (n_syll * 1.0 / n_words))', 3)} AS avg_flesch
FROM per_doc WHERE n_words > 0
GROUP BY source ORDER BY source
""",
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source: 206.835 − 1.015·(words/sentence)
    − 84.6·(syllables/word) — the classic readability screen training
    pipelines use to segment prose from boilerplate/code.  Syllables
    are approximated as vowel-group count (floored at one per word),
    sentences as non-blank ``[.!?]+`` splits (floored at 1) — a
    documented heuristic, identical regexes on both engines.

    Scale shape: three per-row array/regex expressions inside one scan,
    then a per-source average — the shuffle carries one row per source.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(words("text")).cast("long")
    n_sents = F.greatest(
        F.lit(1),
        F.size(
            F.filter(
                F.split(F.col("text"), _SENT_RE),
                lambda s: F.length(F.trim(s)) > 0,
            )
        ),
    ).cast("long")
    n_syll = F.greatest(
        F.size(words("text")),
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(_VOWEL_RE), 0)),
    ).cast("long")
    per_doc = docs.select(
        "source",
        n_words.alias("n_words"),
        n_sents.alias("n_sents"),
        n_syll.alias("n_syll"),
    ).where(F.col("n_words") > 0)
    wps = F.col("n_words") * 1.0 / F.col("n_sents")
    spw = F.col("n_syll") * 1.0 / F.col("n_words")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            rnd(F.avg(wps), 3).alias("avg_words_per_sentence"),
            rnd(F.avg(spw), 4).alias("avg_syllables_per_word"),
            rnd(F.avg(206.835 - 1.015 * wps - 84.6 * spw), 3).alias("avg_flesch"),
        )
        .orderBy("source")
    )


def _decontam_curve_oracle() -> str:
    blocks = []
    for n in (3, 5, 8):
        blocks.append(
            f"""
SELECT {n} AS n_gram, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN ratio >= 0.05 THEN 1 ELSE 0 END)::BIGINT AS n_flagged,
       {rnd_sql('avg(CASE WHEN ratio >= 0.05 THEN 1.0 ELSE 0.0 END)', 6)} AS flag_rate,
       {rnd_sql('avg(ratio)', 6)} AS mean_ratio
FROM (
  WITH sets_ AS (
    SELECT doc_id, source, {word_shingles_sql(words_sql('text'), n)} AS grams
    FROM documents
  ), bench AS (
    SELECT DISTINCT unnest(grams) AS gram FROM sets_ WHERE source = '{_BENCH_SOURCE}'
  ), corpus AS (
    SELECT doc_id, len(grams)::BIGINT AS n_grams, unnest(grams) AS gram
    FROM sets_ WHERE source <> '{_BENCH_SOURCE}'
  ), hits AS (
    SELECT doc_id, count(*) AS n_hit FROM corpus JOIN bench USING (gram) GROUP BY doc_id
  )
  SELECT b.doc_id,
         CASE WHEN b.n_grams > 0
              THEN coalesce(h.n_hit, 0) * 1.0 / b.n_grams ELSE 0.0 END AS ratio
  FROM (SELECT doc_id, len(grams)::BIGINT AS n_grams
        FROM sets_ WHERE source <> '{_BENCH_SOURCE}') b
  LEFT JOIN hits h USING (doc_id)
)"""
        )
    return "\nUNION ALL\n".join(blocks) + "\nORDER BY n_gram"


@register(
    "text_decontam_curve",
    shape="bounded",
    tags=("text-quality", "llm-prep", "decontamination", "tuning-curve"),
    oracle=_decontam_curve_oracle(),
)
def text_decontam_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination sensitivity curve: the flagged-document rate and
    mean benchmark-overlap ratio at n-gram sizes 3, 5, 8 — the tuning
    table that shows how aggressively each gram size removes (3-grams
    catch paraphrases but over-flag common phrases; 8-grams only catch
    verbatim leakage).  The same operator-family tuning artifact as
    ``dedup_threshold_curve`` is for MinHash.

    Scale shape: per n, the benchmark gram set stays broadcast and the
    corpus side is explode → map-side hash join → per-doc count — the
    inverted-index decontam plan (text_decontaminate) run three times;
    the final union carries 3 rows."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "source", words("text").alias("w"))
    out = None
    for n in (3, 5, 8):
        sets_ = toks.select(
            "doc_id", "source", word_shingles(F.col("w"), n).alias("grams")
        )
        bench = (
            sets_.where(F.col("source") == _BENCH_SOURCE)
            .select(F.explode("grams").alias("gram"))
            .distinct()
        )
        corpus_sets = sets_.where(F.col("source") != _BENCH_SOURCE)
        hits = (
            corpus_sets.select("doc_id", F.explode("grams").alias("gram"))
            .join(F.broadcast(bench), "gram")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_hit"))
        )
        ratio = F.when(
            F.col("n_grams") > 0,
            F.coalesce(F.col("n_hit"), F.lit(0)) * 1.0 / F.col("n_grams"),
        ).otherwise(0.0)
        per_doc = (
            corpus_sets.select(
                "doc_id", F.size("grams").cast("long").alias("n_grams")
            )
            .join(hits, "doc_id", "left")
            .select(ratio.alias("ratio"))
        )
        row = per_doc.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("ratio") >= 0.05, 1).otherwise(0)).alias(
                "n_flagged"
            ),
            rnd(
                F.avg(F.when(F.col("ratio") >= 0.05, 1.0).otherwise(0.0)), 6
            ).alias("flag_rate"),
            rnd(F.avg("ratio"), 6).alias("mean_ratio"),
        ).select(
            F.lit(n).cast("long").alias("n_gram"),
            "n_docs",
            "n_flagged",
            "flag_rate",
            "mean_ratio",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("n_gram")


@register(
    "mix_shard_balance",
    shape="bounded",
    tags=("mixing", "llm-prep", "layout", "sharding"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, len({words_sql('text')})::BIGINT AS n_tokens,
         {h32_sql('doc_id::VARCHAR')} AS h
  FROM documents
), bounds AS (
  SELECT quantile_cont(n_tokens, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS q
  FROM toks
), strat AS (
  SELECT t.doc_id, t.n_tokens, t.h,
         (CASE WHEN t.n_tokens >= b.q[9] THEN 9 WHEN t.n_tokens >= b.q[8] THEN 8
               WHEN t.n_tokens >= b.q[7] THEN 7 WHEN t.n_tokens >= b.q[6] THEN 6
               WHEN t.n_tokens >= b.q[5] THEN 5 WHEN t.n_tokens >= b.q[4] THEN 4
               WHEN t.n_tokens >= b.q[3] THEN 3 WHEN t.n_tokens >= b.q[2] THEN 2
               WHEN t.n_tokens >= b.q[1] THEN 1 ELSE 0 END) AS stratum
  FROM toks t CROSS JOIN bounds b
), assigned AS (
  SELECT n_tokens, h % 16 AS hash_shard,
         (row_number() OVER (PARTITION BY stratum, h % 8
                             ORDER BY h, doc_id) - 1) % 16 AS strat_shard
  FROM strat
)
SELECT strategy, shard, count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS total_tokens
FROM (
  SELECT 'hash' AS strategy, hash_shard AS shard, n_tokens FROM assigned
  UNION ALL
  SELECT 'stratified' AS strategy, strat_shard AS shard, n_tokens FROM assigned
)
GROUP BY strategy, shard ORDER BY strategy, shard
""",
)
def mix_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced output sharding, hash vs stratified: 'hash'
    assigns ``h32(doc_id) % 16`` (balanced in doc COUNT only);
    'stratified' buckets docs into token-size deciles (exact decile
    boundaries computed once and broadcast — the curriculum-phases
    pattern) and round-robins each (stratum, salt-cell)'s docs across
    the 16 shards, bounding per-shard token skew by construction.  The
    16-row-per-strategy manifest makes the imbalance comparable
    directly.

    Scale shape: the round-robin rank runs per (stratum × 8-way salt
    cell) — at real scale the salt fans out to thousands of cells, so
    no global (or near-global) sort exists; each cell independently
    deals similar-sized docs around all 16 shards.  Deterministic:
    ranks order by (h32, doc_id), replay-stable like every sharding
    op here."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(words("text")).cast("long").alias("n_tokens"),
        h32(F.col("doc_id").cast("string")).alias("h"),
    )
    bounds = toks.agg(
        F.expr(
            "percentile(n_tokens, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
        ).alias("q")
    )
    stratum = F.lit(0)
    for i in range(1, 10):
        stratum = F.when(
            F.col("n_tokens") >= F.element_at("q", i), F.lit(i)
        ).otherwise(stratum)
    strat = toks.crossJoin(F.broadcast(bounds)).select(
        "doc_id", "n_tokens", "h", stratum.alias("stratum")
    )
    w_cell = Window.partitionBy("stratum", F.col("h") % 8).orderBy("h", "doc_id")
    assigned = strat.select(
        "n_tokens",
        (F.col("h") % 16).alias("hash_shard"),
        ((F.row_number().over(w_cell) - 1) % 16).alias("strat_shard"),
    )
    both = assigned.select(
        F.lit("hash").alias("strategy"),
        F.col("hash_shard").alias("shard"),
        "n_tokens",
    ).unionByName(
        assigned.select(
            F.lit("stratified").alias("strategy"),
            F.col("strat_shard").alias("shard"),
            "n_tokens",
        )
    )
    return (
        both.groupBy("strategy", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("strategy", "shard")
    )


_CODE_SYM_RE = "[{}();=<>]"
_CAMEL_RE = r"\b[a-z]+[A-Z][a-zA-Z]*"


@register(
    "text_code_detect",
    shape="bounded",
    tags=("text-quality", "llm-prep", "classification"),
    oracle=f"""
WITH per_doc AS (
  SELECT source,
         greatest(1, len(list_filter(string_split(text, chr(10)),
                                     x -> length(trim(x)) > 0)))::BIGINT AS n_lines,
         len(list_filter(string_split(text, chr(10)),
                         x -> regexp_matches(trim(x), '{_CODE_SYM_RE}$')))::BIGINT AS sym_lines,
         len(list_filter(string_split(text, chr(10)),
                         x -> starts_with(x, '  ') OR starts_with(x, chr(9))))::BIGINT AS ind_lines,
         (length(text) - length(regexp_replace(text, '{_CODE_SYM_RE}', '', 'g')))
           * 1.0 / greatest(1, length(text)) AS sym_density,
         len(regexp_extract_all(text, '{_CAMEL_RE}'))::BIGINT AS n_camel,
         greatest(1, len({words_sql('text')}))::BIGINT AS n_words
  FROM documents
), scored AS (
  SELECT source,
         sym_lines * 1.0 / n_lines AS sym_line_ratio,
         ind_lines * 1.0 / n_lines AS indent_ratio,
         sym_density,
         n_camel * 1.0 / n_words AS camel_ratio,
         0.3 * (sym_lines * 1.0 / n_lines) + 0.25 * (ind_lines * 1.0 / n_lines)
           + 0.25 * least(1.0, 10 * sym_density)
           + 0.2 * least(1.0, 5 * n_camel * 1.0 / n_words) AS score
  FROM per_doc
)
SELECT source, count(*)::BIGINT AS n_docs,
       {rnd_sql('avg(sym_line_ratio)', 6)} AS avg_sym_line_ratio,
       {rnd_sql('avg(indent_ratio)', 6)} AS avg_indent_ratio,
       {rnd_sql('avg(sym_density)', 6)} AS avg_sym_density,
       {rnd_sql('avg(camel_ratio)', 6)} AS avg_camel_ratio,
       sum(CASE WHEN score >= 0.2 THEN 1 ELSE 0 END)::BIGINT AS n_code,
       {rnd_sql('avg(CASE WHEN score >= 0.2 THEN 1.0 ELSE 0.0 END)', 6)} AS code_rate
FROM scored GROUP BY source ORDER BY source
""",
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose heuristic classifier per source: line-level symbol
    endings (``;``/``{``/``}``), indentation, symbol character density,
    and camelCase token rate combine into a 0-1 score; docs at ≥ 0.2
    read as code — the corpus-segmentation step training pipelines run
    before language-specific processing.  All four signals are
    documented heuristics with IDENTICAL regexes on both engines (RE2 ∩
    Java subset, same discipline as q_regexp_gallery).

    Scale shape: per-row line/regex array math inside one scan, then a
    per-source average — the shuffle carries one row per source."""
    docs = load_table(spark, sf_dir, "documents")
    lines = F.split(F.col("text"), "\n")
    nonblank = F.filter(lines, lambda x: F.length(F.trim(x)) > 0)
    n_lines = F.greatest(F.lit(1), F.size(nonblank)).cast("long")
    sym_lines = F.size(
        F.filter(lines, lambda x: F.trim(x).rlike(_CODE_SYM_RE + "$"))
    ).cast("long")
    ind_lines = F.size(
        F.filter(
            lines,
            lambda x: x.startswith("  ") | x.startswith("\t"),
        )
    ).cast("long")
    sym_density = (
        F.length("text")
        - F.length(F.regexp_replace("text", _CODE_SYM_RE, ""))
    ) * 1.0 / F.greatest(F.lit(1), F.length("text"))
    n_camel = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(_CAMEL_RE), 0)
    ).cast("long")
    n_words = F.greatest(F.lit(1), F.size(words("text"))).cast("long")
    per_doc = docs.select(
        "source",
        (sym_lines * 1.0 / n_lines).alias("sym_line_ratio"),
        (ind_lines * 1.0 / n_lines).alias("indent_ratio"),
        sym_density.alias("sym_density"),
        (n_camel * 1.0 / n_words).alias("camel_ratio"),
    )
    score = (
        0.3 * F.col("sym_line_ratio")
        + 0.25 * F.col("indent_ratio")
        + 0.25 * F.least(F.lit(1.0), 10 * F.col("sym_density"))
        + 0.2 * F.least(F.lit(1.0), 5 * F.col("camel_ratio"))
    )
    scored = per_doc.withColumn("score", score)
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            rnd(F.avg("sym_line_ratio"), 6).alias("avg_sym_line_ratio"),
            rnd(F.avg("indent_ratio"), 6).alias("avg_indent_ratio"),
            rnd(F.avg("sym_density"), 6).alias("avg_sym_density"),
            rnd(F.avg("camel_ratio"), 6).alias("avg_camel_ratio"),
            F.sum(F.when(F.col("score") >= 0.2, 1).otherwise(0))
            .cast("long")
            .alias("n_code"),
            rnd(F.avg(F.when(F.col("score") >= 0.2, 1.0).otherwise(0.0)), 6).alias(
                "code_rate"
            ),
        )
        .orderBy("source")
    )


_EPOCH_CAP = 4.0
_BUDGET_EPOCHS = 1.5  # token budget = 1.5 x corpus size


@register(
    "mix_epoch_allocation",
    shape="bounded",
    tags=("mixing", "llm-prep", "budget"),
    oracle=f"""
WITH per_source AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(len({words_sql('text')}))::BIGINT AS n_tokens
  FROM documents GROUP BY source
), weighted AS (
  SELECT *, sqrt(n_tokens) AS w FROM per_source
), tot AS (
  SELECT sum(n_tokens) AS sum_t, sum(w) AS sum_w FROM weighted
), capped AS (
  SELECT s.source, s.n_docs, s.n_tokens, s.w,
         {_BUDGET_EPOCHS} * t.sum_t * s.w / t.sum_w / s.n_tokens AS epochs_raw,
         least({_EPOCH_CAP}, {_BUDGET_EPOCHS} * t.sum_t * s.w / t.sum_w / s.n_tokens)
           AS epochs_c
  FROM weighted s CROSS JOIN tot t
), redist AS (
  SELECT sum(epochs_c * n_tokens) AS alloc_c,
         sum(CASE WHEN epochs_raw < {_EPOCH_CAP} THEN w ELSE 0 END) AS free_w
  FROM capped
)
SELECT c.source, c.n_docs, c.n_tokens,
       {rnd_sql('c.w / t.sum_w', 6)} AS weight_share,
       {rnd_sql(
           f'''least({_EPOCH_CAP}, c.epochs_c +
             CASE WHEN c.epochs_raw < {_EPOCH_CAP} AND r.free_w > 0
                  THEN ({_BUDGET_EPOCHS} * t.sum_t - r.alloc_c) * c.w
                       / r.free_w / c.n_tokens
                  ELSE 0 END)''', 4)} AS epochs,
       floor(c.n_tokens * least({_EPOCH_CAP}, c.epochs_c +
             CASE WHEN c.epochs_raw < {_EPOCH_CAP} AND r.free_w > 0
                  THEN ({_BUDGET_EPOCHS} * t.sum_t - r.alloc_c) * c.w
                       / r.free_w / c.n_tokens
                  ELSE 0 END))::BIGINT AS alloc_tokens
FROM capped c CROSS JOIN tot t CROSS JOIN redist r
ORDER BY c.source
""",
)
def mix_epoch_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch allocation under a token budget: each source gets budget
    share ∝ sqrt(tokens) (temperature-0.5 weighting — upweights small
    high-value domains), capped at 4 epochs, with ONE water-filling
    redistribution round: budget freed by capped sources flows to the
    uncapped ones ∝ weight (then re-capped).  This is the "how many
    epochs of each domain fit my budget" planning table; a fixed-point
    water-fill iterates this step, one round is the documented
    approximation.

    Scale shape: one per-source token aggregate (shuffle carries one
    row per source); everything after operates on the domain-cardinality
    frame via two 1-row broadcast joins — corpus-scale-free."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(words("text"))).cast("long").alias("n_tokens"),
    )
    weighted = per_source.withColumn("w", F.sqrt("n_tokens"))
    tot = weighted.agg(
        F.sum("n_tokens").alias("sum_t"), F.sum("w").alias("sum_w")
    )
    raw = (
        F.lit(_BUDGET_EPOCHS)
        * F.col("sum_t")
        * F.col("w")
        / F.col("sum_w")
        / F.col("n_tokens")
    )
    capped = weighted.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        "w",
        "sum_t",
        "sum_w",
        raw.alias("epochs_raw"),
        F.least(F.lit(_EPOCH_CAP), raw).alias("epochs_c"),
    )
    redist = capped.agg(
        F.sum(F.col("epochs_c") * F.col("n_tokens")).alias("alloc_c"),
        F.sum(
            F.when(F.col("epochs_raw") < _EPOCH_CAP, F.col("w")).otherwise(0.0)
        ).alias("free_w"),
    )
    add = F.when(
        (F.col("epochs_raw") < _EPOCH_CAP) & (F.col("free_w") > 0),
        (F.lit(_BUDGET_EPOCHS) * F.col("sum_t") - F.col("alloc_c"))
        * F.col("w")
        / F.col("free_w")
        / F.col("n_tokens"),
    ).otherwise(0.0)
    final_epochs = F.least(F.lit(_EPOCH_CAP), F.col("epochs_c") + add)
    return (
        capped.crossJoin(F.broadcast(redist))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            rnd(F.col("w") / F.col("sum_w"), 6).alias("weight_share"),
            rnd(final_epochs, 4).alias("epochs"),
            F.floor(F.col("n_tokens") * final_epochs)
            .cast("long")
            .alias("alloc_tokens"),
        )
        .orderBy("source")
    )
