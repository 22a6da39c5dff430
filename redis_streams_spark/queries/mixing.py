"""Corpus-mixing operators: deterministic stratified sampling toward a
target domain mixture, and per-source token budgeting.

Training-data pipelines rebalance domains before tokenization: compute
each source's token mass, then sample sources at different rates to hit a
target mixture.  Both operators are deterministic (md5-hash gating, no
RNG) so they carry full-value DuckDB oracles and produce identical samples
on every engine and every run — a requirement for reproducible data
recipes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redis_streams_spark.functions.hashing import h32, h32_sql
from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.functions.textfns import words, words_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

# Equal-representation mixture: aim for ~this many docs from EVERY source
# regardless of its raw size (sources are wildly imbalanced in real
# corpora; the slim test tables are uniform but the operator doesn't know
# that).
_TARGET_PER_SOURCE = 15
_2_32 = 4_294_967_296


@register(
    "q_stratified_sample",
    shape="per_row",
    tags=("sampling", "mixing", "llm-pipeline"),
    oracle=f"""
WITH counts AS (
  SELECT source, count(*) AS n_s FROM documents GROUP BY source
)
SELECT d.doc_id, d.source
FROM documents d JOIN counts c USING (source)
WHERE {h32_sql('d.doc_id::VARCHAR')} * c.n_s < {_TARGET_PER_SOURCE} * {_2_32}
ORDER BY d.doc_id
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: keep each document iff
    ``h32(doc_id) * n_source < target * 2^32`` — an ALL-INTEGER gate
    (expected ``target`` docs per source) with no float boundary to
    disagree across engines, no RNG, and replay-stable membership.

    Scale shape: the per-source count table has domain cardinality (tens
    to thousands of rows at 100 TB) and is broadcast; the corpus side is
    filtered map-side in the scan stage — no shuffle of sampled-out rows.
    The product stays < 2^63 for any source under ~2^31 docs.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    return (
        docs.join(F.broadcast(counts), "source")
        .where(
            h32(F.col("doc_id").cast("string")) * F.col("n_s")
            < F.lit(_TARGET_PER_SOURCE) * F.lit(_2_32)
        )
        .select("doc_id", "source")
    )


@register(
    "text_token_budget",
    shape="bounded",
    tags=("tokens", "mixing", "llm-pipeline"),
    oracle=f"""
WITH per_source AS (
  SELECT source,
         count(*) AS n_docs,
         sum(len({words_sql('text')}))::BIGINT AS n_tokens
  FROM documents
  GROUP BY source
)
SELECT source, n_docs, n_tokens,
       {rnd_sql('n_tokens * 1.0 / sum(n_tokens) OVER ()', 6)} AS corpus_share,
       sum(n_tokens) OVER (ORDER BY n_tokens DESC, source
                           ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens,
       {rnd_sql(
           'sum(n_tokens) OVER (ORDER BY n_tokens DESC, source '
           'ROWS UNBOUNDED PRECEDING) * 1.0 / sum(n_tokens) OVER ()', 6)}
         AS cum_share
FROM per_source
ORDER BY n_tokens DESC, source
""",
)
def text_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token budget with cumulative corpus share — the
    "which domains fill my 1T-token budget" report.  The heavy part is
    one partial-aggregated groupBy (shuffle carries one row per source);
    the windows then run over the domain-cardinality aggregate, which is
    negligible at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(words("text"))).cast("long").alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    w_cum = (
        Window.partitionBy()
        .orderBy(F.desc("n_tokens"), "source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = F.sum("n_tokens").over(w_all)
    cum = F.sum("n_tokens").over(w_cum)
    return (
        per_source.select(
            "source",
            "n_docs",
            "n_tokens",
            rnd(F.col("n_tokens") * 1.0 / total, 6).alias("corpus_share"),
            cum.cast("long").alias("cum_tokens"),
            rnd(cum * 1.0 / total, 6).alias("cum_share"),
        )
        .orderBy(F.desc("n_tokens"), "source")
    )


@register(
    "mix_temperature",
    shape="bounded",
    tags=("mixing", "llm-pipeline"),
    oracle=f"""
WITH per_source AS (
  SELECT source, count(*) AS n_docs,
         sum(len({words_sql('text')}))::BIGINT AS n_tokens
  FROM documents GROUP BY source
)
SELECT source, n_docs, n_tokens,
       {rnd_sql('n_tokens * 1.0 / sum(n_tokens) OVER ()', 6)} AS raw_share,
       {rnd_sql('sqrt(n_tokens) / sum(sqrt(n_tokens)) OVER ()', 6)} AS temp_share,
       {rnd_sql(
           '(sqrt(n_tokens) / sum(sqrt(n_tokens)) OVER ()) / '
           '(n_tokens * 1.0 / sum(n_tokens) OVER ())', 6)} AS boost
FROM per_source
ORDER BY source
""",
)
def mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (T=2, i.e. p ∝ mass^(1/2)): the
    standard multilingual/multi-domain rebalance that upweights small
    sources without flattening the mixture entirely.  ``boost`` is the
    up/down-sampling factor each source needs to realize the tempered
    mixture (``temp_share / raw_share``).

    ``sqrt`` rather than ``pow(x, 0.5)`` on both engines: sqrt is
    IEEE-754 correctly-rounded, so the shares hash-match exactly.  The
    aggregate is one partial-combined groupBy to domain cardinality; the
    windowed normalization runs over that tiny aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(words("text"))).cast("long").alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    total = F.sum("n_tokens").over(w_all)
    temp_total = F.sum(F.sqrt("n_tokens")).over(w_all)
    raw_share = F.col("n_tokens") * 1.0 / total
    temp_share = F.sqrt("n_tokens") / temp_total
    return (
        per_source.select(
            "source",
            "n_docs",
            "n_tokens",
            rnd(raw_share, 6).alias("raw_share"),
            rnd(temp_share, 6).alias("temp_share"),
            rnd(temp_share / raw_share, 6).alias("boost"),
        )
        .orderBy("source")
    )


_N_SHARDS = 16


@register(
    "q_shard_manifest",
    shape="bounded",
    tags=("sharding", "mixing", "llm-pipeline"),
    oracle=f"""
WITH assigned AS (
  SELECT doc_id,
         {h32_sql('doc_id::VARCHAR')} % {_N_SHARDS} AS shard,
         len({words_sql('text')})::BIGINT AS n_tokens
  FROM documents
)
SELECT shard::BIGINT AS shard,
       count(*) AS n_docs,
       sum(n_tokens)::BIGINT AS n_tokens,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id,
       {rnd_sql(f'count(*) * {_N_SHARDS} * 1.0 / sum(count(*)) OVER ()', 6)}
         AS balance_ratio
FROM assigned
GROUP BY shard
ORDER BY shard
""",
)
def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic output sharding + manifest (the write-side step that
    turns a cleaned corpus into N training shards): every doc hashes to
    ``h32(doc_id) mod N``, and the manifest reports each shard's doc and
    token mass plus a balance ratio (1.0 = perfectly even; hash
    assignment keeps it near 1 regardless of doc_id clustering).

    Scale shape: this IS `df.repartition(N, hash_col).write` — the
    manifest aggregate shuffles one row per (shard) after partial
    aggregation, and shard assignment itself never shuffles (it rides
    the write's own exchange).  Replay-stable: re-running the pipeline
    reproduces byte-identical shard membership, which training-data
    lineage audits require."""
    docs = load_table(spark, sf_dir, "documents")
    assigned = docs.select(
        "doc_id",
        (h32(F.col("doc_id").cast("string")) % _N_SHARDS).alias("shard"),
        F.size(words("text")).cast("long").alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    return (
        assigned.groupBy(F.col("shard").cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .withColumn(
            "balance_ratio",
            rnd(F.col("n_docs") * _N_SHARDS * 1.0 / F.sum("n_docs").over(w_all), 6),
        )
        .orderBy("shard")
    )


_CLASS_CAP = 20  # max docs kept per (source, lang) class


@register(
    "q_class_cap",
    shape="per_row",
    tags=("sampling", "mixing", "llm-pipeline"),
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, source, lang,
         row_number() OVER (PARTITION BY source, lang
                            ORDER BY {h32_sql('doc_id::VARCHAR')}, doc_id) AS rn
  FROM documents
)
SELECT doc_id, source, lang
FROM ranked
WHERE rn <= {_CLASS_CAP}
ORDER BY doc_id
""",
)
def q_class_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class cap sampling: keep at most {20} documents per
    (source, lang) class, selected by hash order — caps dominant classes
    without touching small ones (the complement of rate-based
    stratified sampling), deterministic and replay-stable.

    Scale shape: one window per class partition; the hash order means
    the kept set is stable under corpus growth *within* the cap (a doc
    only drops out when enough lower-hash docs arrive).  At extreme
    class sizes the exact window can be pre-filtered by an approximate
    hash-threshold pass; the exact form is the auditable baseline."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source", "lang").orderBy(
        h32(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "source", "lang")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _CLASS_CAP)
        .drop("rn")
    )


_SYS_K = 20


@register(
    "q_systematic_sample",
    shape="per_row",
    tags=("sampling", "prefix-sum"),
    oracle=f"""
WITH h AS (
  SELECT doc_id, md5(text) AS hk FROM documents
), r AS (
  SELECT doc_id, hk,
         row_number() OVER (ORDER BY hk, doc_id) - 1 AS idx
  FROM h
)
SELECT doc_id, idx AS sample_idx FROM r
WHERE idx % {_SYS_K} = 0
ORDER BY doc_id
""",
)
def q_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic 1-in-20 sample over the md5-content order: rank every
    document in a global pseudorandom (hash) order and keep each 20th —
    evenly spaced coverage that rate-based Bernoulli sampling doesn't
    guarantee, deterministic and replay-stable.

    Scale shape — distributed global ranking WITHOUT a global sort: the
    hash keyspace is bucketed by its first byte; phase 1 ranks within
    each bucket (parallel windows), phase 2 turns per-bucket counts into
    exclusive-prefix offsets (an unpartitioned window over ≤256
    AGGREGATE rows), and global_idx = offset + local_rank.  Because the
    bucket is a PREFIX of the hash order key, bucket-major order equals
    the global (hk, doc_id) order — the same two-phase prefix-sum shape
    as q_concurrency_curve, here computing the DataFrame equivalent of
    zipWithIndex.

    Reference basis: none."""
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select("doc_id", F.md5("text").alias("hk")).withColumn(
        "bucket", F.substring("hk", 1, 2)
    )
    local = h.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("bucket").orderBy("hk", "doc_id")
        ),
    )
    bcnt = h.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    offsets = bcnt.select(
        "bucket",
        F.coalesce(
            F.sum("c").over(
                Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("off"),
    )
    return (
        local.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id", (F.col("off") + F.col("rn") - 1).alias("sample_idx")
        )
        .where(F.col("sample_idx") % _SYS_K == 0)
    )


_DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest({words_sql('text')}) AS tok FROM documents
), cfreq AS (
  SELECT tok, count(*) AS cc FROM toks GROUP BY tok
), tfreq AS (
  SELECT tok, count(*) AS tc FROM toks WHERE lang = 'en' GROUP BY tok
), freq AS (
  SELECT c.tok, c.cc, coalesce(t.tc, 0) AS tc
  FROM cfreq c LEFT JOIN tfreq t ON t.tok = c.tok
), scal AS (
  SELECT sum(cc)::DOUBLE AS nc, sum(tc)::DOUBLE AS nt,
         count(*)::DOUBLE AS v
  FROM freq
)
SELECT t.doc_id,
       count(*) AS n_tokens,
       round(5e-10 + avg(ln(((f.tc + 1.0) / (scal.nt + scal.v)) /
                            ((f.cc + 1.0) / (scal.nc + scal.v)))), 6)
         AS avg_logratio,
       round(5e-10 + avg(ln(((f.tc + 1.0) / (scal.nt + scal.v)) /
                            ((f.cc + 1.0) / (scal.nc + scal.v)))), 6) >= 0
         AS keep
FROM toks t
JOIN freq f ON f.tok = t.tok
CROSS JOIN scal
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


@register(
    "mix_importance_resample",
    shape="per_row",
    tags=("mixing", "dsir", "llm-pipeline"),
    oracle=_DSIR_ORACLE,
)
def mix_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling", simplified to
    unigram features): every document gets the average token
    log-likelihood RATIO between a target domain LM (here: the corpus's
    'en' slice) and the raw-corpus LM, add-one smoothed over the shared
    vocabulary; ``keep`` selects documents that look more target-like
    than corpus-average.  The deterministic threshold stands in for the
    paper's Gumbel resampling so the oracle is value-exact.

    Scale shape: two token-count aggregations sharing one shuffle key
    (token), a left join of the count tables (vocabulary-sized), one
    postings→frequency equi-join, scalars broadcast; one per-doc agg.

    Reference basis: none (published method; no counterpart in
    redis-streams)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", F.explode(words("text")).alias("tok"))
    cfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cc"))
    tfreq = (
        toks.where(F.col("lang") == "en")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    freq = cfreq.join(tfreq, "tok", "left").select(
        "tok", "cc", F.coalesce(F.col("tc"), F.lit(0)).alias("tc")
    )
    scal = freq.agg(
        F.sum("cc").cast("double").alias("nc"),
        F.sum("tc").cast("double").alias("nt"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    lr = F.log(
        ((F.col("tc") + 1.0) / (F.col("nt") + F.col("v")))
        / ((F.col("cc") + 1.0) / (F.col("nc") + F.col("v")))
    )
    return (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(scal))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            rnd(F.avg(lr), 6).alias("avg_logratio"),
            # round-before-threshold (rounding.py convention): raw
            # distributed averages differ by an ulp across engines
            (rnd(F.avg(lr), 6) >= 0).alias("keep"),
        )
    )
