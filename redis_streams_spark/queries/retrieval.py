"""Lexical retrieval gallery: BM25 ranking, hybrid lexical fusion, and
the Good-Turing frequency spectrum (round 10 — the keyword-retrieval
counterpart to the vector `sim_*` family; production RAG stacks fuse
exactly these two list kinds).

All rankings round scores to 6 dp BEFORE the rank window and tie-break
on doc_id, so Spark and DuckDB order identically (float-ulp ties are
the classic cross-engine rank hazard).  Reference basis: none
(redis-streams has no query surface; SURVEY §2.2 extension rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.functions.textfns import words, words_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

# Three fixed keyword queries over the synthetic corpus vocabulary —
# ONE constant feeding both the Spark frame and the SQL VALUES list.
_BM25_QUERIES: dict[int, tuple[str, ...]] = {
    0: ("spark", "stream", "window"),
    1: ("hash", "join", "merge"),
    2: ("filter", "sort", "batch"),
}
_K1 = 1.2
_B = 0.75
_TOP_K = 10

_QTERMS_VALUES = ", ".join(
    f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES.items() for t in terms
)

# Shared oracle CTE prefix: tokens with doc length, query terms, tf per
# (query, doc, term), per-term document frequency, corpus totals.
# Parameterized by the query-terms VALUES list so every BM25 variant
# (exact, indexed, MaxScore with its own rare/common query mix) derives
# its oracle from ONE template.


def _lex_cte(qterms_values: str) -> str:
    return f"""
base AS (
  SELECT doc_id, {words_sql('text')} AS w FROM documents
), dl AS (
  SELECT doc_id, len(w)::BIGINT AS dl FROM base WHERE len(w) > 0
), toks AS (
  SELECT doc_id, unnest(w) AS tok FROM base
), qterms(query_id, term) AS (VALUES {qterms_values}),
tf AS (
  SELECT q.query_id, t.doc_id, q.term, count(*) AS tf
  FROM toks t JOIN qterms q ON q.term = t.tok
  GROUP BY 1, 2, 3
), dfreq AS (
  SELECT q.term, count(DISTINCT t.doc_id) AS df
  FROM toks t JOIN (SELECT DISTINCT term FROM qterms) q ON q.term = t.tok
  GROUP BY 1
), tot AS (
  SELECT count(*)::BIGINT AS n, avg(dl) AS avgdl FROM dl
)"""


_LEX_CTE = _lex_cte(_QTERMS_VALUES)

_BM25_SCORE_SQL = f"""
  SELECT f.query_id, f.doc_id,
         {rnd_sql(
             f"sum(ln((tot.n - d.df + 0.5) / (d.df + 0.5) + 1.0)"
             f" * (f.tf * {_K1 + 1.0})"
             f" / (f.tf + {_K1} * ({1.0 - _B} + {_B} * dd.dl / tot.avgdl)))",
             6,
         )} AS bm25
  FROM tf f
  JOIN dfreq d ON d.term = f.term
  JOIN dl dd ON dd.doc_id = f.doc_id
  CROSS JOIN tot
  GROUP BY 1, 2
"""


def _lex_frames(spark: SparkSession, sf_dir: str):
    """Spark twins of the oracle CTEs: (dl, tf, dfreq, tot, qterms)."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", words("text").alias("w"))
    dl = base.where(F.size("w") > 0).select(
        "doc_id", F.size("w").cast("long").alias("dl")
    )
    toks = base.select("doc_id", F.explode("w").alias("tok"))
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in _BM25_QUERIES.items() for t in terms],
        "query_id INT, term STRING",
    )
    matched = toks.join(
        F.broadcast(qterms), toks["tok"] == qterms["term"]
    ).select("query_id", "doc_id", "term")
    tf = matched.groupBy("query_id", "doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = (
        toks.join(
            F.broadcast(qterms.select("term").distinct()),
            toks["tok"] == F.col("term"),
        )
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    tot = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.avg("dl").alias("avgdl")
    )
    return dl, tf, dfreq, tot, qterms


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, bm25) — scores rounded to 6 dp."""
    dl, tf, dfreq, tot, _ = _lex_frames(spark, sf_dir)
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = idf * (F.col("tf") * (_K1 + 1.0)) / (
        F.col("tf")
        + _K1 * ((1.0 - _B) + _B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(tot))
        .groupBy("query_id", "doc_id")
        .agg(rnd(F.sum(term_score), 6).alias("bm25"))
    )


@register(
    "text_bm25_topk",
    shape="bounded",
    tags=("text", "retrieval", "bm25", "llm-pipeline"),
    oracle=f"""
WITH {_LEX_CTE}, scored AS ({_BM25_SCORE_SQL}),
ranked AS (
  SELECT query_id, doc_id, bm25,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY bm25 DESC, doc_id) AS rank
  FROM scored
)
SELECT query_id, rank, doc_id, bm25
FROM ranked WHERE rank <= {_TOP_K}
ORDER BY query_id, rank
""",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 per keyword query (k1=1.2, b=0.75, Lucene idf
    ln((N-df+0.5)/(df+0.5)+1)) over three fixed term queries — the
    keyword half of hybrid retrieval.

    Scale shape: postings never leave their partitions — the query-term
    broadcast semi-joins the exploded tokens down to matched postings
    only, tf is a (query, doc, term)-keyed partial aggregate, df and the
    (N, avgdl) totals are broadcast-sized aggregates, and the only
    window is partitioned per query over the matched-doc score frame."""
    scored = _bm25_scored(spark, sf_dir)
    w = W.partitionBy("query_id").orderBy(F.desc("bm25"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _TOP_K)
        .select("query_id", "rank", "doc_id", "bm25")
        .orderBy("query_id", "rank")
    )


@register(
    "sim_hybrid_lexical_rrf",
    shape="bounded",
    tags=("similarity", "retrieval", "fusion", "llm-pipeline"),
    oracle=f"""
WITH {_LEX_CTE}, scored AS ({_BM25_SCORE_SQL}),
bm25_list AS (
  SELECT query_id, doc_id AS cand_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY bm25 DESC, doc_id) AS bm25_rank
  FROM scored QUALIFY bm25_rank <= {_TOP_K}
), ndist AS (
  SELECT doc_id, count(DISTINCT tok) AS nd FROM toks GROUP BY 1
), qlen AS (
  SELECT query_id, count(*) AS qlen FROM qterms GROUP BY 1
), jac AS (
  SELECT f.query_id, f.doc_id,
         {rnd_sql(
             "count(*) * 1.0"
             " / (any_value(ql.qlen) + any_value(nd.nd) - count(*))",
             6,
         )}
           AS jaccard
  FROM tf f
  JOIN ndist nd ON nd.doc_id = f.doc_id
  JOIN qlen ql ON ql.query_id = f.query_id
  GROUP BY 1, 2
), jac_list AS (
  SELECT query_id, doc_id AS cand_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY jaccard DESC, doc_id) AS jaccard_rank
  FROM jac QUALIFY jaccard_rank <= {_TOP_K}
), fused AS (
  SELECT coalesce(b.query_id, j.query_id) AS query_id,
         coalesce(b.cand_id, j.cand_id) AS cand_id,
         coalesce(b.bm25_rank, -1)::BIGINT AS bm25_rank,
         coalesce(j.jaccard_rank, -1)::BIGINT AS jaccard_rank,
         {rnd_sql(
             "coalesce(1.0 / (60 + b.bm25_rank), 0.0)"
             " + coalesce(1.0 / (60 + j.jaccard_rank), 0.0)",
             6,
         )} AS rrf_score
  FROM bm25_list b FULL OUTER JOIN jac_list j
    ON j.query_id = b.query_id AND j.cand_id = b.cand_id
)
SELECT query_id, cand_id, bm25_rank, jaccard_rank, rrf_score,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY rrf_score DESC, cand_id) AS fused_rank
FROM fused
QUALIFY fused_rank <= 5
ORDER BY query_id, fused_rank
""",
)
def sim_hybrid_lexical_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical retrieval: reciprocal-rank fusion of the BM25
    top-10 with a query-token Jaccard top-10 (|overlap| / (|q| + distinct
    doc tokens − |overlap|)) through the ranking-agnostic
    ``operators.similarity.rrf_fuse`` — the same combiner the vector
    pair uses, here composing two lexical scorers (the production
    hybrid-search shape with both legs on the documents table).

    Scale shape: both legs are matched-postings aggregates + per-query
    windows over ≤top-k rows; the fusion is a (query, cand) full-outer
    equi-join over n_queries × ≤2k rows regardless of corpus size."""
    from redis_streams_spark.operators.similarity import rrf_fuse

    _, tf, _, _, _ = _lex_frames(spark, sf_dir)
    scored = _bm25_scored(spark, sf_dir)
    wq = W.partitionBy("query_id")
    bm25_list = (
        scored.withColumn(
            "bm25_rank",
            F.row_number()
            .over(wq.orderBy(F.desc("bm25"), "doc_id"))
            .cast("long"),
        )
        .where(F.col("bm25_rank") <= _TOP_K)
        .select("query_id", F.col("doc_id").alias("cand_id"), "bm25_rank")
    )
    docs = load_table(spark, sf_dir, "documents")
    ndist = (
        docs.select("doc_id", F.explode(words("text")).alias("tok"))
        .groupBy("doc_id")
        .agg(F.countDistinct("tok").alias("nd"))
    )
    # |q| derived from the ONE query constant (not a literal 3): editing
    # _BM25_QUERIES to a different term count keeps both engines honest
    # because the oracle derives qlen from the same VALUES list (r10
    # ADVICE fix)
    qlen = spark.createDataFrame(
        [(qid, len(terms)) for qid, terms in _BM25_QUERIES.items()],
        "query_id INT, qlen INT",
    )
    jac = (
        tf.join(ndist, "doc_id")
        .join(F.broadcast(qlen), "query_id")
        .groupBy("query_id", "doc_id")
        .agg(
            rnd(
                F.count(F.lit(1))
                * 1.0
                / (F.first("qlen") + F.first("nd") - F.count(F.lit(1))),
                6,
            ).alias("jaccard")
        )
    )
    jac_list = (
        jac.withColumn(
            "jaccard_rank",
            F.row_number()
            .over(wq.orderBy(F.desc("jaccard"), "doc_id"))
            .cast("long"),
        )
        .where(F.col("jaccard_rank") <= _TOP_K)
        .select("query_id", F.col("doc_id").alias("cand_id"), "jaccard_rank")
    )
    return rrf_fuse(bm25_list, jac_list, k=5).orderBy(
        "query_id", "fused_rank"
    )


def _bm25_oracle(qterms_values: str) -> str:
    return f"""
WITH {_lex_cte(qterms_values)}, scored AS ({_BM25_SCORE_SQL}),
ranked AS (
  SELECT query_id, doc_id, bm25,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY bm25 DESC, doc_id) AS rank
  FROM scored
)
SELECT query_id, rank, doc_id, bm25
FROM ranked WHERE rank <= {_TOP_K}
ORDER BY query_id, rank
"""


_BM25_ORACLE = _bm25_oracle(_QTERMS_VALUES)

# One persisted index per (process, sf_dir), shared by every indexed
# query.  Build-once-and-reuse (r10 ADVICE fix): the old per-query
# static-overwrite rebuild could delete parquet files out from under a
# lazy DataFrame returned by an earlier call in the same process.  The
# uuid suffix keeps a recycled pid from colliding with a dead process's
# leftover tree.
_INDEX_CACHE: dict[str, str] = {}


def _shared_index(spark: SparkSession, sf_dir: str) -> str:
    path = _INDEX_CACHE.get(sf_dir)
    if path is None:
        import atexit
        import os
        import shutil
        import uuid

        from redis_streams_spark.operators.invindex import (
            build_inverted_index,
        )

        docs = load_table(spark, sf_dir, "documents")
        path = os.path.join(
            "/tmp/spark-graft-invidx",
            f"{os.getpid()}-{uuid.uuid4().hex[:8]}",
        )
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        build_inverted_index(docs, path)
        _INDEX_CACHE[sf_dir] = path
    return path


@register(
    "text_bm25_indexed",
    shape="bounded",
    tags=("text", "retrieval", "bm25", "index", "llm-pipeline"),
    oracle=_BM25_ORACLE,
)
def text_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 against a PERSISTED inverted index
    (operators/invindex.py): postings partitioned by
    h32(term) % 64 with per-doc lengths denormalized into the posting
    rows, so the query path reads only the query terms' buckets
    (partition pruning, plan-asserted in tests/test_invindex.py) and
    never joins a corpus-sized table.  Same arithmetic and SAME oracle
    as ``text_bm25_topk`` — a green driver row proves the persisted
    layout is value-identical to the from-scratch scorer, exactly the
    ``sim_ivf_indexed`` build-once/query-many adjudication."""
    from redis_streams_spark.operators.invindex import bm25_topk_indexed

    path = _shared_index(spark, sf_dir)
    return bm25_topk_indexed(spark, path, _BM25_QUERIES, k=_TOP_K).orderBy(
        "query_id", "rank"
    )


# Fixed test phrases (bigrams over the corpus vocabulary) — one
# constant feeding both engines, like _BM25_QUERIES.
_PHRASES: dict[int, tuple[str, str]] = {
    0: ("spark", "stream"),
    1: ("hash", "join"),
    2: ("window", "batch"),
}
_PHRASE_VALUES = ", ".join(
    f"({pid}, '{a}', '{b}')" for pid, (a, b) in _PHRASES.items()
)

_PHRASE_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {words_sql('text')} AS w FROM documents
), toks AS (
  SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) AS pos
  FROM base
), phrases(phrase_id, t1, t2) AS (VALUES {_PHRASE_VALUES})
SELECT p.phrase_id, a.doc_id, count(*)::BIGINT AS n_occurrences
FROM phrases p
JOIN toks a ON a.tok = p.t1
JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.tok = p.t2
GROUP BY 1, 2
"""


@register(
    "text_phrase_match",
    shape="per_row",
    tags=("text", "retrieval", "phrase", "llm-pipeline"),
    oracle=_PHRASE_ORACLE,
)
def text_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase (adjacent-bigram) matching via positional postings:
    documents containing each fixed two-word phrase, with occurrence
    counts — the positional-index query BM25's bag-of-words scoring
    cannot answer.

    Scale shape: positions come from one in-row ``posexplode``; each
    phrase's two term-posting sets are filtered by a broadcast semi-join
    BEFORE the adjacency join, so the (doc_id, pos) equi-join runs over
    matched postings only — never corpus × corpus.  Per-(phrase, doc)
    output, no sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(words("text")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    phrases = spark.createDataFrame(
        [(pid, a, b) for pid, (a, b) in _PHRASES.items()],
        "phrase_id INT, t1 STRING, t2 STRING",
    )
    first = toks.join(
        F.broadcast(phrases), toks["tok"] == phrases["t1"]
    ).select("phrase_id", "doc_id", "pos", "t2")
    second = (
        toks.join(
            F.broadcast(phrases.select("t2").distinct()),
            toks["tok"] == F.col("t2"),
            "semi",
        )
        .select(
            F.col("doc_id").alias("b_doc"),
            F.col("pos").alias("b_pos"),
            F.col("tok").alias("b_tok"),
        )
    )
    return (
        first.join(
            second,
            (F.col("b_doc") == F.col("doc_id"))
            & (F.col("b_pos") == F.col("pos") + 1)
            & (F.col("b_tok") == F.col("t2")),
        )
        .groupBy("phrase_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


@register(
    "text_phrase_indexed",
    shape="per_row",
    tags=("text", "retrieval", "phrase", "index", "llm-pipeline"),
    oracle=_PHRASE_ORACLE,
)
def text_phrase_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase matching against the PERSISTED positional index
    (operators/invindex.py): postings carry sorted position lists, so
    adjacency is an in-row array intersect over the two terms' posting
    rows — only the phrase terms' buckets are read (partition pruning),
    and no positional explode happens at query time.  Same oracle as
    the from-scratch ``text_phrase_match``, so a green driver row
    proves the positional layout is value-identical — the
    ``text_bm25_indexed`` adjudication applied to phrase queries."""
    from redis_streams_spark.operators.invindex import phrase_match_indexed

    path = _shared_index(spark, sf_dir)
    return phrase_match_indexed(spark, path, _PHRASES)


_SPECTRUM_MAX_R = 10


@register(
    "text_freq_spectrum",
    shape="bounded+prefix_sum",
    tags=("text", "vocabulary", "llm-pipeline"),
    oracle=f"""
WITH toks AS (
  SELECT unnest({words_sql('text')}) AS term FROM documents
), vc AS (
  SELECT term, count(*) AS freq FROM toks GROUP BY term
), spectrum AS (
  SELECT freq AS r, count(*) AS n_r FROM vc GROUP BY freq
), ranked AS (
  SELECT r, n_r, row_number() OVER (ORDER BY r) AS spectrum_rank
  FROM spectrum
), tot AS (
  SELECT sum(freq)::BIGINT AS total_tokens, count(*)::BIGINT AS vocab
  FROM vc
)
SELECT s.spectrum_rank::BIGINT AS spectrum_rank,
       s.r::BIGINT AS r, s.n_r::BIGINT AS n_r,
       {rnd_sql('s.n_r * 1.0 / tot.vocab', 6)} AS vocab_frac,
       {rnd_sql('s.r * s.n_r * 1.0 / tot.total_tokens', 6)} AS mass_frac,
       {rnd_sql('(s.r + 1) * coalesce(s2.n_r, 0) * 1.0 / s.n_r', 6)}
         AS gt_rstar
FROM ranked s
LEFT JOIN spectrum s2 ON s2.r = s.r + 1
CROSS JOIN tot
WHERE s.spectrum_rank <= {_SPECTRUM_MAX_R}
ORDER BY s.r
""",
)
def text_freq_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-of-frequencies spectrum with Good-Turing smoothing:
    for the 10 SMALLEST occurrence counts r in the corpus, the number
    of vocabulary terms seen exactly r times, their vocabulary and
    token-mass fractions, and the Good-Turing adjusted count
    r* = (r+1)·n_{r+1}/n_r.  The lowest-r mass fraction is the
    Good-Turing estimate of unseen-event probability — the
    corpus-growth signal (with Heaps' law) that says how much new
    vocabulary more crawling would buy.  ("Smallest 10 present", not
    "r ≤ 10": on a fixed-vocabulary corpus no term may be rare, and an
    always-empty report would be a silent no-op.)

    Scale shape: token counts aggregate to the vocabulary frame, the
    spectrum is an aggregate OF that aggregate (one row per distinct
    occurrence count — O(sqrt(total tokens)) rows); the smallest-10
    selection is an ascending bucketed prefix-sum rank over
    log-frequency buckets (operators/prefix.py — no global window even
    on the bounded spectrum); the r+1 lookup is a self-equi-join on the
    tiny spectrum; totals broadcast back."""
    from redis_streams_spark.operators.prefix import bucketed_cumsum

    docs = load_table(spark, sf_dir, "documents")
    vc = (
        docs.select(F.explode(words("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    spectrum = vc.groupBy(F.col("freq").alias("r")).agg(
        F.count(F.lit(1)).alias("n_r")
    )
    ranked = bucketed_cumsum(
        spectrum.withColumn("__lf", F.log(F.col("r").cast("double")))
        .withColumn("__one", F.lit(1)),
        "r",
        [("__one", "spectrum_rank", True)],
        width=0.5,
        bucket_col="__lf",
    ).drop("__lf", "__one")
    tot = vc.agg(
        F.sum("freq").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    nxt = spectrum.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_next")
    )
    return (
        ranked.where(F.col("spectrum_rank") <= _SPECTRUM_MAX_R)
        .join(F.broadcast(nxt), "r", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("spectrum_rank").cast("long").alias("spectrum_rank"),
            F.col("r").cast("long").alias("r"),
            F.col("n_r").cast("long").alias("n_r"),
            rnd(F.col("n_r") * 1.0 / F.col("vocab"), 6).alias("vocab_frac"),
            rnd(
                F.col("r") * F.col("n_r") * 1.0 / F.col("total_tokens"), 6
            ).alias("mass_frac"),
            rnd(
                (F.col("r") + 1)
                * F.coalesce(F.col("n_r_next"), F.lit(0))
                * 1.0
                / F.col("n_r"),
                6,
            ).alias("gt_rstar"),
        )
        .orderBy("r")
    )


# N-word phrases: a mix of 3- and 4-grams over the corpus vocabulary,
# including a repeated-term phrase (the degenerate case a bigram-only
# matcher can't even express) — one constant feeding both engines.
_NGRAM_PHRASES: dict[int, tuple[str, ...]] = {
    0: ("hash", "scan", "join"),
    1: ("data", "line", "join"),
    2: ("batch", "batch", "batch"),
    3: ("order", "sort", "table", "scan"),
}
_NGRAM_VALUES = ", ".join(
    f"({pid}, {i}, '{t}')"
    for pid, terms in _NGRAM_PHRASES.items()
    for i, t in enumerate(terms)
)

# Start-position formulation shared by the oracle and the from-scratch
# Spark twin: a token matching phrase slot idx at position pos votes
# for phrase start pos - idx; a start with ALL slots voting (count of
# DISTINCT idx = phrase length) is an occurrence.  Repeated terms vote
# for several slots from the same token row, which is exactly right.
_NGRAM_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {words_sql('text')} AS w FROM documents
), toks AS (
  SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) AS pos
  FROM base
), pterms(phrase_id, idx, term) AS (VALUES {_NGRAM_VALUES}),
plen AS (
  SELECT phrase_id, count(*) AS plen FROM pterms GROUP BY 1
), cand AS (
  SELECT p.phrase_id, t.doc_id, t.pos - p.idx AS start, p.idx
  FROM toks t JOIN pterms p ON p.term = t.tok
), hits AS (
  SELECT c.phrase_id, c.doc_id, c.start
  FROM cand c JOIN plen l ON l.phrase_id = c.phrase_id
  GROUP BY c.phrase_id, c.doc_id, c.start, l.plen
  HAVING count(DISTINCT c.idx) = l.plen
)
SELECT phrase_id, doc_id, count(*)::BIGINT AS n_occurrences
FROM hits GROUP BY 1, 2
"""


@register(
    "text_phrase_ngram",
    shape="per_row",
    tags=("text", "retrieval", "phrase", "llm-pipeline"),
    oracle=_NGRAM_ORACLE,
)
def text_phrase_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact N-WORD phrase matching (3- and 4-grams, incl. a
    repeated-term phrase) from scratch — r10 verdict ask #2: the
    bigram-shaped ``text_phrase_match`` generalized.  Each matched
    token votes for a phrase START (pos − slot); starts with every
    slot voting are occurrences, so overlapping matches and repeated
    terms fall out of the same group-by.

    Scale shape: tokens are filtered by a broadcast semi-join on the
    phrase vocabulary BEFORE any aggregation, so the start-vote
    group-by runs over matched postings only — never the corpus cross
    itself; per-(phrase, doc) output, no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(words("text")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    pt = spark.createDataFrame(
        [
            (pid, i, t)
            for pid, terms in _NGRAM_PHRASES.items()
            for i, t in enumerate(terms)
        ],
        "phrase_id INT, idx INT, term STRING",
    )
    plen = spark.createDataFrame(
        [(pid, len(t)) for pid, t in _NGRAM_PHRASES.items()],
        "phrase_id INT, plen INT",
    )
    cand = toks.join(F.broadcast(pt), toks["tok"] == pt["term"]).select(
        "phrase_id",
        "doc_id",
        (F.col("pos") - F.col("idx")).alias("start"),
        "idx",
    )
    hits = (
        cand.join(F.broadcast(plen), "phrase_id")
        .groupBy("phrase_id", "doc_id", "start", "plen")
        .agg(F.countDistinct("idx").alias("m"))
        .where(F.col("m") == F.col("plen"))
    )
    return hits.groupBy("phrase_id", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )


@register(
    "text_phrase_ngram_indexed",
    shape="per_row",
    tags=("text", "retrieval", "phrase", "index", "llm-pipeline"),
    oracle=_NGRAM_ORACLE,
)
def text_phrase_ngram_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-word phrase matching against the PERSISTED positional index:
    per-term position lists fold through a chained in-row intersect
    (positions of slot i shifted by −i), so a surviving entry is a
    phrase start — only the phrase terms' buckets are read, no
    positional explode at query time.  Same oracle as the from-scratch
    ``text_phrase_ngram``: a green driver row proves the positional
    layout answers arbitrary-length phrases value-identically."""
    from redis_streams_spark.operators.invindex import phrase_match_indexed

    path = _shared_index(spark, sf_dir)
    return phrase_match_indexed(spark, path, _NGRAM_PHRASES)


# MaxScore query mix: the corpus has exactly one rare term ("dup",
# df ≈ 5%) amid ~30 common ones — query 0 and 2 pair it with common
# terms (their upper bounds fall below the rare term's 10th-best
# score, so their full posting lists are skipped), query 1 is
# all-common (no pruning possible: the exact-fallback path).
_MAXSCORE_QUERIES: dict[int, tuple[str, ...]] = {
    0: ("dup", "the", "a"),
    1: ("spark", "stream", "window"),
    2: ("dup", "vector"),
}
_MAXSCORE_VALUES = ", ".join(
    f"({qid}, '{t}')"
    for qid, terms in _MAXSCORE_QUERIES.items()
    for t in terms
)


@register(
    "text_bm25_maxscore",
    shape="bounded",
    tags=("text", "retrieval", "bm25", "index", "llm-pipeline"),
    oracle=_bm25_oracle(_MAXSCORE_VALUES),
)
def text_bm25_maxscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 with static MaxScore pruning against the persisted
    index (r10 verdict ask #3): ``terms/`` carries each segment's
    per-term max tf, the query plans an avgdl-free idf-weighted upper
    bound per term, seeds a threshold from the best term's k-th
    single-term score, and skips scoring the full posting lists of
    terms whose cumulative bound can't reach it — docs touching only
    those terms can't enter the top-k.  The oracle is the plain
    exhaustive BM25 over the same (rare ∪ common) query mix, so a
    green driver row proves the pruning is lossless."""
    from redis_streams_spark.operators.invindex import bm25_topk_maxscore

    path = _shared_index(spark, sf_dir)
    return bm25_topk_maxscore(
        spark, path, _MAXSCORE_QUERIES, k=_TOP_K
    ).orderBy("query_id", "rank")


@register(
    "text_bm25_replace",
    shape="bounded",
    tags=("text", "retrieval", "bm25", "index", "llm-pipeline"),
    oracle=_BM25_ORACLE,
)
def text_bm25_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 against an index that went through the DOCUMENT
    REFRESH lifecycle (r10 verdict ask #1): build over the full corpus,
    then re-ingest a slice of documents with
    ``update_inverted_index(..., replace=True)`` — tombstone the old
    copies, land the batch as a new segment, with negative df/avgdl
    partials netting the dead rows out at read time.  The re-ingested
    text is unchanged, so the final corpus equals the original and the
    oracle is plain exhaustive BM25: a green driver row proves the
    tombstone path is value-identical to a rebuild — the dedup-refresh
    re-ingest the r09 caller contract forbade.

    Builds a private throwaway index per call (a mutating query must
    never share ``_shared_index``'s read-only tree); unique path +
    atexit cleanup per the r10 index-reuse advice."""
    import atexit
    import os
    import shutil
    import uuid

    from redis_streams_spark.operators.invindex import (
        bm25_topk_indexed,
        build_inverted_index,
        update_inverted_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(
        "/tmp/spark-graft-invidx",
        f"replace-{os.getpid()}-{uuid.uuid4().hex[:8]}",
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    build_inverted_index(docs, path)
    update_inverted_index(
        docs.where(F.col("doc_id") % 7 == 3),
        path,
        segment="refresh1",
        replace=True,
    )
    return bm25_topk_indexed(spark, path, _BM25_QUERIES, k=_TOP_K).orderBy(
        "query_id", "rank"
    )


@register(
    "text_bm25_auto",
    shape="bounded",
    tags=("text", "retrieval", "bm25", "index", "llm-pipeline"),
    oracle=_bm25_oracle(_MAXSCORE_VALUES),
)
def text_bm25_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based BM25 routing (r11 verdict ask #3): one entry point
    reads the bounded ``terms/`` df metadata and picks exact vs
    MaxScore PER QUERY from the SCALE.md crossover inputs (total
    matched postings vs the static essential-candidate bound).  Run
    here with ``postings_threshold=1`` so the driver-graded row
    exercises a genuinely MIXED plan: the rare∧common queries route
    through MaxScore pruning, the all-common query routes to exact
    scoring (its residual candidate bound fails the cut-ratio gate —
    pruning would not pay), and the union must still match the plain
    exhaustive-BM25 oracle value-for-value — routing is physical, the
    answer is one.  At production defaults the threshold is the
    measured 10⁸-posting crossover and everything below routes exact
    (tests pin both regimes)."""
    from redis_streams_spark.operators.invindex import bm25_topk_auto

    path = _shared_index(spark, sf_dir)
    return bm25_topk_auto(
        spark, path, _MAXSCORE_QUERIES, k=_TOP_K, postings_threshold=1
    ).orderBy("query_id", "rank")
