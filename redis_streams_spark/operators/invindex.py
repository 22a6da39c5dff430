"""Persisted inverted index for keyword (BM25) retrieval — the lexical
twin of the persisted IVF cell store (operators/similarity.py::
build_ivf_index): build once, query many, with scan cost following the
QUERY's term list instead of the corpus.

Layout under ``path``:

- ``postings/`` — (tok, doc_id, tf, dl, positions) partitioned by
  ``(segment, bucket)`` with ``bucket = h32(tok) % N_TERM_BUCKETS``.
  The per-document length is DENORMALIZED into each posting row at
  build time, so query-time scoring never joins the corpus-sized
  doc-length table — the only corpus-sized work left at query time is
  reading the probed buckets.  ``positions`` is the sorted 1-based
  token-position list (tf = its size), making the index POSITIONAL:
  phrase adjacency is an in-row array intersect at query time.
- ``terms/`` — per-term document-frequency PARTIALS, same
  (segment, bucket) partitioning.
- ``stats/`` — corpus-stat partials: (n docs, sum of doc lengths),
  one row per segment.

Segments follow the Lucene discipline: ``update_inverted_index`` adds
a batch of documents as its own segment partition — no other segment
is read or rewritten, so updates are safe while readers run and never
touch corpus-sized data.  With a caller-supplied deterministic segment
name the write is a DYNAMIC partition overwrite, so a re-delivered
micro-batch (foreachBatch is at-least-once) replaces its own segment
instead of double-counting it.  The query path merges partials at
read time (df = sum per term over the probed buckets, avgdl = Σsum_dl /
Σn — both bounded frames), which keeps queries value-identical to a
from-scratch rebuild over the union corpus (tested).  Caller contract:
a doc_id belongs to exactly one batch — re-adding a document
double-counts it, exactly as appending a duplicate doc to any
segment-based index would.

Query path: the query terms' buckets are computed driver-side with
``h32_py`` (the Python twin of the same md5 hash the build used), and
the bucket IN-filter lands in the scan's PartitionFilters — dynamic
file pruning skips every unprobed bucket's files, so a 3-term query
against a 64-bucket index reads ≤3/64ths of the postings regardless of
corpus size (plan-asserted in tests/test_invindex.py).

Reference basis: none (SURVEY §2.2 extension surface — the reference
has no query layer)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.hashing import h32, h32_py
from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.functions.textfns import words

__all__ = [
    "N_TERM_BUCKETS",
    "build_inverted_index",
    "update_inverted_index",
    "compact_inverted_index",
    "bm25_topk_indexed",
    "phrase_match_indexed",
]

N_TERM_BUCKETS = 64

_K1 = 1.2
_B = 0.75


def _write_segment(
    docs: DataFrame,
    path: str,
    mode: str,
    segment: str,
    dynamic: bool = False,
) -> None:
    base = docs.select("doc_id", words("text").alias("w"))
    dl = base.where(F.size("w") > 0).select(
        "doc_id", F.size("w").cast("long").alias("dl")
    )
    toks = base.select(
        "doc_id", F.posexplode("w").alias("pos0", "tok")
    ).select("doc_id", "tok", (F.col("pos0") + 1).cast("long").alias("pos"))
    # the postings lineage (tokenize + explode + groupBy + join) feeds
    # all three writes — persist it once instead of re-tokenizing the
    # corpus for the terms write; stats derives from the persisted
    # postings too ((n, sum_dl) over one row per doc: dl rides on every
    # posting, so min(dl) per doc_id == dl)
    postings = (
        toks.groupBy("tok", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
        .join(dl, "doc_id")
        .withColumn("bucket", h32("tok") % N_TERM_BUCKETS)
        .withColumn("segment", F.lit(segment))
        .persist()
    )
    # dynamic partition overwrite: an "overwrite" write replaces ONLY
    # the partitions it produces (this segment's), never other segments
    # — the idempotent-replay mechanism for streaming ingestion.  The
    # initial build keeps STATIC mode so it clears the whole tree
    # (dynamic would leave stale segments from a previous index alive).
    owm = ("partitionOverwriteMode", "dynamic" if dynamic else "static")
    try:
        # one shuffle keyed on the partition column so each bucket writes
        # from one task set instead of |tasks| x |buckets| small files
        postings.repartition("bucket").write.mode(mode).option(*owm).partitionBy(
            "segment", "bucket"
        ).parquet(f"{path}/postings")
        terms = (
            postings.groupBy("tok", "segment", "bucket")
            .agg(F.count(F.lit(1)).alias("df"))
            .repartition("bucket")
        )
        terms.write.mode(mode).option(*owm).partitionBy(
            "segment", "bucket"
        ).parquet(f"{path}/terms")
        postings.groupBy("doc_id").agg(F.min("dl").alias("dl")).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("dl").cast("long").alias("sum_dl"),
        ).withColumn("segment", F.lit(segment)).write.mode(mode).option(
            *owm
        ).partitionBy("segment").parquet(f"{path}/stats")
    finally:
        postings.unpersist()


def build_inverted_index(docs: DataFrame, path: str) -> None:
    """Write the bucket-partitioned postings/terms/stats layout for the
    ``documents``-shaped frame (doc_id, text) as segment ``base``."""
    _write_segment(docs, path, "overwrite", "base")


def update_inverted_index(
    docs_new: DataFrame, path: str, segment: str | None = None
) -> None:
    """Add a new document batch as a segment: postings rows, term-df
    partials, one corpus-stats partial — no existing segment is read or
    rewritten.  Queries merge partials at read time, so the updated
    index answers exactly like a full rebuild over the union corpus.

    ``segment`` names the batch's partition.  Pass a DETERMINISTIC name
    (e.g. the foreachBatch ``batchId``) for replay-safe streaming
    ingestion: the write uses dynamic partition overwrite, so a
    re-delivered micro-batch REPLACES its own segment instead of
    double-counting it (Spark's foreachBatch is at-least-once — r10
    review finding).  With ``segment=None`` a plain append is performed
    under an opaque unique name, which is only safe for exactly-once
    callers."""
    if segment is not None:
        _write_segment(docs_new, path, "overwrite", segment, dynamic=True)
    else:
        import uuid

        _write_segment(docs_new, path, "append", uuid.uuid4().hex[:12])


def phrase_match_indexed(
    spark: SparkSession,
    path: str,
    phrases: dict[int, tuple[str, str]],
) -> DataFrame:
    """Exact two-word phrase matching against the persisted positional
    index: read only the phrase terms' buckets, equi-join the two term
    posting lists per document, and count adjacencies with an IN-ROW
    array intersect (positions of t1 shifted by one ∩ positions of t2)
    — no positional explode, no corpus-sized join.  Returns
    (phrase_id, doc_id, n_occurrences), the same frame as the
    from-scratch ``text_phrase_match``."""
    terms = {t for pair in phrases.values() for t in pair}
    buckets = sorted({h32_py(t) % N_TERM_BUCKETS for t in terms})
    postings = spark.read.parquet(f"{path}/postings").where(
        F.col("bucket").isin(buckets)
    )
    pf = F.broadcast(
        spark.createDataFrame(
            [(pid, a, b) for pid, (a, b) in phrases.items()],
            "phrase_id INT, t1 STRING, t2 STRING",
        )
    )
    first = postings.join(pf, postings["tok"] == pf["t1"]).select(
        "phrase_id", "doc_id", F.col("positions").alias("p1"), "t2"
    )
    second = postings.select(
        F.col("doc_id").alias("b_doc"),
        F.col("tok").alias("b_tok"),
        F.col("positions").alias("p2"),
    )
    n_adj = F.size(
        F.array_intersect(
            F.transform(F.col("p1"), lambda x: x + 1), F.col("p2")
        )
    )
    return (
        first.join(
            second,
            (F.col("b_doc") == F.col("doc_id"))
            & (F.col("b_tok") == F.col("t2")),
        )
        .select(
            "phrase_id",
            "doc_id",
            n_adj.cast("long").alias("n_occurrences"),
        )
        .where(F.col("n_occurrences") > 0)
    )


def compact_inverted_index(spark: SparkSession, src: str, dst: str) -> None:
    """Rewrite an accumulated multi-segment index as one segment at
    ``dst``: postings re-bucketed into one file set per bucket, term-df
    partials collapsed to one row per (term, bucket), stats partials to
    one row.  Compaction writes to a NEW path (the reader contract is
    append-only files, so compact-in-place would race live readers) —
    swap paths atomically at the catalog/config layer, then drop the old
    tree.  Query results are value-identical before and after (tested)."""
    postings = spark.read.parquet(f"{src}/postings").withColumn(
        "segment", F.lit("base")
    )
    postings.repartition("bucket").write.mode("overwrite").partitionBy(
        "segment", "bucket"
    ).parquet(f"{dst}/postings")
    (
        spark.read.parquet(f"{src}/terms")
        .groupBy("tok", "bucket")
        .agg(F.sum("df").alias("df"))
        .withColumn("segment", F.lit("base"))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("segment", "bucket")
        .parquet(f"{dst}/terms")
    )
    (
        spark.read.parquet(f"{src}/stats")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_dl").cast("long").alias("sum_dl"),
        )
        .withColumn("segment", F.lit("base"))
        .write.mode("overwrite")
        .partitionBy("segment")
        .parquet(f"{dst}/stats")
    )


def bm25_topk_indexed(
    spark: SparkSession,
    path: str,
    queries: dict[int, tuple[str, ...]],
    k: int = 10,
) -> DataFrame:
    """Okapi BM25 top-k per query against a persisted index — identical
    arithmetic (and oracle) to the from-scratch ``text_bm25_topk``.

    ``queries`` maps query_id → term tuple; only the terms' buckets are
    read (driver-side ``h32_py``, matching the build's ``h32``)."""
    pairs = [(qid, t) for qid, terms in queries.items() for t in terms]
    buckets = sorted({h32_py(t) % N_TERM_BUCKETS for _, t in pairs})
    qterms = F.broadcast(
        spark.createDataFrame(pairs, "query_id INT, term STRING")
    )
    postings = spark.read.parquet(f"{path}/postings").where(
        F.col("bucket").isin(buckets)
    )
    terms = spark.read.parquet(f"{path}/terms").where(
        F.col("bucket").isin(buckets)
    )
    # merge the append-only segment partials at read time: per-term df
    # over the probed buckets, (n, avgdl) over the stats partials — both
    # bounded frames regardless of segment count
    stats = (
        spark.read.parquet(f"{path}/stats")
        .agg(F.sum("n").cast("long").alias("n"), F.sum("sum_dl").alias("sdl"))
        .select("n", (F.col("sdl") * 1.0 / F.col("n")).alias("avgdl"))
    )

    matched = postings.join(qterms, postings["tok"] == qterms["term"])
    dfreq = (
        terms.join(
            qterms.select("term").distinct(), terms["tok"] == F.col("term")
        )
        .groupBy("tok")
        .agg(F.sum("df").alias("df"))
        .select(F.col("tok").alias("df_tok"), "df")
    )
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    term_score = idf * (F.col("tf") * (_K1 + 1.0)) / (
        F.col("tf") + _K1 * ((1.0 - _B) + _B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        matched.join(F.broadcast(dfreq), matched["tok"] == F.col("df_tok"))
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(rnd(F.sum(term_score), 6).alias("bm25"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("bm25"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "bm25")
    )
