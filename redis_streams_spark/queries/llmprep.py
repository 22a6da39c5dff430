"""Training-data preparation operators: sequence packing, TF-IDF term
scoring, embedding quantization — plus the recursive-CTE surface (Spark 4
``WITH RECURSIVE``) exercised on a key hierarchy.

These are the steps between a cleaned corpus and a tokenized training set:
pack documents into fixed-length sequences, score terms for filtering or
retrieval, and quantize embedding vectors for a compact ANN index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd, rnd_sql
from redis_streams_spark.functions.textfns import words, words_sql
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_SEQ_LEN = 512  # tokens per packed training sequence


@register(
    "q_seq_packing",
    shape="per_row",
    tags=("tokens", "packing", "llm-pipeline"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, len({words_sql('text')})::BIGINT AS n_tokens
  FROM documents
), cum AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING)::BIGINT - n_tokens
           AS cum_before
  FROM toks
)
SELECT doc_id, source, n_tokens,
       (cum_before // {_SEQ_LEN})::BIGINT AS chunk_id,
       (cum_before % {_SEQ_LEN})::BIGINT AS offset_in_chunk,
       ((cum_before % {_SEQ_LEN}) + n_tokens > {_SEQ_LEN}) AS spans_boundary
FROM cum
ORDER BY source, doc_id
""",
)
def q_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: per source, documents are laid
    end-to-end in doc_id order and cut into {512}-token training
    sequences; each doc gets its chunk id, offset, and a spans-boundary
    flag.  One window cumsum partitioned by source — at 100 TB the
    packing is embarrassingly parallel across sources (and within a
    source, hierarchical packing by (source, shard) keeps any single
    window partition bounded; same plan shape)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.size(words("text")).cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    return (
        toks.select(
            "doc_id",
            "source",
            "n_tokens",
            cum_before.alias("cum_before"),
        )
        .select(
            "doc_id",
            "source",
            "n_tokens",
            # integer `div`, not float `/`: a double quotient rounds above
            # 2^53 cumulative tokens and would diverge from the oracle's
            # exact `//` at the scales this module advertises
            F.expr(f"cum_before div {_SEQ_LEN}").alias("chunk_id"),
            (F.col("cum_before") % _SEQ_LEN).cast("long").alias("offset_in_chunk"),
            ((F.col("cum_before") % _SEQ_LEN) + F.col("n_tokens") > _SEQ_LEN).alias(
                "spans_boundary"
            ),
        )
    )


@register(
    "text_tfidf",
    shape="per_row",
    tags=("text", "tfidf", "llm-pipeline"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({words_sql('text')}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         {rnd_sql('tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0))', 6)} AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rn
      FROM scored) t
WHERE rn <= 5
ORDER BY doc_id, tfidf DESC, term
""",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document.  Two partial-aggregated shuffles
    (term counts per doc; document frequency per term), an equi-join on
    the term (vocabulary-sized, not corpus-sized), and a per-doc top-k
    window.  The corpus size enters as a broadcast scalar, not a join of
    the big sides."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(words("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # corpus size as a lazy 1-row crossJoin (the SQL's CROSS JOIN n):
    # an eager docs.count() here would fire a Spark job every time the
    # PLAN is built — the fleet plan sweep and the driver gate both
    # construct plans without collecting
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = tf.join(df_, "term").crossJoin(n).select(
        "doc_id",
        "term",
        "tf",
        "df",
        rnd(F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


# list_reduce (not list_aggregate 'sum'): a strict left-fold whose
# float-addition order matches Spark's F.aggregate exactly — 'sum' is free
# to reassociate and drifts in the last ulp on ~60% of vectors
_ERR_EXPR = (
    "list_reduce(list_transform(range(1, len(v) + 1), "
    "i -> abs(qv[i] * (maxabs / 127.0) - v[i])), (acc, x) -> acc + x) / len(v)"
)


@register(
    "q_embed_quantize",
    shape="per_row",
    tags=("embeddings", "quantization", "llm-pipeline"),
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
), s AS (
  SELECT vec_id, v,
         list_aggregate(list_transform(v, x -> abs(x)), 'max') AS maxabs
  FROM e
), q AS (
  SELECT vec_id, maxabs,
         list_transform(v, x -> floor(x * (127.0 / maxabs) + 0.5)) AS qv,
         v
  FROM s WHERE maxabs > 0
)
SELECT vec_id,
       {rnd_sql('maxabs', 6)} AS maxabs,
       list_aggregate(qv, 'sum')::BIGINT AS q_sum,
       list_aggregate(list_transform(qv, x -> x * x), 'sum')::BIGINT AS q_sumsq,
       {rnd_sql(_ERR_EXPR, 8)}
         AS mean_abs_err
FROM q
ORDER BY vec_id
""",
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization: per-vector scale
    127/max|x|, quantize with ``floor(x*scale + 0.5)`` (identical IEEE
    arithmetic on both engines — no round-half ambiguity), report exact
    integer checksums of the quantized vector plus the mean absolute
    dequantization error.  Per-row array expressions only; at 100 TB this
    is a map-only pass that cuts ANN index memory 4× (the IVF/LSH
    operators accept the dequantized vectors unchanged)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    s = e.select(
        "vec_id",
        "v",
        F.array_max(F.transform("v", lambda x: F.abs(x))).alias("maxabs"),
    ).where(F.col("maxabs") > 0)
    scale = 127.0 / F.col("maxabs")
    # renamed to maxabs_raw: the final select outputs a ROUNDED column
    # named `maxabs`, and Spark's lateral-column-alias resolution would
    # otherwise bind the F.col("maxabs") inside the error expression to
    # that rounded sibling alias instead of the child column (measured:
    # shifts mean_abs_err by ~1e-8 — enough to flip the 8dp hash gate)
    q = s.select(
        "vec_id",
        F.col("maxabs").alias("maxabs_raw"),
        "v",
        F.transform("v", lambda x: F.floor(x * scale + 0.5)).alias("qv"),
    )
    inv = F.col("maxabs_raw") / 127.0
    err_terms = F.zip_with(
        F.col("qv"), F.col("v"), lambda qx, vx: F.abs(qx * inv - vx)
    )
    return (
        q.select(
            "vec_id",
            rnd(F.col("maxabs_raw"), 6).alias("maxabs"),
            F.aggregate(
                "qv", F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
            ).alias("q_sum"),
            F.aggregate(
                "qv", F.lit(0).cast("long"), lambda acc, x: acc + (x * x).cast("long")
            ).alias("q_sumsq"),
            rnd(
                F.aggregate(err_terms, F.lit(0.0), lambda acc, x: acc + x)
                / F.size("v"),
                8,
            ).alias("mean_abs_err"),
        )
    )


@register(
    "q_recursive_cte",
    shape="bounded",
    tags=("recursive", "sql-surface"),
    oracle="""
WITH RECURSIVE up(custkey, anc, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 1000
  UNION ALL
  SELECT custkey, anc // 10, depth + 1 FROM up WHERE anc >= 10
)
SELECT custkey, min(anc)::BIGINT AS root, max(depth)::BIGINT AS depth
FROM up
GROUP BY custkey
ORDER BY custkey
""",
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE`` — UnionLoop execution):
    walk the implicit decimal hierarchy ``parent = custkey div 10`` to
    the single-digit root, reporting each key's root and depth.  Fixed
    recursion depth log10(maxkey); each iteration is a full DataFrame op
    so the loop distributes — no driver-side row iteration."""
    cust = load_table(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("customer_rc")
    return spark.sql(
        """
WITH RECURSIVE up(custkey, anc, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer_rc WHERE c_custkey < 1000
  UNION ALL
  SELECT custkey, anc div 10, depth + 1 FROM up WHERE anc >= 10
)
SELECT custkey, min(anc) AS root, max(depth) AS depth
FROM up
GROUP BY custkey
ORDER BY custkey
"""
    )


_CHUNK_TOKENS = 64  # tokens per retrieval/training chunk
_CHUNK_STRIDE = 48  # overlap = _CHUNK_TOKENS - _CHUNK_STRIDE


@register(
    "text_chunks",
    shape="per_row",
    tags=("tokens", "chunking", "llm-pipeline"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {words_sql('text')} AS w FROM documents
), sized AS (
  SELECT doc_id, w, greatest(len(w), 1) AS n FROM toks
), counted AS (
  SELECT doc_id, w, n,
         CASE WHEN n <= {_CHUNK_TOKENS} THEN 1
              ELSE 1 + (n - {_CHUNK_TOKENS} + {_CHUNK_STRIDE} - 1)
                       // {_CHUNK_STRIDE} END AS n_chunks
  FROM sized
), chunks AS (
  SELECT doc_id, w, n,
         unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
  FROM counted
)
SELECT doc_id,
       chunk_idx::BIGINT AS chunk_idx,
       (chunk_idx * {_CHUNK_STRIDE})::BIGINT AS start_tok,
       least(chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}, n)::BIGINT AS end_tok,
       (least(chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}, n)
         - chunk_idx * {_CHUNK_STRIDE})::BIGINT AS chunk_tokens,
       array_to_string(
         list_slice(w, chunk_idx * {_CHUNK_STRIDE} + 1,
                    least(chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}, n)),
         ' ') AS chunk_text
FROM chunks
ORDER BY doc_id, chunk_idx
""",
)
def text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (the RAG / long-context prep
    step): each document becomes ceil-strided windows of
    {64}-token chunks advancing {48} tokens, so consecutive chunks share a
    16-token overlap and the final window is allowed to run short.

    Scale shape: tokenization, the chunk-count arithmetic, and the
    sequence-explode all run inside the scan stage projection — no
    shuffle at all (the orderBy is presentation-only), no Python, and
    the explode fan-out is bounded by n_tokens/stride per doc.  The
    chunk text is re-joined from an array slice, which keeps the output
    row size bounded by the chunk length rather than the document
    length.  Deliberately NOT wrapped in the dedup family's ``fanout``
    rebalance: chunking is one cheap split + slice per row (unlike
    shingle+md5 work), and the full-text repartition costs more than the
    extra cores return (A/B at sf0.1: 0.9 s scan-parallel vs 1.4 s
    repartitioned)."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", words("text").alias("w")
    ).withColumn("n", F.greatest(F.size("w"), F.lit(1)))
    counted = sized.withColumn(
        "n_chunks",
        F.when(F.col("n") <= _CHUNK_TOKENS, F.lit(1)).otherwise(
            F.lit(1)
            + F.expr(
                f"(n - {_CHUNK_TOKENS} + {_CHUNK_STRIDE} - 1) div {_CHUNK_STRIDE}"
            )
        ),
    )
    chunks = counted.select(
        "doc_id",
        "w",
        "n",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * _CHUNK_STRIDE
    end = F.least(start + _CHUNK_TOKENS, F.col("n"))
    return (
        chunks.select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            start.cast("long").alias("start_tok"),
            end.cast("long").alias("end_tok"),
            (end - start).cast("long").alias("chunk_tokens"),
            F.array_join(
                F.slice(F.col("w"), start + 1, end - start), " "
            ).alias("chunk_text"),
        )
    )


@register(
    "dedup_chunks",
    shape="per_row",
    tags=("dedup", "chunking", "llm-pipeline"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {words_sql('text')} AS w FROM documents
), sized AS (
  SELECT doc_id, w, greatest(len(w), 1) AS n FROM toks
), counted AS (
  SELECT doc_id, w, n,
         CASE WHEN n <= {_CHUNK_TOKENS} THEN 1
              ELSE 1 + (n - {_CHUNK_TOKENS} + {_CHUNK_STRIDE} - 1)
                       // {_CHUNK_STRIDE} END AS n_chunks
  FROM sized
), chunks AS (
  SELECT doc_id,
         unnest(generate_series(0, n_chunks - 1)) AS chunk_idx, w, n
  FROM counted
), hashed AS (
  SELECT doc_id, chunk_idx,
         md5(array_to_string(
           list_slice(w, chunk_idx * {_CHUNK_STRIDE} + 1,
                      least(chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}, n)),
           ' ')) AS chunk_hash
  FROM chunks
), freq AS (
  SELECT chunk_hash, count(*) AS n_occurrences FROM hashed GROUP BY chunk_hash
)
SELECT h.doc_id,
       count(*) AS n_chunks,
       sum(CASE WHEN f.n_occurrences > 1 THEN 1 ELSE 0 END)::BIGINT
         AS n_dup_chunks,
       round(5e-10 + sum(CASE WHEN f.n_occurrences > 1 THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS dup_chunk_fraction
FROM hashed h JOIN freq f USING (chunk_hash)
GROUP BY h.doc_id
ORDER BY h.doc_id
""",
)
def dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granularity exact dedup: hash every token-window chunk
    (same windows as ``text_chunks``), count cross-corpus occurrences,
    and report each document's duplicated-chunk fraction — boilerplate
    shows up as high dup fraction even when whole-document hashes are
    unique.

    Scale shape: chunk production is scan-stage (one Generate); the only
    shuffles are keyed on the 32-byte chunk digest (count) and doc_id
    (report) — chunk text itself never shuffles (hashed in the
    projection)."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select("doc_id", words("text").alias("w")).withColumn(
        "n", F.greatest(F.size("w"), F.lit(1))
    )
    counted = sized.withColumn(
        "n_chunks",
        F.when(F.col("n") <= _CHUNK_TOKENS, F.lit(1)).otherwise(
            F.lit(1)
            + F.expr(
                f"(n - {_CHUNK_TOKENS} + {_CHUNK_STRIDE} - 1) div {_CHUNK_STRIDE}"
            )
        ),
    )
    start = F.col("chunk_idx") * _CHUNK_STRIDE
    end = F.least(start + _CHUNK_TOKENS, F.col("n"))
    hashed = counted.select(
        "doc_id",
        "w",
        "n",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx"),
    ).select(
        "doc_id",
        F.md5(F.array_join(F.slice(F.col("w"), start + 1, end - start), " ")).alias(
            "chunk_hash"
        ),
    )
    freq = hashed.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    dup = F.when(F.col("n_occurrences") > 1, 1).otherwise(0)
    return (
        hashed.join(freq, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(dup).cast("long").alias("n_dup_chunks"),
            rnd(F.sum(dup) * 1.0 / F.count(F.lit(1)), 6).alias(
                "dup_chunk_fraction"
            ),
        )
    )
