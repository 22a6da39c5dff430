"""Dataset splitting and split-hygiene auditing (SURVEY §2.2 / LLM
pipeline extension; no counterpart in the reference).

- q_train_val_test: deterministic hash-bucketed 80/10/10 split with
  per-split composition stats — replay-stable (a document's split never
  changes as the corpus grows) and skew-visible.
- dedup_cross_split_leakage: exact-duplicate content that crosses the
  train/test boundary — the train-test contamination audit that must
  gate every split before training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.functions.hashing import h32, h32_sql
from redis_streams_spark.functions.rounding import rnd
from redis_streams_spark.operators.dedup import normalized_text
from redis_streams_spark.queries.base import register
from redis_streams_spark.queries.dedup import _NORM_SQL
from redis_streams_spark.session import load_table

_TRAIN_PCT = 80
_VAL_PCT = 90  # train < 80 <= val < 90 <= test

_SPLIT_SQL = f"""CASE
  WHEN {h32_sql("doc_id::VARCHAR")} % 100 < {_TRAIN_PCT} THEN 'train'
  WHEN {h32_sql("doc_id::VARCHAR")} % 100 < {_VAL_PCT} THEN 'val'
  ELSE 'test' END"""


def _split_col() -> F.Column:
    b = h32(F.col("doc_id").cast("string")) % 100
    return (
        F.when(b < _TRAIN_PCT, "train")
        .when(b < _VAL_PCT, "val")
        .otherwise("test")
    )


@register(
    "q_train_val_test",
    shape="bounded",
    tags=("mixing", "splits", "llm-pipeline"),
    oracle=f"""
WITH s AS (
  SELECT {_SPLIT_SQL} AS split, lang, n_chars FROM documents
), cells AS (
  SELECT split, lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS n_chars
  FROM s GROUP BY split, lang
)
SELECT split, lang, n_docs, n_chars,
       round(5e-10 + n_docs * 1.0 / sum(n_docs) OVER (PARTITION BY split), 6)
         AS share_of_split
FROM cells
ORDER BY split, lang
""",
)
def q_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by document-id hash
    bucket, with each split's language composition — replay-stable (a
    doc's split never changes as the corpus grows) and immediately
    showing composition drift between splits.

    Scale shape: the split is a scan-stage expression; one (split, lang)
    aggregation; the share window runs over the tiny cell aggregate.

    Reference basis: none."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.select(_split_col().alias("split"), "lang", "n_chars")
    cells = s.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("n_chars")
    )
    return cells.select(
        "split",
        "lang",
        "n_docs",
        "n_chars",
        rnd(
            F.col("n_docs") * 1.0 / F.sum("n_docs").over(W.partitionBy("split")),
            6,
        ).alias("share_of_split"),
    ).orderBy("split", "lang")


@register(
    "dedup_cross_split_leakage",
    shape="bounded",
    tags=("dedup", "splits", "llm-pipeline"),
    oracle=f"""
WITH s AS (
  SELECT doc_id, {_SPLIT_SQL} AS split, md5({_NORM_SQL}) AS content_hash
  FROM documents
), train_hashes AS (
  SELECT DISTINCT content_hash FROM s WHERE split = 'train'
), test_docs AS (
  SELECT doc_id, content_hash FROM s WHERE split = 'test'
)
SELECT (SELECT count(*) FROM s WHERE split = 'train') AS n_train,
       count(*) AS n_test,
       sum(CASE WHEN t.content_hash IN (SELECT content_hash FROM train_hashes)
                THEN 1 ELSE 0 END)::BIGINT AS n_test_leaked,
       round(5e-10 + sum(CASE WHEN t.content_hash IN
                              (SELECT content_hash FROM train_hashes)
                              THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS leak_rate
FROM test_docs t
""",
)
def dedup_cross_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→test contamination audit: test documents whose normalized
    content hash ALSO appears in the train split — exact duplicates that
    cross the split boundary inflate eval scores; this is the gate a
    pipeline runs between splitting and training (the near-dup variant
    composes operators/dedup's LSH pairs the same way).

    Scale shape: split + hash are scan-stage expressions; the leak check
    is one LEFT SEMI join on the digest (train hashes are
    vocabulary-of-duplicates-sized — broadcastable in practice).

    Reference basis: none."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        _split_col().alias("split"),
        F.md5(normalized_text()).alias("content_hash"),
    )
    train_hashes = (
        s.where(F.col("split") == "train").select("content_hash").distinct()
    )
    test_docs = s.where(F.col("split") == "test").select(
        "doc_id", "content_hash"
    )
    leaked = test_docs.join(train_hashes, "content_hash", "left_semi")
    n_train = s.where(F.col("split") == "train").agg(
        F.count(F.lit(1)).alias("n_train")
    )
    stats = test_docs.agg(F.count(F.lit(1)).alias("n_test")).crossJoin(
        F.broadcast(leaked.agg(F.count(F.lit(1)).alias("n_test_leaked")))
    )
    return (
        n_train.crossJoin(F.broadcast(stats))
        .select(
            "n_train",
            "n_test",
            "n_test_leaked",
            rnd(F.col("n_test_leaked") * 1.0 / F.col("n_test"), 6).alias(
                "leak_rate"
            ),
        )
    )
