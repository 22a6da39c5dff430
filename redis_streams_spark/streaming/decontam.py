"""Streaming benchmark decontamination: flag documents in a stream whose
word n-grams overlap a held-out evaluation set.

The streaming composition of :func:`queries.contamination.text_decontaminate`:
the benchmark gram set is STATIC (eval suites change rarely) and small
relative to any corpus, so it rides a stream-static broadcast join — each
micro-batch is membership-tested map-side with no state store and no
shuffle of clean documents.  Batch and streaming verdicts agree because
both use the same shingle arithmetic (textfns.word_shingles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redis_streams_spark.functions.textfns import word_shingles, words


def benchmark_grams(bench_docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Distinct word n-grams of the benchmark corpus: one column ``gram``.

    Compute once and reuse across the query's lifetime; at 100 TB the
    benchmark is the small side by construction (eval suites), so the
    result broadcasts."""
    toks = bench_docs.select(words(F.col(text_col)).alias("w"))
    return (
        toks.select(F.explode(word_shingles(F.col("w"), n)).alias("gram")).distinct()
    )


def decontaminate_stream(
    typed_stream: DataFrame,
    bench: DataFrame,
    n: int = 3,
    threshold: float = 0.05,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document contamination verdicts for a stream.

    ``typed_stream`` needs (id_col, text_col).  Returns a streaming frame
    (id_col, n_grams, n_contaminated, contam_ratio, flagged).  The grams
    are exploded per document and inner-joined (broadcast) against the
    benchmark set; the per-doc count is a batch-local aggregation keyed
    by the document id, which is unique per row — so the aggregation
    needs no watermark/state (every group completes within its
    micro-batch under the exploded-rows-stay-in-epoch guarantee of
    foreachBatch; for a pure append-mode sink, run this inside
    foreachBatch like the near-dup handler).

    At-least-once delivery can hand one document to an epoch TWICE (same
    doc_id, different msgid); without dedup the hit count doubles and
    contam_ratio inflates past truth — so the id is deduplicated first.
    """
    typed_stream = typed_stream.dropDuplicates([id_col])
    sets_ = typed_stream.select(
        F.col(id_col),
        word_shingles(words(F.col(text_col)), n).alias("grams"),
    )
    exploded = sets_.select(id_col, F.size("grams").alias("n_grams"), F.explode("grams").alias("gram"))
    hits = exploded.join(F.broadcast(bench), "gram")
    counted = hits.groupBy(id_col, "n_grams").agg(
        F.count(F.lit(1)).alias("n_contaminated")
    )
    base = sets_.select(id_col, F.size("grams").cast("long").alias("n_grams"))
    joined = base.join(
        counted.select(id_col, F.col("n_contaminated")), id_col, "left"
    )
    n_hit = F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long")
    return joined.select(
        id_col,
        "n_grams",
        n_hit.alias("n_contaminated"),
        F.when(F.col("n_grams") > 0, n_hit * 1.0 / F.col("n_grams"))
        .otherwise(0.0)
        .alias("contam_ratio"),
        ((F.col("n_grams") > 0) & (n_hit * 1.0 / F.col("n_grams") >= threshold)).alias(
            "flagged"
        ),
    )


class StreamingDecontaminator:
    """foreachBatch handler writing per-epoch contamination verdicts.

    Usage::

        d = StreamingDecontaminator(bench_grams_df, out_dir)
        q = typed.writeStream.foreachBatch(d).option("checkpointLocation", ck).start()

    Verdicts land in ``out_dir`` parquet partitioned by epoch; replayed
    epochs overwrite their own partition (idempotent under at-least-once
    delivery), mirroring the near-dup store discipline.
    """

    def __init__(self, bench: DataFrame, out_dir: str, n: int = 3, threshold: float = 0.05):
        self.bench = bench
        self.out_dir = out_dir
        self.n = n
        self.threshold = threshold

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        verdicts = decontaminate_stream(
            batch_df, self.bench, n=self.n, threshold=self.threshold
        ).withColumn("epoch", F.lit(int(epoch_id)))
        (
            verdicts.write.mode("overwrite")
            .partitionBy("epoch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.out_dir)
        )
