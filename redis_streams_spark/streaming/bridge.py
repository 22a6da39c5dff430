"""foreachBatch bridge — the Spark analog of the reference's processing
model (SURVEY §2.2 UDF row: the entire model is a user callback over a
batch; README.md:57-64).

``process_stream`` wires readStream(redislog) → foreachBatch(user_fn):
the user function receives each micro-batch (≤ batch_size rows, the
count bound) as a DataFrame; when it returns, the epoch commits — the
batch-level ack.  If it raises, the epoch aborts and the same rows are
redelivered on restart (at-least-once — exactly the unacked⇒redelivered
contract, README.md:10; SURVEY hard part (a))."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from redis_streams_spark.sources.datasource import RedisLogDataSource


def ensure_registered(spark: SparkSession) -> None:
    try:
        spark.dataSource.register(RedisLogDataSource)
    except Exception:
        pass  # already registered


def open_stream(
    spark: SparkSession,
    root: str,
    stream: str,
    group: str = "spark",
    batch_size: int = 100,
) -> DataFrame:
    ensure_registered(spark)
    return (
        spark.readStream.format("redislog")
        .option("path", root)
        .option("stream", stream)
        .option("group", group)
        .option("batch_size", str(batch_size))
        .load()
    )


def process_stream(
    spark: SparkSession,
    root: str,
    stream: str,
    fn: Callable[[DataFrame, int], None],
    group: str = "spark",
    batch_size: int = 100,
    checkpoint: str | None = None,
    trigger_ms: int = 500,
):
    """Start a query delivering micro-batches to ``fn(batch_df, epoch)``.

    Returns the StreamingQuery; callers drive it with
    ``q.processAllAvailable()`` / ``q.awaitTermination()`` and stop it.
    ``trigger_ms`` plays the reference's ``max_wait_time_ms`` role (the
    time bound); ``batch_size`` the count bound.
    """
    src = open_stream(spark, root, stream, group=group, batch_size=batch_size)
    writer = src.writeStream.foreachBatch(fn).trigger(
        processingTime=f"{trigger_ms} milliseconds"
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
