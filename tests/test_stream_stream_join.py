"""Watermarked stream-stream join: two redislog streams joined on key
with an event-time range condition (the hardest Structured Streaming
join shape — state on both sides, bounded by watermarks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming import Producer
from redis_streams_spark.streaming.bridge import open_stream
from redis_streams_spark.streaming.windows import project


def test_stream_stream_time_bounded_join(spark, tmp_path):
    clicks = Producer(StreamLog(str(tmp_path), "clicks"), "clicks")
    buys = Producer(StreamLog(str(tmp_path), "buys"), "buys")
    # user k clicks at minute 2k; users 0,2,4 buy 5 minutes later
    for k in range(6):
        clicks.add({"user": k, "ts": f"2024-01-01 10:{2 * k:02d}:00"})
    for k in (0, 2, 4):
        buys.add({"user": k, "ts": f"2024-01-01 10:{2 * k + 5:02d}:00"})

    c = project(
        open_stream(spark, str(tmp_path), "clicks", group="c", batch_size=100),
        {"user": "long", "ts": "timestamp"},
    ).withColumnRenamed("ts", "click_ts").withWatermark("click_ts", "10 minutes")
    b = project(
        open_stream(spark, str(tmp_path), "buys", group="b", batch_size=100),
        {"user": "long", "ts": "timestamp"},
    ).withColumnRenamed("ts", "buy_ts").withWatermark("buy_ts", "10 minutes")

    joined = c.join(
        b,
        (c.user == b.user)
        & (b.buy_ts >= c.click_ts)
        & (b.buy_ts <= c.click_ts + F.expr("INTERVAL 10 MINUTES")),
    ).select(c.user.alias("user"), "click_ts", "buy_ts")

    q = (
        joined.writeStream.format("memory")
        .queryName("ssj2_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM ssj2_out ORDER BY user").collect()
    finally:
        q.stop()
    assert [r.user for r in rows] == [0, 2, 4]
    assert all((r.buy_ts - r.click_ts).total_seconds() == 300 for r in rows)
