"""Streaming dedup: duplicate payloads collapse within the watermark."""

from __future__ import annotations

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming import Producer
from redis_streams_spark.streaming.bridge import open_stream
from redis_streams_spark.streaming.windows import project, stream_dedup


def test_stream_dedup_by_payload_key(spark, tmp_path):
    log = StreamLog(str(tmp_path), "dd")
    prod = Producer(log, "dd")
    # 30 messages but only 10 distinct payload keys (each sent 3x)
    for i in range(30):
        prod.add({"k": i % 10, "ts": f"2024-01-01 00:{i:02d}:00"})

    src = open_stream(spark, str(tmp_path), "dd", group="dd", batch_size=100)
    typed = project(src, {"k": "long", "ts": "timestamp"})
    deduped = stream_dedup(typed, keys=["k"], watermark="2 hours")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dd_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT k FROM dd_out").collect()
    finally:
        q.stop()
    ks = sorted(r.k for r in rows)
    assert ks == list(range(10))  # exactly one survivor per key
