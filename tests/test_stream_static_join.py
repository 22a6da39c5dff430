"""Stream-static join: enrich streaming messages with a static dimension
(the streaming analog of the dim-broadcast joins in the batch layer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.session import load_table
from redis_streams_spark.streaming import Producer
from redis_streams_spark.streaming.bridge import open_stream
from redis_streams_spark.streaming.windows import project


def test_stream_static_dim_join(spark, tmp_path, sf_dir):
    log = StreamLog(str(tmp_path), "ssj")
    prod = Producer(log, "ssj")
    for i in range(20):
        prod.add({"nationkey": i % 25, "amount": 10 * i})

    nation = load_table(spark, sf_dir, "nation")
    src = open_stream(spark, str(tmp_path), "ssj", group="ssj", batch_size=100)
    typed = project(src, {"nationkey": "int", "amount": "double"})
    enriched = typed.join(
        F.broadcast(nation), typed.nationkey == nation.n_nationkey, "left"
    ).select("msgid", "nationkey", "n_name", "amount")

    q = (
        enriched.writeStream.format("memory")
        .queryName("ssj_out")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM ssj_out").collect()
    finally:
        q.stop()
    assert len(rows) == 20
    assert all(r.n_name == f"NATION_{r.nationkey}" for r in rows)
