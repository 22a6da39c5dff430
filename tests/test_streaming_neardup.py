"""Streaming MinHash-LSH near-dup detection over the redislog source:
documents arriving after a near-identical one get flagged; unrelated
documents do not."""

from __future__ import annotations

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming import Producer
from redis_streams_spark.streaming.bridge import open_stream
from redis_streams_spark.streaming.neardup import StreamingNearDup
from redis_streams_spark.streaming.windows import project

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the late afternoon sun"
)
VARIANT = BASE.replace("late afternoon", "early morning")  # near-dup of BASE
OTHER = (
    "completely different content about distributed query engines and "
    "columnar execution with vectorized operators and shuffle exchanges"
)


def test_streaming_neardup_flags_later_arrivals(spark, tmp_path):
    log = StreamLog(str(tmp_path), "docs")
    prod = Producer(log, "docs")
    # epoch-ish 1: the base doc + an unrelated doc
    prod.add({"doc_id": 1, "text": BASE})
    prod.add({"doc_id": 2, "text": OTHER})

    nd = StreamingNearDup(spark, str(tmp_path / "ndstate"))
    src = open_stream(spark, str(tmp_path), "docs", group="nd", batch_size=100)
    typed = project(src, {"doc_id": "long", "text": "string"})
    q = (
        typed.writeStream.foreachBatch(nd)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    FRESH = (
        "a totally new paragraph describing watermark propagation through "
        "stateful operators and the role of event time in window eviction"
    )
    try:
        q.processAllAvailable()
        assert nd.flagged().count() == 0  # nothing to collide with yet
        # later arrivals IN ONE BATCH: a near-dup of doc 1, and a
        # same-batch identical pair (5, 6)
        prod.add({"doc_id": 3, "text": VARIANT})
        prod.add({"doc_id": 5, "text": FRESH})
        prod.add({"doc_id": 6, "text": FRESH})
        q.processAllAvailable()
    finally:
        q.stop()

    flags = {r.doc_id: r.n_collisions for r in nd.flagged().collect()}
    assert 3 in flags and flags[3] >= 1  # variant collides with prior doc 1
    assert 6 in flags and flags[6] >= 1  # same-batch copy: later id flagged
    # doc 1/2 preceded everything; doc 5 is the EARLIER of the pair
    assert 1 not in flags and 2 not in flags and 5 not in flags
