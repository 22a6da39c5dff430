"""Per-item ack bridge: acked items are not re-processed after a
mid-batch failure; unacked ones are."""

from __future__ import annotations

import pytest

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming import Producer
from redis_streams_spark.streaming.bridge import process_stream
from redis_streams_spark.streaming.itemack import AckedBatchProcessor


def test_itemack_replay_filters_acked(spark, tmp_path):
    log = StreamLog(str(tmp_path), "ack")
    prod = Producer(log, "ack")
    for i in range(6):
        prod.add({"i": i})

    processed: list[str] = []
    fail_once = {"armed": True}

    def handler(msg, ack):
        # fail after acking the first 3 items of the first delivery
        if fail_once["armed"] and len(processed) == 3:
            fail_once["armed"] = False
            raise RuntimeError("worker crash")
        processed.append(msg.content["i"])
        ack()

    proc = AckedBatchProcessor(log, group="ackgrp", handler=handler)
    q = process_stream(
        spark,
        str(tmp_path),
        "ack",
        proc,
        group="ackgrp",
        batch_size=100,
        checkpoint=str(tmp_path / "ck"),
        trigger_ms=200,
    )
    # first delivery fails mid-batch → query dies
    with pytest.raises(Exception):
        q.processAllAvailable()
    q.stop()
    assert processed == ["0", "1", "2"]  # 3 acked before the crash

    # restart: replayed batch must skip the acked 3 and process the rest
    q2 = process_stream(
        spark,
        str(tmp_path),
        "ack",
        proc,
        group="ackgrp",
        batch_size=100,
        checkpoint=str(tmp_path / "ck"),
        trigger_ms=200,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert processed == ["0", "1", "2", "3", "4", "5"]  # no duplicates
