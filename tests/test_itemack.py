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


def test_itemack_uncapped_batch_streams_through_iterator(spark, tmp_path):
    """An UNCAPPED epoch (batch_size=0: the whole backlog in one batch)
    must flow through the processor without materializing on the driver —
    the processor iterates toLocalIterator partition-by-partition instead
    of collect()ing.  Every item is handled exactly once, in msgid order."""
    log = StreamLog(str(tmp_path), "big")
    prod = Producer(log, "big")
    n = 500
    log.append_many([{"i": i} for i in range(n)])

    seen: list[str] = []

    def handler(msg, ack):
        seen.append(msg.msgid)
        ack()

    proc = AckedBatchProcessor(log, group="biggrp", handler=handler)
    q = process_stream(
        spark,
        str(tmp_path),
        "big",
        proc,
        group="biggrp",
        batch_size=0,  # no planning cap: one 500-row epoch
        checkpoint=str(tmp_path / "ckbig"),
        trigger_ms=100,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(seen) == n
    assert seen == sorted(seen)
    assert len(set(seen)) == n
