"""Event-time layer + foreachBatch bridge + listener monitor tests."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming import Producer
from redis_streams_spark.streaming.bridge import open_stream, process_stream
from redis_streams_spark.streaming.listener import MonitorListener
from redis_streams_spark.streaming.windows import (
    project,
    tumbling_counts,
    with_ingest_time,
)


def _seed_events(tmp_path, n=40):
    log = StreamLog(str(tmp_path), "ev")
    prod = Producer(log, "ev")
    base = 1704067200  # 2024-01-01 00:00:00 UTC
    for i in range(n):
        prod.add(
            {
                "ts": f"2024-01-01 00:{i // 2:02d}:{(i * 7) % 60:02d}",
                "user_id": i % 4,
                "event_type": ["view", "click"][i % 2],
                "value": round(1.5 * i, 2),
                "base": base,
            }
        )
    return str(tmp_path), log


def test_project_and_ingest_time(spark, tmp_path):
    root, _ = _seed_events(tmp_path, 6)
    src = open_stream(spark, root, "ev", group="proj", batch_size=100)
    typed = project(
        with_ingest_time(src),
        {"ts": "timestamp", "user_id": "long", "event_type": "string", "value": "double"},
    )
    q = (
        typed.writeStream.format("memory")
        .queryName("typed_out")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM typed_out ORDER BY msgid").collect()
    finally:
        q.stop()
    assert len(rows) == 6
    r = rows[0]
    assert r.user_id == 0 and r.event_type == "view"
    assert r.ts is not None and r.value == 0.0


def test_tumbling_watermark_agg(spark, tmp_path):
    root, _ = _seed_events(tmp_path, 40)
    src = open_stream(spark, root, "ev", group="win", batch_size=1000)
    typed = project(
        src, {"ts": "timestamp", "event_type": "string", "value": "double"}
    )
    agg = tumbling_counts(typed, window_size="5 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM win_out").collect()
    finally:
        q.stop()
    # 40 events over 20 minutes → 4 windows × 2 event types
    assert sum(r.n for r in rows) == 40
    assert len(rows) == 8
    assert all(r.win_end > r.win_start for r in rows)


def test_foreachbatch_bridge_ack_semantics(spark, tmp_path):
    root, _ = _seed_events(tmp_path, 25)
    seen: list[int] = []

    def handle(df, epoch_id):
        seen.append(df.count())

    q = process_stream(
        spark,
        root,
        "ev",
        handle,
        group="bridge",
        batch_size=10,
        checkpoint=str(tmp_path / "ck"),
        trigger_ms=200,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sum(seen) == 25
    assert max(seen) <= 10  # count bound per delivered batch
    log = StreamLog(root, "ev")
    state = log.group_state("bridge")
    # epoch ack is at-least-once: the final epoch's source commit may race
    # with stop(), leaving at most one batch_size window unacked (it would
    # be replayed from the checkpoint on restart — the PEL contract)
    assert state["last_committed"] >= 25 - 10
    assert state["last_planned"] == 25


def test_monitor_listener_progress(spark, tmp_path):
    root, _ = _seed_events(tmp_path, 30)
    listener = MonitorListener(batch_size=1000)
    spark.streams.addListener(listener)
    try:
        q = process_stream(
            spark,
            root,
            "ev",
            lambda df, _: df.count(),
            group="mon",
            batch_size=10,
            trigger_ms=200,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        deadline = time.time() + 10
        while not listener.metrics and time.time() < deadline:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)
    assert listener.metrics, "listener captured no progress"
    m = listener.metrics[0]
    assert m.status in {
        "OK",
        "WARNING - too many pending items",
        "WARNING - idle for long time",
    }
    rate, suggestion = listener.scale_decision()
    assert suggestion in {"OUT", "IN", "NO_SCALE"}


def test_streaming_ohlc_bars(spark, tmp_path):
    """OHLC bars over the stream match a hand-computed batch reduction
    of the same payloads (open=first tick, close=last tick per bar)."""
    from redis_streams_spark.streaming.windows import ohlc_bars

    root, _ = _seed_events(tmp_path, 20)
    src = open_stream(spark, root, "ev", group="ohlc", batch_size=100)
    typed = project(
        src,
        {"ts": "timestamp", "event_type": "string", "value": "double"},
    )
    bars = ohlc_bars(typed, bar_size="5 minutes", keys=("event_type",))
    q = (
        bars.writeStream.format("memory")
        .queryName("ohlc_out")
        .outputMode("append")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        # append mode only emits bars the watermark has closed; push a
        # late high-ts row to advance the watermark past the seeded data
        prod = Producer(StreamLog(root, "ev"), "ev")
        prod.add(
            {"ts": "2024-01-01 01:00:00", "event_type": "view", "value": 0.0}
        )
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.sql("SELECT * FROM ohlc_out").count() >= 4:
                break
            time.sleep(0.3)
        out = spark.sql(
            "SELECT * FROM ohlc_out ORDER BY bar_start, event_type"
        ).collect()
    finally:
        q.stop()
    assert len(out) >= 4
    # recompute expected OHLC from the seed formula
    import collections

    ticks = collections.defaultdict(list)
    for i in range(20):
        ts = (i // 2, (i * 7) % 60)  # (minute, second)
        ticks[("view" if i % 2 == 0 else "click", ts[0] // 5)].append(
            (ts, i, round(1.5 * i, 2))
        )
    for r in out:
        key = (r.event_type, r.bar_start.minute // 5)
        if key not in ticks or r.bar_start.hour != 0:
            continue
        seq = sorted(ticks[key])
        vals = [v for _, _, v in seq]
        assert r.open == seq[0][2]
        assert r.close == seq[-1][2]
        assert r.high == max(vals)
        assert r.low == min(vals)
        assert r.n_ticks == len(seq)


def test_ohlc_msgid_tie_break_is_numeric(spark):
    """Ties at identical event time order by NUMERIC (ms, seq) msgid
    components, not lexicographic strings: '99-...' precedes '100-...'
    in stream order even though it sorts after it as a string."""
    import datetime as dt

    from pyspark.sql import Row

    from redis_streams_spark.streaming.windows import ohlc_bars

    ts = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(ts=ts, event_type="x", value=10.0, msgid="99-000000"),
        Row(ts=ts, event_type="x", value=20.0, msgid="100-000000"),
        Row(ts=ts, event_type="x", value=15.0, msgid="100-000001"),
    ]
    # ohlc_bars is watermark-annotated but batch-evaluable (withWatermark
    # is a no-op outside streaming) — exactly what a tie unit test needs
    out = ohlc_bars(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    bar = out[0]
    assert bar.open == 10.0  # msgid 99-0 is FIRST in stream order
    assert bar.close == 15.0  # msgid 100-1 is last
    assert bar.high == 20.0 and bar.low == 10.0 and bar.n_ticks == 3
