"""Watermark late-data policy (append mode).

Spark's guarantee: once a window's state is evicted (watermark passed its
end and the window was emitted), a late row targeting that window is
DROPPED — the emitted result is final, no duplicate window rows.  A late
row for a never-seen window may still be admitted best-effort; the hard
guarantee is exactly-once window emission, which is what this test pins.

Micro-batch boundaries are deterministic via the redislog source's
batch_size cap:
- batch 1: 4 rows in window W=[10:00,10:05) + one at 10:30 → at commit the
  watermark advances to 10:28 and W is emitted (n=4);
- batch 2: one LATE row back in W (state already evicted) + rows at 11:00;
- batch 3: flush rows so every window closes.
"""

from __future__ import annotations

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming import Producer
from redis_streams_spark.streaming.bridge import open_stream
from redis_streams_spark.streaming.windows import project, tumbling_counts


def test_late_row_for_emitted_window_is_dropped(spark, tmp_path):
    log = StreamLog(str(tmp_path), "late")
    prod = Producer(log, "late")
    # batch 1: fills W and advances event time to 10:30
    for m in range(4):
        prod.add({"ts": f"2024-01-01 10:0{m}:00", "event_type": "w1", "value": 1})
    prod.add({"ts": "2024-01-01 10:30:00", "event_type": "adv", "value": 1})
    # batch 2: intervening batch — W evicted+emitted here (watermark
    # 10:28 > W.end); the late-row input filter lags one batch, so the
    # late probe must come later still
    for m in range(5):
        prod.add({"ts": f"2024-01-01 11:0{m}:00", "event_type": "later", "value": 1})
    # batch 3: late row targets the long-evicted W
    prod.add({"ts": "2024-01-01 10:01:30", "event_type": "w1", "value": 1})
    for m in range(4):
        prod.add({"ts": f"2024-01-01 11:3{m}:00", "event_type": "later2", "value": 1})
    # batch 4: flush
    prod.add({"ts": "2024-01-01 12:00:00", "event_type": "flush", "value": 1})
    prod.add({"ts": "2024-01-01 12:30:00", "event_type": "flush", "value": 1})

    src = open_stream(spark, str(tmp_path), "late", group="late", batch_size=5)
    typed = project(src, {"ts": "timestamp", "event_type": "string", "value": "double"})
    agg = tumbling_counts(typed, window_size="5 minutes", watermark="2 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM late_out").collect()
        dropped = sum(
            (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0) if p["stateOperators"] else 0)
            for p in q.recentProgress
        )
    finally:
        q.stop()
    w1 = [r for r in rows if r.event_type == "w1"]
    # exactly ONE w1 window row, with the on-time count only: the late row
    # neither re-emitted the window nor mutated the emitted result
    assert len(w1) == 1
    assert w1[0].n == 4
    assert dropped >= 1  # the late row was counted as watermark-dropped
