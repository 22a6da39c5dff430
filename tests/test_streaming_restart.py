"""Checkpoint-restart recovery for the round-7 stateful sketches: a
stopped query restarted on the SAME checkpoint must resume its state
(not recount), proving the state schemas round-trip through Spark's
state store — the failure class a state-schema change would hit."""

from __future__ import annotations

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming import Producer
from redis_streams_spark.streaming.bridge import open_stream
from redis_streams_spark.streaming.quantiles import streaming_quantiles
from redis_streams_spark.streaming.topk import streaming_topk
from redis_streams_spark.streaming.windows import project


def _run_until_drained(out, ck):
    # foreachBatch, not the memory sink: memory does not support
    # checkpoint recovery ("This query does not support recovering from
    # checkpoint location"), and recovery is the very thing under test
    rows = []

    def sink(batch_df, _epoch):
        rows.extend(batch_df.collect())

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        return rows
    finally:
        q.stop()


def test_topk_state_survives_restart(spark, tmp_path):
    log = StreamLog(str(tmp_path), "rk")
    prod = Producer(log, "rk")
    for i in range(40):
        prod.add({"event_type": "a", "user_id": "hot" if i % 2 == 0 else f"t{i}"})

    def build():
        src = open_stream(spark, str(tmp_path), "rk", group="rk", batch_size=15)
        typed = project(
            src, {"event_type": "string", "user_id": "string"}
        ).select("event_type", "user_id")
        return streaming_topk(typed, key_col="event_type", item_col="user_id", k=3)

    ck = str(tmp_path / "ck")
    _run_until_drained(build(), ck)

    # second half arrives while the query is DOWN
    for i in range(40, 80):
        prod.add({"event_type": "a", "user_id": "hot" if i % 2 == 0 else f"t{i}"})

    rows = _run_until_drained(build(), ck)
    final = max(rows, key=lambda r: r.n_seen)
    # state resumed: the restarted run counts ALL 80, not just its 40
    assert final.n_seen == 80
    est = dict(zip(final.items, final.est_counts))
    assert final.items[0] == "hot"
    # 'hot' truly appears 40 times; undercount bounded by n/(k+1)
    assert 40 - est["hot"] <= final.max_undercount <= 80 // 4
    assert len(final.items) <= 3


def test_quantiles_state_survives_restart(spark, tmp_path):
    log = StreamLog(str(tmp_path), "rq")
    prod = Producer(log, "rq")
    vals1 = [float(1 + i % 50) for i in range(60)]
    for v in vals1:
        prod.add({"event_type": "a", "value": v})

    def build():
        src = open_stream(spark, str(tmp_path), "rq", group="rq", batch_size=25)
        typed = project(
            src, {"event_type": "string", "value": "double"}
        ).select("event_type", "value")
        return streaming_quantiles(typed, key_col="event_type", value_col="value")

    ck = str(tmp_path / "ck")
    _run_until_drained(build(), ck)

    vals2 = [float(1000 + i) for i in range(60)]  # much larger second wave
    for v in vals2:
        prod.add({"event_type": "a", "value": v})

    rows = _run_until_drained(build(), ck)
    final = max(rows, key=lambda r: r.n_seen)
    assert final.n_seen == 120  # histogram resumed, not restarted
    # p50 of the COMBINED multiset sits at the vals1/vals2 boundary:
    # the 60th smallest of 120 is the max of vals1 (50) — a fresh state
    # seeing only vals2 would report ~1000.
    assert final.p50 < 100
    assert final.p99 > 900
