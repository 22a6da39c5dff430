"""Streaming weighted reservoir: per-key top-k by deterministic
Efraimidis-Spirakis keys, equal to the batch sample over the same rows."""

from __future__ import annotations

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming import Producer
from redis_streams_spark.streaming.bridge import open_stream
from redis_streams_spark.streaming.sampling import _es_key, weighted_reservoir
from redis_streams_spark.streaming.windows import project


def test_reservoir_matches_batch_topk(spark, tmp_path):
    log = StreamLog(str(tmp_path), "ws")
    prod = Producer(log, "ws")
    ids = []
    for i in range(60):
        ids.append(
            prod.add(
                {
                    "event_type": ["a", "b"][i % 2],
                    "value": float(1 + (i * 7) % 23),
                }
            )
        )

    src = open_stream(spark, str(tmp_path), "ws", group="ws", batch_size=13)
    typed = project(src, {"event_type": "string", "value": "double"}).select(
        "msgid", "event_type", "value"
    )
    out = weighted_reservoir(typed, key_col="event_type", k=5)
    q = (
        out.writeStream.format("memory")
        .queryName("ws_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM ws_out ORDER BY n_seen").collect()
    finally:
        q.stop()

    final = {}
    for r in rows:  # last update per key wins
        final[r.key] = r
    # batch recomputation: same deterministic keys over the same rows
    for key in ("a", "b"):
        expect_rows = [
            (msgid, float(1 + (i * 7) % 23))
            for i, msgid in enumerate(ids)
            if ["a", "b"][i % 2] == key
        ]
        scored = sorted(
            ((_es_key(m, w), m) for m, w in expect_rows),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        assert final[key].reservoir_ids == [m for _, m in scored]
        assert final[key].n_seen == 30
        # scores reported at 9 dp, descending
        assert list(final[key].reservoir_scores) == sorted(
            final[key].reservoir_scores, reverse=True
        )
    # multiple batches happened (cap 13 < 60) and the counter GREW across
    # them: distinct cumulative values ending at 30 — a state reset would
    # leave per-batch counts that never reach 30.  (Asserting sortedness
    # of an ORDER BY n_seen collect would be tautological.)
    a_vals = sorted({r.n_seen for r in rows if r.key == "a"})
    assert len(a_vals) >= 2 and a_vals[-1] == 30
