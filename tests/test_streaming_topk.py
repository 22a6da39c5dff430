"""Streaming Misra-Gries top-k: O(k) state, exact-guarantee invariants,
and equality with an independent recomputation over the same batches."""

from __future__ import annotations

from collections import Counter

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming import Producer
from redis_streams_spark.streaming.bridge import open_stream
from redis_streams_spark.streaming.topk import misra_gries_merge, streaming_topk
from redis_streams_spark.streaming.windows import project

K = 4


def _item(i: int) -> str:
    # Zipf-ish: item u0 appears ~50%, u1 ~17%, long tail of singletons
    if i % 2 == 0:
        return "u0"
    if i % 6 == 1:
        return "u1"
    return f"t{i}"


def test_topk_guarantees_and_state_bound(spark, tmp_path):
    log = StreamLog(str(tmp_path), "tk")
    prod = Producer(log, "tk")
    n = 90
    for i in range(n):
        prod.add({"event_type": ["a", "b"][i % 3 == 0], "user_id": _item(i)})

    src = open_stream(spark, str(tmp_path), "tk", group="tk", batch_size=17)
    typed = project(
        src, {"event_type": "string", "user_id": "string"}
    ).select("event_type", "user_id")
    out = streaming_topk(typed, key_col="event_type", item_col="user_id", k=K)
    q = (
        out.writeStream.format("memory")
        .queryName("tk_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM tk_out ORDER BY n_seen").collect()
    finally:
        q.stop()

    final = {}
    for r in rows:  # last update per key wins
        final[r.key] = r

    truth: dict[str, Counter] = {"a": Counter(), "b": Counter()}
    for i in range(n):
        truth[["a", "b"][i % 3 == 0]][_item(i)] += 1

    for key, true in truth.items():
        r = final[key]
        n_seen = sum(true.values())
        assert r.n_seen == n_seen
        # O(k) state bound
        assert len(r.items) <= K
        est = dict(zip(r.items, r.est_counts))
        for item, c in est.items():
            # estimates never exceed truth and undercount by <= dec
            assert c <= true[item]
            assert true[item] - c <= r.max_undercount
        # total decrement bound: <= n/(k+1)
        assert r.max_undercount <= n_seen // (K + 1)
        # every item above the n/(k+1) frequency threshold must survive
        for item, c in true.items():
            if c > n_seen / (K + 1):
                assert item in est, (item, c, est)
        # the dominant item's ORDER is right: u0 first
        assert r.items[0] == "u0"
        # counts emitted in (count desc, item asc) order
        pairs = list(zip(r.est_counts, r.items))
        assert pairs == sorted(pairs, key=lambda t: (-t[0], t[1]))

    # state accumulated ACROSS batches (cap 17 < 90): n_seen grew
    a_vals = sorted({r.n_seen for r in rows if r.key == "a"})
    assert len(a_vals) >= 2 and a_vals[-1] == sum(truth["a"].values())


def test_misra_gries_merge_pure():
    # single-shot merge equals the textbook reduction
    counters, m = misra_gries_merge({}, {"x": 5, "y": 3, "z": 1, "w": 1}, 2)
    # (k+1)-th largest of {5,3,1,1} with k=2 is 1 -> subtract 1, drop zeros
    assert m == 1 and counters == {"x": 4, "y": 2}
    # merging summaries keeps the undercount additive
    c2, m2 = misra_gries_merge(counters, {"q": 9, "y": 1}, 2)
    assert m2 == 3 and c2 == {"q": 6, "x": 1}
