"""Streaming KMV distinct sketch: O(k) state, exact-below-k, estimate
accuracy, redelivery immunity of the hash set, and equality with an
independent recomputation over the same stream."""

from __future__ import annotations

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming import Producer
from redis_streams_spark.streaming.bridge import open_stream
from redis_streams_spark.functions.hashing import h32_py
from redis_streams_spark.streaming.kmv import (
    kmv_estimate,
    kmv_merge,
    streaming_distinct,
)
from redis_streams_spark.streaming.windows import project

K = 32


def _item(i: int, key: str) -> str:
    # key 'small' cycles 12 distinct items (< K: sketch stays exact);
    # key 'big' has ~n/2 distinct items (> K: estimation regime)
    if key == "small":
        return f"s{(i // 2) % 12}"  # i is always even for this key
    return f"b{i // 2}"


def test_streaming_distinct_exact_and_estimated(spark, tmp_path):
    log = StreamLog(str(tmp_path), "kmv")
    prod = Producer(log, "kmv")
    n = 400
    for i in range(n):
        key = "small" if i % 2 == 0 else "big"
        prod.add({"event_type": key, "user_id": _item(i, key)})

    src = open_stream(spark, str(tmp_path), "kmv", group="kmv", batch_size=37)
    typed = project(
        src, {"event_type": "string", "user_id": "string"}
    ).select("event_type", "user_id")
    out = streaming_distinct(typed, key_col="event_type", item_col="user_id", k=K)
    q = (
        out.writeStream.format("memory")
        .queryName("kmv_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM kmv_out ORDER BY n_seen").collect()
    finally:
        q.stop()

    final = {r.key: r for r in rows}  # last update per key wins

    truth = {"small": set(), "big": set()}
    for i in range(n):
        key = "small" if i % 2 == 0 else "big"
        truth[key].add(_item(i, key))

    # small key: sketch never filled -> exact distinct count
    s = final["small"]
    assert s.exact and s.sketch_size == len(truth["small"]) == 12
    assert s.est_distinct == 12.0

    # big key: estimation regime, O(k) state, error within 4/sqrt(k-2)
    b = final["big"]
    assert not b.exact and b.sketch_size == K
    true_d = len(truth["big"])
    rel_err = abs(b.est_distinct - true_d) / true_d
    assert rel_err < 4 / (K - 2) ** 0.5, (b.est_distinct, true_d)

    # independent recomputation: same hashes -> identical estimate
    for key, items in truth.items():
        sk = kmv_merge([], [h32_py(x) for x in items], K)
        exact, est = kmv_estimate(sk, K)
        assert final[key].est_distinct == round(est, 4)
        assert final[key].exact == exact


def test_kmv_merge_is_order_and_split_invariant():
    """Mergeability: any split/order of the item stream produces the
    IDENTICAL sketch (set-union algebra), and duplicates are absorbed —
    the redelivery-immunity argument in the module docstring."""
    items = [f"x{i % 50}" for i in range(300)]
    hashes = [h32_py(x) for x in items]
    whole = kmv_merge([], hashes, K)
    # split at every third position, merge incrementally
    acc: list[int] = []
    for j in range(0, len(hashes), 3):
        acc = kmv_merge(acc, hashes[j : j + 3], K)
    assert acc == whole
    # re-deliver everything twice: unchanged
    assert kmv_merge(acc, hashes * 2, K) == whole
    # merging two shard sketches == sketch of the union
    left = kmv_merge([], hashes[:150], K)
    right = kmv_merge([], hashes[150:], K)
    assert kmv_merge(left, right, K) == whole
