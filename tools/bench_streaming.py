"""Streaming-path throughput benchmark (engine-side, not the driver's
bench.py): producer append (single + batch), consumer batch collection +
ack, and Structured Streaming source read.

Prints one JSON line with msgs/sec per path.  The reference's design
bound is one XADD network round trip per produced message and one
XREADGROUP per poll (SURVEY §6 / BASELINE.md): local Redis tops out
around 10-50k single XADD/s; the batch paths here amortize that away.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redis_streams_spark.session import get_spark  # noqa: E402
from redis_streams_spark.sources.stream_log import StreamLog  # noqa: E402
from redis_streams_spark.streaming import Consumer, Producer  # noqa: E402
from redis_streams_spark.streaming.bridge import open_stream  # noqa: E402

N = int(os.environ.get("BENCH_STREAM_N", "20000"))


def main() -> None:
    root = tempfile.mkdtemp(prefix="bench-stream-")
    results: dict[str, float] = {}

    # -- producer: single adds ------------------------------------------
    log = StreamLog(root, "single")
    prod = Producer(log, "single")
    t0 = time.perf_counter()
    for i in range(N // 4):
        prod.add({"i": i, "payload": "x" * 50})
    results["producer_single_msgs_per_sec"] = round((N // 4) / (time.perf_counter() - t0))

    # -- producer: batch adds -------------------------------------------
    log2 = StreamLog(root, "batch")
    prod2 = Producer(log2, "batch")
    rows = [{"i": i, "payload": "x" * 50} for i in range(N)]
    t0 = time.perf_counter()
    for k in range(0, N, 1000):
        prod2.add_many(rows[k : k + 1000])
    results["producer_batch_msgs_per_sec"] = round(N / (time.perf_counter() - t0))

    # -- consumer: collect + batch ack ----------------------------------
    con = Consumer(
        log2, "batch", "g", consumer_id="c1", batch_size=1000,
        max_wait_time_ms=100, poll_time_ms=10,
    )
    t0 = time.perf_counter()
    total = 0
    while True:
        batch = con.get_items()
        if not batch:
            break
        con.remove_items_from_consumer_group([m.msgid for m in batch])
        total += len(batch)
    results["consumer_msgs_per_sec"] = round(total / (time.perf_counter() - t0))

    # -- Spark source: full stream read ---------------------------------
    spark = get_spark("bench-streaming")
    src = open_stream(spark, root, "batch", group="spark-bench", batch_size=0)
    t0 = time.perf_counter()
    q = (
        src.writeStream.format("noop")
        .option("checkpointLocation", os.path.join(root, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    results["spark_source_msgs_per_sec"] = round(N / (time.perf_counter() - t0))

    # -- stateful CDC compaction over the stream ------------------------
    from redis_streams_spark.streaming.compact import compact_changes
    from redis_streams_spark.streaming.windows import project

    log3 = StreamLog(root, "cdc")
    prod3 = Producer(log3, "cdc")
    cdc_rows = [
        {"user": f"u{i % 500}", "kind": "update", "value": float(i), "seq": i}
        for i in range(N)
    ]
    for k in range(0, N, 1000):
        prod3.add_many(cdc_rows[k : k + 1000])
    src3 = open_stream(spark, root, "cdc", group="compact-bench", batch_size=0)
    typed = project(
        src3,
        {"user": "string", "kind": "string", "value": "double", "seq": "bigint"},
    )
    out = compact_changes(typed, key_col="user", type_col="kind",
                          value_col="value", seq_col="seq")
    t0 = time.perf_counter()
    q2 = (
        out.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(root, "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    results["compact_changes_msgs_per_sec"] = round(
        N / (time.perf_counter() - t0)
    )
    spark.stop()

    print(json.dumps({"metric": "streaming_throughput", "n": N, **results}))


if __name__ == "__main__":
    main()
