"""End-to-end example mirroring the reference's example_implementation:
produce → batch-consume with per-item ack → monitor → scaling advice.

Reference shape (example_implementation/{producer,consumer,monitor}.py):
a producer loop XADDs messages, consumers collect batches and ack each
item after processing, a monitor prints the health table every sweep,
and the scaler prints OUT/IN/NO_SCALE advice.

Run: python examples/consume_loop.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming import Consumer, Monitor, Producer, Scaler

STREAM = "mystream"
GROUP = "workers"


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="rss-")
    log = StreamLog(root, STREAM)

    # -- producer: one message per add(), like XADD ---------------------
    producer = Producer(log, STREAM, consumer_group=GROUP, maxlen=10_000)
    for i in range(25):
        producer.add({"iteration": i, "message": f"Hello number {i}"})
    print(repr(producer))

    # -- consumer: time+count bounded batches, ack per item -------------
    consumer = Consumer(
        log,
        STREAM,
        GROUP,
        consumer_id="worker-1",
        batch_size=10,
        max_wait_time_ms=500,
        poll_time_ms=100,
    )
    while True:
        batch = consumer.get_items()
        if not batch:
            break
        print(f"collected batch of {len(batch)}")
        for msg in batch:
            _ = msg.content  # ... process ...
            consumer.remove_item_from_consumer_group(msg.msgid)

    # -- monitor: health table ------------------------------------------
    monitor = Monitor(log, STREAM, GROUP, batch_size=10)
    monitor.collect_monitoring_data(auto_cleanup=False)
    monitor.print_monitoring_data()

    # -- scaler: backlog advice -----------------------------------------
    scaler = Scaler(log, STREAM, GROUP)
    rate, suggestion = scaler.get_scale_decision(scale_out_rate=50, scale_in_rate=10)
    print(f"utilization rate={rate} suggestion={suggestion}")


if __name__ == "__main__":
    main()
