"""Concurrent consumers sharing a group claim DISJOINT messages (the
Redis-server serialization of XREADGROUP, provided by the group lock)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming import Consumer, Producer


def test_concurrent_consumers_disjoint(tmp_path):
    log = StreamLog(str(tmp_path), "cc")
    prod = Producer(log, "cc")
    n = 120
    for i in range(n):
        prod.add({"i": i})

    def run(cid: str) -> list[str]:
        con = Consumer(
            log,
            "cc",
            "grp",
            consumer_id=cid,
            batch_size=10,
            max_wait_time_ms=100,
            poll_time_ms=10,
        )
        got: list[str] = []
        while True:
            batch = con.get_items()
            if not batch:
                break
            for m in batch:
                got.append(m.msgid)
                con.remove_item_from_consumer_group(m.msgid)
        return got

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(run, [f"c{k}" for k in range(4)]))

    all_ids = [m for r in results for m in r]
    assert len(all_ids) == n  # nothing lost
    assert len(set(all_ids)) == n  # nothing double-delivered
    assert sum(1 for r in results if r) >= 2  # work actually spread
