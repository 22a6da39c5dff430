"""Concurrent consumers sharing a group claim DISJOINT messages (the
Redis-server serialization of XREADGROUP, provided by the group lock).
Parametrized over both storage backends: the file log's flocks and the
Redis backend's SET-NX locks must both serialize correctly."""

from __future__ import annotations

import pytest
from concurrent.futures import ThreadPoolExecutor

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming import Consumer, Producer


def _make_log(kind, tmp_path, stream, request):
    if kind == "file":
        return StreamLog(str(tmp_path), stream)
    from redis_streams_spark.sources.fake_redis import FakeRedis
    from redis_streams_spark.sources.redis_log import RedisStreamLog

    server = f"cc-{tmp_path.name}"
    request.addfinalizer(lambda: FakeRedis.reset_server(server))
    return RedisStreamLog(str(tmp_path), stream, client=FakeRedis(server))


@pytest.mark.parametrize("backend", ["file", "fakeredis"])
def test_concurrent_consumers_disjoint(tmp_path, request, backend):
    import threading

    log = _make_log(backend, tmp_path, "cc", request)
    prod = Producer(log, "cc")
    n = 120
    for i in range(n):
        prod.add({"i": i})

    barrier = threading.Barrier(4)
    claimed = threading.Barrier(4)

    def run(cid: str) -> list[str]:
        barrier.wait()  # all consumers contend from the same instant
        con = Consumer(
            log,
            "cc",
            "grp",
            consumer_id=cid,
            batch_size=10,
            max_wait_time_ms=1000,  # headroom for lock contention under
            poll_time_ms=10,  # full-suite load; full batches return early
        )
        got: list[str] = []
        first = True
        while True:
            batch = con.get_items()
            if first:
                # every consumer claims one batch before ANY may drain:
                # with 120 ready messages and batch_size=10 each of the 4
                # serialized claims gets a disjoint batch, so the spread
                # assertion below is deterministic (not a timing hope —
                # under load one thread used to drain everything first)
                claimed.wait()
                first = False
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
    assert sum(1 for r in results if r) == 4  # work actually spread


def test_concurrent_producers_no_lost_appends(tmp_path):
    """Concurrent producers must not lose messages or mint duplicate
    msgids: the stream_lock serializes the meta read-modify-write the way
    Redis serializes XADD (reference producer.py:44-49 is atomic
    server-side)."""
    log = StreamLog(str(tmp_path), "cp")
    n_threads, per_thread = 8, 50

    def run(t: int) -> list[str]:
        prod = Producer(StreamLog(str(tmp_path), "cp"), "cp")
        return [prod.add({"t": t, "i": i}) for i in range(per_thread)]

    with ThreadPoolExecutor(max_workers=n_threads) as ex:
        results = list(ex.map(run, range(n_threads)))

    ids = [m for r in results for m in r]
    total = n_threads * per_thread
    assert len(set(ids)) == total  # unique msgids
    assert log.count() == total  # meta counted every append
    # every appended line is readable at its position (no clobbered meta)
    rows = log.read_slice(0, log.count())
    assert len(rows) == total
    assert sorted(msgid for _, msgid, _ in rows) == sorted(ids)
