"""RedisStreamLog backend specifics beyond the shared parity suite:
position stability across trim, pickle re-attach, lock mutual exclusion,
backend factory selection.  (The full producer/consumer/monitor/scaler
behavior is covered by tests/test_parity_api.py, which parametrizes over
both backends.)"""

from __future__ import annotations

import os
import pickle
import threading

import pytest

from redis_streams_spark.sources.fake_redis import FakeRedis
from redis_streams_spark.sources.redis_log import RedisStreamLog, connect_log
from redis_streams_spark.sources.stream_log import StreamLog


@pytest.fixture()
def rlog(tmp_path, request):
    server = f"rb-{tmp_path.name}"
    request.addfinalizer(lambda: FakeRedis.reset_server(server))
    return RedisStreamLog(str(tmp_path), "s", client=FakeRedis(server))


def test_positions_survive_trim(rlog):
    ids = [rlog.append({"i": i}) for i in range(10)]
    before = {pos: msgid for pos, msgid, _ in rlog.read_slice(0, 10)}
    assert rlog.trim(4) == 6
    assert rlog.first_pos() == 6
    assert rlog.xlen() == 4
    assert rlog.count() == 10  # global append index never shifts
    after = rlog.read_slice(0, 10)
    assert [pos for pos, _, _ in after] == [6, 7, 8, 9]
    for pos, msgid, _ in after:
        assert before[pos] == msgid
    assert ids[-1] == rlog.last_msgid()


def test_msgid_is_padded_but_redis_id_is_not(rlog):
    msgid = rlog.append({"a": 1})
    ms, seq = msgid.split("-")
    assert len(seq) == 6  # canonical zero-padded form, same as file backend
    # the underlying stream entry uses the normalized redis id but carries
    # the canonical msgid in the reserved _msgid field
    entries = rlog.client.xrange(rlog._k_log)
    assert entries[0][1]["_msgid"] == msgid
    assert entries[0][0] == f"{ms}-{int(seq)}"


def test_append_many_and_read_slice_window(rlog):
    rlog.append_many([{"i": i} for i in range(50)])
    mid = rlog.read_slice(10, 20)
    assert [pos for pos, _, _ in mid] == list(range(10, 20))
    assert [c["i"] for _, _, c in mid] == [str(i) for i in range(10, 20)]


def test_maxlen_trims_on_append(rlog):
    for i in range(10):
        rlog.append({"i": i}, maxlen=3)
    assert rlog.xlen() == 3
    assert [c["i"] for _, _, c in rlog.read_slice(0, rlog.count())] == [
        "7",
        "8",
        "9",
    ]


def test_pickle_reattaches_to_same_server(rlog):
    rlog.append({"k": "v"})
    clone = pickle.loads(pickle.dumps(rlog))
    assert clone.xlen() == 1
    clone.append({"k": "w"})
    assert rlog.xlen() == 2  # same in-process server state


def test_group_state_round_trip_and_registry(rlog):
    rlog.create_group("g1")
    rlog.create_group("g1")  # idempotent (BUSYGROUP tolerated)
    rlog.create_group("g2")
    assert rlog.list_groups() == ["g1", "g2"]

    def bump(state):
        state["last_committed"] = 7
        return "done"

    assert rlog.update_group("g1", bump) == "done"
    assert rlog.group_state("g1")["last_committed"] == 7
    assert rlog.group_state("g2")["last_committed"] == 0
    rlog.destroy_group("g1")
    assert rlog.list_groups() == ["g2"]


def test_stream_lock_serializes_concurrent_appends(rlog):
    # 4 threads x 25 appends; without the redis lock, msgid minting off a
    # shared meta blob would duplicate ids or undercount appended
    def worker():
        for _ in range(25):
            rlog.append({"x": 1})

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert rlog.count() == 100
    rows = rlog.read_slice(0, 100)
    assert len(rows) == 100
    assert len({msgid for _, msgid, _ in rows}) == 100
    msgids = [msgid for _, msgid, _ in rows]
    assert msgids == sorted(msgids)  # padded ids stay monotonic by position


def test_delete_resets_everything(rlog):
    rlog.append({"a": 1})
    rlog.create_group("g")
    rlog.delete()
    assert rlog.count() == 0
    assert rlog.list_groups() == []
    assert rlog.read_slice(0, 10) == []


def test_connect_log_defaults_to_file_backend(tmp_path, monkeypatch):
    monkeypatch.delenv("RSS_REDIS_URL", raising=False)
    assert isinstance(connect_log(str(tmp_path), "s"), StreamLog)


def test_connect_log_falls_back_when_redis_py_absent(tmp_path, monkeypatch):
    # redis-py is not installed in this sandbox: the factory must fall
    # back to the file backend rather than crash the data source
    monkeypatch.setenv("RSS_REDIS_URL", "redis://localhost:6379/0")
    log = connect_log(str(tmp_path), "s")
    assert isinstance(log, StreamLog)
