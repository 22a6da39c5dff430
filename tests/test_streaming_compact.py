"""Streaming CDC compaction: per-key last-writer-wins net state across
micro-batches, with tombstones and replay-safe monotonic folding."""

from __future__ import annotations

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming import Producer
from redis_streams_spark.streaming.bridge import open_stream
from redis_streams_spark.streaming.compact import compact_changes
from redis_streams_spark.streaming.windows import project


def test_compaction_across_batches(spark, tmp_path):
    log = StreamLog(str(tmp_path), "cdc")
    prod = Producer(log, "cdc")
    # three keys, interleaved updates over WAY more rows than one batch:
    # key u0 updated repeatedly, u1 ends in a delete, u2 single insert
    seq = 0
    for i in range(30):
        prod.add({"user": f"u{i % 2}", "kind": "update", "value": 1.0 + i, "seq": seq})
        seq += 1
    prod.add({"user": "u1", "kind": "delete", "value": 0.0, "seq": seq})
    seq += 1
    prod.add({"user": "u2", "kind": "insert", "value": 7.5, "seq": seq})

    src = open_stream(spark, str(tmp_path), "cdc", group="cdc", batch_size=10)
    typed = project(
        src,
        {"user": "string", "kind": "string", "value": "double", "seq": "bigint"},
    )
    out = compact_changes(
        typed,
        key_col="user",
        type_col="kind",
        value_col="value",
        seq_col="seq",
        tombstone_type="delete",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cdc_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM cdc_out ORDER BY last_seq"
        ).collect()
    finally:
        q.stop()

    final = {}
    for r in rows:  # update mode: the LAST row per key is the net state
        final[r.key] = r
    # u0 takes even i = 0..28 (15 events); survivor i=28 → value 29.0
    assert final["u0"].last_type == "update"
    assert final["u0"].last_value == 29.0
    assert final["u0"].n_changes == 15
    assert not final["u0"].is_tombstone
    # u1: ends tombstoned by the delete marker
    assert final["u1"].last_type == "delete"
    assert final["u1"].is_tombstone
    assert final["u1"].n_changes == 16
    # u2: single insert
    assert final["u2"].last_type == "insert"
    assert final["u2"].last_value == 7.5
    assert final["u2"].n_changes == 1
    # state carried ACROSS batches (batch cap 10 < 32 rows): u0 must have
    # been emitted in more than one batch with increasing n_changes
    u0_counts = [r.n_changes for r in rows if r.key == "u0"]
    assert len(u0_counts) >= 2
    assert u0_counts == sorted(u0_counts)


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the fold directly."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def _run_fold(state, rows):
    """Drive the REAL inner update function (grabbed via a stub frame)
    on an in-memory chunk — no streaming query needed."""
    from redis_streams_spark.streaming import compact as mod
    from redis_streams_spark.streaming.compact import compact_changes

    captured = {}

    class _Grab:
        def groupBy(self, *a):
            return self

        def applyInPandasWithState(self, fn, **kw):
            captured["fn"] = fn
            return None

    compact_changes(
        _Grab(),
        key_col="user",
        type_col="kind",
        value_col="value",
        seq_col="seq",
        tombstone_type="delete",
    )
    pdf = mod.pd.DataFrame(rows)
    return list(captured["fn"](("u1",), iter([pdf]), state))


def test_fold_redelivery_does_not_inflate_n_changes():
    st = _FakeState()
    _run_fold(st, [{"kind": "update", "value": 1.0, "seq": 1},
                   {"kind": "update", "value": 2.0, "seq": 2}])
    assert st.get == ("update", 2.0, 2, 2)
    # redelivered epoch (seqs 1-2) plus one genuinely new row
    _run_fold(st, [{"kind": "update", "value": 1.0, "seq": 1},
                   {"kind": "update", "value": 2.0, "seq": 2},
                   {"kind": "update", "value": 3.0, "seq": 3}])
    assert st.get == ("update", 3.0, 3, 3)  # NOT 5: replays not counted


def test_fold_skips_dirty_null_seq_rows():
    st = _FakeState()
    out = _run_fold(st, [{"kind": "update", "value": 1.0, "seq": None},
                         {"kind": "update", "value": 2.0, "seq": 5}])
    assert st.get == ("update", 2.0, 5, 1)  # null-seq row dropped, no crash
    assert out[0]["n_changes"].iloc[0] == 1


def test_fold_non_integral_seq_is_dirty_not_truncated():
    # a non-integral seq ('3.5') is OUT OF CONTRACT (the order key is a
    # long): truncating it into state would let the SAME row pass
    # seq > last_seq on every replay, inflating n_changes forever
    # (review finding, round 7) — so it is dirty-dropped like null
    st = _FakeState()
    _run_fold(st, [{"kind": "update", "value": 1.0, "seq": "3.5"},
                   {"kind": "update", "value": 2.0, "seq": "4"}])
    assert st.get == ("update", 2.0, 4, 1)  # only the integral row folds
    _run_fold(st, [{"kind": "update", "value": 1.0, "seq": "3.5"}])
    assert st.get[3] == 1  # replay of the dirty row never counts


def test_fold_nonfinite_seq_never_poisons():
    # 'inf' parses numeric but cannot live in bigint state: folding it
    # would OverflowError at emit on every checkpoint retry (review
    # finding, round 7) — dirty-dropped instead
    st = _FakeState()
    out = _run_fold(st, [{"kind": "update", "value": 1.0, "seq": "inf"},
                         {"kind": "update", "value": 2.0, "seq": 7}])
    assert st.get == ("update", 2.0, 7, 1)
    assert out[0]["last_seq"].iloc[0] == 7


def test_fold_exact_past_double_precision():
    # msgid-derived seqs sit near 1.7e18 — far past 2^53, where float64
    # cannot distinguish n from n+1: state must stay exact-int so a
    # genuinely newer event is never dropped (review finding, round 7)
    base = 2**53
    st = _FakeState()
    _run_fold(st, [{"kind": "update", "value": 1.0, "seq": base}])
    assert st.get == ("update", 1.0, base, 1)
    _run_fold(st, [{"kind": "update", "value": 2.0, "seq": base + 1}])
    assert st.get == ("update", 2.0, base + 1, 2)  # +1 NOT lost to float
