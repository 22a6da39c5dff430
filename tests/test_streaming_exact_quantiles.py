"""Streaming exact quantiles (streaming/exact_quantiles.py): exact
agreement with the batch order statistic across micro-batch splits,
state bounded by distinct-value cardinality, and the three-way
comparison against the log-histogram sketch's value-axis bound."""

from __future__ import annotations

import math

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming import Producer
from redis_streams_spark.streaming.bridge import open_stream
from redis_streams_spark.streaming.exact_quantiles import (
    QUANTILES,
    streaming_exact_quantiles,
)
from redis_streams_spark.streaming.quantiles import BASE, streaming_quantiles
from redis_streams_spark.streaming.windows import project


def _value(i: int) -> float:
    # heavy-tailed, same generator as the sketch test: ~4 decades
    return float(1 + (i * 37) % 97) * (10 ** (i % 4)) / 7.0


def _exact_order_stat(vals: list[float], q: float) -> float:
    s = sorted(vals)
    return s[max(1, math.ceil(q * len(s))) - 1]


def _run(spark, tmp_path, op, name, batch_size=23):
    src = open_stream(
        spark, str(tmp_path), "eq", group=name, batch_size=batch_size
    )
    typed = project(src, {"event_type": "string", "value": "double"}).select(
        "event_type", "value"
    )
    q = (
        op(typed)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        # update mode emits one row per touched key per batch; the final
        # (max n_seen) row per key is the settled answer
        rows = spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()
    final = {}
    for r in rows:
        if r.key not in final or r.n_seen > final[r.key].n_seen:
            final[r.key] = r
    return final


def test_streaming_exact_matches_batch_order_stat(spark, tmp_path):
    """Across 6 micro-batches (batch_size=23 over 120 messages), the
    folded histogram state yields BIT-EXACT batch order statistics, and
    the sketch run on the same stream stays within its [1, BASE] bound
    of those exact values — the streaming form of the batch
    q_quantile_sketch_audit comparison."""
    log = StreamLog(str(tmp_path), "eq")
    prod = Producer(log, "eq")
    n = 120
    data: dict[str, list[float]] = {"a": [], "b": []}
    for i in range(n):
        k, v = ["a", "b"][i % 2], _value(i)
        data[k].append(v)
        prod.add({"event_type": k, "value": v})

    exact = _run(spark, tmp_path, streaming_exact_quantiles, "eq_exact")
    assert set(exact) == {"a", "b"}
    for k, vals in data.items():
        r = exact[k]
        assert r.n_seen == len(vals)
        assert r.n_distinct == len(set(vals))
        for q, got in zip(QUANTILES, (r.p50, r.p90, r.p99)):
            assert got == _exact_order_stat(vals, q), (k, q)

    sketch = _run(spark, tmp_path, streaming_quantiles, "eq_sketch")
    for k in data:
        ex, sk = exact[k], sketch[k]
        for e, s in [(ex.p50, sk.p50), (ex.p90, sk.p90), (ex.p99, sk.p99)]:
            assert 1.0 <= s / e <= BASE + 1e-9, (k, e, s)


def test_quantize_dial_bounds_state(spark, tmp_path):
    """quantize=0 folds values to integers: n_distinct is bounded by the
    integer domain while quantiles stay exact over the QUANTIZED
    multiset — the same exactness-vs-state trade as the batch family's
    bucket width."""
    log = StreamLog(str(tmp_path), "eq")
    prod = Producer(log, "eq")
    vals = [0.1, 0.4, 1.2, 1.4, 1.9, 2.2, 2.49, 100.7] * 3
    for v in vals:
        prod.add({"event_type": "k", "value": v})

    final = _run(
        spark,
        tmp_path,
        lambda df: streaming_exact_quantiles(df, quantize=0),
        "eq_quant",
        batch_size=7,
    )
    r = final["k"]
    rounded = [round(v) for v in vals]
    assert r.n_distinct == len(set(rounded))
    assert r.p50 == _exact_order_stat(rounded, 0.5)
    assert r.p99 == _exact_order_stat(rounded, 0.99)


def test_streaming_exact_matches_testdata_batch(spark, tmp_path):
    """Three-surface parity on the REAL events testdata (sf0.001, 1000
    rows, 5 event types): stream the table through the log in 8
    micro-batches and require the streaming exact quantiles to equal the
    batch order statistics computed directly from the parquet — the
    same rank definition the registered prefix-sum quantile family
    uses."""
    import duckdb

    rows = duckdb.sql(
        "SELECT event_type, value FROM "
        "'/root/testdata/sf0.001/events.parquet' WHERE value IS NOT NULL"
    ).fetchall()
    by_key: dict[str, list[float]] = {}
    for k, v in rows:
        by_key.setdefault(k, []).append(float(v))

    log = StreamLog(str(tmp_path), "eq")
    prod = Producer(log, "eq")
    prod.add_many(
        [{"event_type": k, "value": v} for k, v in rows]
    )

    final = _run(
        spark, tmp_path, streaming_exact_quantiles, "eq_events",
        batch_size=125,
    )
    assert set(final) == set(by_key)
    for k, vals in by_key.items():
        r = final[k]
        assert r.n_seen == len(vals)
        assert r.n_distinct == len(set(vals))
        for q, got in zip(QUANTILES, (r.p50, r.p90, r.p99)):
            assert got == _exact_order_stat(vals, q), (k, q)
