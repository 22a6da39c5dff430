"""Streaming log-histogram quantile sketch: value-axis error bound
(estimate within BASE of the exact order statistic), O(1) state, and
mergeability (vector add == single-pass histogram)."""

from __future__ import annotations

import math

import numpy as np

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming import Producer
from redis_streams_spark.streaming.bridge import open_stream
from redis_streams_spark.streaming.quantiles import (
    BASE,
    N_BINS,
    QUANTILES,
    bin_index,
    estimate_quantiles,
    streaming_quantiles,
)
from redis_streams_spark.streaming.windows import project


def _value(i: int) -> float:
    # heavy-tailed: spans ~4 decades so p50/p90/p99 land in distinct bins
    return float(1 + (i * 37) % 97) * (10 ** (i % 4)) / 7.0


def _exact_order_stat(vals: list[float], q: float) -> float:
    s = sorted(vals)
    return s[max(1, math.ceil(q * len(s))) - 1]


def test_streaming_quantiles_error_bound(spark, tmp_path):
    log = StreamLog(str(tmp_path), "qs")
    prod = Producer(log, "qs")
    n = 120
    for i in range(n):
        prod.add(
            {"event_type": ["a", "b"][i % 2], "value": _value(i)}
        )

    src = open_stream(spark, str(tmp_path), "qs", group="qs", batch_size=23)
    typed = project(src, {"event_type": "string", "value": "double"}).select(
        "event_type", "value"
    )
    out = streaming_quantiles(typed, key_col="event_type", value_col="value")
    q = (
        out.writeStream.format("memory")
        .queryName("qs_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM qs_out ORDER BY n_seen").collect()
    finally:
        q.stop()

    final = {}
    for r in rows:
        final[r.key] = r
    for key in ("a", "b"):
        vals = [_value(i) for i in range(n) if ["a", "b"][i % 2] == key]
        r = final[key]
        assert r.n_seen == len(vals)
        for q_lvl, est in zip(QUANTILES, (r.p50, r.p90, r.p99)):
            exact = _exact_order_stat(vals, q_lvl)
            # value-axis guarantee: exact <= est < exact * BASE
            assert exact <= est * (1 + 1e-12), (key, q_lvl, exact, est)
            assert est < exact * BASE * (1 + 1e-12), (key, q_lvl, exact, est)
        assert abs(r.rel_err_bound - (BASE - 1)) < 1e-12
    # state accumulated across batches (cap 23 < 120)
    a_vals = sorted({r.n_seen for r in rows if r.key == "a"})
    assert len(a_vals) >= 2 and a_vals[-1] == 60


def test_sketch_pure_functions():
    # exact powers of 10 sit on their own bin's upper edge
    idx = bin_index(np.array([1.0]))
    from redis_streams_spark.streaming.quantiles import bin_upper_edge

    assert bin_upper_edge(int(idx[0])) == 1.0
    # monotone: larger values never land in smaller bins
    vals = np.array([1e-7, 1e-3, 0.5, 1.0, 2.0, 999.0, 1e6, 1e12])
    idxs = bin_index(vals)
    assert list(idxs) == sorted(idxs)
    assert idxs[0] == 0 and idxs[-1] == N_BINS - 1
    # zero / negative go to the underflow bin
    assert list(bin_index(np.array([0.0, -5.0]))) == [0, 0]
    # non-finite: +inf clamps to the TOP bin (not the underflow bin via
    # int-cast wraparound), -inf/NaN to the underflow bin
    inf = float("inf")
    assert list(bin_index(np.array([inf, -inf, float("nan")]))) == [
        N_BINS - 1, 0, 0,
    ]
    # mergeability: histogram of the union == sum of histograms
    a = np.bincount(bin_index(vals[:4]), minlength=N_BINS)
    b = np.bincount(bin_index(vals[4:]), minlength=N_BINS)
    u = np.bincount(bin_index(vals), minlength=N_BINS)
    assert ((a + b) == u).all()
    assert estimate_quantiles(a + b) == estimate_quantiles(u)
