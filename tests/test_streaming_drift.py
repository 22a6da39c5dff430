"""Streaming drift monitor: exact JS vs a batch recomputation, near-zero
for same-distribution streams, large for shifted ones, O(1) state."""

from __future__ import annotations

import numpy as np
import pytest

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming import Producer
from redis_streams_spark.streaming.bridge import open_stream
from redis_streams_spark.streaming.drift import (
    js_divergence,
    reference_histogram,
    streaming_drift,
)
from redis_streams_spark.streaming.quantiles import N_BINS, bin_index
from redis_streams_spark.streaming.windows import project


def _base_value(i: int) -> float:
    return float(1 + (i * 13) % 40)


def test_js_divergence_empty_is_null_not_nan():
    """ADVICE r07: a key whose values were all dirty-dropped must score
    NULL, not NaN — NaN never exceeds a threshold, silently disabling
    the alarm; NULL is distinguishable as 'no data'."""
    ref = np.asarray(reference_histogram([1.0, 2.0, 3.0]))
    assert js_divergence(np.zeros(N_BINS, dtype=np.int64), ref) is None
    assert js_divergence(ref, np.zeros(N_BINS, dtype=np.int64)) is None
    assert js_divergence(ref, ref) == pytest.approx(0.0)


def test_streaming_drift_scores(spark, tmp_path):
    # reference = the same generator the 'same' stream draws from
    ref = reference_histogram([_base_value(i) for i in range(500)])

    log = StreamLog(str(tmp_path), "dr")
    prod = Producer(log, "dr")
    n = 100
    for i in range(n):
        # key 'same' follows the reference; key 'shifted' is 100x larger
        prod.add({"event_type": "same", "value": _base_value(i)})
        prod.add({"event_type": "shifted", "value": 100.0 * _base_value(i)})

    src = open_stream(spark, str(tmp_path), "dr", group="dr", batch_size=37)
    typed = project(src, {"event_type": "string", "value": "double"}).select(
        "event_type", "value"
    )
    out = streaming_drift(typed, reference=ref)
    q = (
        out.writeStream.format("memory")
        .queryName("dr_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM dr_out ORDER BY n_seen").collect()
    finally:
        q.stop()

    final = {}
    for r in rows:
        final[r.key] = r
    assert final["same"].n_seen == n and final["shifted"].n_seen == n

    # exact equality with a pure recomputation over the same rows
    for key, gen in (("same", 1.0), ("shifted", 100.0)):
        counts = np.bincount(
            bin_index(np.array([gen * _base_value(i) for i in range(n)])),
            minlength=N_BINS,
        )
        expect = js_divergence(counts, np.asarray(ref))
        assert final[key].js_divergence == pytest.approx(expect, abs=1e-12)

    # and the scores mean what they claim: same ~ 0, shifted >> 0
    assert final["same"].js_divergence < 0.02
    assert final["shifted"].js_divergence > 0.5
    # JS is bounded by ln 2
    assert final["shifted"].js_divergence <= np.log(2) + 1e-12

    # state accumulated across batches (cap 37 < 200 appended rows)
    same_vals = sorted({r.n_seen for r in rows if r.key == "same"})
    assert len(same_vals) >= 2 and same_vals[-1] == n


def test_reference_must_match_bin_grid():
    with pytest.raises(ValueError, match="bin histogram"):
        streaming_drift(None, reference=[1, 2, 3])


def test_empty_reference_rejected():
    # an all-zero reference would score NaN forever — NaN never crosses
    # an alert threshold, silently disabling the alarm (review finding)
    with pytest.raises(ValueError, match="empty"):
        streaming_drift(None, reference=reference_histogram([]))
