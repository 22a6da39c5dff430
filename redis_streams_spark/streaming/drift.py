"""Streaming distribution-drift monitor — per-group log-histogram vs a
broadcast reference, scored with Jensen-Shannon divergence per batch.

The streaming form of ``q_mix_drift`` / ``q_ks_test``: each group folds
its values into the same fixed log-spaced histogram the quantile sketch
uses (:mod:`redis_streams_spark.streaming.quantiles` — O(1) state,
mergeable by vector add), and after every micro-batch emits the JS
divergence between the group's cumulative value distribution and a
REFERENCE histogram captured offline (yesterday's corpus, the training
distribution, a golden baseline).  JS is symmetric, bounded by ln 2,
and defined for zero cells without smoothing (0·ln 0 = 0), so the
score is exact — no sampling, no approximation beyond the shared
binning — and deterministic for any stream order or batch split.

This is the always-on "has the live feed drifted from what we trained
on" alarm: state never grows, the reference ships as a plain array in
the closure (broadcast once per query), and the emitted score is
directly thresholdable (alert at, say, 0.1 nats).

Reference basis: none (the reference delivers messages; monitoring
their distribution is left to callbacks).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from redis_streams_spark.streaming.quantiles import (
    N_BINS,
    bin_index,
    fold_histogram_state,
)

OUTPUT_SCHEMA = "key string, n_seen bigint, js_divergence double"
STATE_SCHEMA = "counts array<bigint>, n_seen bigint"


def reference_histogram(values) -> list[int]:
    """Build a reference histogram from offline values (the baseline a
    live stream is compared against)."""
    return (
        np.bincount(bin_index(np.asarray(values, dtype=float)), minlength=N_BINS)
        .astype(int)
        .tolist()
    )


def js_divergence(counts: np.ndarray, ref_counts: np.ndarray):
    """Exact JS divergence (nats) between two histogram distributions on
    the shared bin grid; 0·ln 0 cells contribute 0, no smoothing.

    Returns ``None`` (SQL NULL downstream) when either histogram is
    empty: NaN never exceeds an alert threshold, so returning NaN here
    would silently disable any ``js_divergence > t`` alarm for a key
    whose values were all dirty-dropped.  NULL lets thresholding
    operators distinguish "no data" from "no drift" (advice, round 7).
    """
    n, m = counts.sum(), ref_counts.sum()
    if n == 0 or m == 0:
        return None
    p = counts / n
    q = ref_counts / m
    mid = (p + q) / 2
    with np.errstate(divide="ignore", invalid="ignore"):
        tp = np.where(p > 0, p * np.log(p / mid), 0.0)
        tq = np.where(q > 0, q * np.log(q / mid), 0.0)
    return float(0.5 * tp.sum() + 0.5 * tq.sum())


def streaming_drift(
    df: DataFrame,
    reference: list[int],
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Maintain a per-key value histogram across micro-batches and emit
    its JS divergence vs ``reference`` after each batch (update output
    mode: one row per touched key per batch)."""
    if len(reference) != N_BINS:
        raise ValueError(
            f"reference must be a {N_BINS}-bin histogram "
            "(build it with reference_histogram())"
        )
    ref = np.asarray(reference, dtype=np.int64)
    if ref.sum() <= 0:
        # an empty reference would make every score NaN — and NaN never
        # exceeds an alert threshold, silently disabling the alarm the
        # operator exists to provide (review finding, round 7)
        raise ValueError(
            "reference histogram is empty (sum 0): build it from a "
            "non-empty offline sample"
        )

    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        counts, n_seen = fold_histogram_state(state, pdfs, value_col)
        yield pd.DataFrame(
            {
                "key": [str(key[0])],
                "n_seen": [n_seen],
                "js_divergence": [js_divergence(counts, ref)],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
