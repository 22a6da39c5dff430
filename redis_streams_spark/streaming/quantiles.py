"""Streaming quantile estimation — per-group log-spaced histogram
sketch with fixed O(1) state and a PROVABLE relative-error bound.

The streaming form of ``q_percentiles`` / ``q_approx_aggs``: each group
keeps a fixed array of ``N_BINS`` counters over geometrically-spaced
value bins (16 bins per decade across 1e-6..1e12, one underflow bin for
values ≤ 1e-6).  A value lands in the bin whose upper edge is the
smallest ``BASE^i`` above it, so any quantile read back from the
cumulative histogram is the true quantile's bin UPPER edge — within a
factor of ``BASE = 10^(1/16) ≈ 1.155`` (≤ 15.5% relative error) of the
exact order statistic, deterministically, for any stream order and any
micro-batch split.  The histogram is trivially mergeable (vector add),
so the same sketch distributes across partitions or sessions.

Unlike rank-based sketches (GK/KLL) the guarantee here is on the VALUE
axis, which is what latency/size monitoring dashboards quote ("p99
within ~15%"); the price is the fixed value range.  Counts assume
once-delivery like the other streaming counters (redelivery inflates
ranks but never breaks the bin-edge value bound for the delivered
multiset).

Reference basis: none (the reference delivers messages; aggregating
them is left to callbacks).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from redis_streams_spark.functions.binning import (  # noqa: E402
    DECADES,
    LO_EXP as _LO_EXP,
    N_BINS,
    N_PER_DECADE,
)

BASE = 10.0 ** (1.0 / N_PER_DECADE)

OUTPUT_SCHEMA = (
    "key string, n_seen bigint, p50 double, p90 double, p99 double, "
    "rel_err_bound double"
)
STATE_SCHEMA = "counts array<bigint>, n_seen bigint"

QUANTILES = (0.5, 0.9, 0.99)


def bin_index(values: np.ndarray) -> np.ndarray:
    """Vectorized bin assignment: index i covers
    (BASE^(i-1+16*lo), BASE^(i+16*lo)]; index 0 catches v ≤ 1e-6
    (incl. zero/negative)."""
    v = np.asarray(values, dtype=float)
    with np.errstate(divide="ignore", invalid="ignore"):
        raw = np.ceil(np.log10(np.maximum(v, 1e-300)) * N_PER_DECADE)
    # +inf must clamp to the TOP bin, but astype(int) on non-finite is
    # platform-defined (INT64_MIN on numpy) and would land it in the
    # underflow bin below the clip (review finding, round 7); NaN (only
    # reachable via direct calls — the operator drops them first) goes
    # to the underflow bin
    idx = np.nan_to_num(raw, nan=0.0, posinf=0.0, neginf=0.0).astype(int) \
        - _LO_EXP * N_PER_DECADE
    idx = np.where(np.isposinf(v), N_BINS - 1, np.where(np.isnan(v), 0, idx))
    return np.clip(idx, 0, N_BINS - 1)


def bin_upper_edge(idx: int) -> float:
    """Upper edge of bin ``idx`` (the quantile estimate)."""
    if idx <= 0:
        return 10.0**_LO_EXP
    return float(10.0 ** ((idx + _LO_EXP * N_PER_DECADE) / N_PER_DECADE))


def estimate_quantiles(counts: np.ndarray, qs=QUANTILES) -> list[float]:
    """Read quantiles from the cumulative histogram: the estimate for q
    is the upper edge of the bin containing the ceil(q*n)-th smallest
    value — an upper bound on the true order statistic, within BASE of
    it (exact rank, approximate value)."""
    n = int(counts.sum())
    if n == 0:
        return [float("nan")] * len(qs)
    cum = np.cumsum(counts)
    out = []
    for q in qs:
        rank = max(1, int(np.ceil(q * n)))
        idx = int(np.searchsorted(cum, rank, side="left"))
        out.append(bin_upper_edge(idx))
    return out


def fold_histogram_state(state, pdfs, value_col: str):
    """Shared per-batch histogram fold for every log-histogram-state
    operator (this sketch and :mod:`~redis_streams_spark.streaming.drift`):
    restore counts/n_seen, coerce + drop dirty values, bincount-add each
    batch, persist, return (counts, n_seen).  One copy so value coercion
    and state encoding can never silently diverge between the sketches
    (review finding, round 7)."""
    if state.exists:
        counts_l, n_seen = state.get
        counts = np.asarray(counts_l, dtype=np.int64)
    else:
        counts, n_seen = np.zeros(N_BINS, dtype=np.int64), 0
    for pdf in pdfs:
        vals = pd.to_numeric(pdf[value_col], errors="coerce").dropna()
        if not len(vals):
            continue
        n_seen += len(vals)
        counts += np.bincount(
            bin_index(vals.to_numpy()), minlength=N_BINS
        ).astype(np.int64)
    state.update((counts.tolist(), n_seen))
    return counts, n_seen


def streaming_quantiles(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Maintain per-key p50/p90/p99 estimates across micro-batches
    (update output mode: one row per touched key per batch)."""

    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        counts, n_seen = fold_histogram_state(state, pdfs, value_col)
        p50, p90, p99 = estimate_quantiles(counts)
        yield pd.DataFrame(
            {
                "key": [str(key[0])],
                "n_seen": [n_seen],
                "p50": [p50],
                "p90": [p90],
                "p99": [p99],
                "rel_err_bound": [BASE - 1.0],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
