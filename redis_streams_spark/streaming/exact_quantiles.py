"""Streaming EXACT quantiles — the streaming twin of the batch
bucketed prefix-sum order-statistics family (operators/prefix.py).

State per key is the histogram over DISTINCT (optionally quantized)
values — the same frame the batch family's ``bucketed_cumsum`` runs
over — so state size is bounded by value-domain cardinality, NOT by
stream length: a key that has seen 10^9 messages over a domain with
50k distinct quantized values holds 50k (value, count) pairs, and the
quantile read-back is an exact cumulative walk over the sorted
histogram.  Output quantile for q is the value at 1-based rank
ceil(q·n) of the sorted multiset — bit-identical to the batch
definition in ``q_exact_quantiles_hist`` / ``q_quantile_sketch_audit``,
so the two surfaces can be compared value-for-value (tested in
``tests/test_streaming_exact_quantiles.py`` against both the batch
order statistic and the log-histogram sketch's [1, BASE] bound).

Versus :mod:`redis_streams_spark.streaming.quantiles` (the log-binned
sketch): this operator is exact but its state grows with distinct-value
cardinality; the sketch is O(1)-state with a ≤15.5% value-axis error.
Pick the sketch for unbounded domains (raw latencies, byte sizes at
ns precision), this operator when exactness matters and the domain is
bounded or quantizable (prices, scores, bucketed measurements) — the
``quantize`` dial makes that trade explicit, exactly like the batch
family's bucket ``width``.

Delivery contract matches the other streaming counters: once-delivery
(redelivery inflates counts); values that fail numeric coercion are
dropped, like the sketch's fold.

Reference basis: none (the reference delivers messages; aggregating
them is left to callbacks — SURVEY §2.2 extension surface).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

QUANTILES = (0.5, 0.9, 0.99)

OUTPUT_SCHEMA = (
    "key string, n_seen bigint, n_distinct bigint, "
    "p50 double, p90 double, p99 double"
)
STATE_SCHEMA = "values array<double>, counts array<bigint>, n_seen bigint"


def exact_quantiles_from_hist(
    values: np.ndarray, counts: np.ndarray, qs=QUANTILES
) -> list[float]:
    """Exact order statistics from a (distinct value, count) histogram:
    the estimate for q is the value whose cumulative count first reaches
    the 1-based rank ceil(q·n) in ascending value order — the same
    definition as the batch prefix-sum family."""
    n = int(counts.sum())
    if n == 0:
        return [float("nan")] * len(qs)
    order = np.argsort(values, kind="stable")
    cum = np.cumsum(counts[order])
    out = []
    for q in qs:
        rank = max(1, int(np.ceil(q * n)))
        idx = int(np.searchsorted(cum, rank, side="left"))
        out.append(float(values[order][idx]))
    return out


def streaming_exact_quantiles(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    quantize: int | None = None,
) -> DataFrame:
    """Maintain per-key EXACT p50/p90/p99 across micro-batches (update
    output mode: one row per touched key per batch).  ``quantize``
    rounds values to that many decimals before counting (None = raw
    doubles), bounding state by the quantized-domain cardinality."""

    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            vals_l, counts_l, n_seen = state.get
            acc: dict[float, int] = dict(zip(vals_l, counts_l))
        else:
            acc, n_seen = {}, 0
        for pdf in pdfs:
            vals = pd.to_numeric(pdf[value_col], errors="coerce").dropna()
            if not len(vals):
                continue
            if quantize is not None:
                vals = vals.round(quantize)
            n_seen += len(vals)
            for v, c in vals.value_counts().items():
                v = float(v)
                acc[v] = acc.get(v, 0) + int(c)
        values = np.fromiter(acc.keys(), dtype=float, count=len(acc))
        counts = np.fromiter(acc.values(), dtype=np.int64, count=len(acc))
        state.update((values.tolist(), counts.tolist(), n_seen))
        p50, p90, p99 = exact_quantiles_from_hist(values, counts)
        yield pd.DataFrame(
            {
                "key": [str(key[0])],
                "n_seen": [n_seen],
                "n_distinct": [len(acc)],
                "p50": [p50],
                "p90": [p90],
                "p99": [p99],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
