"""Streaming heavy hitters — per-group Misra-Gries top-k summaries.

The streaming form of ``q_heavy_hitters`` / ``q_cms_heavy_hitters``:
each group keeps at most ``k`` (item, count) counters using the
MERGEABLE Misra-Gries reduction (Agarwal et al., "Mergeable Summaries",
PODS 2012): per micro-batch the items are pre-counted VECTORIZED
(``value_counts``), added into the stored summary, and if the summary
then exceeds ``k`` entries, the (k+1)-th largest count ``m`` is
subtracted from every counter and non-positive counters are dropped —
at most ``k`` counters can exceed ``m``, so the summary shrinks back to
``≤ k`` while the classic guarantee is preserved:

- every stored count UNDER-estimates the true count by at most the total
  amount ever subtracted (tracked exactly and emitted as
  ``max_undercount``, itself ≤ n_seen/(k+1));
- every item whose true frequency exceeds n_seen/(k+1) is guaranteed
  present in the summary.

State per group is O(k) regardless of stream length or item
cardinality.  Like ``n_seen`` in the weighted reservoir, counts assume
each message is delivered once — at-least-once redelivery inflates them
(exact dedup would need unbounded seen-id state); the GUARANTEE above
still holds for the delivered multiset.

Reference basis: none (the reference delivers messages; aggregating
them is left to callbacks).  At 100 TB this is the always-on "what are
the hot keys right now" monitor over an unbounded ingest stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "key string, items array<string>, est_counts array<bigint>, "
    "n_seen bigint, max_undercount bigint"
)
STATE_SCHEMA = (
    "items array<string>, counts array<bigint>, n_seen bigint, dec bigint"
)


def misra_gries_merge(
    counters: dict[str, int], batch_counts: dict[str, int], k: int
) -> tuple[dict[str, int], int]:
    """Merge exact batch counts into a Misra-Gries summary, reducing it
    back to ``≤ k`` entries.  Returns (new summary, amount subtracted).

    Pure function, shared by the streaming operator and its test's
    independent recomputation."""
    for item, c in batch_counts.items():
        counters[item] = counters.get(item, 0) + c
    if len(counters) <= k:
        return counters, 0
    m = sorted(counters.values(), reverse=True)[k]  # (k+1)-th largest
    reduced = {i: c - m for i, c in counters.items() if c - m > 0}
    return reduced, m


def streaming_topk(
    df: DataFrame,
    key_col: str = "event_type",
    item_col: str = "user_id",
    k: int = 10,
) -> DataFrame:
    """Maintain a per-key Misra-Gries top-``k`` item summary across
    micro-batches (update output mode: one row per touched key per
    batch, carrying the current summary sorted by estimated count)."""

    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, n_seen, dec = state.get
            counters = dict(zip(list(items), [int(c) for c in counts]))
        else:
            counters, n_seen, dec = {}, 0, 0
        for pdf in pdfs:
            vals = pdf[item_col].dropna().astype(str)
            if not len(vals):
                continue
            vc = vals.value_counts()  # vectorized exact batch counts
            n_seen += int(vc.sum())
            counters, m = misra_gries_merge(
                counters, {i: int(c) for i, c in vc.items()}, k
            )
            dec += m
        top = sorted(counters.items(), key=lambda t: (-t[1], t[0]))
        state.update(
            ([t[0] for t in top], [t[1] for t in top], n_seen, dec)
        )
        yield pd.DataFrame(
            {
                "key": [str(key[0])],
                "items": [[t[0] for t in top]],
                "est_counts": [[t[1] for t in top]],
                "n_seen": [n_seen],
                "max_undercount": [dec],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
