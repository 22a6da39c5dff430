"""Streaming distinct-count — per-group KMV (k-minimum-values) sketch.

The streaming form of ``q_hll_distinct`` / the batch ``q_kmv_jaccard``
sketch: each group keeps the ``k`` smallest md5-derived 32-bit hashes of
the items it has seen.  With the k-th minimum normalized to ``m ∈
(0, 1]``, the distinct count estimate is ``(k-1)/m`` (Bar-Yossef et al.,
"Counting distinct elements in a data stream", RANDOM 2002); while the
sketch holds fewer than ``k`` hashes it IS the distinct set and the
count is exact.  Relative error concentrates around ``1/sqrt(k-2)``
(~13% at k=64).

Properties that make it the right streaming shape:
- state per group is O(k) longs regardless of stream length or item
  cardinality (the same bound discipline as the Misra-Gries top-k and
  the log-histogram quantile sketch);
- the summary is MERGEABLE: union two sketches' hash sets and re-take
  the k smallest — used implicitly across micro-batches here, and
  directly for cross-partition/day rollups (same algebra the batch
  ``q_kmv_jaccard`` runs for set intersection);
- hashing is the repo-wide md5 ``h32``, so a batch recomputation (or a
  DuckDB query) can reproduce the sketch bit-for-bit.

``n_seen`` counts delivered messages (at-least-once redelivery inflates
it); the sketch itself is redelivery-IMMUNE — re-hashing a re-delivered
item inserts the same hash, and sets absorb duplicates, so
``est_distinct`` is unaffected.  That makes KMV the only sketch in this
module whose headline number survives redelivery exactly.

Reference basis: none (the reference delivers messages; aggregating
them is left to callbacks).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from redis_streams_spark.functions.hashing import h32_py

K_DEFAULT = 64
_HASH_SPACE = float(1 << 32)

OUTPUT_SCHEMA = (
    "key string, n_seen bigint, sketch_size int, exact boolean, "
    "est_distinct double"
)
STATE_SCHEMA = "hashes array<bigint>, n_seen bigint"


def kmv_merge(hashes: Iterable[int], new_hashes: Iterable[int], k: int) -> list[int]:
    """Union two hash multisets, keep the k smallest DISTINCT hashes —
    the KMV merge (commutative, associative, idempotent; a set union
    followed by a bounded truncation).  Pure function, shared by the
    streaming operator, the tests' independent recomputation, and any
    cross-shard rollup."""
    return sorted(set(hashes) | set(new_hashes))[:k]


def kmv_estimate(hashes: list[int], k: int) -> tuple[bool, float]:
    """(exact?, distinct estimate) for a KMV sketch.  Below k hashes the
    sketch is the distinct set itself (exact); at k, (k-1)/m with m the
    k-th minimum normalized into (0, 1]."""
    if len(hashes) < k:
        return True, float(len(hashes))
    m = (hashes[k - 1] + 1) / _HASH_SPACE  # +1: hash 0 must not div-zero
    return False, (k - 1) / m


def streaming_distinct(
    df: DataFrame,
    key_col: str = "event_type",
    item_col: str = "user_id",
    k: int = K_DEFAULT,
) -> DataFrame:
    """Maintain a per-key KMV distinct-count sketch across micro-batches
    (update output mode: one row per touched key per batch with the
    current estimate)."""

    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            hashes_l, n_seen = state.get
            hashes = [int(h) for h in hashes_l]
        else:
            hashes, n_seen = [], 0
        for pdf in pdfs:
            # delivered-message counter BEFORE the null-item drop — the
            # docstring's contract; otherwise n_seen under-reports
            # exactly when data is dirty (review finding, r08)
            n_seen += int(len(pdf))
            vals = pdf[item_col].dropna().astype(str)
            if not len(vals):
                continue
            # vectorized-ish: hash the batch's DISTINCT items only
            batch_hashes = [h32_py(v) for v in vals.unique()]
            hashes = kmv_merge(hashes, batch_hashes, k)
        state.update((hashes, n_seen))
        exact, est = kmv_estimate(hashes, k)
        yield pd.DataFrame(
            {
                "key": [str(key[0])],
                "n_seen": [n_seen],
                "sketch_size": [len(hashes)],
                "exact": [exact],
                "est_distinct": [round(est, 4)],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
