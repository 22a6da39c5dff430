"""Streaming weighted reservoir sampling — the streaming form of
``q_weighted_sample`` (Efraimidis & Spirakis 2006): each group keeps the
k rows with the largest u^(1/w) keys seen so far, where u is a
DETERMINISTIC hash uniform of the row id.

Because the key is a pure function of (id, weight), the reservoir after
any prefix of the stream equals the batch top-k over the distinct rows
of that prefix — processing order and redelivery cannot change
MEMBERSHIP (an evicted row re-offered can never beat the scores that
evicted it), and a batch recomputation reproduces the streaming state
exactly, which is how the test verifies it.  ``n_seen`` is a plain
throughput counter and the one field that is NOT replay-exact (exact
dedup of it would need unbounded seen-id state).  State per group is
O(k): the id/score arrays of the current reservoir, checkpointed by
Spark.

Reference basis: none (the reference delivers messages; sampling them
is left to callbacks).  At 100 TB this is the always-on sampler that
maintains a representative per-source sample of an unbounded ingest
stream without ever storing the stream.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "key string, reservoir_ids array<string>, reservoir_scores array<double>, "
    "n_seen bigint"
)
STATE_SCHEMA = (
    "ids array<string>, scores array<double>, n_seen bigint"
)

_U32 = 4294967296.0


def _es_key(row_id: str, weight: float) -> float:
    """u^(1/w) with u = (h32(id)+1)/2^32 — same formula as the batch
    q_weighted_sample, so streaming and batch samples agree."""
    import math

    h = int(hashlib.md5(row_id.encode()).hexdigest()[:8], 16)
    u = (h + 1) / _U32
    if weight <= 0:
        return 0.0
    return math.exp(math.log(u) / weight)


def weighted_reservoir(
    df: DataFrame,
    key_col: str = "event_type",
    id_col: str = "msgid",
    weight_col: str = "value",
    k: int = 10,
) -> DataFrame:
    """Maintain a per-key weighted sample of size ``k`` across
    micro-batches (update output mode: one row per touched key per
    batch, carrying the current reservoir)."""

    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, scores, n_seen = state.get
            pool = dict(zip(list(ids), list(scores)))
        else:
            pool, n_seen = {}, 0
        for pdf in pdfs:
            w = pd.to_numeric(pdf[weight_col], errors="coerce")
            for rid, wt in zip(pdf[id_col].astype(str), w):
                if pd.isna(wt):
                    continue  # dirty weight: skip, never poison the query
                n_seen += 1
                if rid in pool:
                    continue  # replayed row: fold is idempotent
                pool[rid] = _es_key(rid, float(wt))
        # keep the k largest keys; (score, id) ordering makes ties stable
        top = sorted(pool.items(), key=lambda t: (-t[1], t[0]))[:k]
        ids_out = [t[0] for t in top]
        # state keeps FULL-precision scores — rounding them would let a
        # fresh unrounded score beat a stored rounded one at the batch
        # boundary, making membership replay-dependent (review finding
        # r06); only the EMITTED scores are rounded for display
        state.update((ids_out, [t[1] for t in top], n_seen))
        yield pd.DataFrame(
            {
                "key": [str(key[0])],
                "reservoir_ids": [ids_out],
                "reservoir_scores": [[round(t[1], 9) for t in top]],
                "n_seen": [n_seen],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
