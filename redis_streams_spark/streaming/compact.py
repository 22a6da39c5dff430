"""Streaming CDC log compaction — the streaming form of the batch
``q_cdc_compact`` registry query: per-key last-writer-wins net state
maintained across micro-batches with a tombstone marker.

A change stream (e.g. the redislog source carrying row mutations) folds
into "current state per key": every micro-batch updates each touched
key's survivor to the latest (ts, seq)-ordered event, and a delete
marker tombstones the key while keeping the tombstone itself queryable
(so downstream MERGE appliers can propagate the delete).  State per key
is O(1) — the survivor tuple — checkpointed by Spark's state store, so
a restart resumes compaction without replay.

This is the maintenance loop behind a continuously-compacted 100 TB
table: the stream holds only the NET effect per key; appliers merge it
into the base table at their own cadence (see queries/cdc.py's
q_upsert_merge for the batch apply side).

Reference basis: none (the reference delivers messages; folding them is
left to user callbacks — README.md:57-64's consume loop).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "key string, last_type string, last_value double, last_seq bigint, "
    "n_changes bigint, is_tombstone boolean"
)
# last_seq is DOUBLE in state (full precision): truncating a fractional
# seq ('3.5') to int would let its own redelivery pass the seq > last_seq
# filter forever, inflating n_changes on every replay (review finding,
# round 7); the EMITTED last_seq stays bigint for display
STATE_SCHEMA = "last_type string, last_value double, last_seq double, n_changes bigint"


def compact_changes(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
    seq_col: str = "seq",
    tombstone_type: str = "delete",
) -> DataFrame:
    """Fold a change stream into per-key net state (update output mode:
    one row per touched key per batch).

    ``seq_col`` is the total order within a key (msgid-derived sequence,
    or any monotonically increasing long); the survivor is the row with
    the largest seq seen so far — replayed or out-of-order batches can
    never regress the state, which is what makes the epoch-level
    redelivery of the redislog source safe here (at-least-once delivery
    + monotonic fold = exactly-once net state).
    """

    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_type, last_value, last_seq, n_changes = state.get
        else:
            last_type, last_value, last_seq, n_changes = None, 0.0, -1.0, 0
        for pdf in pdfs:
            # dirty rows (missing/unparseable seq arrive as NaN) are
            # dropped, not fatal: astype on NaN would poison-pill the
            # query — every checkpoint retry re-hits the same row
            # (review finding, round 6)
            seqs = pd.to_numeric(pdf[seq_col], errors="coerce")
            fresh = pdf[seqs.notna() & (seqs > last_seq)]
            if fresh.empty:
                continue
            # count only seq > last_seq: cross-batch REDELIVERY of an
            # epoch must not inflate n_changes, or the 'exactly-once net
            # state' claim would hold for the survivor tuple only
            # (review finding, round 6)
            n_changes += len(fresh)
            # survivor pick uses the COERCED seqs, not a raw astype: a
            # numeric-but-non-integer seq ('3.5', '2e3') passes the
            # to_numeric filter yet raises in astype('int64'), which
            # would recreate exactly the checkpoint-retry poison-pill
            # the filter above exists to prevent (ADVICE r06)
            idx = seqs.loc[fresh.index].idxmax()
            top = fresh.loc[idx]
            last_seq = float(seqs.loc[idx])
            last_type = str(top[type_col])
            last_value = float(top[value_col])
        state.update((last_type, last_value, last_seq, n_changes))
        yield pd.DataFrame(
            {
                "key": [str(key[0])],
                "last_type": [last_type],
                "last_value": [last_value],
                "last_seq": [int(last_seq)],
                "n_changes": [n_changes],
                "is_tombstone": [last_type == tombstone_type],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
