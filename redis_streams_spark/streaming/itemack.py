"""Per-item ack on top of epoch commit (SURVEY §7 hard part (a)).

The reference acks message-by-message (XACK) while Structured Streaming
commits whole epochs.  ``AckedBatchProcessor`` bridges the two contracts:

- the user callback receives RedisMsg-shaped rows and acks each id as it
  finishes (``ack(msgid)``) — identical call pattern to the reference's
  consume loop (README.md:57-64);
- acks are recorded in a side log keyed by msgid (the group state's
  ``item_acks`` set);
- if the callback raises mid-batch, the epoch aborts and the batch is
  REDELIVERED — but already-acked items are filtered out of the replay,
  so the observable behavior is exactly per-item at-least-once: an item
  is re-processed only if it was never acked.

The side log is pruned up to the epoch commit frontier (everything below
``last_committed`` is implicitly acked), so it only ever holds acks for
in-flight epochs — bounded by batch_size, not by stream length.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming.common import RedisMsg


class ItemAckLog:
    """msgid-level ack set stored in the group state (atomic writes)."""

    def __init__(self, log: StreamLog, group: str):
        self.log = log
        self.group = group

    def acked(self) -> set[str]:
        return set(self.log.group_state(self.group).get("item_acks", []))

    def ack(self, msgid: str) -> None:
        def add(state: dict) -> None:
            acks = set(state.get("item_acks", []))
            if msgid not in acks:
                acks.add(msgid)
                state["item_acks"] = sorted(acks)

        self.log.update_group(self.group, add)

    def prune_below(self, pos: int) -> None:
        """Drop acks for msgids at positions below the commit frontier.

        Runs through update_group so the read-modify-write holds the group
        lock — and keep_ids is computed INSIDE the mutator: snapshotting
        the log before taking the lock would race a concurrent append+ack
        (the new msgid would be absent from the stale snapshot and its ack
        silently pruned)."""

        def prune(state: dict) -> None:
            acks = set(state.get("item_acks", []))
            if not acks:
                return
            keep_ids = {
                msgid
                for _, msgid, _ in self.log.read_slice(pos, self.log.count())
            }
            pruned = sorted(acks & keep_ids)
            if pruned != state.get("item_acks", []):
                state["item_acks"] = pruned

        self.log.update_group(self.group, prune)


class AckedBatchProcessor:
    """foreachBatch wrapper delivering per-item ack semantics.

    Usage::

        proc = AckedBatchProcessor(log, group="jobs", handler=handle_item)
        q = process_stream(spark, root, stream, proc, group="jobs", ...)

    where ``handler(msg: RedisMsg, ack: Callable[[], None])`` processes one
    message and calls ``ack()`` on success.
    """

    def __init__(
        self,
        log: StreamLog,
        group: str,
        handler: Callable[[RedisMsg, Callable[[], None]], None],
    ):
        self.acklog = ItemAckLog(log, group)
        self.log = log
        self.group = group
        self.handler = handler

    def __call__(self, batch_df, epoch_id: int) -> None:
        already = self.acklog.acked()
        # toLocalIterator bounds driver memory to ONE partition at a time:
        # the source's batch_size caps planned epochs, but nothing stops a
        # caller from routing an uncapped (batch_size=0 / AvailableNow)
        # stream through here — with collect() that materialized the whole
        # epoch on the driver.  The per-partition sort keeps the handler's
        # msgid order deterministic within each partition; cross-partition
        # order follows partition index, which the single-range source
        # planner already emits in position order.
        rows: Iterable = (
            batch_df.select("msgid", "content").sortWithinPartitions("msgid")
        ).toLocalIterator()
        for row in rows:
            if row["msgid"] in already:
                continue  # acked in a previous (failed) delivery of this epoch
            msg = RedisMsg(msgid=row["msgid"], content=dict(row["content"]))
            self.handler(msg, lambda m=msg: self.acklog.ack(m.msgid))
        # epoch completed → commit frontier advances; prune the side log
        state = self.log.group_state(self.group)
        self.acklog.prune_below(state.get("last_committed", 0))
