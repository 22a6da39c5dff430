"""Consumer — time+count bounded batch collection with per-message ack.

Re-implements the reference's core dataflow (SURVEY §3.1 trace of
consumer.py:92-103) over StreamLog group state:

1. arm a hard deadline (now + max_wait_time_ms);
2. count already-assigned (PEL) messages first — crash recovery;
3. fill loop: while now ≤ deadline and assigned < batch_size, claim up to
   the deficit of never-delivered messages ('>' read), sleeping
   poll_time_ms when the stream is dry (the BLOCK emulation);
4. materialize the batch by re-reading this consumer's own PEL ('0' read)
   capped at batch_size — idempotent across crashes;
5. caller processes items and acks each via
   remove_item_from_consumer_group (XACK: removes from PEL, does NOT
   delete from the stream — consumer.py:180-191).
"""

from __future__ import annotations

import os
import threading
import time
import warnings
from typing import Union

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming.common import BaseStreamClass, RedisMsg, now_ms


class Consumer(BaseStreamClass):
    def __init__(
        self,
        log: StreamLog,
        stream: str,
        consumer_group: str,
        consumer_id: Union[str, int, None] = None,
        batch_size: int = 2,
        max_wait_time_ms: int = 10000,
        poll_time_ms: int = 1000,
        cleanup_on_exit: bool = True,
    ):
        # cleanup_on_exit: accepted for API parity; the reference stores
        # it without ever acting on it (consumer.py:46,72 — dead
        # parameter), and Spark-side consumer identity is managed by the
        # scheduler, so it is likewise a no-op here.
        super().__init__(log=log, stream=stream, consumer_group=consumer_group)
        # default identity = pid+thread-id (consumer.py:42)
        self.consumer_id = str(
            consumer_id
            if consumer_id is not None
            else f"{os.getpid()}{threading.get_ident()}"
        )
        self.batch_size = batch_size
        self.max_wait_time_ms = max_wait_time_ms
        self.poll_time_ms = poll_time_ms
        self.cleanup_on_exit = cleanup_on_exit
        self._hard_stop_ms = 0

    # -- internals -------------------------------------------------------
    def _set_hard_stop_time(self) -> None:
        self._hard_stop_ms = now_ms() + self.max_wait_time_ms

    def _keep_fetching(self, assigned: int) -> bool:
        return now_ms() <= self._hard_stop_ms and assigned < self.batch_size

    def _touch(self, state: dict) -> None:
        state["consumers"].setdefault(self.consumer_id, {})["last_seen_ms"] = now_ms()

    def _claim_new(self, deficit: int) -> int:
        """'>' read: move up to ``deficit`` never-delivered messages into
        this consumer's PEL, advancing the group cursor.  Runs under the
        group lock so concurrent consumers claim disjoint messages (the
        Redis-server serialization of XREADGROUP)."""

        def claim(state: dict) -> int:
            self._touch(state)
            start = state["last_delivered_pos"]
            batch = self.log.read_slice(start, min(start + deficit, self.log.count()))
            t = now_ms()
            for pos, msgid, _ in batch:
                state["pel"][msgid] = {
                    "pos": pos,
                    "consumer": self.consumer_id,
                    "delivered_ms": t,
                    "times_delivered": 1,
                }
                state["last_delivered_pos"] = pos + 1
            return len(batch)

        return self.log.update_group(self.consumer_group, claim)

    # -- public API ------------------------------------------------------
    def get_items(self) -> list[RedisMsg]:
        """Collect up to batch_size messages, returning after at most
        ~max_wait_time_ms even when the batch is incomplete."""
        self._set_hard_stop_time()

        def register(state: dict) -> set[str]:
            self._touch(state)
            return {
                m for m, e in state["pel"].items() if e["consumer"] == self.consumer_id
            }

        recovered = self.log.update_group(self.consumer_group, register)
        assigned = len(recovered)
        while self._keep_fetching(assigned):
            got = self._claim_new(max(1, self.batch_size - assigned))
            assigned += got
            if got == 0 and self._keep_fetching(assigned):
                remaining = self._hard_stop_ms - now_ms()
                time.sleep(max(0.0, min(self.poll_time_ms, remaining) / 1000.0))
        # final '0' re-read of own PEL, capped at batch_size
        def reread(state: dict) -> list[tuple[int, str]]:
            mine = sorted(
                (e["pos"], msgid)
                for msgid, e in state["pel"].items()
                if e["consumer"] == self.consumer_id
            )[: self.batch_size]
            for _, msgid in mine:
                if msgid in recovered:  # redelivery bumps the counter
                    state["pel"][msgid]["times_delivered"] += 1
            return mine

        mine = self.log.update_group(self.consumer_group, reread)
        by_pos = {
            pos: msgid for pos, msgid in mine
        }
        id_to_content = {
            msgid: content
            for _, msgid, content in self.log.read_slice(
                min(by_pos, default=0), max(by_pos, default=0) + 1
            )
            if msgid in set(by_pos.values())
        }
        return [
            RedisMsg(msgid=msgid, content=id_to_content.get(msgid, {}))
            for _, msgid in mine
        ]

    def remove_item_from_consumer_group(self, item_id: str) -> int:
        """XACK: drop one message from the PEL; the message itself stays
        in the stream (physical deletion is a retention concern —
        consumer.py:184-187 points at xdel/compaction)."""
        return self.log.update_group(
            self.consumer_group,
            lambda state: 1 if state["pel"].pop(item_id, None) is not None else 0,
        )

    def remove_items_from_consumer_group(self, item_ids: list[str]) -> int:
        """Batch XACK (engine extension): one locked state update for a
        whole batch — the high-throughput ack path (the reference only
        offers per-item ack; per-item remains for parity)."""

        def ack_all(state: dict) -> int:
            return sum(
                1 for i in item_ids if state["pel"].pop(i, None) is not None
            )

        return self.log.update_group(self.consumer_group, ack_all)

    def remove_item_from_stream(self, item_id: str) -> int:
        """Deprecated alias kept for API parity (consumer.py:193-207)."""
        warnings.warn(
            "remove_item_from_stream is deprecated; use "
            "remove_item_from_consumer_group",
            DeprecationWarning,
            stacklevel=2,
        )
        return self.remove_item_from_consumer_group(item_id)
