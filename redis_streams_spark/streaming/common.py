"""Shared value objects + group bootstrap (reference common.py semantics).

Citations refer to /root/reference/redis_streams/ for behavioral parity
(no code copied — from-scratch implementation over StreamLog).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from enum import Enum

from redis_streams_spark.sources.stream_log import StreamLog


@dataclass
class RedisMsg:
    """One delivered message (consumer.py:14-23)."""

    msgid: str
    content: dict


class Status(Enum):
    """Monitor health states — exact strings (monitor.py:13-16)."""

    OK = "OK"
    PENDING = "WARNING - too many pending items"
    IDLE = "WARNING - idle for long time"


class Scale(Enum):
    """Scaler suggestions (scaler.py:9-12)."""

    OUT = "OUT"
    IN = "IN"
    NOSCALE = "NO_SCALE"


def now_ms() -> int:
    return int(time.time() * 1000)


class BaseStreamClass:
    """Creates the stream + consumer group idempotently on construction,
    delivering from the beginning of the stream (common.py:20-41: id
    ``0-0`` + MKSTREAM; BUSYGROUP swallowed — i.e. create is a no-op if
    the group exists)."""

    def __init__(self, log: StreamLog, stream: str, consumer_group: str):
        self.log = log
        self.stream = stream
        self.consumer_group = consumer_group
        self.prepare_redis_instance()

    def prepare_redis_instance(self) -> None:
        self.log.create_group(self.consumer_group)

    # -- PEL ops shared by Consumer and Monitor (common.py:48-85) -------
    def get_pending_items_of_consumer(
        self, item_count: int, consumer_id: str
    ) -> list[dict]:
        """Oldest ``item_count`` PEL rows owned by ``consumer_id`` in the
        reference's row shape (common.py:61-64)."""
        state = self.log.group_state(self.consumer_group)
        now = now_ms()
        rows = [
            {
                "message_id": msgid,
                "consumer": e["consumer"],
                "time_since_delivered": now - e["delivered_ms"],
                "times_delivered": e["times_delivered"],
            }
            for msgid, e in sorted(state["pel"].items())
            if e["consumer"] == consumer_id
        ]
        return rows[:item_count]

    def remove_consumer(self, consumer_to_delete: str) -> int:
        """XGROUP DELCONSUMER: drop the consumer and its PEL entries;
        returns the number of pending messages lost with it
        (common.py:75-85)."""
        def evict(state: dict) -> int:
            lost = [
                m
                for m, e in state["pel"].items()
                if e["consumer"] == consumer_to_delete
            ]
            for m in lost:
                del state["pel"][m]
            state["consumers"].pop(consumer_to_delete, None)
            return len(lost)

        return self.log.update_group(self.consumer_group, evict)
