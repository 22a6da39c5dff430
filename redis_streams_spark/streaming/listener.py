"""Spark-native monitor/scaler feed: a StreamingQueryListener emitting the
reference's ConsumerMetrics rows from query progress (SURVEY S11/S12/S15
— the monitor sweep becomes a driver-side progress callback; S16-S18 —
backlog is offset arithmetic from the progress's source offsets, no
materialization).

Mapping: one streaming query ≈ one consumer; queries reading the same
stream ≈ the consumer group.  pending ≈ planned-minus-committed rows of
the current epoch (the PEL analog); idle ≈ time since the last progress
event.
"""

from __future__ import annotations

import json
import time

from pyspark.sql.streaming import StreamingQueryListener

from redis_streams_spark.streaming.common import Scale, Status
from redis_streams_spark.streaming.monitor import ConsumerMetrics


def _pos(offset_json: str | None) -> int | None:
    if not offset_json:
        return None
    try:
        data = json.loads(offset_json)
    except (TypeError, ValueError):
        return None
    if isinstance(data, dict) and "pos" in data:
        return int(data["pos"])
    return None


class MonitorListener(StreamingQueryListener):
    """Collects per-query health rows with the reference's exact status
    strings and threshold priority (monitor.py:85-91)."""

    def __init__(
        self,
        batch_size: int = 100,
        idle_time_ms_warning_threshold: int = 30_000,
    ):
        self.batch_size = batch_size
        self.idle_threshold = idle_time_ms_warning_threshold
        self.last_progress_ms: dict[str, int] = {}
        self.backlog: dict[str, int] = {}
        self.inflight: dict[str, int] = {}
        self.metrics: list[ConsumerMetrics] = []

    # -- listener hooks --------------------------------------------------
    def onQueryStarted(self, event) -> None:
        self.last_progress_ms[str(event.id)] = int(time.time() * 1000)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        qid = str(p.id)
        now = int(time.time() * 1000)
        idle = now - self.last_progress_ms.get(qid, now)
        self.last_progress_ms[qid] = now
        pending = int(p.numInputRows)
        backlog = 0
        for src in p.sources:
            latest = _pos(getattr(src, "latestOffset", None))
            end = _pos(getattr(src, "endOffset", None))
            if latest is not None and end is not None:
                backlog += max(0, latest - end)
        self.backlog[qid] = backlog
        self.inflight[qid] = pending
        status = self._status(pending=pending, idle=idle)
        self.metrics.append(
            ConsumerMetrics(
                consumer_id=qid, pending_items=pending, idle_time=idle, status=status
            )
        )

    def onQueryTerminated(self, event) -> None:
        self.last_progress_ms.pop(str(event.id), None)

    def onQueryIdle(self, event) -> None:
        pass

    # -- reference semantics --------------------------------------------
    def _status(self, pending: int, idle: int) -> str:
        if pending > self.batch_size:
            return Status.PENDING.value
        if idle > self.idle_threshold:
            return Status.IDLE.value
        return Status.OK.value

    def scale_decision(
        self, scale_out_rate: int = 50, scale_in_rate: int = 10
    ) -> tuple[float, str]:
        """Scaler ladder (scaler.py:85-117) over listener-derived backlog
        (= stream_length) and in-flight rows (= pending), with the number
        of live queries as consumers_of_group."""
        if scale_in_rate > scale_out_rate:
            raise ValueError("Scale out rate must be bigger than scale in rate")
        length = sum(self.backlog.values())
        pending = sum(self.inflight.values())
        consumers = len(self.last_progress_ms)
        rate = (
            round(max(min(length / pending * 100, 100), 1), 4) if pending else 0
        )
        if rate == 0 and length == 0:
            return rate, Scale.NOSCALE.value
        if rate == 0 and length >= 1:
            return rate, Scale.OUT.value
        if rate < scale_in_rate and consumers > 1:
            return rate, Scale.IN.value
        if rate >= scale_out_rate:
            return rate, Scale.OUT.value
        return rate, Scale.NOSCALE.value
