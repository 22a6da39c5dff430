"""Scaler — backlog-based autoscaling advisor.

Parity with reference scaler.py: identical rate formula
``round(clamp(length/pending*100, 1, 100), 4)`` (scaler.py:74-83), the
lazy re-collect quirk (metrics re-gathered when either is falsy), the
exact decision ladder (scaler.py:85-97), default thresholds out=50/in=10
and their validation (scaler.py:65-72).

Intentional divergence (SURVEY S16): backlog length is pure offset
arithmetic over group metadata — O(1), counts correctly — instead of the
reference's O(backlog) XRANGE materialization with its acknowledged
off-by-one undercount (test_scaler.py:125-126).
"""

from __future__ import annotations

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming.common import BaseStreamClass, Scale


class Scaler(BaseStreamClass):
    def __init__(self, log: StreamLog, stream: str, consumer_group: str):
        super().__init__(log=log, stream=stream, consumer_group=consumer_group)
        self.stream_length = 0
        self.stream_pending = 0
        self.length_pending_rate: float = 0
        self.consumers_of_group = 0

    def collect_metrics(self) -> tuple[int, int]:
        """(backlog length, pending) — metadata-only, no materialization:
        length = appended − last_delivered_pos; pending = |PEL|."""
        state = self.log.group_state(self.consumer_group)
        self.stream_pending = len(state["pel"])
        self.consumers_of_group = len(state["consumers"])
        self.stream_length = max(0, self.log.count() - state["last_delivered_pos"])
        return self.stream_length, self.stream_pending

    @staticmethod
    def _validate_scaling_params(scale_out_rate: int, scale_in_rate: int) -> None:
        if scale_in_rate > scale_out_rate:
            raise ValueError("Scale out rate must be bigger than scale in rate")
        if scale_in_rate < 0 or scale_in_rate > 100:
            raise ValueError("Scale in rate must be within 0 and 100")
        if scale_out_rate < 0 or scale_out_rate > 100:
            raise ValueError("Scale out rate must be within 0 and 100")

    def _calculate_rate(self) -> None:
        if not all([self.stream_pending, self.stream_length]):
            self.collect_metrics()
        if self.stream_pending:
            self.length_pending_rate = round(
                max(min(self.stream_length / self.stream_pending * 100, 100), 1), 4
            )
        else:
            self.length_pending_rate = 0

    def _calculate_scale(self, scale_in_rate: int, scale_out_rate: int) -> str:
        if self.length_pending_rate == 0 and self.stream_length == 0:
            return Scale.NOSCALE.value
        if self.length_pending_rate == 0 and self.stream_length >= 1:
            return Scale.OUT.value
        if self.length_pending_rate < scale_in_rate and self.consumers_of_group > 1:
            return Scale.IN.value
        if self.length_pending_rate >= scale_out_rate:
            return Scale.OUT.value
        return Scale.NOSCALE.value

    def get_scale_decision(
        self, scale_out_rate: int = 50, scale_in_rate: int = 10
    ) -> tuple[float, str]:
        """Returns (rate, 'OUT'|'IN'|'NO_SCALE')."""
        self._validate_scaling_params(
            scale_out_rate=scale_out_rate, scale_in_rate=scale_in_rate
        )
        self._calculate_rate()
        return self.length_pending_rate, self._calculate_scale(
            scale_in_rate=scale_in_rate, scale_out_rate=scale_out_rate
        )
