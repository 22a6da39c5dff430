"""Producer — one-call-one-message publish (reference producer.py)."""

from __future__ import annotations

from typing import Union

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming.common import BaseStreamClass


class Producer(BaseStreamClass):
    """Publishes messages to a stream; optional bounded retention.

    Parity: ``add`` = XADD returning the server-assigned msgid
    (producer.py:37-51); ``maxlen`` = trim-on-write retention
    (producer.py:26-35).  Divergence: our trim is exact, not ``MAXLEN ~``
    approximate — a strictly stronger bound (noted in SURVEY S2).
    """

    def __init__(
        self,
        log: StreamLog,
        stream: str,
        consumer_group: str = "spark",
        maxlen: Union[int, None] = None,
    ):
        super().__init__(log=log, stream=stream, consumer_group=consumer_group)
        self.maxlen = maxlen

    def add(self, data: dict) -> str:
        """Publish one flat field→value message; returns its msgid
        (``"<ms-epoch>-<seq>"``)."""
        return self.log.append(data, maxlen=self.maxlen)

    def add_many(self, rows: list[dict]) -> list[str]:
        """Batch publish (engine extension): amortizes log+meta writes
        over the batch — the client-side batching the reference's
        one-XADD-per-call design leaves on the table."""
        return self.log.append_many(rows, maxlen=self.maxlen)

    def __repr__(self) -> str:
        return (
            f"Producer(stream={self.stream}, maxlen={self.maxlen}, "
            f"messages={self.log.xlen()})"
        )
