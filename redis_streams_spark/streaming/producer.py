"""Producer — one-call-one-message publish (reference producer.py)."""

from __future__ import annotations

import time
from typing import Union

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming.common import BaseStreamClass


class Producer(BaseStreamClass):
    """Publishes messages to a stream; optional bounded retention.

    Parity: ``add`` = XADD returning the server-assigned msgid
    (producer.py:37-51); ``maxlen`` = trim-on-write retention
    (producer.py:26-35).  Divergence: our trim is exact, not ``MAXLEN ~``
    approximate — a strictly stronger bound (noted in SURVEY S2).

    Buffered mode (engine extension, OPT-IN — r09 verdict ask #5): the
    default unbuffered ``add`` matches the reference's one-XADD-per-call
    shape and pays one log+meta write per message (~2.7k msgs/s vs 216k
    for ``add_many`` — SCALE.md §producer).  Passing ``buffer_size``
    and/or ``buffer_ms`` turns ``add`` into an enqueue that flushes
    through ``add_many`` when the count or age threshold is reached.
    Documented divergence from the reference contract: a buffered ``add``
    returns ``None`` (the msgid is assigned at flush time); ``flush()``
    returns the flushed ids, and the producer is a context manager that
    flushes on CLEAN exit (a with-body exception skips the flush and
    keeps the buffer — see ``__exit__``).  The age threshold is
    evaluated LAZILY at the next ``add`` (no background timer thread):
    on a bursty-then-idle stream the last burst stays buffered until the
    next add, an explicit ``flush()``, or clean context exit.
    ``add_many`` flushes the pending buffer first so append order always
    matches call order.  Messages sitting in the buffer are
    invisible to consumers and are lost if the process dies before a
    flush — the same at-most-once window any client-side batching has,
    which is why it is opt-in rather than the default.
    """

    def __init__(
        self,
        log: StreamLog,
        stream: str,
        consumer_group: str = "spark",
        maxlen: Union[int, None] = None,
        buffer_size: Union[int, None] = None,
        buffer_ms: Union[int, None] = None,
    ):
        super().__init__(log=log, stream=stream, consumer_group=consumer_group)
        self.maxlen = maxlen
        if buffer_size is not None and buffer_size < 1:
            raise ValueError("buffer_size must be >= 1")
        if buffer_ms is not None and buffer_ms < 0:
            raise ValueError("buffer_ms must be >= 0")
        self.buffer_size = buffer_size
        self.buffer_ms = buffer_ms
        self._buffered = buffer_size is not None or buffer_ms is not None
        self._buf: list[dict] = []
        self._buf_t0: float | None = None

    def add(self, data: dict) -> Union[str, None]:
        """Publish one flat field→value message; returns its msgid
        (``"<ms-epoch>-<seq>"``).  In buffered mode the message is
        enqueued (flushing when a threshold trips) and ``None`` is
        returned — see the class docstring for the contract."""
        if not self._buffered:
            return self.log.append(data, maxlen=self.maxlen)
        now = time.monotonic()
        if not self._buf:
            self._buf_t0 = now
        self._buf.append(data)
        if (
            self.buffer_size is not None and len(self._buf) >= self.buffer_size
        ) or (
            self.buffer_ms is not None
            and (now - self._buf_t0) * 1000.0 >= self.buffer_ms
        ):
            self.flush()
        return None

    def flush(self) -> list[str]:
        """Append any buffered messages in one batch; returns their
        msgids (empty list when nothing is pending).  No-op in
        unbuffered mode.  The buffer is cleared only AFTER the append
        succeeds: a transient backend error leaves the messages queued
        so a retrying flush() re-sends them instead of losing them (the
        same delete-after-append discipline as the sink's staged
        commit)."""
        if not self._buf:
            return []
        ids = self.log.append_many(self._buf, maxlen=self.maxlen)
        self._buf, self._buf_t0 = [], None
        return ids

    def __enter__(self) -> "Producer":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        """Flush the buffer on CLEAN exit only.  When the with-body
        raised, publishing its partially-built buffer would make a
        half-finished batch visible on an error path the caller never
        chose to commit — the buffer is left intact instead (r10 ADVICE
        fix), so an except-handler that decides the messages are still
        wanted can call ``flush()`` explicitly; otherwise they are
        dropped with the producer (the documented at-most-once
        window)."""
        if exc_type is None:
            self.flush()

    def add_many(self, rows: list[dict]) -> list[str]:
        """Batch publish (engine extension): amortizes log+meta writes
        over the batch — the client-side batching the reference's
        one-XADD-per-call design leaves on the table.

        In buffered mode any pending ``add`` buffer is flushed FIRST, so
        the log's append order always matches call order — without this,
        ``add(a); add_many([b]); flush()`` would land ``b`` before ``a``
        (r10 ADVICE fix)."""
        self.flush()
        return self.log.append_many(rows, maxlen=self.maxlen)

    def __repr__(self) -> str:
        pending = f", pending={len(self._buf)}" if self._buffered else ""
        return (
            f"Producer(stream={self.stream}, maxlen={self.maxlen}, "
            f"messages={self.log.xlen()}{pending})"
        )
