"""Parity API layer — the reference's public surface (Producer, Consumer,
Monitor, Scaler) re-expressed over the engine's StreamLog + Structured
Streaming (SURVEY §2.1, M3)."""

from redis_streams_spark.streaming.common import RedisMsg, Scale, Status  # noqa: F401
from redis_streams_spark.streaming.consumer import Consumer  # noqa: F401
from redis_streams_spark.streaming.monitor import ConsumerMetrics, Monitor  # noqa: F401
from redis_streams_spark.streaming.producer import Producer  # noqa: F401
from redis_streams_spark.streaming.scaler import Scaler  # noqa: F401
