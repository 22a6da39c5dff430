"""Stream storage + Spark Python DataSource for the engine's ingest log."""

from redis_streams_spark.sources.stream_log import StreamLog  # noqa: F401
from redis_streams_spark.sources.datasource import RedisLogDataSource  # noqa: F401
