"""redis_streams_spark — a PySpark-native analytics engine with the
capabilities of KissPeter/redis-streams, re-expressed Spark-first.

The reference (/root/reference, redis-streams v0.3.0) is a batch-collecting
stream-consumer framework over Redis Streams: producer, consumer-group
consumer with time+count bounded batching, health monitor, and a backlog
autoscaling advisor (see SURVEY.md).  This package supplies:

- ``sources``   : a file-backed append log ("stream log") plus a Spark
  Python DataSource exposing it as a Structured Streaming source/sink with
  the reference's batch-size-per-trigger contract (SURVEY §2.1 S1-S7).
- ``streaming`` : parity API — Producer / Consumer / Monitor / Scaler with
  the reference's exact semantics (status strings, rate formula, decision
  ladder; SURVEY §2.1 S8-S18).
- ``queries``   : the relational / windowing / event-time operator surface
  (SURVEY §2.2) expressed with Spark built-ins, each paired with an ANSI-SQL
  DuckDB oracle.
- ``operators`` : large-scale training-data-pipeline operators — dedup
  (exact / minhash-LSH / simhash / n-gram Jaccard / embedding-cosine),
  similarity search (brute-force + IVF), text analysis, multimodal column
  plumbing.
- ``functions`` : engine-agnostic deterministic column helpers (md5-based
  hashing, shingling, tokenization) designed so the same arithmetic is
  expressible in both Spark and the DuckDB oracle.
"""

__version__ = "0.1.0"

from redis_streams_spark.session import (  # noqa: F401
    TABLES,
    configure,
    get_spark,
    load_table,
    load_tables,
    register_views,
)
