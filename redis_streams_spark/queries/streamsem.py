"""The reference's own operator semantics (SURVEY §2.1) as relational
queries over the ``events`` table, so the DuckDB gate verifies them.

The live streaming forms (Structured Streaming source/sink, listener-based
monitor, scaler advisor) live in redis_streams_spark.streaming /
redis_streams_spark.sources; these batch queries pin down the *semantics*:
msgid synthesis, time+count batch assembly, the monitor's exact status
strings and threshold priority, the scaler's exact rate formula and
decision ladder.

Simulation mapping (deterministic, engine-agnostic):
- msgid  = '<epoch-ms>-<seq>'   (reference: redis_streams_test/test_producer.py:14)
- stream = event_type, consumer = 'consumer-' || user_id % 8
- "delivered but unacked" (PEL membership) = value >= 50
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table
from redis_streams_spark.functions.rounding import rnd

_MS = "unix_millis(cast(ts as timestamp))"

BATCH_SIZE = 100  # reference default is 2 (consumer.py:43); scaled for data volume
IDLE_WARN_MS = 30_000  # monitor.py:56 default idle_time_ms_warning_threshold
SCALE_IN_RATE = 10  # scaler.py:99 defaults
SCALE_OUT_RATE = 50

STATUS_OK = "OK"
STATUS_PENDING = "WARNING - too many pending items"  # monitor.py:13-16 exact strings
STATUS_IDLE = "WARNING - idle for long time"


def _events_with_msgid(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn("ms", F.expr(_MS))
    seq = F.row_number().over(W.partitionBy("ms").orderBy("event_id")) - 1
    return ev.withColumn("msgid", F.format_string("%d-%06d", F.col("ms"), seq))


_MSGID_SQL = """
  SELECT *,
         printf('%d-%06d', ms,
                (row_number() OVER (PARTITION BY ms ORDER BY event_id) - 1)::INT) AS msgid
  FROM (SELECT *, epoch_ms(ts) AS ms FROM events) t
"""


@register(
    "q_stream_batch_collect",
    shape="bounded",
    tags=("stream", "batching"),
    oracle=f"""
WITH msgs AS ({_MSGID_SQL}),
assigned AS (
  SELECT 'consumer-' || (user_id % 8) AS consumer_id, msgid, ms, value,
         (row_number() OVER (PARTITION BY user_id % 8 ORDER BY ms, event_id) - 1)
           // {BATCH_SIZE} AS batch_seq
  FROM msgs
)
SELECT consumer_id, batch_seq,
       count(*) AS n_items,
       min(msgid) AS first_msgid,
       max(msgid) AS last_msgid,
       round(5e-10 + sum(value), 2) AS batch_value
FROM assigned
GROUP BY consumer_id, batch_seq
ORDER BY consumer_id, batch_seq
""",
)
def q_stream_batch_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch assembly (S4, consumer.py:92-103): messages delivered in
    arrival order per consumer, chunked into ≤batch_size batches — the
    count bound of the reference's time+count contract (the time bound is
    the trigger interval in the streaming form).  msgid is the reference's
    '<ms>-<seq>' (test_producer.py:14).  Scale: one window per consumer
    partition; no global ordering."""
    msgs = _events_with_msgid(spark, sf_dir)
    w = W.partitionBy(F.col("user_id") % 8).orderBy("ms", "event_id")
    assigned = msgs.select(
        F.concat(F.lit("consumer-"), (F.col("user_id") % 8).cast("string")).alias(
            "consumer_id"
        ),
        "msgid",
        "value",
        ((F.row_number().over(w) - 1) / BATCH_SIZE).cast("long").alias("batch_seq"),
    )
    return (
        assigned.groupBy("consumer_id", "batch_seq")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min("msgid").alias("first_msgid"),
            F.max("msgid").alias("last_msgid"),
            rnd(F.sum("value"), 2).alias("batch_value"),
        )
        .orderBy("consumer_id", "batch_seq")
    )


@register(
    "q_monitor_status",
    shape="bounded",
    tags=("stream", "monitor"),
    oracle=f"""
WITH per_consumer AS (
  SELECT 'consumer-' || (user_id % 8) AS consumer_id,
         count(*) FILTER (WHERE value >= 50) AS pending_items,
         (SELECT max(epoch_ms(ts)) FROM events) - max(epoch_ms(ts)) AS idle_time
  FROM events
  GROUP BY 1
)
SELECT consumer_id, pending_items, idle_time,
       CASE WHEN pending_items > {BATCH_SIZE} THEN '{STATUS_PENDING}'
            WHEN idle_time > {IDLE_WARN_MS} THEN '{STATUS_IDLE}'
            ELSE '{STATUS_OK}' END AS status
FROM per_consumer
ORDER BY consumer_id
""",
)
def q_monitor_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monitor health classification (S11, monitor.py:85-91): pending
    check takes priority over idle check; exact status strings from
    monitor.py:13-16; FIXTURES A2 column names."""
    ev = load_table(spark, sf_dir, "events").withColumn("ms", F.expr(_MS))
    max_ms = ev.agg(F.max("ms").alias("max_ms"))
    per_consumer = (
        ev.groupBy(
            F.concat(F.lit("consumer-"), (F.col("user_id") % 8).cast("string")).alias(
                "consumer_id"
            )
        )
        .agg(
            F.count(F.when(F.col("value") >= 50, 1)).alias("pending_items"),
            F.max("ms").alias("last_ms"),
        )
        .crossJoin(F.broadcast(max_ms))
        .withColumn("idle_time", F.col("max_ms") - F.col("last_ms"))
    )
    return (
        per_consumer.select(
            "consumer_id",
            "pending_items",
            "idle_time",
            F.when(F.col("pending_items") > BATCH_SIZE, STATUS_PENDING)
            .when(F.col("idle_time") > IDLE_WARN_MS, STATUS_IDLE)
            .otherwise(STATUS_OK)
            .alias("status"),
        )
        .orderBy("consumer_id")
    )


@register(
    "q_scaler_decision",
    shape="bounded",
    tags=("stream", "scaler"),
    oracle=f"""
WITH metrics AS (
  SELECT event_type,
         count(*) FILTER (WHERE ms >  mx - 21600000) AS stream_length,
         count(*) FILTER (WHERE ms <= mx - 21600000 AND ms > mx - 43200000
                          AND value >= 50)           AS stream_pending,
         count(DISTINCT CASE WHEN ms > mx - 86400000
                             THEN user_id % 8 END)::BIGINT AS consumers_of_group
  FROM (SELECT *, epoch_ms(ts) AS ms,
               max(epoch_ms(ts)) OVER () AS mx FROM events) t
  GROUP BY event_type
), rated AS (
  SELECT *,
         CASE WHEN stream_pending > 0
              THEN round(5e-10 + least(greatest(stream_length * 100.0 / stream_pending,
                                        1.0), 100.0), 4)
              ELSE 0.0 END AS rate
  FROM metrics
)
SELECT event_type, stream_length, stream_pending, consumers_of_group, rate,
       CASE WHEN rate = 0 AND stream_length = 0 THEN 'NO_SCALE'
            WHEN rate = 0 AND stream_length >= 1 THEN 'OUT'
            WHEN rate < {SCALE_IN_RATE} AND consumers_of_group > 1 THEN 'IN'
            WHEN rate >= {SCALE_OUT_RATE} THEN 'OUT'
            ELSE 'NO_SCALE' END AS suggestion
FROM rated
ORDER BY event_type
""",
)
def q_scaler_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scaler advisor (S16-S18): the exact rate formula
    ``round(5e-10 + clamp(length/pending*100, 1, 100), 4)`` (scaler.py:74-83) and
    decision ladder (scaler.py:85-117) with default thresholds
    in=10/out=50 (scaler.py:99), per event_type stream.  Backlog/pending
    are offset arithmetic over window metadata — no data materialization,
    fixing the reference's O(backlog) XRANGE scan (scaler.py:56-62)."""
    ev = load_table(spark, sf_dir, "events").withColumn("ms", F.expr(_MS))
    mx = ev.agg(F.max("ms").alias("mx"))
    metrics = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("event_type")
        .agg(
            F.count(F.when(F.col("ms") > F.col("mx") - 21_600_000, 1)).alias(
                "stream_length"
            ),
            F.count(
                F.when(
                    (F.col("ms") <= F.col("mx") - 21_600_000)
                    & (F.col("ms") > F.col("mx") - 43_200_000)
                    & (F.col("value") >= 50),
                    1,
                )
            ).alias("stream_pending"),
            F.countDistinct(
                F.when(F.col("ms") > F.col("mx") - 86_400_000, F.col("user_id") % 8)
            ).alias("consumers_of_group"),
        )
    )
    rated = metrics.withColumn(
        "rate",
        F.when(
            F.col("stream_pending") > 0,
            rnd(
                F.least(
                    F.greatest(
                        F.col("stream_length") * 100.0 / F.col("stream_pending"),
                        F.lit(1.0),
                    ),
                    F.lit(100.0),
                ),
                4,
            ),
        ).otherwise(0.0),
    )
    return (
        rated.select(
            "event_type",
            "stream_length",
            "stream_pending",
            "consumers_of_group",
            "rate",
            F.when((F.col("rate") == 0) & (F.col("stream_length") == 0), "NO_SCALE")
            .when((F.col("rate") == 0) & (F.col("stream_length") >= 1), "OUT")
            .when(
                (F.col("rate") < SCALE_IN_RATE) & (F.col("consumers_of_group") > 1), "IN"
            )
            .when(F.col("rate") >= SCALE_OUT_RATE, "OUT")
            .otherwise("NO_SCALE")
            .alias("suggestion"),
        )
        .orderBy("event_type")
    )


@register(
    "q_backlog_offsets",
    shape="bounded",
    tags=("stream", "scaler"),
    oracle=f"""
WITH msgs AS ({_MSGID_SQL}),
marks AS (
  SELECT event_type,
         max(msgid)                               AS last_generated_id,
         max(msgid) FILTER (WHERE value < 50)     AS last_delivered_id
  FROM msgs GROUP BY event_type
)
SELECT m.event_type, marks.last_delivered_id, marks.last_generated_id,
       count(*) FILTER (WHERE m.msgid > marks.last_delivered_id) AS backlog_len
FROM msgs m JOIN marks ON m.event_type = marks.event_type
GROUP BY m.event_type, marks.last_delivered_id, marks.last_generated_id
ORDER BY m.event_type
""",
)
def q_backlog_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backlog measurement (S16, scaler.py:36-63) via offset comparison of
    last-delivered vs last-generated msgid.  Implements the *correct*
    count (the reference undercounts by 1 and materializes the range —
    acknowledged at test_scaler.py:125-126; divergence intentional).
    msgid compare is lexicographic — valid because ms is fixed 13-digit
    and seq is zero-padded."""
    msgs = _events_with_msgid(spark, sf_dir)
    marks = msgs.groupBy("event_type").agg(
        F.max("msgid").alias("last_generated_id"),
        F.max(F.when(F.col("value") < 50, F.col("msgid"))).alias("last_delivered_id"),
    )
    return (
        msgs.join(F.broadcast(marks), "event_type")
        .groupBy("event_type", "last_delivered_id", "last_generated_id")
        .agg(
            F.count(F.when(F.col("msgid") > F.col("last_delivered_id"), 1)).alias(
                "backlog_len"
            )
        )
        .orderBy("event_type")
    )


@register(
    "q_pending_entries",
    shape="bounded",
    tags=("stream", "pel"),
    oracle=f"""
WITH msgs AS ({_MSGID_SQL}),
pel AS (
  SELECT msgid AS message_id,
         'consumer-' || (user_id % 8) AS consumer,
         (SELECT max(epoch_ms(ts)) FROM events) - ms AS time_since_delivered,
         1 + (event_id % 3) AS times_delivered,
         row_number() OVER (PARTITION BY user_id % 8 ORDER BY ms, event_id) AS rn
  FROM msgs WHERE value >= 50
)
SELECT message_id, consumer, time_since_delivered, times_delivered
FROM pel WHERE rn <= 10
ORDER BY consumer, message_id
""",
)
def q_pending_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEL range scan (S8, common.py:48-73): the oldest ≤10 pending
    entries per consumer with the reference's row shape
    {message_id, consumer, time_since_delivered, times_delivered}
    (common.py:61-64; FIXTURES A3)."""
    msgs = _events_with_msgid(spark, sf_dir).where(F.col("value") >= 50)
    max_ms = load_table(spark, sf_dir, "events").agg(
        F.max(F.expr(_MS)).alias("mx")
    )
    w = W.partitionBy(F.col("user_id") % 8).orderBy("ms", "event_id")
    pel = (
        msgs.crossJoin(F.broadcast(max_ms))
        .select(
            F.col("msgid").alias("message_id"),
            F.concat(F.lit("consumer-"), (F.col("user_id") % 8).cast("string")).alias(
                "consumer"
            ),
            (F.col("mx") - F.col("ms")).alias("time_since_delivered"),
            (1 + F.col("event_id") % 3).alias("times_delivered"),
            F.row_number().over(w).alias("rn"),
        )
    )
    return (
        pel.where(F.col("rn") <= 10)
        .select("message_id", "consumer", "time_since_delivered", "times_delivered")
        .orderBy("consumer", "message_id")
    )


@register(
    "q_eviction_plan",
    shape="bounded",
    tags=("stream", "monitor"),
    oracle=f"""
WITH per_consumer AS (
  SELECT 'consumer-' || (user_id % 8) AS consumer_id,
         count(*) FILTER (WHERE value >= 50 AND ms > mx - 43200000) AS pending_items,
         mx - max(ms) AS idle_time
  FROM (SELECT *, epoch_ms(ts) AS ms, max(epoch_ms(ts)) OVER () AS mx FROM events) t
  GROUP BY 1, mx
), classified AS (
  SELECT consumer_id, pending_items, idle_time,
         CASE WHEN pending_items > {BATCH_SIZE} THEN '{STATUS_PENDING}'
              WHEN idle_time > {IDLE_WARN_MS} THEN '{STATUS_IDLE}'
              ELSE '{STATUS_OK}' END AS status
  FROM per_consumer
), assignee AS (
  SELECT consumer_id AS assignee_id
  FROM classified WHERE status = '{STATUS_OK}'
  ORDER BY pending_items ASC, consumer_id ASC LIMIT 1
)
SELECT c.consumer_id AS victim_id, c.pending_items AS items_to_claim,
       a.assignee_id
FROM classified c CROSS JOIN assignee a
WHERE c.status <> '{STATUS_OK}'
ORDER BY victim_id
""",
)
def q_eviction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleanup orchestration plan (S13/S14, monitor.py:93-127,158-167):
    victims = unhealthy consumers; assignee = healthy consumer with
    MINIMUM pending (the intended semantics — the reference's tracker
    update at monitor.py:163-164 is reversed so the last healthy consumer
    wins; we implement min-pending and document the divergence)."""
    ev = load_table(spark, sf_dir, "events").withColumn("ms", F.expr(_MS))
    mx = ev.agg(F.max("ms").alias("mx"))
    per_consumer = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy(
            F.concat(F.lit("consumer-"), (F.col("user_id") % 8).cast("string")).alias(
                "consumer_id"
            )
        )
        .agg(
            F.count(
                F.when(
                    (F.col("value") >= 50) & (F.col("ms") > F.col("mx") - 43_200_000), 1
                )
            ).alias("pending_items"),
            (F.max("mx") - F.max("ms")).alias("idle_time"),
        )
    )
    classified = per_consumer.withColumn(
        "status",
        F.when(F.col("pending_items") > BATCH_SIZE, STATUS_PENDING)
        .when(F.col("idle_time") > IDLE_WARN_MS, STATUS_IDLE)
        .otherwise(STATUS_OK),
    )
    assignee = (
        classified.where(F.col("status") == STATUS_OK)
        .orderBy(F.asc("pending_items"), F.asc("consumer_id"))
        .limit(1)
        .select(F.col("consumer_id").alias("assignee_id"))
    )
    return (
        classified.where(F.col("status") != STATUS_OK)
        .crossJoin(F.broadcast(assignee))
        .select(
            F.col("consumer_id").alias("victim_id"),
            F.col("pending_items").alias("items_to_claim"),
            "assignee_id",
        )
        .orderBy("victim_id")
    )


@register(
    "q_stateful_running",
    shape="bounded",
    tags=("streaming-sem", "stateful"),
    oracle="""
WITH epochs AS (
  SELECT event_type AS key, event_id // 1000 AS epoch, value
  FROM events
), per_batch AS (
  SELECT key, epoch, count(*) AS batch_rows,
         sum(value) AS batch_value
  FROM epochs GROUP BY key, epoch
)
SELECT key, epoch::BIGINT AS epoch, batch_rows,
       sum(batch_rows) OVER w::BIGINT AS total_rows,
       round(5e-10 + sum(batch_value) OVER w, 4) AS total_value
FROM per_batch
WINDOW w AS (PARTITION BY key ORDER BY epoch ROWS UNBOUNDED PRECEDING)
ORDER BY key, epoch
""",
)
def q_stateful_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the custom stateful operator
    (``streaming/stateful.running_totals``): events bucketed into
    micro-batch-sized epochs (event_id div 1000), per (key, epoch) batch
    deltas plus the running per-key totals the checkpointed state store
    accumulates across batches.  Gives the applyInPandasWithState
    semantics a full-value driver-checkable row; the live streaming form
    is exercised by tests/test_stateful.py.

    Scale shape: one partial-aggregated groupBy to (key, epoch)
    cardinality, then the running window over that aggregate — the raw
    events never enter the window."""
    ev = load_table(spark, sf_dir, "events")
    per_batch = (
        ev.select(
            F.col("event_type").alias("key"),
            F.expr("event_id div 1000").alias("epoch"),
            "value",
        )
        .groupBy("key", "epoch")
        .agg(
            F.count(F.lit(1)).alias("batch_rows"),
            F.sum("value").alias("batch_value"),
        )
    )
    w = (
        W.partitionBy("key")
        .orderBy("epoch")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        per_batch.select(
            "key",
            F.col("epoch").cast("long").alias("epoch"),
            "batch_rows",
            F.sum("batch_rows").over(w).cast("long").alias("total_rows"),
            rnd(F.sum("batch_value").over(w), 4).alias("total_value"),
        )
        .orderBy("key", "epoch")
    )
