"""Event-time streaming layer (SURVEY M4): typed projection of the
schemaless envelope + watermarked windows over the redislog source.

The reference has NO event-time concept (wall-clock only,
consumer.py:75-90); these operators are the Spark-native extension that
the ``events`` fixture exercises.  The envelope's msgid doubles as
ingest-time (``"<ms-epoch>-<seq>"``, SURVEY §1.1): ``ingest_ts`` is
derived by splitting it — so even untyped payloads get a time axis.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_ingest_time(stream_df: DataFrame) -> DataFrame:
    """Derive ingest-time from the msgid (<ms-epoch>-<seq>)."""
    return stream_df.withColumn(
        "ingest_ts",
        F.timestamp_millis(F.split("msgid", "-").getItem(0).cast("long")),
    )


def project(stream_df: DataFrame, fields: dict[str, str]) -> DataFrame:
    """Typed projection of the map<string,string> payload — the explicit
    schema-on-read step (SURVEY §7 hard part (d): no inference magic).

    ``fields`` maps payload key → Spark type DDL, e.g.
    ``{"user_id": "long", "ts": "timestamp", "value": "double"}``.
    """
    cols: list[Column] = [F.col("msgid")]
    for name, dtype in fields.items():
        cols.append(F.col("content").getItem(name).cast(dtype).alias(name))
    return stream_df.select(*cols)


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_size: str = "5 minutes",
    watermark: str = "10 minutes",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window aggregation (late rows beyond the
    watermark are dropped; state is bounded by watermark horizon)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_size), *keys)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            *keys,
            "n",
            "total",
        )
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_size: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_size, slide))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("win_start"), "n")
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries/duplicates by key within
    the watermark horizon (state is GC'd past it — bounded memory, the
    streaming form of dedup_exact).  Use the msgid as key for
    at-most-once delivery on top of the source's at-least-once."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(keys)


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    key: str = "user_id",
) -> DataFrame:
    """Native session windows (the streaming form of q_sessionize)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), key)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("sess_start"),
            F.col("session_window.end").alias("sess_end"),
            key,
            "n_events",
        )
    )


def ohlc_bars(
    events: DataFrame,
    ts_col: str = "ts",
    bar_size: str = "5 minutes",
    watermark: str = "10 minutes",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    order_col: str = "msgid",
    order_col_is_msgid: bool | None = None,
) -> DataFrame:
    """Watermarked streaming OHLC bars: open/high/low/close of
    ``value_col`` per event-time bar — the batch q_ohlc_bars semantics
    carried into Structured Streaming.

    open/close resolve with ``min_by``/``max_by`` over the composite
    (event time, ``order_col``) key, so ties at identical timestamps are
    deterministic — the same contract the batch form pins with
    row_number.  State per group is O(1) (four scalars + the sort keys),
    bounded overall by the watermark horizon × group cardinality.

    ``order_col_is_msgid`` picks the tie-break interpretation
    EXPLICITLY (ADVICE r06: per-row pattern sniffing silently
    reinterpreted any '<int>-<int>'-shaped id numerically, even when
    the caller relied on lexicographic order).  True → the column holds
    Redis-style msgids ('<ms>-<seq>') and is ordered numerically by the
    split (ms, seq) longs, because lexicographic string comparison
    diverges from stream order across digit-count boundaries
    ('100-0' < '99-0' as strings); False → plain column order.  The
    default None resolves from the column NAME (msgid → True), never
    from the values.
    """
    if order_col_is_msgid is None:
        order_col_is_msgid = order_col == "msgid"
    oc = F.col(order_col)
    if order_col_is_msgid:
        okey = F.struct(
            F.col(ts_col),
            F.split(oc, "-")[0].cast("long"),
            F.split(oc, "-")[1].cast("long"),
            oc,
        )
    else:
        okey = F.struct(F.col(ts_col), oc)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, bar_size), *keys)
        .agg(
            F.min_by(F.col(value_col), okey).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(F.col(value_col), okey).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            F.col("window.start").alias("bar_start"),
            F.col("window.end").alias("bar_end"),
            *keys,
            "open",
            "high",
            "low",
            "close",
            "n_ticks",
        )
    )
