"""applyInPandasWithState: state persists across micro-batches."""

from __future__ import annotations

from redis_streams_spark.sources.stream_log import StreamLog
from redis_streams_spark.streaming import Producer
from redis_streams_spark.streaming.bridge import open_stream
from redis_streams_spark.streaming.stateful import running_totals
from redis_streams_spark.streaming.windows import project


def test_running_totals_across_batches(spark, tmp_path):
    log = StreamLog(str(tmp_path), "st")
    prod = Producer(log, "st")
    for i in range(30):
        prod.add({"event_type": ["a", "b"][i % 2], "value": 1.5})

    src = open_stream(spark, str(tmp_path), "st", group="stateful", batch_size=10)
    typed = project(src, {"event_type": "string", "value": "double"})
    out = running_totals(typed, key_col="event_type", value_col="value")
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM stateful_out ORDER BY total_rows"
        ).collect()
    finally:
        q.stop()
    # 30 rows over ≥3 batches (batch cap 10) → multiple updates per key,
    # running totals strictly increasing up to 15 per key
    finals = {}
    for r in rows:
        finals[r.key] = (r.total_rows, r.total_value)
    assert finals["a"] == (15, 22.5)
    assert finals["b"] == (15, 22.5)
    a_updates = [r.total_rows for r in rows if r.key == "a"]
    assert len(a_updates) >= 2  # state carried across batches
    assert a_updates == sorted(a_updates)


def test_running_totals_tws_across_batches(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 typed-state API) carries the
    same per-key totals across micro-batches as the
    applyInPandasWithState implementation.  Skipped where google.protobuf
    (the TWS state-server protocol dependency) is unavailable."""
    import pytest

    from redis_streams_spark.streaming.stateful import (
        running_totals_tws,
        tws_available,
    )

    if not tws_available():
        # tws_available() is a pure probe; conftest already ran
        # ensure_protobuf() pre-JVM, so False here means no protobuf wheel
        # AND no discoverable pure-Python runtime (RSS_PROTOBUF_PATH or
        # the gcloud-bundled copy) on this host.  In the build sandbox the
        # gcloud runtime IS found, so this test RUNS there (round 7 —
        # previously skipped for two rounds on the missing wheel).
        pytest.skip(
            "google.protobuf unavailable and no pure-Python runtime found "
            "(set RSS_PROTOBUF_PATH to a dir containing google/protobuf); "
            "transformWithState needs it for the state-server protocol — "
            "semantics covered by the applyInPandasWithState twin"
        )

    log = StreamLog(str(tmp_path), "tws")
    prod = Producer(log, "tws")
    for i in range(30):
        prod.add({"event_type": ["a", "b"][i % 2], "value": 1.5})

    src = open_stream(spark, str(tmp_path), "tws", group="tws", batch_size=10)
    typed = project(src, {"event_type": "string", "value": "double"})
    out = running_totals_tws(typed, key_col="event_type", value_col="value")
    # transformWithState stores each state variable in its own column
    # family — only the RocksDB provider supports that (the default
    # HDFS-backed store fails with STATE_STORE_MULTIPLE_COLUMN_FAMILIES)
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        q = (
            out.writeStream.format("memory")
            .queryName("tws_out")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM tws_out ORDER BY total_rows").collect()
        finally:
            q.stop()
    finally:
        if prev_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev_provider)
    finals = {}
    for r in rows:
        finals[r.key] = (r.total_rows, r.total_value)
    assert finals["a"] == (15, 22.5)
    assert finals["b"] == (15, 22.5)
    a_updates = [r.total_rows for r in rows if r.key == "a"]
    assert len(a_updates) >= 2
    assert a_updates == sorted(a_updates)
