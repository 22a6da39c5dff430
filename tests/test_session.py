"""Loader semantics: every table loads on a bare session, and the
events nanos→micros timestamp conversion matches DuckDB's native read
value-for-value (the parquet TIMESTAMP(NANOS) hazard)."""

from __future__ import annotations

from redis_streams_spark.session import TABLES, load_table


def test_all_tables_load(spark, sf_dir):
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        assert df.limit(1).count() >= 0
        assert df.columns


def test_events_ts_matches_duckdb(spark, duck, sf_dir):
    srows = (
        load_table(spark, sf_dir, "events")
        .selectExpr("event_id", "unix_millis(cast(ts as timestamp)) AS ms")
        .orderBy("event_id")
        .limit(100)
        .collect()
    )
    drows = duck.sql(
        "SELECT event_id, epoch_ms(ts) AS ms FROM events ORDER BY event_id LIMIT 100"
    ).fetchall()
    assert [(r.event_id, r.ms) for r in srows] == drows


def test_timestamp_ntz_semantics(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert "timestamp_ntz" in df.schema["ts"].dataType.typeName()
    o = load_table(spark, sf_dir, "orders")
    assert "timestamp_ntz" in o.schema["o_orderdate"].dataType.typeName()


def test_events_nanos_legacy_path(spark, tmp_path):
    """Older testdata generations wrote events.ts as parquet
    TIMESTAMP(NANOS) (read as BIGINT under nanosAsLong); load_table must
    keep normalizing that generation to the same TIMESTAMP_NTZ micros."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ns = [1_700_000_000_123_456_789, 1_700_000_001_000_000_000]
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(ns, pa.timestamp("ns")),
            "user_id": pa.array([10, 11], pa.int64()),
            "event_type": pa.array(["a", "b"]),
            "value": pa.array([0.5, 1.5], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    d = tmp_path / "nanos"
    d.mkdir()
    pq.write_table(table, str(d / "events.parquet"))
    df = load_table(spark, str(d), "events")
    assert "timestamp_ntz" in df.schema["ts"].dataType.typeName()
    rows = df.selectExpr("event_id", "unix_micros(cast(ts as timestamp)) AS us").orderBy(
        "event_id"
    ).collect()
    assert [(r.event_id, r.us) for r in rows] == [
        (1, ns[0] // 1000),
        (2, ns[1] // 1000),
    ]
