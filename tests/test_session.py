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
