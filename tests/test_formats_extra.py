"""Source formats beyond the oracle-gated CSV/JSON/ORC round trips:
XML (built-in since Spark 4) and the binaryFile source as the media
ingestion path.  Registry coverage for XML lands next round; these
tests pin the behavior now."""

from __future__ import annotations

from pyspark.sql import functions as F

from redis_streams_spark.operators.multimodal import decode_features, make_png
from redis_streams_spark.session import load_table


def test_xml_roundtrip_preserves_values(spark, sf_dir, tmp_path):
    """events survive an XML write/read cycle: row count, key columns,
    numeric values, and string escaping (event props carry JSON with
    quotes/angle-bracket-able content)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )
    path = str(tmp_path / "events_xml")
    ev.write.format("xml").option("rowTag", "event").mode("overwrite").save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "event")
        .load(path)
        .select("event_id", "user_id", "event_type", "value", "props")
    )
    assert back.count() == ev.count()
    a = {r.event_id: r for r in ev.collect()}
    b = {r.event_id: r for r in back.collect()}
    assert set(a) == set(b)
    for eid, r in a.items():
        assert b[eid].user_id == r.user_id
        assert b[eid].event_type == r.event_type
        assert abs(b[eid].value - r.value) < 1e-9
        assert b[eid].props == r.props  # escaping round-trips


def test_binaryfile_source_feeds_multimodal_decode(spark, tmp_path):
    """The real media-ingestion path: image files on disk -> Spark's
    binaryFile source (path/length/content columns, partition-parallel)
    -> decode_features(use_real_codecs=True) over the content bytes."""
    import hashlib

    expected = {}
    for i in range(5):
        w, h = 3 + i, 2 + i
        px = hashlib.md5(str(i).encode()).digest()
        while len(px) < w * h * 3:
            px += hashlib.md5(px).digest()
        px = px[: w * h * 3]
        (tmp_path / f"img{i}.png").write_bytes(make_png(w, h, px))
        expected[i] = (w, h, round(sum(px) / len(px), 4))

    files = spark.read.format("binaryFile").load(str(tmp_path / "*.png"))
    docs = files.select(
        F.regexp_extract(F.col("path"), r"img(\d+)\.png", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    decoded = decode_features(docs, use_real_codecs=True).collect()
    got = {r.doc_id: (r.width, r.height, r.mean_byte) for r in decoded}
    assert got == expected
    assert all(r.modality == "image" for r in decoded)
