"""Multimodal-column queries with DuckDB oracles.

``mm_binary_meta`` is pure JVM expressions; ``mm_decode_features`` runs the
actual mapInPandas decode pipeline (deterministic fake decode), and its
oracle computes the same md5 arithmetic in SQL — so the Arrow/pandas
plumbing itself is value-verified, not just smoke-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redis_streams_spark.functions.hashing import h32_sql
from redis_streams_spark.operators.multimodal import (
    attach_blob,
    decode_features,
    fake_dims,
    mean_md5_byte,
)
from redis_streams_spark.queries.base import register
from redis_streams_spark.session import load_table

_META_SQL = f"""
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality,
       octet_length(encode(text)) AS byte_len,
       md5(text) AS checksum,
       64 + {h32_sql("text || ':w'")} % 960 AS width,
       64 + {h32_sql("text || ':h'")} % 960 AS height,
       1 + {h32_sql("text || ':f'")} % 120 AS n_frames,
       round(5e-10 + list_aggregate(
               list_transform(range(0, 16),
                              i -> ('0x' || substr(md5(text), i * 2 + 1, 2))::BIGINT),
               'sum') / 16.0, 4) AS mean_byte
FROM documents
"""


@register(
    "mm_binary_meta",
    shape="bounded",
    tags=("multimodal",),
    oracle=f"""
WITH meta AS ({_META_SQL})
SELECT modality,
       count(*) AS n_docs,
       CAST(sum(byte_len) AS BIGINT) AS total_bytes,
       min(width) AS min_width, max(width) AS max_width,
       CAST(sum(mean_byte * 16) AS BIGINT) AS sum_mean_byte_x16
FROM meta GROUP BY modality ORDER BY modality
""",
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata rollup (per modality): payload byte sizes +
    fake decode dims — everything stays JVM-side; the binary payload is
    pruned out of the scan because only metadata columns are projected."""
    docs = load_table(spark, sf_dir, "documents")
    blob = attach_blob(docs)
    w, h, nf = fake_dims(F.col("text"))
    meta = blob.join(docs.select("doc_id", "text"), "doc_id").select(
        "modality",
        "byte_len",
        w.alias("width"),
        mean_md5_byte(F.col("text")).alias("mean_byte"),
    )
    return (
        meta.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("byte_len").alias("total_bytes"),
            F.min("width").alias("min_width"),
            F.max("width").alias("max_width"),
            # Exact integer sum (each mean_byte is an exact k/16 double, so
            # mean_byte*16 is an exact integer): bit-identical across
            # Spark/DuckDB, unlike a rounded float average.
            F.sum(F.col("mean_byte") * 16).cast("long").alias("sum_mean_byte_x16"),
        )
        .orderBy("modality")
    )


@register(
    "mm_decode_features",
    shape="per_row",
    tags=("multimodal", "pandas-udf"),
    oracle=f"""
WITH meta AS ({_META_SQL})
SELECT doc_id, modality, byte_len, checksum, width, height, n_frames, mean_byte
FROM meta ORDER BY doc_id
""",
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode pipeline (Arrow-batched, per-partition) with
    deterministic fake decode; the oracle recomputes the same features in
    SQL, verifying the pandas plumbing value-for-value."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_features(docs)


@register(
    "mm_resize_sample",
    shape="per_row",
    tags=("multimodal", "resize"),
    oracle=f"""
WITH meta AS ({_META_SQL})
SELECT doc_id, modality, width, height,
       CASE WHEN greatest(width, height) <= 256 THEN width
            ELSE (width * 256 // greatest(width, height)) END AS out_w,
       CASE WHEN greatest(width, height) <= 256 THEN height
            ELSE (height * 256 // greatest(width, height)) END AS out_h,
       array_to_string(list_transform(range(0, 4),
                      i -> least(i * n_frames // 4, n_frames - 1)), ',') AS frame_idx
FROM meta
WHERE modality IN ('image', 'video')
ORDER BY doc_id
""",
)
def mm_resize_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning (fit into 256px box) + evenly-spaced frame
    sampling over the fake-decoded dims — the deterministic Spark-side
    arithmetic of the resize/frame-sample stages (pixel work is the
    codec-stubbed mapInPandas batch)."""
    from redis_streams_spark.operators.multimodal import (
        fake_dims,
        frame_sample_indices,
        modality_col,
        resize_plan,
    )

    docs = load_table(spark, sf_dir, "documents")
    w, h, nf = fake_dims(F.col("text"))
    base = docs.select(
        "doc_id",
        modality_col(F.col("doc_id")).alias("modality"),
        w.alias("width"),
        h.alias("height"),
        nf.alias("n_frames"),
    ).where(F.col("modality").isin("image", "video"))
    out_w, out_h = resize_plan(F.col("width"), F.col("height"))
    return base.select(
        "doc_id",
        "modality",
        "width",
        "height",
        out_w.alias("out_w"),
        out_h.alias("out_h"),
        # Stringified so the driver's pandas canonicalizer can hash the
        # column (raw array<bigint> is unhashable in its sort/unique path).
        F.array_join(
            frame_sample_indices(F.col("n_frames")).cast("array<string>"), ","
        ).alias("frame_idx"),
    )


@register(
    "mm_binary_dedup",
    shape="bounded",
    tags=("multimodal", "dedup"),
    oracle="""
WITH blobs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         md5(text) AS checksum  -- VARCHAR md5 hashes the UTF-8 bytes =
                                -- Spark's md5(encode(text,'UTF-8'))
  FROM documents
), groups AS (
  SELECT doc_id, modality, checksum,
         count(*) OVER (PARTITION BY checksum) AS n_copies,
         row_number() OVER (PARTITION BY checksum ORDER BY doc_id) = 1
           AS is_canonical
  FROM blobs
)
SELECT modality,
       count(*) AS n_assets,
       -- CAST: DuckDB integer sum() yields HUGEINT, which lands as float64
       -- via pandas and hash-mismatches Spark's int64 in the driver gate.
       CAST(sum(CASE WHEN is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(sum(CASE WHEN NOT is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM groups GROUP BY modality ORDER BY modality
""",
)
def mm_binary_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset-level exact dedup over the BINARY payload (checksum-keyed,
    the standard image/audio asset dedup): identical payloads collapse to
    one canonical asset per md5.  The shuffle carries 32-byte digests —
    the multi-gigabyte payload column never moves; the ingest-time
    ``checksum`` column from attach_blob is reused rather than re-hashing
    the payload (at real scale the checksum is computed once at ingest)."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    blobs = attach_blob(docs).select("doc_id", "modality", "checksum")
    w = W.partitionBy("checksum").orderBy("doc_id")
    groups = blobs.withColumn("is_canonical", F.row_number().over(w) == 1)
    return (
        groups.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(F.col("is_canonical").cast("long")).alias("n_unique"),
            F.sum((~F.col("is_canonical")).cast("long")).alias("n_dropped"),
        )
        .orderBy("modality")
    )


@register(
    "mm_jpeg_decode",
    shape="per_row",
    tags=("multimodal", "codec", "jpeg"),
    oracle="""
SELECT doc_id,
       'image' AS modality,
       (8 + length(text) % 9)::BIGINT AS width,
       (8 + length(text) % 7)::BIGINT AS height,
       1::BIGINT AS n_frames
FROM documents
ORDER BY doc_id
""",
)
def mm_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG decode through the driver gate: each document's text
    bytes are tiled into a grayscale raster of dimensions derived from
    its character length (w = 8 + n%9, h = 8 + n%7), encoded as an
    actual baseline JPEG (operators/jpeg.py), and decoded back through
    the production real-codec mapInPandas path.  The oracle predicts the
    decoded width/height/modality purely from length(text) — so a green
    row proves the encoder→bitstream→Huffman/IDCT decoder round trip
    recovered the true dimensions for every document, not just the test
    fixtures.  (Pixel means are decode-exact only to rounding, hence not
    hash-compared; test_jpeg.py covers them with tolerances.)  All work
    is per-row inside Arrow batches — map-only at any scale."""
    from collections.abc import Iterator

    import pandas as pd

    from redis_streams_spark.operators.jpeg import make_jpeg
    from redis_streams_spark.operators.multimodal import _real_decode_payload

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def build_and_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "modality": [], "width": [], "height": [],
                   "n_frames": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = len(text)
                w, h = 8 + n % 9, 8 + n % 7
                raw = text.encode("utf-8") or b"\x00"  # empty text → black
                need = w * h
                px = (raw * (need // len(raw) + 1))[:need]
                payload = make_jpeg(w, h, px, gray=True)
                dw, dh, frames, _mean = _real_decode_payload(payload)
                out["doc_id"].append(doc_id)
                out["modality"].append("image")
                out["width"].append(dw)
                out["height"].append(dh)
                out["n_frames"].append(frames)
            yield pd.DataFrame(out)

    # no presentation sort: per-doc output (r08 discipline)
    return docs.mapInPandas(
        build_and_decode,
        schema="doc_id bigint, modality string, width bigint, height bigint,"
        " n_frames bigint",
    )


@register(
    "mm_mp4_meta",
    shape="per_row",
    tags=("multimodal", "codec", "video", "mp4"),
    oracle="""
SELECT doc_id,
       'video' AS modality,
       (160 + length(text) % 480)::BIGINT AS width,
       (120 + length(text) % 360)::BIGINT AS height,
       (1 + length(text) % 120)::BIGINT AS n_frames,
       round((1 + length(text) % 120) * 40 / 1000.0, 3) AS duration_sec
FROM documents
ORDER BY doc_id
""",
)
def mm_mp4_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL ISO-BMFF (MP4) metadata through the driver gate — the video
    analog of mm_jpeg_decode: each document gets a container with
    dimensions/frame-count derived from its character length
    (w = 160 + n%480, h = 120 + n%360, frames = 1 + n%120 at 25 fps),
    serialized as an actual box tree (operators/mp4.py make_mp4: ftyp +
    moov(mvhd/tkhd/stts) + mdat holding the text bytes) and parsed back
    by the production parser (the same one decode_features'
    real-codec path dispatches to on the ftyp magic).  The oracle
    predicts every output column purely from length(text), so a green
    row proves the writer→box-framing→parser round trip recovered the
    true mvhd duration, tkhd 16.16 dimensions, and stts sample count for
    every document.  Map-only inside Arrow batches at any scale."""
    from collections.abc import Iterator

    import pandas as pd

    from redis_streams_spark.operators.mp4 import make_mp4, parse_mp4

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def build_and_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "modality": [], "width": [], "height": [],
                   "n_frames": [], "duration_sec": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = len(text)
                frames = 1 + n % 120
                payload = make_mp4(
                    width=160 + n % 480,
                    height=120 + n % 360,
                    n_frames=frames,
                    duration_ms=frames * 40,
                    mdat=text.encode("utf-8"),
                )
                w, h, nf, dur, _mean = parse_mp4(payload)
                out["doc_id"].append(doc_id)
                out["modality"].append("video")
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["duration_sec"].append(dur)
            yield pd.DataFrame(out)

    # no presentation sort: per-doc output (r09 discipline)
    return docs.mapInPandas(
        build_and_parse,
        schema="doc_id bigint, modality string, width bigint, height bigint,"
        " n_frames bigint, duration_sec double",
    )


@register(
    "mm_wav_meta",
    shape="per_row",
    tags=("multimodal", "codec", "audio", "wav"),
    oracle="""
SELECT doc_id,
       'audio' AS modality,
       1::BIGINT AS channels,
       8000::BIGINT AS sample_rate,
       (400 + length(text) % 1600)::BIGINT AS n_samples,
       round((400 + length(text) % 1600) / 8000.0, 6) AS duration_sec
FROM documents
ORDER BY doc_id
""",
)
def mm_wav_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL RIFF/WAVE parse through the driver gate — the audio analog
    of mm_jpeg_decode / mm_mp4_meta, completing the modality triple:
    each document gets a mono 8 kHz 16-bit PCM clip whose frame count
    derives from its character length (n = 400 + len % 1600, 50-200 ms),
    samples synthesized from the text bytes, serialized as an actual
    RIFF container (operators/wav.py make_wav) and parsed back by the
    production parser (the same one decode_features' real-codec path
    dispatches to on the RIFF/WAVE magic).  The oracle predicts every
    output column purely from length(text), so a green row proves the
    writer→chunk-framing→parser round trip recovered the true fmt
    fields and data-chunk sample count for every document.  Map-only
    inside Arrow batches at any scale."""
    import struct as _struct
    from collections.abc import Iterator

    import pandas as pd

    from redis_streams_spark.operators.wav import make_wav, parse_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def build_and_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "modality": [], "channels": [],
                   "sample_rate": [], "n_samples": [], "duration_sec": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = 400 + len(text) % 1600
                raw = text.encode("utf-8") or b"\x00"
                pcm = _struct.pack(
                    f"<{n}h",
                    *((raw[i % len(raw)] - 128) * 128 for i in range(n)),
                )
                payload = make_wav(pcm, sample_rate=8000, channels=1, bits=16)
                ch, rate, _bits, ns, dur, _mean = parse_wav(payload)
                out["doc_id"].append(doc_id)
                out["modality"].append("audio")
                out["channels"].append(ch)
                out["sample_rate"].append(rate)
                out["n_samples"].append(ns)
                out["duration_sec"].append(dur)
            yield pd.DataFrame(out)

    # no presentation sort: per-doc output (r09 discipline)
    return docs.mapInPandas(
        build_and_parse,
        schema="doc_id bigint, modality string, channels bigint,"
        " sample_rate bigint, n_samples bigint, duration_sec double",
    )
