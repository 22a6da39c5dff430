"""Multimodal plumbing: real BMP/PPM decode, compressed-codec gating, and
the deterministic fake decode."""

from __future__ import annotations

import hashlib

import pytest

from redis_streams_spark.operators.multimodal import (
    attach_blob,
    decode_features,
    make_bmp,
    make_ppm,
    parse_bmp,
    parse_ppm,
)
from redis_streams_spark.session import load_table


def _pixels(n: int, seed: int) -> bytes:
    """n deterministic pseudo-random bytes from chained md5."""
    out = b""
    h = hashlib.md5(str(seed).encode()).digest()
    while len(out) < n:
        out += h
        h = hashlib.md5(h).digest()
    return out[:n]


def test_bmp_ppm_roundtrip_pure_python():
    for w, h in ((5, 3), (4, 4), (7, 1)):  # width 5/7: exercises row padding
        px = _pixels(w * h * 3, w * 100 + h)
        exp_mean = round(sum(px) / len(px), 4)
        assert parse_bmp(make_bmp(w, h, px)) == (w, h, exp_mean)
        assert parse_ppm(make_ppm(w, h, px)) == (w, h, exp_mean)


def test_real_codec_decode_over_spark(spark):
    """use_real_codecs=True decodes ACTUAL header+pixel bytes inside the
    mapInPandas batch: synthesized valid BMP and PPM payloads come back
    with the generator's dimensions and true mean pixel value."""
    rows, expected = [], {}
    for doc_id in range(12):
        w, h = 3 + doc_id % 5, 2 + doc_id % 4
        px = _pixels(w * h * 3, doc_id)
        payload = make_bmp(w, h, px) if doc_id % 2 == 0 else make_ppm(w, h, px)
        rows.append((doc_id, bytearray(payload)))
        expected[doc_id] = (w, h, 1, round(sum(px) / len(px), 4))
    docs = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    decoded = decode_features(docs, use_real_codecs=True).collect()
    got = {
        r.doc_id: (r.width, r.height, r.n_frames, r.mean_byte) for r in decoded
    }
    assert got == expected
    # modality must come from the PAYLOAD MAGIC: every row here is a
    # real raster image, whatever its doc_id (regression: the first cut
    # labeled by doc_id % 3, calling decoded BMPs "audio")
    assert all(r.modality == "image" for r in decoded)


def test_real_codecs_compressed_formats_raise(spark):
    """Formats that need PIL/ffmpeg stay a loud stub, not fake numbers."""
    docs = spark.createDataFrame(
        [(0, bytearray(b"\x89PNG\r\n\x1a\nrest"))], "doc_id bigint, payload binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|PIL/ffmpeg"):
        decode_features(docs, use_real_codecs=True).collect()


def test_attach_blob_binary_payload(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    row = attach_blob(docs).orderBy("doc_id").first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.byte_len == len(row.payload)
    assert len(row.checksum) == 32
    assert row.modality in ("image", "audio", "video")


def test_decode_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = decode_features(docs).orderBy("doc_id").limit(5).collect()
    b = decode_features(docs).orderBy("doc_id").limit(5).collect()
    assert a == b
    for r in a:
        assert 64 <= r.width < 1024 and 64 <= r.height < 1024
        assert 1 <= r.n_frames <= 120
        assert 0.0 <= r.mean_byte <= 255.0
