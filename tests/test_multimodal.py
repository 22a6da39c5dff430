"""Multimodal plumbing: real BMP/PPM decode, compressed-codec gating, and
the deterministic fake decode."""

from __future__ import annotations

import hashlib

import pytest

from redis_streams_spark.operators.multimodal import (
    attach_blob,
    decode_features,
    make_bmp,
    make_png,
    make_ppm,
    parse_bmp,
    parse_png,
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


def test_real_codecs_unknown_format_raises(spark):
    """Containers with no parser stay a loud stub, not fake numbers.
    (JPEG and MP4 metadata no longer raise — operators/jpeg.py decodes
    baseline streams, operators/mp4.py parses the box tree; see
    test_jpeg.py / test_mp4.py.  A MALFORMED MP4 still fails loudly
    through the codec path, and genuinely unknown magics hit the
    NotImplementedError boundary.)"""
    truncated_mp4 = b"\x00\x00\x00\x18ftypmp42rest-of-box"  # size past EOF
    docs = spark.createDataFrame(
        [(0, bytearray(truncated_mp4))], "doc_id bigint, payload binary"
    )
    with pytest.raises(Exception, match="bad MP4 box size"):
        decode_features(docs, use_real_codecs=True).collect()
    unknown = b"OggS\x00\x02rest-of-payload"  # Ogg: no parser here
    docs2 = spark.createDataFrame(
        [(0, bytearray(unknown))], "doc_id bigint, payload binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|unrecognized"):
        decode_features(docs2, use_real_codecs=True).collect()


def test_real_codecs_truncated_jpeg_raises(spark):
    """A JPEG magic with garbage after it must fail loudly (honest
    error), never return fabricated dimensions."""
    docs = spark.createDataFrame(
        [(0, bytearray(b"\xff\xd8\xffJFIFrest"))], "doc_id bigint, payload binary"
    )
    with pytest.raises(Exception, match="ValueError|invalid|marker"):
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


def _png_with_filters(w, h, ch, ctype, pixels, filters):
    """Hand-build a PNG applying the given forward filter per row — the
    encoder only emits filter 0, so this is how the decoder's Sub/Up/
    Average/Paeth paths get exercised against ground truth."""
    import struct
    import zlib

    stride = w * ch
    prev = bytearray(stride)
    raw = b""
    for r in range(h):
        line = bytearray(pixels[r * stride : (r + 1) * stride])
        ft = filters[r % len(filters)]
        enc = bytearray(stride)
        for x in range(stride):
            a = line[x - ch] if x >= ch else 0
            up = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (a + up) >> 1
            else:  # Paeth
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (up if pb <= pc else c)
            enc[x] = (line[x] - pred) & 0xFF
        raw += bytes([ft]) + bytes(enc)
        prev = line

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_and_all_filters():
    for w, h in ((5, 3), (4, 4), (1, 7)):
        px = _pixels(w * h * 3, w * 31 + h)
        exp = (w, h, round(sum(px) / len(px), 4))
        # encoder path (filter 0 only)
        assert parse_png(make_png(w, h, px)) == exp
        # every decoder filter path against the hand-built forward filter
        for filters in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
            got = parse_png(_png_with_filters(w, h, 3, 2, px, filters))
            assert got == exp, (w, h, filters)


def test_png_gray_and_rgba_channels():
    w, h = 6, 2
    gray = _pixels(w * h, 9)
    assert parse_png(_png_with_filters(w, h, 1, 0, gray, [4])) == (
        w, h, round(sum(gray) / len(gray), 4),
    )
    rgba = _pixels(w * h * 4, 11)
    assert parse_png(_png_with_filters(w, h, 4, 6, rgba, [3])) == (
        w, h, round(sum(rgba) / len(rgba), 4),
    )


def test_png_rejects_corruption_loudly():
    good = make_png(4, 4, _pixels(48, 3))
    # flip one IDAT byte -> CRC mismatch, never silent garbage
    bad = bytearray(good)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|truncated|unsupported"):
        parse_png(bytes(bad))
    with pytest.raises(ValueError, match="not a PNG"):
        parse_png(b"BMnope")
    with pytest.raises(ValueError, match="missing IHDR"):
        parse_png(b"\x89PNG\r\n\x1a\nrest")


def test_real_codec_decode_png_over_spark(spark):
    rows, expected = [], {}
    for doc_id in range(6):
        w, h = 2 + doc_id, 3
        px = _pixels(w * h * 3, doc_id + 50)
        rows.append((doc_id, bytearray(make_png(w, h, px))))
        expected[doc_id] = (w, h, 1, round(sum(px) / len(px), 4))
    docs = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    decoded = decode_features(docs, use_real_codecs=True).collect()
    got = {
        r.doc_id: (r.width, r.height, r.n_frames, r.mean_byte) for r in decoded
    }
    assert got == expected
    assert all(r.modality == "image" for r in decoded)
