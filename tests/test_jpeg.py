"""Baseline JPEG codec (operators/jpeg.py): encoder/decoder round trips
at quant=1 (DCT rounding only — strict), chroma subsampling, grayscale,
restart markers, progressive rejection, and the Spark mapInPandas decode
path alongside the other real codecs."""

from __future__ import annotations

import numpy as np
import pytest

from redis_streams_spark.operators.jpeg import make_jpeg, parse_jpeg


def _rand_rgb(rng, h, w):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_jpeg_solid_color_exact():
    px = bytes([200, 100, 50]) * (16 * 16)
    w, h, mean = parse_jpeg(make_jpeg(16, 16, px))
    assert (w, h) == (16, 16)
    assert mean == pytest.approx((200 + 100 + 50) / 3, abs=0.01)


def test_jpeg_444_quant1_roundtrip_nearly_lossless():
    """All-ones quant tables: the only loss is FDCT/IDCT float rounding,
    so the decoded mean must match the source to ~1e-2 even on random
    pixels and non-multiple-of-8 dimensions."""
    rng = np.random.default_rng(7)
    for w, h in ((8, 8), (21, 13), (40, 32)):
        arr = _rand_rgb(rng, h, w)
        got = parse_jpeg(make_jpeg(w, h, arr.tobytes()))
        assert got[:2] == (w, h)
        assert got[2] == pytest.approx(float(arr.mean()), abs=0.05)


def test_jpeg_420_subsampling_decodes():
    """4:2:0: 2x2 Y blocks per chroma block; decoded mean tracks the
    source within chroma-averaging loss."""
    rng = np.random.default_rng(11)
    arr = _rand_rgb(rng, 24, 32)
    w, h, mean = parse_jpeg(make_jpeg(32, 24, arr.tobytes(), subsampling="420"))
    assert (w, h) == (32, 24)
    assert mean == pytest.approx(float(arr.mean()), abs=1.0)


def test_jpeg_quantization_loss_bounded():
    rng = np.random.default_rng(13)
    arr = _rand_rgb(rng, 24, 32)
    w, h, mean = parse_jpeg(make_jpeg(32, 24, arr.tobytes(), quant=16))
    assert (w, h) == (32, 24)
    assert mean == pytest.approx(float(arr.mean()), abs=2.0)


def test_jpeg_grayscale_single_component():
    rng = np.random.default_rng(17)
    g = rng.integers(0, 256, (17, 23), dtype=np.uint8)
    w, h, mean = parse_jpeg(make_jpeg(23, 17, g.tobytes(), gray=True))
    assert (w, h) == (23, 17)
    assert mean == pytest.approx(float(g.mean()), abs=0.05)


@pytest.mark.parametrize("subsampling,gray", [("444", False), ("420", False), ("444", True)])
@pytest.mark.parametrize("interval", [1, 2, 5])
def test_jpeg_restart_markers(subsampling, gray, interval):
    """DRI/RSTn: DC predictors reset and the bit reader re-syncs at every
    restart; quant=1 4:4:4/gray results must stay rounding-exact for any
    interval (regression: a pad byte left unconsumed before the marker
    desynced every MCU after the first restart)."""
    rng = np.random.default_rng(19)
    if gray:
        img = rng.integers(0, 256, (16, 40), dtype=np.uint8)
        jb = make_jpeg(40, 16, img.tobytes(), gray=True, restart_interval=interval)
    else:
        img = _rand_rgb(rng, 16, 40)
        jb = make_jpeg(
            40, 16, img.tobytes(), subsampling=subsampling, restart_interval=interval
        )
    w, h, mean = parse_jpeg(jb)
    assert (w, h) == (40, 16)
    tol = 1.0 if subsampling == "420" else 0.05
    assert mean == pytest.approx(float(img.mean()), abs=tol)


def test_jpeg_non_interleaved_rejected():
    """A 3-component stream whose first SOS carries only Y (legal
    baseline, non-interleaved) must raise, not silently decode with
    fabricated zero chroma."""
    jb = bytearray(make_jpeg(8, 8, bytes(192)))
    i = jb.find(b"\xff\xda")
    # rewrite SOS: ns=3, comps (1,0x00),(2,0x11),(3,0x11) -> ns=1, comp 1
    assert jb[i + 4] == 3
    new_sos = bytes([0xFF, 0xDA, 0x00, 0x08, 1, 1, 0x00, 0, 63, 0])
    jb[i : i + 2 + 12] = new_sos
    with pytest.raises(NotImplementedError, match="non-interleaved"):
        parse_jpeg(bytes(jb))


def test_jpeg_progressive_rejected():
    jb = bytearray(make_jpeg(8, 8, bytes(192)))
    i = jb.find(b"\xff\xc0")
    jb[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="baseline"):
        parse_jpeg(bytes(jb))


def test_jpeg_not_a_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        parse_jpeg(b"BMnotajpeg")


def test_jpeg_decode_over_spark(spark):
    """JPEG payloads decode inside the mapInPandas real-codec batch next
    to BMP/PPM/PNG, with modality derived from the payload magic."""
    from redis_streams_spark.operators.multimodal import decode_features

    rng = np.random.default_rng(23)
    rows, expected = [], {}
    for doc_id in range(6):
        w, h = 8 + doc_id, 8 + 2 * doc_id
        arr = _rand_rgb(rng, h, w)
        sub = "420" if doc_id % 2 else "444"
        rows.append((doc_id, bytearray(make_jpeg(w, h, arr.tobytes(), subsampling=sub))))
        expected[doc_id] = (w, h, float(arr.mean()))
    docs = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {
        r.doc_id: r
        for r in decode_features(docs, use_real_codecs=True).collect()
    }
    assert len(got) == 6
    for doc_id, (w, h, mean) in expected.items():
        r = got[doc_id]
        assert (r.width, r.height, r.n_frames) == (w, h, 1)
        assert r.modality == "image"
        assert r.mean_byte == pytest.approx(mean, abs=1.0)


def test_jpeg_fill_bytes_before_marker():
    """T.81 B.1.1.2: 0xFF fill bytes may pad before any marker code —
    the parser must skip them (r08-advice fix)."""
    px = bytes([90]) * (16 * 16)
    jb = make_jpeg(16, 16, px, gray=True)
    # splice two fill bytes before the DQT marker (first 0xFF after SOI)
    dqt = jb.index(b"\xff\xdb")
    padded = jb[:dqt] + b"\xff\xff" + jb[dqt:]
    assert parse_jpeg(padded) == parse_jpeg(jb)


def test_jpeg_trailing_fill_bytes_raise_cleanly():
    """A stream truncated inside a fill-byte run must raise the parser's
    descriptive ValueError, not IndexError (r09 review finding on the
    fill-byte skip loop: data[pos+1] could index one past the end)."""
    with pytest.raises(ValueError, match="truncated JPEG"):
        parse_jpeg(b"\xff\xd8\xff\xff")


def test_jpeg_truncated_at_segment_length_raises_valueerror():
    """Truncation at a segment-length field must raise the descriptive
    ValueError, not struct.error (second r09 review pass)."""
    for payload in (b"\xff\xd8\xff\xdb", b"\xff\xd8\xff\xdb\x00"):
        with pytest.raises(ValueError, match="truncated JPEG"):
            parse_jpeg(payload)
