"""ISO-BMFF (MP4) box parser: round trip, version/largesize variants,
loud failures on malformed framing, and dispatch through the real-codec
decode path."""

from __future__ import annotations

import struct

import pytest

from redis_streams_spark.operators.mp4 import make_mp4, parse_mp4
from redis_streams_spark.operators.multimodal import (
    _real_decode_payload,
    decode_features,
)


def test_roundtrip_basic():
    payload = make_mp4(640, 480, 100, duration_ms=4000, mdat=b"\x10\x30")
    w, h, n, dur, mean = parse_mp4(payload)
    assert (w, h, n, dur) == (640, 480, 100, 4.0)
    assert mean == round((0x10 + 0x30) / 2, 4)


def test_roundtrip_empty_mdat_and_odd_duration():
    payload = make_mp4(1920, 1080, 7, duration_ms=280)
    w, h, n, dur, mean = parse_mp4(payload)
    assert (w, h, n, dur, mean) == (1920, 1080, 7, 0.28, 0.0)


def test_nondefault_timescale():
    # 90 kHz — the common video timescale; 2.5 s = 225000 ticks
    payload = make_mp4(320, 240, 25, duration_ms=2500, timescale=90000)
    w, h, n, dur, _ = parse_mp4(payload)
    assert (w, h, n, dur) == (320, 240, 25, 2.5)


def test_mvhd_v1_and_largesize_boxes():
    """Hand-build v1 mvhd (64-bit times) and a largesize mdat: both
    layouts the writer doesn't emit but real files use."""
    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0)
    mvhd_payload = (
        struct.pack(">B3x", 1)
        + struct.pack(">QQIQ", 0, 0, 1000, 1500)  # v1: 8-byte times/dur
        + b"\x00" * 80
    )
    mvhd = struct.pack(">I", 8 + len(mvhd_payload)) + b"mvhd" + mvhd_payload
    tkhd_payload = (
        struct.pack(">B3x", 0)
        + struct.pack(">IIIII", 0, 0, 1, 0, 1500)
        + b"\x00" * 52
        + struct.pack(">II", 100 << 16, 50 << 16)
    )
    tkhd = struct.pack(">I", 8 + len(tkhd_payload)) + b"tkhd" + tkhd_payload
    stts_payload = struct.pack(">B3x", 0) + struct.pack(">III", 1, 3, 500)
    stts = struct.pack(">I", 8 + len(stts_payload)) + b"stts" + stts_payload
    trak = struct.pack(">I", 8 + len(tkhd + stts)) + b"trak" + tkhd + stts
    moov = struct.pack(">I", 8 + len(mvhd + trak)) + b"moov" + mvhd + trak
    body = b"\x05\x0b"
    mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(body)) + body
    w, h, n, dur, mean = parse_mp4(ftyp + moov + mdat)
    assert (w, h, n, dur) == (100, 50, 3, 1.5)
    assert mean == 8.0


def test_rejects_malformed_loudly():
    with pytest.raises(ValueError, match="not an ISO-BMFF"):
        parse_mp4(b"\x00" * 20)
    good = make_mp4(64, 64, 2, duration_ms=80)
    with pytest.raises(ValueError, match="bad MP4 box size|truncated|trailing"):
        parse_mp4(good[:-3])  # truncated final box
    # box size smaller than its header
    bad = bytearray(good)
    struct.pack_into(">I", bad, 0, 5)
    with pytest.raises(ValueError, match="bad MP4 box size"):
        parse_mp4(bytes(bad))
    # no moov at all
    ftyp_only = good[: struct.unpack_from(">I", good, 0)[0]]
    with pytest.raises(ValueError, match="missing moov"):
        parse_mp4(ftyp_only)


def test_rejects_short_but_well_framed_header_boxes():
    """A header box whose FRAMING is valid but whose payload is shorter
    than its fixed layout must raise, never read the neighboring box's
    bytes as metadata (r09 review finding: a 4-byte mvhd previously
    returned garbage duration from the adjacent tkhd)."""
    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0)

    def boxed(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    short_mvhd = boxed(b"mvhd", struct.pack(">B3x", 0))  # verflags only
    full = make_mp4(64, 64, 2, duration_ms=80)
    moov_payload = short_mvhd + boxed(b"tkhd", b"\x00" * 84)
    bad = ftyp + boxed(b"moov", moov_payload)
    with pytest.raises(ValueError, match="truncated MP4 mvhd"):
        parse_mp4(bad)
    # short tkhd: valid mvhd, 12-byte tkhd payload
    good_mvhd_start = full.index(b"mvhd") - 4
    (mvhd_size,) = struct.unpack_from(">I", full, good_mvhd_start)
    good_mvhd = full[good_mvhd_start : good_mvhd_start + mvhd_size]
    bad2 = ftyp + boxed(b"moov", good_mvhd + boxed(b"tkhd", b"\x00" * 12))
    with pytest.raises(ValueError, match="truncated MP4 tkhd"):
        parse_mp4(bad2)


def test_rejects_degenerate_parameters():
    with pytest.raises(ValueError, match="degenerate"):
        make_mp4(0, 480, 10, duration_ms=400)
    with pytest.raises(ValueError, match="degenerate"):
        make_mp4(640, 480, 0, duration_ms=400)


def test_real_decode_payload_dispatches_on_ftyp():
    payload = make_mp4(256, 128, 12, duration_ms=480, mdat=b"\x02\x04\x06")
    w, h, n_frames, mean = _real_decode_payload(payload)
    assert (w, h, n_frames) == (256, 128, 12)
    assert mean == 4.0


def test_real_codec_decode_mp4_over_spark(spark):
    rows, expected = [], {}
    for doc_id in range(4):
        w, h, n = 160 + 16 * doc_id, 120 + 8 * doc_id, 5 + doc_id
        body = bytes(range(doc_id + 2))
        rows.append(
            (doc_id, bytearray(make_mp4(w, h, n, duration_ms=n * 40, mdat=body)))
        )
        expected[doc_id] = (w, h, n, round(sum(body) / len(body), 4))
    docs = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    decoded = decode_features(docs, use_real_codecs=True).collect()
    got = {
        r.doc_id: (r.width, r.height, r.n_frames, r.mean_byte) for r in decoded
    }
    assert got == expected
    assert all(r.modality == "video" for r in decoded)


def test_audio_first_av_file_selects_video_track():
    """Spec-valid A/V layout with the AUDIO trak serialized first (0x0
    tkhd dims, soun hdlr, its own stts with a different sample count):
    a first-box-wins parser rejects this file as 'degenerate 0x0' or
    reports audio sample counts as n_frames — the handler-aware
    selection must return the VIDEO track's dims and frame count
    (r09 review finding)."""
    payload = make_mp4(
        640, 360, 24, duration_ms=1000, mdat=b"\x01\x03", with_audio_track=True
    )
    w, h, n, dur, mean = parse_mp4(payload)
    assert (w, h, n, dur) == (640, 360, 24, 1.0)
    assert mean == 2.0


def test_deeply_nested_container_bomb_raises_valueerror():
    """~1000 nested container headers must fail as ValueError like every
    other malformation, not escape as RecursionError from a mapInPandas
    task (r09 review finding)."""
    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0)
    inner = b""
    for _ in range(1000):
        inner = struct.pack(">I", 8 + len(inner)) + b"stbl" + inner
    moov = struct.pack(">I", 8 + len(inner)) + b"moov" + inner
    with pytest.raises(ValueError, match="nested too deeply"):
        parse_mp4(ftyp + moov)


def test_tkhd_trailing_padding_still_reads_real_dims():
    """Width/height live at the version-implied fixed offset (76/88 into
    the payload), so a tkhd padded past its spec size must yield the real
    dims, not the padding bytes (r09 advice)."""
    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0)
    mvhd_payload = (
        struct.pack(">B3x", 0) + struct.pack(">IIII", 0, 0, 1000, 2000) + b"\x00" * 76
    )
    mvhd = struct.pack(">I", 8 + len(mvhd_payload)) + b"mvhd" + mvhd_payload
    tkhd_payload = (
        struct.pack(">B3x", 0)
        + struct.pack(">IIIII", 0, 0, 1, 0, 2000)
        + b"\x00" * 52
        + struct.pack(">II", 640 << 16, 360 << 16)
        + b"\xff" * 24  # trailing junk past the 84-byte spec payload
    )
    tkhd = struct.pack(">I", 8 + len(tkhd_payload)) + b"tkhd" + tkhd_payload
    stts_payload = struct.pack(">B3x", 0) + struct.pack(">III", 1, 4, 500)
    stts = struct.pack(">I", 8 + len(stts_payload)) + b"stts" + stts_payload
    trak = struct.pack(">I", 8 + len(tkhd + stts)) + b"trak" + tkhd + stts
    moov = struct.pack(">I", 8 + len(mvhd + trak)) + b"moov" + mvhd + trak
    mdat = struct.pack(">I", 8) + b"mdat"
    w, h, n, dur, _ = parse_mp4(ftyp + moov + mdat)
    assert (w, h, n, dur) == (640, 360, 4, 2.0)
