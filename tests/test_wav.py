"""RIFF/WAVE parser: round trips, chunk alignment, loud failures, and
dispatch through the real-codec decode path."""

from __future__ import annotations

import struct

import pytest

from redis_streams_spark.operators.multimodal import (
    _real_decode_payload,
    decode_features,
)
from redis_streams_spark.operators.wav import make_wav, parse_wav


def test_roundtrip_16bit_mono():
    pcm = struct.pack("<6h", 0, 1000, -1000, 32767, -32768, 128)
    ch, rate, bits, n, dur, mean = parse_wav(make_wav(pcm, sample_rate=8000))
    assert (ch, rate, bits, n) == (1, 8000, 16, 6)
    assert dur == round(6 / 8000, 6)
    assert mean == round((0 + 1000 + 1000 + 32767 + 32768 + 128) / 6, 4)


def test_roundtrip_8bit_stereo():
    data = bytes([128, 128, 255, 0, 130, 126])  # 3 frames x 2 channels
    ch, rate, bits, n, dur, mean = parse_wav(
        make_wav(data, sample_rate=44100, channels=2, bits=8)
    )
    assert (ch, rate, bits, n) == (2, 44100, 8, 3)
    assert dur == round(3 / 44100, 6)
    assert mean == round((0 + 0 + 127 + 128 + 2 + 2) / 6, 4)


def test_odd_data_chunk_word_alignment():
    # 8-bit mono with odd sample count: data chunk gets a pad byte; the
    # parser must honor word alignment and still count 3 samples
    data = bytes([1, 2, 3])
    payload = make_wav(data, channels=1, bits=8)
    assert len(payload) % 2 == 0
    ch, rate, bits, n, _dur, _mean = parse_wav(payload)
    assert (ch, bits, n) == (1, 8, 3)


def test_rejects_malformed_loudly():
    with pytest.raises(ValueError, match="not a RIFF/WAVE"):
        parse_wav(b"\x00" * 20)
    good = make_wav(struct.pack("<4h", 1, 2, 3, 4))
    with pytest.raises(ValueError, match="truncated WAV"):
        parse_wav(good[:-3])
    # chunk size past the RIFF extent
    bad = bytearray(good)
    data_at = bytes(bad).index(b"data")
    struct.pack_into("<I", bad, data_at + 4, 10_000)
    with pytest.raises(ValueError, match="truncated WAV chunk"):
        parse_wav(bytes(bad))
    # missing data chunk entirely
    fmt_only = good[: bytes(good).index(b"data")]
    fixed = b"RIFF" + struct.pack("<I", len(fmt_only) - 8) + fmt_only[8:]
    with pytest.raises(ValueError, match="missing fmt/data"):
        parse_wav(fixed)


def test_non_pcm_formats_raise_not_implemented():
    good = bytearray(make_wav(struct.pack("<2h", 5, 6)))
    fmt_at = bytes(good).index(b"fmt ")
    struct.pack_into("<H", good, fmt_at + 8, 3)  # IEEE float format tag
    with pytest.raises(NotImplementedError, match="integer PCM"):
        parse_wav(bytes(good))


def test_real_decode_payload_dispatches_on_riff_wave():
    pcm = struct.pack("<4h", 256, -256, 512, -512)
    payload = make_wav(pcm, sample_rate=16000)
    rate, channels, n_samples, mean = _real_decode_payload(payload)
    assert (rate, channels, n_samples) == (16000, 1, 4)
    assert mean == round(384 / 256.0, 4)


def test_real_codec_decode_wav_over_spark(spark):
    rows, expected = [], {}
    for doc_id in range(3):
        n = 4 + doc_id
        pcm = struct.pack(f"<{n}h", *range(0, n * 100, 100))
        rows.append((doc_id, bytearray(make_wav(pcm, sample_rate=8000))))
        mean_abs = sum(range(0, n * 100, 100)) / n
        expected[doc_id] = (8000, 1, n, round(mean_abs / 256.0, 4))
    docs = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    decoded = decode_features(docs, use_real_codecs=True).collect()
    got = {
        r.doc_id: (r.width, r.height, r.n_frames, r.mean_byte) for r in decoded
    }
    assert got == expected
    assert all(r.modality == "audio" for r in decoded)
