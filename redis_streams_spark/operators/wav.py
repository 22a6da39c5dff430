"""RIFF/WAVE (WAV) parser and writer — the audio-metadata tier of the
multimodal family, closing the image (BMP/PPM/PNG/JPEG) / audio (WAV) /
video (MP4 boxes) triple with dependency-free real parsers.

WAV is the one audio container a no-dependency environment can decode
for real: RIFF chunk framing (4-byte tag + little-endian size + word
alignment), an ``fmt `` chunk carrying channels / sample rate / bit
depth, and a ``data`` chunk of raw PCM.  ``parse_wav`` walks the chunk
list strictly (sizes checked against the buffer, loud ValueError on
truncation — the honesty convention of operators/jpeg.py / mp4.py) and
computes sample count, duration, and the mean absolute PCM amplitude;
``make_wav`` writes a canonical PCM file so the round trip is testable
end-to-end.

Only integer PCM (format tag 1, 8/16-bit) is decoded; float/ADPCM/
extensible formats raise NotImplementedError explicitly.

Reference basis: none (SURVEY §2.2 extension surface — multimodal
columns).  Format layout from the public RIFF/WAVE specification.
"""

from __future__ import annotations

import struct

__all__ = ["make_wav", "parse_wav"]


def make_wav(
    samples: bytes,
    sample_rate: int = 8000,
    channels: int = 1,
    bits: int = 16,
) -> bytes:
    """Serialize canonical PCM WAV: RIFF(WAVE) + fmt(16) + data.
    ``samples`` is raw little-endian PCM of the given bit depth,
    length must be a multiple of the frame size (channels * bits/8)."""
    if channels <= 0 or sample_rate <= 0 or bits not in (8, 16):
        raise ValueError("degenerate WAV parameters")
    frame = channels * bits // 8
    if len(samples) % frame:
        raise ValueError("PCM byte length not a multiple of the frame size")
    block_align = frame
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(samples)) + samples
        + (b"\x00" if len(samples) % 2 else b"")  # RIFF word alignment
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(b: bytes) -> tuple[int, int, int, int, float, float]:
    """Parse a PCM WAV: (channels, sample_rate, bits, n_samples,
    duration_sec, mean_abs_amplitude).  n_samples counts FRAMES
    (per-channel sample groups); duration = frames / rate (6 dp);
    mean_abs is the mean absolute PCM value over every channel sample
    (8-bit is unsigned-centered at 128).  Raises ValueError on malformed
    framing and NotImplementedError on non-integer-PCM encodings."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack_from("<I", b, 4)
    if 8 + riff_size > len(b):
        raise ValueError("truncated WAV (RIFF size past end of buffer)")
    end = 8 + riff_size
    pos, fmt_chunk, data = 12, None, None
    while pos + 8 <= end:
        tag = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        if pos + 8 + size > end:
            raise ValueError(f"truncated WAV chunk {tag!r}")
        payload = b[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt_chunk = payload
        elif tag == b"data":
            data = payload
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt_chunk is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt_chunk) < 16:
        raise ValueError("truncated WAV fmt chunk")
    audio_format, channels, sample_rate, _byte_rate, block_align, bits = (
        struct.unpack_from("<HHIIHH", fmt_chunk, 0)
    )
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only integer PCM 8/16-bit WAV is decoded here "
            f"(format={audio_format}, bits={bits})"
        )
    if channels <= 0 or sample_rate <= 0:
        raise ValueError("degenerate WAV fmt parameters")
    frame = channels * bits // 8
    if block_align != frame:
        raise ValueError(
            f"WAV block_align {block_align} != channels*bits/8 {frame}"
        )
    if len(data) % frame:
        raise ValueError("WAV data length not a multiple of the frame size")
    n_samples = len(data) // frame
    if bits == 16:
        vals = struct.unpack(f"<{len(data) // 2}h", data)
        mean_abs = (
            round(sum(abs(v) for v in vals) / len(vals), 4) if vals else 0.0
        )
    else:
        mean_abs = (
            round(sum(abs(v - 128) for v in data) / len(data), 4)
            if data
            else 0.0
        )
    return (
        channels,
        sample_rate,
        bits,
        n_samples,
        round(n_samples / sample_rate, 6),
        mean_abs,
    )
