"""ISO-BMFF (MP4) box-structure parser and writer — the video-metadata
tier of the multimodal family.

A video CODEC is out of scope in pure Python (no ffmpeg in this
environment), but the MP4 *container* is a simple length-prefixed box
tree (ISO/IEC 14496-12), and the metadata a training-data pipeline
actually filters on — duration, display dimensions, frame count — lives
entirely in the ``moov`` header boxes:

- ``mvhd``: movie timescale + duration (version 0 and 1 layouts),
- ``tkhd``: track display width/height as 16.16 fixed point,
- ``stts``: decoding time-to-sample table, whose sample counts sum to
  the frame count.

``parse_mp4`` walks the real box framing (64-bit largesize, size==0 =
to-EOF, container recursion through moov/trak/mdia/minf/stbl) and reads
those three; ``make_mp4`` writes a minimal valid structure so the round
trip is testable end-to-end without a single codec dependency.  Sample
DATA (``mdat``) is opaque — we report its mean byte as the deterministic
content statistic, mirroring the raster parsers' mean pixel.

Corrupt/truncated structures raise ``ValueError`` loudly (the honesty
convention of operators/jpeg.py); actual frame DECODE still needs ffmpeg
and is out of scope by adjudication.

Reference basis: none (SURVEY §2.2 extension surface — multimodal
columns).  Format layout from the public ISO/IEC 14496-12 spec.
"""

from __future__ import annotations

import struct

__all__ = ["make_mp4", "parse_mp4"]

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def _full(tag: bytes, version: int, payload: bytes) -> bytes:
    return _box(tag, struct.pack(">B3x", version) + payload)


def make_mp4(
    width: int,
    height: int,
    n_frames: int,
    duration_ms: int,
    timescale: int = 1000,
    mdat: bytes = b"",
) -> bytes:
    """Serialize a minimal valid ISO-BMFF file: ftyp + moov(mvhd +
    trak(tkhd + mdia(minf(stbl(stts))))) + mdat.  ``duration_ms`` is in
    milliseconds regardless of ``timescale`` (converted exactly — pick a
    timescale that divides 1000ths evenly, default 1000)."""
    if width <= 0 or height <= 0 or n_frames <= 0 or duration_ms < 0:
        raise ValueError("degenerate MP4 parameters")
    duration = duration_ms * timescale // 1000
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = _full(
        b"mvhd",
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)  # times, scale, dur
        + struct.pack(">IH2x8x", 0x00010000, 0x0100)  # rate, volume
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0)  # predefined
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full(
        b"tkhd",
        0,
        struct.pack(">IIII", 0, 0, 1, 0)  # times, track id, reserved
        + struct.pack(">I8x", duration)
        + struct.pack(">HHH2x", 0, 0, 0)  # layer, group, volume
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
    )
    # one stts run: n_frames samples of equal delta
    delta = max(1, duration // n_frames)
    stts = _full(b"stts", 0, struct.pack(">III", 1, n_frames, delta))
    stbl = _box(b"stbl", stts)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + moov + _box(b"mdat", mdat)


def _iter_boxes(b: bytes, start: int, end: int):
    """Yield (tag, payload_start, payload_end) for each box in
    b[start:end], honoring 64-bit largesize and size==0 (to end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", b, pos)
        tag = b[pos + 4 : pos + 8]
        header = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            (size,) = struct.unpack_from(">Q", b, pos + 8)
            header = 16
        elif size == 0:
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"bad MP4 box size {size} for {tag!r}")
        yield tag, pos + header, pos + size
        pos += size
    if pos != end:
        raise ValueError("trailing bytes after last MP4 box")


def _find_boxes(b: bytes, start: int, end: int, out: dict) -> None:
    for tag, ps, pe in _iter_boxes(b, start, end):
        if tag in _CONTAINERS:
            _find_boxes(b, ps, pe, out)
        else:
            out.setdefault(tag, []).append((ps, pe))


def parse_mp4(b: bytes) -> tuple[int, int, int, float, float]:
    """Parse ISO-BMFF metadata: (width, height, n_frames, duration_sec,
    mean mdat byte).  Width/height from the first ``tkhd`` (16.16 fixed
    point), duration from ``mvhd`` (v0 or v1), frame count as the sum of
    ``stts`` sample counts across the first video track.  Raises
    ValueError on malformed framing, missing required boxes, or a
    zero timescale."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF (MP4) payload")
    found: dict = {}
    _find_boxes(b, 0, len(b), found)
    if b"mvhd" not in found or b"tkhd" not in found:
        raise ValueError("MP4 missing moov header boxes (mvhd/tkhd)")

    ps, pe = found[b"mvhd"][0]
    if pe - ps < 4:
        raise ValueError("truncated MP4 mvhd box")
    version = b[ps]
    # extent checks BEFORE every unpack: a well-framed but short header
    # box must raise, never read the neighboring box's bytes (review
    # finding, r09)
    if version == 1:
        if pe - ps < 4 + 16 + 4 + 8:
            raise ValueError("truncated MP4 mvhd box (v1)")
        timescale, duration = struct.unpack_from(">IQ", b, ps + 4 + 16)
    elif version == 0:
        if pe - ps < 4 + 8 + 4 + 4:
            raise ValueError("truncated MP4 mvhd box (v0)")
        timescale, duration = struct.unpack_from(">II", b, ps + 4 + 8)
    else:
        raise ValueError(f"unsupported mvhd version {version}")
    if timescale == 0:
        raise ValueError("MP4 mvhd timescale is zero")

    ps, pe = found[b"tkhd"][0]
    if pe - ps < 4:
        raise ValueError("truncated MP4 tkhd box")
    tversion = b[ps]
    if tversion not in (0, 1):
        raise ValueError(f"unsupported tkhd version {tversion}")
    # v0: 4 (verflags) + 4+4 times + 4 id + 4 res + 4 dur + 60 = 84;
    # v1 widens the three time/duration fields to 8 bytes = 96.
    # Width/height are the LAST 8 bytes of the box either way — but only
    # once the box is full-length, else pe-8 points at other boxes'
    # bytes (or the box's own header).
    if pe - ps < (96 if tversion else 84):
        raise ValueError(f"truncated MP4 tkhd box (v{tversion})")
    wfix, hfix = struct.unpack_from(">II", b, pe - 8)
    width, height = wfix >> 16, hfix >> 16
    if width <= 0 or height <= 0:
        raise ValueError(f"degenerate MP4 display size {width}x{height}")

    n_frames = 0
    if b"stts" in found:
        ps, pe = found[b"stts"][0]
        if pe - ps < 8:
            raise ValueError("truncated MP4 stts table")
        (entry_count,) = struct.unpack_from(">I", b, ps + 4)
        if ps + 8 + entry_count * 8 > pe:
            raise ValueError("truncated MP4 stts table")
        for k in range(entry_count):
            count, _delta = struct.unpack_from(">II", b, ps + 8 + k * 8)
            n_frames += count
    if n_frames <= 0:
        raise ValueError("MP4 has no samples (empty/missing stts)")

    mean = 0.0
    if b"mdat" in found:
        ps, pe = found[b"mdat"][0]
        if pe > ps:
            mean = round(sum(b[ps:pe]) / (pe - ps), 4)
    return width, height, n_frames, round(duration / timescale, 3), mean
