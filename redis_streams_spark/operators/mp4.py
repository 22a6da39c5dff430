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


def _hdlr(handler: bytes, name: bytes) -> bytes:
    return _full(b"hdlr", 0, struct.pack(">I", 0) + handler + b"\x00" * 12 + name)


def _trak(
    track_id: int, width: int, height: int, duration: int, n_samples: int,
    handler: bytes | None,
) -> bytes:
    tkhd = _full(
        b"tkhd",
        0,
        struct.pack(">IIII", 0, 0, track_id, 0)  # times, track id, reserved
        + struct.pack(">I8x", duration)
        + struct.pack(">HHH2x", 0, 0, 0)  # layer, group, volume
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
    )
    # one stts run: n_samples of equal delta
    delta = max(1, duration // n_samples)
    stts = _full(b"stts", 0, struct.pack(">III", 1, n_samples, delta))
    minf = _box(b"minf", _box(b"stbl", stts))
    hdlr = b"" if handler is None else _hdlr(handler, b"Handler\x00")
    mdia = _box(b"mdia", hdlr + minf)
    return _box(b"trak", tkhd + mdia)


def make_mp4(
    width: int,
    height: int,
    n_frames: int,
    duration_ms: int,
    timescale: int = 1000,
    mdat: bytes = b"",
    with_audio_track: bool = False,
) -> bytes:
    """Serialize a minimal valid ISO-BMFF file: ftyp + moov(mvhd +
    trak(tkhd + mdia(minf(stbl(stts))))) + mdat.  ``duration_ms`` is in
    milliseconds regardless of ``timescale`` (converted exactly — pick a
    timescale that divides 1000ths evenly, default 1000).

    ``with_audio_track=True`` writes a spec-valid A/V layout with the
    AUDIO trak serialized FIRST (0x0 tkhd dims, ``soun`` hdlr, its own
    stts with a different sample count) and ``vide``/``soun`` hdlr boxes
    on both traks — the shape that distinguishes handler-aware track
    selection from first-box-wins parsing."""
    if width <= 0 or height <= 0 or n_frames <= 0 or duration_ms < 0:
        raise ValueError("degenerate MP4 parameters")
    duration = duration_ms * timescale // 1000
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    n_traks = 2 if with_audio_track else 1
    mvhd = _full(
        b"mvhd",
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)  # times, scale, dur
        + struct.pack(">IH2x8x", 0x00010000, 0x0100)  # rate, volume
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0)  # predefined
        + struct.pack(">I", n_traks + 1),  # next track id
    )
    if with_audio_track:
        # audio first: tkhd dims are 0x0 by spec for sound tracks, and
        # the sample count intentionally differs from the video trak's
        traks = _trak(1, 0, 0, duration, n_frames * 3 + 1, b"soun") + _trak(
            2, width, height, duration, n_frames, b"vide"
        )
    else:
        traks = _trak(1, width, height, duration, n_frames, None)
    moov = _box(b"moov", mvhd + traks)
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


# containers nest a handful of levels in any legal file (moov/trak/
# mdia/minf/stbl is 5); a crafted chain of nested container headers must
# raise ValueError like every other malformation, not RecursionError
# (review finding, r09)
_MAX_DEPTH = 16


def _find_boxes(b: bytes, start: int, end: int, out: dict, depth: int = 0) -> None:
    if depth > _MAX_DEPTH:
        raise ValueError("MP4 box tree nested too deeply")
    for tag, ps, pe in _iter_boxes(b, start, end):
        if tag in _CONTAINERS:
            _find_boxes(b, ps, pe, out, depth + 1)
        else:
            out.setdefault(tag, []).append((ps, pe))


def _tkhd_dims(b: bytes, ps: int, pe: int) -> tuple[int, int]:
    """Width/height from a tkhd box (16.16 fixed), with the r09 extent
    discipline: a well-framed but short header must raise, never read
    the neighboring box's bytes."""
    if pe - ps < 4:
        raise ValueError("truncated MP4 tkhd box")
    tversion = b[ps]
    if tversion not in (0, 1):
        raise ValueError(f"unsupported tkhd version {tversion}")
    # v0: 4 (verflags) + 4+4 times + 4 id + 4 res + 4 dur + 60 = 84;
    # v1 widens the three time/duration fields to 8 bytes = 96.
    # Width/height sit at the FIXED offset the version implies (76 / 88
    # from the payload start), not the last 8 bytes of the box — a tkhd
    # padded with trailing bytes beyond the spec size must still return
    # the real dims (r09 advice).
    dims_off = 88 if tversion else 76
    if pe - ps < dims_off + 8:
        raise ValueError(f"truncated MP4 tkhd box (v{tversion})")
    wfix, hfix = struct.unpack_from(">II", b, ps + dims_off)
    return wfix >> 16, hfix >> 16


def _hdlr_type(b: bytes, ps: int, pe: int) -> bytes | None:
    # hdlr payload: verflags(4) + pre_defined(4) + handler_type(4) + ...
    return b[ps + 8 : ps + 12] if pe - ps >= 12 else None


def _pick_video_trak(b: bytes, traks: list[dict]) -> dict:
    """Select the video track the way a real demuxer does: an explicit
    ``vide`` handler wins; otherwise the first track with positive tkhd
    display dims whose handler (if any) isn't some OTHER media type.  A
    spec-valid A/V file serializes the audio trak first with 0x0 tkhd
    dims — first-box-wins parsing would reject that file (or report
    audio sample counts as frames; review finding, r09)."""
    for t in traks:
        h = t.get(b"hdlr")
        if h and _hdlr_type(b, *h[0]) == b"vide":
            return t
    for t in traks:
        if b"tkhd" not in t:
            continue
        h = t.get(b"hdlr")
        if h and _hdlr_type(b, *h[0]) not in (None, b"vide"):
            continue
        w, ht = _tkhd_dims(b, *t[b"tkhd"][0])
        if w > 0 and ht > 0:
            return t
    # no video track at all: report the first tkhd's dims as degenerate
    # (single-track zero-size files keep the old loud error), or the
    # missing-boxes error when there is no tkhd anywhere
    for t in traks:
        if b"tkhd" in t:
            w, ht = _tkhd_dims(b, *t[b"tkhd"][0])
            raise ValueError(f"degenerate MP4 display size {w}x{ht}")
    raise ValueError("MP4 missing moov header boxes (mvhd/tkhd)")


def parse_mp4(b: bytes) -> tuple[int, int, int, float, float]:
    """Parse ISO-BMFF metadata: (width, height, n_frames, duration_sec,
    mean mdat byte).  Width/height from the VIDEO track's ``tkhd``
    (16.16 fixed point) — tracks are collected per-``trak`` subtree and
    the video one selected by ``hdlr`` handler type with a
    positive-dimensions fallback, so audio-first A/V files parse
    correctly; duration from ``mvhd`` (v0 or v1); frame count as the sum
    of the SAME track's ``stts`` sample counts.  Raises ValueError on
    malformed framing, missing required boxes, or a zero timescale."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF (MP4) payload")
    top: dict = {}
    traks: list[dict] = []
    loose: dict = {}
    for tag, ps, pe in _iter_boxes(b, 0, len(b)):
        if tag == b"moov":
            for t2, s2, e2 in _iter_boxes(b, ps, pe):
                if t2 == b"trak":
                    d: dict = {}
                    _find_boxes(b, s2, e2, d, 1)
                    traks.append(d)
                elif t2 in _CONTAINERS:
                    _find_boxes(b, s2, e2, loose, 1)
                else:
                    loose.setdefault(t2, []).append((s2, e2))
        elif tag in _CONTAINERS:
            _find_boxes(b, ps, pe, top, 1)
        else:
            top.setdefault(tag, []).append((ps, pe))
    if loose.get(b"tkhd") or loose.get(b"stts"):
        # header boxes serialized directly under moov (not inside a
        # trak): treat as one pseudo-track so malformed-but-framed
        # fixtures keep their specific truncation errors
        traks.append(loose)
    if b"mvhd" not in loose or not traks:
        raise ValueError("MP4 missing moov header boxes (mvhd/tkhd)")

    ps, pe = loose[b"mvhd"][0]
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

    video = _pick_video_trak(b, traks)
    width, height = _tkhd_dims(b, *video[b"tkhd"][0])
    if width <= 0 or height <= 0:
        raise ValueError(f"degenerate MP4 display size {width}x{height}")

    n_frames = 0
    if b"stts" in video:
        ps, pe = video[b"stts"][0]
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
    if b"mdat" in top:
        ps, pe = top[b"mdat"][0]
        if pe > ps:
            mean = round(sum(b[ps:pe]) / (pe - ps), 4)
    return width, height, n_frames, round(duration / timescale, 3), mean
