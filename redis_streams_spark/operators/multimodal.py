"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The real-codec branch of ``decode_features(..., use_real_codecs=True)``
is exercised end-to-end for ALL THREE modalities with dependency-free
pure-Python parsers: images — BMP 24-bit uncompressed, PPM ``P6``, PNG
(8-bit gray/RGB/RGBA, full zlib inflate + all five row filters, chunk
CRCs verified), baseline JPEG (``operators/jpeg.py``: Huffman + dequant
+ batched IDCT + 4:2:0/4:2:2 upsampling + YCbCr conversion; progressive
raises); audio — PCM WAV (``operators/wav.py``: RIFF chunk walk,
fmt/data, 8/16-bit; float/ADPCM raise); video — ISO-BMFF/MP4 container
metadata (``operators/mp4.py``: mvhd/tkhd/stts box tree; actual frame
decode needs ffmpeg, absent here, and raises from unknown magics only).
All decode actual header/payload bytes inside the mapInPandas batch,
and ``make_bmp`` / ``make_ppm`` / ``make_png`` / ``make_jpeg`` /
``make_wav`` / ``make_mp4`` synthesize valid payloads for tests.  The
default deterministic fake derives "decoded" features from the payload's
md5 — which makes the whole mapInPandas pipeline (schema, Arrow batching,
partition parallelism) real and testable, and even SQL-oracle-verifiable.

Schema/shape design for 100 TB:
- payload is a single ``binary`` column (parquet keeps it out of row-group
  stats; column pruning skips it unless projected);
- metadata is scalar columns, not a nested blob, so filters on modality /
  byte_len push down to the scan;
- decode runs in ``mapInPandas`` over Arrow batches — per-partition
  streaming, bounded memory, no driver involvement.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd

from redis_streams_spark.functions.hashing import h32

MODALITIES = ["image", "audio", "video"]

DECODED_SCHEMA = (
    "doc_id bigint, modality string, byte_len bigint, checksum string, "
    "width bigint, height bigint, n_frames bigint, mean_byte double"
)


def modality_col(id_col: Column) -> Column:
    return (
        F.when(id_col % 3 == 0, MODALITIES[0])
        .when(id_col % 3 == 1, MODALITIES[1])
        .otherwise(MODALITIES[2])
    )


def attach_blob(docs: DataFrame) -> DataFrame:
    """Turn documents into multimodal rows: binary payload + typed
    metadata (deterministic stand-in for real media files)."""
    return docs.select(
        "doc_id",
        modality_col(F.col("doc_id")).alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("byte_len"),
        F.md5("text").alias("checksum"),
    )


def fake_dims(text_col: Column) -> tuple[Column, Column, Column]:
    """Deterministic fake decode dimensions from content hashes (same
    arithmetic as the Python fake decoder and the SQL oracle)."""
    width = (64 + h32(F.concat(text_col, F.lit(":w"))) % 960).cast("long")
    height = (64 + h32(F.concat(text_col, F.lit(":h"))) % 960).cast("long")
    n_frames = (1 + h32(F.concat(text_col, F.lit(":f"))) % 120).cast("long")
    return width, height, n_frames


def mean_md5_byte(text_col: Column) -> Column:
    """Mean of the 16 md5 digest bytes — the fake 'mean pixel value'."""
    pairs = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda i: F.conv(F.substring(F.md5(text_col), i * 2 + 1, 2), 16, 10).cast(
            "long"
        ),
    )
    return rnd(
        F.aggregate(pairs, F.lit(0).cast("long"), lambda a, x: a + x) / 16.0, 4
    )


def _fake_decode_row(text: str) -> tuple[int, int, int, float]:
    from redis_streams_spark.functions.hashing import h32_py as _h32

    digest = hashlib.md5(text.encode("utf-8")).digest()
    width = 64 + _h32(text + ":w") % 960
    height = 64 + _h32(text + ":h") % 960
    n_frames = 1 + _h32(text + ":f") % 120
    mean_byte = round(sum(digest) / 16.0, 4)
    return width, height, n_frames, mean_byte


def make_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Serialize a valid 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up, rows padded to 4 bytes).  ``pixels`` is width*height*3
    BGR bytes, row 0 first (stored bottom-up per the format)."""
    import struct

    if len(pixels) != width * height * 3:
        raise ValueError("pixels must be width*height*3 bytes")
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    body = b"".join(
        pixels[r * row_bytes : (r + 1) * row_bytes] + b"\x00" * pad
        for r in range(height - 1, -1, -1)
    )
    image_size = (row_bytes + pad) * height
    header = struct.pack("<2sIHHI", b"BM", 54 + image_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    return header + info + body


def parse_bmp(b: bytes) -> tuple[int, int, float]:
    """Parse a 24-bit uncompressed BMP: (width, height, mean pixel byte).
    Handles bottom-up and top-down (negative height) rows; rejects other
    bit depths / compressions loudly."""
    import struct

    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", b, 10)[0]
    width, height_raw = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0 or planes != 1:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
    height = abs(height_raw)
    if width <= 0 or height <= 0:
        raise ValueError(f"degenerate BMP dimensions {width}x{height}")
    row_bytes = width * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    total = 0
    for r in range(height):
        row = b[offset + r * stride : offset + r * stride + row_bytes]
        if len(row) != row_bytes:
            raise ValueError("truncated BMP pixel data")
        total += sum(row)
    return width, height, round(total / (width * height * 3), 4)


def make_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Serialize a binary PPM (``P6``, maxval 255): header + raw RGB."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixels must be width*height*3 bytes")
    return f"P6\n{width} {height}\n255\n".encode("ascii") + pixels


def parse_ppm(b: bytes) -> tuple[int, int, float]:
    """Parse a binary PPM ``P6``: (width, height, mean pixel byte)."""
    if b[:2] != b"P6":
        raise ValueError("not a PPM payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":  # comment to end of line
            while i < len(b) and b[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        fields.append(int(b[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    if width <= 0 or height <= 0:
        raise ValueError(f"degenerate PPM dimensions {width}x{height}")
    body = b[i : i + width * height * 3]
    if len(body) != width * height * 3:
        raise ValueError("truncated PPM pixel data")
    return width, height, round(sum(body) / len(body), 4)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


def make_png(width: int, height: int, pixels: bytes) -> bytes:
    """Serialize a valid 8-bit RGB PNG (color type 2, non-interlaced,
    filter 0 per row, one zlib IDAT).  ``pixels`` is width*height*3 RGB
    bytes, row 0 first."""
    import struct
    import zlib

    if len(pixels) != width * height * 3:
        raise ValueError("pixels must be width*height*3 bytes")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    raw = b"".join(
        b"\x00" + pixels[r * stride : (r + 1) * stride] for r in range(height)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def parse_png(b: bytes) -> tuple[int, int, float]:
    """Parse an 8-bit non-interlaced PNG (gray / RGB / gray+A / RGBA):
    (width, height, mean sample byte — over ALL channels incl. alpha).
    Full inflate + per-row unfilter (all 5 filter types), chunk CRCs
    verified; palette/16-bit/interlaced variants rejected loudly.  Pure
    stdlib (zlib) — PNG is the one compressed raster a no-dependency
    environment can still decode for real."""
    import struct
    import zlib

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    i, ihdr, idat = 8, None, []
    while i + 12 <= len(b):
        (ln,) = struct.unpack_from(">I", b, i)
        tag = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + ln]
        if len(data) != ln or i + 12 + ln > len(b):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", b, i + 8 + ln)
        if crc != zlib.crc32(tag + data) & 0xFFFFFFFF:
            raise ValueError("PNG chunk CRC mismatch")
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        i += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    ch = _PNG_CHANNELS.get(ctype)
    if depth != 8 or comp != 0 or filt != 0 or ch is None:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color_type={ctype})"
        )
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    if w <= 0 or h <= 0:
        raise ValueError(f"degenerate PNG dimensions {w}x{h}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise ValueError("truncated PNG pixel data")
    prev = bytearray(stride)
    total = 0
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ft == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                up = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (up if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        total += sum(line)
        prev = line
    return w, h, round(total / (w * h * ch), 4)


def _real_decode_payload(payload: bytes) -> tuple[int, int, int, float]:
    """Dependency-free real decode: BMP / PPM / PNG / baseline JPEG
    raster parse (single frame) and ISO-BMFF (MP4) container metadata
    (operators/mp4.py: mvhd duration, tkhd dims, stts frame count — the
    box tree is real; frame DECODE still needs ffmpeg and stays out of
    scope).  Unknown formats raise a clearly-marked NotImplementedError
    instead of fake numbers; progressive JPEG raises the same from
    inside ``parse_jpeg``."""
    if payload[:2] == b"BM":
        w, h, mean = parse_bmp(payload)
    elif payload[:2] == b"P6":
        w, h, mean = parse_ppm(payload)
    elif payload[:8] == _PNG_SIG:
        w, h, mean = parse_png(payload)
    elif payload[:2] == b"\xff\xd8":
        from redis_streams_spark.operators.jpeg import parse_jpeg

        w, h, mean = parse_jpeg(payload)
    elif payload[4:8] == b"ftyp":
        from redis_streams_spark.operators.mp4 import parse_mp4

        w, h, n_frames, _dur, mean = parse_mp4(payload)
        return w, h, n_frames, mean
    elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        from redis_streams_spark.operators.wav import parse_wav

        # audio feature mapping into the shared DECODED_SCHEMA: width
        # carries the sample rate, height the channel count, n_frames
        # the frame (sample-group) count, mean_byte the mean absolute
        # amplitude scaled to byte range (16-bit /256)
        channels, rate, bits, n_samples, _dur, mean_abs = parse_wav(payload)
        return (
            rate,
            channels,
            n_samples,
            round(mean_abs / 256.0, 4) if bits == 16 else mean_abs,
        )
    else:
        raise NotImplementedError(
            "unrecognized media container; supported real formats here "
            "are BMP (24-bit uncompressed), PPM P6, PNG (8-bit, "
            "non-interlaced), baseline JPEG (operators/jpeg.py — "
            "progressive/arithmetic raise), PCM WAV (operators/wav.py — "
            "float/ADPCM raise), and MP4 box metadata (operators/mp4.py "
            "— frame decode needs ffmpeg, absent here)"
        )
    return w, h, 1, mean


def decode_features(docs: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """Decode / feature-extract over Arrow batches via mapInPandas.

    With ``use_real_codecs=True`` the ``payload`` binary column is decoded
    by REAL pure-Python parsers: BMP 24-bit, PPM P6, PNG 8-bit
    non-interlaced (full inflate + unfilter), baseline JPEG
    (``operators/jpeg.py``), and ISO-BMFF/MP4 container metadata
    (``operators/mp4.py`` — frame decode still needs ffmpeg and stays
    out of scope).  Malformed payloads raise ValueError; genuinely
    unknown magics raise NotImplementedError (swap
    :func:`_real_decode_payload`'s fallback for a codec call in
    production).  The default fake is deterministic md5 arithmetic over
    ``text``, so downstream operators and the SQL oracle can verify the
    full pipeline shape.
    """
    if use_real_codecs:
        src = docs.select("doc_id", "payload")

        def _decode_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                payloads = [bytes(p) for p in pdf["payload"]]
                feats = [_real_decode_payload(p) for p in payloads]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        # modality from the PAYLOAD MAGIC, not the fake
                        # path's doc_id%3 convention — a real BMP/PPM is
                        # an image regardless of its id (review finding)
                        "modality": [
                            "image"
                            if p[:2] in (b"BM", b"P6", b"\xff\xd8")
                            or p[:8] == _PNG_SIG
                            else (
                                "video"
                                if p[4:8] == b"ftyp"
                                else (
                                    "audio"
                                    if p[:4] == b"RIFF" and p[8:12] == b"WAVE"
                                    else "unknown"
                                )
                            )
                            for p in payloads
                        ],
                        "byte_len": [len(p) for p in payloads],
                        "checksum": [hashlib.md5(p).hexdigest() for p in payloads],
                        "width": [f[0] for f in feats],
                        "height": [f[1] for f in feats],
                        "n_frames": [f[2] for f in feats],
                        "mean_byte": [f[3] for f in feats],
                    }
                )

        return src.mapInPandas(_decode_real, schema=DECODED_SCHEMA)

    src = docs.select("doc_id", "text")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf["text"]
            feats = [_fake_decode_row(t) for t in texts]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [
                        MODALITIES[i % 3] for i in pdf["doc_id"].astype(int)
                    ],
                    "byte_len": [len(t.encode("utf-8")) for t in texts],
                    "checksum": [
                        hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts
                    ],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                    "mean_byte": [f[3] for f in feats],
                }
            )
            yield out

    return src.mapInPandas(_decode, schema=DECODED_SCHEMA)


def resize_plan(width, height, max_side: int = 256):
    """Deterministic resize arithmetic (aspect-preserving fit into a
    max_side box, floor semantics) — the Spark-side planning step of an
    image-resize stage; the pixel transform itself would live in the
    decode_features mapInPandas batch (codec-stubbed here)."""
    from pyspark.sql import functions as F

    scale_num = F.lit(max_side)
    longest = F.greatest(width, height)
    out_w = F.when(longest <= max_side, width).otherwise(
        (width * scale_num / longest).cast("long")
    )
    out_h = F.when(longest <= max_side, height).otherwise(
        (height * scale_num / longest).cast("long")
    )
    return out_w, out_h


def frame_sample_indices(n_frames, k: int = 4):
    """Deterministic frame sampling: k evenly-spaced frame indexes
    (floor(i * n / k)), clamped to valid range — the video analog of
    resize planning."""
    from pyspark.sql import functions as F

    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.least((i * n_frames / k).cast("long"), n_frames - 1),
    )
