"""Pure-Python baseline JPEG codec (ITU-T T.81 / JFIF): a real decoder
for the multimodal pipeline's real-codec tier plus a minimal encoder
used to build test fixtures.

Scope (decoder): baseline sequential DCT (SOF0), 8-bit precision,
grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling, standard or
custom Huffman tables, 8- or 16-bit quantization tables, restart
markers, APPn/COM skip.  Progressive (SOF2), arithmetic coding, and
12-bit precision are out of scope and raise ``NotImplementedError``
loudly — same honesty contract as the other codecs in
``operators/multimodal.py``.

Everything here derives from the public JPEG specification: the zigzag
order, the default Huffman tables (T.81 Annex K.3), and the JFIF YCbCr
<-> RGB conversion (BT.601 full-range).  The DCT uses the orthonormal
8x8 DCT-II basis, whose normalization equals the standard's
``1/4 C(u) C(v)`` form, applied as two matrix multiplies and batched
over all blocks with numpy — the per-pixel loops a scalar decoder would
have stay vectorized.

Like the PNG inflate in ``multimodal.py``, this is NOT the production
path for 100 TB of real images (swap in a native codec there); it
exists so the Spark-side plumbing — binary columns, mapInPandas batch
shape, feature schema — is exercised against REAL bitstreams rather
than fakes, dependency-free.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index = zigzag position, value = row-major position
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# T.81 Annex K.3 default Huffman tables: (bits[1..16], values)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis T: forward = T @ B @ T.T, inverse =
    T.T @ C @ T — the normalization matches T.81's 1/4 C(u) C(v) form."""
    T = np.zeros((8, 8))
    T[0, :] = 1.0 / np.sqrt(8.0)
    j = np.arange(8)
    for k in range(1, 8):
        T[k, :] = 0.5 * np.cos((2 * j + 1) * k * np.pi / 16.0)
    return T


_T = _dct_matrix()


def _canonical_codes(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for a canonical JPEG Huffman table."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _encode_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), the encoder-side view of the same table."""
    return {
        sym: (code, length)
        for (length, code), sym in _canonical_codes(bits, values).items()
    }


# -- encoder (test-fixture side) -----------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(
    bw: _BitWriter,
    coeffs: np.ndarray,
    pred: int,
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
) -> int:
    zz = [int(coeffs.flat[ZIGZAG[i]]) for i in range(64)]
    diff = zz[0] - pred
    s = _category(diff)
    code, length = dc_tab[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        v = zz[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_tab[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_tab[0x00]  # EOB
        bw.write(code, length)
    return zz[0]


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Forward DCT + quantize every 8x8 block of a level-shifted plane;
    returns an (nbh, nbw, 8, 8) int array."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coeffs = np.einsum("ij,abjk,lk->abil", _T, blocks, _T)
    return np.round(coeffs / q).astype(np.int64)


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (mh, mw)."""
    h, w = plane.shape
    H = -(-h // mh) * mh
    W = -(-w // mw) * mw
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


def make_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    subsampling: str = "444",
    quant: int = 1,
    gray: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode row-major RGB (or, with ``gray=True``, single-channel)
    ``pixels`` as a baseline JFIF JPEG.

    ``quant=1`` uses all-ones quantization tables — the DCT round trip
    is then exact up to rounding (a strict decoder test); larger values
    scale a flat table (uniform loss).  ``subsampling``: '444' (one
    block per component per MCU) or '420' (2x2 Y blocks per chroma
    block).  ``restart_interval`` emits DRI + RSTn markers every that
    many MCUs.  Test-fixture encoder: standard Huffman tables only.
    """
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if gray:
        return _make_jpeg_gray(width, height, pixels, quant, restart_interval)
    rgb = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    # JFIF (BT.601 full-range) RGB -> YCbCr
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    ql = np.full((8, 8), float(quant))
    qc = np.full((8, 8), float(quant))
    if subsampling == "444":
        hy = vy = 1
        planes = [y, cb, cr]
    else:
        hy = vy = 2
        # 2x2 box-average chroma on the padded-even grid
        cbp = _pad_to(cb, 2, 2)
        crp = _pad_to(cr, 2, 2)
        cb = (
            cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2)
            .mean(axis=(1, 3))
        )
        cr = (
            crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2)
            .mean(axis=(1, 3))
        )
        planes = [y, cb, cr]

    coeff = []
    for ci, plane in enumerate(planes):
        mh = 8 * (vy if ci == 0 else 1)
        mw = 8 * (hy if ci == 0 else 1)
        padded = _pad_to(plane, mh, mw) - 128.0
        coeff.append(_fdct_quant(padded, ql if ci == 0 else qc))

    # -- entropy-coded segment -------------------------------------------
    bw = _BitWriter()
    dcl, acl = _encode_codes(*_DC_LUM), _encode_codes(*_AC_LUM)
    dcc, acc = _encode_codes(*_DC_CHR), _encode_codes(*_AC_CHR)
    preds = [0, 0, 0]
    mcus_x = coeff[1].shape[1]
    mcus_y = coeff[1].shape[0]
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0, 0, 0]
            mcu_count += 1
            for by in range(vy):
                for bx in range(hy):
                    preds[0] = _encode_block(
                        bw, coeff[0][my * vy + by, mx * hy + bx], preds[0], dcl, acl
                    )
            preds[1] = _encode_block(bw, coeff[1][my, mx], preds[1], dcc, acc)
            preds[2] = _encode_block(bw, coeff[2][my, mx], preds[2], dcc, acc)
    bw.flush()

    # -- markers -----------------------------------------------------------
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tq: int, q: np.ndarray) -> bytes:
        vals = bytes(int(q.flat[ZIGZAG[i]]) for i in range(64))
        return seg(0xFFDB, bytes([tq]) + vals)

    def dht(cls: int, dest: int, table: tuple[list[int], list[int]]) -> bytes:
        bits, values = table
        return seg(0xFFC4, bytes([cls << 4 | dest]) + bytes(bits) + bytes(values))

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, ql) + dqt(1, qc)
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([3])
    sof += bytes([1, hy << 4 | vy, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += seg(0xFFC0, sof)
    out += dht(0, 0, _DC_LUM) + dht(1, 0, _AC_LUM)
    out += dht(0, 1, _DC_CHR) + dht(1, 1, _AC_CHR)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _make_jpeg_gray(
    width: int, height: int, pixels: bytes, quant: int, restart_interval: int
) -> bytes:
    """Single-component (grayscale) baseline encode — exercises the
    decoder's 1-component SOF path."""
    y = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, width)
        .astype(np.float64)
    )
    ql = np.full((8, 8), float(quant))
    coeff = _fdct_quant(_pad_to(y, 8, 8) - 128.0, ql)
    bw = _BitWriter()
    dcl, acl = _encode_codes(*_DC_LUM), _encode_codes(*_AC_LUM)
    pred = 0
    mcu_count = 0
    rst = 0
    for my in range(coeff.shape[0]):
        for mx in range(coeff.shape[1]):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = 0
            mcu_count += 1
            pred = _encode_block(bw, coeff[my, mx], pred, dcl, acl)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    vals = bytes(int(ql.flat[ZIGZAG[i]]) for i in range(64))
    out = bytearray()
    out += b"\xff\xd8"
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + vals)
    out += seg(0xFFC0, bytes([8]) + struct.pack(">HH", height, width) + bytes([1, 1, 0x11, 0]))
    bits, values = _DC_LUM
    out += seg(0xFFC4, bytes([0x00]) + bytes(bits) + bytes(values))
    bits, values = _AC_LUM
    out += seg(0xFFC4, bytes([0x10]) + bytes(bits) + bytes(values))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


# -- decoder --------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader: handles 0xFF00 stuffing; stops at any
    real marker (caller inspects ``marker``)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self._n <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                self._acc = (self._acc << 8) & 0xFFFFFFFF
                self._n += 8  # 0-pad past the end; decode loop stops on marker
                continue
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: consumed by sync_restart(), not here
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self._acc = ((self._acc << 8) | byte) & 0xFFFFFFFF
            self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Consume an expected RSTn and realign to the byte boundary.

        The reader may not have buffered up to the marker yet (pad bytes
        between the last MCU's final code and the marker are unread), so
        scan forward to it; pad bytes can never alias a marker because
        in-data 0xFF is always stuffed as FF 00."""
        self._acc = 0
        self._n = 0
        if self.marker is None:
            while self.pos + 1 < len(self.data):
                if (
                    self.data[self.pos] == 0xFF
                    and 0xD0 <= self.data[self.pos + 1] <= 0xD7
                ):
                    self.marker = self.data[self.pos + 1]
                    break
                self.pos += 1
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG: huffman code longer than 16 bits")


def _extend(v: int, s: int) -> int:
    return v - ((1 << s) - 1) if v < (1 << (s - 1)) else v


def parse_jpeg(data: bytes) -> tuple[int, int, float]:
    """Decode a baseline JFIF JPEG; returns (width, height, mean byte
    over the decoded RGB — or gray — pixels), the same contract as
    ``parse_bmp`` / ``parse_ppm`` / ``parse_png``."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    scan: list[tuple[int, int, int]] = []

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker code — skip them (r08-advice fix; previously a legal
        # fill byte was read as the marker and desynced the parse)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG (fill bytes at end of stream)")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG (segment length)")
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT
            b = body
            while b:
                pq, tq = b[0] >> 4, b[0] & 0xF
                n = 128 if pq else 64
                raw = b[1 : 1 + n]
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.float64)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
                )
                q = np.zeros(64)
                for i in range(64):
                    q[ZIGZAG[i]] = vals[i]
                qt[tq] = q.reshape(8, 8)
                b = b[1 + n :]
        elif marker == 0xC4:  # DHT
            b = body
            while b:
                cls, dest = b[0] >> 4, b[0] & 0xF
                bits = list(b[1:17])
                n = sum(bits)
                values = list(b[17 : 17 + n])
                huff[(cls, dest)] = _canonical_codes(bits, values)
                b = b[17 + n :]
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} unsupported")
            height, width = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1) is supported "
                f"(got SOF marker 0xFF{marker:02X} — progressive/arithmetic)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tdta = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cid, tdta >> 4, tdta & 0xF))
            break  # entropy data follows
        # else: APPn / COM — skipped

    if not comps or not scan:
        raise ValueError("invalid JPEG: missing SOF/SOS")
    if len(scan) != len(comps):
        # legal baseline streams may carry each component in its OWN
        # scan (non-interleaved, ns=1 per SOS); this decoder only
        # handles the single interleaved scan — decoding the first scan
        # as if interleaved would fabricate zero chroma silently, so
        # raise loudly instead (honesty contract, review finding r08)
        raise NotImplementedError(
            f"non-interleaved JPEG ({len(scan)} of {len(comps)} components "
            "in the first scan): only single-scan baseline is supported"
        )

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    by_id = {c["id"]: c for c in comps}
    order = []
    for cid, td, ta in scan:
        c = by_id[cid]
        order.append((c, huff[(0, td)], huff[(1, ta)]))

    # per component: quantized coefficient grid (blocks)
    for c in comps:
        c["blocks"] = np.zeros(
            (mcus_y * c["v"], mcus_x * c["h"], 8, 8), dtype=np.float64
        )

    br = _BitReader(data, pos)
    preds = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart()
                preds = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for c, dc_tab, ac_tab in order:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64)
                        s = _decode_huff(br, dc_tab)
                        diff = _extend(br.read_bits(s), s) if s else 0
                        preds[c["id"]] += diff
                        blk[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, ac_tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("invalid JPEG: AC index overflow")
                            blk[ZIGZAG[k]] = _extend(br.read_bits(s), s)
                            k += 1
                        c["blocks"][my * c["v"] + by, mx * c["h"] + bx] = blk.reshape(8, 8)

    # dequantize + batched IDCT + reassemble planes
    planes = []
    for c in comps:
        deq = c["blocks"] * qt[c["tq"]]
        spatial = np.einsum("ji,abjk,kl->abil", _T, deq, _T) + 128.0
        nbh, nbw = spatial.shape[:2]
        plane = spatial.transpose(0, 2, 1, 3).reshape(nbh * 8, nbw * 8)
        # upsample to full resolution (nearest-neighbor per T.81 note)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        gray = np.clip(np.round(planes[0]), 0, 255)
        return width, height, round(float(gray.mean()), 4)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255)
    return width, height, round(float(rgb.mean()), 4)
