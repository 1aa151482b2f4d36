"""Pure-Python baseline-JPEG decoder for MJPEG-in-MP4.

This container has no Pillow/PyAV/ffmpeg, so the real-codec branches
of :func:`syncflux_spark.operators.multimodal.sample_frames` never
execute here. This module closes that seam from the other side: a
spec-only decoder (ITU T.81 baseline entropy coding + ISO 14496-12
sample tables, the same public specs ``tools/mjpeg_mp4.py`` writes
with) for single-component grayscale baseline scans, at two levels:

- :func:`decode_dc_only_jpeg` — the fast path for blocks that carry
  only a DC coefficient (every solid-color frame, which is what the
  vendored fixture holds). A constant 8×8 block is fully described by
  its DC term (IDCT of a lone DC is a flat block at ``DC/8``), so
  reconstruction needs no IDCT and is bit-exact. Any nonzero AC
  coefficient raises ``NotImplementedError`` here.
- :func:`decode_baseline_gray` — the full T.81 baseline path: Huffman
  run-length AC decode, dequantization, zigzag, and a separable
  floating-point IDCT (Annex A.3.3), pixel-asserted in tests against
  an independent numpy IDCT built straight from the spec formula.

Scope limits are loudly enforced with ``NotImplementedError``:
progressive SOF, subsampled/multi-component scans, 16-bit quant
tables, and restart intervals stay with Pillow/PyAV where those
binaries exist.

Everything is stdlib-only so the kernel ships to executors with no
extra imports.

Reference parity: syncflux has no media pipeline; this supports the
training-data multimodal surface (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# ISO BMFF: minimal non-fragmented sample walk (stsz/stco, single chunk)
# ---------------------------------------------------------------------------


def _walk(b: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size, typ = struct.unpack_from(">I4s", b, pos)
        if size < 8 or pos + size > end:
            raise ValueError(f"bad box size {size} at offset {pos}")
        yield typ, pos + 8, pos + size
        pos += size


def _find(b: bytes, start: int, end: int, typ: bytes) -> tuple[int, int]:
    for t, s, e in _walk(b, start, end):
        if t == typ:
            return s, e
    raise ValueError(f"box {typ!r} not found")


def mp4_video_samples(b: bytes) -> list[bytes]:
    """Extract the per-sample byte ranges of the first (only) track of
    a minimal non-fragmented MP4: stsz sizes laid consecutively from
    the single stco chunk offset. Fragmented files (moof) and
    multi-chunk layouts are out of scope and fail loudly."""
    if any(t == b"moof" for t, _, _ in _walk(b, 0, len(b))):
        raise ValueError("fragmented MP4 (moof) not supported")
    moov_s, moov_e = _find(b, 0, len(b), b"moov")
    trak_s, trak_e = _find(b, moov_s, moov_e, b"trak")
    mdia_s, mdia_e = _find(b, trak_s, trak_e, b"mdia")
    minf_s, minf_e = _find(b, mdia_s, mdia_e, b"minf")
    stbl_s, stbl_e = _find(b, minf_s, minf_e, b"stbl")
    stsz_s, _ = _find(b, stbl_s, stbl_e, b"stsz")
    fixed, count = struct.unpack_from(">II", b, stsz_s + 4)
    sizes = (
        [fixed] * count
        if fixed
        else [
            struct.unpack_from(">I", b, stsz_s + 12 + 4 * i)[0]
            for i in range(count)
        ]
    )
    stco_s, _ = _find(b, stbl_s, stbl_e, b"stco")
    n_off, off0 = struct.unpack_from(">II", b, stco_s + 4)
    if n_off != 1:
        raise ValueError(f"expected a single chunk, found {n_off}")
    out, pos = [], off0
    for sz in sizes:
        out.append(b[pos : pos + sz])
        pos += sz
    return out


# ---------------------------------------------------------------------------
# T.81 baseline JPEG: header parse + DC-only entropy decode
# ---------------------------------------------------------------------------


def _huffman_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical code assignment (T.81 C.2): (length, code) -> symbol."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy data exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker in entropy data")
                self.pos += 1  # skip stuffing byte
            self.acc, self.n = byte, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_symbol(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("no Huffman code matched within 16 bits")

    def receive_extend(self, cat: int) -> int:
        """T.81 F.2.2.1: read ``cat`` magnitude bits, sign-extend."""
        v = 0
        for _ in range(cat):
            v = (v << 1) | self.read_bit()
        if cat and v < (1 << (cat - 1)):
            v -= (1 << cat) - 1
        return v


def _parse_headers(s: bytes):
    """Shared T.81 segment walk up to SOS. Returns ``(width, height,
    qt, dc_table, ac_table, reader)`` where ``qt`` is the component's
    64-entry quant table in ZIGZAG order and ``reader`` is positioned
    at the entropy-coded scan."""
    if s[:2] != b"\xff\xd8":
        raise ValueError("missing SOI")
    pos = 2
    qtab: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    width = height = -1
    comp_q = comp_dc = comp_ac = 0
    while True:
        if s[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = s[pos + 1]
        ln = struct.unpack_from(">H", s, pos + 2)[0]
        body = s[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qtab[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                huff[(tc, th)] = _huffman_decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            precision, height, width, nc = struct.unpack_from(">BHHB", body)
            if precision != 8 or nc != 1:
                raise NotImplementedError(
                    "only 8-bit single-component (grayscale) baseline"
                )
            # per-component triple: id, sampling factors, quant table
            if body[7] != 0x11:
                raise NotImplementedError("subsampled components")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise NotImplementedError("non-baseline SOF")
        elif marker == 0xDD:  # DRI
            if struct.unpack_from(">H", body)[0] != 0:
                raise NotImplementedError("restart intervals")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != 1:
                raise NotImplementedError("multi-component scan")
            comp_dc, comp_ac = body[2] >> 4, body[2] & 0x0F
            pos += 2 + ln
            break
        pos += 2 + ln
    if width < 0:
        raise ValueError("no SOF before SOS")
    if width % 8 or height % 8:
        raise NotImplementedError("partial edge blocks")
    end = s.rindex(b"\xff\xd9")
    return (
        width,
        height,
        qtab[comp_q],
        huff[(0, comp_dc)],
        huff[(1, comp_ac)],
        _BitReader(s[pos:end]),
    )


def decode_dc_only_jpeg(s: bytes) -> tuple[int, int, list[int]]:
    """Decode a grayscale baseline JPEG whose every block is DC-only.

    Returns ``(width, height, block_grays)`` with one reconstructed
    gray level per 8×8 block in scan order: dequantized DC is
    ``dc_q · q00``; the IDCT of a lone DC coefficient is a constant
    block at ``DC/8``, level-shifted by +128 (T.81 A.3.1/A.3.3) and
    clamped to [0, 255]. Any nonzero AC coefficient means the frame is
    not constant-per-block and raises — this fast path never
    approximates; :func:`decode_baseline_gray` handles general blocks.
    """
    width, height, qt, dc_table, ac_table, reader = _parse_headers(s)
    q00 = qt[0]
    n_blocks = (width // 8) * (height // 8)
    grays: list[int] = []
    prev = 0
    for _ in range(n_blocks):
        cat = reader.read_symbol(dc_table)
        prev += reader.receive_extend(cat)
        # AC scan: a DC-only block is exactly one EOB symbol
        sym = reader.read_symbol(ac_table)
        if sym != 0x00:
            raise NotImplementedError(
                "nonzero AC coefficient: frame is not constant-per-block; "
                "use decode_baseline_gray (full IDCT) or a library decoder"
            )
        # dequantize + IDCT of a lone DC: flat block at DC/8, +128 shift
        level = round(prev * q00 / 8) + 128
        grays.append(min(255, max(0, level)))
    return width, height, grays


#: T.81 Figure A.6 zigzag scan: zigzag index -> natural (row*8+col).
_ZIGZAG = [
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

#: 1-D IDCT basis, row u -> [0.5·C(u)·cos((2x+1)uπ/16) for x in 0..7]
#: (T.81 A.3.3 split into two separable passes; 0.5² = the ¼ factor).
def _idct_basis() -> list[list[float]]:
    import math

    return [
        [
            0.5
            * (1.0 / math.sqrt(2.0) if u == 0 else 1.0)
            * math.cos((2 * x + 1) * u * math.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]


_BASIS = _idct_basis()


def decode_baseline_gray(s: bytes) -> tuple[int, int, bytes]:
    """Full decode of a grayscale baseline JPEG — general blocks with
    AC coefficients, unlike :func:`decode_dc_only_jpeg`'s flat-block
    fast path. Per block: T.81 F.2 entropy decode (run-length AC
    symbols, ZRL, EOB) into zigzag coefficients, dequantize against
    the zigzag-stored quant table, separable 2-D IDCT (A.3.3), +128
    level shift, round-half-even, clamp. Returns ``(width, height,
    pixels)`` with row-major grayscale bytes.

    Same narrow scope otherwise (one 8-bit component, baseline, no
    restart markers, whole blocks) and loudly enforced; speed is a
    non-goal — this exists so the real-compressed-bytes branch
    EXECUTES in environments with no codec library, pinned bit-exact
    against spec-computed pixels in tests."""
    width, height, qt, dc_table, ac_table, reader = _parse_headers(s)
    bw, bh = width // 8, height // 8
    pixels = bytearray(width * height)
    prev = 0
    for bi in range(bw * bh):
        # entropy decode one block of quantized zigzag coefficients
        zz = [0] * 64
        cat = reader.read_symbol(dc_table)
        prev += reader.receive_extend(cat)
        zz[0] = prev
        k = 1
        while k < 64:
            sym = reader.read_symbol(ac_table)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL: 16 zeros
                k += 16
                continue
            k += sym >> 4
            if k > 63:
                raise ValueError("AC run past end of block")
            zz[k] = reader.receive_extend(sym & 0x0F)
            k += 1
        # dequantize into natural (row-major u,v) order
        coef = [0.0] * 64
        for i in range(64):
            if zz[i]:
                coef[_ZIGZAG[i]] = zz[i] * qt[i]
        coef[0] = zz[0] * qt[0]
        # separable IDCT: columns (over v), then rows (over u)
        tmp = [0.0] * 64
        for u in range(8):
            row = coef[u * 8 : u * 8 + 8]
            if any(row):
                for y in range(8):
                    tmp[u * 8 + y] = sum(
                        row[v] * _BASIS[v][y] for v in range(8) if row[v]
                    )
        by, bx = divmod(bi, bw)
        for x in range(8):
            base = (by * 8 + x) * width + bx * 8
            for y in range(8):
                val = sum(tmp[u * 8 + y] * _BASIS[u][x] for u in range(8))
                level = round(val) + 128
                pixels[base + y] = min(255, max(0, level))
    return width, height, bytes(pixels)


def decode_frame_rgb24(s: bytes) -> tuple[int, int, bytes]:
    """Decode one DC-only JPEG to raw rgb24 bytes (h×w×3, row-major) —
    the same frame contract as the PyAV branch, so downstream feature
    kernels are codec-agnostic."""
    width, height, grays = decode_dc_only_jpeg(s)
    bw = width // 8
    row = bytearray()
    out = bytearray()
    for by in range(height // 8):
        row.clear()
        for bx in range(bw):
            row += bytes([grays[by * bw + bx]] * 3) * 8
        out += bytes(row) * 8
    return width, height, bytes(out)


def mjpeg_mp4_frames(b: bytes, every_n: int) -> list[tuple[int, bytes]]:
    """Sample every Nth frame of an MJPEG-in-MP4: walk the sample
    table, decode ONLY the selected samples (skipped frames cost a
    table lookup, not a decode) — returns ``(frame_idx, rgb24_bytes)``
    like :func:`multimodal._pyav_frames`."""
    samples = mp4_video_samples(b)
    out: list[tuple[int, bytes]] = []
    for fi in range(0, len(samples), every_n):
        _, _, rgb = decode_frame_rgb24(samples[fi])
        out.append((fi, rgb))
    return out
