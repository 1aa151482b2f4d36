"""Pure-Python DC-only baseline-JPEG decoder for MJPEG-in-MP4.

This container has no Pillow/PyAV/ffmpeg, so the real-codec branches
of :func:`syncflux_spark.operators.multimodal.sample_frames` never
execute here. This module closes that seam from the other side: a
spec-only decoder (ITU T.81 baseline entropy coding + ISO 14496-12
sample tables, the same public specs ``tools/mjpeg_mp4.py`` writes
with) that recovers frames EXACTLY for the class of JPEG it supports —
grayscale baseline scans whose blocks carry only a DC coefficient
(every solid-color frame, which is what the vendored fixture holds).

Scope is deliberately narrow and loudly enforced: one grayscale
component, baseline DCT, no restart markers, and any nonzero AC
coefficient raises ``NotImplementedError`` — a constant 8×8 block is
fully described by its DC term (IDCT of a lone DC is a flat block at
``DC/8``), so reconstruction needs no IDCT and is bit-exact. General
photographic JPEG stays with Pillow/PyAV where those exist.

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


def decode_dc_only_jpeg(s: bytes) -> tuple[int, int, list[int]]:
    """Decode a grayscale baseline JPEG whose every block is DC-only.

    Returns ``(width, height, block_grays)`` with one reconstructed
    gray level per 8×8 block in scan order: dequantized DC is
    ``dc_q · q00``; the IDCT of a lone DC coefficient is a constant
    block at ``DC/8``, level-shifted by +128 (T.81 A.3.1/A.3.3) and
    clamped to [0, 255]. Any nonzero AC coefficient means the frame is
    not constant-per-block and raises — this decoder never
    approximates."""
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
    reader = _BitReader(s[pos:end])
    dc_table = huff[(0, comp_dc)]
    ac_table = huff[(1, comp_ac)]
    q00 = qtab[comp_q][0]
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
                "use a full decoder (Pillow/PyAV) for photographic JPEG"
            )
        # dequantize + IDCT of a lone DC: flat block at DC/8, +128 shift
        level = round(prev * q00 / 8) + 128
        grays.append(min(255, max(0, level)))
    return width, height, grays


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
