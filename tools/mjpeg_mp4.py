"""Pure-Python tiny MP4 builder (MJPEG samples) + structural checker.

This container needs NO encoder library: frames are solid-gray
baseline JPEGs (DC-only — a constant 8×8 block has a single nonzero
DCT coefficient, so entropy coding reduces to one Huffman'd DC diff
plus EOB per block), boxed into a minimal non-fragmented ISO BMFF
file whose sample description is ``mp4v`` with an ``esds``
objectTypeIndication of 0x6C (ISO/IEC 10918-1 JPEG) — the mapping
ffmpeg's mov demuxer resolves to its MJPEG decoder. Everything below
follows the public specs (ITU T.81 Annex K tables, ISO 14496-12/-1
box and descriptor layouts).

Purpose: vendor ``tests/data/tiny.mp4`` from an environment with no
PyAV/ffmpeg at all, so the real-codec video decode branches in
operators/multimodal.py (``_pyav_frames``/``_ffmpeg_frames``) get
exercised wherever a DECODER exists. ``check_mjpeg_mp4`` validates
the structure deterministically (box tree, sample table vs mdat
payload, JPEG marker walk) so the file is testable even here.
"""

from __future__ import annotations

import struct

# --- ITU T.81 Annex K Huffman tables (luminance) -----------------------

_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment (T.81 C.2): symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    """MSB-first bit stream with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad final byte with 1-bits (T.81 F.1.2.3)


#: T.81 Figure A.6 zigzag scan: zigzag index -> natural (row*8+col).
ZIGZAG = [
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_wrap(entropy: bytes, width: int, height: int, q: int) -> bytes:
    """Common segment scaffolding around an entropy-coded scan:
    SOI, JFIF APP0, uniform DQT, grayscale SOF0, Annex-K DHTs, SOS."""

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    out += seg(0xFFDB, b"\x00" + bytes([q] * 64))
    out += seg(
        0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    )
    out += seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def coeff_jpeg(
    width: int, height: int, blocks: list[list[int]], q: int = 16
) -> bytes:
    """Baseline grayscale JPEG from explicit QUANTIZED coefficient
    blocks — the general T.81 entropy coder (F.2 run-length AC
    symbols, ZRL, EOB), so fixtures can carry nonzero AC coefficients
    and exercise a full decoder's dequantize + IDCT path, not just
    the DC shortcut. ``blocks`` holds one 64-int list per 8×8 block
    in scan order, coefficients in ZIGZAG order (index 0 = DC)."""
    if width % 8 or height % 8:
        raise ValueError("dimensions must be multiples of 8")
    n_blocks = (width // 8) * (height // 8)
    if len(blocks) != n_blocks:
        raise ValueError(f"need {n_blocks} blocks, got {len(blocks)}")
    dc_codes = _huffman_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huffman_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    prev = 0

    def write_magnitude(v: int) -> None:
        cat = abs(v).bit_length()
        bw.write(v if v > 0 else v + (1 << cat) - 1, cat)

    for blk in blocks:
        if len(blk) != 64:
            raise ValueError("each block needs 64 zigzag coefficients")
        diff = blk[0] - prev
        prev = blk[0]
        cat = abs(diff).bit_length()
        code, ln = dc_codes[cat]
        bw.write(code, ln)
        if cat:
            write_magnitude(diff)
        # AC: run-length of zeros before each nonzero (T.81 F.2.2.2)
        last_nz = max((i for i in range(1, 64) if blk[i]), default=0)
        run = 0
        for i in range(1, last_nz + 1):
            v = blk[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                zrl, zln = ac_codes[0xF0]
                bw.write(zrl, zln)
                run -= 16
            c = abs(v).bit_length()
            if c > 10:
                raise ValueError(f"AC coefficient {v} exceeds category 10")
            sym_code, sym_len = ac_codes[(run << 4) | c]
            bw.write(sym_code, sym_len)
            write_magnitude(v)
            run = 0
        if last_nz != 63:
            eob, eln = ac_codes[0x00]
            bw.write(eob, eln)
    bw.flush()
    return _jpeg_wrap(bytes(bw.buf), width, height, q)


def solid_jpeg(width: int, height: int, gray: int, q: int = 16) -> bytes:
    """Baseline grayscale JFIF of one solid gray level. Dimensions
    must be multiples of 8 (no partial-block edge handling)."""
    if width % 8 or height % 8:
        raise ValueError("dimensions must be multiples of 8")
    if not 0 <= gray <= 255:
        raise ValueError("gray out of range")
    # constant 8x8 block: DC = 8*(level-shifted value), AC all zero
    dcq = round(8 * (gray - 128) / q)
    dc_codes = _huffman_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huffman_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    prev = 0
    for _ in range((width // 8) * (height // 8)):
        diff = dcq - prev
        prev = dcq
        cat = abs(diff).bit_length()
        code, ln = dc_codes[cat]
        bw.write(code, ln)
        if cat:
            v = diff if diff > 0 else diff + (1 << cat) - 1
            bw.write(v, cat)
        eob, eln = ac_codes[0x00]
        bw.write(eob, eln)
    bw.flush()
    return _jpeg_wrap(bytes(bw.buf), width, height, q)


# --- ISO BMFF boxing ----------------------------------------------------


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, bytes([version]) + flags.to_bytes(3, "big") + payload)


def _desc(tag: int, payload: bytes) -> bytes:
    if len(payload) >= 128:
        raise ValueError("descriptor too long for single-byte length")
    return bytes([tag, len(payload)]) + payload


_MATRIX = struct.pack(
    ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
)


def mjpeg_mp4(
    samples: list[bytes],
    width: int,
    height: int,
    fps: int = 4,
    timescale: int = 1024,
) -> bytes:
    """Box JPEG frames into a minimal non-fragmented MP4: one video
    track, one chunk, constant frame duration. Sample entry ``mp4v``
    + esds OTI 0x6C = ISO 14496-1's registration for JPEG video."""
    n = len(samples)
    delta = timescale // fps
    media_dur = n * delta
    movie_dur = media_dur * 1000 // timescale  # movie timescale 1000

    ftyp = _box(
        b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41"
    )
    mdat = _box(b"mdat", b"".join(samples))
    chunk_offset = len(ftyp) + 8  # first sample byte inside mdat

    max_sz = max(len(s) for s in samples)
    dec_cfg = _desc(
        0x04,
        bytes([0x6C, 0x11])  # OTI=JPEG, streamType=visual|reserved
        + (max_sz).to_bytes(3, "big")  # bufferSizeDB
        + struct.pack(">II", max_sz * fps * 8, max_sz * fps * 8),
    )
    es = _desc(0x03, struct.pack(">H", 1) + b"\x00" + dec_cfg + _desc(0x06, b"\x02"))
    esds = _full(b"esds", 0, 0, es)

    visual = (
        bytes(6)  # SampleEntry reserved
        + struct.pack(">H", 1)  # data_reference_index
        + bytes(16)  # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + bytes(4)
        + struct.pack(">H", 1)  # frame_count
        + bytes(32)  # compressorname (empty pascal string)
        + struct.pack(">Hh", 0x0018, -1)  # depth, pre_defined
        + esds
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"mp4v", visual))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dinf = _box(
        b"dinf",
        _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")),
    )
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(
        b"hdlr", 0, 0, bytes(4) + b"vide" + bytes(12) + b"VideoHandler\x00"
    )
    mdhd = _full(
        b"mdhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, media_dur)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        0,
        3,  # enabled | in movie
        struct.pack(">IIIII", 0, 0, 1, 0, movie_dur)
        + bytes(8)
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, 1000, movie_dur)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + bytes(8)
        + _MATRIX
        + bytes(24)
        + struct.pack(">I", 2),  # next_track_ID
    )
    moov = _box(b"moov", mvhd + _box(b"trak", tkhd + mdia))
    return ftyp + mdat + moov


def tiny_ac_blocks(n_blocks: int = 16) -> list[list[int]]:
    """Deterministic quantized-coefficient blocks for the AC-bearing
    JPEG fixture (formula-based, no RNG, so tests recompute the exact
    same blocks and assert decoded pixels against their own IDCT).
    Coverage by construction: positive/negative DC diffs, low- and
    mid-frequency ACs, a >15-zero run (ZRL path) every 4th block, and
    a final-position coefficient in the last block (no-EOB path)."""
    blocks = []
    for b in range(n_blocks):
        zz = [0] * 64
        zz[0] = (b * 7) % 37 - 18
        zz[1 + (b % 5)] = 9 + b  # low-frequency AC
        zz[10 + (b % 3)] = -(3 + b % 6)  # mid-frequency AC
        if b % 4 == 0:
            zz[40] = 5  # zero run > 15 -> exercises ZRL
        if b == n_blocks - 1:
            zz[63] = 1  # block ends on a coefficient -> no EOB emitted
        blocks.append(zz)
    return blocks


def tiny_ac_jpeg_bytes(size: int = 32, q: int = 16) -> bytes:
    """The vendored AC fixture: a 32×32 grayscale baseline JPEG whose
    blocks carry nonzero AC coefficients — real photographic-class
    entropy structure, decodable only by a full (dequantize + IDCT)
    decoder, unlike tiny.mp4's flat DC-only frames."""
    return coeff_jpeg(size, size, tiny_ac_blocks((size // 8) ** 2), q=q)


def tiny_mp4_bytes(n_frames: int = 8, size: int = 32, fps: int = 4) -> bytes:
    """The vendored fixture: n solid-gray frames at levels i*30 —
    the same ramp the PyAV synthesis path encodes, so decode tests
    see identical frame counts and dimensions either way."""
    frames = [solid_jpeg(size, size, (i * 30) % 256) for i in range(n_frames)]
    return mjpeg_mp4(frames, size, size, fps=fps)


# --- structural checker (no decoder needed) -----------------------------


def _walk_boxes(b: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size, typ = struct.unpack_from(">I4s", b, pos)
        if size < 8 or pos + size > end:
            raise ValueError(f"bad box size {size} at {pos}")
        yield typ, pos + 8, pos + size
        pos += size
    if pos != end:
        raise ValueError("trailing bytes after last box")


def _find(b: bytes, start: int, end: int, typ: bytes) -> tuple[int, int]:
    for t, s, e in _walk_boxes(b, start, end):
        if t == typ:
            return s, e
    raise ValueError(f"box {typ!r} not found")


def _jpeg_marker_walk(s: bytes) -> None:
    """Validate segment structure: SOI, length-prefixed segments up
    to SOS, entropy data with stuffed FFs, EOI at the end."""
    if s[:2] != b"\xff\xd8" or s[-2:] != b"\xff\xd9":
        raise ValueError("missing SOI/EOI")
    pos = 2
    while True:
        if s[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = s[pos + 1]
        ln = struct.unpack_from(">H", s, pos + 2)[0]
        if marker == 0xDA:  # SOS: rest is entropy until EOI
            pos += 2 + ln
            break
        pos += 2 + ln
    i = pos
    while i < len(s) - 2:
        if s[i] == 0xFF and s[i + 1] not in (0x00, 0xD9):
            raise ValueError(f"unstuffed FF in entropy data at {i}")
        i += 1


def check_mjpeg_mp4(b: bytes) -> dict:
    """Parse the box tree and prove the sample table is consistent
    with the mdat payload: every stsz/stco-addressed sample is a
    well-formed JPEG. Returns summary facts for tests to assert on."""
    top = list(_walk_boxes(b, 0, len(b)))
    types = [t for t, _, _ in top]
    if types[:1] != [b"ftyp"] or b"moov" not in types or b"mdat" not in types:
        raise ValueError(f"unexpected top-level boxes: {types}")
    moov_s, moov_e = _find(b, 0, len(b), b"moov")
    trak_s, trak_e = _find(b, moov_s, moov_e, b"trak")
    mdia_s, mdia_e = _find(b, trak_s, trak_e, b"mdia")
    minf_s, minf_e = _find(b, mdia_s, mdia_e, b"minf")
    stbl_s, stbl_e = _find(b, minf_s, minf_e, b"stbl")
    stsd_s, _ = _find(b, stbl_s, stbl_e, b"stsd")
    if b[stsd_s + 12 : stsd_s + 16] != b"mp4v":
        raise ValueError("sample entry is not mp4v")
    esds_idx = b.index(b"esds", stsd_s)
    oti = b[esds_idx + 4 + 4 + 2 + 2 + 1 + 2]  # ver/flags, ES tag+len, ES_ID+flags, DecCfg tag+len → OTI
    if oti != 0x6C:
        raise ValueError(f"esds OTI {oti:#x} is not JPEG (0x6C)")
    stsz_s, _ = _find(b, stbl_s, stbl_e, b"stsz")
    fixed, count = struct.unpack_from(">II", b, stsz_s + 4)
    if fixed:
        raise ValueError("expected per-sample sizes")
    sizes = [
        struct.unpack_from(">I", b, stsz_s + 12 + 4 * i)[0]
        for i in range(count)
    ]
    stco_s, _ = _find(b, stbl_s, stbl_e, b"stco")
    n_off, off0 = struct.unpack_from(">II", b, stco_s + 4)
    if n_off != 1:
        raise ValueError("expected a single chunk")
    pos = off0
    for sz in sizes:
        _jpeg_marker_walk(b[pos : pos + sz])
        pos += sz
    mdat_s, mdat_e = _find(b, 0, len(b), b"mdat")
    if (off0, pos) != (mdat_s, mdat_e):
        raise ValueError("sample bytes do not tile the mdat payload")
    # entry payload at stsd_s+16; width/height after 6 reserved +
    # 2 dref-index + 16 pre_defined/reserved bytes
    stsd_w, stsd_h = struct.unpack_from(">HH", b, stsd_s + 16 + 24)
    return {"n_samples": count, "width": stsd_w, "height": stsd_h}


if __name__ == "__main__":
    data = tiny_mp4_bytes()
    print(check_mjpeg_mp4(data), len(data), "bytes")
