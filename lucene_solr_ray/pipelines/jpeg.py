"""Baseline JFIF (JPEG) codec — pure numpy + stdlib, no image libraries.

Closes the one compressed-media seam left behind `multimodal.decode_image`
(SURVEY.md §2.1 rich-doc extraction boundary; the PNG codec in images.py
proved the real-codec pattern).  Scope is baseline sequential DCT, 8-bit,
Huffman entropy coding:

- encoder: RGB→YCbCr (JFIF), 8×8 forward DCT (matrix form), Annex-K
  quantization tables scaled by the libjpeg quality curve, zigzag, DC
  differential + AC run-length, Annex-K Huffman tables, byte stuffing.
  4:4:4 by default; `subsample=True` writes 4:2:0 (2×2 luma per MCU,
  box-averaged chroma — the shape real web corpora ship).
- decoder: full marker walk (APPn/COM skipped, DQT/DHT/DRI honored —
  tables come from the FILE, not from our constants), baseline SOF0 with
  GENERAL sampling factors (4:4:4 / 4:2:0 / 4:2:2 / anything with
  integral ratios; nearest-neighbor chroma upsample), restart-marker
  handling, Huffman decode, dequant, inverse DCT, YCbCr→RGB.
  Progressive (SOF2), 12-bit and arithmetic coding raise
  NotImplementedError — honest boundaries, same as the other codecs here.

Everything is deterministic; encode(img) is byte-stable across runs.
"""

from __future__ import annotations

import numpy as np

from .images import codec_errors

# -- constants (ITU T.81 Annex K) -------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIG = np.argsort(ZIGZAG)

QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Huffman table specs: (bits[1..16] counts, symbol values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# DCT basis: C[k, n] = a(k)·cos((2n+1)kπ/16); forward = C @ B @ C.T
_DCT_C = np.zeros((8, 8), dtype=np.float64)
for _k in range(8):
    _a = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _DCT_C[_k, _n] = _a * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), JPEG canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lt = np.clip((QUANT_LUMA * scale + 50) // 100, 1, 255)
    ct = np.clip((QUANT_CHROMA * scale + 50) // 100, 1, 255)
    return lt, ct


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) padded plane → (n_blocks, 8, 8) in MCU raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _encode_block(bw, zz, dct_t, act_t, pred_dc: int) -> int:
    """DC differential + AC run-length for one zigzagged block; → new DC."""
    diff = int(zz[0]) - pred_dc
    s = _category(diff)
    code, ln = dct_t[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.flatnonzero(zz[1:])
    last = nz[-1] + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = act_t[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = act_t[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = act_t[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    restart_interval: int = 0,
    subsample: bool = False,
) -> bytes:
    """uint8 (H, W, 3) RGB (or (H, W) grayscale) → baseline JFIF bytes,
    Annex-K Huffman tables.  Deterministic.  `restart_interval` emits
    DRI + RSTn markers every N MCUs (resync points — what a parallel/
    fault-tolerant decoder shards on).  `subsample=True` writes 4:2:0
    (2×2 luma per MCU, box-averaged chroma — the shape real web corpora
    ship); default stays 4:4:4."""
    img = np.asarray(img)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        # match the BMP/PPM codecs' convention: wrong channel count is
        # rejected, never silently dropped (RGBA must be flattened first)
        raise ValueError("expected (H, W, 3) RGB or (H, W) grayscale")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    lt, ct = _quality_tables(quality)
    sub = bool(subsample) and not gray
    # pad to MCU multiples by edge replication (16 under 4:2:0, else 8)
    mcu = 16 if sub else 8
    ph, pw = -h % mcu, -w % mcu
    if gray:
        planes = [np.pad(img.astype(np.float64), ((0, ph), (0, pw)), mode="edge")]
        tables = [lt]
        samp = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(img)
        ycc = np.pad(ycc, ((0, ph), (0, pw), (0, 0)), mode="edge")
        planes = [ycc[..., i] for i in range(3)]
        tables = [lt, ct, ct]
        samp = [(1, 1)] * 3
        if sub:
            samp = [(2, 2), (1, 1), (1, 1)]
            for i in (1, 2):  # 2×2 box average (JFIF downsample)
                p = planes[i]
                planes[i] = 0.25 * (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])
    # forward DCT + quantize; blocks kept as per-component GRIDS so the
    # MCU walk can interleave h×v luma blocks against single chroma blocks
    comp_grids = []
    for plane, tbl in zip(planes, tables):
        gh, gw = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = _blockify(plane) - 128.0
        coef = np.einsum("kn,bnm,ml->bkl", _DCT_C, blocks, _DCT_C.T)
        q = np.round(coef / tbl).astype(np.int64)
        comp_grids.append((q.reshape(-1, 64)[:, ZIGZAG], gw))

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    huff = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (0 if gray else 2)

    hmax = max(sh for sh, _ in samp)
    vmax = max(sv for _, sv in samp)
    # luma always carries the max factors, and its plane is padded to MCU
    # multiples above, so the MCU grid falls straight out of its shape
    nmx = planes[0].shape[1] // (8 * hmax)
    nmy = planes[0].shape[0] // (8 * vmax)
    nmcu = nmx * nmy
    bw = _BitWriter()
    pred = [0] * len(planes)
    for mi in range(nmcu):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.flush()  # pad to byte, then the (unstuffed) restart marker
            bw.buf += bytes([0xFF, 0xD0 + ((mi // restart_interval - 1) % 8)])
            pred = [0] * len(planes)
        my, mx = divmod(mi, nmx)
        for ci, ((zzs, gw), (sh, sv)) in enumerate(zip(comp_grids, samp)):
            dct_t, act_t = huff[ci]
            for blk_i in range(sh * sv):
                r, c = divmod(blk_i, sh)
                bi = (my * sv + r) * gw + (mx * sh + c)
                pred[ci] = _encode_block(bw, zzs[bi], dct_t, act_t, pred[ci])
    bw.flush()

    # -- headers
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01\x00\x00"
    for tid, tbl in enumerate([lt] if gray else [lt, ct]):
        out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([tid])
        out += bytes(int(x) for x in tbl.reshape(64)[ZIGZAG])
    nc = 1 if gray else 3
    out += b"\xff\xc0" + (8 + 3 * nc).to_bytes(2, "big") + bytes([8])
    out += h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        sh, sv = samp[ci]
        out += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    for tc, th, bits, vals in (
        [(0, 0, DC_LUMA_BITS, DC_LUMA_VALS), (1, 0, AC_LUMA_BITS, AC_LUMA_VALS)]
        + ([] if gray else [(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS), (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)])
    ):
        out += b"\xff\xc4" + (19 + len(vals)).to_bytes(2, "big")
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + (4).to_bytes(2, "big") + int(restart_interval).to_bytes(2, "big")
    out += b"\xff\xda" + (6 + 2 * nc).to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        td = 0 if ci == 0 else 1
        out += bytes([ci + 1, (td << 4) | td])
    out += bytes([0, 63, 0])
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder -----------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy data")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def align(self):
        self.acc = 0
        self.nbits = 0


class _HuffDecoder:
    """Canonical Huffman decode via per-length (min, max, value-offset)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        i = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = i
                self.mincode[length] = code
                code += n
                i += n
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.read(1)
        for length in range(1, 17):
            if self.maxcode[length] >= code >= self.mincode[length]:
                return self.vals[self.valptr[length] + code - self.mincode[length]]
            code = (code << 1) | br.read(1)
        raise ValueError("bad Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


@codec_errors
def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 RGB (H, W, 3), or (H, W) for one
    component.  DQT/DHT/DRI honored from the FILE; SOF2/12-bit/subsampled
    scans raise NotImplementedError."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    hts: dict[tuple[int, int], _HuffDecoder] = {}
    restart = 0
    frame = None
    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        pos += 1
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip padding so the length read never desyncs
        while pos < len(b) and b[pos] == 0xFF:
            pos += 1
        if pos >= len(b):
            break
        m = b[pos]
        pos += 1
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            continue
        ln = int.from_bytes(b[pos : pos + 2], "big")
        seg = b[pos + 2 : pos + ln]
        if m == 0xDB:  # DQT (possibly several tables)
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(seg[o + 1 : o + 65], dtype=np.uint8).astype(np.int64)
                qt[tq] = tbl[_UNZIG].reshape(8, 8)
                o += 65
        elif m == 0xC4:  # DHT (possibly several)
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17 : o + 17 + nv])
                hts[(tc, th)] = _HuffDecoder(bits, vals)
                o += 17 + nv
        elif m == 0xDD:  # DRI
            restart = int.from_bytes(seg[:2], "big")
        elif m == 0xC0 or m == 0xC1:  # SOF0/1 baseline
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            fh = int.from_bytes(seg[1:3], "big")
            fw = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                ch, cv = hv >> 4, hv & 0xF
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise ValueError(f"bad sampling factors {hv:#x}")
                comps.append((cid, ch, cv, tq))
            frame = (fh, fw, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential DCT (SOF0)")
        elif m == 0xDA:  # SOS → entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tt >> 4, tt & 0xF))
            data_start = pos + ln
            return _decode_scan(b, data_start, frame, scan, qt, hts, restart)
        pos += ln
    raise ValueError("no scan found")


def _decode_scan(b, pos, frame, scan, qt, hts, restart):
    fh, fw, comps = frame
    # unstuff entropy bytes up to EOI, remembering restart-marker positions
    data = bytearray()
    rst_at = []
    i = pos
    while i < len(b) - 1:
        if b[i] == 0xFF:
            nxt = b[i + 1]
            if nxt == 0x00:
                data.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                rst_at.append(len(data))
                i += 2
                continue
            break  # EOI or next marker
        data.append(b[i])
        i += 1
    br = _BitReader(bytes(data))
    cid_to_scan = {cs: (dc, ac) for cs, dc, ac in scan}
    # general sampling factors (T.81 A.2.3): an MCU is h×v blocks per
    # component; the 4:2:0 / 4:2:2 shapes real corpora ship are just
    # (2,2)/(2,1) luma against (1,1) chroma here
    hmax = max(ch for _, ch, _, _ in comps)
    vmax = max(cv for _, _, cv, _ in comps)
    nmx = (fw + 8 * hmax - 1) // (8 * hmax)
    nmy = (fh + 8 * vmax - 1) // (8 * vmax)
    nmcu = nmx * nmy
    planes = [
        np.zeros((nmy * cv * 8, nmx * ch * 8), dtype=np.float64)
        for _, ch, cv, _ in comps
    ]
    pred = [0] * len(comps)
    rst_i = 0

    def decode_block(ci: int, dct, act, tq) -> np.ndarray:
        zz = np.zeros(64, dtype=np.int64)
        s = dct.decode(br)
        diff = _extend(br.read(s), s) if s else 0
        pred[ci] += diff
        zz[0] = pred[ci]
        k = 1
        while k < 64:
            rs = act.decode(br)
            run, s = rs >> 4, rs & 0xF
            if s == 0:
                if run == 15:
                    k += 16  # ZRL
                    continue
                break  # EOB
            k += run
            if k > 63:
                raise ValueError("AC run overflow")
            zz[k] = _extend(br.read(s), s)
            k += 1
        coef = (zz * qt[tq].reshape(64)[ZIGZAG]).astype(np.float64)[_UNZIG].reshape(8, 8)
        return _DCT_C.T @ coef @ _DCT_C + 128.0

    def at_restart(mi: int):
        nonlocal rst_i, pred
        if restart and mi and mi % restart == 0:
            br.align()
            # skip to the recorded restart boundary (byte-aligned stream)
            if rst_i < len(rst_at):
                br.pos = max(br.pos, rst_at[rst_i])
                rst_i += 1
            pred = [0] * len(comps)

    if len(scan) == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved — the MCU
        # is one 8×8 block in plain raster order over the component's own
        # scaled dimensions; sampling factors do not shape the block walk.
        cid0 = scan[0][0]
        ci = next(i for i, (cid, _, _, _) in enumerate(comps) if cid == cid0)
        _, ch, cv, tq = comps[ci]
        dc_t, ac_t = cid_to_scan[cid0]
        dct, act = hts[(0, dc_t)], hts[(1, ac_t)]
        cw = (fw * ch + hmax - 1) // hmax
        chh = (fh * cv + vmax - 1) // vmax
        bxn, byn = (cw + 7) // 8, (chh + 7) // 8
        for bi in range(bxn * byn):
            at_restart(bi)
            by, bx = divmod(bi, bxn)
            blk = decode_block(ci, dct, act, tq)
            planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
    else:
        for mi in range(nmcu):
            at_restart(mi)
            my, mx = divmod(mi, nmx)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                dc_t, ac_t = cid_to_scan[cid]
                dct = hts[(0, dc_t)]
                act = hts[(1, ac_t)]
                for blk_i in range(ch * cv):
                    r, c = divmod(blk_i, ch)
                    blk = decode_block(ci, dct, act, tq)
                    by, bx = my * cv + r, mx * ch + c
                    planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
    # upsample each component to full resolution (nearest, the JFIF
    # box-filter inverse) and crop to the frame
    full = []
    for (cid, ch, cv, tq), p in zip(comps, planes):
        if ch != hmax or cv != vmax:
            if hmax % ch or vmax % cv:
                raise NotImplementedError("non-integral subsampling ratio")
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(np.stack(full, axis=-1))
