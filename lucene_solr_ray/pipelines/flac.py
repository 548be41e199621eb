"""FLAC codec, pure numpy + stdlib — the lossless compressed audio format
real audio corpora ship (RFC 9639 / xiph spec).  Same encoder-proves-decoder
pattern as the PNG/JPEG/WebP/GIF codecs: the writer emits spec-conformant
streams (STREAMINFO, UTF-8-coded frame numbers, CRC-8 headers, CRC-16
frames, FIXED predictors, Rice-coded residuals) and the reader decodes the
full subframe surface (CONSTANT / VERBATIM / FIXED 0-4 / LPC, all four
stereo decorrelations, wasted bits, escape partitions) so wild files decode
too.  FLAC is table-free — every constant here (CRC polynomials 0x07 /
0x8005, block-size/rate code tables) is small enough to verify by hand,
unlike VP8-lossy whose 1000+ entropy-table entries can't be checked offline
(that seam stays declared in multimodal.py).

Hot-path shape: Rice DECODE is vectorized via pointer doubling over the
positions of 1-bits (quotient terminators form a chain t[i+1] = first one
>= t[i]+param+1 — materialized with O(log n) composed jump tables, no
per-sample Python); FIXED reconstruction is k-fold np.cumsum; Rice ENCODE
assembles all unary+remainder bits of a partition in one allocation.  The
only per-sample Python loop is LPC reconstruction (inherently sequential,
wild-file-only — our encoder emits FIXED).

Error contract: every malformed payload raises ValueError.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# --------------------------------------------------------------------------
# CRCs (polys from the spec; generated tables, nothing magic)


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = np.empty(256, np.uint32)
    for i in range(256):
        c = i << (width - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) if c & top else (c << 1)
        tbl[i] = c & mask
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)
_CRC16_TBL = _crc_table(0x8005, 16)


def _crc8(b: bytes) -> int:
    c = 0
    for x in b:
        c = int(_CRC8_TBL[c ^ x])
    return c


def _crc16(b: bytes) -> int:
    c = 0
    for x in b:
        c = int(_CRC16_TBL[((c >> 8) ^ x) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# --------------------------------------------------------------------------
# UTF-8-style coded numbers (frame/sample number, up to 36 bits)


def _utf8_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for k in range(2, 8):
        if n < (1 << (5 * k + 1)):
            out = bytearray(k)
            for i in range(k - 1, 0, -1):
                out[i] = 0x80 | (n & 0x3F)
                n >>= 6
            out[0] = ((0xFF00 >> k) & 0xFF) | n
            return bytes(out)
    raise ValueError("coded number out of range")


def _utf8_decode(b: bytes, pos: int) -> tuple[int, int]:
    if pos >= len(b):
        raise ValueError("flac: truncated coded number")
    first = b[pos]
    if first < 0x80:
        return first, pos + 1
    k = 0
    while first & (0x80 >> k):
        k += 1
    if k < 2 or k > 7 or pos + k > len(b):
        raise ValueError("flac: bad coded number")
    n = first & (0x7F >> k)
    for i in range(1, k):
        c = b[pos + i]
        if c & 0xC0 != 0x80:
            raise ValueError("flac: bad coded-number continuation")
        n = (n << 6) | (c & 0x3F)
    return n, pos + k


# --------------------------------------------------------------------------
# Bit assembly (encode side)


class _BitWriter:
    def __init__(self):
        self.chunks: list[np.ndarray] = []
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        if n:
            bits = ((val >> np.arange(n - 1, -1, -1)) & 1).astype(np.uint8)
            self.chunks.append(bits)
            self.nbits += n

    def write_array(self, bits: np.ndarray) -> None:
        self.chunks.append(bits.astype(np.uint8, copy=False))
        self.nbits += bits.size

    def tobytes(self) -> bytes:
        pad = (-self.nbits) % 8
        if pad:
            self.chunks.append(np.zeros(pad, np.uint8))
            self.nbits += pad
        return np.packbits(np.concatenate(self.chunks)).tobytes()


def _signed_bits(vals: np.ndarray, width: int) -> np.ndarray:
    """(n,) ints → (n*width,) two's-complement MSB-first bit array."""
    u = (vals.astype(np.int64) & ((1 << width) - 1)).astype(np.uint64)
    sh = np.arange(width - 1, -1, -1, dtype=np.uint64)
    return ((u[:, None] >> sh) & 1).astype(np.uint8).reshape(-1)


def _rice_bits(resid: np.ndarray, param: int) -> np.ndarray:
    """Rice(param)-code a residual array into one bit array: per value,
    quotient zeros + terminator 1 + param remainder bits (all assembled
    in a single allocation, no per-sample Python)."""
    r = resid.astype(np.int64)
    u = ((r << 1) ^ (r >> 63)).astype(np.uint64)  # zigzag fold
    q = (u >> np.uint64(param)).astype(np.int64)
    lens = q + 1 + param
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    out = np.zeros(int(lens.sum()), np.uint8)
    out[starts + q] = 1  # unary terminators
    if param:
        sh = np.arange(param - 1, -1, -1, dtype=np.uint64)
        rem = ((u[:, None] >> sh) & 1).astype(np.uint8)
        pos = (starts + q + 1)[:, None] + np.arange(param)
        out[pos.reshape(-1)] = rem.reshape(-1)
    return out


# --------------------------------------------------------------------------
# Bit reading (decode side)


class _FlacBits:
    """Whole-payload bit view + the global 1-bit position index the
    pointer-doubling Rice decoder jumps over."""

    def __init__(self, b: bytes):
        self.bits = np.unpackbits(np.frombuffer(b, np.uint8))
        self.ones = np.flatnonzero(self.bits).astype(np.int64)

    def read_uint(self, pos: int, n: int) -> tuple[int, int]:
        if pos + n > self.bits.size:
            raise ValueError("flac: truncated bitstream")
        v = 0
        for bit in self.bits[pos : pos + n]:
            v = (v << 1) | int(bit)
        return v, pos + n

    def read_signed(self, pos: int, n: int) -> tuple[int, int]:
        v, pos = self.read_uint(pos, n)
        if n and v >= (1 << (n - 1)):
            v -= 1 << n
        return v, pos

    def read_unary(self, pos: int) -> tuple[int, int]:
        i = np.searchsorted(self.ones, pos)
        if i >= self.ones.size:
            raise ValueError("flac: truncated unary code")
        t = int(self.ones[i])
        return t - pos, t + 1

    def read_signed_block(self, pos: int, n: int, width: int) -> tuple[np.ndarray, int]:
        """n fixed-width signed values, vectorized gather."""
        end = pos + n * width
        if end > self.bits.size:
            raise ValueError("flac: truncated bitstream")
        if n == 0 or width == 0:
            return np.zeros(n, np.int64), end
        blk = self.bits[pos:end].reshape(n, width).astype(np.int64)
        w = (1 << np.arange(width - 1, -1, -1, dtype=np.int64))
        v = blk @ w
        v -= (blk[:, 0] * (1 << width)).astype(np.int64)  # sign extend
        return v, end

    def rice_decode(self, pos: int, n: int, param: int) -> tuple[np.ndarray, int]:
        """Vectorized Rice decode: the quotient terminators are a chain
        t[i+1] = first 1-bit >= t[i] + param + 1 through the global ones
        index.  Each remainder field holds at most `param` 1-bits, so all
        n terminators lie within the first n*(param+1) ones — build the
        one-step jump table there and materialize the chain by doubling."""
        if n == 0:
            return np.zeros(0, np.int64), pos
        start = int(np.searchsorted(self.ones, pos))
        win = self.ones[start : start + n * (param + 1)]
        if win.size == 0:
            raise ValueError("flac: truncated rice stream")
        # one-step jump (with a self-mapping sentinel for out-of-window;
        # searchsorted never exceeds win.size, so the sentinel row is the
        # only out-of-range target)
        nxt = np.searchsorted(win, win + param + 1).astype(np.int64)
        nxt = np.append(nxt, win.size)  # sentinel row
        idx = np.empty(n, np.int64)
        idx[0] = 0
        filled, jump = 1, nxt  # jump = nxt^filled (sentinel row included)
        while filled < n:
            take = min(filled, n - filled)
            idx[filled : filled + take] = jump[idx[:take]]
            filled += take
            if filled < n:
                jump = jump[jump]  # double the step
        if idx[-1] >= win.size:
            raise ValueError("flac: truncated rice stream")
        t = win[idx]
        prev_end = np.empty(n, np.int64)
        prev_end[0] = pos
        prev_end[1:] = t[:-1] + 1 + param
        # q >= 0 by construction: each t is the first 1-bit at/after the
        # previous value's end, so no negative-quotient guard is needed
        q = t - prev_end
        u = q.astype(np.uint64) << np.uint64(param)
        if param:
            gat = (t + 1)[:, None] + np.arange(param)
            if int(gat[-1, -1]) >= self.bits.size:
                raise ValueError("flac: truncated rice stream")
            rem = self.bits[gat.reshape(-1)].reshape(n, param).astype(np.uint64)
            w = (np.uint64(1) << np.arange(param - 1, -1, -1, dtype=np.uint64))
            u |= rem @ w
        v = (u >> np.uint64(1)).astype(np.int64) ^ -(u & np.uint64(1)).astype(np.int64)
        return v, int(t[-1]) + 1 + param


# --------------------------------------------------------------------------
# Predictors (FIXED order-k prediction ≡ residual = Δ^k signal, so
# np.diff / cumsum carry the whole predictor algebra)


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    return np.diff(x.astype(np.int64), n=order)


def _fixed_restore(warmup: np.ndarray, resid: np.ndarray, order: int) -> np.ndarray:
    """Invert Δ^order via k-fold cumsum seeded from the warmup samples."""
    w = warmup.astype(np.int64)
    cur = resid.astype(np.int64)
    for k in range(order, 0, -1):
        seed = np.diff(w, n=k - 1)[-1] if order else 0
        cur = seed + np.cumsum(cur)
    return np.concatenate([w, cur]) if order else cur


_SAMPLE_CAP = 1 << 32  # way past any conformant stream's intermediate values


def _lpc_restore(warmup: np.ndarray, resid: np.ndarray, coefs: list[int], shift: int) -> np.ndarray:
    order = len(coefs)
    out = np.concatenate([warmup.astype(np.int64), np.zeros(resid.size, np.int64)])
    c = coefs  # c[0] applies to s[i-1]
    r = resid
    for i in range(resid.size):
        j = order + i
        pred = 0
        for k in range(order):
            pred += c[k] * int(out[j - 1 - k])
        v = (pred >> shift) + int(r[i])
        if not -_SAMPLE_CAP < v < _SAMPLE_CAP:
            # hostile coefficients make the recursion grow geometrically;
            # unchecked, the Python-int pred eventually overflows the
            # int64 store with OverflowError — keep the ValueError contract
            raise ValueError("flac: LPC prediction out of range")
        out[j] = v
    return out


# --------------------------------------------------------------------------
# Encoder

_BLOCK = 4096


def _best_rice_param(resid: np.ndarray) -> tuple[int, int]:
    """(param, total_bits) minimizing unary+remainder cost, params 0..14."""
    r = resid.astype(np.int64)
    u = ((r << 1) ^ (r >> 63)).astype(np.uint64)
    best_p, best_bits = 0, None
    for p in range(15):
        bits = int((u >> np.uint64(p)).sum()) + resid.size * (p + 1)
        if best_bits is None or bits < best_bits:
            best_p, best_bits = p, bits
    return best_p, best_bits


def _encode_subframe(w: _BitWriter, x: np.ndarray, bps: int) -> None:
    x64 = x.astype(np.int64)
    if x64.size and (x64 == x64[0]).all():
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write_array(_signed_bits(x64[:1], bps))
        return
    # pick the FIXED order with the cheapest |residual| mass
    max_order = min(4, x64.size - 1)
    best_o, best_cost = 0, None
    for o in range(max_order + 1):
        cost = int(np.abs(_fixed_residual(x64, o)).sum())
        if best_cost is None or cost < best_cost:
            best_o, best_cost = o, cost
    resid = _fixed_residual(x64, best_o)
    param, rice_bits = _best_rice_param(resid)
    if rice_bits >= x64.size * bps:  # incompressible → VERBATIM
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        w.write_array(_signed_bits(x64, bps))
        return
    w.write(0, 1)
    w.write(8 + best_o, 6)  # FIXED, order best_o
    w.write(0, 1)  # no wasted bits
    w.write_array(_signed_bits(x64[:best_o], bps))  # warmup
    w.write(0, 2)  # residual method 0 (4-bit rice params)
    w.write(0, 4)  # partition order 0
    w.write(param, 4)
    w.write_array(_rice_bits(resid, param))


def encode_flac(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 array (n,) mono or (n, 2) stereo → FLAC bytes (block size
    4096, independent channels, best FIXED predictor, Rice residuals)."""
    if samples.dtype != np.int16:
        raise ValueError("encode_flac wants int16 samples")
    if not 0 < rate <= 655350:  # the spec's 20-bit STREAMINFO cap
        raise ValueError(f"sample rate out of FLAC range: {rate}")
    if samples.size == 0:
        raise ValueError("encode_flac needs at least one sample")
    if samples.ndim == 1:
        chans = [samples]
    elif samples.ndim == 2 and samples.shape[1] in (1, 2):
        chans = [samples[:, i] for i in range(samples.shape[1])]
    else:
        raise ValueError("encode_flac wants (n,) mono or (n, 2) stereo")
    n_ch, total, bps = len(chans), chans[0].size, 16
    md5 = hashlib.md5(
        np.stack(chans, axis=1).astype("<i2").tobytes()
    ).digest()
    si = struct.pack(">HH", _BLOCK, _BLOCK) + b"\x00\x00\x00" * 2
    packed = (rate << 44) | ((n_ch - 1) << 41) | ((bps - 1) << 36) | total
    si += packed.to_bytes(8, "big") + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80 | 0]) + len(si).to_bytes(3, "big") + si  # last, STREAMINFO
    for fno, off in enumerate(range(0, total, _BLOCK)):
        bs = min(_BLOCK, total - off)
        hdr = bytearray(b"\xff\xf8")
        hdr.append((7 << 4) | 0)  # blocksize: 16-bit follows; rate: STREAMINFO
        hdr.append(((n_ch - 1) << 4) | (4 << 1))  # independent chans, 16-bit
        hdr += _utf8_encode(fno)
        hdr += struct.pack(">H", bs - 1)
        hdr.append(_crc8(bytes(hdr)))
        w = _BitWriter()
        for ch in chans:
            _encode_subframe(w, ch[off : off + bs], bps)
        frame = bytes(hdr) + w.tobytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder

_BS_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
             8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
             13: 8192, 14: 16384, 15: 32768}
# frame-header rate codes 1-11 carry no extra bytes and the decoder trusts
# STREAMINFO's rate, so only the codes with trailing bytes (12-14) and the
# invalid code (15) need handling below
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


def _decode_subframe(fb: _FlacBits, pos: int, bs: int, bps: int) -> tuple[np.ndarray, int]:
    z, pos = fb.read_uint(pos, 1)
    if z:
        raise ValueError("flac: subframe padding bit set")
    typ, pos = fb.read_uint(pos, 6)
    wflag, pos = fb.read_uint(pos, 1)
    wasted = 0
    if wflag:
        k, pos = fb.read_unary(pos)
        wasted = k + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("flac: wasted bits exceed sample size")
    if typ == 0:  # CONSTANT
        v, pos = fb.read_signed(pos, eff)
        out = np.full(bs, v, np.int64)
    elif typ == 1:  # VERBATIM
        out, pos = fb.read_signed_block(pos, bs, eff)
    elif 8 <= typ <= 12:  # FIXED
        order = typ - 8
        if order > bs:
            raise ValueError("flac: predictor order exceeds block size")
        warm, pos = fb.read_signed_block(pos, order, eff)
        resid, pos = _decode_residual(fb, pos, bs, order)
        out = _fixed_restore(warm, resid, order)
    elif typ >= 32:  # LPC
        order = (typ & 31) + 1
        if order > bs:
            raise ValueError("flac: predictor order exceeds block size")
        warm, pos = fb.read_signed_block(pos, order, eff)
        prec, pos = fb.read_uint(pos, 4)
        if prec == 15:
            raise ValueError("flac: invalid LPC precision")
        prec += 1
        shift, pos = fb.read_signed(pos, 5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coefs = []
        for _ in range(order):
            c, pos = fb.read_signed(pos, prec)
            coefs.append(c)
        resid, pos = _decode_residual(fb, pos, bs, order)
        out = _lpc_restore(warm, resid, coefs, shift)
    else:
        raise ValueError(f"flac: reserved subframe type {typ}")
    return out << wasted, pos


def _decode_residual(fb: _FlacBits, pos: int, bs: int, order: int) -> tuple[np.ndarray, int]:
    method, pos = fb.read_uint(pos, 2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits, escape = (4, 15) if method == 0 else (5, 31)
    porder, pos = fb.read_uint(pos, 4)
    nparts = 1 << porder
    if bs % nparts:
        raise ValueError("flac: block size not divisible by partitions")
    chunks = []
    for p in range(nparts):
        cnt = (bs >> porder) - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("flac: partition smaller than predictor order")
        param, pos = fb.read_uint(pos, pbits)
        if param == escape:
            raw, pos = fb.read_uint(pos, 5)
            vals, pos = fb.read_signed_block(pos, cnt, raw) if raw else (np.zeros(cnt, np.int64), pos)
        else:
            vals, pos = fb.rice_decode(pos, cnt, param)
        chunks.append(vals)
    out = np.concatenate(chunks) if chunks else np.zeros(0, np.int64)
    # conformant 16-bit residuals are bounded ~2^21 (order-4 binomial sum
    # of 17-bit samples); hostile method-1/escape streams can encode ~2^53
    # values whose k-fold cumsum would WRAP int64 silently — reject first
    if out.size and int(np.abs(out).max()) > (1 << 26):
        raise ValueError("flac: residual out of range")
    return out, pos


def decode_flac(b: bytes, verify_md5: bool = True) -> tuple[np.ndarray, int]:
    """FLAC bytes → (int16 samples [n] or [n, ch], rate).  Verifies every
    frame CRC-16 and (when STREAMINFO carries one) the stream MD5."""
    if b[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos, si = 4, None
    while True:
        if pos + 4 > len(b):
            raise ValueError("flac: truncated metadata")
        hdr = b[pos]
        blen = int.from_bytes(b[pos + 1 : pos + 4], "big")
        body = b[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            raise ValueError("flac: truncated metadata block")
        if hdr & 0x7F == 0:
            if blen != 34:
                raise ValueError("flac: bad STREAMINFO length")
            si = body
        pos += 4 + blen
        if hdr & 0x80:
            break
    if si is None:
        raise ValueError("flac: missing STREAMINFO")
    packed = int.from_bytes(si[10:18], "big")
    rate = packed >> 44
    n_ch = ((packed >> 41) & 0x7) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    md5 = si[18:34]
    if rate == 0 or n_ch > 8:
        raise ValueError("flac: bad STREAMINFO")
    if bps != 16:
        raise ValueError("flac: only 16-bit streams decoded here")
    fb = _FlacBits(b)
    got: list[np.ndarray] = []
    n_got = 0
    while pos < len(b) and (total == 0 or n_got < total):
        frame_start = pos
        if pos + 5 > len(b):
            raise ValueError("flac: truncated frame header")
        if b[pos] != 0xFF or (b[pos + 1] & 0xFC) != 0xF8:
            raise ValueError("flac: lost frame sync")
        bs_code = b[pos + 2] >> 4
        rate_code = b[pos + 2] & 0xF
        ch_code = b[pos + 3] >> 4
        bps_code = (b[pos + 3] >> 1) & 0x7
        if b[pos + 3] & 1:
            raise ValueError("flac: reserved frame-header bit set")
        pos += 4
        _, pos = _utf8_decode(b, pos)
        if bs_code == 0:
            raise ValueError("flac: reserved block-size code")
        elif bs_code == 6:
            if pos + 1 > len(b):
                raise ValueError("flac: truncated frame header")
            bs = b[pos] + 1
            pos += 1
        elif bs_code == 7:
            if pos + 2 > len(b):
                raise ValueError("flac: truncated frame header")
            bs = struct.unpack_from(">H", b, pos)[0] + 1
            pos += 2
        else:
            bs = _BS_CODES[bs_code]
        if rate_code == 12:
            pos += 1
        elif rate_code in (13, 14):
            pos += 2
        elif rate_code == 15:
            raise ValueError("flac: invalid sample-rate code")
        if pos + 1 > len(b):
            raise ValueError("flac: truncated frame header")
        if _crc8(b[frame_start:pos]) != b[pos]:
            raise ValueError("flac: frame header CRC mismatch")
        pos += 1
        fbps = bps if bps_code == 0 else _BPS_CODES.get(bps_code)
        if fbps is None:
            raise ValueError("flac: reserved sample-size code")
        bitpos = pos * 8
        if ch_code < 8:
            if ch_code + 1 != n_ch:
                raise ValueError("flac: channel count mismatch")
            subs = []
            for _ in range(n_ch):
                s, bitpos = _decode_subframe(fb, bitpos, bs, fbps)
                subs.append(s)
        elif ch_code in (8, 9, 10):
            if n_ch != 2:
                raise ValueError("flac: stereo decorrelation in non-stereo stream")
            # the side subframe carries one extra bit: assignment 9
            # (right/side) puts the side FIRST, 8 and 10 put it second
            bps0 = fbps + (1 if ch_code == 9 else 0)
            bps1 = fbps + (1 if ch_code in (8, 10) else 0)
            a, bitpos = _decode_subframe(fb, bitpos, bs, bps0)
            c, bitpos = _decode_subframe(fb, bitpos, bs, bps1)
            if ch_code == 8:  # left/side: a = left, c = left - right
                subs = [a, a - c]
            elif ch_code == 9:  # right/side: a = side, c = right
                subs = [c + a, c]
            else:  # mid/side
                m = (a << 1) | (c & 1)
                subs = [(m + c) >> 1, (m - c) >> 1]
        else:
            raise ValueError("flac: reserved channel assignment")
        # frame padding to byte boundary, then CRC-16
        pad = (-bitpos) % 8
        if pad and fb.bits[bitpos : bitpos + pad].any():
            raise ValueError("flac: nonzero frame padding")
        pos = (bitpos + pad) // 8
        if pos + 2 > len(b):
            raise ValueError("flac: truncated frame CRC")
        if _crc16(b[frame_start:pos]) != struct.unpack_from(">H", b, pos)[0]:
            raise ValueError("flac: frame CRC mismatch")
        pos += 2
        got.append(np.stack(subs, axis=1))
        n_got += bs
    if total and n_got < total:
        raise ValueError("flac: stream ended early")
    samples = np.concatenate(got, axis=0) if got else np.zeros((0, n_ch), np.int64)
    if total:
        samples = samples[:total]
    if np.any(samples > 32767) or np.any(samples < -32768):
        raise ValueError("flac: sample overflow")
    s16 = samples.astype(np.int16)
    if verify_md5 and md5 != b"\x00" * 16:
        if hashlib.md5(s16.astype("<i2").tobytes()).digest() != md5:
            raise ValueError("flac: stream MD5 mismatch")
    if n_ch == 1:
        return s16[:, 0], rate
    return s16, rate
