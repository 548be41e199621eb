"""FLAC codec: writer↔reader round-trips, wild-file decode paths the
writer never emits (crafted frames: stereo decorrelation, LPC, wasted
bits, escape partitions, partition orders), and hostile inputs."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.pipelines.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _rice_bits,
    _signed_bits,
    _utf8_decode,
    _utf8_encode,
    decode_flac,
    encode_flac,
)


def test_roundtrip_mono_tone():
    x = (4000 * np.sin(np.arange(10000) * 0.07)).astype(np.int16)
    b = encode_flac(x, 8000)
    y, rate = decode_flac(b)
    assert rate == 8000
    assert np.array_equal(x, y)
    assert len(b) < x.size * 2  # real compression on tonal content


def test_roundtrip_stereo_and_constant_and_noise():
    rng = np.random.default_rng(3)
    st_ = np.stack(
        [(1500 * np.sin(np.arange(5000) * 0.02)).astype(np.int16),
         np.full(5000, -7, np.int16)], axis=1)
    assert np.array_equal(decode_flac(encode_flac(st_, 44100))[0], st_)
    noise = rng.integers(-32768, 32768, 3000).astype(np.int16)
    assert np.array_equal(decode_flac(encode_flac(noise))[0], noise)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 600), st.integers(0, 2**32 - 1))
def test_roundtrip_fuzz(n, seed):
    rng = np.random.default_rng(seed)
    kind = seed % 3
    if kind == 0:
        x = rng.integers(-32768, 32768, n).astype(np.int16)
    elif kind == 1:
        x = np.cumsum(rng.integers(-40, 41, n)).clip(-32768, 32767).astype(np.int16)
    else:
        x = np.full(n, rng.integers(-32768, 32768), np.int16)
    assert np.array_equal(decode_flac(encode_flac(x))[0], x)


def test_utf8_coded_numbers():
    for n in [0, 1, 127, 128, 2047, 2048, 65535, (1 << 31) - 1, (1 << 36) - 1]:
        got, _ = _utf8_decode(_utf8_encode(n), 0)
        assert got == n
    with pytest.raises(ValueError):
        _utf8_decode(b"\x80", 0)  # bare continuation byte


# ------------------------------------------------ crafted wild-file frames

def _craft(subframe_writer, n_ch, bs, ch_code, rate=8000, total=None):
    """Build a one-frame FLAC stream with hand-written subframes."""
    total = bs if total is None else total
    si = struct.pack(">HH", bs, bs) + b"\x00" * 6
    si += (((rate << 44) | ((n_ch - 1) << 41) | (15 << 36) | total)).to_bytes(8, "big")
    si += b"\x00" * 16  # no MD5 → decoder skips the check
    out = bytearray(b"fLaC") + bytes([0x80]) + len(si).to_bytes(3, "big") + si
    hdr = bytearray(b"\xff\xf8")
    hdr.append((7 << 4) | 0)
    hdr.append((ch_code << 4) | (4 << 1))
    hdr += _utf8_encode(0)
    hdr += struct.pack(">H", bs - 1)
    hdr.append(_crc8(bytes(hdr)))
    w = _BitWriter()
    subframe_writer(w)
    frame = bytes(hdr) + w.tobytes()
    out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def _verbatim(w, x, bps):
    w.write(0, 1); w.write(1, 6); w.write(0, 1)
    w.write_array(_signed_bits(np.asarray(x, np.int64), bps))


def test_stereo_decorrelations_decode():
    l = np.array([100, 120, -50, 7], np.int64)
    r = np.array([90, 115, -60, 7], np.int64)
    # left/side (code 8): ch0=left @16, ch1=side=l-r @17
    b = _craft(lambda w: (_verbatim(w, l, 16), _verbatim(w, l - r, 17)), 2, 4, 8)
    y, _ = decode_flac(b)
    assert np.array_equal(y[:, 0], l) and np.array_equal(y[:, 1], r)
    # right/side (code 9): ch0=side @17, ch1=right @16
    b = _craft(lambda w: (_verbatim(w, l - r, 17), _verbatim(w, r, 16)), 2, 4, 9)
    y, _ = decode_flac(b)
    assert np.array_equal(y[:, 0], l) and np.array_equal(y[:, 1], r)
    # mid/side (code 10): ch0=(l+r)>>1 @16, ch1=l-r @17
    b = _craft(lambda w: (_verbatim(w, (l + r) >> 1, 16), _verbatim(w, l - r, 17)), 2, 4, 10)
    y, _ = decode_flac(b)
    assert np.array_equal(y[:, 0], l) and np.array_equal(y[:, 1], r)


def test_lpc_subframe_decodes():
    # LPC order 1, coef [2], shift 1  ==  prediction (2*prev)>>1 = prev,
    # i.e. equivalent to FIXED order 1 — known-answer check
    x = np.array([10, 13, 11, 11, 20], np.int64)
    resid = np.diff(x)

    def sub(w):
        w.write(0, 1); w.write(32, 6); w.write(0, 1)       # LPC order 1
        w.write_array(_signed_bits(x[:1], 16))             # warmup
        w.write(3, 4)                                      # precision-1 → 4 bits
        w.write(1, 5)                                      # shift 1
        w.write_array(_signed_bits(np.array([2]), 4))      # coef 2
        w.write(0, 2); w.write(0, 4); w.write(4, 4)        # rice method/porder/param
        w.write_array(_rice_bits(resid, 4))

    y, _ = decode_flac(_craft(sub, 1, 5, 0))
    assert np.array_equal(y, x)


def test_wasted_bits_shift():
    x = np.array([4, 8, -12, 16], np.int64)  # all divisible by 4 → 2 wasted bits

    def sub(w):
        w.write(0, 1); w.write(1, 6)       # VERBATIM
        w.write(1, 1)                      # wasted flag
        w.write(1, 2)                      # unary(wasted-1=1): one 0 then a 1
        w.write_array(_signed_bits(x >> 2, 14))

    y, _ = decode_flac(_craft(sub, 1, 4, 0))
    assert np.array_equal(y, x)


def test_escape_partition_and_partition_order():
    x = np.array([5, -3, 2, 9, -1, 0, 4, -8], np.int64)

    def sub(w):
        w.write(0, 1); w.write(8, 6); w.write(0, 1)  # FIXED order 0
        w.write(0, 2)                                # rice method 0
        w.write(1, 4)                                # partition order 1 → 2 partitions
        w.write(15, 4); w.write(5, 5)                # partition 1: ESCAPE, 5 raw bits
        w.write_array(_signed_bits(x[:4], 5))
        p, _ = 2, None
        w.write(p, 4)                                # partition 2: rice(2)
        w.write_array(_rice_bits(x[4:], p))

    y, _ = decode_flac(_craft(sub, 1, 8, 0))
    assert np.array_equal(y, x)


def test_hostile_inputs_raise_valueerror():
    x = (1000 * np.sin(np.arange(600) * 0.1)).astype(np.int16)
    good = encode_flac(x)
    for bad in [
        b"fLaC",                       # truncated metadata
        b"fLaCxxxx",                   # garbage metadata header
        good[:-3],                     # truncated final frame CRC
        good[:40],                     # truncated mid-metadata/frame
    ]:
        with pytest.raises(ValueError):
            decode_flac(bad)
    # corrupt one frame byte → CRC16 (or a parse error upstream), never silence
    raw = bytearray(good)
    raw[60] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac(bytes(raw))
    # corrupt MD5 → stream-level mismatch
    raw = bytearray(good)
    raw[26] ^= 0x01  # inside the STREAMINFO md5 field
    with pytest.raises(ValueError):
        decode_flac(bytes(raw))
    with pytest.raises(ValueError):
        encode_flac(np.zeros(0, np.int16))
    with pytest.raises(ValueError):
        encode_flac(np.zeros(5, np.int32))


def test_truncation_sweep_every_offset_raises_valueerror():
    # the review found struct.error/IndexError escaping at specific
    # truncation offsets — sweep EVERY prefix length of a 3-frame stream
    x = (2500 * np.sin(np.arange(3 * 4096 + 100) * 0.04)).astype(np.int16)
    good = encode_flac(x)
    for cut in range(len(good)):
        try:
            decode_flac(good[:cut])
        except ValueError:
            pass  # the contract
        # any other exception type propagates and fails the test


def test_encode_rate_validation():
    x = np.zeros(10, np.int16)
    for bad in (0, -5, 1 << 20, 655351):
        with pytest.raises(ValueError):
            encode_flac(x, rate=bad)
    assert decode_flac(encode_flac(x, rate=655350))[1] == 655350


def test_non16bit_stream_rejected_before_decoding_frames():
    x = np.zeros(100, np.int16)
    raw = bytearray(encode_flac(x))
    # STREAMINFO packed field: bps-1 lives in bits 36..40 of si[10:18]
    # (absolute bytes 18..26); patch bps 16 -> 24 and fix nothing else:
    # the decoder must reject at STREAMINFO, before any frame parse
    packed = int.from_bytes(raw[18:26], "big")
    packed = (packed & ~(0x1F << 36)) | ((24 - 1) << 36)
    raw[18:26] = packed.to_bytes(8, "big")
    with pytest.raises(ValueError, match="16-bit"):
        decode_flac(bytes(raw))


def test_hostile_lpc_explosion_raises_valueerror():
    # CRC-valid frame, LPC order 1, coef 8192, shift 0: prediction grows
    # geometrically — must raise ValueError, never OverflowError
    def sub(w):
        w.write(0, 1); w.write(32, 6); w.write(0, 1)       # LPC order 1
        w.write_array(_signed_bits(np.array([30000]), 16))  # warmup
        w.write(14, 4)                                     # precision-1 → 15 bits
        w.write(0, 5)                                      # shift 0
        w.write_array(_signed_bits(np.array([8192]), 15))  # coef
        w.write(0, 2); w.write(0, 4); w.write(0, 4)        # rice(0) residuals
        w.write_array(_rice_bits(np.zeros(99, np.int64), 0))

    with pytest.raises(ValueError):
        decode_flac(_craft(sub, 1, 100, 0))


def test_hostile_huge_residuals_raise_valueerror():
    # method-1 escape partition with 31-bit raw residuals far past any
    # conformant stream — the magnitude cap must fire before cumsum wraps
    def sub(w):
        w.write(0, 1); w.write(9, 6); w.write(0, 1)        # FIXED order 1
        w.write_array(_signed_bits(np.array([0]), 16))     # warmup
        w.write(1, 2)                                      # rice method 1
        w.write(0, 4)                                      # partition order 0
        w.write(31, 5)                                     # ESCAPE (5-bit dialect)
        w.write(30, 5)                                     # 30 raw bits/sample
        w.write_array(_signed_bits(np.full(7, (1 << 29) - 1, np.int64), 30))

    with pytest.raises(ValueError):
        decode_flac(_craft(sub, 1, 8, 0))


def test_mutation_fuzz_never_crashes_with_foreign_exceptions():
    # flip random bits/bytes in valid streams: decode must either raise
    # ValueError or return SOMETHING — never any other exception class
    rng = np.random.default_rng(42)
    x = np.stack([
        (3000 * np.sin(np.arange(6000) * 0.05)).astype(np.int16),
        np.cumsum(rng.integers(-30, 31, 6000)).clip(-32768, 32767).astype(np.int16),
    ], axis=1)
    good = encode_flac(x, 22050)
    for _ in range(300):
        raw = bytearray(good)
        for _ in range(int(rng.integers(1, 4))):
            raw[int(rng.integers(0, len(raw)))] ^= int(rng.integers(1, 256))
        try:
            decode_flac(bytes(raw))
        except ValueError:
            pass


def test_random_valid_stream_conformance():
    # randomized crafted frames over the whole decode surface: random
    # subframe types, partition orders, rice params/escapes, wasted bits —
    # decode must reproduce the constructed signal exactly
    rng = np.random.default_rng(7)
    for trial in range(30):
        bs = int(rng.integers(16, 200))
        want = rng.integers(-2000, 2000, bs).astype(np.int64)
        kind = trial % 4

        def sub(w, want=want, bs=bs, kind=kind, rng=rng):
            if kind == 0:  # CONSTANT
                want[:] = want[0]
                w.write(0, 1); w.write(0, 6); w.write(0, 1)
                w.write_array(_signed_bits(want[:1], 16))
            elif kind == 1:  # VERBATIM with wasted bits
                want[:] = (want >> 1) << 1  # make everything even
                w.write(0, 1); w.write(1, 6)
                w.write(1, 1); w.write(1, 1)  # wasted = 1 (unary 0 -> "1")
                w.write_array(_signed_bits(want >> 1, 15))
            else:  # FIXED random order, random partition order / params
                order = int(rng.integers(0, 5))
                if order > bs - 1:
                    order = 0
                resid = np.diff(want, n=order)
                w.write(0, 1); w.write(8 + order, 6); w.write(0, 1)
                w.write_array(_signed_bits(want[:order], 16))
                method = int(rng.integers(0, 2))
                pbits, escape = (4, 15) if method == 0 else (5, 31)
                # partition order with bs % parts == 0 and first >= order
                for po in (2, 1, 0):
                    if bs % (1 << po) == 0 and (bs >> po) > order:
                        break
                w.write(method, 2); w.write(po, 4)
                off = 0
                for p in range(1 << po):
                    cnt = (bs >> po) - (order if p == 0 else 0)
                    part = resid[off : off + cnt]
                    off += cnt
                    if rng.integers(0, 2):  # escape raw
                        # order-4 residuals of +/-2000 samples reach ~32000:
                        # 17 raw bits holds them without truncation
                        w.write(escape, pbits); w.write(17, 5)
                        w.write_array(_signed_bits(part, 17))
                    else:
                        prm = int(rng.integers(0, 10))
                        w.write(prm, pbits)
                        w.write_array(_rice_bits(part, prm))

        got, rate = decode_flac(_craft(sub, 1, bs, 0))
        assert rate == 8000
        assert np.array_equal(got, want), (trial, kind)
