"""Baseline JPEG codec (pipelines/jpeg.py) — the compressed-media seam
behind multimodal.decode_image, proved the same way the PNG codec was:
round-trips, spec boundaries, planted-dup aHash through the lossy cycle."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.pipelines.jpeg import decode_jpeg, encode_jpeg


def _mae(a, b):
    return float(np.abs(a.astype(int) - b.astype(int)).mean())


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    q=st.integers(80, 100),
    seed=st.integers(0, 2**31),
    gray=st.booleans(),
)
def test_roundtrip_tolerance(h, w, q, seed, gray):
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=q))
    assert out.shape == img.shape and out.dtype == np.uint8
    # lossy, but bounded even on pure noise.  Sub-block images (< 8×8)
    # are edge-replicated to a full DCT block, so a handful of saturated
    # noise pixels can see much larger per-pixel chroma error (measured
    # 2×2 worst ≈ 42 over 20k trials); full blocks stay under 24.
    assert _mae(out, img) < (24 if h * w >= 64 else 56)


def test_smooth_images_near_exact():
    x, y = np.meshgrid(np.linspace(0, 255, 64), np.linspace(255, 0, 48))
    img = np.stack([x, y, (x + y) / 2], axis=-1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert _mae(out, img) < 1.5
    solid = np.full((24, 24, 3), 77, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(solid, 95)), solid)


def test_determinism_and_restart_markers():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (33, 50, 3), dtype=np.uint8)
    b = encode_jpeg(img, quality=92)
    assert b == encode_jpeg(img, quality=92)  # byte-stable
    base = decode_jpeg(b)
    for ri in (1, 2, 5):
        br = encode_jpeg(img, quality=92, restart_interval=ri)
        assert b"\xff\xdd" in br  # DRI emitted
        # identical quantized coefficients -> identical pixels
        assert np.array_equal(decode_jpeg(br), base)


def test_spec_boundaries_raise():
    img = np.full((8, 8, 3), 99, np.uint8)
    b = encode_jpeg(img)
    with pytest.raises(NotImplementedError):  # progressive
        decode_jpeg(b.replace(b"\xff\xc0", b"\xff\xc2", 1))
    # 12-bit precision: patch the SOF0 precision byte (subsampled scans
    # decode for real since r5 — test_420_subsampled_roundtrip covers them)
    sof = b.index(b"\xff\xc0")
    bad = bytearray(b)
    assert bad[sof + 4] == 8  # SOF0: marker(2) len(2) precision(1)
    bad[sof + 4] = 12
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(bad))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_decode_image_dispatch_and_ahash_dedup():
    """A JPEG payload flows through the multimodal seam, and near-dup
    aHash survives the lossy cycle (the planted-dup contract)."""
    from lucene_solr_ray.pipelines.images import ahash64, synth_image
    from lucene_solr_ray.pipelines.multimodal import decode_image

    for doc_id in (0, 7, 14):
        img = synth_image(doc_id)
        out = decode_image(encode_jpeg(img, quality=95))
        assert out.shape == img.shape
        a, b = ahash64(img), ahash64(out)
        assert bin(a ^ b).count("1") <= 4  # hamming-near through the codec


def test_external_table_parse_path():
    """Decoder reads DQT/DHT from the FILE: re-encode with a non-default
    quality (different quant tables) and confirm the parsed tables drive
    dequantization — wrong tables would blow the error way past bound."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    lo = decode_jpeg(encode_jpeg(img, quality=30))
    hi = decode_jpeg(encode_jpeg(img, quality=98))
    assert _mae(hi, img) < _mae(lo, img)  # quality knob flows end to end


def test_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker —
    the segment walk must skip them, not read padding as a length."""
    img = synth_like = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    raw = encode_jpeg(img, quality=90)
    # inject extra FF pads before the first few markers after SOI
    padded = bytearray(raw[:2])
    rest = raw[2:]
    padded += b"\xff" + rest  # one pad before the first marker
    out = decode_jpeg(bytes(padded))
    assert np.array_equal(out, decode_jpeg(raw))


def test_encode_rejects_wrong_channels():
    """RGBA (or any non-3 channel count) is rejected, matching the
    BMP/PPM convention — never silently dropped."""
    import pytest

    rgba = np.zeros((8, 8, 4), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_jpeg(rgba)
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((8, 8, 1), dtype=np.uint8))


def test_420_subsampled_roundtrip():
    """4:2:0 encode → decode: shapes survive odd dims, luma is untouched
    by the chroma subsample (chroma-flat images round-trip identically to
    4:4:4), and smooth chroma stays close."""
    rng = np.random.default_rng(5)
    for shape in [(16, 16, 3), (17, 23, 3), (8, 8, 3), (33, 31, 3), (40, 24, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
        assert out.shape == img.shape
    g = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    flat = np.stack([g, g, g], -1)  # constant chroma
    d444 = decode_jpeg(encode_jpeg(flat, quality=90))
    d420 = decode_jpeg(encode_jpeg(flat, quality=90, subsample=True))
    assert np.array_equal(d444, d420)  # the MCU interleave changes nothing
    x = np.linspace(0, 255, 64)
    grad = np.stack(np.meshgrid(x, x), -1).sum(-1) / 2
    img = np.stack([grad, grad * 0.8, grad * 0.5], -1).astype(np.uint8)
    assert _mae(img, decode_jpeg(encode_jpeg(img, quality=92, subsample=True))) < 2.0


def test_420_restart_intervals():
    """DRI/RSTn resync under 4:2:0 MCUs (16×16 tiles)."""
    x = np.linspace(0, 255, 48)
    g = np.stack(np.meshgrid(x, x), -1).sum(-1) / 2
    img = np.stack([g, g * 0.7, g * 0.4], -1).astype(np.uint8)
    a = decode_jpeg(encode_jpeg(img, quality=85, subsample=True))
    b = decode_jpeg(encode_jpeg(img, quality=85, subsample=True, restart_interval=2))
    assert np.array_equal(a, b)  # restarts change framing, not pixels


def test_single_component_scan_ignores_sampling_factors():
    # T.81 A.2.2: Ns=1 scans are non-interleaved — a grayscale file whose
    # SOF declares 2x2 sampling must decode identically to the 1x1 file.
    import struct

    rng = np.random.default_rng(7)
    gray = (rng.integers(0, 64, (24, 16)) + 96).astype(np.uint8)
    b = encode_jpeg(gray)
    patched = bytearray(b)
    i = 2
    while i < len(b):
        m, ln = b[i + 1], struct.unpack_from(">H", b, i + 2)[0]
        if m == 0xC0:
            assert patched[i + 9] == 1  # grayscale SOF
            patched[i + 10 + 1] = 0x22
            break
        i += 2 + ln
    assert np.array_equal(decode_jpeg(bytes(patched)), decode_jpeg(b))
