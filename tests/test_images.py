"""Real image codec + decode/resize/hash/dedup pipeline oracles."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.pipelines.images import (
    ahash64,
    decode_bmp,
    decode_image_bytes,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    image_ahash_dedup,
    image_features,
    luminance,
    resize_nearest,
    synth_image,
)

SF = "/root/testdata/sf0.001"


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 23),
    w=st.integers(1, 23),
    seed=st.integers(0, 2**31 - 1),
)
def test_codec_round_trip(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    assert np.array_equal(decode_image_bytes(encode_bmp(img)), img)
    assert np.array_equal(decode_image_bytes(encode_ppm(img)), img)


def test_decode_rejects_and_dispatches():
    with pytest.raises(ValueError):
        decode_bmp(b"XXnot a bmp")
    # JPEG and lossless WebP now decode for real (pipelines/jpeg.py,
    # pipelines/webp.py); lossy VP8 stays the codec integration point
    from lucene_solr_ray.pipelines.jpeg import encode_jpeg
    from lucene_solr_ray.pipelines.webp import encode_webp

    assert decode_image_bytes(encode_jpeg(np.full((8, 8, 3), 9, np.uint8))).shape == (8, 8, 3)
    assert decode_image_bytes(encode_webp(np.full((8, 8, 3), 9, np.uint8))).shape == (8, 8, 3)
    with pytest.raises(NotImplementedError):
        decode_image_bytes(b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00abcd")
    # wrong bpp rejected, not garbage-decoded
    img = np.zeros((2, 2, 3), np.uint8)
    b = bytearray(encode_bmp(img))
    b[28] = 8  # claim 8bpp
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(b))


def test_resize_and_hash_reference():
    img = synth_image(5)
    small = resize_nearest(img, 8, 8)
    # scalar reference for nearest-neighbor
    h, w = img.shape[:2]
    for r in range(8):
        for c in range(8):
            assert (small[r, c] == img[(r * h) // 8, (c * w) // 8]).all()
    # ahash matches a scalar recomputation and is int64-ranged
    lum = luminance(small)
    bits = (lum > lum.mean()).reshape(64)
    want = 0
    for b in bits:
        want = (want << 1) | int(b)
    want -= 1 << 63
    assert ahash64(img) == want
    assert -(2**63) <= ahash64(img) < 2**63


def test_image_pipelines(ray_session):
    feats = image_features(SF)
    import duckdb

    n_docs = duckdb.sql(f"SELECT COUNT(*) FROM '{SF}/documents.parquet'").fetchone()[0]
    assert len(feats) == n_docs
    # every 7th doc is a planted duplicate of its predecessor
    f = feats.set_index("doc_id")
    for d in range(7, min(int(feats["doc_id"].max()), 70) + 1, 7):
        assert f.loc[d, "ahash"] == f.loc[d - 1, "ahash"], d
        assert f.loc[d, "height"] == f.loc[d - 1, "height"]
    # feature values match a direct decode of the synthetic corpus
    img3 = synth_image(3)
    assert f.loc[3, "height"] == img3.shape[0] and f.loc[3, "width"] == img3.shape[1]
    assert f.loc[3, "ahash"] == ahash64(img3)
    thumb = resize_nearest(img3, 16, 16).reshape(-1, 3).mean(axis=0)
    assert np.isclose(f.loc[3, "mean_r"], thumb[0])

    dups = image_ahash_dedup(SF)
    planted = {ahash64(synth_image(d)) for d in range(7, n_docs, 7)}
    assert planted <= set(dups["ahash"])  # every planted pair found
    assert (dups["n"] >= 2).all()
    # determinism
    import pandas as pd

    pd.testing.assert_frame_equal(dups, image_ahash_dedup(SF))


@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.integers(0, 10**6),
    st.sampled_from([3, 4]),
    st.integers(0, 4),
)
@settings(max_examples=60, deadline=None)
def test_png_round_trip(h, w, seed, channels, filter_type):
    """PNG encode→decode is bit-exact for RGB and RGBA across all five
    scanline filters (the sequential unfilter path is the decode-side
    counterpart of the vectorized encoder)."""
    from lucene_solr_ray.pipelines.images import decode_png, encode_png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, channels), dtype=np.uint8)
    assert (decode_png(encode_png(img, filter_type=filter_type)) == img).all()


def test_png_spec_vector_and_rejections():
    """Decode a PNG assembled BY HAND from the spec (not via encode_png) —
    an independent reference vector; unsupported shapes raise to the
    integration point."""
    import struct
    import zlib

    import pytest

    from lucene_solr_ray.pipelines.images import decode_png
    from lucene_solr_ray.pipelines.multimodal import decode_image

    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(
            ">I", zlib.crc32(typ + data) & 0xFFFFFFFF
        )

    # 2×1 RGB image: red pixel then blue pixel, filter byte 0 per row
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"\x00" + bytes([255, 0, 0, 0, 0, 255]))
    png = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    out = decode_png(png)
    assert out.shape == (1, 2, 3)
    assert out[0, 0].tolist() == [255, 0, 0] and out[0, 1].tolist() == [0, 0, 255]
    assert (decode_image(png) == out).all()  # multimodal seam dispatches PNG

    # 16-bit depth → NotImplementedError (stays an integration point)
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    png16 = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16) + chunk(b"IDAT", zlib.compress(b"\x00" + b"\x00" * 6)) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(png16)
    with pytest.raises(NotImplementedError):
        # lossy-VP8 WebP: still a seam (lossless VP8L decodes for real)
        decode_image(b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00abcd")


def test_codec_error_contract_mutation_sweep():
    """Flip random bits in valid payloads across ALL six image codecs:
    decode must raise ValueError or NotImplementedError only (the
    richdoc/flac single-catchable-class contract) — a sweep before the
    fix had zlib.error escaping PNG on 248/250 corruptions and KeyError/
    IndexError/OverflowError escaping JPEG."""
    import numpy as np
    from lucene_solr_ray.pipelines.images import (
        decode_image_bytes, encode_bmp, encode_png, encode_ppm,
    )
    from lucene_solr_ray.pipelines.jpeg import decode_jpeg, encode_jpeg
    from lucene_solr_ray.pipelines.webp import decode_webp, encode_webp
    from lucene_solr_ray.pipelines.gif import decode_gif, encode_gif

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
    gimg = (img // 86 * 86).astype(np.uint8)  # <=256 colors for GIF
    cases = [
        (encode_bmp(img), decode_image_bytes),
        (encode_ppm(img), decode_image_bytes),
        (encode_png(img), decode_image_bytes),
        (encode_jpeg(img), decode_jpeg),
        (encode_webp(img), decode_webp),
        (encode_gif(gimg), decode_gif),
    ]
    for good, dec in cases:
        for _ in range(120):
            raw = bytearray(good)
            for _ in range(int(rng.integers(1, 4))):
                raw[int(rng.integers(0, len(raw)))] ^= int(rng.integers(1, 256))
            try:
                dec(bytes(raw))
            except (ValueError, NotImplementedError):
                pass
        for cut in range(0, len(good), max(1, len(good) // 40)):
            try:
                dec(good[:cut])
            except (ValueError, NotImplementedError):
                pass


def test_phash_robustness_vs_ahash():
    import numpy as np
    from lucene_solr_ray.pipelines.images import ahash64, phash64, synth_image

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    rng = np.random.default_rng(13)
    img = synth_image(5)
    assert phash64(img) == phash64(img)  # deterministic
    # mild noise + brightness scale: pHash stays close
    noisy = np.clip(
        img.astype(np.int16) + rng.integers(-8, 9, img.shape), 0, 255
    ).astype(np.uint8)
    dimmed = (img.astype(np.float64) * 0.85).astype(np.uint8)
    assert ham(phash64(img), phash64(noisy)) <= 10
    assert ham(phash64(img), phash64(dimmed)) <= 10
    # a different image is far
    other = synth_image(11)
    assert ham(phash64(img), phash64(other)) >= 16


def test_image_phash_dedup_pipeline(ray_session):
    from lucene_solr_ray.pipelines.images import (
        image_phash_dedup, phash64, synth_image,
    )

    out = image_phash_dedup("/root/testdata/sf0.001")
    planted = {phash64(synth_image(d)) for d in range(7, 490, 7)}
    assert planted <= set(out["phash"])
    assert (out["n"] >= 2).all()
