"""GIF codec: LZW round-trips (incl. width growth + table-full clears),
interlace, transparency, animation compositing with disposal methods,
container rejects, and the multimodal dispatch route."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.pipelines.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)


def _pal_img(h, w, ncolors, seed):
    rng = np.random.default_rng(seed)
    colors = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    return colors[rng.integers(0, ncolors, (h, w))]


def _rt(img, **kw):
    out = decode_gif(encode_gif(img, **kw))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.array_equal(out, img)
    return out


@settings(max_examples=40, deadline=None)
@given(mcs=st.integers(2, 8), n=st.integers(0, 4000), seed=st.integers(0, 2**31))
def test_lzw_roundtrip(mcs, n, seed):
    rng = np.random.default_rng(seed)
    # skewed alphabet → long matches → exercises width growth
    idx = np.minimum(rng.geometric(0.3, size=n) - 1, (1 << mcs) - 1).astype(np.uint8)
    enc = _lzw_encode(idx, mcs)
    dec = _lzw_decode(enc, mcs, n)
    assert np.array_equal(dec, idx)


def test_lzw_table_full_clears():
    # incompressible 8-bit stream long enough to fill the 4096-entry table
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 256, 60_000, dtype=np.uint8)
    assert np.array_equal(_lzw_decode(_lzw_encode(idx, 8), 8, idx.size), idx)


@settings(max_examples=25, deadline=None)
@given(h=st.integers(1, 21), w=st.integers(1, 23), nc=st.integers(1, 256), seed=st.integers(0, 2**31))
def test_roundtrip_plain(h, w, nc, seed):
    _rt(_pal_img(h, w, nc, seed))


@pytest.mark.parametrize("h", [1, 2, 5, 8, 9, 17])
def test_roundtrip_interlaced(h):
    img = _pal_img(h, 13, 30, h)
    _rt(img, interlace=True)


def test_roundtrip_transparency():
    img = np.dstack([_pal_img(9, 11, 20, 3), np.full((9, 11), 255, np.uint8)])
    img[2:5, 3:7, 3] = 0  # transparent window
    out = decode_gif(encode_gif(img))
    assert out.shape == (9, 11, 4)
    assert (out[2:5, 3:7, 3] == 0).all()
    opaque = img[:, :, 3] == 255
    assert np.array_equal(out[opaque][:, :3], img[opaque][:, :3])


def test_animation_frames_and_disposal():
    base = _pal_img(10, 10, 12, 7)
    f2 = base.copy()
    f2[:5] = base[5:]
    frames = [base, f2, base]
    b = encode_gif(frames, delay_cs=10)
    got = decode_gif_frames(b)
    assert len(got) == 3
    for want, g in zip(frames, got):
        assert (g[:, :, 3] == 255).all()
        assert np.array_equal(g[:, :, :3], want)


def test_disposal_restore_background_and_previous():
    # hand-build: full base frame, then 2×2 patches with disposal 2
    # (restore-to-transparent), disposal 3 (restore-previous), and a final
    # full-transparent probe frame that reveals what each disposal left
    from lucene_solr_ray.pipelines.gif import _lzw_encode, _sub_blocks

    pal = np.array([[10, 20, 30], [200, 100, 0], [0, 0, 200], [255, 255, 255]], np.uint8)
    out = bytearray(b"GIF89a" + struct.pack("<HHBBB", 6, 6, 0x81, 0, 0) + pal.tobytes())
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 6, 6, 0) + bytes([2])
    out += _sub_blocks(_lzw_encode(np.zeros(36, dtype=np.uint8), 2))
    for disposal in (2, 3):
        out += b"\x21\xf9\x04" + bytes([disposal << 2]) + b"\x00\x00\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0) + bytes([2])
        out += _sub_blocks(_lzw_encode(np.ones(4, dtype=np.uint8), 2))
    # probe: full-screen frame of transparent index 3 (GCE transparent flag)
    out += b"\x21\xf9\x04" + bytes([1]) + b"\x00\x00\x03\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 6, 6, 0) + bytes([2])
    out += _sub_blocks(_lzw_encode(np.full(36, 3, dtype=np.uint8), 2))
    out += b"\x3b"
    frames = decode_gif_frames(bytes(out))
    assert len(frames) == 4
    base_rgb, patch_rgb = pal[0], pal[1]
    assert (frames[0][:, :, 3] == 255).all() and (frames[0][:, :, :3] == base_rgb).all()
    assert (frames[1][1:3, 1:3, :3] == patch_rgb).all()  # patch drawn
    # disposal 2 cleared the rect to transparent; frame 3 redrew the patch
    assert (frames[2][1:3, 1:3, :3] == patch_rgb).all()
    assert (frames[2][0, :, :3] == base_rgb).all()
    # disposal 3 restored the rect to its pre-frame (transparent) state;
    # the transparent probe frame shows through to it
    assert (frames[3][1:3, 1:3, 3] == 0).all()
    assert (frames[3][0, :, :3] == base_rgb).all() and (frames[3][0, :, 3] == 255).all()


def test_rejects():
    img = _pal_img(4, 4, 5, 1)
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    with pytest.raises(ValueError):
        encode_gif(img.astype(np.int32))
    with pytest.raises(ValueError):
        encode_gif([])
    with pytest.raises(ValueError):
        encode_gif([img, _pal_img(5, 4, 5, 1)])  # size mismatch
    many = np.arange(2 * 300 * 3, dtype=np.uint8).reshape(2, 300, 3)
    many[1] = 255 - many[0]
    if len(np.unique(many.reshape(-1, 3), axis=0)) > 256:
        with pytest.raises(ValueError):
            encode_gif(many)
    b = encode_gif(img)
    with pytest.raises(ValueError):
        decode_gif(b[:20])  # truncated


def test_synth_gif_frames_decode_exactly():
    from lucene_solr_ray.pipelines.gif import synth_gif, synth_gif_frames

    for d in [0, 1, 4, 5, 7, 13, 28, 101]:
        want = synth_gif_frames(d)
        got = decode_gif_frames(synth_gif(d))
        assert len(got) == len(want) == 2 + d % 4
        for wf, gf in zip(want, got):
            assert (gf[:, :, 3] == 255).all()
            assert np.array_equal(gf[:, :, :3], wf)


def test_multimodal_route_and_magic():
    from lucene_solr_ray.pipelines.multimodal import decode_image

    img = _pal_img(7, 9, 40, 2)
    b = encode_gif(img)
    assert b[:6] == b"GIF89a"
    assert np.array_equal(decode_image(b), img)


def test_frame_rect_overhanging_screen_is_clipped():
    import struct

    img = np.zeros((6, 6, 3), np.uint8)
    img[:, :, 0] = 200
    raw = bytearray(encode_gif([img]))
    i = 13
    if raw[10] & 0x80:
        i += 3 * (2 << (raw[10] & 7))
    while raw[i] != 0x2C:
        assert raw[i] == 0x21
        i += 2
        while raw[i]:
            i += 1 + raw[i]
        i += 1
    struct.pack_into("<H", raw, i + 1, 5)  # left=5, w stays 6 → overhangs
    f = decode_gif_frames(bytes(raw))[0]
    assert f.shape[:2] == (6, 6)
    # visible 1-px strip painted, rest of canvas untouched (background 0)
    assert (f[:, 5, 0] == 200).all()
