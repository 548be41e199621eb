"""Real audio codec + feature/dedup pipeline oracles."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.pipelines.audio import (
    ALAW_TABLE,
    FRAME,
    RATE,
    ULAW_TABLE,
    audio_features,
    audio_fingerprint32,
    audio_fp_dedup,
    decode_wav,
    encode_wav,
    rms_energy,
    spectral_centroid,
    synth_audio,
    zero_crossing_rate,
)

SF = "/root/testdata/sf0.001"


@settings(max_examples=40, deadline=None)
@given(n=st.integers(1, 3000), seed=st.integers(0, 2**31 - 1), stereo=st.booleans())
def test_wav_round_trip(n, seed, stereo):
    rng = np.random.default_rng(seed)
    shape = (n, 2) if stereo else (n,)
    x = rng.integers(-32768, 32768, size=shape, dtype=np.int16)
    y, rate = decode_wav(encode_wav(x, 44100))
    assert rate == 44100
    assert np.array_equal(x, y)


def test_wav_rejects_and_chunk_walk():
    with pytest.raises(ValueError):
        decode_wav(b"OggSnot a wav")
    # extra chunk between fmt and data must be skipped
    x = np.arange(-5, 5, dtype=np.int16)
    b = encode_wav(x, 8000)
    i = b.index(b"data")
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    patched = b[:i] + extra + b[i:]
    patched = b"RIFF" + (len(patched) - 8 + len(extra)).to_bytes(4, "little") + patched[8:]
    y, _ = decode_wav(patched)
    assert np.array_equal(x, y)
    # non-PCM rejected
    bad = bytearray(encode_wav(x, 8000))
    j = bad.index(b"fmt ")
    bad[j + 8] = 3  # IEEE float codec id
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad))


def test_g711_tables_itu_vectors():
    # Spot values from the public CCITT/Sun G.711 reference expansion
    assert ULAW_TABLE[0x00] == -32124 and ULAW_TABLE[0x80] == 32124
    assert ULAW_TABLE[0xFF] == 0 and ULAW_TABLE[0x7F] == 0  # ±zero codes
    assert ALAW_TABLE[0x55] == -8 and ALAW_TABLE[0xD5] == 8
    assert ALAW_TABLE[0x2A] == -32256 and ALAW_TABLE[0xAA] == 32256
    # Decode tables are sign-symmetric over the code sign bit
    for tbl in (ULAW_TABLE, ALAW_TABLE):
        mags = np.sort(np.abs(tbl[tbl < 0]))
        assert np.array_equal(mags, np.sort(tbl[tbl > 0])[: mags.size])


@pytest.mark.parametrize("codec", ["ulaw", "alaw"])
def test_g711_round_trip_fixed_point(codec):
    tbl = ULAW_TABLE if codec == "ulaw" else ALAW_TABLE
    # every decodable value is a fixed point of decode∘encode
    x = np.unique(tbl).astype(np.int16)
    y, rate = decode_wav(encode_wav(x, 8000, codec=codec))
    assert rate == 8000
    assert np.array_equal(x, y)
    # encode picks the nearest decode value for arbitrary samples
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, size=500, dtype=np.int16)
    dec, _ = decode_wav(encode_wav(s, 8000, codec=codec))
    err = np.abs(dec.astype(np.int64) - s.astype(np.int64))
    best = np.abs(tbl.astype(np.int64)[None, :] - s.astype(np.int64)[:, None]).min(axis=1)
    assert np.array_equal(err, best)
    # stereo interleave survives the 8-bit path
    st2 = rng.integers(-30000, 30000, size=(64, 2), dtype=np.int16)
    d2, _ = decode_wav(encode_wav(st2, 16000, codec=codec))
    assert d2.shape == (64, 2)
    ref, _ = decode_wav(encode_wav(st2.reshape(-1), 16000, codec=codec))
    assert np.array_equal(d2.reshape(-1), ref)
    with pytest.raises(ValueError):
        encode_wav(s, 8000, codec="gsm")


def test_feature_scalar_reference():
    x = synth_audio(4)
    f = x[: (x.size // FRAME) * FRAME].astype(np.float64).reshape(-1, FRAME)
    # RMS per frame
    assert np.allclose(rms_energy(x), np.sqrt((f**2).mean(axis=1)))
    # ZCR of a pure tone ≈ 2·f0/rate; use an integer-bin frequency
    # (437.5 = 14 × 31.25 Hz bins) so spectral leakage doesn't smear the
    # centroid — leakage tails legitimately bias non-integer-bin tones up
    f0 = 437.5
    t = np.arange(FRAME * 8) / RATE
    tone = (10000 * np.sin(2 * np.pi * f0 * t)).astype(np.int16)
    assert abs(zero_crossing_rate(tone).mean() - 2 * f0 / RATE) < 0.01
    assert abs(spectral_centroid(tone, RATE).mean() - f0) < 5.0
    # fingerprint deterministic + fits uint32
    assert audio_fingerprint32(x) == audio_fingerprint32(x)
    assert 0 <= audio_fingerprint32(x) < 2**32


def test_audio_pipelines(ray_session):
    import duckdb

    feats = audio_features(SF)
    n_docs = duckdb.sql(f"SELECT COUNT(*) FROM '{SF}/documents.parquet'").fetchone()[0]
    assert len(feats) == n_docs
    fset = feats.set_index("doc_id")
    for d in range(9, min(int(feats["doc_id"].max()), 90) + 1, 9):
        assert fset.loc[d, "fp32"] == fset.loc[d - 1, "fp32"], d
        assert fset.loc[d, "n_frames"] == fset.loc[d - 1, "n_frames"]
    # silence padding shows up in the ratio
    assert (feats["silence_ratio"] > 0).all()
    assert (feats["silence_ratio"] < 1).all()
    x3 = synth_audio(3)
    assert np.isclose(fset.loc[3, "duration_s"], x3.size / RATE)
    assert fset.loc[3, "fp32"] == audio_fingerprint32(x3)

    dups = audio_fp_dedup(SF)
    planted = {audio_fingerprint32(synth_audio(d)) for d in range(9, n_docs, 9)}
    assert planted <= set(dups["fp32"])
    assert (dups["n"] >= 2).all()


# --------------------------------------------------------------------------
# IMA ADPCM (WAV format 0x11)


def _ima_decode_scalar(data: bytes, block_align: int, n: int) -> np.ndarray:
    """Per-sample reference straight off the IMA spec pseudocode."""
    from lucene_solr_ray.pipelines.audio import _IMA_INDEX, _IMA_STEPS

    out = []
    for b0 in range(0, (len(data) // block_align) * block_align, block_align):
        blk = data[b0 : b0 + block_align]
        pred = int(np.frombuffer(blk[:2], dtype="<i2")[0])
        idx = min(max(blk[2], 0), 88)
        out.append(pred)
        for byte in blk[4:]:
            for nib in (byte & 0xF, byte >> 4):
                step = int(_IMA_STEPS[idx])
                vpdiff = step >> 3
                if nib & 4:
                    vpdiff += step
                if nib & 2:
                    vpdiff += step >> 1
                if nib & 1:
                    vpdiff += step >> 2
                pred = pred - vpdiff if nib & 8 else pred + vpdiff
                pred = min(max(pred, -32768), 32767)
                idx = min(max(idx + int(_IMA_INDEX[nib]), 0), 88)
                out.append(pred)
    return np.array(out[:n], dtype=np.int16)


def test_adpcm_vectorized_matches_scalar_reference():
    from lucene_solr_ray.pipelines.audio import _ADPCM_BLOCK, _adpcm_decode

    rng = np.random.default_rng(0)
    # random VALID blocks: arbitrary nibbles, arbitrary header pred/index
    nb = 5
    blocks = rng.integers(0, 256, nb * _ADPCM_BLOCK, dtype=np.uint8)
    blocks = blocks.reshape(nb, _ADPCM_BLOCK)
    blocks[:, 2] = rng.integers(0, 89, nb)  # valid step index
    blocks[:, 3] = 0
    data = blocks.tobytes()
    n = nb * ((_ADPCM_BLOCK - 4) * 2 + 1) - 7
    got = _adpcm_decode(data, _ADPCM_BLOCK, n)
    want = _ima_decode_scalar(data, _ADPCM_BLOCK, n)
    assert np.array_equal(got, want)


def test_adpcm_wav_round_trip_quality_and_length():
    t = np.arange(4000) / RATE
    x = (9000 * np.sin(2 * np.pi * 440 * t) + 2500 * np.sin(2 * np.pi * 97 * t)).astype(np.int16)
    b = encode_wav(x, codec="adpcm")
    y, rate = decode_wav(b)
    assert rate == RATE and y.dtype == np.int16
    assert y.shape == x.shape  # fact chunk trims block padding exactly
    err = (x.astype(np.float64) - y) ** 2
    snr = 10 * np.log10(x.astype(np.float64).var() / max(err.mean(), 1e-9))
    assert snr > 20.0, snr
    assert np.array_equal(decode_wav(encode_wav(x, codec="adpcm"))[0], y)  # deterministic


def test_adpcm_rejects_and_first_sample_exact():
    x = np.zeros((100, 2), dtype=np.int16)
    with pytest.raises(ValueError):
        encode_wav(x, codec="adpcm")  # stereo
    mono = (np.linspace(-20000, 20000, 1200)).astype(np.int16)
    y, _ = decode_wav(encode_wav(mono, codec="adpcm"))
    spb = (256 - 4) * 2 + 1
    assert y[0] == mono[0]  # block header carries sample 0 verbatim
    if mono.size > spb:
        assert y[spb] == mono[spb]


def test_odd_g711_data_chunk_gets_riff_pad_byte():
    import struct

    x = (np.sin(np.arange(501) / 5.0) * 8000).astype(np.int16)
    w = encode_wav(x, codec="ulaw")
    assert len(w) % 2 == 0  # RIFF word alignment
    # a chunk appended after data must still be walkable
    w2 = w + b"LIST" + struct.pack("<I", 4) + b"INFO"
    y, rate = decode_wav(w2)
    assert rate == 8000 and y.shape == (501,)


def test_vad_segments_vs_naive_reference():
    import numpy as np
    from lucene_solr_ray.pipelines.audio import FRAME, rms_energy, vad_segments

    rng = np.random.default_rng(11)
    # silence | tone | 1-frame gap (merges at min_gap=2) | tone | long gap | tone
    def tone(nf):
        return (9000 * np.sin(np.arange(nf * FRAME) * 0.3)).astype(np.int16)
    sil = lambda nf: np.zeros(nf * FRAME, np.int16)
    x = np.concatenate([sil(3), tone(4), sil(1), tone(2), sil(6), tone(3), sil(1)])

    got = vad_segments(x, min_gap=2)
    # naive reference: scalar loop over frames
    thresh = 32768.0 * (10.0 ** (-30.0 / 20.0))
    e = rms_energy(x)
    active = [i for i in range(e.size) if e[i] >= thresh]
    segs, cur = [], None
    for i in active:
        if cur is None:
            cur = [i, i + 1]
        elif i - (cur[1] - 1) <= 2:
            cur[1] = i + 1
        else:
            segs.append(cur); cur = [i, i + 1]
    if cur is not None:
        segs.append(cur)
    assert got.tolist() == segs
    # the 2-frame gap merged, the 6-frame gap did not
    assert len(segs) == 2


def test_audio_vad_segments_pipeline(ray_session):
    from lucene_solr_ray.pipelines.audio import audio_vad_segments

    out = audio_vad_segments("/root/testdata/sf0.001")
    # every doc has voiced content, and the leading silence pad means no
    # segment starts at 0.0
    assert out["doc_id"].nunique() == 500
    assert (out["start_s"] > 0).all()
    assert (out["end_s"] > out["start_s"]).all()
    # planted duplicates (doc 9k == doc 9k-1) segment identically
    import pandas as pd
    for d in (9, 18, 27):
        a = out[out["doc_id"] == d][["seg", "start_s", "end_s"]].reset_index(drop=True)
        b = out[out["doc_id"] == d - 1][["seg", "start_s", "end_s"]].reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_wav_mutation_and_truncation_contract():
    import numpy as np
    from lucene_solr_ray.pipelines.audio import decode_audio, encode_wav

    rng = np.random.default_rng(9)
    x = (3000 * np.sin(np.arange(3000) * 0.05)).astype(np.int16)
    for codec in ("pcm16", "ulaw", "alaw", "adpcm"):
        good = encode_wav(x, 8000, codec=codec)
        for _ in range(100):
            raw = bytearray(good)
            for _ in range(int(rng.integers(1, 4))):
                raw[int(rng.integers(0, len(raw)))] ^= int(rng.integers(1, 256))
            try:
                decode_audio(bytes(raw))  # WAV has no CRC; success is fine
            except (ValueError, NotImplementedError):
                pass
        for cut in range(0, len(good), max(1, len(good) // 40)):
            try:
                decode_audio(good[:cut])  # struct.error used to escape (adpcm)
            except (ValueError, NotImplementedError):
                pass
