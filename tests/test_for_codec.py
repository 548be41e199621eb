"""FOR bit-packed block codec: round-trip + size/speed vs varbyte."""

import time

import numpy as np
import pytest

from lucene_solr_ray.index import codec
from lucene_solr_ray.index.for_codec import for_decode, for_encode


@pytest.mark.parametrize("n", [0, 1, 127, 128, 129, 1000, 10_000])
def test_roundtrip(n):
    rng = np.random.default_rng(n)
    vals = rng.integers(0, 2**30, size=n)
    assert (for_decode(for_encode(vals)) == vals).all()


def test_roundtrip_deltas_like_postings():
    rng = np.random.default_rng(1)
    docs = np.sort(rng.choice(2**40, size=5000, replace=False)).astype(np.int64)
    deltas = codec.delta_encode(docs)
    out = codec.delta_decode(for_decode(for_encode(deltas)))
    assert (out == docs).all()


def test_zero_and_uniform_blocks():
    assert (for_decode(for_encode(np.zeros(300, dtype=np.int64))) == 0).all()
    v = np.full(129, 7, dtype=np.int64)
    assert (for_decode(for_encode(v)) == v).all()


def test_negative_rejected():
    with pytest.raises(ValueError):
        for_encode(np.array([-1]))


def test_size_vs_varbyte_on_small_gaps():
    """Dense posting deltas (small gaps) pack tighter than varbyte's
    one-byte-per-value floor — the reason Lucene uses FOR blocks."""
    rng = np.random.default_rng(2)
    gaps = rng.integers(1, 30, size=20_000)  # ≤5 bits
    fb = for_encode(gaps)
    vb = codec.varbyte_encode(gaps)
    assert len(fb) < 0.8 * len(vb), (len(fb), len(vb))
    # decode speed sanity (not a benchmark, just "not pathological")
    t0 = time.perf_counter()
    for_decode(fb)
    assert time.perf_counter() - t0 < 0.5
