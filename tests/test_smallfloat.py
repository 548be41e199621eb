"""SmallFloat byte4 norm encoding — exact-value and property tests.

Known values verified against the reference algorithm
(lucene/core/src/java/org/apache/lucene/util/SmallFloat.java ::
intToByte4/byte4ToInt): 3-bit stored mantissa + implicit bit, 5-bit shift.
"""

import numpy as np
import pytest

from lucene_solr_ray.index.smallfloat import (
    byte4_to_int,
    byte4_to_int_np,
    int_to_byte4,
    int_to_byte4_np,
)

KNOWN = [
    (0, 0), (1, 1), (7, 7),          # subnormal: exact
    (8, 8), (15, 15),                # 4 significant bits: exact
    (16, 16), (17, 16), (18, 17),    # first lossy values
    (255, 47), (1000, 63), (65535, 111),
]


@pytest.mark.parametrize("i,b", KNOWN)
def test_known_values(i, b):
    assert int_to_byte4(i) == b


def test_roundtrip_properties():
    xs = np.arange(0, 200_000)
    bs = int_to_byte4_np(xs)
    dec = byte4_to_int_np(bs)
    # decoded value never exceeds the input, encoding is monotone,
    # re-encoding the decoded value is a fixpoint
    assert (dec <= xs).all()
    assert (np.diff(bs.astype(int)) >= 0).all()
    assert (int_to_byte4_np(dec) == bs).all()
    # exact below 2^4 significant bits boundary behavior
    assert (dec[:16] == xs[:16]).all()


def test_vectorized_matches_scalar():
    xs = np.arange(0, 70_000)
    scal = np.array([int_to_byte4(int(x)) for x in xs], dtype=np.uint8)
    assert (int_to_byte4_np(xs) == scal).all()
    bs = np.arange(256, dtype=np.uint8)
    scal_dec = np.array([byte4_to_int(int(b)) for b in bs])
    assert (byte4_to_int_np(bs) == scal_dec).all()


def test_negative_rejected():
    with pytest.raises(ValueError):
        int_to_byte4(-1)
