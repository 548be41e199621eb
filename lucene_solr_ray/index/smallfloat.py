"""Lucene SmallFloat byte4 norm encoding, reimplemented exactly.

Reference semantics: lucene/core/src/java/org/apache/lucene/util/SmallFloat.java
:: intToByte4 / byte4ToInt (Lucene 8.x).  A non-negative int is encoded into a
single byte with 3 stored mantissa bits + 1 implicit bit (4 significant bits)
and a 5-bit exponent; values 0..7 are "subnormal" and encode exactly.  This
lossy byte is what Lucene stores as the per-document length norm, and BM25
scores are computed from the DECODED value — replicating it exactly is
required for score parity (SURVEY.md §7.0).
"""

from __future__ import annotations

import numpy as np

__all__ = ["int_to_byte4", "byte4_to_int", "int_to_byte4_np", "byte4_to_int_np", "LENGTH_TABLE"]


def int_to_byte4(i: int) -> int:
    """Encode a non-negative int into an unsigned byte (0..255)."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    num_bits = int(i).bit_length()
    if num_bits < 4:
        # subnormal value: stored exactly
        return i
    shift = num_bits - 4
    # keep the 4 most significant bits, drop the implicit leading 1
    encoded = (i >> shift) & 0x07
    # exponent, +1 because 0 is reserved for subnormals
    encoded |= (shift + 1) << 3
    if encoded > 255:
        raise ValueError(f"Cannot encode {i} into a byte4")
    return encoded


def byte4_to_int(b: int) -> int:
    """Decode an unsigned byte (0..255) back to the quantized int."""
    bits = b & 0x07
    shift = (b >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


# Lucene BM25Similarity precomputes LENGTH_TABLE[b] = byte4ToInt(b) for all
# 256 byte values (BM25Similarity.java :: LENGTH_TABLE).
LENGTH_TABLE: np.ndarray = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)

_ENCODE_TABLE_MAX = 1 << 20  # doc lengths above this fall back to scalar


def _build_encode_table(n: int) -> np.ndarray:
    vals = np.arange(n, dtype=np.int64)
    num_bits = np.zeros(n, dtype=np.int64)
    nz = vals > 0
    num_bits[nz] = np.floor(np.log2(vals[nz])).astype(np.int64) + 1
    shift = np.maximum(num_bits - 4, 0)
    encoded = np.where(
        num_bits < 4,
        vals,
        ((vals >> shift) & 0x07) | ((shift + 1) << 3),
    )
    return encoded.astype(np.uint8)


_ENCODE_TABLE: np.ndarray = _build_encode_table(65536)


def int_to_byte4_np(arr: np.ndarray) -> np.ndarray:
    """Vectorized int_to_byte4 over an int array (doc lengths)."""
    arr = np.asarray(arr, dtype=np.int64)
    if arr.size and int(arr.max()) >= _ENCODE_TABLE.size:
        # rare huge docs: scalar fallback
        return np.array([int_to_byte4(int(v)) for v in arr], dtype=np.uint8)
    return _ENCODE_TABLE[arr]


def byte4_to_int_np(b: np.ndarray) -> np.ndarray:
    """Vectorized byte4_to_int over a uint8 array."""
    return LENGTH_TABLE[np.asarray(b, dtype=np.uint8)]
