"""FOR (Frame-of-Reference) bit-packed block codec — the Lucene84 ForUtil
analog (lucene/core/src/java/org/apache/lucene/codecs/lucene84/ForUtil.java:
128-value blocks packed at the block's max bit width; PForUtil adds outlier
patching, which this implementation omits).

Fully vectorized via np.packbits/np.unpackbits over a (values × width) bit
matrix.  Layout per array:

  varint  n_values
  per full 128-block:   1 byte width, then ceil(128·width/8) payload bytes
  final partial block:  1 byte width, values packed the same way

Used today as the second registered postings codec (codec SPI,
SURVEY.md §2.11); the index pipeline default remains varbyte — switching the
build is a one-line change in merge_bucket once block-aligned access lands
(round 2).  Size/speed vs varbyte is measured in tests.
"""

from __future__ import annotations

import numpy as np

from .codec import BLOCK_SIZE, varbyte_decode, varbyte_encode

__all__ = ["for_encode", "for_decode"]


def _pack_block(vals: np.ndarray) -> bytes:
    """Pack one block (≤ BLOCK_SIZE values) at its max bit width."""
    width = int(vals.max()).bit_length() if vals.size and int(vals.max()) > 0 else 0
    if width == 0:
        return bytes([0])
    # bit matrix: row per value, MSB-first columns
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((vals[:, None].astype(np.uint64) >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return bytes([width]) + np.packbits(bits.ravel()).tobytes()


def _unpack_block(buf: memoryview, off: int, n: int) -> tuple[np.ndarray, int]:
    width = buf[off]
    off += 1
    if width == 0:
        return np.zeros(n, dtype=np.int64), off
    nbytes = (n * width + 7) // 8
    bits = np.unpackbits(np.frombuffer(buf[off : off + nbytes], dtype=np.uint8), count=n * width)
    bits = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    vals = (bits << shifts[None, :]).sum(axis=1)
    return vals.astype(np.int64), off + nbytes


def for_encode(values: np.ndarray) -> bytes:
    """Encode a non-negative int array in bit-packed 128-value blocks."""
    v = np.asarray(values, dtype=np.int64)
    if (v < 0).any():
        raise ValueError("FOR codec requires non-negative values")
    out = [varbyte_encode(np.asarray([v.size], dtype=np.int64))]
    for b in range(0, v.size, BLOCK_SIZE):
        out.append(_pack_block(v[b : b + BLOCK_SIZE].astype(np.uint64)))
    return b"".join(out)


def for_decode(buf: bytes) -> np.ndarray:
    mv = memoryview(buf)
    # varint header: find its end (first byte with high bit clear)
    hdr_len = 1
    while mv[hdr_len - 1] & 0x80:
        hdr_len += 1
    n = int(varbyte_decode(bytes(mv[:hdr_len]), 1)[0])
    out = np.empty(n, dtype=np.int64)
    off = hdr_len
    for b in range(0, n, BLOCK_SIZE):
        cnt = min(BLOCK_SIZE, n - b)
        vals, off = _unpack_block(mv, off, cnt)
        out[b : b + cnt] = vals
    return out
