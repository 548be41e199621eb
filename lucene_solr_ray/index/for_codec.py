"""FOR / PFOR bit-packed block codec — the Lucene84 ForUtil/PForUtil analog
(lucene/core/src/java/org/apache/lucene/codecs/lucene84/ForUtil.java,
PForUtil.java: 128-value blocks packed at a chosen bit width; PFOR patches
up to 7 outliers per block, storing their positions and high bits
separately so a few large values don't inflate the whole block's width).

Fully vectorized via np.packbits/np.unpackbits over a (values × width) bit
matrix.  Layout per array:

  varint  n_values
  per block (≤128 values):
    1 byte width | 1 byte n_exceptions | 1 byte high-bytes length
    n_exceptions bytes  exception positions (within block)
    varbyte             exception high parts (value >> width)
    ceil(n·width/8)     packed low bits

  (the high-bytes length makes the decode's header walk pure arithmetic;
  all blocks' exception varbytes then decode in ONE batched call)

Registered as the second postings codec (codec SPI, SURVEY.md §2.11) and
selectable at build time via `build_index(codec="for")`.
"""

from __future__ import annotations

import numpy as np

from .codec import BLOCK_SIZE, varbyte_decode, varbyte_encode, varbyte_lengths

__all__ = ["for_encode", "for_decode"]

MAX_EXCEPTIONS = 7  # PForUtil.MAX_EXCEPTIONS


def _choose_width(vals: np.ndarray) -> tuple[int, np.ndarray]:
    """PFOR width selection: the smallest width such that at most
    MAX_EXCEPTIONS values overflow it AND patching saves bytes vs plain
    FOR.  → (width, exception_positions)."""
    mx = int(vals.max()) if vals.size else 0
    full = mx.bit_length()
    if full == 0:
        return 0, np.empty(0, dtype=np.int64)
    bl = np.zeros(vals.size, dtype=np.int64)
    nz = vals > 0
    if nz.any():
        bl[nz] = np.floor(np.log2(vals[nz].astype(np.float64))).astype(np.int64) + 1
    best_w, best_cost, best_exc = full, (vals.size * full + 7) // 8, np.empty(0, dtype=np.int64)
    for w in range(full - 1, 0, -1):
        exc = np.flatnonzero(bl > w)
        if exc.size > MAX_EXCEPTIONS:
            break
        high = (vals[exc] >> np.uint64(w)).astype(np.int64)
        cost = (vals.size * w + 7) // 8 + exc.size + int(varbyte_lengths(high).sum() if exc.size else 0)
        if cost < best_cost:
            best_w, best_cost, best_exc = w, cost, exc
    return best_w, best_exc


def _pack_block(vals: np.ndarray) -> bytes:
    """Pack one block (≤ BLOCK_SIZE values), PFOR-patching outliers."""
    width, exc = _choose_width(vals)
    if width == 0:
        return bytes([0, 0, 0])
    high = (vals[exc] >> np.uint64(width)).astype(np.int64)
    low = vals.copy()
    if exc.size:
        low[exc] = vals[exc] & np.uint64((1 << width) - 1)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((low[:, None].astype(np.uint64) >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    high_b = varbyte_encode(high) if exc.size else b""
    head = bytes([width, exc.size, len(high_b)]) + bytes(exc.astype(np.uint8).tobytes()) + high_b
    return head + np.packbits(bits.ravel()).tobytes()


def _unpack_block(buf: memoryview, off: int, n: int) -> tuple[np.ndarray, int]:
    width = buf[off]
    n_exc = buf[off + 1]
    high_len = buf[off + 2]
    off += 3
    if width == 0:
        return np.zeros(n, dtype=np.int64), off
    exc = np.frombuffer(buf[off : off + n_exc], dtype=np.uint8).astype(np.int64)
    off += n_exc
    if n_exc:
        high = varbyte_decode(bytes(buf[off : off + high_len]), n_exc)
        off += high_len
    nbytes = (n * width + 7) // 8
    bits = np.unpackbits(np.frombuffer(buf[off : off + nbytes], dtype=np.uint8), count=n * width)
    bits = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    vals = (bits << shifts[None, :]).sum(axis=1).astype(np.int64)
    if n_exc:
        vals[exc] |= high << np.int64(width)
    return vals, off + nbytes


def for_encode(values: np.ndarray) -> bytes:
    """Encode a non-negative int array in PFOR-patched 128-value blocks."""
    v = np.asarray(values, dtype=np.int64)
    if (v < 0).any():
        raise ValueError("FOR codec requires non-negative values")
    out = [varbyte_encode(np.asarray([v.size], dtype=np.int64))]
    for b in range(0, v.size, BLOCK_SIZE):
        out.append(_pack_block(v[b : b + BLOCK_SIZE].astype(np.uint64)))
    return b"".join(out)


def _extract_packed(raw_pad: np.ndarray, bit_offsets: np.ndarray, width: int) -> np.ndarray:
    """Vectorized bit-field extraction: for each value, gather the 8-byte
    window containing its bits (MSB-first packbits layout), view as
    big-endian u64, shift + mask.  One gather + one shift per value — the
    wide-batch unpack that replaces the per-bit unpackbits matrix (≈3×
    faster, the r2 'FOR decode 3.7× slower than varbyte' fix).  Requires
    width ≤ 56 (so the field plus its ≤7 leading remainder bits fits one
    64-bit window); callers fall back to unpackbits above that."""
    byte_off = (bit_offsets >> 3).astype(np.int64)
    rem = (bit_offsets & 7).astype(np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(raw_pad, 8)[byte_off]
    w64 = np.ascontiguousarray(win).view(">u8")[:, 0].astype(np.uint64)
    mask = np.uint64((1 << width) - 1)
    return ((w64 >> (np.uint64(64 - width) - rem)) & mask).astype(np.int64)


def for_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode: one cheap header walk collects (width, offsets, patches),
    then ALL full blocks of the same width unpack in a single vectorized
    np.unpackbits pass (the per-block Python work is header-sized only)."""
    mv = memoryview(buf)
    raw = np.frombuffer(buf, dtype=np.uint8)
    # varint header: find its end (first byte with high bit clear)
    hdr_len = 1
    while mv[hdr_len - 1] & 0x80:
        hdr_len += 1
    n = int(varbyte_decode(bytes(mv[:hdr_len]), 1)[0])
    if count is not None and n != count:
        raise ValueError(f"decoded {n} values, expected {count}")
    out = np.zeros(n, dtype=np.int64)
    off = hdr_len
    # header walk (pure arithmetic): group full blocks by width; exception
    # byte ranges are COLLECTED and decoded in one batched varbyte pass
    by_width: dict[int, list[tuple[int, int]]] = {}
    exc_meta: list[tuple[int, int, int, int, int]] = []  # (b, width, n_exc, hi_off, hi_len)
    tail: tuple[int, int, int] | None = None
    for b in range(0, n, BLOCK_SIZE):
        cnt = min(BLOCK_SIZE, n - b)
        width = mv[off]
        n_exc = mv[off + 1]
        high_len = mv[off + 2]
        off += 3
        if n_exc:
            exc_meta.append((b, width, n_exc, off + n_exc, high_len))
            off += n_exc + high_len
        if width:
            nbytes = (cnt * width + 7) // 8
            if cnt == BLOCK_SIZE:
                by_width.setdefault(width, []).append((b, off))
            else:
                tail = (b, off, width)
            off += nbytes
    patches: list[tuple[int, np.ndarray, np.ndarray]] = []
    if exc_meta:
        hi_idx = np.concatenate(
            [np.arange(ho, ho + hl, dtype=np.int64) for _, _, _, ho, hl in exc_meta]
        )
        all_high = varbyte_decode(raw[hi_idx].tobytes())
        counts = np.asarray([ne for _, _, ne, _, _ in exc_meta], dtype=np.int64)
        offs = np.zeros(counts.size + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        for i, (b, width, ne, ho, hl) in enumerate(exc_meta):
            exc = np.frombuffer(mv[ho - ne : ho], dtype=np.uint8).astype(np.int64)
            patches.append((b, exc, all_high[offs[i] : offs[i + 1]] << np.int64(width)))
    raw_pad: np.ndarray | None = None  # zero-padded copy for 8-byte windows

    def padded() -> np.ndarray:
        nonlocal raw_pad
        if raw_pad is None:
            raw_pad = np.concatenate([raw, np.zeros(8, dtype=np.uint8)])
        return raw_pad

    shifts_cache: dict[int, np.ndarray] = {}
    for width, blocks in by_width.items():
        starts = np.asarray([o for _, o in blocks], dtype=np.int64)
        outs = np.asarray([b for b, _ in blocks], dtype=np.int64)
        oidx = outs[:, None] + np.arange(BLOCK_SIZE, dtype=np.int64)[None, :]
        if width <= 56:
            bit0 = starts[:, None] * 8 + (np.arange(BLOCK_SIZE, dtype=np.int64) * width)[None, :]
            out[oidx.ravel()] = _extract_packed(padded(), bit0.ravel(), width)
            continue
        nbytes = (BLOCK_SIZE * width + 7) // 8
        idx = starts[:, None] + np.arange(nbytes, dtype=np.int64)[None, :]
        bits = np.unpackbits(raw[idx.ravel()].reshape(-1, nbytes), axis=1, count=BLOCK_SIZE * width)
        bits = bits.reshape(len(blocks), BLOCK_SIZE, width).astype(np.uint64)
        shifts = shifts_cache.setdefault(width, np.arange(width - 1, -1, -1, dtype=np.uint64))
        vals = (bits << shifts[None, None, :]).sum(axis=2).astype(np.int64)
        out[oidx.ravel()] = vals.ravel()
    if tail is not None:
        b, o, width = tail
        cnt = n - b
        if width <= 56:
            bit0 = o * 8 + np.arange(cnt, dtype=np.int64) * width
            out[b:] = _extract_packed(padded(), bit0, width)
        else:
            nbytes = (cnt * width + 7) // 8
            bits = np.unpackbits(raw[o : o + nbytes], count=cnt * width).reshape(cnt, width).astype(np.uint64)
            shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
            out[b:] = (bits << shifts[None, :]).sum(axis=1).astype(np.int64)
    for b, exc, high in patches:
        out[b + exc] |= high
    return out
