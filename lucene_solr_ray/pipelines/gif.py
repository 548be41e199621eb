"""GIF codec — pure numpy + stdlib (GIF87a/89a, the public W3C spec).

Decoder: header + logical screen, global/local color tables, variable-
width LSB-first LZW with deferred-clear handling, interlaced row order,
GIF89a graphic-control extensions (transparency + disposal methods
0/1/2/3), and multi-frame compositing — `decode_gif_frames` returns every
composited animation frame, making this the REAL implementation of the
video frame-sampling stage `multimodal.FrameSampler` fakes byte-wise.

Encoder: palette-quantization-free (requires ≤256 distinct colors, like
`encode_webp(palette=True)`), optional interlace, optional per-frame
animation (NETSCAPE2.0 loop block, per-frame GCE delay/disposal), RGBA
transparency via a reserved palette slot.  Round-trips are exact on
palette-limited inputs, so the tests duel every decoder path against an
independent forward pass.

Reference parity: lucene-solr has no image codecs (Tika delegates out);
correctness is defined by the format spec + round-trip/property tests,
the same contract as pipelines/webp.py and pipelines/jpeg.py.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .common import Pipeline, pool, read

from .images import codec_errors

__all__ = ["decode_gif", "decode_gif_frames", "encode_gif"]

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# --------------------------------------------------------------------------
# LZW (GIF variant: LSB-first codes, variable width 3..12, clear/end codes)


def _lzw_decode(data: bytes, mcs: int, expected: int) -> np.ndarray:
    """Concatenated image sub-block bytes → index stream (uint8)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    table: list[bytes] = []
    width = mcs + 1
    acc = nbits = 0
    prev: bytes | None = None
    pos, n = 0, len(data)

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = mcs + 1
        prev = None

    reset()
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        prev = table[code] if code < len(table) else entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError("GIF LZW stream ended early")
    return np.frombuffer(bytes(out[:expected]), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    clear, end = 1 << mcs, (1 << mcs) + 1
    buf = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {}
    width = nxt = 0

    def reset():
        nonlocal table, width, nxt
        table = {bytes([i]): i for i in range(clear)}
        width = mcs + 1
        nxt = end + 1

    reset()
    emit(clear, width)
    data = indices.astype(np.uint8).tobytes()
    if data:
        w = data[0:1]
        for i in range(1, len(data)):
            k = data[i : i + 1]
            wk = w + k
            if wk in table:
                w = wk
                continue
            emit(table[w], width)
            if nxt < 4096:
                table[wk] = nxt
                nxt += 1
                if nxt == (1 << width) + 1 and width < 12:
                    width += 1
            else:  # table full: clear and restart (decoder resets in step)
                emit(clear, width)
                reset()
            w = k
        emit(table[w], width)
    emit(end, width)
    if nbits:
        buf.append(acc & 0xFF)
    return bytes(buf)


def _sub_blocks(b: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(b):
        out.append(min(len(b) - i, 255))
        out += b[i : i + 255]
        i += 255
    out.append(0)
    return bytes(out)


def _read_sub_blocks(b: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(b):
            raise ValueError("GIF sub-blocks truncated")
        n = b[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += b[pos : pos + n]
        pos += n
    # unreachable


# --------------------------------------------------------------------------
# Decoder


def _deinterlace(idx: np.ndarray, h: int, w: int) -> np.ndarray:
    rows = idx.reshape(h, w)
    out = np.empty_like(rows)
    src = 0
    for off, step in _INTERLACE_PASSES:
        for y in range(off, h, step):
            out[y] = rows[src]
            src += 1
    return out.reshape(-1)


@codec_errors
def decode_gif_frames(b: bytes) -> list[np.ndarray]:
    """All composited frames, each (h, w, 4) RGBA over the logical screen
    (transparent where nothing was ever drawn) — disposal methods 0/1
    (leave), 2 (restore rect to transparent, the modern-renderer rule),
    3 (restore to previous) are honored."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((sh, sw, 4), dtype=np.uint8)
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = b[pos]
            pos += 1
            body, pos = _read_sub_blocks(b, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                flags = body[0]
                disposal = (flags >> 2) & 7
                transparent = body[3] if flags & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", b[pos : pos + 9])
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            pal = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image without any color table")
        mcs = b[pos]
        pos += 1
        data, pos = _read_sub_blocks(b, pos)
        idx = _lzw_decode(data, mcs, w * h)
        if ipacked & 0x40:
            idx = _deinterlace(idx, h, w)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("GIF pixel index outside color table")
        rgba = np.concatenate(
            [pal[idx], np.full((idx.size, 1), 255, dtype=np.uint8)], axis=1
        ).reshape(h, w, 4)
        # Renderers clip frame rects that overhang the logical screen
        # (common in the wild); keep only the visible window.
        vh = max(0, min(h, canvas.shape[0] - top))
        vw = max(0, min(w, canvas.shape[1] - left))
        win = (slice(top, top + vh), slice(left, left + vw))
        saved = canvas[win].copy()
        if transparent is not None:
            keep = (idx.reshape(h, w) == transparent)[:vh, :vw]
            rgba[:vh, :vw][keep] = canvas[win][keep]
        canvas[win] = rgba[:vh, :vw]
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[win] = 0
        elif disposal == 3:
            canvas[win] = saved
        disposal = 0
        transparent = None
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


@codec_errors
def decode_gif(b: bytes) -> np.ndarray:
    """First composited frame: (h, w, 3) RGB when fully opaque, else
    (h, w, 4) RGBA (matches decode_webp's channel contract)."""
    f = decode_gif_frames(b)[0]
    if int(f[:, :, 3].min()) == 255:
        return np.ascontiguousarray(f[:, :, :3])
    return f


# --------------------------------------------------------------------------
# Encoder


def _palette_of(frames: list[np.ndarray]) -> tuple[np.ndarray, list[np.ndarray], int | None]:
    """Shared palette over all frames → (palette (n,3) uint8, per-frame
    index arrays, transparent slot | None)."""
    any_alpha = any(f.shape[2] == 4 for f in frames)
    packs, masks = [], []
    for f in frames:
        rgb = f[:, :, :3].astype(np.uint32)
        p = (rgb[:, :, 0] << 16) | (rgb[:, :, 1] << 8) | rgb[:, :, 2]
        m = (f[:, :, 3] < 128) if f.shape[2] == 4 else np.zeros(f.shape[:2], dtype=bool)
        packs.append(p)
        masks.append(m)
    opaque = np.concatenate([p[~m].reshape(-1) for p, m in zip(packs, masks)])
    colors = np.unique(opaque) if opaque.size else np.array([0], dtype=np.uint64)
    limit = 255 if any_alpha else 256
    if colors.size > limit:
        raise ValueError(f"encode_gif wants ≤{limit} distinct colors (got {colors.size})")
    pal = np.stack([(colors >> 16) & 0xFF, (colors >> 8) & 0xFF, colors & 0xFF], axis=1).astype(np.uint8)
    tslot = None
    if any_alpha:
        tslot = pal.shape[0]
        pal = np.vstack([pal, np.zeros((1, 3), dtype=np.uint8)])
    idxs = []
    for p, m in zip(packs, masks):
        idx = np.searchsorted(colors, p.reshape(-1)).astype(np.int64)
        idx[idx >= colors.size] = 0
        bad = colors[np.minimum(idx, colors.size - 1)] != p.reshape(-1)
        idx[bad] = 0  # masked-out pixels may not be in the palette
        if tslot is not None:
            idx[m.reshape(-1)] = tslot
        idxs.append(idx.astype(np.uint8))
    return pal, idxs, tslot


def encode_gif(
    img: np.ndarray | list[np.ndarray],
    *,
    interlace: bool = False,
    delay_cs: int = 4,
    loop: int = 0,
) -> bytes:
    """uint8 (h, w, 3|4) image — or a list of same-shape frames for an
    animation — → GIF89a bytes.  RGBA alpha < 128 becomes a transparent
    palette slot; ≤256 distinct opaque colors required (no quantizer)."""
    frames = [img] if isinstance(img, np.ndarray) else list(img)
    if not frames:
        raise ValueError("encode_gif needs at least one frame")
    for f in frames:
        if f.dtype != np.uint8 or f.ndim != 3 or f.shape[2] not in (3, 4):
            raise ValueError("encode_gif wants uint8 (h, w, 3|4) frames")
        if f.shape[:2] != frames[0].shape[:2]:
            raise ValueError("animation frames must share one size")
    h, w = frames[0].shape[:2]
    if not (1 <= w <= 0xFFFF and 1 <= h <= 0xFFFF):
        raise ValueError("GIF dimensions must fit uint16")
    pal, idxs, tslot = _palette_of(frames)
    depth = max(1, int(pal.shape[0] - 1).bit_length())
    table = np.zeros((1 << depth, 3), dtype=np.uint8)
    table[: pal.shape[0]] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 7), 0, 0)
    out += table.tobytes()
    animated = len(frames) > 1
    if animated:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    for idx in idxs:
        if animated or tslot is not None:
            flags = (1 << 2)  # disposal 1: leave in place (full frames)
            if tslot is not None:
                flags |= 1
            out += b"\x21\xf9\x04" + bytes([flags]) + struct.pack("<H", delay_cs if animated else 0)
            out += bytes([tslot or 0, 0])
        ipacked = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
        rows = idx.reshape(h, w)
        if interlace:
            order = [y for off, step in _INTERLACE_PASSES for y in range(off, h, step)]
            rows = rows[order]
        mcs = max(2, depth)
        out += bytes([mcs])
        out += _sub_blocks(_lzw_encode(rows.reshape(-1), mcs))
    out += b"\x3b"
    return bytes(out)


# --------------------------------------------------------------------------
# Video-shaped pipeline: animated-GIF frame sampling for REAL — the stage
# `multimodal.FrameSampler` fakes byte-wise.  One deterministic animation
# per document; an actor-pool stage decodes + composites every frame and
# keeps each stride-th one.  The sampled (doc_id, frame_idx) row set is
# closed-form from doc_id, so the gate is STRICT (generate_series twin);
# pixel correctness is dueled in pytest against the synthesis reference.


def synth_gif_frames(doc_id: int) -> list[np.ndarray]:
    """Deterministic palette animation: 2 + doc_id % 4 frames, each a
    cyclic palette rotation of a seeded index field."""
    rng = np.random.default_rng(doc_id)
    h = 6 + (doc_id * 3) % 11
    w = 6 + (doc_id * 5) % 13
    nc = 2 + doc_id % 14
    colors = rng.integers(0, 256, size=(nc, 3), dtype=np.uint8)
    base = rng.integers(0, nc, size=(h, w))
    return [colors[(base + k) % nc] for k in range(2 + doc_id % 4)]


def synth_gif(doc_id: int) -> bytes:
    return encode_gif(synth_gif_frames(doc_id), interlace=(doc_id % 5 == 0))


class GifFrameSampler:
    """Actor-pool stage: decode + composite all frames of each animation,
    keep every `stride`-th frame, emit one row per kept frame (1 row in →
    N rows out).  Codec state lives per actor; batches stay small because
    payloads are wide."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx = [], []
        for did, p in zip(batch.column("doc_id").to_pylist(), batch.column("payload").to_pylist()):
            frames = decode_gif_frames(p)
            for j in range(0, len(frames), self.stride):
                ids.append(did)
                fidx.append(j)
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()), "frame_idx": pa.array(fidx, type=pa.int64())}
        )


def gif_frame_sample(sf_dir: str):
    def to_payload(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array([synth_gif(d) for d in ids], type=pa.binary()),
            }
        )

    out = (
        read(sf_dir, "documents", ["doc_id"])
        .map_batches(to_payload, batch_format="pyarrow", batch_size=256)
        .map_batches(GifFrameSampler, batch_format="pyarrow", batch_size=128, concurrency=pool())
        .to_pandas()
    )
    return out.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)


# engine samples every 2nd of (2 + doc_id % 4) composited frames
GIF_FRAME_SQL = """
SELECT doc_id, unnest(range(0, 2 + doc_id % 4, 2)) AS frame_idx
FROM documents ORDER BY doc_id, frame_idx
"""

PIPELINES: dict[str, Pipeline] = {
    "gif_frame_sample": Pipeline(
        gif_frame_sample,
        GIF_FRAME_SQL,
        "REAL animated-GIF decode → frame-sample (actor pool; strict closed-form frame-set twin)",
    ),
}
