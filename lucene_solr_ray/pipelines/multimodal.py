"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Treats a binary column as an opaque media payload moved through an
actor-pool `map_batches` stage — the Ray-side plumbing (schema, batch
sizing, actor signature, output layout) is real and tested; the actual
media decode is STUBBED (no image/audio libs in this container): a
deterministic fake "decoder" extracts byte-level features, and
`decode_image` raises NotImplementedError to mark the integration point.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .common import Pipeline, read


def decode_image(payload: bytes):
    """Integration point for a real decoder (PIL/libvips/ffmpeg).

    Deliberately unimplemented in this container — see FakeDecoder for the
    deterministic stand-in used by the pipeline and its tests."""
    raise NotImplementedError("media decode libs are not available in this environment")


class FakeDecoder:
    """Actor-pool stage: 'decode' binary payloads → feature columns.

    State (here: nothing heavy; in a real decoder: model weights, codec
    contexts) is built once per actor in __init__; __call__ handles one
    Arrow batch with small batch_size because payloads are wide."""

    def __init__(self):
        self.crc = zlib.crc32

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n_bytes = np.array([len(p) for p in payloads], dtype=np.int64)
        crc = np.array([self.crc(p) for p in payloads], dtype=np.int64)
        first = np.array([p[0] if p else -1 for p in payloads], dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bytes": pa.array(n_bytes),
                "crc32": pa.array(crc),
                "first_byte": pa.array(first),
            }
        )


def media_features(sf_dir: str):
    """documents.text bytes stand in for an opaque media payload column."""

    def to_payload(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "payload": pa.array([t.encode() for t in texts], type=pa.binary()),
            }
        )

    out = (
        read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(to_payload, batch_format="pyarrow")
        .map_batches(FakeDecoder, batch_format="pyarrow", batch_size=256, concurrency=2)
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


# crc32 has no DuckDB twin → gate on the SQL-expressible columns only is not
# possible per-query; keep rows-only (pytest asserts known feature values).

PIPELINES: dict[str, Pipeline] = {
    "media_features": Pipeline(media_features, None, "binary-payload actor-pool decode plumbing (stubbed decoder)"),
}
