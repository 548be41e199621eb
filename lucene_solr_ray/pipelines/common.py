"""Shared helpers for the operator pipelines (driver correctness gate).

Float-parity convention: the driver compares Ray results against DuckDB by
value-hash, so every DERIVED float must be bit-deterministic.  Money/metric
sums therefore go through integer cents (`round half away from zero` per row
— exact in both engines — then exact integer sums); any exported float is
computed from exact integers with the same scalar formula on both sides.
Raw column values (never recomputed) pass through exactly and are safe.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import numpy as np


@dataclass
class Pipeline:
    """One operator pipeline: the Ray implementation + its DuckDB oracle.

    `sql is None` marks genuinely non-SQL-expressible ops (the driver then
    records a rows-only check)."""

    fn: Callable[[str], Any]
    sql: str | None
    doc: str = ""


def read(sf_dir: str, table: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def cents(x: np.ndarray) -> np.ndarray:
    """round(x*100) half-away-from-zero → int64 (DuckDB ROUND semantics)."""
    v = np.asarray(x, dtype=np.float64) * 100.0
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def ts_us(series) -> np.ndarray:
    """pandas datetime series → int64 microseconds since epoch."""
    return series.astype("datetime64[us]").astype("int64").to_numpy()
