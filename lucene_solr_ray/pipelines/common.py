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


def merge_partials(ds, keys: list[str], ops: dict[str, str]):
    """Coordinator merge for BOUNDED-DOMAIN aggregates: `ds` holds
    combiner partials (one row per group per block), so the driver merge
    handles domain × blocks rows — never the raw row count.  This is the
    facet/stats coordinator pattern (per-shard responses merged centrally)
    and skips the Ray all-to-all Aggregate's fixed cost (~2-4 s per op on
    this box).  For UNBOUNDED key domains (ids, vocabularies) use a
    bucketed `groupby` shuffle instead — see CLAUDE.md."""
    import pandas as pd  # noqa: F401

    return ds.to_pandas().groupby(keys, as_index=False).agg(ops)


def pool(frac: float = 0.5, lo: int = 1) -> tuple[int, int]:
    """Actor-pool `concurrency` sized from the CLUSTER, not hard-coded
    (r3 verdict: monitor_match's `concurrency=2` capped the percolator's
    only heavy stage at 2 actors on any cluster).  Returns an autoscaling
    (lo, ceil(CPU·frac)) range: tiny inputs spin up one actor, a full
    cluster fills its share and Ray only grows the pool under load."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return (lo, max(2, int(np.ceil(cpus * frac))))


def cents(x: np.ndarray) -> np.ndarray:
    """round(x*100) half-away-from-zero → int64 (DuckDB ROUND semantics)."""
    v = np.asarray(x, dtype=np.float64) * 100.0
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def hugeint_to_double(v: int) -> float:
    """EXACTLY DuckDB's CAST(HUGEINT AS DOUBLE) (duckdb/src/common/types/
    hugeint.cpp Hugeint::Cast<double>): upper==0 → (double)lower;
    upper==-1 → -(double)(UINT64_MAX - lower) - 1; else (double)lower +
    (double)upper * (double)UINT64_MAX.  NOT correctly-rounded — the
    hi·(2⁶⁴−1) + lo recombination carries its own rounding — so any exact
    integer moment ≥ 2⁶³ (or any negative beyond 2⁵³) that a SQL twin
    casts to DOUBLE must go through THIS function, never float(x), or the
    value-hash gate diverges in the last ulp (seen live: describe_stats
    sumsq at sf0.1).  Identical to float(x) for 0 ≤ x < 2⁶³.  Probed
    bit-exact against DuckDB over 800 random hugeints."""
    hi = v >> 64
    lo = v & ((1 << 64) - 1)
    if hi == 0:
        return float(lo)
    if hi == -1:
        return -float((1 << 64) - 1 - lo) - 1.0
    return float(lo) + float(hi) * float((1 << 64) - 1)


def ts_us(series) -> np.ndarray:
    """pandas datetime series → int64 microseconds since epoch."""
    return series.astype("datetime64[us]").astype("int64").to_numpy()
