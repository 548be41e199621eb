"""Mergeable t-digest quantile sketch (Dunning & Ertl, "Computing extremely
accurate quantiles using t-digests", 2019) — the distributed-percentile
AggregateFn the reference maps PercentileAgg onto (SURVEY.md §2.6;
solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/ — percentile
evaluator over mergeable digests).

Merging-digest variant with the k1 (arcsine) scale function: centroids are
(mean, weight) pairs; `merge` concatenates + re-clusters in one sorted
pass, so partial digests from any number of batches combine exactly like a
single-pass build.  Serialized as float64 (means ‖ weights) bytes — only
sketches ever shuffle, never raw values.
"""

from __future__ import annotations

import math

import numpy as np


class TDigest:
    __slots__ = ("means", "weights", "compression")

    def __init__(self, means=None, weights=None, compression: int = 200):
        self.means = np.asarray(means if means is not None else [], dtype=np.float64)
        self.weights = np.asarray(weights if weights is not None else [], dtype=np.float64)
        self.compression = compression

    # -- construction ------------------------------------------------------
    @classmethod
    def of(cls, values, compression: int = 200) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return cls(compression=compression)
        v = np.sort(v)
        return cls(v, np.ones(v.size), compression)._compress()

    def merge(self, other: "TDigest") -> "TDigest":
        if other.means.size == 0:
            return self
        if self.means.size == 0:
            return TDigest(other.means, other.weights, self.compression)
        m = np.concatenate([self.means, other.means])
        w = np.concatenate([self.weights, other.weights])
        order = np.argsort(m, kind="mergesort")
        return TDigest(m[order], w[order], self.compression)._compress()

    def _k(self, q: np.ndarray) -> np.ndarray:
        # k1 scale: δ/(2π)·asin(2q−1) — tight centroids at the tails
        return self.compression / (2.0 * math.pi) * np.arcsin(np.clip(2.0 * q - 1.0, -1, 1))

    def _compress(self) -> "TDigest":
        """Vectorized re-clustering: assign each (sorted) centroid the
        integer cell of its k-scaled mid-quantile — every output cluster
        spans k-width < 1, the t-digest size/accuracy invariant — then one
        `add.reduceat` builds the merged centroids (no per-centroid loop)."""
        if self.means.size <= 1:
            return self
        total = self.weights.sum()
        cum = np.cumsum(self.weights)
        q = (cum - self.weights / 2.0) / total
        ids = np.floor(self._k(q)).astype(np.int64)
        new = np.empty(ids.size, dtype=bool)
        new[0] = True
        new[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(new)
        wsum = np.add.reduceat(self.weights, starts)
        msum = np.add.reduceat(self.means * self.weights, starts)
        return TDigest(msum / wsum, wsum, self.compression)

    # -- queries -----------------------------------------------------------
    def quantile(self, q: float) -> float:
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        i = int(np.searchsorted(cum, target)) - 1
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + frac * (self.means[i + 1] - self.means[i]))

    # -- serialization (sketch bytes for the shuffle) ----------------------
    def to_bytes(self) -> bytes:
        return np.concatenate([self.means, self.weights]).tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, compression: int = 200) -> "TDigest":
        arr = np.frombuffer(blob, dtype=np.float64)
        n = arr.size // 2
        return cls(arr[:n].copy(), arr[n:].copy(), compression)
