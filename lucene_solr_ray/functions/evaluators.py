"""Streaming-expression math/ML evaluators (SURVEY.md §2.9(b)).

Reference: solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/ — the
streaming-expression math library (RegressionEvaluator, CorrelationEvaluator,
MovingAverageEvaluator, KmeansEvaluator, FFTEvaluator, HistogramEvaluator,
PercentileEvaluator …).  Each evaluator here is a pure function over numpy
arrays; the distributed pipelines feed them EXACT integer moment sums
(Python ints — overflow-free) collected via `map_batches` partials, so the
derived floats are bit-identical to a SQL twin writing the same formula.
"""

from __future__ import annotations

import math

import numpy as np


def ols_from_moments(n: int, sx: int, sy: int, sxy: int, sxx: int) -> tuple[float, float]:
    """Simple OLS slope/intercept from exact integer moments
    (RegressionEvaluator).  Products use Python ints (arbitrary precision)
    and round to double only at the final division — matching a HUGEINT
    SQL twin exactly."""
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope = float(num) / float(den)
    intercept = (float(sy) - slope * float(sx)) / float(n)
    return slope, intercept


def corr_from_moments(n: int, sx: int, sy: int, sxy: int, sxx: int, syy: int) -> float:
    """Pearson correlation from exact integer moments (CorrelationEvaluator)."""
    num = n * sxy - sx * sy
    a = float(n * sxx - sx * sx)
    b = float(n * syy - sy * sy)
    return float(num) / (math.sqrt(a) * math.sqrt(b))


def moving_average(values: np.ndarray, window: int) -> np.ndarray:
    """Trailing moving average, full windows only (MovingAverageEvaluator):
    out[i] = mean(values[i-window+1 .. i]) for i ≥ window-1."""
    v = np.asarray(values, dtype=np.float64)
    if v.size < window:
        return np.empty(0, dtype=np.float64)
    c = np.concatenate([[0.0], np.cumsum(v)])
    return (c[window:] - c[:-window]) / float(window)


def kmeans(points: np.ndarray, k: int, iters: int = 10, seed: int = 99) -> tuple[np.ndarray, np.ndarray]:
    """Lloyd k-means (KmeansEvaluator): → (centroids, assignments).
    Seeded/deterministic; assignment uses the matmul distance form."""
    rng = np.random.default_rng(seed)
    pts = np.asarray(points, dtype=np.float64)
    cent = pts[rng.choice(len(pts), size=k, replace=False)].copy()
    assign = np.zeros(len(pts), dtype=np.int64)
    for _ in range(iters):
        score = pts @ cent.T - 0.5 * (cent * cent).sum(axis=1)[None, :]
        assign = score.argmax(axis=1)
        for c in range(k):
            members = pts[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent, assign


def fft_magnitude(values: np.ndarray) -> np.ndarray:
    """|rfft| of a real series (FFTEvaluator)."""
    return np.abs(np.fft.rfft(np.asarray(values, dtype=np.float64)))


def histogram(values: np.ndarray, bins: int, lo: float, hi: float) -> np.ndarray:
    """Fixed-range histogram counts (HistogramEvaluator)."""
    v = np.asarray(values, dtype=np.float64)
    idx = np.floor((v - lo) / ((hi - lo) / bins)).astype(np.int64)
    keep = (idx >= 0) & (idx < bins)
    return np.bincount(idx[keep], minlength=bins)
