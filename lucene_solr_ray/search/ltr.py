"""Learning-to-rank models — the LTR second-stage scorer.

Reference: solr/contrib/ltr/src/java/org/apache/solr/ltr/model/
LinearModel.java (score = Σ wᵢ·featureᵢ over declared features) and
MultipleAdditiveTreesModel.java (sum of regression trees).  Models are
plain declarative payloads (weights / tree arrays) loaded ONCE per scoring
actor in `__init__` — the re-rank stage is an actor-pool `map_batches`
over the first-pass candidate set.

Feature values are produced by the caller (original score, stored-field
functions); scoring is vectorized float64 with a deterministic
accumulation order (declaration order), so a SQL twin writing the same
left-to-right sum is bit-identical.
"""

from __future__ import annotations

import numpy as np


class LinearModel:
    """score = Σ wᵢ·fᵢ, accumulated in declaration order."""

    def __init__(self, weights: dict[str, float]):
        self.weights = dict(weights)

    def score(self, features: dict[str, np.ndarray]) -> np.ndarray:
        n = len(next(iter(features.values())))
        s = np.zeros(n, dtype=np.float64)
        for name, w in self.weights.items():
            s += w * np.asarray(features[name], dtype=np.float64)
        return s


class AdditiveTreesModel:
    """Sum of regression trees (MultipleAdditiveTreesModel): each tree is a
    nested dict {feature, threshold, left, right} with float leaves; the
    vectorized evaluator routes every row through every tree at once."""

    def __init__(self, trees: list[dict], weights: list[float] | None = None):
        self.trees = trees
        self.weights = weights or [1.0] * len(trees)

    def _eval_tree(self, node, features: dict[str, np.ndarray], n: int) -> np.ndarray:
        if not isinstance(node, dict):
            return np.full(n, float(node), dtype=np.float64)
        f = np.asarray(features[node["feature"]], dtype=np.float64)
        left = self._eval_tree(node["left"], features, n)
        right = self._eval_tree(node["right"], features, n)
        return np.where(f <= node["threshold"], left, right)

    def score(self, features: dict[str, np.ndarray]) -> np.ndarray:
        n = len(next(iter(features.values())))
        s = np.zeros(n, dtype=np.float64)
        for w, t in zip(self.weights, self.trees):
            s += w * self._eval_tree(t, features, n)
        return s
