"""LTR models: LinearModel accumulation order + AdditiveTreesModel routing."""

import numpy as np

from lucene_solr_ray.search.ltr import AdditiveTreesModel, LinearModel


def test_linear_model():
    m = LinearModel({"a": 0.5, "b": 2.0})
    s = m.score({"a": np.array([1.0, 2.0]), "b": np.array([3.0, 0.5])})
    assert np.allclose(s, [0.5 * 1 + 2 * 3, 0.5 * 2 + 2 * 0.5])


def test_additive_trees():
    tree1 = {"feature": "f", "threshold": 1.0, "left": 10.0, "right": 20.0}
    tree2 = {
        "feature": "g",
        "threshold": 0.0,
        "left": {"feature": "f", "threshold": 5.0, "left": 1.0, "right": 2.0},
        "right": 3.0,
    }
    m = AdditiveTreesModel([tree1, tree2], weights=[1.0, 0.5])
    f = np.array([0.5, 2.0, 6.0])
    g = np.array([-1.0, 1.0, -1.0])
    s = m.score({"f": f, "g": g})
    assert np.allclose(s, [10 + 0.5 * 1, 20 + 0.5 * 3, 20 + 0.5 * 2])
