"""t-digest sketch: accuracy vs exact quantiles, merge associativity,
bounded size, and the distributed pipeline path."""

import numpy as np
import pytest

from lucene_solr_ray.state.tdigest import TDigest

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "bimodal"])
def test_accuracy_vs_exact(dist):
    rng = np.random.default_rng(42)
    if dist == "uniform":
        v = rng.uniform(0, 1000, 50_000)
    elif dist == "lognormal":
        v = rng.lognormal(3, 1.5, 50_000)
    else:
        v = np.concatenate([rng.normal(10, 1, 25_000), rng.normal(1000, 50, 25_000)])
    d = TDigest.of(v)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        exact = np.quantile(v, q)
        got = d.quantile(q)
        # rank-space error: the fraction of values the estimate is off by
        rank_err = abs((v <= got).mean() - (v <= exact).mean())
        assert rank_err < 0.01, (dist, q, got, exact, rank_err)


def test_merge_equals_single_pass_accuracy():
    rng = np.random.default_rng(7)
    v = rng.exponential(100, 40_000)
    whole = TDigest.of(v)
    merged = TDigest()
    for chunk in np.array_split(v, 17):
        merged = merged.merge(TDigest.of(chunk))
    for q in (0.05, 0.5, 0.95):
        assert abs(merged.quantile(q) - whole.quantile(q)) <= 0.05 * (abs(whole.quantile(q)) + 1)


def test_size_bounded():
    v = np.random.default_rng(1).normal(size=200_000)
    d = TDigest.of(v)
    assert d.means.size <= 2 * d.compression  # k-scale size bound
    blob = d.to_bytes()
    d2 = TDigest.from_bytes(blob)
    assert d2.quantile(0.5) == d.quantile(0.5)


def test_edge_cases():
    assert np.isnan(TDigest.of([]).quantile(0.5))
    assert TDigest.of([42.0]).quantile(0.9) == 42.0
    d = TDigest.of([1.0, 2.0])
    assert 1.0 <= d.quantile(0.5) <= 2.0


def test_pipeline_sketch_guided_exact(ray_session):
    """r5: the t-digest now only BRACKETS the rank — boundary refinement
    fetches the true order statistics, so the pipeline equals the exact
    quantile_cont path bit-for-bit."""
    from lucene_solr_ray.pipelines.relational import percentile_cont, percentile_tdigest

    exact = percentile_cont(SF)
    got = percentile_tdigest(SF)
    for c in ("p50", "p90", "p99"):
        assert got[c][0] == exact[c][0], (c, got[c][0], exact[c][0])
