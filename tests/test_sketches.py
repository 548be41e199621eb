"""HLL sketch accuracy + native hash join."""

import numpy as np
import pytest

from lucene_solr_ray.pipelines.sketches import HLL, hll_distinct

SF = "/root/testdata/sf0.001"


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(5)
    for true_n in [10, 500, 20_000]:
        vals = rng.integers(0, 10**12, size=true_n)
        vals = np.unique(vals)
        h = HLL.of(vals)
        est = h.estimate()
        assert abs(est - vals.size) / vals.size < 0.06, (true_n, est)
        # merge of halves == whole (register-wise max)
        h2 = HLL.of(vals[: len(vals) // 2]).merge(HLL.of(vals[len(vals) // 2 :]))
        assert (h2.regs == h.regs).all()


def test_hll_deterministic():
    vals = [f"u{i}" for i in range(1000)]
    assert HLL.of(vals).estimate() == HLL.of(vals).estimate()


def test_hll_distinct_pipeline_vs_exact(ray_session):
    import duckdb

    out = hll_distinct(SF)
    exact = duckdb.sql(
        f"SELECT event_type, COUNT(DISTINCT user_id) AS n FROM read_parquet('{SF}/events.parquet') GROUP BY event_type ORDER BY event_type"
    ).fetchdf()
    merged = out.merge(exact, on="event_type")
    err = (merged["approx_distinct"] - merged["n"]).abs() / merged["n"]
    assert (err < 0.08).all(), merged
