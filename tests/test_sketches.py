"""HLL sketch accuracy + native hash join."""

import numpy as np
import pandas as pd
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


def test_spacesaving_batch_guarantee():
    from lucene_solr_ray.pipelines.sketches import SS_CAPACITY, _ss_batch

    rng = np.random.default_rng(7)
    # zipf-ish over 1000 distinct tokens — forces eviction (> capacity)
    toks = np.array([f"t{int(v)}" for v in rng.zipf(1.3, 20000) % 1000], dtype=object)
    summ = _ss_batch(toks)
    assert len(summ) == SS_CAPACITY
    true = pd.Series(toks).value_counts()
    for token, est, err in zip(summ["token"], summ["est"], summ["err"]):
        t = true[token]
        assert t <= est <= t + err, (token, t, est, err)
    # every token more frequent than the largest evicted count is kept
    kept = set(summ["token"])
    max_evicted = int(summ["err"].max())
    for token, cnt in true.items():
        if cnt > max_evicted:
            assert token in kept, (token, cnt, max_evicted)


def test_heavy_hitters_exact_on_fixture(ray_session):
    import duckdb

    from lucene_solr_ray.pipelines.sketches import SS_TOP, heavy_hitters
    from lucene_solr_ray.pipelines.text import TOKEN_RE

    out = heavy_hitters(SF)
    exact = duckdb.sql(
        f"""SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM (
              SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS token
              FROM read_parquet('{SF}/documents.parquet'))
            GROUP BY token ORDER BY n DESC, token LIMIT {SS_TOP}"""
    ).fetchdf()
    # fixture vocabulary ≪ capacity → the sketch is exact, err 0
    assert (out["err"] == 0).all()
    assert list(out["token"]) == list(exact["token"])
    assert list(out["est"]) == list(exact["n"])
