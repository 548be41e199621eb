"""Streaming-evaluator surface: evaluator functions + rows-only pipelines."""

import numpy as np
import pytest

from lucene_solr_ray.functions.evaluators import (
    corr_from_moments,
    fft_magnitude,
    histogram,
    kmeans,
    moving_average,
    ols_from_moments,
)

SF = "/root/testdata/sf0.001"


def test_ols_matches_numpy():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1000, 500).astype(np.int64)
    y = (3 * x + 17 + rng.integers(-50, 50, 500)).astype(np.int64)
    slope, intercept = ols_from_moments(
        len(x), int(x.sum()), int(y.sum()), int((x * y).sum()), int((x * x).sum())
    )
    ref = np.polyfit(x.astype(float), y.astype(float), 1)
    assert abs(slope - ref[0]) < 1e-9 and abs(intercept - ref[1]) < 1e-6


def test_corr_matches_numpy():
    rng = np.random.default_rng(4)
    x = rng.integers(0, 1000, 400).astype(np.int64)
    y = (x * 2 + rng.integers(0, 300, 400)).astype(np.int64)
    r = corr_from_moments(
        len(x), int(x.sum()), int(y.sum()), int((x * y).sum()), int((x * x).sum()), int((y * y).sum())
    )
    assert abs(r - np.corrcoef(x, y)[0, 1]) < 1e-12


def test_moving_average():
    out = moving_average(np.array([1.0, 2.0, 3.0, 4.0]), 3)
    assert np.allclose(out, [2.0, 3.0])
    assert moving_average(np.array([1.0]), 3).size == 0


def test_histogram():
    h = histogram(np.array([0.5, 1.5, 1.6, 9.9, 10.0, -1.0]), bins=10, lo=0.0, hi=10.0)
    assert h.tolist() == [1, 2, 0, 0, 0, 0, 0, 0, 0, 1]  # 10.0 and -1.0 fall outside


def test_kmeans_deterministic_and_partitions():
    rng = np.random.default_rng(8)
    pts = np.concatenate([rng.normal(0, 0.1, (100, 4)), rng.normal(5, 0.1, (100, 4))])
    c1, a1 = kmeans(pts, 2)
    c2, a2 = kmeans(pts, 2)
    assert np.array_equal(a1, a2)
    # the two blobs separate perfectly
    assert len({a1[:100].tolist().count(0), a1[100:].tolist().count(0)} & {0, 100}) > 0
    assert (a1[:100] == a1[0]).all() and (a1[100:] == a1[100]).all() and a1[0] != a1[100]


def test_fft_parseval():
    rng = np.random.default_rng(9)
    v = rng.normal(size=64)
    mag = fft_magnitude(v)
    # Parseval for rfft of real input: sum v² == (mag0² + magN/2² + 2·Σ others²)/n
    e = (mag[0] ** 2 + mag[-1] ** 2 + 2 * (mag[1:-1] ** 2).sum()) / v.size
    assert abs(e - (v**2).sum()) < 1e-8


def test_kmeans_pipeline(ray_session):
    from lucene_solr_ray.pipelines.evaluators import kmeans_clusters

    a = kmeans_clusters(SF)
    b = kmeans_clusters(SF)
    assert a.equals(b)
    assert int(a["n"].sum()) == 500 and (a["n"] > 0).any()


def test_fft_pipeline(ray_session):
    from lucene_solr_ray.pipelines.evaluators import fft_daily_counts

    out = fft_daily_counts(SF)
    assert len(out) > 10 and (out["magnitude"] >= 0).all()
    # bin 0 is the series sum (total event count)
    import duckdb

    n = duckdb.sql(f"SELECT COUNT(*) FROM read_parquet('{SF}/events.parquet')").fetchone()[0]
    assert abs(out["magnitude"][0] - n) < 1e-6


def test_exact_sum_overflow_free():
    """Regression: a whole-block int64 sum of cents² partials overflows int64
    (r2 advice) — the chunked exact sum must match Python-int arithmetic."""
    from lucene_solr_ray.pipelines.evaluators import _exact_prod_sum, _exact_sum

    rng = np.random.default_rng(7)
    y = rng.integers(10_000_000, 60_000_000, 200_000).astype(np.int64)
    want = sum(int(v) * int(v) for v in y)
    assert want > np.iinfo(np.int64).max  # the naive sum would overflow
    assert _exact_prod_sum(y, y) == want
    assert _exact_sum(y) == sum(int(v) for v in y)
    assert _exact_sum(np.array([], dtype=np.int64)) == 0
    assert _exact_prod_sum(-y, y) == -want
    # object-array fallback when per-element products exceed int64
    big = np.array([3_000_000_000_000] * 5, dtype=np.int64)
    assert _exact_prod_sum(big, big) == 5 * 3_000_000_000_000**2


def test_moment_partial_hilo_round_trip():
    """The (hi, lo) split used to ship >int64 per-batch moments must
    reconstruct exactly, including negative values."""
    from lucene_solr_ray.pipelines.evaluators import _HILO_MASK, _HILO_SHIFT

    for v in (0, 1, -1, 5 * 10**20, -5 * 10**20, (1 << 62) + 12345):
        sign = -1 if v < 0 else 1
        hi, lo = sign * (abs(v) >> _HILO_SHIFT), sign * (abs(v) & _HILO_MASK)
        assert (hi << _HILO_SHIFT) + lo == v
        assert abs(hi) < np.iinfo(np.int64).max and abs(lo) < np.iinfo(np.int64).max


def test_dbscan_blobs():
    """Two dense unit-vector blobs + isolated noise → 2 clusters, noise -1."""
    from lucene_solr_ray.pipelines.evaluators import _dbscan

    rng = np.random.default_rng(11)
    a = rng.normal(0, 0.02, (60, 4)) + np.array([1.0, 0, 0, 0])
    b = rng.normal(0, 0.02, (60, 4)) + np.array([0, 1.0, 0, 0])
    noise = np.array([[0, 0, 1.0, 0], [0, 0, 0, 1.0]])
    pts = np.concatenate([a, b, noise])
    pts = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    lab = _dbscan(pts, eps=0.05, min_pts=5)
    assert (lab[:60] == lab[0]).all() and lab[0] >= 0
    assert (lab[60:120] == lab[60]).all() and lab[60] >= 0 and lab[60] != lab[0]
    assert (lab[120:] == -1).all()
    assert np.array_equal(lab, _dbscan(pts, eps=0.05, min_pts=5))


def test_dbscan_pipeline(ray_session):
    from lucene_solr_ray.pipelines.evaluators import dbscan_clusters

    a = dbscan_clusters(SF)
    b = dbscan_clusters(SF)
    assert a.equals(b)  # deterministic
    import pandas as pd

    n_rows = len(pd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id"]))
    assert int(a["n"].sum()) == n_rows  # every vector labelled exactly once
    assert (a["cluster"] >= -1).all()


def test_polyfit_matches_numpy(ray_session):
    import duckdb
    import pandas as pd

    from lucene_solr_ray.pipelines.evaluators import polyfit_quadratic

    out = polyfit_quadratic(SF)
    df = duckdb.sql(
        f"SELECT datediff('day', DATE '1990-01-01', o_orderdate) AS x,"
        f" CAST(ROUND(o_totalprice*100) AS BIGINT) AS y FROM '{SF}/orders.parquet'"
    ).df()
    ref = np.polyfit(df["x"].to_numpy(float), df["y"].to_numpy(float), 2)
    assert np.isclose(out["c2"].iloc[0], ref[0], rtol=1e-6)
    assert np.isclose(out["c1"].iloc[0], ref[1], rtol=1e-6)
    assert np.isclose(out["c0"].iloc[0], ref[2], rtol=1e-6)


def test_ttest_describe_match_numpy(ray_session):
    import duckdb

    from lucene_solr_ray.pipelines.evaluators import describe_stats, ttest_welch

    d = describe_stats(SF)
    c = duckdb.sql(
        f"SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS c FROM '{SF}/lineitem.parquet'"
    ).df()["c"].to_numpy(np.int64)
    assert int(d["n"].iloc[0]) == c.size
    assert int(d["vmin"].iloc[0]) == c.min() and int(d["vmax"].iloc[0]) == c.max()
    assert np.isclose(d["mean"].iloc[0], c.astype(float).mean(), rtol=1e-12)
    assert np.isclose(d["variance"].iloc[0], c.astype(float).var(ddof=1), rtol=1e-9)

    t = ttest_welch(SF)
    ev = duckdb.sql(
        f"SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS c FROM '{SF}/events.parquet'"
        f" WHERE event_type IN ('click','view')"
    ).df()
    a = ev[ev["event_type"] == "click"]["c"].to_numpy(float)
    b = ev[ev["event_type"] == "view"]["c"].to_numpy(float)
    se = a.var(ddof=1) / a.size + b.var(ddof=1) / b.size
    t_ref = (a.mean() - b.mean()) / np.sqrt(se)
    assert np.isclose(t["t"].iloc[0], t_ref, rtol=1e-9)
    dof_ref = se * se / (
        (a.var(ddof=1) / a.size) ** 2 / (a.size - 1) + (b.var(ddof=1) / b.size) ** 2 / (b.size - 1)
    )
    assert np.isclose(t["dof"].iloc[0], dof_ref, rtol=1e-9)


def test_hist_zscores_shapes(ray_session):
    from lucene_solr_ray.pipelines.evaluators import HIST_BINS, hist_bins, zscores_monthly

    h = hist_bins(SF)
    assert (h["bin"] >= 0).all() and (h["bin"] < HIST_BINS).all()
    assert (h["vmin"] <= h["vmax"]).all()
    z = zscores_monthly(SF)
    # standardized series: mean ~0, sample std ~1
    assert abs(z["z"].mean()) < 1e-9
    assert np.isclose(z["z"].std(ddof=1), 1.0, rtol=1e-12)


def test_integrate_anova(ray_session):
    import duckdb

    from lucene_solr_ray.pipelines.evaluators import anova_oneway, integrate_monthly

    it = integrate_monthly(SF)
    # trapezoid of a series == numpy.trapz prefix
    c = it["cents"].to_numpy(float)
    assert len(it) > 10 and (np.diff(it["integral"]) > 0).all()

    a = anova_oneway(SF)
    ev = duckdb.sql(
        f"SELECT event_type g, CAST(ROUND(value*100) AS BIGINT) c FROM '{SF}/events.parquet'"
    ).df()
    groups = [sub["c"].to_numpy(float) for _, sub in ev.groupby("g")]
    allv = ev["c"].to_numpy(float)
    grand = allv.mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f_ref = (ssb / (len(groups) - 1)) / (ssw / (len(allv) - len(groups)))
    assert np.isclose(a["f"].iloc[0], f_ref, rtol=1e-6)
    assert int(a["k"].iloc[0]) == len(groups)


def test_ema_lerp_cosine(ray_session):
    from lucene_solr_ray.pipelines.evaluators import (
        EMA_ALPHA,
        cosine_series,
        exp_moving_avg,
        lerp_midpoints,
    )

    e = exp_moving_avg(SF)
    c = e["cents"].to_numpy(float)
    # pandas ewm with adjust=False is the same recurrence
    import pandas as pd

    ref = pd.Series(c).ewm(alpha=EMA_ALPHA, adjust=False).mean().to_numpy()
    assert np.allclose(e["ema"].to_numpy(), ref, rtol=1e-12)

    m = lerp_midpoints(SF)
    full = exp_moving_avg(SF)["cents"].to_numpy(float)
    assert np.allclose(m["mid"].to_numpy(), (full[:-1] + full[1:]) / 2.0)

    cs = cosine_series(SF)
    a, b = full[1:], full[:-1]
    assert np.isclose(
        cs["cos"].iloc[0], (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b)), rtol=1e-12
    )
    assert 0.0 < cs["cos"].iloc[0] <= 1.0


def test_mann_whitney_reference(ray_session):
    import duckdb

    from lucene_solr_ray.pipelines.evaluators import mann_whitney

    out = mann_whitney(SF)
    ev = duckdb.sql(
        f"SELECT event_type, CAST(ROUND(value*100) AS BIGINT) c FROM '{SF}/events.parquet'"
        f" WHERE event_type IN ('click','view')"
    ).df()
    a = ev[ev["event_type"] == "click"]["c"].to_numpy()
    b = ev[ev["event_type"] == "view"]["c"].to_numpy()
    # brute-force midrank reference
    allv = np.concatenate([a, b])
    order = np.argsort(allv, kind="mergesort")
    ranks = np.empty(allv.size, dtype=np.float64)
    sorted_v = allv[order]
    i = 0
    while i < sorted_v.size:
        j = i
        while j < sorted_v.size and sorted_v[j] == sorted_v[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # midrank (1-based)
        i = j
    r1 = ranks[: a.size].sum()
    u1_ref = r1 - a.size * (a.size + 1) / 2.0
    assert np.isclose(out["u1"].iloc[0], u1_ref)
    assert int(out["n1"].iloc[0]) == a.size and int(out["n2"].iloc[0]) == b.size
    assert abs(out["z"].iloc[0]) < 50  # sane magnitude
