"""JSON facet module unit tests beyond the 2-level gated pipelines:
3-level nesting, sort/limit variants, query-in-the-middle trees."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_ray.pipelines.facets import compute_json_facet

SF = "/root/testdata/sf0.001"


def test_three_level_terms_tree(ray_session):
    """terms(lang) × terms(source) × range(n_chars) with counts at every
    level, verified against a pandas recomputation."""
    spec = {
        "type": "terms", "field": "lang", "limit": 2, "sort": "count desc",
        "key": "lang", "count_key": "n0",
        "facet": {
            "src": {
                "type": "terms", "field": "source", "limit": 2, "sort": "count desc",
                "key": "source", "count_key": "n1",
                "facet": {
                    "len": {
                        "type": "range", "field": "n_chars",
                        "start": 0.0, "end": 100000.0, "gap": 50000.0,
                        "key": "len_bucket", "count_key": "n2", "sort": "index asc",
                    }
                },
            }
        },
    }
    out = compute_json_facet(SF, "documents", spec)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "source", "n_chars"])
    top_langs = docs["lang"].value_counts().index[:2].tolist()
    assert set(out["lang"]) <= set(top_langs)
    # spot-check one full path's count
    r = out.iloc[0]
    exp = len(
        docs[
            (docs["lang"] == r["lang"])
            & (docs["source"] == r["source"])
            & (docs["n_chars"] // 50000 == r["len_bucket"] // 50000)
        ]
    )
    assert r["n2"] == exp
    # level counts are consistent: n0 >= n1 >= n2 along every row
    assert (out["n0"] >= out["n1"]).all() and (out["n1"] >= out["n2"]).all()


def test_metric_sort_and_avg(ray_session):
    spec = {
        "type": "terms", "field": "lang", "limit": 3, "sort": "avg_len desc",
        "key": "lang", "count_key": "n",
        "facet": {"avg_len": {"type": "avg", "field": "n_chars"}},
    }
    out = compute_json_facet(SF, "documents", spec)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "n_chars"])
    exp = docs.groupby("lang")["n_chars"].mean().sort_values(ascending=False).head(3)
    # buckets are ordered by the actual AVERAGE (not the sum partial)
    assert out["lang"].tolist() == exp.index.tolist()
    got = dict(zip(out["lang"], out["avg_len"]))
    for lang, v in got.items():
        assert v == pytest.approx(docs[docs["lang"] == lang]["n_chars"].mean())


def test_refinement_changes_unrefined_answer(ray_session):
    """Skewed fixture where merged TRUNCATED partials rank the wrong bucket
    first; the refinement round (exact counts over the candidate union)
    corrects it — the FacetComponent two-phase necessity proof."""
    import pandas as pd
    import ray.data as rd

    from lucene_solr_ray.pipelines.facets import _facet_refined_counts

    def block(counts):
        rows = [v for v, n in counts.items() for _ in range(n)]
        return pd.DataFrame({"f": rows})

    blocks = [
        block({"A": 10, "X": 9}),
        block({"B": 10, "X": 9}),
        block({"X": 10, "C": 9}),
    ]
    factory = lambda: rd.from_pandas([b.copy() for b in blocks])
    final, unrefined = _facet_refined_counts(factory, "f", limit=1, k=1)
    # truncated phase-1 merge is WRONG (ties at 10, 'A' wins by term order)
    assert unrefined.iloc[0]["f"] == "A" and unrefined.iloc[0]["n"] == 10
    # the refinement round recovers the true winner with its exact count
    assert final.iloc[0]["f"] == "X" and final.iloc[0]["n"] == 28


def test_json_facet_allbuckets_and_missing(ray_session):
    """allBuckets + missing sentinels: outside the limit, missing rows in
    __missing__ only, __all__ excludes them; metrics/sub-facets computed
    for both."""
    import duckdb

    from lucene_solr_ray.pipelines.facets import json_facet_allbuckets

    out = json_facet_allbuckets(SF)
    assert list(out["status"]).count("__all__") == 1
    assert list(out["status"]).count("__missing__") == 1
    con = duckdb.connect()
    n_all, n_miss, n_top = con.execute(
        f"""SELECT SUM(CASE WHEN o_orderstatus != 'P' THEN 1 ELSE 0 END),
                   SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END),
                   (SELECT COUNT(*) FROM read_parquet('{SF}/orders.parquet')
                    WHERE o_orderstatus != 'P'
                    GROUP BY o_orderstatus ORDER BY COUNT(*) DESC LIMIT 1)
            FROM read_parquet('{SF}/orders.parquet')"""
    ).fetchone()
    by = out.set_index("status")["n_status"]
    assert int(by["__all__"]) == int(n_all)
    assert int(by["__missing__"]) == int(n_miss)
    ranked = [s for s in out["status"] if not s.startswith("__")]
    assert len(ranked) == 1  # limit 1 applies to ranked buckets only
    assert int(by[ranked[0]]) == int(n_top)


def test_json_facet_limit_zero(ray_session):
    """limit:0 yields zero ranked buckets (sentinels still appear)."""
    from lucene_solr_ray.pipelines.facets import compute_json_facet

    spec = {
        "type": "terms",
        "field": "o_orderstatus",
        "limit": 0,
        "key": "status",
        "count_key": "n",
        "facet": {},
    }
    out = compute_json_facet(SF, "orders", spec)
    assert len(out) == 0


def test_relatedness_metric_sign_and_magnitude(ray_session):
    """relatedness() (RelatednessAgg / Semantic Knowledge Graph z-score):
    buckets where the foreground is over-represented score positive,
    under-represented negative, and a bucket matching the background
    rate scores ~0; the z-score matches a direct recomputation."""
    import math

    from lucene_solr_ray.pipelines.facets import json_facet_relatedness

    out = json_facet_relatedness(SF)
    assert list(out.columns) == ["bucket", "fg_count", "bg_count", "relatedness"]
    bg_size = int(out["bg_count"].sum())
    fg_size = int(out["fg_count"].sum())
    for _, r in out.iterrows():
        fg_pop = r["fg_count"] / fg_size
        bg_pop = r["bg_count"] / bg_size
        z = (fg_pop - bg_pop) / math.sqrt(bg_pop * (1.0 - bg_pop) / fg_size)
        assert r["relatedness"] == z, r["bucket"]
        # sign tracks over/under-representation of the foreground
        if r["fg_count"] / max(r["bg_count"], 1) > fg_size / bg_size:
            assert r["relatedness"] > 0
    # ordering: most fg-enriched bucket first
    assert out["relatedness"].is_monotonic_decreasing


def test_percentile_facet_metric(ray_session):
    """t-digest percentile metric in the facet tree: within 1% of the
    exact quantile per bucket, and deterministic across runs."""
    import numpy as np
    import pandas as pd

    from lucene_solr_ray.pipelines.facets import json_facet_percentile

    out = json_facet_percentile(SF)
    out2 = json_facet_percentile(SF)
    pd.testing.assert_frame_equal(out, out2)  # deterministic merge order
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"])
    for _, r in out.iterrows():
        vals = li[li["l_returnflag"] == r["bucket"]]["l_extendedprice"].to_numpy()
        for q, col in [(0.5, "p50"), (0.9, "p90")]:
            exact = np.quantile(vals, q)
            assert abs(r[col] - exact) <= 0.01 * abs(exact), (r["bucket"], col, r[col], exact)


def test_unique_and_hll_facet_metrics(ray_session):
    """unique() is exact per bucket; hll() is within 5% of exact."""
    import pandas as pd

    from lucene_solr_ray.pipelines.facets import json_facet_percentile, json_facet_unique

    uq = json_facet_unique(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    exact = ev.groupby("event_type")["user_id"].nunique()
    for _, r in uq.iterrows():
        assert r["uniq_users"] == exact[r["bucket"]], r["bucket"]

    pc = json_facet_percentile(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_partkey"])
    ex = li.groupby("l_returnflag")["l_partkey"].nunique()
    for _, r in pc.iterrows():
        e = ex[r["bucket"]]
        assert abs(r["hll_parts"] - e) <= max(2, 0.05 * e), (r["bucket"], r["hll_parts"], e)


# ---------------------------------------------------------------------------
# Classic FacetComponent: pivot + interval facets


def test_interval_parser():
    from lucene_solr_ray.pipelines.facets import parse_interval

    assert parse_interval("[0,10)") == (0.0, 10.0, True, False)
    assert parse_interval("(0,10]") == (0.0, 10.0, False, True)
    assert parse_interval("[ -5.5 , 5.5 ]") == (-5.5, 5.5, True, True)
    lo, hi, li, hi_inc = parse_interval("[*,0)")
    assert lo == -np.inf and li  # * endpoints normalize to inclusive
    lo, hi, li, hi_inc = parse_interval("(0,*]")
    assert hi == np.inf and hi_inc
    assert parse_interval("[3,3]") == (3.0, 3.0, True, True)  # single point
    for bad in ("0,10", "[10,0]", "(3,3]", "[1;2]", "[x,2]"):
        with pytest.raises(ValueError):
            parse_interval(bad)


def test_interval_facet_overlap(ray_session):
    """Overlapping intervals: every row is counted in EACH containing
    interval (IntervalFacets semantics, unlike range facets)."""
    from lucene_solr_ray.pipelines.facets import interval_facet

    out = interval_facet(SF, "customer", "c_acctbal", ["[*,*]", "[0,*]", "[*,0)"])
    n = dict(zip(out["interval"], out["n"]))
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_acctbal"])
    assert n["[*,*]"] == len(cust)
    assert n["[0,*]"] + n["[*,0)"] == len(cust)
    assert n["[0,*]"] == int((cust["c_acctbal"] >= 0).sum())


def test_pivot_facet_levels_and_mincount(ray_session):
    """Pivot counts at each level match pandas; mincount prunes BOTH the
    leaf and any ancestor below the threshold."""
    from lucene_solr_ray.pipelines.facets import pivot_facet

    out = pivot_facet(SF, "orders", ["o_orderpriority", "o_orderstatus"], "o_totalprice", mincount=1)
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])
    lvl1 = orders.groupby("o_orderpriority").size()
    lvl2 = orders.groupby(["o_orderpriority", "o_orderstatus"]).size()
    assert len(out) == len(lvl2)
    for _, r in out.iterrows():
        assert r["n_o_orderpriority"] == lvl1[r["o_orderpriority"]]
        assert r["n_o_orderstatus"] == lvl2[(r["o_orderpriority"], r["o_orderstatus"])]
    # a mincount above the rarest leaf prunes it
    mc = int(lvl2.max())
    pruned = pivot_facet(SF, "orders", ["o_orderpriority", "o_orderstatus"], None, mincount=mc)
    assert len(pruned) == int((lvl2 >= mc).sum())
    assert "cents" not in pruned.columns


def test_range_facet_include_flag_combinations(ray_session):
    """Flag semantics vs a direct numpy reference: lower+upper double-counts
    boundaries, hardend=False extends the last bucket a full gap, neither
    lower nor edge makes before inclusive of start."""
    import pyarrow.parquet as pq

    from lucene_solr_ray.pipelines.facets import range_facet_include

    sf = "/root/testdata/sf0.001"
    v = pq.read_table(f"{sf}/orders.parquet", columns=["o_totalprice"]).column(0).to_numpy()
    start, end, gap = 50000.0, 330000.0, 100000.0

    # all flags: every bucket [lo, hi] → boundary values may count twice
    out = range_facet_include(sf, include=frozenset({"all"}), hardend=True)
    got = dict(zip(out["bucket"], out["n"]))
    assert got["50000.0"] == int(((v >= 50000) & (v <= 150000)).sum())
    assert got["150000.0"] == int(((v >= 150000) & (v <= 250000)).sum())
    assert got["__before__"] == int((v <= start).sum())  # outer ⊂ all
    # soft end: last bucket runs to start+3*gap=350000, after starts there
    soft = range_facet_include(sf, include=frozenset(), hardend=False)
    gs = dict(zip(soft["bucket"], soft["n"]))
    assert gs["250000.0"] == int(((v >= 250000) & (v < 350000)).sum())
    assert gs["__after__"] == int((v >= 350000).sum())  # neither upper nor edge → inclusive
    assert gs["__before__"] == int((v <= start).sum())  # neither lower nor edge → inclusive
    assert gs["__between__"] == int(((v > start) & (v < 350000)).sum())
