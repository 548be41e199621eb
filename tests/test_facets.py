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
