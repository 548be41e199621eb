"""Bigram-LM perplexity duels: the distributed trainer + vectorized scorer
must match a scalar per-document reference bit-for-bit (same libm logs,
same token-order summation)."""

import math
import re

import duckdb
import numpy as np
import pandas as pd

from lucene_solr_ray.pipelines.lm import (
    lm_bigram_model,
    lm_perplexity,
    train_bigram_lm,
)
from lucene_solr_ray.pipelines.text import TOKEN_RE

SF = "/root/testdata/sf0.001"


def _ref_model(texts):
    c1: dict = {}
    c2: dict = {}
    for t in texts:
        toks = re.findall(TOKEN_RE, t.lower())
        for w in toks:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            k = f"{a} {b}"
            c2[k] = c2.get(k, 0) + 1
    return c1, c2, len(c1)


def _ref_score(text, c1, c2, V):
    toks = re.findall(TOKEN_RE, text.lower())
    nb = max(len(toks) - 1, 0)
    if nb == 0:
        return 0, 0.0, 1.0
    lps = []
    for a, b in zip(toks, toks[1:]):
        k = f"{a} {b}"
        if k in c2:
            lp = math.log((c2[k] + 1.0) / (c1[a] + V))
        elif a in c1:
            lp = math.log(1.0 / (c1[a] + V))
        else:
            lp = math.log(1.0 / V)
        lps.append(lp)
    # the engine's exact segment-reduction kernel (deterministic)
    s = float(np.add.reduceat(np.array(lps, dtype=np.float64), [0])[0])
    ce = -s / nb
    return nb, ce, math.exp(ce)


def test_trainer_matches_reference(ray_session):
    docs = duckdb.sql(f"SELECT text FROM '{SF}/documents.parquet'").df()
    rc1, rc2, rV = _ref_model(docs["text"])
    c1, c2, V = train_bigram_lm(SF)
    assert V == rV
    assert c1 == rc1
    assert c2 == rc2


def test_scorer_bit_exact(ray_session):
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).df()
    rc1, rc2, rV = _ref_model(docs["text"])
    out = lm_perplexity(SF)
    assert len(out) == len(docs)
    for i, (did, text) in enumerate(zip(docs["doc_id"], docs["text"])):
        nb, ce, ppl = _ref_score(text, rc1, rc2, rV)
        row = out.iloc[i]
        assert row["doc_id"] == did
        assert row["n_bigrams"] == nb
        assert row["cross_entropy"] == ce, (did, row["cross_entropy"], ce)
        assert row["ppl"] == ppl


def test_model_head_consistent(ray_session):
    head = lm_bigram_model(SF)
    assert len(head) == 40
    assert (head["c2"].to_numpy()[:-1] >= head["c2"].to_numpy()[1:]).all()
    rc1, rc2, rV = _ref_model(
        duckdb.sql(f"SELECT text FROM '{SF}/documents.parquet'").df()["text"]
    )
    for _, r in head.head(5).iterrows():
        assert rc2[f"{r['w1']} {r['w2']}"] == r["c2"]
        assert r["lp"] == math.log((r["c2"] + 1.0) / (rc1[r["w1"]] + rV))


def test_ccnet_buckets(ray_session):
    """CCNet head/middle/tail mixing: per-lang tertile thresholds from the
    bounded-histogram pass — deterministic, near-balanced, and ordered
    (head ppl <= middle ppl <= tail ppl within every language)."""
    from lucene_solr_ray.pipelines.lm import ccnet_buckets

    out = ccnet_buckets(SF)
    out2 = ccnet_buckets(SF)
    assert (out["bucket"].to_numpy() == out2["bucket"].to_numpy()).all()
    assert set(out["bucket"]) <= {"head", "middle", "tail"}
    docs = duckdb.sql(f"SELECT COUNT(*) FROM '{SF}/documents.parquet'").fetchone()[0]
    assert len(out) == docs
    for lang, g in out.groupby("lang"):
        n = len(g)
        sizes = g["bucket"].value_counts()
        # histogram thresholds are quantile-approximate: tertiles within
        # a small tolerance of n/3 (ties inside one bin move together)
        for b in ("head", "middle", "tail"):
            assert abs(sizes.get(b, 0) - n / 3) <= max(2, 0.15 * n), (lang, dict(sizes))
        h = g.loc[g["bucket"] == "head", "ppl"]
        m = g.loc[g["bucket"] == "middle", "ppl"]
        t = g.loc[g["bucket"] == "tail", "ppl"]
        if len(h) and len(m):
            assert h.max() <= m.min()
        if len(m) and len(t):
            assert m.max() <= t.min()
