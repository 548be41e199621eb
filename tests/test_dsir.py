"""DSIR importance-resampling oracles (Xie et al., 2023 — the hashed
n-gram importance estimator; explicit-vocab variant strict-gated via
`dsir_model`).  The weight duel recomputes every per-token log-ratio with
scalar math.log and reduces with the SAME np.add.reduceat kernel the
engine uses (the lm.py reduceat gotcha: reduceat segment sums are not a
sequential += loop — pin the kernel, not the association)."""

import math

import numpy as np
import pandas as pd
import pytest

from lucene_solr_ray.pipelines.dsir import (
    TARGET_LANG,
    _log_ratio,
    dsir_resample,
    dsir_weights,
    hashed_dsir_weights,
    train_dsir,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    return pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]).sort_values(
        "doc_id"
    ).reset_index(drop=True)


@pytest.fixture(scope="module")
def model(ray_session):
    return train_dsir(SF)


def _ref_weights(docs: pd.DataFrame, model) -> pd.DataFrame:
    """Scalar per-token reference, engine-identical reduction kernel."""
    import re

    counts, tt, tr, v = model
    lr_of = {k: _log_ratio(a, b, tt, tr, v) for k, (a, b) in counts.items()}
    oov = _log_ratio(0, 0, tt, tr, v)
    rx = re.compile("[a-z0-9_]+")
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = rx.findall(text.lower())
        lrs = np.array([lr_of.get(t, oov) for t in toks], dtype=np.float64)
        logw = float(np.add.reduceat(lrs, [0])[0]) if lrs.size else 0.0
        rows.append((doc_id, len(toks), logw))
    out = pd.DataFrame(rows, columns=["doc_id", "n_tokens", "logw"])
    out["avg_logw"] = np.where(out["n_tokens"] > 0, out["logw"] / out["n_tokens"], 0.0)
    return out


def test_model_counts_exact(docs, model):
    """Trained counts equal a pandas ground truth (bucketed shuffle is
    exact; truncation never binds at this scale)."""
    import re

    rx = re.compile("[a-z0-9_]+")
    ct: dict = {}
    cr: dict = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        for t in rx.findall(text.lower()):
            cr[t] = cr.get(t, 0) + 1
            if lang == TARGET_LANG:
                ct[t] = ct.get(t, 0) + 1
    counts, tt, tr, v = model
    assert v == len(cr)
    assert tr == sum(cr.values())
    assert tt == sum(ct.values())
    assert len(counts) == len(cr)
    for k, (a, b) in counts.items():
        assert a == ct.get(k, 0) and b == cr[k]


def test_weights_bit_exact(docs, model):
    got = dsir_weights(SF)
    exp = _ref_weights(docs, model)
    assert len(got) == len(exp)
    assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    assert (got["n_tokens"].to_numpy() == exp["n_tokens"].to_numpy()).all()
    assert (got["logw"].to_numpy() == exp["logw"].to_numpy()).all()  # bit-exact
    assert (got["avg_logw"].to_numpy() == exp["avg_logw"].to_numpy()).all()


def test_target_language_scores_higher(docs):
    w = dsir_weights(SF).merge(docs[["doc_id", "lang"]], on="doc_id")
    en = w.loc[w["lang"] == TARGET_LANG, "avg_logw"].mean()
    other = w.loc[w["lang"] != TARGET_LANG, "avg_logw"].mean()
    assert en > other  # importance weights favor the target slice


def test_resample_selects_top_fraction(docs):
    top = dsir_resample(SF, frac=0.2)
    w = dsir_weights(SF)
    k = max(1, int(len(w) * 0.2))
    assert len(top) == k
    expect = set(
        w.sort_values(["avg_logw", "doc_id"], ascending=[False, True]).head(k)["doc_id"]
    )
    assert set(top["doc_id"]) == expect
    # resampling enriches the target language
    langs = docs.set_index("doc_id")["lang"]
    frac_en_top = (langs.loc[top["doc_id"]] == TARGET_LANG).mean()
    frac_en_all = (docs["lang"] == TARGET_LANG).mean()
    assert frac_en_top >= frac_en_all


def test_hashed_estimator(docs):
    """Hashed-feature DSIR (the paper's estimator): deterministic, and
    still separates the target slice at a modest hash dimension."""
    w1 = hashed_dsir_weights(SF, hash_dim=1024)
    w2 = hashed_dsir_weights(SF, hash_dim=1024)
    assert (w1["logw"].to_numpy() == w2["logw"].to_numpy()).all()
    m = w1.merge(docs[["doc_id", "lang"]], on="doc_id")
    en = m.loc[m["lang"] == TARGET_LANG, "logw"].mean()
    other = m.loc[m["lang"] != TARGET_LANG, "logw"].mean()
    assert en > other
