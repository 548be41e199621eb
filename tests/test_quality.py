"""quality.py property tests: winnowing vs a naive per-doc reference,
gopher rule non-vacuity, tf-idf keyword selection vs a brute-force pass,
and sample_per_key bounds/determinism (the sf0.001 oracle equality runs
in test_pipelines.py like every gated entry)."""

import re

import numpy as np
import pytest

from lucene_solr_ray.pipelines.quality import (
    G_MAX_WORDS,
    G_MIN_WORDS,
    KW_K,
    SPK_N,
    W_GRAM,
    W_WIN,
    _poly_hash,
    _W_POS_BITS,
    _W_POS_MAX,
    gopher_quality_filter,
    sample_per_key,
    tfidf_keywords,
    winnowing_fingerprint,
)
from lucene_solr_ray.pipelines.text import TOKEN_RE

SF = "/root/testdata/sf0.001"


def _naive_winnow(text: str) -> set[tuple[int, int]]:
    toks = re.findall(TOKEN_RE, text.lower())
    grams = [" ".join(toks[i : i + W_GRAM]) for i in range(len(toks) - W_GRAM + 1)]
    hashes = [_poly_hash(g) for g in grams]
    out = set()
    for w0 in range(len(grams) - W_WIN + 1):
        window = hashes[w0 : w0 + W_WIN]
        m = min(window)
        # rightmost minimal gram in the window (Schleimer et al. robustness
        # tie rule, realized by the composite's (2^20 - pos) low bits)
        j = max(j for j, h in enumerate(window) if h == m)
        out.add((w0 + j + 1, m))  # 1-based gram position
    return out


def test_winnowing_matches_naive(ray_session):
    got = winnowing_fingerprint(SF)
    by_doc = {d: set(zip(g["pos"], g["fp"])) for d, g in got.groupby("doc_id")}
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    checked = 0
    for doc_id, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        exp = _naive_winnow(text)
        assert by_doc.get(doc_id, set()) == exp, f"doc {doc_id}"
        checked += 1
    assert checked > 0
    # composite encoding invariants
    assert (got["pos"] >= 1).all() and (got["pos"] < _W_POS_MAX).all()
    assert (got["fp"] >= 0).all() and (got["fp"] < 1 << (52 - _W_POS_BITS)).all()


def test_gopher_rules_non_vacuous(ray_session):
    out = gopher_quality_filter(SF)
    assert 0 < out["keep"].sum() < len(out)
    # each rule must discriminate (fail for at least one doc) at sf0.001
    for rule in ("ok_words", "ok_stop"):
        assert out[rule].min() == 0 and out[rule].max() == 1, rule
    assert (out.loc[out["ok_words"] == 1, "n_words"].between(G_MIN_WORDS, G_MAX_WORDS)).all()


def test_tfidf_keywords_match_naive(ray_session):
    import math

    import pyarrow.parquet as pq

    got = tfidf_keywords(SF)
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    toks = {
        d: re.findall(TOKEN_RE, x.lower())
        for d, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    }
    n = len(toks)
    df: dict[str, int] = {}
    for ws in toks.values():
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    for doc_id, g in got.groupby("doc_id"):
        ws = toks[doc_id]
        tf: dict[str, int] = {}
        for w in ws:
            tf[w] = tf.get(w, 0) + 1
        scored = sorted(
            ((t_, c * math.log(n / df[t_])) for t_, c in tf.items()),
            key=lambda p: (-p[1], p[0]),
        )[:KW_K]
        assert list(zip(g["token"], g["score"])) == scored, f"doc {doc_id}"


def test_sample_per_key_bounds_and_determinism(ray_session):
    a = sample_per_key(SF)
    b = sample_per_key(SF)
    assert a.equals(b)
    sizes = a.groupby(["lang", "source"]).size()
    assert (sizes <= SPK_N).all() and len(a) > 0


def test_chunk_documents_invariants(ray_session):
    from lucene_solr_ray.pipelines.quality import CHUNK_STRIDE, CHUNK_TOKENS, chunk_documents

    out = chunk_documents(SF)
    assert len(out) > 0
    for doc_id, g in out.groupby("doc_id"):
        g = g.sort_values("chunk_idx")
        assert list(g["chunk_idx"]) == list(range(1, len(g) + 1))
        assert list(g["start_tok"]) == [1 + (i * CHUNK_STRIDE) for i in range(len(g))]
        # every chunk non-empty, capped at CHUNK_TOKENS, text token count matches
        assert (g["n_tok"] >= 1).all() and (g["n_tok"] <= CHUNK_TOKENS).all()
        assert (g["chunk_text"].str.split().str.len() == g["n_tok"]).all()
        # full coverage: last chunk reaches the doc's final token
        last = g.iloc[-1]
        n_total = int(last["start_tok"] + last["n_tok"] - 1)
        assert n_total >= int(g.iloc[0]["n_tok"])


def test_source_token_kl_properties(ray_session):
    from lucene_solr_ray.pipelines.quality import source_token_kl

    out = source_token_kl(SF)
    assert len(out) > 0 and (out["cnt"] > 0).all()
    # Gibbs' inequality: per-source KL = Σ contrib ≥ 0 (tiny float slack)
    for src, g in out.groupby("source"):
        assert float(g["contrib"].sum()) >= -1e-12, src
    # contributions are non-trivial (sources differ from the corpus mix)
    assert out["contrib"].abs().max() > 0


def test_interleave_order_properties(ray_session):
    """position is a permutation; round-robin property: the first
    |sources| positions are rank-0 docs, one per source, in source order."""
    from lucene_solr_ray.pipelines.quality import interleave_order

    out = interleave_order("/root/testdata/sf0.001")
    pos = out["position"].to_numpy()
    assert sorted(pos.tolist()) == list(range(len(out)))
    head = out.sort_values("position").head(out["source"].nunique())
    assert (head["rnk"].to_numpy() == 0).all()
    assert head["source"].tolist() == sorted(out["source"].unique())
    # within a source, schedule order == doc_id order
    for s, g in out.groupby("source"):
        gg = g.sort_values("position")
        assert gg["doc_id"].is_monotonic_increasing
