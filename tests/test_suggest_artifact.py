"""Persisted suggester artifact: build once, pruned lookups, staleness.

Oracle: brute-force token cf over the same documents (pandas), compared
for both prefix and infix lookups.  Pruning is asserted structurally —
the artifact's row-group statistics must exclude most groups for a
narrow prefix range — and freshness via the source fingerprint.
"""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_ray.index.suggest import GRAM_N, Suggester, build_suggester, matching_row_groups

TOKEN_RE = r"[a-z0-9_]+"


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    """Tiny documents table with a skewed, known vocabulary."""
    rng = np.random.default_rng(11)
    vocab = [f"sug{c}{i:03d}" for c in "abc" for i in range(40)] + ["coin", "joint", "pointer", "sugar"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 30)))
        for _ in range(400)
    ]
    d = tmp_path_factory.mktemp("sugg")
    pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts}).to_parquet(d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def artifact(ray_session, sf_dir, tmp_path_factory):
    return build_suggester(sf_dir, out_dir=tmp_path_factory.mktemp("art") / "sugg_idx")


def brute_cf(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = docs["text"].str.lower().str.findall(TOKEN_RE).explode().dropna()
    return toks.value_counts().rename_axis("token").reset_index(name="cf")


def test_prefix_lookup_matches_brute_force(artifact, sf_dir):
    s = Suggester(artifact)
    cf = brute_cf(sf_dir)
    for prefix in ["suga", "sugb", "sug", "co", "zzz"]:
        want = (
            cf[cf["token"].str.startswith(prefix)]
            .sort_values(["cf", "token"], ascending=[False, True])
            .head(8)
            .reset_index(drop=True)
        )
        got = s.lookup(prefix, 8)
        pd.testing.assert_frame_equal(
            got.astype({"cf": "int64"}), want.astype({"cf": "int64"}), check_dtype=False
        )


def test_infix_lookup_matches_brute_force(artifact, sf_dir):
    s = Suggester(artifact)
    cf = brute_cf(sf_dir)
    for sub in ["oin", "uga", "ga", "int"]:  # incl. one below the gram floor
        want = (
            cf[cf["token"].str.contains(sub, regex=False)]
            .sort_values(["cf", "token"], ascending=[False, True])
            .head(8)
            .reset_index(drop=True)
        )
        got = s.lookup_infix(sub, 8)
        pd.testing.assert_frame_equal(
            got.astype({"cf": "int64"}), want.astype({"cf": "int64"}), check_dtype=False
        )


def test_row_group_pruning_is_real(ray_session, sf_dir, tmp_path, monkeypatch):
    """With a forced tiny row-group size the token-sorted file must let
    parquet statistics exclude most groups for a narrow prefix range."""
    import lucene_solr_ray.index.suggest as sg

    monkeypatch.setattr(sg, "ROW_GROUP_SIZE", 8)
    d = build_suggester(sf_dir, out_dir=tmp_path / "small_rg", force=True)
    hit, total = matching_row_groups(d / "terms.parquet", "token", "sugb", "sugb\U0010ffff")
    assert total >= 10, total  # the tiny row groups actually took effect
    # 40 'sugb*' tokens / 8-row groups → at most ~6 touched (5 + boundary),
    # i.e. pruning excludes the majority of the file
    assert hit <= 40 // 8 + 2 and hit < total // 2, (hit, total)
    # and the pruned read still answers correctly
    got = sg.Suggester(d).lookup("sugb", 8)
    assert got["token"].str.startswith("sugb").all() and len(got) == 8


def test_stale_artifact_rebuilds_on_source_change(ray_session, sf_dir, tmp_path):
    out = tmp_path / "fresh"
    d = build_suggester(sf_dir, out_dir=out)
    n0 = Suggester(d).manifest["n_terms"]
    # unchanged source → reuse (manifest identity)
    assert build_suggester(sf_dir, out_dir=out) == d
    # content change (new source dir, same out_dir) → rebuild picks up the
    # new vocabulary instead of serving the stale artifact
    src = pd.read_parquet(f"{sf_dir}/documents.parquet")
    extra = pd.concat(
        [src, pd.DataFrame({"doc_id": [99999], "text": ["zzznewterm zzznewterm"]})]
    )
    sf2 = tmp_path / "sf2"
    sf2.mkdir()
    extra.to_parquet(sf2 / "documents.parquet")
    d3 = build_suggester(str(sf2), out_dir=out)
    s = Suggester(d3)
    assert s.manifest["n_terms"] == n0 + 1
    assert s.lookup("zzznew", 3)["token"].tolist() == ["zzznewterm"]


def test_fuzzy_lookup(ray_session, sf_dir, artifact):
    """FuzzySuggester: prefix within max_edits completes; brute-force dual."""
    from lucene_solr_ray.index.suggest import _levenshtein

    s = Suggester(artifact)
    cf = brute_cf(sf_dir)
    prefix, me = "suha", 1  # one substitution inside the "suga…" prefix
    L = len(prefix)
    exp = cf[
        cf["token"].str.startswith(prefix[0])
        & cf["token"].map(
            lambda t: min(_levenshtein(t[:w], prefix) for w in range(L - me, L + me + 1)) <= me
        )
    ]
    exp = exp.sort_values(["cf", "token"], ascending=[False, True]).head(8).reset_index(drop=True)
    got = s.lookup_fuzzy(prefix, 8, max_edits=me)
    assert got["token"].tolist() == exp["token"].tolist()
    assert got["cf"].tolist() == exp["cf"].tolist()
    assert got["token"].str.startswith("sug").all()  # real completions
    # minFuzzyLength: short inputs stay exact-prefix
    assert s.lookup_fuzzy("su", 5).equals(s.lookup("su", 5))
    # no candidate within budget → empty
    assert len(s.lookup_fuzzy("sxxx", 5, max_edits=1)) == 0


def test_gated_pipelines_registered():
    from lucene_solr_ray.pipelines import REGISTRY

    assert REGISTRY["suggest_artifact_prefix"].sql is not None
    assert REGISTRY["suggest_artifact_infix"].sql is not None
    assert REGISTRY["suggest_artifact_fuzzy"].sql is not None


def test_context_filtered_lookups(ray_session):
    """Prefix AND infix lookups with a contexts filter == brute counts
    restricted to the selected contexts (AnalyzingInfixSuggester contexts)."""
    import duckdb

    from lucene_solr_ray.index.suggest import Suggester, build_suggester

    sf = "/root/testdata/sf0.001"
    s = Suggester(build_suggester(sf))

    def brute(where_tok: str, langs: tuple) -> pd.DataFrame:
        return duckdb.sql(
            f"""SELECT token, CAST(COUNT(*) AS BIGINT) AS cf FROM (
                  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS token
                  FROM read_parquet('{sf}/documents.parquet') WHERE lang IN {langs!r}
                ) WHERE {where_tok}
                GROUP BY token ORDER BY cf DESC, token LIMIT 8"""
        ).df()

    got = s.lookup("s", 8, contexts=["en"])
    exp = brute("token LIKE 's%'", ("en",))
    assert got["token"].tolist() == exp["token"].tolist()
    assert got["cf"].tolist() == exp["cf"].tolist()

    got_i = s.lookup_infix("oin", 8, contexts=["en", "de"])
    exp_i = brute("contains(token, 'oin')", ("en", "de"))
    assert got_i["token"].tolist() == exp_i["token"].tolist()
    assert got_i["cf"].tolist() == exp_i["cf"].tolist()


def test_contexts_refused_without_context_column(artifact):
    """An artifact built from a source WITHOUT the context field refuses
    context-filtered lookups loudly instead of answering wrong."""
    s = Suggester(artifact)
    with pytest.raises(ValueError, match="without contexts"):
        s.lookup("sug", 5, contexts=["en"])
    with pytest.raises(ValueError, match="without contexts"):
        s.lookup_infix("oin", 5, contexts=["en"])


def test_freetext_artifact_lookup_and_refusal(ray_session, tmp_path):
    """Persisted bigram-LM lookup (FreeTextSuggester): artifact answers
    match the recompute pipeline; a pre-format-3 artifact refuses with a
    clear error instead of serving garbage."""
    import json

    from lucene_solr_ray.index.suggest import Suggester, build_suggester
    from lucene_solr_ray.pipelines.text import FREETEXT_CTX, suggest_freetext

    sf = "/root/testdata/sf0.001"
    d = build_suggester(sf, out_dir=tmp_path / "art", force=True)
    s = Suggester(d)
    got = s.lookup_freetext(FREETEXT_CTX, 8)
    exp = suggest_freetext(sf)
    assert got["next"].tolist() == exp["next"].tolist()
    assert got["cnt"].tolist() == exp["cnt"].tolist()
    # unseen context: stupid-backoff serves top unigrams by default, and
    # backoff=False answers empty (no error either way)
    assert len(s.lookup_freetext("zzzznotatoken")) > 0
    assert len(s.lookup_freetext("zzzznotatoken", backoff=False)) == 0
    # format downgrade → refusal
    man = json.loads((d / "manifest.json").read_text())
    man["format"] = 2
    man.pop("n_bigrams", None)
    (d / "manifest.json").write_text(json.dumps(man))
    import pytest as _pt

    with _pt.raises(ValueError, match="bigram"):
        Suggester(d).lookup_freetext(FREETEXT_CTX)


def test_blended_infix_lookup(artifact, sf_dir):
    """BlendedInfixSuggester: position-weighted bigram suggestions — the
    blending duel recomputes scores from the artifact's own bigram table."""
    from pathlib import Path

    import pyarrow.parquet as _pq

    s = Suggester(artifact)
    sub = s.lookup_infix("a", 1)["token"].iloc[0][:3]  # a live substring
    for blender, coef in (("linear", (1.0, 0.9)), ("reciprocal", (1.0, 0.5))):
        got = s.lookup_blended(sub, 10, blender=blender)
        big = _pq.read_table(Path(artifact) / "bigrams.parquet").to_pandas()
        m0 = big["ctx"].str.contains(sub, regex=False)
        m1 = big["next"].str.contains(sub, regex=False)
        ref = big[m0 | m1].copy()
        ref["position"] = np.where(m0[m0 | m1], 0, 1)
        ref["score"] = ref["cf"].to_numpy(np.float64) * np.where(
            ref["position"] == 0, coef[0], coef[1]
        )
        ref["suggestion"] = ref["ctx"].astype(str) + " " + ref["next"].astype(str)
        ref = ref.sort_values(["score", "suggestion"], ascending=[False, True]).head(10)
        assert list(got["suggestion"]) == list(ref["suggestion"]), blender
        assert np.allclose(got["score"], ref["score"]) and (got["score"].to_numpy() == ref["score"].to_numpy()).all()
    # a first-word match outranks the same-cf second-word match under linear
    g = s.lookup_blended(sub, 50, blender="linear")
    if (g["position"] == 0).any() and (g["position"] == 1).any():
        p0 = g[g["position"] == 0].iloc[0]
        same = g[(g["position"] == 1) & (g["cf"] == p0["cf"])]
        if len(same):
            assert p0["score"] > same.iloc[0]["score"]
    # no match → empty frame with the contract columns
    empty = s.lookup_blended("zzzzqqq", 5)
    assert len(empty) == 0 and list(empty.columns) == ["suggestion", "cf", "position", "score"]
