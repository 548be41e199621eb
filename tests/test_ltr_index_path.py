"""LTR on the index path: feature logging (`fl=[features]`,
LTRFeatureLoggerTransformerFactory) and `{!ltr}`-style model rerank
(LTRQParserPlugin) — features gathered with one bounded scatter over the
numeric doc-values, model scoring vs hand computation."""

import numpy as np

from lucene_solr_ray.search.ltr import LinearModel

from tests.test_build_search import corpus, index, oracle, searcher  # noqa: F811,F401


def test_feature_logging_values(searcher, corpus):  # noqa: F811
    _, full = corpus
    turn = full.column("turn_idx").to_numpy()
    logged = searcher.ltr_features("tool output", 10, {"turn_idx": "turn_idx", "ti2": "mul(turn_idx,2)"})
    base = searcher.search("tool output", 10)
    assert [(d, s) for d, s, _ in logged] == base
    for d, s, row in logged:
        assert row["original_score"] == s
        assert row["turn_idx"] == float(turn[d])
        assert row["ti2"] == 2.0 * turn[d]


def test_rerank_ltr_linear(searcher):  # noqa: F811
    """A linear model over (original_score, turn_idx) reranks exactly as
    the hand-computed weighted sum over the logged features."""
    model = LinearModel({"original_score": 1.0, "turn_idx": -0.05})
    got = searcher.rerank_ltr("assistant answer", model, rerank_docs=40, k=10)
    logged = searcher.ltr_features("assistant answer", 40, {"turn_idx": "turn_idx"})
    docs = np.array([d for d, _, _ in logged], dtype=np.int64)
    scores = np.array([r["original_score"] - 0.05 * r["turn_idx"] for _, _, r in logged])
    order = np.lexsort((docs, -scores))[:10]
    exp = [(int(docs[i]), float(scores[i])) for i in order]
    assert got == exp
    # the model actually changes the ranking vs plain BM25 (non-vacuous)
    plain = [d for d, _ in searcher.search("assistant answer", 10)]
    assert [d for d, _ in got] != plain or len(plain) < 2


def test_empty_query_logs_nothing(searcher):  # noqa: F811
    assert searcher.ltr_features("zzznotaterm", 5) == []
    assert searcher.rerank_ltr("zzznotaterm", LinearModel({"original_score": 1.0}), k=5) == []
