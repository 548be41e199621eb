"""CoveringQuery duel (lucene/sandbox/.../search/CoveringQuery.java):
a doc matches when at least dv[field] of the SHOULD sub-queries match;
score = sum of the matching sub-query scores.  Engine vs a brute-force
per-doc reference, rank AND float32 score identical."""

import numpy as np

from tests.test_build_search import corpus, index, oracle, searcher  # noqa: F401

CASES = [
    ["tool", "output", "error"],
    ["tool output", "assistant", "error", "role:tool"],
    ["to*", "output", "assistant"],  # with multi-term rewrite in a clause
]


def _expected(queries, corpus, oracle, k):  # noqa: F811
    from lucene_solr_ray.search.query import parse_query, rewrite

    _, full = corpus
    turn = full.column("turn_idx").to_numpy().astype(np.float64)
    if not hasattr(oracle, "_vocab"):
        oracle._vocab = np.array(sorted(oracle.df), dtype=object)
    nodes = [rewrite(parse_query(q), oracle._vocab) for q in queries]
    nodes = [n for n in nodes if n is not None]
    hits = []
    for doc in range(oracle.N):
        cnt, total = 0, 0.0
        for n in nodes:
            m, s = oracle.score_query(n, doc)
            if m:
                cnt += 1
                total += s
        if cnt >= turn[doc]:
            hits.append((doc, np.float32(total)))
    if not hits:
        return []
    docs = np.array([d for d, _ in hits], dtype=np.int64)
    scores = np.array([s for _, s in hits], dtype=np.float32)
    order = np.lexsort((docs, -scores))[:k]
    return [(int(docs[i]), float(scores[i])) for i in order]


def test_duel_covering(searcher, oracle, corpus):  # noqa: F811
    for queries in CASES:
        got = searcher.search_covering(queries, "turn_idx", 10)
        exp = _expected(queries, corpus, oracle, 10)
        assert got == exp, f"{queries!r}\n got {got[:5]}\n exp {exp[:5]}"


def test_covering_empty_and_errors(searcher):  # noqa: F811
    assert searcher.search_covering(["the of and"], "turn_idx", 10) == []
    import pytest

    with pytest.raises(KeyError):
        searcher.search_covering(["tool"], "no_such_dv", 10)
