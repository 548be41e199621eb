"""ReRankQParserPlugin duel: first-pass top-N + weight × rerank-query
score, combined in float64 then cast float32 — engine (second-pass doc
list shipped to shards) vs brute-force reference."""

import numpy as np

from tests.test_build_search import corpus, index, oracle, searcher  # noqa: F401

CASES = [
    ("tool output", '"tool output"', 2.0, 40),
    ("assistant", "+role:tool", 3.0, 30),
    ("error ok", "bash", 0.5, 50),
    ("tool", "zzznotaterm", 2.0, 25),  # rerank query matches nothing
]


def _expected(q, rq, w, n, k, oracle):  # noqa: F811
    first = [(d, float(s)) for d, s in oracle.search(q, n)]
    if not first:
        return []
    rr = dict(oracle.search(rq, 10**9))
    docs = np.array([d for d, _ in first], dtype=np.int64)
    comb = np.array(
        [s + (w * float(rr[d]) if d in rr else 0.0) for d, s in first], dtype=np.float64
    ).astype(np.float32)
    order = np.lexsort((docs, -comb))[:k]
    return [(int(docs[i]), float(comb[i])) for i in order]


def test_duel_rerank(searcher, oracle):  # noqa: F811
    for q, rq, w, n in CASES:
        got = searcher.rerank_query(q, rq, k=10, rerank_docs=n, weight=w)
        exp = _expected(q, rq, w, n, 10, oracle)
        assert got == exp, f"{q!r} rq={rq!r}\n got {got[:5]}\n exp {exp[:5]}"


def test_rerank_dispatch(searcher):  # noqa: F811
    got = searcher.query(
        "{!rerank reRankQuery='\"tool output\"' reRankDocs=40 reRankWeight=2.5}tool output", 10
    )
    assert got == searcher.rerank_query(
        "tool output", '"tool output"', k=10, rerank_docs=40, weight=2.5
    )


def test_rerank_zero_weight_keeps_first_pass(searcher):  # noqa: F811
    base = searcher.search("tool output", 10)
    rr = searcher.rerank_query("tool output", "bash", k=10, rerank_docs=10, weight=0.0)
    assert [d for d, _ in rr] == [d for d, _ in base]
