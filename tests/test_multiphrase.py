"""MultiPhraseQuery duel (lucene/core/.../search/MultiPhraseQuery.java):
per-slot alternative unions, exact + sloppy, scored with combined-term
idf — engine vs BruteForceIndex, rank AND float32 score identical."""

import pytest

from lucene_solr_ray.search.query import QueryNode, multi_phrase

# reuse the session-scoped corpus/index/searcher/oracle fixtures
from tests.test_build_search import corpus, index, oracle, searcher  # noqa: F401


CASES = [
    # slots, slop
    ([["tool", "assistant"], ["output"]], 0),
    ([["tool"], ["output", "result"]], 0),
    ([["tool", "user"], ["output", "ok"]], 0),
    ([["error", "ok"], ["assistant", "tool"]], 1),
    ([["tool"], ["output"], ["bash", "python"]], 0),
    ([["tool", "zzznotaterm"], ["output"]], 0),  # absent alternative ignored
    ([["zzznotaterm"], ["output"]], 0),  # dead slot → no matches
    ([["tool"], ["output", "zzz2"]], 2),  # sloppy with absent alternative
]


def test_duel_multi_phrase(searcher, oracle):  # noqa: F811
    for i, (slots, slop) in enumerate(CASES):
        node = multi_phrase(slots, slop=slop)
        got = searcher.search_node(node, 10)
        exp = [(d, float(s)) for d, s in oracle.search_node(node, 10)]
        assert got == exp, f"case#{i} {slots} slop={slop}\n got {got[:5]}\n exp {exp[:5]}"


def test_multi_phrase_supersets_plain_phrase(searcher):  # noqa: F811
    """A one-alternative-per-slot multi-phrase equals the plain phrase,
    and adding alternatives can only widen the match set."""
    plain = searcher.search_node(QueryNode("phrase", terms=["tool", "output"]), 1000)
    mp1 = searcher.search_node(multi_phrase([["tool"], ["output"]]), 1000)
    assert plain == mp1
    wide = searcher.search_node(multi_phrase([["tool", "user"], ["output"]]), 1000)
    assert {d for d, _ in mp1} <= {d for d, _ in wide}


def test_multi_phrase_boost(searcher):  # noqa: F811
    base = searcher.search_node(multi_phrase([["tool"], ["output"]]), 5)
    boosted = searcher.search_node(multi_phrase([["tool"], ["output"]], boost=2.0), 5)
    assert [d for d, _ in base] == [d for d, _ in boosted]
    for (_, s1), (_, s2) in zip(base, boosted):
        assert s2 == pytest.approx(2 * s1, rel=1e-6)


SYN_CASES = [
    ["tool", "instrument"],
    ["error", "ok"],
    ["assistant", "user"],
    ["tool", "zzznotaterm"],
    ["zzznotaterm", "zzzalsomissing"],
]


def test_duel_synonym_query(searcher, oracle):  # noqa: F811
    """SynonymQuery: blended df=max / tf=sum scoring, engine vs oracle."""
    from lucene_solr_ray.search.query import QueryNode, synonym_query

    for sim in ("bm25", "classic"):
        for terms in SYN_CASES:
            node = synonym_query(terms)
            got = searcher.search_node(node, 10, similarity=sim)
            oracle.similarity = sim
            exp = [(d, float(s)) for d, s in oracle.search_node(node, 10)]
            oracle.similarity = "bm25"
            assert got == exp, f"{terms} {sim}\n got {got[:3]}\n exp {exp[:3]}"
    # inside a boolean tree
    node = QueryNode(
        "bool",
        clauses=[("MUST", synonym_query(["tool", "instrument"])), ("SHOULD", synonym_query(["error", "ok"]))],
    )
    got = searcher.search_node(node, 10)
    exp = [(d, float(s)) for d, s in oracle.search_node(node, 10)]
    assert got == exp


def test_synonym_differs_from_dismax(searcher):  # noqa: F811
    """SynonymQuery blends (sum tf, one idf); dismax takes the best member
    — on a corpus where both members occur they must disagree."""
    from lucene_solr_ray.search.query import dismax, synonym_query, QueryNode

    t = lambda x: QueryNode("term", terms=[x])  # noqa: E731
    syn = dict(searcher.search_node(synonym_query(["tool", "output"]), 1000))
    dm = dict(searcher.search_node(dismax([t("tool"), t("output")]), 1000))
    assert set(syn) == set(dm)  # same match set (union)
    assert any(abs(syn[d] - dm[d]) > 1e-9 for d in syn)  # different scores
