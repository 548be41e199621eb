"""ComplexPhraseQueryParser duel (lucene/queryparser/src/java/org/apache/
lucene/queryparser/complexPhrase/ComplexPhraseQueryParser.java; Solr
`{!complexphrase}`): phrases with embedded wildcards / fuzzy terms /
alternative groups, rewritten against the term dictionary into a
MultiPhraseQuery — engine (shard-side expansion) vs BruteForceIndex
(driver-side expansion), rank AND float32 score identical."""

import pytest

from lucene_solr_ray.search.query import complex_phrase

# reuse the session-scoped corpus/index/searcher/oracle fixtures
from tests.test_build_search import corpus, index, oracle, searcher  # noqa: F401


CASES = [
    # (phrase body, slop)
    ("(tool user) output", 0),
    ("to* output", 0),
    ("tool outp*", 0),
    ("tool ou?put", 0),
    ("tool~1 output", 0),
    ("(tool zzznotaterm) output", 0),
    ("(too* user) output", 0),  # multi-term inside a group
    ("tool output", 0),  # plain terms only — equals PhraseQuery
    ("to* output", 1),  # sloppy with expansion
    ("tool (output result)", 2),
    ("assistant to*", 0),
]


def test_duel_complex_phrase(searcher, oracle):  # noqa: F811
    for i, (body, slop) in enumerate(CASES):
        node = complex_phrase(body, slop=slop)
        got = searcher.search_complex_phrase(body, 10, slop=slop)
        exp = [(d, float(s)) for d, s in oracle.search_node(node, 10)]
        assert got == exp, f"case#{i} {body!r} slop={slop}\n got {got[:5]}\n exp {exp[:5]}"


def test_complex_phrase_equals_plain_phrase(searcher):  # noqa: F811
    """No embedded multi-term elements → identical to the plain phrase."""
    plain = searcher.search('"tool output"', 1000)
    cp = searcher.search_complex_phrase("tool output", 1000)
    assert plain == cp


def test_complex_phrase_dead_slot_matches_nothing(searcher):  # noqa: F811
    assert searcher.search_complex_phrase("zzznotaterm* output", 10) == []


def test_complex_phrase_parse_shapes():
    # single surviving slot degrades to its slot query
    n = complex_phrase("to*")
    assert n.kind == "prefix" and n.pattern == "to"
    # stopword elements drop their slot (position collapses); no
    # multi-term elements → the concrete MultiPhraseQuery is built eagerly
    n = complex_phrase("the tool output")
    assert n.kind == "multi_phrase" and n.slots == [["tool"], ["output"]]
    # nothing survives analysis → None
    assert complex_phrase("the of and") is None
    # groups hold alternatives at one position
    n = complex_phrase("(a1 b1) c1")
    assert n.kind == "multi_phrase" and n.slots == [["a1", "b1"], ["c1"]]
    # an embedded multi-term element defers to the distributed rewrite
    n = complex_phrase("(a1 b*) c1")
    assert n.kind == "complex_phrase" and len(n.clauses) == 2


def test_complex_phrase_boost(searcher):  # noqa: F811
    from lucene_solr_ray.search.query import complex_phrase as cp

    base = searcher.search_node(cp("to* output"), 5)
    boosted = searcher.search_node(cp("to* output", boost=2.0), 5)
    assert [d for d, _ in base] == [d for d, _ in boosted]
    for (_, s1), (_, s2) in zip(base, boosted):
        assert s2 == pytest.approx(2 * s1, rel=1e-6)


def test_complex_phrase_fuzzy_stopword_and_group_slop():
    # fuzzy base that analyzes away: slot collapses, digits never leak in
    n = complex_phrase("the~1 output")
    assert n is not None and n.kind == "term" and n.terms == ["output"]
    # per-group proximity is rejected loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        complex_phrase("(a1 b1)~2 c1")
