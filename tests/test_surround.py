"""Surround query parser duel (lucene/queryparser/src/java/org/apache/
lucene/queryparser/surround/): `a 3W b` / `5N(a,b)` span-proximity ops
compiled onto the intervals algebra, AND/OR/NOT booleans, truncation —
engine (shard-side expansion) vs BruteForceIndex, rank AND float32 score
identical."""

import numpy as np
import pytest

from lucene_solr_ray.search.query import expand_multi_term, node_key
from lucene_solr_ray.search.surround import (
    SurroundParseError,
    multi_term_leaves,
    parse_surround,
    surround_to_node,
)

# reuse the session-scoped corpus/index/searcher/oracle fixtures
from tests.test_build_search import corpus, index, oracle, searcher  # noqa: F401


CASES = [
    "tool w output",
    "tool 3w bash",
    "tool 2n output",
    "3W(tool, output)",
    "n(tool, output)",
    "tool and output",
    "tool or zzznotaterm",
    "tool not error",
    "(tool or user) 2w output",
    "to* 2w output",
    "tool 2w ou*ut",
    "2w(tool, w(output, bash))",
    "(tool 2w output)^2",
    "tool 3w output 3w bash",
    "4n(tool, output, bash)",
    "and(tool, output, bash)",
    "tool W zzznotaterm",
    "zz* 2w output",
    "tool AND (error OR ok)",
]


def _oracle_node(q, oracle):  # noqa: F811
    if not hasattr(oracle, "_vocab"):
        oracle._vocab = np.array(sorted(oracle.df), dtype=object)
    ast = parse_surround(q)
    expander = lambda n: expand_multi_term(n, oracle._vocab)  # noqa: E731
    return surround_to_node(ast, expander)


def test_duel_surround(searcher, oracle):  # noqa: F811
    for i, q in enumerate(CASES):
        got = searcher.search_surround(q, 10)
        exp = [(d, float(s)) for d, s in oracle.search_node(_oracle_node(q, oracle), 10)]
        assert got == exp, f"case#{i} {q!r}\n got {got[:5]}\n exp {exp[:5]}"


def test_surround_w_adjacent_equals_phrase_docs(searcher):  # noqa: F811
    """`a W b` (distance 1, ordered) matches exactly the phrase doc set."""
    ph = {d for d, _ in searcher.search('"tool output"', 5000)}
    sr = {d for d, _ in searcher.search_surround("tool w output", 5000)}
    assert ph == sr


def test_surround_distance_monotone(searcher):  # noqa: F811
    """Wider distance can only widen the match set; N ⊇ W at equal d."""
    prev: set[int] = set()
    for d in (1, 2, 4, 8):
        cur = {d_ for d_, _ in searcher.search_surround(f"tool {d}w bash", 5000)}
        assert prev <= cur
        prev = cur
        un = {d_ for d_, _ in searcher.search_surround(f"tool {d}n bash", 5000)}
        assert cur <= un


def test_surround_parse_shapes():
    ast = parse_surround("a 3w b")
    assert ast.kind == "dist" and ast.distance == 3 and ast.ordered
    ast = parse_surround("a or b and c")  # AND binds tighter than OR
    assert ast.kind == "or" and ast.children[1].kind == "and"
    ast = parse_surround("a not b not c")  # NOT chains left
    assert ast.kind == "not" and len(ast.children) == 3
    ast = parse_surround("5N(a, b or c)")
    assert ast.kind == "dist" and not ast.ordered and ast.children[1].kind == "or"
    ast = parse_surround("a^2")
    assert ast.boost == 2.0
    # operator words are reserved, case-insensitive
    assert parse_surround("A And b").kind == "and"


def test_surround_rejects_bool_inside_distance():
    with pytest.raises(SurroundParseError):
        surround_to_node(parse_surround("2w(a and b, c)"), lambda n: [])
    with pytest.raises(SurroundParseError):
        surround_to_node(parse_surround("3n(a not b, c)"), lambda n: [])


def test_surround_parse_errors():
    for bad in ("", "a 3w", "or(a)", "a )", "0w(a, b)", "w(a)"):
        with pytest.raises(SurroundParseError):
            parse_surround(bad)


def test_surround_multi_term_leaves_scope():
    """Truncation INSIDE distance ops is pre-expanded; outside it goes
    through the normal QueryNode rewrite."""
    ast = parse_surround("to* and (ba* 2w output)")
    leaves = multi_term_leaves(ast)
    assert [node_key(n) for n in leaves] == [("prefix", "ba", 2)]


def test_surround_rejects_nested_boost_in_distance():
    with pytest.raises(SurroundParseError):
        surround_to_node(parse_surround("tool^3 2w output"), lambda n: [])
    # the top-level distance op's own boost is honored, not rejected
    n = surround_to_node(parse_surround("(tool 2w output)^2"), lambda n: [])
    assert n.kind == "intervals" and n.boost == 2.0


def test_fuzz_surround_grammar(searcher, oracle):  # noqa: F811
    """Seeded random surround queries (terms, truncation, OR groups,
    nested W/N distance ops, infix booleans) — engine vs oracle, rank AND
    float32 score identical."""
    import random

    rng = random.Random(4242)
    terms = ["tool", "output", "assistant", "user", "error", "bash", "ok", "question"]

    def leaf(depth):
        r = rng.random()
        if r < 0.15:
            t = rng.choice(terms)
            return t[: rng.randint(2, max(2, len(t) - 1))] + "*"
        return rng.choice(terms)

    def span(depth):
        r = rng.random()
        if depth >= 2 or r < 0.45:
            return leaf(depth)
        if r < 0.65:
            return f"({span(depth + 1)} or {span(depth + 1)})"
        d = rng.randint(1, 5)
        op = rng.choice(["w", "n"])
        args = ", ".join(span(depth + 1) for _ in range(rng.randint(2, 3)))
        return f"{d}{op}({args})"

    def query():
        r = rng.random()
        if r < 0.5:
            d = rng.randint(1, 4)
            op = rng.choice(["W", "N"])
            return f"{span(1)} {d}{op} {span(1)}"
        if r < 0.75:
            return f"{span(1)} and {span(1)}"
        return f"{span(1)} or ({span(1)} not {leaf(1)})"

    for trial in range(40):
        q = query()
        got = searcher.search_surround(q, 10)
        exp = [(d, float(s)) for d, s in oracle.search_node(_oracle_node(q, oracle), 10)]
        assert got == exp, f"trial {trial}: {q!r}\n got {got[:4]}\n exp {exp[:4]}"
