"""Lucene RegExp dialect (search/lucene_regexp.py): vector table lifted
from TestRegexpQuery/RegExp.java semantics, error cases, and a fast-path
vs interpreter duel (the Python-re translation and the end-set evaluator
must agree wherever both apply)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.search.lucene_regexp import (
    LuceneRegexpError,
    _Interpreted,
    _PyWrapped,
    compile_regexp,
    parse,
)

VECTORS = [
    # escapes are LITERALS (the big divergence from Python re)
    (r"\d+", "ddd", True),
    (r"\d+", "123", False),
    (r"\w", "w", True),
    (r"\w", "x", False),
    # core operators
    (r"ab.de", "abcde", True),
    (r"abc|def", "def", True),
    (r"ab*", "a", True),
    (r"a{2,3}", "aaa", True),
    (r"a{2,3}", "aaaa", False),
    (r"a{2}", "aa", True),
    (r"a{2,}", "aaaaa", True),
    (r"[0-9]+", "123", True),
    (r"[^a-z]+", "123", True),
    (r"x[-z]y", "x-y", True),
    (r"x[-z]y", "xzy", True),
    # intersection (&)
    (r"fo.*&.*ar", "fooar", True),
    (r"fo.*&.*ar", "fobar", True),
    (r"fo.*&.*ar", "xfoar", False),
    (r"(ab&a.)c", "abc", True),
    (r"(ab&a.)c", "axc", False),
    # complement (~), incl. nested
    (r"~(abc)", "abd", True),
    (r"~(abc)", "abc", False),
    (r"a~(b)c", "axc", True),
    (r"a~(b)c", "abc", False),
    (r"a~(b)c", "axxc", True),
    # numeric interval <n-m>
    (r"<1-100>", "50", True),
    (r"<1-100>", "100", True),
    (r"<1-100>", "101", False),
    (r"<1-100>", "050", False),
    (r"<01-10>", "05", True),
    (r"<01-10>", "5", False),
    (r"foo<1-100>", "foo42", True),
    # quoted literal, empty string, anystring
    (r'"a.c"', "a.c", True),
    (r'"a.c"', "abc", False),
    (r"()", "", True),
    (r"()", "a", False),
    (r"@", "anything", True),
    (r"ab@", "abxyz", True),
    # anchoring: whole term only
    (r"abc", "xabcx", False),
    (r"b", "abc", False),
]


@pytest.mark.parametrize("pat,term,expect", VECTORS)
def test_dialect_vectors(pat, term, expect):
    assert bool(compile_regexp(pat).fullmatch(term)) == expect


@pytest.mark.parametrize("bad", ["w0000[", "a{3,2}", "(abc", "<1-a>", "a)", "a|", '"unclosed'])
def test_parse_errors(bad):
    with pytest.raises(LuceneRegexpError):
        compile_regexp(bad)


def test_fast_path_used_when_possible():
    assert isinstance(compile_regexp(r"ab[cd]*e|f{2,3}"), _PyWrapped)
    assert isinstance(compile_regexp(r"a&b"), _Interpreted)
    assert isinstance(compile_regexp(r"~(ab)"), _Interpreted)
    assert isinstance(compile_regexp(r"<1-9>"), _Interpreted)


_ATOMS = ["a", "b", "c", ".", "[ab]", "[^a]", "(a|b)", '"ab"', "()"]
_SUFFIX = ["", "*", "+", "?", "{2}", "{1,2}", "{0,3}"]


@st.composite
def _patterns(draw):
    n = draw(st.integers(1, 4))
    parts = []
    for _ in range(n):
        parts.append(draw(st.sampled_from(_ATOMS)) + draw(st.sampled_from(_SUFFIX)))
    pat = "".join(parts)
    if draw(st.booleans()):
        pat += "|" + draw(st.sampled_from(_ATOMS))
    return pat


@given(_patterns(), st.text(alphabet="abc", max_size=6))
@settings(max_examples=400, deadline=None)
def test_fast_path_matches_interpreter(pat, term):
    """Translation duel: wherever the Python-re fast path applies, it must
    agree exactly with the end-set interpreter on the same AST."""
    node = parse(pat)
    fast = compile_regexp(pat)
    assert isinstance(fast, _PyWrapped)
    assert bool(fast.fullmatch(term)) == bool(_Interpreted(node).fullmatch(term)), pat


def test_query_parser_integration():
    from lucene_solr_ray.search.query import expand_multi_term, parse_query

    node = parse_query(r"/\d[ab]+/")  # literal d, then a/b run
    assert node.kind == "regexp"
    import numpy as np

    terms = np.array(sorted(["dab", "dba", "12a", "d", "daa"]))
    assert expand_multi_term(node, terms) == ["daa", "dab", "dba"]
    # field-scoped: prefix chars are literals in the dialect
    node = parse_query(r"role:/us.r&u.*/")
    assert expand_multi_term(node, np.array(sorted(["role:user", "role:usxr", "other:user"]))) == [
        "role:user",
        "role:usxr",
    ]


def test_terms_regex_dialect_option():
    """terms.regex dialect: default java/Python `re` (the TermsComponent
    contract) vs explicit lucene automaton dialect — `\\d` means digit
    class in one and literal d in the other."""
    import numpy as np

    from lucene_solr_ray.search.actor import IndexShard

    sh = IndexShard([], None)
    sh._local_terms = np.array(["d1", "dd", "x1"], dtype=object)
    sh._local_dfs = np.array([3, 2, 1], dtype=np.int64)
    java_terms, _ = sh.terms_partial(regex=r"\w\d")
    assert list(java_terms) == ["d1", "x1"]
    luc_terms, _ = sh.terms_partial(regex=r"\w\d", regex_dialect="lucene")
    assert list(luc_terms) == []  # \w\d = literal "wd" in the automaton dialect
    luc2, _ = sh.terms_partial(regex=r"d[0-9]", regex_dialect="lucene")
    assert list(luc2) == ["d1"]
