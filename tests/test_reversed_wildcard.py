"""Leading-wildcard expansion through the reverse-sorted dictionary
(solr/core/src/java/org/apache/solr/analysis/ReversedWildcardFilterFactory
.java): `*suffix` cuts a reversed term array by binary search instead of
scanning the vocabulary — identical matches, fewer comparisons.  Here the
reversed terms are a lazy actor-local companion ARRAY (scoring always uses
the original terms), so no postings are duplicated."""

import numpy as np

from tests.test_build_search import corpus, index, oracle, searcher  # noqa: F401

QUERIES = ["*ut", "*put", "?ool", "*oo*ut", "*r", "*zzz", "?utput*"]


def test_duel_leading_wildcards(searcher, oracle):  # noqa: F811
    for q in QUERIES:
        got = searcher.search(q, 10)
        exp = [(d, float(s)) for d, s in oracle.search(q, 10)]
        assert got == exp, f"{q!r}\n got {got[:5]}\n exp {exp[:5]}"


def test_reversed_plan_used(searcher):  # noqa: F811
    searcher.search("*put", 5)
    plans = searcher._scatter("get_last_wildcard_plan")
    assert all(p == "reversed" for p in plans)
    searcher.search("*a", 5)  # 1-char tail: not worth a cut → scan
    plans = searcher._scatter("get_last_wildcard_plan")
    assert all(p == "scan" for p in plans)


def test_reversed_dict_matches_scan(searcher):  # noqa: F811
    """The reversed-dictionary cut returns exactly the scan's expansion."""
    import ray

    from lucene_solr_ray.search.query import QueryNode, expand_multi_term

    for pat in ("*ut", "*oo*ut", "?ool"):
        merged = searcher._expand_merged([QueryNode("wildcard", pattern=pat)])
        got = merged[("wildcard", pat, 2)]
        # driver-side reference scan over the union of shard vocabularies
        vocabs = searcher._scatter("terms_partial")
        vocab = np.array(sorted({t for ts, _ in vocabs for t in ts}), dtype=object)
        exp = expand_multi_term(QueryNode("wildcard", pattern=pat), vocab)
        assert got == exp, pat
