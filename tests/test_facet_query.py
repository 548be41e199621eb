"""facet.query (solr/core/src/java/org/apache/solr/request/SimpleFacets.java
getFacetQueryCounts): sub-query hit counts over the base query's DocSet,
dueled against the per-doc brute-force oracle."""

import numpy as np  # noqa: F401

from tests.test_build_search import corpus, index, oracle, searcher  # noqa: F401


def _brute_count(oracle, q1, q2):  # noqa: F811
    a = {d for d, _ in oracle.search(q1, 10**9)}
    b = {d for d, _ in oracle.search(q2, 10**9)}
    return len(a & b)


def test_facet_query_counts(searcher, oracle):  # noqa: F811
    base = "tool output"
    fqs = {
        "errors": "error",
        "tool_turns": "+role:tool",
        "phrase": '"tool output"',
        "wild": "to*",
        "nonsense": "zzzzqqq",
    }
    got = searcher.facet_query(base, fqs)
    assert set(got) == set(fqs)
    for k, sub in fqs.items():
        assert got[k] == _brute_count(oracle, base, sub), k
    # base total is an upper bound for every facet.query count
    total = searcher.count(base)
    assert all(v <= total for v in got.values())
    # empty base → all zero
    assert set(searcher.facet_query("zzzzqqq", fqs).values()) == {0}
