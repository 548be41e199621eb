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


def test_facet_nested_duel(searcher, oracle, corpus):  # noqa: F811
    """Nested terms×terms facet over the match set vs brute force: only
    docs carrying BOTH fields count; bucket order (count desc, value asc)."""
    import pyarrow as pa  # noqa: F401

    _, full = corpus
    role = full.column("role").to_pylist()
    tool = full.column("tool").to_pylist()
    for q in ("output", "error", "+role:tool bash"):
        matches = [d for d, _ in oracle.search(q, 10**9)]
        pairs = {}
        for d in matches:
            if role[d] is not None and tool[d] is not None:
                pairs[(role[d], tool[d])] = pairs.get((role[d], tool[d]), 0) + 1
        tots = {}
        for (v1, _), c in pairs.items():
            tots[v1] = tots.get(v1, 0) + c
        exp = []
        for v1 in sorted(tots, key=lambda v: (-tots[v], v))[:10]:
            subs = sorted(
                ((v2, c) for (p1, v2), c in pairs.items() if p1 == v1),
                key=lambda t: (-t[1], t[0]),
            )[:10]
            exp.append((v1, tots[v1], subs))
        assert searcher.facet_nested(q, "role", "tool") == exp, q
    assert searcher.facet_nested("zzzznope", "role", "tool") == []
    assert searcher.facet_nested("output", "role", "nosuchfield") == []


def test_facet_pivot_search_duel(searcher, oracle, corpus):  # noqa: F811
    """facet.pivot over the match set (role → tool), dueled vs brute
    force; 2-level pivot agrees with facet_nested."""
    _, full = corpus
    role = full.column("role").to_pylist()
    tool = full.column("tool").to_pylist()
    q = "output"
    matches = [d for d, _ in oracle.search(q, 10**9)]
    pairs = {}
    for d in matches:
        if role[d] is not None and tool[d] is not None:
            pairs[(role[d], tool[d])] = pairs.get((role[d], tool[d]), 0) + 1
    got = searcher.facet_pivot_search(q, ["role", "tool"], limit=10)
    nested = searcher.facet_nested(q, "role", "tool", 10, 10)
    assert [(e["value"], e["count"], [(s["value"], s["count"]) for s in e["pivot"]]) for e in got] == nested
    for e in got:
        assert e["field"] == "role"
        for s in e["pivot"]:
            assert s["count"] == pairs[(e["value"], s["value"])]
    # single-level pivot == facet over both-fields-present docs
    one = searcher.facet_pivot_search(q, ["role"], limit=10)
    tots = {}
    for d in matches:
        if role[d] is not None:
            tots[role[d]] = tots.get(role[d], 0) + 1
    assert {e["value"]: e["count"] for e in one} == tots
    assert searcher.facet_pivot_search("zzzznope", ["role", "tool"]) == []
