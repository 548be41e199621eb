"""/select request-handler envelope (SearchHandler + ResponseBuilder):
params dict in, Solr-shaped response out — every section must equal its
component method's output."""

from tests.test_build_search import corpus, index, oracle, searcher  # noqa: F401


def test_handle_select_envelope(searcher):  # noqa: F811
    r = searcher.handle_select(
        {
            "q": "tool output",
            "rows": 5,
            "fq": "role:tool",
            "facet.field": ["role", "tool"],
            "facet.query": {"errors": "error"},
            "stats.field": "turn_idx",
        }
    )
    assert r["responseHeader"]["status"] == 0
    assert r["response"]["numFound"] == searcher.count("tool output", fq="role:tool")
    hits = searcher.query("tool output", 5, fq="role:tool")
    assert [d["doc_id"] for d in r["response"]["docs"]] == [d for d, _ in hits]
    assert r["facet_counts"]["facet_fields"]["role"] == searcher.facet_search("tool output", "role", limit=10)
    assert r["facet_counts"]["facet_queries"] == searcher.facet_query("tool output", {"errors": "error"})
    assert r["stats"]["stats_fields"]["turn_idx"] == searcher.stats_field("tool output", "turn_idx")


def test_handle_select_fl_sort_paging(searcher):  # noqa: F811
    r = searcher.handle_select(
        {"q": "tool output", "rows": 4, "start": 2, "sort": "turn_idx desc", "fl": "turn_idx,role"}
    )
    full = searcher.select("tool output", 6, fl=["turn_idx", "role"], sort="turn_idx desc")
    assert [d["doc_id"] for d in r["response"]["docs"]] == full["doc_id"].iloc[2:].tolist()
    assert set(r["response"]["docs"][0]) == {"doc_id", "turn_idx", "role"}
    # hl section present and doc-keyed
    rh = searcher.handle_select({"q": "assistant", "rows": 2, "hl": "true"})
    assert set(rh["highlighting"]) == {d["doc_id"] for d in rh["response"]["docs"]}


def test_handle_select_range_and_grouping(searcher):  # noqa: F811
    r = searcher.handle_select(
        {
            "q": "tool output",
            "rows": 3,
            "facet.range": "turn_idx",
            "facet.range.start": 0,
            "facet.range.end": 12,
            "facet.range.gap": 4,
            "group.field": "role",
            "group.limit": 2,
            "group.sort": "turn_idx asc",
        }
    )
    assert r["facet_counts"]["facet_ranges"]["turn_idx"] == searcher.facet_range(
        "tool output", "turn_idx", 0, 12, 4
    )
    assert r["grouped"]["role"] == searcher.search_grouped(
        "tool output", "role", k=3, group_limit=2, group_sort="turn_idx asc"
    )


def test_handle_select_pivot(searcher):  # noqa: F811
    r = searcher.handle_select({"q": "output", "rows": 2, "facet.pivot": "role,tool", "facet.limit": 4})
    assert r["facet_counts"]["facet_pivot"]["role,tool"] == searcher.facet_pivot_search(
        "output", ["role", "tool"], limit=4
    )
