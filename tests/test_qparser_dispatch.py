"""Local-params QParser dispatch (`{!type k=v}body` — QParserPlugin
registry + LocalParams syntax): parsing shapes, and every dispatched
parser returns exactly what its direct method call returns."""

import pytest

from lucene_solr_ray.search.qparser import QParserError, parse_local_params

from tests.test_build_search import corpus, index, oracle, searcher  # noqa: F401


def test_parse_local_params_shapes():
    assert parse_local_params("tool output") == ("lucene", {}, "tool output")
    assert parse_local_params("{!surround}a 3w b") == ("surround", {}, "a 3w b")
    n, p, b = parse_local_params("{!join from=f to=t score=max}+role:tool")
    assert (n, b) == ("join", "+role:tool") and p == {"from": "f", "to": "t", "score": "max"}
    n, p, b = parse_local_params("{!boost b='recip(turn_idx,1,10,10)'}error")
    assert p["b"] == "recip(turn_idx,1,10,10)" and b == "error"
    # v= overrides the trailing body (LocalParams convention)
    n, p, b = parse_local_params('{!lucene v="tool output"}ignored')
    assert b == "tool output"
    # bare {!} defaults to lucene
    assert parse_local_params("{!}x")[0] == "lucene"


def test_dispatch_matches_direct_methods(searcher):  # noqa: F811
    assert searcher.query("tool output", 10) == searcher.search("tool output", 10)
    assert searcher.query('{!complexphrase}"to* output"', 10) == searcher.search_complex_phrase(
        "to* output", 10
    )
    assert searcher.query('{!complexphrase}"to* output"~2', 10) == searcher.search_complex_phrase(
        "to* output", 10, slop=2
    )
    assert searcher.query("{!surround}tool 2w output", 10) == searcher.search_surround(
        "tool 2w output", 10
    )
    assert searcher.query(
        "{!boost b=recip(turn_idx,1,10,10)}tool output", 10
    ) == searcher.search_boosted("tool output", "recip(turn_idx,1,10,10)", 10)
    assert searcher.query("{!join from=conv_id to=conv_id}+role:tool", 10) == searcher.join_search(
        "conv_id", "conv_id", "+role:tool", 10
    )
    assert searcher.query(
        "{!graph from=conv_id to=conv_id maxDepth=1}+role:tool", 10
    ) == searcher.graph_search("conv_id", "conv_id", "+role:tool", max_depth=1, k=10)
    assert searcher.query("error", 10, fq="{!collapse field=role}") == searcher.search_collapse(
        "error", "role", 10
    )


def test_dispatch_errors(searcher):  # noqa: F811
    with pytest.raises(QParserError):
        searcher.query("{!nosuch}x")
    with pytest.raises(QParserError):
        searcher.query("{!boost}x")  # missing b=
    with pytest.raises(QParserError):
        searcher.query("{!join from=f}x")  # missing to=
    with pytest.raises(QParserError):
        searcher.query("x", fq="{!terms f=role}y")  # unsupported fq parser


def test_dispatch_block_joins(searcher):  # noqa: F811
    assert searcher.query("{!parent score=sum}+role:tool output", 5) == searcher.search_parents(
        "+role:tool output", 5, score_mode="sum"
    )
    assert searcher.query("{!child}+role:tool output", 5) == searcher.search_children(
        "+role:tool output", 5
    )


def test_dispatch_ltr(searcher):  # noqa: F811
    from lucene_solr_ray.search.ltr import LinearModel
    from lucene_solr_ray.search.qparser import QParserError

    model = LinearModel({"original_score": 1.0, "turn_idx": -0.05})
    searcher.register_ltr_model("m1", model, {"turn_idx": "turn_idx"})
    got = searcher.query("{!ltr model=m1 reRankDocs=30}assistant answer", 8)
    assert got == searcher.rerank_ltr(
        "assistant answer", model, rerank_docs=30, k=8, feature_exprs={"turn_idx": "turn_idx"}
    )
    with pytest.raises(QParserError):
        searcher.query("{!ltr model=nope}x")


def test_terms_list(searcher, oracle):  # noqa: F811
    terms = ["tool", "output", "assistant", "zzznotaterm"]
    got = dict(searcher.terms_list(terms))
    for t in terms:
        assert got[t] == oracle.df.get(t, 0)
    ttf = dict(searcher.terms_list(["tool", "zzznotaterm"], ttf=True))
    assert ttf["tool"] == oracle.cf("tool") and ttf["zzznotaterm"] == 0


def test_fq_collapse_rejects_nondefault_main_parser(searcher):  # noqa: F811
    with pytest.raises(QParserError):
        searcher.query("{!surround}tool 2w output", fq="{!collapse field=role}")
    # the default-parser main query still works through the fq path
    assert searcher.query("{!lucene}error", 5, fq="{!collapse field=role}") == searcher.search_collapse(
        "error", "role", 5
    )


def test_dispatch_edismax(searcher):  # noqa: F811
    from lucene_solr_ray.search.query import edismax

    node = edismax(
        "tool output", {None: 1.0, "role": 2.0}, tiebreak=0.1,
        min_should_match=1, pf={None: 3.0}, ps=1,
    )
    exp = searcher.search_node(node, 10)
    got = searcher.query(
        "{!edismax qf='text role^2' tie=0.1 mm=1 pf='text^3' ps=1}tool output", 10
    )
    assert got == exp
    assert searcher.query("{!edismax}the of", 10) == []  # all stopwords


def test_dispatch_field_prefix_and_start(searcher):  # noqa: F811
    from lucene_solr_ray.search.query import QueryNode

    assert searcher.query("{!field f=role}tool", 8) == searcher.search_node(
        QueryNode("term", terms=["role:tool"]), 8
    )
    assert searcher.query("{!field f=role v=tool}ignored", 8) == searcher.query(
        "{!field f=role}tool", 8
    )
    assert searcher.query("{!prefix f=tool}b", 8) == searcher.search_node(
        QueryNode("prefix", pattern="tool:b"), 8
    )
    # start= pages by offset: page2 continues exactly where page1 ended
    full = searcher.query("tool output", 20)
    assert searcher.query("tool output", 10, start=10) == full[10:20]
    with pytest.raises(QParserError):
        searcher.query("{!field}x")


def test_fq_collapse_honors_qop(searcher):  # noqa: F811
    """r5 review: {!collapse} fq no longer drops q.op=AND from the main
    query — heads come only from docs matching EVERY term."""
    strict = {d for d, _ in searcher.search("+error +ok", 10**6)}
    got = searcher.query("{!lucene q.op=AND}error ok", 50, fq="{!collapse field=role}")
    assert got and all(d in strict for d, _, _ in got)
    loose = searcher.query("error ok", 50, fq="{!collapse field=role}")
    # OR semantics must still differ somewhere (non-vacuous)
    assert {d for d, _, _ in loose} != {d for d, _, _ in got} or len(loose) != len(got)
