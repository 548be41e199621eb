"""Relevance value sources in function queries (Solr ValueSourceParser:
termfreq/docfreq/totaltermfreq/idf/numdocs/maxdoc — lucene/queries/.../
function/valuesource/TermFreqValueSource.java, DocFreqValueSource.java,
IDFValueSource.java): termfreq materializes shard-side from postings,
global-stat sources substitute as constants on the driver."""

import re

import numpy as np
import pytest

from lucene_solr_ray.functions.scalar import Expr, expr_to_src, parse_expr, transform_calls

from tests.test_build_search import corpus, index, oracle, searcher  # noqa: F401


def test_parse_and_print_string_literals():
    e = parse_expr("mul(termfreq('error'),idf('error'))")
    assert e.kind == "call" and e.args[0].args[0].kind == "str"
    assert expr_to_src(e) == "mul(termfreq('error'),idf('error'))"
    # round-trip through the printer reparses identically
    assert expr_to_src(parse_expr(expr_to_src(e))) == expr_to_src(e)
    assert expr_to_src(parse_expr("recip(turn_idx,1,10,10)")) == "recip(turn_idx,1.0,10.0,10.0)"


def _tf(corpus, term):  # noqa: F811
    _, full = corpus
    return np.array(
        [len(re.findall(rf"\b{term}\b", t.lower())) for t in full.column("text").to_pylist()],
        dtype=np.float64,
    )


def test_func_termfreq_ranks_by_tf(searcher, corpus):  # noqa: F811
    got = searcher.query("{!func}termfreq('error')", 10)
    tf = _tf(corpus, "error").astype(np.float32)
    docs = np.arange(tf.size, dtype=np.int64)
    order = np.lexsort((docs, -tf))[:10]
    exp = [(int(docs[i]), float(tf[i])) for i in order]
    assert got == exp
    assert got[0][1] >= 1.0


def test_func_tfidf_product(searcher, corpus, oracle):  # noqa: F811
    import math

    got = searcher.query("{!func}mul(termfreq('tool'),idf('tool'))", 10)
    df = searcher.stats.df("tool")
    idf = math.log(1.0 + (searcher.stats.N - df + 0.5) / (df + 0.5))
    vals = (_tf(corpus, "tool") * idf).astype(np.float32)
    docs = np.arange(vals.size, dtype=np.int64)
    order = np.lexsort((docs, -vals))[:10]
    assert got == [(int(docs[i]), float(vals[i])) for i in order]


def test_global_sources_substitute_as_constants(searcher):  # noqa: F811
    src = searcher._resolve_global_sources("div(docfreq('tool'),numdocs())")
    e = parse_expr(src)
    assert e.args[0].kind == "lit" and e.args[0].value == float(searcher.stats.df("tool"))
    assert e.args[1].value == float(searcher.stats.N)
    # totaltermfreq uses cf
    src2 = searcher._resolve_global_sources("totaltermfreq('tool')")
    assert parse_expr(src2).value == float(searcher.stats.cf("tool"))
    with pytest.raises(ValueError):
        searcher._resolve_global_sources("docfreq(turn_idx)")


def test_termfreq_in_boost_and_frange(searcher, corpus):  # noqa: F811
    # boost: score × (1 + tf('error')) — spot check against direct scoring
    base = dict(searcher.search("tool output", 10000))
    tf = _tf(corpus, "error")
    got = searcher.search_boosted("tool output", "sum(1,termfreq('error'))", 10)
    exp_vals = {d: np.float32(s * (1.0 + tf[d])) for d, s in base.items()}
    for d, s in got:
        assert s == float(exp_vals[d])
    # frange over termfreq: only docs containing ≥1 'error' survive
    fr = searcher.query("tool output", 10000, fq="{!frange l=1}termfreq('error')")
    assert fr and all(tf[d] >= 1 for d, _ in fr)
    assert [d for d, _ in fr] == [d for d, s in searcher.search("tool output", 100000) if tf[d] >= 1][: len(fr)]


def test_unresolved_string_literal_raises():
    from lucene_solr_ray.functions.scalar import evaluate

    with pytest.raises(ValueError):
        evaluate(parse_expr("'oops'"), {})


def test_sort_by_function_expression(searcher, corpus):  # noqa: F811
    _, full = corpus
    turn = full.column("turn_idx").to_numpy().astype(np.float64)
    tf_err = _tf(corpus, "error")
    # sort=sum(turn_idx, termfreq('error')) desc over the match set
    got = searcher.search_sorted("tool output", "sum(turn_idx,termfreq('error'))", 10, ascending=False)
    hits = np.array([d for d, _ in searcher.search("tool output", 100000)], dtype=np.int64)
    vals = turn[hits] + tf_err[hits]
    order = np.lexsort((hits, -vals))[:10]
    assert got == [(int(hits[i]), float(vals[i])) for i in order]
    # plain-field sort unchanged
    got_f = searcher.search_sorted("tool output", "turn_idx", 5)
    vals_f = turn[hits]
    order_f = np.lexsort((hits, vals_f))[:5]
    assert got_f == [(int(hits[i]), float(vals_f[i])) for i in order_f]
