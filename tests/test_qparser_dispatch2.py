"""QParser dispatch long tail ({!bool}/{!term}/{!raw}/{!terms}/{!func}/
{!frange}/{!mlt}/{!dismax} — solr/core/src/java/org/apache/solr/search/
BoolQParserPlugin, TermQParserPlugin, RawQParserPlugin, TermsQParserPlugin,
FunctionQParserPlugin, FunctionRangeQParserPlugin, MLTQParserPlugin,
DisMaxQParser): method equality, brute-force duels for the function-valued
paths, and error shapes."""

import numpy as np
import pytest

from lucene_solr_ray.search.qparser import QParserError, parse_local_params_multi
from lucene_solr_ray.search.query import QueryNode, edismax

from tests.test_build_search import corpus, index, oracle, searcher  # noqa: F401


def test_parse_multi_preserves_repeats():
    n, pairs, b = parse_local_params_multi("{!bool must=a must=b should=c mm=1}")
    assert n == "bool" and b == ""
    assert pairs == [("must", "a"), ("must", "b"), ("should", "c"), ("mm", "1")]
    # v= still overrides the body
    assert parse_local_params_multi("{!bool v=xx}yy")[2] == "xx"


def test_bool_qparser(searcher):  # noqa: F811
    got = searcher.query("{!bool must='tool output' must_not=error should=assistant}", 10)
    sub_must = searcher._parse("tool output")
    sub_not = searcher._parse("error")
    sub_should = searcher._parse("assistant")
    node = QueryNode(
        "bool",
        clauses=[("MUST", sub_must), ("MUST_NOT", sub_not), ("SHOULD", sub_should)],
    )
    assert got == searcher.search_node(node, 10)
    # filter clause: same match set as must, no score contribution
    f = searcher.query("{!bool filter=role:tool should='tool output'}", 10)
    fn = QueryNode(
        "bool",
        clauses=[("FILTER", searcher._parse("role:tool")), ("SHOULD", sub_must)],
    )
    assert f == searcher.search_node(fn, 10)
    # mm rides through
    m = searcher.query("{!bool should=tool should=output should=error mm=2}", 10)
    mn = QueryNode(
        "bool",
        clauses=[("SHOULD", searcher._parse(t)) for t in ("tool", "output", "error")],
        min_should_match=2,
    )
    assert m == searcher.search_node(mn, 10)


def test_bool_qparser_errors(searcher):  # noqa: F811
    with pytest.raises(QParserError):
        searcher.query("{!bool nosuch=x}")
    with pytest.raises(QParserError):
        searcher.query("{!bool must='{!term f=role}tool'}")  # nested local params
    # a must clause that analyzes to nothing is unmatchable
    assert searcher.query("{!bool must='the of and'}", 10) == []


def test_term_raw_terms_qparsers(searcher):  # noqa: F811
    t = searcher.query("{!term f=role}tool", 10)
    assert t == searcher.search_node(QueryNode("term", terms=["role:tool"]), 10)
    assert t == searcher.query("{!raw f=role}tool", 10)
    assert len(t) > 0
    # raw contract: no analysis, no lowercasing — mixed case matches nothing
    assert searcher.query("{!term f=role}Tool", 10) == []
    ts = searcher.query("{!terms f=role}tool,assistant", 10)
    assert ts == searcher.search_node(
        QueryNode("term_set", terms=["role:tool", "role:assistant"]), 10
    )
    # custom separator + whitespace trim
    assert ts == searcher.query("{!terms f=role separator=;}tool ; assistant", 10)
    assert searcher.query("{!terms f=role}", 10) == []


def test_func_qparser_duel(searcher, corpus):  # noqa: F811
    _, full = corpus
    turn = full.column("turn_idx").to_numpy().astype(np.float64)
    got = searcher.query("{!func}recip(turn_idx,1,10,10)", 10)
    vals = (10.0 / (turn + 10.0)).astype(np.float32)
    docs = np.arange(turn.size, dtype=np.int64)
    order = np.lexsort((docs, -vals))[:10]
    exp = [(int(docs[i]), float(vals[i])) for i in order]
    assert got == exp


def test_frange_fq_duel(searcher):  # noqa: F811
    # frange filters BEFORE shard top-k with scores unchanged, so a full
    # unfiltered search + post-filter is an exact reference
    full = searcher.search("tool output", 100000)
    got = searcher.query("tool output", 10, fq="{!frange l=1 u=3}turn_idx")
    turn = {d: v for d, _, v in _with_turn(searcher, full)}
    exp = [(d, s) for d, s in full if 1 <= turn[d] <= 3][:10]
    assert got == exp
    # exclusive bounds
    got_ex = searcher.query("tool output", 10, fq="{!frange l=1 u=3 incl=false incu=false}turn_idx")
    exp_ex = [(d, s) for d, s in full if 1 < turn[d] < 3][:10]
    assert got_ex == exp_ex


def _with_turn(searcher, hits):  # noqa: F811
    docs = np.array(sorted(d for d, _ in hits), dtype=np.int64)
    vals = {}
    for part in searcher._scatter("numeric_dv_of", ["turn_idx"], docs.tolist()):
        od, ov = part["turn_idx"]
        for d, v in zip(od, ov):
            vals[int(d)] = float(v)
    return [(d, s, vals[d]) for d, s in hits]


def test_frange_main_query(searcher, corpus):  # noqa: F811
    _, full = corpus
    turn = full.column("turn_idx").to_numpy()
    got = searcher.query("{!frange l=0 u=1}turn_idx", 10000)
    exp_docs = [int(d) for d in np.flatnonzero((turn >= 0) & (turn <= 1))]
    assert [d for d, _ in got] == exp_docs
    assert all(s == 1.0 for _, s in got)


def test_mlt_dismax_equalities(searcher):  # noqa: F811
    seed = searcher.search("tool output", 1)[0][0]
    assert searcher.query(f"{{!mlt mintf=1 mindf=1 maxqt=5}}{seed}", 10) == (
        searcher.more_like_this(seed, k=10, max_query_terms=5)
    )
    node = edismax("tool output", {None: 1.0, "role": 2.0}, tiebreak=0.1)
    assert searcher.query("{!dismax qf='text role^2' tie=0.1}tool output", 10) == (
        searcher.search_node(node, 10)
    )
    # dismax escapes query syntax: field:term and quotes are literal text
    assert searcher.query("{!dismax}role:tool", 10) == searcher.query(
        "{!dismax}role tool", 10
    )


def test_collapse_min_max_selectors(searcher, corpus):  # noqa: F811
    _, full = corpus
    turn = full.column("turn_idx").to_numpy()
    role = np.asarray(full.column("role").to_pylist(), dtype=object)
    for sel_op, kw in (("min", {"min_field": "turn_idx"}), ("max", {"max_field": "turn_idx"})):
        got = searcher.search_collapse("tool output", "role", 10, **kw)
        hits = searcher.search("tool output", 100000)
        import pandas as pd

        df = pd.DataFrame(
            {
                "doc": [d for d, _ in hits],
                "score": [s for _, s in hits],
                "sel": turn[[d for d, _ in hits]],
                "val": role[[d for d, _ in hits]],
            }
        )
        df = df.sort_values(["sel", "doc"], ascending=[sel_op == "min", True], kind="mergesort")
        df = df.drop_duplicates("val")
        df = df.sort_values(["score", "doc"], ascending=[False, True], kind="mergesort").head(10)
        exp = [(int(d), float(s), str(v)) for d, s, v in zip(df["doc"], df["score"], df["val"])]
        assert got == exp, (sel_op, got[:3], exp[:3])
    # dispatcher carries min=/max= through fq
    assert searcher.query("tool output", 10, fq="{!collapse field=role max=turn_idx}") == (
        searcher.search_collapse("tool output", "role", 10, max_field="turn_idx")
    )
    import pytest as _pt

    with _pt.raises(ValueError):
        searcher.search_collapse("x", "role", min_field="turn_idx", max_field="dl")


def test_facet_search_matches_brute_force(searcher, corpus):  # noqa: F811
    _, full = corpus
    role = np.asarray(full.column("role").to_pylist(), dtype=object)
    for q in ("tool output", "error", "+role:tool output", "to*"):
        got = searcher.facet_search(q, "role", limit=10)
        hits = [d for d, _ in searcher.search(q, 100000)]
        vals, cnts = np.unique(role[hits], return_counts=True)
        exp = sorted(zip(vals.tolist(), cnts.tolist()), key=lambda p: (-p[1], p[0]))[:10]
        assert got == [(str(v), int(c)) for v, c in exp], q
    assert searcher.facet_search("zzzznosuch", "role") == []


def test_facet_range_matches_brute_force(searcher, corpus):  # noqa: F811
    _, full = corpus
    turn = full.column("turn_idx").to_numpy()
    got = searcher.facet_range("tool output", "turn_idx", start=1, end=7, gap=2)
    hits = np.array([d for d, _ in searcher.search("tool output", 100000)], dtype=np.int64)
    v = turn[hits]
    exp_counts = [
        (float(s), int(((v >= s) & (v < s + 2)).sum())) for s in (1.0, 3.0, 5.0)
    ]
    assert got["counts"] == exp_counts
    assert got["before"] == int((v < 1).sum())
    assert got["after"] == int((v >= 7).sum())
    assert got["before"] + got["after"] + sum(c for _, c in exp_counts) == len(hits)
    # a no-match query still reports its (zero-count) buckets — the
    # facet.range contract; only an EMPTY parse yields no buckets
    assert searcher.facet_range("zzzznosuch", "turn_idx", 0, 4, 2) == {
        "counts": [(0.0, 0), (2.0, 0)], "before": 0, "after": 0
    }
    assert searcher.facet_range("the of", "turn_idx", 0, 4, 2) == {
        "counts": [], "before": 0, "after": 0
    }


def test_stats_field_matches_brute_force(searcher, corpus):  # noqa: F811
    import math

    _, full = corpus
    turn = full.column("turn_idx").to_numpy().astype(np.int64)
    got = searcher.stats_field("tool output", "turn_idx")
    hits = np.array([d for d, _ in searcher.search("tool output", 100000)], dtype=np.int64)
    v = turn[hits]
    n, s1, s2 = int(v.size), int(v.sum()), int((v.astype(object) * v.astype(object)).sum())
    var = (s2 - s1 * s1 / n) / (n - 1)
    assert got == {
        "count": n,
        "sum": s1,
        "mean": s1 / n,
        "min": int(v.min()),
        "max": int(v.max()),
        "stddev": math.sqrt(var),
    }
    assert searcher.stats_field("the of", "turn_idx") == {"count": 0}
    with pytest.raises(KeyError):
        searcher.stats_field("tool", "no_such_dv")


def test_search_grouped_matches_brute_force(searcher, corpus):  # noqa: F811
    import pandas as pd

    _, full = corpus
    role = np.asarray(full.column("role").to_pylist(), dtype=object)
    for q, j in (("tool output", 2), ("error", 3), ("to*", 1)):
        got = searcher.search_grouped(q, "role", k=10, group_limit=j)
        hits = searcher.search(q, 100000)
        df = pd.DataFrame(
            {
                "doc": [d for d, _ in hits],
                "score": [s for _, s in hits],
                "val": role[[d for d, _ in hits]],
            }
        )
        df["r"] = df.groupby("val").cumcount()  # hits already rank-ordered
        df = df[df["r"] < j]
        heads = df.drop_duplicates("val").head(10)
        exp = [
            (
                str(v),
                [
                    (int(d), float(s))
                    for d, s in zip(df[df["val"] == v]["doc"], df[df["val"] == v]["score"])
                ],
            )
            for v in heads["val"]
        ]
        assert got == exp, (q, j)
    assert searcher.search_grouped("the of", "role") == []


def test_facet_stats_matches_brute_force(searcher, corpus):  # noqa: F811
    _, full = corpus
    role = np.asarray(full.column("role").to_pylist(), dtype=object)
    turn = full.column("turn_idx").to_numpy().astype(np.int64)
    got = searcher.facet_stats("tool output", "role", "turn_idx", limit=10)
    hits = np.array([d for d, _ in searcher.search("tool output", 100000)], dtype=np.int64)
    exp = []
    for v in np.unique(role[hits].astype(str)):
        x = turn[hits[role[hits].astype(str) == v]]
        exp.append(
            {
                "val": str(v),
                "count": int(x.size),
                "sum": int(x.sum()),
                "min": int(x.min()),
                "max": int(x.max()),
                "mean": int(x.sum()) / int(x.size),
            }
        )
    exp.sort(key=lambda d: (-d["count"], d["val"]))
    assert got == exp[:10]
    assert searcher.facet_stats("the of", "role", "turn_idx") == []


def test_stats_field_percentiles(searcher, corpus):  # noqa: F811
    """stats.percentiles via mergeable per-shard t-digests: within digest
    tolerance of the exact match-set percentiles, exact at the extremes."""
    _, full = corpus
    turn = full.column("turn_idx").to_numpy().astype(np.float64)
    got = searcher.stats_field("tool output", "turn_idx", percentiles=[0, 25, 50, 90, 100])
    hits = np.array([d for d, _ in searcher.search("tool output", 100000)], dtype=np.int64)
    v = np.sort(turn[hits])
    assert got["percentiles"][0.0] == v[0] and got["percentiles"][100.0] == v[-1]
    spread = v[-1] - v[0]
    for p in (25, 50, 90):
        exact = np.percentile(v, p)
        assert abs(got["percentiles"][float(p)] - exact) <= max(0.05 * spread, 1.0), p
    # plain stats keys still present and unchanged by the percentile path
    base = searcher.stats_field("tool output", "turn_idx")
    assert {k: got[k] for k in base} == base


def test_collapse_null_policy(searcher, oracle, corpus):  # noqa: F811
    """nullPolicy=expand|collapse on the tool field (mostly null): expand
    keeps each field-less doc as a singleton group; collapse folds them
    into one — dueled vs brute force."""
    _, full = corpus
    tool = full.column("tool").to_pylist()
    for q in ("output", "error ok"):
        ranked = oracle.search(q, 10**6)
        # --- expand: normal collapse heads + every null doc competes solo
        seen, exp = set(), []
        for d, s in ranked:
            v = tool[d]
            if v is None:
                exp.append((d, float(s), None))
            elif v not in seen:
                seen.add(v)
                exp.append((d, float(s), str(v)))
        got = searcher.search_collapse(q, "tool", k=10, null_policy="expand")
        assert got == exp[:10], q
        # --- collapse: all nulls form ONE group headed by their best hit
        seen, exp, null_done = set(), [], False
        for d, s in ranked:
            v = tool[d]
            if v is None:
                if not null_done:
                    exp.append((d, float(s), None))
                    null_done = True
            elif v not in seen:
                seen.add(v)
                exp.append((d, float(s), str(v)))
        got = searcher.search_collapse(q, "tool", k=10, null_policy="collapse")
        assert got == exp[:10], q
    # dispatcher carries the param
    assert searcher.query("output", 10, fq="{!collapse field=tool nullPolicy=expand}") == \
        searcher.search_collapse("output", "tool", 10, null_policy="expand")
    with pytest.raises(ValueError):
        searcher.search_collapse("output", "tool", 5, null_policy="expand", min_field="turn_idx")
    with pytest.raises(ValueError):
        searcher.search_collapse("output", "tool", 5, null_policy="bogus")


def test_lucene_q_op_and(searcher):  # noqa: F811
    """{!lucene q.op=AND}: unsigned clauses become MUST (QueryParser
    default-operator contract); explicit signs keep their occur."""
    assert searcher.query("{!lucene q.op=AND}error ok", 10) == searcher.search("+error +ok", 10)
    assert searcher.query("{!lucene q.op=AND}error -ok", 10) == searcher.search("+error -ok", 10)
    assert searcher.query("{!lucene q.op=AND}error", 10) == searcher.search("error", 10)
    # default stays OR
    assert searcher.query("{!lucene}error ok", 10) == searcher.search("error ok", 10)


def test_plain_fq_filter_clauses(searcher, oracle, corpus):  # noqa: F811
    """Plain fq=field:value (FILTER occur: must match, no score) — single
    and repeated fq, dueled vs post-filtering the full main ranking."""
    _, full = corpus
    role = full.column("role").to_pylist()
    tool = full.column("tool").to_pylist()
    ranked = oracle.search("error output", 10**6)
    exp1 = [(d, float(s)) for d, s in ranked if role[d] == "tool"][:10]
    assert searcher.query("error output", 10, fq="role:tool") == exp1
    exp2 = [(d, float(s)) for d, s in ranked if role[d] == "tool" and tool[d] == "bash"][:10]
    assert searcher.query("error output", 10, fq=["role:tool", "tool:bash"]) == exp2
    # fq matching nothing → empty; stopword-only fq → empty
    assert searcher.query("error", 10, fq="role:nosuchrole") == []
    assert searcher.query("error", 10, fq="the") == []


def test_facet_search_missing_bucket(searcher, corpus):  # noqa: F811
    """facet.missing: the None bucket counts match-set docs WITHOUT the
    field (tool is mostly null) — appended after the limit cut."""
    _, full = corpus
    tool = full.column("tool").to_pylist()
    hits = [d for d, _ in searcher.search("output", 10**6)]
    out = searcher.facet_search("output", "tool", limit=3, missing=True)
    assert out[-1][0] is None
    assert out[-1][1] == sum(1 for d in hits if tool[d] is None)
    assert len(out) <= 4
    # unknown field: everything missing
    allmiss = searcher.facet_search("output", "nosuchfield", missing=True)
    assert allmiss == [(None, len(hits))]


def test_fq_paging_and_composition_consistency(searcher):  # noqa: F811
    """QueryUtils.check-style consistency over the new front-door params:
    start paging slices the same filtered ranking; repeated fq order is
    irrelevant; fq composes with q.op and start together."""
    full = searcher.query("error output", 10**6, fq="role:tool")
    assert searcher.query("error output", 5, fq="role:tool", start=3) == full[3:8]
    a = searcher.query("output", 20, fq=["role:tool", "tool:bash"])
    b = searcher.query("output", 20, fq=["tool:bash", "role:tool"])
    assert a == b
    strict = searcher.query("{!lucene q.op=AND}error ok", 10**6, fq="role:assistant")
    assert searcher.query("{!lucene q.op=AND}error ok", 4, fq="role:assistant", start=2) == strict[2:6]
    # count agrees with the materialized filtered ranking
    assert searcher.count("error output", fq="role:tool") == len(full)
