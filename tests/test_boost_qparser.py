"""{!boost b=expr} duel (solr/core/src/java/org/apache/solr/search/
BoostQParserPlugin.java → FunctionScoreQuery.boostByValue): query score ×
per-doc function value over numeric doc-values, multiplied in float64
before the float32 cast — engine vs brute-force reference, rank AND
float32 score identical."""

import numpy as np

from lucene_solr_ray.functions.scalar import evaluate, expr_fields, parse_expr

from tests.test_build_search import corpus, index, oracle, searcher  # noqa: F401

CASES = [
    ("tool output", "recip(turn_idx,1,10,10)"),  # early turns favored
    ("assistant", "linear(turn_idx,0.5,1)"),
    ("+tool output", "recip(dl,1,50,50)"),  # short docs favored
    ("error", "sqrt(sum(turn_idx,1))"),
    ("to* output", "recip(turn_idx,1,10,10)"),  # with multi-term rewrite
]


def _expected(q, expr_src, corpus, oracle, k):  # noqa: F811
    _, full = corpus
    turn = full.column("turn_idx").to_numpy().astype(np.float64)
    dl_ref = None
    expr = parse_expr(expr_src)
    from lucene_solr_ray.search.query import parse_query, rewrite

    node = parse_query(q)
    if not hasattr(oracle, "_vocab"):
        oracle._vocab = np.array(sorted(oracle.df), dtype=object)
    node = rewrite(node, oracle._vocab)
    hits = []
    for doc in range(oracle.N):
        m, s = oracle.score_query(node, doc)
        if m:
            hits.append((doc, s))
    if not hits:
        return []
    docs = np.array([d for d, _ in hits], dtype=np.int64)
    scores = np.array([s for _, s in hits], dtype=np.float64)
    cols = {}
    for f in expr_fields(expr):
        if f == "turn_idx":
            cols[f] = turn[docs]
        elif f == "dl":
            # dl = analyzed token count of the main text field, as indexed
            if dl_ref is None:
                import re

                texts = full.column("text").to_pylist()
                from lucene_solr_ray.analysis import tokenize

                dl_ref = np.array(
                    [len(tokenize(t)) for t in texts], dtype=np.float64
                )
            cols[f] = dl_ref[docs]
        else:
            raise KeyError(f)
    mult = np.broadcast_to(np.asarray(evaluate(expr, cols), np.float64), scores.shape)
    s32 = (scores * mult).astype(np.float32)
    order = np.lexsort((docs, -s32))[:k]
    return [(int(docs[i]), float(s32[i])) for i in order]


def test_duel_boost_qparser(searcher, oracle, corpus):  # noqa: F811
    for q, expr in CASES:
        got = searcher.search_boosted(q, expr, 10)
        exp = _expected(q, expr, corpus, oracle, 10)
        assert got == exp, f"{q!r} boost={expr!r}\n got {got[:5]}\n exp {exp[:5]}"


def test_boost_constant_is_plain_scaling(searcher):  # noqa: F811
    base = searcher.search("tool output", 10)
    boosted = searcher.search_boosted("tool output", "2", 10)
    assert [d for d, _ in base] == [d for d, _ in boosted]
    for (_, s1), (_, s2) in zip(base, boosted):
        assert abs(s2 - 2 * s1) < 1e-5


def test_boost_reranks(searcher):  # noqa: F811
    """A turn-position boost must actually change the ranking somewhere
    in the top-50 (otherwise the test is vacuous)."""
    base = [d for d, _ in searcher.search("assistant answer", 50)]
    boosted = [d for d, _ in searcher.search_boosted("assistant answer", "recip(turn_idx,1,10,10)", 50)]
    assert base != boosted


def test_search_sorted_by_field(searcher, oracle, corpus):  # noqa: F811
    """sort=turn_idx asc|desc: match set ordered by the dv field, ties by
    docID — engine shard top-k merge vs brute-force reference."""
    _, full = corpus
    turn = full.column("turn_idx").to_numpy()
    for q in ("tool output", "+role:tool", "error"):
        matches = [d for d, _ in oracle.search(q, 10**9)]
        for asc in (True, False):
            got = searcher.search_sorted(q, "turn_idx", 10, ascending=asc)
            vals = np.array([turn[d] for d in matches], dtype=np.float64)
            docs = np.array(matches, dtype=np.int64)
            order = np.lexsort((docs, vals if asc else -vals))[:10]
            exp = [(int(docs[i]), float(vals[i])) for i in order]
            assert got == exp, (q, asc)
    import pytest as _pytest

    with _pytest.raises(Exception):
        searcher.search_sorted("tool", "nope_field", 5)


def test_search_sorted_string_and_compound(searcher, oracle, corpus):  # noqa: F811
    """sort=<string dv field> and compound `f1 desc, f2 asc` specs
    (SortField.STRING + SortField lists): engine shard-top-k merge vs a
    pandas reference over the raw corpus columns.  `tool` is mostly null →
    exercises the missing-last contract on both directions."""
    import pandas as pd

    _, full = corpus
    ref = pd.DataFrame(
        {
            "role": full.column("role").to_pylist(),
            "tool": full.column("tool").to_pylist(),
            "turn_idx": full.column("turn_idx").to_numpy().astype(np.float64),
        }
    )
    for q, spec, by, asc in [
        ("tool output", "role asc", ["role"], [True]),
        ("tool output", "role desc", ["role"], [False]),
        ("assistant answer", "role desc, turn_idx asc", ["role", "turn_idx"], [False, True]),
        ("error", "turn_idx desc, role asc", ["turn_idx", "role"], [True, True]),  # dirs from spec
        ("+role:tool", "tool asc, turn_idx desc", ["tool", "turn_idx"], [True, False]),
        ("output", "tool desc", ["tool"], [False]),  # nulls last even on desc
    ]:
        if q == "error":
            asc = [False, True]
        matches = [d for d, _ in oracle.search(q, 10**9)]
        sub = ref.iloc[matches].copy()
        sub["doc"] = matches
        exp_rows = sub.sort_values(
            by + ["doc"], ascending=asc + [True], kind="mergesort", na_position="last"
        ).head(10)
        got = searcher.search_sorted(q, spec, 10)
        assert [d for d, _ in got] == exp_rows["doc"].tolist(), (q, spec)
        # values echo the sort key(s)
        for (d, v), (_, row) in zip(got, exp_rows.iterrows()):
            vals = (v,) if len(by) == 1 else v
            for col, vv in zip(by, vals):
                rv = row[col]
                if rv is None or (isinstance(rv, float) and np.isnan(rv)):
                    assert vv is None
                elif isinstance(rv, float):
                    assert vv == rv
                else:
                    assert vv == rv
