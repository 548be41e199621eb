"""fl= field-list projection (SearchHandler / RetrieveFieldsOptimizer:
stored + doc-values projection for the winners only)."""

import numpy as np
import pytest

from tests.test_build_search import corpus, index, oracle, searcher  # noqa: F401


def test_select_fl_projection(searcher, corpus):  # noqa: F811
    _, full = corpus
    conv = full.column("conv_id").to_numpy()
    turn = full.column("turn_idx").to_numpy()
    role = full.column("role").to_pylist()
    text = full.column("text").to_pylist()

    hits = searcher.search("tool output", 7)
    df = searcher.select("tool output", 7, fl=["conv_id", "turn_idx", "role", "score", "text"])
    assert df["doc_id"].tolist() == [d for d, _ in hits]
    assert df["score"].tolist() == [np.float32(s) for _, s in hits]
    for _, r in df.iterrows():
        d = int(r["doc_id"])
        assert r["conv_id"] == conv[d] and r["turn_idx"] == turn[d]
        assert r["role"] == role[d] and r["text"] == text[d]


def test_select_fl_through_dispatcher_and_errors(searcher):  # noqa: F811
    # fl with a {!parser} main query rides the same front door
    df = searcher.select("{!prefix f=role}too", 5, fl=["role", "score"])
    assert set(df["role"]) <= {"tool"}
    # empty result keeps the schema
    empty = searcher.select("zzzzqqq", 5, fl=["conv_id", "score"])
    assert list(empty.columns) == ["doc_id", "conv_id", "score"] and len(empty) == 0
    with pytest.raises(KeyError):
        searcher.select("tool", 3, fl=["no_such_field"])


def test_query_sort_param(searcher):  # noqa: F811
    """sort= through the front door == search_sorted, incl. start paging."""
    assert searcher.query("tool output", 10, sort="turn_idx desc") == searcher.search_sorted(
        "tool output", "turn_idx desc", 10
    )
    full = searcher.query("tool output", 10, sort="turn_idx asc")
    assert searcher.query("tool output", 4, sort="turn_idx asc", start=3) == full[3:7]
    with pytest.raises(Exception):
        searcher.query("{!surround}a 3w b", 5, sort="turn_idx")
    with pytest.raises(Exception):
        searcher.query("x", 5, fq="{!collapse field=role}", sort="turn_idx")


def test_sorted_cursor_paging(searcher, oracle, corpus):  # noqa: F811
    """cursorMark on field sorts: pages chain without gaps/overlaps and
    concatenate to the full sorted result — numeric, string (mostly-null),
    and compound specs."""
    for q, spec in [
        ("tool output", "turn_idx asc"),
        ("tool output", "turn_idx desc"),
        ("assistant answer", "role desc, turn_idx asc"),
        ("output", "tool asc"),  # null-heavy string key
    ]:
        full = searcher.search_sorted(q, spec, 10**6)
        pages, after = [], None
        while True:
            page = searcher.search_sorted(q, spec, 7, after=after)
            if not page:
                break
            pages.extend(page)
            after = page[-1]
        assert pages == full, (q, spec)


def test_search_grouped_group_sort(searcher, oracle, corpus):  # noqa: F811
    """group.sort=turn_idx asc|desc: groups still rank by best score hit;
    members re-rank by the dv field — dueled vs brute force."""
    _, full = corpus
    role = full.column("role").to_pylist()
    turn = full.column("turn_idx").to_numpy()
    for q, asc in [("tool output", True), ("error ok", False)]:
        ranked = oracle.search(q, 10**6)
        groups = {}
        for d, s in ranked:  # best-score order
            v = role[d]
            if v is not None:
                groups.setdefault(v, []).append(d)
        exp = []
        for v in list(groups)[:5]:  # insertion order == best-hit order
            members = sorted(groups[v], key=lambda d: (turn[d] if asc else -turn[d], d))[:3]
            sc = dict(ranked)
            exp.append((v, [(d, float(sc[d])) for d in members]))
        got = searcher.search_grouped(q, "role", k=5, group_limit=3, group_sort=f"turn_idx {'asc' if asc else 'desc'}")
        assert got == exp, (q, asc)


def test_export_streamed_sorted(searcher, oracle, corpus, tmp_path):  # noqa: F811
    """/export: full match set globally sorted, streamed through the
    chunked k-way merge (tiny batch_rows forces many merge rounds) —
    byte-identical to the brute-force ordering, asc and desc."""
    import pyarrow.parquet as pq

    _, full = corpus
    turn = full.column("turn_idx").to_numpy().astype(np.float64)
    dl_like = None
    for asc in (True, False):
        out = str(tmp_path / f"exp_{asc}.parquet")
        n = searcher.export("tool output", "turn_idx", out, fl=["dl"], ascending=asc, batch_rows=64)
        t = pq.read_table(out).to_pandas()
        matches = [d for d, _ in oracle.search("tool output", 10**9)]
        order = sorted(matches, key=lambda d: ((turn[d] if asc else -turn[d]), d))
        assert n == len(order) == len(t)
        assert t["doc_id"].tolist() == order
        assert t["turn_idx"].tolist() == [turn[d] for d in order]
        assert "dl" in t.columns
    # empty result still writes a valid file
    out0 = str(tmp_path / "empty.parquet")
    assert searcher.export("zzzznope", "turn_idx", out0) == 0
    assert len(pq.read_table(out0)) == 0


def test_select_fl_score_with_sort_refused(searcher):  # noqa: F811
    """Review fix: field sorts don't score — fl=score with sort= raises
    instead of mislabeling sort keys; non-score fl works with sort."""
    with pytest.raises(ValueError):
        searcher.select("tool output", 5, fl=["score"], sort="turn_idx asc")
    df = searcher.select("tool output", 5, fl=["turn_idx"], sort="turn_idx desc")
    vals = df["turn_idx"].to_numpy()
    assert (vals[:-1] >= vals[1:]).all()


def test_q_op_survives_fq_and_sort(searcher):  # noqa: F811
    """Review fix: q.op=AND is honored when combined with fq= / sort=."""
    strict = {d for d, _ in searcher.search("+error +ok", 10**6)}
    got = searcher.query("{!lucene q.op=AND}error ok", 10**6, fq="role:assistant")
    assert {d for d, _ in got} <= strict
    loose = searcher.query("{!lucene}error ok", 10**6, fq="role:assistant")
    assert {d for d, _ in got} < {d for d, _ in loose}
    s1 = searcher.query("{!lucene q.op=AND}error ok", 10**6, sort="turn_idx asc")
    assert {d for d, _ in s1} == strict
