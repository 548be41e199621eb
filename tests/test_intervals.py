"""Intervals algebra: vectorized batch evaluator vs per-doc reference,
and equivalence of the batched greedy chain / unordered window counters
with the legacy proximity functions (hypothesis property tests)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.search import intervals as IV
from lucene_solr_ray.search.proximity import sloppy_phrase_freq

TERMS = ["a", "b", "c"]


def make_provider(docs_pos: list[dict[str, list[int]]]):
    """docs_pos[i] = {term: positions} for doc i → actor-style provider."""
    tables = {}
    for t in TERMS:
        docs, freqs, positions = [], [], []
        for i, dp in enumerate(docs_pos):
            ps = sorted(dp.get(t, []))
            if ps:
                docs.append(i)
                freqs.append(len(ps))
                positions.extend(ps)
        if docs:
            f = np.asarray(freqs, dtype=np.int64)
            starts = np.zeros(f.size, dtype=np.int64)
            np.cumsum(f[:-1], out=starts[1:])
            tables[t] = (
                np.asarray(docs, dtype=np.int64),
                f,
                np.zeros(f.size, dtype=np.int64),
                np.asarray(positions, dtype=np.int64),
                starts,
            )
    return lambda term: tables.get(term)


pos_lists = st.lists(
    st.dictionaries(
        st.sampled_from(TERMS),
        st.lists(st.integers(0, 30), min_size=1, max_size=6, unique=True),
        max_size=3,
    ),
    min_size=1,
    max_size=5,
)


def trees():
    leaf = st.sampled_from(TERMS).map(IV.iterm)
    return st.recursive(
        leaf,
        lambda ch: st.one_of(
            st.tuples(ch, ch).map(lambda ab: IV.ordered(*ab)),
            st.tuples(ch, ch).map(lambda ab: IV.unordered(*ab)),
            st.tuples(ch, ch).map(lambda ab: IV.ior(*ab)),
            st.tuples(st.integers(1, 12), ch).map(lambda wc: IV.maxwidth(*wc)),
            st.tuples(ch, ch).map(lambda ab: IV.containing(*ab)),
            st.tuples(ch, ch).map(lambda ab: IV.not_containing(*ab)),
            st.tuples(ch, ch).map(lambda ab: IV.contained_by(*ab)),
            st.tuples(ch, ch).map(lambda ab: IV.not_contained_by(*ab)),
            st.tuples(ch, ch).map(lambda ab: IV.overlapping(*ab)),
        ),
        max_leaves=5,
    )


@settings(max_examples=300, deadline=None)
@given(docs=pos_lists, tree=trees())
def test_batch_matches_per_doc(docs, tree):
    provider = make_provider(docs)
    cand = np.arange(len(docs), dtype=np.int64)
    idoc, s, e = IV.eval_batch(tree, provider, cand)
    got = {}
    for i, ss, ee in zip(idoc, s, e):
        got.setdefault(int(i), []).append((int(ss), int(ee)))
    for i, dp in enumerate(docs):
        exp = IV.eval_doc(tree, dp)
        assert sorted(got.get(i, [])) == exp, (i, dp)


@settings(max_examples=200, deadline=None)
@given(docs=pos_lists, slop=st.integers(0, 10))
def test_chain_matches_sloppy_phrase(docs, slop):
    """chain_spans(minimal=False) + sloppyWeight sum == sloppy_phrase_freq
    (bit-identical float accumulation in p1 order)."""
    provider = make_provider(docs)
    cand = np.arange(len(docs), dtype=np.int64)
    terms = ["a", "b"]
    children = [IV.term_intervals(provider, t, cand) for t in terms]
    idoc, s, e = IV.chain_spans(children, minimal=False)
    if idoc.size:
        ml = (e - s) - (len(terms) - 1)
        ok = ml <= slop
        counts = np.bincount(idoc[ok], weights=1.0 / (1.0 + ml[ok]), minlength=len(docs))
    else:
        counts = np.zeros(len(docs), np.float64)
    for i, dp in enumerate(docs):
        pls = [sorted(dp.get(t, [])) for t in terms]
        exp = sloppy_phrase_freq(pls, slop) if all(pls) else 0.0
        assert counts[i] == exp, (i, dp)


def test_ordered_minimality_example():
    # a=[0,1], b=[2]: chains (0,2) and (1,2); minimal keeps only (1,2)
    d = [{"a": [0, 1], "b": [2]}]
    assert IV.eval_doc(IV.ordered(IV.iterm("a"), IV.iterm("b")), d[0]) == [(1, 2)]
    provider = make_provider(d)
    idoc, s, e = IV.eval_batch(
        IV.ordered(IV.iterm("a"), IV.iterm("b")), provider, np.arange(1, dtype=np.int64)
    )
    assert list(zip(s, e)) == [(1, 2)]


def test_containing_example():
    # windows of a..b containing c
    dp = {"a": [0, 10], "b": [3, 13], "c": [2, 20]}
    tree = IV.containing(IV.ordered(IV.iterm("a"), IV.iterm("b")), IV.iterm("c"))
    assert IV.eval_doc(tree, dp) == [(0, 3)]  # [10,13] has no c inside
