"""Analyzer conformance (FIXTURES.md F4; pattern: BaseTokenStreamTestCase
invariants — positions monotone, posInc gaps at stopwords, lowercase terms)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.analysis import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    analyze_batch,
    tokenize,
)

GOLDEN = [
    ("", []),
    ("   ", []),
    ("The quick Brown FOX", [("quick", 1), ("brown", 2), ("fox", 3)]),
    # stopword gaps: 'the'@0 and 'and'@2 removed, positions keep gaps
    ("the dog and cat", [("dog", 1), ("cat", 3)]),
    ("a b c", [("b", 1), ("c", 2)]),  # 'a' is a stopword
    ("foo,bar.baz!qux", [("foo", 0), ("bar", 1), ("baz", 2), ("qux", 3)]),
    ("x3 42 w00042_z", [("x3", 0), ("42", 1), ("w00042_z", 2)]),
    ("repeat repeat repeat", [("repeat", 0), ("repeat", 1), ("repeat", 2)]),
    ("Tool OUTPUT bash", [("tool", 0), ("output", 1), ("bash", 2)]),
]


def test_golden_vectors():
    for text, expected in GOLDEN:
        assert tokenize(text) == expected, text


def test_all_33_stopwords_removed():
    assert len(ENGLISH_STOP_WORDS) == 33
    text = " ".join(sorted(ENGLISH_STOP_WORDS))
    assert tokenize(text) == []


def test_max_token_length_split():
    text = "a " + "y" * 600 + " tail"
    toks = tokenize(text)
    assert [t for t, _ in toks] == ["y" * 255, "y" * 255, "y" * 90, "tail"]
    # positions account for the stopword gap at 0 and the three pieces
    assert [p for _, p in toks] == [1, 2, 3, 4]


_fixture_text = st.lists(
    st.one_of(
        st.sampled_from(["the", "of", "assistant", "bash", "OK", "w00042", "Error,", "x" * 300]),
        st.text(alphabet="abcXYZ019_ .,!-", min_size=0, max_size=12),
    ),
    max_size=30,
).map(" ".join)


@given(st.lists(_fixture_text, min_size=0, max_size=20))
@settings(max_examples=50, deadline=None)
def test_vectorized_equals_scalar(texts):
    out = analyze_batch(pa.array(texts, type=pa.string()))
    for r, text in enumerate(texts):
        expected = tokenize(text)
        mask = out["row"] == r
        got = list(zip(out["term"][mask], out["pos"][mask]))
        assert got == expected
        assert out["dl"][r] == len(expected)


@given(_fixture_text)
@settings(max_examples=100, deadline=None)
def test_token_stream_invariants(text):
    toks = tokenize(text)
    positions = [p for _, p in toks]
    assert positions == sorted(positions)  # monotone positions
    assert len(set(positions)) == len(positions)  # unique (single-path stream)
    for t, p in toks:
        assert p >= 0
        assert t == t.lower()
        assert 0 < len(t) <= MAX_TOKEN_LENGTH
        assert t not in ENGLISH_STOP_WORDS


def test_null_handling():
    out = analyze_batch(pa.array([None, "ok go"], type=pa.string()))
    assert out["dl"][0] == 0
    assert list(out["term"]) == ["ok", "go"]
