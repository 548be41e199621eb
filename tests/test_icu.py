"""ICU-lite tokenizer (analysis/icu.py): golden vectors + offsets/posInc
property tests over non-ASCII corpora, and the multilingual gates'
building blocks (the gates themselves run in test_pipelines/replica)."""

import unicodedata

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.analysis.icu import (
    _CJK,
    _classify,
    icu_terms,
    icu_tokenize,
    icu_tokenize_offsets,
)
from lucene_solr_ray.analysis.tokenizers import TOKENIZER_REGISTRY


def test_golden_vectors():
    assert icu_terms("hello world") == ["hello", "world"]
    assert icu_terms("你好世界") == ["你好", "好世", "世界"]  # CJK bigrams
    assert icu_terms("你") == ["你"]  # lone CJK char → unigram
    assert icu_terms("hello你好world") == ["hello", "你好", "world"]
    assert icu_terms("abcабв") == ["abc", "абв"]  # script split
    assert icu_terms("abc123") == ["abc123"]  # digits join letters
    assert icu_terms("123abc") == ["123abc"]  # ...in either order
    assert icu_terms("Grüße ΑΒΓ") == ["grüße", "αβγ"]  # lowercased
    assert icu_terms("café") == ["café"]  # composed
    assert icu_terms("café") == ["café"]  # combining mark attaches
    assert icu_terms("ドラえもん") == ["ドラ", "ラえ", "えも", "もん"]  # kana mix bigrams
    assert icu_terms("。、！ \t") == []
    assert icu_terms("") == []


def test_registry_entries():
    assert icu_terms("x") == [t for t, _ in TOKENIZER_REGISTRY["icu"]()("x")]
    assert TOKENIZER_REGISTRY["cjk"]()("你好") == [("你好", 0)]


# mixed-script alphabet: Latin, Greek, Cyrillic, Han, Hiragana, Hangul,
# digits, combining marks, punctuation/space breaks
_ALPHABET = (
    "abcXYZ0189 _-.,!"
    "αβΩ" "абЯ" "你好世界漢字" "かなカナ" "한국" "́̈" "é"
)


@st.composite
def _texts(draw):
    return "".join(draw(st.lists(st.sampled_from(_ALPHABET), max_size=40)))


@given(_texts())
@settings(max_examples=300, deadline=None)
def test_offsets_and_positions_invariants(text):
    toks = icu_tokenize_offsets(text)
    prev_pos = -1
    for term, pos, start, end in toks:
        # positions: strictly increasing, increment exactly 1
        assert pos == prev_pos + 1
        prev_pos = pos
        # offsets: in-bounds, non-empty, term derives from the slice
        assert 0 <= start < end <= len(text)
        assert term == text[start:end].lower()
        # a token never mixes CJK and non-CJK characters
        kinds = _classify(np.frombuffer(text[start:end].encode("utf-32-le"), dtype=np.uint32))[0]
        assert (kinds == _CJK).all() or not (kinds == _CJK).any()
        # CJK tokens are bigrams (or a lone unigram)
        if (kinds == _CJK).all():
            assert len(term) in (1, 2)
    # offsets of consecutive tokens never move backwards by more than the
    # bigram overlap (start is non-decreasing)
    starts = [s for _, _, s, _ in toks]
    assert starts == sorted(starts)


@given(_texts())
@settings(max_examples=200, deadline=None)
def test_break_chars_never_tokenized(text):
    joined = "".join(icu_terms(text))
    for ch in " _-.,!、。！":
        assert ch not in joined


@given(_texts())
@settings(max_examples=200, deadline=None)
def test_token_shape_matches_offsets_variant(text):
    assert icu_tokenize(text) == [(t, p) for t, p, _, _ in icu_tokenize_offsets(text)]


def test_cjk_run_bigram_count_arithmetic():
    # the gate's SQL twin arithmetic: n-1 bigrams per n-char run, 1 for a
    # lone char — verified against the tokenizer over random run layouts
    rng = np.random.default_rng(3)
    for _ in range(50):
        runs = ["".join(chr(0x4E00 + c) for c in rng.integers(0, 36, rng.integers(1, 9))) for _ in range(rng.integers(1, 6))]
        text = " ".join(runs)
        expect = sum(1 if len(r) == 1 else len(r) - 1 for r in runs)
        assert len(icu_terms(text)) == expect


def test_derived_zh_slice_matches_translate():
    # pipelines/multilingual._derive == DuckDB translate() semantics
    from lucene_solr_ray.pipelines.multilingual import _DST, _SRC, _derive

    batch = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["fast join scan", "fast join scan"], "lang": ["zh", "en"]}
    )
    out = _derive(batch)
    import duckdb

    exp = duckdb.sql(
        f"SELECT translate('fast join scan', '{_SRC} _', '{_DST}')"
    ).fetchone()[0]
    assert out.iloc[0] == exp
    assert out.iloc[1] == "fast join scan"
    assert " " not in out.iloc[0] and all(unicodedata.category(c) == "Lo" for c in out.iloc[0])
