"""Kuromoji-lite Japanese segmentation: golden vectors, lattice
optimality vs exhaustive enumeration, offsets/positions properties, and
an end-to-end build_index(tokenizer="ja") duel."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.analysis.ja import (
    _BY_FIRST,
    _HIRA,
    _KATA,
    _UNK_HIRA,
    _UNK_KANJI,
    _UNK_KATA,
    _jclass,
    _viterbi,
    JA_STOP_WORDS,
    ja_index_tokenize,
    ja_tokenize,
    ja_tokenize_offsets,
)


def terms(s):
    return [t for t, _ in ja_tokenize(s)]


def test_golden_vectors():
    assert terms("私は日本語を勉強しています") == ["私", "は", "日本語", "を", "勉強", "して", "います"]
    assert terms("コンピュータを使う") == ["コンピュータ", "を", "使う"]
    assert terms("東京タワーに行きました") == ["東京", "タワー", "に", "行き", "ました"]
    assert terms("Rayで日本語検索") == ["ray", "で", "日本語", "検索"]
    assert terms("魑魅魍魎") == ["魑", "魅", "魍", "魎"]  # unknown kanji: per char
    assert terms("アームストロング") == ["アームストロング"]  # katakana group incl ー
    assert terms("") == []


def test_hangul_falls_back_to_bigrams():
    assert terms("한국어") == ["한국", "국어"]
    assert terms("한") == ["한"]


def _edge_cost(run, i, j):
    """Replicate the module's cost rules for one edge, or None if the
    edge does not exist — the exhaustive-enumeration oracle."""
    w = run[i:j]
    for cand, c in _BY_FIRST.get(run[i], ()):
        if cand == w:
            return c
    cls = _jclass(run[i])
    if cls == _KATA:
        k = i + 1
        while k < len(run) and _jclass(run[k]) == _KATA:
            k += 1
        return _UNK_KATA if j == k else None
    if j != i + 1:
        return None
    return _UNK_HIRA if cls == _HIRA else _UNK_KANJI


def _brute_min_cost(run, i=0):
    if i == len(run):
        return 0.0
    best = float("inf")
    for j in range(i + 1, len(run) + 1):
        c = _edge_cost(run, i, j)
        if c is not None:
            best = min(best, c + _brute_min_cost(run, j))
    return best


_ALPHABET = ["は", "から", "か", "ら", "れる", "日本", "語", "勉", "ス", "ー", "私", "東京", "京都", "都"]


@settings(max_examples=150, deadline=None)
@given(st.lists(st.sampled_from(_ALPHABET), min_size=1, max_size=5))
def test_lattice_is_min_cost(pieces):
    run = "".join(pieces)
    spans = _viterbi(run)
    # spans tile the run exactly
    assert spans[0][0] == 0 and spans[-1][1] == len(run)
    assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))
    got = sum(_edge_cost(run, a, b) for a, b in spans)
    assert got == _brute_min_cost(run)


def test_nongreedy_split():
    # left-longest greedy would take から then れる; the lattice relaxes
    # られる from i=1 first and keeps it at equal cost — a deterministic
    # tie documented in the module
    assert terms("かられる") == ["か", "られる"]


def test_offsets_and_positions():
    text = "私はレイRayでＸ日本語を検索した"
    toks = ja_tokenize_offsets(text)
    for t, _, a, b in toks:
        # word runs lowercase; lower() is identity on CJK spans
        assert text[a:b].lower() == t
    assert [p for _, p, _, _ in toks] == list(range(len(toks)))


def test_index_chain_stop_gaps():
    toks = ja_index_tokenize("私は日本語を勉強しています")
    assert ("は", 1) not in toks and ("を", 3) not in toks
    assert toks == [("私", 0), ("日本語", 2), ("勉強", 4), ("して", 5), ("います", 6)]
    assert all(w in JA_STOP_WORDS for w in ("は", "を", "の", "が"))


def test_ja8_concatenation_unambiguous():
    """The ja_segment_terms gate's soundness condition: every
    concatenation of the 8 mapped dictionary words re-segments at the
    original boundaries (pairs exhaustively, longer sequences sampled)."""
    import random
    from itertools import product

    from lucene_solr_ray.pipelines.multilingual import _JA8

    for pair in product(_JA8, repeat=2):
        t = "".join(pair)
        assert [t[a:b] for a, b in _viterbi(t)] == list(pair), pair
    rng = random.Random(0)
    for _ in range(300):
        ws = rng.choices(_JA8, k=rng.randint(3, 6))
        t = "".join(ws)
        assert [t[a:b] for a, b in _viterbi(t)] == ws, ws


def test_ja_index_build_and_search_duel(ray_session, tmp_path):
    """build_index(tokenizer="ja") over a mixed JA/EN corpus, dueled
    against the brute-force oracle analyzing with the SAME chain."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.oracle import BruteForceIndex
    from lucene_solr_ray.search import Searcher

    rng = np.random.default_rng(7)
    ja_words = ["日本語", "勉強", "検索", "東京", "京都", "コンピュータ", "タワー",
                "します", "ました", "私", "仕事", "電車", "猫", "犬", "魑魅"]
    en = ["merge", "fast", "query", "data", "index"]
    texts = []
    for _ in range(120):
        parts = []
        for _ in range(rng.integers(3, 9)):
            if rng.random() < 0.6:
                parts.append("".join(rng.choice(ja_words, rng.integers(1, 3))))
            else:
                parts.append(str(rng.choice(en)))
        texts.append(" ".join(parts))
    corpus = tmp_path / "part0.parquet"
    pq.write_table(
        pa.table(
            {
                "conv_id": pa.array([f"c{i:04d}" for i in range(len(texts))]),
                "turn_idx": pa.array(np.zeros(len(texts), dtype=np.int64)),
                "text": pa.array(texts),
                "role": pa.array(["user"] * len(texts)),
            }
        ),
        corpus,
    )
    idx = str(tmp_path / "idx")
    build_index([str(corpus)], idx, files_per_shard=1, tokenizer="ja")
    s = Searcher(idx)
    try:
        oracle = BruteForceIndex(
            texts, fields={"role": ["user"] * len(texts)}, analyzer=ja_index_tokenize
        )
        queries = [
            "日本語",
            "検索",
            "merge",
            "+merge 日本語",
            '"日本語検索"',     # phrase: two lattice tokens, adjacent
            '"東京タワー"',
            "merge fast",
            "コンピュータ",
        ]
        for q in queries:
            got = s.search(q, 10)
            exp = [(d, float(sc)) for d, sc in oracle.search(q, 10)]
            assert got == exp, q
        import json

        cfg = json.loads((tmp_path / "idx" / "manifest.json").read_text())["config"]
        assert cfg["tokenizer"] == "ja"
    finally:
        s.close()
        shutil.rmtree(idx, ignore_errors=True)
