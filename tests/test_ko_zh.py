"""smartcn-lite (zh) and nori-lite (ko) chains: golden vectors, the
gate-soundness conditions (ZH8 concatenations re-segment at the original
boundaries; KO8×KO4 eojeol strip back to the noun), gate-vs-DuckDB duels
at sf0.001, and an end-to-end build_index(tokenizer=...) duel."""

import numpy as np
import pytest

from lucene_solr_ray.analysis.ko import (
    KO_STOP_WORDS,
    ko_index_tokenize,
    ko_tokenize,
    ko_tokenize_offsets,
    strip_suffix,
)
from lucene_solr_ray.analysis.zh import (
    ZH_STOP_WORDS,
    _viterbi,
    zh_index_tokenize,
    zh_tokenize,
    zh_tokenize_offsets,
)

SF = "/root/testdata/sf0.001"


def zterms(s):
    return [t for t, _ in zh_tokenize(s)]


def kterms(s):
    return [t for t, _ in ko_tokenize(s)]


def test_zh_golden_vectors():
    assert zterms("我们在中国学习中文") == ["我们", "在", "中国", "学习", "中文"]
    assert zterms("今天天气很好") == ["今天", "天气", "很", "好"]
    assert zterms("魑魅魍魎") == ["魑", "魅", "魍", "魎"]  # unknown hanzi per char
    assert zterms("Ray是搜索引擎") == ["ray", "是", "搜索", "引擎"]
    assert zterms("") == []
    # kana inside a run → out-of-domain bigram fallback
    assert zterms("で中国") == ["で中", "中国"]
    toks = zh_index_tokenize("这是我的电脑")
    assert [t for t, _ in toks] == ["这", "我", "电脑"]  # 是/的 stopped, gaps kept
    assert [p for _, p in toks] == [0, 2, 4]


def test_ko_golden_vectors():
    assert kterms("학교에서 친구를 만났습니다") == ["학교", "친구", "만났"]
    assert kterms("저는 한국어를 공부합니다") == ["저", "한국어", "공부"]
    assert kterms("") == []
    assert strip_suffix("학교에서는") == ("학교", "에서는")  # longest suffix wins
    assert strip_suffix("은") == ("은", "")  # standalone particle stays whole
    # ...and the index chain drops it (POS-stop-filter analog)
    assert [t for t, _ in ko_index_tokenize("은 학교에서")] == ["학교"]
    # mixed hanja-hangul run → bigram fallback
    assert kterms("漢字한글") == ["漢字", "字한", "한글"]


def test_offsets_and_positions():
    for text, offs in [
        ("我们在Ray中国", zh_tokenize_offsets),
        ("학교에서 Ray 친구를", ko_tokenize_offsets),
    ]:
        toks = offs(text)
        for t, _, a, b in toks:
            assert text[a:b].lower().startswith(t) or text[a:b].lower() == t
        assert [p for _, p, _, _ in toks] == list(range(len(toks)))


def test_zh8_concatenation_unambiguous():
    """Gate soundness: every concatenation of the 8 mapped words
    re-segments at the original boundaries (pairs exhaustively, longer
    sequences sampled)."""
    import random
    from itertools import product

    from lucene_solr_ray.pipelines.multilingual import _ZH8

    for pair in product(_ZH8, repeat=2):
        t = "".join(pair)
        assert [t[a:b] for a, b in _viterbi(t)] == list(pair), pair
    rng = random.Random(0)
    for _ in range(300):
        ws = rng.choices(_ZH8, k=rng.randint(3, 6))
        t = "".join(ws)
        assert [t[a:b] for a, b in _viterbi(t)] == ws, ws


def test_ko8_strip_recovers_noun():
    """Gate soundness: every (noun, josa) eojeol strips back to exactly
    the noun, and no noun is itself strippable or a stop word."""
    from itertools import product

    from lucene_solr_ray.pipelines.multilingual import _KO4, _KO8

    for noun, josa in product(_KO8, _KO4):
        assert strip_suffix(noun + josa) == (noun, josa), (noun, josa)
    for noun in _KO8:
        assert strip_suffix(noun) == (noun, "")
        assert noun not in KO_STOP_WORDS


def test_gates_match_duckdb(ray_session):
    import duckdb

    from lucene_solr_ray.pipelines.multilingual import (
        KO_STRIP_SQL,
        ZH_SEGMENT_SQL,
        ko_strip_particles,
        zh_segment_terms,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    for fn, sql in [(zh_segment_terms, ZH_SEGMENT_SQL), (ko_strip_particles, KO_STRIP_SQL)]:
        got = fn(SF)
        exp = con.execute(sql).df()
        assert got["term"].tolist() == exp["term"].tolist()
        assert got["cnt"].tolist() == exp["cnt"].tolist()


def test_zh_index_build_and_search_duel(ray_session, tmp_path):
    """build_index(tokenizer="zh") over a mixed ZH/EN corpus, dueled
    against the brute-force oracle analyzing with the SAME chain."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.oracle import BruteForceIndex
    from lucene_solr_ray.search import Searcher

    rng = np.random.default_rng(11)
    zh_words = ["中国", "时间", "工作", "学习", "电脑", "音乐", "搜索", "引擎",
                "数据", "程序", "我们", "什么", "魑魅", "知道", "问题"]
    en = ["merge", "fast", "query", "data", "index"]
    texts = []
    for _ in range(120):
        parts = []
        for _ in range(rng.integers(3, 9)):
            if rng.random() < 0.6:
                parts.append("".join(rng.choice(zh_words, rng.integers(1, 3))))
            else:
                parts.append(str(rng.choice(en)))
        texts.append(" ".join(parts))
    corpus = tmp_path / "part0.parquet"
    pq.write_table(
        pa.table(
            {
                "conv_id": pa.array([f"c{i:04d}" for i in range(len(texts))]),
                "turn_idx": pa.array(np.zeros(len(texts), dtype=np.int64)),
                "role": pa.array(["user"] * len(texts)),
                "text": pa.array(texts),
            }
        ),
        corpus,
    )
    idx = tmp_path / "idx"
    build_index([str(corpus)], str(idx), files_per_shard=1, tokenizer="zh")
    s = Searcher(str(idx))
    try:
        oracle = BruteForceIndex(
            texts, fields={"role": ["user"] * len(texts)}, analyzer=zh_index_tokenize
        )
        for q in ["中国", "搜索 引擎", "merge", "数据 query", "什么", '"搜索引擎"']:
            got = s.search(q, 10)
            exp = [(d, float(sc)) for d, sc in oracle.search(q, 10)]
            assert got == exp, q
    finally:
        s.close()


def test_ko_index_build_and_search_duel(ray_session, tmp_path):
    """build_index(tokenizer="ko"): queries with ATTACHED particles must
    match documents whose eojeol carry different particles (both sides
    strip to the same stem)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.oracle import BruteForceIndex
    from lucene_solr_ray.search import Searcher

    rng = np.random.default_rng(13)
    eojeol = ["학교에서", "학교는", "친구를", "친구가", "음악을", "음악은",
              "나라의", "시간이", "한국어를", "공부합니다", "만났습니다", "갔다"]
    en = ["merge", "fast", "query"]
    texts = []
    for _ in range(100):
        parts = [
            str(rng.choice(eojeol)) if rng.random() < 0.7 else str(rng.choice(en))
            for _ in range(rng.integers(3, 8))
        ]
        texts.append(" ".join(parts))
    corpus = tmp_path / "part0.parquet"
    pq.write_table(
        pa.table(
            {
                "conv_id": pa.array([f"c{i:04d}" for i in range(len(texts))]),
                "turn_idx": pa.array(np.zeros(len(texts), dtype=np.int64)),
                "role": pa.array(["user"] * len(texts)),
                "text": pa.array(texts),
            }
        ),
        corpus,
    )
    idx = tmp_path / "idx"
    build_index([str(corpus)], str(idx), files_per_shard=1, tokenizer="ko")
    s = Searcher(str(idx))
    try:
        oracle = BruteForceIndex(
            texts, fields={"role": ["user"] * len(texts)}, analyzer=ko_index_tokenize
        )
        for q in ["학교", "학교를", "친구는", "음악", "merge 학교", "공부"]:
            got = s.search(q, 10)
            exp = [(d, float(sc)) for d, sc in oracle.search(q, 10)]
            assert got == exp, q
        # particle-blind recall: 학교는 and 학교에서 both hit the 학교 stem
        assert {d for d, _ in s.search("학교가", 10**6)} == {
            i for i, t in enumerate(texts) if "학교" in t
        }
    finally:
        s.close()
