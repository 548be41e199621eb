"""PayloadScoreQuery ({!payload_score}): rank matching docs by aggregated
`tok|payload` payloads — dueled against a pandas recomputation on a
handcrafted payload corpus."""

import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search import Searcher

IDX = "/tmp/lsr_payload_index"
SRC = "/tmp/lsr_payload_corpus"

TEXTS = [
    "boost|2.5 alpha rocket|1.0",
    "boost|0.5 boost|4.0 beta",
    "plain boost here no payload",  # bare term → default payload 1.0
    "rocket|9.5 gamma delta",
    "boost|3.25 boost|0.25 epsilon",
    "nothing relevant at all",
]


@pytest.fixture(scope="module")
def payload_searcher(ray_session):
    import os

    shutil.rmtree(SRC, ignore_errors=True)
    shutil.rmtree(IDX, ignore_errors=True)
    os.makedirs(SRC)
    # two conv-range-partitioned files in path order (docID = base + rank)
    half = len(TEXTS) // 2
    paths = []
    for fi, lo in enumerate(range(0, len(TEXTS), half)):
        rows = list(range(lo, min(lo + half, len(TEXTS))))
        t = pa.table(
            {
                "conv_id": pa.array([f"c{r:04d}" for r in rows]),
                "turn_idx": pa.array([0] * len(rows), type=pa.int32()),
                "role": pa.array(["user"] * len(rows)),
                "tool": pa.array([""] * len(rows)),
                "text": pa.array([TEXTS[r] for r in rows]),
            }
        )
        p = f"{SRC}/part{fi}.parquet"
        pq.write_table(t, p)
        paths.append(p)
    build_index(paths, IDX, files_per_shard=1)
    s = Searcher(IDX)
    yield s
    s.close()


def oracle_payload(term: str, func: str, include_span=False, span=None):
    scored = []
    for d, text in enumerate(TEXTS):
        vals = []
        for w in text.split():
            i = w.find("|")
            if i > 0 and w[:i].lower() == term:
                vals.append(float(w[i + 1 :]))
            elif w.lower() == term:
                vals.append(1.0)
        if not vals:
            continue
        agg = {"min": min, "max": max, "sum": sum, "average": lambda v: sum(v) / len(v)}[func](vals)
        if include_span:
            agg *= span[d]
        scored.append((d, float(np.float32(agg))))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored


@pytest.mark.parametrize("func", ["min", "max", "sum", "average"])
def test_payload_score_functions(payload_searcher, func):
    got = payload_searcher.payload_score("boost", k=10, func=func)
    assert got == oracle_payload("boost", func)


def test_payload_bare_term_default(payload_searcher):
    # doc 2 has a bare 'boost' → payload 1.0
    got = dict(payload_searcher.payload_score("boost", k=10, func="max"))
    assert got[2] == 1.0


def test_payload_include_span_score(payload_searcher):
    span = dict(payload_searcher.search("boost", k=10))
    got = payload_searcher.payload_score("boost", k=10, func="sum", include_span_score=True)
    ref = oracle_payload("boost", "sum", include_span=True, span=span)
    assert [d for d, _ in got] == [d for d, _ in ref]
    for (d1, s1), (d2, s2) in zip(got, ref):
        assert abs(s1 - s2) < 1e-6


def test_payload_unknown_func_raises(payload_searcher):
    with pytest.raises(ValueError):
        payload_searcher.payload_score("boost", func="median")


def test_payload_no_matches(payload_searcher):
    assert payload_searcher.payload_score("zzzmissing", k=5) == []


# ---------------------------------------------------------------------------
# RealTimeGet (/get by unique key) — reuses the payload fixture index.


def test_realtime_get_by_key(payload_searcher):
    rows = payload_searcher.get("c0003", with_text=True)
    assert len(rows) == 1
    assert rows[0]["turn_idx"] == 0 and rows[0]["text"] == TEXTS[3]

    one = payload_searcher.get("c0001", turn_idx=0)
    assert len(one) == 1 and one[0]["doc_id"] == 1
    assert payload_searcher.get("c0001", turn_idx=99) == []


def test_realtime_get_missing_conv(payload_searcher):
    assert payload_searcher.get("zz_not_a_conv") == []
    assert payload_searcher.get("a_before_everything") == []


def test_realtime_get_respects_tombstones(ray_session):
    """Deleted docs don't /get (RealTimeGetComponent consults live docs)."""
    import numpy as np

    from lucene_solr_ray.search import Searcher

    s = Searcher(IDX)
    try:
        before = s.get("c0000")
        assert len(before) == 1
        s.delete_by_query("alpha")  # doc 0's text contains 'alpha'
        assert s.get("c0000") == []
    finally:
        # clear tombstones for other tests: remove the tombstone files
        import glob, os

        for f in glob.glob(f"{IDX}/tombstones/*.parquet") + glob.glob(f"{IDX}/tombstones/**/*.parquet"):
            os.remove(f)
        s.close()


# ---------------------------------------------------------------------------
# ClusteringComponent (search-result clustering) — payload fixture index.


def test_cluster_results_partitions_page(payload_searcher):
    clusters = payload_searcher.cluster_results("boost", k=10, n_clusters=2)
    hits = [d for d, _ in payload_searcher.search("boost", 10)]
    got = sorted(d for c in clusters for d in c["docs"])
    assert got == sorted(hits)  # clusters partition the result page
    assert all(c["label"] for c in clusters)
    # deterministic
    again = payload_searcher.cluster_results("boost", k=10, n_clusters=2)
    assert clusters == again


def test_cluster_results_empty_query(payload_searcher):
    assert payload_searcher.cluster_results("zzznothing") == []
