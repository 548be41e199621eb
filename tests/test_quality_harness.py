"""QualityBenchmark analog: engine rankings judged against brute-force
conjunctive qrels over the reference query set; metric arithmetic pinned
by hand-computed vectors."""

import math

from lucene_solr_ray.search.quality import quality_benchmark, ranking_stats
from tests.test_build_search import corpus, index, oracle, searcher  # noqa: F401


def test_ranking_stats_hand_vectors():
    s = ranking_stats([1, 9, 2, 8, 3], {1, 2, 3}, k=5)
    assert s["p_at_k"] == 3 / 5 and s["recall_at_k"] == 1.0 and s["mrr"] == 1.0
    dcg = 1 / math.log2(2) + 1 / math.log2(4) + 1 / math.log2(6)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert s["ndcg"] == dcg / idcg
    assert ranking_stats([7, 8], {1}, k=2) == {
        "p_at_k": 0.0, "recall_at_k": 0.0, "mrr": 0.0, "ndcg": 0.0, "n_rel": 1,
    }
    # first relevant at rank 3 → RR = 1/3
    assert ranking_stats([5, 6, 1], {1}, k=10)["mrr"] == 1.0 / 3


def test_quality_benchmark_engine_vs_conjunctive_qrels(searcher, oracle):  # noqa: F811
    """Topics = multi-term reference-style queries; qrels = docs matching
    ALL terms (brute force).  BM25 must place conjunctive matches well:
    macro MRR and NDCG are high, and every metric equals the same
    computation over the oracle's OWN ranking of the engine's top-k."""
    topics = {
        "t1": "error ok",
        "t2": "tool output",
        "t3": "assistant answer",
        "t4": "bash error",
    }
    qrels = {}
    for tid, q in topics.items():
        terms = q.split()
        sets = [{d for d, _ in oracle.search(t, 10**9)} for t in terms]
        rel = set.intersection(*sets)
        qrels[tid] = rel
    rep = quality_benchmark(searcher, topics, qrels, k=10)
    assert rep["n_topics"] == sum(1 for r in qrels.values() if r)
    assert rep["macro"]["mrr"] >= 0.9  # a conjunctive match tops most lists
    assert 0 < rep["macro"]["ndcg"] <= 1.0
    # engine ranking == oracle ranking ⇒ identical per-topic stats
    for tid, q in topics.items():
        if not qrels[tid]:
            continue
        exp = ranking_stats([d for d, _ in oracle.search(q, 10)], qrels[tid], 10)
        assert rep["topics"][tid] == exp, tid
