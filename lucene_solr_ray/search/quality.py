"""IR-quality harness (lucene/benchmark/src/java/org/apache/lucene/
benchmark/quality/ — QualityBenchmark + QualityStats, SURVEY §5.6): given
topics (queries) and qrels (relevant doc sets), run the engine and report
precision@k, recall@k, MRR, and NDCG@k per topic plus macro averages.

Metrics follow the standard definitions (binary relevance):
  P@k   = |top-k ∩ rel| / k
  R@k   = |top-k ∩ rel| / |rel|
  RR    = 1 / rank of the first relevant hit (0 if none in top-k)
  NDCG@k = DCG@k / IDCG@k,  DCG = Σ rel_i / log2(i + 1)  (1-based ranks)
All arithmetic is plain float64 over small k — deterministic.
"""

from __future__ import annotations

import math


def ranking_stats(ranked: list[int], relevant: set[int], k: int = 10) -> dict:
    """Metrics for ONE topic given the engine's ranked doc ids."""
    top = ranked[:k]
    hits = [1 if d in relevant else 0 for d in top]
    n_rel = len(relevant)
    p_at_k = sum(hits) / k
    r_at_k = (sum(hits) / n_rel) if n_rel else 0.0
    rr = 0.0
    for i, h in enumerate(hits):
        if h:
            rr = 1.0 / (i + 1)
            break
    dcg = sum(h / math.log2(i + 2) for i, h in enumerate(hits))
    ideal = min(n_rel, k)
    idcg = sum(1.0 / math.log2(i + 2) for i in range(ideal))
    ndcg = dcg / idcg if idcg > 0 else 0.0
    return {"p_at_k": p_at_k, "recall_at_k": r_at_k, "mrr": rr, "ndcg": ndcg, "n_rel": n_rel}


def quality_benchmark(searcher, topics: dict[str, str], qrels: dict[str, set[int]], k: int = 10) -> dict:
    """Run every topic through `searcher.search` and judge against qrels.
    → {"topics": {tid: stats}, "macro": averaged stats over judged topics}
    (topics with empty qrels are skipped, like the reference's judge)."""
    per: dict[str, dict] = {}
    for tid, q in topics.items():
        rel = qrels.get(tid, set())
        if not rel:
            continue
        ranked = [d for d, _ in searcher.search(q, k)]
        per[tid] = ranking_stats(ranked, rel, k)
    macro = {}
    if per:
        for key in ("p_at_k", "recall_at_k", "mrr", "ndcg"):
            macro[key] = sum(s[key] for s in per.values()) / len(per)
    return {"topics": per, "macro": macro, "k": k, "n_topics": len(per)}
