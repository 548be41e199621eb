"""Per-shard HNSW (Lucene99HnswVectorsFormat / HnswGraphBuilder analog):
recall vs brute-force cosine, graph invariants, persistence."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_hnsw_recall_multi_query(ray_session):
    """Machinery-level duel: 20 random queries over one shard graph,
    mean recall@10 ≥ 0.9 vs exact cosine."""
    from lucene_solr_ray.pipelines.ann import _hnsw_build_shard, _hnsw_search_layer

    rng = np.random.default_rng(42)
    vecs = rng.standard_normal((800, 32)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    levels, adj, entry = _hnsw_build_shard(vecs, seed=1)
    recalls = []
    for _ in range(20):
        q = rng.standard_normal(32).astype(np.float32)
        q /= np.linalg.norm(q)
        exact = set(np.argsort(-(vecs @ q))[:10].tolist())
        cur = [entry]
        for l in range(len(adj) - 1, 0, -1):
            cur = _hnsw_search_layer(vecs, adj[l], cur, q, 1)[:1]
        got = set(_hnsw_search_layer(vecs, adj[0], cur, q, 64)[:10])
        recalls.append(len(exact & got) / 10)
    assert np.mean(recalls) >= 0.9, np.mean(recalls)
    # every node reachable at level 0 (adjacency covers all inserted nodes)
    assert set(adj[0]) == set(range(800))
    # degree bound: top-M cut holds
    from lucene_solr_ray.pipelines.ann import _HNSW_M
    assert max(len(v) for v in adj[0].values()) <= _HNSW_M


def test_hnsw_pipeline_and_persistence(ray_session):
    from lucene_solr_ray.pipelines.ann import ann_cosine_topk, ann_hnsw_topk, build_hnsw_index

    d = build_hnsw_index(SF, force=True)
    got = ann_hnsw_topk(SF, 10)
    exact = ann_cosine_topk(SF, 10)
    exact_ids = set(int(v) for v in exact["vec_id"]) if hasattr(exact, "columns") else {v for v, _ in exact}
    assert len(set(got["vec_id"]) & exact_ids) >= 8  # recall@10 ≥ 0.8
    assert got["vec_id"].iloc[0] == 0 and abs(got["sim"].iloc[0] - 1.0) < 1e-5
    # idempotent reuse: same manifest, identical results
    assert build_hnsw_index(SF) == d
    pd.testing.assert_frame_equal(ann_hnsw_topk(SF, 10), got)


def test_knnsearch_stream_hnsw_route(ray_session):
    """knnSearch(..., method=hnsw) routes through the persisted graphs and
    agrees with the exact stream on this corpus (self-hit first)."""
    import pytest

    from lucene_solr_ray.pipelines.streams import StreamExprError, run_expr

    exact = run_expr("knnSearch(embeddings, id=0, k=5)", SF)
    approx = run_expr("knnSearch(embeddings, id=0, k=5, method=hnsw)", SF)
    assert list(approx.columns) == list(exact.columns)
    assert approx["vec_id"].iloc[0] == 0 and approx["rank"].tolist() == [1, 2, 3, 4, 5]
    assert len(set(approx["vec_id"]) & set(exact["vec_id"])) >= 4
    with pytest.raises(StreamExprError):
        run_expr("knnSearch(events, id=0, k=5, method=hnsw)", SF)
