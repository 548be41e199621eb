"""ShortestPathStream analog: BFS distances + deterministic route
reconstruction vs a pure-pandas oracle on the bipartite part—order graph."""

import collections

import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _oracle_bfs(src: int, max_depth: int):
    """Driver-free BFS oracle: adjacency from the raw lineitem table."""
    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]).to_pandas()
    by_part = li.groupby("l_partkey")["l_orderkey"].agg(set)
    by_order = li.groupby("l_orderkey")["l_partkey"].agg(set)
    dist = {src: 0}
    frontier = [src]
    for d in range(1, max_depth + 1):
        nxt = set()
        for p in frontier:
            for o in by_part.get(p, ()):  # type: ignore[arg-type]
                nxt |= by_order[o]
        frontier = sorted(n for n in nxt if n not in dist)
        for n in frontier:
            dist[n] = d
    return dist


def test_shortest_path_distances_match_oracle(ray_session):
    from lucene_solr_ray.pipelines.graph import SP_MAX_DEPTH, START_PART, shortest_path_nodes

    got = shortest_path_nodes(SF)
    want = _oracle_bfs(START_PART, SP_MAX_DEPTH)
    assert dict(zip(got["node"], got["dist"])) == want


def test_shortest_path_route_is_shortest_and_valid(ray_session):
    from lucene_solr_ray.pipelines.graph import START_PART, shortest_path_route

    dist = _oracle_bfs(START_PART, 4)
    # pick a node at distance 2 (guaranteed to exist on the fixture)
    targets = [n for n, d in dist.items() if d == 2]
    assert targets, "fixture has no distance-2 node"
    dst = min(targets)
    path = shortest_path_route(SF, START_PART, dst, max_depth=4)
    assert path is not None and path[0] == START_PART and path[-1] == dst
    assert len(path) - 1 == dist[dst]  # shortest
    # every consecutive pair shares an order (valid edge)
    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]).to_pandas()
    by_part = li.groupby("l_partkey")["l_orderkey"].agg(set)
    for a, b in zip(path, path[1:]):
        assert by_part[a] & by_part[b], f"no shared order between {a} and {b}"


def test_shortest_path_unreachable_returns_none(ray_session):
    from lucene_solr_ray.pipelines.graph import START_PART, shortest_path_route

    assert shortest_path_route(SF, START_PART, 10**9, max_depth=2) is None
