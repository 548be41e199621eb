"""Graph traversal over a relational edge set (SURVEY.md §2.5).

Reimplements the reference's iterative frontier expansion
(solr/core/src/java/org/apache/solr/search/join/GraphQuery.java;
streaming GatherNodesStream) Ray-Data-first: a DRIVER LOOP of broadcast
semi-joins — each hop broadcasts the (small) frontier key-set via ray.put
and scans the edge table with a vectorized membership filter; the edge
table itself is never shuffled.  Partitioning assumption: frontiers stay
driver-sized (classic for graph queries over dimension-bounded keys); a
frontier that outgrows the driver would switch to a hash-join per hop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .common import Pipeline, read

START_PART = 1
HOPS = 2


def _member_scan(
    sf_dir: str, col_filter: str, keys: np.ndarray, col_out: str, table: str = "lineitem"
) -> np.ndarray:
    """Distinct values of col_out over rows where col_filter ∈ keys."""
    import ray

    ref = ray.put(np.sort(keys))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ref)
        v = batch[col_filter].to_numpy()
        idx = np.clip(np.searchsorted(ks, v), 0, max(ks.size - 1, 0))
        mask = ks[idx] == v if ks.size else np.zeros(v.size, bool)
        return pd.DataFrame({col_out: pd.unique(batch.loc[mask, col_out])})

    parts = (
        read(sf_dir, table, [col_filter, col_out])
        .map_batches(f, batch_format="pandas")
        .to_pandas()
    )
    if col_out not in parts.columns:
        return np.empty(0, dtype=np.int64)
    return np.unique(parts[col_out].to_numpy())


def gather_counts(
    sf_dir: str, table: str, col_filter: str, keys: np.ndarray, col_out: str
) -> pd.DataFrame:
    """One GatherNodesStream hop with edge counts: rows where col_filter ∈
    keys, grouped by the gathered col_out value → (node, n).  Same broadcast
    membership scan as _member_scan; per-task output is bounded by the
    gathered-node domain of the batch, never the batch size."""
    import ray

    ref = ray.put(np.sort(keys))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ref)
        v = batch[col_filter].to_numpy()
        idx = np.clip(np.searchsorted(ks, v), 0, max(ks.size - 1, 0))
        mask = ks[idx] == v if ks.size else np.zeros(v.size, bool)
        hit = batch.loc[mask, col_out]
        return hit.value_counts().rename_axis("node").reset_index(name="n")

    parts = (
        read(sf_dir, table, [col_filter, col_out])
        .map_batches(f, batch_format="pandas")
        .to_pandas()
    )
    if "node" not in parts.columns or parts.empty:
        return pd.DataFrame({"node": pd.Series(dtype="int64"), "n": pd.Series(dtype="int64")})
    out = parts.groupby("node", as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def graph_traversal(sf_dir: str):
    """Parts reachable from START_PART within HOPS co-order hops."""
    parts = np.array([START_PART], dtype=np.int64)
    for _ in range(HOPS):
        orders = _member_scan(sf_dir, "l_partkey", parts, "l_orderkey")
        parts = _member_scan(sf_dir, "l_orderkey", orders, "l_partkey")
    return pd.DataFrame({"partkey": np.sort(parts).astype("int64")})


# --------------------------------------------------------------------------
# ShortestPathStream (solr/solrj/.../io/stream/ShortestPathStream.java):
# BFS distance labelling from a source node, driver loop of broadcast
# frontier scans.  The part—part graph is bipartite through orders
# (p1 ~ p2 iff they share an l_orderkey).  The frontier and the distance
# map stay driver-sized (node domain = part keys, dimension-bounded); the
# edge table is only ever scanned with a broadcast membership filter,
# never shuffled — the same partitioning assumption as graph_traversal.

SP_MAX_DEPTH = 2


def shortest_path_nodes(sf_dir: str, src: int = START_PART, max_depth: int = SP_MAX_DEPTH):
    """BFS distance of every part within max_depth co-order hops of src."""
    dist: dict[int, int] = {int(src): 0}
    frontier = np.array([src], dtype=np.int64)
    for d in range(1, max_depth + 1):
        if frontier.size == 0:
            break
        orders = _member_scan(sf_dir, "l_partkey", frontier, "l_orderkey")
        nxt = _member_scan(sf_dir, "l_orderkey", orders, "l_partkey")
        frontier = np.array([p for p in nxt.tolist() if p not in dist], dtype=np.int64)
        for p in frontier.tolist():
            dist[p] = d
    out = pd.DataFrame(sorted(dist.items()), columns=["node", "dist"])
    return out.astype({"node": "int64", "dist": "int64"})


def _pair_scan(
    sf_dir: str,
    frontier: np.ndarray,
    table: str = "lineitem",
    node_col: str = "l_partkey",
    doc_col: str = "l_orderkey",
) -> pd.DataFrame:
    """(src_node, dst_node) edges out of the frontier: min src per (doc,
    dst) — enough to pick deterministic min-predecessors.  Rows leaving
    each task are bounded by (docs touched × nodes per doc), i.e. the
    frontier's edge neighbourhood, not the table."""
    import ray

    ref = ray.put(np.sort(frontier))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ref)
        v = batch[node_col].to_numpy()
        idx = np.clip(np.searchsorted(ks, v), 0, max(ks.size - 1, 0))
        m = ks[idx] == v if ks.size else np.zeros(v.size, bool)
        return batch.loc[m, [doc_col, node_col]].drop_duplicates()

    hits = (
        read(sf_dir, table, [doc_col, node_col])
        .map_batches(f, batch_format="pandas")
        .to_pandas()
    )
    if hits.empty:
        return pd.DataFrame({"src": [], "dst": []})
    # min frontier node per touched doc (deterministic predecessor)
    src_per_doc = hits.groupby(doc_col, as_index=False)[node_col].min()
    src_per_doc.columns = [doc_col, "src"]
    docs = src_per_doc[doc_col].to_numpy(np.int64)
    dsts = _member_pairs(sf_dir, docs, table, node_col, doc_col)
    out = dsts.merge(src_per_doc, on=doc_col)[["src", node_col]]
    out.columns = ["src", "dst"]
    return out.groupby("dst", as_index=False)["src"].min()[["src", "dst"]]


def _member_pairs(
    sf_dir: str,
    docs: np.ndarray,
    table: str = "lineitem",
    node_col: str = "l_partkey",
    doc_col: str = "l_orderkey",
) -> pd.DataFrame:
    """Distinct (doc_col, node_col) rows with doc_col ∈ docs."""
    import ray

    ref = ray.put(np.sort(docs))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ref)
        v = batch[doc_col].to_numpy()
        idx = np.clip(np.searchsorted(ks, v), 0, max(ks.size - 1, 0))
        m = ks[idx] == v if ks.size else np.zeros(v.size, bool)
        return batch.loc[m, [doc_col, node_col]].drop_duplicates()

    out = (
        read(sf_dir, table, [doc_col, node_col])
        .map_batches(f, batch_format="pandas")
        .to_pandas()
    )
    return out.drop_duplicates() if not out.empty else pd.DataFrame({doc_col: [], node_col: []})


def shortest_path_route(
    sf_dir: str,
    src: int,
    dst: int,
    max_depth: int = 6,
    table: str = "lineitem",
    node_col: str = "l_partkey",
    doc_col: str = "l_orderkey",
) -> list[int] | None:
    """One deterministic shortest path src→dst (min-predecessor BFS walk),
    or None if dst is unreachable within max_depth hops."""
    pred: dict[int, int] = {int(src): -1}
    frontier = np.array([src], dtype=np.int64)
    for _ in range(max_depth):
        if int(dst) in pred or frontier.size == 0:
            break
        edges = _pair_scan(sf_dir, frontier, table, node_col, doc_col)
        new = edges[~edges["dst"].isin(pred)]
        for s, t in zip(new["src"].astype(int), new["dst"].astype(int)):
            pred[t] = s
        frontier = new["dst"].to_numpy(np.int64)
    if int(dst) not in pred:
        return None
    path, cur = [], int(dst)
    while cur != -1:
        path.append(cur)
        cur = pred[cur]
    return path[::-1]


# --------------------------------------------------------------------------
# ScoreNodesStream (solr/solrj/.../io/stream/ScoreNodesStream.java): tf-idf
# scoring of gathered nodes — gather count × idf of the node over the full
# corpus.  Same frontier-broadcast shape as gatherNodes: per-batch partials
# are bounded by the frontier's edge neighbourhood; only (node, cnt) /
# (node, order) partials leave the tasks; N comes from a count() aggregate.
# Scores use scalar libm log on the driver (bounded node set) for
# bit-parity with the DuckDB ln() twin.

SCORE_NODES_TOP = 25


def score_gathered_nodes(
    sf_dir: str,
    gathered: pd.DataFrame,  # (node, cnt)
    table: str = "lineitem",
    node_col: str = "l_partkey",
    doc_col: str = "l_orderkey",
    docs_table: str = "orders",
    docs_key: str = "o_orderkey",
    top: int = SCORE_NODES_TOP,
) -> pd.DataFrame:
    """tf-idf score a gathered (node, cnt) set: df = distinct docs per node
    over the edge table (broadcast membership scan), N = docs_table row
    count (parquet footer metadata), score = cnt × ln((N+1)/(df+1)) with
    scalar libm log on the driver (bounded node set — ln-twin parity)."""
    import math

    import ray

    if gathered.empty:
        return pd.DataFrame(
            {
                "node": pd.Series([], dtype="int64"),
                "cnt": pd.Series([], dtype="int64"),
                "df": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            }
        )
    nodes = gathered["node"].to_numpy(np.int64)
    nref = ray.put(np.sort(nodes))

    def doc_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(nref)
        v = batch[node_col].to_numpy()
        idx = np.clip(np.searchsorted(ks, v), 0, max(ks.size - 1, 0))
        m = ks[idx] == v if ks.size else np.zeros(v.size, bool)
        return batch.loc[m, [node_col, doc_col]].drop_duplicates()

    pairs = (
        read(sf_dir, table, [doc_col, node_col])
        .map_batches(doc_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    df = pairs.groupby(node_col).size().rename("df").rename_axis("node").reset_index()
    n_docs = read(sf_dir, docs_table, [docs_key]).count()

    out = gathered.merge(df, on="node")
    out["score"] = np.array(
        [float(c) * math.log((n_docs + 1.0) / (int(d) + 1.0)) for c, d in zip(out["cnt"], out["df"])],
        dtype=np.float64,
    )
    out["node"] = out["node"].astype("int64")
    out["cnt"] = out["cnt"].astype("int64")
    out["df"] = out["df"].astype("int64")
    return (
        out.sort_values(["score", "node"], ascending=[False, True])
        .head(top)
        .reset_index(drop=True)[["node", "cnt", "df", "score"]]
    )


def score_nodes(sf_dir: str):
    orders = _member_scan(sf_dir, "l_partkey", np.array([START_PART], np.int64), "l_orderkey")
    g = gather_counts(sf_dir, "lineitem", "l_orderkey", orders, "l_partkey").rename(
        columns={"n": "cnt"}
    )
    return score_gathered_nodes(sf_dir, g)


SCORE_NODES_SQL = f"""
WITH o1 AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_partkey = {START_PART}),
g AS (SELECT l_partkey AS node, COUNT(*) AS cnt FROM lineitem
      WHERE l_orderkey IN (SELECT l_orderkey FROM o1) GROUP BY l_partkey),
d AS (SELECT l_partkey AS node, COUNT(DISTINCT l_orderkey) AS df FROM lineitem
      WHERE l_partkey IN (SELECT node FROM g) GROUP BY l_partkey),
n AS (SELECT COUNT(*) AS n FROM orders)
SELECT g.node, CAST(g.cnt AS BIGINT) AS cnt, CAST(d.df AS BIGINT) AS df,
       g.cnt * ln((n.n + 1.0) / (d.df + 1.0)) AS score
FROM g JOIN d ON g.node = d.node, n
ORDER BY score DESC, g.node LIMIT {SCORE_NODES_TOP}
"""


SHORTEST_PATH_SQL = f"""
WITH RECURSIVE bfs(node, depth) AS (
  SELECT CAST({START_PART} AS BIGINT), 0
  UNION
  SELECT l2.l_partkey, bfs.depth + 1
  FROM bfs
  JOIN lineitem l1 ON l1.l_partkey = bfs.node
  JOIN lineitem l2 ON l2.l_orderkey = l1.l_orderkey
  WHERE bfs.depth < {SP_MAX_DEPTH}
)
SELECT node, MIN(depth) AS dist FROM bfs GROUP BY node ORDER BY node
"""


GRAPH_SQL = f"""
WITH o1 AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_partkey = {START_PART}),
p1 AS (SELECT DISTINCT l_partkey FROM lineitem
       WHERE l_orderkey IN (SELECT l_orderkey FROM o1)),
o2 AS (SELECT DISTINCT l_orderkey FROM lineitem
       WHERE l_partkey IN (SELECT l_partkey FROM p1)),
p2 AS (SELECT DISTINCT l_partkey FROM lineitem
       WHERE l_orderkey IN (SELECT l_orderkey FROM o2))
SELECT l_partkey AS partkey FROM p2 ORDER BY partkey
"""


PIPELINES: dict[str, Pipeline] = {
    "graph_traversal": Pipeline(graph_traversal, GRAPH_SQL, "iterative frontier expansion (GraphQuery / GatherNodesStream)"),
    "shortest_path": Pipeline(shortest_path_nodes, SHORTEST_PATH_SQL, "BFS distance labelling from a source node (ShortestPathStream)"),
    "score_nodes": Pipeline(score_nodes, SCORE_NODES_SQL, "tf-idf scoring of gathered nodes (ScoreNodesStream)"),
}
