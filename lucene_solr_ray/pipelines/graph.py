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


def _member_scan(sf_dir: str, col_filter: str, keys: np.ndarray, col_out: str) -> np.ndarray:
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
        read(sf_dir, "lineitem", [col_filter, col_out])
        .map_batches(f, batch_format="pandas")
        .to_pandas()
    )
    if col_out not in parts.columns:
        return np.empty(0, dtype=np.int64)
    return np.unique(parts[col_out].to_numpy())


def graph_traversal(sf_dir: str):
    """Parts reachable from START_PART within HOPS co-order hops."""
    parts = np.array([START_PART], dtype=np.int64)
    for _ in range(HOPS):
        orders = _member_scan(sf_dir, "l_partkey", parts, "l_orderkey")
        parts = _member_scan(sf_dir, "l_orderkey", orders, "l_partkey")
    return pd.DataFrame({"partkey": np.sort(parts).astype("int64")})


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
}
