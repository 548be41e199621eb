"""Sketch aggregates + native hash join (SURVEY.md §2.6 / §2.5).

- `hll_distinct`: HyperLogLog approximate distinct counts per group — the
  reference's `hll` JSON-facet aggregate (solr/core/src/java/org/apache/
  solr/search/facet/HLLAgg.java over the vendored org.apache.solr.util.hll).
  Implemented as the canonical mergeable-sketch pattern: one serialized
  sketch per (group, batch) from `map_batches`, merged in a tiny reduce —
  at 100 TB only sketches ever shuffle, never raw values.  Deterministic
  (md5 hashing), accuracy-tested against exact counts in pytest; rows-only
  for the driver gate (approximate by design).
- `hash_join_native`: Ray's built-in hash-partitioned `Dataset.join` —
  the both-sides-large join path (StreamingJoin / XCJFQuery analog).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from .common import Pipeline, cents, read

HLL_P = 12  # 4096 registers → ~1.6% standard error


class HLL:
    __slots__ = ("regs",)

    def __init__(self, regs: np.ndarray | None = None):
        self.regs = regs if regs is not None else np.zeros(1 << HLL_P, dtype=np.uint8)

    @staticmethod
    def _hash64(values) -> np.ndarray:
        """Deterministic 64-bit hashes — vectorized splitmix64 finalizer for
        integer inputs (the common id-column case, zero Python-level hashing);
        md5 over UNIQUE values otherwise (registers are duplicate-invariant,
        so hashing uniques only is exact)."""
        v = np.asarray(values)
        if np.issubdtype(v.dtype, np.integer):
            x = v.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
            x ^= x >> np.uint64(30)
            x *= np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(27)
            x *= np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(31)
            return x
        u = np.unique(v)
        return np.fromiter(
            (int.from_bytes(hashlib.md5(str(s).encode()).digest()[:8], "little") for s in u),
            dtype=np.uint64,
            count=len(u),
        )

    @staticmethod
    def of(values) -> "HLL":
        h = HLL()
        if len(values) == 0:
            return h
        hashes = HLL._hash64(values)
        idx = (hashes >> np.uint64(64 - HLL_P)).astype(np.int64)
        rest = hashes << np.uint64(HLL_P)
        # rank = leading zeros of remaining bits + 1 (capped)
        lz = np.zeros(hashes.size, dtype=np.uint8)
        v = rest.copy()
        zero = v == 0
        lz[zero] = 64 - HLL_P + 1
        nz = ~zero
        if nz.any():
            # count leading zeros via float64 exponent trick is lossy; loop
            # over bits instead (≤64 iterations, fully vectorized)
            r = np.ones(int(nz.sum()), dtype=np.uint8)
            vv = v[nz]
            top = np.uint64(1) << np.uint64(63)
            mask = (vv & top) == 0
            while mask.any():
                r[mask] += 1
                vv[mask] = vv[mask] << np.uint64(1)
                mask = mask & ((vv & top) == 0)
            lz[nz] = r
        np.maximum.at(h.regs, idx, lz)
        return h

    def merge(self, other: "HLL") -> "HLL":
        return HLL(np.maximum(self.regs, other.regs))

    def estimate(self) -> float:
        m = float(self.regs.size)
        alpha = 0.7213 / (1 + 1.079 / m)
        s = np.sum(2.0 ** (-self.regs.astype(np.float64)))
        e = alpha * m * m / s
        if e <= 2.5 * m:
            zeros = int((self.regs == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)  # linear counting for small card
        return float(e)


def hll_distinct(sf_dir: str):
    """Approximate distinct user_id per event_type (mergeable sketches)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in batch.groupby("event_type"):
            rows.append({"event_type": et, "sketch": HLL.of(g["user_id"].to_numpy()).regs.tobytes()})
        return pd.DataFrame(rows)

    parts = (
        read(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    out = []
    for et, g in parts.groupby("event_type"):
        h = HLL()
        for blob in g["sketch"]:
            h = h.merge(HLL(np.frombuffer(blob, dtype=np.uint8).copy()))
        out.append({"event_type": et, "approx_distinct": np.int64(round(h.estimate()))})
    return pd.DataFrame(out).sort_values("event_type").reset_index(drop=True)


# --------------------------------------------------------------------------
# SpaceSaving heavy hitters (Metwally et al. 2005 — the frequency sketch
# next to HLL's cardinality and t-digest's quantiles).  Per-batch summary
# of SS_CAPACITY counters; merged summaries stay a valid SpaceSaving
# state: counts add where keys meet, a key absent from one side absorbs
# that side's evicted-mass bound (its min count) into its error.  The
# guarantee survives merging: true_count ≤ est ≤ true_count + err.

SS_CAPACITY = 256
SS_TOP = 10


def _ss_batch(tokens: np.ndarray) -> pd.DataFrame:
    """Exact counts if distinct ≤ capacity, else evict-min SpaceSaving."""
    uniq, cnt = np.unique(tokens, return_counts=True)
    if uniq.size <= SS_CAPACITY:
        return pd.DataFrame({"token": uniq, "est": cnt.astype(np.int64), "err": 0})
    order = np.argsort(-cnt, kind="stable")
    keep, spill = order[: SS_CAPACITY], order[SS_CAPACITY :]
    # evicting item i bumps the minimum counter: upper-bound the batch
    # summary with min-count error on every kept slot (one-shot batch
    # construction — a conservative, still-mergeable overapproximation)
    err = int(cnt[spill].max()) if spill.size else 0
    return pd.DataFrame(
        {
            "token": uniq[keep],
            "est": (cnt[keep] + err).astype(np.int64),
            "err": np.int64(err),
        }
    )


def heavy_hitters(sf_dir: str):
    """Top-SS_TOP tokens by estimated frequency.  Approximate by design
    (rows-only check); on the fixture vocabulary (≪ capacity) every batch
    summary is exact, so the pytest oracle can assert exact equality AND
    the guarantee bound separately."""
    from .text import TOKEN_RE, _tokens

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens(batch["text"])
        flat = np.asarray([t for ws in toks for t in ws], dtype=object)
        if flat.size == 0:
            return pd.DataFrame({"token": pd.Series([], dtype=object), "est": pd.Series([], dtype="int64"), "err": pd.Series([], dtype="int64")})
        return _ss_batch(flat)

    parts = (
        read(sf_dir, "documents", ["text"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()  # ≤ capacity rows per block
    )
    g = parts.groupby("token", as_index=False).agg(est=("est", "sum"), err=("err", "sum"))
    if len(g) > SS_CAPACITY:
        # merge eviction: keys missing from the merged summary contribute
        # at most the dropped slots' min estimate
        g = g.sort_values(["est", "token"], ascending=[False, True], kind="mergesort")
        dropped_min = int(g["est"].iloc[SS_CAPACITY:].max())
        g = g.head(SS_CAPACITY)
        g["est"] = g["est"] + dropped_min
        g["err"] = g["err"] + dropped_min
    g = g.sort_values(["est", "token"], ascending=[False, True], kind="mergesort")
    return g.head(SS_TOP).reset_index(drop=True)


def hash_join_native(sf_dir: str):
    """Both-sides-as-Datasets hash join via Ray's native Dataset.join."""
    import ray

    orders = read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    # join partitions sized from the cluster: each hash partition is a
    # stateful aggregator actor with real spin-up cost, so a small box
    # wants few (num_partitions=4 beat 8 by 0.8 s here) while a big
    # cluster gets one per ~8 cores — the knob scales with the cluster,
    # not a constant.
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=max(2, cpus // 8),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "c_mktsegment": batch["c_mktsegment"],
                "revenue_cents": cents(batch["o_totalprice"].to_numpy()),
                "n_orders": 1,
            }
        )
        return g.groupby("c_mktsegment", as_index=False).sum()

    from .common import merge_partials

    out = merge_partials(
        joined.map_batches(partial, batch_format="pandas"),
        ["c_mktsegment"],
        {"revenue_cents": "sum", "n_orders": "sum"},
    )
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


HASH_JOIN_SQL = """
SELECT c_mktsegment,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


PIPELINES: dict[str, Pipeline] = {
    "hll_distinct": Pipeline(hll_distinct, None, "HyperLogLog approx distinct (HLLAgg); accuracy-tested in pytest"),
    "hash_join_native": Pipeline(hash_join_native, HASH_JOIN_SQL, "both-sides-large hash join (Dataset.join)"),
    "heavy_hitters": Pipeline(
        heavy_hitters,
        None,
        "SpaceSaving frequency sketch top-k (mergeable summaries; guarantee-tested in pytest)",
    ),
}
