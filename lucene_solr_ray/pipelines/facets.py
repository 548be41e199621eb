"""JSON Facet API — nested bucket tree with sub-aggregates (SURVEY.md §2.6).

Reference: solr/core/src/java/org/apache/solr/search/facet/FacetModule.java,
FacetRequest.java / FacetField.java / FacetRange.java — the JSON Facet API's
recursive `facet` blocks: terms/range/query buckets, per-bucket metrics
(count/sum/avg/min/max), per-level sort and limit.

Ray-Data-first execution (single sweep, the FacetModule two-phase shape):
1. `map_batches` computes every level's bucket column and PRE-AGGREGATES
   each batch by the full bucket path (the combiner — only (path, partial
   metrics) rows ever shuffle, never raw rows);
2. one `groupby(path).aggregate(...)` merges partials;
3. the driver assembles the tree from the merged lattice (bounded by the
   product of bucket cardinalities — the facet result domain, NOT the data
   size; Solr shards do the same merge-and-refine on a coordinator),
   applying each level's sort ("count desc" | "<metric> desc/asc", bucket
   value as deterministic tie-break) and limit, top-down.

Money metrics go through integer cents (`common.cents`) and `avg` divides
exact integer sums — float-parity with the DuckDB twins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .common import Pipeline, cents, read

_BUCKET_TYPES = ("terms", "range", "query")

# sentinel bucket values for the Solr JSON-facet specials: `allBuckets`
# (one bucket aggregating every non-missing row, exempt from limit) and
# `missing` (rows whose bucket value is NULL) — FacetField.java's
# allBuckets/missing handling
ALL_BUCKET = "__all__"
MISSING_BUCKET = "__missing__"


def _digest_of(s: pd.Series) -> bytes:
    """Pandas agg kernel: raw float values → serialized t-digest."""
    from ..state.tdigest import TDigest

    return TDigest.of(s.to_numpy(np.float64)).to_bytes()


def _digest_merge(s: pd.Series) -> bytes:
    """Pandas agg kernel: serialized t-digests → merged serialized digest.
    t-digest merges are ORDER-SENSITIVE and Ray's streaming executor does
    not preserve block order — merge in sorted-blob order so the result is
    a pure function of the partial multiset, not of arrival order."""
    from ..state.tdigest import TDigest

    it = iter(sorted(s))
    acc = TDigest.from_bytes(next(it))
    for b in it:
        acc = acc.merge(TDigest.from_bytes(b))
    return acc.to_bytes()


def _uniq_of(s: pd.Series) -> bytes:
    import pickle

    return pickle.dumps(sorted(set(s)))


def _uniq_merge(s: pd.Series) -> bytes:
    import pickle

    u: set = set()
    for b in s:
        u.update(pickle.loads(b))
    return pickle.dumps(sorted(u))


def _hll_of(s: pd.Series) -> bytes:
    from .sketches import HLL

    return HLL.of(s.to_numpy()).regs.tobytes()


def _hll_merge(s: pd.Series) -> bytes:
    from .sketches import HLL

    it = iter(s)
    acc = np.frombuffer(next(it), dtype=np.uint8).copy()
    for b in it:
        np.maximum(acc, np.frombuffer(b, dtype=np.uint8), out=acc)
    return HLL(acc).regs.tobytes()


def _vcount_of(s: pd.Series) -> bytes:
    import pickle

    vals, counts = np.unique(s.to_numpy(), return_counts=True)
    return pickle.dumps((vals, counts.astype(np.int64)))


def _vcount_merge(s: pd.Series) -> bytes:
    import pickle
    from collections import Counter

    acc: Counter = Counter()
    for b in s:
        vals, counts = pickle.loads(b)
        acc.update(dict(zip(vals.tolist(), counts.tolist())))
    items = sorted(acc.items())
    return pickle.dumps(
        (
            np.array([v for v, _ in items], dtype=np.float64),
            np.array([c for _, c in items], dtype=np.int64),
        )
    )


# sketch-backed facet metrics: (build kernel over raw values, merge kernel
# over serialized partials).  UniqueAgg is EXACT (sorted value-set union —
# use only on bounded-cardinality fields; HLLAgg is the unbounded path),
# PercentileAgg / HLLAgg are mergeable approximate sketches;
# percentile_exact is the EXACT order statistic via per-bucket value-count
# partials (bounded-distinct-value fields only — the t-digest `percentile`
# is the unbounded path), bit-identical to DuckDB quantile_disc.
SKETCH_METRICS = {
    "percentile": (_digest_of, _digest_merge),
    "percentile_exact": (_vcount_of, _vcount_merge),
    "unique": (_uniq_of, _uniq_merge),
    "hll": (_hll_of, _hll_merge),
}


def _levels(spec: dict) -> list[dict]:
    """Flatten the nested spec into its bucket-level chain (one nested
    bucket facet per level; the rest of each `facet` block are metrics)."""
    out = []
    s = spec
    while s is not None:
        out.append(s)
        nxt = None
        for sub in (s.get("facet") or {}).values():
            if sub.get("type") in _BUCKET_TYPES:
                nxt = sub
        s = nxt
    return out


def _metrics(spec: dict) -> dict[str, dict]:
    return {
        name: m
        for name, m in (spec.get("facet") or {}).items()
        if m.get("type") not in _BUCKET_TYPES
    }


def compute_json_facet(sf_dir: str, table: str, spec: dict) -> pd.DataFrame:
    """Evaluate a nested JSON facet over `table` → flat DataFrame with one
    row per LEAF bucket (parent bucket keys + metrics repeated per row)."""
    levels = _levels(spec)
    bucket_cols = [f"_b{i}" for i in range(len(levels))]
    # domain change (FacetRequest.Domain / multi-select `domain:{filter:..}`):
    # a predicate re-scoping the rows the WHOLE facet tree sees, applied
    # before bucketing in the same combiner pass
    dom = spec.get("domain")
    # columns to read: bucket fields + metric fields
    need: list[str] = []
    if dom is not None:
        need.append(dom["q_field"])
    for lv in levels:
        if lv["type"] in ("terms", "range"):
            need.append(lv["field"])
        elif lv["type"] == "query":
            need.append(lv["q_field"])
        for m in _metrics(lv).values():
            need.append(m["field"])
    need = list(dict.fromkeys(need))

    # partial metric columns: one count per level + per-metric partials
    def mcol(i: int, name: str) -> str:
        return f"_m{i}_{name}"

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if dom is not None:
            batch = batch[np.asarray(dom["filter"](batch), dtype=bool)]
        df = pd.DataFrame(index=batch.index)
        keep = np.ones(len(batch), dtype=bool)
        for i, lv in enumerate(levels):
            if lv["type"] == "terms":
                v = lv["derive"](batch) if "derive" in lv else batch[lv["field"]]
                if lv.get("missing"):
                    # NULL bucket values become the missing bucket; without
                    # the flag pandas' groupby drops them (Solr default)
                    v = v.fillna(MISSING_BUCKET)
                df[bucket_cols[i]] = v
            elif lv["type"] == "range":
                v = batch[lv["field"]].to_numpy()
                start, end, gap = lv["start"], lv["end"], lv["gap"]
                b = start + gap * np.floor((v - start) / gap)
                keep &= (v >= start) & (v < end)
                df[bucket_cols[i]] = b
            else:  # query facet: boolean bucket (assembled as its own level)
                df[bucket_cols[i]] = lv["predicate"](batch)
        df = df[keep]
        sub = batch[keep]
        agg_cols = {}
        for i, lv in enumerate(levels):
            for name, m in _metrics(lv).items():
                c = mcol(i, name)
                if m["type"] == "relatedness":
                    # semantic-knn relatedness (RelatednessAgg.java /
                    # the Semantic Knowledge Graph z-score): the partial
                    # is just the per-bucket FOREGROUND count
                    agg_cols[c] = ("sum", np.asarray(m["fg"](sub), dtype=np.int64))
                    continue
                vs = m["derive"](sub) if "derive" in m else sub[m["field"]]
                if m["type"] == "countvals":  # CountValsAgg: non-null values
                    agg_cols[c] = ("sum", vs.notna().to_numpy().astype(np.int64))
                    continue
                if m["type"] == "missing":  # MissingAgg: null values
                    agg_cols[c] = ("sum", vs.isna().to_numpy().astype(np.int64))
                    continue
                if m["type"] == "sumsq":
                    # SumsqAgg, exact: integer cents squared, summed as
                    # PYTHON ints (object dtype — no int64 overflow); the
                    # finalize exports float64 like the HUGEINT SQL twin
                    cc = cents(vs.to_numpy())
                    agg_cols[c] = ("sum", (cc.astype(object) * cc.astype(object)))
                    continue
                if m["type"] in ("variance", "stddev"):
                    # StddevAgg/VarianceAgg IN the facet tree: exact
                    # integer moment partials — s2 as Python ints (no
                    # overflow), s1 as a companion column; var derives at
                    # finalize with the variance_moments formula
                    cc = cents(vs.to_numpy())
                    agg_cols[c] = ("sum", (cc.astype(object) * cc.astype(object)))
                    agg_cols[c + "__s1"] = ("sum", cc.astype(object))  # Python ints: no int64 wrap
                    continue
                v = sub[m["field"]].to_numpy()
                if m.get("money"):
                    v = cents(v)
                if m["type"] in ("sum", "avg"):
                    agg_cols[c] = ("sum", v)
                elif m["type"] == "min":
                    agg_cols[c] = ("min", v)
                elif m["type"] == "max":
                    agg_cols[c] = ("max", v)
        # sketch metrics (Percentile/Unique/HLL aggs): the partial is a
        # SERIALIZED per-bucket sketch (t-digest / value set / HLL
        # registers) instead of the bucket's raw values
        pct_cols: dict[str, tuple] = {}
        for i, lv in enumerate(levels):
            for name, m in _metrics(lv).items():
                if m["type"] in SKETCH_METRICS:
                    pct_cols[mcol(i, name)] = (SKETCH_METRICS[m["type"]][0], sub[m["field"]])
        df["_n"] = 1
        for c, (op, v) in agg_cols.items():
            df[c] = v
        for c, (_, v) in pct_cols.items():
            df[c] = v.to_numpy()
        # allBuckets: a synthetic bucket aggregating every NON-missing row,
        # exempt from limit — duplicated into the combiner so sub-levels
        # and metrics compute for it like any bucket (FacetField.java)
        for i, lv in enumerate(levels):
            if lv.get("all_buckets"):
                dup = df[df[bucket_cols[i]] != MISSING_BUCKET].copy()
                dup[bucket_cols[i]] = ALL_BUCKET
                df = pd.concat([df, dup], ignore_index=True)
        g = df.groupby(bucket_cols, as_index=False, sort=False)
        out = g.agg(
            {
                "_n": "sum",
                **{c: op for c, (op, _) in agg_cols.items()},
                **{c: k for c, (k, _) in pct_cols.items()},
            }
        )
        return out

    # coordinator merge (FacetModule's per-shard response merge): each
    # batch already reduced to ≤ |facet lattice| partial rows, so the
    # driver merges lattice-bounded partials — measured ~4 s cheaper than
    # a Ray all-to-all Aggregate at this lattice size, and the driver load
    # is the facet DOMAIN × blocks, never the row count
    ops = {"_n": "sum"}
    for i, lv in enumerate(levels):
        for name, m in _metrics(lv).items():
            ops[mcol(i, name)] = SKETCH_METRICS[m["type"]][1] if m["type"] in SKETCH_METRICS else {"sum": "sum", "avg": "sum", "min": "min", "max": "max", "relatedness": "sum", "countvals": "sum", "missing": "sum", "sumsq": "sum", "variance": "sum", "stddev": "sum"}[m["type"]]
            if m["type"] in ("variance", "stddev"):
                ops[mcol(i, name) + "__s1"] = "sum"
    # batch_size=None → one batch per BLOCK: batches never straddle block
    # boundaries, so the partial multiset (incl. per-batch t-digests) is
    # deterministic even though the executor delivers blocks out of order
    parts_df = (
        read(sf_dir, table, need)
        .map_batches(partial, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    lattice = parts_df.groupby(bucket_cols, as_index=False).agg(ops)

    # -- driver-side tree assembly over the (small) lattice ----------------
    def level_table(li: int) -> pd.DataFrame:
        keys = bucket_cols[: li + 1]
        mets = {"_n": "sum"}
        for name, m in _metrics(levels[li]).items():
            c = mcol(li, name)
            mets[c] = SKETCH_METRICS[m["type"]][1] if m["type"] in SKETCH_METRICS else {"sum": "sum", "avg": "sum", "min": "min", "max": "max", "relatedness": "sum", "countvals": "sum", "missing": "sum", "sumsq": "sum", "variance": "sum", "stddev": "sum"}[m["type"]]
            if m["type"] in ("variance", "stddev"):
                mets[c + "__s1"] = "sum"
        t = lattice.groupby(keys, as_index=False).agg(mets)
        return t.rename(columns={"_n": f"_n{li}"})

    def order_limit(df: pd.DataFrame, li: int) -> pd.DataFrame:
        lv = levels[li]
        # allBuckets/missing sentinels sit OUTSIDE sort+limit (Solr returns
        # them as separate response sections); append them after the ranked
        # buckets in a fixed order
        sentinels = None
        if lv.get("all_buckets") or lv.get("missing"):
            is_sent = df[bucket_cols[li]].isin([ALL_BUCKET, MISSING_BUCKET])
            if is_sent.any():
                sentinels = df[is_sent].sort_values(bucket_cols[li])
                df = df[~is_sent]
        # terms-facet `prefix` (FacetFieldProcessor prefix): restrict the
        # bucket domain BEFORE ranking/limit/numBuckets — counts are
        # unchanged, only non-matching buckets drop out
        pref = lv.get("prefix")
        if pref:
            df = df[df[bucket_cols[li]].astype(str).str.startswith(pref)]
        sort = lv.get("sort", "count desc")
        key, direction = (sort.split() + ["desc"])[:2]
        asc = direction == "asc"
        if key == "count":
            col = f"_n{li}"
        elif key == "index":
            col = bucket_cols[li]
        else:
            m = _metrics(lv).get(key)
            if m is not None and m["type"] == "avg":
                # avg metrics sort by the RATIO, not the sum partial
                df = df.assign(_sortv=df[mcol(li, key)] / df[f"_n{li}"].astype("float64"))
                col = "_sortv"
            elif m is not None and m["type"] in ("variance", "stddev"):
                # derived metrics sort by their FINAL value, not the s2
                # moment partial (same formula the finalize applies)
                from .common import hugeint_to_double as _h2d

                sv = [
                    (_h2d(int(a2)) - _h2d(int(a1) * int(a1)) / int(k)) / int(k)
                    for a2, a1, k in zip(
                        df[mcol(li, key)], df[mcol(li, key) + "__s1"], df[f"_n{li}"]
                    )
                ]
                df = df.assign(_sortv=np.asarray(sv, dtype=np.float64))
                col = "_sortv"
            else:
                col = mcol(li, key)
        df = df.sort_values([col, bucket_cols[li]], ascending=[asc, True], kind="mergesort")
        if col == "_sortv":
            df = df.drop(columns=["_sortv"])
        # numBuckets (FacetFieldProcessor.calculateNumBuckets): the count
        # of DISTINCT buckets in this domain BEFORE the limit, emitted as a
        # constant column named after the level key — for nested levels
        # order_limit runs per parent bucket, so the count is per-parent,
        # matching Solr's per-subfacet numBuckets field.
        if lv.get("num_buckets"):
            df = df.assign(**{f"num_{lv.get('key', f'b{li}')}": np.int64(len(df))})
        # Solr JSON-facet limit semantics: absent → unlimited, -1 → unlimited,
        # 0 → zero buckets (limit:0 must NOT mean "all").
        lim = lv.get("limit")
        df = df if lim is None or lim < 0 else df.head(lim)
        if sentinels is not None:
            df = pd.concat([df, sentinels])
        return df

    frames: list[pd.DataFrame] = []
    selected: pd.DataFrame | None = None  # surviving path prefixes
    for li in range(len(levels)):
        tbl = level_table(li)
        if levels[li]["type"] == "query":  # query facet: the matching bucket only
            tbl = tbl[tbl[bucket_cols[li]]]
        if selected is not None:
            tbl = tbl.merge(selected, on=bucket_cols[:li])
            parts = [order_limit(g, li) for _, g in tbl.groupby(bucket_cols[:li], sort=False)]
            tbl = pd.concat(parts) if parts else tbl.head(0)
        else:
            tbl = order_limit(tbl, li)
        frames.append(tbl)
        selected = tbl[bucket_cols[: li + 1]].drop_duplicates()

    out = frames[0]
    for li in range(1, len(levels)):
        out = out.merge(frames[li], on=bucket_cols[:li], how="inner")

    # relatedness needs the GLOBAL fg/bg sizes: sum the lattice with the
    # allBuckets/missing sentinels excluded (the facet domain, background
    # set of RelatednessAgg; Solr's default background is the collection)
    has_rel = any(m["type"] == "relatedness" for lv in levels for m in _metrics(lv).values())
    if has_rel:
        nosent = lattice
        for c in bucket_cols:
            nosent = nosent[~nosent[c].isin([ALL_BUCKET, MISSING_BUCKET])]
        bg_size = int(nosent["_n"].sum())

    # avg metrics + user-facing names, applied once at the end
    ren: dict[str, str] = {}
    for li, lv in enumerate(levels):
        ren[bucket_cols[li]] = lv.get("key", f"bucket{li}")
        ren[f"_n{li}"] = lv.get("count_key", f"n{li}")
        for name, m in _metrics(lv).items():
            if m["type"] == "avg":
                out[name] = out[mcol(li, name)] / out[f"_n{li}"].astype("float64")
                out = out.drop(columns=[mcol(li, name)])
            elif m["type"] == "relatedness":
                # Semantic Knowledge Graph z-score (Grainger et al. 2016;
                # the RelatednessAgg.java stat): a one-sample proportion
                # z-test of the bucket's foreground rate against its
                # background rate.  Expression mirrors the SQL twin
                # op-for-op (float-parity; np.sqrt is IEEE-exact).
                fg_size = int(nosent[mcol(li, name)].sum())
                fg_pop = out[mcol(li, name)].to_numpy(np.float64) / fg_size
                bg_pop = out[f"_n{li}"].to_numpy(np.int64) / bg_size
                x = bg_pop * (1.0 - bg_pop) / float(fg_size)
                with np.errstate(divide="ignore", invalid="ignore"):
                    z = (fg_pop - bg_pop) / np.sqrt(x)
                out[name] = np.where(x > 0, z, 0.0)
                ren[mcol(li, name)] = m.get("fg_key", f"{name}_fg_count")
                out[mcol(li, name)] = out[mcol(li, name)].astype("int64")
            elif m["type"] == "sumsq":
                # exact Python-int sum exported as float64 — the same
                # conversion DuckDB applies casting its HUGEINT to DOUBLE
                out[name] = out[mcol(li, name)].astype("float64")
                out = out.drop(columns=[mcol(li, name)])
            elif m["type"] in ("variance", "stddev"):
                # the variance_moments formula per bucket, Python-int
                # moments → the SAME float expression as the SQL twin
                import math as _math

                from .common import hugeint_to_double as _h2d

                s2c, s1c = mcol(li, name), mcol(li, name) + "__s1"
                vals = []
                for a2, a1, k in zip(out[s2c], out[s1c], out[f"_n{li}"]):
                    # Python-int moments; s1² through the HUGEINT→DOUBLE
                    # cast model (the twin squares HUGEINTs — s1² wraps
                    # int64 at large scale, and DuckDB's cast is not
                    # correctly rounded past 2⁶³)
                    a1, a2, k = int(a1), int(a2), int(k)
                    v = (_h2d(a2) - _h2d(a1 * a1) / k) / k
                    vals.append(_math.sqrt(v) if m["type"] == "stddev" else v)
                out[name] = np.asarray(vals, dtype=np.float64)
                out = out.drop(columns=[s2c, s1c])
            elif m["type"] in ("countvals", "missing"):
                out[name] = out[mcol(li, name)].astype("int64")
                out = out.drop(columns=[mcol(li, name)])
            elif m["type"] == "percentile":
                from ..state.tdigest import TDigest

                out[name] = [
                    TDigest.from_bytes(b).quantile(m.get("q", 0.5)) for b in out[mcol(li, name)]
                ]
                out = out.drop(columns=[mcol(li, name)])
            elif m["type"] == "percentile_exact":
                import pickle

                q = m.get("q", 0.5)
                vals_out = []
                for b in out[mcol(li, name)]:
                    vs, counts = pickle.loads(b)
                    cum = np.cumsum(counts)
                    rank = max(int(np.ceil(q * int(cum[-1]))), 1)  # quantile_disc
                    vals_out.append(float(vs[int(np.searchsorted(cum, rank))]))
                out[name] = vals_out
                out = out.drop(columns=[mcol(li, name)])
            elif m["type"] == "unique":
                import pickle

                out[name] = np.asarray(
                    [len(pickle.loads(b)) for b in out[mcol(li, name)]], dtype=np.int64
                )
                out = out.drop(columns=[mcol(li, name)])
            elif m["type"] == "hll":
                from .sketches import HLL

                out[name] = np.asarray(
                    [
                        round(HLL(np.frombuffer(b, dtype=np.uint8).copy()).estimate())
                        for b in out[mcol(li, name)]
                    ],
                    dtype=np.int64,
                )
                out = out.drop(columns=[mcol(li, name)])
            else:
                ren[mcol(li, name)] = name
    out = out.rename(columns=ren)
    for li, lv in enumerate(levels):
        out[lv.get("count_key", f"n{li}")] = out[lv.get("count_key", f"n{li}")].astype("int64")
    return out.reset_index(drop=True)


# --------------------------------------------------------------------------
# Gated pipelines: a terms×terms tree and a range×query tree.


def json_facet_nested(sf_dir: str):
    """Top-3 market segments by count, each with its top-2 nations by
    account-balance sum — terms bucket × terms sub-bucket × sum metrics
    with per-level sort and limit (the FacetModule nested-bucket shape)."""
    spec = {
        "type": "terms",
        "field": "c_mktsegment",
        "limit": 3,
        "sort": "count desc",
        "key": "c_mktsegment",
        "count_key": "seg_n",
        "facet": {
            "seg_bal_cents": {"type": "sum", "field": "c_acctbal", "money": True},
            "nations": {
                "type": "terms",
                "field": "c_nationkey",
                "limit": 2,
                "sort": "nat_bal_cents desc",
                "key": "c_nationkey",
                "count_key": "nat_n",
                "facet": {"nat_bal_cents": {"type": "sum", "field": "c_acctbal", "money": True}},
            },
        },
    }
    out = compute_json_facet(sf_dir, "customer", spec)
    for c in ("seg_bal_cents", "nat_bal_cents"):
        out[c] = out[c].astype("int64")
    cols = ["c_mktsegment", "seg_n", "seg_bal_cents", "c_nationkey", "nat_n", "nat_bal_cents"]
    return out[cols].sort_values(["c_mktsegment", "c_nationkey"]).reset_index(drop=True)


JSON_FACET_NESTED_SQL = """
WITH base AS (
  SELECT c_mktsegment, c_nationkey, CAST(ROUND(c_acctbal*100) AS BIGINT) AS cents FROM customer
),
seg AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS seg_n, CAST(SUM(cents) AS BIGINT) AS seg_bal_cents
  FROM base GROUP BY c_mktsegment
),
segk AS (SELECT * FROM seg QUALIFY row_number() OVER (ORDER BY seg_n DESC, c_mktsegment) <= 3),
nat AS (
  SELECT c_mktsegment, c_nationkey, CAST(COUNT(*) AS BIGINT) AS nat_n, CAST(SUM(cents) AS BIGINT) AS nat_bal_cents
  FROM base GROUP BY c_mktsegment, c_nationkey
),
natk AS (
  SELECT nat.* FROM nat JOIN segk USING (c_mktsegment)
  QUALIFY row_number() OVER (PARTITION BY c_mktsegment ORDER BY nat_bal_cents DESC, c_nationkey) <= 2
)
SELECT segk.c_mktsegment, seg_n, seg_bal_cents, c_nationkey, nat_n, nat_bal_cents
FROM segk JOIN natk USING (c_mktsegment)
ORDER BY c_mktsegment, c_nationkey
"""


def json_facet_range(sf_dir: str):
    """Range buckets over o_totalprice × query sub-facet (urgent orders)
    with an exact-cents avg metric — range + query facet types and the
    avg sub-aggregate.  Buckets whose query sub-facet is empty are omitted
    from the flattened view (inner tree join), matching the SQL twin."""
    spec = {
        "type": "range",
        "field": "o_totalprice",
        "start": 0.0,
        "end": 600000.0,
        "gap": 100000.0,
        "sort": "index asc",
        "key": "price_bucket",
        "count_key": "n_bucket",
        "facet": {
            "avg_price_cents": {"type": "avg", "field": "o_totalprice", "money": True},
            "urgent": {
                "type": "query",
                "q_field": "o_orderpriority",
                "predicate": lambda b: (b["o_orderpriority"] == "1-URGENT").to_numpy(),
                "key": "is_urgent",
                "count_key": "n_urgent",
            },
        },
    }
    out = compute_json_facet(sf_dir, "orders", spec)
    cols = ["price_bucket", "n_bucket", "avg_price_cents", "n_urgent"]
    return out[cols].sort_values("price_bucket").reset_index(drop=True)


JSON_FACET_RANGE_SQL = """
WITH base AS (
  SELECT 100000.0 * FLOOR(o_totalprice / 100000.0) AS price_bucket,
         CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents,
         o_orderpriority = '1-URGENT' AS urgent
  FROM orders WHERE o_totalprice >= 0 AND o_totalprice < 600000
),
b AS (
  SELECT price_bucket, CAST(COUNT(*) AS BIGINT) AS n_bucket,
         SUM(cents) / CAST(COUNT(*) AS DOUBLE) AS avg_price_cents,
         CAST(SUM(CASE WHEN urgent THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
  FROM base GROUP BY price_bucket
)
SELECT price_bucket, n_bucket, avg_price_cents, n_urgent FROM b
WHERE n_urgent > 0 ORDER BY price_bucket
"""


def json_facet_numbuckets(sf_dir: str):
    """`numBuckets:true` at two nesting levels: the distinct-bucket count
    of each facet domain BEFORE the limit — global at the root, per-parent
    for the nested terms facet (FacetFieldProcessor.calculateNumBuckets)."""
    spec = {
        "type": "terms",
        "field": "o_orderpriority",
        "limit": 2,
        "sort": "count desc",
        "num_buckets": True,
        "key": "prio",
        "count_key": "n",
        "facet": {
            "sub": {
                "type": "terms",
                "field": "o_orderstatus",
                "limit": 1,
                "sort": "count desc",
                "num_buckets": True,
                "key": "status",
                "count_key": "n_status",
            }
        },
    }
    out = compute_json_facet(sf_dir, "orders", spec)
    cols = ["prio", "n", "num_prio", "status", "n_status", "num_status"]
    out = out[cols].copy()
    out["num_prio"] = out["num_prio"].astype("int64")
    out["num_status"] = out["num_status"].astype("int64")
    return out.sort_values("prio").reset_index(drop=True)


JSON_FACET_NUMBUCKETS_SQL = """
WITH l0 AS (
  SELECT o_orderpriority AS prio, CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1
),
sel0 AS (SELECT * FROM l0 QUALIFY row_number() OVER (ORDER BY n DESC, prio) <= 2),
nb0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS num_prio FROM l0),
l1 AS (
  SELECT o_orderpriority AS prio, o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS n_status
  FROM orders GROUP BY 1, 2
),
sel1 AS (
  SELECT * FROM l1
  QUALIFY row_number() OVER (PARTITION BY prio ORDER BY n_status DESC, status) <= 1
),
nb1 AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS num_status FROM l1 GROUP BY prio)
SELECT s0.prio, s0.n, num_prio, s1.status, s1.n_status, num_status
FROM sel0 s0 CROSS JOIN nb0 JOIN sel1 s1 USING (prio) JOIN nb1 USING (prio)
ORDER BY prio
"""


def json_facet_stddev(sf_dir: str):
    """stddev/variance aggs INSIDE the facet tree (StddevAgg.java /
    VarianceAgg.java): per-bucket exact integer moments (s1 companion
    column + Python-int s2 partials), final value via the same float
    expression as the `variance_moments` twin — population variance over
    discount basis points per return flag."""
    spec = {
        "type": "terms",
        "field": "l_returnflag",
        "sort": "index",
        "key": "flag",
        "count_key": "n",
        "facet": {
            "var_bp": {
                "type": "variance",
                "field": "l_discount",
                "derive": lambda b: b["l_discount"] * 100.0,  # basis points
            },
            "std_bp": {
                "type": "stddev",
                "field": "l_discount",
                "derive": lambda b: b["l_discount"] * 100.0,
            },
        },
    }
    out = compute_json_facet(sf_dir, "lineitem", spec)
    return out[["flag", "n", "var_bp", "std_bp"]].sort_values("flag").reset_index(drop=True)


JSON_FACET_STDDEV_SQL = """
WITH m AS (
  SELECT l_returnflag AS flag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c*c) AS BIGINT) AS s2
  FROM (SELECT l_returnflag, CAST(ROUND(l_discount*100*100) AS BIGINT) AS c FROM lineitem)
  GROUP BY 1
)
SELECT flag, n,
       (s2 - (CAST(s1 AS HUGEINT) * s1) / n) / n AS var_bp,
       sqrt((s2 - (CAST(s1 AS HUGEINT) * s1) / n) / n) AS std_bp
FROM m ORDER BY flag
"""


def json_facet_prefix(sf_dir: str):
    """Terms facet with `prefix` + numBuckets: the bucket domain restricts
    to prefix matches before ranking/limit, and numBuckets counts the
    restricted domain (FacetFieldProcessor prefix semantics)."""
    spec = {
        "type": "terms",
        "field": "o_orderpriority",
        "prefix": "3",
        "limit": 10,
        "sort": "index",
        "num_buckets": True,
        "key": "prio",
        "count_key": "n",
    }
    out = compute_json_facet(sf_dir, "orders", spec)
    out = out[["prio", "n", "num_prio"]].copy()
    out["num_prio"] = out["num_prio"].astype("int64")
    return out.sort_values("prio").reset_index(drop=True)


JSON_FACET_PREFIX_SQL = """
WITH l AS (
  SELECT o_orderpriority AS prio, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
),
f AS (SELECT * FROM l WHERE prio LIKE '3%'),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS num_prio FROM f)
SELECT prio, n, num_prio FROM f CROSS JOIN nb ORDER BY prio
"""


def json_facet_allbuckets(sf_dir: str):
    """Terms facet with `allBuckets` + `missing` + a QUERY sub-facet nested
    under it (FacetField.java's allBuckets/missing sections): order status
    with 'P' nulled out (the missing bucket), limit 1 on the ranked
    buckets, the __all__/__missing__ sentinels outside the limit, urgent
    counts as the nested query facet, exact-cents sum metric."""
    spec = {
        "type": "terms",
        "field": "o_orderstatus",
        "derive": lambda b: b["o_orderstatus"].where(b["o_orderstatus"] != "P"),
        "limit": 1,
        "sort": "count desc",
        "missing": True,
        "all_buckets": True,
        "key": "status",
        "count_key": "n_status",
        "facet": {
            "cents": {"type": "sum", "field": "o_totalprice", "money": True},
            "urgent": {
                "type": "query",
                "q_field": "o_orderpriority",
                "predicate": lambda b: (b["o_orderpriority"] == "1-URGENT").to_numpy(),
                "key": "is_urgent",
                "count_key": "n_urgent",
            },
        },
    }
    out = compute_json_facet(sf_dir, "orders", spec)
    out["cents"] = out["cents"].astype("int64")
    cols = ["status", "n_status", "cents", "n_urgent"]
    return out[cols].sort_values("status").reset_index(drop=True)


JSON_FACET_ALLBUCKETS_SQL = """
WITH base AS (
  SELECT NULLIF(o_orderstatus, 'P') AS st,
         CAST(ROUND(o_totalprice*100) AS BIGINT) AS c,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS urg
  FROM orders
),
g AS (  -- ranked buckets + the GROUPING-SETS () row = allBuckets (non-missing)
  SELECT CASE WHEN GROUPING(st) = 1 THEN '__all__' ELSE st END AS status,
         CAST(COUNT(*) AS BIGINT) AS n_status,
         CAST(SUM(c) AS BIGINT) AS cents,
         CAST(SUM(urg) AS BIGINT) AS n_urgent
  FROM base WHERE st IS NOT NULL
  GROUP BY GROUPING SETS ((st), ())
),
keep AS (
  SELECT * FROM g WHERE status = '__all__'
  UNION ALL
  SELECT * FROM (SELECT * FROM g WHERE status != '__all__')
  QUALIFY row_number() OVER (ORDER BY n_status DESC, status) <= 1
),
miss AS (
  SELECT '__missing__' AS status, CAST(COUNT(*) AS BIGINT) AS n_status,
         CAST(SUM(c) AS BIGINT) AS cents, CAST(SUM(urg) AS BIGINT) AS n_urgent
  FROM base WHERE st IS NULL HAVING COUNT(*) > 0
)
SELECT * FROM keep UNION ALL SELECT * FROM miss
ORDER BY status
"""


# --------------------------------------------------------------------------
# Two-phase distributed facet refinement (FacetComponent, SURVEY.md §2.6):
# phase 1 collects TRUNCATED per-batch facet partials (top-(limit·K)
# overrequest — what each Solr shard returns), merges them, and takes the
# candidate union; phase 2 re-scans with the candidates broadcast and
# refines EXACT counts for them (the coordinator's refinement round), then
# cuts the final top-limit.  Exactness rests on the overrequest assumption:
# every true top-limit bucket appears in SOME batch's truncated list
# (tests/test_facets.py proves refinement changes the unrefined answer on a
# skewed fixture).

REFINE_LIMIT = 3
REFINE_OVERREQUEST = 2  # per-batch lists carry limit × K buckets


def _facet_refined_counts(ds_factory, field: str, limit: int, k: int):
    import ray

    trunc = limit * k

    def phase1(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch[[field]].copy()
        g["n"] = 1
        g = g.groupby(field, as_index=False).sum()
        return g.sort_values(["n", field], ascending=[False, True]).head(trunc)

    parts = ds_factory().map_batches(phase1, batch_format="pandas").to_pandas()
    merged = parts.groupby(field, as_index=False)["n"].sum()
    unrefined = merged.sort_values(["n", field], ascending=[False, True]).head(limit)
    cand = np.sort(parts[field].unique().astype(object))
    cand_ref = ray.put(set(cand.tolist()))

    def phase2(batch: pd.DataFrame) -> pd.DataFrame:
        cs = ray.get(cand_ref)
        sub = batch[batch[field].isin(cs)]
        g = sub[[field]].copy()
        g["n"] = 1
        return g.groupby(field, as_index=False).sum()

    refined = (
        ds_factory()
        .map_batches(phase2, batch_format="pandas")
        .to_pandas()
        .groupby(field, as_index=False)["n"]
        .sum()
    )
    final = refined.sort_values(["n", field], ascending=[False, True]).head(limit)
    return final.reset_index(drop=True), unrefined.reset_index(drop=True)


def facet_refined(sf_dir: str):
    from .common import read

    final, _ = _facet_refined_counts(
        lambda: read(sf_dir, "orders", ["o_orderpriority"]),
        "o_orderpriority",
        REFINE_LIMIT,
        REFINE_OVERREQUEST,
    )
    final["n"] = final["n"].astype("int64")
    return final


FACET_REFINED_SQL = f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderpriority
QUALIFY row_number() OVER (ORDER BY n DESC, o_orderpriority) <= {REFINE_LIMIT}
ORDER BY n DESC, o_orderpriority
"""


# --------------------------------------------------------------------------
# percentile() agg inside the facet tree (PercentileAgg.java, t-digest
# backed): per-bucket mergeable sketches — approximate by design, so no
# SQL twin (rows-only in the gate); the pytest oracle checks accuracy vs
# exact quantiles and determinism.


def json_facet_percentile(sf_dir: str):
    spec = {
        "type": "terms",
        "field": "l_returnflag",
        "key": "bucket",
        "count_key": "n",
        "sort": "index",
        "facet": {
            "p50": {"type": "percentile", "field": "l_extendedprice", "q": 0.5},
            "p90": {"type": "percentile", "field": "l_extendedprice", "q": 0.9},
            "hll_parts": {"type": "hll", "field": "l_partkey"},
        },
    }
    out = compute_json_facet(sf_dir, "lineitem", spec)
    return (
        out[["bucket", "n", "p50", "p90", "hll_parts"]].sort_values("bucket").reset_index(drop=True)
    )


def json_facet_percentile_exact(sf_dir: str):
    """Exact per-bucket order-statistic percentiles (the strict twin of the
    t-digest `percentile` metric): value-count partials per bucket, ranked
    with the quantile_disc convention."""
    spec = {
        "type": "terms",
        "field": "l_returnflag",
        "key": "bucket",
        "count_key": "n",
        "sort": "index",
        "facet": {
            "p50": {"type": "percentile_exact", "field": "l_extendedprice", "q": 0.5},
            "p90": {"type": "percentile_exact", "field": "l_extendedprice", "q": 0.9},
        },
    }
    out = compute_json_facet(sf_dir, "lineitem", spec)
    return out[["bucket", "n", "p50", "p90"]].sort_values("bucket").reset_index(drop=True)


JSON_FACET_PERCENTILE_EXACT_SQL = """
SELECT l_returnflag AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
       quantile_disc(l_extendedprice, 0.5) AS p50,
       quantile_disc(l_extendedprice, 0.9) AS p90
FROM lineitem GROUP BY l_returnflag ORDER BY bucket
"""


def range_facet_other(sf_dir: str):
    """Classic range facet `facet.range.other=all` (RangeFacetProcessor):
    gap buckets over [start, end) plus the before / after / between
    sections, one combiner pass (bucket domain is request-sized)."""
    from .common import merge_partials

    start, end, gap = 50000.0, 350000.0, 100000.0

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["o_totalprice"].to_numpy()
        inside = (v >= start) & (v < end)
        b = np.where(inside, start + gap * np.floor((v - start) / gap), np.nan)
        lab = np.where(
            inside,
            b.astype("U32"),
            np.where(v < start, "__before__", "__after__"),
        )
        g = pd.DataFrame({"bucket": lab, "n": 1})
        out = g.groupby("bucket", as_index=False).sum()
        between = pd.DataFrame({"bucket": ["__between__"], "n": [int(inside.sum())]})
        return pd.concat([out, between], ignore_index=True)

    out = merge_partials(
        read(sf_dir, "orders", ["o_totalprice"]).map_batches(partial, batch_format="pandas"),
        ["bucket"],
        {"n": "sum"},
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


RANGE_FACET_OTHER_SQL = """
WITH lab AS (
  SELECT CASE
           WHEN o_totalprice < 50000 THEN '__before__'
           WHEN o_totalprice >= 350000 THEN '__after__'
           ELSE CAST(50000.0 + 100000.0 * FLOOR((o_totalprice - 50000.0) / 100000.0) AS VARCHAR)
         END AS bucket
  FROM orders
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n FROM lab GROUP BY bucket
UNION ALL
SELECT '__between__', CAST(COUNT(*) AS BIGINT) FROM orders
WHERE o_totalprice >= 50000 AND o_totalprice < 350000
ORDER BY bucket
"""


def range_facet_include(
    sf_dir: str,
    start: float = 50000.0,
    end: float = 330000.0,
    gap: float = 100000.0,
    include: frozenset = frozenset({"upper", "edge", "outer"}),
    hardend: bool = True,
):
    """Classic range facet `facet.range.include` + `facet.range.hardend`
    (RangeFacetProcessor / FacetRangeInclude): per-flag boundary ownership
    for the gap buckets AND the before/after/between sections.

    Solr semantics implemented exactly:
      - bucket i spans [lo, lo+gap) by default; `upper` → (lo, hi],
        `lower` → include lo, `edge` → first bucket includes its lower
        edge and last bucket its upper edge regardless of lower/upper;
        `all` = every flag.  (lower+upper legitimately double-counts
        boundary values — kept.)
      - `hardend=true` clamps the LAST bucket at `end` (possibly
        narrower than gap); false extends it a full gap past end.
      - before = v < start, inclusive of start iff `outer` or neither
        lower nor edge; after = v > (hard) end, inclusive iff `outer`
        or neither upper nor edge; between spans [start, end] with each
        edge owned iff (lower|edge) / (upper|edge).

    One combiner pass (bucket domain is request-sized); default args are
    the gate's (end NOT gap-aligned so hardend is non-vacuous)."""
    from .common import merge_partials

    if "all" in include:
        include = frozenset({"lower", "upper", "edge", "outer"})
    n_buckets = int(np.ceil((end - start) / gap))
    hard_end = end if hardend else start + n_buckets * gap

    def bounds(i: int):
        lo = start + i * gap
        hi = min(lo + gap, hard_end) if hardend else lo + gap
        inc_lo = "lower" in include or ("edge" in include and i == 0)
        inc_hi = "upper" in include or ("edge" in include and i == n_buckets - 1)
        return lo, hi, inc_lo, inc_hi

    inc_before = "outer" in include or not ({"lower", "edge"} & include)
    inc_after = "outer" in include or not ({"upper", "edge"} & include)
    bw_lo = bool({"lower", "edge"} & include)
    bw_hi = bool({"upper", "edge"} & include)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["o_totalprice"].to_numpy()
        rows, counts = [], []
        for i in range(n_buckets):
            lo, hi, inc_lo, inc_hi = bounds(i)
            m = (v >= lo if inc_lo else v > lo) & (v <= hi if inc_hi else v < hi)
            rows.append(f"{lo:.1f}")
            counts.append(int(m.sum()))
        rows.append("__before__")
        counts.append(int(((v <= start) if inc_before else (v < start)).sum()))
        rows.append("__after__")
        counts.append(int(((v >= hard_end) if inc_after else (v > hard_end)).sum()))
        rows.append("__between__")
        mb = (v >= start if bw_lo else v > start) & (v <= hard_end if bw_hi else v < hard_end)
        counts.append(int(mb.sum()))
        return pd.DataFrame({"bucket": rows, "n": np.asarray(counts, dtype="int64")})

    out = merge_partials(
        read(sf_dir, "orders", ["o_totalprice"]).map_batches(partial, batch_format="pandas"),
        ["bucket"],
        {"n": "sum"},
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


# gate params: include=upper,edge,outer + hardend=true over
# start=50000 end=330000 gap=100000 → buckets [50000,150000], (150000,250000],
# (250000,330000] (last clamped + upper), before = v<=50000... wait: edge sets
# the FIRST bucket's lower inclusive, so before excludes start only if
# outer is unset — outer IS set, so before = v <= 50000 (overlapping the
# first bucket's lower edge, exactly Solr's documented outer behavior).
RANGE_FACET_INCLUDE_SQL = """
SELECT '150000.0' AS bucket, CAST(COUNT(*) AS BIGINT) AS n FROM orders
  WHERE o_totalprice > 150000 AND o_totalprice <= 250000
UNION ALL
SELECT '250000.0', CAST(COUNT(*) AS BIGINT) FROM orders
  WHERE o_totalprice > 250000 AND o_totalprice <= 330000
UNION ALL
SELECT '50000.0', CAST(COUNT(*) AS BIGINT) FROM orders
  WHERE o_totalprice >= 50000 AND o_totalprice <= 150000
UNION ALL
SELECT '__after__', CAST(COUNT(*) AS BIGINT) FROM orders WHERE o_totalprice >= 330000
UNION ALL
SELECT '__before__', CAST(COUNT(*) AS BIGINT) FROM orders WHERE o_totalprice <= 50000
UNION ALL
SELECT '__between__', CAST(COUNT(*) AS BIGINT) FROM orders
  WHERE o_totalprice >= 50000 AND o_totalprice <= 330000
ORDER BY bucket
"""


def json_facet_unique(sf_dir: str):
    """unique() agg (UniqueAgg.java): EXACT distinct count per bucket via
    mergeable sorted value-set partials — bounded-cardinality fields only
    (hll is the unbounded path).  Exact → hash-gated."""
    spec = {
        "type": "terms",
        "field": "event_type",
        "key": "bucket",
        "count_key": "n",
        "sort": "index",
        "facet": {"uniq_users": {"type": "unique", "field": "user_id"}},
    }
    out = compute_json_facet(sf_dir, "events", spec)
    return out[["bucket", "n", "uniq_users"]].sort_values("bucket").reset_index(drop=True)


JSON_FACET_UNIQUE_SQL = """
SELECT event_type AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uniq_users
FROM events GROUP BY event_type ORDER BY bucket
"""


# --------------------------------------------------------------------------
# relatedness() aggregate (solr/core/src/java/org/apache/solr/search/facet/
# RelatednessAgg.java; Grainger et al. 2016, "The Semantic Knowledge
# Graph"): per bucket, a z-score of the bucket's foreground popularity vs
# its background popularity — the JSON Facet API's semantic-knn stat.
# Foreground here: English documents; buckets: source.


def json_facet_relatedness(sf_dir: str):
    spec = {
        "type": "terms",
        "field": "source",
        "key": "bucket",
        "count_key": "bg_count",
        "sort": "index",
        "facet": {
            "relatedness": {
                "type": "relatedness",
                "field": "lang",
                "fg": lambda s: (s["lang"] == "en").to_numpy(),
                "fg_key": "fg_count",
            }
        },
    }
    out = compute_json_facet(sf_dir, "documents", spec)
    out = out[["bucket", "fg_count", "bg_count", "relatedness"]]
    return (
        out.sort_values(["relatedness", "bucket"], ascending=[False, True]).reset_index(drop=True)
    )


# --------------------------------------------------------------------------
# countvals / missing / sumsq aggs (CountValsAgg.java, MissingAgg.java,
# SumsqAgg.java): the remaining JSON-facet stat functions, over a derived
# nullable column (the tables carry no native NULLs; both sides derive
# identically, the allBuckets-gate pattern).


def json_facet_stats(sf_dir: str):
    spec = {
        "type": "terms",
        "field": "event_type",
        "key": "bucket",
        "count_key": "n",
        "sort": "index",
        "facet": {
            "countvals": {
                "type": "countvals",
                "field": "value",
                "derive": lambda s: s["value"].where(s["value"] >= 1.0),
            },
            "missing": {
                "type": "missing",
                "field": "value",
                "derive": lambda s: s["value"].where(s["value"] >= 1.0),
            },
            "sumsq": {"type": "sumsq", "field": "value"},
        },
    }
    out = compute_json_facet(sf_dir, "events", spec)
    return (
        out[["bucket", "n", "countvals", "missing", "sumsq"]]
        .sort_values("bucket")
        .reset_index(drop=True)
    )


JSON_FACET_STATS_SQL = """
SELECT event_type AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(CASE WHEN value >= 1.0 THEN value END) AS BIGINT) AS countvals,
       CAST(SUM(CASE WHEN value >= 1.0 THEN 0 ELSE 1 END) AS BIGINT) AS missing,
       CAST(SUM(CAST(ROUND(value*100) AS HUGEINT) * CAST(ROUND(value*100) AS HUGEINT)) AS DOUBLE) AS sumsq
FROM events GROUP BY event_type ORDER BY bucket
"""


JSON_FACET_RELATEDNESS_SQL = """
WITH b AS (
  SELECT source AS bucket,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS fg_count,
         CAST(COUNT(*) AS BIGINT) AS bg_count
  FROM documents GROUP BY source
), t AS (
  SELECT CAST(SUM(fg_count) AS BIGINT) AS fg_size,
         CAST(SUM(bg_count) AS BIGINT) AS bg_size FROM b
), p AS (
  SELECT bucket, fg_count, bg_count,
         CAST(fg_count AS DOUBLE) / fg_size AS fg_pop,
         CAST(bg_count AS DOUBLE) / bg_size AS bg_pop,
         CAST(fg_size AS DOUBLE) AS fgs
  FROM b, t
)
SELECT bucket, fg_count, bg_count,
       CASE WHEN bg_pop * (1 - bg_pop) / fgs > 0
            THEN (fg_pop - bg_pop) / sqrt(bg_pop * (1 - bg_pop) / fgs)
            ELSE 0.0 END AS relatedness
FROM p ORDER BY relatedness DESC, bucket
"""


# --------------------------------------------------------------------------
# Classic FacetComponent long tail (SURVEY.md §2.6): pivot facets
# (solr/core/src/java/org/apache/solr/handler/component/PivotFacetProcessor
# .java — `facet.pivot=f1,f2` with a `stats` tag) and interval facets
# (solr/core/src/java/org/apache/solr/request/IntervalFacets.java —
# `facet.interval` with `[lo,hi)` / `(lo,hi]` / `*` endpoint syntax).
#
# Pivot shape: ONE combiner pass computes the LEAF lattice (full field
# cross-product with count + stats partials); every ancestor level's counts
# are then derived by re-aggregating the lattice on the driver — exactly
# how PivotFacetProcessor drills down one docset per level, but in a single
# distributed sweep.  No limits (classic pivots return the whole tree);
# `mincount` prunes per level.


def pivot_facet(
    sf_dir: str,
    table: str,
    fields: list[str],
    stats_field: str | None = None,
    mincount: int = 1,
) -> pd.DataFrame:
    """Hierarchical pivot over `fields` → flat DataFrame, one row per leaf
    combination, carrying each level's count (`n_<field>`) and, when
    `stats_field` is given, the leaf-level exact-cents sum (`cents`)."""
    need = list(fields) + ([stats_field] if stats_field else [])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch[list(fields)].copy()
        g["_n"] = 1
        if stats_field:
            g["cents"] = cents(batch[stats_field].to_numpy())
        return g.groupby(list(fields), as_index=False).sum()

    ops = {"_n": "sum", **({"cents": "sum"} if stats_field else {})}
    parts = read(sf_dir, table, need).map_batches(partial, batch_format="pandas").to_pandas()
    leaf = parts.groupby(list(fields), as_index=False).agg(ops)

    # derive ancestor counts from the leaf lattice; prune mincount per level
    out = leaf
    for li in range(len(fields)):
        keys = fields[: li + 1]
        lvl = leaf.groupby(keys, as_index=False)["_n"].sum().rename(columns={"_n": f"n_{fields[li]}"})
        lvl = lvl[lvl[f"n_{fields[li]}"] >= mincount]
        out = out.merge(lvl, on=keys, how="inner")
    out = out.drop(columns=["_n"])
    for li in range(len(fields)):
        out[f"n_{fields[li]}"] = out[f"n_{fields[li]}"].astype("int64")
    if stats_field:
        out["cents"] = out["cents"].astype("int64")
    return out.sort_values(list(fields)).reset_index(drop=True)


def facet_pivot(sf_dir: str):
    """`facet.pivot=o_orderpriority,o_orderstatus` + a stats tag on
    o_totalprice, mincount=2 (leaf cells rarer than 2 pruned)."""
    out = pivot_facet(
        sf_dir, "orders", ["o_orderpriority", "o_orderstatus"], "o_totalprice", mincount=2
    )
    cols = ["o_orderpriority", "n_o_orderpriority", "o_orderstatus", "n_o_orderstatus", "cents"]
    return out[cols]


FACET_PIVOT_SQL = """
WITH base AS (
  SELECT o_orderpriority, o_orderstatus, CAST(ROUND(o_totalprice*100) AS BIGINT) AS c FROM orders
),
l1 AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_o_orderpriority
  FROM base GROUP BY o_orderpriority HAVING COUNT(*) >= 2
),
l2 AS (
  SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_o_orderstatus,
         CAST(SUM(c) AS BIGINT) AS cents
  FROM base GROUP BY o_orderpriority, o_orderstatus HAVING COUNT(*) >= 2
)
SELECT l1.o_orderpriority, n_o_orderpriority, o_orderstatus, n_o_orderstatus, cents
FROM l1 JOIN l2 USING (o_orderpriority)
ORDER BY o_orderpriority, o_orderstatus
"""


def parse_interval(s: str) -> tuple[float, float, bool, bool]:
    """Parse Solr interval-facet syntax (IntervalFacets.FacetInterval):
    `[lo,hi]` / `(lo,hi)` mixed freely, `*` = unbounded endpoint.
    Returns (lo, hi, lo_inclusive, hi_inclusive) with ±inf for `*`."""
    s = s.strip()
    if s[0] not in "([" or s[-1] not in ")]":
        raise ValueError(f"bad interval syntax: {s!r}")
    lo_inc, hi_inc = s[0] == "[", s[-1] == "]"
    body = s[1:-1]
    depth = 0
    cut = -1
    for i, ch in enumerate(body):  # split on the comma (no nesting in numeric intervals)
        if ch == "," and depth == 0:
            cut = i
            break
    if cut < 0:
        raise ValueError(f"bad interval syntax: {s!r}")
    lo_s, hi_s = body[:cut].strip(), body[cut + 1 :].strip()
    lo = -np.inf if lo_s == "*" else float(lo_s)
    hi = np.inf if hi_s == "*" else float(hi_s)
    # Solr normalizes (*… and …*) to inclusive-unbounded
    if lo_s == "*":
        lo_inc = True
    if hi_s == "*":
        hi_inc = True
    if lo > hi or (lo == hi and not (lo_inc and hi_inc)):
        raise ValueError(f"empty interval: {s!r}")
    return lo, hi, lo_inc, hi_inc


def interval_facet(sf_dir: str, table: str, field: str, intervals: list[str]) -> pd.DataFrame:
    """Interval facet: count rows per (possibly overlapping) interval — a
    row lands in EVERY interval containing it, unlike range facets.  One
    combiner pass emits a per-batch count vector; partials merge on the
    driver (interval domain is request-sized)."""
    parsed = [parse_interval(s) for s in intervals]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[field].to_numpy()
        ns = []
        for lo, hi, lo_inc, hi_inc in parsed:
            m = (v >= lo) if lo_inc else (v > lo)
            m &= (v <= hi) if hi_inc else (v < hi)
            ns.append(int(m.sum()))
        return pd.DataFrame({"interval": intervals, "n": np.asarray(ns, dtype=np.int64)})

    parts = read(sf_dir, table, [field]).map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("interval", as_index=False, sort=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("interval").reset_index(drop=True)


FACET_INTERVALS = ["[*,0)", "[0,4500)", "[1000,9000]", "(4500,*]"]


def facet_interval(sf_dir: str):
    return interval_facet(sf_dir, "customer", "c_acctbal", FACET_INTERVALS)


FACET_INTERVAL_SQL = """
SELECT interval, n FROM (
  SELECT '[*,0)'      AS interval, CAST(COUNT(CASE WHEN c_acctbal < 0 THEN 1 END) AS BIGINT) AS n FROM customer
  UNION ALL
  SELECT '[0,4500)',    CAST(COUNT(CASE WHEN c_acctbal >= 0 AND c_acctbal < 4500 THEN 1 END) AS BIGINT) FROM customer
  UNION ALL
  SELECT '[1000,9000]', CAST(COUNT(CASE WHEN c_acctbal >= 1000 AND c_acctbal <= 9000 THEN 1 END) AS BIGINT) FROM customer
  UNION ALL
  SELECT '(4500,*]',    CAST(COUNT(CASE WHEN c_acctbal > 4500 THEN 1 END) AS BIGINT) FROM customer
) ORDER BY interval
"""


def json_facet_domain(sf_dir: str):
    """Multi-select faceting: the facet domain is re-scoped by a filter the
    main result set does NOT share (`domain:{filter:...}` — tag/ex
    faceting's engine mechanism).  Facet order priorities over only the
    fulfilled (F) orders, with an exact-cents sum metric."""
    spec = {
        "type": "terms",
        "field": "o_orderpriority",
        "key": "priority",
        "count_key": "n",
        "sort": "index",
        "domain": {
            "q_field": "o_orderstatus",
            "filter": lambda b: (b["o_orderstatus"] == "F").to_numpy(),
        },
        "facet": {"cents": {"type": "sum", "field": "o_totalprice", "money": True}},
    }
    out = compute_json_facet(sf_dir, "orders", spec)
    out["cents"] = out["cents"].astype("int64")
    return out[["priority", "n", "cents"]].sort_values("priority").reset_index(drop=True)


JSON_FACET_DOMAIN_SQL = """
SELECT o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
FROM orders WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority ORDER BY priority
"""


# --------------------------------------------------------------------------
# DrillSideways (lucene/facet/src/java/org/apache/lucene/facet/
# DrillSideways.java): with a multi-dimension drill-down selection, each
# dimension's facet counts are computed with every OTHER dimension's filter
# applied but its OWN filter relaxed ("near-miss" counting — the UI pattern
# where clicking lang=en still shows counts for the other languages).  One
# streaming scan computes all per-dimension partials with complementary
# masks plus the fully-filtered hit count; only (dim, val, cnt) combiner
# rows reach the driver.

DRILL_SELECTION = {"lang": "en", "source": "src3"}


def drill_sideways(sf_dir: str):
    dims = sorted(DRILL_SELECTION)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        masks = {d: (batch[d] == DRILL_SELECTION[d]).to_numpy() for d in dims}
        frames = []
        for d in dims:
            others = np.ones(len(batch), dtype=bool)
            for o in dims:
                if o != d:
                    others &= masks[o]
            vc = batch[d][others].value_counts()
            frames.append(pd.DataFrame({"dim": d, "val": vc.index, "cnt": vc.to_numpy()}))
        hits = np.ones(len(batch), dtype=bool)
        for d in dims:
            hits &= masks[d]
        frames.append(pd.DataFrame({"dim": ["__hits__"], "val": [""], "cnt": [int(hits.sum())]}))
        return pd.concat(frames, ignore_index=True)

    ds = read(sf_dir, "documents", dims).map_batches(partial, batch_format="pandas")
    from .common import merge_partials

    df = merge_partials(ds, ["dim", "val"], {"cnt": "sum"})
    df["cnt"] = df["cnt"].astype("int64")
    return df.sort_values(["dim", "val"]).reset_index(drop=True)


def _drill_sql() -> str:
    dims = sorted(DRILL_SELECTION)
    parts = []
    for d in dims:
        where = " AND ".join(f"{o} = '{DRILL_SELECTION[o]}'" for o in dims if o != d)
        # `{d} IS NOT NULL` mirrors the engine's value_counts (missing
        # values are not facet buckets — Solr's facet.missing=false default)
        parts.append(
            f"SELECT '{d}' AS dim, {d} AS val, CAST(COUNT(*) AS BIGINT) AS cnt "
            f"FROM documents WHERE {where} AND {d} IS NOT NULL GROUP BY {d}"
        )
    full = " AND ".join(f"{d} = '{DRILL_SELECTION[d]}'" for d in dims)
    parts.append(
        "SELECT '__hits__' AS dim, '' AS val, CAST(COUNT(*) AS BIGINT) AS cnt "
        f"FROM documents WHERE {full}"
    )
    return "SELECT * FROM (" + "\nUNION ALL\n".join(parts) + ") ORDER BY dim, val"


DRILL_SIDEWAYS_SQL = _drill_sql()


PIPELINES: dict[str, Pipeline] = {
    "drill_sideways": Pipeline(
        drill_sideways, DRILL_SIDEWAYS_SQL, "DrillSideways near-miss facet counts: per-dim complementary masks in one scan"
    ),
    "json_facet_domain": Pipeline(
        json_facet_domain,
        JSON_FACET_DOMAIN_SQL,
        "JSON facet domain change: domain:{filter} re-scopes the facet tree (multi-select faceting)",
    ),
    "json_facet_nested": Pipeline(
        json_facet_nested, JSON_FACET_NESTED_SQL, "nested JSON facet: terms×terms buckets, per-level sort/limit, sum metrics"
    ),
    "json_facet_range": Pipeline(
        json_facet_range, JSON_FACET_RANGE_SQL, "JSON facet: range×query buckets with exact-cents avg metric"
    ),
    "json_facet_stddev": Pipeline(
        json_facet_stddev,
        JSON_FACET_STDDEV_SQL,
        "stddev/variance facet aggs from exact per-bucket integer moments (StddevAgg/VarianceAgg)",
    ),
    "json_facet_prefix": Pipeline(
        json_facet_prefix,
        JSON_FACET_PREFIX_SQL,
        "terms facet prefix param: domain restricted before rank/limit/numBuckets",
    ),
    "json_facet_numbuckets": Pipeline(
        json_facet_numbuckets,
        JSON_FACET_NUMBUCKETS_SQL,
        "numBuckets: distinct-bucket counts before the limit, per domain incl. nested (FacetFieldProcessor)",
    ),
    "json_facet_allbuckets": Pipeline(
        json_facet_allbuckets, JSON_FACET_ALLBUCKETS_SQL, "JSON facet allBuckets+missing sentinels with nested query facet"
    ),
    "facet_refined": Pipeline(
        facet_refined, FACET_REFINED_SQL, "two-phase facet refinement: truncated per-shard partials + exact refinement round (FacetComponent)"
    ),
    "json_facet_unique": Pipeline(
        json_facet_unique, JSON_FACET_UNIQUE_SQL, "exact unique() facet agg via sorted value-set partials (UniqueAgg)"
    ),
    "json_facet_percentile": Pipeline(
        json_facet_percentile,
        None,  # t-digest is approximate by design → rows-only gate; pytest oracle
        "percentile facet agg via mergeable t-digest partials (PercentileAgg)",
    ),
    "json_facet_percentile_exact": Pipeline(
        json_facet_percentile_exact,
        JSON_FACET_PERCENTILE_EXACT_SQL,
        "EXACT per-bucket percentile via value-count partials (quantile_disc parity)",
    ),
    "range_facet_include": Pipeline(
        range_facet_include,
        RANGE_FACET_INCLUDE_SQL,
        "facet.range.include flags (lower/upper/edge/outer) + hardend clamping, one combiner pass",
    ),
    "range_facet_other": Pipeline(
        range_facet_other,
        RANGE_FACET_OTHER_SQL,
        "classic range facet with before/after/between `other` sections (RangeFacetProcessor)",
    ),
    "json_facet_stats": Pipeline(
        json_facet_stats,
        JSON_FACET_STATS_SQL,
        "countvals/missing/sumsq facet aggs over a derived nullable column (CountValsAgg/MissingAgg/SumsqAgg)",
    ),
    "json_facet_relatedness": Pipeline(
        json_facet_relatedness,
        JSON_FACET_RELATEDNESS_SQL,
        "relatedness() semantic-knn aggregate: fg-vs-bg z-score per bucket (RelatednessAgg)",
    ),
    "facet_pivot": Pipeline(
        facet_pivot,
        FACET_PIVOT_SQL,
        "classic pivot facet: full hierarchical cross-product w/ per-level counts, stats tag, mincount (PivotFacetProcessor)",
    ),
    "facet_interval": Pipeline(
        facet_interval,
        FACET_INTERVAL_SQL,
        "interval facet: overlapping [lo,hi) intervals w/ Solr endpoint syntax (IntervalFacets)",
    ),
}
