"""Time-routed alias (solr/core/src/java/org/apache/solr/cloud/api/
collections/TimeRoutedAlias.java + update/processor/
RoutedAliasUpdateProcessor.java): documents route to the member
collection owning their time window at WRITE time; at QUERY time the
alias fans out only to members whose window intersects the requested
time range — window pruning instead of a full scatter.

Ray shape: routing is one parallel pass over the source files (one Ray
task per file splits its rows by `ts // interval` and writes per-window
part files — no shuffle, no cross-file contention, atomic tmp+rename),
then each member index builds independently.  Because source files are
conv-range partitioned and a file's window-slice preserves row order,
every member's part list is itself conv-range partitioned in path order
— the engine's docID invariant holds per member.  Caveat (documented,
matches Solr): a parent/child block whose children straddle a window
boundary is split across members, so block-join queries are per-member
only under a routed alias."""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DAY_US = 86_400_000_000


def _route_one(path: str, inputs_dir: str, width: int, field: str) -> dict[int, int]:
    """Split one source file by time window → {window: n_rows} (part files
    named after the source file so reruns overwrite, not duplicate)."""
    t = pq.read_table(path)
    us = pc.cast(t.column(field), pa.int64()).to_numpy()
    w = us // width
    stem = Path(path).stem
    out: dict[int, int] = {}
    for wv in np.unique(w):
        sub = t.filter(pa.array(w == wv))
        d = Path(inputs_dir) / f"w{int(wv):016d}"
        d.mkdir(parents=True, exist_ok=True)
        tmp = d / f".{stem}.tmp"
        pq.write_table(sub, tmp)
        os.replace(tmp, d / f"{stem}.parquet")
        out[int(wv)] = sub.num_rows
    return out


def build_time_routed(
    input_paths: list[str],
    base_dir: str | Path,
    interval_us: int = DAY_US,
    field: str = "ts",
    **build_kw,
) -> dict:
    """Route `input_paths` into per-window member collections under
    `base_dir` and build each member index.  Returns (and persists as
    alias.json) the alias descriptor: field, interval, and the member
    window → index-dir map."""
    import ray

    from .build import build_index

    base_dir = Path(base_dir)
    inputs_dir = base_dir / "inputs"
    route = ray.remote(_route_one)
    counts: dict[int, int] = {}
    for part in ray.get(
        [route.remote(str(p), str(inputs_dir), interval_us, field) for p in input_paths]
    ):
        for wv, n in part.items():
            counts[wv] = counts.get(wv, 0) + n
    members = {}
    for wv in sorted(counts):
        wname = f"w{wv:016d}"
        paths = sorted(str(p) for p in (inputs_dir / wname).glob("*.parquet"))
        idx_dir = base_dir / "members" / wname
        build_index(paths, idx_dir, **build_kw)
        members[wname] = {
            "start_us": wv * interval_us,
            "end_us": (wv + 1) * interval_us,
            "dir": str(idx_dir),
            "n_rows": counts[wv],
        }
    alias = {"field": field, "interval_us": interval_us, "members": members}
    tmp = base_dir / ".alias.json.tmp"
    tmp.write_text(json.dumps(alias, indent=1))
    os.replace(tmp, base_dir / "alias.json")
    return alias


class TimeRoutedAliasSearcher:
    """Query side of the routed alias: member selection by window overlap
    (`last_members` records the fan-out for pruning assertions), then the
    AliasSearcher merge contract — per-member raw scores, ties broken
    (score desc, member window order, docID asc)."""

    def __init__(self, base_dir: str | Path):
        from ..search import Searcher

        base_dir = Path(base_dir)
        self.alias = json.loads((base_dir / "alias.json").read_text())
        self.names = sorted(self.alias["members"])
        self.searchers = {n: Searcher(self.alias["members"][n]["dir"]) for n in self.names}
        self.last_members: list[str] = []

    def _select(self, ts_lo: int | None, ts_hi: int | None) -> list[str]:
        out = []
        for n in self.names:
            m = self.alias["members"][n]
            if ts_lo is not None and m["end_us"] <= ts_lo:
                continue
            if ts_hi is not None and m["start_us"] > ts_hi:
                continue
            out.append(n)
        return out

    def search(
        self,
        query: str,
        k: int = 10,
        ts_lo: int | None = None,
        ts_hi: int | None = None,
        similarity: str = "bm25",
    ) -> list[tuple[str, int, float]]:
        """→ [(member, doc_id, score)].  ts bounds are epoch-us and select
        members by WINDOW overlap (the routed-alias fan-out contract —
        per-row filtering inside the boundary windows stays the caller's
        fq, exactly as in Solr)."""
        self.last_members = self._select(ts_lo, ts_hi)
        hits = []
        for ci, n in enumerate(self.last_members):
            for doc, score in self.searchers[n].search(query, k, similarity=similarity):
                hits.append((n, ci, doc, score))
        hits.sort(key=lambda h: (-h[3], h[1], h[2]))
        return [(n, d, sc) for n, _, d, sc in hits[:k]]

    def count(self, query: str, ts_lo: int | None = None, ts_hi: int | None = None) -> int:
        self.last_members = self._select(ts_lo, ts_hi)
        return sum(self.searchers[n].count(query) for n in self.last_members)

    def close(self) -> None:
        for s in self.searchers.values():
            s.close()
