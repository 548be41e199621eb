"""Index manifest: commit points, per-partition lineage, resume.

The Ray-Data analog of Lucene's `segments_N` commit point
(lucene/core/src/java/org/apache/lucene/index/SegmentInfos.java :: read/write):
a JSON document listing every completed doc-partition segment and term-shard
with lineage (input file, row count, docID base, dl sum) and counts
(n_terms, n_postings), written atomically (tmp + rename).  A resumed build
skips shards marked "done"; query actors only load a manifest whose status is
"committed" (BASELINE: resumable with per-partition lineage + metrics).
"""

from __future__ import annotations

import json
import os
import threading
from pathlib import Path
from typing import Any

MANIFEST_NAME = "manifest.json"


class Manifest:
    def __init__(self, index_dir: str | Path):
        self.index_dir = Path(index_dir)
        self.path = self.index_dir / MANIFEST_NAME
        self._lock = threading.Lock()
        self.data: dict[str, Any] = {
            "version": 1,
            "status": "building",
            "config": {},
            "segments": {},  # pid -> lineage
            "shards": {},    # shard_id -> {pids, n_terms, n_postings, wall_s, status}
            "stats": {},     # N, sum_ttf, avgdl, n_terms
        }

    @classmethod
    def load(cls, index_dir: str | Path) -> "Manifest | None":
        m = cls(index_dir)
        if not m.path.exists():
            return None
        m.data = json.loads(m.path.read_text())
        return m

    def save(self) -> None:
        with self._lock:
            self.index_dir.mkdir(parents=True, exist_ok=True)
            tmp = self.path.with_suffix(".json.tmp")
            tmp.write_text(json.dumps(self.data, indent=1, sort_keys=True))
            os.replace(tmp, self.path)

    # -- helpers -----------------------------------------------------------
    def shard_done(self, shard_id: int) -> bool:
        s = self.data["shards"].get(str(shard_id))
        return bool(s and s.get("status") == "done")

    def mark_shard(self, shard_id: int, **fields: Any) -> None:
        with self._lock:
            self.data["shards"].setdefault(str(shard_id), {}).update(fields)
        self.save()

    def mark_segment(self, pid: int, **fields: Any) -> None:
        with self._lock:
            self.data["segments"].setdefault(str(pid), {}).update(fields)

    def commit(self, stats: dict[str, Any]) -> None:
        self.data["stats"] = stats
        self.data["status"] = "committed"
        self.save()

    @property
    def committed(self) -> bool:
        return self.data.get("status") == "committed"
