"""Continuous incremental indexing — the DaemonStream/TopicStream analog.

The reference's continuous execution is a daemon re-running a stream on an
interval with checkpointed consumption (solr/solrj/.../io/stream/
DaemonStream.java, TopicStream.java) and an NRT reopen cadence
(CommitTracker).  Ray shape (SURVEY.md §2.10): a driver loop that polls the
input directory, ingests only NEW files via the incremental build (prefix
check in `build_index`), and commits a fresh manifest each round — query
actors opened afterwards see the new commit point (reopen-on-commit).
"""

from __future__ import annotations

import glob
import time
from pathlib import Path

from .build import build_index
from .manifest import Manifest


def run_incremental_daemon(
    input_glob: str,
    index_dir: str | Path,
    *,
    interval_s: float = 10.0,
    max_rounds: int | None = None,
    stop_when_idle_rounds: int | None = None,
    compact_above_shards: int | None = None,
    **build_kwargs,
) -> list[dict]:
    """Poll `input_glob`; rebuild incrementally when new files appear.

    `compact_above_shards` triggers the TieredMergePolicy-analog merge
    (`compact.compact_index`) whenever the committed shard count exceeds it
    — the daemon is the reference's merge-scheduler seat (SURVEY.md §3.1).

    Returns the per-round log: [{round, n_files, built, wall_s}].  Rounds
    with no new files are no-ops (the manifest fingerprint matches).
    """
    log: list[dict] = []
    seen = -1
    idle = 0
    r = 0
    while max_rounds is None or r < max_rounds:
        t0 = time.monotonic()
        paths = sorted(glob.glob(input_glob))
        built = False
        if paths and len(paths) != seen:
            manifest = build_index(paths, index_dir, resume=True, **build_kwargs)
            assert manifest.committed
            if (
                compact_above_shards is not None
                and len(manifest.data["shards"]) > compact_above_shards
            ):
                from .compact import compact_index

                compact_index(index_dir, max_shards=compact_above_shards)
            seen = len(paths)
            built = True
            idle = 0
        else:
            idle += 1
        log.append(
            {"round": r, "n_files": len(paths), "built": built, "wall_s": round(time.monotonic() - t0, 3)}
        )
        r += 1
        if stop_when_idle_rounds is not None and idle >= stop_when_idle_rounds:
            break
        if (max_rounds is None or r < max_rounds) and interval_s > 0:
            time.sleep(interval_s)
    return log


def current_commit(index_dir: str | Path) -> dict | None:
    """The visible commit point (segments_N analog): stats of the last
    committed manifest, or None while building/absent."""
    m = Manifest.load(index_dir)
    if m is None or not m.committed:
        return None
    return dict(m.data["stats"])
