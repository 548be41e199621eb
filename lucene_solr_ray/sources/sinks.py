"""Resumable partitioned parquet output — the write-side counterpart of
the index build's atomic shard commits (index/build.py tmp+rename), for
PIPELINE results: one hive directory per partition-key value plus a
per-partition completion marker, so a failed 100 TB job reruns only the
partitions that never finished (reference shape: Solr's per-shard commit
points; a whole-dataset sink that dies at 99% restarts from zero).

Usage:
    write_partitioned(ds, out_dir, "event_type")

- the dataset is filtered to NOT-yet-done partitions BEFORE execution
  (predicate pushdown into the read when `ds` is a fresh read), so a
  resume never recomputes or rewrites finished partitions;
- `partition_col` must have a bounded value domain (it's one output
  directory per value) — exactly the brief's "one directory per input
  shard / key range";
- markers are written AFTER write_parquet returns: a crash mid-write
  leaves no marker, and the rerun overwrites that partition's directory.
"""

from __future__ import annotations

from pathlib import Path

__all__ = ["write_partitioned"]


def write_partitioned(ds, out_dir: str | Path, partition_col: str, values=None) -> dict:
    """→ {"written": [...], "skipped": [...]} partition values.

    `values` optionally supplies the partition domain; otherwise ONE
    distinct scan discovers it (bounded-domain columns only)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    if values is None:
        values = sorted(ds.unique(partition_col))  # returns bare values
    done = {v for v in values if (out / f"_DONE_{v}").exists()}
    pending = [v for v in values if v not in done]
    if pending:
        import shutil

        for v in pending:  # a half-written partition restarts CLEAN —
            shutil.rmtree(out / f"{partition_col}={v}", ignore_errors=True)
        keep = pa.array(pending)  # Arrow membership mask per block
        sub = ds.map_batches(
            lambda t: t.filter(pc.is_in(t.column(partition_col), value_set=keep)),
            batch_format="pyarrow",
        )
        sub.write_parquet(str(out), partition_cols=[partition_col])
        for v in pending:
            (out / f"_DONE_{v}").write_text("ok")
    return {"written": pending, "skipped": sorted(done)}
