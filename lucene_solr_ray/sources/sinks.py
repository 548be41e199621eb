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
- each partition is committed SEPARATELY: its directory is written, then
  its marker — a crash mid-job keeps every already-marked partition and
  the rerun rewrites only the unfinished ones (resume granularity is
  per-partition, not per-run).  The pending data is computed ONCE
  (materialized to the object store), so the per-partition commit loop
  re-filters cached blocks, never re-runs the upstream pipeline.
- directory names are built HERE (`{col}={v}`), not by Ray's hive writer,
  so the rmtree/marker/write paths can never disagree on value encoding.
"""

from __future__ import annotations

from pathlib import Path

__all__ = ["write_partitioned"]


def write_partitioned(ds, out_dir: str | Path, partition_col: str, values=None) -> dict:
    """→ {"written": [...], "skipped": [...]} partition values.

    `values` optionally supplies the partition domain; otherwise ONE
    distinct scan discovers it (bounded-domain columns only)."""
    import pyarrow.compute as pc

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    if values is None:
        values = sorted(ds.unique(partition_col))  # returns bare values
    done = {v for v in values if (out / f"_DONE_{v}").exists()}
    pending = [v for v in values if v not in done]
    written: list = []
    if pending:
        import shutil

        import pyarrow as pa

        keep = pa.array(pending)
        sub = ds.map_batches(
            lambda t: t.filter(pc.is_in(t.column(partition_col), value_set=keep)),
            batch_format="pyarrow",
        ).materialize()  # compute once; the commit loop below only re-filters
        for v in pending:
            part_dir = out / f"{partition_col}={v}"
            # a half-written partition restarts CLEAN (no marker ⇒ rewrite)
            shutil.rmtree(part_dir, ignore_errors=True)
            one = sub.map_batches(
                # hive layout: the partition column lives in the path, not
                # the files (what Ray's partition_cols writer emits too)
                lambda t, _v=v: t.filter(pc.equal(t.column(partition_col), _v)).drop_columns(
                    [partition_col]
                ),
                batch_format="pyarrow",
            )
            one.write_parquet(str(part_dir))
            (out / f"_DONE_{v}").write_text("ok")
            written.append(v)
    return {"written": written, "skipped": sorted(done)}


def write_arrow_ipc(ds, out_dir: str | Path) -> int:
    """Arrow IPC (Feather V2) streaming sink — the modern zero-copy binary
    wire format standing in for the reference's javabin response writer
    (SURVEY §2.1 response writers; loaders.read_arrow_ipc_docs is the
    matching source).  Each Ray block writes its own `.arrow` file inside
    workers (no driver materialization); files land atomically via
    tmp+rename.  Returns the number of files written."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        import os
        import uuid

        if t.num_rows == 0:  # never emit (or count) empty block files
            return pa.table({"files": pa.array([], pa.int64())})
        name = f"block-{uuid.uuid4().hex}.arrow"
        tmp = out / f".{name}.tmp"
        with ipc.new_file(str(tmp), t.schema) as w:
            w.write_table(t)
        os.replace(tmp, out / name)
        return pa.table({"files": pa.array([1], pa.int64())})

    marks = ds.map_batches(write_block, batch_format="pyarrow").to_pandas()
    # Ray drops the block schema when EVERY block is empty (CLAUDE.md
    # gotcha) — an all-filtered input simply wrote zero files
    return int(marks["files"].sum()) if "files" in marks.columns else 0


def write_jsonl(ds, out_dir: str | Path) -> int:
    """JSON-lines streaming sink — the de-facto interchange format of LLM
    training-data pipelines (and the reference's JSON response writer,
    SURVEY §2.1; loaders.read_json_docs round-trips it).  Each Ray block
    writes its own `.jsonl` file inside workers with tmp+rename commits;
    nothing materializes on the driver.  Returns the number of files."""
    import pyarrow as pa

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        import json
        import os
        import uuid

        if t.num_rows == 0:
            return pa.table({"files": pa.array([], pa.int64())})
        name = f"block-{uuid.uuid4().hex}.jsonl"
        tmp = out / f".{name}.tmp"
        cols = t.column_names

        def clean(v):
            # NaN/±inf are NOT JSON (json.dumps would emit bare NaN tokens
            # pyarrow refuses to read back) — map to null like Solr's JSON
            # writer does for missing values
            if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
                return None
            return v

        with open(tmp, "w", encoding="utf-8") as f:
            for row in zip(*(t.column(c).to_pylist() for c in cols)):
                f.write(
                    json.dumps(
                        {k: clean(v) for k, v in zip(cols, row)},
                        ensure_ascii=False,
                        default=str,
                        allow_nan=False,
                    )
                )
                f.write("\n")
        os.replace(tmp, out / name)
        return pa.table({"files": pa.array([1], pa.int64())})

    marks = ds.map_batches(write_block, batch_format="pyarrow").to_pandas()
    return int(marks["files"].sum()) if "files" in marks.columns else 0
