"""Resumable partitioned output: finished partitions are skipped on rerun,
a partition without its marker is rewritten, and the data round-trips."""

import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.sources.sinks import write_partitioned

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "event_type", "value"])


def test_write_skip_rewrite_cycle(ray_session, events_ds, tmp_path):
    import duckdb

    out = tmp_path / "by_type"
    r1 = write_partitioned(events_ds, out, "event_type")
    assert r1["skipped"] == [] and len(r1["written"]) >= 3
    types = sorted(r1["written"])
    for t in types:
        assert (out / f"_DONE_{t}").exists()
        assert list(out.glob(f"event_type={t}/*.parquet"))

    # full rerun: everything skipped, nothing rewritten
    before = {p: p.stat().st_mtime_ns for p in out.rglob("*.parquet")}
    r2 = write_partitioned(events_ds, out, "event_type")
    assert r2["written"] == [] and r2["skipped"] == types
    assert {p: p.stat().st_mtime_ns for p in out.rglob("*.parquet")} == before

    # simulate a crashed partition: marker missing → only IT is rewritten
    victim = types[0]
    (out / f"_DONE_{victim}").unlink()
    r3 = write_partitioned(events_ds, out, "event_type")
    assert r3["written"] == [victim]
    after = {p: p.stat().st_mtime_ns for p in out.rglob("*.parquet")}
    for p, m in before.items():
        if f"event_type={victim}" not in str(p) and p in after:
            assert after[p] == m, p

    # data round-trip equals the source (hive partition column restored)
    got = duckdb.sql(
        f"SELECT event_id, event_type, value FROM read_parquet('{out}/*/*.parquet', hive_partitioning=1) ORDER BY event_id"
    ).df()
    exp = duckdb.sql(
        f"SELECT event_id, event_type, value FROM read_parquet('{SF}/events.parquet') ORDER BY event_id"
    ).df()
    assert got["event_id"].tolist() == exp["event_id"].tolist()
    assert got["event_type"].tolist() == exp["event_type"].tolist()
    assert got["value"].tolist() == exp["value"].tolist()


def test_crash_mid_job_keeps_completed_partitions(ray_session, events_ds, tmp_path, monkeypatch):
    """Per-partition commit: if the job dies after partition #1's marker,
    a rerun skips it and rewrites only the rest (resume granularity is
    per-partition, not per-run)."""
    import ray.data

    out = tmp_path / "by_type"
    types = sorted(events_ds.unique("event_type"))
    assert len(types) >= 2

    real_write = ray.data.Dataset.write_parquet
    calls = {"n": 0}

    def dying_write(self, path, *a, **kw):
        if calls["n"] >= 1:
            raise RuntimeError("simulated crash after first partition")
        calls["n"] += 1
        return real_write(self, path, *a, **kw)

    monkeypatch.setattr(ray.data.Dataset, "write_parquet", dying_write)
    with pytest.raises(RuntimeError, match="simulated crash"):
        write_partitioned(events_ds, out, "event_type", values=types)
    monkeypatch.undo()

    assert (out / f"_DONE_{types[0]}").exists()  # first partition committed
    assert not (out / f"_DONE_{types[1]}").exists()
    r = write_partitioned(events_ds, out, "event_type", values=types)
    assert r["skipped"] == [types[0]]
    assert r["written"] == types[1:]
    # committed data survives intact across the crash + resume
    n_total = sum(
        pq.read_table(p).num_rows for p in out.rglob("*.parquet")
    )
    assert n_total == events_ds.count()


def test_curate_flagship_into_partitioned_sink(ray_session, tmp_path):
    """End-to-end training-data run: the curate_corpus flagship's survivors
    land in a per-lang resumable partitioned sink; a rerun with one marker
    removed rewrites only that partition and the data round-trips."""
    import ray.data as rd

    from lucene_solr_ray.pipelines.curate import curate_corpus

    survivors = curate_corpus("/root/testdata/sf0.001")
    assert len(survivors) and set(survivors["lang"]) <= {"de", "en"}
    ds = rd.from_pandas(survivors)
    out = tmp_path / "curated"
    r1 = write_partitioned(ds, out, "lang")
    assert sorted(r1["written"]) == sorted(set(survivors["lang"]))
    # crash-resume: drop one marker, only that partition rewrites
    victim = r1["written"][0]
    (out / f"_DONE_{victim}").unlink()
    r2 = write_partitioned(ds, out, "lang")
    assert r2["written"] == [victim]
    import duckdb

    got = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out}/*/*.parquet', hive_partitioning=1)"
    ).fetchone()[0]
    assert got == len(survivors)


def test_arrow_ipc_sink_round_trips(ray_session, tmp_path):
    """write_arrow_ipc → read_arrow_ipc_docs round trip: every row comes
    back, written block files are valid IPC, no driver materialization."""
    import pandas as pd
    import pyarrow.ipc as ipc
    import ray.data as rd

    from lucene_solr_ray.sources.sinks import write_arrow_ipc

    df = pd.DataFrame({"id": range(500), "text": [f"doc {i} body" for i in range(500)]})
    src = tmp_path / "in.parquet"
    df.to_parquet(src)
    out = tmp_path / "ipc"
    n_files = write_arrow_ipc(rd.read_parquet(str(src)), out)
    files = sorted(out.glob("*.arrow"))
    assert n_files == len(files) >= 1
    rows = 0
    for f in files:
        with ipc.open_file(str(f)) as r:
            t = r.read_all()
            rows += t.num_rows
            assert t.schema.names == ["id", "text"]
    assert rows == 500
    # no stray tmp files
    assert not list(out.glob(".*.tmp"))


def test_write_jsonl_roundtrip(ray_session, tmp_path):
    """JSONL sink ↔ read_json_docs round trip; atomic per-block files."""
    import glob

    import ray.data as rd

    from lucene_solr_ray.sources.loaders import read_json_docs
    from lucene_solr_ray.sources.sinks import write_jsonl

    rows = [{"doc_id": i, "text": f"doc {i} näme", "lang": "en"} for i in range(57)]
    n = write_jsonl(rd.from_items(rows), tmp_path / "out")
    files = glob.glob(str(tmp_path / "out" / "*.jsonl"))
    assert n == len(files) >= 1 and not glob.glob(str(tmp_path / "out" / ".*tmp"))
    back = read_json_docs(files).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back["doc_id"].tolist() == list(range(57))
    assert back["text"].iloc[3] == "doc 3 näme"  # unicode survives (ensure_ascii=False)
    # empty dataset → zero files, no error
    assert write_jsonl(rd.from_items(rows).filter(lambda r: False), tmp_path / "empty") == 0
