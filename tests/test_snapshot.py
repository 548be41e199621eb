"""Commit-point snapshots (SnapshotDeletionPolicy / Solr backup-restore
analog): a snapshot pins the manifest + tombstones; later deletes, appends
and compaction don't disturb it; restore flips back atomically and search
results return to the pinned commit exactly."""

import shutil

import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.fixtures import gen_conv_range
from lucene_solr_ray.index import (
    build_index,
    compact_index,
    create_snapshot,
    list_snapshots,
    referenced_roots,
    restore_snapshot,
)
from lucene_solr_ray.search import Searcher

IDX = "/tmp/lsr_snap_index"
SRC = "/tmp/lsr_snap_corpus"
QUERIES = ["error", "assistant ok", '"tool output"']


def _write(k: int) -> str:
    t = gen_conv_range(k * 30, 30, seed=31)
    p = f"{SRC}/part-{k:05d}.parquet"
    pq.write_table(t, p)
    return p


def _results(idx):
    s = Searcher(idx, use_ray=False)
    try:
        return {q: s.search(q, 10) for q in QUERIES} | {"_terms": s.terms("", 15)}
    finally:
        s.close()


@pytest.fixture(scope="module")
def snap_index(ray_session):
    import os

    shutil.rmtree(SRC, ignore_errors=True)
    shutil.rmtree(IDX, ignore_errors=True)
    os.makedirs(SRC)
    paths = [_write(k) for k in range(2)]
    build_index(paths, IDX, files_per_shard=1)
    return paths


def test_snapshot_restore_roundtrip(snap_index):
    base = _results(IDX)
    create_snapshot(IDX, "v1")
    assert list_snapshots(IDX) == ["v1"]
    with pytest.raises(FileExistsError):
        create_snapshot(IDX, "v1")

    # mutate the live index: delete docs, then append two more files
    s = Searcher(IDX, use_ray=False)
    n_del = s.delete_by_query("error")
    s.close()
    assert n_del > 0
    paths = snap_index + [_write(2), _write(3)]
    build_index(paths, IDX, files_per_shard=1)
    mutated = _results(IDX)
    assert mutated != base  # deletes + appends changed results

    restore_snapshot(IDX, "v1")
    assert _results(IDX) == base  # bit-identical to the pinned commit


def test_snapshot_survives_compaction(snap_index):
    create_snapshot(IDX, "v2")
    m = compact_index(IDX, max_shards=1)
    roots = referenced_roots(IDX)
    # live manifest points at the new generation; snapshots pin the old
    assert m.data["config"].get("shards_dir", "shards") in roots
    assert "shards" in roots  # v1/v2 snapshots still reference the old root
    after = _results(IDX)
    restore_snapshot(IDX, "v2")
    assert _results(IDX) == after  # v2 was taken post-restore → same data


def test_restore_missing_raises(snap_index):
    with pytest.raises(FileNotFoundError):
        restore_snapshot(IDX, "nope")


def test_delete_and_purge(snap_index):
    """IndexFileDeleter semantics: a pinned commit's generations survive
    purge; releasing every snapshot makes them purgeable; the live commit
    is never touched."""
    import glob
    import os

    from lucene_solr_ray.index import (
        Manifest,
        compact_index,
        delete_snapshot,
        list_snapshots,
        purge,
    )

    old_root = Manifest.load(IDX).data["config"].get("shards_dir", "shards")
    create_snapshot(IDX, "pin")
    compact_index(IDX, max_shards=1)
    new_root = Manifest.load(IDX).data["config"].get("shards_dir", "shards")
    assert new_root != old_root
    assert os.path.isdir(f"{IDX}/{old_root}")  # pinned -> survived compaction
    base = _results(IDX)
    removed0 = purge(IDX)
    assert all(old_root not in r for r in removed0)  # pinned root kept

    for n in list_snapshots(IDX):
        delete_snapshot(IDX, n)
    with pytest.raises(FileNotFoundError):
        delete_snapshot(IDX, "pin")
    removed = purge(IDX)
    assert any(r.endswith(old_root) for r in removed)  # now purgeable
    assert not os.path.isdir(f"{IDX}/{old_root}")
    # live commit untouched: same results, its stats file still present
    assert _results(IDX) == base
    assert len(glob.glob(f"{IDX}/global_stats*.parquet")) >= 1
