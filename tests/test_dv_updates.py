"""In-place numeric doc-values updates (lucene/core IndexWriter.update
NumericDocValue; Solr in-place atomic updates): sidecar overlay + live
cache patch — sort/function/stats/fl views update, scoring norms don't."""

import numpy as np
import pytest

from lucene_solr_ray.search import Searcher
from tests.test_build_search import INDEX_DIR, corpus, index, oracle, searcher  # noqa: F401


def test_dv_update_views_and_persistence(ray_session, index, corpus, tmp_path):
    import shutil

    idx = str(tmp_path / "idx")
    shutil.copytree(INDEX_DIR, idx)
    s = Searcher(idx)
    try:
        hits = s.search("tool output", 5)
        docs = [d for d, _ in hits]
        before = s.select("tool output", 5, fl=["turn_idx"])
        # push every winner's turn_idx to a large sentinel
        patched = s.update_numeric_docvalues("turn_idx", {d: 900 + i for i, d in enumerate(docs)})
        assert patched == len(docs)
        after = s.select("tool output", 5, fl=["turn_idx"])
        assert after["turn_idx"].tolist() == [900 + i for i in range(len(docs))]
        assert before["turn_idx"].tolist() != after["turn_idx"].tolist()
        # sort view sees the update: the winners now have the LARGEST turn_idx
        top = s.search_sorted("tool output", "turn_idx desc", len(docs))
        assert sorted(d for d, _ in top) == sorted(docs)
        # stats view
        st = s.stats_field("tool output", "turn_idx")
        assert st["max"] == 900 + len(docs) - 1
        # scores (norms) unchanged by a dv update
        assert s.search("tool output", 5) == hits
        # second update overwrites (last-write-wins)
        s.update_numeric_docvalues("turn_idx", {docs[0]: 5000})
        assert s.stats_field("tool output", "turn_idx")["max"] == 5000
        with pytest.raises(KeyError):
            s.update_numeric_docvalues("role", {docs[0]: 1})  # keyword dv: not in-place-updatable
    finally:
        s.close()
    # persistence: a FRESH Searcher (cold caches) reads the sidecars
    s2 = Searcher(idx)
    try:
        assert s2.stats_field("tool output", "turn_idx")["max"] == 5000
        t = s2.search_sorted("tool output", "turn_idx desc", 1)
        assert t[0][1] == 5000.0
    finally:
        s2.close()


def test_dv_updates_survive_compaction(ray_session, tmp_path):
    """Compaction rewrites postings shards only — the per-pid dv_updates
    sidecars (and therefore every dv view) survive a generation flip.
    NOTE: sidecars are commit-INDEPENDENT (a snapshot restore keeps newer
    dv updates) — documented divergence from Lucene's per-commit dv-update
    files."""
    from lucene_solr_ray.fixtures import write_transcripts
    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.index.compact import compact_index

    paths = write_transcripts(str(tmp_path / "corpus"), 120, 6)
    idx = str(tmp_path / "idx")
    build_index(paths, idx, files_per_shard=1)  # 6 shards → compactable
    s = Searcher(idx)
    try:
        docs = [d for d, _ in s.search("assistant", 3)]
        s.update_numeric_docvalues("turn_idx", {d: 700 + i for i, d in enumerate(docs)})
        before = s.search_sorted("assistant", "turn_idx desc", 3)
    finally:
        s.close()
    compact_index(idx, max_shards=2)
    s2 = Searcher(idx)
    try:
        assert s2.search_sorted("assistant", "turn_idx desc", 3) == before
        assert s2.stats_field("assistant", "turn_idx")["max"] == 700 + len(docs) - 1
    finally:
        s2.close()
