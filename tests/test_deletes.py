"""Delete-by-query (live-docs tombstones): deletes mask reads, stats stay
until rebuild — Lucene deleted-docs semantics."""

import shutil

import pytest

from lucene_solr_ray.fixtures import write_transcripts
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.oracle import BruteForceIndex
from lucene_solr_ray.search import Searcher

IDX = "/tmp/lsr_del_index"
SRC = "/tmp/lsr_del_corpus"


@pytest.fixture(scope="module")
def searcher_and_oracle(ray_session):
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    paths = write_transcripts(SRC, 80, 3)
    shutil.rmtree(IDX, ignore_errors=True)
    build_index(paths, IDX, files_per_shard=3)
    full = pa.concat_tables(
        pq.read_table(p, columns=["conv_id", "turn_idx", "text", "role", "tool"]) for p in sorted(paths)
    )
    full = full.take(pc.sort_indices(full, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]))
    oracle = BruteForceIndex(
        full.column("text").to_pylist(),
        fields={"role": full.column("role").to_pylist(), "tool": full.column("tool").to_pylist()},
    )
    s = Searcher(IDX)
    yield s, oracle
    s.close()


def test_delete_by_query_masks_results(searcher_and_oracle):
    s, oracle = searcher_and_oracle
    s.clear_deletes()
    before = s.search("error", 10)
    n = s.delete_by_query("#role:tool")
    assert n > 0
    deleted = {d for d, _ in oracle.search_node(
        __import__("lucene_solr_ray.search.query", fromlist=["QueryNode"]).QueryNode(
            "bool", clauses=[("FILTER", __import__("lucene_solr_ray.search.query", fromlist=["QueryNode"]).QueryNode("term", terms=["role:tool"]))]
        ), 10**9)}
    # engine results exclude deleted docs and equal oracle-minus-deleted
    for q in ["error", "assistant ok", '"tool output"', "bash"]:
        got = s.search(q, 10)
        assert not ({d for d, _ in got} & deleted)
        exp = [(d, float(sc)) for d, sc in oracle.search(q, 10 + len(deleted)) if d not in deleted][:10]
        assert got == exp, q
    # idempotent: deleting again adds nothing
    assert s.delete_by_query("#role:tool") == 0
    # stats unchanged (df/N untouched until rebuild — Lucene semantics)
    assert s.stats.N == oracle.N
    s.clear_deletes()
    assert s.search("error", 10) == before


def test_per_shard_tombstones_and_large_fraction(searcher_and_oracle):
    """Large-fraction delete: tombstones persist per shard, queries stay
    exact WITHOUT over-fetch, a reopened searcher sees the same deletes."""
    from pathlib import Path

    from lucene_solr_ray.search.query import QueryNode

    s, oracle = searcher_and_oracle
    s.clear_deletes()
    # delete a large fraction of the corpus (every role:user turn)
    n = s.delete_by_query("#role:user")
    assert n > 0
    tdir = Path(IDX) / "tombstones"
    files = sorted(tdir.glob("shard=*.parquet"))
    assert files, "per-shard tombstone files must exist"
    deleted = {
        d
        for d, _ in oracle.search_node(
            QueryNode("bool", clauses=[("FILTER", QueryNode("term", terms=["role:user"]))]),
            10**9,
        )
    }
    assert n == len(deleted)
    for q in ["error", "assistant ok", '"tool output"', "merge"]:
        got = s.search(q, 10)
        assert not ({d for d, _ in got} & deleted)
        exp = [(d, float(sc)) for d, sc in oracle.search(q, 10 + len(deleted)) if d not in deleted][:10]
        assert got == exp, q
    # every read path masks: match-all style paths and explain
    dead_doc = next(iter(deleted))
    assert s.explain("error assistant", dead_doc) is None or dead_doc not in deleted
    div = s.search_diversified("error", 10)
    assert not ({d for d, _ in div} & deleted)
    # a fresh searcher over the same index picks up the persisted tombstones
    s2 = Searcher(IDX, use_ray=False)
    try:
        assert s2.search("error", 10) == s.search("error", 10)
    finally:
        s2.close()
    s.clear_deletes()


def test_explain_none_for_deleted_doc(searcher_and_oracle):
    s, oracle = searcher_and_oracle
    s.clear_deletes()
    hits = s.search("error", 1)
    if not hits:
        return
    doc = hits[0][0]
    assert s.explain("error", doc) is not None
    # delete everything matching "error" — the doc is gone from explain too
    s.delete_by_query("error")
    assert doc in set(s._tombstones)
    assert s.explain("error", doc) is None
    s.clear_deletes()
    assert s.explain("error", doc) is not None
