"""TermRangeQuery with the IndexOrDocValues cost choice: both plans are
value-identical; the planner picks the postings union for narrow ranges and
the doc-values column scan for wide ones."""

import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.fixtures import write_transcripts
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search import Searcher
from lucene_solr_ray.search.query import QueryNode, parse_query

IDX = "/tmp/lsr_range_index"
SRC = "/tmp/lsr_range_corpus"


@pytest.fixture(scope="module")
def ctx(ray_session):
    paths = write_transcripts(SRC, 150, 4)
    shutil.rmtree(IDX, ignore_errors=True)
    build_index(paths, IDX, files_per_shard=2)
    full = pa.concat_tables(
        pq.read_table(p, columns=["conv_id", "turn_idx", "role", "tool"]) for p in sorted(paths)
    )
    full = full.take(
        pc.sort_indices(full, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    )
    s = Searcher(IDX, use_ray=False)
    yield s, full
    s.close()


def _truth(full, field, lo, hi):
    vals = np.asarray(full.column(field).to_pylist(), dtype=object)
    m = np.array([v is not None and lo <= v <= hi for v in vals])
    return np.flatnonzero(m).astype(np.int64)  # doc_id = row rank


def test_range_parse():
    n = parse_query("tool:[bash TO grep]")
    assert n.kind == "term_range" and n.pattern == "tool"
    assert n.terms == ["bash", "grep"]


def test_both_plans_identical_and_correct(ctx):
    s, full = ctx
    actor = s.actors[0]
    for field, lo, hi in [("tool", "a", "zzzz"), ("tool", "bash", "bash"), ("role", "a", "t")]:
        via_index = actor._range_docs_index(field, lo, hi)
        via_scan = actor._range_docs_scan(field, lo, hi)
        assert np.array_equal(via_index, via_scan), (field, lo, hi)
        assert np.array_equal(via_index, _truth(full, field, lo, hi)), (field, lo, hi)


def test_planner_picks_by_cost(ctx):
    s, _ = ctx
    actor = s.actors[0]
    # wide range (every role value): Σ df == n_docs → column scan
    actor._eval_term_range(QueryNode("term_range", pattern="role", terms=["a", "zzzz"]))
    assert actor.last_range_plan["plan"] == "docvalues"
    assert actor.last_range_plan["cost_index"] == actor.last_range_plan["n_docs"]
    # narrow range (single rare tool): postings union
    terms, dfs = actor._term_dict()
    tools = [(str(t), int(d)) for t, d in zip(terms, dfs) if str(t).startswith("tool:")]
    rare = min(tools, key=lambda p: p[1])[0].split(":", 1)[1]
    actor._eval_term_range(QueryNode("term_range", pattern="tool", terms=[rare, rare]))
    assert actor.last_range_plan["plan"] == "index"


def test_range_as_filter_clause(ctx):
    """term + range FILTER: result = scored hits ∩ range docs, exactly."""
    s, full = ctx
    checked_nonempty = False
    for term, lo, hi in [("output", "a", "zzzz"), ("output", "bash", "grep"), ("error", "bash", "grep")]:
        hits_all = dict(s.search(term, 10_000))
        rng = set(_truth(full, "tool", lo, hi).tolist())
        got = s.search(f"{term} #tool:[{lo} TO {hi}]", 10_000)
        want = [
            (d, sc) for d, sc in sorted(hits_all.items(), key=lambda p: (-p[1], p[0])) if d in rng
        ]
        assert got == want, (term, lo, hi)
        checked_nonempty = checked_nonempty or bool(got)
    assert checked_nonempty, "at least one combination must match"


def test_range_respects_tombstones(ctx):
    s, full = ctx
    s.clear_deletes()
    before = s.search("error #tool:[a TO zzzz]", 50)
    n = s.delete_by_query("error")
    assert n > 0
    assert s.search("error #tool:[a TO zzzz]", 50) == []
    s.clear_deletes()
    assert s.search("error #tool:[a TO zzzz]", 50) == before
