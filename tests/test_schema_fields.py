"""Second ANALYZED field via schema config (IndexSchema multi-field
pattern): `field:token` terms with positions and per-field norms/avgdl,
duel-identical to the brute-force oracle."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import build_index
from lucene_solr_ray.oracle import BruteForceIndex
from lucene_solr_ray.search import Searcher
from lucene_solr_ray.search.query import QueryNode

TEXTS = [
    "merge the sorted runs quickly",
    "scan every row in the table",
    "merge sort beats bubble sort",
    "read the tool output carefully",
    "runs complete without error",
]
TOOLS = [
    "bash run script",
    "python exec runner",
    None,
    "bash profile run",
    "sql query runner",
]


@pytest.fixture(scope="module")
def schema_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("schema_idx")
    t = pa.table(
        {
            "conv_id": pa.array([f"c{i:03d}" for i in range(len(TEXTS))]),
            "turn_idx": pa.array(np.zeros(len(TEXTS), dtype=np.int32)),
            "role": pa.array(["user"] * len(TEXTS)),
            "text": pa.array(TEXTS),
            "tool": pa.array(TOOLS, type=pa.string()),
        }
    )
    corpus = root / "corpus.parquet"
    pq.write_table(t, corpus)
    build_index(
        [str(corpus)],
        root / "idx",
        files_per_shard=1,
        analyzed_fields=("tool",),
        resume=False,
    )
    s = Searcher(root / "idx")
    yield s
    s.close()


@pytest.fixture(scope="module")
def schema_oracle():
    return BruteForceIndex(TEXTS, fields={"role": ["user"] * len(TEXTS)}, analyzed_fields={"tool": TOOLS})


def test_field_stats_recorded(schema_index):
    fs = schema_index.manifest["stats"]["fields"]
    assert "tool" in fs and fs["tool"]["sum_ttf"] == sum(len(t.split()) for t in TOOLS if t)


def test_analyzed_field_term_duel(schema_index, schema_oracle):
    for q in ["tool:bash", "tool:run", "tool:runner", "tool:bash merge", "+tool:bash runs"]:
        got = schema_index.search(q, 10)
        exp = [(d, float(s)) for d, s in schema_oracle.search(q, 10)]
        assert got == exp, q


def test_field_norms_differ_from_text(schema_index, schema_oracle):
    """`tool:run` must score with the tool field's (short) norms — docs 0
    and 3 both contain bash+run; their scores reflect tool dl, not text dl."""
    got = dict(schema_index.search("tool:run", 10))
    assert set(got) == {0, 3}
    # same tool-field length → identical scores despite different text dl
    assert got[0] == got[3]


def test_analyzed_field_phrase_duel(schema_index, schema_oracle):
    node = QueryNode("phrase", terms=["tool:bash", "tool:run"])
    got = schema_index.search_node(node, 10)
    exp = [(d, float(s)) for d, s in schema_oracle.search_node(node, 10)]
    assert got == exp
    assert {d for d, _ in got} == {0}  # "bash run …" adjacent only in doc 0


def test_keyword_field_still_works(schema_index, schema_oracle):
    got = schema_index.search("merge #role:user", 10)
    exp = [(d, float(s)) for d, s in schema_oracle.search("merge #role:user", 10)]
    assert got == exp


def test_all_build_options_compose(ray_session, tmp_path):
    """analyzed_fields + custom token_filter + FOR codec in ONE build:
    the options must compose (field norms, synonym paths, PFOR decode)."""
    from lucene_solr_ray.analysis.graph import as_token_filter, synonym_graph_filter

    t = pa.table(
        {
            "conv_id": pa.array([f"c{i:03d}" for i in range(len(TEXTS))]),
            "turn_idx": pa.array(np.zeros(len(TEXTS), dtype=np.int32)),
            "role": pa.array(["user"] * len(TEXTS)),
            "text": pa.array(TEXTS),
            "tool": pa.array(TOOLS, type=pa.string()),
        }
    )
    corpus = tmp_path / "c.parquet"
    pq.write_table(t, corpus)
    flt = as_token_filter(synonym_graph_filter({("merge", "sort"): [("mergesort",)]}))
    build_index(
        [str(corpus)],
        tmp_path / "idx",
        files_per_shard=1,
        analyzed_fields=("tool",),
        token_filter=flt,
        analyzer_id="combo",
        codec="for",
        resume=False,
    )
    s = Searcher(tmp_path / "idx")
    try:
        assert {d for d, _ in s.search("mergesort", 10)} == {2}  # via synonym
        assert {d for d, _ in s.search("tool:bash", 10)} == {0, 3}  # field norms
        assert {d for d, _ in s.search('"merge sort"', 10)} == {2}  # positions thru PFOR
        assert s.search("zzz", 10) == []
    finally:
        s.close()
