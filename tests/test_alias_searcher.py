"""Collection alias (SolrCloud Aliases routing): one query scattered to
every member collection, TopDocs merged by raw per-collection score —
Solr's alias contract (no cross-collection idf normalization)."""

import pytest

from lucene_solr_ray.fixtures import write_transcripts
from lucene_solr_ray.index import build_index
from lucene_solr_ray.search import Searcher
from lucene_solr_ray.search.searcher import AliasSearcher


@pytest.fixture(scope="module")
def two_collections(ray_session, tmp_path_factory):
    searchers = []
    for i, (n_conv, seed) in enumerate(((60, 7), (40, 11))):
        d = tmp_path_factory.mktemp(f"alias{i}")
        paths = write_transcripts(d / "corpus", n_conv, 2, seed=seed)
        build_index(paths, d / "idx", files_per_shard=1)
        searchers.append(Searcher(d / "idx"))
    alias = AliasSearcher(searchers, names=["conv_a", "conv_b"])
    yield alias, searchers
    alias.close()


def test_alias_merges_by_score(two_collections):
    alias, (s1, s2) = two_collections
    got = alias.search("tool output", 10)
    merged = [("conv_a", 0, d, s) for d, s in s1.search("tool output", 10)] + [
        ("conv_b", 1, d, s) for d, s in s2.search("tool output", 10)
    ]
    merged.sort(key=lambda h: (-h[3], h[1], h[2]))
    assert got == [(n, d, s) for n, _, d, s in merged[:10]]
    # both collections can surface in a merged page
    assert {n for n, _, _ in alias.search("assistant", 40)} == {"conv_a", "conv_b"}


def test_alias_count_sums(two_collections):
    alias, (s1, s2) = two_collections
    for q in ("tool", "assistant answer", "zzznotaterm"):
        assert alias.count(q) == s1.count(q) + s2.count(q)


def test_alias_validation():
    with pytest.raises(ValueError):
        AliasSearcher([])
    with pytest.raises(ValueError):
        AliasSearcher([object()], names=["a", "b"])
