"""Time-routed alias (TimeRoutedAlias + RoutedAliasUpdateProcessor):
write-time window routing, query-time member pruning, alias-contract
merge equality."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.fixtures import write_transcripts
from lucene_solr_ray.index.tra import DAY_US, TimeRoutedAliasSearcher, build_time_routed

INTERVAL = 6 * DAY_US  # fixture ts spans ~17 days → 3 member windows


@pytest.fixture(scope="module")
def tra(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("tra")
    paths = write_transcripts(d / "corpus", 400, 4)
    alias = build_time_routed(paths, d / "alias", interval_us=INTERVAL, files_per_shard=8)
    s = TimeRoutedAliasSearcher(d / "alias")
    yield alias, s, d
    s.close()


def test_routing_places_every_row_in_its_window(tra):
    alias, _, d = tra
    total = 0
    for name, m in alias["members"].items():
        for p in sorted((d / "alias" / "inputs" / name).glob("*.parquet")):
            us = pc.cast(pq.read_table(p).column("ts"), pa.int64()).to_numpy()
            assert (us >= m["start_us"]).all() and (us < m["end_us"]).all()
            total += us.size
    src = sum(pq.read_metadata(p).num_rows for p in (d / "corpus").glob("part-*.parquet"))
    assert total == src  # no row lost or duplicated
    assert len(alias["members"]) >= 3


def test_window_pruned_fanout_and_member_equality(tra):
    alias, s, _ = tra
    first = sorted(alias["members"])[0]
    m = alias["members"][first]
    got = s.search("tool output", 10, ts_lo=m["start_us"], ts_hi=m["end_us"] - 1)
    assert s.last_members == [first]  # fan-out pruned to ONE member
    direct = s.searchers[first].search("tool output", 10)
    assert got == [(first, d, sc) for d, sc in direct]


def test_unbounded_search_merges_all_members(tra):
    alias, s, _ = tra
    got = s.search("tool output", 10)
    assert s.last_members == sorted(alias["members"])
    merged = []
    for ci, n in enumerate(sorted(alias["members"])):
        merged += [(n, ci, d, sc) for d, sc in s.searchers[n].search("tool output", 10)]
    merged.sort(key=lambda h: (-h[3], h[1], h[2]))
    assert got == [(n, d, sc) for n, _, d, sc in merged[:10]]
    # count sums member counts; a half-open range selects two members
    n_all = s.count("tool output")
    assert n_all == sum(s.searchers[n].count("tool output") for n in sorted(alias["members"]))
    names = sorted(alias["members"])
    lo = alias["members"][names[1]]["start_us"]
    s.count("tool output", ts_lo=lo)
    assert s.last_members == names[1:]
