"""Streaming-expression language tests: parser units + stream-vs-DuckDB
duels over the sf0.001 tables (StreamExpressionParser / StreamFactory
contract — same expression, same tuples)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from lucene_solr_ray.pipelines.streams import (
    Expr,
    StreamExprError,
    parse_expr,
    register_stream,
    run_expr,
)

SF = "/root/testdata/sf0.001"
TABLES = [
    "orders",
    "customer",
    "events",
    "documents",
    "embeddings",
    "nation",
    "region",
    "lineitem",
]


def duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).df()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def duel(expr: str, sql: str, ordered: bool = False):
    mine = run_expr(expr, SF)
    ref = duck(sql)
    if ordered:
        a, b = mine.reset_index(drop=True), ref.reset_index(drop=True)
        a = a[sorted(a.columns)]
        b = b[sorted(b.columns)]
    else:
        a, b = canon(mine), canon(ref)
    assert list(a.columns) == list(b.columns), (a.columns, b.columns)
    assert len(a) == len(b), (len(a), len(b))
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert np.array_equal(av.astype("f8"), bv.astype("f8"), equal_nan=True), c
        else:
            assert (av.astype(str) == bv.astype(str)).all() if av.dtype == object else (
                av == bv
            ).all(), c
    return mine


# --------------------------------------------------------------------------
# Parser units


def test_parse_nested_and_params():
    e = parse_expr(
        'rollup(search(documents, q="lang:en", fl="a,b", sort="a asc"), over="a", sum(b), count(*))'
    )
    assert e.name == "rollup"
    inner = e.args[0]
    assert isinstance(inner, Expr) and inner.name == "search"
    assert inner.args == ["documents"]
    assert inner.params["q"] == "lang:en"
    assert e.params["over"] == "a"
    metrics = [a for a in e.args[1:]]
    assert [m.name for m in metrics] == ["sum", "count"]
    assert metrics[1].args == ["*"]


def test_parse_quoted_escape_and_bare():
    e = parse_expr('f(a, "x \\" y", n=3, g(h=i))')
    assert e.args[0] == "a"
    assert e.args[1] == 'x " y'
    assert e.params["n"] == "3"
    assert isinstance(e.args[2], Expr) and e.args[2].params["h"] == "i"


def test_parse_errors():
    for bad in ["", "f(", "f(a,,b)", 'f("unterminated)', "f(a) trailing", "f(a=)"]:
        with pytest.raises(StreamExprError):
            parse_expr(bad)


def test_unknown_stream_and_fields():
    with pytest.raises(StreamExprError):
        run_expr("notAStream(documents)", SF)
    with pytest.raises(StreamExprError):
        run_expr('search(documents, q="nope:1", fl="doc_id")', SF)
    with pytest.raises(StreamExprError):
        run_expr('search(documents, fl="nope")', SF)


# --------------------------------------------------------------------------
# Stream duels (ray_session ensures single shared Ray)


def test_search_q_range_and_in(ray_session):
    duel(
        'search(orders, q="o_totalprice:[1000 TO 5000] AND o_orderstatus:(F OR P)",'
        ' fl="o_orderkey,o_totalprice,o_orderstatus")',
        "SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders "
        "WHERE o_totalprice BETWEEN 1000 AND 5000 AND o_orderstatus IN ('F','P')",
    )


def test_search_rows_bounded(ray_session):
    out = run_expr(
        'search(events, q="*:*", fl="event_id,value", sort="event_id asc", rows=7)', SF
    )
    ref = duck("SELECT event_id, value FROM events ORDER BY event_id LIMIT 7")
    assert out["event_id"].tolist() == ref["event_id"].tolist()


def test_select_rename(ray_session):
    duel(
        'select(search(customer, q="c_mktsegment:BUILDING", fl="c_custkey,c_acctbal"),'
        ' "c_custkey as id, c_acctbal as bal")',
        "SELECT c_custkey AS id, c_acctbal AS bal FROM customer WHERE c_mktsegment='BUILDING'",
    )


def test_unique_first_per_key(ray_session):
    # first tuple per key under the declared sort = arg-min of sort tuple
    out = run_expr(
        'unique(search(events, q="*:*", fl="event_type,event_id,value",'
        ' sort="event_type asc, event_id asc"), over="event_type")',
        SF,
    )
    ref = duck(
        "SELECT event_type, MIN(event_id) AS event_id FROM events GROUP BY event_type"
    )
    got = out.set_index("event_type")["event_id"].to_dict()
    want = ref.set_index("event_type")["event_id"].to_dict()
    assert got == want


def test_unique_requires_sort(ray_session):
    with pytest.raises(StreamExprError):
        run_expr('unique(search(events, fl="event_id"), over="event_id")', SF)


def test_merge_union(ray_session):
    duel(
        'merge(search(orders, q="o_orderstatus:F", fl="o_orderkey"),'
        ' search(orders, q="o_orderstatus:P", fl="o_orderkey"), on="o_orderkey asc")',
        "SELECT o_orderkey FROM orders WHERE o_orderstatus IN ('F','P')",
    )


def test_left_outer_join(ray_session):
    out = run_expr(
        'leftOuterJoin(search(nation, fl="n_nationkey,n_regionkey,n_name"),'
        ' search(region, q="r_regionkey:[0 TO 2]", fl="r_regionkey,r_name"),'
        ' on="n_regionkey=r_regionkey")',
        SF,
    )
    ref = duck(
        "SELECT n_nationkey, n_regionkey, n_name, r.r_regionkey, r.r_name FROM nation "
        "LEFT JOIN (SELECT * FROM region WHERE r_regionkey BETWEEN 0 AND 2) r "
        "ON n_regionkey = r.r_regionkey"
    )
    a, b = canon(out), canon(ref)
    assert len(a) == len(b)
    assert a["n_nationkey"].tolist() == b["n_nationkey"].tolist()
    # unmatched rows carry nulls on the right side
    assert a["r_name"].isna().sum() == b["r_name"].isna().sum() or (
        a["r_name"].astype(str) == b["r_name"].astype(str)
    ).all()


def test_hash_join_same_as_inner(ray_session):
    expr_i = (
        'innerJoin(search(nation, fl="n_nationkey,n_regionkey"),'
        ' search(region, fl="r_regionkey,r_name"), on="n_regionkey=r_regionkey")'
    )
    expr_h = (
        'hashJoin(search(nation, fl="n_nationkey,n_regionkey"),'
        ' hashed=search(region, fl="r_regionkey,r_name"), on="n_regionkey=r_regionkey")'
    )
    a = canon(run_expr(expr_i, SF))
    b = canon(run_expr(expr_h, SF))
    pd.testing.assert_frame_equal(a, b)


def test_intersect_complement(ray_session):
    duel(
        'intersect(search(customer, fl="c_custkey,c_name"),'
        ' search(orders, q="o_orderstatus:F", fl="o_custkey"), on="c_custkey=o_custkey")',
        "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN "
        "(SELECT o_custkey FROM orders WHERE o_orderstatus='F')",
    )
    duel(
        'complement(search(customer, fl="c_custkey,c_name"),'
        ' search(orders, q="o_totalprice:[400000 TO *]", fl="o_custkey"),'
        ' on="c_custkey=o_custkey")',
        "SELECT c_custkey, c_name FROM customer WHERE c_custkey NOT IN "
        "(SELECT o_custkey FROM orders WHERE o_totalprice >= 400000)",
    )


def test_stats_global(ray_session):
    duel(
        'stats(orders, q="o_orderstatus:F", count(*), min(o_orderkey), max(o_orderkey))',
        'SELECT CAST(COUNT(*) AS BIGINT) AS "count(*)", MIN(o_orderkey) AS "min(o_orderkey)",'
        ' MAX(o_orderkey) AS "max(o_orderkey)" FROM orders WHERE o_orderstatus=\'F\'',
    )


def test_having_and_or(ray_session):
    duel(
        'having(facet(events, buckets="event_type", bucketSorts="count(*) desc",'
        " count(*)), and(gt(count(*), 0), not(eq(event_type, click))))",
        'SELECT event_type, CAST(COUNT(*) AS BIGINT) AS "count(*)" FROM events '
        "GROUP BY event_type HAVING COUNT(*) > 0 AND event_type <> 'click'",
    )


def test_fetch_enrichment(ray_session):
    # top 5 orders by price, then fetch customer names via pruned pushdown read
    out = run_expr(
        'fetch(customer, top(n=5, search(orders, fl="o_orderkey,o_custkey,o_totalprice"),'
        ' sort="o_totalprice desc, o_orderkey asc"), on="o_custkey=c_custkey", fl="c_name")',
        SF,
    )
    ref = duck(
        "SELECT o_orderkey, o_custkey, o_totalprice, c_custkey, c_name FROM "
        "(SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 5) o "
        "JOIN customer ON o_custkey = c_custkey"
    )
    assert sorted(out["o_orderkey"]) == sorted(ref["o_orderkey"])
    assert out.set_index("o_orderkey")["c_name"].to_dict() == ref.set_index("o_orderkey")[
        "c_name"
    ].to_dict()


def test_cartesian_product_explodes_list(ray_session):
    out = run_expr(
        'cartesianProduct(top(n=3, search(embeddings, fl="vec_id,embedding"),'
        ' sort="vec_id asc"), embedding)',
        SF,
    )
    ref = duck(
        "SELECT vec_id, UNNEST(embedding) AS embedding FROM "
        "(SELECT * FROM embeddings ORDER BY vec_id LIMIT 3)"
    )
    assert len(out) == len(ref)
    a = out.sort_values(["vec_id", "embedding"]).reset_index(drop=True)
    b = ref.sort_values(["vec_id", "embedding"]).reset_index(drop=True)
    assert np.array_equal(
        a["embedding"].astype("f4").to_numpy(), b["embedding"].astype("f4").to_numpy()
    )


def test_parallel_is_identity(ray_session):
    a = canon(run_expr('search(region, fl="r_regionkey,r_name")', SF))
    b = canon(
        run_expr('parallel(4, search(region, fl="r_regionkey,r_name"), workers=4)', SF)
    )
    pd.testing.assert_frame_equal(a, b)


def test_register_stream_extension(ray_session):
    from lucene_solr_ray.pipelines.streams import REGISTRY_STREAMS, SRes

    def _const(ctx, e):
        return SRes(df=pd.DataFrame({"x": [1, 2, 3]}))

    register_stream("constStream", _const)
    try:
        out = run_expr("constStream()", SF)
        assert out["x"].tolist() == [1, 2, 3]
    finally:
        REGISTRY_STREAMS.pop("constStream", None)


def test_sort_stream(ray_session):
    out = run_expr(
        'sort(search(nation, fl="n_nationkey,n_name"), by="n_nationkey desc")', SF
    )
    ref = duck("SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey DESC")
    assert out["n_nationkey"].tolist() == ref["n_nationkey"].tolist()


def test_timeseries_daily(ray_session):
    duel(
        'timeseries(events, q="event_type:purchase", field="ts", gap="+1DAY", count(*))',
        "SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS ts,"
        ' CAST(COUNT(*) AS BIGINT) AS "count(*)" FROM events'
        " WHERE event_type = 'purchase' GROUP BY 1",
    )


def test_let_get_binding(ray_session):
    out = run_expr(
        'let(a=search(region, fl="r_regionkey,r_name"),'
        ' top(n=2, get(a), sort="r_regionkey asc"))',
        SF,
    )
    ref = duck("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey LIMIT 2")
    assert out["r_regionkey"].tolist() == ref["r_regionkey"].tolist()
    with pytest.raises(StreamExprError):
        run_expr('let(a=search(region, fl="r_name"), top(n=1, get(b), sort="r_name asc"))', SF)


def test_search_qt_select_index_backed(ray_session):
    # CloudSolrStream leaf over the real BM25 engine + two-phase fetch
    from lucene_solr_ray.pipelines.fulltext import _searcher

    out = run_expr('search(documents, q="text:spark join", qt="/select", rows=5)', SF)
    with _searcher(SF) as s:
        hits = s.search("spark join", 5)
        fetched = {r["doc_id"]: r["conv_id"] for r in s.fetch([d for d, _ in hits]).to_pylist()}
    want_ids = [int(fetched[d].split("-")[1]) for d, _ in hits]
    assert out["doc_id"].tolist() == want_ids
    assert np.array_equal(
        out["score"].to_numpy(), np.array([sc for _, sc in hits], dtype="float32")
    )
    enriched = run_expr(
        'fetch(documents, search(documents, q="text:spark join", qt="/select", rows=5),'
        ' on="doc_id=doc_id", fl="lang,n_chars")',
        SF,
    )
    assert enriched["doc_id"].tolist() == want_ids
    assert "lang" in enriched.columns and "n_chars" in enriched.columns


def test_update_sink_roundtrip(ray_session, tmp_path):
    import shutil

    dest = "/tmp/lsr_stream_update_test"
    shutil.rmtree(dest, ignore_errors=True)
    out = run_expr(
        f'update({dest}, commit(search(region, fl="r_regionkey,r_name")))', SF
    )
    assert out["batchIndexed"].iloc[0] == 5
    back = duck(f"SELECT * FROM '{dest}/*.parquet' ORDER BY r_regionkey")
    assert back["r_regionkey"].tolist() == [0, 1, 2, 3, 4]
    with pytest.raises(StreamExprError):
        run_expr('update(/etc/nope, search(region, fl="r_name"))', SF)
    shutil.rmtree(dest, ignore_errors=True)


def test_significant_terms_generic(ray_session):
    duel(
        'significantTerms(documents, q="lang:en", field="text", limit=10, minDocFreq=10)',
        f"""
        SELECT token, fg_df, bg_df FROM (
          SELECT token,
                 CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS fg_df,
                 CAST(COUNT(*) AS BIGINT) AS bg_df
          FROM (
            SELECT doc_id, lang, unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9_]+'))) AS token
            FROM documents
          ) GROUP BY token
        ) WHERE bg_df >= 10
        ORDER BY fg_df / CAST(bg_df AS DOUBLE) DESC, token LIMIT 10
        """,
    )


def test_knn_search_expr(ray_session):
    out = run_expr("knnSearch(embeddings, id=0, k=5)", SF)
    ref = duck(
        """
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id FROM (
          SELECT vec_id, list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)) AS sim
          FROM embeddings
        ) ORDER BY sim DESC, vec_id LIMIT 5
        """
    )
    assert out["vec_id"].tolist() == ref["vec_id"].tolist()
    assert out["rank"].tolist() == [1, 2, 3, 4, 5]


def test_intersect_multikey(ray_session):
    duel(
        'intersect(search(events, fl="event_id,user_id,event_type"),'
        ' search(events, q="value:[4.0 TO *]", fl="user_id,event_type"),'
        ' on="user_id,event_type")',
        "SELECT event_id, user_id, event_type FROM events e WHERE EXISTS ("
        "SELECT 1 FROM events f WHERE f.value >= 4.0 AND f.user_id = e.user_id"
        " AND f.event_type = e.event_type)",
    )


def test_drill_unbounded_rollup(ray_session):
    duel(
        'drill(events, q="event_type:click", fl="user_id,event_id",'
        ' rollup(input(), over="user_id", count(*), sum(event_id), avg(event_id)))',
        'SELECT user_id, CAST(COUNT(*) AS BIGINT) AS "count(*)",'
        ' CAST(SUM(event_id) AS BIGINT) AS "sum(event_id)",'
        ' CAST(CAST(SUM(event_id) AS BIGINT) AS DOUBLE)/CAST(COUNT(*) AS BIGINT) AS "avg(event_id)"'
        " FROM events WHERE event_type = 'click' GROUP BY user_id",
    )


def test_echo_tuple_list(ray_session):
    assert run_expr('echo(hello world)', SF)["echo"].iloc[0] == "hello world"
    t = run_expr(
        'tuple(n=stats(orders, count(*)), name=fixed)', SF
    )
    assert t["name"].iloc[0] == "fixed"
    assert int(t["n"].iloc[0]) > 0
    lst = run_expr(
        'list(search(region, fl="r_regionkey"), search(region, fl="r_regionkey"))', SF
    )
    assert len(lst) == 10


def test_features_train_classify_streams(ray_session):
    from lucene_solr_ray.pipelines.ml import classify_docs, features_igain, logit_train

    f = run_expr('features(documents, q="text:spark", numTerms=8)', SF)
    pd.testing.assert_frame_equal(f, features_igain(SF))
    f4 = run_expr('features(documents, q="text:merge", numTerms=4, minDocFreq=3)', SF)
    assert len(f4) == 4
    t = run_expr('train(documents, q="text:spark")', SF)
    pd.testing.assert_frame_equal(t, logit_train(SF))
    c = run_expr('classify(documents, q="text:spark")', SF)
    pd.testing.assert_frame_equal(c, classify_docs(SF))
    with pytest.raises(StreamExprError):
        run_expr('features(documents, q="lang:en")', SF)


def test_nodes_scorenodes_streams(ray_session):
    from lucene_solr_ray.pipelines.graph import score_nodes
    from lucene_solr_ray.pipelines.streams import STREAM_EXPR_NODES_SQL, stream_expr_nodes

    duel(
        'nodes(lineitem, nodes(lineitem, walk="1->l_partkey", gather="l_orderkey"),'
        ' walk="node->l_orderkey", gather="l_partkey", count(*))',
        STREAM_EXPR_NODES_SQL,
    )
    # literal multi-root hop, no count metric → node column only
    roots = run_expr('nodes(lineitem, walk="1,2->l_partkey", gather="l_orderkey")', SF)
    ref = duck(
        "SELECT DISTINCT l_orderkey AS node FROM lineitem WHERE l_partkey IN (1,2) ORDER BY node"
    )
    assert roots["node"].tolist() == ref["node"].tolist()
    # scoreNodes over the gathered hop == the gated score_nodes pipeline
    sn = run_expr(
        'scoreNodes(nodes(lineitem, nodes(lineitem, walk="1->l_partkey", gather="l_orderkey"),'
        ' walk="node->l_orderkey", gather="l_partkey", count(*)))',
        SF,
    )
    pd.testing.assert_frame_equal(sn, score_nodes(SF))
    assert stream_expr_nodes(SF)["count(*)"].sum() > 0


def test_shortest_path_stream(ray_session):
    from lucene_solr_ray.pipelines.graph import shortest_path_nodes

    dist = shortest_path_nodes(SF, src=1, max_depth=2)
    two_hop = dist[dist["dist"] == 2]
    assert len(two_hop), "fixture should have a distance-2 part"
    dst = int(two_hop["node"].iloc[0])
    path = run_expr(f'shortestPath(lineitem, from="1", to="{dst}", maxDepth=4)', SF)
    assert path["node"].iloc[0] == 1 and path["node"].iloc[-1] == dst
    assert len(path) == 3  # dist 2 → 3 nodes on the path
    assert path["step"].tolist() == [0, 1, 2]
    # consecutive path nodes must share an order (a real edge)
    li = duck("SELECT l_orderkey, l_partkey FROM lineitem")
    by_part = li.groupby("l_partkey")["l_orderkey"].apply(set)
    for a, b in zip(path["node"], path["node"][1:]):
        assert by_part[a] & by_part[b], (a, b)
    missing = run_expr('shortestPath(lineitem, from="1", to="-99", maxDepth=2)', SF)
    assert len(missing) == 0


def test_random_analyze_null_reduce_streams(ray_session):
    from lucene_solr_ray.pipelines.streams import _random_sql, stream_expr_random

    duel(
        'random(events, q="event_type:click", fl="event_id,user_id", rows=15,'
        ' idField="event_id")',
        _random_sql(),
    )
    r = stream_expr_random(SF)
    assert list(r.columns) == ["event_id", "user_id"] and len(r) == 15
    # determinism across runs
    pd.testing.assert_frame_equal(r, stream_expr_random(SF))

    a = run_expr('analyze("The Quick saw-tooth FOX")', SF)
    assert a["term"].tolist() == ["quick", "saw", "tooth", "fox"]
    assert a["position"].tolist() == [1, 2, 3, 4]  # stopword gap at 0

    n = run_expr('null(search(region, fl="r_regionkey"))', SF)
    assert n["nullCount"].tolist() == [5]

    red = run_expr(
        'reduce(search(events, fl="event_type,event_id,value"), by="event_type",'
        ' group(sort="value desc, event_id asc", n=2))',
        SF,
    )
    ref = duck(
        """SELECT event_type, event_id, value FROM events
           QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) <= 2
           ORDER BY event_type, value DESC, event_id"""
    )
    # Dataset-path reduce returns bucket-ordered blocks; compare sorted
    red = red.sort_values(
        ["event_type", "value", "event_id"], ascending=[True, False, True]
    )
    pd.testing.assert_frame_equal(
        red.reset_index(drop=True), ref.reset_index(drop=True), check_dtype=False
    )

    pl = run_expr('plist(search(region, fl="r_regionkey"), search(nation, fl="n_nationkey"))', SF)
    assert len(pl) == 30


def test_facet2d_stream(ray_session):
    from lucene_solr_ray.pipelines.streams import STREAM_EXPR_FACET2D_SQL

    out = duel(
        'facet2D(customer, q="*:*", x="c_mktsegment", y="c_nationkey",'
        ' dimensions="3,2", count(*))',
        STREAM_EXPR_FACET2D_SQL,
    )
    assert out["c_mktsegment"].nunique() == 3
    assert (out.groupby("c_mktsegment").size() <= 2).all()
    with pytest.raises(StreamExprError):
        run_expr('facet2D(customer, x="c_mktsegment", y="c_nationkey")', SF)


def test_topic_stream_checkpointed(ray_session, tmp_path):
    import shutil

    import pyarrow.parquet as pq

    sf_tmp = str(tmp_path / "sf")
    ckpt = "/tmp/topic_ckpt_test"
    shutil.rmtree(ckpt, ignore_errors=True)
    import os

    os.makedirs(sf_tmp)
    shutil.copy(f"{SF}/events.parquet", f"{sf_tmp}/events.parquet")
    expr = f'topic({ckpt}, events, fl="event_id,event_type", id="event_id", initialCheckpoint=0)'
    first = run_expr(expr, sf_tmp)
    n_all = len(duck("SELECT * FROM events"))
    assert len(first) == n_all  # initialCheckpoint=0 → full replay
    second = run_expr(expr, sf_tmp)
    assert len(second) == 0  # caught up
    # new rows appended → only the delta comes back
    t = pq.read_table(f"{SF}/events.parquet")
    maxid = int(t["event_id"].to_pandas().max())
    delta = t.slice(0, 7).to_pandas()
    delta["event_id"] = np.arange(maxid + 1, maxid + 8, dtype="int64")
    pq.write_table(
        __import__("pyarrow").Table.from_pandas(delta, preserve_index=False),
        f"{sf_tmp}/events2.parquet",
    )
    # single-file collection: rewrite events.parquet with the union
    full = pd.concat([t.to_pandas(), delta], ignore_index=True)
    pq.write_table(
        __import__("pyarrow").Table.from_pandas(full, preserve_index=False),
        f"{sf_tmp}/events.parquet",
    )
    third = run_expr(expr, sf_tmp)
    assert sorted(third["event_id"]) == list(range(maxid + 1, maxid + 8))
    # default (no initialCheckpoint): new topic starts at NOW → empty
    shutil.rmtree(ckpt)
    expr_now = f'topic({ckpt}, events, fl="event_id", id="event_id")'
    assert len(run_expr(expr_now, sf_tmp)) == 0
    shutil.rmtree(ckpt, ignore_errors=True)


def test_executor_stream(ray_session):
    out = run_expr(
        'executor(list(tuple(expr_s="echo(alpha)"),'
        ' tuple(expr_s="search(region, fl=\\"r_regionkey\\")")))',
        SF,
    )
    assert len(out) == 6  # 1 echo row + 5 regions
    with pytest.raises(StreamExprError):
        run_expr('executor(search(region, fl="r_regionkey"))', SF)


def test_priority_delete_knn_streams(ray_session, tmp_path):
    import os

    # priority: high stream non-empty wins; empty high falls through
    hi = run_expr(
        'priority(search(region, fl="r_regionkey"), search(nation, fl="n_nationkey"))', SF
    )
    assert list(hi.columns) == ["r_regionkey"] and len(hi) == 5
    lo = run_expr(
        'priority(search(region, q="r_regionkey:[90 TO 99]", fl="r_regionkey"),'
        ' search(nation, fl="n_nationkey"))',
        SF,
    )
    assert list(lo.columns) == ["n_nationkey"] and len(lo) == 25

    # delete: update sink → delete-by-id → re-read shows survivors only
    dest = "/tmp/streams_delete_test"
    import shutil

    shutil.rmtree(dest, ignore_errors=True)
    run_expr(f'update({dest}, search(region, fl="r_regionkey,r_name"))', SF)
    out = run_expr(
        f'delete({dest}, search(region, q="r_regionkey:[0 TO 1]", fl="r_regionkey"),'
        ' id="r_regionkey")',
        SF,
    )
    assert out["totalDeleted"].tolist() == [2]
    import duckdb as _d

    left = _d.sql(f"SELECT r_regionkey FROM '{dest}/*.parquet' ORDER BY 1").df()
    assert left["r_regionkey"].tolist() == [2, 3, 4]
    shutil.rmtree(dest, ignore_errors=True)

    # knn: MLT stream == Searcher.more_like_this
    from lucene_solr_ray.pipelines.fulltext import _searcher

    got = run_expr('knn(documents, id="3", k=5, maxQueryTerms=8)', SF)
    with _searcher(SF) as s:
        want = s.more_like_this(3, k=5, max_query_terms=8)
    assert got["doc_id"].tolist() == [d for d, _ in want]
    assert np.allclose(got["score"].to_numpy(), np.array([sc for _, sc in want], "f4"))


def test_fuzz_rollup_expressions(ray_session):
    """Seeded random rollup(search(...)) expressions vs GENERATED SQL:
    random source table/filter, over-field, aggregate set — the
    StreamFactory planner holds for arbitrary combinations."""
    import random

    rng = random.Random(777)
    shapes = [
        ("events", "user_id,event_id,event_type,value",
         [("event_type", ["click", "view", "purchase", "error"])],
         "user_id", ["count(*)", "sum(event_id)", "min(event_id)", "max(event_id)"]),
        ("orders", "o_orderkey,o_custkey,o_orderpriority,o_orderstatus",
         [("o_orderstatus", ["O", "F", "P"])],
         "o_orderpriority", ["count(*)", "sum(o_orderkey)", "min(o_custkey)", "max(o_custkey)"]),
    ]
    for trial in range(14):
        table, fl, filters, over, aggpool = rng.choice(shapes)
        fcol, fvals = filters[0]
        fval = rng.choice(fvals)
        aggs = rng.sample(aggpool, rng.randint(1, 3))
        expr = (
            f'rollup(search({table}, q="{fcol}:{fval}", fl="{fl}", '
            f'sort="{over} asc"), over="{over}", {", ".join(aggs)})'
        )
        sels = [over]
        for a in aggs:
            if a == "count(*)":
                sels.append('CAST(COUNT(*) AS BIGINT) AS "count(*)"')
            else:
                fn = a.split("(")[0]
                col = a[len(fn) + 1 : -1]
                sels.append(f'CAST({fn.upper()}({col}) AS BIGINT) AS "{a}"')
        sql = (
            f"SELECT {', '.join(sels)} FROM {table} "
            f"WHERE {fcol} = '{fval}' GROUP BY {over}"
        )
        try:
            duel(expr, sql)
        except AssertionError as e:
            raise AssertionError(f"trial {trial}: {expr}") from e


def test_topic_stream_no_statistics_and_empty(ray_session, tmp_path):
    """A collection whose writer omitted column statistics falls back to a
    column scan for the watermark (not a TypeError); a zero-row file is a
    clean empty poll."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_tmp = str(tmp_path / "sf")
    os.makedirs(sf_tmp)
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "event_type"])
    pq.write_table(t, f"{sf_tmp}/events.parquet", write_statistics=False)
    ckpt = str(tmp_path / "ckpt")
    os.makedirs("/tmp/topic_nostat", exist_ok=True)
    shutil.rmtree("/tmp/topic_nostat", ignore_errors=True)
    expr = f'topic(/tmp/topic_nostat, events, fl="event_id", id="event_id", initialCheckpoint=0)'
    out = run_expr(expr, sf_tmp)
    assert len(out) == t.num_rows  # full replay despite missing stats
    assert len(run_expr(expr, sf_tmp)) == 0  # caught up

    # empty collection: poll returns nothing, watermark survives
    pq.write_table(t.slice(0, 0), f"{sf_tmp}/events.parquet", write_statistics=False)
    assert len(run_expr(expr, sf_tmp)) == 0
    shutil.rmtree("/tmp/topic_nostat", ignore_errors=True)


def test_topic_checkpoint_persists_after_read(ray_session, tmp_path, monkeypatch):
    """At-least-once: a failed increment read leaves the watermark
    untouched, so the next poll re-emits the rows instead of losing them
    (the r3 at-most-once bug committed the checkpoint before execution)."""
    import os
    import shutil

    import ray.data

    sf_tmp = str(tmp_path / "sf")
    os.makedirs(sf_tmp)
    shutil.copy(f"{SF}/events.parquet", f"{sf_tmp}/events.parquet")
    shutil.rmtree("/tmp/topic_alo", ignore_errors=True)
    expr = 'topic(/tmp/topic_alo, events, fl="event_id", id="event_id", initialCheckpoint=0)'

    real_mat = ray.data.Dataset.materialize

    def failing_mat(self, *a, **kw):
        raise RuntimeError("simulated read failure")

    monkeypatch.setattr(ray.data.Dataset, "materialize", failing_mat)
    with pytest.raises(RuntimeError, match="simulated read failure"):
        run_expr(expr, sf_tmp)
    monkeypatch.setattr(ray.data.Dataset, "materialize", real_mat)

    out = run_expr(expr, sf_tmp)  # watermark did NOT advance: full replay
    n_all = len(duck("SELECT * FROM events"))
    assert len(out) == n_all
    assert len(run_expr(expr, sf_tmp)) == 0
    shutil.rmtree("/tmp/topic_alo", ignore_errors=True)


def test_daemon_stream(ray_session, tmp_path):
    """daemon() wraps update(topic(...)) — the alerting/ingest loop: with
    terminate=true it drains the topic (first run ships the replay, the
    next yields 0 tuples and stops)."""
    import os
    import shutil

    import pyarrow.parquet as pq

    sf_tmp = str(tmp_path / "sf")
    os.makedirs(sf_tmp)
    shutil.copy(f"{SF}/events.parquet", f"{sf_tmp}/events.parquet")
    shutil.rmtree("/tmp/daemon_ckpt", ignore_errors=True)
    shutil.rmtree("/tmp/daemon_dest", ignore_errors=True)
    out = run_expr(
        'daemon(id="alerts", iterations="5", terminate="true",'
        ' update(/tmp/daemon_dest,'
        '  topic(/tmp/daemon_ckpt, events, fl="event_id", id="event_id", initialCheckpoint=0)))',
        sf_tmp,
    )
    assert out["id"].iloc[0] == "alerts" and out["state"].iloc[0] == "TERMINATED"
    # run 1 ships all rows, run 2 sees the drained topic (update emits a
    # batch-count summary tuple, so termination happens on the empty THIRD
    # poll at the latest) — bounded well under the iteration cap
    assert 2 <= int(out["iterations"].iloc[0]) <= 3
    n_all = len(duck("SELECT * FROM events"))
    got = sum(
        pq.read_table(f"/tmp/daemon_dest/{f}").num_rows
        for f in os.listdir("/tmp/daemon_dest")
    )
    assert got >= n_all  # every event delivered (replay lands in the dest)
    with pytest.raises(StreamExprError):
        run_expr('daemon(id="x", iterations="0", echo(hi))', sf_tmp)
    shutil.rmtree("/tmp/daemon_ckpt", ignore_errors=True)
    shutil.rmtree("/tmp/daemon_dest", ignore_errors=True)


def test_shuffle_stream(ray_session):
    """shuffle() = search pinned to /export: full sorted stream, sort
    mandatory, rows rejected."""
    out = run_expr('shuffle(region, fl="r_regionkey,r_name", sort="r_regionkey asc")', SF)
    exp = duck("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")
    assert out["r_regionkey"].tolist() == exp["r_regionkey"].tolist()
    assert len(out) == len(exp)  # FULL stream, not a page
    with pytest.raises(StreamExprError, match="sort"):
        run_expr('shuffle(region, fl="r_name")', SF)
    with pytest.raises(StreamExprError, match="rows"):
        run_expr('shuffle(region, fl="r_name", sort="r_name asc", rows="2")', SF)


def test_select_evaluator_operations(ray_session):
    """Select operations (`add(a,b) as c` — Solr stream evaluators inside
    select): computed columns through the ValueSource kernel registry."""
    duel(
        'select(search(customer, q="c_mktsegment:BUILDING", fl="c_custkey,c_acctbal"),'
        ' "c_custkey as id", add(c_acctbal, 10) as bal10, mul(c_custkey, 2) as dbl)',
        "SELECT c_custkey AS id, c_acctbal + 10 AS bal10, c_custkey * 2 AS dbl"
        " FROM customer WHERE c_mktsegment='BUILDING'",
    )
    # nested + conditional evaluators
    duel(
        'select(search(events, q="*:*", fl="event_id,value"),'
        ' "event_id", if(gt(value, 50), value, 0) as big)',
        "SELECT event_id, CASE WHEN value > 50 THEN value ELSE 0 END AS big FROM events",
    )


def test_select_operation_requires_alias(ray_session):
    with pytest.raises(StreamExprError):
        run_expr('select(search(events, fl="event_id,value"), add(value, 1))', SF)


def test_parse_as_alias_shape():
    e = parse_expr("select(echo(x), a, add(a,b) as c)")
    named = [a for a in e.args if isinstance(a, Expr) and a.name == "as"]
    assert len(named) == 1 and named[0].args[1] == "c"
    assert named[0].args[0].name == "add"


def test_sql_stream(ray_session):
    """sql(collection, stmt=...) — the stream-backed /sql handler."""
    stmt = (
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders "
        "WHERE o_totalprice > 100000 GROUP BY o_orderstatus ORDER BY o_orderstatus"
    )
    got = run_expr(f'sql(orders, stmt="{stmt}")', SF).reset_index(drop=True)
    ref = duck(stmt)
    assert list(got["o_orderstatus"]) == list(ref["o_orderstatus"])
    assert [int(x) for x in got["n"]] == [int(x) for x in ref["n"]]
    with pytest.raises(StreamExprError):
        run_expr("sql(orders)", SF)


# --------------------------------------------------------------------------
# round-4c additions: cell / col / eval / model


def test_cell_wraps_tuples(ray_session):
    out = run_expr('cell(rows, search(region, fl="r_regionkey,r_name"))', SF)
    assert list(out.columns) == ["rows"]
    recs = out.iloc[0]["rows"]
    ref = duck("SELECT r_regionkey, r_name FROM region")
    assert len(recs) == len(ref)
    assert {r["r_name"] for r in recs} == set(ref["r_name"])


def test_col_extracts_array_from_let_binding(ray_session):
    out = run_expr(
        'let(a=sort(search(region, fl="r_regionkey"), by="r_regionkey asc"),'
        " col(a, r_regionkey))",
        SF,
    )
    ref = duck("SELECT r_regionkey FROM region ORDER BY r_regionkey")
    assert out.iloc[0]["r_regionkey"] == ref["r_regionkey"].tolist()


def test_col_inline_stream_and_errors(ray_session):
    out = run_expr('col(search(region, fl="r_name"), r_name)', SF)
    assert sorted(out.iloc[0]["r_name"]) == sorted(duck("SELECT r_name FROM region")["r_name"])
    with pytest.raises(StreamExprError):
        run_expr('col(search(region, fl="r_name"), nope)', SF)
    with pytest.raises(StreamExprError):
        run_expr("col(onlyonearg)", SF)


def test_eval_runs_expr_s(ray_session):
    out = run_expr('eval(tuple(expr_s="search(region, fl=\\"r_regionkey,r_name\\")"))', SF)
    ref = duck("SELECT r_regionkey, r_name FROM region")
    assert sorted(out["r_name"]) == sorted(ref["r_name"])
    with pytest.raises(StreamExprError):
        run_expr("eval(tuple(other=1))", SF)


def test_model_fetches_newest_by_id(ray_session, tmp_path):
    import shutil

    dest = "/tmp/lsr_test_models"
    shutil.rmtree(dest, ignore_errors=True)
    run_expr(f'update({dest}, tuple(name_s=m1, iteration_i=1, w=0.5))', SF)
    run_expr(f'update({dest}, tuple(name_s=m1, iteration_i=2, w=0.9))', SF)
    run_expr(f'update({dest}, tuple(name_s=m2, iteration_i=1, w=0.1))', SF)
    out = run_expr(f"model({dest}, id=m1)", SF)
    assert len(out) == 1
    assert str(out.iloc[0]["iteration_i"]) == "2" and float(out.iloc[0]["w"]) == 0.9
    with pytest.raises(StreamExprError):
        run_expr(f"model({dest}, id=missing)", SF)


def test_zplot_and_array(ray_session):
    """ZplotStream: named arrays pair positionally; scalars broadcast;
    table= explodes a matrix; let/col bindings feed it like the reference."""
    z = run_expr("zplot(x=array(1, 2, 3), y=array(10, 20, 30), tag=s)", SF)
    assert z["x"].tolist() == [1, 2, 3] and z["y"].tolist() == [10, 20, 30]
    assert z["tag"].tolist() == ["s", "s", "s"]
    # col() over a let binding as the array source
    z2 = run_expr(
        'let(a=sort(search(region, fl="r_regionkey"), by="r_regionkey asc"),'
        " zplot(k=col(a, r_regionkey)))",
        SF,
    )
    assert z2["k"].tolist() == [0, 1, 2, 3, 4]
    # table= matrix → col0..colN (array-of-arrays isn't parseable inline,
    # so drive the constructor with a pre-evaluated matrix cell)
    import pytest as _pytest

    from lucene_solr_ray.pipelines.streams import Ctx, Expr, SRes, StreamExprError, _zplot

    matrix_cell = Expr("get", args=["m"])
    from lucene_solr_ray.pipelines import streams as _st

    _st.REGISTRY_STREAMS["get"] = lambda c, e: SRes(
        df=pd.DataFrame([{"m": [[1, 2], [3, 4], [5, 6]]}])
    )
    try:
        zt = _zplot(Ctx(SF), Expr("zplot", params={"table": matrix_cell}))
        assert zt.df.columns.tolist() == ["col0", "col1"]
        assert zt.df["col1"].tolist() == [2, 4, 6]
        with _pytest.raises(StreamExprError):  # table= composes alone
            _zplot(Ctx(SF), Expr("zplot", params={"table": matrix_cell, "x": "1"}))
    finally:
        _st.REGISTRY_STREAMS.pop("get", None)

    with _pytest.raises(StreamExprError):
        run_expr("zplot(x=array(1, 2), y=array(1, 2, 3))", SF)
    with _pytest.raises(StreamExprError):
        run_expr("zplot()", SF)


def test_array_rejects_nested_expressions(ray_session):
    """r5 review: array() members must be literals — a nested call must
    raise, not silently vanish (which would shift zplot's pairing)."""
    with pytest.raises(StreamExprError):
        run_expr("zplot(x=array(1, add(1,2), 3), y=array(10, 20, 30))", SF)


def test_zplot_table_scalar_cell_raises(ray_session):
    """r5 review: a scalar single cell fed to table= raises the stream
    error, not a raw TypeError; a vector cell still explodes row-wise."""
    ok = run_expr("zplot(table=array(1, 2, 3))", SF)
    assert ok["col0"].tolist() == [1, 2, 3]
    # genuinely scalar single cell: tuple() produces one scalar cell
    with pytest.raises(StreamExprError):
        run_expr("zplot(table=tuple(v=1))", SF)


def test_cat_stream_reads_files_in_order(ray_session, tmp_path):
    (tmp_path / "a.txt").write_text("alpha\nbeta\n")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "b.txt").write_text("gamma\n")
    df = run_expr('cat("a.txt,sub/b.txt")', str(tmp_path))
    assert list(df.columns) == ["file", "line"]
    assert df["line"].tolist() == ["alpha", "beta", "gamma"]
    assert df["file"].tolist() == ["a.txt", "a.txt", "sub/b.txt"]
    # maxLines bounds the TOTAL emitted lines
    df2 = run_expr('cat("a.txt,sub/b.txt", maxLines=2)', str(tmp_path))
    assert df2["line"].tolist() == ["alpha", "beta"]


def test_cat_stream_rejects_escapes_and_missing(ray_session, tmp_path):
    (tmp_path / "a.txt").write_text("x\n")
    with pytest.raises(StreamExprError):
        run_expr('cat("../outside.txt")', str(tmp_path))
    with pytest.raises(StreamExprError):
        run_expr('cat("nope.txt")', str(tmp_path))
    with pytest.raises(StreamExprError):
        run_expr('cat("")', str(tmp_path))
