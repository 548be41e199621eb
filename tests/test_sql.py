"""Parallel SQL handler tests: parser units + executor-vs-DuckDB duels on
ad-hoc statements over the sf0.001 tables (the /sql endpoint contract —
same statement, same answer)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from lucene_solr_ray.pipelines.sql import execute_sql, parse_sql, tokenize

SF = "/root/testdata/sf0.001"
TABLES = ["orders", "customer", "part", "supplier", "events", "lineitem", "nation", "region"]


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


def duel(sql: str, ray_sql: str | None = None):
    mine = canon(execute_sql(SF, ray_sql or sql))
    ref = canon(duck(sql))
    assert list(mine.columns) == list(ref.columns), (mine.columns, ref.columns)
    assert len(mine) == len(ref), (len(mine), len(ref))
    for c in mine.columns:
        a, b = mine[c].to_numpy(), ref[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            np.testing.assert_allclose(a.astype(float), b.astype(float), rtol=0, atol=0)
        else:
            assert (a == b).all(), (c, a[:5], b[:5])


# -- parser units -----------------------------------------------------------

def test_tokenizer_strings_and_ops():
    toks = tokenize("SELECT a FROM t WHERE b = 'it''s' AND c <> 1.5")
    assert ("str", "it's") in toks
    assert ("op", "<>") in toks


def test_parse_shapes():
    s = parse_sql(
        "SELECT a, COUNT(*) AS n, SUM(b) AS sb FROM t WHERE x > 3 AND y IN (1,2) "
        "GROUP BY a HAVING COUNT(*) > 1 ORDER BY n DESC, a LIMIT 7"
    )
    assert s.table == "t" and s.group_by == ["a"] and s.limit == 7
    assert [n for _, n in s.cols] == ["a", "n", "sb"]
    assert s.order_by == [("n", False), ("a", True)]
    assert s.having is not None


def test_parse_errors():
    for bad in ("SELECT", "SELECT a", "SELECT a FROM t WHERE", "FROM t", "SELECT a FROM t LIMIT x"):
        with pytest.raises((ValueError, IndexError)):
            parse_sql(bad)


# -- executor duels ---------------------------------------------------------

def test_scan_filters(ray_session):
    duel("SELECT o_orderkey, o_totalprice FROM orders "
         "WHERE o_orderstatus = 'F' AND o_totalprice > 150000 "
         "ORDER BY o_orderkey LIMIT 50")


def test_scan_not_in_like(ray_session):
    duel("SELECT c_custkey, c_mktsegment FROM customer "
         "WHERE c_mktsegment NOT IN ('BUILDING', 'MACHINERY') AND c_name LIKE 'Customer%' "
         "ORDER BY c_custkey LIMIT 30")


def test_scan_arithmetic_projection(ray_session):
    duel("SELECT l_orderkey, l_quantity * 2 + 1 AS q2, l_linenumber FROM lineitem "
         "WHERE l_quantity BETWEEN 10 AND 20 ORDER BY l_orderkey, l_linenumber LIMIT 40")


def test_groupby_aggregates(ray_session):
    duel("SELECT o_orderpriority, COUNT(*) AS n, MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx "
         "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority")


def test_groupby_sum_int_and_avg(ray_session):
    # SUM/AVG over an INTEGER column: exact on both sides
    duel("SELECT p_brand, CAST(SUM(p_size) AS BIGINT) AS ts, AVG(p_size) AS avg_size "
         "FROM part GROUP BY p_brand ORDER BY p_brand",
         ray_sql="SELECT p_brand, SUM(p_size) AS ts, AVG(p_size) AS avg_size "
                 "FROM part GROUP BY p_brand ORDER BY p_brand")


def test_global_aggregate_no_groupby(ray_session):
    duel("SELECT COUNT(*) AS n, MIN(s_acctbal) AS mn FROM supplier")


def test_having_filters_groups(ray_session):
    duel("SELECT o_orderstatus, COUNT(*) AS n FROM orders "
         "GROUP BY o_orderstatus HAVING COUNT(*) > 100 ORDER BY o_orderstatus")


def test_empty_result_group(ray_session):
    out = execute_sql(SF, "SELECT p_brand, COUNT(*) AS n FROM part WHERE p_size > 10000 GROUP BY p_brand")
    assert len(out) == 0 and list(out.columns) == ["p_brand", "n"]


def test_count_distinct_unsupported_vs_column_count(ray_session):
    duel("SELECT event_type, COUNT(value) AS nv FROM events GROUP BY event_type ORDER BY event_type")


def test_select_distinct_and_count_distinct(ray_session):
    # duel both new forms against DuckDB over sf0.001
    duel("SELECT DISTINCT o_orderstatus FROM orders ORDER BY o_orderstatus")
    duel(
        "SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders"
        " WHERE o_totalprice > 50000 ORDER BY o_orderpriority, o_orderstatus"
    )
    duel(
        "SELECT event_type, COUNT(DISTINCT user_id) AS u, COUNT(*) AS n"
        " FROM events GROUP BY event_type ORDER BY event_type"
    )
    # ungrouped COUNT(DISTINCT), mixed with nothing else
    duel("SELECT COUNT(DISTINCT user_id) AS u FROM events")
    # HAVING over the distinct count
    duel(
        "SELECT event_type, COUNT(DISTINCT user_id) AS u FROM events"
        " GROUP BY event_type HAVING COUNT(DISTINCT user_id) > 1 ORDER BY event_type"
    )
    with pytest.raises(ValueError):
        execute_sql(SF, "SELECT SUM(DISTINCT value) FROM events")


def test_sql_join(ray_session):
    duel(
        "SELECT c_name, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey"
        " WHERE c_acctbal > 9000 ORDER BY c_name LIMIT 20"
    )
    # two chained joins: customer → nation → region
    duel(
        "SELECT r_name, COUNT(*) AS n FROM customer"
        " JOIN nation ON c_nationkey = n_nationkey"
        " JOIN region ON n_regionkey = r_regionkey"
        " GROUP BY r_name ORDER BY r_name"
    )
    # key side written reversed still resolves by schema
    duel(
        "SELECT n_name, COUNT(*) AS n FROM customer JOIN nation ON n_nationkey = c_nationkey"
        " GROUP BY n_name ORDER BY n DESC, n_name LIMIT 5"
    )
    with pytest.raises(ValueError):
        execute_sql(SF, "SELECT 1 AS x FROM customer JOIN nation ON c_custkey = c_acctbal")


def test_fuzz_random_statements(ray_session):
    """Seeded random SELECT generator dueled against DuckDB — scans with
    random predicate trees, projections with arithmetic, and grouped
    aggregates with HAVING/ORDER/LIMIT (the planner paths users actually
    combine)."""
    import random

    rng = random.Random(1234)
    num_cols = ["o_totalprice", "o_orderkey", "o_custkey"]
    cat_col = "o_orderpriority"
    cats = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

    def pred():
        r = rng.random()
        if r < 0.3:
            return f"{rng.choice(num_cols)} {rng.choice(['>', '<', '>=', '<='])} {rng.randint(1, 200000)}"
        if r < 0.5:
            return f"{cat_col} = '{rng.choice(cats)}'"
        if r < 0.65:
            pick = rng.sample(cats, rng.randint(1, 3))
            return f"{cat_col} IN ({', '.join(repr(c) for c in pick)})"
        if r < 0.8:
            lo = rng.randint(0, 1000)
            return f"o_custkey BETWEEN {lo} AND {lo + rng.randint(10, 500)}"
        return f"NOT {cat_col} = '{rng.choice(cats)}'"

    def where():
        parts = [pred() for _ in range(rng.randint(1, 3))]
        return (" " + rng.choice(["AND", "OR"]) + " ").join(parts)

    for trial in range(25):
        if rng.random() < 0.5:
            # scan shape; projections exercise CASE and scalar functions
            proj = "o_totalprice * 2 AS tp2"
            r = rng.random()
            if r < 0.35:
                c1, c2 = rng.sample(cats, 2)
                proj = (
                    f"CASE WHEN {cat_col} = '{c1}' THEN 1 "
                    f"WHEN {cat_col} = '{c2}' THEN 2 ELSE 0 END AS cw"
                )
            elif r < 0.6:
                proj = rng.choice(
                    [
                        f"upper(substr({cat_col}, 1, 4)) AS u4",
                        f"length({cat_col}) AS ln4",
                        "round(o_totalprice, 1) AS rp",
                        f"abs(o_custkey - {rng.randint(0, 1000)}) AS ak",
                        f"concat(o_orderstatus, '#', {cat_col}) AS cc",
                    ]
                )
            sql = (
                f"SELECT o_orderkey, {cat_col}, {proj} FROM orders "
                f"WHERE {where()} ORDER BY o_orderkey LIMIT {rng.randint(5, 60)}"
            )
        else:
            aggs = rng.sample(
                [
                    "COUNT(*) AS n",
                    "MIN(o_totalprice) AS mn",
                    "MAX(o_totalprice) AS mx",
                    "SUM(o_orderkey) AS sk",
                    "SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS so",
                    "round(SUM(o_custkey) / 9, 2) AS rs",
                ],
                rng.randint(1, 3),
            )
            having = " HAVING COUNT(*) > 2" if rng.random() < 0.4 else ""
            sql = (
                f"SELECT {cat_col}, {', '.join(aggs)} FROM orders "
                f"WHERE {where()} GROUP BY {cat_col}{having} ORDER BY {cat_col}"
            )
        try:
            duel(sql)
        except AssertionError as e:
            raise AssertionError(f"trial {trial}: {sql}") from e


def test_limit_offset(ray_session):
    """LIMIT n OFFSET m: the page slices after the global order — per-batch
    top-k partials must keep limit+offset rows."""
    for q in [
        "SELECT c_custkey, c_acctbal FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 5 OFFSET 7",
        "SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 3 OFFSET 0",
        "SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment ORDER BY n DESC, c_mktsegment LIMIT 2 OFFSET 1",
    ]:
        got = execute_sql(SF, q).reset_index(drop=True)
        exp = duck(q)
        assert got.columns.tolist() == exp.columns.tolist(), q
        for c in got.columns:
            assert got[c].tolist() == exp[c].tolist(), (q, c)


def test_case_when(ray_session):
    """CASE expressions (searched + simple), standalone, in WHERE, and
    inside aggregates — same statement through DuckDB."""
    duel(
        "SELECT o_orderkey, CASE WHEN o_totalprice > 100000 THEN 'big' "
        "WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS bucket "
        "FROM orders ORDER BY o_orderkey LIMIT 50"
    )
    duel(
        "SELECT o_orderpriority, SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS n_open "
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"
    )
    # simple form: CASE base WHEN v THEN ...
    duel(
        "SELECT o_orderkey, CASE o_orderstatus WHEN 'O' THEN 1 WHEN 'F' THEN 2 ELSE 0 END AS st "
        "FROM orders ORDER BY o_orderkey LIMIT 50"
    )
    # CASE in WHERE
    duel(
        "SELECT o_orderkey FROM orders "
        "WHERE CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END > 100000 "
        "ORDER BY o_orderkey LIMIT 30"
    )


def test_case_parse_errors():
    with pytest.raises(ValueError):
        parse_sql("SELECT CASE END FROM t")
    with pytest.raises(ValueError):
        parse_sql("SELECT CASE WHEN a THEN END FROM t")


def test_union_all(ray_session):
    duel(
        "SELECT c_custkey AS k, c_acctbal AS v FROM customer WHERE c_acctbal > 9500"
        " UNION ALL SELECT o_orderkey AS k, o_totalprice AS v FROM orders WHERE o_totalprice < 2000"
        " ORDER BY k, v LIMIT 40"
    )
    # grouped branches
    duel(
        "SELECT o_orderstatus AS g, COUNT(*) AS n FROM orders GROUP BY o_orderstatus"
        " UNION ALL SELECT c_mktsegment AS g, COUNT(*) AS n FROM customer GROUP BY c_mktsegment"
        " ORDER BY g"
    )
    with pytest.raises(ValueError):
        parse_sql("SELECT a FROM t ORDER BY a UNION ALL SELECT a FROM u")
    with pytest.raises(ValueError):
        execute_sql(SF, "SELECT c_custkey FROM customer UNION ALL SELECT o_orderkey AS x, 1 AS y FROM orders")


def test_scalar_functions(ray_session):
    duel(
        "SELECT upper(o_orderstatus) AS u, lower(o_orderpriority) AS l, "
        "length(o_orderpriority) AS n, abs(o_custkey - 700) AS a, "
        "round(o_totalprice, 1) AS r1, round(o_totalprice, 0) AS r0, "
        "substr(o_orderpriority, 3, 4) AS s, concat(o_orderstatus, '/', o_orderpriority) AS t "
        "FROM orders WHERE length(o_orderstatus) = 1 AND o_orderkey < 200"
    )
    # scalar over aggregates + in WHERE + in HAVING argument position
    duel(
        "SELECT o_orderstatus, round(sum(o_custkey) / 3, 2) AS q, "
        "concat('g:', o_orderstatus) AS tag FROM orders "
        "WHERE substr(o_orderpriority, 1, 1) IN ('1', '2', '5') "
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"
    )
    # coalesce passthrough on non-null data + nested calls
    duel(
        "SELECT coalesce(o_orderstatus, 'x') AS c, upper(substr(lower(o_orderpriority), 1, 2)) AS u2 "
        "FROM orders WHERE o_orderkey < 50"
    )


def test_scalar_function_errors():
    with pytest.raises(ValueError):
        parse_sql("SELECT nosuchfn(o_orderkey) FROM orders")


def test_group_by_expression(ray_session):
    duel(
        "SELECT substr(o_orderpriority, 1, 1) AS pri, COUNT(*) AS n,"
        " CAST(SUM(o_custkey) AS BIGINT) AS sk FROM orders"
        " GROUP BY substr(o_orderpriority, 1, 1) ORDER BY pri",
        "SELECT substr(o_orderpriority, 1, 1) AS pri, COUNT(*) AS n,"
        " SUM(o_custkey) AS sk FROM orders"
        " GROUP BY substr(o_orderpriority, 1, 1) ORDER BY pri",
    )
    # CASE group key + WHERE + HAVING referencing the same expression
    case = "CASE WHEN o_totalprice > 150000 THEN 'hi' ELSE 'lo' END"
    duel(
        f"SELECT {case} AS band, COUNT(*) AS n FROM orders"
        f" WHERE o_orderstatus != 'X' GROUP BY {case} HAVING COUNT(*) > 0 ORDER BY band"
    )


def test_group_by_expression_count_distinct(ray_session):
    duel(
        "SELECT length(o_orderpriority) AS plen,"
        " CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS ds FROM orders"
        " GROUP BY length(o_orderpriority) ORDER BY plen",
        "SELECT length(o_orderpriority) AS plen,"
        " COUNT(DISTINCT o_orderstatus) AS ds FROM orders"
        " GROUP BY length(o_orderpriority) ORDER BY plen",
    )


def test_left_join_and_having_alias(ray_session):
    duel(
        "SELECT c_mktsegment, COUNT(*) AS n_rows, COUNT(o_orderkey) AS n_orders"
        " FROM customer LEFT JOIN orders ON o_custkey = c_custkey"
        " GROUP BY c_mktsegment ORDER BY c_mktsegment"
    )
    # HAVING referencing an output alias (DuckDB extension, both engines)
    duel(
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders"
        " GROUP BY o_orderstatus HAVING n > 5 ORDER BY o_orderstatus"
    )


def test_in_subquery(ray_session):
    duel(
        "SELECT o_orderkey, o_custkey FROM orders"
        " WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)"
        " ORDER BY o_orderkey LIMIT 30"
    )
    duel(
        "SELECT c_custkey, c_mktsegment FROM customer"
        " WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"
        " ORDER BY c_custkey LIMIT 30"
    )


def test_group_expr_in_having_predicates(ray_session):
    # group expression inside LIKE / IN predicates in HAVING (review fix)
    duel(
        "SELECT substr(p_type, 1, 5) AS t5, COUNT(*) AS n FROM part"
        " GROUP BY substr(p_type, 1, 5)"
        " HAVING substr(p_type, 1, 5) LIKE 'PRO%' ORDER BY t5"
    )
    duel(
        "SELECT substr(o_orderpriority, 1, 1) AS pri, COUNT(*) AS n FROM orders"
        " GROUP BY substr(o_orderpriority, 1, 1)"
        " HAVING substr(o_orderpriority, 1, 1) IN ('1', '3') ORDER BY pri"
    )


def test_multi_column_join(ray_session):
    # two-key equi-join: lineitem rows back to orders on key + a derived
    # match of linestatus/orderstatus (both 'O'/'F'-coded in TPC-H)
    duel(
        "SELECT l_orderkey, l_linenumber, o_totalprice FROM lineitem"
        " JOIN orders ON l_orderkey = o_orderkey AND l_linestatus = o_orderstatus"
        " ORDER BY l_orderkey, l_linenumber LIMIT 40"
    )
    duel(
        "SELECT c_mktsegment, COUNT(*) AS n FROM customer"
        " LEFT JOIN orders ON o_custkey = c_custkey"
        " GROUP BY c_mktsegment ORDER BY c_mktsegment"
    )


def test_fuzz_joins_and_subqueries(ray_session):
    """Seeded fuzz over the NEW planner paths: LEFT/INNER joins (single
    and multi-column), IN/NOT IN subqueries, and GROUP BY expressions —
    every statement dueled against DuckDB verbatim."""
    import random

    rng = random.Random(777)
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    for trial in range(20):
        r = rng.random()
        if r < 0.3:
            how = rng.choice(["JOIN", "LEFT JOIN", "LEFT OUTER JOIN"])
            agg = rng.choice(["COUNT(*) AS n", "COUNT(o_orderkey) AS n", "MIN(o_totalprice) AS mn"])
            sql = (
                f"SELECT c_mktsegment, {agg} FROM customer"
                f" {how} orders ON o_custkey = c_custkey"
                f" WHERE c_acctbal > {rng.randint(-500, 5000)}"
                f" GROUP BY c_mktsegment ORDER BY c_mktsegment"
            )
        elif r < 0.5:
            sql = (
                "SELECT l_orderkey, l_linenumber FROM lineitem"
                " JOIN orders ON l_orderkey = o_orderkey AND l_linestatus = o_orderstatus"
                f" WHERE l_quantity > {rng.randint(1, 40)}"
                f" ORDER BY l_orderkey, l_linenumber LIMIT {rng.randint(5, 50)}"
            )
        elif r < 0.75:
            neg = rng.choice(["", "NOT "])
            sql = (
                "SELECT o_orderkey, o_custkey FROM orders"
                f" WHERE o_custkey {neg}IN (SELECT c_custkey FROM customer"
                f" WHERE c_mktsegment = '{rng.choice(segs)}')"
                f" ORDER BY o_orderkey LIMIT {rng.randint(10, 60)}"
            )
        else:
            n = rng.randint(1, 4)
            sql = (
                f"SELECT substr(o_orderpriority, 1, {n}) AS gk, COUNT(*) AS n"
                f" FROM orders GROUP BY substr(o_orderpriority, 1, {n})"
                + (" HAVING COUNT(*) > 1" if rng.random() < 0.5 else "")
                + " ORDER BY gk"
            )
        try:
            duel(sql)
        except AssertionError as e:
            raise AssertionError(f"trial {trial}: {sql}") from e
