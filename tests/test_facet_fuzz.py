"""JSON-facet fuzz duel: random two-level terms-facet specs (metrics, per
level sort direction/field, limits) against a PROGRAMMATICALLY generated
DuckDB window twin — the FacetModule semantics hold for arbitrary spec
combinations, not just the hand-picked gate shapes."""

import random

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

_VAR_SQL = (
    "(CAST(SUM(cents*cents) AS BIGINT)"
    " - (CAST(CAST(SUM(cents) AS BIGINT) AS HUGEINT) * CAST(SUM(cents) AS BIGINT))"
    " / CAST(COUNT(*) AS BIGINT)) / CAST(COUNT(*) AS BIGINT)"
)

METRICS = {
    "s": ("sum", "SUM(cents)"),
    "mn": ("min", "MIN(cents)"),
    "mx": ("max", "MAX(cents)"),
    "vr": ("variance", _VAR_SQL),
}
_INT_METRICS = ("s", "mn", "mx")  # vr stays DOUBLE


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM read_parquet('{SF}/customer.parquet')")
    return con


def _mk_spec(rng: random.Random):
    """→ (engine spec, list of metric keys per level, sort tuples)."""
    lv = []
    for i, (field, cnt_key) in enumerate([("c_mktsegment", "n1"), ("c_nationkey", "n2")]):
        mkeys = rng.sample(list(METRICS), rng.randint(0, 2))
        mkeys_named = [f"{k}{i}" for k in mkeys]
        sort_opts = ["count desc"] + [f"{m} desc" for m in mkeys_named] + [f"{m} asc" for m in mkeys_named]
        sort = rng.choice(sort_opts)
        limit = rng.randint(1, 4)
        lv.append(
            {
                "field": field,
                "count_key": cnt_key,
                "mkeys": list(zip(mkeys_named, mkeys)),
                "sort": sort,
                "limit": limit,
            }
        )
    spec = {
        "type": "terms",
        "field": lv[0]["field"],
        "key": lv[0]["field"],
        "count_key": lv[0]["count_key"],
        "sort": lv[0]["sort"],
        "limit": lv[0]["limit"],
        "facet": {
            name: {"type": METRICS[base][0], "field": "c_acctbal", "money": True}
            for name, base in lv[0]["mkeys"]
        },
    }
    spec["facet"]["sub"] = {
        "type": "terms",
        "field": lv[1]["field"],
        "key": lv[1]["field"],
        "count_key": lv[1]["count_key"],
        "sort": lv[1]["sort"],
        "limit": lv[1]["limit"],
        "facet": {
            name: {"type": METRICS[base][0], "field": "c_acctbal", "money": True}
            for name, base in lv[1]["mkeys"]
        },
    }
    return spec, lv


def _twin_sql(lv) -> str:
    def aggsel(level):
        parts = [f"CAST(COUNT(*) AS BIGINT) AS {level['count_key']}"]
        for name, base in level["mkeys"]:
            cast = "DOUBLE" if base == "vr" else "BIGINT"
            parts.append(f"CAST({METRICS[base][1]} AS {cast}) AS {name}")
        return ", ".join(parts)

    def orderby(level):
        m, d = level["sort"].split()
        col = level["count_key"] if m == "count" else m
        return f"{col} {d.upper()}, {level['field']}"

    cols1 = [lv[0]["field"], lv[0]["count_key"]] + [n for n, _ in lv[0]["mkeys"]]
    cols2 = [lv[1]["field"], lv[1]["count_key"]] + [n for n, _ in lv[1]["mkeys"]]
    return f"""
WITH base AS (
  SELECT c_mktsegment, c_nationkey, CAST(ROUND(c_acctbal*100) AS BIGINT) AS cents FROM customer
),
l1 AS (SELECT {lv[0]['field']}, {aggsel(lv[0])} FROM base GROUP BY {lv[0]['field']}),
l1k AS (SELECT * FROM l1 QUALIFY row_number() OVER (ORDER BY {orderby(lv[0])}) <= {lv[0]['limit']}),
l2 AS (SELECT {lv[0]['field']}, {lv[1]['field']}, {aggsel(lv[1])} FROM base GROUP BY 1, 2),
l2k AS (
  SELECT l2.* FROM l2 JOIN l1k USING ({lv[0]['field']})
  QUALIFY row_number() OVER (PARTITION BY {lv[0]['field']} ORDER BY {orderby(lv[1])}) <= {lv[1]['limit']}
)
SELECT {', '.join('l1k.' + c for c in cols1)}, {', '.join('l2k.' + c for c in cols2)}
FROM l1k JOIN l2k USING ({lv[0]['field']})
ORDER BY {lv[0]['field']}, {lv[1]['field']}
"""


def test_fuzz_nested_terms_facets(ray_session, duck):
    from lucene_solr_ray.pipelines.facets import compute_json_facet

    rng = random.Random(99)
    for trial in range(12):
        spec, lv = _mk_spec(rng)
        out = compute_json_facet(SF, "customer", spec)
        cols = (
            [lv[0]["field"], lv[0]["count_key"]]
            + [n for n, _ in lv[0]["mkeys"]]
            + [lv[1]["field"], lv[1]["count_key"]]
            + [n for n, _ in lv[1]["mkeys"]]
        )
        for c in cols:
            if c.startswith(_INT_METRICS) and c not in (lv[0]["field"], lv[1]["field"]):
                out[c] = out[c].astype("int64")
        got = out[cols].sort_values([lv[0]["field"], lv[1]["field"]]).reset_index(drop=True)
        exp = duck.execute(_twin_sql(lv)).df()
        try:
            pd.testing.assert_frame_equal(
                got, exp, check_dtype=False, check_exact=True
            )
        except AssertionError as e:
            raise AssertionError(f"trial {trial} spec={spec}") from e
