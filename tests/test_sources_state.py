"""URP chain, loaders, and LRU cache tests."""

import json

import pandas as pd
import pytest

from lucene_solr_ray.sources.loaders import URP_REGISTRY, build_chain, read_csv_docs, read_json_docs
from lucene_solr_ray.state import LRUCache


def test_urp_chain_composition():
    chain = build_chain(
        [
            ("trim", {"field": "title"}),
            ("remove_blank", {"field": "title"}),
            ("default_value", {"field": "title", "value": "untitled"}),
            ("field_length", {"field": "title", "out": "title_len"}),
            ("parse_int", {"field": "n"}),
            ("signature", {"fields": ["title"], "out": "sig"}),
        ]
    )
    b = pd.DataFrame({"title": ["  Hello ", "", " x"], "n": ["3", "bad", "7"]})
    out = chain(b)
    assert out["title"].tolist() == ["Hello", "untitled", "x"]
    assert out["title_len"].tolist() == [5, 8, 1]
    assert out["n"].tolist()[0] == 3 and pd.isna(out["n"].tolist()[1])
    assert out["sig"].nunique() == 3


def test_multivalue_reducers_and_split():
    b = pd.DataFrame({"tags": ["a,b,a", "c", None]})
    b = URP_REGISTRY["split_multivalue"](field="tags", sep=",")(b)
    assert b["tags"].tolist()[0] == ["a", "b", "a"]
    u = URP_REGISTRY["uniq_values"](field="tags")(b.copy())
    assert u["tags"].tolist()[0] == ["a", "b"]
    c = URP_REGISTRY["count_values"](field="tags", out="n")(b.copy())
    assert c["n"].tolist() == [3, 1, 0]
    f = URP_REGISTRY["first_value"](field="tags")(b.copy())
    assert f["tags"].tolist()[:2] == ["a", "c"]


def test_html_strip_and_regex():
    b = pd.DataFrame({"t": ["<b>bold</b> text", "a<br/>b"]})
    out = URP_REGISTRY["html_strip"](field="t")(b)
    assert out["t"].tolist() == [" bold  text", "a b"]
    out = URP_REGISTRY["regex_replace"](field="t", pattern=r"\s+", replacement=" ")(out)
    assert out["t"].tolist() == [" bold text", "a b"]


def test_loaders_roundtrip(ray_session, tmp_path):
    jpath = tmp_path / "docs.json"
    with open(jpath, "w") as f:
        for i in range(5):
            f.write(json.dumps({"id": i, "body": f" text{i} ", "tags": "a,b"}) + "\n")
    ds = read_json_docs(
        [str(jpath)],
        field_map={"body": "text"},
        urps=[("trim", {"field": "text"})],
    )
    df = ds.to_pandas().sort_values("id")  # block order is not deterministic
    assert df["text"].tolist()[0] == "text0"

    cpath = tmp_path / "docs.csv"
    pd.DataFrame({"id": [1, 2], "tags": ["x,y", "z"]}).to_csv(cpath, index=False)
    ds = read_csv_docs([str(cpath)], multivalue={"tags": ","})
    df = ds.to_pandas().sort_values("id")
    assert df["tags"].tolist()[0] == ["x", "y"]


def test_lru_cache_eviction_and_stats():
    c = LRUCache(max_items=2)
    c.put("a", 1)
    c.put("b", 2)
    assert c.get("a") == 1  # refresh a
    c.put("c", 3)  # evicts b
    assert "b" not in c and "a" in c and "c" in c
    assert c.get("b") is None
    s = c.stats()
    assert s["items"] == 2 and s["hits"] == 1 and s["misses"] == 1


def test_xml_loader(ray_session, tmp_path):
    """Solr XML update format: <add><doc><field name=..> docs, repeated
    field names collect into multiValued lists, URP chain applies."""
    from lucene_solr_ray.sources.loaders import read_xml_docs

    x1 = tmp_path / "u1.xml"
    x1.write_text(
        """<add>
  <doc><field name="id">1</field><field name="text"> hello </field>
       <field name="tag">a</field><field name="tag">b</field></doc>
  <doc><field name="id">2</field><field name="text">world</field>
       <field name="tag">c</field></doc>
</add>"""
    )
    x2 = tmp_path / "u2.xml"
    x2.write_text(
        '<add><doc><field name="id">3</field><field name="text">third</field>'
        '<field name="tag">d</field></doc></add>'
    )
    ds = read_xml_docs([str(x1), str(x2)], urps=[("trim", {"field": "text"}), ("parse_int", {"field": "id"})])
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert df["id"].tolist() == [1, 2, 3]
    assert df["text"].tolist() == ["hello", "world", "third"]
    assert df["tag"].tolist()[0] == ["a", "b"] and df["tag"].tolist()[1] == "c"


def test_arrow_ipc_loader(ray_session, tmp_path):
    """Arrow IPC files (the Javabin-equivalent binary wire format): both
    file and stream variants decode; field_map + URP chain apply."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from lucene_solr_ray.sources.loaders import read_arrow_ipc_docs

    t1 = pa.table({"docid": [1, 2], "body": [" a ", "b"]})
    t2 = pa.table({"docid": [3], "body": ["c"]})
    f1 = tmp_path / "d1.arrow"
    with ipc.new_file(str(f1), t1.schema) as w:
        w.write_table(t1)
    f2 = tmp_path / "d2.arrows"
    import io

    buf = io.BytesIO()
    with ipc.new_stream(buf, t2.schema) as w:
        w.write_table(t2)
    f2.write_bytes(buf.getvalue())

    ds = read_arrow_ipc_docs(
        [str(f1), str(f2)],
        field_map={"docid": "id", "body": "text"},
        urps=[("trim", {"field": "text"})],
    )
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert df["id"].tolist() == [1, 2, 3]
    assert df["text"].tolist() == ["a", "b", "c"]


def test_dih_ingest_surface(ray_session, tmp_path):
    import duckdb
    import pandas as pd
    import pytest as _pytest

    from lucene_solr_ray.sources.dih import DIH_CONFIG, DIH_SQL, dih_ingest

    sf = "/root/testdata/sf0.001"
    ds = dih_ingest(sf, DIH_CONFIG)
    # streams to a partitioned parquet sink (resumable import)
    out_dir = str(tmp_path / "dih_out")
    ds.write_parquet(out_dir)
    got = duckdb.sql(f"SELECT * FROM '{out_dir}/*.parquet' ORDER BY id").df()
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    want = con.execute(DIH_SQL + " ORDER BY id").df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )
    # no-where root entity + number_format transformer
    cfg = {
        "entity": {
            "table": "customer",
            "fields": [("c_custkey", "id"), ("bal100", "bal100")],
            "transformers": [
                {
                    "type": "template",
                    "name": "bal_s",
                    "template": "${c_nationkey}",
                },
                {"type": "number_format", "name": "bal100", "column": "bal_s"},
            ],
        }
    }
    df = dih_ingest(sf, cfg).to_pandas()
    ref = duckdb.sql(f"SELECT c_custkey, c_nationkey FROM '{sf}/customer.parquet'").df()
    assert len(df) == len(ref)
    assert sorted(df["bal100"].unique()) == sorted(ref["c_nationkey"].unique())
    with _pytest.raises(ValueError):
        dih_ingest(sf, {"entity": {"table": "customer", "fields": [("c_custkey", "id")],
                                   "transformers": [{"type": "js", "name": "x"}]}}).to_pandas()


def test_r5_urp_long_tail():
    """uuid / timestamp / skip_existing URPs (the r4 verdict URP gap)."""
    import pandas as pd

    from lucene_solr_ray.sources.loaders import build_chain, skip_existing, timestamp_field, uuid_field

    b = pd.DataFrame({"k": [1, 2, 3, 4], "text": ["a", "b", "a", "c"], "id": [None, "keep", None, None]})
    out = uuid_field("id", of=["text"])(b.copy())
    assert out["id"][1] == "keep"  # existing ids untouched
    assert out["id"][0] == out["id"][2] != out["id"][3]  # content-deterministic
    twice = uuid_field("id", of=["text"])(b.copy())
    assert out["id"].tolist() == twice["id"].tolist()  # retry-stable
    rand = uuid_field("id")(b.copy())
    assert rand["id"].notna().all() and rand["id"][1] == "keep"

    t = timestamp_field("ts", now="2024-05-01T00:00:00")(b.copy())
    assert (t["ts"] == pd.Timestamp("2024-05-01")).all()
    t2 = timestamp_field("ts", now="2024-05-01T00:00:00")(t.assign(ts=[None, pd.Timestamp("2020-01-01"), None, None]))
    assert t2["ts"][1] == pd.Timestamp("2020-01-01") and t2["ts"][0] == pd.Timestamp("2024-05-01")

    s = skip_existing("k", {2, 4})(b.copy())
    assert s["k"].tolist() == [1, 3]

    # registry names resolve through build_chain
    chain = build_chain([
        ("uuid", {"field": "id", "of": ["text"]}),
        ("timestamp", {"field": "ts", "now": "2024-05-01"}),
        ("skip_existing", {"field": "k", "existing": [3]}),
    ])
    c = chain(b.copy())
    assert c["k"].tolist() == [1, 2, 4] and c["id"].notna().all()


def test_r5_add_schema_fields_cast():
    """The schemaless cast step applies globally-inferred types."""
    import pandas as pd

    from lucene_solr_ray.sources.loaders import add_schema_fields

    b = pd.DataFrame(
        {
            "flag": ["true", "no", "Y", None],
            "n": ["1", "2", None, "4"],
            "x": ["1.5", "2", "3e2", None],
            "d": ["2024-01-02", None, "2024-03-04 05:06:07", "2024-12-31"],
            "t": ["a", "b", "c", "d"],
        }
    )
    out = add_schema_fields({"flag": "bool", "n": "long", "x": "double", "d": "date", "t": "string"})(b)
    assert out["flag"].tolist() == [True, False, True, None]
    assert out["n"].dtype == "Int64" and out["n"][3] == 4
    assert out["x"].dtype == "float64" and out["x"][2] == 300.0
    assert str(out["d"].dtype).startswith("datetime64") and out["d"][2].hour == 5
    assert out["t"].tolist() == ["a", "b", "c", "d"]


def test_r5_review_nan_bool_and_empty_infer(ray_session):
    """r5 review: NaN nulls survive the bool cast as None (never False),
    and inference over an all-empty dataset returns the vacuous default
    instead of crashing on the dropped pandas schema."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from lucene_solr_ray.sources.loaders import add_schema_fields, infer_column_types

    b = pd.DataFrame({"flag": ["true", np.nan, None, "no"]})
    out = add_schema_fields({"flag": "bool"})(b)
    assert out["flag"].tolist() == [True, None, None, False]

    empty = rd.from_pandas(pd.DataFrame({"a": ["1"], "b": ["x"]})).filter(lambda r: False)
    inf = infer_column_types(empty, ["a", "b"])
    assert inf["col"].tolist() == ["a", "b"]
    assert (inf["n_nonnull"] == 0).all()
