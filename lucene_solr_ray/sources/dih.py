"""DataImportHandler analog (SURVEY.md §2.1) — declarative entity ingestion.

Reference: solr/contrib/dataimporthandler/src/java/org/apache/solr/handler/
dataimport/ — DataImportHandler.java (the /dataimport handler),
SqlEntityProcessor.java (root entity = a query), CachedSqlEntityProcessor.java
(child entity cached by key and looked up per parent row), and the stock
transformers RegexTransformer.java / TemplateTransformer.java /
DateFormatTransformer.java / NumberFormatTransformer.java.  The XML
`<dataConfig><document><entity ...><field column= name=/>` tree is accepted
here as the equivalent dict (the declarative shape, not the wire format).

Ray-Data-first execution:
- the ROOT entity is ONE pruned parquet read (`columns=`) with the entity's
  `where` predicate pushed into the scan (`filter=`, row-group pruning) — a
  full-import streams block-by-block with backpressure, never materialized;
- CHILD entities are CachedSqlEntityProcessor lookups: each (dimension-sized)
  child table is read once, broadcast via `ray.put`, and every root batch
  enriches with a vectorized pandas merge inside the same `map_batches`
  stage — no shuffle join for small sides;
- transformers run vectorized (compiled regex `str.extract`, `dt.strftime`,
  string-concat templates) in the same batch function.

Partitioning assumption: child entities are broadcastable (dimension
tables); a fact-sized child belongs in `Dataset.join` instead (the
hash_join_native pipeline).  Output is a lazy Dataset — consume with
`write_parquet` for a resumable, partitioned import.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np  # noqa: F401  (transformer hooks)
import pandas as pd

# NOTE: pipeline-package imports are deferred into functions — the registry
# (pipelines/__init__) imports this module, so a module-level import back
# into `..pipelines` would be circular.

_TEMPLATE_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_.]*)\}")


def _template_fn(template: str):
    """TemplateTransformer: '${col}' refs interleaved with literals →
    vectorized string concat (ints render like SQL CAST(... AS VARCHAR))."""
    parts = _TEMPLATE_RE.split(template)  # [lit0, ref0, lit1, ref1, ...]

    def fn(batch: pd.DataFrame) -> pd.Series:
        acc = pd.Series(parts[0], index=batch.index, dtype="object")
        for i in range(1, len(parts), 2):
            acc = acc + batch[parts[i]].astype(str)
            if i + 1 < len(parts) and parts[i + 1]:
                acc = acc + parts[i + 1]
        return acc

    return fn


def _transformer_fn(spec: dict):
    kind = spec["type"]
    if kind == "template":
        return _template_fn(str(spec["template"]))
    if kind == "regex":
        pat = re.compile(str(spec["regex"]))

        def rx(batch: pd.DataFrame) -> pd.Series:
            # DuckDB regexp_extract returns '' on no-match; mirror that
            return batch[spec["column"]].str.extract(pat, expand=False).fillna("")

        return rx
    if kind == "date_format":
        fmt = str(spec["format"])
        return lambda batch: batch[spec["column"]].dt.strftime(fmt)
    if kind == "number_format":
        return lambda batch: pd.to_numeric(
            batch[spec["column"]].str.replace(",", "", regex=False)
        )
    raise ValueError(f"unknown DIH transformer type {kind!r}")


def _where_filter(where: tuple | None):
    if where is None:
        return None
    import pyarrow.dataset as pds

    col, op, val = where
    f = pds.field(col)
    return {
        "=": f == val,
        "==": f == val,
        "!=": f != val,
        "<": f < val,
        "<=": f <= val,
        ">": f > val,
        ">=": f >= val,
    }[op]


def dih_ingest(sf_dir: str, config: dict[str, Any]):
    """Run a DIH config (full-import) → lazy Ray Dataset of documents."""
    import ray

    ent = config["entity"]
    fields: list[tuple[str, str]] = [tuple(f) for f in ent["fields"]]
    transformers = [dict(t) for t in ent.get("transformers", [])]
    children = [dict(c) for c in ent.get("children", [])]

    # root read: only the columns any stage touches, predicate pushed down
    # (transformer inputs that are themselves derived by an earlier
    # transformer never hit the scan — chained transformers)
    need: list[str] = []
    derived_so_far: set[str] = set()
    for t in transformers:
        if "column" in t and t["column"] not in derived_so_far:
            need.append(t["column"])
        if t["type"] == "template":
            need += [r for r in _TEMPLATE_RE.findall(str(t["template"])) if r not in derived_so_far]
        derived_so_far.add(t["name"])
    for c in children:
        need.append(c["fk"])
    derived = {t["name"] for t in transformers}
    child_cols = {name for c in children for _, name in c["fields"]}
    need += [col for col, _ in fields if col not in derived and col not in child_cols]
    need = list(dict.fromkeys(need))

    import ray.data as rd

    flt = _where_filter(ent.get("where"))
    ds = rd.read_parquet(
        f"{sf_dir}/{ent['table']}.parquet",
        columns=need,
        **({"filter": flt} if flt is not None else {}),
    )

    # CachedSqlEntityProcessor caches: one bounded read per child, broadcast
    from ..pipelines.common import read

    child_refs = []
    for c in children:
        cols = [c["key"]] + [col for col, _ in c["fields"]]
        tbl = read(sf_dir, c["table"], list(dict.fromkeys(cols))).to_pandas()
        ren = {col: name for col, name in c["fields"]}
        tbl = tbl.rename(columns=ren)[[c["key"], *ren.values()]]
        child_refs.append((c["fk"], c["key"], ray.put(tbl)))

    tfns = [(t["name"], _transformer_fn(t)) for t in transformers]
    out_cols = [(col, name) for col, name in fields]

    def process(batch: pd.DataFrame) -> pd.DataFrame:
        for name, fn in tfns:
            batch = batch.assign(**{name: fn(batch)})
        for fk, key, ref in child_refs:
            lut = ray.get(ref)
            batch = batch.merge(lut, left_on=fk, right_on=key, how="inner")
            if key != fk:
                batch = batch.drop(columns=[key])
        return batch[[c for c, _ in out_cols]].rename(columns=dict(out_cols))

    return ds.map_batches(process, batch_format="pandas")


# --------------------------------------------------------------------------
# Gated pipeline: orders root entity + cached customer child + the three
# stock transformers, vs the equivalent SQL.

DIH_CONFIG: dict[str, Any] = {
    "entity": {
        "name": "order",
        "table": "orders",
        "where": ("o_orderstatus", "=", "F"),
        "fields": [
            ("o_orderkey", "id"),
            ("o_totalprice", "amount"),
            ("order_ref", "order_ref"),
            ("month", "month"),
            ("prio", "prio"),
            ("customer_name", "customer_name"),
            ("segment", "segment"),
        ],
        "transformers": [
            {"type": "template", "name": "order_ref", "template": "ORD-${o_orderkey}"},
            {"type": "date_format", "name": "month", "column": "o_orderdate", "format": "%Y-%m"},
            {"type": "regex", "name": "prio", "column": "o_orderpriority", "regex": "^([0-9]+)-"},
        ],
        "children": [
            {
                "table": "customer",
                "key": "c_custkey",
                "fk": "o_custkey",
                "fields": [("c_name", "customer_name"), ("c_mktsegment", "segment")],
            }
        ],
    }
}


def dih_full_import(sf_dir: str):
    return dih_ingest(sf_dir, DIH_CONFIG)


DIH_SQL = """
SELECT o_orderkey AS id, o_totalprice AS amount,
       'ORD-' || CAST(o_orderkey AS VARCHAR) AS order_ref,
       strftime(o_orderdate, '%Y-%m') AS month,
       regexp_extract(o_orderpriority, '^([0-9]+)-', 1) AS prio,
       c_name AS customer_name, c_mktsegment AS segment
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus = 'F'
"""


def pipelines() -> dict:
    """Registry hook called by pipelines/__init__ (deferred — see the
    circular-import note above)."""
    from ..pipelines.common import Pipeline

    return {
        "dih_full_import": Pipeline(
            dih_full_import,
            DIH_SQL,
            "DataImportHandler full-import: root entity + cached child lookup + regex/template/date transformers",
        ),
    }
