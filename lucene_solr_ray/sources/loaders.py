"""Document loaders + update-processor chain (SURVEY.md §2.1 / §2.2).

Reimplements the reference's ingestion surface Ray-Data-first:

- JSON / CSV loaders (solr/core/src/java/org/apache/solr/handler/loader/
  JsonLoader.java, CSVLoaderBase.java) → `ray.data.read_json` /
  `read_csv` plus Solr-style options (field renaming, split-on-delimiter
  multi-values).
- The update-request-processor chain (solr/core/src/java/org/apache/solr/
  update/processor/*.java) → a declarative list of named per-batch
  transforms applied with ONE `map_batches` call (steps compose inside the
  UDF; no extra pipeline stages).

Each URP is `make(**params) -> (pandas batch -> pandas batch)`.  Registered
names mirror the factory classes: trim, remove_blank, field_length, concat,
first_value, last_value, min_value, max_value, parse_int, parse_float,
parse_date, parse_bool, regex_replace, html_strip, clone_field,
default_value, count_values, uniq_values, ignore_field, signature (content
hash), uuid, timestamp, skip_existing, add_schema_fields.  `uuid(of=...)` /
`timestamp(now=...)` have deterministic modes (content-hash uuid5 / fixed
instant) so resumable pipelines stay retry-stable; schemaless type
inference (`infer_column_types`) is a two-pass Dataset shape whose driver
traffic is per-column predicate partials only.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

Step = Callable[[pd.DataFrame], pd.DataFrame]


def _listify(v):
    return v if isinstance(v, list) else ([] if v is None else [v])


# -- URP factories ----------------------------------------------------------


def trim(field: str) -> Step:
    def f(b):
        b[field] = b[field].str.strip()
        return b

    return f


def remove_blank(field: str) -> Step:
    def f(b):
        b[field] = b[field].replace("", None)
        return b

    return f


def field_length(field: str, out: str) -> Step:
    def f(b):
        b[out] = b[field].str.len().astype("int64")
        return b

    return f


def concat(field: str, sep: str = ",") -> Step:
    def f(b):
        b[field] = b[field].map(lambda v: sep.join(str(x) for x in _listify(v)))
        return b

    return f


def _mv_reduce(field: str, pick) -> Step:
    def f(b):
        b[field] = b[field].map(lambda v: pick(_listify(v)) if _listify(v) else None)
        return b

    return f


def first_value(field: str) -> Step:
    return _mv_reduce(field, lambda xs: xs[0])


def last_value(field: str) -> Step:
    return _mv_reduce(field, lambda xs: xs[-1])


def min_value(field: str) -> Step:
    return _mv_reduce(field, min)


def max_value(field: str) -> Step:
    return _mv_reduce(field, max)


def parse_int(field: str) -> Step:
    def f(b):
        b[field] = pd.to_numeric(b[field], errors="coerce").astype("Int64")
        return b

    return f


def parse_float(field: str) -> Step:
    def f(b):
        b[field] = pd.to_numeric(b[field], errors="coerce").astype("float64")
        return b

    return f


def parse_date(field: str, fmt: str | None = None) -> Step:
    def f(b):
        b[field] = pd.to_datetime(b[field], format=fmt, errors="coerce", utc=False)
        return b

    return f


_TRUE = {"true", "1", "yes", "on", "t", "y"}
_FALSE = {"false", "0", "no", "off", "f", "n"}


def parse_bool(field: str) -> Step:
    def f(b):
        def pb(v):
            s = str(v).strip().lower()
            return True if s in _TRUE else False if s in _FALSE else None

        b[field] = b[field].map(pb)
        return b

    return f


def regex_replace(field: str, pattern: str, replacement: str) -> Step:
    rx = re.compile(pattern)

    def f(b):
        b[field] = b[field].str.replace(rx, replacement, regex=True)
        return b

    return f


_TAG_RE = re.compile(r"<[^>]+>")


def html_strip(field: str) -> Step:
    def f(b):
        b[field] = b[field].str.replace(_TAG_RE, " ", regex=True)
        return b

    return f


def clone_field(src: str, dst: str) -> Step:
    def f(b):
        b[dst] = b[src]
        return b

    return f


def default_value(field: str, value) -> Step:
    def f(b):
        if field not in b.columns:
            b[field] = value
        else:
            b[field] = b[field].fillna(value)
        return b

    return f


def count_values(field: str, out: str) -> Step:
    def f(b):
        b[out] = b[field].map(lambda v: len(_listify(v))).astype("int64")
        return b

    return f


def uniq_values(field: str) -> Step:
    def f(b):
        b[field] = b[field].map(lambda v: sorted(set(_listify(v))))
        return b

    return f


def ignore_field(field: str) -> Step:
    def f(b):
        return b.drop(columns=[field], errors="ignore")

    return f


def signature(fields: list[str], out: str = "sig") -> Step:
    """SignatureUpdateProcessorFactory + MD5Signature: content hash over
    the named fields for dedup-by-signature."""

    def f(b):
        joined = b[fields].astype(str).agg("\x00".join, axis=1)
        b[out] = joined.map(lambda s: hashlib.md5(s.encode()).hexdigest())
        return b

    return f


def split_multivalue(field: str, sep: str = ",") -> Step:
    """CSVLoader split-on-delimiter multi-value option."""

    def f(b):
        b[field] = b[field].map(lambda v: None if v is None else [x for x in str(v).split(sep) if x != ""])
        return b

    return f


def uuid_field(field: str = "id", of: list[str] | None = None) -> Step:
    """UUIDUpdateProcessorFactory: fill `field` where missing.  `of` names
    content columns hashed into a deterministic uuid5 (stable across runs
    and retries — the repo hashing invariant); omit `of` for Solr's random
    uuid4 default (NOT retry-stable; avoid in resumable pipelines)."""
    import uuid as _uuid

    def f(b):
        if field not in b.columns:
            b[field] = pd.Series([None] * len(b), dtype=object)
        miss = b[field].isna()
        if miss.any():
            if of:
                basis = b.loc[miss, of].astype(str).agg("\x00".join, axis=1)
                b.loc[miss, field] = [str(_uuid.uuid5(_uuid.NAMESPACE_URL, s)) for s in basis]
            else:
                b.loc[miss, field] = [str(_uuid.uuid4()) for _ in range(int(miss.sum()))]
        return b

    return f


def timestamp_field(field: str = "timestamp", now: str | None = None) -> Step:
    """TimestampUpdateProcessorFactory: stamp ingest time where missing.
    Pass `now` (ISO string) for deterministic/resumable pipelines; the
    wall-clock default mirrors Solr but is not retry-stable."""

    def f(b):
        ts = pd.Timestamp(now) if now else pd.Timestamp.utcnow().tz_localize(None)
        if field not in b.columns:
            b[field] = ts
        else:
            b[field] = b[field].fillna(ts)
        return b

    return f


def skip_existing(field: str, existing) -> Step:
    """SkipExistingDocumentsProcessorFactory: drop rows whose key is
    already present in the collection.  `existing` is the known-key set —
    at scale `ray.put` it once and pass the same handle to every batch
    (or pre-filter with a left_anti Dataset join instead)."""
    keys = set(existing)

    def f(b):
        return b[~b[field].isin(keys)]

    return f


# -- schemaless mode (AddSchemaFieldsUpdateProcessorFactory + the default
# parse-chain): distributed type inference over string columns.  The chain
# order is Solr's schemaless default: boolean → long → double → date →
# string (text fallback).  Inference is a TWO-pass Dataset shape — pass 1
# reduces each batch to per-column predicate partials (5 rows per column
# per batch, never values), the driver AND-merges them, and the caller
# applies the winning cast with the add_schema_fields step.

_BOOL_TOKENS = _TRUE | _FALSE
_LONG_RE = re.compile(r"[+-]?\d+")
_DOUBLE_RE = re.compile(r"[+-]?(\d+)(\.\d+)?([eE][+-]?\d+)?")


def _infer_partial(b: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    rows = []
    for c in cols:
        v = b[c]
        nn = v.notna()
        s = v[nn].astype(str)
        low = s.str.lower()
        rows.append(
            {
                "col": c,
                "n": int(nn.sum()),
                "all_bool": bool(low.isin(_BOOL_TOKENS).all()),
                "all_long": bool(s.str.fullmatch(_LONG_RE).all()),
                "all_double": bool(s.str.fullmatch(_DOUBLE_RE).all()),
                "all_date": bool(pd.to_datetime(s, errors="coerce", format="mixed").notna().all())
                if len(s)
                else True,
                "sum_long": int(pd.to_numeric(s, errors="coerce").fillna(0).astype("int64").sum())
                if bool(s.str.fullmatch(_LONG_RE).all())
                else 0,
                "n_true": int(low.isin(_TRUE).sum()),
            }
        )
    return pd.DataFrame(rows)


def infer_column_types(ds, cols: list[str]) -> pd.DataFrame:
    """→ one row per column: (col, inferred, n_nonnull, checksum) where
    checksum = Σ long casts for 'long', count of true for 'bool', NULL
    otherwise.  Driver sees only per-batch predicate partials."""
    parts = ds.map_batches(
        lambda b: _infer_partial(b, cols), batch_format="pandas"
    ).to_pandas()
    if "col" not in parts.columns:
        # all-empty input loses the pandas block schema (known Ray gotcha):
        # zero rows seen → every predicate vacuously true → bool wins
        return pd.DataFrame(
            {"col": cols, "inferred": "bool", "n_nonnull": 0, "checksum": 0}
        )
    g = parts.groupby("col").agg(
        n=("n", "sum"),
        all_bool=("all_bool", "all"),
        all_long=("all_long", "all"),
        all_double=("all_double", "all"),
        all_date=("all_date", "all"),
        sum_long=("sum_long", "sum"),
        n_true=("n_true", "sum"),
    )
    out = []
    for c in cols:
        r = g.loc[c]
        inferred = (
            "bool"
            if r["all_bool"]
            else "long"
            if r["all_long"]
            else "double"
            if r["all_double"]
            else "date"
            if r["all_date"]
            else "string"
        )
        checksum = (
            int(r["sum_long"])
            if inferred == "long"
            else int(r["n_true"])
            if inferred == "bool"
            else None
        )
        out.append({"col": c, "inferred": inferred, "n_nonnull": int(r["n"]), "checksum": checksum})
    return pd.DataFrame(out)


def add_schema_fields(types: dict[str, str]) -> Step:
    """Apply inferred types (the AddSchemaFields cast step): `types` maps
    column → 'bool'|'long'|'double'|'date'|'string' (infer_column_types
    output — inference is global, so the cast is batch-consistent)."""

    def f(b):
        for c, t in types.items():
            if t == "bool":
                # pd.isna (not `is None`) so NaN nulls stay null instead of
                # stringifying to "nan" → False, matching _infer_partial's
                # notna() null accounting
                b[c] = b[c].map(
                    lambda v: None if pd.isna(v) else str(v).strip().lower() in _TRUE
                )
            elif t == "long":
                b[c] = pd.to_numeric(b[c], errors="coerce").astype("Int64")
            elif t == "double":
                b[c] = pd.to_numeric(b[c], errors="coerce").astype("float64")
            elif t == "date":
                b[c] = pd.to_datetime(b[c], errors="coerce", format="mixed")
        return b

    return f


URP_REGISTRY: dict[str, Callable[..., Step]] = {
    "trim": trim,
    "remove_blank": remove_blank,
    "field_length": field_length,
    "concat": concat,
    "first_value": first_value,
    "last_value": last_value,
    "min_value": min_value,
    "max_value": max_value,
    "parse_int": parse_int,
    "parse_float": parse_float,
    "parse_date": parse_date,
    "parse_bool": parse_bool,
    "regex_replace": regex_replace,
    "html_strip": html_strip,
    "clone_field": clone_field,
    "default_value": default_value,
    "count_values": count_values,
    "uniq_values": uniq_values,
    "ignore_field": ignore_field,
    "signature": signature,
    "split_multivalue": split_multivalue,
    "uuid": uuid_field,
    "timestamp": timestamp_field,
    "skip_existing": skip_existing,
    "add_schema_fields": add_schema_fields,
}


def build_chain(spec: list[tuple[str, dict]]) -> Step:
    """Declarative chain: [("trim", {"field": "title"}), ...] → one Step."""
    steps = [URP_REGISTRY[name](**params) for name, params in spec]

    def f(b: pd.DataFrame) -> pd.DataFrame:
        for s in steps:
            b = s(b)
        return b

    return f


def apply_chain(ds, spec: list[tuple[str, dict]], **map_kwargs):
    """Apply a URP chain to a Dataset as ONE map_batches stage."""
    return ds.map_batches(build_chain(spec), batch_format="pandas", **map_kwargs)


# -- loaders ---------------------------------------------------------------


def read_json_docs(paths, field_map: dict[str, str] | None = None, urps: list | None = None):
    """JSON-lines → docs with optional field renaming + URP chain."""
    import ray.data as rd

    ds = rd.read_json(paths)
    if field_map:
        def rename(b: pd.DataFrame) -> pd.DataFrame:
            return b.rename(columns=field_map)

        ds = ds.map_batches(rename, batch_format="pandas")
    if urps:
        ds = apply_chain(ds, urps)
    return ds


def read_xml_docs(paths, urps: list | None = None):
    """Solr XML update format → docs (solr/core/src/java/org/apache/solr/
    handler/loader/XMLLoader.java): `<add><doc><field name="f">v</field>…`
    documents; a field name repeated within a doc becomes a multi-valued
    list (the XMLLoader multiValued collection rule).

    Ray-Data-first: files stream through `read_binary_files` and each
    batch parses with stdlib ElementTree inside `map_batches` — parsing is
    per-FILE work distributed across the cluster, never a driver loop."""
    import ray.data as rd

    def parse(batch: pd.DataFrame) -> pd.DataFrame:
        import xml.etree.ElementTree as ET

        rows: list[dict] = []
        for blob in batch["bytes"]:
            root = ET.fromstring(bytes(blob))
            adds = [root] if root.tag == "add" else root.findall(".//add")
            for add in adds:
                for doc in add.findall("doc"):
                    rec: dict = {}
                    for f in doc.findall("field"):
                        name = f.get("name")
                        val = f.text or ""
                        if name in rec:  # repeated name → multiValued list
                            prev = rec[name]
                            rec[name] = (prev if isinstance(prev, list) else [prev]) + [val]
                        else:
                            rec[name] = val
                    rows.append(rec)
        return pd.DataFrame(rows)

    ds = rd.read_binary_files(paths).map_batches(parse, batch_format="pandas")
    if urps:
        ds = apply_chain(ds, urps)
    return ds


def read_arrow_ipc_docs(paths, field_map: dict[str, str] | None = None, urps: list | None = None):
    """Arrow IPC (feather v2 / stream) files → docs — the modern binary
    wire format standing in for Javabin (SURVEY §2.1: JavabinLoader is an
    obsolete JVM serialization; Arrow IPC is its zero-copy columnar
    equivalent).  Files stream through `read_binary_files`; each file
    decodes with `pyarrow.ipc` inside `map_batches` — per-FILE distributed
    work, schema preserved, then the shared URP chain."""
    import ray.data as rd

    def parse(batch: pd.DataFrame) -> pd.DataFrame:
        import io

        import pyarrow.ipc as ipc

        frames = []
        for blob in batch["bytes"]:
            buf = io.BytesIO(bytes(blob))
            try:
                t = ipc.open_file(buf).read_all()
            except pa.ArrowInvalid:
                buf.seek(0)
                t = ipc.open_stream(buf).read_all()
            frames.append(t.to_pandas())
        out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
        if field_map:
            out = out.rename(columns=field_map)
        return out

    ds = rd.read_binary_files(paths).map_batches(parse, batch_format="pandas")
    if urps:
        ds = apply_chain(ds, urps)
    return ds


def read_csv_docs(paths, multivalue: dict[str, str] | None = None, urps: list | None = None, **csv_kwargs):
    """CSV → docs; `multivalue` maps field → delimiter (CSVLoader `split`)."""
    import ray.data as rd

    ds = rd.read_csv(paths, **csv_kwargs)
    spec = [("split_multivalue", {"field": f, "sep": s}) for f, s in (multivalue or {}).items()]
    spec += urps or []
    if spec:
        ds = apply_chain(ds, spec)
    return ds


# --------------------------------------------------------------------------
# Gated schemaless-inference pipeline (the sources registry hook, like
# dih.pipelines() — sources never import ..pipelines at module level).


def schemaless_infer(sf_dir: str):
    """Schemaless ingest simulation (AddSchemaFieldsUpdateProcessorFactory):
    five mixed-type event columns arrive stringified (the raw update payload
    a schemaless client sends); the distributed inference chain types each
    one, with a cast checksum proving the winning type.  Nulls survive
    stringification as nulls (CAST semantics on both sides)."""
    import ray.data as rd

    def stringify(b: pd.DataFrame) -> pd.DataFrame:
        def s(col):
            return col.map(lambda x: None if pd.isna(x) else str(x))

        return pd.DataFrame(
            {
                "s_flag": np.where(b["user_id"] % 2 == 0, "true", "false"),
                "s_id": s(b["event_id"]),
                "s_ts": s(b["ts"]),
                "s_type": s(b["event_type"]),
                "s_val": s(b["value"]),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    ).map_batches(stringify, batch_format="pandas")
    out = infer_column_types(ds, ["s_flag", "s_id", "s_ts", "s_type", "s_val"])
    out["checksum"] = out["checksum"].astype("float64")
    return out.sort_values("col").reset_index(drop=True)


_BOOL_SQL = "'" + "', '".join(sorted(_BOOL_TOKENS)) + "'"
_TRUE_SQL = "'" + "', '".join(sorted(_TRUE)) + "'"

SCHEMALESS_SQL = f"""
WITH s AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'true' ELSE 'false' END AS s_flag,
         CAST(event_id AS VARCHAR) AS s_id,
         CAST(ts AS VARCHAR) AS s_ts,
         event_type AS s_type,
         CAST(value AS VARCHAR) AS s_val
  FROM events
),
u AS (
  SELECT 's_flag' AS col, s_flag AS v FROM s UNION ALL
  SELECT 's_id', s_id FROM s UNION ALL
  SELECT 's_ts', s_ts FROM s UNION ALL
  SELECT 's_type', s_type FROM s UNION ALL
  SELECT 's_val', s_val FROM s
),
a AS (
  SELECT col,
         COUNT(v) AS n_nonnull,
         COUNT(*) FILTER (v IS NOT NULL AND lower(v) NOT IN ({_BOOL_SQL})) = 0 AS all_bool,
         COUNT(*) FILTER (v IS NOT NULL AND NOT regexp_matches(v, '^[+-]?\\d+$')) = 0 AS all_long,
         COUNT(*) FILTER (v IS NOT NULL AND NOT regexp_matches(v, '^[+-]?(\\d+)(\\.\\d+)?([eE][+-]?\\d+)?$')) = 0 AS all_double,
         COUNT(*) FILTER (v IS NOT NULL AND TRY_CAST(v AS TIMESTAMP) IS NULL) = 0 AS all_date,
         SUM(TRY_CAST(v AS BIGINT)) AS sum_long,
         COUNT(*) FILTER (lower(v) IN ({_TRUE_SQL})) AS n_true
  FROM u GROUP BY col
)
SELECT col,
       CASE WHEN all_bool THEN 'bool' WHEN all_long THEN 'long'
            WHEN all_double THEN 'double' WHEN all_date THEN 'date'
            ELSE 'string' END AS inferred,
       CAST(n_nonnull AS BIGINT) AS n_nonnull,
       CAST(CASE WHEN all_bool THEN n_true WHEN all_long THEN sum_long
                 ELSE NULL END AS DOUBLE) AS checksum
FROM a ORDER BY col
"""


def pipelines() -> dict:
    from ..pipelines.common import Pipeline

    return {
        "schemaless_infer": Pipeline(
            schemaless_infer,
            SCHEMALESS_SQL,
            "AddSchemaFields schemaless type inference over stringified mixed-type "
            "event columns (bool->long->double->date->string chain) — distributed "
            "predicate partials, cast checksums",
        )
    }
