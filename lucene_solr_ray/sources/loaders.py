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
default_value, timestamp?, uuid?, count_values, uniq_values, ignore_field,
signature (content hash).  `timestamp`/`uuid` are deterministic variants
(constant ts / content-hash uuid) so pipelines stay retry-stable.
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
