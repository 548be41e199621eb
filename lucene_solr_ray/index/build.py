"""Distributed inverted-index build: SPIMI invert → term shuffle → merge.

Ray-Data-native reimplementation of the reference's indexing path
(SURVEY.md §3.1): what `DocumentsWriterPerThread` + `DefaultIndexingChain` +
`TermsHashPerField` do per thread (analyze + in-RAM posting accumulation,
lucene/core/src/java/org/apache/lucene/index/DefaultIndexingChain.java,
TermsHashPerField.java) happens here per input-file task inside
`map_batches`; the flush+merge LSM (TieredMergePolicy/SegmentMerger) is
replaced by one explicit `groupby(term)` shuffle per term-shard with a
vectorized merge+encode in `map_groups`
(lucene/core/src/java/org/apache/lucene/index/SegmentMerger.java,
codecs/lucene84/Lucene84PostingsWriter.java).

Physical design (SURVEY.md §7.0, designed for 100 TB / multi-node):

- Input: conv-range-partitioned Parquet files of transcripts
  (conv_id, turn_idx, role, text, tool, ts).  One file = one doc-partition
  (pid).  docIDs are global int64: base(pid) + rank within the file under
  (conv_id, turn_idx) sort — bases come from Parquet footer row counts, so
  docID assignment needs NO data pass and no global sort.
- Shards: contiguous groups of pids; each shard runs its own
  read → invert → groupby(term_key) → merge → write pipeline and is the unit
  of RESUME (manifest).  Query serving fans out over shards (docID ranges are
  contiguous per shard) — the SolrCloud shard model.
- Skew: hot terms (sampled df above `hot_df_frac`) get SALTED keys — the
  salt is derived from the pid's position within the shard so each salted
  run covers a contiguous, disjoint docID range; runs concatenate in salt
  order into a fully sorted posting list (BASELINE: explicit salted-key skew
  handling).
- Postings row (per term[, salt]): delta+varbyte docIDs, varbyte freqs, raw
  norm bytes, varbyte delta positions, and per-128-doc-block
  (last_doc, max_freq, min_norm) block-max metadata.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..analysis import analyze_batch, tokenize
from . import codec
from .manifest import Manifest
from .smallfloat import int_to_byte4_np

SALT_SEP = "\x01"

PARTIAL_SCHEMA = pa.schema(
    [
        ("term_key", pa.string()),
        ("term", pa.string()),
        ("salt", pa.int32()),
        ("pid", pa.int32()),
        ("docs", pa.list_(pa.int64())),
        ("freqs", pa.list_(pa.int32())),
        ("norms", pa.list_(pa.int32())),
        ("positions", pa.list_(pa.int32())),
    ]
)

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int32()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("first_doc", pa.int64()),
        ("last_doc", pa.int64()),
        ("docs", pa.binary()),
        ("freqs", pa.binary()),
        ("norms", pa.binary()),
        ("positions", pa.binary()),
        ("blk_last_doc", pa.list_(pa.int64())),
        ("blk_max_freq", pa.list_(pa.int32())),
        ("blk_min_norm", pa.list_(pa.int32())),
    ]
)


@dataclass
class FileSpec:
    pid: int
    path: str
    rows: int
    base: int  # exclusive-cumsum docID base


def plan_files(input_paths: list[str]) -> list[FileSpec]:
    """Read Parquet footers → per-file row counts → docID bases.

    Files are processed in sorted-path order; with conv-range-partitioned
    input this makes global docIDs equal to the rank under
    (conv_id, turn_idx) — the BASELINE stable-ordering invariant.
    """
    specs: list[FileSpec] = []
    base = 0
    for pid, p in enumerate(sorted(input_paths)):
        rows = pq.read_metadata(p).num_rows
        specs.append(FileSpec(pid=pid, path=p, rows=rows, base=base))
        base += rows
    return specs


def sample_hot_terms(paths: list[str], hot_df_frac: float = 0.02, sample_docs: int = 4000) -> list[str]:
    """One cheap sample pass → terms whose estimated df fraction is hot.

    Reads the first row-group of up to 4 spread-out files.  The returned set
    drives salted shuffle keys (SURVEY.md §4 skew row).
    """
    take = max(1, sample_docs // 4)
    idxs = sorted({0, len(paths) // 3, (2 * len(paths)) // 3, len(paths) - 1})
    df_counts: dict[str, int] = {}
    n = 0
    for i in idxs:
        f = pq.ParquetFile(paths[i])
        t = f.read_row_group(0, columns=["text"])
        texts = t.column("text").to_pylist()[:take]
        for txt in texts:
            n += 1
            for term in {t for t, _ in tokenize(txt or "")}:
                df_counts[term] = df_counts.get(term, 0) + 1
    if n == 0:
        return []
    return sorted(t for t, c in df_counts.items() if c / n >= hot_df_frac)


def invert_partition(
    table: pa.Table, base: int, hot_terms: list[str], salt: int
) -> tuple[pa.Table, pa.Table]:
    """Analyze + SPIMI-invert one doc-partition (vectorized, no row loops).

    Returns (partial_postings, norms) where norms has one row per doc:
    (doc_id, conv_id, turn_idx, dl, norm_byte).
    """
    order = pc.sort_indices(table, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    table = table.take(order)
    n = table.num_rows
    doc_ids = base + np.arange(n, dtype=np.int64)

    tok = analyze_batch(table.column("text"))
    dl = tok["dl"]
    norm_bytes = int_to_byte4_np(dl).astype(np.int64)

    norms = pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "conv_id": table.column("conv_id"),
            "turn_idx": table.column("turn_idx"),
            "dl": pa.array(dl),
            "norm_byte": pa.array(norm_bytes.astype(np.int32)),
        }
    )

    if len(tok["row"]) == 0:
        return PARTIAL_SCHEMA.empty_table(), norms

    # group tokens by (term, doc) then runs by term — all vectorized
    term_codes, uniq_terms = pd.factorize(tok["term"], sort=True)
    tdoc = doc_ids[tok["row"]]
    order = np.lexsort((tok["pos"], tdoc, term_codes))
    tc, td, tp = term_codes[order], tdoc[order], tok["pos"][order]

    # (term, doc) run boundaries → per-entry doc/freq
    entry_new = np.empty(tc.size, dtype=bool)
    entry_new[0] = True
    entry_new[1:] = (tc[1:] != tc[:-1]) | (td[1:] != td[:-1])
    entry_idx = np.flatnonzero(entry_new)
    e_term = tc[entry_idx]
    e_doc = td[entry_idx]
    e_freq = np.diff(np.append(entry_idx, tc.size)).astype(np.int32)
    e_norm = norm_bytes[e_doc - base].astype(np.int32)

    # term run boundaries over entries → list offsets
    t_new = np.empty(e_term.size, dtype=bool)
    t_new[0] = True
    t_new[1:] = e_term[1:] != e_term[:-1]
    t_start = np.flatnonzero(t_new)
    n_terms = t_start.size
    e_offsets = np.append(t_start, e_term.size).astype(np.int32)
    terms_arr = uniq_terms[e_term[t_start]]

    # positions: flat per term (ordered by doc, pos); offsets via token runs
    tok_t_new = np.empty(tc.size, dtype=bool)
    tok_t_new[0] = True
    tok_t_new[1:] = tc[1:] != tc[:-1]
    p_offsets = np.append(np.flatnonzero(tok_t_new), tc.size).astype(np.int32)

    # salted shuffle keys for hot terms
    salts = np.zeros(n_terms, dtype=np.int32)
    if hot_terms:
        hot_mask = np.isin(terms_arr, np.asarray(hot_terms, dtype=object))
        salts[hot_mask] = salt
    term_keys = terms_arr.copy()
    for i in np.flatnonzero(salts != 0):  # hot terms only — a handful per partition
        term_keys[i] = f"{terms_arr[i]}{SALT_SEP}{salts[i]}"

    partial = pa.table(
        {
            "term_key": pa.array(term_keys, type=pa.string()),
            "term": pa.array(terms_arr, type=pa.string()),
            "salt": pa.array(salts),
            "pid": pa.array(np.full(n_terms, -1, dtype=np.int32)),  # filled by caller
            "docs": pa.ListArray.from_arrays(e_offsets, pa.array(e_doc, type=pa.int64())),
            "freqs": pa.ListArray.from_arrays(e_offsets, pa.array(e_freq, type=pa.int32())),
            "norms": pa.ListArray.from_arrays(e_offsets, pa.array(e_norm, type=pa.int32())),
            "positions": pa.ListArray.from_arrays(p_offsets, pa.array(tp.astype(np.int32), type=pa.int32())),
        },
        schema=PARTIAL_SCHEMA,
    )
    return partial, norms


def merge_group(group: pa.Table) -> pa.Table:
    """Merge one (term, salt) group's partials → one encoded postings row.

    Partials come from disjoint, ordered docID ranges (one per pid), so the
    merge is a pid-ordered concatenation — no k-way heap needed.  The
    docID-sortedness is asserted (CheckIndex-style invariant, SURVEY.md §5).
    """
    order = pc.sort_indices(group, sort_keys=[("pid", "ascending")])
    group = group.take(order)
    docs = group.column("docs").combine_chunks().flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    freqs = group.column("freqs").combine_chunks().flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    norms = group.column("norms").combine_chunks().flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    positions = (
        group.column("positions").combine_chunks().flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    )
    if docs.size > 1 and not (np.diff(docs) > 0).all():
        raise AssertionError(f"postings not strictly increasing for term {group.column('term')[0]}")
    docs_b, freqs_b = codec.encode_postings(docs, freqs)
    pos_b = codec.encode_positions(positions, freqs)
    blk_last, blk_maxf, blk_minn = codec.block_meta(docs, freqs, norms)
    term = group.column("term")[0].as_py()
    salt = group.column("salt")[0].as_py()
    return pa.table(
        {
            "term": pa.array([term], type=pa.string()),
            "salt": pa.array([salt], type=pa.int32()),
            "df": pa.array([int(docs.size)], type=pa.int64()),
            "cf": pa.array([int(freqs.sum())], type=pa.int64()),
            "first_doc": pa.array([int(docs[0]) if docs.size else -1], type=pa.int64()),
            "last_doc": pa.array([int(docs[-1]) if docs.size else -1], type=pa.int64()),
            "docs": pa.array([docs_b], type=pa.binary()),
            "freqs": pa.array([freqs_b], type=pa.binary()),
            "norms": pa.array([norms.astype(np.uint8).tobytes()], type=pa.binary()),
            "positions": pa.array([pos_b], type=pa.binary()),
            "blk_last_doc": pa.array([blk_last.tolist()], type=pa.list_(pa.int64())),
            "blk_max_freq": pa.array([blk_maxf.tolist()], type=pa.list_(pa.int32())),
            "blk_min_norm": pa.array([blk_minn.tolist()], type=pa.list_(pa.int32())),
        },
        schema=POSTINGS_SCHEMA,
    )


def _config_fingerprint(specs: list[FileSpec], files_per_shard: int, n_salts: int) -> str:
    payload = json.dumps(
        [[s.path, s.rows] for s in specs] + [files_per_shard, n_salts], sort_keys=True
    ).encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def build_index(
    input_paths: list[str],
    index_dir: str | Path,
    *,
    files_per_shard: int = 8,
    n_salts: int = 4,
    hot_df_frac: float = 0.02,
    resume: bool = True,
    max_concurrent_shards: int = 4,
    fail_after_shards: int | None = None,
) -> Manifest:
    """Build (or resume) the full index.  Returns the committed manifest.

    `fail_after_shards` injects a crash after N completed shards — used by
    the kill-and-rerun resume test (FIXTURES.md F6).
    """
    import ray.data as rd

    index_dir = Path(index_dir)
    specs = plan_files(input_paths)
    fp = _config_fingerprint(specs, files_per_shard, n_salts)

    manifest = Manifest.load(index_dir) if resume else None
    if manifest is not None and manifest.data.get("config", {}).get("fingerprint") != fp:
        manifest = None  # input or layout changed → rebuild
    if manifest is None:
        if index_dir.exists():
            shutil.rmtree(index_dir)
        manifest = Manifest(index_dir)
        manifest.data["config"] = {
            "fingerprint": fp,
            "files_per_shard": files_per_shard,
            "n_salts": n_salts,
            "n_files": len(specs),
            "inputs": [[s.path, s.rows, s.base] for s in specs],
        }
    if manifest.committed:
        return manifest

    hot_terms = sample_hot_terms([s.path for s in specs], hot_df_frac=hot_df_frac)
    manifest.data["config"]["hot_terms"] = hot_terms
    manifest.save()

    shards = [specs[i : i + files_per_shard] for i in range(0, len(specs), files_per_shard)]
    (index_dir / "shards").mkdir(parents=True, exist_ok=True)
    (index_dir / "segments").mkdir(parents=True, exist_ok=True)
    done_count = 0

    def salt_of(local_idx: int, shard_len: int) -> int:
        runs = min(n_salts, shard_len)
        return (local_idx * runs) // shard_len

    def build_shard(shard_id: int) -> None:
        shard = shards[shard_id]
        t0 = time.monotonic()
        shard_dir = index_dir / "shards" / f"shard={shard_id:05d}"
        tmp_dir = index_dir / "shards" / f".shard={shard_id:05d}.tmp"
        if tmp_dir.exists():
            shutil.rmtree(tmp_dir)

        items = [
            {
                "path": s.path,
                "pid": s.pid,
                "base": s.base,
                "salt": salt_of(j, len(shard)),
            }
            for j, s in enumerate(shard)
        ]

        seg_root = index_dir / "segments"

        def invert_item(batch: pa.Table) -> pa.Table:
            outs = []
            for i in range(batch.num_rows):
                path = batch.column("path")[i].as_py()
                pid = batch.column("pid")[i].as_py()
                base = batch.column("base")[i].as_py()
                salt = batch.column("salt")[i].as_py()
                table = pq.read_table(path, columns=["conv_id", "turn_idx", "text"])
                partial, norms = invert_partition(table, base, hot_terms, salt)
                partial = partial.set_column(
                    partial.schema.get_field_index("pid"),
                    "pid",
                    pa.array(np.full(partial.num_rows, pid, dtype=np.int32)),
                )
                # side-write the per-pid norms/docmap segment (atomic, idempotent)
                seg_dir = seg_root / f"pid={pid:05d}"
                seg_dir.mkdir(parents=True, exist_ok=True)
                tmp = seg_dir / ".norms.parquet.tmp"
                pq.write_table(norms, tmp)
                os.replace(tmp, seg_dir / "norms.parquet")
                outs.append(partial)
            return pa.concat_tables(outs) if outs else PARTIAL_SCHEMA.empty_table()

        ds = rd.from_items(items)
        partials = ds.map_batches(invert_item, batch_size=1, batch_format="pyarrow")
        merged = partials.groupby("term_key").map_groups(
            lambda g: merge_group(g.drop_columns(["term_key"])), batch_format="pyarrow"
        )
        merged.write_parquet(str(tmp_dir))
        if shard_dir.exists():
            shutil.rmtree(shard_dir)
        os.replace(tmp_dir, shard_dir)

        # lineage + counts for the manifest (CheckIndex-style recountable)
        n_terms = 0
        n_postings = 0
        for f in shard_dir.glob("*.parquet"):
            t = pq.read_table(f, columns=["df"])
            n_terms += t.num_rows
            n_postings += int(pc.sum(t.column("df")).as_py() or 0)
        for j, s in enumerate(shard):
            manifest.mark_segment(
                pid=s.pid, path=s.path, rows=s.rows, base=s.base, shard=shard_id, status="done"
            )
        manifest.mark_shard(
            shard_id,
            pids=[s.pid for s in shard],
            doc_lo=shard[0].base,
            doc_hi=shard[-1].base + shard[-1].rows,
            n_terms=n_terms,
            n_postings=n_postings,
            wall_s=round(time.monotonic() - t0, 3),
            status="done",
        )

    pending = [i for i in range(len(shards)) if not manifest.shard_done(i)]
    with ThreadPoolExecutor(max_workers=max_concurrent_shards) as pool:
        futures = {}
        for sid in pending:
            if fail_after_shards is not None and done_count + len(futures) >= fail_after_shards:
                break
            futures[pool.submit(build_shard, sid)] = sid
        for fut in list(futures):
            fut.result()
            done_count += 1
    if fail_after_shards is not None and done_count >= fail_after_shards and pending[done_count:]:
        raise RuntimeError(f"injected failure after {done_count} shards")

    _finalize(index_dir, manifest)
    return manifest


def _finalize(index_dir: Path, manifest: Manifest) -> None:
    """Global stats: df/cf per term across shards + collection totals.

    The reference resolves these once per query via termStatistics /
    collectionStatistics (lucene/core/.../search/IndexSearcher.java); we
    precompute them at build time so distributed scoring is globally
    consistent (the ExactStatsCache requirement, SURVEY.md §3.2)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    posting_files = sorted(str(p) for p in (index_dir / "shards").glob("shard=*/*.parquet"))
    stats = (
        rd.read_parquet(posting_files, columns=["term", "df", "cf"])
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"), Sum("cf", alias_name="cf"))
    )
    stats_table = stats.to_arrow_refs()
    import ray

    tables = [t for t in ray.get(stats_table)]
    stats_pa = pa.concat_tables(tables).sort_by("term")
    tmp = index_dir / ".global_stats.parquet.tmp"
    pq.write_table(stats_pa, tmp)
    os.replace(tmp, index_dir / "global_stats.parquet")

    norm_files = sorted(str(p) for p in (index_dir / "segments").glob("pid=*/norms.parquet"))
    nd = rd.read_parquet(norm_files, columns=["dl"])
    n_docs = nd.count()
    sum_ttf = nd.sum("dl")
    manifest.commit(
        {
            "N": int(n_docs),
            "sum_ttf": int(sum_ttf),
            "avgdl": (sum_ttf / n_docs) if n_docs else 0.0,
            "n_terms": int(stats_pa.num_rows),
        }
    )
