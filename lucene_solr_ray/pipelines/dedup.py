"""Deduplication pipelines — exact, MinHash-LSH, SimHash, n-gram Jaccard.

Reference anchors (SURVEY.md §2.8): exact content dedup =
SignatureUpdateProcessorFactory + MD5Signature; near-dup = MinHashFilter
(lucene/analysis/common/.../minhash/MinHashFilter.java: minhash over
shingles, banded for Jaccard candidate generation) and TextProfileSignature.
All hashing is seeded/deterministic so results are stable across runs and
retries.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from .common import Pipeline, read
from .text import TOKEN_RE, _tokens

# --------------------------------------------------------------------------
# Exact content dedup (SignatureUpdateProcessor): md5(text) signature,
# keep the lowest doc_id per signature.


def dedup_exact(sf_dir: str):
    def sig(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
        return pd.DataFrame({"sig": s, "doc_id": batch["doc_id"]})

    def first(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.sort_values("doc_id").head(1).copy()
        keep["n_dups"] = np.int64(len(g))
        return keep

    out = (
        read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(sig, batch_format="pandas")
        .groupby("sig")
        .map_groups(first, batch_format="pandas")
        .to_pandas()
    )
    out["n_dups"] = out["n_dups"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


DEDUP_EXACT_SQL = """
SELECT md5(text) AS sig, MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_dups
FROM documents GROUP BY md5(text) ORDER BY doc_id
"""

# --------------------------------------------------------------------------
# First-event-per-key dedup (the updateDocument/upsert "first wins" pattern
# over an event stream): hash-partition by key, keep earliest (ts, event_id).


def dedup_first_per_key(sf_dir: str):
    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["ts", "event_id"]).head(1)[["user_id", "event_type", "event_id"]]

    out = (
        read(sf_dir, "events", ["user_id", "event_type", "event_id", "ts"])
        .groupby(["user_id", "event_type"])
        .map_groups(first, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["user_id", "event_type"]).reset_index(drop=True)


DEDUP_FIRST_SQL = """
SELECT user_id, event_type, event_id FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
ORDER BY user_id, event_type
"""

# --------------------------------------------------------------------------
# MinHash + LSH near-dup (MinHashFilter): shingle → 64 minhashes → 16 bands
# of 4 → candidate pairs per band bucket → verified Jaccard ≥ 0.5.
# Non-SQL-expressible → rows-only check; determinism comes from fixed hash
# parameters.  pytest verifies against a brute-force Jaccard oracle.

N_HASH = 64
N_BANDS = 16
ROWS_PER_BAND = N_HASH // N_BANDS
_MERSENNE31 = (1 << 31) - 1  # products of two <2^31 values fit in int64
_rng = np.random.default_rng(1234)
_A = _rng.integers(1, _MERSENNE31, size=N_HASH, dtype=np.int64)
_B = _rng.integers(0, _MERSENNE31, size=N_HASH, dtype=np.int64)


def _shingle_hashes(tokens: list[str], k: int = 3) -> np.ndarray:
    if len(tokens) < k:
        shingles = [" ".join(tokens)] if tokens else []
    else:
        shingles = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    out = np.empty(len(shingles), dtype=np.int64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "little") & _MERSENNE31
    return np.unique(out)


def _minhash(sh: np.ndarray) -> np.ndarray:
    if sh.size == 0:
        return np.full(N_HASH, _MERSENNE31, dtype=np.int64)
    # (a*x + b) mod p per hash fn — int64-safe since a, x < 2^31
    prod = (sh[None, :] * _A[:, None] + _B[:, None]) % _MERSENNE31
    return prod.min(axis=1).astype(np.int64)


def dedup_minhash(sf_dir: str, jaccard_threshold: float = 0.5):
    """→ (doc_a, doc_b, jaccard) near-duplicate pairs, doc_a < doc_b."""

    def bands(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            toks = [t for t in pd.Series([text]).str.lower().str.findall(TOKEN_RE)[0]]
            mh = _minhash(_shingle_hashes(toks))
            for b in range(N_BANDS):
                h = hashlib.md5(mh[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND].tobytes()).hexdigest()
                rows.append((b, h, doc_id))
        return pd.DataFrame(rows, columns=["band", "bh", "doc_id"])

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if ids.size < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        a, b = np.meshgrid(ids, ids, indexing="ij")
        m = a < b
        return pd.DataFrame({"doc_a": a[m], "doc_b": b[m]})

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    cand = (
        ds.map_batches(bands, batch_format="pandas")
        .groupby(["band", "bh"])
        .map_groups(candidates, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if len(cand) == 0:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    # verify candidates with exact shingle Jaccard (broadcast shingle sets of
    # candidate docs only — candidate set is small by LSH design)
    need = np.unique(np.concatenate([cand["doc_a"], cand["doc_b"]]))
    texts = ds.to_pandas().set_index("doc_id")["text"]
    sh = {int(d): _shingle_hashes(pd.Series([texts[d]]).str.lower().str.findall(TOKEN_RE)[0]) for d in need}
    jac = []
    for da, db in zip(cand["doc_a"], cand["doc_b"]):
        A, B = sh[int(da)], sh[int(db)]
        inter = np.intersect1d(A, B, assume_unique=True).size
        union = A.size + B.size - inter
        jac.append(inter / union if union else 0.0)
    cand = cand.assign(jaccard=jac)
    out = cand[cand["jaccard"] >= jaccard_threshold]
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# SimHash fingerprint (TextProfileSignature-style fuzzy signature): 64-bit
# weighted token hash; near-dups share low Hamming distance.


def simhash(sf_dir: str):
    def sh(batch: pd.DataFrame) -> pd.DataFrame:
        fps = np.empty(len(batch), dtype=np.uint64)
        for i, text in enumerate(batch["text"]):
            toks = pd.Series([text]).str.lower().str.findall(TOKEN_RE)[0]
            if not len(toks):
                fps[i] = 0
                continue
            tf = pd.Series(toks).value_counts()
            acc = np.zeros(64, dtype=np.int64)
            for tok, w in tf.items():
                h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), w, -w)
            fps[i] = np.packbits((acc > 0).astype(np.uint8), bitorder="little").view(np.uint64)[0]
        return pd.DataFrame({"doc_id": batch["doc_id"], "simhash": fps.astype("int64")})

    out = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(sh, batch_format="pandas")
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


# --------------------------------------------------------------------------
# n-gram Jaccard pair similarity (brute force over a keyed subset — the
# verify stage of near-dup): SQL-expressible, gated.


def ngram_jaccard_pairs(sf_dir: str):
    """Jaccard over distinct-token sets for ADJACENT doc pairs (by doc_id
    rank) within each (lang, source) bucket — a bounded, non-empty pair set
    (the verify stage of near-dup, bucketed so pairs never cross workers)."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        toks = [set(t) for t in _tokens(g["text"])]
        rows = []
        for i in range(len(ids) - 1):
            inter = len(toks[i] & toks[i + 1])
            union = len(toks[i] | toks[i + 1])
            rows.append((ids[i], ids[i + 1], np.int64(inter), np.int64(union)))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "n_inter", "n_union"])

    out = (
        read(sf_dir, "documents", ["doc_id", "lang", "source", "text"])
        .groupby(["lang", "source"])
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    cols = ["doc_a", "doc_b", "n_inter", "n_union"]
    if not all(c in out.columns for c in cols):  # empty result loses the schema
        out = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    for c in cols:
        out[c] = out[c].astype("int64")
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


NGRAM_JACCARD_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, source,
         list_distinct(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS toks,
         row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_inter,
       CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS BIGINT) AS n_union
FROM t a JOIN t b
  ON a.lang = b.lang AND a.source = b.source AND b.rn = a.rn + 1
ORDER BY doc_a, doc_b
"""


PIPELINES: dict[str, Pipeline] = {
    "dedup_exact": Pipeline(dedup_exact, DEDUP_EXACT_SQL, "exact content dedup (SignatureUpdateProcessor)"),
    "dedup_first_per_key": Pipeline(dedup_first_per_key, DEDUP_FIRST_SQL, "first-wins upsert dedup (updateDocument)"),
    "dedup_minhash": Pipeline(dedup_minhash, None, "MinHash+LSH near-dup (MinHashFilter); rows-only, oracled in pytest"),
    "simhash": Pipeline(simhash, None, "SimHash fuzzy signature (TextProfileSignature analog); rows-only"),
    "ngram_jaccard_pairs": Pipeline(ngram_jaccard_pairs, NGRAM_JACCARD_SQL, "token-set Jaccard pair similarity (near-dup verify stage)"),
}
