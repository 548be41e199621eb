"""Full-text pipelines over the `documents` table — the flagship engine
driven through the driver's correctness gate.

`bm25_topk` builds the real inverted index (transcript-shaped input, full
build pipeline: invert → salted groupby(term) shuffle → merge/encode) over
`documents`, serves top-k BM25 through the shard actor pool, and is checked
against an INDEPENDENT DuckDB reimplementation of the exact scoring
semantics: same tokenizer regex, same 33 stopwords, SmallFloat-quantized dl
(the `(c >> s) << s` top-4-bits form, verified exhaustively equal to
byte4ToInt(intToByte4(c))), idf = ln(1+(N-df+0.5)/(df+0.5)), k1=1.2 b=0.75,
float32 final scores, (score desc, docID asc) ranking.  Queries are limited
to ≤ 2 terms so float addition order cannot differ between engines.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..analysis import ENGLISH_STOP_WORDS, tokenize
from .common import Pipeline

# ≤2 terms each (float-sum order safety); "the" analyzes away entirely.
BM25_QUERIES = ["spark", "merge", "window", "scan slow", "spark join", "the"]
TOP_K = 10


def _doc_corpus_dir(sf_dir: str) -> Path:
    h = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    return Path(f"/tmp/lsr_docs_corpus_{h}")


# bump when the on-disk index layout gains columns the pipelines rely on
# (e.g. dv_<field> docvalues) so a stale /tmp index rebuilds instead of
# silently serving the old schema
_INDEX_FORMAT = 2


def _doc_index_dir(sf_dir: str) -> Path:
    h = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    return Path(f"/tmp/lsr_docs_index_{h}_v{_INDEX_FORMAT}")


def _prepare_corpus(sf_dir: str) -> list[str]:
    """documents → transcript-shaped, conv-range-partitioned parquet files."""
    out = _doc_corpus_dir(sf_dir)
    marker = out / "_DONE"
    if marker.exists():
        return sorted(str(p) for p in out.glob("part-*.parquet"))
    out.mkdir(parents=True, exist_ok=True)
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    ).sort_by("doc_id")
    n = t.num_rows
    doc_ids = t.column("doc_id").to_numpy()
    # lang/source ride along as the keyword fields (role:=lang, tool:=source)
    # so FILTER clauses like `#role:en` are exercised against a SQL WHERE
    table = pa.table(
        {
            "conv_id": pa.array([f"doc-{d:010d}" for d in doc_ids], type=pa.string()),
            "turn_idx": pa.array(np.zeros(n, dtype=np.int32)),
            "role": t.column("lang"),
            "text": t.column("text"),
            "tool": t.column("source"),
            "ts": pa.array(np.zeros(n, dtype="datetime64[us]")),
        }
    )
    n_files = 4
    per = (n + n_files - 1) // n_files
    for k in range(n_files):
        sl = table.slice(k * per, per)
        if sl.num_rows:
            pq.write_table(sl, out / f"part-{k:05d}.parquet")
    marker.write_text("ok")
    return sorted(str(p) for p in out.glob("part-*.parquet"))


import contextlib


def _ensure_index(sf_dir: str):
    from ..index.build import build_index
    from ..search import Searcher

    paths = _prepare_corpus(sf_dir)
    idx = _doc_index_dir(sf_dir)
    build_index(paths, idx, files_per_shard=2, resume=True)
    return Searcher(str(idx))


@contextlib.contextmanager
def _searcher(sf_dir: str):
    """Open → use → RELEASE the actor pool: a leaked pool pins CPU slots
    and starves any Ray Data job that runs afterwards on a small cluster."""
    s = _ensure_index(sf_dir)
    try:
        yield s
    finally:
        s.close()


def bm25_topk(sf_dir: str):
    with _searcher(sf_dir) as searcher:
        return _run_bm25(searcher, [(q, None) for q in BM25_QUERIES])


def _run_bm25(searcher, query_specs):
    # docID → original doc_id via the docmap (conv_id encodes it)
    rows = []
    for query, _ in query_specs:
        hits = searcher.search(query, TOP_K)
        if not hits:
            continue
        fetched = searcher.fetch([d for d, _ in hits])
        conv_by_doc = {r["doc_id"]: r["conv_id"] for r in fetched.to_pylist()}
        for rank, (docid, score) in enumerate(hits, start=1):
            rows.append(
                {
                    "query": query,
                    "rank": np.int64(rank),
                    "doc_id": np.int64(int(conv_by_doc[docid].split("-")[1])),
                    "score": np.float32(score),
                }
            )
    df = pd.DataFrame(rows, columns=["query", "rank", "doc_id", "score"])
    df["rank"] = df["rank"].astype("int64")
    df["doc_id"] = df["doc_id"].astype("int64")
    df["score"] = df["score"].astype("float32")
    return df.sort_values(["query", "rank"]).reset_index(drop=True)


def _bm25_oracle_sql() -> str:
    stop_sql = "'" + "','".join(sorted(ENGLISH_STOP_WORDS)) + "'"
    qt_rows = []
    for q in BM25_QUERIES:
        for t, _ in tokenize(q):
            qt_rows.append(f"('{q}', '{t}')")
    qt_values = ",\n       ".join(qt_rows)
    return f"""
WITH toks AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
    FROM documents
  ) WHERE t NOT IN ({stop_sql})
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY doc_id),
dlq AS (
  SELECT doc_id, c,
         CASE WHEN c < 16 THEN c
              ELSE (c >> GREATEST(CAST(floor(log2(c)) AS INTEGER) - 3, 0))
                   << GREATEST(CAST(floor(log2(c)) AS INTEGER) - 3, 0)
         END AS qdl
  FROM dl
),
stats AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
         (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM dl) AS sum_dl
),
qt(query, term) AS (VALUES {qt_values}),
df AS (SELECT t AS term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY t),
tf AS (SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, t),
scored AS (
  SELECT qt.query, tf.doc_id,
         SUM( (ln(1.0 + (n_docs - df.df + 0.5) / (df.df + 0.5)) * tf.tf)
              / (tf.tf + 1.2 * (0.25 + (0.75 * dlq.qdl) / (sum_dl * 1.0 / n_docs))) ) AS s
  FROM qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY qt.query, tf.doc_id
)
SELECT query,
       CAST(row_number() OVER (PARTITION BY query ORDER BY CAST(s AS FLOAT) DESC, doc_id) AS BIGINT) AS rank,
       doc_id,
       CAST(s AS FLOAT) AS score
FROM scored
QUALIFY rank <= {TOP_K}
ORDER BY query, rank
"""


BM25_SQL = _bm25_oracle_sql()

# --------------------------------------------------------------------------
# Scored {!join} end-to-end gate (JoinQParserPlugin + JoinUtil ScoreMode.Max
# over the SAME independent SQL BM25 oracle): the from-side subquery scores
# every matching doc, keys aggregate per `tool` (= source) with MAX — order
# free, so the cross-shard partial merge is exact — and every to-side doc
# carries its key's score.  Rank (score desc, docID asc); docID order equals
# doc_id order by construction (conv_id = doc-<id> zero-padded).

JOIN_QUERY = "scan slow"
JOIN_TOP_K = 25


def join_scored_topk(sf_dir: str):
    with _searcher(sf_dir) as searcher:
        hits = searcher.join_search("tool", "tool", JOIN_QUERY, JOIN_TOP_K, score="max")
        fetched = searcher.fetch([d for d, _ in hits])
    conv_by_doc = {r["doc_id"]: r["conv_id"] for r in fetched.to_pylist()}
    df = pd.DataFrame(
        {
            "rank": np.arange(1, len(hits) + 1, dtype=np.int64),
            "doc_id": np.array(
                [int(conv_by_doc[d].split("-")[1]) for d, _ in hits], dtype=np.int64
            ),
            "score": np.array([s for _, s in hits], dtype=np.float32),
        }
    )
    return df


def _join_scored_sql() -> str:
    stop_sql = "'" + "','".join(sorted(ENGLISH_STOP_WORDS)) + "'"
    qt_values = ", ".join(f"('{t}')" for t, _ in tokenize(JOIN_QUERY))
    return f"""
WITH toks AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
    FROM documents
  ) WHERE t NOT IN ({stop_sql})
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY doc_id),
dlq AS (
  SELECT doc_id, c,
         CASE WHEN c < 16 THEN c
              ELSE (c >> GREATEST(CAST(floor(log2(c)) AS INTEGER) - 3, 0))
                   << GREATEST(CAST(floor(log2(c)) AS INTEGER) - 3, 0)
         END AS qdl
  FROM dl
),
stats AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
         (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM dl) AS sum_dl
),
qt(term) AS (VALUES {qt_values}),
df AS (SELECT t AS term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY t),
tf AS (SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, t),
scored AS (
  SELECT tf.doc_id,
         SUM( (ln(1.0 + (n_docs - df.df + 0.5) / (df.df + 0.5)) * tf.tf)
              / (tf.tf + 1.2 * (0.25 + (0.75 * dlq.qdl) / (sum_dl * 1.0 / n_docs))) ) AS s
  FROM qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
keys AS (
  SELECT d.source AS k, MAX(CAST(s AS FLOAT)) AS ks
  FROM scored JOIN documents d USING (doc_id)
  WHERE d.source IS NOT NULL GROUP BY d.source
)
SELECT CAST(row_number() OVER (ORDER BY ks DESC, d.doc_id) AS BIGINT) AS rank,
       d.doc_id, ks AS score
FROM documents d JOIN keys ON d.source = keys.k
QUALIFY rank <= {JOIN_TOP_K}
ORDER BY rank
"""


JOIN_SCORED_SQL = _join_scored_sql()

# --------------------------------------------------------------------------
# Filtered BM25: scored term + keyword-field FILTER clause (`#role:<lang>`,
# i.e. BooleanClause.Occur.FILTER over a StringField) ↔ SQL WHERE lang=...
# Single-term scored clause per query → no float-sum-order concerns.

BM25_FILTERED = [("merge", "en"), ("scan", "zh"), ("window", "es"), ("join", "en")]


def bm25_filtered(sf_dir: str):
    with _searcher(sf_dir) as searcher:
        return _run_bm25(searcher, [(f"{t} #role:{l}", None) for t, l in BM25_FILTERED])


def _bm25_filtered_sql() -> str:
    stop_sql = "'" + "','".join(sorted(ENGLISH_STOP_WORDS)) + "'"
    qt_values = ",\n       ".join(
        f"('{t} #role:{l}', '{t}', '{l}')" for t, l in BM25_FILTERED
    )
    return f"""
WITH toks AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
    FROM documents
  ) WHERE t NOT IN ({stop_sql})
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY doc_id),
dlq AS (
  SELECT doc_id, c,
         CASE WHEN c < 16 THEN c
              ELSE (c >> GREATEST(CAST(floor(log2(c)) AS INTEGER) - 3, 0))
                   << GREATEST(CAST(floor(log2(c)) AS INTEGER) - 3, 0)
         END AS qdl
  FROM dl
),
stats AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
         (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM dl) AS sum_dl
),
qt(query, term, flang) AS (VALUES {qt_values}),
df AS (SELECT t AS term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY t),
tf AS (SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, t),
scored AS (
  SELECT qt.query, tf.doc_id,
         (ln(1.0 + (n_docs - df.df + 0.5) / (df.df + 0.5)) * tf.tf)
         / (tf.tf + 1.2 * (0.25 + (0.75 * dlq.qdl) / (sum_dl * 1.0 / n_docs))) AS s
  FROM qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dlq ON dlq.doc_id = tf.doc_id
  JOIN documents d ON d.doc_id = tf.doc_id AND d.lang = qt.flang
  CROSS JOIN stats
)
SELECT query,
       CAST(row_number() OVER (PARTITION BY query ORDER BY CAST(s AS FLOAT) DESC, doc_id) AS BIGINT) AS rank,
       doc_id,
       CAST(s AS FLOAT) AS score
FROM scored
QUALIFY rank <= {TOP_K}
ORDER BY query, rank
"""


BM25_FILTERED_SQL = _bm25_filtered_sql()

# --------------------------------------------------------------------------
# Phrase + boolean search: positions machinery (exact phrase adjacency) and
# MUST/MUST_NOT combination, gated against a SQL twin that recomputes the
# same BM25-over-phrase-freq scores with window/position tricks (zipped
# unnest positions preserve stopword gaps exactly like the analyzer).

PHRASE_QUERIES = ['"slow scan"', '"fast merge"', "+spark -join", "+window +sort"]


def phrase_search(sf_dir: str):
    with _searcher(sf_dir) as searcher:
        return _run_bm25(searcher, [(q, None) for q in PHRASE_QUERIES])


def _phrase_sql() -> str:
    stop_sql = "'" + "','".join(sorted(ENGLISH_STOP_WORDS)) + "'"
    base = f"""
WITH toks AS (
  SELECT doc_id, t, pos FROM (
    SELECT doc_id, unnest(arr) AS t, unnest(range(len(arr))) AS pos
    FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS arr FROM documents)
  ) WHERE t NOT IN ({stop_sql})
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY doc_id),
dlq AS (
  SELECT doc_id, c,
         CASE WHEN c < 16 THEN c
              ELSE (c >> GREATEST(CAST(floor(log2(c)) AS INTEGER) - 3, 0))
                   << GREATEST(CAST(floor(log2(c)) AS INTEGER) - 3, 0)
         END AS qdl
  FROM dl
),
stats AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
         (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM dl) AS sum_dl
),
df AS (SELECT t AS term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY t),
idf AS (SELECT term, ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS v FROM df CROSS JOIN stats),
normk AS (
  SELECT doc_id, 1.2 * (0.25 + (0.75 * qdl) / (sum_dl * 1.0 / n_docs)) AS k
  FROM dlq CROSS JOIN stats
),
tf AS (SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, t),
ts AS (
  SELECT tf.doc_id, tf.term, (idf.v * tf.tf) / (tf.tf + normk.k) AS s
  FROM tf JOIN idf USING (term) JOIN normk USING (doc_id)
)"""

    def phrase(qlabel, a, b):
        return f"""
SELECT '{qlabel}' AS query, p.doc_id,
       ((ia.v + ib.v) * p.pf) / (p.pf + normk.k) AS s
FROM (
  SELECT x.doc_id, CAST(COUNT(*) AS BIGINT) AS pf
  FROM (SELECT doc_id, pos FROM toks WHERE t = '{a}') x
  JOIN (SELECT doc_id, pos FROM toks WHERE t = '{b}') y
    ON y.doc_id = x.doc_id AND y.pos = x.pos + 1
  GROUP BY x.doc_id
) p
JOIN normk ON normk.doc_id = p.doc_id
CROSS JOIN (SELECT v FROM idf WHERE term = '{a}') ia
CROSS JOIN (SELECT v FROM idf WHERE term = '{b}') ib"""

    q3 = """
SELECT '+spark -join' AS query, ts.doc_id, ts.s
FROM ts WHERE ts.term = 'spark'
  AND ts.doc_id NOT IN (SELECT doc_id FROM toks WHERE t = 'join')"""
    q4 = """
SELECT '+window +sort' AS query, w.doc_id, w.s + z.s AS s
FROM (SELECT doc_id, s FROM ts WHERE term = 'window') w
JOIN (SELECT doc_id, s FROM ts WHERE term = 'sort') z USING (doc_id)"""
    return f"""{base},
allq AS (
{phrase('"slow scan"', "slow", "scan")}
UNION ALL
{phrase('"fast merge"', "fast", "merge")}
UNION ALL
{q3}
UNION ALL
{q4}
)
SELECT query,
       CAST(row_number() OVER (PARTITION BY query ORDER BY CAST(s AS FLOAT) DESC, doc_id) AS BIGINT) AS rank,
       doc_id,
       CAST(s AS FLOAT) AS score
FROM allq
QUALIFY rank <= {TOP_K}
ORDER BY query, rank
"""


PHRASE_SQL = _phrase_sql()


def index_stats(sf_dir: str):
    """Index-build introspection: manifest stats + per-shard counts."""
    import json

    with _searcher(sf_dir) as searcher:
        m = searcher.manifest
    rows = [
        {
            "shard": np.int64(int(sid)),
            "n_terms": np.int64(s["n_terms"]),
            "n_postings": np.int64(s["n_postings"]),
        }
        for sid, s in sorted(m["shards"].items())
    ]
    return pd.DataFrame(rows, columns=["shard", "n_terms", "n_postings"])


# --------------------------------------------------------------------------
# §2.7 re-rank (ReRankQParserPlugin / LTR second stage): first-pass BM25
# top-40, re-scored by a brevity-decay function over a stored field, final
# top-10.  Both stages deterministic; the SQL twin applies the identical
# two-stage cut.

RERANK_TERM = "merge"
RERANK_WINDOW = 40


def rerank_brevity(sf_dir: str):
    with _searcher(sf_dir) as searcher:
        hits = searcher.search(RERANK_TERM, RERANK_WINDOW)
        fetched = searcher.fetch([d for d, _ in hits])
        conv_by_doc = {r["doc_id"]: r["conv_id"] for r in fetched.to_pylist()}
    real_ids = sorted(int(c.split("-")[1]) for c in conv_by_doc.values())
    nchars = (
        pq.read_table(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "n_chars"],
            filters=[("doc_id", "in", real_ids)],  # candidates only
        )
        .to_pandas()
        .set_index("doc_id")["n_chars"]
    )
    rows = []
    for docid, score in hits:
        real = int(conv_by_doc[docid].split("-")[1])
        s32 = float(np.float32(score))
        rer = s32 * (1000.0 / (float(nchars[real]) + 1000.0))
        rows.append({"doc_id": np.int64(real), "rerank_score": np.float32(rer)})
    df = pd.DataFrame(rows).sort_values(
        ["rerank_score", "doc_id"], ascending=[False, True]
    ).head(10).reset_index(drop=True)
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df[["rank", "doc_id", "rerank_score"]]


def _rerank_sql() -> str:
    stop_sql = "'" + "','".join(sorted(ENGLISH_STOP_WORDS)) + "'"
    return f"""
WITH toks AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
    FROM documents
  ) WHERE t NOT IN ({stop_sql})
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY doc_id),
dlq AS (
  SELECT doc_id, c,
         CASE WHEN c < 16 THEN c
              ELSE (c >> GREATEST(CAST(floor(log2(c)) AS INTEGER) - 3, 0))
                   << GREATEST(CAST(floor(log2(c)) AS INTEGER) - 3, 0)
         END AS qdl
  FROM dl
),
stats AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
         (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM dl) AS sum_dl
),
df AS (SELECT t AS term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks WHERE t = '{RERANK_TERM}' GROUP BY t),
tf AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM toks WHERE t = '{RERANK_TERM}' GROUP BY doc_id),
firstpass AS (
  SELECT tf.doc_id,
         CAST((ln(1.0 + (n_docs - df.df + 0.5) / (df.df + 0.5)) * tf.tf)
              / (tf.tf + 1.2 * (0.25 + (0.75 * dlq.qdl) / (sum_dl * 1.0 / n_docs))) AS FLOAT) AS s
  FROM tf CROSS JOIN df JOIN dlq ON dlq.doc_id = tf.doc_id CROSS JOIN stats
  ORDER BY s DESC, tf.doc_id LIMIT {RERANK_WINDOW}
)
SELECT CAST(row_number() OVER (ORDER BY rerank_score DESC, doc_id) AS BIGINT) AS rank,
       doc_id, rerank_score
FROM (
  SELECT f.doc_id,
         CAST(CAST(f.s AS DOUBLE) * (1000.0 / (CAST(d.n_chars AS DOUBLE) + 1000.0)) AS FLOAT) AS rerank_score
  FROM firstpass f JOIN documents d USING (doc_id)
)
QUALIFY rank <= 10
ORDER BY rank
"""


RERANK_SQL = _rerank_sql()

# --------------------------------------------------------------------------
# LTR linear-model re-rank (solr/contrib/ltr LinearModel.java): first-pass
# BM25 top-40 re-scored by Σ wᵢ·featureᵢ in an actor-pool second stage
# (model weights loaded once per actor in __init__).  Features: the
# float32 first-pass score, a brevity function of n_chars, and
# ln(1+n_chars) — all recomputable in the SQL twin with the identical
# left-to-right accumulation.

LTR_WEIGHTS = {"bm25": 0.6, "brevity": 0.3, "log_len": 0.1}


class _LTRScorer:
    """Actor-pool stage: model state built once per actor."""

    def __init__(self, weights: dict[str, float]):
        from ..search.ltr import LinearModel

        self.model = LinearModel(weights)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import math

        feats = {
            "bm25": batch["bm25"].to_numpy(dtype=np.float64),
            "brevity": 1000.0 / (batch["n_chars"].to_numpy(dtype=np.float64) + 1000.0),
            # math.log (libm) per candidate — candidates are top-k-bounded
            "log_len": np.asarray(
                [math.log(1.0 + float(v)) for v in batch["n_chars"]], dtype=np.float64
            ),
        }
        out = batch[["doc_id"]].copy()
        out["ltr_score"] = self.model.score(feats).astype(np.float32)
        return out


def ltr_rerank(sf_dir: str):
    import ray.data as rd

    with _searcher(sf_dir) as searcher:
        hits = searcher.search(RERANK_TERM, RERANK_WINDOW)
        fetched = searcher.fetch([d for d, _ in hits])
        conv_by_doc = {r["doc_id"]: r["conv_id"] for r in fetched.to_pylist()}
    first = pd.DataFrame(
        {
            "doc_id": [int(conv_by_doc[d].split("-")[1]) for d, _ in hits],
            "bm25": np.asarray([float(np.float32(s)) for _, s in hits], dtype=np.float64),
        }
    )
    nchars = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "n_chars"],
        filters=[("doc_id", "in", sorted(first["doc_id"].tolist()))],  # candidates only
    ).to_pandas()
    cand = first.merge(nchars, on="doc_id")
    out = (
        rd.from_pandas(cand)
        .map_batches(_LTRScorer, fn_constructor_args=(LTR_WEIGHTS,), batch_format="pandas", concurrency=1)
        .to_pandas()
    )
    out = out.sort_values(["ltr_score", "doc_id"], ascending=[False, True]).head(10).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["ltr_score"] = out["ltr_score"].astype("float32")
    return out[["rank", "doc_id", "ltr_score"]]


def _ltr_sql() -> str:
    stop_sql = "'" + "','".join(sorted(ENGLISH_STOP_WORDS)) + "'"
    return f"""
WITH toks AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
    FROM documents
  ) WHERE t NOT IN ({stop_sql})
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY doc_id),
dlq AS (
  SELECT doc_id, c,
         CASE WHEN c < 16 THEN c
              ELSE (c >> GREATEST(CAST(floor(log2(c)) AS INTEGER) - 3, 0))
                   << GREATEST(CAST(floor(log2(c)) AS INTEGER) - 3, 0)
         END AS qdl
  FROM dl
),
stats AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
         (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM dl) AS sum_dl
),
df AS (SELECT t AS term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks WHERE t = '{RERANK_TERM}' GROUP BY t),
tf AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM toks WHERE t = '{RERANK_TERM}' GROUP BY doc_id),
firstpass AS (
  SELECT tf.doc_id,
         CAST((ln(1.0 + (n_docs - df.df + 0.5) / (df.df + 0.5)) * tf.tf)
              / (tf.tf + 1.2 * (0.25 + (0.75 * dlq.qdl) / (sum_dl * 1.0 / n_docs))) AS FLOAT) AS s
  FROM tf CROSS JOIN df JOIN dlq ON dlq.doc_id = tf.doc_id CROSS JOIN stats
  ORDER BY s DESC, tf.doc_id LIMIT {RERANK_WINDOW}
)
SELECT CAST(row_number() OVER (ORDER BY ltr_score DESC, doc_id) AS BIGINT) AS rank,
       doc_id, ltr_score
FROM (
  SELECT f.doc_id,
         CAST({LTR_WEIGHTS["bm25"]} * CAST(f.s AS DOUBLE)
              + {LTR_WEIGHTS["brevity"]} * (1000.0 / (CAST(d.n_chars AS DOUBLE) + 1000.0))
              + {LTR_WEIGHTS["log_len"]} * ln(1.0 + CAST(d.n_chars AS DOUBLE)) AS FLOAT) AS ltr_score
  FROM firstpass f JOIN documents d USING (doc_id)
)
QUALIFY rank <= 10
ORDER BY rank
"""


LTR_SQL = _ltr_sql()


PIPELINES: dict[str, Pipeline] = {
    "bm25_topk": Pipeline(bm25_topk, BM25_SQL, "full index build + top-k BM25, vs independent SQL BM25 oracle"),
    "join_scored_topk": Pipeline(
        join_scored_topk, JOIN_SCORED_SQL, "{!join} ScoreMode.Max end-to-end: BM25 from-side, per-key max, to-side carries key score"
    ),
    "rerank_brevity": Pipeline(rerank_brevity, RERANK_SQL, "two-stage re-rank (ReRankQParser) vs SQL twin"),
    "bm25_filtered": Pipeline(bm25_filtered, BM25_FILTERED_SQL, "BM25 + keyword-field FILTER clause vs SQL WHERE"),
    "phrase_search": Pipeline(phrase_search, PHRASE_SQL, "phrase + boolean search (positions) vs SQL adjacency twin"),
    "index_stats": Pipeline(index_stats, None, "index manifest/lineage introspection"),
    "ltr_rerank": Pipeline(ltr_rerank, LTR_SQL, "LTR LinearModel second-stage re-rank (actor-pool scorer) vs SQL twin"),
}
