"""Hybrid lexical+vector retrieval with Reciprocal Rank Fusion.

The fusion every modern search stack layers on top of Lucene: a BM25
top-k list over the text index (the reference's TopScoreDocCollector
path, lucene/core/.../search/TopDocs.java merge semantics) combined
with a cosine top-k list over an embedding column (the
KnnFloatVectorQuery analog, `pipelines/ann.py`), fused by
RRF(d) = Σ_lists 1/(K + rank_list(d))  (Cormack et al., SIGIR 2009 —
public rank-fusion formula; also Lucene 9.x TopDocs.rrf).

Ray shape: the BM25 side runs through the shard actor pool (index
built once under /tmp, shared with `pipelines/fulltext.py`); the
vector side is ONE streaming pass over `embeddings` scoring all
probes per batch (per-batch partial top-k, driver merges k·probes
rows).  Fusion touches only the ≤ 2k fused candidates per query —
driver work is O(queries · k), never corpus-sized.

Strict parity: ranks are exact integers on both engines (BM25 float32
score ordering matches the independent DuckDB BM25 oracle; cosine
ordering matches list_cosine_similarity — both proven by existing
gates), and the fused score 1/(60+rb) + 1/(60+rv) is two correctly-
rounded IEEE divisions added in a FIXED order (bm25 term first), so
the driver's value-hash sees bit-identical doubles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from ..analysis import ENGLISH_STOP_WORDS, tokenize
from .common import Pipeline, read

# (text query ≤2 terms — float-sum order safety, see fulltext.py; probe vec_id)
HYBRID_SPECS: list[tuple[str, int]] = [("spark", 3), ("merge", 47), ("scan slow", 101)]
K_FUSE = 20  # depth of each input list
K_OUT = 10  # fused results returned per query
RRF_K = 60  # the standard RRF constant


def _probe_matrix(sf_dir: str) -> np.ndarray:
    pids = [p for _, p in HYBRID_SPECS]
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", pids)],  # row-group pruned
    )
    by_id = {int(v): np.asarray(e, dtype=np.float64) for v, e in zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist())}
    return np.stack([by_id[p] for p in pids])


def _vector_ranks(sf_dir: str) -> dict[tuple[int, int], int]:
    """(query_idx, vec_id) → cosine rank (1-based, ≤ K_FUSE); one pass."""
    Q = _probe_matrix(sf_dir)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        sims = (m @ Qn.T) / np.linalg.norm(m, axis=1)[:, None]  # (b, nq)
        frames = []
        for qi in range(Qn.shape[0]):
            d = pd.DataFrame({"qi": qi, "vec_id": batch["vec_id"], "sim": sims[:, qi]})
            frames.append(d.sort_values(["sim", "vec_id"], ascending=[False, True]).head(K_FUSE))
        return pd.concat(frames, ignore_index=True)

    parts = (
        read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(score, batch_format="pandas")
        .to_pandas()
    )
    out: dict[tuple[int, int], int] = {}
    for qi, grp in parts.groupby("qi"):
        top = grp.sort_values(["sim", "vec_id"], ascending=[False, True]).head(K_FUSE)
        for r, vid in enumerate(top["vec_id"].to_numpy(), start=1):
            out[(int(qi), int(vid))] = r
    return out


def _bm25_ranks(sf_dir: str) -> dict[tuple[int, int], int]:
    from .fulltext import _searcher

    out: dict[tuple[int, int], int] = {}
    with _searcher(sf_dir) as s:
        for qi, (q, _) in enumerate(HYBRID_SPECS):
            hits = s.search(q, K_FUSE)
            if not hits:
                continue
            fetched = s.fetch([d for d, _ in hits])
            conv_by_doc = {r["doc_id"]: r["conv_id"] for r in fetched.to_pylist()}
            for r, (docid, _score) in enumerate(hits, start=1):
                out[(qi, int(conv_by_doc[docid].split("-")[1]))] = r
    return out


def hybrid_rrf(sf_dir: str) -> pd.DataFrame:
    br = _bm25_ranks(sf_dir)
    vr = _vector_ranks(sf_dir)
    rows = []
    for qi, (q, _) in enumerate(HYBRID_SPECS):
        ids = sorted({d for (i, d) in br if i == qi} | {d for (i, d) in vr if i == qi})
        cand = []
        for d in ids:
            rb = br.get((qi, d), 0)
            rv = vr.get((qi, d), 0)
            # FIXED addition order (bm25 first) — mirrors the SQL twin
            s = (1.0 / (RRF_K + rb) if rb else 0.0) + (1.0 / (RRF_K + rv) if rv else 0.0)
            cand.append((d, rb, rv, s))
        cand.sort(key=lambda t: (-t[3], t[0]))
        for fr, (d, rb, rv, s) in enumerate(cand[:K_OUT], start=1):
            rows.append({"query": q, "fused_rank": fr, "doc_id": d, "bm25_rank": rb, "vec_rank": rv, "rrf": s})
    df = pd.DataFrame(rows, columns=["query", "fused_rank", "doc_id", "bm25_rank", "vec_rank", "rrf"])
    for c in ("fused_rank", "doc_id", "bm25_rank", "vec_rank"):
        df[c] = df[c].astype("int64")
    df["rrf"] = df["rrf"].astype("float64")
    return df.sort_values(["query", "fused_rank"]).reset_index(drop=True)


def _hybrid_sql() -> str:
    stop_sql = "'" + "','".join(sorted(ENGLISH_STOP_WORDS)) + "'"
    qmap = ",".join(f"({qi}, '{q}', {pid})" for qi, (q, pid) in enumerate(HYBRID_SPECS))
    qt_rows = []
    for qi, (q, _) in enumerate(HYBRID_SPECS):
        for t, _p in tokenize(q):
            qt_rows.append(f"({qi}, '{t}')")
    qt_values = ",".join(qt_rows)
    return f"""
WITH qmap(qi, query, pid) AS (VALUES {qmap}),
toks AS (
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
qt(qi, term) AS (VALUES {qt_values}),
df AS (SELECT t AS term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY t),
tf AS (SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, t),
scored AS (
  SELECT qt.qi, tf.doc_id,
         SUM( (ln(1.0 + (n_docs - df.df + 0.5) / (df.df + 0.5)) * tf.tf)
              / (tf.tf + 1.2 * (0.25 + (0.75 * dlq.qdl) / (sum_dl * 1.0 / n_docs))) ) AS s
  FROM qt
  JOIN df ON df.term = qt.term
  JOIN tf ON tf.term = qt.term
  JOIN dlq ON dlq.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY qt.qi, tf.doc_id
),
br AS (
  SELECT qi, doc_id,
         CAST(row_number() OVER (PARTITION BY qi ORDER BY CAST(s AS FLOAT) DESC, doc_id) AS BIGINT) AS r
  FROM scored
  QUALIFY r <= {K_FUSE}
),
pv AS (
  SELECT qmap.qi, CAST(e.embedding AS DOUBLE[]) AS qv
  FROM qmap JOIN embeddings e ON e.vec_id = qmap.pid
),
vr AS (
  SELECT qi, vec_id,
         CAST(row_number() OVER (PARTITION BY qi ORDER BY sim DESC, vec_id) AS BIGINT) AS r
  FROM (
    SELECT pv.qi, e.vec_id,
           list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), pv.qv) AS sim
    FROM pv CROSS JOIN embeddings e
  )
  QUALIFY r <= {K_FUSE}
),
fused AS (
  SELECT COALESCE(br.qi, vr.qi) AS qi,
         COALESCE(br.doc_id, vr.vec_id) AS doc_id,
         COALESCE(br.r, 0) AS bm25_rank,
         COALESCE(vr.r, 0) AS vec_rank,
         COALESCE(1.0 / ({RRF_K} + br.r), 0.0) + COALESCE(1.0 / ({RRF_K} + vr.r), 0.0) AS rrf
  FROM br FULL OUTER JOIN vr ON br.qi = vr.qi AND br.doc_id = vr.vec_id
)
SELECT qmap.query,
       CAST(row_number() OVER (PARTITION BY fused.qi ORDER BY rrf DESC, doc_id) AS BIGINT) AS fused_rank,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(bm25_rank AS BIGINT) AS bm25_rank,
       CAST(vec_rank AS BIGINT) AS vec_rank,
       rrf
FROM fused JOIN qmap ON qmap.qi = fused.qi
QUALIFY fused_rank <= {K_OUT}
ORDER BY query, fused_rank
"""


HYBRID_SQL = _hybrid_sql()

PIPELINES: dict[str, Pipeline] = {
    "hybrid_rrf": Pipeline(
        hybrid_rrf,
        HYBRID_SQL,
        "hybrid BM25+cosine retrieval fused by Reciprocal Rank Fusion, vs a full SQL twin (independent BM25 oracle + list_cosine_similarity ranks)",
    ),
}
