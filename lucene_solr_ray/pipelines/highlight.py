"""UnifiedHighlighter passage scoring (lucene/highlighter/src/java/org/
apache/lucene/search/uhighlight/UnifiedHighlighter.java + PassageScorer +
DefaultPassageFormatter) — the r3 "highlighter long tail" item.

Semantics implemented (and replicated literally in the SQL twin):

- passages are FIXED token windows of `HL_FRAGSIZE` tokens (the
  LengthGoalBreakIterator / hl.fragsize analog; sentence BreakIterator is
  out of scope — fixed windows are the deterministic shape both sides can
  share);
- PassageScorer.java arithmetic, exactly:
      tf(freq, plen)  = freq / (freq + k1·((1−b) + b·plen/pivot))
      weight(dl, ttf) = (k1+1) · ln(1 + ((1 + dl/pivot) + 0.5)/(ttf + 0.5))
  with k1=1.2, b=0.75, pivot=87; ttf is the COLLECTION total term
  frequency (PassageScorer weights against TermsEnum.totalTermFreq), dl
  the document token count.  Weights use scalar math.log (libm) — DuckDB's
  ln() matches libm, np.log does not always (CLAUDE.md);
- passage score = Σ over the query terms IN SORTED TERM ORDER of
  weight·tf (the SQL twin sums with SUM(... ORDER BY term), which DuckDB
  evaluates sequentially — cross-term float sums are order-sensitive);
- top `HL_SNIPPETS` passages per doc by (score desc, passage asc) —
  hl.snippets;
- DefaultPassageFormatter markup: matched terms wrapped in <em>…</em>,
  tokens joined by single spaces (the analyzed-token view of the text).

Scale shape: one vectorized pass per batch — token explode, composite
(doc, passage, term) keys, np.unique counts; only the ≤2·docs matched
(doc, term) weight rows pay the scalar libm loop; the collection ttf of
the (tiny, fixed) query term set is collected via bounded partials and
broadcast, never a vocabulary shuffle.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from .common import Pipeline, read
from .text import TOKEN_RE, _explode_tokens

HL_TERMS = ("merge", "spark")  # sorted; the gate's fixed query
HL_FRAGSIZE = 20
HL_SNIPPETS = 2
HL_K1, HL_B, HL_PIVOT = 1.2, 0.75, 87.0


def _tf_norm(freq: np.ndarray, plen: np.ndarray) -> np.ndarray:
    f = freq.astype(np.float64)
    return f / (f + HL_K1 * ((1.0 - HL_B) + HL_B * plen.astype(np.float64) / HL_PIVOT))


def _weight(dl: float, ttf: float) -> float:
    num_docs = 1.0 + dl / HL_PIVOT
    return (HL_K1 + 1.0) * math.log(1.0 + (num_docs + 0.5) / (ttf + 0.5))


def score_passages(
    tokens: list[str], terms: tuple[str, ...], ttf_of: dict[str, int],
    fragsize: int = HL_FRAGSIZE, snippets: int = HL_SNIPPETS,
    tag_pre: str = "<em>", tag_post: str = "</em>",
) -> list[tuple[int, float, str]]:
    """Single-document reference scorer → [(passage_idx, score, snippet)],
    best first.  Used by Searcher.highlight (≤k docs) and as the pytest
    oracle for the vectorized batch pipeline."""
    dl = len(tokens)
    term_set = set(terms)
    scores: dict[int, float] = {}
    for t in sorted(term_set):
        w = _weight(float(dl), float(ttf_of.get(t, 0)))
        for p in range(0, (dl + fragsize - 1) // fragsize):
            window = tokens[p * fragsize : (p + 1) * fragsize]
            freq = sum(1 for x in window if x == t)
            if freq:
                tf = float(_tf_norm(np.array([freq]), np.array([len(window)]))[0])
                scores[p] = scores.get(p, 0.0) + w * tf
    best = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:snippets]
    out = []
    for p, s in best:
        window = tokens[p * fragsize : (p + 1) * fragsize]
        snip = " ".join(f"{tag_pre}{x}{tag_post}" if x in term_set else x for x in window)
        out.append((p, s, snip))
    return out


def _collection_ttf(sf_dir: str) -> dict[str, int]:
    """Collection totalTermFreq of the fixed query terms — per-batch
    partial counts, driver sum (bounded by |terms|, no shuffle)."""

    def part(batch: pd.DataFrame) -> pd.DataFrame:
        _, codes, uniq, _ = _explode_tokens(batch["text"])
        out = {}
        for t in HL_TERMS:
            hit = np.flatnonzero(uniq == t)
            out[t] = int((codes == hit[0]).sum()) if hit.size else 0
        return pd.DataFrame({"term": list(out), "ttf": np.array(list(out.values()), np.int64)})

    parts = read(sf_dir, "documents", ["text"]).map_batches(part, batch_format="pandas").to_pandas()
    g = parts.groupby("term")["ttf"].sum()
    return {t: int(g.get(t, 0)) for t in HL_TERMS}


def highlight_unified(sf_dir: str):
    ttf = _collection_ttf(sf_dir)

    def hl(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "passage": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
                "snippet": pd.Series([], dtype=object),
            }
        )
        doc_idx, codes, uniq, counts = _explode_tokens(batch["text"])
        if not codes.size:
            return empty
        offsets = np.zeros(len(counts), dtype=np.int64)
        if len(counts) > 1:
            offsets[1:] = counts.cumsum()[:-1]
        pos = np.arange(codes.size, dtype=np.int64) - np.repeat(offsets, counts)
        passage = pos // HL_FRAGSIZE
        n_pass_max = int(passage.max()) + 1
        ids = batch["doc_id"].to_numpy()
        # per (doc, passage, term) freqs over matched tokens only
        acc: dict[tuple[int, int], float] = {}
        for t in HL_TERMS:  # sorted order — the twin's SUM(ORDER BY term)
            hit = np.flatnonzero(uniq == t)
            if not hit.size:
                continue
            sel = codes == hit[0]
            if not sel.any():
                continue
            keys = doc_idx[sel] * n_pass_max + passage[sel]
            ukey, freq = np.unique(keys, return_counts=True)
            d_i = ukey // n_pass_max
            p_i = ukey % n_pass_max
            plen = np.minimum(counts[d_i] - p_i * HL_FRAGSIZE, HL_FRAGSIZE)
            tfs = _tf_norm(freq, plen)
            # per-doc weight with scalar libm log (ln parity with DuckDB)
            dtf_docs, dls = np.unique(d_i), counts
            w_of = {int(d): _weight(float(dls[d]), float(ttf.get(t, 0))) for d in dtf_docs}
            for j in range(ukey.size):
                k = (int(d_i[j]), int(p_i[j]))
                acc[k] = acc.get(k, 0.0) + w_of[int(d_i[j])] * float(tfs[j])
        if not acc:
            return empty
        rows = pd.DataFrame(
            {
                "d": [k[0] for k in acc],
                "passage": [k[1] for k in acc],
                "score": list(acc.values()),
            }
        )
        rows = rows.sort_values(["d", "score", "passage"], ascending=[True, False, True])
        rows = rows.groupby("d").head(HL_SNIPPETS)
        # snippets only for the bounded winner set
        term_set = set(HL_TERMS)
        snips = []
        for d, p in zip(rows["d"], rows["passage"]):
            lo = offsets[d] + p * HL_FRAGSIZE
            hi = min(offsets[d] + counts[d], lo + HL_FRAGSIZE)
            window = uniq[codes[lo:hi]]
            snips.append(
                " ".join(f"<em>{x}</em>" if x in term_set else x for x in window)
            )
        return pd.DataFrame(
            {
                "doc_id": ids[rows["d"].to_numpy()],
                "passage": rows["passage"].to_numpy(np.int64),
                "score": rows["score"].to_numpy(np.float64),
                "snippet": np.array(snips, dtype=object),
            }
        )

    out = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(hl, batch_format="pandas")
    df = out.to_pandas()
    if "doc_id" not in df.columns or not len(df):
        df = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "passage": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
                "snippet": pd.Series([], dtype=object),
            }
        )
    return df.sort_values(["doc_id", "passage"]).reset_index(drop=True)


def _sql() -> str:
    terms = "', '".join(HL_TERMS)
    contrib = f"""(freq / (freq + {HL_K1} * ((1 - {HL_B}) + {HL_B} * plen / {HL_PIVOT})))
            * (({HL_K1} + 1) * ln(1 + ((1 + dl / {HL_PIVOT}) + 0.5) / (ttf + 0.5)))"""
    return f"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS DOUBLE) AS dl
  FROM documents
),
ttfs AS (
  SELECT tok AS term, CAST(COUNT(*) AS DOUBLE) AS ttf
  FROM (SELECT unnest(toks) AS tok FROM d) WHERE tok IN ('{terms}')
  GROUP BY tok
),
pw AS (
  SELECT doc_id, dl, toks, unnest(range(0, CAST(ceil(len(toks) / {HL_FRAGSIZE}.0) AS BIGINT))) AS p
  FROM d WHERE len(toks) > 0
),
win AS (
  SELECT doc_id, dl, p,
         toks[p * {HL_FRAGSIZE} + 1 : least((p + 1) * {HL_FRAGSIZE}, CAST(dl AS BIGINT))] AS sl
  FROM pw
),
contrib AS (
  SELECT w.doc_id, w.p, t.term,
         CAST(len(list_filter(w.sl, x -> x = t.term)) AS DOUBLE) AS freq,
         CAST(len(w.sl) AS DOUBLE) AS plen, w.dl, t.ttf, w.sl
  FROM win w CROSS JOIN ttfs t
),
scored AS (
  SELECT doc_id, p,
         SUM({contrib} ORDER BY term) AS score,
         any_value(sl) AS sl
  FROM contrib WHERE freq > 0
  GROUP BY doc_id, p
),
top AS (
  SELECT doc_id, p, score, sl,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, p) AS rn
  FROM scored
)
SELECT doc_id, CAST(p AS BIGINT) AS passage, score,
       array_to_string([CASE WHEN x IN ('{terms}') THEN '<em>' || x || '</em>' ELSE x END for x in sl], ' ') AS snippet
FROM top WHERE rn <= {HL_SNIPPETS}
ORDER BY doc_id, passage
"""


HIGHLIGHT_UNIFIED_SQL = _sql()

PIPELINES: dict[str, Pipeline] = {
    "highlight_unified": Pipeline(
        highlight_unified,
        HIGHLIGHT_UNIFIED_SQL,
        "UnifiedHighlighter passage scoring: fixed token windows, PassageScorer arithmetic, top-N snippets with <em> markup",
    ),
}
