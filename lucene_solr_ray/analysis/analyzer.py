"""StandardAnalyzer-equivalent analysis chain, scalar + Arrow-vectorized.

Reference semantics (SURVEY.md §2.2):
- StandardTokenizer: UAX#29 word-break, maxTokenLength=255 (longer runs are
  emitted as 255-char pieces)
  (lucene/core/src/java/org/apache/lucene/analysis/standard/StandardTokenizer.java).
- LowerCaseFilter: per-codepoint lowercase
  (lucene/core/src/java/org/apache/lucene/analysis/LowerCaseFilter.java).
- StopFilter with the 33-word English default set, leaving POSITION GAPS:
  a surviving token keeps its pre-stop position index
  (lucene/analysis/common/.../en/EnglishAnalyzer.java :: ENGLISH_STOP_WORDS_SET,
  lucene/core/.../analysis/StopFilter.java via FilteringTokenFilter).
- Document length (the norm input) counts INDEXED tokens only — stopwords do
  not contribute (lucene/core/.../index/DefaultIndexingChain.java counts
  invertState.length per indexed token); SURVEY.md §7.0.

Tokenizer fidelity note (SURVEY.md §7.3): full UAX#29 is approximated with a
compiled regex over the fixture character domain (ASCII letters/digits/_ with
common punctuation as breaks).  The FIXTURES.md generator is pinned to this
domain; the scalar `tokenize` is the single source of truth and the
vectorized `analyze_batch` is property-tested equal to it.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# lucene/analysis/common/.../en/EnglishAnalyzer.java :: ENGLISH_STOP_WORDS_SET
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

MAX_TOKEN_LENGTH = 255

# token = run of word chars (ASCII letters, digits, underscore) — the pinned
# UAX#29 approximation for the fixture charset
_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")
_SPLIT_PATTERN = r"[^a-z0-9_]+"  # applied AFTER lowercasing in the vectorized path


def tokenize(
    text: str,
    remove_stopwords: bool = True,
    max_token_length: int = MAX_TOKEN_LENGTH,
) -> list[tuple[str, int]]:
    """Canonical scalar analysis: text → [(term, position)].

    Positions are indices in the pre-stop-removal token stream (stopword
    removal leaves gaps, mirroring StopFilter's posInc accumulation).
    """
    out: list[tuple[str, int]] = []
    pos = 0
    for m in _TOKEN_RE.finditer(text):
        tok = m.group().lower()
        # maxTokenLength: longer runs are split into max-length pieces
        for i in range(0, len(tok), max_token_length):
            piece = tok[i : i + max_token_length]
            if remove_stopwords and piece in ENGLISH_STOP_WORDS:
                pos += 1
                continue
            out.append((piece, pos))
            pos += 1
    return out


def doc_length(text: str) -> int:
    """Number of indexed tokens (stopwords excluded) — the norm input."""
    return len(tokenize(text))


_STOP_ARROW = pa.array(sorted(ENGLISH_STOP_WORDS), type=pa.string())


def analyze_batch(texts: pa.Array | pa.ChunkedArray) -> dict[str, np.ndarray]:
    """Vectorized analysis of a batch of documents.

    Returns flat token arrays:
      row:   int64  — row index within the batch, per token
      term:  object — token strings (lowercased, stop-filtered)
      pos:   int64  — pre-stop position within the document
    plus per-row stats:
      dl:    int64  — indexed-token count per row (norm input)

    Implementation: pc.utf8_lower → pc.split_pattern_regex on the non-token
    class → flatten list offsets with numpy → empty-string mask →
    position/stopword bookkeeping, all without a per-row Python loop.  Rows
    containing a token longer than MAX_TOKEN_LENGTH (rare) fall back to the
    scalar path for exact equivalence.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_rows = len(texts)
    lower = pc.utf8_lower(pc.fill_null(texts, ""))
    parts = pc.split_pattern_regex(lower, pattern=_SPLIT_PATTERN)
    flat = parts.flatten()
    offsets = parts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    row_of = np.repeat(np.arange(n_rows, dtype=np.int64), counts)

    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = lens > 0

    # rows needing the scalar fallback (any token piece longer than the cap)
    too_long = lens > MAX_TOKEN_LENGTH
    if too_long.any():
        fallback_rows = np.unique(row_of[too_long])
        fb_mask_tok = np.isin(row_of, fallback_rows)
    else:
        fallback_rows = np.empty(0, dtype=np.int64)
        fb_mask_tok = np.zeros(len(lens), dtype=bool)

    # a "real token" part: non-empty and not owned by a fallback row
    tok_mask = nonempty & ~fb_mask_tok
    # position within row among real tokens: cum[i]-1 minus tokens before row
    cum = np.cumsum(tok_mask).astype(np.int64)
    c0 = np.concatenate([[0], cum])
    tokens_before_row = c0[offsets[:-1]]
    # stopword mask on all parts (vectorized Arrow membership)
    stop_all = np.asarray(
        pc.is_in(flat, value_set=_STOP_ARROW).to_numpy(zero_copy_only=False), dtype=bool
    )
    keep = tok_mask & ~stop_all
    keep_idx = np.flatnonzero(keep)
    rows = row_of[keep_idx]
    poss = cum[keep_idx] - 1 - tokens_before_row[rows]
    terms = flat.take(pa.array(keep_idx)).to_numpy(zero_copy_only=False)

    dl = np.bincount(rows, minlength=n_rows).astype(np.int64)

    if fallback_rows.size:
        # scalar path for the rare long-token rows, then merge
        extra_rows, extra_terms, extra_pos = [], [], []
        py_texts = texts.to_pylist()
        for r in fallback_rows:
            toks = tokenize(py_texts[int(r)])
            dl[int(r)] = len(toks)
            for t, p in toks:
                extra_rows.append(int(r))
                extra_terms.append(t)
                extra_pos.append(p)
        if extra_rows:
            rows = np.concatenate([rows, np.asarray(extra_rows, dtype=np.int64)])
            terms = np.concatenate([terms, np.asarray(extra_terms, dtype=object)])
            poss = np.concatenate([poss, np.asarray(extra_pos, dtype=np.int64)])
            order = np.argsort(rows, kind="stable")
            rows, terms, poss = rows[order], terms[order], poss[order]

    return {"row": rows, "term": terms, "pos": poss, "dl": dl}


class StandardAnalyzer:
    """Composable analyzer facade (registry-style, SURVEY.md §2.11).

    v1 ships the standard chain; extra components (ngram, shingle, …) live in
    `analysis.extras` and compose as list[Token] → list[Token] functions.
    """

    def __init__(self, remove_stopwords: bool = True):
        self.remove_stopwords = remove_stopwords

    def tokenize(self, text: str) -> list[tuple[str, int]]:
        return tokenize(text, remove_stopwords=self.remove_stopwords)

    def terms(self, text: str) -> list[str]:
        return [t for t, _ in self.tokenize(text)]
