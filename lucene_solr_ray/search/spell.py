"""Spellcheck candidate generation — vectorized matrix Levenshtein.

The DirectSpellChecker shape (lucene/suggest/src/java/org/apache/lucene/
search/spell/DirectSpellChecker.java): dictionary terms within `max_edits`
of the input word, after a length-band prefilter.  ONE DP runs over all
candidate terms at once (loops go over term/word CHARS, never over the
vocabulary).

Runs SHARD-SIDE against each shard's local term dictionary
(`IndexShard.spellcheck_partial`); the driver merges partials by summing
per-shard dfs — the vocabulary never materializes on one node.
"""

from __future__ import annotations

import numpy as np


def levenshtein_candidates(
    terms: np.ndarray, dfs: np.ndarray, word: str, max_edits: int = 2
) -> list[tuple[str, int, int]]:
    """→ [(term, df, dist)] for dictionary terms with 1 ≤ dist ≤ max_edits.

    Keyword terms (containing ':') are excluded — suggestions come from the
    analyzed text vocabulary only.
    """
    if terms.size == 0:
        return []
    strs = terms.astype(str)
    lens = np.char.str_len(strs)
    mask = (np.char.find(strs, ":") < 0) & (np.abs(lens - len(word)) <= max_edits)
    cand, clens = strs[mask], lens[mask].astype(np.int64)
    cdfs = np.asarray(dfs)[mask]
    if cand.size == 0:
        return []
    n, lw = cand.size, len(word)
    lmax = int(clens.max())
    # char matrix via one utf-32 decode + segmented scatter
    flat = np.frombuffer("".join(cand).encode("utf-32-le"), dtype=np.uint32)
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(clens[:-1], out=offs[1:])
    M = np.zeros((n, lmax), dtype=np.uint32)
    rows = np.repeat(np.arange(n), clens)
    cols = np.arange(flat.size) - np.repeat(offs, clens)
    M[rows, cols] = flat
    wc = np.frombuffer(word.encode("utf-32-le"), dtype=np.uint32)
    prev = np.tile(np.arange(lw + 1, dtype=np.int32), (n, 1))
    dist = np.full(n, np.iinfo(np.int32).max, dtype=np.int32)
    for j in range(1, lmax + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = j
        cj = M[:, j - 1]
        for k in range(1, lw + 1):
            sub = prev[:, k - 1] + (cj != wc[k - 1])
            cur[:, k] = np.minimum(np.minimum(prev[:, k] + 1, cur[:, k - 1] + 1), sub)
        fin = clens == j
        dist[fin] = cur[fin, lw]
        prev = cur
    keep = np.flatnonzero((dist >= 1) & (dist <= max_edits))
    return [(str(cand[i]), int(cdfs[i]), int(dist[i])) for i in keep]
