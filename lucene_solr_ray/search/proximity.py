"""Proximity (sloppy phrase) matching, shared by engine and oracle.

Semantics (lucene/core/src/java/org/apache/lucene/search/
SloppyPhraseMatcher.java): an ordered occurrence p1 < p2 < … < pn matches
at slop s when matchLength = (pn − p1) − (n−1) ≤ s; each match
contributes Lucene's sloppyWeight **1/(1+matchLength)** to the phrase
frequency (PhraseScorer.sloppyWeight), so the freq is a float.  Greedy
minimal matches: for each viable p1, extend with the smallest admissible
next positions.  The engine's vectorized chain matcher and the
brute-force oracle share this definition exactly (summation in p1 order
on both sides — float parity).
"""

from __future__ import annotations

import bisect


def sloppy_phrase_freq(pos_lists: list[list[int]], slop: int) -> float:
    """pos_lists[i] = sorted positions of phrase term i in one document."""
    if not pos_lists or any(not p for p in pos_lists):
        return 0.0
    n = len(pos_lists)
    total = 0.0
    for p1 in pos_lists[0]:
        prev = p1
        ok = True
        for i in range(1, n):
            j = bisect.bisect_right(pos_lists[i], prev)
            if j == len(pos_lists[i]):
                ok = False
                break
            prev = pos_lists[i][j]
        if ok:
            match_len = (prev - p1) - (n - 1)
            if match_len <= slop:
                total += 1.0 / (1.0 + match_len)
    return total
