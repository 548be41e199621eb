"""Proximity (sloppy phrase) matching, shared by engine and oracle.

Semantics (documented variant of lucene/core/src/java/org/apache/lucene/
search/SloppyPhraseMatcher.java): an ordered occurrence p1 < p2 < … < pn
matches at slop s when (pn − p1) − (n−1) ≤ s; phrase frequency is the
number of greedy minimal matches (for each viable p1, extend with the
smallest admissible next positions).  Lucene additionally weights each
sloppy match by 1/(matchLength+1); we count integral matches — the engine
and the brute-force oracle share THIS implementation, so the duel checks
the distributed machinery, and the divergence from Lucene's weighting is
confined to one documented function.
"""

from __future__ import annotations

import bisect


def sloppy_phrase_freq(pos_lists: list[list[int]], slop: int) -> int:
    """pos_lists[i] = sorted positions of phrase term i in one document."""
    if not pos_lists or any(not p for p in pos_lists):
        return 0
    n = len(pos_lists)
    count = 0
    for p1 in pos_lists[0]:
        prev = p1
        ok = True
        for i in range(1, n):
            j = bisect.bisect_right(pos_lists[i], prev)
            if j == len(pos_lists[i]):
                ok = False
                break
            prev = pos_lists[i][j]
        if ok and (prev - p1) - (n - 1) <= slop:
            count += 1
    return count
