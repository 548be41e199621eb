"""Shared min-cost segmentation lattice (the Viterbi walk kuromoji-lite
introduced in `analysis/ja.py`, generalized so the smartcn-lite Chinese
chain can reuse the exact algorithm with its own dictionary).

`by_first` maps first-char → [(word, cost)] ordered longest-first;
`unk_edge(run, i) -> (j, cost)` supplies the single unknown-word edge out
of position i (per-char or grouped, per the caller's character classes).
Ties break toward the edge relaxed first — dictionary edges longest
first, then the unknown edge — so equal-cost splits prefer the longer
first token (deterministic, same contract as analysis/ja.py)."""

from __future__ import annotations

from typing import Callable


def viterbi_spans(
    run: str,
    by_first: dict[str, list[tuple[str, float]]],
    unk_edge: Callable[[str, int], tuple[int, float]],
) -> list[tuple[int, int]]:
    """Min-cost lattice walk → [(start, end)] token spans covering `run`."""
    n = len(run)
    INF = float("inf")
    best = [INF] * (n + 1)
    best[0] = 0.0
    back = [0] * (n + 1)
    for i in range(n):
        if best[i] == INF:
            continue
        for w, c in by_first.get(run[i], ()):
            j = i + len(w)
            if j <= n and run.startswith(w, i):
                nc = best[i] + c
                if nc < best[j]:
                    best[j], back[j] = nc, i
        j, cost = unk_edge(run, i)
        nc = best[i] + cost
        if nc < best[j]:
            best[j], back[j] = nc, i
    spans: list[tuple[int, int]] = []
    j = n
    while j > 0:
        i = back[j]
        spans.append((i, j))
        j = i
    spans.reverse()
    return spans
