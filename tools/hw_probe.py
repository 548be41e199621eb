#!/usr/bin/env python
"""Ray-free hardware scaling probe (BASELINE.md appendix).

Runs the build's characteristic kernel (numpy lexsort + run-length
boundaries + segmented reduce over int64 arrays — the SPIMI invert/merge
workload shape) in N independent PROCESSES and reports aggregate work
units/s per N.  No Ray, no shared state: any sub-linear scaling here is
the MACHINE (memory bandwidth / SMT / steal), not orchestration.

Usage: python tools/hw_probe.py [--procs 1,4,8,16,32] [--units 2]
Prints one JSON line {"probe": {N: units_per_sec, ...}}.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

import numpy as np


def _unit(seed: int) -> int:
    rng = np.random.default_rng(seed)
    n = 4_000_000
    terms = rng.integers(0, 20_000, n)
    docs = rng.integers(0, 1_000_000, n)
    pos = rng.integers(0, 512, n)
    order = np.lexsort((pos, docs, terms))
    t, d = terms[order], docs[order]
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = (t[1:] != t[:-1]) | (d[1:] != d[:-1])
    starts = np.flatnonzero(new)
    freqs = np.diff(np.append(starts, n))
    return int(freqs.sum())


def _worker(seed: int, units: int, out: "mp.Queue") -> None:
    t0 = time.monotonic()
    for u in range(units):
        _unit(seed * 1000 + u)
    out.put(time.monotonic() - t0)


def run(procs: list[int], units: int) -> dict[int, float]:
    res = {}
    for p in procs:
        q: "mp.Queue" = mp.Queue()
        ws = [mp.Process(target=_worker, args=(i, units, q)) for i in range(p)]
        t0 = time.monotonic()
        for w in ws:
            w.start()
        for w in ws:
            w.join()
        wall = time.monotonic() - t0
        res[p] = round(p * units / wall, 3)
        _ = [q.get() for _ in ws]
    return res


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,4,8,16,32")
    ap.add_argument("--units", type=int, default=2)
    a = ap.parse_args()
    procs = [int(x) for x in a.procs.split(",")]
    print(json.dumps({"probe": run(procs, a.units)}))
