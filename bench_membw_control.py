#!/usr/bin/env python
"""Memory-bandwidth scaling control (companion to bench_cpu_control.py).

bench_cpu_control's integer loop is cache-resident and measures CPU-core
scaling; the pipeline's hot kernels (numpy JW slabs, minhash reduceat,
Arrow serialization) stream memory instead. This control measures how
BANDWIDTH-bound numpy work scales with process count on this host — the
ceiling the vectorized-kernel stages must be judged against.

Usage: python bench_membw_control.py [procs ...]   (default: 2 8 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

ARR_MB = 64          # per-task working set: far beyond L3 per core
N_TASKS = 64         # fixed total work, embarrassingly parallel


def stream(_: int) -> float:
    a = np.random.RandomState(1).randint(0, 255, ARR_MB * 1024 * 1024 // 8)
    b = np.empty_like(a)
    s = 0.0
    for _ in range(4):
        np.add(a, 1, out=b)       # read+write stream
        s += float(b[::4096].sum())
    return s


def run(procs: int) -> float:
    t0 = time.perf_counter()
    with mp.get_context("spawn").Pool(procs) as pool:
        pool.map(stream, range(N_TASKS), chunksize=max(1, N_TASKS // procs))
    return time.perf_counter() - t0


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [2, 8, 32]
    res = {n: round(run(n), 2) for n in levels}
    eff = {}
    for lo, hi in zip(levels, levels[1:]):
        eff[f"{lo}->{hi}"] = round((res[lo] / res[hi]) / (hi / lo), 3)
    print(json.dumps({"procs": res, "efficiency": eff, "arr_mb": ARR_MB}))


if __name__ == "__main__":
    main()
