#!/usr/bin/env python
"""Hardware control experiment for the scaling benchmark.

Measures how raw, Spark-free CPU throughput scales with process count on
THIS host (fixed total work, embarrassingly parallel) — the ceiling any
data-pipeline scaling number must be judged against. On shared/virtualized
sandboxes the advertised core count routinely exceeds the host's effective
parallelism; this probe quantifies that gap so BENCH/BASELINE.md can report
pipeline efficiency alongside the hardware efficiency at the same core pair.

Usage: python bench_cpu_control.py [procs ...]   (default: 2 4 8 16 32)
Prints one JSON line: {"procs": {n: seconds}, "pairs": {"N->4N": eff}}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

CHUNK = 5_000_000
N_TASKS = 160


def burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def bench(procs: int) -> float:
    tasks = [CHUNK] * N_TASKS
    t0 = time.perf_counter()
    with mp.Pool(procs) as pool:
        pool.map(burn, tasks)
    return time.perf_counter() - t0


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [2, 4, 8, 16, 32]
    times = {n: round(bench(n), 2) for n in counts}
    pairs = {}
    for n in counts:
        m = n * 4
        if m in times:
            pairs[f"{n}->{m}"] = round((times[n] / times[m]) / 4, 3)
        d = n * 2
        if d in times:
            pairs[f"{n}->{d}"] = round((times[n] / times[d]) / 2, 3)
    print(json.dumps({"procs": times, "efficiency": pairs}))


if __name__ == "__main__":
    main()
