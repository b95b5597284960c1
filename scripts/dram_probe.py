#!/usr/bin/env python
"""Aggregate DRAM-bandwidth probe: the binding-resource evidence for the
wide scaling step.

Runs a triad-style numpy stream (3 arrays of 64 MB, far beyond LLC) on
1, 8 and 32 pinned cores IN ISOLATION (never inside a timed pipeline
window — streaming that much memory evicts the JVMs' page cache, which is
why the in-window variant stays off by default, see bench_scaling).
Writes BENCH/DRAM.json; bench_scaling.write_baseline_md() renders it.

The point: local[8] -> local[32] multiplies task slots 4x but this VM's
memory bus by ~1.5x; a real 8->32 EXECUTOR scale-out multiplies DRAM,
LLC and shuffle disks 4x. The gap between the pipeline's wide-step
efficiency and 1.0 is bounded below by this number, not by the plan.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _stream_worker(core: int, n_iters: int, out_q) -> None:
    import numpy as np

    os.sched_setaffinity(0, {core})
    a = np.ones(64 * 1024 * 1024 // 8)
    b = np.ones_like(a)
    t0 = time.time()
    for _ in range(n_iters):
        b = a * 1.000001 + b * 0.999999
    dt = time.time() - t0
    out_q.put((n_iters * 3 * a.nbytes) / dt)


def measure(n_threads: int, n_iters: int = 12) -> float:
    q = mp.Queue()
    ps = [
        mp.Process(target=_stream_worker, args=(c, n_iters, q))
        for c in range(n_threads)
    ]
    [p.start() for p in ps]
    rates = [q.get() for _ in ps]
    [p.join() for p in ps]
    return sum(rates) / 1e9


def main() -> None:
    out = {}
    for n in (1, 8, 32):
        out[str(n)] = round(measure(n), 2)
        print(f"{n:>2} threads: aggregate DRAM stream {out[str(n)]} GB/s")
    out["scale_8_32"] = round(out["32"] / out["8"], 3)
    path = os.path.join(HERE, "BENCH", "DRAM.json")
    with open(path, "w") as fh:
        fh.write(json.dumps(out) + "\n")
    print("wrote", path, "8->32 bandwidth scale:", out["scale_8_32"])


if __name__ == "__main__":
    main()
