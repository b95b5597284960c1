#!/usr/bin/env python
"""Run ``python bench.py`` while sampling the process tree's RSS.

Round-5 verdict #8 asked for per-query peak executor memory in the bench
JSON; ``bench.py`` is frozen for measurement, so this wrapper records the
evidence beside it instead: total RSS of the bench process tree (JVM +
python workers) sampled every 0.5 s, written to BENCH/PEAK_MEM_r06.json
with the bench's own stdout JSON attached. The headline number is the
peak — with the flat spotting matcher the 1M-form section no longer
drives 32 workers x 1.7 GB of private tries.

Usage: python scripts/peak_mem_bench.py [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def tree_rss_kb(root_pid: int) -> int:
    """Sum VmRSS over root_pid and every descendant (one /proc walk)."""
    children: dict[int, list[int]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            ppid = int(parts[3])
            children.setdefault(ppid, []).append(int(pid))
        except (OSError, IndexError, ValueError):
            continue
    total, stack = 0, [root_pid]
    while stack:
        pid = stack.pop()
        stack.extend(children.get(pid, []))
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        total += int(line.split()[1])
                        break
        except OSError:
            continue
    return total


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/PEAK_MEM_r06.json"
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, "bench.py"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    peak_kb, samples = 0, []
    while proc.poll() is None:
        rss = tree_rss_kb(proc.pid)
        peak_kb = max(peak_kb, rss)
        samples.append((round(time.time() - t0, 1), round(rss / 1024)))
        time.sleep(0.5)
    stdout = proc.stdout.read() if proc.stdout else ""
    bench_line = next(
        (ln for ln in stdout.splitlines() if ln.startswith('{"metric"')), None
    )
    result = {
        "peak_rss_gb": round(peak_kb / 1024 / 1024, 2),
        "wall_s": round(time.time() - t0, 1),
        "rc": proc.returncode,
        "samples_mb_every_500ms": samples[:: max(1, len(samples) // 400)],
        "bench": json.loads(bench_line) if bench_line else None,
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(json.dumps({"peak_rss_gb": result["peak_rss_gb"],
                      "wall_s": result["wall_s"], "rc": proc.returncode}))


if __name__ == "__main__":
    main()
