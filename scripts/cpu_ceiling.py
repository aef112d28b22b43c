#!/usr/bin/env python3
"""Same-day hardware ceiling for the N-vs-4N scaling protocol.

The pinned scaling measurement (bench.py --scaling) emulates N and 4N
executors as taskset-pinned process trees on ONE box. A single chip
does not hold per-core frequency constant across active-core counts:
with few cores busy it turbos higher, with many busy it clocks lower
(and shares one memory bus) — a real 4N-executor cluster has neither
penalty, so the raw single-box ratio UNDERSTATES cluster scaling
whenever the host's turbo asymmetry is large that day.

This script measures that asymmetry directly: a pure-CPU integer
busy-loop (no memory traffic, no Python allocation in the hot loop,
no Spark) pinned to 4 cores vs 16 cores, reporting per-core
throughput and the 16-vs-4 per-core ratio — the frequency ceiling any
perfectly-scaling job could measure on this box today. Steal time is
sampled across the runs to rule out hypervisor contention.

Report `raw efficiency` and `raw / ceiling` side by side: the second
is the job's own scaling behavior with the single-box frequency
artifact divided out.

Run: python scripts/cpu_ceiling.py  (prints one JSON line)
"""

from __future__ import annotations

import json
import subprocess
import sys

WORK = r'''
import time
t0 = time.monotonic(); n = 0; x = 0
while time.monotonic() - t0 < 6.0:
    for _ in range(10000):
        x = (x * 1103515245 + 12345) & 0xffffffff
    n += 10000
print(n)
'''


def _stat():
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:9]))


def run(ncore: int, cpus: str):
    procs = [subprocess.Popen(
        ["taskset", "-c", cpus, sys.executable, "-c", WORK],
        stdout=subprocess.PIPE) for _ in range(ncore)]
    s0 = _stat()
    total = sum(int(p.communicate()[0]) for p in procs)
    s1 = _stat()
    d = [b - a for a, b in zip(s0, s1)]
    steal_pct = 100 * d[7] / max(sum(d), 1)
    return total / ncore / 6.0, steal_pct


def main() -> None:
    per4, st4 = run(4, "0-3")
    per16, st16 = run(16, "0-15")
    print(json.dumps({
        "iters_per_sec_per_core_4": round(per4),
        "iters_per_sec_per_core_16": round(per16),
        "per_core_ratio_16_vs_4": round(per16 / per4, 3),
        "steal_pct_4": round(st4, 2),
        "steal_pct_16": round(st16, 2),
    }))


if __name__ == "__main__":
    main()
