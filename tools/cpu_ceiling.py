"""Measure the PLATFORM's parallel-scaling ceiling, Spark-free.

Runs K independent single-pinned-core worker processes (shared-nothing:
each loops sha256 over a private 1 MiB buffer plus a cache-resident
256x256 matmul — no files, no IPC, no shared memory beyond the
machine's own bandwidth) at N and 4N processes and reports per-process
throughput at both plus the ceiling ratio.

Why it exists: scaling-efficiency numbers for Spark jobs on this host
kept landing at 0.67-0.78 from local[8] to local[32] with ~0% measured
hypervisor steal and no single-wave scheduling artifact. If the
HARDWARE delivers fewer cycles per core as more cores go active
(frequency scaling, hypervisor aggregate-cycle caps, memory-bandwidth
saturation), then NO workload — Spark or otherwise — can scale at 1.0,
and an engine's efficiency should be read against the measured ceiling:

    engine_scaling_quality = eff_engine / eff_ceiling

Measured on this sandbox (2026-08-17): per-process iterations 3226 at
8 procs vs 2343 at 32 procs -> ceiling 0.726. The pip64 spatial join at
0.677 raw is therefore 93% of what the platform gives ANY
embarrassingly-parallel workload at the same widths.

Usage: python tools/cpu_ceiling.py [N] [seconds]   (default 8, 10)
Prints one JSON line {"n": ..., "n4": ..., "per_proc_n": ...,
"per_proc_4n": ..., "ceiling": ...}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import hashlib, os, sys, time
import numpy as np

buf = os.urandom(1 << 20)
a = np.random.rand(256, 256)
t_end = time.perf_counter() + float(sys.argv[1])
n = 0
while time.perf_counter() < t_end:
    hashlib.sha256(buf).hexdigest()
    a @ a
    n += 1
print(n)
"""


def run_level(k: int, seconds: float) -> int:
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", WORKER, str(seconds)],
            stdout=subprocess.PIPE,
            text=True,
        )
        for i in range(k)
    ]
    return sum(int(p.communicate()[0]) for p in procs)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    n4 = 4 * n
    if n4 > (os.cpu_count() or n4):
        raise SystemExit(f"need {n4} CPUs")
    # interleave N, 4N, N and keep the better N observation, mirroring
    # the scaling_run protocol's defense against ambient drift
    t_n_a = run_level(n, seconds)
    t_4n = run_level(n4, seconds)
    t_n_b = run_level(n, seconds)
    t_n = max(t_n_a, t_n_b)
    per_n = t_n / n
    per_4n = t_4n / n4
    print(
        json.dumps(
            {
                "n": n,
                "n4": n4,
                "per_proc_n": round(per_n, 1),
                "per_proc_4n": round(per_4n, 1),
                "ceiling": round(per_4n / per_n, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
