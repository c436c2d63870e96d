"""Scaling-efficiency evidence (sandbox stand-in for N vs 4N executors):
run the flagship verify_tree job at local[8] and local[32] on identical
input in fresh JVMs, report pages/sec at both and efficiency
(tput_32 / tput_8) / 4. Appends results to BENCH/BASELINE.md.

Usage: python tools/scaling_run.py [sf_dir] [replication]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from fileverification_spark.session import get_spark
from fileverification_spark.sources import pages as P
from fileverification_spark.operators import verify as V

spark = get_spark("scaling", master="local[{cores}]")
live = P.pages_replicated(spark, {sf_dir!r}, {repl})
n = live.count()
stored = V.tampered_manifest(live)
# warm-up run: JIT/codegen + file listing out of the measurement
V.verify_tree(live, stored).count()
t0 = time.perf_counter()
rows = V.verify_tree(live, stored).count()
dt = time.perf_counter() - t0
print("RESULT " + json.dumps({{"cores": {cores}, "n_pages": n,
      "sec": round(dt, 3), "pages_per_sec": round(n / dt, 1),
      "rows": rows}}))
"""


def run(cores: int, sf_dir: str, repl: int) -> dict:
    code = CHILD.format(repo=REPO, cores=cores, sf_dir=sf_dir, repl=repl)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line (rc={out.returncode}):\n{out.stderr[-2000:]}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    r8 = run(8, sf_dir, repl)
    r32 = run(32, sf_dir, repl)
    eff = (r32["pages_per_sec"] / r8["pages_per_sec"]) / 4.0
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    block = f"""
## Scaling run — {stamp}

Same input ({sf_dir}, replication x{repl} -> {r8['n_pages']} pages),
flagship `verify_tree` (warm-up excluded), fresh JVM per size:

| parallelism | pages/sec | elapsed (s) |
|---|---|---|
| local[8]  (N)  | {r8['pages_per_sec']} | {r8['sec']} |
| local[32] (4N) | {r32['pages_per_sec']} | {r32['sec']} |

**Scaling efficiency (tput_4N / tput_N) / 4 = {eff:.3f}** (target >= 0.8).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    header = "# BENCH/BASELINE.md — measured scaling evidence\n"
    existing = ""
    if os.path.exists(path):
        existing = open(path).read()
    else:
        existing = header
    open(path, "w").write(existing + block)
    print(json.dumps({"eff": round(eff, 3), "r8": r8, "r32": r32}))


if __name__ == "__main__":
    main()
