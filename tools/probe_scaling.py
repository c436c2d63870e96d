"""One-off probe: flagship verify throughput at several local[N] sizes
over an already-materialised bench input. Fresh JVM per size.

Usage: python tools/probe_scaling.py <bench_dir> <cores> [cores ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from fileverification_spark.session import get_spark
from fileverification_spark.sources import bench_io
from fileverification_spark.operators import verify as V

spark = get_spark("probe", master="local[{cores}]",
                  extra_conf={{"spark.sql.adaptive.advisoryPartitionSizeInBytes":
                               str(8 * 1024 * 1024)}})
live = bench_io.read_live(spark, {pages!r})
stored = bench_io.read_manifest(spark, {man!r})
n = live.count()

def job():
    return {{r["status"]: r["n"] for r in
             V.verify_counts(V.verify_tree(live, stored)).collect()}}

counts = job()  # warm-up (JIT, file listing)
times = []
for _ in range(3):
    t0 = time.perf_counter()
    job()
    times.append(time.perf_counter() - t0)
dt = min(times)
print("RESULT " + json.dumps({{"cores": {cores}, "n_pages": n,
      "sec": round(dt, 3), "pages_per_sec": round(n / dt, 1),
      "times": [round(t, 3) for t in times], "counts": counts}}))
"""


def main() -> None:
    bench = sys.argv[1]
    cores_list = [int(c) for c in sys.argv[2:]]
    pages, man = os.path.join(bench, "pages"), os.path.join(bench, "manifest")
    results = []
    for cores in cores_list:
        code = CHILD.format(repo=REPO, cores=cores, pages=pages, man=man)
        # pin to exactly `cores` CPUs (same protocol as scaling_run.py)
        cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code]
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results.append(r)
                print(json.dumps(r))
                break
        else:
            print(f"cores={cores} FAILED:\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}")
    if len(results) >= 2:
        for a in results:
            for b in results:
                if b["cores"] == 4 * a["cores"]:
                    eff = (b["pages_per_sec"] / a["pages_per_sec"]) / 4
                    print(f"eff {a['cores']}->{b['cores']}: {eff:.3f}")


if __name__ == "__main__":
    main()
