"""Measured evidence for the bucketed co-located verify join.

Times the full-outer verify join (operators/verify.verify_tree) over the
REPLICATED pages corpus two ways on identical inputs:

  flat     — both sides plain parquet: the join pays two corpus-sized
             shuffle Exchanges;
  bucketed — both sides Hive-bucketed on the join keys (cell, url):
             zero shuffle Exchange (plan-pinned in tests/test_plans.py).

Write cost is excluded on purpose: bucketing is a TABLE layout paid once
at ingest and amortised over every verify run, exactly like the
reference's directory tree. Prints one JSON line with min-of-N wall
times, the shuffle-exchange counts, and /proc/stat-style contention
stamps (the bench.py discipline).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fileverification_spark.operators import verify as V  # noqa: E402
from fileverification_spark.plans import explain as X  # noqa: E402
from fileverification_spark.session import get_spark  # noqa: E402
from fileverification_spark.sources import pages as P  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATION = int(os.environ.get("BENCH_REPLICATION", "80"))
RUNS = int(os.environ.get("BENCH_RUNS", "5"))


def _steal_frac():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return vals[7] if len(vals) > 7 else 0, sum(vals)


def main() -> None:
    spark = get_spark("bucketed_bench", master=f"local[{CPUS}]")
    live = P.pages_replicated(spark, SF_DIR, REPLICATION)
    stored = V.tampered_manifest(live)

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    flat_live = os.path.join(warehouse, "bb_flat_live")
    flat_stored = os.path.join(warehouse, "bb_flat_stored")
    live.write.mode("overwrite").parquet(flat_live)
    stored.write.mode("overwrite").parquet(flat_stored)

    n_buckets = 2 * CPUS
    for t in ("bb_live", "bb_stored"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    P.write_bucketed(spark.read.parquet(flat_live), "bb_live",
                     n_buckets, "cell", "url")
    P.write_bucketed(spark.read.parquet(flat_stored), "bb_stored",
                     n_buckets, "cell", "child_key")

    # keep the comparison about the JOIN: no broadcast downgrade
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def flat_run():
        rep = V.verify_tree(spark.read.parquet(flat_live),
                            spark.read.parquet(flat_stored))
        rep.groupBy("status").count().collect()

    def bucketed_run():
        rep = V.verify_tree(spark.table("bb_live"), spark.table("bb_stored"))
        rep.groupBy("status").count().collect()

    n_rows = spark.read.parquet(flat_live).count()
    flat_plan = V.verify_tree(spark.read.parquet(flat_live),
                              spark.read.parquet(flat_stored))
    buck_plan = V.verify_tree(spark.table("bb_live"),
                              spark.table("bb_stored"))
    shuffles = {"flat": X.shuffle_exchange_count(flat_plan),
                "bucketed": X.shuffle_exchange_count(buck_plan)}

    # interleave A/B/A/B so ambient drift hits both arms equally
    flat_t, buck_t = [], []
    steal0, tot0 = _steal_frac()
    for _ in range(RUNS):
        s0 = time.monotonic(); flat_run(); flat_t.append(round(time.monotonic() - s0, 3))
        s0 = time.monotonic(); bucketed_run(); buck_t.append(round(time.monotonic() - s0, 3))

    out = {
        "metric": "verify join seconds, flat vs bucketed layout",
        "rows": n_rows,
        "n_buckets": n_buckets,
        "runs": RUNS,
        "flat_s": flat_t,
        "bucketed_s": buck_t,
        "flat_min": min(flat_t),
        "bucketed_min": min(buck_t),
        "speedup_min": round(min(flat_t) / min(buck_t), 3),
        "shuffle_exchanges": shuffles,
        "steal_frac": None,
    }
    steal1, tot1 = _steal_frac()
    out["steal_frac"] = round((steal1 - steal0) / max(tot1 - tot0, 1), 4)
    print(json.dumps(out))
    for t in ("bb_live", "bb_stored"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(flat_live, ignore_errors=True)
    shutil.rmtree(flat_stored, ignore_errors=True)


if __name__ == "__main__":
    main()
