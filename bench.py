"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>,
     "pages_per_sec": <flagship verify throughput>, ...}

The flagship throughput number runs verify_tree over a deterministically
replicated pages table (BENCH_REPLICATION x documents, default 40) so the
measurement isn't dominated by fixed overhead at small document counts.
Scaling-efficiency evidence (local[8] vs local[32]) is produced separately
by tools/scaling_run.py into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fileverification_spark.operators import dedup as D
from fileverification_spark.operators import manifest as M
from fileverification_spark.operators import multimodal as MM
from fileverification_spark.operators import similarity as SIM
from fileverification_spark.operators import spatial as S
from fileverification_spark.operators import verify as V
from fileverification_spark.session import get_spark
from fileverification_spark.sources import pages as P

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATION = int(os.environ.get("BENCH_REPLICATION", "80"))


def _sf_label(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


RUNS = int(os.environ.get("BENCH_RUNS", "3"))


def timed(fn):
    """min-of-RUNS wall time: the host is a shared tenant, so a single
    observation can absorb ambient load spikes (observed 3x swings);
    min estimates uncontended capability, matching tools/scaling_run.py."""
    best, n = None, None
    for _ in range(RUNS):
        t0 = time.perf_counter()
        n = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, n


def _nn_bench(live) -> int:
    src = live.select("url", "lat", "lon").persist()
    try:
        return S.nn_join(src, src, resolutions=(8,)).count()
    finally:
        src.unpersist()


def main() -> None:
    spark = get_spark("bench")
    results: dict[str, float] = {}

    # -- flagship: verify_tree over replicated pages (throughput metric) --
    live = P.pages_replicated(spark, SF_DIR, REPLICATION)
    n_pages = live.count()  # materialisation sanity + warm file listing
    stored = V.tampered_manifest(live)

    def run_verify():
        return V.verify_tree(live, stored).count()

    t_verify, n_report = timed(run_verify)
    results["verify_tree"] = round(t_verify, 3)
    pages_per_sec = n_pages / t_verify

    # -- supporting headline queries on the un-replicated tables --
    pg = P.pages_with_derived(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    cases = {
        "merkle_ladder": lambda: M.merkle_ladder(
            M.leaf_digests(live, P.LEAF_RES), P.LEAF_RES
        ).count(),
        "digests_mergeable": lambda: M.mergeable_digests(live, P.LEAF_RES).count(),
        "pip_pages": lambda: S.pip_join(live, S.default_polygons(), P.LEAF_RES).count(),
        "knn": lambda: S.knn_bruteforce(pg, S.default_query_points(10), 10).count(),
        "knn_ring": lambda: S.knn_ring(
            live, S.default_query_points(10), 10, res=3, rings=4
        ).count(),
        "raster_cells": lambda: S.raster_cells(live, 6).count(),
        "dedup_minhash": lambda: D.lsh_candidate_pairs(
            D.minhash_signatures(docs)
        ).count(),
        "simhash": lambda: D.simhash_docs(docs).count(),
        "ann_cosine_topk": lambda: SIM.cosine_topk(emb, [0, 25, 50, 75, 100], 10).count(),
        "multimodal_features": lambda: MM.extract_features(
            P.pages(spark, SF_DIR, with_html=True)
        ).count(),
    }
    # round-2 additions — kept out of battery_r01_sec so the original
    # 11-query total stays comparable across rounds
    r2_cases = {
        "distance_join": lambda: S.distance_self_join(live, 0.35).count(),
        # single level sized to the bench density (~3 rows/cell at 400k
        # points; P[NN beyond the res-8 guard] ~ 7e-5 -> tiny tail). The
        # bench input is a *derived* relation (sha256 geocode), which the
        # ladder's anti-join + tail would re-derive; persisting the slim
        # (url, lat, lon) projection emulates the materialized table a
        # real deployment reads.
        "nn_join": lambda: _nn_bench(live),
        "compact_cells": lambda: S.compact_cells(
            S.rasterize_polygons(spark, S.default_polygons(), 7).select("cell"), 7
        ).count(),
        "top_lang_cell": lambda: S.top_lang_per_cell(live, 6).count(),
    }
    for name, fn in cases.items():
        t, _ = timed(fn)
        results[name] = round(t, 3)
    battery_r01 = round(sum(results.values()), 3)
    for name, fn in r2_cases.items():
        t, _ = timed(fn)
        results[name] = round(t, 3)

    total = round(sum(results.values()), 3)
    print(
        json.dumps(
            {
                "metric": "spatial-join + per-cell Merkle-manifest verification throughput",
                "value": total,
                "unit": "sec",
                "battery_r01_sec": battery_r01,
                "queries": results,
                "sf": _sf_label(SF_DIR),
                "pages_per_sec": round(pages_per_sec, 1),
                "n_pages": n_pages,
                "n_report_rows": n_report,
                "replication": REPLICATION,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            }
        )
    )


if __name__ == "__main__":
    main()
