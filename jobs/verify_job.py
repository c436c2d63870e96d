"""spark-submit entry point for the flagship verify run.

    spark-submit --master local[8] \
        --py-files dist/fileverification_spark.zip \
        jobs/verify_job.py <sf_dir> <out_dir> [run_id]

Mirrors the reference lifecycle E1 (FileVerification/Program.cs:215-279):
scan -> derive -> verify joins -> report sink + per-status summary, plus
the engine's lineage table (north_rule: per-partition lineage + metrics).
On a cluster the same invocation takes `--master yarn --num-executors N`;
nothing in the job changes — that is the point of keeping all scale
decisions in conf + table layout rather than code.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession

from fileverification_spark import config as CFG
from fileverification_spark import lifecycle as L
from fileverification_spark.operators import verify as V
from fileverification_spark.sources import pages as P


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fv_verify_out"
    run_id = sys.argv[3] if len(sys.argv) > 3 else "r1"
    # optional settings file (S8): exclusions + allowRemove, the
    # reference's XML settings as plain JSON
    cfg = (
        CFG.JobConfig.from_json(sys.argv[4])
        if len(sys.argv) > 4
        else CFG.JobConfig()
    )

    # master/executors come from spark-submit; only runtime-settable SQL
    # conf here, so the job is cluster-agnostic.
    spark = SparkSession.builder.appName("fv-verify").getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.sparkContext.setLogLevel("WARN")

    live = P.pages_with_derived(spark, sf_dir)
    stored = V.tampered_manifest(live)
    res = L.run_tree_verify(
        live,
        stored,
        out_dir,
        run_id,
        exclusions=cfg.exclusions,
        allow_remove=cfg.allow_remove,
    )
    print(
        "VERIFY-RESULT "
        + json.dumps(
            {
                "run_id": run_id,
                "counts": res.counts,
                "elapsed_sec": round(res.elapsed_sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
