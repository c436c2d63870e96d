"""E1 lifecycle end-to-end: sinks, manifest rewrite semantics, notify."""

from __future__ import annotations

from pyspark.sql import functions as F

from fileverification_spark import lifecycle as L
from fileverification_spark import notify as N
from fileverification_spark.operators import verify as V
from fileverification_spark.sources import pages as P

SF = "/root/testdata/sf0.001"


def test_run_tree_verify_end_to_end(spark, pages_small, tmp_path):
    stored = V.tampered_manifest(pages_small)
    sent = []

    def transport(n, payload):
        sent.append(payload)
        return 200

    res = L.run_tree_verify(
        pages_small,
        stored,
        str(tmp_path),
        "r-test",
        notifications=[N.Notification(url="http://x", body="[message]")],
        transport=transport,
    )
    n = pages_small.count()
    assert set(res.counts) == {"OK", "FAIL", "ADDED", "MISSING"}
    assert sum(v for k, v in res.counts.items() if k != "MISSING") == n

    # post-run manifest: every live page present once, no ghosts
    man = spark.read.parquet(f"{tmp_path}/manifest")
    assert man.count() == n
    assert man.where(F.col("child_key").contains("#ghost")).count() == 0
    # FAILed rows were re-added with the freshly computed hash -> a
    # second run against the new manifest is all-OK (reconcile-on-rerun,
    # CheckSumFile.cs:95-98)
    res2 = L.run_tree_verify(pages_small, man, str(tmp_path) + "/2", "r2")
    assert res2.counts == {"OK": n}

    # lineage appended; notification carried the failure log
    lin = spark.read.parquet(f"{tmp_path}/lineage")
    assert lin.where(F.col("run_id") == "r-test").count() > 0
    assert len(sent) == 1 and "FAIL: Hash mismatch:" in sent[0]


def test_allow_remove_false_keeps_missing(spark, pages_small, tmp_path):
    stored = V.tampered_manifest(pages_small)
    L.run_tree_verify(
        pages_small, stored, str(tmp_path), "r3", allow_remove=False
    )
    man = spark.read.parquet(f"{tmp_path}/manifest")
    ghosts = man.where(F.col("child_key").contains("#ghost"))
    assert ghosts.count() > 0  # missing entries retained


def test_excluded_entries_neither_verified_nor_missing(spark, pages_small, tmp_path):
    # Reference: exclusion short-circuits verify/add (PathInfo.cs:213-231)
    # but the missing pass is pure File.Exists (PathInfo.cs:331) — an
    # excluded-but-existing file is skipped entirely and its manifest
    # entry survives.
    from fileverification_spark import config as C

    stored = V.tampered_manifest(pages_small)
    ex = C.Exclusions(paths=["/de/"])
    res = L.run_tree_verify(
        pages_small, stored, str(tmp_path), "rx", exclusions=ex
    )
    report = spark.read.parquet(f"{tmp_path}/report")
    # no /de/ url in the report at all (except true ghosts, which never
    # existed so they stay MISSING regardless of exclusion semantics —
    # ghosts end with #ghost and ARE excluded here only if /de/)
    de_live = report.where(
        F.col("child_key").contains("/de/") & ~F.col("child_key").contains("#ghost")
    )
    assert de_live.count() == 0
    # skipped entries retained verbatim in the rewritten manifest
    man = spark.read.parquet(f"{tmp_path}/manifest")
    n_de_stored = stored.where(
        F.col("child_key").contains("/de/") & ~F.col("child_key").contains("#ghost")
    ).count()
    n_de_man = man.where(
        F.col("child_key").contains("/de/") & ~F.col("child_key").contains("#ghost")
    ).count()
    assert n_de_man == n_de_stored
