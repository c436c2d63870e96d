"""KMV sketch ladder (operators/sketch.py): merge identity, exactness
below k, estimator accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from fileverification_spark.operators import sketch as SK
from fileverification_spark.sources import pages as P

SF = "/root/testdata/sf0.001"


def test_rollup_merge_identity(spark):
    """kmv(union) == merge(kmvs) — the parent sketch from rolled-up
    children must equal the direct parent sketch EXACTLY (same array),
    the property that lets every ladder level avoid rescanning pages."""
    pages = P.pages_with_derived(spark, SF)
    res, parent_res, k = 4, 2, 16
    direct = {
        r["cell"]: r["kmv"]
        for r in SK.kmv_cells(pages, parent_res, k).collect()
    }
    rolled = {
        r["cell"]: r["kmv"]
        for r in SK.kmv_rollup(
            SK.kmv_cells(pages, res, k), res, parent_res, k
        ).collect()
    }
    assert rolled == direct and len(direct) > 0


def test_exact_below_k(spark):
    """Cells with fewer than k distinct urls report the exact count."""
    pages = P.pages_with_derived(spark, SF)
    k = 64
    est = SK.kmv_estimate(SK.kmv_cells(pages, 6, k), k).collect()
    # at res 6 over 500 docs every cell is sparse (< k distinct urls)
    assert all(r["n_in_sketch"] < k and r["est"] == float(r["n_in_sketch"])
               for r in est)
    assert sum(r["n_in_sketch"] for r in est) == pages.select("url").distinct().count()


def test_estimator_accuracy(spark):
    """One coarse cell holding all 500 distinct urls, k=64: the KMV
    estimate must land within the standard ~1/sqrt(k) error band."""
    pages = P.pages_with_derived(spark, SF)
    k = 64
    one_cell = pages.withColumn("lat", F.lit(10.0)).withColumn(
        "lon", F.lit(10.0)
    )
    [row] = SK.kmv_estimate(SK.kmv_cells(one_cell, 2, k), k).collect()
    true = pages.select("url").distinct().count()
    assert row["n_in_sketch"] == k
    assert abs(row["est"] - true) / true < 3.0 / (k ** 0.5)
