"""As-of join semantics vs hand-computed expectations."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from fileverification_spark.operators import asof as AS


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (2, 100, _ts(5)), (3, 200, _ts(7)), (4, 300, _ts(9))],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [(100, _ts(4), "a"), (100, _ts(9), "b"), (200, _ts(7), "c"), (200, _ts(8), "d")],
        ["user_id", "ts", "tag"],
    )
    out = {
        r["event_id"]: r["asof_tag"]
        for r in AS.asof_join(
            left, right, "user_id", "ts", "ts", ["tag"]
        ).collect()
    }
    assert out == {
        1: "b",   # latest right <= 10
        2: "a",   # only :04 precedes :05
        3: "c",   # equal ts counts (>=)
        4: None,  # no right rows for user 300
    }


def test_attribution_matches_window_reference(spark):
    from fileverification_spark.streaming import windows as SW

    ev = SW.read_events(spark, "/root/testdata/sf0.001")
    got = AS.attribute_to_last_view(ev)
    # independent formulation: per non-view event, max view ts <= ts via join+agg
    views = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts"),
        F.col("event_id").alias("vid"),
    )
    nv = ev.where(F.col("event_type") != "view")
    ref = (
        nv.join(views, (nv["user_id"] == F.col("vu")) & (F.col("vts") <= nv["ts"]), "left")
        .groupBy("event_id")
        .agg(F.max_by("vid", "vts").alias("view_event_id"))
    )
    g = {r["event_id"]: r["view_event_id"] for r in got.collect()}
    r_ = {r["event_id"]: r["view_event_id"] for r in ref.collect()}
    assert g == r_
    assert sum(v is not None for v in g.values()) > 0
