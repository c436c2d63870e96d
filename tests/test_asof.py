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


def test_interval_join_hand_case(spark):
    import datetime as dt

    import pytest
    from pyspark.sql import functions as F

    from fileverification_spark.operators import asof as AS

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    pts = spark.createDataFrame(
        [(1, "u", t(5)), (2, "u", t(10)), (3, "u", t(30)), (4, "v", t(5))],
        "pid long, user_id string, ts timestamp",
    )
    iv = spark.createDataFrame(
        [("a", "u", t(0), t(10)),   # contains pid 1, 2 (boundary incl.)
         ("b", "u", t(8), t(12)),   # overlaps a; contains pid 2
         ("c", "v", t(0), t(4))],   # misses pid 4 (ends before)
        "iid string, user_id string, session_start timestamp,"
        " session_end timestamp",
    )
    for bucket in (1, 3, 1_000_000):  # result is bucket-size invariant
        got = {
            (r["pid"], r["iid"])
            for r in AS.interval_join(
                pts, iv, keys=["user_id"], point_ts="ts",
                start="session_start", end="session_end",
                bucket_seconds=bucket,
            ).collect()
        }
        assert got == {(1, "a"), (2, "a"), (2, "b")}, bucket

    with pytest.raises(ValueError, match="bucket_seconds"):
        AS.interval_join(pts, iv, keys=["user_id"], point_ts="ts",
                         start="session_start", end="session_end",
                         bucket_seconds=0)


def test_interval_join_no_bnlj_in_plan(spark):
    """The bucketed form must plan as an equi-join (SortMergeJoin /
    ShuffledHashJoin on the bucket key), never BroadcastNestedLoopJoin —
    the quadratic plan the operator exists to avoid."""
    import datetime as dt

    from fileverification_spark.operators import asof as AS

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    pts = spark.createDataFrame(
        [(1, "u", t(5))], "pid long, user_id string, ts timestamp")
    iv = spark.createDataFrame(
        [("a", "u", t(0), t(10))],
        "iid string, user_id string, session_start timestamp,"
        " session_end timestamp",
    )
    plan = (
        AS.interval_join(pts, iv, keys=["user_id"], point_ts="ts",
                         start="session_start", end="session_end")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
