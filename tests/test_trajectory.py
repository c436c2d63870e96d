"""OD matrix semantics: transitions reconstruct from a driver-side replay
of each user's ordered event sequence."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from fileverification_spark import grid
from fileverification_spark.operators import trajectory as TJ
from fileverification_spark.streaming import geofence as SG
from fileverification_spark.streaming import windows as SW

SF = "/root/testdata/sf0.001"


def test_od_matrix_matches_replay(spark):
    from pyspark.sql import functions as F

    ev = SW.read_events(spark, SF)
    got = {
        (r["from_cell"], r["to_cell"]): (r["n_moves"], r["n_users"])
        for r in TJ.od_matrix(ev).collect()
    }
    geo = SG.with_geo(ev).withColumn(
        "cell", grid.cell_encode(F.col("lat"), F.col("lon"), TJ.OD_RES)
    )
    seqs: dict = {}
    for r in geo.select("user_id", "ts", "event_id", "cell").collect():
        seqs.setdefault(r["user_id"], []).append((r["ts"], r["event_id"], r["cell"]))
    moves = Counter()
    users: dict = {}
    for uid, seq in seqs.items():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            if a != b:
                moves[(a, b)] += 1
                users.setdefault((a, b), set()).add(uid)
    want = {k: (n, len(users[k])) for k, n in moves.items()}
    assert got == want and len(got) > 0


def test_cell_transitions_drop_same_cell(spark):
    ev = SW.read_events(spark, SF)
    t = TJ.cell_transitions(ev).collect()
    assert all(r["from_cell"] != r["to_cell"] for r in t)


def test_raster_users_exact_and_hll(spark):
    from fileverification_spark.streaming import windows as SWm

    ev = SWm.read_events(spark, SF)
    exact = {r["cell"]: (r["n_events"], r["n_users"])
             for r in TJ.raster_users(ev).collect()}
    assert sum(n for n, _ in exact.values()) == ev.count()
    approx = {r["cell"]: r["n_users"]
              for r in TJ.raster_users_approx(ev).collect()}
    assert set(approx) == set(exact)
    # HLL relative error within 3x the configured rsd on every cell
    for cell, (_, n) in exact.items():
        assert abs(approx[cell] - n) <= max(3, 0.06 * n), (cell, n, approx[cell])


def test_fence_dwells_invariants(spark):
    from fileverification_spark.operators import spatial as S

    ev = SW.read_events(spark, SF)
    polys = S.default_polygons()
    dwells = TJ.fence_dwells(ev, polys).collect()
    hits_n = SG.geofence_hits(ev, polys).count()
    assert dwells and sum(r["n_events"] for r in dwells) == hits_n
    for r in dwells:
        assert r["enter_ts"] <= r["exit_ts"]
    # dwells of one (user, fence) never overlap and respect the gap rule
    by_key: dict = {}
    for r in dwells:
        by_key.setdefault((r["user_id"], r["poly_id"]), []).append(
            (r["enter_ts"], r["exit_ts"])
        )
    for spans in by_key.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert (s2 - e1).total_seconds() > TJ.DWELL_GAP_MIN * 60


def test_track_length_matches_driver_replay(spark):
    """track_km equals a driver-side haversine replay of each user's
    (ts, event_id)-ordered trajectory; point/leg counts reconcile."""
    import math
    from decimal import Decimal

    from fileverification_spark.streaming import geofence as SG

    events = SW.read_events(spark, SF)
    got = {r["user_id"]: r for r in TJ.track_length(events).collect()}
    rows = (
        SG.with_geo(events)
        .select("user_id", "ts", "event_id", "lat", "lon")
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    R = 6371.0088
    for uid, pts in by_user.items():
        pts.sort(key=lambda r: (r["ts"], r["event_id"]))
        total = Decimal("0")
        for a, b in zip(pts, pts[1:]):
            la1, lo1, la2, lo2 = map(
                math.radians, (a["lat"], a["lon"], b["lat"], b["lon"])
            )
            h = (
                math.sin((la2 - la1) / 2) ** 2
                + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
            )
            d = 2 * R * math.asin(min(1.0, math.sqrt(h)))
            total += Decimal(str(round(d, 6)))
        g = got[uid]
        assert g["n_points"] == len(pts)
        assert g["n_legs"] == len(pts) - 1
        # per-leg rounding may differ by 1 ulp in the 6th digit between
        # JVM round and Python round; bound the drift by the leg count
        tol = Decimal("0.000001") * max(len(pts) - 1, 1)
        assert abs(Decimal(g["track_km"]) - total) <= tol, uid


# ---------------------------------------------------------------------------
# Trajectory corridor rasterization
# ---------------------------------------------------------------------------

def _raw_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id string, ts_s string"
    ).select("event_id", "user_id", F.to_timestamp("ts_s").alias("ts"))


def test_track_cells_covers_leg_and_skips_singletons(spark):
    ev = _raw_events(
        spark,
        [
            (1, "u1", "2024-01-01 00:00:00"),
            (2, "u1", "2024-01-01 00:10:00"),
            (3, "solo", "2024-01-01 00:00:00"),  # one event -> no legs
        ],
    )
    got = TJ.track_cells(ev, res=5, samples_per_leg=8).collect()
    users = {r["user_id"] for r in got}
    assert users == {"u1"}
    # endpoints' own cells must be covered (t=0 and t=1 samples)
    geo = SG.with_geo(ev).where(F.col("user_id") == "u1")
    end_cells = {
        r["c"]
        for r in geo.select(
            grid.cell_encode(F.col("lat"), F.col("lon"), 5).alias("c")
        ).collect()
    }
    assert end_cells <= {r["cell"] for r in got}


def test_track_cells_more_samples_cover_superset(spark):
    ev = _raw_events(
        spark,
        [
            (1, "u1", "2024-01-01 00:00:00"),
            (2, "u1", "2024-01-01 00:10:00"),
            (3, "u1", "2024-01-01 00:20:00"),
        ],
    )
    coarse = {
        (r["user_id"], r["cell"])
        for r in TJ.track_cells(ev, res=5, samples_per_leg=4).collect()
    }
    fine = {
        (r["user_id"], r["cell"])
        for r in TJ.track_cells(ev, res=5, samples_per_leg=32).collect()
    }
    # K and 8K sample grids don't nest (i/4 vs i/32 share t=0,1/4,...),
    # but 32 includes every t=i/4 point exactly (i*8/32) -> superset
    assert coarse <= fine
