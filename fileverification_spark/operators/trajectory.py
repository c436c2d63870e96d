"""Trajectory analytics over the events stream table: per-user cell
paths and the origin->destination flow matrix.

Each event is geocoded deterministically (streaming.geofence.with_geo)
and snapped to a grid cell; a user's time-ordered event sequence is a
trajectory of cells, and every consecutive pair with differing cells is
one O->D movement. The flow matrix aggregates those movements — the
standard mobility-analytics primitive (OD matrix) a geospatial engine
ships next to PIP/kNN/raster.

Scale shape: the lag window shuffles once on user_id (state per user is
one row); the flow aggregation shuffles once on the (origin, dest) pair
key with map-side partial aggregation. No Python anywhere. Ordering
inside a user is (ts, event_id) — event_id breaks timestamp ties so the
transition sequence is total and both engines derive the identical
matrix (a bare ts order would be nondeterministic under collisions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from fileverification_spark import grid
from fileverification_spark.streaming import geofence as SG

OD_RES = 3


def cell_transitions(events: DataFrame, res: int = OD_RES) -> DataFrame:
    """(user_id, ts, from_cell, to_cell) for every consecutive event pair
    of a user that changed cell."""
    geo = SG.with_geo(events).withColumn(
        "cell", grid.cell_encode(F.col("lat"), F.col("lon"), res)
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    with_prev = geo.withColumn("from_cell", F.lag("cell").over(w))
    return (
        with_prev.where(
            F.col("from_cell").isNotNull()
            & (F.col("from_cell") != F.col("cell"))
        )
        .select(
            "user_id", "ts", "from_cell", F.col("cell").alias("to_cell")
        )
    )


def od_matrix(events: DataFrame, res: int = OD_RES) -> DataFrame:
    """(from_cell, to_cell, n_moves, n_users) — the flow matrix."""
    t = cell_transitions(events, res)
    return t.groupBy("from_cell", "to_cell").agg(
        F.count(F.lit(1)).alias("n_moves"),
        F.count_distinct("user_id").alias("n_users"),
    )


def sql_od_matrix(res: int = OD_RES, events_rel: str = "events") -> str:
    """Oracle: identical geocode + lag + pair aggregation."""
    cell = grid.sql_cell_encode("lat", "lon", res)
    return f"""
WITH {SG.sql_geo_cte(events_rel, "user_id, ts, event_id")},
cells AS (SELECT user_id, ts, event_id, {cell} AS cell FROM geo),
moves AS (
  SELECT user_id,
         lag(cell) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS from_cell,
         cell AS to_cell
  FROM cells
)
SELECT from_cell, to_cell,
       count(*) AS n_moves,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM moves
WHERE from_cell IS NOT NULL AND from_cell != to_cell
GROUP BY from_cell, to_cell"""


def raster_users(events: DataFrame, res: int = OD_RES) -> DataFrame:
    """(cell, n_events, n_users) per cell over geocoded events — the
    events-table sibling of spatial.raster_cells. n_users is exact
    count_distinct: a two-level shuffle ((cell, user) then cell), the
    price of exactness the contract needs; raster_users_approx is the
    single-shuffle HLL twin for 100 TB dashboards."""
    geo = SG.with_geo(events).withColumn(
        "cell", grid.cell_encode(F.col("lat"), F.col("lon"), res)
    )
    return geo.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


def raster_users_approx(events: DataFrame, res: int = OD_RES,
                        rsd: float = 0.02) -> DataFrame:
    """HLL variant: one shuffle, mergeable state — the scale path. Error
    vs exact is pinned by tests, not assumed."""
    geo = SG.with_geo(events).withColumn(
        "cell", grid.cell_encode(F.col("lat"), F.col("lon"), res)
    )
    return geo.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id", rsd).alias("n_users"),
    )


def sql_raster_users(res: int = OD_RES, events_rel: str = "events") -> str:
    cell = grid.sql_cell_encode("lat", "lon", res)
    return f"""
WITH {SG.sql_geo_cte(events_rel, "user_id, event_id")}
SELECT {cell} AS cell,
       count(*) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM geo GROUP BY 1"""


DWELL_GAP_MIN = 30


def fence_dwells(
    events: DataFrame,
    polys: list,
    res: int = 4,
    gap_min: int = DWELL_GAP_MIN,
) -> DataFrame:
    """Dwell sessions per (user, fence): consecutive in-fence events of a
    user with gaps <= gap_min form one dwell — (user_id, poly_id,
    enter_ts, exit_ts, n_events). Composes the stateless geofence hit
    filter with the gap-session rule of streaming.windows.sessionize,
    partitioned by (user, fence). One window shuffle on (user_id,
    poly_id) — per-key state is a single lag row, so the same shape runs
    under applyInPandasWithState for the streaming twin."""
    hits = SG.geofence_hits(events, polys, res)
    w = W.partitionBy("user_id", "poly_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    with_new = hits.withColumn(
        "is_new", (gap.isNull() | (gap > gap_min * 60)).cast("int")
    )
    with_sid = with_new.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return with_sid.groupBy("user_id", "poly_id", "session_id").agg(
        F.min("ts").alias("enter_ts"),
        F.max("ts").alias("exit_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )


def sql_fence_dwells(
    polys: list,
    events_rel: str = "events",
    res: int = 4,
    gap_min: int = DWELL_GAP_MIN,
) -> str:
    """Oracle: geo CTE + crossing-parity PIP + the identical gap-session
    window chain. Timestamps exported as epoch-microsecond BIGINTs (canon-
    proof), matching the contract query's column casts."""
    from fileverification_spark.operators import spatial as SP

    return f"""
WITH {SG.sql_geo_cte(events_rel)},
hits AS (
  SELECT p.event_id, p.ts, p.user_id, p.poly_id FROM (
    SELECT c.poly_id, g.event_id, g.ts, g.user_id, count(*) AS crossings
    FROM geo g,
         (VALUES {SP.sql_polygon_edges_values(polys)})
           AS c(poly_id, y1, x1, y2, x2)
    WHERE ((c.y1 > g.lat) != (c.y2 > g.lat))
      AND (g.lon < (c.x2 - c.x1) * (g.lat - c.y1) / (c.y2 - c.y1) + c.x1)
    GROUP BY c.poly_id, g.event_id, g.ts, g.user_id
  ) p WHERE p.crossings % 2 = 1
),
g2 AS (
  SELECT user_id, poly_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id, poly_id
                                 ORDER BY ts, event_id) IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id,
                     poly_id ORDER BY ts, event_id)) > {gap_min * 60}
              THEN 1 ELSE 0 END AS is_new,
         event_id
  FROM hits
),
s AS (
  SELECT user_id, poly_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id, poly_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM g2
)
SELECT user_id, poly_id, session_id,
       CAST(epoch_us(min(ts)) AS BIGINT) AS enter_ts,
       CAST(epoch_us(max(ts)) AS BIGINT) AS exit_ts,
       count(*) AS n_events
FROM s GROUP BY user_id, poly_id, session_id"""


def track_length(events: DataFrame) -> DataFrame:
    """(user_id, n_points, n_legs, track_km): total great-circle length
    of each user's time-ordered trajectory — the mobility-analytics
    rollup next to the OD matrix (reference analogue: per-folder size
    accounting, FV/IO/FileSystemCrawlerBase.cs totals, lifted to paths).

    Scale shape: ONE window shuffle on user_id (the same (ts, event_id)
    total order as cell_transitions) then one hash-agg per user. Legs
    are haversine_km rounded to 6 digits and summed as fixed-scale
    DECIMAL so the total is order-independent and cross-engine exact
    (same discipline as curation_stats.sum_quality); track_km is the
    stringified decimal."""
    from fileverification_spark.operators import spatial as SP

    geo = SG.with_geo(events)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    with_prev = geo.select(
        "user_id",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
    )
    leg = F.round(
        SP.haversine_km(
            F.col("plat"), F.col("plon"), F.col("lat"), F.col("lon")
        ),
        6,
    ).cast("decimal(18,6)")
    return (
        with_prev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.count("plat").alias("n_legs"),
            F.sum(F.when(F.col("plat").isNotNull(), leg)).alias("_km"),
        )
        .select(
            "user_id",
            "n_points",
            "n_legs",
            F.coalesce(F.col("_km").cast("string"), F.lit("0.000000")).alias(
                "track_km"
            ),
        )
    )


def sql_track_length(events_rel: str = "events") -> str:
    """Oracle: identical geocode + lag + rounded-DECIMAL leg sum."""
    from fileverification_spark.operators import spatial as SP

    d = SP.sql_haversine_km("plat", "plon", "lat", "lon")
    return f"""
WITH {SG.sql_geo_cte(events_rel)},
legs AS (
  SELECT user_id,
         lag(lat) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS plat,
         lag(lon) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS plon,
         lat, lon
  FROM geo
)
SELECT user_id,
       count(*) AS n_points,
       count(plat) AS n_legs,
       coalesce(CAST(sum(CASE WHEN plat IS NOT NULL
                 THEN CAST(round({d}, 6) AS DECIMAL(18,6)) END) AS VARCHAR),
                '0.000000') AS track_km
FROM legs GROUP BY user_id"""


# ---------------------------------------------------------------------------
# Trajectory corridor rasterization (line -> cells)
# ---------------------------------------------------------------------------

def track_cells(
    events: DataFrame, res: int, samples_per_leg: int = 8
) -> DataFrame:
    """Cells touched by each user's time-ordered trajectory —
    ``(user_id, cell)``, distinct: the LINE rasterization completing the
    vector trio (points: pages cell derive; polygons:
    spatial.rasterize_polygons; lines: here). The corridor raster is
    what geofence pre-screens and coverage/exposure analyses consume.

    Method: each leg (lag window, same (ts, event_id) total order as
    track_length) is sampled at ``samples_per_leg + 1`` evenly-spaced
    points interpolated in equirectangular space (t = i/K exact in IEEE
    doubles — identical expression both engines), each point is
    cell-encoded, and (user, cell) de-dups. Sampling UNDERCOVERS when a
    leg crosses more than ``samples_per_leg`` cells diagonally — pick
    ``samples_per_leg >= leg_span / cell_width`` for supercover-grade
    output (exact Bresenham supercover costs a UDF; the sampled form
    stays whole-stage codegen).

    Scale shape: one window shuffle on user_id, then a plan-time-constant
    K+1-way explode (rows ∝ legs * K, all map-side), then the distinct's
    hash-agg — partial aggregation collapses duplicate cells before the
    shuffle, so shuffle rows ≈ output rows. Users with a single event
    have no legs and are absent (documented).
    """
    geo = SG.with_geo(events)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    legs = geo.select(
        "user_id",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
    ).where(F.col("plat").isNotNull())
    k = samples_per_leg
    t = F.col("i").cast("double") / F.lit(float(k))
    ilat = F.col("plat") + (F.col("lat") - F.col("plat")) * t
    ilon = F.col("plon") + (F.col("lon") - F.col("plon")) * t
    return (
        legs.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(k))).alias("i"),
            "lat",
            "lon",
            "plat",
            "plon",
        )
        .select(
            "user_id", grid.cell_encode(ilat, ilon, res).alias("cell")
        )
        .distinct()
    )


def sql_track_cells(
    res: int, events_rel: str = "events", samples_per_leg: int = 8
) -> str:
    """Oracle: identical lag + interpolation + cell encode (own WITH)."""
    k = samples_per_leg
    cell = grid.sql_cell_encode(
        f"(plat + (lat - plat) * (i / {k}.0))",
        f"(plon + (lon - plon) * (i / {k}.0))",
        res,
    )
    return f"""
WITH {SG.sql_geo_cte(events_rel)},
legs AS (
  SELECT user_id,
         lag(lat) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS plat,
         lag(lon) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS plon,
         lat, lon
  FROM geo
)
SELECT DISTINCT user_id, {cell} AS cell
FROM legs, (SELECT unnest(generate_series(0, {k})) AS i) s
WHERE plat IS NOT NULL"""
