"""Quadtree grid invariants (fileverification_spark/grid.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fileverification_spark import grid


def test_py_encode_known_values():
    # res 0: 1x2 grid — west vs east hemisphere
    assert grid.py_cell_encode(0.0, -1.0, 0) == 0
    assert grid.py_cell_encode(0.0, 1.0, 0) == 1
    # res 1: 2x4 grid
    c = grid.py_cell_encode(45.0, 90.0, 1)
    assert c == 1 * grid.RES_MULT + 1 * grid.LAT_MULT + 3


def test_column_matches_python(spark):
    pts = [(-89.9, -179.9), (-0.1, 0.1), (45.5, 90.25), (89.9, 179.9), (0.0, 0.0)]
    df = spark.createDataFrame(pts, ["lat", "lon"])
    for res in (0, 1, 4, 10, 20):
        got = [
            r[0]
            for r in df.select(
                grid.cell_encode(F.col("lat"), F.col("lon"), res)
            ).collect()
        ]
        want = [grid.py_cell_encode(la, lo, res) for la, lo in pts]
        assert got == want, res


def test_parent_contains_child(spark):
    pts = [(l / 7.0 * 89, l * 13.7 % 360 - 180) for l in range(-7, 8)]
    df = spark.createDataFrame(pts, ["lat", "lon"])
    res = 8
    out = df.select(
        grid.cell_encode(F.col("lat"), F.col("lon"), res).alias("c"),
        grid.cell_encode(F.col("lat"), F.col("lon"), res - 1).alias("direct"),
        grid.cell_encode(F.col("lat"), F.col("lon"), 3).alias("direct3"),
    ).select(
        grid.cell_parent(F.col("c"), res, res - 1).alias("p"),
        "direct",
        grid.cell_parent(F.col("c"), res, 3).alias("p3"),
        "direct3",
    )
    for r in out.collect():
        assert r["p"] == r["direct"]
        assert r["p3"] == r["direct3"]


def test_bounds_roundtrip():
    c = grid.py_cell_encode(37.77, -122.42, 12)
    la0, la1, lo0, lo1 = grid.py_cell_bounds(c)
    assert la0 <= 37.77 < la1
    assert lo0 <= -122.42 < lo1


def test_grid_disk_membership(spark):
    res, k = 5, 2
    df = spark.createDataFrame([(10.0, 20.0)], ["lat", "lon"])
    disk = df.select(
        F.explode(
            grid.grid_disk(grid.cell_encode(F.col("lat"), F.col("lon"), res), res, k)
        ).alias("c")
    ).collect()
    cells = {r["c"] for r in disk}
    assert len(cells) == (2 * k + 1) ** 2  # interior cell, no lat clipping
    assert grid.py_cell_encode(10.0, 20.0, res) in cells
    # all are at the right resolution
    assert all(c >> 58 == res for c in cells)


def test_grid_disk_lon_wrap(spark):
    res, k = 4, 1
    # cell at the antimeridian: lon_idx 0 — disk must wrap to max lon_idx
    df = spark.createDataFrame([(0.0, -179.99)], ["lat", "lon"])
    disk = df.select(
        F.explode(
            grid.grid_disk(grid.cell_encode(F.col("lat"), F.col("lon"), res), res, k)
        ).alias("c")
    ).collect()
    lons = {c & (grid.LAT_MULT - 1) for c in (r["c"] for r in disk)}
    assert 0 in lons and (1 << (res + 1)) - 1 in lons


def test_grid_disk_lat_clip(spark):
    res, k = 4, 2
    df = spark.createDataFrame([(-89.9, 0.0)], ["lat", "lon"])  # bottom row
    disk = df.select(
        F.explode(
            grid.grid_disk(grid.cell_encode(F.col("lat"), F.col("lon"), res), res, k)
        ).alias("c")
    ).collect()
    # rows -2,-1 clipped: 3 rows x 5 cols
    assert len(disk) == 3 * (2 * k + 1)


def test_covering_rect():
    cells = grid.cells_covering_rect(10.0, 20.0, 30.0, 50.0, 4)
    assert cells
    for c in cells:
        la0, la1, lo0, lo1 = grid.py_cell_bounds(c)
        assert la1 > 10.0 - 1e-9 and la0 < 20.0 + 1e-9
        assert lo1 > 30.0 - 1e-9 and lo0 < 50.0 + 1e-9


def test_res_bounds_checked():
    with pytest.raises(ValueError):
        grid.py_cell_encode(0, 0, 21)
    with pytest.raises(ValueError):
        grid.cells_covering_rect(0, 1, 0, 1, -1)


def test_cell_encode_pandas_matches_jvm(spark, pages_small):
    from pyspark.sql import functions as F

    from fileverification_spark import grid

    enc = grid.cell_encode_pandas(4)
    df = pages_small.select(
        grid.cell_encode(F.col("lat"), F.col("lon"), 4).alias("jvm"),
        enc(F.col("lat"), F.col("lon")).alias("udf"),
    )
    assert df.where(F.col("jvm") != F.col("udf")).count() == 0


def test_cell_encode_pandas_h3_gated(spark, pages_small):
    """Native-H3 seam (VERDICT r02 item 7): without the `h3` wheel the
    seam fails loud (ImportError, never fake ids); WITH the wheel the
    two backends are interface-parity — same (lat, lon) -> BIGINT UDF
    signature, same non-null column over real points — so swapping
    `use_h3=True` in is a one-argument change the day the wheel lands.
    The parity branch self-activates when `import h3` succeeds."""
    import pytest

    from fileverification_spark import grid

    if not grid.have_h3():
        with pytest.raises(ImportError):
            grid.cell_encode_pandas(4, use_h3=True)
        return

    quad = grid.cell_encode_pandas(4)
    native = grid.cell_encode_pandas(4, use_h3=True)
    df = pages_small.select(
        quad(F.col("lat"), F.col("lon")).alias("quad"),
        native(F.col("lat"), F.col("lon")).alias("h3"),
    )
    assert dict(df.dtypes) == {"quad": "bigint", "h3": "bigint"}
    assert df.where(F.col("quad").isNull() | F.col("h3").isNull()).count() == 0
    # distinct backends must still agree on co-location granularity:
    # equal points -> equal cells in BOTH encodings
    dup = pages_small.limit(1).unionAll(pages_small.limit(1))
    out = dup.select(quad(F.col("lat"), F.col("lon")).alias("q"),
                     native(F.col("lat"), F.col("lon")).alias("h")).collect()
    assert out[0].q == out[1].q and out[0].h == out[1].h


def test_half_disk_exactly_once_pair_coverage(spark):
    """For any two distinct cells at Chebyshev distance <= 1 (with lon
    wrap), EXACTLY one of the two contains the other in its half-disk —
    the invariant that makes distance_self_join's plane-sweep dedup
    correct. Checked exhaustively at res 2 (8x4 grid incl. wrap seam
    and both pole rows)."""
    import itertools
    from fileverification_spark import grid as G
    from pyspark.sql import functions as F

    res = 2
    nlat, nlon = 1 << res, 1 << (res + 1)
    cells = [(la, lo) for la in range(nlat) for lo in range(nlon)]
    rows = [(res * G.RES_MULT + la * G.LAT_MULT + lo,) for la, lo in cells]
    df = spark.createDataFrame(rows, "cell bigint").select(
        "cell", G.grid_half_disk(F.col("cell"), res).alias("hd"))
    hd = {r.cell: set(r.hd) for r in df.collect()}

    def cheb1(a, b):
        (la1, lo1), (la2, lo2) = a, b
        dlo = min((lo1 - lo2) % nlon, (lo2 - lo1) % nlon)
        return abs(la1 - la2) <= 1 and dlo <= 1

    def cid(c):
        return res * G.RES_MULT + c[0] * G.LAT_MULT + c[1]

    for a, b in itertools.combinations(cells, 2):
        want = 1 if cheb1(a, b) else 0
        got = (cid(b) in hd[cid(a)]) + (cid(a) in hd[cid(b)])
        assert got == want, (a, b, got, want)
    # self always in own half-disk; top row loses its 3 north entries
    for c in cells:
        assert cid(c) in hd[cid(c)]
        assert len(hd[cid(c)]) == (2 if c[0] == nlat - 1 else 5)


def test_tile_xyz_known_values(spark):
    """Web-Mercator tile addressing pins: equator/antimeridian anchors,
    pole clamping, and a python-math replay of the standard formula."""
    import math

    from pyspark.sql import functions as F

    from fileverification_spark import grid as G

    z, n = 3, 8
    pts = [
        (0.0, -180.0), (0.0, 0.0), (41.85, -87.65),
        (89.9, 10.0), (-89.9, 10.0), (85.05112878, 179.99),
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    t = G.tile_xyz(F.col("lat"), F.col("lon"), z)
    rows = df.select(
        "lat", "lon", t["x"].alias("x"), t["y"].alias("y")
    ).collect()

    def ref(lat, lon):
        x = min(max(int(math.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
        clat = min(max(lat, -G.MERC_MAX_LAT), G.MERC_MAX_LAT)
        yv = (1.0 - math.log(math.tan(math.pi / 4.0
                                      + math.radians(clat) / 2.0))
              / math.pi) / 2.0 * n
        y = min(max(int(math.floor(yv)), 0), n - 1)
        return x, y

    for r in rows:
        assert (r["x"], r["y"]) == ref(r["lat"], r["lon"]), r
    byp = {(r["lat"], r["lon"]): (r["x"], r["y"]) for r in rows}
    assert byp[(0.0, -180.0)] == (0, 4)      # antimeridian west edge, equator
    assert byp[(89.9, 10.0)][1] == 0         # clamped to top row
    assert byp[(-89.9, 10.0)][1] == n - 1    # clamped to bottom row


def test_tile_quadkey(spark):
    from pyspark.sql import functions as F

    from fileverification_spark import grid as G

    df = spark.createDataFrame(
        [(0, 0), (7, 7), (3, 5), (2, 2)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["qk"]
        for r in df.select(
            "x", "y", G.tile_quadkey(F.col("x"), F.col("y"), 3).alias("qk")
        ).collect()
    }
    # (3,5) level 3 -> "213" is the worked example in the public Bing
    # Maps tile-system documentation
    assert got == {(0, 0): "000", (7, 7): "333", (3, 5): "213",
                   (2, 2): "030"}


def test_tile_zoom_guard():
    import pytest
    from pyspark.sql import functions as F

    from fileverification_spark import grid as G

    with pytest.raises(ValueError, match="zoom"):
        G.tile_xyz(F.lit(0.0), F.lit(0.0), 31)


# ---------------------------------------------------------------------------
# Geohash
# ---------------------------------------------------------------------------

def test_geohash_public_reference_values(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            # the Wikipedia worked example
            (57.64911, 10.40744, "u4pruydqqvj"),
            # geohash.org classic (Curitiba)
            (-25.382708, -49.265506, "6gkzwgjzn82"),
            (0.0, 0.0, "s0000000000"),
        ],
        "lat double, lon double, want string",
    )
    bad = df.where(
        grid.geohash(F.col("lat"), F.col("lon"), 11) != F.col("want")
    ).count()
    assert bad == 0


def test_geohash_prefix_property(spark):
    # precision p output is a PREFIX of precision p+k output (cell
    # containment up the ladder — same property as cell_parent)
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(57.64911, 10.40744), (-89.9, -179.9), (41.0, -7.3)],
        "lat double, lon double",
    )
    bad = df.where(
        grid.geohash(F.col("lat"), F.col("lon"), 11).substr(1, 5)
        != grid.geohash(F.col("lat"), F.col("lon"), 5)
    ).count()
    assert bad == 0


def test_geohash_bounds_clamped(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(90.0, 180.0), (-90.0, -180.0)], "lat double, lon double"
    )
    vals = [
        r[0] for r in df.select(grid.geohash(F.col("lat"), F.col("lon"), 4)).collect()
    ]
    assert vals == ["zzzz", "0000"]


def test_geohash_precision_guard(spark):
    import pytest as _pt
    from pyspark.sql import functions as F

    with _pt.raises(ValueError):
        grid.geohash(F.lit(0.0), F.lit(0.0), 0)
    with _pt.raises(ValueError):
        grid.geohash(F.lit(0.0), F.lit(0.0), 13)
