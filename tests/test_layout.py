"""Z-order clustered layout (grid.zorder_key, pages.write_zordered):
key correctness, curve locality, and the file-skipping bound the layout
exists to provide."""

from __future__ import annotations

from pyspark.sql import functions as F

from fileverification_spark import grid as G
from fileverification_spark.sources import pages as P

from tests.conftest import SF0001


def test_zorder_key_matches_python_twin(spark):
    res = 6
    nlat, nlon = 1 << res, 1 << (res + 1)
    rows = [(res * G.RES_MULT + la * G.LAT_MULT + lo, la, lo)
            for la in range(0, nlat, 7) for lo in range(0, nlon, 11)]
    df = spark.createDataFrame(rows, "cell bigint, la int, lo int").select(
        "la", "lo", G.zorder_key(F.col("cell")).alias("zkey"))
    for r in df.collect():
        assert r.zkey == G.zorder_key_py(r.la, r.lo), (r.la, r.lo)


def test_zorder_aligned_square_is_contiguous_range(spark):
    """Any power-of-two-aligned square of cells occupies one contiguous
    zkey range — the property that turns 2D locality into min/max
    file-skipping."""
    res = 5
    side = 4  # 4x4 aligned square at (8, 16)
    la0, lo0 = 8, 16
    keys = sorted(
        G.zorder_key_py(la, lo)
        for la in range(la0, la0 + side)
        for lo in range(lo0, lo0 + side)
    )
    assert keys[-1] - keys[0] == len(keys) - 1  # dense, gap-free
    # and no OTHER cell's key falls inside the range
    nlat, nlon = 1 << res, 1 << (res + 1)
    for la in range(nlat):
        for lo in range(nlon):
            inside = la0 <= la < la0 + side and lo0 <= lo < lo0 + side
            k = G.zorder_key_py(la, lo)
            assert (keys[0] <= k <= keys[-1]) == inside


def test_zordered_layout_bounds_files_per_bbox(spark, tmp_path):
    """The locality claim, measured: in the z-ordered layout a small
    bbox's rows live in a bounded handful of files; in the flat (hash
    placement) layout the same rows scatter across essentially all
    files."""
    n_files = 16
    live = P.pages_with_derived(spark, SF0001)

    flat = str(tmp_path / "flat")
    live.repartition(n_files).write.parquet(flat)
    zord = str(tmp_path / "zord")
    P.write_zordered(live, zord, n_files=n_files)

    bbox = (F.col("lat").between(-30.0, 10.0)
            & F.col("lon").between(20.0, 80.0))

    def files_touched(path):
        df = spark.read.parquet(path).where(bbox)
        return (df.select(F.input_file_name().alias("f"))
                .distinct().count(), df.count())

    nf_flat, rows_flat = files_touched(flat)
    nf_z, rows_z = files_touched(zord)
    assert rows_flat == rows_z and rows_z > 0
    # flat: region scattered over (almost) all files; z-ordered: compact
    assert nf_flat >= n_files * 3 // 4
    assert nf_z <= n_files // 2
    assert nf_z < nf_flat


def test_zordered_roundtrip_preserves_rows(spark, tmp_path):
    live = P.pages_with_derived(spark, SF0001)
    zord = str(tmp_path / "z")
    P.write_zordered(live, zord, n_files=8)
    back = spark.read.parquet(zord)
    assert back.count() == live.count()
    assert back.select(F.sum(F.crc32(F.col("url")))).collect()[0][0] == \
        live.select(F.sum(F.crc32(F.col("url")))).collect()[0][0]
    # zkey is genuinely sorted within every file
    bad = (back.withColumn("f", F.input_file_name())
           .withColumn("prev", F.lag("zkey").over(
               __import__("pyspark").sql.window.Window
               .partitionBy("f").orderBy(F.monotonically_increasing_id())))
           .where(F.col("prev") > F.col("zkey")).count())
    assert bad == 0


# ---------------------------------------------------------------------------
# Leveled Morton keys + driver-side range decomposition (grid.morton_ranges)
# ---------------------------------------------------------------------------


def test_morton_key_matches_python_twin(spark):
    level = 6
    pts = [(float(la), float(lo))
           for la in range(-88, 90, 23) for lo in range(-179, 180, 37)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    xy = G.zorder_xy(F.col("lat"), F.col("lon"), level)
    got = df.select(
        "lat", "lon", G.morton_key(xy["x"], xy["y"], level).alias("z")
    ).collect()
    for r in got:
        x, y = G.zorder_xy_py(r.lat, r.lon, level)
        assert r.z == G.morton_interleave_py(x, y, level), (r.lat, r.lon)


def test_morton_ranges_exact_cover_at_full_depth():
    """With split_depth >= level the decomposition is EXACT: the union of
    ranges contains a key iff its cell intersects the box."""
    level = 5
    box = (-10.0, 40.0, -100.0, 20.0)
    ranges = G.morton_ranges(*box, level=level, max_ranges=10**6,
                             split_depth=level)
    x0, y0 = G.zorder_xy_py(box[0], box[2], level)
    x1, y1 = G.zorder_xy_py(box[1], box[3], level)
    covered = set()
    for lo, hi in ranges:
        covered.update(range(lo, hi + 1))
    n = 1 << level
    for x in range(n):
        for y in range(n):
            inside = x0 <= x <= x1 and y0 <= y <= y1
            assert (G.morton_interleave_py(x, y, level) in covered) == inside


def test_morton_ranges_superset_and_bounded():
    """Coalescing to max_ranges keeps the cover a SUPERSET (never drops an
    in-box key) and respects the range budget."""
    level = 8
    box = (-33.0, 17.0, -59.0, 28.0)
    exact = G.morton_ranges(*box, level=level, max_ranges=10**6,
                            split_depth=level)
    for cap in (1, 4, 16):
        coarse = G.morton_ranges(*box, level=level, max_ranges=cap,
                                 split_depth=level)
        assert 1 <= len(coarse) <= cap
        for lo, hi in coarse:
            assert lo <= hi
        # every exact range is inside some coarse range
        for lo, hi in exact:
            assert any(clo <= lo and hi <= chi for clo, chi in coarse)


def test_zorder_bbox_query_matches_exact_filter(spark):
    from fileverification_spark.operators import spatial as S

    box = (-35.0, 20.0, -60.0, 30.0)
    live = P.pages_with_derived(spark, SF0001)
    got = {r.url for r in S.zorder_bbox_query(live, *box, level=12).collect()}
    want = {
        r.url
        for r in live.where(
            (F.col("lat") >= box[0]) & (F.col("lat") <= box[1])
            & (F.col("lon") >= box[2]) & (F.col("lon") <= box[3])
        ).collect()
    }
    assert got == want and got


def test_zorder_bbox_query_degenerate_box_is_empty(spark):
    """Empty/degenerate boxes (lat_min > lat_max, antimeridian-crossing
    lon_min > lon_max) decompose to zero Morton intervals; the query must
    degrade to an empty result exactly like bbox_query, not raise at plan
    time (ADVICE r4)."""
    from fileverification_spark.operators import spatial as S

    live = P.pages_with_derived(spark, SF0001)
    for box in ((20.0, -35.0, -60.0, 30.0), (-35.0, 20.0, 170.0, -170.0)):
        assert S.zorder_bbox_query(live, *box, level=12).count() == 0
