"""Property tests (hypothesis) for the pure-Python grid forms — driver
side only, so thousands of examples cost nothing. The Spark/SQL forms are
pinned equal to these elsewhere (test_grid), so properties proven here
transfer to all three implementations."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from fileverification_spark import grid

lat_s = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
lon_s = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
res_s = st.integers(min_value=0, max_value=12)


@settings(max_examples=300)
@given(lat=lat_s, lon=lon_s, res=res_s)
def test_point_inside_own_cell(lat, lon, res):
    cell = grid.py_cell_encode(lat, lon, res)
    la0, la1, lo0, lo1 = grid.py_cell_bounds(cell)
    # clamped edges: the poles / antimeridian collapse into the last cell
    assert la0 - 1e-9 <= lat <= la1 + 1e-9 or lat in (90.0, -90.0)
    assert lo0 - 1e-9 <= lon <= lo1 + 1e-9 or lon in (180.0, -180.0)


@settings(max_examples=300)
@given(lat=lat_s, lon=lon_s, res=st.integers(min_value=1, max_value=12))
def test_parent_consistency(lat, lon, res):
    """Encoding at res-1 equals the bit-shifted parent of the res cell —
    the ladder edge every Merkle roll-up rests on."""
    child = grid.py_cell_encode(lat, lon, res)
    parent = grid.py_cell_encode(lat, lon, res - 1)
    li = (child % grid.RES_MULT) // grid.LAT_MULT
    lo = child % grid.LAT_MULT
    derived = (res - 1) * grid.RES_MULT + (li >> 1) * grid.LAT_MULT + (lo >> 1)
    assert derived == parent


@settings(max_examples=200)
@given(
    la0=lat_s, la1=lat_s, lo0=lon_s, lo1=lon_s,
    lat=lat_s, lon=lon_s, res=st.integers(min_value=0, max_value=8),
)
def test_covering_contains_inner_points(la0, la1, lo0, lo1, lat, lon, res):
    """Any point inside a rect maps to a cell in the rect's covering —
    the soundness property the PIP prefilter depends on (false positives
    allowed, false negatives never)."""
    la0, la1 = min(la0, la1), max(la0, la1)
    lo0, lo1 = min(lo0, lo1), max(lo0, lo1)
    if not (la0 <= lat <= la1 and lo0 <= lon <= lo1):
        return
    cover = set(grid.cells_covering_rect(la0, la1, lo0, lo1, res))
    assert grid.py_cell_encode(lat, lon, res) in cover


@settings(max_examples=300)
@given(lat=lat_s, lon=lon_s, res=res_s)
def test_cell_id_round_trips_res_and_indices(lat, lon, res):
    cell = grid.py_cell_encode(lat, lon, res)
    assert cell // grid.RES_MULT == res
    li = (cell % grid.RES_MULT) // grid.LAT_MULT
    lo = cell % grid.LAT_MULT
    assert 0 <= li < (1 << res)
    assert 0 <= lo < (1 << (res + 1))


@settings(max_examples=300)
@given(lat=lat_s, lon=lon_s, res=res_s)
def test_py_cell_parent_matches_direct_encode(lat, lon, res):
    """The ancestor of a point's cell at any coarser res must equal
    encoding the point directly at that res — the invariant static
    partition pruning (spatial.prune_to_cells) relies on."""
    cell = grid.py_cell_encode(lat, lon, res)
    for parent_res in range(res + 1):
        assert grid.py_cell_parent(cell, parent_res) == grid.py_cell_encode(
            lat, lon, parent_res
        )


# ---------------------------------------------------------------------------
# Pair-join cover guarantees (pure geometry — the property distance_join
# and nn_join certification rest on)
# ---------------------------------------------------------------------------


def _py_disk(cell: int, res: int, k: int = 1) -> set:
    """Python mirror of grid.grid_disk: lon wraps, lat rows clamp away."""
    nlat, nlon = 1 << res, 1 << (res + 1)
    la = (cell >> 29) & (grid.LAT_MULT - 1)
    lo = cell & (grid.LAT_MULT - 1)
    out = set()
    for dla in range(-k, k + 1):
        r = la + dla
        if not 0 <= r < nlat:
            continue
        for dlo in range(-k, k + 1):
            out.add(res * grid.RES_MULT + r * grid.LAT_MULT + (lo + dlo) % nlon)
    return out


@settings(max_examples=300)
@given(
    lat=st.floats(min_value=-89.999, max_value=89.999),
    lon=st.floats(min_value=-179.999, max_value=179.999),
    radius=st.floats(min_value=1e-3, max_value=60.0),
    ang=st.floats(min_value=0.0, max_value=6.283185),
    frac=st.floats(min_value=0.0, max_value=1.0),
)
def test_distance_join_ring_cover_never_loses_a_pair(lat, lon, radius, ang, frac):
    """Any point within `radius` of (lat, lon) lands in the 3x3 disk of
    its cell at distance_join_res(radius) — the completeness invariant of
    the bucketed pair join."""
    import math

    from fileverification_spark.operators import spatial as S

    res = S.distance_join_res(radius)
    d = radius * frac
    lat2 = lat + d * math.cos(ang)
    lon2 = lon + d * math.sin(ang)
    if not (-90.0 <= lat2 <= 90.0 and -180.0 <= lon2 <= 180.0):
        return  # off-globe displacement: no wrap in the metric either
    c1 = grid.py_cell_encode(lat, lon, res)
    c2 = grid.py_cell_encode(lat2, lon2, res)
    assert c2 in _py_disk(c1, res, 1)


@settings(max_examples=300)
@given(
    lat=st.floats(min_value=-89.999, max_value=89.999),
    lon=st.floats(min_value=-179.999, max_value=179.999),
    res=st.integers(min_value=1, max_value=12),
    ang=st.floats(min_value=0.0, max_value=6.283185),
    frac=st.floats(min_value=0.0, max_value=0.999),
)
def test_nn_certify_guard_is_inside_disk(lat, lon, res, ang, frac):
    """Any point STRICTLY closer than ring_guarantee_radius(res, 1) is in
    the 3x3 disk — so a certified NN (dist < guard) cannot be beaten by an
    unseen point outside the disk."""
    import math

    from fileverification_spark.operators import spatial as S

    guard = S.ring_guarantee_radius(res, 1)
    d = guard * frac
    lat2 = lat + d * math.cos(ang)
    lon2 = lon + d * math.sin(ang)
    if not (-90.0 <= lat2 <= 90.0 and -180.0 <= lon2 <= 180.0):
        return
    c1 = grid.py_cell_encode(lat, lon, res)
    c2 = grid.py_cell_encode(lat2, lon2, res)
    assert c2 in _py_disk(c1, res, 1)
