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
