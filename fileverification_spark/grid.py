"""Pure-Spark hierarchical grid (H3/S2 stand-in, zero native deps).

The reference's data model is a recursive folder tree
(FileVerification/PathInfo.cs:427-537); ours is a quadtree lat/lon grid:
resolution ``r`` splits the globe into ``2^r x 2^(r+1)`` cells, and the
parent of a cell at ``r`` is the enclosing cell at ``r-1`` (exactly one —
the "dirname" of F6, FileVerification/PathInfo.cs:235).

Cell id layout (BIGINT, arithmetic only so the identical formula runs in
Spark *and* DuckDB for the oracle):

    cell = res * 2^58 + lat_idx * 2^29 + lon_idx

with ``lat_idx = floor((lat+90)/180 * 2^res)``,
``lon_idx = floor((lon+180)/360 * 2^(res+1))``. All resolutions 0..20.

Every function has a Column form (Spark) and an ``sql_*`` mirror that emits
the same formula as ANSI SQL text (DuckDB dialect) so each query's oracle
derives cells identically. The multiply/divide-by-power-of-two arithmetic
is exact in IEEE doubles, so both engines agree bit-for-bit.

An `h3` import is deliberately absent: the container has no native H3 and
the grid only needs encode/parent/disk semantics, which the quadtree gives
with built-in (codegen'd) expressions — no Python in the hot path at all.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

RES_MULT = 1 << 58  # 288230376151711744
LAT_MULT = 1 << 29  # 536870912
MAX_RES = 20


def _check_res(res: int) -> None:
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution {res} outside [0, {MAX_RES}]")


# ---------------------------------------------------------------------------
# Column (Spark) forms — all built-in expressions, whole-stage codegen'd.
# ---------------------------------------------------------------------------


def lat_idx(lat: Column, res: int) -> Column:
    """Row index at ``res``: floor((lat+90)/180 * 2^res), clamped."""
    _check_res(res)
    n = 1 << res
    raw = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n)))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("bigint")


def lon_idx(lon: Column, res: int) -> Column:
    """Column index at ``res``: floor((lon+180)/360 * 2^(res+1)), clamped."""
    _check_res(res)
    n = 1 << (res + 1)
    raw = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("bigint")


def cell_encode(lat: Column, lon: Column, res: int) -> Column:
    """(lat, lon) → cell id at ``res``."""
    _check_res(res)
    return (
        F.lit(res).cast("bigint") * F.lit(RES_MULT)
        + lat_idx(lat, res) * F.lit(LAT_MULT)
        + lon_idx(lon, res)
    ).alias(f"cell_r{res}")


def cell_res(cell: Column) -> Column:
    return F.shiftright(cell, 58)


def cell_lat_idx(cell: Column) -> Column:
    return F.shiftright(cell, 29).bitwiseAND(F.lit(LAT_MULT - 1))


def cell_lon_idx(cell: Column) -> Column:
    return cell.bitwiseAND(F.lit(LAT_MULT - 1))


def cell_parent(cell: Column, res: int, parent_res: int) -> Column:
    """Enclosing cell at coarser ``parent_res`` (the Merkle-ladder edge).

    Pure bit arithmetic — exact, and mirrored verbatim by sql_cell_parent
    so oracle and engine agree on every ladder edge.
    """
    _check_res(res)
    _check_res(parent_res)
    if parent_res > res:
        raise ValueError("parent_res must be <= res")
    d = res - parent_res
    return (
        F.lit(parent_res).cast("bigint") * F.lit(RES_MULT)
        + F.shiftright(cell_lat_idx(cell), d) * F.lit(LAT_MULT)
        + F.shiftright(cell_lon_idx(cell), d)
    )


def cell_bounds(cell: Column, res: int) -> tuple[Column, Column, Column, Column]:
    """(lat_min, lat_max, lon_min, lon_max) of the cell rectangle."""
    _check_res(res)
    dlat = 180.0 / (1 << res)
    dlon = 360.0 / (1 << (res + 1))
    la = cell_lat_idx(cell).cast("double") * F.lit(dlat) - F.lit(90.0)
    lo = cell_lon_idx(cell).cast("double") * F.lit(dlon) - F.lit(180.0)
    return la, la + F.lit(dlat), lo, lo + F.lit(dlon)


def cell_center(cell: Column, res: int) -> tuple[Column, Column]:
    la0, la1, lo0, lo1 = cell_bounds(cell, res)
    return (la0 + la1) * F.lit(0.5), (lo0 + lo1) * F.lit(0.5)


def grid_disk(cell: Column, res: int, k: int) -> Column:
    """Array of all cells within Chebyshev ring distance ``k`` (incl. self).

    Longitude wraps (mod 2^(res+1)); latitude rows outside the grid are
    dropped. Built from sequence/transform/flatten — no Python, fully
    codegen'd, so the kNN ring expansion stays JVM-side.
    """
    _check_res(res)
    if k < 0:
        raise ValueError("k must be >= 0")
    nlat = 1 << res
    nlon = 1 << (res + 1)
    li = cell_lat_idx(cell)
    lo = cell_lon_idx(cell)
    # rows: lat_idx+d for d in [-k, k] kept if in range; cols wrap.
    rows = F.filter(
        F.transform(
            F.sequence(F.lit(-k), F.lit(k)), lambda d: li + d.cast("bigint")
        ),
        lambda r: (r >= 0) & (r < nlat),
    )
    base = F.lit(res).cast("bigint") * F.lit(RES_MULT)
    return F.flatten(
        F.transform(
            rows,
            lambda r: F.transform(
                F.sequence(F.lit(-k), F.lit(k)),
                lambda d: base
                + r * F.lit(LAT_MULT)
                + F.pmod(lo + d.cast("bigint"), F.lit(nlon)),
            ),
        )
    )


def grid_half_disk(cell: Column, res: int) -> Column:
    """Array of the 5-cell HALF Chebyshev disk: self, E, NE, N, NW —
    the lexicographic half-plane of the k=1 ring.

    Plane-sweep dedup for symmetric pair joins (distance_self_join):
    for any two cells at Chebyshev distance 1, exactly ONE of them
    contains the other in its half-disk (the four excluded directions
    W/SW/S/SE are the mirror images of the four included ones), so each
    cross-cell candidate pair materialises once instead of twice and the
    probe-side explode drops from 9 to 5 rows per point — ~2x less join
    output, 4/9 less shuffle — with zero semantic change. Same-cell
    pairs still appear in both orders; callers dedupe those with a key
    inequality. Longitude wraps; latitude rows off the grid are dropped.
    Requires res >= 1 (at res 0 the 2-column wrap aliases E/NW offsets).
    """
    _check_res(res)
    if res < 1:
        raise ValueError("grid_half_disk needs res >= 1 (lon wrap alias)")
    nlat = 1 << res
    nlon = 1 << (res + 1)
    li = cell_lat_idx(cell)
    lo = cell_lon_idx(cell)
    base = F.lit(res).cast("bigint") * F.lit(RES_MULT)

    def mk(dlat: int, dlon: int) -> Column:
        return (base + (li + F.lit(dlat)) * F.lit(LAT_MULT)
                + F.pmod(lo + F.lit(dlon), F.lit(nlon)))

    # (dlat, dlon): self, E, NE, N, NW
    offsets = [(0, 0), (0, 1), (1, 1), (1, 0), (1, -1)]
    return F.filter(
        F.array(*[mk(a, o) for a, o in offsets]),
        lambda c: (c - F.lit(res).cast("bigint") * F.lit(RES_MULT))
        < F.lit(nlat * LAT_MULT).cast("bigint"),
    )


_MORTON_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_bits(x: Column) -> Column:
    """Spread the low 32 bits of ``x`` into the even bit positions of a
    64-bit word (the classic 5-step Morton magic-number dilation) —
    pure shift/mask Column arithmetic, whole-stage codegen'd."""
    x = x.bitwiseAND(F.lit(0xFFFFFFFF))
    for sh, mask in _MORTON_MASKS:
        x = (x.bitwiseOR(F.shiftleft(x, sh))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(cell: Column) -> Column:
    """Z-order (Morton) key of a cell: its lat/lon indices bit-interleaved
    (lon in even positions — it carries one more bit than lat).

    Sorting rows by this key clusters 2D-adjacent cells into 1D-adjacent
    positions: any power-of-two-aligned square of cells occupies ONE
    contiguous key range. It is the engine's Iceberg sort-order analogue
    (public Iceberg/Delta both expose z-order clustering for exactly this
    reason): files written in key order carry tight min/max stats on
    ``cell``-derived predicates, so bbox/cell-range scans touch a bounded
    handful of files instead of every file — the file-skipping layout
    lever, orthogonal to directory-level partition pruning
    (sources/pages.write_cell_partitioned). Resolution bits are NOT
    encoded; the key orders cells within one resolution (callers keep
    resolutions apart, as the manifest tables already do)."""
    return F.shiftleft(_spread_bits(cell_lat_idx(cell)), 1).bitwiseOR(
        _spread_bits(cell_lon_idx(cell))
    )


def zorder_key_py(lat_idx: int, lon_idx: int) -> int:
    """Pure-Python reference twin of :func:`zorder_key` for tests."""

    def spread(v: int) -> int:
        v &= 0xFFFFFFFF
        for sh, mask in _MORTON_MASKS:
            v = (v | (v << sh)) & mask
        return v

    return (spread(lat_idx) << 1) | spread(lon_idx)


# ---------------------------------------------------------------------------
# Vectorized pandas-UDF encoder (north_star: "assigned a cell via
# vectorized pandas/Arrow UDF batch encoding"). The JVM `cell_encode`
# above is the default hot path — codegen beats Arrow transfer — but the
# UDF form is the seam where a *native* index (H3/S2) plugs in: with the
# `h3` wheel installed it batch-encodes real H3 cells; without it, the
# same numpy arithmetic as the JVM formula (tests pin them equal).
# ---------------------------------------------------------------------------


def have_h3() -> bool:
    try:
        import h3  # noqa: F401

        return True
    except ImportError:
        return False


def cell_encode_pandas(res: int, use_h3: bool = False):
    """Return a pandas UDF (lat, lon) -> BIGINT cell at ``res``.

    ``use_h3=True`` requires the native `h3` package (absent in this
    container — gated behind an import, NOT stubbed: the call raises
    ImportError with a clear message rather than faking H3 ids).
    """
    _check_res(res)
    import numpy as np

    if use_h3:
        if not have_h3():
            raise ImportError(
                "native 'h3' package not installed; use use_h3=False for "
                "the quadtree backend (same interface, pure numpy)"
            )
        import h3

        @F.pandas_udf(T.LongType())
        def enc_h3(lat: pd.Series, lon: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    int(h3.latlng_to_cell(la, lo, res), 16)
                    for la, lo in zip(lat, lon)
                ],
                index=lat.index,
            )

        return enc_h3

    nlat, nlon = 1 << res, 1 << (res + 1)

    @F.pandas_udf(T.LongType())
    def enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        li = np.clip(
            np.floor((lat.to_numpy() + 90.0) / 180.0 * nlat).astype(np.int64),
            0,
            nlat - 1,
        )
        lo = np.clip(
            np.floor((lon.to_numpy() + 180.0) / 360.0 * nlon).astype(np.int64),
            0,
            nlon - 1,
        )
        return pd.Series(res * RES_MULT + li * LAT_MULT + lo, index=lat.index)

    return enc


# ---------------------------------------------------------------------------
# Driver-side (plain Python) forms — polygon covering prep for broadcast.
# ---------------------------------------------------------------------------


def py_cell_encode(lat: float, lon: float, res: int) -> int:
    _check_res(res)
    nlat, nlon = 1 << res, 1 << (res + 1)
    li = min(max(int((lat + 90.0) / 180.0 * nlat), 0), nlat - 1)
    lo = min(max(int((lon + 180.0) / 360.0 * nlon), 0), nlon - 1)
    return res * RES_MULT + li * LAT_MULT + lo


def py_cell_parent(cell: int, parent_res: int) -> int:
    """Driver-side twin of ``cell_parent``: the ancestor cell at
    ``parent_res`` (used to map candidate cells onto a coarser
    partition-layout column for static partition pruning)."""
    res = cell // RES_MULT
    if parent_res > res:
        raise ValueError(f"parent_res {parent_res} finer than cell res {res}")
    d = res - parent_res
    li = (cell % RES_MULT) // LAT_MULT
    lo = cell % LAT_MULT
    return parent_res * RES_MULT + (li >> d) * LAT_MULT + (lo >> d)


def py_cell_bounds(cell: int) -> tuple[float, float, float, float]:
    res = cell // RES_MULT
    li = (cell % RES_MULT) // LAT_MULT
    lo = cell % LAT_MULT
    dlat = 180.0 / (1 << res)
    dlon = 360.0 / (1 << (res + 1))
    la0 = li * dlat - 90.0
    lo0 = lo * dlon - 180.0
    return la0, la0 + dlat, lo0, lo0 + dlon


def cells_covering_rect(
    lat_min: float, lat_max: float, lon_min: float, lon_max: float, res: int
) -> list[int]:
    """All cells at ``res`` intersecting the rectangle (driver-side prep;
    polygons are few and small, the covering is broadcast to executors)."""
    _check_res(res)
    nlat, nlon = 1 << res, 1 << (res + 1)
    li0 = min(max(int((lat_min + 90.0) / 180.0 * nlat), 0), nlat - 1)
    li1 = min(max(int((lat_max + 90.0) / 180.0 * nlat), 0), nlat - 1)
    lo0 = min(max(int((lon_min + 180.0) / 360.0 * nlon), 0), nlon - 1)
    lo1 = min(max(int((lon_max + 180.0) / 360.0 * nlon), 0), nlon - 1)
    return [
        res * RES_MULT + li * LAT_MULT + lo
        for li in range(li0, li1 + 1)
        for lo in range(lo0, lo1 + 1)
    ]


# ---------------------------------------------------------------------------
# SQL mirrors (DuckDB dialect) — identical arithmetic for the oracle.
# ---------------------------------------------------------------------------


def sql_lat_idx(lat_expr: str, res: int) -> str:
    n = 1 << res
    return (
        f"LEAST(GREATEST(CAST(FLOOR(({lat_expr} + 90.0) / 180.0 * {n}.0) "
        f"AS BIGINT), 0), {n - 1})"
    )


def sql_lon_idx(lon_expr: str, res: int) -> str:
    n = 1 << (res + 1)
    return (
        f"LEAST(GREATEST(CAST(FLOOR(({lon_expr} + 180.0) / 360.0 * {n}.0) "
        f"AS BIGINT), 0), {n - 1})"
    )


def sql_cell_encode(lat_expr: str, lon_expr: str, res: int) -> str:
    return (
        f"(CAST({res} AS BIGINT) * {RES_MULT} "
        f"+ {sql_lat_idx(lat_expr, res)} * {LAT_MULT} "
        f"+ {sql_lon_idx(lon_expr, res)})"
    )


def sql_cell_parent(cell_expr: str, res: int, parent_res: int) -> str:
    d = res - parent_res
    mask = LAT_MULT - 1
    return (
        f"(CAST({parent_res} AS BIGINT) * {RES_MULT} "
        f"+ ((({cell_expr} >> 29) & {mask}) >> {d}) * {LAT_MULT} "
        f"+ (({cell_expr} & {mask}) >> {d}))"
    )


# ---------------------------------------------------------------------------
# Web-Mercator XYZ tiles (slippy-map / Bing quadkey interop)
# ---------------------------------------------------------------------------

#: Web-Mercator latitude clamp (the standard EPSG:3857 cutoff)
MERC_MAX_LAT = 85.05112878


def tile_xyz(lat: Column, lon: Column, z: int) -> dict[str, Column]:
    """Slippy-map tile address at zoom ``z``: the public OSM/Google/Bing
    tiling every web map uses — (x, y, quadkey) Columns, pure codegen'd
    trig/bit arithmetic, no UDF.

    x = floor((lon+180)/360 * 2^z); y from the Web-Mercator projection
    y = floor((1 - ln(tan(pi/4 + lat/2))/pi)/2 * 2^z) with lat clamped
    to +/-85.05112878 (the EPSG:3857 cutoff). quadkey is the Bing Maps
    base-4 string (MSB-first interleave of y,x bits) — tile z/x/y and
    its quadkey name the same tile, so rasters exported with these
    columns drop into any public tile pipeline.

    This is the interop layer OVER the engine's quadtree cells, not a
    replacement: cells are equirectangular (uniform lat bands, exact
    integer arithmetic, Merkle-friendly); XYZ tiles are Mercator
    (conformal, standard for display). Both engines spell the identical
    double expression, so the oracle matches bit-for-bit except a
    <=1-ulp ln/tan library difference landing exactly on a floor
    boundary (probability ~1e-16 per row)."""
    if not 0 <= z <= 30:
        raise ValueError(f"zoom must be in [0, 30], got {z}")
    n = 1 << z
    x = F.least(
        F.greatest(
            F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
            .cast("bigint"),
            F.lit(0),
        ),
        F.lit(n - 1),
    )
    clat = F.least(
        F.greatest(lat, F.lit(-MERC_MAX_LAT)), F.lit(MERC_MAX_LAT)
    )
    lat_r = F.radians(clat)
    import math

    y = F.least(
        F.greatest(
            F.floor(
                (
                    F.lit(1.0)
                    - F.log(F.tan(F.lit(math.pi / 4.0) + lat_r / F.lit(2.0)))
                    / F.lit(math.pi)
                )
                / F.lit(2.0)
                * F.lit(float(n))
            ).cast("bigint"),
            F.lit(0),
        ),
        F.lit(n - 1),
    )
    return {"x": x, "y": y}


def tile_quadkey(x: Column, y: Column, z: int) -> Column:
    """Bing Maps quadkey of tile (x, y) at zoom ``z``: z base-4 digits,
    MSB first, digit = 2*y_bit + x_bit. ``z`` is a plan-time constant,
    so the digits unroll to z codegen'd shift/mask terms."""
    return F.concat_ws(
        "",
        *[
            ((F.shiftright(y, i) % 2) * 2 + F.shiftright(x, i) % 2).cast(
                "string"
            )
            for i in range(z - 1, -1, -1)
        ],
    )


def sql_tile_xyz(lat_expr: str, lon_expr: str, z: int) -> tuple[str, str]:
    """DuckDB mirror of tile_xyz: (x_sql, y_sql) expression strings."""
    n = 1 << z
    x = (
        f"LEAST(GREATEST(CAST(FLOOR(({lon_expr} + 180.0) / 360.0 * {n}.0) "
        f"AS BIGINT), 0), {n - 1})"
    )
    clat = (
        f"LEAST(GREATEST({lat_expr}, {-MERC_MAX_LAT!r}), {MERC_MAX_LAT!r})"
    )
    y = (
        f"LEAST(GREATEST(CAST(FLOOR((1.0 - ln(tan(pi()/4.0 + "
        f"radians({clat})/2.0))/pi())/2.0 * {n}.0) AS BIGINT), 0), {n - 1})"
    )
    return x, y


def sql_tile_quadkey(x_expr: str, y_expr: str, z: int) -> str:
    """DuckDB mirror of tile_quadkey."""
    return (
        f"array_to_string(list_transform(generate_series({z}, 1, -1), "
        f"i -> CAST((({y_expr} >> CAST(i - 1 AS INT)) & 1) * 2 "
        f"+ (({x_expr} >> CAST(i - 1 AS INT)) & 1) AS VARCHAR)), '')"
    )


# ---------------------------------------------------------------------------
# Geohash interop — the third public addressing scheme next to XYZ/quadkey
# ---------------------------------------------------------------------------

#: the public geohash base-32 alphabet (no a/i/l/o)
GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_char_values(lat: Column, lon: Column, precision: int) -> list[Column]:
    """Per-character 5-bit values of the geohash, unrolled at plan time.

    Geohash bit layout (public spec): 5*precision bits MSB-first, even
    global bit positions from longitude, odd from latitude; each side is
    the binary-search quantisation of its coordinate, i.e. the top bits
    of floor((coord - lo) / (hi - lo) * 2^bits).
    """
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2

    def quant(coord: Column, lo: float, hi: float, bits: int) -> Column:
        n = 1 << bits
        q = F.floor((coord - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(n))).cast(
            "bigint"
        )
        return F.least(F.greatest(q, F.lit(0)), F.lit(n - 1))

    lon_q = quant(lon, -180.0, 180.0, lon_bits)
    lat_q = quant(lat, -90.0, 90.0, lat_bits)

    def bit(i: int) -> Column:
        if i % 2 == 0:
            return F.shiftright(lon_q, lon_bits - 1 - i // 2).bitwiseAND(F.lit(1))
        return F.shiftright(lat_q, lat_bits - 1 - (i - 1) // 2).bitwiseAND(F.lit(1))

    out = []
    for j in range(precision):
        c = F.lit(0)
        for b in range(5):
            c = c + F.shiftleft(bit(5 * j + b), 4 - b)
        out.append(c)
    return out


def geohash(lat: Column, lon: Column, precision: int) -> Column:
    """Geohash string of (lat, lon) at ``precision`` chars — the public
    base-32 cell addressing (Elasticsearch/Redis/PostGIS interop), pure
    codegen'd shift/mask arithmetic unrolled at plan time, no UDF.

    Like tile_xyz/tile_quadkey this is an EXPORT surface over the
    engine's quadtree cells, not a replacement: a geohash prefix is a
    rectangle, so `geohash(lat, lon, p)` group-bys give rasters any
    public geo stack can ingest directly. All arithmetic is exact
    integer quantisation (floor of a double product — identical
    expression both engines), so the oracle matches bit-for-bit."""
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in [1, 12], got {precision}")
    alphabet = F.array(*[F.lit(ch) for ch in GEOHASH_ALPHABET])
    return F.concat_ws(
        "",
        *[
            F.element_at(alphabet, (c + F.lit(1)).cast("int"))
            for c in _geohash_char_values(lat, lon, precision)
        ],
    )


def sql_geohash(lat_expr: str, lon_expr: str, precision: int) -> str:
    """DuckDB mirror of :func:`geohash` (same unrolled arithmetic)."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2

    def quant(expr: str, lo: float, hi: float, bits: int) -> str:
        n = 1 << bits
        return (
            f"LEAST(GREATEST(CAST(FLOOR(({expr} - ({lo!r})) / {hi - lo!r}"
            f" * {n}.0) AS BIGINT), 0), {n - 1})"
        )

    lon_q = quant(lon_expr, -180.0, 180.0, lon_bits)
    lat_q = quant(lat_expr, -90.0, 90.0, lat_bits)

    def bit(i: int) -> str:
        if i % 2 == 0:
            return f"(({lon_q} >> {lon_bits - 1 - i // 2}) & 1)"
        return f"(({lat_q} >> {lat_bits - 1 - (i - 1) // 2}) & 1)"

    chars = []
    for j in range(precision):
        c = " + ".join(f"({bit(5 * j + b)} << {4 - b})" for b in range(5))
        chars.append(
            f"substr('{GEOHASH_ALPHABET}', CAST(({c}) + 1 AS INT), 1)"
        )
    return " || ".join(chars)


# ---------------------------------------------------------------------------
# Z-order (Morton) linearization — the physical-layout key for file pruning
# ---------------------------------------------------------------------------

#: default Morton grid: 2^12 x 2^12 cells -> 24-bit keys
ZORDER_LEVEL = 12


def _check_zlevel(level: int) -> None:
    if not 1 <= level <= 28:  # 2*28 = 56 bits, well inside BIGINT
        raise ValueError(f"zorder level must be in [1, 28], got {level}")


def zorder_xy(lat: Column, lon: Column, level: int) -> dict[str, Column]:
    """Square ``2^level x 2^level`` quantization of (lat, lon) — the
    equirectangular twin of :func:`tile_xyz` (no Mercator), so the
    arithmetic is exact-double and bit-identical in DuckDB."""
    _check_zlevel(level)
    n = 1 << level
    x = F.least(
        F.greatest(
            F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
            .cast("bigint"),
            F.lit(0),
        ),
        F.lit(n - 1),
    )
    y = F.least(
        F.greatest(
            F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n)))
            .cast("bigint"),
            F.lit(0),
        ),
        F.lit(n - 1),
    )
    return {"x": x, "y": y}


def morton_key(x: Column, y: Column, level: int) -> Column:
    """Interleave two ``level``-bit indices into the Morton (Z-order) key:
    bit ``i`` of x lands at key bit ``2i``, bit ``i`` of y at ``2i+1``.
    ``level`` is a plan-time constant so the interleave unrolls into
    2*level codegen'd shift/mask terms — no UDF, no loop at runtime.

    This is the DATA-LAYOUT key the engine sorts/clusters the pages table
    by at scale (Iceberg ``sort_order`` / parquet row-group ordering):
    any lat/lon rectangle decomposes into O(perimeter) contiguous key
    ranges (:func:`morton_ranges`), which min/max column stats turn into
    file+row-group skips — the same mechanics the reference gets from its
    directory tree (FileVerification/PathInfo.cs:427-537: one folder =
    one contiguous subtree of work)."""
    _check_zlevel(level)
    terms = []
    for i in range(level):
        terms.append(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("bigint")


def sql_zorder_xy(lat_expr: str, lon_expr: str, level: int) -> tuple[str, str]:
    """DuckDB mirror of :func:`zorder_xy`: (x_sql, y_sql)."""
    _check_zlevel(level)
    n = 1 << level
    x = (
        f"LEAST(GREATEST(CAST(FLOOR(({lon_expr} + 180.0) / 360.0 * {n}.0) "
        f"AS BIGINT), 0), {n - 1})"
    )
    y = (
        f"LEAST(GREATEST(CAST(FLOOR(({lat_expr} + 90.0) / 180.0 * {n}.0) "
        f"AS BIGINT), 0), {n - 1})"
    )
    return x, y


def sql_morton_key(x_expr: str, y_expr: str, level: int) -> str:
    """DuckDB mirror of :func:`morton_key` (same unrolled shift/mask sum).
    Pass plain column names — the caller should bind zorder_xy in an inner
    SELECT so the quantization isn't re-spelled 2*level times."""
    _check_zlevel(level)
    terms = []
    for i in range(level):
        terms.append(f"((({x_expr} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y_expr} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def morton_interleave_py(x: int, y: int, level: int) -> int:
    """Pure-Python twin of :func:`morton_key` (tests + range planning)."""
    z = 0
    for i in range(level):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def zorder_xy_py(lat: float, lon: float, level: int) -> tuple[int, int]:
    """Pure-Python twin of :func:`zorder_xy`."""
    import math

    n = 1 << level
    x = min(max(int(math.floor((lon + 180.0) / 360.0 * float(n))), 0), n - 1)
    y = min(max(int(math.floor((lat + 90.0) / 180.0 * float(n))), 0), n - 1)
    return x, y


def morton_ranges(
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    level: int = ZORDER_LEVEL,
    max_ranges: int = 64,
    split_depth: int = 8,
) -> list[tuple[int, int]]:
    """Decompose a lat/lon rectangle into <= ``max_ranges`` contiguous
    Morton-key intervals that COVER it (a superset — the caller re-applies
    the exact bounds test, exactly like :func:`bbox_query`'s cell cover).

    Driver-side pure Python over the implicit quadtree: a node at depth d
    fixes the top d bits of x and y, so its keys are one contiguous range
    ``[prefix << 2s, (prefix+1) << 2s - 1]`` (s = level - d). Nodes fully
    inside the box emit their range; straddling nodes recurse down to
    ``split_depth`` (the visit count is O(4 * split_depth * perimeter
    nodes), ~1k at depth 8 — microseconds); leftovers emit as supersets.
    Adjacent ranges merge, then the smallest inter-range gaps coalesce
    until <= max_ranges. The result goes into the scan as an OR-of-BETWEEN
    predicate on the layout key — min/max stats prune everything outside.
    """
    _check_zlevel(level)
    if max_ranges < 1:
        raise ValueError("max_ranges must be >= 1")
    x0, y0 = zorder_xy_py(lat_min, lon_min, level)
    x1, y1 = zorder_xy_py(lat_max, lon_max, level)
    cap = min(level, split_depth)
    out: list[tuple[int, int]] = []

    def rec(d: int, xp: int, yp: int) -> None:
        s = level - d
        nx0, ny0 = xp << s, yp << s
        nx1, ny1 = nx0 + (1 << s) - 1, ny0 + (1 << s) - 1
        if nx1 < x0 or nx0 > x1 or ny1 < y0 or ny0 > y1:
            return
        zbase = morton_interleave_py(xp, yp, d) << (2 * s)
        if (x0 <= nx0 and nx1 <= x1 and y0 <= ny0 and ny1 <= y1) or d >= cap:
            out.append((zbase, zbase + (1 << (2 * s)) - 1))
            return
        for cy in (0, 1):
            for cx in (0, 1):
                rec(d + 1, xp * 2 + cx, yp * 2 + cy)

    rec(0, 0, 0)
    out.sort()
    merged: list[list[int]] = []
    for lo, hi in out:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    while len(merged) > max_ranges:
        # coalesce the pair with the smallest key gap (cheapest extra scan)
        gi = min(
            range(len(merged) - 1),
            key=lambda i: merged[i + 1][0] - merged[i][1],
        )
        merged[gi][1] = merged[gi + 1][1]
        del merged[gi + 1]
    return [(lo, hi) for lo, hi in merged]


# ---------------------------------------------------------------------------
# Hilbert curve (the locality-optimal companion of the Morton key)
# ---------------------------------------------------------------------------
#
# Hilbert d-index of a 2^level x 2^level grid point (Hilbert 1891; the
# xy->d iteration is the standard public formulation, e.g. Hamilton's
# compact Hilbert indices tech report CS-2006-07 / the classic
# quadrant-rotation loop). Same role as morton_key — a space-filling
# data-layout key the table is sorted/clustered by — but consecutive
# Hilbert keys are ALWAYS 4-neighbors on the grid (Morton takes long
# diagonal jumps at quadrant seams), so range scans touch fewer extra
# tiles: the classic measure is ~half the average bbox-query false
# positives vs Z-order at equal level. The audit query (hilbert_layout)
# makes that claim measurable on this engine's own corpus next to
# zorder_layout's identical stats.
#
# Execution shape: the xy->d loop carries (x, y) state across levels —
# inlining it as one nested Column would triple the expression per
# level (3^level nodes). attach_hilbert_key therefore unrolls it as a
# CHAIN OF PROJECTIONS (one select per level, each a handful of CASE /
# shift / add terms over the previous level's named columns) that
# whole-stage codegen fuses into a single pass — no UDF, no Python, no
# shuffle, and the SQL mirror is the same chain as a WITH ladder.

#: 2^HILBERT_LEVEL x 2^HILBERT_LEVEL grid — matches ZORDER_LEVEL so the
#: two layout audits are comparable bucket-for-bucket
HILBERT_LEVEL = ZORDER_LEVEL


def _hilbert_step(n: int, k: int):
    """Column transforms for one xy->d level: returns (d_term, new_x,
    new_y) as functions of the current (x, y) Columns. s = 2^k is the
    bit being consumed; the rotation uses the full n-1 flip exactly as
    the classic loop does (higher bits are already consumed, lower bits
    all flip)."""
    s = 1 << k

    def step(x: Column, y: Column, d: Column):
        rx = F.shiftright(x, k).bitwiseAND(F.lit(1))
        ry = F.shiftright(y, k).bitwiseAND(F.lit(1))
        quad = (rx * F.lit(3)).bitwiseXOR(ry)
        d2 = d + F.lit(s * s) * quad
        flip_x = F.lit(n - 1) - x
        flip_y = F.lit(n - 1) - y
        nx = F.when(ry == 1, x).otherwise(
            F.when(rx == 1, flip_y).otherwise(y)
        )
        ny = F.when(ry == 1, y).otherwise(
            F.when(rx == 1, flip_x).otherwise(x)
        )
        return d2, nx, ny

    return step


def attach_hilbert_key(
    df: DataFrame,
    lat: Column,
    lon: Column,
    level: int = HILBERT_LEVEL,
    out: str = "hkey",
) -> DataFrame:
    """``df`` + a ``hkey`` BIGINT column: the Hilbert d-index of the
    equirectangular (lat, lon) quantization (same zorder_xy grid as the
    Morton key, so hilbert_layout and zorder_layout audit the SAME
    cells). One projection per level, zero shuffle."""
    _check_zlevel(level)
    n = 1 << level
    xy = zorder_xy(lat, lon, level)
    cur = df.withColumns(
        {"_hx": xy["x"], "_hy": xy["y"], out: F.lit(0).cast("bigint")}
    )
    for k in range(level - 1, -1, -1):
        d2, nx, ny = _hilbert_step(n, k)(
            F.col("_hx"), F.col("_hy"), F.col(out)
        )
        cur = cur.withColumns({out: d2.cast("bigint"), "_hx": nx, "_hy": ny})
    return cur.drop("_hx", "_hy")


def sql_hilbert_ladder(
    level: int = HILBERT_LEVEL,
    src: str = "pages",
    lat_expr: str = "lat",
    lon_expr: str = "lon",
    keep: str = "",
) -> str:
    """DuckDB mirror of :func:`attach_hilbert_key`: WITH-clause fragment
    ``hl{level} AS (...), ..., hl0 AS (...)`` whose last CTE ``hl0``
    carries ``hkey`` (+ any ``keep`` columns, comma-prefixed)."""
    _check_zlevel(level)
    n = 1 << level
    x_sql, y_sql = sql_zorder_xy(lat_expr, lon_expr, level)
    parts = [
        f"hl{level} AS (SELECT {x_sql} AS hx, {y_sql} AS hy, "
        f"CAST(0 AS BIGINT) AS hkey{keep} FROM {src})"
    ]
    for k in range(level - 1, -1, -1):
        s = 1 << k
        rx = f"((hx >> {k}) & 1)"
        ry = f"((hy >> {k}) & 1)"
        d2 = f"hkey + {s * s} * xor(3 * {rx}, {ry})"
        nx = (
            f"CASE WHEN {ry} = 1 THEN hx "
            f"WHEN {rx} = 1 THEN {n - 1} - hy ELSE hy END"
        )
        ny = (
            f"CASE WHEN {ry} = 1 THEN hy "
            f"WHEN {rx} = 1 THEN {n - 1} - hx ELSE hx END"
        )
        keep_cols = keep
        parts.append(
            f"hl{k} AS (SELECT {nx} AS hx, {ny} AS hy, "
            f"CAST({d2} AS BIGINT) AS hkey{keep_cols} FROM hl{k + 1})"
        )
    return ",\n".join(parts)


def hilbert_key_py(x: int, y: int, level: int = HILBERT_LEVEL) -> int:
    """Pure-Python twin of :func:`attach_hilbert_key` (tests)."""
    _check_zlevel(level)
    n = 1 << level
    d = 0
    for k in range(level - 1, -1, -1):
        s = 1 << k
        rx = (x >> k) & 1
        ry = (y >> k) & 1
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
    return d
