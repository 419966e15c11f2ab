"""Slippy-map tiles and hierarchical quadtree geocells (vectorized).

Realizes the reference's declared-but-unused tiling ambition: ``Node.Tile``
(/root/reference/osm/Node.go:26-33) computes a single z/x/y Web-Mercator
tile per node and is never called.  Here the same math is a vectorized
numpy kernel applied per Arrow batch, plus a packed hierarchical cell id
("geocell") that plays the role H3 cells play in BASELINE.json's
north_star: a prefix-hierarchical spatial key for co-partitioning,
shuffles and polygon sharding.

Tile math (identical to the reference formula, corrected clamping):

    n = 2^z
    x = floor((lon + 180) / 360 * n)
    y = floor((1 - ln(tan(lat) + 1/cos(lat)) / pi) / 2 * n)      (lat in radians)
    both clamped to [0, n-1]

Geocell id packing (res <= 29, x,y < 2^29, fits int64 without sign bit):

    cell = (res << 58) | (x << 29) | y

``parent(cell)`` drops one resolution level (x >> 1, y >> 1), giving the
prefix hierarchy used for polygon-shard keys and hot-cell salting.
Every formula is mirrored as ANSI SQL by the ``sql_*`` helpers so the
DuckDB oracle computes identical assignments.
"""

from __future__ import annotations

import numpy as np

RES_SHIFT = 58
XY_BITS = 29


def tile_xy(lon: np.ndarray, lat: np.ndarray, z: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized slippy tile (x, y) at zoom z; int64 outputs."""
    n = 1 << z
    lon = np.asarray(lon, np.float64)
    lat_r = np.radians(np.asarray(lat, np.float64))
    x = np.floor((lon + 180.0) / 360.0 * n)
    # ln(tan+sec) kept in this exact form (not asinh) so DuckDB's
    # ln(tan(r)+1/cos(r)) reproduces it bit-for-bit.
    y = np.floor((1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n)
    x = np.clip(x, 0, n - 1).astype(np.int64)
    y = np.clip(y, 0, n - 1).astype(np.int64)
    return x, y


def cell_id(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Hierarchical quadtree cell id at resolution ``res`` (= zoom level)."""
    if not 0 <= res <= 29:
        raise ValueError(f"res must be in [0, 29], got {res}")
    x, y = tile_xy(lon, lat, res)
    return (np.int64(res) << np.int64(RES_SHIFT)) | (x << np.int64(XY_BITS)) | y


def cell_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Ancestor of each cell at ``parent_res`` (prefix truncation)."""
    cell = np.asarray(cell, np.int64)
    res = (cell >> np.int64(RES_SHIFT)).astype(np.int64)
    if np.any(res < parent_res):
        raise ValueError("parent_res must be <= cell res")
    shift = (res - parent_res).astype(np.int64)
    x = (cell >> np.int64(XY_BITS)) & np.int64((1 << XY_BITS) - 1)
    y = cell & np.int64((1 << XY_BITS) - 1)
    return (np.int64(parent_res) << np.int64(RES_SHIFT)) | ((x >> shift) << np.int64(XY_BITS)) | (y >> shift)


def cell_res(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell, np.int64) >> np.int64(RES_SHIFT)).astype(np.int64)


def cell_to_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, np.int64)
    res = cell >> np.int64(RES_SHIFT)
    x = (cell >> np.int64(XY_BITS)) & np.int64((1 << XY_BITS) - 1)
    y = cell & np.int64((1 << XY_BITS) - 1)
    return res, x, y


def cell_bounds(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(min_lon, min_lat, max_lon, max_lat) of each cell (Web-Mercator tile bounds)."""
    res, x, y = cell_to_xy(cell)
    n = (np.int64(1) << res).astype(np.float64)
    min_lon = x / n * 360.0 - 180.0
    max_lon = (x + 1) / n * 360.0 - 180.0
    max_lat = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * y / n))))
    min_lat = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * (y + 1) / n))))
    return min_lon, min_lat, max_lon, max_lat


def cells_covering_bbox(min_lon: float, min_lat: float, max_lon: float, max_lat: float,
                        res: int) -> np.ndarray:
    """All cell ids at ``res`` intersecting the bbox (polygon shard covering)."""
    n = 1 << res
    x0, y1 = tile_xy(np.array([min_lon]), np.array([min_lat]), res)  # south-west: max y
    x1, y0 = tile_xy(np.array([max_lon]), np.array([max_lat]), res)  # north-east: min y
    xs = np.arange(int(x0[0]), int(x1[0]) + 1, dtype=np.int64)
    ys = np.arange(int(y0[0]), int(y1[0]) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    return ((np.int64(res) << np.int64(RES_SHIFT))
            | (gx.ravel() << np.int64(XY_BITS)) | gy.ravel())


def quadkey(x: np.ndarray, y: np.ndarray, z: int) -> np.ndarray:
    """Bing-maps quadkey string per tile: z base-4 digits, digit i =
    x-bit + 2*y-bit at level i (most-significant first). Vectorized over
    rows — the per-level loop is O(z <= 29), not O(rows); the digit
    matrix is viewed as fixed-width bytes in one shot."""
    x = np.asarray(x, np.int64)
    y = np.asarray(y, np.int64)
    digits = np.empty((len(x), z), np.uint8)
    for i in range(z):
        shift = z - 1 - i
        digits[:, i] = (((x >> shift) & 1) + 2 * ((y >> shift) & 1)
                        + ord("0")).astype(np.uint8)
    return np.ascontiguousarray(digits).view(f"S{z}").ravel()


GEOHASH32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz", dtype=np.uint8)


def geohash(lon: np.ndarray, lat: np.ndarray, precision: int = 6) -> np.ndarray:
    """Vectorized standard geohash (even ``precision``): quantize lon and
    lat to 5*precision/2 bits each, interleave lon-first with the morton
    bit spread, then map each 5-bit group through the base-32 alphabet.

    Mathematically identical to the textbook bisection construction
    (``pyoracle._scalar_geohash`` implements THAT form as the independent
    oracle): bit k of the quantized index equals the k-th bisection
    comparison.  The float paths only disagree within ~1 ulp of a cell
    boundary; the morton cell-center decode (geo/morton.py) keeps every
    input >= half a 2^25-cell (~5e-6 deg) away from any <=15-bit geohash
    boundary, ~6 orders of magnitude above the float error, so the two
    constructions are bit-identical on this data model."""
    if precision % 2 or not 0 < precision <= 12:
        raise ValueError(f"precision must be even in (0, 12], got {precision}")
    from .morton import _part1by1
    half = 5 * precision // 2
    n = 1 << half
    ix = np.clip(np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * n),
                 0, n - 1).astype(np.uint64)
    iy = np.clip(np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0 * n),
                 0, n - 1).astype(np.uint64)
    word = (_part1by1(ix) << np.uint64(1)) | _part1by1(iy)
    chars = np.empty((len(ix), precision), np.uint8)
    for c in range(precision):
        idx = ((word >> np.uint64(5 * (precision - 1 - c)))
               & np.uint64(31)).astype(np.int64)
        chars[:, c] = GEOHASH32[idx]
    return np.ascontiguousarray(chars).view(f"S{precision}").ravel()


# ---------------------------------------------------------------- SQL mirrors

def sql_tile_x(lon_expr: str, z: int) -> str:
    n = 1 << z
    return (f"CAST(LEAST(GREATEST(FLOOR(({lon_expr} + 180.0) / 360.0 * {n}), 0), {n - 1}) AS BIGINT)")


def sql_tile_y(lat_expr: str, z: int) -> str:
    n = 1 << z
    return ("CAST(LEAST(GREATEST(FLOOR((1.0 - LN(TAN(RADIANS({lat})) + 1.0/COS(RADIANS({lat}))) / PI()) "
            "/ 2.0 * {n}), 0), {nm1}) AS BIGINT)").format(lat=lat_expr, n=n, nm1=n - 1)


def sql_quadkey(x_expr: str, y_expr: str, z: int) -> str:
    """SQL mirror of ``quadkey`` — z concatenated base-4 digit chars."""
    parts = [
        f"CAST(((({x_expr}) >> {z - 1 - i}) & 1) "
        f"+ 2 * ((({y_expr}) >> {z - 1 - i}) & 1) AS VARCHAR)"
        for i in range(z)
    ]
    return "(" + " || ".join(parts) + ")"


def sql_cell_id(lon_expr: str, lat_expr: str, res: int) -> str:
    x = sql_tile_x(lon_expr, res)
    y = sql_tile_y(lat_expr, res)
    return f"(CAST({res} AS BIGINT) * {1 << RES_SHIFT} + ({x}) * {1 << XY_BITS} + ({y}))"


def hex_axial(lon: np.ndarray, lat: np.ndarray, size: float
              ) -> tuple[np.ndarray, np.ndarray]:
    """Pointy-top hexagonal binning on the planar lon/lat plane: axial
    (q, r) of the hex of circumradius ``size`` degrees containing each
    point.  Fractional axial coords -> cube coords -> nearest-integer
    cube rounding with the fix-largest-residual rule (the standard hex
    rounding; picks the closest hex center).  Vectorized; int64 out."""
    qf = (np.sqrt(3.0) / 3.0 * lon - lat / 3.0) / size
    rf = (2.0 / 3.0 * lat) / size
    xf, zf = qf, rf
    yf = -xf - zf
    rx, ry, rz = np.round(xf), np.round(yf), np.round(zf)
    dx, dy, dz = np.abs(rx - xf), np.abs(ry - yf), np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def hilbert_d(lon: np.ndarray, lat: np.ndarray, order: int = 16) -> np.ndarray:
    """Hilbert-curve index of each point on the 2^order x 2^order
    lon/lat grid — the locality-preserving linearization a spatial
    partitioner range-splits so neighbouring rows land in the same
    shard (better clustering than the Z-order morton key for range
    scans: no long diagonal jumps).  Vectorized MSB-first rotate/flip
    walk: per bit level the quadrant digit joins the index and the
    frame is rotated so the curve stays continuous — O(order) numpy
    passes, no per-row Python.  int64 out (2*order <= 62)."""
    n = np.int64(1) << np.int64(order)
    x = np.clip((np.asarray(lon, np.float64) + 180.0) / 360.0 * float(n),
                0, float(n - 1)).astype(np.int64)
    y = np.clip((np.asarray(lat, np.float64) + 90.0) / 180.0 * float(n),
                0, float(n - 1)).astype(np.int64)
    d = np.zeros(len(x), np.int64)
    s = n >> np.int64(1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((np.int64(3) * rx) ^ ry)
        # rotate the lower quadrant frame (classic xy2d step; the
        # reflection must flip ALL remaining low bits, hence n-1-x)
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, n - 1 - x, x)
        y_f = np.where(flip, n - 1 - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= np.int64(1)
    return d
