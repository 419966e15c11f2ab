"""S2-scheme hierarchical cell ids, pure numpy (no s2 library available).

Implements the public S2 geometry scheme — cube-face projection, the
quadratic uv<->st transform, and a Hilbert space-filling curve over the
2^30 x 2^30 leaf grid — with the standard S2 cell-id bit layout:

    id = (face << 61) | (curve_position << 1) | 1        (leaf, level 30)
    level-l id: high bits of the position followed by a single trailing
    1 bit at bit 2*(30-l); all lower bits zero.

The Hilbert traversal uses the classic rotate/flip recurrence rather than
Google's per-face orientation lookup tables, so ids are internally
consistent (hierarchy containment, round-trip, equal-area-ish cells) but
are NOT guaranteed bit-identical to the C++ s2geometry library — no
verification target exists in this sandbox. Used for covering/sharding
keys, with invariants unit-tested (tests/test_geo.py).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_N = 1 << MAX_LEVEL


def _lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray):
    lo = np.radians(np.asarray(lon, np.float64))
    la = np.radians(np.asarray(lat, np.float64))
    cl = np.cos(la)
    return cl * np.cos(lo), cl * np.sin(lo), np.sin(la)


def _xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where((ax >= ay) & (ax >= az), np.where(x >= 0, 0, 3),
                    np.where(ay >= az, np.where(y >= 0, 1, 4),
                             np.where(z >= 0, 2, 5)))
    u = np.empty_like(x)
    v = np.empty_like(x)
    with np.errstate(divide="ignore", invalid="ignore"):
        for f, (ue, ve) in enumerate([
            (y / x, z / x),        # 0: +x
            (-x / y, z / y),       # 1: +y
            (-x / z, -y / z),      # 2: +z
            (z / x, y / x),        # 3: -x
            (z / y, -x / y),       # 4: -y
            (-y / z, -x / z),      # 5: -z
        ]):
            m = face == f
            u[m] = ue[m]
            v[m] = ve[m]
    return face.astype(np.int64), u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2's quadratic projection (area-equalizing)."""
    with np.errstate(invalid="ignore"):  # np.where evaluates both branches
        return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u),
                        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def _xy_to_hilbert(x: np.ndarray, y: np.ndarray, order: int = MAX_LEVEL) -> np.ndarray:
    """Vectorized Hilbert curve position (classic rotate/flip recurrence)."""
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros_like(x, dtype=np.uint64)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += np.uint64(s) * np.uint64(s) * ((3 * rx) ^ ry).astype(np.uint64)
        # rotate quadrant
        flip = ry == 0
        swap_flip = flip & (rx == 1)
        x_f = np.where(swap_flip, s - 1 - x, x)
        y_f = np.where(swap_flip, s - 1 - y, y)
        x, y = np.where(flip, y_f, x), np.where(flip, x_f, y)
        s >>= 1
    return d


def cell_id(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """S2-scheme cell id at ``level`` (0..30) for each (lon, lat)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be 0..{MAX_LEVEL}")
    x, y, z = _lonlat_to_xyz(np.asarray(lon, np.float64), np.asarray(lat, np.float64))
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = np.clip(np.floor(_uv_to_st(u) * _N), 0, _N - 1).astype(np.int64)
    j = np.clip(np.floor(_uv_to_st(v) * _N), 0, _N - 1).astype(np.int64)
    pos = _xy_to_hilbert(i, j)
    raw = (face.astype(np.uint64) << np.uint64(61)) | (pos << np.uint64(1)) | np.uint64(1)
    lsb_target = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    # truncate to level: clear below lsb, set the level's trailing bit
    out = (raw & ~(np.uint64(2) * lsb_target - np.uint64(1))) | lsb_target
    return out.astype(np.int64)


def cell_level(cell: np.ndarray) -> np.ndarray:
    """Level from the trailing-one-bit position."""
    c = np.asarray(cell, np.int64).astype(np.uint64)
    lsb = c & (~c + np.uint64(1))
    lev = MAX_LEVEL - (np.round(np.log2(lsb.astype(np.float64))) / 2).astype(np.int64)
    return lev


def parent(cell: np.ndarray, level: int) -> np.ndarray:
    """Ancestor at ``level`` (prefix truncation, standard S2 semantics)."""
    c = np.asarray(cell, np.int64).astype(np.uint64)
    lsb_target = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return ((c & ~(np.uint64(2) * lsb_target - np.uint64(1))) | lsb_target).astype(np.int64)
