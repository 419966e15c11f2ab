"""Morton (Z-order) geotag codec for the ``phash`` column.

The graft input table (BASELINE.json ``input_hint``) carries its geotag
inside the 64-bit ``phash`` column (FIXTURES.md §1): the high 50 bits are
a Morton interleave of 25-bit quantized (lon, lat); the low 12 bits are a
per-row disambiguator.  ``decode_lonlat`` is a pure stateless function used
as the first vectorized ``map_batches`` stage of every spatial pipeline.

Layout (all in an int64, sign bit never set: 50 + 12 = 62 bits):

    phash = (morton50(u, v) << 12) | (i % 4096)
    u = floor((lon + 180) / 360 * 2^25)        in [0, 2^25)
    v = floor((lat + 90)  / 180 * 2^25)        in [0, 2^25)
    decoded lon = -180 + 360 * (u + 0.5) / 2^25   (cell center)
    decoded lat =  -90 + 180 * (v + 0.5) / 2^25

Morton bit i of u sits at phash bit 12 + 2*i; bit i of v at 13 + 2*i.
This exact layout is also emitted as ANSI SQL by ``sql_decode_exprs`` so
the DuckDB oracle can reproduce the decode bit-for-bit.
"""

from __future__ import annotations

import numpy as np

BITS = 25
SCALE = 1 << BITS  # 2^25 cells per axis; ~1.2 m lon resolution at the equator
LOW_BITS = 12

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M3 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M4 = np.uint64(0x00FF00FF00FF00FF)
_M5 = np.uint64(0x0000FFFF0000FFFF)
_M6 = np.uint64(0x00000000FFFFFFFF)


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of x so bit i moves to bit 2*i."""
    x = x.astype(np.uint64) & _M6
    x = (x | (x << np.uint64(16))) & _M5
    x = (x | (x << np.uint64(8))) & _M4
    x = (x | (x << np.uint64(4))) & _M3
    x = (x | (x << np.uint64(2))) & _M2
    x = (x | (x << np.uint64(1))) & _M1
    return x


def _compact1by1(x: np.ndarray) -> np.ndarray:
    """Inverse of _part1by1: gather even bits of x down to the low 32 bits."""
    x = x.astype(np.uint64) & _M1
    x = (x | (x >> np.uint64(1))) & _M2
    x = (x | (x >> np.uint64(2))) & _M3
    x = (x | (x >> np.uint64(4))) & _M4
    x = (x | (x >> np.uint64(8))) & _M5
    x = (x | (x >> np.uint64(16))) & _M6
    return x


def encode_phash(lon: np.ndarray, lat: np.ndarray, low: np.ndarray) -> np.ndarray:
    """Vectorized (lon, lat, disambiguator) -> int64 phash."""
    u = np.clip(np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * SCALE), 0, SCALE - 1)
    v = np.clip(np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0 * SCALE), 0, SCALE - 1)
    m = _part1by1(u.astype(np.uint64)) | (_part1by1(v.astype(np.uint64)) << np.uint64(1))
    out = (m << np.uint64(LOW_BITS)) | (np.asarray(low, np.uint64) & np.uint64((1 << LOW_BITS) - 1))
    return out.astype(np.int64)


def decode_lonlat(phash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized int64 phash -> (lon, lat) cell-center float64 arrays."""
    m = np.asarray(phash, np.int64).astype(np.uint64) >> np.uint64(LOW_BITS)
    u = _compact1by1(m).astype(np.float64)
    v = _compact1by1(m >> np.uint64(1)).astype(np.float64)
    lon = -180.0 + 360.0 * (u + 0.5) / SCALE
    lat = -90.0 + 180.0 * (v + 0.5) / SCALE
    return lon, lat


def sql_decode_exprs(col: str = "phash") -> tuple[str, str]:
    """ANSI-SQL expressions (DuckDB) computing the same decoded (lon, lat).

    Deinterleaving has no SQL builtin, so emit an explicit 25-term bit sum
    per axis — generated here so the oracle stays mechanically in sync with
    the numpy codec above.
    """
    u_terms = " + ".join(
        f"((({col} >> {LOW_BITS + 2 * i}) & 1) << {i})" for i in range(BITS)
    )
    v_terms = " + ".join(
        f"((({col} >> {LOW_BITS + 2 * i + 1}) & 1) << {i})" for i in range(BITS)
    )
    lon = f"(-180.0 + 360.0 * (({u_terms}) + 0.5) / {SCALE})"
    lat = f"(-90.0 + 180.0 * (({v_terms}) + 0.5) / {SCALE})"
    return lon, lat
