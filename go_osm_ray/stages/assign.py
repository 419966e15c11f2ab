"""Stateless vectorized assignment stages (map_batches, Arrow in/out).

These realize the reference's latent tiling/indexing design: ``Node.Tile``
(/root/reference/osm/Node.go:26-33, defined but never called) becomes a
vectorized slippy-tile kernel; the vestigial R-tree slot
(/root/reference/osm/Planet.go:36) is replaced by hierarchical geocells
(geo/tiles.py) that key every downstream shuffle and polygon shard.

All stages are plain functions/closures — stateless, elastic task pools.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo import morton, tiles


def decode_geotag(batch: pa.Table, phash_col: str = "phash") -> pa.Table:
    """phash -> (lon, lat) columns; the first stage of every image pipeline."""
    ph = batch[phash_col].combine_chunks().to_numpy()
    lon, lat = morton.decode_lonlat(ph)
    return (batch.append_column("lon", pa.array(lon))
                 .append_column("lat", pa.array(lat)))


def make_cell_assigner(resolutions: tuple[int, ...] = (7, 8, 9, 10, 11),
                       lon_col: str = "lon", lat_col: str = "lat"):
    """Closure adding one ``cell_r{r}`` int64 column per resolution.

    Derive-from-finest (round 5): ONE mercator transform at
    max(resolutions), every coarser cell by prefix shift.  Bit-identical
    to per-resolution cell_id — floor(v * 2^r) == floor(v * 2^rmax) >>
    (rmax - r) exactly, because power-of-two float scaling is exact and
    the clamp commutes with the shift at both edges (proof in
    tests/test_geo.py::test_derived_cells_tiles_bit_equal) — while
    cutting the per-row trig from one transform per resolution to one
    total."""
    rmax = max(resolutions)
    rs = np.int64(tiles.RES_SHIFT)
    xb = np.int64(tiles.XY_BITS)

    def assign(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].combine_chunks().to_numpy()
        lat = batch[lat_col].combine_chunks().to_numpy()
        x, y = tiles.tile_xy(lon, lat, rmax)
        for r in resolutions:
            s = np.int64(rmax - r)
            batch = batch.append_column(
                f"cell_r{r}",
                pa.array((np.int64(r) << rs) | ((x >> s) << xb) | (y >> s)))
        return batch
    return assign


def make_tile_assigner(zooms: tuple[int, ...] = (10, 12, 14),
                       lon_col: str = "lon", lat_col: str = "lat",
                       dtype=None):
    """Closure adding ``tile{z}_x`` / ``tile{z}_y`` columns (slippy z/x/y,
    the math of /root/reference/osm/Node.go:26-33, clamped).

    ``dtype=np.int32`` narrows the emitted columns (tile coords fit
    int32 for every zoom <= 29) — the fused flagship pass uses it to cut
    object-store output traffic; gated queries keep the default int64 so
    their DuckDB schema compare is untouched.

    Derive-from-finest (round 5): one transform at max(zooms), coarser
    tiles by right-shift — bit-identical to direct tile_xy per zoom
    (see make_cell_assigner)."""
    zmax = max(zooms)

    def assign(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].combine_chunks().to_numpy()
        lat = batch[lat_col].combine_chunks().to_numpy()
        xm, ym = tiles.tile_xy(lon, lat, zmax)
        for z in zooms:
            s = np.int64(zmax - z)
            x, y = xm >> s, ym >> s
            if dtype is not None:
                x, y = x.astype(dtype), y.astype(dtype)
            batch = batch.append_column(f"tile{z}_x", pa.array(x))
            batch = batch.append_column(f"tile{z}_y", pa.array(y))
        return batch
    return assign


def make_salter(cell_col: str, hot_cells_ref, salt_buckets: int, id_col: str):
    """Hot-cell salting: rows in broadcast-listed hot cells get
    ``salt = hash(id) % salt_buckets``; others salt 0. The shuffle key
    becomes (cell, salt), splitting skewed urban cells (SURVEY §4) while
    cold cells keep a single bucket."""
    import ray

    def salt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        hot = ray.get(hot_cells_ref)
        cells = batch[cell_col].combine_chunks()
        is_hot = np.asarray(pc.is_in(cells, value_set=pa.array(hot, pa.int64())))
        ids = batch[id_col].combine_chunks()
        if pa.types.is_integer(ids.type):
            h = ids.to_numpy().astype(np.int64)
        else:  # deterministic across processes (python hash() is salted)
            import zlib
            h = np.array([zlib.crc32(x.encode()) for x in ids.to_pylist()], dtype=np.int64)
        s = np.where(is_hot, np.abs(h) % salt_buckets, 0).astype(np.int64)
        return batch.append_column("salt", pa.array(s))
    return salt
