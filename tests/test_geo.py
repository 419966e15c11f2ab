import numpy as np
import pytest

from go_osm_ray.geo import morton, s2, tiles


def test_morton_roundtrip_quantization():
    rng = np.random.RandomState(7)
    lon = rng.uniform(-180, 180, 5000)
    lat = rng.uniform(-85, 85, 5000)
    ph = morton.encode_phash(lon, lat, np.arange(5000))
    assert (ph >= 0).all()
    lo, la = morton.decode_lonlat(ph)
    # decode returns the cell center: within half a cell
    assert np.abs(lo - lon).max() <= 360.0 / morton.SCALE
    assert np.abs(la - lat).max() <= 180.0 / morton.SCALE
    # re-encoding the decoded center reproduces the same cell
    ph2 = morton.encode_phash(lo, la, np.arange(5000))
    assert np.array_equal(ph >> 12, ph2 >> 12)


def test_morton_low_bits():
    ph = morton.encode_phash(np.array([0.0]), np.array([0.0]), np.array([4095]))
    assert int(ph[0]) & 0xFFF == 4095


def test_tile_known_values():
    # zoom 0: the whole world is tile (0, 0)
    x, y = tiles.tile_xy(np.array([-77.0, 0.0, 179.9]), np.array([38.9, 0.0, 84.0]), 0)
    assert x.tolist() == [0, 0, 0] and y.tolist() == [0, 0, 0]
    # zoom 1: quadrants
    x, y = tiles.tile_xy(np.array([-90.0, 90.0]), np.array([45.0, -45.0]), 1)
    assert x.tolist() == [0, 1] and y.tolist() == [0, 1]
    # clamping at the poles
    x, y = tiles.tile_xy(np.array([0.0, 0.0]), np.array([89.9, -89.9]), 10)
    assert y.tolist() == [0, 1023]


def test_cell_hierarchy():
    rng = np.random.RandomState(3)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-85, 85, 1000)
    c11 = tiles.cell_id(lon, lat, 11)
    c7 = tiles.cell_id(lon, lat, 7)
    assert np.array_equal(tiles.cell_parent(c11, 7), c7)
    assert (tiles.cell_res(c11) == 11).all()
    # point lies inside its own cell bounds
    mnx, mny, mxx, mxy = tiles.cell_bounds(c11)
    assert (lon >= mnx).all() and (lon <= mxx).all()
    assert (lat >= mny - 1e-9).all() and (lat <= mxy + 1e-9).all()


def test_cells_covering_bbox():
    cells = tiles.cells_covering_bbox(-77.12, 38.79, -76.90, 38.99, 12)
    assert len(cells) >= 1
    # every cell intersects the bbox
    mnx, mny, mxx, mxy = tiles.cell_bounds(cells)
    assert (mxx >= -77.12).all() and (mnx <= -76.90).all()
    assert (mxy >= 38.79).all() and (mny <= 38.99).all()


def test_hilbert_is_space_filling_bijection():
    order = 4
    n = 1 << order
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    d = s2._xy_to_hilbert(gx.ravel(), gy.ravel(), order)
    assert sorted(d.tolist()) == list(range(n * n))  # bijection
    # consecutive curve positions are grid neighbors (defining property)
    order_idx = np.argsort(d)
    xs, ys = gx.ravel()[order_idx], gy.ravel()[order_idx]
    steps = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
    assert (steps == 1).all()


def test_s2_cell_invariants():
    rng = np.random.RandomState(11)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-89, 89, 2000)
    c14 = s2.cell_id(lon, lat, 14)
    c10 = s2.cell_id(lon, lat, 10)
    assert np.array_equal(s2.cell_level(c14), np.full(2000, 14))
    assert np.array_equal(s2.parent(c14, 10), c10)
    # nearby points share coarse cells far more often than far points
    near = s2.cell_id(lon + 1e-7, lat + 1e-7, 10)
    assert (near == c10).mean() > 0.99


def test_rasterize_pack_and_vectorize_consistency(ray_session):
    """Dense per-tile grids scatter exactly the sparse raster; hotspot
    vectorization lands pixel centers inside the pixel's tile; the
    raster total equals the input point count."""
    import numpy as np
    import ray.data

    from go_osm_ray.geo import tiles
    from go_osm_ray.pipelines.raster import (pack_tile_grids,
                                             raster_to_features,
                                             rasterize_tiles)

    rng = np.random.RandomState(7)
    n, z, grid = 5000, 6, 16
    lon = rng.uniform(-170, 170, n)
    lat = rng.uniform(-80, 80, n)
    # plant a hotspot so min_n filtering is non-trivial
    lon[:50] = 10.0001
    lat[:50] = 20.0001
    pts = ray.data.from_arrow(
        __import__("pyarrow").table({"lon": lon, "lat": lat}))
    raster = rasterize_tiles(pts, z=z, grid=grid).materialize()
    sparse = raster.to_pandas()
    assert sparse["n"].sum() == n
    assert (sparse["px"] < grid).all() and (sparse["py"] < grid).all()

    # dense packing reproduces the sparse counts cell-for-cell
    dense = pack_tile_grids(raster, grid=grid).to_pandas()
    by_tile = {(r.tile_x, r.tile_y):
               np.frombuffer(r.grid_bytes, np.uint32).reshape(grid, grid)
               for r in dense.itertuples()}
    assert len(by_tile) == len(sparse.groupby(["tile_x", "tile_y"]))
    for r in sparse.itertuples():
        assert by_tile[(r.tile_x, r.tile_y)][r.py, r.px] == r.n
    assert sum(g.sum() for g in by_tile.values()) == n

    # vectorized hotspots: pixel centers map back to the same pixel
    feats = raster_to_features(raster, z=z, grid=grid, min_n=25).to_pandas()
    assert len(feats) >= 1
    gx, gy = tiles.tile_xy(feats["lon6"].to_numpy(),
                           feats["lat6"].to_numpy(), z + 4)
    assert (gx == feats["tile_x"] * grid + feats["px"]).all()
    assert (gy == feats["tile_y"] * grid + feats["py"]).all()


def test_raster_and_mixture_partition_invariant(ray_session):
    """New-op guarantee shared with every pipeline here: identical
    output under any block composition (1 block vs many)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    import parity
    from go_osm_ray.pipelines.raster import rasterize_tiles, tile_pyramid
    from go_osm_ray.pipelines.sample import mixture_sample

    rng = np.random.RandomState(11)
    n = 4000
    t = pa.table({"lon": rng.uniform(-170, 170, n),
                  "lat": rng.uniform(-80, 80, n)})
    outs = []
    for blocks in (1, 8):
        pts = ray.data.from_arrow(t).repartition(blocks)
        r = rasterize_tiles(pts, z=6, grid=16).materialize()
        pyr = tile_pyramid(r, z=6, z_min=4, grid=16)
        outs.append((parity.canonicalize(r.to_pandas()),
                     parity.canonicalize(pyr.to_pandas())))
    pd.testing.assert_frame_equal(outs[0][0], outs[1][0])
    pd.testing.assert_frame_equal(outs[0][1], outs[1][1])

    d = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "source": pa.array(np.where(np.arange(n) % 3 == 0, "a", "b")),
        "n_chars": pa.array(rng.randint(50, 500, n).astype(np.int64)),
    })
    mix = []
    for blocks in (1, 8):
        ds = ray.data.from_arrow(d).repartition(blocks)
        mix.append(parity.canonicalize(mixture_sample(
            ds, {"a": 0.7, "b": 0.3}, 0.25).to_pandas()))
    pd.testing.assert_frame_equal(mix[0], mix[1])


def test_derived_cells_tiles_bit_equal():
    """Round-5 derive-from-finest contract: cells/tiles at coarser
    levels derived by shift from the finest level are BIT-identical to
    direct per-level computation, including the clamp edges (|lon|=180,
    |lat| past the mercator clip) — floor(v*2^z) >> k == floor(v*2^(z-k))
    exactly because power-of-two float scaling is exact."""
    import numpy as np

    from go_osm_ray.geo import tiles
    rng = np.random.RandomState(7)
    lon = np.concatenate([rng.uniform(-180, 180, 20000),
                          np.array([-180.0, 180.0, 0.0, -1e-12, 179.999999])])
    lat = np.concatenate([rng.uniform(-89.9, 89.9, 20000),
                          np.array([85.0511, -85.0511, 89.9, -89.9, 0.0])])
    for zmax in (11, 14, 29):
        xm, ym = tiles.tile_xy(lon, lat, zmax)
        for z in range(0, zmax + 1, 3):
            x, y = tiles.tile_xy(lon, lat, z)
            s = zmax - z
            assert np.array_equal(x, xm >> np.int64(s))
            assert np.array_equal(y, ym >> np.int64(s))
    xm, ym = tiles.tile_xy(lon, lat, 11)
    for r in (7, 8, 9, 10, 11):
        direct = tiles.cell_id(lon, lat, r)
        s = np.int64(11 - r)
        derived = ((np.int64(r) << np.int64(tiles.RES_SHIFT))
                   | ((xm >> s) << np.int64(tiles.XY_BITS)) | (ym >> s))
        assert np.array_equal(direct, derived)
