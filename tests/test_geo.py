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
