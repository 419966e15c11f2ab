"""PNG tile sink: render correctness (decode round-trip against the
dense grids) and the kill-and-resume lineage contract."""

import os

import numpy as np
import pyarrow as pa
import pytest


def _toy_raster():
    import ray.data
    rng = np.random.RandomState(3)
    n, z, grid = 3000, 5, 16
    from go_osm_ray.pipelines.raster import rasterize_tiles
    pts = ray.data.from_arrow(pa.table({
        "lon": rng.uniform(-170, 170, n),
        "lat": rng.uniform(-80, 80, n)}))
    return rasterize_tiles(pts, z=z, grid=grid).materialize(), z, grid


def test_render_tile_pngs_roundtrip_and_resume(ray_session, tmp_path):
    from go_osm_ray import codecs
    from go_osm_ray.pipelines.raster import pack_tile_grids
    from go_osm_ray.sinks.tiles import raster_max_n, render_tile_pngs

    raster, z, grid = _toy_raster()
    max_n = raster_max_n(raster)
    assert max_n >= 1

    out = str(tmp_path / "tiles")
    # inject a crash in one partition, then resume
    from go_osm_ray.relational import hash_part
    df = raster.to_pandas()
    parts_seen = {str(p) for p in hash_part(
        (df.tile_x.to_numpy() << np.int64(32)) | df.tile_y.to_numpy(), 32)}
    victim = sorted(parts_seen)[0]
    with pytest.raises(Exception):
        render_tile_pngs(raster, out, z=z, grid=grid, max_n=max_n,
                         fail_parts=frozenset({victim}))
    from go_osm_ray.state.lineage import read_manifest
    assert victim not in {r.key for r in read_manifest(out)}

    # record mtimes of finished pngs, then resume to completion
    done_pngs = {}
    for root, _, files in os.walk(os.path.join(out, str(z))):
        for f in files:
            p = os.path.join(root, f)
            done_pngs[p] = os.path.getmtime(p)
    manifest = render_tile_pngs(raster, out, z=z, grid=grid, max_n=max_n)
    assert {r["key"] for r in manifest} == parts_seen
    for p, m in done_pngs.items():
        assert os.path.getmtime(p) == m, "finished tile re-encoded on resume"

    # decode round-trip: every png reproduces its dense grid scaling
    dense = pack_tile_grids(raster, grid=grid).to_pandas()
    checked = 0
    for r in dense.itertuples():
        p = os.path.join(out, str(z), str(r.tile_x), f"{r.tile_y}.png")
        px = codecs.decode(open(p, "rb").read(), "png")
        g = np.frombuffer(r.grid_bytes, np.uint32).reshape(grid, grid)
        expect = (g.astype(np.int64) * 255 // max_n).astype(np.uint8)
        assert np.array_equal(px[:, :, 0], expect)
        assert np.array_equal(px[:, :, 0], px[:, :, 1])
        checked += 1
    assert checked == len(dense) and checked > 10
