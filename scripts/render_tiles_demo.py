"""End-to-end raster demo: images -> geotag decode -> sparse raster ->
PNG tile pyramid on disk (the renderer product a web map serves).

Usage:  python scripts/render_tiles_demo.py [sf_dir] [out_dir]
        (defaults: /root/testdata/sf0.01  /tmp/tile_demo)

Writes out_dir/{z}/{x}/{y}.png for z = 7..10 plus a _lineage/ manifest
per zoom level; a second run resumes (skips finished partitions).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/tile_demo"
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E
    from go_osm_ray.pipelines.raster import rasterize_tiles, tile_pyramid
    from go_osm_ray.sinks.tiles import raster_max_n, render_tile_pngs

    z, grid = 10, 64
    raster = rasterize_tiles(E._images_pts(sf_dir), z=z, grid=grid) \
        .materialize()
    levels = {z: raster}
    pyr = tile_pyramid(raster, z=z, z_min=7, grid=grid).materialize()
    for zz in (7, 8, 9):
        levels[zz] = pyr.filter(expr=f"zoom == {zz}") \
            .drop_columns(["zoom"]).materialize()

    total = 0
    for zz, r in sorted(levels.items()):
        m = raster_max_n(r)
        manifest = render_tile_pngs(r, os.path.join(out, f"z{zz}"),
                                    z=zz, grid=grid, max_n=m)
        tiles = sum(rec["rows"] for rec in manifest)
        total += tiles
        print(f"z{zz}: {tiles} tiles (max_n={m})")
    print(f"wrote {total} PNG tiles under {out}")
    ray.shutdown()


if __name__ == "__main__":
    main()
