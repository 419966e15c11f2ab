"""Per-stage Ray Data stats for the flagship pipeline — the measure
loop behind the tuning notes in BASELINE.md.  Prints each operator's
wall time, block count, and per-block output rows so a regression in
one stage (a read that stopped parallelizing, an actor pool starving)
is visible without guessing.

Usage:  python scripts/stats_report.py [sf_dir] [num_cpus]
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from go_osm_ray.oracle import KNN_FEATURE_KEY
    from go_osm_ray.pipelines.images import flagship
    from go_osm_ray.pipelines.spatial import build_polygon_index, tagged_nodes
    from go_osm_ray.relational import broadcast_table
    import __ray_entry__ as E

    nodes = E._read_gen(sf_dir, "osm_nodes", ["id", "lon", "lat", "tags"])
    ways = E._read_gen(sf_dir, "osm_ways", ["id", "refs"])
    idx_ref = ray.put(build_polygon_index(
        nodes.select_columns(["id", "lon", "lat"]), ways))
    feats_ref = broadcast_table(tagged_nodes(nodes, KNN_FEATURE_KEY),
                                ["id", "lon", "lat"])
    images = E._read_gen(sf_dir, "images", ["image_id", "phash"])
    ds = flagship(images, idx_ref, feats_ref).materialize()

    stats = ds.stats()
    # condense: keep the operator headers and wall-time/rows lines
    keep = re.compile(r"Operator|Ray remote args|blocks executed|"
                      r"Output num rows|Wall time|Peak heap")
    for line in stats.splitlines():
        if keep.search(line):
            print(line.rstrip())
    ray.shutdown()


if __name__ == "__main__":
    main()
