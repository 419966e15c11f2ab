"""sf1 tail-scale rehearsal (VERDICT r4 next #9): run the slowest
bench queries once at sf=1 (10x the bench scale) to smoke out quadratic
terms the sf0.1 bench cannot see (pair DPs, group expansions).

Only queries over the GENERATED tables run (the driver ships no sf1
parquet for the TPC-H-ish tables); datagen synthesizes sf1 under
/tmp/go_osm_ray_data/sf1 on first use.

Usage: python scripts/sf1_rehearsal.py [--names a,b,c] [--timeout 600]
Prints one line per query: name, rows, seconds, and sec/sec0.1 ratio
vs the values recorded in BENCH (superlinear growth >> 10x flags a
quadratic term).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Slowest gen-table queries from BENCH_r04 + the round-5 semantic
#: upgrades; caption_edit_pairs included per the VERDICT's quadratic
#: suspicion list.
DEFAULT_NAMES = [
    "way_conflate", "way_frechet", "way_hausdorff",
    "way_pseudo_diameter", "way_two_hop", "knn_classify",
    "raster_viewshed", "component_size_hist", "caption_edit_pairs",
    "cell_image_mosaic", "audio_silence_ratio", "way_pagerank",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default=",".join(DEFAULT_NAMES))
    ap.add_argument("--sf", type=float, default=1.0)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E
    from go_osm_ray import datagen
    t0 = time.perf_counter()
    datagen.ensure_tables(args.sf)
    print(f"# datagen sf{args.sf:g} ready in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    sf_dir = f"/root/testdata/sf{args.sf:g}"  # gen tables key off the name
    qs = E.queries()
    results = {}
    for name in args.names.split(","):
        t0 = time.perf_counter()
        try:
            res = qs[name](sf_dir)
            n = res.count() if hasattr(res, "count") else len(res)
            dt = time.perf_counter() - t0
            results[name] = round(dt, 2)
            print(f"{name:24s} rows={n:>10} {dt:8.1f}s", flush=True)
        except Exception as exc:  # noqa: BLE001 - rehearsal report
            print(f"{name:24s} FAIL {type(exc).__name__}: {exc}",
                  flush=True)
            results[name] = None
    print(json.dumps({"sf": args.sf, "sec": results}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
