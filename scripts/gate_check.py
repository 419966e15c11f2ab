"""Driver-gate rehearsal: run the first-N queries() entries vs their
oracle_sql() ground truth at an arbitrary sf (default 0.01 — the scale the
real driver gate uses) with the driver's own compare semantics.

Usage: python scripts/gate_check.py [--sf 0.01] [--n 50] [--names a,b,c]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--names", type=str, default="")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import parity
    import __ray_entry__ as E
    from go_osm_ray import datagen, oracle

    sf_dir = f"/root/testdata/sf{args.sf:g}"
    datagen.ensure_tables(args.sf)
    oracles = oracle.build(args.sf)
    qs = E.queries()
    if args.names:
        names = args.names.split(",")
    else:
        names = list(qs)[: args.n]

    failures = []
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            engine_df = parity.to_pandas(qs[name](sf_dir))
            sql = parity.rewrite_sql_for_sf(oracles[name], args.sf) \
                if args.sf != args.sf else oracles[name]
            oracle_df = parity.run_oracle(sql, sf_dir)
            problems = parity.compare(engine_df, oracle_df, name)
            if len(engine_df) == 0:
                problems.append(f"{name}: empty result")
        except Exception as exc:  # noqa: BLE001 - report, keep going
            problems = [f"{name}: EXC {type(exc).__name__}: {exc}"]
        dt = time.perf_counter() - t0
        status = "ok" if not problems else "FAIL"
        print(f"[{i+1:3d}/{len(names)}] {name:32s} {status} {dt:6.2f}s", flush=True)
        if problems:
            failures.extend(problems)
    if failures:
        print("\n== FAILURES ==")
        for p in failures:
            print(" -", p)
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
