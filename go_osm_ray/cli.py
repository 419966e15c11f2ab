"""CLI entry point mirroring the reference's flag surface
(/root/reference/cmd/osm/main.go:139-198) on the Ray-Data engine.

Examples::

    python -m go_osm_ray.cli --input-uri /data/osm_nodes.parquet \
        --filter "@craft like brewery" --ways-to-nodes \
        --output-uri /tmp/out.geojsonl
    python -m go_osm_ray.cli --config-uri job.json ctx_key=ctx_val
    python -m go_osm_ray.cli --input-uri ... --summarize

This module OWNS a Ray session (guarded init; the library never calls
ray.init) — the one place besides bench.py and the test fixture that may.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_spec(args: argparse.Namespace) -> dict:
    """CLI flags -> the same job spec the config file path uses
    (flag assembly parity: cmd/osm/main.go:244-447)."""
    if args.config_uri:
        from .job import load_spec
        spec = load_spec(args.config_uri)
    else:
        spec = {"inputs": [], "outputs": [], "globals": {}, "context": {}}
        for uri in args.input_uri:
            fmt = "osm_xml" if ".osm" in uri else "parquet"
            spec["inputs"].append({"uri": uri, "kind": args.kind, "format": fmt})
        for uri in args.output_uri:
            spec["outputs"].append({"uri": uri,
                                    "overwrite": args.overwrite})
    g = spec.setdefault("globals", {})
    if args.filter:
        g["filter"] = args.filter
    if args.include_keys:
        g["include_keys"] = args.include_keys.split(",")
    if args.drop_tags:
        g["exclude_keys"] = args.drop_tags.split(",")
    if args.keys_to_keep:
        g["keys_to_keep"] = args.keys_to_keep.split(",")
    if args.keys_to_drop:
        g["keys_to_drop"] = args.keys_to_drop.split(",")
    if args.bbox:
        g["bbox"] = [float(x) for x in args.bbox.split(",")]
    if args.ways_to_nodes:
        g["ways_to_nodes"] = True
    if args.drop_nodes:
        g["drop_nodes"] = True
    if args.drop_ways:
        g["drop_ways"] = True
    if args.drop_relations:
        g["drop_relations"] = True
    ctx = spec.setdefault("context", {})
    for kv in args.context:  # K=V args (main.go:234-242)
        k, _, v = kv.partition("=")
        ctx[k] = v
    return spec


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="go_osm_ray")
    p.add_argument("--config-uri", help="job config: .hcl (reference "
                                        "LoadConfig schema) or JSON spec")
    p.add_argument("--input-uri", action="append", default=[])
    p.add_argument("--output-uri", action="append", default=[])
    p.add_argument("--kind", default="nodes",
                   choices=["nodes", "ways", "relations"])
    p.add_argument("--filter", help="DFL-subset expression (P4)")
    p.add_argument("--include-keys", help="comma list: tag projection keep")
    p.add_argument("--drop-tags", help="comma list: tag projection drop")
    p.add_argument("--keys-to-keep", help="comma list: row filter keep")
    p.add_argument("--keys-to-drop", help="comma list: row filter drop")
    p.add_argument("--bbox", help="minlon,minlat,maxlon,maxlat")
    p.add_argument("--ways-to-nodes", action="store_true")
    p.add_argument("--drop-nodes", action="store_true")
    p.add_argument("--drop-ways", action="store_true")
    p.add_argument("--drop-relations", action="store_true")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--summarize", action="store_true")
    p.add_argument("--profile", action="store_true",
                   help="per-phase wall-clock in the result JSON")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("context", nargs="*", help="K=V template/ctx args")
    args = p.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    try:
        from .job import run_job, validate_spec
        spec = build_spec(args)
        if args.summarize:
            spec["outputs"] = [{"uri": "stdout", "format": "summary"}]
        problems = validate_spec(spec)
        if problems:
            print("; ".join(problems), file=sys.stderr)
            return 1
        if args.dry_run:  # validate + render only (main.go:565-567)
            print(json.dumps(spec, indent=2))
            return 0
        results = run_job(spec, profile=args.profile)
        print(json.dumps(results))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
