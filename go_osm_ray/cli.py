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


#: -drop convenience-list vocabulary (cmd/osm/main.go:165-169): element
#: classes map to drop_{ways,relations}; attribute names map to
#: drop_attrs entries; "author" is synonymous with uid+user (main.go:176).
_DROP_CLASSES = {"ways": "drop_ways", "relations": "drop_relations"}
_DROP_ATTRS = {"version", "timestamp", "changeset", "uid", "user"}


def _split_uris(values: list[str], sep: str | None) -> list[str]:
    """-input_uri_separator / -output_uri_separator parity
    (cmd/osm/main.go:149,180): by default no splitting; with a
    separator each uri value may pack multiple."""
    if not sep:
        return list(values)
    out: list[str] = []
    for v in values:
        out.extend(u for u in v.split(sep) if u)
    return out


def build_spec(args: argparse.Namespace) -> dict:
    """CLI flags -> the same job spec the config file path uses
    (flag assembly parity: cmd/osm/main.go:244-447)."""
    if args.config_uri:
        from .job import load_spec
        spec = load_spec(args.config_uri)
    else:
        spec = {"inputs": [], "outputs": [], "globals": {}, "context": {}}
        for uri in _split_uris(args.input_uri, args.input_uri_separator):
            fmt = "osm_xml" if ".osm" in uri else "parquet"
            spec["inputs"].append({"uri": uri, "kind": args.kind, "format": fmt})
        for uri in _split_uris(args.output_uri, args.output_uri_separator):
            out = {"uri": uri, "overwrite": args.overwrite}
            if args.pretty:
                out["pretty"] = True
            spec["outputs"].append(out)
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
    # per-attribute drop flags + the -drop convenience list
    # (main.go:165-176); author = uid + user
    drop_attrs = set(g.get("drop_attrs", ()))
    for attr in _DROP_ATTRS:
        if getattr(args, f"drop_{attr}"):
            drop_attrs.add(attr)
    if args.drop_author:
        drop_attrs |= {"uid", "user"}
    for item in (args.drop.split(",") if args.drop else []):
        item = item.strip()
        if not item:
            continue
        if item in _DROP_CLASSES:
            g[_DROP_CLASSES[item]] = True
        elif item == "author":
            drop_attrs |= {"uid", "user"}
        elif item in _DROP_ATTRS:
            drop_attrs.add(item)
        else:
            raise ValueError(f"unknown -drop item: {item!r}")
    if drop_attrs:
        g["drop_attrs"] = sorted(drop_attrs)
    if args.pretty:
        g["pretty"] = True
    ctx = spec.setdefault("context", {})
    for kv in args.context:  # K=V args (main.go:234-242)
        k, _, v = kv.partition("=")
        ctx[k] = v
    return spec


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="go_osm_ray")
    p.add_argument("--config-uri", help="job config: .hcl (reference "
                                        "LoadConfig schema) or JSON spec")
    p.add_argument("--input-uri", action="append", default=[])
    p.add_argument("--input-uri-separator", default=None,
                   help="split each --input-uri on this separator "
                        "(main.go:149); default: no splitting")
    p.add_argument("--output-uri", action="append", default=[])
    p.add_argument("--output-uri-separator", default=None,
                   help="split each --output-uri on this separator "
                        "(main.go:180); default: no splitting")
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
    p.add_argument("--drop", default=None,
                   help="convenience comma list (main.go:165): ways, "
                        "relations, version, timestamp, changeset, uid, "
                        "user, author")
    p.add_argument("--drop-version", action="store_true")
    p.add_argument("--drop-timestamp", action="store_true")
    p.add_argument("--drop-changeset", action="store_true")
    p.add_argument("--drop-uid", action="store_true")
    p.add_argument("--drop-user", action="store_true")
    p.add_argument("--drop-author", action="store_true",
                   help="synonymous with --drop-uid --drop-user")
    p.add_argument("--pretty", action="store_true",
                   help="indented XML/JSON output (main.go:187)")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--summarize", action="store_true")
    p.add_argument("--summarize-keys", default=None,
                   help="comma list of tag keys to per-class count "
                        "(main.go:186)")
    p.add_argument("--profile", action="store_true",
                   help="per-phase wall-clock in the result JSON")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("context", nargs="*", help="K=V template/ctx args")
    return p


def main(argv=None) -> int:
    args = make_parser().parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    try:
        from .job import run_job, validate_spec
        spec = build_spec(args)
        if args.summarize or args.summarize_keys:
            summary_out = {"uri": "stdout", "format": "summary"}
            if args.summarize_keys:
                summary_out["summarize_keys"] = [
                    k for k in args.summarize_keys.split(",") if k]
            spec["outputs"] = [summary_out]
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
