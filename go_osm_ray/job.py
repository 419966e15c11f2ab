"""Declarative job runner — the reference's HCL-config entry point,
Ray-Data-first (SURVEY.md §3.3/§2.9).

The reference assembles a ``Config{Globals, InputConfigs, OutputConfigs}``
from an HCL file (/root/reference/osm/LoadConfig.go:15-44, structs
osm/Config.go:12-34) or CLI flags, renders URI templates
(osm/RenderTemplate.go:16-87), derives per-resource options as
globals-overridden-by-resource (osm/PlanetResource.go:25-90), pre-flights
overwrite protection (cmd/osm/main.go:521-637), then fans out every
output concurrently from one shared Planet (cmd/osm/main.go:716-889).

Here the same spec (a plain dict — load it from YAML/JSON yourself or
via ``load_spec``) builds lazy Dataset pipelines: inputs are read once,
the shared filtered Dataset is reused by every output, and each output
is one terminal write. Validation mirrors the reference's rules
(mutually exclusive keep/drop row filters, cmd/osm/main.go:257-260;
ways_to_nodes incompatible with drop_ways, osm/Config.go:322-324;
cannot drop all element classes, Config.go:326-328).

Spec shape::

    {
      "context": {"region": "dc"},                  # template ctx (K=V args)
      "globals": {...option defaults...},
      "inputs":  [{"uri": "...parquet glob or dir", "kind": "nodes"|"ways",
                   "format": "parquet"|"osm_xml", ...options}],
      "outputs": [{"uri": "/tmp/{{lower .region}}/out", "format":
                   "parquet"|"geojsonl"|"geojson"|"osm_xml"|"summary",
                   "overwrite": false, ...options}],
    }

Options (reference flag parity): include_keys/exclude_keys (tag
projection P1), keys_to_keep/keys_to_drop (row filter P2), bbox
[minx,miny,maxx,maxy] (P3, corrected semantics), filter (DFL-subset
expression, P4), drop_attrs (P6), drop_nodes/drop_ways (P7),
ways_to_nodes (P8).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

_OPTION_KEYS = {
    "include_keys", "exclude_keys", "keys_to_keep", "keys_to_drop",
    "bbox", "filter", "drop_attrs", "drop_nodes", "drop_ways",
    "drop_relations", "ways_to_nodes",
}


# ----------------------------------------------------------- URI templating

_TMPL_RE = re.compile(r"\{\{\s*([^}]+?)\s*\}\}")


def _tmpl_funcs():
    return {
        "lower": lambda s: str(s).lower(),
        "upper": lambda s: str(s).upper(),
        "replace": lambda s, old, new: str(s).replace(str(old), str(new)),
        "float64": lambda s: float(s),
        "json": lambda v: json.dumps(v, sort_keys=True),
        "map": lambda *kv: {str(kv[i]): kv[i + 1] for i in range(0, len(kv), 2)},
    }


def render_template(uri: str, ctx: dict[str, Any]) -> str:
    """Go-template-flavoured URI rendering (RenderTemplate.go:16-87):
    ``{{.var}}`` refs and the reference's six funcs
    (lower/upper/replace/float64/json/map) in prefix form, e.g.
    ``{{lower .region}}`` or ``{{replace .name "-" "_"}}``."""
    funcs = _tmpl_funcs()

    def resolve(tok: str):
        tok = tok.strip()
        if tok.startswith("."):
            name = tok[1:]
            if name not in ctx:
                raise KeyError(f"template variable .{name} not in context")
            return ctx[name]
        if (tok.startswith('"') and tok.endswith('"')) or \
           (tok.startswith("'") and tok.endswith("'")):
            return tok[1:-1]
        try:
            return float(tok) if "." in tok else int(tok)
        except ValueError:
            raise KeyError(f"unknown template token {tok!r}")

    def sub(m: re.Match) -> str:
        parts = m.group(1).split()
        if len(parts) == 1:
            return str(resolve(parts[0]))
        fname, args = parts[0], [resolve(p) for p in parts[1:]]
        if fname not in funcs:
            raise KeyError(f"unknown template function {fname!r}")
        return str(funcs[fname](*args))

    return _TMPL_RE.sub(sub, uri)


# ----------------------------------------------------------------- spec load

def load_spec(path: str) -> dict:
    """Job spec from disk: ``.hcl`` configs parse through the HCL-subset
    reader (reference LoadConfig.go schema, see hcl.py); anything else
    is the spec dict as JSON."""
    if path.endswith(".hcl"):
        from .hcl import load_hcl_spec
        return load_hcl_spec(path)
    with open(path) as f:
        return json.load(f)


def _merged(globals_: dict, resource: dict) -> dict:
    """Option precedence (PlanetResource.go:25-90 + main.go:411-425):
    GDAL-ini defaults < globals < per-resource options."""
    out: dict = {}
    ini = resource.get("gdal_ini") or (globals_ or {}).get("gdal_ini")
    if ini:
        from .sources.uri import load_ini_options
        out.update(load_ini_options(ini))
    out.update({k: v for k, v in (globals_ or {}).items()
                if k in _OPTION_KEYS})
    out.update({k: v for k, v in resource.items() if k in _OPTION_KEYS})
    return out


def validate_spec(spec: dict) -> list[str]:
    """Reference validation rules; returns problems (empty = valid)."""
    problems = []
    if not spec.get("inputs"):
        problems.append("no inputs configured")
    if not spec.get("outputs"):
        problems.append("no outputs configured")
    for res in list(spec.get("inputs", [])) + list(spec.get("outputs", [])):
        o = _merged(spec.get("globals", {}), res)
        if o.get("keys_to_keep") and o.get("keys_to_drop"):
            problems.append("keys_to_keep and keys_to_drop are mutually "
                            "exclusive (cmd/osm/main.go:257-260)")
        if o.get("ways_to_nodes") and o.get("drop_ways"):
            problems.append("ways_to_nodes cannot combine with drop_ways "
                            "(osm/Config.go:322-324)")
        # Reference semantics (osm/Config.go:326-328): drop_nodes +
        # drop_ways is fatal — unless this spec actually carries
        # relations (an extension class the reference cannot ingest), in
        # which case only dropping every class PRESENT in the inputs is
        # fatal (ADVICE r2: the all-three check silently validated specs
        # the reference rejects, emitting empty outputs).
        kinds = {inp.get("kind", "nodes") for inp in spec.get("inputs", [])}
        dropped = {k for k in ("nodes", "ways", "relations")
                   if o.get(f"drop_{k}")}
        if kinds and not (kinds - dropped):
            problems.append("cannot drop every element class present in "
                            "the inputs (osm/Config.go:326-328)")
    return problems


# ------------------------------------------------------------------ pipeline

def _apply_options(ds, opts: dict):
    """Shared filter chain in reference order: tag projection -> row
    filters -> bbox -> expression -> attr drops."""
    from .stages.filters import (drop_attributes, make_bbox_filter,
                                 make_expr_filter, make_key_filter,
                                 make_tag_projector)
    if opts.get("include_keys") or opts.get("exclude_keys"):
        ds = ds.map_batches(make_tag_projector(keep=opts.get("include_keys"),
                                               drop=opts.get("exclude_keys")),
                            batch_format="pyarrow")
    if opts.get("keys_to_keep"):
        ds = ds.map_batches(make_key_filter(keep=opts["keys_to_keep"]),
                            batch_format="pyarrow")
    elif opts.get("keys_to_drop"):
        ds = ds.map_batches(make_key_filter(drop=opts["keys_to_drop"]),
                            batch_format="pyarrow")
    if opts.get("bbox") and "lon" in ds.schema().names:
        ds = ds.map_batches(make_bbox_filter(*opts["bbox"]),
                            batch_format="pyarrow")
    if opts.get("filter"):
        ds = ds.map_batches(make_expr_filter(opts["filter"]),
                            batch_format="pyarrow")
    if opts.get("drop_attrs"):
        drop = list(opts["drop_attrs"])
        ds = ds.map_batches(lambda b, d=drop: drop_attributes(b, d),
                            batch_format="pyarrow")
    return ds


def _read_input(inp: dict, ctx: dict):
    """URI -> Dataset through the full scheme router (S8-S13): local
    paths/globs, s3:// hdfs:// http(s):// via pyarrow filesystems, and
    stdin planets parsed driver-side (Input.go:38-45)."""
    import ray.data as rd
    from .sources.osm_xml import parse_osm_xml, read_osm_xml
    from .sources.uri import open_input, split_uri
    uri = render_template(inp["uri"], ctx)
    fmt = inp.get("format", "parquet")
    kind_el = {"nodes": "node", "ways": "way",
               "relations": "relation"}[inp.get("kind", "nodes")]
    scheme, _ = split_uri(uri)
    if scheme == "stdin":
        import sys
        data = sys.stdin.buffer.read()
        return rd.from_arrow(parse_osm_xml(data, kind_el))
    paths, fs = open_input(uri)  # S12 glob expansion inside
    if fmt == "osm_xml":
        return read_osm_xml(paths, kind_el, filesystem=fs)
    return rd.read_parquet(paths, columns=inp.get("columns"),
                           filesystem=fs)


def run_job(spec: dict, profile: bool = False) -> dict[str, dict]:
    """Execute a job spec; returns {output_uri: {"rows": n, ...}}.

    All outputs consume the SAME lazy filtered Dataset per element kind
    (the reference shares one Planet across output goroutines,
    cmd/osm/main.go:716-889); each terminal write executes the shared
    prefix — Ray Data caches nothing across them, so pipelines stay
    streaming and memory-bounded.

    ``profile=True`` (or ``spec["profile"]``) adds a ``"_profile"`` entry
    with per-phase wall-clock seconds — the ``-profile`` flag parity
    (cmd/osm/main.go:657-698; note reads are LAZY here, so read time is
    folded into each output's write phase by design).
    """
    import time as _time
    profile = profile or bool(spec.get("profile"))
    prof: dict[str, float] = {}
    t0 = _time.perf_counter()
    problems = validate_spec(spec)
    if problems:
        raise ValueError("; ".join(problems))
    ctx = spec.get("context", {})
    g = spec.get("globals", {})

    # inputs: union per element kind (multi-input append, main.go:647-690)
    tables: dict[str, Any] = {}
    for inp in spec["inputs"]:
        kind = inp.get("kind", "nodes")
        ds = _read_input(inp, ctx)
        ds = _apply_options(ds, _merged(g, inp))
        tables[kind] = tables[kind].union(ds) if kind in tables else ds
    prof["plan_inputs"] = round(_time.perf_counter() - t0, 4)

    # pre-flight overwrite protection + parent/bucket creation for every
    # output, local AND remote (main.go:521-637): existing outputs raise
    # unless overwrite, overwrite deletes the old object first
    from .sources.uri import delete_output, ensure_output_parent, output_exists
    rendered = []
    for out in spec["outputs"]:
        uri = render_template(out["uri"], ctx)
        if output_exists(uri):
            if not out.get("overwrite", False):
                raise FileExistsError(
                    f"output exists and overwrite=false: {uri}")
            delete_output(uri)
        ensure_output_parent(uri)
        rendered.append((uri, out))

    results: dict[str, dict] = {}
    for uri, out in rendered:
        opts = _merged(g, out)
        fmt = out.get("format") or _infer_format(uri)
        nodes = tables.get("nodes")
        ways = tables.get("ways")
        rels = tables.get("relations")
        # every element-class gate reads the MERGED options (globals
        # overridden by resource, PlanetResource.go:25-90) — a
        # drop_nodes set in globals/gdal_ini must not be ignored
        nodes_out = _apply_options(nodes, opts) \
            if (nodes is not None and not opts.get("drop_nodes")) else None
        ways_out = _apply_options(ways, opts) \
            if (ways is not None and not opts.get("drop_ways")) else None
        rels_out = _apply_options(rels, opts) \
            if (rels is not None and not opts.get("drop_relations")) else None

        row_filters = any(opts.get(k) for k in
                          ("keys_to_keep", "keys_to_drop", "bbox", "filter"))
        if (fmt == "osm_xml" and row_filters
                and nodes_out is not None and ways_out is not None):
            # J2 semi-join retention (MarshalPlanet.go:100-141): a node is
            # WRITTEN iff it passes the row filters itself OR is
            # referenced by any kept way — referenced nodes bypass the
            # filters entirely (golden-output-visible reference rule).
            # Projections (tag/attr) still apply to retained nodes.
            # The retained-id set builds DATASET-SIDE (explode + union +
            # distinct groupby — SURVEY §2.5 J2) and only the small
            # distinct result is broadcast for the membership filter.
            from .pipelines.osm import explode_refs
            from .relational import (broadcast_table, partitioned_distinct,
                                     semi_filter)
            proj_only = {k: v for k, v in opts.items()
                         if k in ("include_keys", "exclude_keys",
                                  "drop_attrs")}
            nodes_proj = _apply_options(nodes, proj_only)
            ref_ids = explode_refs(ways_out).select_columns(["ref"]) \
                .map_batches(lambda t: t.rename_columns(["id"]),
                             batch_format="pyarrow")
            kept = partitioned_distinct(
                ref_ids.union(nodes_out.select_columns(["id"])), "id")
            nodes_out = semi_filter(nodes_proj, "id",
                                    broadcast_table(kept, ["id"]))

        if opts.get("ways_to_nodes") and ways_out is not None \
                and nodes is not None:
            # P8: each way becomes a synthetic centroid node appended to
            # the node output; the ways themselves are no longer written
            from .pipelines.osm import ways_to_nodes as _w2n
            synth = _w2n(nodes, ways_out, node_shaped=True)
            if nodes_out is None:
                nodes_out = synth
            else:
                cols = [c for c in nodes_out.schema().names
                        if c in set(synth.schema().names)]
                nodes_out = nodes_out.select_columns(cols).union(
                    synth.select_columns(cols))
            ways_out = None

        t1 = _time.perf_counter()
        results[uri] = _write_output(uri, fmt, out, nodes_out, ways_out,
                                     rels_out, nodes_full=nodes)
        prof[f"write {uri}"] = round(_time.perf_counter() - t1, 4)
    if profile:
        results["_profile"] = prof
    return results


def _infer_format(uri: str) -> str:
    """Suffix inference (cmd/osm/main.go:723-731)."""
    base = uri[:-3] if uri.endswith(".gz") else uri
    if base.endswith(".geojson"):
        return "geojson"
    if base.endswith(".geojsonl"):
        return "geojsonl"
    if base.endswith(".osm"):
        return "osm_xml"
    return "parquet"


def _features_for(nodes, ways, nodes_full):
    """Node features unioned with way LineString/Polygon features (the
    reference FeatureCollection includes both, Planet.go GetFeatures);
    way geometry resolves against the full node table. Returns None only
    when neither class yields features."""
    from .pipelines.osm import join_refs_to_coords
    from .sinks import nodes_to_features, ways_to_features
    feats = nodes_to_features(nodes) if nodes is not None else None
    if ways is not None and nodes_full is not None:
        wf = ways_to_features(join_refs_to_coords(ways, nodes_full))
        feats = wf if feats is None else feats.union(wf)
    return feats


def _write_output(uri: str, fmt: str, out: dict, nodes, ways,
                  rels=None, nodes_full=None) -> dict:
    from .sources.uri import open_output, split_uri
    if fmt == "summary":
        res = {"rows": int(nodes.count()) if nodes is not None else 0}
        keys = out.get("summarize_keys")
        if keys:
            # -summarize_keys parity (cmd/osm/main.go:186,
            # osm/Planet.go:418-453): per requested key, how many
            # nodes/ways/relations carry it; absent element classes
            # count as empty.
            import pyarrow as _pa
            import ray.data as _rd
            from .pipelines.osm import per_key_counts
            tags_t = _pa.list_(_pa.struct([("key", _pa.string()),
                                           ("value", _pa.string())]))
            def _or_empty(ds):
                return ds if ds is not None else _rd.from_arrow(
                    _pa.table({"tags": _pa.array([], tags_t)}))
            kdf = per_key_counts(_or_empty(nodes), _or_empty(ways),
                                 _or_empty(rels), list(keys))
            res["keys"] = kdf.to_dict("records")
        return res
    if split_uri(uri)[0] in ("stdout", "stderr"):
        # std-stream feature sink (reference Output supports stdout;
        # driver-side by nature — small outputs only)
        import json as _json
        import sys as _sys
        stream = _sys.stdout if uri.startswith("stdout") else _sys.stderr
        feats = _features_for(nodes, ways, nodes_full)
        n = 0
        if feats is not None:
            for row in feats.iter_rows():
                stream.write(_json.dumps(
                    {"type": "Feature", "id": int(row["id"]),
                     "geometry": row["geometry"],
                     "properties": row["properties"]}) + "\n")
                n += 1
        return {"rows": n}
    if fmt == "parquet":
        fs, path = open_output(uri)
        if fs is None:
            os.makedirs(path, exist_ok=True)
        n = 0
        for name, ds in (("nodes", nodes), ("ways", ways),
                         ("relations", rels)):
            if ds is not None:
                ds.write_parquet(os.path.join(path, name), filesystem=fs)
                n += 1
        return {"tables": n}
    if fmt == "geojsonl":
        feats = _features_for(nodes, ways, nodes_full)
        if feats is None:
            return {"dir": uri, "rows": 0}
        fs, path = open_output(uri)
        if fs is None:
            os.makedirs(path, exist_ok=True)
        feats.write_json(path, filesystem=fs)
        return {"dir": uri}
    if fmt == "geojson":
        from .sinks import write_geojson
        feats = _features_for(nodes, ways, nodes_full)
        n = write_geojson(feats, uri) if feats is not None else 0
        return {"rows": n}
    if fmt == "osm_xml" and out.get("sharded"):
        # SCALE path: parallel bounded shards + resume manifest
        from .sources.osm_xml import write_osm_xml_shards
        manifest = write_osm_xml_shards(
            nodes, uri, ways=_collect_arrow(ways),
            pretty=bool(out.get("pretty", True)),
            drop_attrs=tuple(out.get("drop_attrs", ())))
        return {"shards": len(manifest),
                "rows": int(sum(m["rows"] for m in manifest))}
    if fmt == "osm_xml":
        from .sources.osm_xml import write_osm_xml
        # small parity outputs only (SURVEY §2.2 K1): XML is a
        # single-document format, so collect sorted tables driver-side.
        # Relations are written only on explicit request — the reference
        # NEVER emits them (MarshalPlanet.go), which we replicate.
        ntab = _collect_arrow(nodes)
        wtab = _collect_arrow(ways)
        rtab = _collect_arrow(rels) if out.get("write_relations") else None
        write_osm_xml(uri, ntab, wtab, relations=rtab,
                      write_relations=rtab is not None,
                      pretty=bool(out.get("pretty", True)),
                      drop_attrs=tuple(out.get("drop_attrs", ())))
        return {"rows": (len(ntab) if ntab is not None else 0)
                + (len(wtab) if wtab is not None else 0)
                + (len(rtab) if rtab is not None else 0)}
    raise ValueError(f"unknown output format {fmt!r}")


def _collect_arrow(ds):
    if ds is None:
        return None
    import pyarrow as pa
    import ray
    return pa.concat_tables(ray.get(ds.sort("id").to_arrow_refs()))
