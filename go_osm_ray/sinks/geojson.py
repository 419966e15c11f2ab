"""GeoJSON / GeoJSONL sinks (reference K4/K5, P9/P10).

The reference renders features driver-side into one document
(/root/reference/cmd/osm/main.go:740-799 via osm/Planet.go:80-136,
NodeToFeature.go:8-10) or one-feature-per-line GeoJSONL
(cmd/osm/main.go:801-877). Here feature construction is a vectorized
``map_batches`` stage producing nested Arrow columns, and:

* **GeoJSONL** writes natively parallel via ``Dataset.write_json``
  (one shard file per block — resumable layout, never one giant file);
* **GeoJSON** (a single FeatureCollection document) is inherently a
  one-file format, so it collects to the driver — use only for small
  outputs, exactly like the reference's whole-dataset JSON document.

Way features follow Planet.WayToFeature (Planet.go:59-78, with the
closed-ring off-by-one CORRECTED): closed ring -> Polygon, else
LineString.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _props(tags) -> dict:
    if tags is None:
        return {}
    return {t["key"]: t["value"] for t in tags}  # ndarray-of-dicts safe


def nodes_to_features(nodes: ray.data.Dataset) -> ray.data.Dataset:
    """Node -> GeoJSON Feature rows (id, type, geometry, properties).

    Input batches are zero-copy Arrow; the OUTPUT blocks are pandas by
    necessity — GeoJSON geometry is union-typed (Point coordinates are
    list<double>, Polygon list<list<list<double>>>) and properties are
    open maps, which ``write_json`` must serialize as real JSON objects,
    so the feature columns are python dicts, not an Arrow struct."""
    def fn(t: pa.Table) -> pd.DataFrame:
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        return pd.DataFrame({
            "type": ["Feature"] * t.num_rows,
            "id": t["id"].combine_chunks().to_numpy(),
            "geometry": [{"type": "Point", "coordinates": [x, y]}
                         for x, y in zip(lon, lat)],
            "properties": [_props(tg) for tg in t["tags"].to_pylist()],
        })
    return nodes.map_batches(fn, batch_format="pyarrow")


def ways_to_features(way_coords: ray.data.Dataset,
                     way_tags: ray.data.Dataset | None = None,
                     num_parts: int = 16) -> ray.data.Dataset:
    """Way coordinate rows (way_id, pos, lon, lat — the output of
    pipelines.osm.join_refs_to_coords) -> LineString/Polygon features.

    Rings whose first and last vertex coincide become Polygons
    (Planet.go:67-77, corrected). Geometry assembly shuffles by a
    BOUNDED way-hash partition and each partition kernel assembles ALL
    its ways with one lexsort + offsets pass — no per-way pandas group
    calls (one Ray+pandas call per way was the round-1 plan)."""
    import pyarrow as pa
    from ..relational import hash_part

    def add_part(t: pa.Table) -> pa.Table:
        wid = t["way_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(wid, num_parts)))

    def assemble(t: pa.Table) -> pd.DataFrame:
        # Arrow in (zero-copy numpy views); pandas out only because the
        # geometry column is union-typed python dicts (see
        # nodes_to_features)
        wid = t["way_id"].combine_chunks().to_numpy()
        order = np.lexsort((t["pos"].combine_chunks().to_numpy(), wid))
        wid_s = wid[order]
        lon = t["lon"].combine_chunks().to_numpy()[order]
        lat = t["lat"].combine_chunks().to_numpy()[order]
        fids, starts = np.unique(wid_s, return_index=True)
        bounds = np.append(starts, len(wid_s))
        geoms = []
        for i in range(len(fids)):  # object (dict) assembly per way
            coords = [[x, y] for x, y in
                      zip(lon[bounds[i]:bounds[i + 1]],
                          lat[bounds[i]:bounds[i + 1]])]
            closed = len(coords) >= 4 and coords[0] == coords[-1]
            geoms.append({"type": "Polygon", "coordinates": [coords]}
                         if closed else
                         {"type": "LineString", "coordinates": coords})
        return pd.DataFrame({"type": ["Feature"] * len(fids),
                             "id": fids.astype(np.int64),
                             "geometry": geoms,
                             "properties": [{} for _ in fids]})

    return way_coords.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(assemble, batch_format="pyarrow")


def write_geojsonl(features: ray.data.Dataset, out_dir: str) -> None:
    """Parallel GeoJSONL: one .jsonl shard per block (K5)."""
    features.write_json(out_dir)


def write_geojson(features: ray.data.Dataset, path: str,
                  limit: int | None = 100_000) -> int:
    """Single FeatureCollection document (K4) — driver-side by design;
    guarded by ``limit`` so big datasets fail loudly instead of OOMing
    the driver (use write_geojsonl for those). The put goes through the
    URI layer, so remote schemes and ``.gz`` compression work like the
    reference's PutObject."""
    from ..sources.uri import put_bytes
    rows = features.take_all(limit=limit)
    doc = {"type": "FeatureCollection",
           "features": [{"type": "Feature", "id": int(r["id"]),
                         "geometry": r["geometry"],
                         "properties": r["properties"]} for r in rows]}
    put_bytes(path, json.dumps(doc).encode())
    return len(rows)
