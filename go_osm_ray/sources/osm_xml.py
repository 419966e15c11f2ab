"""OSM-XML source and sink (reference parity: SURVEY.md §2.1 S1–S7, §2.2 K1–K3).

The reference parses planet files with a sequential SAX-style token loop
(/root/reference/osm/UnmarshalPlanet.go:26-180; node/way/relation/tag
attribute handling in UnmarshalNode.go:22-92, UnmarshalWay.go:15-132,
UnmarshalRelation.go:15-136, UnmarshalTags.go:10-64) and serializes with
MarshalPlanet.go:23-188. Here the same element schema is produced as
Arrow tables:

* **Read** is file-parallel: ``ray.data.read_binary_files`` yields one
  blob per shard file and a ``map_batches`` task parses each blob with
  ``ElementTree.iterparse``. XML has no intra-file split points, so the
  parallel grain is the file — at cluster scale inputs are many bounded
  extracts (the planet is distributed that way), matching the
  reference's one-Planet-per-input model (cmd/osm/main.go:647-690) but
  running all inputs concurrently.
* **Write** is a small deterministic driver-side serializer used for
  golden/round-trip parity (real large outputs are partitioned parquet;
  SURVEY.md §2.2 K1 note). It mirrors the reference's layout: header,
  ``<bounds>``, nodes, then ways — relations are NEVER written
  (MarshalPlanet.go never emits them), which we replicate by default.

Compression: ``.gz`` / ``.bz2`` by suffix (osm/Input.go:63-98); ``.pbf``
and ``.o5m`` are rejected just as the reference rejects them.

Tag projection at parse (UnmarshalTags.go:34-53): a non-empty keep-list
keeps ONLY listed keys and the drop-list is ignored; otherwise the
drop-list removes listed keys. Rows always survive — this is a column
rewrite, not a row filter (SURVEY.md §2.3 P1).
"""

from __future__ import annotations

import bz2
import gzip
import io
import os
from xml.etree import ElementTree as ET
from xml.sax.saxutils import quoteattr

import numpy as np
import pyarrow as pa

_ELEMENT_FIELDS = [
    ("id", pa.int64()),
    ("version", pa.int32()),
    ("ts", pa.timestamp("us")),
    ("changeset", pa.int64()),
    ("uid", pa.int64()),
    ("user", pa.string()),
]
_TAGS_TYPE = pa.list_(pa.struct([("key", pa.string()), ("value", pa.string())]))
_MEMBERS_TYPE = pa.list_(pa.struct([("type", pa.string()), ("ref", pa.int64()),
                                    ("role", pa.string())]))

NODE_SCHEMA = pa.schema(_ELEMENT_FIELDS + [("lon", pa.float64()),
                                           ("lat", pa.float64()),
                                           ("tags", _TAGS_TYPE)])
WAY_SCHEMA = pa.schema(_ELEMENT_FIELDS + [("refs", pa.list_(pa.int64())),
                                          ("tags", _TAGS_TYPE)])
RELATION_SCHEMA = pa.schema(_ELEMENT_FIELDS + [("members", _MEMBERS_TYPE),
                                               ("tags", _TAGS_TYPE)])
SCHEMAS = {"node": NODE_SCHEMA, "way": WAY_SCHEMA, "relation": RELATION_SCHEMA}


def _decompress(data: bytes, path: str) -> bytes:
    """Magic-byte sniffing, not suffix trust: ray.data.read_binary_files
    already auto-decompresses .gz, so suffix-dispatch would double-gunzip."""
    if path.endswith(".pbf") or path.endswith(".o5m"):
        raise ValueError(f"unsupported format (reference rejects it too): {path}")
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    if data[:3] == b"BZh":
        return bz2.decompress(data)
    return data


def _parse_ts(s: str | None):
    if not s:
        return None
    return np.datetime64(s.rstrip("Z"), "us")


def _project_tags(tags: list, keep: frozenset | None, drop: frozenset | None):
    """UnmarshalTags.go:34-53 semantics (keep overrides drop)."""
    if keep:
        return [t for t in tags if t["key"] in keep]
    if drop:
        return [t for t in tags if t["key"] not in drop]
    return tags


def parse_osm_xml(data: bytes, kind: str,
                  keep_keys=None, drop_keys=None,
                  path: str = "") -> pa.Table:
    """Parse one OSM-XML blob into an Arrow table of ``kind`` elements.

    Attribute handling mirrors UnmarshalNode.go:22-92 — missing numeric
    attrs default to 0, missing user to "", missing timestamp to null.
    """
    if kind not in SCHEMAS:
        raise ValueError(f"kind must be node/way/relation, got {kind!r}")
    data = _decompress(data, path)
    keep = frozenset(keep_keys) if keep_keys else None
    drop = frozenset(drop_keys) if drop_keys else None

    rows: dict[str, list] = {f: [] for f in SCHEMAS[kind].names}

    def elem_attrs(e):
        a = e.attrib
        rows["id"].append(int(a.get("id", 0)))
        rows["version"].append(int(a.get("version", 0)))
        rows["ts"].append(_parse_ts(a.get("timestamp")))
        rows["changeset"].append(int(a.get("changeset", 0)))
        rows["uid"].append(int(a.get("uid", 0)))
        rows["user"].append(a.get("user", ""))

    def tags_of(e):
        return _project_tags(
            [{"key": t.attrib.get("k", ""), "value": t.attrib.get("v", "")}
             for t in e if t.tag == "tag"], keep, drop)

    for _, e in ET.iterparse(io.BytesIO(data), events=("end",)):
        if e.tag != kind:
            continue
        elem_attrs(e)
        if kind == "node":
            rows["lon"].append(float(e.attrib.get("lon", 0.0)))
            rows["lat"].append(float(e.attrib.get("lat", 0.0)))
        elif kind == "way":
            rows["refs"].append([int(nd.attrib["ref"]) for nd in e
                                 if nd.tag == "nd"])
        else:
            rows["members"].append(
                [{"type": m.attrib.get("type", ""),
                  "ref": int(m.attrib.get("ref", 0)),
                  "role": m.attrib.get("role", "")}
                 for m in e if m.tag == "member"])
        rows["tags"].append(tags_of(e))
        e.clear()  # free children as we stream

    schema = SCHEMAS[kind]
    return pa.table({f: pa.array(rows[f], type=schema.field(f).type)
                     for f in schema.names}, schema=schema)


def read_osm_bounds(path: str) -> dict | None:
    """Dataset-level <bounds> metadata (osm/UnmarshalBounds.go:13-20) —
    a tiny driver-side read of the file head; not a Dataset."""
    with open(path, "rb") as f:
        data = f.read()
    data = _decompress(data, path)
    for _, e in ET.iterparse(io.BytesIO(data), events=("start",)):
        if e.tag == "bounds":
            a = e.attrib
            return {k: float(a[x]) for k, x in
                    [("minlon", "minlon"), ("minlat", "minlat"),
                     ("maxlon", "maxlon"), ("maxlat", "maxlat")]}
        if e.tag in ("node", "way", "relation"):
            break
    return None


def read_osm_xml(paths, kind: str, keep_keys=None, drop_keys=None,
                 filesystem=None):
    """File-parallel OSM-XML read -> ``ray.data.Dataset`` of ``kind``
    elements (one parse task per shard file). ``filesystem`` accepts any
    pyarrow FileSystem, so s3://, hdfs:// and http(s):// inputs resolved
    by ``sources.uri.open_input`` read through the same plan."""
    import ray.data as rd

    def parse_batch(batch: pa.Table) -> pa.Table:
        out = [parse_osm_xml(blob.as_py(), kind, keep_keys, drop_keys,
                             path=p.as_py())
               for p, blob in zip(batch["path"], batch["bytes"])]
        out = [t for t in out if len(t)]
        return pa.concat_tables(out) if out else SCHEMAS[kind].empty_table()

    files = rd.read_binary_files(paths, include_paths=True,
                                 filesystem=filesystem)
    return files.map_batches(parse_batch, batch_format="pyarrow",
                             batch_size=1)


# --------------------------------------------------------------------- writer

_TS_UNIT = np.timedelta64(1, "us")


def _fmt_ts(v) -> str | None:
    if v is None:
        return None
    return np.datetime_as_string(np.datetime64(v, "us"), unit="s") + "Z"


def _attr_str(pairs) -> str:
    return "".join(f" {k}={quoteattr(str(v))}" for k, v in pairs if v is not None)


def _element_attr_pairs(row: dict, drop: frozenset) -> list:
    """Per-attribute drop flags (MarshalNode.go:14-66; note we gate uid
    on drop 'uid' — the reference's MarshalWay.go:27-30 gates it on
    DropUserName, a documented bug we do not replicate)."""
    pairs = [("id", row["id"])]
    if "version" not in drop:
        pairs.append(("version", row["version"]))
    if "timestamp" not in drop and row.get("ts") is not None:
        pairs.append(("timestamp", _fmt_ts(row["ts"])))
    if "changeset" not in drop:
        pairs.append(("changeset", row["changeset"]))
    if "uid" not in drop:
        pairs.append(("uid", row["uid"]))
    if "user" not in drop:
        pairs.append(("user", row["user"]))
    return pairs


def planet_to_xml_bytes(nodes: pa.Table | None, ways: pa.Table | None,
                        bounds: dict | None = None,
                        drop_attrs=(), write_relations: bool = False,
                        relations: pa.Table | None = None,
                        generator: str = "go_osm_ray",
                        pretty: bool = True) -> bytes:
    """Serialize node/way tables to OSM-XML (layout of
    MarshalPlanet.go:23-188: header, bounds, nodes, ways; relations only
    when explicitly requested — the reference never writes them).
    Elements are emitted in table order; sort by id first for
    deterministic goldens (ordering note, SURVEY.md §4). ``pretty``
    mirrors the reference's Pretty flag (MarshalIndent vs Marshal): when
    False, no indentation/newlines between elements."""
    drop = frozenset(drop_attrs)
    i1, i2, nl = ("  ", "    ", "\n") if pretty else ("", "", "")
    out = io.StringIO()
    out.write('<?xml version="1.0" encoding="UTF-8"?>\n')
    out.write(f'<osm version="0.6" generator={quoteattr(generator)}>{nl}')
    if bounds:
        out.write(i1 + "<bounds" + _attr_str(sorted(bounds.items())) + f"/>{nl}")

    def write_tags(tags):
        for t in tags or []:
            out.write(f'{i2}<tag k={quoteattr(t["key"])} '
                      f'v={quoteattr(t["value"])}/>{nl}')

    for row in (nodes.to_pylist() if nodes is not None else []):
        pairs = _element_attr_pairs(row, drop)
        pairs.insert(1, ("lat", repr(row["lat"])))
        pairs.insert(2, ("lon", repr(row["lon"])))
        if row.get("tags"):
            out.write(i1 + "<node" + _attr_str(pairs) + f">{nl}")
            write_tags(row["tags"])
            out.write(i1 + f"</node>{nl}")
        else:
            out.write(i1 + "<node" + _attr_str(pairs) + f"/>{nl}")

    for row in (ways.to_pylist() if ways is not None else []):
        out.write(i1 + "<way" + _attr_str(_element_attr_pairs(row, drop)) + f">{nl}")
        for r in row.get("refs") or []:
            out.write(f'{i2}<nd ref="{r}"/>{nl}')
        write_tags(row.get("tags"))
        out.write(i1 + f"</way>{nl}")

    if write_relations and relations is not None:
        for row in relations.to_pylist():
            out.write(i1 + "<relation"
                      + _attr_str(_element_attr_pairs(row, drop)) + f">{nl}")
            for m in row.get("members") or []:
                out.write(f'{i2}<member type={quoteattr(m["type"])} '
                          f'ref="{m["ref"]}" role={quoteattr(m["role"])}/>{nl}')
            write_tags(row.get("tags"))
            out.write(i1 + f"</relation>{nl}")

    out.write("</osm>\n")
    return out.getvalue().encode()


def write_osm_xml_shards(nodes: "object", out_dir: str,
                         ways: "object | None" = None,
                         compression: str = "gz",
                         **kw) -> list[dict]:
    """SCALE form of the XML sink: every node block serializes in
    parallel to its own bounded ``shard-<minid>-<maxid>-<rows>-<crc>``
    extract (the many-bounded-extracts layout the reference's planet
    distribution uses, and the exact shape ``read_osm_xml`` parallelizes
    over).

    Resume protocol (ADVICE r2): shard names are CONTENT-ADDRESSED —
    the id range, row count, a crc32 of the id column bytes, and a hash
    of the serialization options — so an existing file with a planned
    name is guaranteed byte-identical and is skipped (probed through the
    filesystem registry, so remote URIs resume too). After the write the
    directory is RECONCILED: any ``shard-*`` file not in this run's
    manifest (a stale shard from a rerun whose block composition
    changed) is deleted, and ``_manifest.json`` records the
    authoritative shard list — consumers read the manifest, never a
    glob. Returns the manifest rows (path, rows).

    ``ways`` (optional) must be co-partitionable by the same id ranges
    only if passed as a driver-side table; the common planet layout
    (nodes-only extracts + way files) writes them separately."""
    import json as _json
    import os as _os
    import zlib as _zlib

    import ray as _ray

    from .uri import delete_output, list_output_dir, output_exists, put_bytes

    suffix = f".osm.{compression}" if compression else ".osm"
    kw_tag = _zlib.crc32(repr(sorted(kw.items())).encode()) & 0xFFFFFFFF

    def write_shard(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return pa.table({"path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        ids = batch["id"].combine_chunks().to_numpy()
        crc = _zlib.crc32(ids.tobytes(), kw_tag) & 0xFFFFFFFF
        path = _os.path.join(
            out_dir,
            f"shard-{ids.min()}-{ids.max()}-{len(ids)}-{crc:08x}{suffix}")
        if not output_exists(path):  # resume: identical shard exists
            put_bytes(path, planet_to_xml_bytes(batch, None, **kw))
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([len(batch)], pa.int64())})

    _os.makedirs(out_dir, exist_ok=True)
    manifest = nodes.map_batches(write_shard, batch_format="pyarrow")
    out = pa.concat_tables([t for t in _ray.get(manifest.to_arrow_refs())
                            if t.num_rows and t.num_columns])
    rows = out.to_pylist()
    if ways is not None:
        write_osm_xml(_os.path.join(out_dir, f"ways{suffix}"),
                      None, ways, **kw)
        rows.append({"path": _os.path.join(out_dir, f"ways{suffix}"),
                     "rows": len(ways)})
    # reconcile: stale shards (different block composition on a rerun)
    # would silently duplicate rows for glob consumers — remove them
    live = {_os.path.basename(r["path"]) for r in rows}
    for name in list_output_dir(out_dir):
        if name.startswith("shard-") and name not in live:
            delete_output(_os.path.join(out_dir, name))
    put_bytes(_os.path.join(out_dir, "_manifest.json"), _json.dumps(
        {"shards": [{"path": r["path"], "rows": int(r["rows"])}
                    for r in rows],
         "total_rows": int(sum(r["rows"] for r in rows))}).encode())
    return rows


def write_osm_xml(path: str, nodes: pa.Table | None, ways: pa.Table | None,
                  **kw) -> None:
    """Write one OSM-XML document to any supported URI; gzip/bz2 by
    suffix and remote schemes via the filesystem registry (put_bytes —
    the PutObject parity path, s3util/PutObject.go:23-61)."""
    from .uri import put_bytes
    put_bytes(path, planet_to_xml_bytes(nodes, ways, **kw))
