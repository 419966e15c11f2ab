"""OSM-XML source/sink: round-trip fidelity, escaping, projection
semantics (reference: UnmarshalTags.go keep-over-drop, MarshalPlanet
layout), compression by suffix, file-parallel Dataset read."""

import gzip

import numpy as np
import pyarrow as pa
import pytest

from go_osm_ray.sources import osm_xml as ox


def _nodes_table():
    return pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "version": pa.array([1, 2, 3], pa.int32()),
        "ts": pa.array([np.datetime64("2020-01-01T00:00:05", "us"), None,
                        np.datetime64("2021-06-30T23:59:59", "us")]),
        "changeset": pa.array([10, 0, 30], pa.int64()),
        "uid": pa.array([7, 8, 9], pa.int64()),
        "user": pa.array(['quote"r', "amp&sand", "<angle>"], pa.string()),
        "lon": pa.array([-77.1234567, 0.0, 179.999], pa.float64()),
        "lat": pa.array([38.9, -0.5, -89.0], pa.float64()),
        "tags": pa.array([
            [{"key": "name", "value": 'say "hi" & <bye>'}],
            [],
            [{"key": "amenity", "value": "café"},
             {"key": "craft", "value": "brewery"}],
        ], ox._TAGS_TYPE),
    }, schema=ox.NODE_SCHEMA)


def _ways_table():
    return pa.table({
        "id": pa.array([100], pa.int64()),
        "version": pa.array([4], pa.int32()),
        "ts": pa.array([np.datetime64("2020-02-02T02:02:02", "us")]),
        "changeset": pa.array([40], pa.int64()),
        "uid": pa.array([9], pa.int64()),
        "user": pa.array(["w"], pa.string()),
        "refs": pa.array([[1, 2, 3, 1]], pa.list_(pa.int64())),
        "tags": pa.array([[{"key": "building", "value": "yes"}]],
                         ox._TAGS_TYPE),
    }, schema=ox.WAY_SCHEMA)


def test_roundtrip_nodes_ways():
    nodes, ways = _nodes_table(), _ways_table()
    data = ox.planet_to_xml_bytes(nodes, ways)
    back_n = ox.parse_osm_xml(data, "node")
    back_w = ox.parse_osm_xml(data, "way")
    assert back_n.equals(nodes)
    assert back_w.equals(ways)


def test_relations_not_written_by_default():
    rels = pa.table({
        "id": pa.array([500], pa.int64()),
        "version": pa.array([1], pa.int32()),
        "ts": pa.array([None], pa.timestamp("us")),
        "changeset": pa.array([0], pa.int64()),
        "uid": pa.array([0], pa.int64()),
        "user": pa.array([""], pa.string()),
        "members": pa.array([[{"type": "node", "ref": 1, "role": "outer"}]],
                            ox._MEMBERS_TYPE),
        "tags": pa.array([[]], ox._TAGS_TYPE),
    }, schema=ox.RELATION_SCHEMA)
    # reference never writes relations (MarshalPlanet.go) — default off
    data = ox.planet_to_xml_bytes(_nodes_table(), None, relations=rels)
    assert len(ox.parse_osm_xml(data, "relation")) == 0
    data = ox.planet_to_xml_bytes(_nodes_table(), None, relations=rels,
                                  write_relations=True)
    assert ox.parse_osm_xml(data, "relation").equals(rels)


def test_keep_overrides_drop():
    # UnmarshalTags.go:34-53: non-empty keep-list wins, drop ignored
    data = ox.planet_to_xml_bytes(_nodes_table(), None)
    t = ox.parse_osm_xml(data, "node", keep_keys=["craft"],
                         drop_keys=["craft"])
    tags = t["tags"].to_pylist()
    assert tags == [[], [], [{"key": "craft", "value": "brewery"}]]
    t = ox.parse_osm_xml(data, "node", drop_keys=["name"])
    assert t["tags"].to_pylist()[0] == []


def test_drop_attrs():
    data = ox.planet_to_xml_bytes(_nodes_table(), None,
                                  drop_attrs=("user", "changeset"))
    t = ox.parse_osm_xml(data, "node")
    assert t["user"].to_pylist() == ["", "", ""]
    assert t["changeset"].to_pylist() == [0, 0, 0]
    assert t["uid"].to_pylist() == [7, 8, 9]  # uid gated on uid, not user


def test_missing_attrs_default():
    snippet = b'<osm><node id="5" lat="1.5" lon="2.5"/></osm>'
    t = ox.parse_osm_xml(snippet, "node")
    row = t.to_pylist()[0]
    assert row["id"] == 5 and row["version"] == 0 and row["uid"] == 0
    assert row["user"] == "" and row["ts"] is None


def test_gzip_suffix(tmp_path):
    p = str(tmp_path / "mini.osm.gz")
    ox.write_osm_xml(p, _nodes_table(), _ways_table())
    raw = open(p, "rb").read()
    assert raw[:2] == b"\x1f\x8b"
    t = ox.parse_osm_xml(raw, "node", path=p)
    assert t.equals(_nodes_table())


def test_pbf_rejected():
    with pytest.raises(ValueError):
        ox.parse_osm_xml(b"x", "node", path="planet.pbf")


def test_dataset_read_parallel(ray_session, tmp_path):
    paths = []
    for s in range(3):
        p = str(tmp_path / f"part-{s}.osm")
        nodes = _nodes_table()
        nodes = nodes.set_column(0, "id", pa.array(
            [i + 10 * s for i in (1, 2, 3)], pa.int64()))
        ox.write_osm_xml(p, nodes, None)
        paths.append(p)
    ds = ox.read_osm_xml(paths, "node")
    ids = sorted(ds.to_pandas()["id"])
    assert ids == sorted(i + 10 * s for s in range(3) for i in (1, 2, 3))


def test_bounds(tmp_path):
    p = str(tmp_path / "b.osm")
    ox.write_osm_xml(p, _nodes_table(), None,
                     bounds={"minlon": -77.2, "minlat": 38.7,
                             "maxlon": -76.9, "maxlat": 39.0})
    b = ox.read_osm_bounds(p)
    assert b == {"minlon": -77.2, "minlat": 38.7,
                 "maxlon": -76.9, "maxlat": 39.0}


def test_write_osm_xml_shards_roundtrip_and_resume(ray_session, tmp_path):
    """Sharded XML sink: parallel bounded shards round-trip through the
    file-parallel reader, and a rerun skips finished shards (resume)."""
    import glob
    import os
    import ray.data as rd
    import pandas as pd
    from go_osm_ray.sources.osm_xml import read_osm_xml, write_osm_xml_shards
    nodes = rd.read_parquet("/tmp/go_osm_ray_data/sf0.001/osm_nodes.parquet") \
        .repartition(4)
    out = str(tmp_path / "shards")
    manifest = write_osm_xml_shards(nodes, out)
    paths = sorted(glob.glob(os.path.join(out, "*.osm.gz")))
    assert paths and sorted(m["path"] for m in manifest) == paths
    assert sum(m["rows"] for m in manifest) == 1000
    back = read_osm_xml(paths, "node").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    want = rd.read_parquet(
        "/tmp/go_osm_ray_data/sf0.001/osm_nodes.parquet").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert list(back["id"]) == list(want["id"])
    assert (back["lon"] == want["lon"]).all()
    # resume: mtimes unchanged on rerun
    mt = {p: os.path.getmtime(p) for p in paths}
    write_osm_xml_shards(nodes, out)
    assert {p: os.path.getmtime(p) for p in paths} == mt


def test_write_osm_xml_shards_reconciles_stale_shards(ray_session, tmp_path):
    """ADVICE r2: a rerun whose block composition changed must DELETE the
    previous run's overlapping shards (no silent row duplication for
    glob consumers) and record the authoritative set in _manifest.json."""
    import glob
    import json
    import os
    import ray.data as rd
    from go_osm_ray.sources.osm_xml import read_osm_xml, write_osm_xml_shards
    src = "/tmp/go_osm_ray_data/sf0.001/osm_nodes.parquet"
    out = str(tmp_path / "shards")
    write_osm_xml_shards(rd.read_parquet(src).repartition(4), out)
    n4 = sorted(glob.glob(os.path.join(out, "shard-*.osm.gz")))
    assert len(n4) == 4
    manifest = write_osm_xml_shards(rd.read_parquet(src).repartition(3), out)
    n3 = sorted(glob.glob(os.path.join(out, "shard-*.osm.gz")))
    assert len(n3) == 3 and sorted(m["path"] for m in manifest) == n3
    assert not set(n4) & set(n3)  # old boundaries all reconciled away
    with open(os.path.join(out, "_manifest.json")) as f:
        mf = json.load(f)
    assert mf["total_rows"] == 1000
    assert sorted(s["path"] for s in mf["shards"]) == n3
    back = read_osm_xml(n3, "node").to_pandas()
    assert len(back) == 1000 and back["id"].is_unique
