"""HCL config loader (reference LoadConfig.go schema) and remote-source
wiring (scheme -> pyarrow filesystem -> read plan), exercised with a
file://-backed fake s3 filesystem — no network needed."""

import json
import os

import pytest

SF = "/root/testdata/sf0.001"

HCL_EXAMPLE = """
# reference-style job config (osm/Config.go schema)
globals {
  output {
    drop_timestamp = true
  }
}

inputs {
  uri = "{nodes_uri}"
  kind = "nodes"
}

inputs {
  uri = "{ways_uri}"
  kind = "ways"
  drop_relations = true
}

outputs {
  uri = "{out_uri}"
  format = "parquet"
  keep_keys = ["amenity", "craft"]
  drop_user_id = true
  pretty = true
  filter {
    expression = "@amenity like cafe"
    bbox = [-180, -90, 180, 90]
  }
}
"""


def test_parse_hcl_blocks_and_values():
    from go_osm_ray.hcl import parse_hcl
    cfg = parse_hcl("""
        a = "x"        // comment
        n = 3
        f = 1.5
        yes = true
        lst = ["p", "q"]
        blk { inner = false }
        rep { v = 1 }
        rep { v = 2 }
        rep { v = 3 }
    """)
    assert cfg["a"] == "x" and cfg["n"] == 3 and cfg["f"] == 1.5
    assert cfg["yes"] is True and cfg["lst"] == ["p", "q"]
    assert cfg["blk"] == {"inner": False}
    assert [r["v"] for r in cfg["rep"]] == [1, 2, 3]


def test_hcl_config_to_spec_and_run(ray_session, tmp_path):
    from go_osm_ray import datagen
    from go_osm_ray.job import load_spec, run_job, validate_spec
    paths = datagen.ensure_tables(0.001)
    out = str(tmp_path / "hclout")
    text = HCL_EXAMPLE.replace("{nodes_uri}", paths["osm_nodes"]) \
        .replace("{ways_uri}", paths["osm_ways"]) \
        .replace("{out_uri}", out)
    p = tmp_path / "job.hcl"
    p.write_text(text)
    spec = load_spec(str(p))
    assert validate_spec(spec) == []
    assert spec["globals"] == {"drop_attrs": ["timestamp"]}
    assert len(spec["inputs"]) == 2 and len(spec["outputs"]) == 1
    o = spec["outputs"][0]
    assert o["include_keys"] == ["amenity", "craft"]
    assert o["filter"] == "@amenity like cafe"
    assert o["bbox"] == [-180.0, -90.0, 180.0, 90.0]
    assert o["drop_attrs"] == ["uid"]
    res = run_job(spec)
    assert os.path.isdir(os.path.join(out, "nodes"))
    # drop_timestamp from globals + drop_user_id from the output block
    import pyarrow.parquet as pq
    cols = pq.read_table(os.path.join(out, "nodes")).column_names
    assert "ts" not in cols and "uid" not in cols


def _fake_s3_factory(root: str):
    """file://-backed stand-in for the s3 scheme: strips s3://<bucket>/
    and serves from a local directory via pyarrow's LocalFileSystem."""
    def factory(uri: str):
        from pyarrow import fs as pafs
        rest = uri.split("://", 1)[1]
        path = rest.split("/", 1)[1]  # drop the bucket
        return pafs.LocalFileSystem(), os.path.join(root, path)
    return factory


def test_remote_parquet_input_via_fs_factory(ray_session, tmp_path, monkeypatch):
    """A job spec with an s3:// input builds the correct read plan via
    the scheme's filesystem factory (fake fs, no network)."""
    import shutil
    from go_osm_ray import datagen
    from go_osm_ray.job import run_job
    from go_osm_ray.sources import uri as uri_mod
    paths = datagen.ensure_tables(0.001)
    shutil.copy(paths["osm_nodes"], tmp_path / "nodes.parquet")
    monkeypatch.setitem(uri_mod.FS_FACTORIES, "s3",
                        _fake_s3_factory(str(tmp_path)))
    out = str(tmp_path / "s3out")
    res = run_job({
        "inputs": [{"uri": "s3://bucket/nodes.parquet", "kind": "nodes"}],
        "outputs": [{"uri": out, "format": "summary"}],
    })
    import pyarrow.parquet as pq
    assert res[out]["rows"] == pq.read_metadata(paths["osm_nodes"]).num_rows


def test_remote_osm_xml_input_via_fs_factory(ray_session, tmp_path, monkeypatch):
    import shutil
    from go_osm_ray import datagen
    from go_osm_ray.job import run_job
    from go_osm_ray.sources import uri as uri_mod
    xml_paths = datagen.ensure_osm_xml(0.001)
    shutil.copy(xml_paths[0], tmp_path / "shard0.osm.gz")
    monkeypatch.setitem(uri_mod.FS_FACTORIES, "s3",
                        _fake_s3_factory(str(tmp_path)))
    out = str(tmp_path / "s3xmlout")
    res = run_job({
        "inputs": [{"uri": "s3://bucket/shard0.osm.gz", "kind": "nodes",
                    "format": "osm_xml"}],
        "outputs": [{"uri": out, "format": "summary"}],
    })
    assert res[out]["rows"] > 0


def test_remote_parquet_output_and_overwrite(ray_session, tmp_path, monkeypatch):
    """K8/K9: outputs route through the filesystem registry — existence
    check, overwrite delete, and the parquet write all hit the (fake)
    remote fs."""
    from go_osm_ray import datagen
    from go_osm_ray.job import run_job
    from go_osm_ray.sources import uri as uri_mod
    paths = datagen.ensure_tables(0.001)
    monkeypatch.setitem(uri_mod.FS_FACTORIES, "s3",
                        _fake_s3_factory(str(tmp_path)))
    spec = {
        "inputs": [{"uri": paths["osm_nodes"], "kind": "nodes"}],
        "outputs": [{"uri": "s3://bucket/out/dir", "format": "parquet"}],
    }
    run_job(spec)
    assert os.path.isdir(tmp_path / "out" / "dir" / "nodes")
    with pytest.raises(FileExistsError):
        run_job(spec)
    spec["outputs"][0]["overwrite"] = True
    run_job(spec)  # delete-then-write succeeds


def test_geojson_gz_put(ray_session, tmp_path):
    """PutObject parity: a .gz output key gzips the document."""
    import gzip
    import json as _json
    from go_osm_ray import datagen
    from go_osm_ray.job import run_job
    paths = datagen.ensure_tables(0.001)
    out = str(tmp_path / "doc.geojson.gz")
    run_job({
        "inputs": [{"uri": paths["osm_nodes"], "kind": "nodes"}],
        "outputs": [{"uri": out, "format": "geojson"}],
    })
    doc = _json.loads(gzip.decompress(open(out, "rb").read()))
    assert doc["type"] == "FeatureCollection" and doc["features"]


def test_open_input_routes_schemes(monkeypatch, tmp_path):
    from go_osm_ray.sources import uri as uri_mod
    f = tmp_path / "x.parquet"
    f.write_bytes(b"")
    paths, fs = uri_mod.open_input(str(f))
    assert paths == [str(f)] and fs is None
    with pytest.raises(ValueError):
        uri_mod.open_input("stdout://x")
    # registered remote scheme routes through its factory
    calls = []
    monkeypatch.setitem(uri_mod.FS_FACTORIES, "hdfs",
                        lambda u: (calls.append(u) or ("FS", "/p")))
    paths, fs = uri_mod.open_input("hdfs://nn/p")
    assert fs == "FS" and paths == ["/p"] and calls == ["hdfs://nn/p"]
