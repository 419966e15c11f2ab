"""Job-spec runner: templating, validation, filter chain, multi-output
fan-out, overwrite protection, ways_to_nodes append (SURVEY §3.3)."""

import json
import os

import pytest

from go_osm_ray import job
from go_osm_ray.job import render_template, run_job, validate_spec

SF = "/root/testdata/sf0.001"


def _gen():
    from go_osm_ray import datagen
    return datagen.ensure_tables(0.001)


# ----------------------------------------------------------- templating

def test_render_template_vars_and_funcs():
    ctx = {"region": "DC", "name": "a-b"}
    assert render_template("/x/{{.region}}/f", ctx) == "/x/DC/f"
    assert render_template("{{lower .region}}", ctx) == "dc"
    assert render_template("{{upper .name}}", ctx) == "A-B"
    assert render_template('{{replace .name "-" "_"}}', ctx) == "a_b"
    assert render_template("{{float64 .n}}", {"n": "2"}) == "2.0"
    with pytest.raises(KeyError):
        render_template("{{.missing}}", ctx)


# ----------------------------------------------------------- validation

def test_validate_mutual_exclusions():
    spec = {"inputs": [{"uri": "x"}], "outputs": [{"uri": "y"}],
            "globals": {"keys_to_keep": ["a"], "keys_to_drop": ["b"]}}
    assert any("mutually exclusive" in p for p in validate_spec(spec))
    spec["globals"] = {"ways_to_nodes": True, "drop_ways": True}
    assert any("ways_to_nodes" in p for p in validate_spec(spec))
    spec["globals"] = {}
    assert validate_spec(spec) == []


def test_validate_drop_all_present_classes():
    """Reference parity (osm/Config.go:326-328): drop_nodes + drop_ways is
    fatal for a nodes+ways spec even without drop_relations; adding a
    relations input that survives makes the same options valid."""
    spec = {"inputs": [{"uri": "n", "kind": "nodes"},
                       {"uri": "w", "kind": "ways"}],
            "outputs": [{"uri": "y"}],
            "globals": {"drop_nodes": True, "drop_ways": True}}
    assert any("every element class" in p for p in validate_spec(spec))
    spec["inputs"].append({"uri": "r", "kind": "relations"})
    assert validate_spec(spec) == []
    spec["globals"]["drop_relations"] = True
    assert any("every element class" in p for p in validate_spec(spec))


# ------------------------------------------------------------- end-to-end

def test_job_multi_output(ray_session, tmp_path):
    paths = _gen()
    out_pq = str(tmp_path / "{{lower .region}}-out")
    out_jl = str(tmp_path / "feat.geojsonl")
    spec = {
        "context": {"region": "DC"},
        "globals": {"keys_to_keep": ["amenity"]},
        "inputs": [{"uri": paths["osm_nodes"], "kind": "nodes"}],
        "outputs": [
            {"uri": out_pq, "format": "parquet"},
            {"uri": out_jl, "format": "geojsonl"},
        ],
    }
    results = run_job(spec)
    rendered = str(tmp_path / "dc-out")
    assert rendered in results
    # parquet output readable and row-filtered
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads
    nodes_out = pads.dataset(os.path.join(rendered, "nodes")).to_table()
    assert 0 < len(nodes_out)
    # every surviving row has the amenity key (P2 row filter applied)
    for tags in nodes_out["tags"].to_pylist():
        assert any(t["key"] == "amenity" for t in tags)
    # geojsonl shards parse as features
    files = [f for f in os.listdir(out_jl) if f.endswith(".json")]
    assert files
    line = open(os.path.join(out_jl, files[0])).readline()
    feat = json.loads(line)
    assert feat["geometry"]["type"] == "Point" and "properties" in feat


def test_overwrite_protection(ray_session, tmp_path):
    paths = _gen()
    out = str(tmp_path / "o.geojson")
    open(out, "w").write("{}")
    spec = {"inputs": [{"uri": paths["osm_nodes"], "kind": "nodes"}],
            "outputs": [{"uri": out, "format": "geojson"}]}
    with pytest.raises(FileExistsError):
        run_job(spec)
    spec["outputs"][0]["overwrite"] = True
    results = run_job(spec)
    doc = json.load(open(out))
    assert doc["type"] == "FeatureCollection"
    assert len(doc["features"]) == results[out]["rows"] > 0


def test_ways_to_nodes_output(ray_session, tmp_path):
    paths = _gen()
    out = str(tmp_path / "w2n")
    spec = {"inputs": [{"uri": paths["osm_nodes"], "kind": "nodes"},
                       {"uri": paths["osm_ways"], "kind": "ways"}],
            "outputs": [{"uri": out, "format": "parquet",
                         "ways_to_nodes": True}]}
    run_job(spec)
    import pyarrow.dataset as pads
    nodes_out = pads.dataset(os.path.join(out, "nodes")).to_table()
    import pyarrow.parquet as pq
    n_nodes = len(pq.read_table(paths["osm_nodes"]))
    n_ways = len(pq.read_table(paths["osm_ways"]))
    # synthetic centroid node appended per way, no ways table written
    assert len(nodes_out) == n_nodes + n_ways
    assert not os.path.exists(os.path.join(out, "ways"))


def test_osm_xml_input_and_output(ray_session, tmp_path):
    from go_osm_ray import datagen
    xml_paths = datagen.ensure_osm_xml(0.001)
    out = str(tmp_path / "echo.osm")
    spec = {"inputs": [{"uri": os.path.dirname(xml_paths[0]) + "/part-*.osm.gz",
                        "kind": "nodes", "format": "osm_xml"}],
            "outputs": [{"uri": out, "format": "osm_xml"}]}
    run_job(spec)
    from go_osm_ray.sources.osm_xml import parse_osm_xml
    t = parse_osm_xml(open(out, "rb").read(), "node")
    import pyarrow.parquet as pq
    src = pq.read_table(_gen()["osm_nodes"])
    assert len(t) == len(src)
    assert t.sort_by("id")["id"].to_pylist() == src["id"].to_pylist()


def test_gdal_ini_defaults(ray_session, tmp_path):
    ini = tmp_path / "osmconf.ini"
    ini.write_text("[points]\nosm_user=no\nosm_version=yes\n")
    paths = _gen()
    out = str(tmp_path / "ini-out")
    spec = {"globals": {"gdal_ini": str(ini)},
            "inputs": [{"uri": paths["osm_nodes"], "kind": "nodes"}],
            "outputs": [{"uri": out, "format": "parquet"}]}
    run_job(spec)
    import pyarrow.dataset as pads
    t = pads.dataset(os.path.join(out, "nodes")).to_table()
    assert "user" not in t.column_names                   # dropped by ini
    assert any(v != 0 for v in t["version"].to_pylist())  # kept by ini


def test_xml_output_semi_join_retention(ray_session, tmp_path):
    """J2 golden rule (MarshalPlanet.go:100-141): writing OSM-XML with a
    row filter keeps nodes referenced by kept ways even when they fail
    the filter themselves. Oracle: slow pure-python set computation."""
    import pyarrow.parquet as pq
    from go_osm_ray.expr import Expression
    paths = _gen()
    expr = "@building like yes or @amenity like cafe"
    out = str(tmp_path / "ret.osm")
    spec = {"inputs": [{"uri": paths["osm_nodes"], "kind": "nodes"},
                       {"uri": paths["osm_ways"], "kind": "ways"}],
            "outputs": [{"uri": out, "format": "osm_xml",
                         "filter": expr}]}
    run_job(spec)
    from go_osm_ray.sources.osm_xml import parse_osm_xml
    got = sorted(parse_osm_xml(open(out, "rb").read(), "node")["id"].to_pylist())

    # python oracle
    e = Expression(expr)
    nodes = pq.read_table(paths["osm_nodes"])
    ways = pq.read_table(paths["osm_ways"])
    pass_nodes = set(e.filter(nodes)["id"].to_pylist())
    kept_ways = e.filter(ways)
    ref_ids = {r for refs in kept_ways["refs"].to_pylist() for r in refs}
    assert got == sorted(pass_nodes | ref_ids)
    # the bypass must actually fire: some referenced nodes fail the filter
    assert ref_ids - pass_nodes


# ---------------------------------------------------- round-5 CLI flag parity


def _parse(argv):
    from go_osm_ray.cli import build_spec, make_parser
    return build_spec(make_parser().parse_args(argv))


def test_cli_drop_convenience_list():
    """-drop 'ways,author,version' (main.go:165-176): element classes map
    to drop_ways/drop_relations, attrs to drop_attrs, author = uid+user."""
    spec = _parse(["--input-uri", "n.parquet",
                   "--drop", "ways,author,version"])
    g = spec["globals"]
    assert g["drop_ways"] is True
    assert "drop_relations" not in g
    assert g["drop_attrs"] == ["uid", "user", "version"]


def test_cli_drop_attr_flags():
    spec = _parse(["--input-uri", "n.parquet", "--drop-timestamp",
                   "--drop-changeset", "--drop-author"])
    assert spec["globals"]["drop_attrs"] == ["changeset", "timestamp",
                                             "uid", "user"]


def test_cli_drop_unknown_item_rejected():
    with pytest.raises(ValueError, match="unknown -drop item"):
        _parse(["--input-uri", "n.parquet", "--drop", "bogus"])


def test_cli_uri_separators():
    """-input_uri_separator / -output_uri_separator (main.go:149,180):
    one flag value packs several uris; default is no splitting."""
    spec = _parse(["--input-uri", "a.parquet:b.parquet",
                   "--input-uri-separator", ":",
                   "--output-uri", "x.geojsonl;y.geojsonl",
                   "--output-uri-separator", ";"])
    assert [i["uri"] for i in spec["inputs"]] == ["a.parquet", "b.parquet"]
    assert [o["uri"] for o in spec["outputs"]] == ["x.geojsonl",
                                                  "y.geojsonl"]
    spec2 = _parse(["--input-uri", "a.parquet:b.parquet"])
    assert [i["uri"] for i in spec2["inputs"]] == ["a.parquet:b.parquet"]


def test_cli_pretty_flows_to_outputs():
    spec = _parse(["--input-uri", "n.parquet", "--output-uri", "o.osm",
                   "--pretty"])
    assert spec["outputs"][0]["pretty"] is True
    assert spec["globals"]["pretty"] is True


def test_summary_output_with_summarize_keys(ray_session, tmp_path):
    """-summarize_keys through the job runner: per-key per-class counts
    against a pure-python oracle over the generated tables."""
    import pyarrow.parquet as pq
    paths = _gen()
    out = str(tmp_path / "sumk")
    res = run_job({
        "inputs": [{"uri": paths["osm_nodes"], "kind": "nodes"},
                   {"uri": paths["osm_ways"], "kind": "ways"}],
        "outputs": [{"uri": out, "format": "summary",
                     "summarize_keys": ["amenity", "highway", "name"]}],
    })
    got = {r["key"]: (r["nodes_n"], r["ways_n"], r["rels_n"])
           for r in res[out]["keys"]}

    def count(path, key):
        t = pq.read_table(path, columns=["tags"])
        return sum(1 for tags in t["tags"].to_pylist()
                   if any(kv["key"] == key for kv in tags))

    for key in ("amenity", "highway", "name"):
        assert got[key] == (count(paths["osm_nodes"], key),
                            count(paths["osm_ways"], key), 0)
