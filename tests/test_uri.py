"""URI routing, glob expansion, GDAL-ini options, summary text contract."""

import pytest

from go_osm_ray.sources.uri import load_ini_options, resolve_uri, split_uri


def test_split_uri():
    assert split_uri("s3://bucket/key") == ("s3", "bucket/key")
    assert split_uri("/a/b.parquet") == ("", "/a/b.parquet")
    assert split_uri("stdin") == ("stdin", "")


def test_resolve_local_and_glob(tmp_path):
    for n in ("a.osm", "b.osm"):
        (tmp_path / n).write_text("x")
    r = resolve_uri(str(tmp_path / "*.osm"))
    assert r["scheme"] == "file" and len(r["paths"]) == 2
    r = resolve_uri(f"file://{tmp_path}/a.osm")
    assert r["paths"] == [str(tmp_path / "a.osm")]
    with pytest.raises(FileNotFoundError):
        resolve_uri(str(tmp_path / "*.nope"))
    with pytest.raises(ValueError):
        resolve_uri("ftp://x/y")


def test_remote_schemes_route():
    assert resolve_uri("s3://b/k.parquet")["scheme"] == "s3"
    assert resolve_uri("https://h/p")["url"] == "https://h/p"
    assert resolve_uri("stdin")["scheme"] == "stdin"


def test_ini_options(tmp_path):
    p = tmp_path / "osmconf.ini"
    p.write_text("[points]\nosm_version=no\nosm_timestamp=yes\n"
                 "osm_user=false\nattributes=amenity, craft\n")
    opts = load_ini_options(str(p))
    assert sorted(opts["drop_attrs"]) == ["user", "version"]
    assert opts["include_keys"] == ["amenity", "craft"]


def test_format_summary(ray_session):
    import __ray_entry__ as E
    from go_osm_ray.pipelines.osm import format_summary
    s = E.queries()["osm_summarize"]("/root/testdata/sf0.001")
    text = format_summary(s)
    lines = text.splitlines()
    assert lines[0].startswith("Bounding Box: ")
    assert len(lines[0].split(",")) == 4
    assert any(line.startswith("Number of nodes: ") for line in lines)


def test_read_table_routes_parquet_dir_and_lance(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from go_osm_ray.sources.tables import is_lance, read_table

    # directory of parts -> expanded, all rows, pruned columns
    d = tmp_path / "tbl.parquet"
    d.mkdir()
    for i in range(3):
        pq.write_table(pa.table({"a": [i], "b": [i * 10]}),
                       d / f"part-{i}.parquet")
    ds = read_table(str(d), columns=["a"])
    assert sorted(r["a"] for r in ds.take_all()) == [0, 1, 2]
    assert ds.schema().names == ["a"]
    assert len(ds.input_files()) == 3

    # single file path
    f = tmp_path / "one.parquet"
    pq.write_table(pa.table({"a": [7]}), f)
    assert read_table(str(f)).count() == 1

    # lance routing: recognized, and fails with an actionable message in
    # this lance-less container
    assert is_lance("lance://bucket/tbl") and is_lance("/data/x.lance")
    assert not is_lance("/data/x.parquet")
    with pytest.raises(ImportError, match="pylance"):
        read_table("/data/images.lance")

    with pytest.raises(FileNotFoundError):
        read_table(str(tmp_path / "empty_dir_missing"))
