"""Resumable partitioned writes: lineage records, skip-completed,
kill-and-resume produces identical manifests (SURVEY §5.5)."""

import os

import pyarrow as pa
import pytest

from go_osm_ray.state import (completed_partitions, read_manifest,
                              write_partitioned)


def _ds(rd):
    t = pa.table({
        "cell": pa.array([f"c{i % 4}" for i in range(100)], pa.string()),
        "val": pa.array(range(100), pa.int64()),
    })
    return rd.from_arrow(t)


def test_write_and_manifest(ray_session, tmp_path):
    import ray.data as rd
    out = str(tmp_path / "out")
    manifest = write_partitioned(_ds(rd), out, "cell")
    assert sorted(r.key for r in manifest) == ["c0", "c1", "c2", "c3"]
    assert all(r.rows == 25 for r in manifest)
    assert all(os.path.exists(r.path) for r in manifest)
    assert completed_partitions(out) == {"c0", "c1", "c2", "c3"}
    # rows round-trip
    import pyarrow.parquet as pq
    total = sum(len(pq.read_table(r.path)) for r in manifest)
    assert total == 100


def test_kill_and_resume_identical(ray_session, tmp_path):
    import ray.data as rd
    clean = str(tmp_path / "clean")
    crashy = str(tmp_path / "crashy")
    ref = {r.key: r for r in write_partitioned(_ds(rd), clean, "cell")}

    # first run dies before partitions c2/c3 are written
    with pytest.raises(Exception):
        write_partitioned(_ds(rd), crashy, "cell",
                          fail_keys=frozenset({"c2", "c3"}))
    done_first = completed_partitions(crashy)
    assert done_first and "c2" not in done_first and "c3" not in done_first

    mtimes = {k: os.path.getmtime(os.path.join(crashy, f"part-{k}", "data.parquet"))
              for k in done_first}
    resumed = {r.key: r for r in write_partitioned(_ds(rd), crashy, "cell")}

    # resume completed everything, reproducing the clean run's content
    assert set(resumed) == set(ref)
    for k in ref:
        assert resumed[k].rows == ref[k].rows
        assert resumed[k].digest == ref[k].digest
    # already-complete partitions were skipped, not rewritten
    for k in done_first:
        assert os.path.getmtime(
            os.path.join(crashy, f"part-{k}", "data.parquet")) == mtimes[k]


def test_no_resume_rewrites(ray_session, tmp_path):
    import ray.data as rd
    out = str(tmp_path / "out")
    m1 = write_partitioned(_ds(rd), out, "cell")
    m2 = write_partitioned(_ds(rd), out, "cell", resume=False)
    assert {r.key: r.digest for r in m1} == {r.key: r.digest for r in m2}
