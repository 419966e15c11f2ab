"""Session-8 ops: planted-configuration properties the SQL/pyoracle
parity gates cannot see — threshold straddling, tie rules, block-layout
invariance, and closed-form known answers."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data


def _pts_table(lons, lats):
    return pa.table({
        "image_id": pa.array([f"p{i}" for i in range(len(lons))]),
        "lon": pa.array(np.asarray(lons, np.float64)),
        "lat": pa.array(np.asarray(lats, np.float64))})


def test_ripley_k_threshold_straddle(ray_session):
    """Three equator points ~89m/~995m apart: pair membership per
    radius is exact, and block layout cannot change the counts."""
    from go_osm_ray.pipelines.spatial import ripley_k
    # 1 deg lon at equator ~ 111.2 km; 0.0008 deg ~ 89 m; 0.00895 ~ 995 m
    t = _pts_table([10.0, 10.0008, 10.00895], [0.0, 0.0, 0.0])
    for blocks in (1, 3):
        out = ripley_k(ray.data.from_arrow(t).repartition(blocks),
                       res=7).to_pandas()
        assert len(out) == 1 and int(out.n.iloc[0]) == 3
        assert int(out.le100.iloc[0]) == 1          # only the 89 m pair
        assert int(out.le300.iloc[0]) == 1
        assert int(out.le1000.iloc[0]) == 3         # all three pairs


def test_cell_nn_stats_known_answer(ray_session):
    """Two clusters in one cell + a singleton cell: NN values are the
    planted gaps; the singleton cell is excluded."""
    from go_osm_ray.pipelines.spatial import cell_nn_stats
    # cell r7 spans 2.8125 deg; points at lon 10.0/10.001 pair up
    # (~111 m), the far point at 11.0 has NN ~ the cluster (~111 km)
    t = _pts_table([10.0, 10.001, 11.0, 50.0], [0.0, 0.0, 0.0, 0.0])
    out = cell_nn_stats(ray.data.from_arrow(t), res=7).to_pandas()
    assert len(out) == 1                            # singleton excluded
    r = out.iloc[0]
    assert int(r.n) == 3
    assert abs(r.nn_min3 - 111.195) < 0.01          # 0.001 deg arc
    assert r.nn_max3 > 100000                       # far point's NN


def test_events_concurrency_tie_rule(ray_session):
    """Half-open intervals: an interval starting exactly when another
    ends does NOT overlap it (end processed before start)."""
    from go_osm_ray.pipelines.relq import events_concurrency
    base = np.datetime64("2025-01-01T00:00:00", "us")
    # dur = 60 + floor(value) seconds
    t = pa.table({
        "ts": pa.array([base, base + np.timedelta64(60, "s"),
                        base + np.timedelta64(30, "s")]),
        "event_type": pa.array(["a", "a", "b"]),
        "value": pa.array([0.5, 0.5, 0.5])})
    out = events_concurrency(ray.data.from_arrow(t)).to_pandas() \
        .set_index("event_type")
    assert int(out.loc["a", "peak"]) == 1     # back-to-back, no overlap
    assert int(out.loc["a", "n_events"]) == 2
    assert int(out.loc["b", "peak"]) == 1


def test_events_concurrency_overlap(ray_session):
    from go_osm_ray.pipelines.relq import events_concurrency
    base = np.datetime64("2025-01-01T00:00:00", "us")
    t = pa.table({
        "ts": pa.array([base, base + np.timedelta64(10, "s"),
                        base + np.timedelta64(20, "s")]),
        "event_type": pa.array(["a"] * 3),
        "value": pa.array([0.0, 0.0, 0.0])})   # 60 s each
    out = events_concurrency(ray.data.from_arrow(t)).to_pandas()
    assert int(out.peak.iloc[0]) == 3


def test_raster_contour_single_pixel(ray_session):
    """One occupied pixel (n=1): 4 corner-cut cells at level 1, each a
    single diagonal; higher levels see an empty field."""
    from go_osm_ray.pipelines.raster import rasterize_tiles, raster_contour
    t = _pts_table([10.0], [20.0])
    r = rasterize_tiles(ray.data.from_arrow(t), z=10, grid=64)
    out = raster_contour(r, z=10, grid=64).to_pandas().set_index("level")
    assert int(out.loc[1, "n_cells"]) == 4
    assert int(out.loc[1, "n_segments"]) == 4
    assert int(out.loc[1, "n_diag"]) == 4
    assert abs(out.loc[1, "len6"] - 4 * 0.7071067811865476) < 1e-6
    assert int(out.loc[4, "n_segments"]) == 0
    assert int(out.loc[16, "n_segments"]) == 0


def test_part_top_supplier_tie_rule(ray_session):
    """Equal revenue -> smallest suppkey wins; cross-block partials of
    the same (part, supp) re-sum before the argmax."""
    from go_osm_ray.pipelines.relq import part_top_supplier
    t = pa.table({
        "l_partkey": pa.array([1, 1, 1, 1], pa.int64()),
        "l_suppkey": pa.array([7, 3, 3, 9], pa.int64()),
        "l_extendedprice": pa.array([10.0, 6.0, 4.0, 9.0])})
    out = part_top_supplier(
        ray.data.from_arrow(t).repartition(4)).to_pandas()
    assert len(out) == 1
    assert int(out.s_best.iloc[0]) == 3      # 3 ties 7 at 1000c, 3 < 7
    assert int(out.value_cents.iloc[0]) == 1000


def test_events_late_arrivals_watermark(ray_session):
    """Arrival order = event_id: a 2h-stale event after a fresh one is
    late; the first event never is; carry crosses bucket boundaries."""
    from go_osm_ray.pipelines.relq import events_late_arrivals
    base = np.datetime64("2025-01-01T12:00:00", "us")
    ts = [base,
          base - np.timedelta64(7200, "s"),   # 2h older than watermark
          base + np.timedelta64(60, "s"),
          base - np.timedelta64(1800, "s")]   # only 30min stale: on time
    t = pa.table({
        "event_id": pa.array([100, 9000, 17000, 25000], pa.int64()),
        "ts": pa.array(ts),
        "event_type": pa.array(["a"] * 4)})
    out = events_late_arrivals(
        ray.data.from_arrow(t).repartition(3),
        threshold_s=3600, bucket=8192).to_pandas()
    assert int(out.n_events.iloc[0]) == 4
    assert int(out.n_late.iloc[0]) == 1
    assert int(out.sum_late_s.iloc[0]) == 7200
