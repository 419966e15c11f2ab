import numpy as np

from go_osm_ray.geo.pip import PolygonIndex


def _slow_inside(px, py, xs, ys):
    """Obviously-correct scalar even-odd ray casting (the same edge rule)."""
    inside = False
    for i in range(len(xs) - 1):
        x1, y1, x2, y2 = xs[i], ys[i], xs[i + 1], ys[i + 1]
        if (y1 > py) != (y2 > py):
            if px < (x2 - x1) * (py - y1) / (y2 - y1) + x1:
                inside = not inside
    return inside


def _random_ring(rng, cx, cy, r, n):
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    xs = cx + r * np.cos(ang) * rng.uniform(0.5, 1.0, n)
    ys = cy + r * np.sin(ang) * rng.uniform(0.5, 1.0, n)
    return np.append(xs, xs[0]), np.append(ys, ys[0])


def test_index_matches_slow_oracle():
    rng = np.random.RandomState(42)
    xs_l, ys_l, fids = [], [], []
    for i in range(30):
        xs, ys = _random_ring(rng, rng.uniform(-1, 1), rng.uniform(-1, 1),
                              rng.uniform(0.05, 0.3), rng.randint(3, 10))
        xs_l.append(xs)
        ys_l.append(ys)
        fids.append(100 + i)
    idx = PolygonIndex(np.array(fids), xs_l, ys_l, grid_res=8)
    px = rng.uniform(-1.5, 1.5, 800)
    py = rng.uniform(-1.5, 1.5, 800)
    pi, fid = idx.query(px, py)
    got = set(zip(pi.tolist(), fid.tolist()))
    want = set()
    for p in range(len(px)):
        for g in range(len(fids)):
            if _slow_inside(px[p], py[p], xs_l[g], ys_l[g]):
                want.add((p, fids[g]))
    assert got == want
    assert len(want) > 50  # the test actually exercised hits


def test_empty_and_miss():
    idx = PolygonIndex(np.array([7]), [np.array([0.0, 1.0, 0.5, 0.0])],
                       [np.array([0.0, 0.0, 1.0, 0.0])], grid_res=6)
    pi, fid = idx.query(np.array([5.0]), np.array([5.0]))
    assert len(pi) == 0
    pi, fid = idx.query(np.array([0.5]), np.array([0.25]))
    assert fid.tolist() == [7]


def test_nearest_grid_path_equals_full_scan(ray_session):
    """The r4 grid-pruned NearestFeature must return EXACTLY the tiled
    full scan's answers (including smallest-id tie-breaks and points far
    outside the feature bbox) — the boundary-proof contract."""
    import numpy as np
    import pyarrow as pa
    import ray

    from go_osm_ray.pipelines.spatial import NearestFeature, _exact_scan

    rng = np.random.default_rng(11)
    m = 3000  # above the 512 grid threshold
    fx = rng.uniform(-77.2, -76.9, m)
    fy = rng.uniform(38.7, 39.0, m)
    fid = rng.permutation(m).astype(np.int64)
    # plant exact duplicate coordinates with different ids (tie-break)
    fx[100] = fx[200]; fy[100] = fy[200]
    fx[5] = fx[6]; fy[5] = fy[6]
    t = pa.table({"id": pa.array(fid), "lon": pa.array(fx),
                  "lat": pa.array(fy)})
    nf = NearestFeature(ray.put(t))
    assert nf.grid is not None
    # queries: inside, on bucket edges, far outside the bbox, exact hits
    px = np.concatenate([rng.uniform(-77.2, -76.9, 4000),
                         np.array([-80.0, -76.0, -77.05, fx[0], fx[100]]),
                         rng.uniform(-77.5, -76.6, 500)])
    py = np.concatenate([rng.uniform(38.7, 39.0, 4000),
                         np.array([38.0, 40.0, 38.85, fy[0], fy[100]]),
                         rng.uniform(38.4, 39.3, 500)])
    got = nf.nearest(px, py)
    want = _exact_scan(px, py, nf.fid, nf.fx, nf.fy)
    assert np.array_equal(got, want)


def test_polygon_index_task_matches_dataset_build(ray_session):
    """The one-task direct-parquet build must produce the identical
    polygon layer (ids, vertex arrays, grid) as the Dataset-join build."""
    import numpy as np
    import ray
    import ray.data as rd
    from go_osm_ray import datagen
    from go_osm_ray.pipelines.spatial import (build_polygon_index,
                                              build_polygon_index_task)
    paths = datagen.ensure_tables(0.001)
    nodes = rd.read_parquet(paths["osm_nodes"], columns=["id", "lon", "lat"])
    ways = rd.read_parquet(paths["osm_ways"], columns=["id", "refs"])
    a = build_polygon_index(nodes, ways)
    b = ray.get(build_polygon_index_task(paths["osm_nodes"],
                                         paths["osm_ways"]))
    assert np.array_equal(a.feature_ids, b.feature_ids)
    assert np.array_equal(a.offsets, b.offsets)
    assert np.array_equal(a.vx, b.vx) and np.array_equal(a.vy, b.vy)
    assert a.grid_res == b.grid_res


def test_feature_layer_task_matches_dataset_build(ray_session):
    import ray
    import ray.data as rd
    from go_osm_ray import datagen
    from go_osm_ray.oracle import KNN_FEATURE_KEY
    from go_osm_ray.pipelines.spatial import feature_layer_task, tagged_nodes
    from go_osm_ray.relational import broadcast_table
    paths = datagen.ensure_tables(0.001)
    nodes = rd.read_parquet(paths["osm_nodes"],
                            columns=["id", "lon", "lat", "tags"])
    a = ray.get(broadcast_table(tagged_nodes(nodes, KNN_FEATURE_KEY),
                                ["id", "lon", "lat"]))
    b = ray.get(feature_layer_task(paths["osm_nodes"], KNN_FEATURE_KEY))
    # ROW-SET equality, not row-order: broadcast_table concatenates
    # blocks in streaming-completion order (documented contract — every
    # consumer sorts by id or does membership); a.equals(b) was flaky.
    sa = a.sort_by([("id", "ascending"), ("lon", "ascending")])
    sb = b.sort_by([("id", "ascending"), ("lon", "ascending")])
    assert sa.equals(sb)
