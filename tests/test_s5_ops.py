"""Session-5 ops: way_triangles (open-wedge discrimination the all-
clique synthetic fixture cannot provide), audience_overlap partition
invariance, morans_i analytic check on a hand lattice."""

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _ways(rows):
    return ray.data.from_arrow(pa.table({
        "id": pa.array([r[0] for r in rows], pa.int64()),
        "refs": pa.array([r[1] for r in rows], pa.list_(pa.int64())),
    }))


import pytest


@pytest.mark.parametrize("threshold", [4_000_000, 0])
def test_way_triangles_open_wedges(ray_session, threshold):
    """Path w1-w2-w3 has one OPEN wedge (no triangle); the 3-clique has
    exactly one. A kernel that skipped the closing-edge check would
    report 4 triangles here. Runs BOTH physical plans: broadcast
    small-side (threshold high) and fully partitioned (threshold 0)."""
    from go_osm_ray.pipelines.osm import way_triangles
    ways = _ways([
        (1, [1, 2]), (2, [2, 3]), (3, [3, 4]),      # path: 2 edges, 1 wedge
        (4, [100, 5]), (5, [100, 6]), (6, [100, 7]),  # 3-clique
        (7, [50]),                                    # isolated: excluded
    ])
    out = way_triangles(ways, num_parts=4,
                        broadcast_threshold=threshold).take_all()[0]
    assert out["n_nodes"] == 6
    assert out["n_edges"] == 5
    assert out["n_wedges"] == 4
    assert out["n_triangles"] == 1
    assert out["clustering"] == 0.75


def test_way_triangles_two_cliques_bridge(ray_session):
    """Two 4-cliques sharing one bridge way: C(4,3)*2 = 8 triangles;
    bridge creates open wedges so clustering < 1."""
    from go_osm_ray.pipelines.osm import way_triangles
    rows = [(i, [100, i]) for i in range(1, 5)]       # clique A: ways 1-4
    rows += [(i, [200, i]) for i in range(11, 15)]    # clique B: ways 11-14
    rows += [(99, [4, 11])]                           # bridge way 99
    out = way_triangles(_ways(rows), num_parts=4).take_all()[0]
    # edges: 6 + 6 + 2 (99-4, 99-11)
    assert out["n_edges"] == 14
    assert out["n_triangles"] == 8


def test_audience_overlap_partition_invariance(ray_session):
    from go_osm_ray.pipelines.relq import audience_overlap
    rng = np.random.default_rng(7)
    n = 5000
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 300, n), pa.int64()),
        "event_type": pa.array(
            np.array(["a", "b", "c"])[rng.integers(0, 3, n)]),
    })
    outs = []
    for parts in (1, 7):
        ds = ray.data.from_arrow([t.slice(0, 1), t.slice(1)])
        res = audience_overlap(ds, num_parts=parts).take_all()
        outs.append(sorted((r["type_a"], r["type_b"], r["n_both"],
                            r["users_a"], r["users_b"], r["jaccard"])
                           for r in res))
    assert outs[0] == outs[1]
    # cross-check one pair brute force
    ua = {u for u, e in zip(t["user_id"].to_pylist(),
                            t["event_type"].to_pylist()) if e == "a"}
    ub = {u for u, e in zip(t["user_id"].to_pylist(),
                            t["event_type"].to_pylist()) if e == "b"}
    row = [r for r in outs[0] if r[0] == "a" and r[1] == "b"][0]
    assert row[2] == len(ua & ub)
    assert row[3] == len(ua) and row[4] == len(ub)


def test_morans_i_checkerboard(ray_session):
    """Perfect checkerboard of counts 1/3 on a 4x4 block of cells gives
    strongly negative I; verify against a direct scalar computation."""
    from go_osm_ray.pipelines.spatial import morans_i
    from go_osm_ray.geo import morton

    # place points at cell centres of a 4x4 block at res 7 (tile size
    # 360/128 deg in lon); counts alternate 1 and 3 like a checkerboard
    step = 360.0 / 128
    pts_lon, pts_lat = [], []
    for i in range(4):
        for j in range(4):
            c = 1 if (i + j) % 2 == 0 else 3
            # exact slippy tile (64+i, 60+j) centre via inverse Mercator
            lat_c = np.degrees(np.arctan(
                np.sinh(np.pi * (1.0 - 2.0 * (60 + j + 0.5) / 128))))
            for _ in range(c):
                pts_lon.append(-180.0 + (64 + i + 0.5) * step)
                pts_lat.append(lat_c)
    lon = np.array(pts_lon)
    lat = np.array(pts_lat)
    phash = morton.encode_phash(lon, lat, np.zeros(len(lon), np.uint64))
    ds = ray.data.from_arrow(pa.table({"phash": pa.array(phash)}))
    out = morans_i(ds, res=7).take_all()[0]
    assert out["n_cells"] == 16
    assert out["morans_i"] < -0.5


def test_part_skyline_ties(ray_session):
    """Equal (price, size) duplicates both survive (neither strictly
    dominates); equal price with smaller size is dominated; the
    running-max scan must respect strictness on both axes."""
    import pyarrow as pa

    from go_osm_ray.pipelines.relq import part_skyline
    t = pa.table({
        "p_partkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "p_retailprice": pa.array([10.0, 10.0, 10.0, 5.0, 5.0, 20.0]),
        "p_size": pa.array([50, 50, 40, 30, 30, 60], pa.int32()),
    })
    ds = ray.data.from_arrow([t.slice(0, 2), t.slice(2)])
    rows = sorted(r["p_partkey"] for r in part_skyline(ds).take_all())
    # 3 dominated by 1/2 (same price, smaller size); 6 undominated (max
    # size); 4,5 undominated twins (cheapest); 1,2 undominated twins
    assert rows == [1, 2, 4, 5, 6]


def test_cell_compact_full_block(ray_session):
    """A fully occupied 4x4 block of r9 cells compacts to ONE r7 cell
    (n_leaves=16); a stray leaf stays at r9."""
    from go_osm_ray.geo import morton
    from go_osm_ray.pipelines.spatial import cell_compact

    step9 = 360.0 / 512
    lons, lats = [], []
    for xi in range(256, 260):
        for yi in range(240, 244):
            lat_c = np.degrees(np.arctan(
                np.sinh(np.pi * (1.0 - 2.0 * (yi + 0.5) / 512))))
            lons.append(-180.0 + (xi + 0.5) * step9)
            lats.append(lat_c)
    # stray leaf far away
    lons.append(10.0 + 0.5 * step9)
    lats.append(-40.0)
    phash = morton.encode_phash(np.array(lons), np.array(lats),
                                np.zeros(len(lons), np.uint64))
    ds = ray.data.from_arrow(pa.table({"phash": pa.array(phash)}))
    rows = cell_compact(ds).take_all()
    by_res = {}
    for r in rows:
        by_res.setdefault(r["cell_res"], []).append(r)
    assert len(by_res.get(7, [])) == 1
    assert by_res[7][0]["n_leaves"] == 16
    assert len(by_res.get(9, [])) == 1          # the stray
    assert 8 not in by_res


def test_events_mau_interval_split(ray_session):
    """Users with activity gaps > window must SPLIT coverage intervals;
    the 30-day synthetic fixture never exercises that branch."""
    from go_osm_ray.pipelines.relq import events_mau
    day = np.datetime64("2020-01-01", "us")
    D = np.timedelta64(1, "D").astype("timedelta64[us]")
    # user 1 active day 0 and day 60 (gap 60 > 27 -> split);
    # user 2 active day 0 and day 20 (gap 20 -> merged interval)
    rows = [(1, 0), (1, 60), (2, 0), (2, 20)]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([day + r[1] * D for r in rows]),
    })
    out = {r["day"].strftime("%j"): r["mau"]
           for r in events_mau(ray.data.from_arrow(t), window_days=28,
                               num_parts=3).take_all()}
    # active days: 0 (both users), 20 (u2), 60 (u1 only)
    assert out["001"] == 2          # day 0: both
    assert out["021"] == 2          # day 20: u1 (day0 in window), u2
    assert out["061"] == 1          # day 60: only u1's second burst


def test_way_kcore_structure(ray_session):
    """5-clique -> core 4; path -> core 1; isolated -> core 0; answers
    identical at different partition counts."""
    from go_osm_ray.pipelines.osm import way_kcore
    rows = [(i, [100, i]) for i in range(1, 6)]       # 5-clique (node 100)
    rows += [(10, [1, 11]), (11, [11, 12]), (12, [12, 13])]  # path 10-11-12
    rows += [(99, [777])]                             # isolated
    for parts in (2, 5):
        out = {r["way_id"]: r["core"]
               for r in way_kcore(_ways(rows), num_parts=parts).take_all()}
        assert all(out[i] == 4 for i in range(1, 6)), out
        assert out[11] == 1 and out[12] == 1
        # way 10 shares node 1 with way 1 (ref 1 appears in way 1's
        # refs) and node 11 with way 11 -> degree 2, but peels at 1
        assert out[10] == 1
        assert out[99] == 0


def test_segment_crossings_planted(ray_session):
    """Two crossing segments (X shape) count once; touching at a shared
    endpoint (T shape) is NOT a proper crossing; result invariant to
    cell resolution (owner-cell dedup)."""
    from go_osm_ray.pipelines.spatial import segment_crossings
    nodes = pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "lon": pa.array([0.0, 1.0, 0.0, 1.0, 2.0, 3.0, 2.5]),
        "lat": pa.array([0.0, 1.0, 1.0, 0.0, 0.0, 0.0, 1.0]),
    })
    ways = pa.table({
        "id": pa.array([10, 11, 12, 13], pa.int64()),
        "refs": pa.array([[1, 2], [3, 4],      # X: proper crossing
                          [5, 6], [7, 6]],     # T: shared endpoint 6
                         pa.list_(pa.int64())),
    })
    for res in (10, 14, 16):
        out = segment_crossings(ray.data.from_arrow(nodes),
                                ray.data.from_arrow(ways),
                                res=res).take_all()[0]
        assert out["n_segments"] == 4
        assert out["n_crossings"] == 1, (res, out)


def test_exact_quantiles_matches_numpy(ray_session):
    """ceil(n*p)-1 order statistic against a direct sorted lookup on an
    adversarial distribution (duplicates + outliers)."""
    from go_osm_ray.pipelines.relq import exact_quantiles
    rng = np.random.default_rng(3)
    x = np.concatenate([rng.integers(0, 50, 5000).astype(np.float64),
                        np.full(1000, 7.0), [1e9, -1e9]])
    t = pa.table({"l_extendedprice": pa.array(x)})
    ds = ray.data.from_arrow([t.slice(0, 17), t.slice(17)])
    out = {r["p"]: r["value"]
           for r in exact_quantiles(ds, ps=(0.25, 0.5, 0.99)).take_all()}
    xs = np.sort(x)
    for p in (0.25, 0.5, 0.99):
        assert out[p] == xs[int(np.ceil(len(x) * p)) - 1], p
