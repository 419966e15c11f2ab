"""Session-4 ops: semdedup, aspect_bucket_pack, line_dedup,
bbox_overlap_join, events_pivot/orders_rollup, kcenter_sample.

Driver-grade value gates live in test_oracle_parity.py; these pin the
properties the oracle cannot see — partition invariance (the same
answer under adversarial block splits), exactly-once pair emission in
the owner-cell dedup, chunked-slab equivalence in semdedup, and the
deterministic traversal order of the coreset sampler.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data


def _split(t: pa.Table, n: int):
    """Dataset from n adversarially uneven slices of one table."""
    cuts = np.linspace(0, t.num_rows, n + 1).astype(int)
    if n > 1:
        cuts[1] = min(1, t.num_rows)  # force a 1-row first block
    blocks = [t.slice(a, b - a) for a, b in zip(cuts[:-1], cuts[1:])
              if b > a]
    return ray.data.from_arrow(blocks)


def _collect(ds) -> pa.Table:
    blocks = [b.replace_schema_metadata(None)
              for b in ray.get(ds.to_arrow_refs())]
    blocks = [b for b in blocks if b.num_rows]
    return pa.concat_tables(blocks) if blocks else None


# ------------------------------------------------------------- semdedup

def _emb_table(n=240, d=16, dup_every=10):
    i = np.arange(n, dtype=np.int64)
    rs = ((i[:, None] * 2654435761 + np.arange(d)[None, :] * 97) % 1000) \
        / 500.0 - 1.0
    x = rs.astype(np.float64)
    # plant exact duplicates of every dup_every-th row under larger ids
    m = (i % dup_every) == 0
    ids = np.concatenate([i, i[m] + 1_000_000])
    vecs = np.vstack([x, x[m]])
    return pa.table({"vec_id": pa.array(ids),
                     "embedding": pa.array(list(vecs.astype(np.float32)),
                                           pa.list_(pa.float32()))})


def test_semdedup_drops_planted_exact_dups(ray_session):
    from go_osm_ray.pipelines.vectors import semdedup
    t = _emb_table()
    out = _collect(semdedup(ray.data.from_arrow(t), n_clusters=4,
                            threshold=0.999999))
    kept = dict(zip(out["vec_id"].to_pylist(), out["kept"].to_pylist()))
    assert len(kept) == t.num_rows
    for vid in range(0, 240, 10):
        assert kept[vid], "original must survive"
        assert not kept[vid + 1_000_000], "planted exact dup must drop"


def test_semdedup_partition_and_chunk_invariant(ray_session):
    from go_osm_ray.pipelines.vectors import semdedup
    t = _emb_table(n=120)
    a = _collect(semdedup(_split(t, 1), n_clusters=4, chunk=7)) \
        .sort_by([("vec_id", "ascending")])
    b = _collect(semdedup(_split(t, 9), n_clusters=4, chunk=1024)) \
        .sort_by([("vec_id", "ascending")])
    assert a.equals(b)


# ---------------------------------------------------- aspect_bucket_pack

def test_aspect_bucket_cuts_are_nearest_log_ratio():
    from go_osm_ray.pipelines.images import (ASPECT_BUCKETS,
                                             assign_aspect_bucket)
    rng = np.random.RandomState(7)
    w = rng.randint(64, 4096, 500).astype(np.int64)
    h = rng.randint(64, 4096, 500).astype(np.int64)
    got = assign_aspect_bucket(w, h)
    lr = np.log(w / h)
    want = np.argmin(np.abs(
        lr[:, None] - np.log([bw / bh for bw, bh in ASPECT_BUCKETS])), axis=1)
    assert (got == want).all()


def test_aspect_bucket_pack_is_dense_and_ordered(ray_session):
    from go_osm_ray.pipelines.images import aspect_bucket_pack
    n = 500
    i = np.arange(n)
    t = pa.table({
        "image_id": pa.array([f"img{v:012d}" for v in i]),
        "w": pa.array((16 + (i % 3) * 8).astype(np.int32)),
        "h": pa.array((16 + ((i // 3) % 3) * 8).astype(np.int32)),
    })
    out = _collect(aspect_bucket_pack(_split(t, 7), batch_size=8)) \
        .sort_by([("bucket", "ascending"), ("batch_idx", "ascending"),
                  ("slot", "ascending")])
    df = out.to_pandas()
    for b, g in df.groupby("bucket"):
        ranks = g.batch_idx.to_numpy() * 8 + g.slot.to_numpy()
        assert (ranks == np.arange(len(g))).all(), "ranks dense per bucket"
        assert g.image_id.is_monotonic_increasing, "rank order = id order"


# ------------------------------------------------------------ line_dedup

def test_line_dedup_rewrite_roundtrip(ray_session):
    from go_osm_ray.pipelines.spans import line_dedup
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "a b c d e f g h i j k l",     # chunk0 dup with doc2
            "a b c d e f g h i j z z z",   # chunk0 dup with doc1
            "unique words only here",
        ]),
    })
    out = _collect(line_dedup(ray.data.from_arrow(docs), k=10)) \
        .sort_by([("doc_id", "ascending")])
    assert out["n_chunks"].to_pylist() == [2, 2, 1]
    assert out["n_kept"].to_pylist() == [1, 1, 1]
    assert out["text_clean"].to_pylist() == ["k l", "z z z",
                                             "unique words only here"]


def test_line_dedup_partition_invariant(ray_session):
    from go_osm_ray.pipelines.spans import line_dedup
    import pyarrow.parquet as pq
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    a = _collect(line_dedup(_split(t, 1))).sort_by([("doc_id", "ascending")])
    b = _collect(line_dedup(_split(t, 11))).sort_by([("doc_id", "ascending")])
    assert a.equals(b)


# ----------------------------------------------------- bbox_overlap_join

def test_bbox_overlap_exactly_once_across_cells(ray_session):
    """Two bboxes overlapping across MANY grid cells must emit their
    pair exactly once (owner-cell dedup), including cell-boundary
    straddlers."""
    from go_osm_ray.pipelines.spatial import bbox_overlap_join
    nodes = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "lon": pa.array([0.001, 0.099, 0.05, 0.121]),
        "lat": pa.array([0.001, 0.099, 0.05, 0.121]),
    })
    # way 10 spans cells; way 20 overlaps it; way 30 is disjoint
    ways = pa.table({
        "id": pa.array([10, 20, 30], pa.int64()),
        "refs": pa.array([[1, 2], [3, 4], [4, 4]], pa.list_(pa.int64())),
    })
    out = _collect(bbox_overlap_join(
        ray.data.from_arrow(nodes), ray.data.from_arrow(ways),
        cell_deg=0.02))
    pairs = sorted(zip(out["a"].to_pylist(), out["b"].to_pylist()))
    assert pairs == [(10, 20), (20, 30)]
    assert len(pairs) == len(set(pairs))


def test_bbox_overlap_partition_invariant(ray_session):
    from go_osm_ray.pipelines.spatial import bbox_overlap_join
    from go_osm_ray import datagen
    import pyarrow.parquet as pq
    p = datagen.ensure_tables(0.001)
    nodes = pq.read_table(p["osm_nodes"], columns=["id", "lon", "lat"])
    ways = pq.read_table(p["osm_ways"], columns=["id", "refs"])
    a = _collect(bbox_overlap_join(_split(nodes, 1), _split(ways, 1)))
    b = _collect(bbox_overlap_join(_split(nodes, 5), _split(ways, 7),
                                   cell_deg=0.05, num_parts=5))
    key = [("a", "ascending"), ("b", "ascending")]
    assert a.sort_by(key).equals(b.sort_by(key))


# ------------------------------------------------------- kcenter_sample

def test_kcenter_deterministic_and_decreasing(ray_session):
    from go_osm_ray.pipelines.vectors import kcenter_sample
    t = _emb_table(n=150)
    a = kcenter_sample(_split(t, 1), k=8)
    b = kcenter_sample(_split(t, 13), k=8)
    assert a.equals(b), "traversal must not depend on block layout"
    d = a["dist6"].to_pylist()
    assert d[0] == 2.0
    assert all(x >= y - 1e-9 for x, y in zip(d[1:], d[2:])), \
        "selection-time distances are non-increasing"


# ---------------------------------------------------- cell_convex_hull

def _pts_table(n=400, seed=7):
    rs = np.random.RandomState(seed)
    # three dense clusters so several cells hold many points, plus a
    # collinear run and exact duplicates inside one cell
    lon = np.concatenate([rs.uniform(2.0, 2.4, n),
                          rs.uniform(-70.1, -70.0, n // 2),
                          np.linspace(30.0, 30.001, 16),   # collinear (lat const)
                          np.full(8, 2.2)])                # duplicates
    lat = np.concatenate([rs.uniform(48.0, 48.3, n),
                          rs.uniform(-33.1, -33.0, n // 2),
                          np.full(16, 10.5),
                          np.full(8, 48.15)])
    return pa.table({"lon": pa.array(lon), "lat": pa.array(lat)})


def test_strict_hull_excludes_collinear_boundary_points():
    from go_osm_ray.pipelines.spatial import _strict_hull
    # unit square with edge midpoints and center: strict hull = 4 corners
    x = np.array([0.0, 1.0, 1.0, 0.0, 0.5, 1.0, 0.5, 0.0, 0.5])
    y = np.array([0.0, 0.0, 1.0, 1.0, 0.0, 0.5, 1.0, 0.5, 0.5])
    h = _strict_hull(x, y)
    assert len(h) == 4
    assert sorted(zip(x[h], y[h])) == [(0, 0), (0, 1), (1, 0), (1, 1)]
    # all-collinear: two endpoints survive
    x = np.linspace(0, 1, 9)
    h = _strict_hull(x, 2.0 * x)
    assert len(h) == 2


def test_cell_convex_hull_partition_invariant(ray_session):
    from go_osm_ray.pipelines.spatial import cell_convex_hull
    t = _pts_table()
    ref = None
    for nblocks in (1, 3, 17):
        out = _collect(cell_convex_hull(_split(t, nblocks), res=7)) \
            .sort_by("cell")
        if ref is None:
            ref = out
        else:
            assert out.equals(ref), f"split into {nblocks} blocks diverged"
    # sanity: total points conserved, hull never larger than the cell count
    assert int(pa.compute.sum(ref["n_pts"]).as_py()) == t.num_rows
    assert all(h <= n for h, n in zip(ref["n_hull"].to_pylist(),
                                      ref["n_pts"].to_pylist()))


def test_cell_convex_hull_matches_scalar_jarvis(ray_session):
    from go_osm_ray.pipelines.spatial import cell_convex_hull
    from go_osm_ray.pyoracle import _jarvis_strict
    from go_osm_ray.geo import tiles
    import math
    t = _pts_table(seed=11)
    out = _collect(cell_convex_hull(_split(t, 5), res=7)).sort_by("cell")
    lon = t["lon"].to_numpy()
    lat = t["lat"].to_numpy()
    cells = tiles.cell_id(lon, lat, 7)
    for cell, nh, a6 in zip(out["cell"].to_pylist(),
                            out["n_hull"].to_pylist(),
                            out["area6"].to_pylist()):
        m = cells == cell
        hull = _jarvis_strict(sorted(set(zip(lon[m], lat[m]))))
        assert len(hull) == nh
        if len(hull) >= 3:
            area = abs(math.fsum(
                px * qy - qx * py
                for (px, py), (qx, qy) in zip(hull, hull[1:] + hull[:1]))) / 2
        else:
            area = 0.0
        assert round(abs(a6 - area), 5) == 0


# -------------------------------------------------------- grid_dbscan

def _cell_center(x, y, res=7):
    """lon/lat landing exactly in slippy cell (x, y) at res."""
    import math
    n = 1 << res
    lon = (x + 0.5) / n * 360.0 - 180.0
    yn = (y + 0.5) / n
    lat = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * yn))))
    return lon, lat


def test_grid_dbscan_planted_geometry(ray_session):
    from go_osm_ray.pipelines.spatial import grid_dbscan
    from go_osm_ray.geo import tiles
    # chain A: cells (40,40),(41,41),(42,40) — diagonal adjacency merges;
    # isolated B: (50,50); sparse C: (60,60) with 1 pt (< min_pts, dropped)
    plan = [((40, 40), 3), ((41, 41), 2), ((42, 40), 5),
            ((50, 50), 4), ((60, 60), 1)]
    lon, lat = [], []
    for (x, y), k in plan:
        lo, la = _cell_center(x, y)
        lon += [lo] * k
        lat += [la] * k
    t = pa.table({"lon": pa.array(lon, pa.float64()),
                  "lat": pa.array(lat, pa.float64())})
    out = _collect(grid_dbscan(_split(t, 4), res=7, min_pts=2)) \
        .sort_by("cell")
    cells = {c: (cl, n) for c, cl, n in zip(out["cell"].to_pylist(),
                                            out["cluster"].to_pylist(),
                                            out["n_pts"].to_pylist())}
    def cid(x, y):
        return int(tiles.cell_id(np.array([_cell_center(x, y)[0]]),
                                 np.array([_cell_center(x, y)[1]]), 7)[0])
    assert len(cells) == 4  # (60,60) dropped below min_pts
    a = cid(40, 40)
    assert cells[cid(40, 40)] == (a, 3)
    assert cells[cid(41, 41)][0] == a  # diagonal merge
    assert cells[cid(42, 40)][0] == a  # transitive through (41,41)
    assert cells[cid(50, 50)][0] == cid(50, 50)  # isolated singleton


def test_grid_dbscan_partition_invariant(ray_session):
    from go_osm_ray.pipelines.spatial import grid_dbscan
    rs = np.random.RandomState(3)
    # dense blob straddling many adjacent cells + scattered noise
    lon = np.concatenate([rs.uniform(10.0, 13.0, 600),
                          rs.uniform(-120, -100, 100)])
    lat = np.concatenate([rs.uniform(45.0, 47.0, 600),
                          rs.uniform(10, 30, 100)])
    t = pa.table({"lon": pa.array(lon), "lat": pa.array(lat)})
    ref = None
    for nblocks in (1, 7, 23):
        out = _collect(grid_dbscan(_split(t, nblocks), res=9, min_pts=2)) \
            .sort_by("cell")
        if ref is None:
            ref = out
        else:
            assert out.equals(ref), f"{nblocks} blocks diverged"
    # every cluster label is a member cell of its own cluster
    by_cluster = {}
    for c, cl in zip(ref["cell"].to_pylist(), ref["cluster"].to_pylist()):
        by_cluster.setdefault(cl, []).append(c)
    for cl, members in by_cluster.items():
        assert cl == min(members)


# ------------------------------------------------------- events_funnel

def _ev(user, ts_s, ty):
    return (user, np.datetime64("2024-01-01", "us") + np.timedelta64(ts_s, "s"), ty)


def test_events_funnel_greedy_window_semantics(ray_session):
    from go_osm_ray.pipelines.relq import events_funnel
    H = 3600
    rows = [
        # u1 completes: view@0, click@1h, purchase@1.5h  -> dur 5400s
        _ev(1, 0, "view"), _ev(1, H, "click"), _ev(1, H + 1800, "purchase"),
        # u2: click 25h after view -> outside 24h window -> depth 1
        _ev(2, 0, "view"), _ev(2, 25 * H, "click"),
        # u3: click BEFORE the first view -> not counted -> depth 1
        _ev(3, 2 * H, "view"), _ev(3, H, "click"),
        # u4: greedy trap — early click inside window, purchase only
        # within window of a LATER click; greedy anchors at the early
        # click, purchase 30h after it -> depth 2
        _ev(4, 0, "view"), _ev(4, H, "click"), _ev(4, 23 * H, "click"),
        _ev(4, 31 * H, "purchase"),
        # u5: no view at all -> absent
        _ev(5, 0, "click"), _ev(5, H, "purchase"),
        # u6: ties/strictness — click at the same instant as view is NOT
        # strictly after -> depth 1
        _ev(6, 0, "view"), _ev(6, 0, "click"),
    ]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array([r[1] for r in rows],
                                 pa.timestamp("us")),
                  "event_type": pa.array([r[2] for r in rows])})
    got = {}
    for nblocks in (1, 5):
        out = _collect(events_funnel(_split(t, nblocks)))
        cur = {u: (d, m) for u, d, m in zip(out["user_id"].to_pylist(),
                                            out["depth"].to_pylist(),
                                            out["dur_ms"].to_pylist())}
        if got:
            assert cur == got, "partition split diverged"
        got = cur
    assert got == {1: (3, 5400 * 1000), 2: (1, -1), 3: (1, -1),
                   4: (2, -1), 6: (1, -1)}


# -------------------------------------------------- cell_caption_stats

def test_cell_caption_stats_partition_invariant_and_ties(ray_session):
    from go_osm_ray.pipelines.spatial import cell_caption_stats
    from go_osm_ray.geo import morton
    # two cells; cell A has a tie ("b" x2, "a" x2 -> winner "a"), cell B
    # a clear winner; counts must merge exactly across splits
    lon = np.array([2.1, 2.1, 2.1, -70.05, -70.05])
    lat = np.array([48.1, 48.1, 48.1, -33.05, -33.05])
    ph = morton.encode_phash(lon, lat, np.zeros(len(lon), np.int64))
    t = pa.table({"phash": pa.array(ph, pa.int64()),
                  "caption": pa.array(["b a", "a b", "c", "x y x", "x"])})
    ref = None
    for nblocks in (1, 5):
        out = _collect(cell_caption_stats(_split(t, nblocks))).sort_by("cell")
        if ref is None:
            ref = out
        else:
            assert out.equals(ref)
    rows = {r["top_token"]: (r["n_tokens"], r["top_n"])
            for r in ref.to_pylist()}
    assert rows == {"a": (5, 2), "x": (4, 3)}


# ----------------------------------------------------------- knn_classify

def test_knn_classify_vote_and_tie_semantics(ray_session):
    from go_osm_ray.geo import morton
    from go_osm_ray.pipelines.spatial import knn_classify
    # feature layer: 3 "b"-labelled at distance ~1, 2 "a" at ~2 -> "b"
    # wins 3/5; second point sits in an exact 2-2 vote + nearest-"z"
    # tiebreak: among {a, a, z, z, far} the winner is "a" (lex smallest)
    feats = pa.table({
        "id": pa.array(np.arange(10, dtype=np.int64)),
        "lon": pa.array([1.0, -1.0, 0.0, 2.0, -2.0,
                         50.0, 50.0, 52.0, 52.0, 80.0], pa.float64()),
        "lat": pa.array([0.0, 0.0, 1.0, 0.0, 0.0,
                         1.0, -1.0, 1.0, -1.0, 0.0], pa.float64()),
        "label": pa.array(["b", "b", "b", "a", "a",
                           "a", "a", "z", "z", "q"])})
    ref = ray.put(feats)
    ph = morton.encode_phash(np.array([0.0, 51.0]), np.array([0.0, 0.0]),
                             np.zeros(2, np.int64))
    imgs = ray.data.from_arrow(pa.table({
        "image_id": pa.array(["p1", "p2"]),
        "phash": pa.array(ph, pa.int64())}))
    out = {r["image_id"]: (r["label"], r["n_votes"])
           for r in _collect(knn_classify(imgs, ref, concurrency=1)).to_pylist()}
    # morton decode lands on cell centers ~1e-5 deg off the exact points;
    # the vote geometry is far coarser than that
    assert out == {"p1": ("b", 3), "p2": ("a", 2)}


# --------------------------------------------------------- events_retention

def test_events_retention_counts_distinct_days(ray_session):
    from go_osm_ray.pipelines.relq import events_retention
    D = 86400
    rows = [
        # u1: cohort day 0, active days 0 (twice), 1, 3
        _ev(1, 10, "view"), _ev(1, 20, "view"), _ev(1, D + 5, "click"),
        _ev(1, 3 * D + 5, "view"),
        # u2: cohort day 1, active days 1, 3
        _ev(2, D + 50, "view"), _ev(2, 3 * D + 50, "view"),
        # u3: cohort day 0, active day 0 only
        _ev(3, 100, "view"),
    ]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                  "event_type": pa.array([r[2] for r in rows])})
    base = 19723  # days from epoch to 2024-01-01
    ref = None
    for nblocks in (1, 4):
        out = _collect(events_retention(_split(t, nblocks)))
        got = {(c - base, o): n for c, o, n in zip(
            out["cohort_day"].to_pylist(), out["day_offset"].to_pylist(),
            out["n_users"].to_pylist())}
        if ref is None:
            ref = got
        else:
            assert got == ref
    assert ref == {(0, 0): 2, (0, 1): 1, (0, 3): 1, (1, 0): 1, (1, 2): 1}
