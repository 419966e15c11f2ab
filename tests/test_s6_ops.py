"""Session-6 ops: cell_diameter's BIG-cell pruned kernel (the sf0.001 /
sf0.01 parity gates never produce a >128-point cell, so the BLAS-pruned
path needs its own exactness check against the direct all-pairs max),
snap_to_segment's radius boundary + tie rule, cell_kde mass check."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data


def _direct_diam(lon, lat):
    from go_osm_ray.pipelines.osm import EARTH_R_M
    d2r = np.pi / 180.0
    p = lat[:, None] * d2r
    q = lat[None, :] * d2r
    sdp = np.sin((q - p) / 2.0)
    sdl = np.sin((lon[None, :] - lon[:, None]) * d2r / 2.0)
    a = np.minimum(sdp * sdp + np.cos(p) * np.cos(q) * sdl * sdl, 1.0)
    return float((2.0 * EARTH_R_M * np.arcsin(np.sqrt(a))).max())


def test_cell_diameter_big_cell_exact(ray_session):
    """A 700-point cell (forces the tiled BLAS-pruned path) must report
    exactly the direct all-pairs haversine max, including when the two
    farthest pairs are nearly tied (planted twin extremes)."""
    from go_osm_ray.pipelines.spatial import cell_diameter
    from go_osm_ray.util import round_half_away
    rng = np.random.RandomState(7)
    lon = -77.0 + rng.uniform(0, 0.5, 700)
    lat = 38.3 + rng.uniform(0, 0.4, 700)
    # twin near-tied extreme pairs straddling the cloud
    lon[0], lat[0] = -77.0, 38.3
    lon[1], lat[1] = -76.5, 38.7
    lon[2], lat[2] = -77.0 + 1e-9, 38.3
    lon[3], lat[3] = -76.5 + 1e-9, 38.7
    pts = ray.data.from_arrow(pa.table({
        "image_id": pa.array([f"i{k}" for k in range(len(lon))]),
        "lon": pa.array(lon), "lat": pa.array(lat)}))
    out = cell_diameter(pts, res=7).take_all()
    # all points land in one res-7 cell by construction
    assert len(out) == 1 and out[0]["n"] == 700
    assert out[0]["diam_m3"] == float(
        round_half_away(np.array([_direct_diam(lon, lat)]), 3)[0])


def test_cell_diameter_identical_points(ray_session):
    """A big cell of all-identical points must report diameter 0."""
    from go_osm_ray.pipelines.spatial import cell_diameter
    n = 300
    pts = ray.data.from_arrow(pa.table({
        "image_id": pa.array([f"i{k}" for k in range(n)]),
        "lon": pa.array(np.full(n, -77.0)),
        "lat": pa.array(np.full(n, 38.8))}))
    out = cell_diameter(pts, res=7).take_all()
    assert len(out) == 1
    assert out[0]["n"] == n and out[0]["diam_m3"] == 0.0


def _layer(nodes_rows, ways_rows):
    nodes = ray.data.from_arrow(pa.table({
        "id": pa.array([r[0] for r in nodes_rows], pa.int64()),
        "lon": pa.array([r[1] for r in nodes_rows], pa.float64()),
        "lat": pa.array([r[2] for r in nodes_rows], pa.float64())}))
    ways = ray.data.from_arrow(pa.table({
        "id": pa.array([r[0] for r in ways_rows], pa.int64()),
        "refs": pa.array([r[1] for r in ways_rows], pa.list_(pa.int64()))}))
    return nodes, ways


def test_snap_radius_and_tie_rule(ray_session):
    """In-radius points snap to the lowest-(way, seq) segment among
    exact ties; out-of-radius points are dropped; a point exactly ON a
    segment reports distance 0."""
    from go_osm_ray.pipelines.spatial import (build_segment_cells,
                                              snap_to_segment)
    # two identical overlapping segments owned by ways 5 and 9 -> any
    # snap to them ties exactly; tie rule must pick way 5, seq 1
    nodes, ways = _layer(
        [(1, 0.0, 0.0), (2, 0.001, 0.0)],
        [(9, [1, 2]), (5, [1, 2])])
    layer = build_segment_cells(nodes, ways)
    imgs = ray.data.from_arrow(pa.table({
        "image_id": pa.array(["on", "near", "far"]),
        "lon": pa.array([0.0005, 0.0005, 1.0]),
        "lat": pa.array([0.0, 0.004, 0.0])}))
    out = {r["image_id"]: r for r in
           snap_to_segment(imgs, layer, max_snap_deg=0.005).take_all()}
    assert set(out) == {"on", "near"}          # "far" dropped by radius
    assert out["on"]["way_id"] == 5 and out["on"]["seq"] == 1
    assert out["on"]["dist_deg7"] == 0.0
    assert out["near"]["way_id"] == 5
    assert out["near"]["dist_deg7"] == 0.004


def test_snap_matches_brute_force(ray_session):
    """Random points vs a random multi-way layer: the bucketed probe
    must equal the brute-force scan for every in-radius point."""
    from go_osm_ray.pipelines.spatial import (build_segment_cells,
                                              snap_to_segment)
    rng = np.random.RandomState(3)
    nid, nodes_rows, ways_rows = 1, [], []
    for w in range(40):
        k = rng.randint(2, 6)
        xs = rng.uniform(-0.05, 0.05, k)
        ys = rng.uniform(-0.05, 0.05, k)
        refs = []
        for x, yv in zip(xs, ys):
            nodes_rows.append((nid, float(x), float(yv)))
            refs.append(nid)
            nid += 1
        ways_rows.append((w + 1, refs))
    nodes, ways = _layer(nodes_rows, ways_rows)
    layer = build_segment_cells(nodes, ways)
    px = rng.uniform(-0.06, 0.06, 200)
    py = rng.uniform(-0.06, 0.06, 200)
    imgs = ray.data.from_arrow(pa.table({
        "image_id": pa.array([f"p{k}" for k in range(200)]),
        "lon": pa.array(px), "lat": pa.array(py)}))
    T = 0.005
    got = {r["image_id"]: (r["way_id"], r["seq"], r["dist_deg7"]) for r in
           snap_to_segment(imgs, layer, max_snap_deg=T).take_all()}

    # brute force in the same float expression order
    segs = []
    coord = {i: (x, yv) for i, x, yv in nodes_rows}
    for w, refs in ways_rows:
        for s in range(len(refs) - 1):
            ax, ay = coord[refs[s]]
            bx, by = coord[refs[s + 1]]
            segs.append((w, s + 1, ax, ay, bx, by))
    exp = {}
    for k in range(200):
        best = None
        for (w, s, ax, ay, bx, by) in sorted(segs)[:]:
            dx, dy = bx - ax, by - ay
            l2 = dx * dx + dy * dy
            rx, ry = px[k] - ax, py[k] - ay
            t = min(max((rx * dx + ry * dy) / l2, 0.0), 1.0) \
                if l2 > 0.0 else 0.0
            ex, ey = rx - t * dx, ry - t * dy
            d2 = ex * ex + ey * ey
            if best is None or (d2, w, s) < best:
                best = (d2, w, s)
        if best is not None and best[0] <= T * T:
            from go_osm_ray.util import round_half_away
            exp[f"p{k}"] = (best[1], best[2], float(round_half_away(
                np.array([np.sqrt(best[0])]), 7)[0]))
    assert got == exp


def test_cell_kde_masses(ray_session):
    """A single point yields kernel weight exactly 1 at a center it
    coincides with... centers never coincide with arbitrary points, so
    instead: total kde over cells equals the scalar 9-offset sum, and
    every reported cell is strictly within the radius."""
    from go_osm_ray.pipelines.spatial import cell_kde
    rng = np.random.RandomState(11)
    lon = rng.uniform(-1, 1, 500)
    lat = rng.uniform(-1, 1, 500)
    pts = ray.data.from_arrow(pa.table({
        "image_id": pa.array([f"i{k}" for k in range(500)]),
        "lon": pa.array(lon), "lat": pa.array(lat)}))
    out = cell_kde(pts).take_all()
    n_side, cw, ch, r2 = 4096, 360.0 / 4096, 180.0 / 4096, 0.05 * 0.05
    total, nsum = 0.0, 0
    gx = np.floor((lon + 180.0) / 360.0 * n_side)
    gy = np.floor((lat + 90.0) / 180.0 * n_side)
    for k in range(500):
        for dx in (-1.0, 0.0, 1.0):
            for dy in (-1.0, 0.0, 1.0):
                cx = (gx[k] + dx + 0.5) * cw - 180.0
                cy = (gy[k] + dy + 0.5) * ch - 90.0
                d2 = (lon[k] - cx) ** 2 + (lat[k] - cy) ** 2
                if d2 < r2:
                    w = 1.0 - d2 / r2
                    total += w * w
                    nsum += 1
    assert nsum == sum(r["n"] for r in out)
    assert abs(total - sum(r["kde6"] for r in out)) < 5e-3
