"""Round-5 ops: planted closed forms the parity gates cannot see —
the way_conflate geometric candidate stage on DISJOINT duplicate
geometries (separate imports of the same corridor share zero node
ids), which the r4 shared-node-only candidate generation could never
merge."""

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _osm_ds(ways, nodes):
    wt = pa.table({
        "id": pa.array([w[0] for w in ways], pa.int64()),
        "refs": pa.array([w[1] for w in ways], pa.list_(pa.int64()))})
    nt = pa.table({
        "id": pa.array([n[0] for n in nodes], pa.int64()),
        "lon": pa.array([n[1] for n in nodes], pa.float64()),
        "lat": pa.array([n[2] for n in nodes], pa.float64())})
    return ray.data.from_arrow(wt), ray.data.from_arrow(nt)


# Three ways, ZERO shared nodes:
#  - way 1: a ~1.1 km west-east corridor at lat 40.0
#  - way 2: the same corridor re-imported with fresh node ids and a
#    ~22 m northward jitter (0.0002 deg) -> Frechet ~22 m <= 250 m
#  - way 3: the same shape 0.5 deg east (~42 km away) -> never merges
_NODES = [
    (1, -75.0000, 40.0000), (2, -74.9950, 40.0000), (3, -74.9870, 40.0000),
    (101, -75.0000, 40.0002), (102, -74.9950, 40.0002),
    (103, -74.9870, 40.0002),
    (201, -74.5000, 40.0000), (202, -74.4950, 40.0000),
    (203, -74.4870, 40.0000),
]
_WAYS = [(1, [1, 2, 3]), (2, [101, 102, 103]), (3, [201, 202, 203])]


def test_conflate_candidates_include_disjoint_pair(ray_session):
    """The grid-bucketed geometric stage must surface (1, 2) as a
    candidate even though the pair shares no node; the far way 3 only
    pairs geometrically with nothing within 2 cells (~556 m)."""
    from go_osm_ray.pipelines.osm import conflate_candidate_edges
    ways, nodes = _osm_ds(_WAYS, _NODES)
    edges = conflate_candidate_edges(ways, nodes, num_parts=4)
    got = {(r["a"], r["b"]) for r in edges.take_all()}
    assert (1, 2) in got
    assert not any(3 in p for p in got)


def test_way_conflate_merges_disjoint_duplicate(ray_session):
    """way 2 (the jittered disjoint re-import) must map to keeper 1;
    the distant way 3 stays its own keeper."""
    from go_osm_ray.pipelines.osm import way_conflate
    ways, nodes = _osm_ds(_WAYS, _NODES)
    out = {r["way_id"]: (r["keeper"], r["is_dup"])
           for r in way_conflate(ways, nodes, num_parts=4).take_all()}
    assert out[1] == (1, False)
    assert out[2] == (1, True)
    assert out[3] == (3, False)


def test_way_conflate_far_jitter_does_not_merge(ray_session):
    """A disjoint re-import offset by ~333 m (0.003 deg) exceeds the
    250 m Frechet gate: candidates may surface the pair, but the DP
    filter must reject it."""
    from go_osm_ray.pipelines.osm import way_conflate
    nodes = [
        (1, -75.0000, 40.0000), (2, -74.9950, 40.0000),
        (3, -74.9870, 40.0000),
        (101, -75.0000, 40.0030), (102, -74.9950, 40.0030),
        (103, -74.9870, 40.0030),
    ]
    ways = [(1, [1, 2, 3]), (2, [101, 102, 103])]
    w, n = _osm_ds(ways, nodes)
    out = {r["way_id"]: (r["keeper"], r["is_dup"])
           for r in way_conflate(w, n, num_parts=4).take_all()}
    assert out[1] == (1, False)
    assert out[2] == (2, False)


def test_topk_brute_coincident_tie_closure(ray_session):
    """600 features at the SAME coordinate: argpartition's pool boundary
    splits the all-equal-d2 tie arbitrarily, so the round-5 tie-closure
    guard must fall back to the full stable sort and return the k
    smallest ids (positions 0..k-1 after the id-ascending init sort)."""
    import numpy as np
    import ray

    from go_osm_ray.pipelines.spatial import KnnVoteClassify
    n = 600
    ids = np.arange(1000, 1000 + n)[::-1].copy()
    t = pa.table({
        "id": pa.array(ids),
        "lon": pa.array(np.zeros(n)), "lat": pa.array(np.zeros(n)),
        "label": pa.array([f"L{v % 7}" for v in ids], pa.string())})
    kc = KnnVoteClassify(ray.put(t))
    idx = kc._topk_brute(np.array([0.5]), np.array([0.5]))
    assert idx[0].tolist() == [0, 1, 2, 3, 4]
