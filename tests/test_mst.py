"""way_mst structural property tests on PLANTED graphs the oracle gate
cannot exercise (the synthetic way graph is shallow all-clique): a long
chain forces deep hooking trees through the pointer-jump compression,
a clique forces mutual-pair dedup, and any MSF must match a scalar
Kruskal run under the shared (w, a, b) total order."""

import numpy as np
import pyarrow as pa
import ray
import ray.data

from go_osm_ray.pipelines.osm import way_mst
from go_osm_ray.state.bsp import mst_edge_weight


def _ways(ids, refs):
    return ray.data.from_arrow(pa.table({
        "id": pa.array(ids, pa.int64()),
        "refs": pa.array(refs, pa.list_(pa.int64())),
    }))


def _rows(ds):
    return sorted((r["component"], r["n_ways"], r["n_edges"], r["total_w"])
                  for r in ds.take_all())


def _kruskal(ids, edges):
    """Scalar MSF reference over explicit (a, b) pairs."""
    w = {(a, b): int(mst_edge_weight(np.array([a]), np.array([b]))[0])
         for a, b in edges}
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total = {}
    nedge = {}
    for wv, a, b in sorted((w[e], *e) for e in edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    for wv, a, b in sorted((w[e], *e) for e in edges):
        pass
    # second pass with fresh union-find to accumulate accepted edges
    parent = {i: i for i in ids}
    accepted = []
    for wv, a, b in sorted((w[e], *e) for e in edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            accepted.append((wv, a, b))
    comp = {}
    for i in ids:
        comp.setdefault(find(i), []).append(i)
    for wv, a, b in accepted:
        r = find(a)
        total[r] = total.get(r, 0) + wv
        nedge[r] = nedge.get(r, 0) + 1
    return sorted((min(ms), len(ms), nedge.get(r, 0), total.get(r, 0))
                  for r, ms in comp.items())


def test_mst_long_chain_and_singleton(ray_session):
    # 120-way chain (way k shares ref k+1 with way k+1): the MSF is the
    # whole chain (119 edges, one component), and hooking builds long
    # parent chains that only pointer jumping can compress in-budget.
    n = 120
    ids = list(range(1000, 1000 + n)) + [77777]
    refs = [[k, k + 1] for k in range(n)] + [[999999, 999998]]
    got = _rows(way_mst(_ways(ids, refs), num_parts=4))
    edges = [(1000 + k, 1001 + k) for k in range(n - 1)]
    assert got == _kruskal(ids, edges)
    # structure: one chain component + the isolated way
    assert (77777, 1, 0, 0) in got
    chain = [r for r in got if r[0] == 1000][0]
    assert chain[1] == n and chain[2] == n - 1


def test_mst_clique_drops_heaviest(ray_session):
    # 8 ways all sharing one ref (a K8 clique): the MSF keeps exactly 7
    # of the 28 edges and every mutual-pair hook dedups (total weight
    # must equal scalar Kruskal under the same (w, a, b) order).
    ids = list(range(50, 58))
    refs = [[7] for _ in ids]
    got = _rows(way_mst(_ways(ids, refs), num_parts=4))
    edges = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
    assert got == _kruskal(ids, edges)
    assert got[0][1] == 8 and got[0][2] == 7


def test_mst_two_cliques_bridge(ray_session):
    # two K4 cliques joined by one bridge way that belongs to both ref
    # groups: one component, 9 ways, 8 MSF edges, weights = Kruskal.
    a_ids = [10, 11, 12, 13]
    b_ids = [20, 21, 22, 23]
    bridge = [30]
    ids = a_ids + b_ids + bridge
    refs = [[100]] * 4 + [[200]] * 4 + [[100, 200]]
    got = _rows(way_mst(_ways(ids, refs), num_parts=4))
    ga = a_ids + bridge
    gb = b_ids + bridge
    edges = {(min(a, b), max(a, b)) for g in (ga, gb)
             for i, a in enumerate(g) for b in g[i + 1:]}
    assert got == _kruskal(ids, sorted(edges))
    assert len(got) == 1 and got[0] == (10, 9, 8, got[0][3])
