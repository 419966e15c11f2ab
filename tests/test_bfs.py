"""way_bfs_depth: multi-round frontier propagation the oracle gate
cannot see (the synthetic way graph is depth-1 shallow) — a planted
40-way chain forces 2x16 bipartite BSP rounds and exercises the depth
cap, exact hop counts, and unreached-way dropping."""

import numpy as np
import pyarrow as pa
import ray
import ray.data

from go_osm_ray.pipelines.osm import way_bfs_depth


def _collect(ds) -> dict[int, int]:
    blocks = [b for b in ray.get(ds.to_arrow_refs()) if b.num_rows]
    out: dict[int, int] = {}
    for b in blocks:
        for w, d in zip(b["way_id"].to_pylist(), b["depth"].to_pylist()):
            out[w] = d
    return out


def test_way_bfs_chain_depth_cap(ray_session):
    # chain of 40 ways: way k shares ref k+1 with way k+1; ids 82..121
    # contain exactly ONE seed (82 = 2*41), so depth(82+j) = j, and the
    # 16-hop cap must drop ways 99..121; an isolated way never appears
    ids = list(range(82, 122)) + [9999]
    refs = [[k, k + 1] for k in range(40)] + [[777777, 777778]]
    ways = ray.data.from_arrow(pa.table({
        "id": pa.array(ids, pa.int64()),
        "refs": pa.array(refs, pa.list_(pa.int64())),
    }))
    got = _collect(way_bfs_depth(ways, seed_mod=41, max_depth=16,
                                 num_parts=4))
    assert got == {82 + j: j for j in range(17)}


def test_way_bfs_multi_seed_min(ray_session):
    # seeds at both ends (0 and 41): depth is the MIN over seeds
    ids = list(range(0, 42))
    refs = [[k, k + 1] for k in range(42)]
    ways = ray.data.from_arrow(pa.table({
        "id": pa.array(ids, pa.int64()),
        "refs": pa.array(refs, pa.list_(pa.int64())),
    }))
    got = _collect(way_bfs_depth(ways, seed_mod=41, max_depth=16,
                                 num_parts=4))
    expect = {i: min(i, 41 - i) for i in range(42)}
    expect = {i: d for i, d in expect.items() if d <= 16}
    assert got == expect


def test_way_bfs_block_split_invariance(ray_session):
    ids = list(range(82, 110))
    refs = [[k, k + 1] for k in range(len(ids))]
    t = pa.table({"id": pa.array(ids, pa.int64()),
                  "refs": pa.array(refs, pa.list_(pa.int64()))})
    a = _collect(way_bfs_depth(ray.data.from_arrow(t), num_parts=4))
    blocks = [t.slice(0, 1), t.slice(1, 5), t.slice(6)]
    b = _collect(way_bfs_depth(ray.data.from_arrow(blocks), num_parts=2))
    assert a == b
