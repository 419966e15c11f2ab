"""Session-7 ops: way_jaccard on a hand-computed planted graph (the
parity gates run on the synthetic clique-ish way graph, so the kernel
needs a case with open wedges and known Jaccard values), readability's
count semantics, geohash_rollup prefix-nesting invariant."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data


def _ways_ds(ways: dict[int, list[int]]) -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table({
        "id": pa.array(list(ways), pa.int64()),
        "refs": pa.array(list(ways.values()), pa.list_(pa.int64())),
    }))


def test_way_jaccard_planted(ray_session):
    """Path graph 1-2-3-4 plus a pendant 5 on 2 (built from shared
    node refs): hand-computed common-neighbor counts and Jaccard
    scores, threshold 0 so every candidate pair is emitted."""
    from go_osm_ray.pipelines.osm import way_jaccard
    # shared-node edges: (1,2),(2,3),(3,4),(2,5)
    ways = {1: [10, 11], 2: [11, 12, 15], 3: [12, 13],
            4: [13, 14], 5: [15, 16]}
    out = way_jaccard(_ways_ds(ways), num_parts=4, threshold=0.0) \
        .take_all()
    got = {(r["a"], r["b"]): (r["common"], r["jac6"]) for r in out}
    # N(1)={2} N(2)={1,3,5} N(3)={2,4} N(4)={3} N(5)={2}
    # candidate pairs (>=1 common neighbor):
    #   via center 2: (1,3),(1,5),(3,5); via center 3: (2,4)
    assert got == {
        (1, 3): (1, round(1 / (1 + 2 - 1), 6)),
        (1, 5): (1, 1.0),          # N(1)=N(5)={2}
        (3, 5): (1, round(1 / (2 + 1 - 1), 6)),
        (2, 4): (1, round(1 / (3 + 1 - 1), 6)),
    }


def test_way_jaccard_threshold(ray_session):
    """threshold=0.6 keeps only the identical-neighborhood pair."""
    from go_osm_ray.pipelines.osm import way_jaccard
    ways = {1: [10, 11], 2: [11, 12, 15], 3: [12, 13],
            4: [13, 14], 5: [15, 16]}
    out = way_jaccard(_ways_ds(ways), num_parts=4, threshold=0.6) \
        .take_all()
    assert {(r["a"], r["b"]) for r in out} == {(1, 5)}


def test_readability_counts(ray_session):
    """Words / sentences / syllable-groups are global regex match
    counts; sentence count clamps to 1; zero-word docs drop."""
    from go_osm_ray.pipelines.scoring import readability
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["a", "b", "c"]),
        "text": pa.array([
            "The cat sat. It purred!",   # w=5 s=2 y=6 (purred: u, e)
            "no punctuation here",       # s clamps to 1
            "12345 !!!",                 # zero words -> dropped
        ]),
    }))
    out = {r["doc_id"]: r for r in readability(docs).take_all()}
    assert set(out) == {"a", "b"}
    a = out["a"]
    assert (a["words"], a["sents"], a["syll"]) == (5, 2, 6)
    w, s, y = 5.0, 2.0, 6.0
    exp = (206.835 - 1.015 * (w / s)) - 84.6 * (y / w)
    assert a["flesch6"] == pytest.approx(round(exp, 6), abs=1e-9)
    assert out["b"]["sents"] == 1


def test_geohash_rollup_nesting(ray_session):
    """Every level-4 count aggregates exactly into its level-2 parent
    (prefix truncation = coarser geohash cell), totals equal n_rows
    at every level."""
    from go_osm_ray.pipelines.spatial import geohash_rollup
    rng = np.random.RandomState(3)
    n = 2000
    pts = ray.data.from_arrow(pa.table({
        "image_id": pa.array([f"i{k}" for k in range(n)]),
        "lon": pa.array(rng.uniform(-180, 180, n)),
        "lat": pa.array(rng.uniform(-85, 85, n)),
    }))
    rows = geohash_rollup(pts, levels=(2, 4)).take_all()
    by_lvl: dict[int, dict[str, int]] = {2: {}, 4: {}}
    for r in rows:
        by_lvl[r["lvl"]][r["prefix"]] = r["n"]
    assert sum(by_lvl[2].values()) == n
    assert sum(by_lvl[4].values()) == n
    roll = {}
    for p, c in by_lvl[4].items():
        roll[p[:2]] = roll.get(p[:2], 0) + c
    assert roll == by_lvl[2]
