"""Session-9 ops: planted-configuration properties the SQL/pyoracle
parity gates cannot see — quota tie/partition invariance, Hausdorff
asymmetry, debounce lag-vs-chain semantics, eval counting, PCA sign
determinism, zscore outlier threshold straddling."""

import numpy as np
import pyarrow as pa
import ray
import ray.data


def test_source_quota_partition_invariance(ray_session):
    """The per-group bottom-k keep set is a pure function of
    (md5(id), id) — block layout must not change it, and rk must be
    the dense 1..k rank."""
    from go_osm_ray.pipelines.sample import source_quota_sample
    from go_osm_ray.util import md5_num_lower
    ids = np.arange(200, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "source": pa.array([f"s{i % 4}" for i in ids])})
    expected = {}
    for g in range(4):
        gids = ids[ids % 4 == g]
        pr = md5_num_lower(gids)
        keep = gids[np.lexsort((gids, pr))[:5]]
        expected[f"s{g}"] = list(keep)
    ref = None
    for blocks in (1, 7):
        out = source_quota_sample(
            ray.data.from_arrow(t).repartition(blocks),
            "doc_id", "source", 5).to_pandas()
        got = sorted(map(tuple, out[["source", "doc_id", "rk"]]
                         .itertuples(index=False)))
        if ref is None:
            ref = got
            assert len(out) == 20
            for g in range(4):
                sub = out[out.source == f"s{g}"].sort_values("rk")
                assert list(sub.doc_id) == expected[f"s{g}"]
                assert list(sub.rk) == [1, 2, 3, 4, 5]
        else:
            assert got == ref


def test_way_hausdorff_directed_asymmetry(ray_session):
    """A 2-vertex way inside a long 3-vertex way: the a->b direction is
    near 0 while b->a reaches the far endpoint — the symmetric max
    must pick the far leg (a pure max_a min_b would not)."""
    from go_osm_ray.pipelines.osm import way_hausdorff
    # shared node 1 at (0,0); way 1 = {1,2} short, way 2 = {1,3} long
    nodes = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "lon": pa.array([0.0, 0.001, 1.0]),
        "lat": pa.array([0.0, 0.0, 0.0])})
    ways = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "refs": pa.array([[1, 2], [1, 3]], pa.list_(pa.int64()))})
    out = way_hausdorff(ray.data.from_arrow(ways),
                        ray.data.from_arrow(nodes)).to_pandas()
    assert len(out) == 1
    h = float(out.hausdorff3.iloc[0])
    # ~1 deg lon at the equator ~ 111.19 km; the 111 m way-1 leg is the
    # nearest-vertex distance, the far vertex dominates
    assert 111_000.0 < h < 111_400.0


def test_events_dedup_window_lag_not_chain(ray_session):
    """Three events 0s / 100s / 190s with window 150s: lag semantics
    keeps {0} and drops both followers (gap 100 then 90); chained
    'last-kept' semantics would keep the 190s event — assert the lag
    contract."""
    from go_osm_ray.pipelines.relq import events_dedup_window
    base = np.datetime64("2020-01-01T00:00:00", "us")
    ts = base + np.array([0, 100, 190], "timedelta64[s]").astype(
        "timedelta64[us]")
    t = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "event_type": pa.array(["a", "a", "a"]),
        "ts": pa.array(ts)})
    out = events_dedup_window(ray.data.from_arrow(t),
                              window_s=150).to_pandas()
    assert sorted(out.event_id) == [1]
    # widen the window edge: gap == window is KEPT (>= semantics)
    out2 = events_dedup_window(ray.data.from_arrow(t),
                               window_s=90).to_pandas()
    assert sorted(out2.event_id) == [1, 2, 3]


def test_embed_pca_sign_and_order(ray_session):
    """Anisotropic planted cloud: pc1 carries the dominant axis, the
    component sign convention makes the largest-|coordinate| positive,
    and block layout does not change the output."""
    from go_osm_ray.pipelines.vectors import embed_pca
    rng = np.random.default_rng(7)
    x = np.zeros((64, 8))
    x[:, 3] = rng.normal(0, 10.0, 64)   # dominant axis = dim 3
    x[:, 5] = rng.normal(0, 1.0, 64)
    t = pa.table({
        "vec_id": pa.array(np.arange(64, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in x],
                              pa.list_(pa.float32()))})
    outs = []
    for blocks in (1, 5):
        out = embed_pca(ray.data.from_arrow(t).repartition(blocks),
                        top_m=2).to_pandas().sort_values("vec_id")
        outs.append(out)
        # sign convention: pc1 must CORRELATE POSITIVELY with dim 3
        c = np.corrcoef(out.pc1.to_numpy(),
                        x[:, 3].astype(np.float32))[0, 1]
        assert c > 0.99
    assert np.allclose(outs[0].pc1.to_numpy(), outs[1].pc1.to_numpy())
    assert np.allclose(outs[0].pc2.to_numpy(), outs[1].pc2.to_numpy())


def test_events_zscore_threshold_on_rounded(ray_session):
    """The outlier flag applies to the ROUNDED z: plant a value whose
    true z is just above 3 but rounds to exactly 3.0 -> not flagged."""
    from go_osm_ray.pipelines.relq import events_zscore
    # 10 values: 9 at 0, plus v chosen so z(v) rounds to 3.000000
    vals = np.zeros(12)
    vals[:6] = -1.0
    vals[6:] = 1.0
    t = pa.table({
        "event_id": pa.array(np.arange(12, dtype=np.int64)),
        "event_type": pa.array(["t"] * 12),
        "value": pa.array(vals)})
    out = events_zscore(ray.data.from_arrow(t)).to_pandas()
    # symmetric +-1 cloud: |z| = 1/sd < 3 -> no outliers, z symmetric
    assert not out.is_outlier.any()
    assert np.isclose(out.z6.abs().max(), out.z6.abs().min())


def test_neardup_eval_counts(ray_session):
    """Two exact duplicate docs + one unique: 1 true pair, LSH finds
    it -> perfect precision/recall on a planted corpus."""
    from go_osm_ray.pipelines.text import neardup_eval
    dup = "the quick brown fox jumps over the lazy dog " * 8
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([dup, dup,
                          "completely different words entirely " * 8])})
    out = neardup_eval(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r.n_true), int(r.n_lsh), int(r.n_hit)) == (1, 1, 1)
    assert float(r.precision4) == 1.0 and float(r.recall4) == 1.0
