"""Round-4 ops: clip_filter (image-text cosine curation),
phash_hamming_pairs (banded multi-index hamming join), geohash encoding,
image_dedup_keep (phash-CC purge), curation_funnel, cell_bbox.

The driver-grade gates live in test_oracle_parity.py (both ops are
oracle_sql-gated); these tests pin the properties the SQL gate cannot
see — banding losslessness against a planted radius-edge pair, and the
filter's rounding-boundary contract.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from go_osm_ray.pipelines.images import PHASH_BANDS, phash_hamming_pairs
from go_osm_ray.pipelines.vectors import clip_filter


def test_phash_bands_partition_all_64_bits():
    seen = set()
    for start, width in PHASH_BANDS:
        bits = set(range(start, start + width))
        assert not (seen & bits), "bands overlap"
        seen |= bits
    assert seen == set(range(64))
    # pigeonhole guarantee: exact for d <= len(bands) - 1 = 10
    assert len(PHASH_BANDS) == 11


def _img_ds(ids, phashes):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "image_id": pa.array([f"img{int(i):012d}" for i in ids]),
        "phash": pa.array(np.asarray(phashes, np.uint64).view(np.int64)),
    }))


def test_phash_pairs_planted_radius_edge(ray_session):
    """A pair at EXACTLY d=10 (the radius) must be found — it differs in
    10 bands and agrees in exactly one, so any band-coverage bug drops
    it; a pair at d=11 must not appear."""
    base = np.uint64(0x0123456789ABCDEF)
    # flip one bit inside each of the first 10 bands -> d=10, band 10 intact
    d10 = base
    for start, _w in PHASH_BANDS[:10]:
        d10 ^= np.uint64(1) << np.uint64(start)
    # additionally flip a bit in the last band -> d=11, no shared band
    d11 = d10 ^ (np.uint64(1) << np.uint64(PHASH_BANDS[10][0]))
    ds = _img_ds([1, 2, 3], [base, d10, d11])
    t = pa.concat_tables(
        list(phash_hamming_pairs(ds, max_hamming=10)
             .iter_batches(batch_format="pyarrow")),
        promote_options="default")
    pairs = {(a, b): h for a, b, h in
             zip(t["a"].to_pylist(), t["b"].to_pylist(),
                 t["hamming"].to_pylist())}
    assert pairs.get((1, 2)) == 10
    assert (1, 3) not in pairs          # d=11: outside the radius
    assert (2, 3) in pairs              # d=1: trivially inside


def test_phash_pairs_match_bruteforce(ray_session):
    """Banded exchange == O(n^2) scan on a random corpus (seeded)."""
    rs = np.random.RandomState(7)
    n = 400
    base = rs.randint(0, 1 << 62, n // 2).astype(np.uint64)
    # half are noisy copies (flip 0-12 random bits), half independent
    noisy = base.copy()
    for i in range(len(noisy)):
        for b in rs.choice(64, rs.randint(0, 13), replace=False):
            noisy[i] ^= np.uint64(1) << np.uint64(b)
    ph = np.r_[base, noisy]
    ids = np.arange(n)
    t = pa.concat_tables(
        list(phash_hamming_pairs(_img_ds(ids, ph), max_hamming=10)
             .iter_batches(batch_format="pyarrow")),
        promote_options="default")
    got = {(a, b, h) for a, b, h in zip(t["a"].to_pylist(),
                                        t["b"].to_pylist(),
                                        t["hamming"].to_pylist())}
    x = ph[:, None] ^ ph[None, :]
    pcnt = np.unpackbits(x.view(np.uint8).reshape(n, n, 8), axis=2).sum(2)
    ii, jj = np.triu_indices(n, 1)
    want = {(int(a), int(b), int(pcnt[a, b]))
            for a, b in zip(ii, jj) if pcnt[a, b] <= 10}
    assert got == want


def test_clip_filter_threshold_on_rounded_value(ray_session):
    """The keep decision applies to the ROUNDED cosine (the SQL mirror's
    contract): a raw cosine just under the threshold that rounds UP to
    it must be kept."""
    import ray.data
    d = 8   # towers of 4
    # cos = 0.2499998 -> rounds to 0.25 (half-away, 6 digits) -> kept;
    # 3e-7 above the 0.2499995 round-up boundary, an order beyond the
    # ~6e-8 float32-storage perturbation of the cosine
    a = np.array([1.0, 0.0, 0.0, 0.0])
    target = 0.2499998
    b = np.array([target, np.sqrt(1 - target * target), 0.0, 0.0])
    # and one clearly below: cos = 0.2 -> dropped
    b2 = np.array([0.2, np.sqrt(1 - 0.04), 0.0, 0.0])
    emb = [np.r_[a, b], np.r_[a, b2]]
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([1, 2], pa.int64()),
        "embedding": pa.array([e.astype(np.float32) for e in emb],
                              pa.list_(pa.float32())),
    }))
    out = clip_filter(ds, threshold=0.25).take_all()
    kept = {r["vec_id"]: r["cos6"] for r in out}
    assert 2 not in kept
    assert 1 in kept and abs(kept[1] - 0.25) < 1e-12


def test_geohash_known_landmarks():
    """Published geohash values (geohash.org): independent ground truth
    that doesn't route through either repo implementation."""
    from go_osm_ray.geo.tiles import geohash
    lon = np.array([2.2945, -77.0365, 151.2153, -0.1278])
    lat = np.array([48.8584, 38.8977, -33.8568, 51.5074])
    got = [g.decode() for g in geohash(lon, lat, 6)]
    assert got == ["u09tun", "dqcjqc", "r3gx2u", "gcpvj0"]
    # hierarchical prefix property: precision-4 hash is the 6-char prefix
    got4 = [g.decode() for g in geohash(lon, lat, 4)]
    assert got4 == [g[:4] for g in got]
    with pytest.raises(ValueError):
        geohash(lon, lat, 5)  # odd precision unsupported (documented)


def test_geohash_engine_matches_scalar_bisection():
    from go_osm_ray.geo.tiles import geohash
    from go_osm_ray.pyoracle import _scalar_geohash
    rng = np.random.RandomState(7)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    vec = [g.decode() for g in geohash(lon, lat, 6)]
    ref = [_scalar_geohash(float(a), float(b), 6) for a, b in zip(lon, lat)]
    assert vec == ref


def test_curation_funnel_monotone_and_total(ray_session):
    from go_osm_ray.pipelines.images import curation_funnel
    n = 3000
    idx = np.arange(n)
    w = np.array([16, 24, 32], np.int32)[idx % 3]
    h = np.array([16, 24, 32], np.int32)[(idx // 3) % 3]
    t = pa.table({
        "fmt": pa.array(np.where(idx % 2 == 0, "png", "raw")),
        "w": pa.array(w), "h": pa.array(h),
        "caption": pa.array([f"c{'x' * (i % 60)}" for i in idx]),
    })
    out = curation_funnel(ray.data.from_arrow(t).repartition(6)).to_pandas()
    assert int(out["n_total"].sum()) == n
    for a, b in (("n_total", "n_px"), ("n_px", "n_aspect"),
                 ("n_aspect", "n_caption")):
        assert (out[a] >= out[b]).all()  # cumulative stages only shrink
    # the aspect bound actually bites: 32x16 (ratio 2 > 3/2) passes the
    # pixel floor but not the aspect stage
    assert int(out["n_px"].sum()) > int(out["n_aspect"].sum())


def test_cell_bbox_contains_points(ray_session):
    from go_osm_ray.pipelines.spatial import cell_bbox
    from go_osm_ray.geo.tiles import cell_id
    rng = np.random.RandomState(3)
    n = 5000
    lon = rng.uniform(-170, 170, n)
    lat = rng.uniform(-80, 80, n)
    pts = ray.data.from_arrow(pa.table({
        "image_id": pa.array([f"p{i}" for i in range(n)]),
        "lon": pa.array(lon), "lat": pa.array(lat),
    })).repartition(8)
    out = cell_bbox(pts, res=5).to_pandas()
    assert int(out["n"].sum()) == n
    cells = cell_id(lon, lat, 5)
    by_cell = out.set_index("cell_r5")
    # every point within its cell's reported (rounded) bbox, with the
    # 6-digit rounding slack
    eps = 5e-7 + 1e-9
    for c, lo in ((cells[i], i) for i in range(0, n, 97)):
        row = by_cell.loc[c]
        assert row["lon_min6"] - eps <= lon[lo] <= row["lon_max6"] + eps
        assert row["lat_min6"] - eps <= lat[lo] <= row["lat_max6"] + eps


def test_image_dedup_keep_planted_components(ray_session):
    """Plant two hamming-adjacent phash clusters; keep = min id of each
    cluster plus every singleton."""
    from go_osm_ray.pipelines.images import phash_hamming_pairs
    from go_osm_ray.pipelines.text import dedup_keep
    base1, base2 = 0x0123456789ABCD00, 0x7EDCBA9876543200
    rows = []
    for i, flip in enumerate((0, 1, 2)):        # cluster A: ids 0,1,2
        rows.append((i, base1 ^ (1 << flip)))
    for i, flip in enumerate((0, 3)):           # cluster B: ids 10,11
        rows.append((10 + i, base2 ^ (1 << flip)))
    rows += [(20, 0x5555000055550000), (21, 0x00AA00AA00AA00AA)]  # singletons
    t = pa.table({
        "image_id": pa.array([f"img{i:012d}" for i, _ in rows]),
        "phash": pa.array([p for _, p in rows], pa.int64()),
        "iid": pa.array([i for i, _ in rows], pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    pairs = phash_hamming_pairs(ds, max_hamming=4)
    kept = dedup_keep(ds.select_columns(["iid"]), pairs, id_col="iid") \
        .to_pandas()["iid"].sort_values().tolist()
    assert kept == [0, 10, 20, 21]


def test_zonal_stats_partition_invariant(ray_session):
    """Zonal aggregates must not depend on block layout (combiner
    exchange exactness)."""
    import pandas as pd
    import parity
    from go_osm_ray.geo.pip import PolygonIndex
    from go_osm_ray.pipelines.raster import rasterize_tiles, zonal_stats
    rng = np.random.RandomState(5)
    n = 4000
    lon = rng.uniform(-1.0, 1.0, n)
    lat = rng.uniform(-1.0, 1.0, n)
    # two square polygons, one containing the origin quadrant
    idx = PolygonIndex(
        np.array([7, 9], np.int64),
        [np.array([-0.5, 0.5, 0.5, -0.5, -0.5]),
         np.array([0.6, 0.9, 0.9, 0.6, 0.6])],
        [np.array([-0.5, -0.5, 0.5, 0.5, -0.5]),
         np.array([0.6, 0.6, 0.9, 0.9, 0.6])])
    ref = ray.put(idx)
    outs = []
    for blocks in (1, 8):
        pts = ray.data.from_arrow(pa.table({
            "lon": pa.array(lon), "lat": pa.array(lat)})).repartition(blocks)
        r = rasterize_tiles(pts, z=6, grid=16)
        outs.append(parity.canonicalize(
            zonal_stats(r, ref, z=6, grid=16).to_pandas()))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert len(outs[0]) == 2           # both polygons see pixels
    assert (outs[0]["pts_sum"] >= outs[0]["n_pixels"]).all()


def test_radius_join_boundary_and_highlat_prune(ray_session):
    """Points just inside/outside the radius at HIGH latitude: the
    spherical-cap lon bound must widen by 1/cos(lat) (a naive flat bbox
    would prune the inside-east point); the keep decision applies to the
    3-digit ROUNDED distance."""
    from go_osm_ray.pipelines.osm import EARTH_R_M
    from go_osm_ray.pipelines.spatial import radius_join
    from go_osm_ray.geo import morton
    R = 5000.0
    flat, flon = 60.0, 10.0
    feats = ray.put(pa.table({
        "id": pa.array([77], pa.int64()),
        "lon": pa.array([flon]), "lat": pa.array([flat])}))
    # displacement east at lat 60: dlon for arc s is ~ s/(EARTH_R cos lat)
    dlon_in = np.degrees((R - 50.0) / (EARTH_R_M * np.cos(np.radians(flat))))
    dlon_out = np.degrees((R + 50.0) / (EARTH_R_M * np.cos(np.radians(flat))))
    lons = np.array([flon + dlon_in, flon + dlon_out, flon])
    lats = np.array([flat, flat, flat + np.degrees((R - 50.0) / EARTH_R_M)])
    phash = morton.encode_phash(lons, lats, np.arange(3))
    # morton quantization moves each point <= ~1.2 m — inside the 50 m slack
    imgs = ray.data.from_arrow(pa.table({
        "image_id": pa.array(["in_east", "out_east", "in_north"]),
        "phash": pa.array(phash)}))
    out = radius_join(imgs, feats, radius_m=R).to_pandas()
    assert sorted(out["image_id"]) == ["in_east", "in_north"]
    assert (out["dist_m3"] <= R).all()
    assert (out["feature_id"] == 77).all()


def test_apply_diff_semantics_and_partition_invariance(ray_session):
    """CDC merge: modify wins by version, delete removes the id even when
    a higher-version modify exists, creates appear; result independent of
    block layout."""
    import pandas as pd
    import parity
    from go_osm_ray.pipelines.osm import apply_diff
    base = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "version": pa.array([5, 1, 2, 9], pa.int64()),
        "lon": pa.array([10.0, 20.0, 30.0, 40.0]),
        "lat": pa.array([1.0, 2.0, 3.0, 4.0]),
    })
    delta = pa.table({
        "id": pa.array([1, 2, 2, 99], pa.int64()),
        "version": pa.array([6, 7, 0, 1], pa.int64()),
        "lon": pa.array([11.0, 21.0, 0.0, 99.0]),
        "lat": pa.array([1.5, 2.5, 0.0, 9.9]),
        "deleted": pa.array([False, False, True, False]),
    })
    outs = []
    for blocks in (1, 4):
        b = ray.data.from_arrow(base).repartition(blocks)
        d = ray.data.from_arrow(delta).repartition(blocks)
        outs.append(parity.canonicalize(apply_diff(b, d).to_pandas()))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = {int(r["id"]): (int(r["version"]), r["lon7"])
           for _, r in outs[0].iterrows()}
    assert got[1] == (6, 11.0)       # modify supersedes base v5
    assert 2 not in got              # delete wins over the v7 modify
    assert got[3] == (2, 30.0)       # untouched base row
    assert got[99] == (1, 99.0)      # create


def test_hilbert_adjacency_and_coverage():
    """Consecutive Hilbert indexes map to 4-adjacent grid cells (the
    defining curve-continuity property, which the morton/Z key lacks)
    and the order-4 curve is a bijection over the 16x16 grid."""
    from go_osm_ray.geo.tiles import hilbert_d
    n = 16
    # cell-centre lon/lat for every grid cell at order 4
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    lon = (xs.ravel() + 0.5) / n * 360.0 - 180.0
    lat = (ys.ravel() + 0.5) / n * 180.0 - 90.0
    d = hilbert_d(lon, lat, order=4)
    assert sorted(d.tolist()) == list(range(n * n))   # bijection
    pos = np.empty((n * n, 2), np.int64)
    pos[d] = np.stack([xs.ravel(), ys.ravel()], axis=1)
    steps = np.abs(np.diff(pos, axis=0)).sum(axis=1)
    assert (steps == 1).all()                         # unit grid steps


def test_detect_nms_postconditions(ray_session):
    """Every surviving pair of boxes has IoU <= thresh; every suppressed
    box overlaps some higher-scoring kept box; mask popcount == n_kept."""
    from go_osm_ray.pipelines.images import detect_nms, synth_boxes
    ph = (np.arange(512, dtype=np.int64) * 2654435761 + 7)
    w = np.full(512, 32, np.int32)
    h = np.full(512, 24, np.int32)
    t = pa.table({"image_id": pa.array([f"i{i}" for i in range(512)]),
                  "phash": pa.array(ph), "w": pa.array(w),
                  "h": pa.array(h)})
    out = detect_nms(ray.data.from_arrow(t), k=6).to_pandas() \
        .set_index("image_id")
    boxes, scores = synth_boxes(ph, w, h, 6)

    def iou(a, b):
        ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
        ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(ix1 - ix0, 0.0) * max(iy1 - iy0, 0.0)
        aa = (a[2] - a[0]) * (a[3] - a[1])
        ab = (b[2] - b[0]) * (b[3] - b[1])
        return inter / (aa + ab - inter)

    for i in range(512):
        mask = int(out.loc[f"i{i}", "keep_mask"])
        kept = [j for j in range(6) if mask >> j & 1]
        assert len(kept) == int(out.loc[f"i{i}", "n_kept"]) >= 1
        for a_ in kept:
            for b_ in kept:
                if a_ < b_:
                    assert iou(boxes[i, a_], boxes[i, b_]) <= 0.5
        for s in range(6):
            if s not in kept:
                assert any(iou(boxes[i, s], boxes[i, j]) > 0.5
                           for j in kept
                           if (scores[i, j], -j) > (scores[i, s], -s))
