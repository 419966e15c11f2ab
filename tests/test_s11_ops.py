"""Session-11 ops: planted-image properties the parity gates cannot
see — zero Laplacian variance on linear ramps, solid-fill palette
collapse, SSIM=1 on an identity round-trip, border-ratio symmetry on
uniform fills, RFM score monotonicity, Adamic-Adar hub discounting."""

import numpy as np
import pyarrow as pa
import ray
import ray.data

from go_osm_ray import codecs


def _img_ds(pixel_arrays, fmt="bmp"):
    blobs = [codecs.encode(px, fmt) for px in pixel_arrays]
    return ray.data.from_arrow(pa.table({
        "image_id": pa.array([f"t{i:03d}" for i in range(len(blobs))],
                             pa.string()),
        "fmt": pa.array([fmt] * len(blobs), pa.string()),
        "bytes": pa.array(blobs, pa.binary())}))


def test_sharpness_zero_on_linear_ramp(ray_session):
    """A per-channel linear ramp has identically zero Laplacian, so
    lap_var6 must be exactly 0; a checkerboard must be positive."""
    from go_osm_ray.pipelines.images import image_sharpness
    ys, xs = np.mgrid[0:16, 0:16]
    # keep values linear (no wraparound) so the Laplacian is truly 0
    ramp = np.stack([2 * xs + 3 * ys + 10] * 3, -1).astype(np.uint8)
    checker = (((xs + ys) % 2) * 200).astype(np.uint8)
    checker = np.stack([checker] * 3, -1)
    df = image_sharpness(_img_ds([ramp, checker]),
                         concurrency=1).to_pandas() \
        .set_index("image_id")
    assert df.loc["t000", "lap_var6"] == 0.0
    assert df.loc["t001", "lap_var6"] > 1000.0
    assert bool(df["ok"].all())


def test_palette_solid_fill_collapses(ray_session):
    """A solid-color image lands in one bucket with share 1.0; the
    bucket id is the channel high bits."""
    from go_osm_ray.pipelines.images import image_palette
    solid = np.full((16, 16, 3), 200, np.uint8)     # 200 >> 6 == 3
    df = image_palette(_img_ds([solid]), concurrency=1).to_pandas()
    assert df.top_bucket[0] == (3 << 4) | (3 << 2) | 3
    assert df.top_share6[0] == 1.0
    assert df.n_colors[0] == 1


def test_ssim_identity_roundtrip(ray_session):
    """Pixels that already sit on the qnt5 lattice survive the round
    trip bit-exactly, so SSIM must be exactly 1."""
    from go_osm_ray.pipelines.images import image_ssim
    ys, xs = np.mgrid[0:16, 0:16]
    px = np.stack([(xs * 8) % 256] * 3, -1).astype(np.uint8)
    on_lattice = codecs.decode(codecs.encode(px, "qnt5"), "qnt5")
    df = image_ssim(_img_ds([on_lattice]), concurrency=1).to_pandas()
    assert df.ssim6[0] == 1.0


def test_border_ratio_one_on_uniform(ray_session):
    """A uniform fill has border mean == interior mean -> ratio 1;
    a bright 2-px frame pushes the ratio far above 1."""
    from go_osm_ray.pipelines.images import image_border_contrast
    uni = np.full((16, 16, 3), 77, np.uint8)
    framed = np.full((16, 16, 3), 10, np.uint8)
    framed[:2] = framed[-2:] = 250
    framed[:, :2] = framed[:, -2:] = 250
    df = image_border_contrast(_img_ds([uni, framed]),
                               concurrency=1).to_pandas() \
        .set_index("image_id")
    assert df.loc["t000", "ratio6"] == 1.0
    assert df.loc["t001", "ratio6"] > 5.0


def test_rfm_scores_monotone(ray_session):
    """Planted stream: user k makes k+1 purchases of value 10*(k+1),
    all at distinct recencies (user 0 oldest) -> r/f/m scores must be
    non-decreasing in k and span the full 1..5 range."""
    from go_osm_ray.pipelines.relq import user_rfm
    n = 10
    rows = []
    us_day = 86_400_000_000
    for k in range(n):
        for j in range(k + 1):
            rows.append((k, (k * 30 + j) * us_day, "purchase",
                         10.0 * (k + 1)))
    ev = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64)
                       .astype("datetime64[us]"), pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64())}))
    df = user_rfm(ev).to_pandas().sort_values("user_id") \
        .reset_index(drop=True)
    assert len(df) == n
    for col in ("r_score", "f_score", "m_score"):
        s = df[col].to_numpy()
        assert (np.diff(s) >= 0).all(), (col, s)
        assert s.min() == 1 and s.max() == 5, (col, s)
    # user 0: 1 purchase of 10.00 -> 1000 cents
    assert df.monetary_cents[0] == 1000
    assert df.frequency[9] == 10


def test_adamic_adar_discounts_hubs(ray_session):
    """AA weights common neighbors by 1/ln(center degree): a degree-2
    bridge way contributes 1/ln 2 to its pair, while inside a 5-clique
    every common neighbor has degree 4 and contributes only 1/ln 4 —
    exact closed-form values both."""
    from go_osm_ray.pipelines.osm import way_adamic_adar
    # X (id 50) shares n1 with A(1), n2 with B(2) -> deg(X)=2;
    # node 10 makes {3,4,5,6,60} a 5-clique -> every member deg 4
    way_refs = {
        1: [201, 1], 2: [202, 2], 50: [1, 2],
        3: [10, 203], 4: [10, 204], 5: [10, 205], 6: [10, 206],
        60: [10, 207],
    }
    ways = ray.data.from_arrow(pa.table({
        "id": pa.array(sorted(way_refs), pa.int64()),
        "refs": pa.array([way_refs[w] for w in sorted(way_refs)],
                         pa.list_(pa.int64()))}))
    df = way_adamic_adar(ways, num_parts=4).to_pandas()
    pairs = {(int(r.a), int(r.b)): float(r.aa6) for r in df.itertuples()}
    tight = pairs[(1, 2)]                  # via X, deg 2
    assert abs(tight - 1.0 / np.log(2)) < 1e-6
    # C..F and Y form a 5-clique through node 10: pair (3,4) has
    # common neighbors {5, 6, 60} each of degree 4 -> 3/ln(4)
    hub = pairs[(3, 4)]
    assert abs(hub - 3.0 / np.log(4)) < 1e-6


def test_way_resample_straight_segment(ray_session):
    """A 2-point way resamples to k collinear equally spaced points
    with exact endpoints."""
    from go_osm_ray.pipelines.osm import RESAMPLE_K, way_resample
    nodes = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "lon": pa.array([10.0, 10.7], pa.float64()),
        "lat": pa.array([0.0, 0.0], pa.float64())}))
    ways = ray.data.from_arrow(pa.table({
        "id": pa.array([5], pa.int64()),
        "refs": pa.array([[1, 2]], pa.list_(pa.int64()))}))
    df = way_resample(nodes, ways).to_pandas().sort_values("pt_idx")
    assert len(df) == RESAMPLE_K
    assert df.lon6.iloc[0] == 10.0 and df.lon6.iloc[-1] == 10.7
    assert (df.lat6 == 0.0).all()
    steps = np.diff(df.lon6.to_numpy())
    assert np.allclose(steps, 0.7 / (RESAMPLE_K - 1), atol=2e-6)


def test_gap_cv_metronome_vs_bursty(ray_session):
    """Equal gaps -> cv exactly 0; a bursty schedule -> cv > 0.5."""
    from go_osm_ray.pipelines.relq import user_gap_cv
    us = 1_000_000
    rows = [(1, i * 60 * us) for i in range(10)]           # metronome
    rows += [(2, t * us) for t in (0, 1, 2, 3, 1000, 1001, 2000)]
    ev = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64)
                       .astype("datetime64[us]"), pa.timestamp("us")),
        "event_id": pa.array(list(range(len(rows))), pa.int64())}))
    df = user_gap_cv(ev).to_pandas().set_index("user_id")
    assert df.loc[1, "cv6"] == 0.0
    assert df.loc[2, "cv6"] > 0.5
    assert df.loc[1, "n_gaps"] == 9


def test_char_entropy_limits(ray_session):
    """Single-char doc -> entropy 0; uniform 4-char doc -> ln 4."""
    from go_osm_ray.pipelines.text import doc_char_entropy
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["aaaaaaaa", "abcdabcd"], pa.string())}))
    df = doc_char_entropy(docs).to_pandas().set_index("doc_id")
    assert df.loc[1, "ent6"] == 0.0
    assert abs(df.loc[2, "ent6"] - np.log(4)) < 1e-6
    assert df.loc[2, "distinct_ch"] == 4


def test_orientation_ramp_is_pure_east(ray_session):
    """A monotone x-ramp has dx > 0, dy == 0 everywhere -> every
    gradient lands in octant 0 with share 1.0."""
    from go_osm_ray.pipelines.images import image_orientation
    ys, xs = np.mgrid[0:16, 0:16]
    ramp = np.stack([4 * xs + 1] * 3, -1).astype(np.uint8)
    df = image_orientation(_img_ds([ramp]), concurrency=1).to_pandas()
    assert df.dom_oct[0] == 0
    assert df.dom_share6[0] == 1.0
    assert df.n_grad[0] == 14 * 14


def test_viewshed_wall_occludes(ray_session):
    """Observer at the tile centre: a tall wall pixel hides a lower
    pixel directly behind it, while the wall itself stays visible."""
    from go_osm_ray.pipelines.raster import raster_viewshed
    grid = 64
    c = grid // 2
    # wall height 50 at (c+4, c); target height 1 at (c+8, c)
    r = ray.data.from_arrow(pa.table({
        "tile_x": pa.array([7, 7, 7], pa.int64()),
        "tile_y": pa.array([9, 9, 9], pa.int64()),
        "px": pa.array([c, c + 4, c + 8], pa.int64()),
        "py": pa.array([c, c, c], pa.int64()),
        "n": pa.array([2, 50, 1], pa.int64())}))
    df = raster_viewshed(r, z=10, grid=grid).to_pandas() \
        .set_index("px")
    assert bool(df.loc[c, "visible"])          # observer pixel
    assert bool(df.loc[c + 4, "visible"])      # the wall sees the sky
    assert not bool(df.loc[c + 8, "visible"])  # shadowed behind it


def test_caption_template_dupes(ray_session):
    """Captions differing only in digit runs collapse to one template;
    distinct fmt count and min keeper are exact."""
    from go_osm_ray.pipelines.images import caption_dupes
    imgs = ray.data.from_arrow(pa.table({
        "image_id": pa.array(["a", "b", "c", "d"], pa.string()),
        "caption": pa.array(["cat 1", "cat 22", "dog 3", "lone"],
                            pa.string()),
        "fmt": pa.array(["bmp", "png", "bmp", "bmp"], pa.string())}))
    df = caption_dupes(imgs, num_parts=2).to_pandas()
    assert len(df) == 1
    assert df.template[0] == "cat #"
    assert df.n_images[0] == 2 and df.n_fmts[0] == 2
    assert df.keeper[0] == "a"


def test_cluster_cohesion_perfect_clusters(ray_session):
    """Two axis-aligned point groups under k=2: every member coincides
    with its centroid direction -> mean_cos6 == min_cos6 == 1.0."""
    from go_osm_ray.pipelines.vectors import cluster_cohesion
    v0 = [1.0] + [0.0] * 7
    v1 = [0.0] * 7 + [1.0]
    emb = [v0] * 10 + [v1] * 10
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(list(range(20)), pa.int64()),
        "embedding": pa.array(emb, pa.list_(pa.float64()))}))
    df = cluster_cohesion(ds, n_clusters=2).to_pandas()
    assert len(df) == 2
    assert (df.mean_cos6 == 1.0).all()
    assert (df.min_cos6 == 1.0).all()
    assert sorted(df.n.tolist()) == [10, 10]


def test_km_survival_planted_curve(ray_session):
    """4 churners at lifetimes 1..4 days among 10 users -> the KM curve
    steps through the exact closed-form products 0.9/0.8/0.7/0.6."""
    from go_osm_ray.pipelines.relq import user_survival
    us_day = 86_400_000_000
    rows = []
    horizon = 100 * us_day
    for u in range(1, 5):        # churners: lifetime u days, long gone
        rows.append((u, 0))
        rows.append((u, u * us_day))
    for u in range(5, 11):       # censored: active at the horizon
        rows.append((u, 50 * us_day))
        rows.append((u, horizon))
    ev = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64)
                       .astype("datetime64[us]"), pa.timestamp("us"))}))
    df = user_survival(ev).to_pandas().sort_values("day") \
        .reset_index(drop=True)
    assert df.day.tolist() == [1, 2, 3, 4]
    assert df.n_risk.tolist() == [10, 9, 8, 7]
    assert np.allclose(df.km6.to_numpy(), [0.9, 0.8, 0.7, 0.6],
                       atol=1e-6)
