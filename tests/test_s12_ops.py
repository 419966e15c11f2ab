"""Session-12 ops: planted properties the parity gates cannot see —
flip-asymmetry zero on mirror-symmetric images, exact blob censuses on
constructed masks, Morisita index closed forms (1.0 one-cell, 0.0
uniform singletons), HHI closed forms (monopoly 1.0, duopoly 0.5)."""

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


def test_flip_asym_zero_on_symmetric(ray_session):
    """A left-right mirror-symmetric image has asym6 == 0 exactly; a
    half-black/half-white split has asym == 765 at every pixel."""
    from go_osm_ray.pipelines.images import image_flip_asym
    ys, xs = np.mgrid[0:16, 0:16]
    sym = np.stack([np.minimum(xs, 15 - xs) * 10] * 3, -1).astype(np.uint8)
    split = np.zeros((16, 16, 3), np.uint8)
    split[:, 8:] = 255
    df = image_flip_asym(_img_ds([sym, split]),
                         concurrency=1).to_pandas().set_index("image_id")
    assert df.loc["t000", "asym6"] == 0.0
    assert df.loc["t000", "max_d"] == 0
    assert df.loc["t001", "asym6"] == 765.0
    assert df.loc["t001", "max_d"] == 765
    assert bool(df["ok"].all())


def test_blob_count_planted_masks(ray_session):
    """Two separated bright squares on black -> exactly 2 blobs of 9 px;
    one bright row -> 1 blob; a diagonal of isolated bright pixels
    (4-connectivity!) -> one blob PER pixel."""
    from go_osm_ray.pipelines.images import image_blob_count
    two = np.zeros((16, 16, 3), np.uint8)
    two[2:5, 2:5] = 255
    two[10:13, 10:13] = 255
    row = np.zeros((16, 16, 3), np.uint8)
    row[8, :] = 255
    diag = np.zeros((16, 16, 3), np.uint8)
    for i in range(0, 16, 2):
        diag[i, i] = 255
    df = image_blob_count(_img_ds([two, row, diag]),
                          concurrency=1).to_pandas().set_index("image_id")
    assert df.loc["t000", "n_blobs"] == 2
    assert df.loc["t000", "max_blob"] == 9
    assert df.loc["t000", "n_fg"] == 18
    assert df.loc["t001", "n_blobs"] == 1
    assert df.loc["t001", "max_blob"] == 16
    assert df.loc["t002", "n_blobs"] == 8
    assert df.loc["t002", "max_blob"] == 1
    assert bool(df["ok"].all())


def _pts_ds(lon, lat):
    from go_osm_ray.geo import morton
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    ph = morton.encode_phash(lon, lat, np.arange(len(lon)) % 4096)
    return ray.data.from_arrow(pa.table({"phash": pa.array(ph)}))


def test_morisita_closed_forms(ray_session):
    """All points in ONE cell -> I = 1 exactly (Q=1 cancels); one point
    per far-apart cell -> I = 0; two cells x two points -> 2*4/12."""
    from go_osm_ray.pipelines.spatial import cell_morisita
    one = cell_morisita(_pts_ds([10.0] * 5, [20.0] * 5)).to_pandas()
    assert one.loc[0, "n_cells"] == 1
    assert one.loc[0, "morisita6"] == 1.0
    lone = cell_morisita(
        _pts_ds([-120.0, -60.0, 0.0, 60.0, 120.0],
                [10.0, -30.0, 50.0, -10.0, 30.0])).to_pandas()
    assert lone.loc[0, "n_cells"] == 5
    assert lone.loc[0, "morisita6"] == 0.0
    duo = cell_morisita(
        _pts_ds([10.0, 10.0, -70.0, -70.0],
                [20.0, 20.0, -40.0, -40.0])).to_pandas()
    assert duo.loc[0, "n_cells"] == 2
    assert duo.loc[0, "n_points"] == 4
    assert abs(duo.loc[0, "morisita6"] - round(8.0 / 12.0, 6)) < 2e-6


def test_supplier_hhi_closed_forms(ray_session):
    """Nation A: one supplier -> HHI 1.0; nation B: two equal suppliers
    -> 0.5; nation C: 90/10 split -> 0.82."""
    from go_osm_ray.pipelines.relq import supplier_hhi
    li = ray.data.from_arrow(pa.table({
        "l_suppkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "l_quantity": pa.array([7.0, 5.0, 5.0, 90.0, 10.0])}))
    supp = ray.data.from_arrow(pa.table({
        "s_suppkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "s_nationkey": pa.array([0, 1, 1, 2, 2], pa.int32())}))
    nat = ray.data.from_arrow(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int32()),
        "n_name": pa.array(["A", "B", "C"], pa.string())}))
    df = supplier_hhi(li, supp, nat).to_pandas().set_index("n_name")
    assert df.loc["A", "hhi6"] == 1.0
    assert df.loc["B", "hhi6"] == 0.5
    assert df.loc["C", "hhi6"] == 0.82
    assert df.loc["C", "total_qty"] == 100
    assert int(df["n_suppliers"].sum()) == 5


def test_weekday_chi2_closed_forms(ray_session):
    """All events of a type on ONE weekday -> chi2 = 6N exactly;
    perfectly uniform over 7 days -> 0."""
    from go_osm_ray.pipelines.relq import events_weekday_chi2
    day = np.int64(86400_000_000)
    # 2024-01-01 is a Monday (epoch day 19723)
    mon = np.int64(19723) * day
    spike = [mon] * 14                      # one weekday only
    flat = [mon + i * day for i in range(7)] * 3   # 3 per weekday
    ts = np.array(spike + flat, np.int64).astype("datetime64[us]")
    et = ["spike"] * 14 + ["flat"] * 21
    ev = ray.data.from_arrow(pa.table({
        "ts": pa.array(ts), "event_type": pa.array(et, pa.string())}))
    df = events_weekday_chi2(ev).to_pandas().set_index("event_type")
    assert df.loc["spike", "chi2_6"] == 6.0 * 14
    assert df.loc["flat", "chi2_6"] == 0.0


def _ways_ds(rows):
    ids = pa.array([r[0] for r in rows], pa.int64())
    refs = pa.array([r[1] for r in rows], pa.list_(pa.int64()))
    return ray.data.from_arrow(pa.table({"id": ids, "refs": refs}))


def test_way_closure_planted(ray_session):
    """Closed ring, open path, and an interior-repeat zig-zag."""
    from go_osm_ray.pipelines.osm import osm_way_closure
    ds = _ways_ds([
        (1, [10, 11, 12, 10]),        # ring: closed, no interior repeat
        (2, [20, 21, 22]),            # open simple path
        (3, [30, 31, 30, 32]),        # open but revisits node 30
    ])
    df = osm_way_closure(ds).to_pandas().set_index("way_id")
    assert bool(df.loc[1, "is_closed"]) and not bool(df.loc[1, "has_repeat"])
    assert df.loc[1, "n_unique"] == 3 and df.loc[1, "n_refs"] == 4
    assert not bool(df.loc[2, "is_closed"])
    assert not bool(df.loc[2, "has_repeat"])
    assert not bool(df.loc[3, "is_closed"]) and bool(df.loc[3, "has_repeat"])


def test_way_shared_segments_planted(ray_session):
    """Two ways sharing a 3-node run share 2 segments; direction must
    not matter (way 3 runs the shared span REVERSED); sharing a single
    node (way 4) contributes nothing."""
    from go_osm_ray.pipelines.osm import way_shared_segments
    ds = _ways_ds([
        (1, [100, 101, 102, 103]),
        (2, [101, 102, 103, 104]),    # shares (101,102),(102,103) with 1
        (3, [103, 102, 200]),         # reversed (102,103) hits 1 and 2
        (4, [103, 300]),              # only node 103 in common
    ])
    df = way_shared_segments(ds).to_pandas()
    got = {(int(r.a), int(r.b)): int(r.n_shared) for r in df.itertuples()}
    assert got[(1, 2)] == 2
    assert got[(1, 3)] == 1
    assert got[(2, 3)] == 1
    assert (1, 4) not in got and (2, 4) not in got and (3, 4) not in got


def test_term_burstiness_closed_forms(ray_session):
    """'aa' occurs 3x in each of 2 docs -> cf 6, df 2, burst 3.0;
    'bb' once per doc in 5 docs -> burst 1.0; rare terms filtered."""
    from go_osm_ray.pipelines.text import term_burstiness
    docs = ["aa aa aa bb", "aa aa aa bb", "bb rare", "bb", "bb zz"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(5)), pa.int64()),
        "text": pa.array(docs, pa.string())}))
    df = term_burstiness(ds, min_cf=5).to_pandas().set_index("token")
    assert df.loc["aa", "cf"] == 6 and df.loc["aa", "df"] == 2
    assert df.loc["aa", "burst6"] == 3.0
    assert df.loc["bb", "burst6"] == 1.0
    assert "rare" not in df.index and "zz" not in df.index


def test_way_modularity_closed_forms(ray_session):
    """Two disjoint 3-cliques in separate blocks -> perfect partition:
    W = m = 6, degrees 2 everywhere, D2 = 2*36, Q = 1 - 1/2 = 0.5."""
    from go_osm_ray.pipelines.osm import way_modularity
    # block = (first_ref - 1)//16: refs 1..16 -> block 0, 17..32 -> 1;
    # each trio shares node 1 (resp. 17) so each block is a 3-clique
    ds = _ways_ds([
        (101, [1, 2]), (102, [1, 3]), (103, [1, 4]),
        (201, [17, 18]), (202, [17, 19]), (203, [17, 20]),
    ])
    df = way_modularity(ds).to_pandas()
    assert df.loc[0, "n_edges"] == 6
    assert df.loc[0, "n_within"] == 6
    assert df.loc[0, "d2_sum"] == 72
    assert df.loc[0, "q6"] == 0.5


def test_crop_retention_planted(ray_session):
    """Mass only inside the center square -> ret 1.0; mass only in the
    trimmed margin -> 0.0; square image -> trivially 1.0."""
    from go_osm_ray.pipelines.images import image_crop_retention
    inside = np.zeros((16, 32, 3), np.uint8)   # crop = cols 8..23
    inside[:, 8:24] = 50
    margin = np.zeros((16, 32, 3), np.uint8)
    margin[:, :8] = 50
    square = np.full((16, 16, 3), 7, np.uint8)
    df = image_crop_retention(_img_ds([inside, margin, square]),
                              concurrency=1).to_pandas() \
        .set_index("image_id")
    assert df.loc["t000", "ret6"] == 1.0
    assert df.loc["t001", "ret6"] == 0.0
    assert df.loc["t002", "ret6"] == 1.0
    assert df.loc["t000", "crop_side"] == 16
    assert bool(df["ok"].all())


def test_relation_member_roles_planted(ray_session):
    """Counts and distinct-relation counts on a hand-built member set."""
    from go_osm_ray.pipelines.osm import relation_member_roles
    mtype = pa.struct([("type", pa.string()), ("ref", pa.int64()),
                      ("role", pa.string())])
    rows = [
        (1, [{"type": "way", "ref": 10, "role": "outer"},
             {"type": "way", "ref": 11, "role": "outer"},
             {"type": "way", "ref": 12, "role": "inner"}]),
        (2, [{"type": "way", "ref": 13, "role": "outer"},
             {"type": "node", "ref": 99, "role": "admin_centre"}]),
    ]
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([r[0] for r in rows], pa.int64()),
        "members": pa.array([r[1] for r in rows], pa.list_(mtype))}))
    df = relation_member_roles(ds).to_pandas() \
        .set_index(["member_type", "role"])
    assert df.loc[("way", "outer"), "n_members"] == 3
    assert df.loc[("way", "outer"), "n_relations"] == 2
    assert df.loc[("way", "inner"), "n_relations"] == 1
    assert df.loc[("node", "admin_centre"), "n_members"] == 1


def test_osm_user_activity_planted(ray_session):
    """Per-uid counts across classes + max version + username."""
    from go_osm_ray.pipelines.osm import osm_user_activity

    def els(uids, users, versions):
        return ray.data.from_arrow(pa.table({
            "uid": pa.array(uids, pa.int64()),
            "user": pa.array(users, pa.string()),
            "version": pa.array(versions, pa.int32())}))

    nodes = els([1, 1, 2], ["alice", "alice", "bob"], [1, 5, 2])
    ways = els([1], ["alice"], [3])
    rels = els([2, 2], ["bob", "bob"], [7, 1])
    df = osm_user_activity(nodes, ways, rels).to_pandas().set_index("uid")
    assert df.loc[1, "n_nodes"] == 2 and df.loc[1, "n_ways"] == 1
    assert df.loc[1, "n_relations"] == 0 and df.loc[1, "max_version"] == 5
    assert df.loc[2, "n_relations"] == 2 and df.loc[2, "max_version"] == 7
    assert df.loc[1, "user"] == "alice" and df.loc[2, "user"] == "bob"


def test_way_tag_length_stats_ordered_sum(ray_session):
    """Two tagged ways on a meridian: per-key totals are the exact sum
    of the shared way_length_m outputs (1 degree of latitude)."""
    from go_osm_ray.pipelines.osm import way_length_m, way_tag_length_stats
    tagt = pa.list_(pa.struct([("key", pa.string()),
                               ("value", pa.string())]))
    nodes = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "lon": pa.array([0.0, 0.0, 0.0]),
        "lat": pa.array([0.0, 1.0, 2.0])}))
    ways = ray.data.from_arrow(pa.table({
        "id": pa.array([10, 11], pa.int64()),
        "refs": pa.array([[1, 2], [2, 3]], pa.list_(pa.int64())),
        "tags": pa.array([[{"key": "highway", "value": "a"}],
                          [{"key": "highway", "value": "b"}]], tagt)}))
    wl = way_length_m(nodes, ways).to_pandas().set_index("way_id")
    df = way_tag_length_stats(nodes, ways).to_pandas().set_index("key")
    expect = round(wl.loc[10, "len_m3"] + wl.loc[11, "len_m3"], 3)
    assert df.loc["highway", "n_ways"] == 2
    assert abs(df.loc["highway", "total_len3"] - expect) < 2e-3


def test_partition_skew_stats_planted(ray_session):
    """3 points in one cell + 1 in another -> Q=2, N=4, max 3,
    skew = 3*2/4 = 1.5; uniform singletons -> skew 1.0."""
    from go_osm_ray.pipelines.spatial import partition_skew_stats
    hot = partition_skew_stats(
        _pts_ds([10.0, 10.0, 10.0, -70.0],
                [20.0, 20.0, 20.0, -40.0])).to_pandas()
    assert hot.loc[0, "n_cells"] == 2 and hot.loc[0, "max_n"] == 3
    assert hot.loc[0, "skew6"] == 1.5
    flat = partition_skew_stats(
        _pts_ds([-120.0, 0.0, 120.0], [10.0, 50.0, -30.0])).to_pandas()
    assert flat.loc[0, "skew6"] == 1.0


def test_image_corpus_card_planted(ray_session):
    """Exact metadata rollup on two formats, no decode involved."""
    from go_osm_ray.pipelines.images import image_corpus_card
    from go_osm_ray import codecs as cd
    px16 = np.zeros((16, 16, 3), np.uint8)
    px24 = np.zeros((24, 16, 3), np.uint8)   # h=24, w=16
    rows = [("bmp", px16, "four words here ok"),
            ("bmp", px24, "xy"),
            ("raw", px16, "z")]
    blobs = [cd.encode(p, f) for f, p, _ in rows]
    ds = ray.data.from_arrow(pa.table({
        "fmt": pa.array([r[0] for r in rows], pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array([16, 16, 16], pa.int32()),
        "h": pa.array([16, 24, 16], pa.int32()),
        "caption": pa.array([r[2] for r in rows], pa.string())}))
    df = image_corpus_card(ds).to_pandas().set_index("fmt")
    assert df.loc["bmp", "n"] == 2
    assert df.loc["bmp", "total_px"] == 16 * 16 + 16 * 24
    assert df.loc["bmp", "mean_h6"] == 20.0
    assert df.loc["bmp", "mean_caption_len6"] == 10.0
    assert df.loc["raw", "total_bytes"] == len(blobs[2])


def test_cell_luma_morans_planted(ray_session):
    """Four images in four rook-adjacent cells with a bright/dark
    checker layout -> strong NEGATIVE autocorrelation; a matching
    bright/bright dark/dark split along x -> positive."""
    from go_osm_ray.geo import morton
    from go_osm_ray.pipelines.images import cell_luma_morans
    from go_osm_ray import codecs as cd
    # res 7 -> 128x128 grid; pick lon/lat at four adjacent cell centers
    n = 128
    def lonlat(x, y):
        lon = (x + 0.5) / n * 360.0 - 180.0
        import math as m
        lat = m.degrees(m.atan(m.sinh(m.pi * (1.0 - 2.0 * (y + 0.5) / n))))
        return lon, lat
    cells = [(60, 60), (61, 60), (60, 61), (61, 61)]
    # checker: bright at (60,60),(61,61); dark at the other two
    vals = {(60, 60): 200, (61, 61): 200, (61, 60): 10, (60, 61): 10}
    lons, lats, blobs = [], [], []
    for (x, y) in cells:
        lon, lat = lonlat(x, y)
        lons.append(lon)
        lats.append(lat)
        blobs.append(cd.encode(
            np.full((8, 8, 3), vals[(x, y)], np.uint8), "bmp"))
    ph = morton.encode_phash(np.array(lons), np.array(lats),
                             np.arange(4))
    ds = ray.data.from_arrow(pa.table({
        "phash": pa.array(ph),
        "fmt": pa.array(["bmp"] * 4, pa.string()),
        "bytes": pa.array(blobs, pa.binary())}))
    df = cell_luma_morans(ds, res=7).to_pandas()
    assert df.loc[0, "n_cells"] == 4
    assert df.loc[0, "w_pairs"] == 8
    assert df.loc[0, "morans_i6"] == -1.0   # perfect checker


def test_ab_conversion_lift_planted(ray_session):
    """Even users 1/2 converted, odd users 2/2 -> lift exactly 2.0."""
    from go_osm_ray.pipelines.relq import ab_conversion_lift
    rows = [(2, "view"), (2, "purchase"), (4, "view"),
            (1, "purchase"), (3, "purchase"), (1, "click")]
    ev = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string())}))
    df = ab_conversion_lift(ev).to_pandas().set_index("variant")
    assert df.loc[0, "n_users"] == 2 and df.loc[0, "n_converted"] == 1
    assert df.loc[1, "n_users"] == 2 and df.loc[1, "n_converted"] == 2
    assert df.loc[0, "rate6"] == 0.5 and df.loc[1, "rate6"] == 1.0
    assert (df["lift6"] == 2.0).all()


def test_cell_node_way_ols_exact_line(ray_session):
    """Two far-apart cells with (x, y) = (1, 2) and (2, 4) -> the OLS
    line is exactly y = 2x (slope 2, intercept 0)."""
    from go_osm_ray.pipelines.spatial import cell_node_way_ols
    # cell A: node 1; cell B: nodes 2,3. way vertices: A gets [1,1]
    # (a 2-vertex way on node 1 twice), B gets [2,3,2,3]
    nodes = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "lon": pa.array([10.0, -70.0, -70.0]),
        "lat": pa.array([20.0, -40.0, -40.0])}))
    ways = ray.data.from_arrow(pa.table({
        "id": pa.array([100, 101, 102], pa.int64()),
        "refs": pa.array([[1, 1], [2, 3], [2, 3]],
                         pa.list_(pa.int64()))}))
    df = cell_node_way_ols(nodes, ways).to_pandas()
    assert df.loc[0, "n_cells"] == 2
    assert df.loc[0, "sx"] == 3 and df.loc[0, "sy"] == 6
    assert df.loc[0, "slope6"] == 2.0
    assert df.loc[0, "intercept6"] == 0.0
