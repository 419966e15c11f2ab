"""Session-13 ops: planted closed forms the parity gates cannot see —
local clustering coefficient on a constructed triangle + pendant graph,
dyadic EWMA exactness and window exclusion, RLE run counts on planted
flat / striped / checker images."""

import numpy as np
import pyarrow as pa
import ray
import ray.data

from go_osm_ray import codecs


def _ways_ds(rows):
    ids = pa.array([r[0] for r in rows], pa.int64())
    refs = pa.array([r[1] for r in rows], pa.list_(pa.int64()))
    return ray.data.from_arrow(pa.table({"id": ids, "refs": refs}))


def _img_ds(pixel_arrays, fmt="bmp"):
    blobs = [codecs.encode(px, fmt) for px in pixel_arrays]
    return ray.data.from_arrow(pa.table({
        "image_id": pa.array([f"t{i:03d}" for i in range(len(blobs))],
                             pa.string()),
        "fmt": pa.array([fmt] * len(blobs), pa.string()),
        "bytes": pa.array(blobs, pa.binary())}))


def test_way_clustering_coef_triangle_plus_pendant(ray_session):
    """Ways 1-2-3 pairwise share nodes (a triangle); way 4 hangs off
    way 1 only.  Triangle members with no other neighbours have
    lcc = 1; way 1 (deg 3, its neighbours 2-3 connected, 4 isolated
    from them) has lcc = 2*1/(3*2) = 1/3; the pendant way 4 (deg 1)
    reports 0 by the deg<2 convention."""
    from go_osm_ray.pipelines.osm import way_clustering_coef
    ds = _ways_ds([
        (1, [10, 11, 14]),   # shares 10 w/2, 11 w/3, 14 w/4
        (2, [10, 12]),       # shares 12 w/3
        (3, [11, 12]),
        (4, [14, 15]),
    ])
    df = way_clustering_coef(ds).to_pandas().set_index("way_id")
    assert df.loc[1, "deg"] == 3 and df.loc[1, "n_tri"] == 1
    assert df.loc[1, "lcc6"] == round(1 / 3, 6)
    for w in (2, 3):
        assert df.loc[w, "deg"] == 2
        assert df.loc[w, "n_tri"] == 1
        assert df.loc[w, "lcc6"] == 1.0
    assert df.loc[4, "deg"] == 1 and df.loc[4, "n_tri"] == 0
    assert df.loc[4, "lcc6"] == 0.0


def test_way_clustering_coef_matches_triangle_census(ray_session):
    """Sum of per-vertex triangle counts == 3 * way_triangles' global
    count on a denser planted mesh (each triangle attributed thrice)."""
    from go_osm_ray.pipelines.osm import way_clustering_coef, way_triangles
    rows = []
    # K4 on ways 1..4 via six shared nodes + a chain 5-6-7
    shared = {(1, 2): 100, (1, 3): 101, (1, 4): 102,
              (2, 3): 103, (2, 4): 104, (3, 4): 105}
    refs = {w: [] for w in range(1, 8)}
    for (a, b), n in shared.items():
        refs[a].append(n)
        refs[b].append(n)
    refs[5] = [102, 200]   # 5 joins 1 and 4's shared node -> K5 on {1,4,5}? no:
    # node 102 is shared by ways 1, 4 AND 5 -> edges (1,4),(1,5),(4,5)
    refs[6] = [200, 201]
    refs[7] = [201]
    for w, r in refs.items():
        rows.append((w, r + [w * 1000]))  # unique tail node, no new edges
    ds = _ways_ds(rows)
    lcc = way_clustering_coef(ds).to_pandas()
    tri = way_triangles(_ways_ds(rows), num_parts=4).take_all()[0]
    assert lcc["n_tri"].sum() == 3 * int(tri["n_triangles"])
    # every K4 member touches C(3,2)=3 triangles of the K4 plus the
    # {1,4,5} triangle for ways 1 and 4
    byid = lcc.set_index("way_id")
    assert byid.loc[2, "n_tri"] == 3 and byid.loc[3, "n_tri"] == 3
    assert byid.loc[1, "n_tri"] == 4 and byid.loc[4, "n_tri"] == 4
    assert byid.loc[5, "n_tri"] == 1
    assert byid.loc[7, "deg"] == 1 and byid.loc[7, "lcc6"] == 0.0


def _events_ds(day_counts):
    """day_counts: list of (day_str, event_type, n)."""
    ts, et = [], []
    for day, typ, n in day_counts:
        for _ in range(n):
            ts.append(np.datetime64(day + "T12:00:00", "us"))
            et.append(typ)
    return ray.data.from_arrow(pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array(et, pa.string())}))


def test_events_ewma_dyadic_closed_form(ray_session):
    """Counts 1/2/4 on the last three days: s = 2^21 + 2^23 + 2^25,
    ewma = s/2^24 = 0.125 + 0.5 + 2 = 2.625 EXACTLY (dyadic rationals,
    no float rounding)."""
    from go_osm_ray.pipelines.relq import events_ewma
    ds = _events_ds([("1995-03-01", "click", 1),
                     ("1995-03-02", "click", 2),
                     ("1995-03-03", "click", 4)])
    df = events_ewma(ds).to_pandas().set_index("event_type")
    assert df.loc["click", "n_days"] == 3
    assert df.loc["click", "s_scaled"] == (1 << 21) + (2 << 22) + (4 << 23)
    assert df.loc["click", "ewma6"] == 2.625


def test_events_ewma_window_exclusion(ray_session):
    """An event 24+ days before the global max day contributes nothing;
    a type with ALL its events outside the window reports no in-window
    days (n_days 0 rows are absent from the per-type fold)."""
    from go_osm_ray.pipelines.relq import events_ewma
    ds = _events_ds([("1995-03-30", "new", 1),
                     ("1995-03-07", "new", 8),     # i = 0 (oldest in-window)
                     ("1995-03-06", "new", 999),   # dmax-24: excluded
                     ("1995-01-01", "old", 7)])    # far outside
    df = events_ewma(ds).to_pandas().set_index("event_type")
    assert df.loc["new", "n_days"] == 2
    assert df.loc["new", "s_scaled"] == (1 << 23) + 8
    assert "old" not in df.index


def test_image_rle_ratio_planted(ray_session):
    """Flat image -> one run per row (rle = 1/w); vertical stripes of
    width 1 alternating quantization levels -> w runs per row (rle = 1);
    HORIZONTAL stripes stay one run per row (row-wise runs only)."""
    from go_osm_ray.pipelines.images import image_rle_ratio
    flat = np.full((8, 8, 3), 40, np.uint8)
    vstripe = np.zeros((8, 8, 3), np.uint8)
    vstripe[:, 1::2] = 200   # levels 0 and 600//96=6 alternate
    hstripe = np.zeros((8, 8, 3), np.uint8)
    hstripe[1::2, :] = 200
    df = image_rle_ratio(_img_ds([flat, vstripe, hstripe]),
                         concurrency=1).to_pandas().set_index("image_id")
    assert df.loc["t000", "n_runs"] == 8 and df.loc["t000", "rle6"] == 0.125
    assert df.loc["t001", "n_runs"] == 64 and df.loc["t001", "rle6"] == 1.0
    assert df.loc["t002", "n_runs"] == 8
    assert bool(df["ok"].all())


TAGS_TYPE = pa.list_(pa.struct([("key", pa.string()),
                                ("value", pa.string())]))


def test_lev_banded_matches_scalar_dp(ray_session):
    """The vectorized banded DP agrees with a scalar full-matrix
    Levenshtein on every pair with true distance <= 2, including
    length-differing pairs and band-edge cases; distance-3+ pairs
    report a value > 2 (never an under-estimate)."""
    from go_osm_ray.pipelines.images import _lev_banded

    def scalar_lev(a, b):
        d = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            prev, d[0] = d[0], i
            for j in range(1, len(b) + 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (a[i - 1] != b[j - 1]))
        return d[len(b)]

    pairs = [("caption 7 red", "caption 7 red"),      # 0
             ("caption 7 red", "caption 9 red"),      # 1 sub
             ("caption 7 red", "caption 71 red"),     # 1 ins
             ("caption 7 red", "caption 712 red"),    # 2 ins
             ("caption 12 red", "caption 21 red"),    # 2 subs
             ("caption 7 red", "caption 7 blu"),      # 3: excluded
             ("abc", "xyz"),                          # 3: excluded
             ("a", "abc"), ("abcd", "ab")]            # len edges
    got = _lev_banded([p[0] for p in pairs], [p[1] for p in pairs], 2)
    for (a, b), g in zip(pairs, got):
        true = scalar_lev(a, b)
        if true <= 2:
            assert g == true, (a, b, g, true)
        else:
            assert g > 2, (a, b, g, true)


def test_events_interp_midpoint(ray_session):
    """Events at day-1 noon (v=0) and day-3 noon (v=10): the day-2 and
    day-3 midnights interpolate to 2.5 and 7.5 exactly; a grid point
    needs events on BOTH sides (single-event types emit nothing)."""
    from go_osm_ray.pipelines.relq import events_interp
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["a", "a", "lone"], pa.string()),
        "ts": pa.array([np.datetime64("1995-03-01T12:00:00", "us"),
                        np.datetime64("1995-03-03T12:00:00", "us"),
                        np.datetime64("1995-03-05T00:00:00", "us")],
                       pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "value": pa.array([0.0, 10.0, 9.0], pa.float64())}))
    df = events_interp(ds).to_pandas()
    a = df[df.event_type == "a"].set_index("day")["interp6"]
    assert a.loc[np.datetime64("1995-03-02")] == 2.5
    assert a.loc[np.datetime64("1995-03-03")] == 7.5
    assert len(a) == 2
    assert (df.event_type == "lone").sum() == 0


def test_events_interp_duplicate_ts_bracketing(ray_session):
    """Two events at the same timestamp: the bracket uses the LAST in
    (ts, event_id) order — v0 comes from event_id 2, not 1."""
    from go_osm_ray.pipelines.relq import events_interp
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["a"] * 3, pa.string()),
        "ts": pa.array([np.datetime64("1995-03-01T12:00:00", "us"),
                        np.datetime64("1995-03-01T12:00:00", "us"),
                        np.datetime64("1995-03-02T12:00:00", "us")],
                       pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "value": pa.array([100.0, 0.0, 24.0], pa.float64())}))
    df = events_interp(ds).to_pandas().set_index("day")
    # midnight of 03-02: w = 12h/24h = 0.5 from v0=0 (event 2) to 24
    assert df.loc[np.datetime64("1995-03-02"), "interp6"] == 12.0


def test_amenity_colocation_closed_form(ray_session):
    """cell1 {cafe, bench}, cell2 {cafe}, cell3 {fuel}: Q=3 cells,
    n_cafe=2, n_bench=1 -> PMI(bench, cafe) = ln(1*3/(1*2)) = ln 1.5;
    duplicate nodes of the same value in one cell do not inflate
    presence counts."""
    import math

    from go_osm_ray.pipelines.osm import amenity_colocation

    def tag(v):
        return [{"key": "amenity", "value": v}]

    # res 9 cells: use far-apart lons (one cell is ~0.7 deg wide)
    ds = ray.data.from_arrow(pa.table({
        "lon": pa.array([10.0, 10.0, 10.0, 50.0, 90.0], pa.float64()),
        "lat": pa.array([20.0, 20.0, 20.0, 20.0, 20.0], pa.float64()),
        "tags": pa.array([tag("cafe"), tag("bench"), tag("cafe"),
                          tag("cafe"), tag("fuel")], TAGS_TYPE)}))
    df = amenity_colocation(ds, res=9).to_pandas()
    assert len(df) == 1
    assert df.loc[0, "a"] == "bench" and df.loc[0, "b"] == "cafe"
    assert df.loc[0, "n_ab"] == 1
    assert df.loc[0, "pmi6"] == round(math.log(1.5), 6)


def test_cell_tag_entropy_closed_forms(ray_session):
    """Monoculture cell (3x cafe) -> ent 0; a 2+2 cell -> ln 2; counts
    and value censuses exact."""
    import math

    from go_osm_ray.pipelines.osm import cell_tag_entropy

    def tag(v):
        return [{"key": "amenity", "value": v}]

    ds = ray.data.from_arrow(pa.table({
        "lon": pa.array([10.0] * 3 + [90.0] * 4, pa.float64()),
        "lat": pa.array([20.0] * 3 + [40.0] * 4, pa.float64()),
        "tags": pa.array([tag("cafe")] * 3
                         + [tag("fuel"), tag("fuel"),
                            tag("bank"), tag("bank")], TAGS_TYPE)}))
    df = cell_tag_entropy(ds, res=9).to_pandas().sort_values("n_nodes")
    assert list(df["n_nodes"]) == [3, 4]
    assert list(df["n_values"]) == [1, 2]
    assert df.iloc[0]["ent6"] == 0.0
    assert df.iloc[1]["ent6"] == round(math.log(2), 6)


def test_way_two_hop_path_and_star(ray_session):
    """Path 1-2-3-4-5: middle way 3 reaches {1, 5} at distance 2; a
    star center reaches nothing new while its leaves reach each other."""
    from go_osm_ray.pipelines.osm import way_two_hop
    path = _ways_ds([
        (1, [10, 11]), (2, [11, 12]), (3, [12, 13]),
        (4, [13, 14]), (5, [14, 15]),
    ])
    df = way_two_hop(path).to_pandas().set_index("way_id")
    assert df.loc[3, "deg"] == 2 and df.loc[3, "n_two_hop"] == 2
    assert df.loc[1, "deg"] == 1 and df.loc[1, "n_two_hop"] == 1
    assert df.loc[2, "n_two_hop"] == 1   # reaches 4 (1 is direct, 3 direct)

    # star: ways 11..14 all share node 100 -> a 4-clique, NO 2-hop pairs
    star = _ways_ds([(i, [100, i]) for i in range(11, 15)])
    sf = way_two_hop(star).to_pandas()
    assert (sf["deg"] == 3).all() and (sf["n_two_hop"] == 0).all()


def test_embed_angular_hist_planted(ray_session):
    """Three orthogonal axes + one duplicate: 3 orthogonal pairs land in
    the cos=0 bucket (10), the duplicate pair in the top bucket (19),
    and the two mixed pairs with the duplicate's twin also at 0."""
    from go_osm_ray.pipelines.vectors import embed_angular_hist
    vecs = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
            [0.0, 0.0, 1.0, 0.0], [1.0, 0.0, 0.0, 0.0]]
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32()))}))
    df = embed_angular_hist(ds, id_cap=10).to_pandas() \
        .set_index("bucket")["n_pairs"]
    assert df.loc[10] == 5    # all orthogonal pairs: cos 0 -> floor(10)
    assert df.loc[19] == 1    # the exact duplicate: cos 1 -> clipped 19
    assert df.sum() == 6


def test_orders_backlog_ledger(ray_session):
    """Two orders open day 1, one ships fully day 2 (its later line is
    the close), the other never ships -> backlog 2, 1; a day-3 order
    closing same-day nets zero."""
    from go_osm_ray.pipelines.relq import orders_backlog
    d = lambda s: np.datetime64(s + "T09:30:00", "us")  # noqa: E731
    orders = ray.data.from_arrow(pa.table({
        "o_orderdate": pa.array([d("1995-01-01"), d("1995-01-01"),
                                 d("1995-01-03")], pa.timestamp("us"))}))
    lineitem = ray.data.from_arrow(pa.table({
        "l_orderkey": pa.array([1, 1, 3], pa.int64()),
        "l_shipdate": pa.array([d("1995-01-01"), d("1995-01-02"),
                                d("1995-01-03")], pa.timestamp("us"))}))
    df = orders_backlog(orders, lineitem).to_pandas().set_index("day")
    assert df.loc[np.datetime64("1995-01-01"), "backlog"] == 2
    assert df.loc[np.datetime64("1995-01-02"), "backlog"] == 1
    assert df.loc[np.datetime64("1995-01-03"), "backlog"] == 1
    assert df.loc[np.datetime64("1995-01-03"), "n_closed"] == 1


def test_event_type_affinity_closed_form(ray_session):
    """users {1,2} do a; {2,3} do b; {9} does c: J(a,b) = 1/3, c pairs
    absent; repeat events do not inflate the user sets."""
    from go_osm_ray.pipelines.relq import event_type_affinity
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 2, 2, 2, 3, 9], pa.int64()),
        "event_type": pa.array(["a", "a", "a", "b", "b", "c"],
                               pa.string())}))
    df = event_type_affinity(ds).to_pandas()
    assert len(df) == 1
    assert df.loc[0, "a"] == "a" and df.loc[0, "b"] == "b"
    assert df.loc[0, "n_ab"] == 1
    assert df.loc[0, "jac6"] == round(1 / 3, 6)


def test_price_qty_corr_exact_lines(ray_session):
    """Perfectly linear price = qty * $1 -> corr 1; anti-linear ->
    -1; constant price -> 0 by the zero-variance convention."""
    from go_osm_ray.pipelines.relq import price_qty_corr
    ds = ray.data.from_arrow(pa.table({
        "l_returnflag": pa.array(["L"] * 3 + ["A"] * 3 + ["C"] * 3,
                                 pa.string()),
        "l_quantity": pa.array([1.0, 2.0, 3.0] * 3, pa.float64()),
        "l_extendedprice": pa.array([1.0, 2.0, 3.0,
                                     3.0, 2.0, 1.0,
                                     5.0, 5.0, 5.0], pa.float64())}))
    df = price_qty_corr(ds).to_pandas().set_index("l_returnflag")
    assert df.loc["L", "corr6"] == 1.0
    assert df.loc["A", "corr6"] == -1.0
    assert df.loc["C", "corr6"] == 0.0
    assert df.loc["L", "sum_cents"] == 600


def test_image_exposure_clip_planted(ray_session):
    """Half-black/half-white split: 32 crushed + 32 blown of 64; a
    mid-gray image clips nothing."""
    from go_osm_ray.pipelines.images import image_exposure_clip
    split = np.zeros((8, 8, 3), np.uint8)
    split[:, 4:] = 255
    gray = np.full((8, 8, 3), 128, np.uint8)
    df = image_exposure_clip(_img_ds([split, gray]),
                             concurrency=1).to_pandas() \
        .set_index("image_id")
    assert df.loc["t000", "n_black"] == 32
    assert df.loc["t000", "n_white"] == 32
    assert df.loc["t000", "black6"] == 0.5
    assert df.loc["t001", "n_black"] == 0 and df.loc["t001", "n_white"] == 0


def test_image_channel_balance_planted(ray_session):
    """A pure-red image puts ALL energy in R (share 1.0, skew r); a
    neutral gray image splits exactly 1/3 each and ties break to r."""
    from go_osm_ray.pipelines.images import image_channel_balance
    red = np.zeros((8, 8, 3), np.uint8)
    red[:, :, 0] = 200
    gray = np.full((8, 8, 3), 77, np.uint8)
    df = image_channel_balance(_img_ds([red, gray]),
                               concurrency=1).to_pandas() \
        .set_index("image_id")
    assert df.loc["t000", "share_r6"] == 1.0
    assert df.loc["t000", "skew_channel"] == "r"
    assert df.loc["t001", "share_r6"] == round(1 / 3, 6)
    assert df.loc["t001", "skew_channel"] == "r"


def test_image_noise_mad_planted(ray_session):
    """Flat image -> Laplacian 0 everywhere (mad 0); a single bright
    interior pixel perturbs only 5 interior Laplacians, so the median
    stays 0; a checkerboard maximizes |lap| = 8*765... per-pixel 8*lum
    swing -> mad > 0."""
    from go_osm_ray.pipelines.images import image_noise_mad
    flat = np.full((8, 8, 3), 50, np.uint8)
    spot = np.full((8, 8, 3), 50, np.uint8)
    spot[4, 4] = 250
    checker = np.zeros((8, 8, 3), np.uint8)
    checker[(np.add.outer(np.arange(8), np.arange(8)) % 2) == 1] = 255
    df = image_noise_mad(_img_ds([flat, spot, checker]),
                         concurrency=1).to_pandas().set_index("image_id")
    assert df.loc["t000", "mad_lap"] == 0
    assert df.loc["t000", "n_interior"] == 36
    assert df.loc["t001", "mad_lap"] == 0
    assert df.loc["t002", "mad_lap"] > 0
    assert bool(df["ok"].all())


def test_phash_bit_balance_planted(ray_session):
    """Hand-built phash words: bit 0 set in 3/4 rows, bit 63 in 1/4,
    bit 7 in none — exact shares."""
    from go_osm_ray.pipelines.spatial import phash_bit_balance
    words = np.array([1, 1, 1, np.int64(-2**63)], np.int64)  # bit63 = sign
    ds = ray.data.from_arrow(pa.table({"phash": pa.array(words,
                                                         pa.int64())}))
    df = phash_bit_balance(ds).to_pandas().set_index("bit")
    assert df.loc[0, "n_ones"] == 3 and df.loc[0, "share6"] == 0.75
    assert df.loc[63, "n_ones"] == 1 and df.loc[63, "share6"] == 0.25
    assert df.loc[7, "n_ones"] == 0
    assert len(df) == 64 and (df["n_rows"] == 4).all()


def test_vocab_growth_planted(ray_session):
    """Three docs: doc 0 "a b a", doc 20 "a c", doc 40 "d d".
    Checkpoint 16 sees only doc 0 (3 tokens, 2 distinct); 32 adds doc
    20 (5 tokens, 3 distinct); 64+ saturates at (7, 4)."""
    from go_osm_ray.pipelines.text import vocab_growth
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 20, 40], pa.int64()),
        "text": pa.array(["a b a", "a c", "d d"], pa.string())}))
    df = vocab_growth(ds).to_pandas().set_index("checkpoint")
    assert df.loc[16, "n_tokens"] == 3 and df.loc[16, "n_distinct"] == 2
    assert df.loc[32, "n_tokens"] == 5 and df.loc[32, "n_distinct"] == 3
    assert df.loc[64, "n_tokens"] == 7 and df.loc[64, "n_distinct"] == 4
    assert df.loc[1 << 20, "n_tokens"] == 7
    assert len(df) == 17


def test_osm_changeset_stats_planted(ray_session):
    """Changeset 5 spans two classes and two users; changeset 9 is a
    single-node edit."""
    from go_osm_ray.pipelines.osm import osm_changeset_stats

    def tbl(rows):
        return ray.data.from_arrow(pa.table({
            "changeset": pa.array([r[0] for r in rows], pa.int64()),
            "uid": pa.array([r[1] for r in rows], pa.int64())}))

    nodes = tbl([(5, 1), (5, 1), (9, 7)])
    ways = tbl([(5, 2)])
    rels = tbl([])
    df = osm_changeset_stats(nodes, ways, rels).to_pandas() \
        .set_index("changeset")
    assert df.loc[5, "n_nodes"] == 2 and df.loc[5, "n_ways"] == 1
    assert df.loc[5, "n_total"] == 3 and df.loc[5, "n_users"] == 2
    assert df.loc[9, "n_total"] == 1 and df.loc[9, "n_users"] == 1


def test_way_degree_hist_planted(ray_session):
    """Star of 4 ways (3-clique degrees) + isolated way -> degrees
    {0: 1, 3: 4}; shares sum to 1."""
    from go_osm_ray.pipelines.osm import way_degree_hist
    ds = _ways_ds([(i, [100, i]) for i in range(1, 5)] + [(9, [999])])
    df = way_degree_hist(ds).to_pandas().set_index("degree")
    assert df.loc[0, "n_ways"] == 1
    assert df.loc[3, "n_ways"] == 4
    assert df.loc[3, "share6"] == 0.8
    assert abs(df["share6"].sum() - 1.0) < 1e-9


def test_doc_token_len_hist_planted(ray_session):
    """Tokens of lengths 1,1,2,4 across two docs; multi-space splits
    produce no empty tokens."""
    from go_osm_ray.pipelines.text import doc_token_len_hist
    ds = ray.data.from_arrow(pa.table({
        "text": pa.array(["a  b zz", "zzzz"], pa.string())}))
    df = doc_token_len_hist(ds).to_pandas().set_index("token_len")
    assert df.loc[1, "n_tokens"] == 2
    assert df.loc[2, "n_tokens"] == 1
    assert df.loc[4, "n_tokens"] == 1
    assert df.loc[1, "share6"] == 0.5


def test_funnel_latency_hist_planted(ray_session):
    """User 1 converts in 1.5 days (floor 1); user 2's purchase
    precedes the view (excluded); user 3 converts same-day (lag 0);
    repeat purchases don't matter (firsts only)."""
    from go_osm_ray.pipelines.relq import funnel_latency_hist
    d = lambda s: np.datetime64(s, "us")  # noqa: E731
    rows = [
        (1, "view", d("1995-01-01T00:00:00")),
        (1, "purchase", d("1995-01-02T12:00:00")),
        (1, "purchase", d("1995-01-09T00:00:00")),
        (2, "purchase", d("1995-01-01T00:00:00")),
        (2, "view", d("1995-01-02T00:00:00")),
        (3, "view", d("1995-01-05T06:00:00")),
        (3, "purchase", d("1995-01-05T07:00:00")),
    ]
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us"))}))
    df = funnel_latency_hist(ds).to_pandas().set_index("lag_days")
    assert df.loc[0, "n_users"] == 1
    assert df.loc[1, "n_users"] == 1
    assert df["n_users"].sum() == 2


def test_osm_ref_integrity_planted(ray_session):
    """Way references node 99 which does not exist (dangling, counted
    per occurrence); relation members split by type and checked against
    the right id set."""
    from go_osm_ray.pipelines.osm import osm_ref_integrity
    nodes = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2], pa.int64())}))
    ways = ray.data.from_arrow(pa.table({
        "id": pa.array([10], pa.int64()),
        "refs": pa.array([[1, 2, 99, 99]], pa.list_(pa.int64()))}))
    mt = pa.list_(pa.struct([("type", pa.string()), ("ref", pa.int64()),
                             ("role", pa.string())]))
    rels = ray.data.from_arrow(pa.table({
        "members": pa.array([[{"type": "node", "ref": 1, "role": ""},
                              {"type": "node", "ref": 77, "role": ""},
                              {"type": "way", "ref": 10, "role": ""},
                              {"type": "way", "ref": 20, "role": ""}]],
                            mt)}))
    df = osm_ref_integrity(nodes, ways, rels).to_pandas() \
        .set_index("ref_kind")
    assert df.loc["way->node", "n_refs"] == 4
    assert df.loc["way->node", "n_distinct"] == 3
    assert df.loc["way->node", "n_dangling"] == 2
    assert df.loc["rel->node", "n_dangling"] == 1
    assert df.loc["rel->way", "n_dangling"] == 1


def test_knn_mutuality_planted(ray_session):
    """Two tight pairs: (0,1) nearly parallel and (2,3) nearly parallel
    -> every vector's NN is its twin, all mutual; adding a hub vector 4
    equidistant keeps the pairs mutual while 4 points at the smallest-id
    winner without reciprocation."""
    from go_osm_ray.pipelines.vectors import knn_mutuality
    vecs = [[1.0, 0.01, 0.0], [1.0, 0.0, 0.0],
            [0.0, 1.0, 0.01], [0.0, 1.0, 0.0],
            [1.0, 1.0, 0.0]]
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(list(range(5)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32()))}))
    df = knn_mutuality(ds, id_cap=16).to_pandas().set_index("vec_id")
    assert df.loc[0, "nn_id"] == 1 and bool(df.loc[0, "mutual"])
    assert df.loc[1, "nn_id"] == 0 and bool(df.loc[1, "mutual"])
    assert df.loc[2, "nn_id"] == 3 and bool(df.loc[2, "mutual"])
    assert not bool(df.loc[4, "mutual"])


def test_events_runlength_planted(ray_session):
    """User 1: a a b a -> runs a:2, b:1, a:1; user 2: b b b -> one run
    of 3; cross-user runs never merge."""
    from go_osm_ray.pipelines.relq import events_runlength
    d0 = np.datetime64("1995-01-01T00:00:00", "us")
    rows = [(1, "a"), (1, "a"), (1, "b"), (1, "a"),
            (2, "b"), (2, "b"), (2, "b")]
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "ts": pa.array([d0 + np.timedelta64(i, "s")
                        for i in range(len(rows))], pa.timestamp("us"))}))
    df = events_runlength(ds).to_pandas() \
        .set_index(["event_type", "run_len"])["n_runs"]
    assert df.loc[("a", 2)] == 1
    assert df.loc[("a", 1)] == 1
    assert df.loc[("b", 1)] == 1
    assert df.loc[("b", 3)] == 1


def test_format_bpp_stats_planted(ray_session):
    """Known byte lengths over declared dims: exact totals and ratios;
    min/max track the per-image extremes."""
    from go_osm_ray.pipelines.images import format_bpp_stats
    ds = ray.data.from_arrow(pa.table({
        "fmt": pa.array(["x", "x", "y"], pa.string()),
        "bytes": pa.array([bytes(64), bytes(16), bytes(10)],
                          pa.binary()),
        "w": pa.array([4, 4, 5], pa.int32()),
        "h": pa.array([4, 4, 2], pa.int32())}))
    df = format_bpp_stats(ds).to_pandas().set_index("fmt")
    assert df.loc["x", "total_bytes"] == 80
    assert df.loc["x", "total_px"] == 32
    assert df.loc["x", "bpp6"] == 2.5
    assert df.loc["x", "min_bpp6"] == 1.0 and df.loc["x", "max_bpp6"] == 4.0
    assert df.loc["y", "bpp6"] == 1.0


def test_tag_value_cardinality_planted(ray_session):
    """Key 'a' has values x(2), y(1) -> top x; ties break lexically."""
    from go_osm_ray.pipelines.osm import tag_value_cardinality
    ds = ray.data.from_arrow(pa.table({
        "tags": pa.array([
            [{"key": "a", "value": "x"}, {"key": "b", "value": "m"}],
            [{"key": "a", "value": "x"}],
            [{"key": "a", "value": "y"}, {"key": "b", "value": "n"}],
        ], TAGS_TYPE)}))
    df = tag_value_cardinality(ds).to_pandas().set_index("key")
    assert df.loc["a", "n_uses"] == 3 and df.loc["a", "n_values"] == 2
    assert df.loc["a", "top_value"] == "x" and df.loc["a", "top_n"] == 2
    assert df.loc["b", "top_value"] == "m"   # 1-1 tie -> lexically first


def test_cell_node_usage_planted(ray_session):
    """Cell A: nodes 1,2 with node 1 referenced -> share 0.5; cell B:
    unreferenced node -> share 0; refs to unknown ids change nothing."""
    from go_osm_ray.pipelines.spatial import cell_node_usage
    nodes = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "lon": pa.array([10.0, 10.0, 90.0], pa.float64()),
        "lat": pa.array([20.0, 20.0, 40.0], pa.float64())}))
    ways = ray.data.from_arrow(pa.table({
        "refs": pa.array([[1, 999]], pa.list_(pa.int64()))}))
    df = cell_node_usage(nodes, ways, res=9).to_pandas() \
        .sort_values("n_nodes", ascending=False)
    assert list(df["n_nodes"]) == [2, 1]
    assert list(df["n_way_nodes"]) == [1, 0]
    assert df.iloc[0]["share6"] == 0.5 and df.iloc[1]["share6"] == 0.0


def test_way_clustering_coef_partitioned_path(ray_session):
    """broadcast_threshold=0 forces the fully partitioned plan; results
    must match the broadcast plan exactly on the planted mesh."""
    from go_osm_ray.pipelines.osm import way_clustering_coef
    rows = [(1, [10, 11, 14]), (2, [10, 12]), (3, [11, 12]),
            (4, [14, 15])]
    a = way_clustering_coef(_ways_ds(rows)).to_pandas() \
        .sort_values("way_id").reset_index(drop=True)
    b = way_clustering_coef(_ways_ds(rows), broadcast_threshold=0) \
        .to_pandas().sort_values("way_id").reset_index(drop=True)
    assert a.equals(b)


def test_image_luma_percentiles_planted(ray_session):
    """Flat image -> all percentiles equal, spread 0; a left-dark /
    right-bright half split (64 px) -> p5 = 0, p95 = 765, p50 at the
    lower-index convention (idx 31 -> dark half)."""
    from go_osm_ray.pipelines.images import image_luma_percentiles
    flat = np.full((8, 8, 3), 100, np.uint8)
    split = np.zeros((8, 8, 3), np.uint8)
    split[:, 4:] = 255
    df = image_luma_percentiles(_img_ds([flat, split]),
                                concurrency=1).to_pandas() \
        .set_index("image_id")
    assert df.loc["t000", "spread"] == 0
    assert df.loc["t000", "p50"] == 300
    assert df.loc["t001", "p5"] == 0 and df.loc["t001", "p95"] == 765
    assert df.loc["t001", "p50"] == 0       # idx (64-1)*50//100 = 31
    assert df.loc["t001", "spread"] == 765


def test_image_quadrant_luma_planted(ray_session):
    """A bright top-left quadrant dominates; the odd center row/column
    of a 9x9 image is excluded so the quadrant sums stay congruent."""
    from go_osm_ray.pipelines.images import image_quadrant_luma
    img = np.zeros((9, 9, 3), np.uint8)
    img[:4, :4] = 200
    img[4, :] = 255   # center row: excluded from all quadrants
    df = image_quadrant_luma(_img_ds([img]),
                             concurrency=1).to_pandas().iloc[0]
    assert df["sum_tl"] == 600 * 16
    assert df["sum_tr"] == 0 and df["sum_bl"] == 0 and df["sum_br"] == 0
    assert df["bright_quad"] == "tl"
    assert df["imbalance6"] == 0.0          # min = 0 convention


def test_supplier_ship_lag_planted(ray_session):
    """Supplier 7's two lines lag 1 and 3 days (mean 2); supplier 8's
    line ships same-day (lag 0)."""
    from go_osm_ray.pipelines.relq import supplier_ship_lag
    d = lambda s: np.datetime64(s + "T10:00:00", "us")  # noqa: E731
    orders = ray.data.from_arrow(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([d("1995-01-01"), d("1995-02-01")],
                                pa.timestamp("us"))}))
    lineitem = ray.data.from_arrow(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_suppkey": pa.array([7, 7, 8], pa.int64()),
        "l_shipdate": pa.array([d("1995-01-02"), d("1995-01-04"),
                                d("1995-02-01")], pa.timestamp("us"))}))
    df = supplier_ship_lag(lineitem, orders).to_pandas() \
        .set_index("l_suppkey")
    assert df.loc[7, "n_lines"] == 2
    assert df.loc[7, "total_lag_days"] == 4
    assert df.loc[7, "mean_lag6"] == 2.0
    assert df.loc[8, "total_lag_days"] == 0


def test_user_sync_pairs_planted(ray_session):
    """Users 1 and 2 collide in two distinct minutes (n_shared 2, with
    duplicate events inside a minute counted once); user 3 shares one
    minute with 1 only."""
    from go_osm_ray.pipelines.relq import user_sync_pairs
    d = lambda s: np.datetime64(s, "us")  # noqa: E731
    rows = [(1, d("1995-01-01T10:00:05")), (2, d("1995-01-01T10:00:40")),
            (2, d("1995-01-01T10:00:59")),              # same minute dup
            (1, d("1995-01-01T11:30:00")), (2, d("1995-01-01T11:30:30")),
            (3, d("1995-01-01T10:00:01")),
            (3, d("1995-01-02T09:00:00"))]
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us"))}))
    df = user_sync_pairs(ds).to_pandas().set_index(["a", "b"])
    assert df.loc[(1, 2), "n_shared"] == 2
    assert df.loc[(1, 3), "n_shared"] == 1
    assert df.loc[(2, 3), "n_shared"] == 1
    assert len(df) == 3


def test_label_cohesion_planted(ray_session):
    """Label 0: two identical vectors -> every member cosine to the
    centroid sum is 1.0 exactly; label 1: two orthogonal vectors ->
    each member's cosine to the diagonal sum is cos 45deg."""
    import math

    from go_osm_ray.pipelines.vectors import label_cohesion
    vecs = [[1.0, 0.0], [1.0, 0.0], [1.0, 0.0], [0.0, 1.0]]
    labs = [0, 0, 1, 1]
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(list(range(4)), pa.int64()),
        "label": pa.array(labs, pa.int32()),
        "embedding": pa.array(vecs, pa.list_(pa.float32()))}))
    df = label_cohesion(ds).to_pandas().set_index("label")
    assert df.loc[0, "n"] == 2
    assert df.loc[0, "mean_cos6"] == 1.0 and df.loc[0, "min_cos6"] == 1.0
    assert df.loc[1, "mean_cos6"] == round(math.cos(math.pi / 4), 6)


def test_caption_id_consistency_planted(ray_session):
    """One caption number mismatches its id suffix."""
    from go_osm_ray.pipelines.images import caption_id_consistency
    ds = ray.data.from_arrow(pa.table({
        "image_id": pa.array(["img000000000007", "img000000000008"],
                             pa.string()),
        "caption": pa.array(["synthetic caption 7 red cat",
                             "synthetic caption 9 blue dog"],
                            pa.string())}))
    df = caption_id_consistency(ds).to_pandas().iloc[0]
    assert df["n_images"] == 2 and df["n_match"] == 1
    assert df["n_mismatch"] == 1 and df["match6"] == 0.5


def test_way_chaikin_smooth_planted(ray_session):
    """A right-angle 3-point way cuts its corner: segment points at
    1/4 and 3/4, endpoints kept; the corner point itself vanishes."""
    from go_osm_ray.pipelines.osm import way_chaikin_smooth
    nodes = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "lon": pa.array([0.0, 4.0, 4.0], pa.float64()),
        "lat": pa.array([0.0, 0.0, 4.0], pa.float64())}))
    ways = _ways_ds([(9, [1, 2, 3])])
    df = way_chaikin_smooth(nodes, ways).to_pandas() \
        .set_index("pt_idx").sort_index()
    assert (df.loc[0, "lon7"], df.loc[0, "lat7"]) == (0.0, 0.0)
    assert (df.loc[1, "lon7"], df.loc[1, "lat7"]) == (1.0, 0.0)
    assert (df.loc[2, "lon7"], df.loc[2, "lat7"]) == (3.0, 0.0)
    assert (df.loc[3, "lon7"], df.loc[3, "lat7"]) == (4.0, 1.0)
    assert (df.loc[4, "lon7"], df.loc[4, "lat7"]) == (4.0, 3.0)
    assert (df.loc[5, "lon7"], df.loc[5, "lat7"]) == (4.0, 4.0)
    assert len(df) == 6
    # corner (4, 0) is gone
    assert not ((df["lon7"] == 4.0) & (df["lat7"] == 0.0)).any()


def test_way_dead_ends_planted(ray_session):
    """A cul-de-sac chain: way 1 shares node 11 with way 2, so each
    has one dead end; the closed ring way 3 has one (shared) endpoint
    node, dead because no other way touches it."""
    from go_osm_ray.pipelines.osm import way_dead_ends
    ds = _ways_ds([
        (1, [10, 11]),
        (2, [11, 12]),
        (3, [20, 21, 22, 20]),
    ])
    df = way_dead_ends(ds).to_pandas().set_index("way_id")
    assert df.loc[1, "n_endpoints"] == 2 and df.loc[1, "n_dead"] == 1
    assert df.loc[2, "n_endpoints"] == 2 and df.loc[2, "n_dead"] == 1
    assert df.loc[3, "n_endpoints"] == 1 and df.loc[3, "n_dead"] == 1


def test_corpus_vocab_overlap_planted(ray_session):
    """Docs vocab {a, b, c}; captions vocab {b, c, d}: shared 2,
    union 4 -> jac 0.5; case folding unifies B/b."""
    from go_osm_ray.pipelines.text import corpus_vocab_overlap
    docs = ray.data.from_arrow(pa.table({
        "text": pa.array(["a B c", "b c"], pa.string())}))
    imgs = ray.data.from_arrow(pa.table({
        "caption": pa.array(["b c d", "d"], pa.string())}))
    df = corpus_vocab_overlap(docs, imgs).to_pandas().iloc[0]
    assert df["n_doc_vocab"] == 3 and df["n_cap_vocab"] == 3
    assert df["n_shared"] == 2 and df["jac6"] == 0.5


def test_way_length_gini_closed_forms(ray_session):
    """Two equal-length ways -> gini 0; lengths in ratio 1:3 ->
    gini = 0.25 exactly (n=2 closed form (x2-x1)/(2(x1+x2)))."""
    from go_osm_ray.pipelines.osm import way_length_gini
    # equator degrees: haversine is proportional to dlon
    nodes = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "lon": pa.array([0.0, 1.0, 10.0, 13.0], pa.float64()),
        "lat": pa.array([0.0, 0.0, 0.0, 0.0], pa.float64())}))
    equal = _ways_ds([(1, [1, 2]), (2, [1, 2])])
    df = way_length_gini(nodes, equal).to_pandas().iloc[0]
    assert df["n_ways"] == 2 and df["gini6"] == 0.0
    skew = _ways_ds([(1, [1, 2]), (2, [3, 4])])   # 1 deg vs 3 deg
    df2 = way_length_gini(nodes, skew).to_pandas().iloc[0]
    assert abs(df2["gini6"] - 0.25) < 1e-4


def test_weekly_mix_drift_closed_forms(ray_session):
    """Two weeks with identical mixes -> js 0 for both; a week that is
    ALL type-a against a 50/50 global mix drifts by a positive JS."""
    from go_osm_ray.pipelines.relq import weekly_mix_drift

    def ev(day, typ, n):
        return [(np.datetime64(day + "T12:00:00", "us"), typ)] * n

    rows = ev("1995-01-02", "a", 2) + ev("1995-01-02", "b", 2) \
        + ev("1995-01-09", "a", 2) + ev("1995-01-09", "b", 2)
    ds = ray.data.from_arrow(pa.table({
        "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows], pa.string())}))
    df = weekly_mix_drift(ds).to_pandas()
    assert (df["js6"] == 0.0).all() and len(df) == 2

    rows2 = ev("1995-01-02", "a", 4) + ev("1995-01-09", "b", 4)
    ds2 = ray.data.from_arrow(pa.table({
        "ts": pa.array([r[0] for r in rows2], pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows2], pa.string())}))
    df2 = weekly_mix_drift(ds2).to_pandas()
    # closed form: JS((1,0) vs (.5,.5)) = 0.5*ln(4/3) + 0.25*ln(4/3)
    # + ... ~ 0.2157
    assert (df2["js6"] > 0.2).all() and (df2["js6"] < 0.25).all()


def test_order_status_consistency_planted(ray_session):
    """An 'F' order with one 'O' line -> that cell is a violation; the
    agreeing cells are not; 'P' orders are exempt."""
    from go_osm_ray.pipelines.relq import order_status_consistency
    orders = ray.data.from_arrow(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderstatus": pa.array(["F", "O", "P"], pa.string())}))
    lineitem = ray.data.from_arrow(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_linestatus": pa.array(["F", "O", "O", "F"], pa.string())}))
    df = order_status_consistency(orders, lineitem).to_pandas() \
        .set_index(["o_orderstatus", "l_linestatus"])
    assert not bool(df.loc[("F", "F"), "violation"])
    assert bool(df.loc[("F", "O"), "violation"])
    assert not bool(df.loc[("O", "O"), "violation"])
    assert not bool(df.loc[("P", "F"), "violation"])
    assert int(df["n_lines"].sum()) == 4


def test_events_id_ts_inversions_planted(ray_session):
    """User 1: ids 1,2,3 with the ts of 2 and 3 swapped -> exactly one
    inverted pair of three; equal timestamps never count."""
    from go_osm_ray.pipelines.relq import events_id_ts_inversions
    d0 = np.datetime64("1995-01-01T00:00:00", "us")
    h = np.timedelta64(1, "h")
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([d0, d0 + 2 * h, d0 + h, d0, d0],
                       pa.timestamp("us"))}))
    df = events_id_ts_inversions(ds).to_pandas().iloc[0]
    assert df["n_users"] == 2
    assert df["total_pairs"] == 4      # C(3,2) + C(2,2->1)
    assert df["n_inversions"] == 1
    assert df["inv6"] == 0.25


def test_way_cell_span_planted(ray_session):
    """A way inside one res-11 cell spans 1; a continent-hopping way
    spans as many cells as points; duplicate vertices dedup."""
    from go_osm_ray.pipelines.osm import way_cell_span
    nodes = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "lon": pa.array([10.0, 10.0001, 60.0, -60.0], pa.float64()),
        "lat": pa.array([20.0, 20.0001, 40.0, -40.0], pa.float64())}))
    ways = _ways_ds([(1, [1, 2, 1]), (2, [1, 3, 4])])
    df = way_cell_span(nodes, ways, res=11).to_pandas() \
        .set_index("way_id")
    assert df.loc[1, "n_points"] == 3 and df.loc[1, "n_cells"] == 1
    assert df.loc[2, "n_points"] == 3 and df.loc[2, "n_cells"] == 3


def test_node_tag_hist_planted(ray_session):
    """0/1/2-tag nodes tally exactly."""
    from go_osm_ray.pipelines.osm import node_tag_hist
    ds = ray.data.from_arrow(pa.table({
        "tags": pa.array([[], [{"key": "a", "value": "x"}],
                          [{"key": "a", "value": "x"},
                           {"key": "b", "value": "y"}], []], TAGS_TYPE)}))
    df = node_tag_hist(ds).to_pandas().set_index("n_tags")
    assert df.loc[0, "n_nodes"] == 2 and df.loc[0, "share6"] == 0.5
    assert df.loc[1, "n_nodes"] == 1 and df.loc[2, "n_nodes"] == 1


def test_embed_norm_hist_planted(ray_session):
    """Unit vectors land in bucket bit_length(512^2) = 19; a zero
    vector lands in bucket 0; a double-norm vector two bits higher."""
    from go_osm_ray.pipelines.vectors import embed_norm_hist
    vecs = [[1.0, 0.0], [0.0, 1.0], [0.0, 0.0], [2.0, 0.0]]
    ds = ray.data.from_arrow(pa.table({
        "embedding": pa.array(vecs, pa.list_(pa.float32()))}))
    df = embed_norm_hist(ds).to_pandas().set_index("bucket")
    assert df.loc[19, "n_vecs"] == 2      # 512^2 = 2^18 -> 19 bits
    assert df.loc[0, "n_vecs"] == 1
    assert df.loc[21, "n_vecs"] == 1      # (1024)^2 = 2^20 -> 21 bits


def test_cell_image_node_ratio_planted(ray_session):
    """Cell with 2 images / 1 node -> ratio 2; an images-only cell
    reports ratio 0 by the empty-denominator convention."""
    from go_osm_ray.geo import morton
    from go_osm_ray.pipelines.spatial import cell_image_node_ratio
    lon = np.array([10.0, 10.0, 90.0])
    lat = np.array([20.0, 20.0, 40.0])
    ph = morton.encode_phash(lon, lat, np.arange(3))
    images = ray.data.from_arrow(pa.table({"phash": pa.array(ph)}))
    nodes = ray.data.from_arrow(pa.table({
        "lon": pa.array([10.0], pa.float64()),
        "lat": pa.array([20.0], pa.float64())}))
    df = cell_image_node_ratio(images, nodes).to_pandas() \
        .sort_values("n_images", ascending=False).reset_index(drop=True)
    assert df.loc[0, "n_images"] == 2 and df.loc[0, "n_nodes"] == 1
    assert df.loc[0, "ratio6"] == 2.0
    assert df.loc[1, "n_images"] == 1 and df.loc[1, "n_nodes"] == 0
    assert df.loc[1, "ratio6"] == 0.0


def test_tagged_way_connectivity_planted(ray_session):
    """Tagged ways form a triangle (deg 2 each); the untagged way is
    isolated (deg 0) — means 2.0 and 0.0."""
    from go_osm_ray.pipelines.osm import tagged_way_connectivity
    tag = [{"key": "highway", "value": "primary"}]
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "refs": pa.array([[10, 11], [10, 12], [11, 12], [99]],
                         pa.list_(pa.int64())),
        "tags": pa.array([tag, tag, tag, []], TAGS_TYPE)}))
    df = tagged_way_connectivity(ds).to_pandas().set_index("tagged")
    assert df.loc[True, "n_ways"] == 3
    assert df.loc[True, "mean_deg6"] == 2.0
    assert df.loc[False, "n_ways"] == 1
    assert df.loc[False, "mean_deg6"] == 0.0


def test_session_bounce_rate_planted(ray_session):
    """User 1: a two-event session starting with 'view' then (after a
    2h gap) a single-event 'click' session; user 2: one 'view' bounce.
    view: 2 sessions 1 bounce; click: 1 session 1 bounce."""
    from go_osm_ray.pipelines.relq import session_bounce_rate
    d0 = np.datetime64("1995-01-01T00:00:00", "us")
    m = np.timedelta64(1, "m")
    h = np.timedelta64(1, "h")
    rows = [(1, d0, 1, "view"), (1, d0 + 5 * m, 2, "purchase"),
            (1, d0 + 3 * h, 3, "click"),
            (2, d0, 4, "view")]
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string())}))
    df = session_bounce_rate(ds).to_pandas().set_index("first_type")
    assert df.loc["view", "n_sessions"] == 2
    assert df.loc["view", "n_bounce"] == 1
    assert df.loc["view", "bounce6"] == 0.5
    assert df.loc["click", "n_sessions"] == 1
    assert df.loc["click", "n_bounce"] == 1


def test_doc_len_token_corr_planted(ray_session):
    """Perfectly linear chars-per-token corpus -> corr 1.0; constant
    token counts with varying chars -> 0 by the zero-variance rule."""
    from go_osm_ray.pipelines.text import doc_len_token_corr
    ds = ray.data.from_arrow(pa.table({
        "lang": pa.array(["en"] * 3 + ["de"] * 2, pa.string()),
        "n_chars": pa.array([10, 20, 30, 7, 19], pa.int64()),
        "text": pa.array(["a", "a b", "a b c", "x y", "p q"],
                         pa.string())}))
    df = doc_len_token_corr(ds).to_pandas().set_index("lang")
    assert df.loc["en", "corr6"] == 1.0
    assert df.loc["en", "sum_tokens"] == 6
    assert df.loc["de", "corr6"] == 0.0


def test_doc_ttr_planted(ray_session):
    """'a a a' -> ttr 1/3; all-distinct doc -> 1.0; case folding
    unifies A/a."""
    from go_osm_ray.pipelines.text import doc_ttr
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a A a", "x y z", "m m n"], pa.string())}))
    df = doc_ttr(ds).to_pandas().set_index("doc_id")
    assert df.loc[1, "n_types"] == 1 and df.loc[1, "ttr6"] == round(1/3, 6)
    assert df.loc[2, "ttr6"] == 1.0
    assert df.loc[3, "n_types"] == 2


def test_user_journey_endpoints_planted(ray_session):
    """User 1 starts 'signup' ends 'purchase'; the single-event user's
    first == last."""
    from go_osm_ray.pipelines.relq import user_journey_endpoints
    d0 = np.datetime64("1995-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    rows = [(1, d0, 1, "signup"), (1, d0 + s, 2, "view"),
            (1, d0 + 2 * s, 3, "purchase"),
            (2, d0, 4, "error")]
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string())}))
    df = user_journey_endpoints(ds).to_pandas() \
        .set_index(["first_type", "last_type"])["n_users"]
    assert df.loc[("signup", "purchase")] == 1
    assert df.loc[("error", "error")] == 1
    assert len(df) == 2


def test_component_size_hist_planted(ray_session):
    """A 3-way chain + a 2-way pair + an isolated way -> sizes
    {3: 1, 2: 1, 1: 1}."""
    from go_osm_ray.pipelines.osm import component_size_hist
    ds = _ways_ds([
        (1, [10, 11]), (2, [11, 12]), (3, [12, 13]),
        (4, [20, 21]), (5, [21, 22]),
        (9, [99]),
    ])
    df = component_size_hist(ds).to_pandas().set_index("size")
    assert df.loc[3, "n_components"] == 1
    assert df.loc[2, "n_components"] == 1
    assert df.loc[1, "n_components"] == 1
    # shares are 6dp-rounded thirds: sum = 0.999999
    assert abs(df["share6"].sum() - 1.0) < 2e-6


def test_embed_exact_dupes_planted(ray_session):
    """Two identical vectors + one lattice-distinct vector -> one dup;
    sub-half-grid jitter (< 1/1024) quantizes identical and counts as
    a dup too."""
    from go_osm_ray.pipelines.vectors import embed_exact_dupes
    vecs = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0],
            [1.0 + 0.0001, 0.0]]     # rounds to the same lattice point
    ds = ray.data.from_arrow(pa.table({
        "embedding": pa.array(vecs, pa.list_(pa.float32()))}))
    df = embed_exact_dupes(ds).to_pandas().iloc[0]
    assert df["n_vecs"] == 4
    assert df["n_distinct"] == 2
    assert df["n_dupes"] == 2
    assert df["max_group"] == 3


def test_user_error_profile_planted(ray_session):
    """User with 1/2 errors -> decile 5; all-error user clips to 9;
    error-free user decile 0."""
    from go_osm_ray.pipelines.relq import user_error_profile
    rows = [(1, "error"), (1, "view"),
            (2, "error"), (2, "error"),
            (3, "view")]
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string())}))
    df = user_error_profile(ds).to_pandas().set_index("decile")
    assert df.loc[5, "n_users"] == 1
    assert df.loc[9, "n_users"] == 1
    assert df.loc[0, "n_users"] == 1


def test_image_colorfulness_planted(ray_session):
    """Grayscale image -> spread 0; pure red -> spread = R at every
    pixel."""
    from go_osm_ray.pipelines.images import image_colorfulness
    gray = np.full((8, 8, 3), 123, np.uint8)
    red = np.zeros((8, 8, 3), np.uint8)
    red[:, :, 0] = 200
    df = image_colorfulness(_img_ds([gray, red]),
                            concurrency=1).to_pandas() \
        .set_index("image_id")
    assert df.loc["t000", "spread_sum"] == 0
    assert df.loc["t000", "mean_spread6"] == 0.0
    assert df.loc["t001", "mean_spread6"] == 200.0
