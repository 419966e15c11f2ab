"""Session-10 ops: planted-configuration properties the parity gates
cannot see — Frechet order-sensitivity vs Hausdorff, DDA pixel
coverage geometry, sliding-window peak exactness across block layouts,
burstiness limits, ABC class boundary behavior, MMR diversity actually
diverging from pure relevance."""

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _mk_ways(way_refs: dict[int, list[int]],
             node_coords: dict[int, tuple[float, float]]):
    ways = ray.data.from_arrow(pa.table({
        "id": pa.array(sorted(way_refs), pa.int64()),
        "refs": pa.array([way_refs[w] for w in sorted(way_refs)],
                         pa.list_(pa.int64()))}))
    nids = sorted(node_coords)
    nodes = ray.data.from_arrow(pa.table({
        "id": pa.array(nids, pa.int64()),
        "lon": pa.array([node_coords[i][0] for i in nids], pa.float64()),
        "lat": pa.array([node_coords[i][1] for i in nids], pa.float64())}))
    return ways, nodes


def test_frechet_order_sensitive_vs_hausdorff(ray_session):
    """Two ways tracing the SAME point set in opposite directions:
    Hausdorff is ~0 (sets coincide) but discrete Frechet must pay the
    full end-to-end span — the property that distinguishes the ops."""
    from go_osm_ray.pipelines.osm import way_frechet, way_hausdorff
    coords = {1: (0.0, 0.0), 2: (0.01, 0.0), 3: (0.02, 0.0)}
    ways, nodes = _mk_ways({10: [1, 2, 3], 20: [3, 2, 1]}, coords)
    h = way_hausdorff(ways, nodes).to_pandas()
    f = way_frechet(ways, nodes).to_pandas()
    assert len(h) == 1 and len(f) == 1
    assert h.hausdorff3[0] == 0.0
    # reversed trace forces one side to span >= half the full length
    assert f.frechet3[0] > 1000.0  # 0.02 deg lon ~ 2.2 km


def test_frechet_identical_traces_zero(ray_session):
    from go_osm_ray.pipelines.osm import way_frechet
    coords = {1: (0.0, 0.0), 2: (0.01, 0.005), 3: (0.02, 0.0)}
    ways, nodes = _mk_ways({10: [1, 2, 3], 20: [1, 2, 3]}, coords)
    f = way_frechet(ways, nodes).to_pandas()
    assert len(f) == 1 and f.frechet3[0] == 0.0


def test_frechet_lower_bounded_by_hausdorff(ray_session):
    """Discrete Frechet >= discrete Hausdorff on every pair (textbook
    inequality) — checked on the real sf0.001 way graph."""
    import __ray_entry__ as E
    f = E.queries()["way_frechet"]("/root/testdata/sf0.001").to_pandas()
    h = E.queries()["way_hausdorff"]("/root/testdata/sf0.001").to_pandas()
    m = f.merge(h, on=["a", "b"])
    assert len(m) == len(f) == len(h) > 0
    assert (m.frechet3 >= m.hausdorff3 - 1e-9).all()


def test_way_rasterize_single_segment_pixels(ray_session):
    """A horizontal segment spanning N pixels of one tile row covers
    exactly N distinct pixels with N visits; a degenerate zero-length
    way covers exactly 1."""
    from go_osm_ray.geo.tiles import tile_xy
    from go_osm_ray.pipelines.raster import way_rasterize
    # pick lons mapping to distinct pixels at z18 along lat=0
    lon0, lon1 = 10.0, 10.01
    x0, _ = tile_xy(np.array([lon0]), np.array([0.0]), 18)
    x1, _ = tile_xy(np.array([lon1]), np.array([0.0]), 18)
    npix = int(x1[0] - x0[0]) + 1
    coords = {1: (lon0, 0.0), 2: (lon1, 0.0), 3: (50.0, 20.0)}
    ways, nodes = _mk_ways({10: [1, 2], 20: [3, 3]}, coords)
    out = way_rasterize(ways, nodes).to_pandas()
    assert int(out[out.n_px > 1].n_px.sum()) == npix
    # way 20's zero-length segment is one DDA sample on one pixel
    assert int(out.visits.sum()) == npix + 1
    assert (out.visits >= out.n_px).all()


def test_events_peak_rate_block_invariance_and_exactness(ray_session):
    """Planted bursts: user 1 fires 5 events inside one hour plus
    stragglers; user 2 is perfectly spread.  Peak must be exact and
    independent of block layout; duplicate timestamps at the window
    anchor must all count (the searchsorted-left contract)."""
    from go_osm_ray.pipelines.relq import events_peak_rate
    base = np.int64(1_700_000_000_000_000)
    h = 3_600_000_000
    rows = []
    # user 1: 5 in one window (two at the same ts), then 2 far away
    for off in [0, 0, 10, 20, h - 1_000_000, 3 * h, 7 * h]:
        rows.append((1, base + off))
    # user 2: one event every 2 hours
    for i in range(6):
        rows.append((2, base + i * 2 * h))
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array(np.array([r[1] for r in rows], np.int64)
                                 .astype("datetime64[us]"))})
    for blocks in (1, 5):
        out = events_peak_rate(
            ray.data.from_arrow(t).repartition(blocks)).to_pandas() \
            .set_index("user_id").peak_n
        assert int(out[1]) == 5
        assert int(out[2]) == 1


def test_events_burstiness_limits(ray_session):
    """Perfectly periodic gaps -> sigma 0 -> B = -1; a single huge gap
    among tiny ones pushes B toward +1 (must be > 0)."""
    from go_osm_ray.pipelines.relq import events_burstiness
    base = np.int64(1_700_000_000_000_000)
    rows = [(1, base + i * 60_000_000) for i in range(10)]
    offs = [0, 1, 2, 3, 4, 3_600_000]  # ms-ish ticks then a huge gap
    rows += [(2, base + o * 1_000_000) for o in offs]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array(np.array([r[1] for r in rows], np.int64)
                                 .astype("datetime64[us]"))})
    out = events_burstiness(ray.data.from_arrow(t)).to_pandas() \
        .set_index("user_id")
    assert out.loc[1].burst6 == -1.0
    # one outlier among 5 gaps caps B at (sqrt(5)-1)/(sqrt(5)+1) ~ 0.38
    assert out.loc[2].burst6 > 0.3


def test_customer_abc_boundaries(ray_session):
    """Hand-sized Lorenz curve: revenues 50/30/15/5 with an exact 80%
    prefix — the boundary customer (cum_before = 80%) must fall OUT of
    class A per the strict '< pct' rule."""
    from go_osm_ray.pipelines.relq import customer_abc
    t = pa.table({"o_custkey": pa.array([1, 2, 3, 4], pa.int64()),
                  "o_totalprice": pa.array([50.0, 30.0, 15.0, 5.0])})
    out = customer_abc(ray.data.from_arrow(t)).to_pandas() \
        .set_index("abc_class")
    # cum_before: 1->0%, 2->50%, 3->80% (NOT < 80 -> B), 4->95% (-> C)
    assert int(out.loc["A"].n_customers) == 2
    assert int(out.loc["B"].n_customers) == 1
    assert int(out.loc["C"].n_customers) == 1
    assert abs(out.share6.sum() - 1.0) < 1e-9


def test_mmr_diverges_from_pure_relevance(ray_session):
    """Planted: query q; two near-identical highly-relevant vectors and
    one orthogonal-ish medium one.  Pure top-2 keeps the twins; MMR at
    lam=0.5 must swap in the diverse vector at rank 2."""
    from go_osm_ray.pipelines.vectors import mmr_select
    q = np.array([1.0, 0.0, 0.0, 0.0])
    a = np.array([0.999, 0.04, 0.0, 0.0])   # twin 1
    b = np.array([0.999, 0.041, 0.0, 0.0])  # twin 2
    c = np.array([0.6, 0.0, 0.8, 0.0])      # diverse, lower relevance
    emb = pa.table({
        "vec_id": pa.array([100, 101, 102], pa.int64()),
        "embedding": pa.array([list(a), list(b), list(c)],
                              pa.list_(pa.float64()))})
    qt = pa.table({"vec_id": pa.array([0], pa.int64()),
                   "embedding": pa.array([list(q)],
                                         pa.list_(pa.float64()))})
    out = mmr_select(ray.data.from_arrow(emb), ray.put(qt), k=2,
                     lam=0.5).to_pandas().sort_values("rank")
    assert list(out.vec_id) == [100, 102]


def test_keyword_extract_rank_contract(ray_session):
    """Ranks are dense 1..k per doc, scores non-increasing, and the
    top keyword of a doc with one clearly rare repeated term is that
    term."""
    from go_osm_ray.pipelines.scoring import keyword_extract
    docs = ["common common zebra zebra zebra",
            "common common common apple",
            "common banana banana"]
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(docs)})
    out = keyword_extract(ray.data.from_arrow(t), n_docs=3, k=2) \
        .to_pandas().sort_values(["doc_id", "rank"])
    for _, g in out.groupby("doc_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (np.diff(g.score6) <= 1e-12).all()
    assert out[out.doc_id == 1].iloc[0].term == "zebra"
    assert out[out.doc_id == 3].iloc[0].term == "banana"


def test_way_turn_stats_geometry(ray_session):
    """Collinear way turns 0; an L-shaped way turns ~90 at its corner
    (equirectangular at lat 0 is exact there)."""
    from go_osm_ray.pipelines.osm import way_turn_stats
    coords = {1: (0.0, 0.0), 2: (0.01, 0.0), 3: (0.02, 0.0),
              4: (0.02, 0.01)}
    ways, nodes = _mk_ways({10: [1, 2, 3], 20: [1, 2, 4]}, coords)
    out = way_turn_stats(ways, nodes).to_pandas().set_index("way_id")
    assert out.loc[10].total_turn6 == 0.0
    assert int(out.loc[10].n_turns) == 1
    assert 40.0 < out.loc[20].total_turn6 < 90.0  # bends toward node 4


def test_way_pseudo_diameter_chain(ray_session):
    """Three ways chained by shared endpoints: one component of 3 ways
    with pseudo-diameter exactly 2; an isolated way reports 0."""
    from go_osm_ray.pipelines.osm import way_pseudo_diameter
    refs = {10: [1, 2], 20: [2, 3], 30: [3, 4], 40: [7, 8]}
    coords = {i: (float(i) / 100, 0.0) for i in range(1, 9)}
    ways, _ = _mk_ways(refs, coords)
    out = way_pseudo_diameter(ways).to_pandas().set_index("component")
    assert int(out.loc[10].n_ways) == 3
    assert int(out.loc[10].diameter) == 2
    assert int(out.loc[40].n_ways) == 1
    assert int(out.loc[40].diameter) == 0


def test_cell_image_mosaic_block_invariance(ray_session):
    """The contact sheet is a pure function of the cell's id-sorted
    image set — block layout must not change any crc."""
    import __ray_entry__ as E
    from go_osm_ray.pipelines.images import cell_image_mosaic
    ds = E._read_gen("/root/testdata/sf0.001", "images",
                     ["image_id", "fmt", "bytes", "phash"])
    a = cell_image_mosaic(ds).to_pandas().sort_values("cell") \
        .reset_index(drop=True)
    b = cell_image_mosaic(ds.repartition(7)).to_pandas() \
        .sort_values("cell").reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert (a.crc.values == b.crc.values).all()
    assert (a.n_imgs <= 4).all()


def test_image_transcode_bounds(ray_session):
    """qnt5 is 5-bit lossy: round-trip PSNR must clear the usable bar
    everywhere and byte sizes must be positive and format-consistent."""
    import __ray_entry__ as E
    out = E.queries()["image_transcode"]("/root/testdata/sf0.001") \
        .to_pandas()
    assert len(out) == 2000
    assert (out.psnr6 > 25.0).all()
    assert (out.out_bytes > 0).all() and (out.in_bytes > 0).all()


def test_osm_tag_cooccurrence_planted(ray_session):
    """3 ways: {a,b}, {a,b}, {a} -> n_pair(a,b)=2, PMI =
    ln(2*3/(3*2)) = 0; duplicate keys within one way count once."""
    from go_osm_ray.pipelines.osm import osm_tag_cooccurrence
    tag_t = pa.list_(pa.struct([("key", pa.string()),
                                ("value", pa.string())]))
    rows = [[{"key": "a", "value": "1"}, {"key": "b", "value": "2"},
             {"key": "a", "value": "3"}],
            [{"key": "a", "value": "1"}, {"key": "b", "value": "2"}],
            [{"key": "a", "value": "9"}]]
    ways = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "tags": pa.array(rows, tag_t)}))
    out = osm_tag_cooccurrence(ways, 3).to_pandas()
    assert len(out) == 1
    assert out.iloc[0].k1 == "a" and out.iloc[0].k2 == "b"
    assert int(out.iloc[0].n_pair) == 2
    assert out.iloc[0].pmi6 == 0.0


def test_events_autocorr_alternating(ray_session):
    """A strict high/low alternating daily series has lag-1
    autocorrelation -1."""
    from go_osm_ray.pipelines.relq import events_autocorr
    base = np.int64(1_700_000_000_000_000)
    day = 86_400_000_000
    rows = []
    for d in range(10):
        n = 3 if d % 2 == 0 else 1
        for i in range(n):
            rows.append(base + d * day + i)
    t = pa.table({"event_type": pa.array(["x"] * len(rows)),
                  "ts": pa.array(np.array(rows, np.int64)
                                 .astype("datetime64[us]"))})
    out = events_autocorr(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 1
    assert int(out.iloc[0].n_pairs) == 9
    assert abs(out.iloc[0].r1_6 + 1.0) < 0.02


def test_lineitem_benford_shares(ray_session):
    """Digits are 1..9 only, shares sum to 1 per flag, and counts are
    exact for a planted set crossing a power-of-ten boundary."""
    from go_osm_ray.pipelines.relq import lineitem_benford
    t = pa.table({"l_returnflag": pa.array(["A"] * 4),
                  # cents: 99999, 100000, 100001, 20000
                  "l_extendedprice": pa.array([999.99, 1000.00,
                                               1000.01, 200.00])})
    out = lineitem_benford(ray.data.from_arrow(t)).to_pandas()
    got = dict(zip(out.digit, out.n))
    assert got == {9: 1, 1: 2, 2: 1}
    assert abs(out.share6.sum() - 1.0) < 1e-9


def test_way_conflate_transitivity(ray_session):
    """Three near-identical parallel traces sharing a node chain merge
    into ONE cluster with the min id as keeper; a far way stays
    unclustered."""
    from go_osm_ray.pipelines.osm import way_conflate
    # ways 10/20/30 all run through nodes 1,2,3 (identical geometry);
    # way 40 shares node 3 but veers far away
    coords = {1: (0.0, 0.0), 2: (0.001, 0.0), 3: (0.002, 0.0),
              4: (1.0, 1.0)}
    refs = {10: [1, 2, 3], 20: [1, 2, 3], 30: [1, 2, 3], 40: [3, 4]}
    ways, nodes = _mk_ways(refs, coords)
    out = way_conflate(ways, nodes).to_pandas().set_index("way_id")
    assert int(out.loc[10].keeper) == 10 and not out.loc[10].is_dup
    assert int(out.loc[20].keeper) == 10 and out.loc[20].is_dup
    assert int(out.loc[30].keeper) == 10 and out.loc[30].is_dup
    assert int(out.loc[40].keeper) == 40 and not out.loc[40].is_dup


def test_events_cusum_planted_shift(ray_session):
    """A clean level shift: 10 days at 1/day then 10 days at 5/day —
    the CUSUM argmax lands on the last low day."""
    from go_osm_ray.pipelines.relq import events_cusum
    base = np.int64(1_700_000_000_000_000)
    day = 86_400_000_000
    rows = []
    for d in range(20):
        for i in range(1 if d < 10 else 5):
            rows.append(base + d * day + i)
    t = pa.table({"event_type": pa.array(["x"] * len(rows)),
                  "ts": pa.array(np.array(rows, np.int64)
                                 .astype("datetime64[us]"))})
    out = events_cusum(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 1
    base_day = int(base // day)
    assert int(out.iloc[0].cp_day) == base_day + 9


def test_markov_stationary_planted(ray_session):
    """Deterministic a->b->a chain: stationary mass 0.5/0.5."""
    from go_osm_ray.pipelines.relq import events_markov_stationary
    base = np.int64(1_700_000_000_000_000)
    ty = ["a", "b"] * 20
    t = pa.table({"user_id": pa.array([1] * 40, pa.int64()),
                  "event_id": pa.array(list(range(40)), pa.int64()),
                  "ts": pa.array((base + np.arange(40) * 1_000_000)
                                 .astype("datetime64[us]")),
                  "event_type": pa.array(ty)})
    out = events_markov_stationary(ray.data.from_arrow(t)).to_pandas()
    assert sorted(out.event_type) == ["a", "b"]
    assert (np.abs(out.pi6 - 0.5) < 1e-6).all()


def test_doc_novelty_planted(ray_session):
    """Doc 1 owns its shingles; doc 2 copies doc 1 verbatim (novelty
    0); doc 3 is half-copied."""
    from go_osm_ray.pipelines.text import doc_novelty
    d1 = "alpha beta gamma delta"
    d3 = "alpha beta gamma zeta eta theta"
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array([d1, d1, d3])})
    out = doc_novelty(ray.data.from_arrow(t)).to_pandas() \
        .set_index("doc_id")
    assert out.loc[1].novelty6 == 1.0
    assert out.loc[2].novelty6 == 0.0
    # doc 3: shingles abg(copied), bgz, gze, zet = 1 copied / 4
    assert out.loc[3].novelty6 == 0.75
