"""Property-based tests (SURVEY §5.4): random bboxes and expressions
agree with DuckDB; tile/cell assignment is inverse-consistent; §5.5
determinism: different physical partitionings give identical results."""

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from go_osm_ray.geo import tiles
from go_osm_ray.util import round_half_away, sql_round


# ------------------------------------------------------ geo inverse props

@settings(max_examples=200, deadline=None)
@given(st.floats(-180, 180, allow_nan=False),
       st.floats(-85, 85, allow_nan=False),
       st.integers(0, 16))
def test_cell_contains_its_point(lon, lat, res):
    cell = tiles.cell_id(np.array([lon]), np.array([lat]), res)
    lo, la0, hi, la1 = tiles.cell_bounds(cell)
    # eps: IEEE boundary cases (e.g. lon=-2e-16 floors into the 0-edge
    # tile) are one ulp of the floor input — consistent engine+SQL-side
    eps = 1e-9
    assert lo[0] - eps <= lon <= hi[0] + eps
    assert la0[0] - eps <= lat <= la1[0] + eps


@settings(max_examples=200, deadline=None)
@given(st.floats(-180, 180, allow_nan=False),
       st.floats(-85, 85, allow_nan=False),
       st.integers(1, 12), st.integers(0, 6))
def test_cell_parent_consistent(lon, lat, res, up):
    parent_res = max(res - up, 0)
    child = tiles.cell_id(np.array([lon]), np.array([lat]), res)
    direct = tiles.cell_id(np.array([lon]), np.array([lat]), parent_res)
    assert tiles.cell_parent(child, parent_res)[0] == direct[0]


# ------------------------------------------------- random bbox vs DuckDB

@settings(max_examples=40, deadline=None)
@given(st.floats(-77.3, -76.8), st.floats(38.6, 39.1),
       st.floats(0.001, 0.3), st.floats(0.001, 0.3))
def test_random_bbox_matches_duckdb(x0, y0, w, h):
    from go_osm_ray import datagen
    import pyarrow.parquet as pq
    path = datagen.ensure_tables(0.001)["osm_nodes"]
    t = pq.read_table(path, columns=["id", "lon", "lat"])
    x1, y1 = x0 + w, y0 + h
    from go_osm_ray.stages.filters import make_bbox_filter
    got = sorted(make_bbox_filter(x0, y0, x1, y1)(t)["id"].to_pylist())
    want = sorted(r[0] for r in duckdb.connect().execute(
        f"SELECT id FROM read_parquet('{path}') WHERE lon >= {x0!r} "
        f"AND lon <= {x1!r} AND lat >= {y0!r} AND lat <= {y1!r}").fetchall())
    assert got == want


# ----------------------------------------- random expressions vs DuckDB

_KEYS = ["amenity", "craft", "building", "name"]
_VALS = ["cafe", "yes", "brewery", "school", "zzz"]


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 3), st.integers(0, 4), st.integers(0, 3),
       st.integers(0, 4), st.sampled_from(["and", "or"]),
       st.booleans())
def test_random_expr_matches_duckdb(k1, v1, k2, v2, op, neg):
    from go_osm_ray import datagen
    from go_osm_ray.expr import Expression
    import pyarrow.parquet as pq
    path = datagen.ensure_tables(0.001)["osm_nodes"]
    t = pq.read_table(path, columns=["id", "tags"])
    lhs = f"@{_KEYS[k1]} like {_VALS[v1]}"
    rhs = f"@{_KEYS[k2]} == {_VALS[v2]}"
    text = f"({lhs}) {op} ({rhs})"
    if neg:
        text = f"not ({text})"
    e = Expression(text)
    got = sorted(e.filter(t)["id"].to_pylist())
    want = sorted(r[0] for r in duckdb.connect().execute(
        f"SELECT id FROM read_parquet('{path}') "
        f"WHERE {e.to_sql({'id'})}").fetchall())
    assert got == want


# -------------------------------------------------- rounding SQL mirror

@settings(max_examples=300, deadline=None)
@given(st.floats(-1e6, 1e6, allow_nan=False), st.integers(0, 7))
def test_round_half_away_matches_sql(x, nd):
    got = round_half_away(x, nd)
    want = duckdb.connect().execute(
        f"SELECT {sql_round(f'CAST({x!r} AS DOUBLE)', nd)}").fetchone()[0]
    assert got == want or (np.isnan(got) and want is None)


# ------------------------------------------ §5.5 partitioning determinism

def test_flagship_partitioning_invariant(ray_session):
    """Same flagship result regardless of physical block layout."""
    import ray
    import ray.data as rd
    import __ray_entry__ as E
    from go_osm_ray import datagen
    from go_osm_ray.oracle import KNN_FEATURE_KEY
    from go_osm_ray.pipelines.images import flagship
    from go_osm_ray.pipelines.spatial import build_polygon_index, tagged_nodes
    from go_osm_ray.relational import broadcast_table
    sf = "/root/testdata/sf0.001"
    nodes = E._read_gen(sf, "osm_nodes", ["id", "lon", "lat", "tags"])
    ways = E._read_gen(sf, "osm_ways", ["id", "refs"])
    idx_ref = ray.put(build_polygon_index(
        nodes.select_columns(["id", "lon", "lat"]), ways))
    feats_ref = broadcast_table(tagged_nodes(nodes, KNN_FEATURE_KEY),
                                ["id", "lon", "lat"])
    path = datagen.ensure_tables(0.001)["images"]

    def run(nblocks):
        images = rd.read_parquet(path, columns=["image_id", "phash"],
                                 override_num_blocks=nblocks)
        df = flagship(images, idx_ref, feats_ref,
                      prepartition=False).to_pandas()
        return df.sort_values("image_id").reset_index(drop=True)

    a, b = run(1), run(7)
    assert a.equals(b)


@given(st.lists(st.integers(1, 40), min_size=1, max_size=60),
       st.integers(2, 33))
@settings(max_examples=25, deadline=None)
def test_token_pack_prefix_math(ray_session, counts, seq_len):
    """token_pack's distributed scan must equal the naive sequential
    prefix over doc_id order (pure-kernel check, no Ray)."""
    import pyarrow as pa
    from go_osm_ray.pipelines import text as T
    # build fake docs whose regex token count == wanted count
    docs = pa.table({
        "doc_id": pa.array(range(len(counts)), pa.int64()),
        "text": ["x " * c for c in counts],
    })
    tok = T.token_count_batch(docs)
    assert tok["n_tokens"].to_pylist() == counts
    prev = np.cumsum([0] + counts[:-1])
    want_seq = [int(p // seq_len) for p in prev]
    want_off = [int(p % seq_len) for p in prev]
    # drive the real pipeline through ray.data on the same table
    import ray.data as rd
    out = T.token_pack(rd.from_arrow(docs), seq_len=seq_len,
                       range_size=7, num_parts=5).to_pandas() \
        .sort_values("doc_id")
    assert out["seq_id"].tolist() == want_seq
    assert out["seq_offset"].tolist() == want_off
    # forced TWO-LEVEL configuration: many ranges per super, many supers
    # — the tree prefix (super offsets -> in-super range offsets ->
    # co-partitioned rebase) must give the identical packing
    out2 = T.token_pack(rd.from_arrow(docs), seq_len=seq_len,
                        range_size=2, super_size=3, num_parts=5,
                        collect_limit=0) \
        .to_pandas().sort_values("doc_id")
    assert out2["seq_id"].tolist() == want_seq
    assert out2["seq_offset"].tolist() == want_off


def test_doc_split_stability_and_shares(ray_session):
    """Split assignment is a pure function of the id (stable across
    runs/orders) and buckets land roughly at the 90/5/5 shares."""
    import pyarrow as pa
    from go_osm_ray.pipelines.text import doc_split_batch
    ids = pa.table({"doc_id": pa.array(range(4000), pa.int64())})
    a = doc_split_batch(ids)
    b = doc_split_batch(ids.take(pa.array(list(reversed(range(4000))))))
    da = dict(zip(a["doc_id"].to_pylist(), a["split"].to_pylist()))
    db = dict(zip(b["doc_id"].to_pylist(), b["split"].to_pylist()))
    assert da == db
    import collections
    c = collections.Counter(da.values())
    assert 0.85 < c["train"] / 4000 < 0.95
    assert 0.02 < c["val"] / 4000 < 0.08
    assert 0.02 < c["test"] / 4000 < 0.08


_texts = st.lists(
    st.text(alphabet="ab cd\tx", min_size=0, max_size=40), min_size=1,
    max_size=12)


@given(_texts)
@settings(max_examples=60, deadline=None)
def test_shingle_batch_matches_scalar(texts):
    """The vectorized batch shingler must be bit-identical to the scalar
    reference form, doc by doc (guards the round-2 rewrite)."""
    import pyarrow as pa
    from go_osm_ray.pipelines.text import _shingle_hashes, _shingle_hashes_batch
    d, h = _shingle_hashes_batch(pa.array(texts, pa.string()))
    per_doc = {}
    for di, hv in zip(d, h):
        per_doc.setdefault(int(di), set()).add(int(hv))
    for i, t in enumerate(texts):
        want = set(int(x) for x in _shingle_hashes(t))
        assert per_doc.get(i, set()) == want, (i, t)


@given(_texts)
@settings(max_examples=40, deadline=None)
def test_simhash_batch_matches_scalar(texts):
    from go_osm_ray.pipelines.text import simhash64, simhash64_batch
    got = simhash64_batch(texts)
    for i, t in enumerate(texts):
        assert int(got[i]) == int(simhash64(t)), (i, t)


# ------------------------------------------- session-13 kernel properties

@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet="ab1 #", max_size=12),
                          st.text(alphabet="ab1 #", max_size=12)),
                min_size=1, max_size=12))
def test_lev_banded_property(pairs):
    """Banded DP == scalar full-matrix Levenshtein whenever the true
    distance is <= 2; never an under-estimate otherwise."""
    from go_osm_ray.pipelines.images import _lev_banded

    def scalar_lev(a, b):
        d = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            prev, d[0] = d[0], i
            for j in range(1, len(b) + 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (a[i - 1] != b[j - 1]))
        return d[len(b)]

    got = _lev_banded([p[0] for p in pairs], [p[1] for p in pairs], 2)
    for (a, b), g in zip(pairs, got):
        true = scalar_lev(a, b)
        if true <= 2:
            assert g == true, (a, b, g, true)
        else:
            assert g > 2, (a, b, g, true)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(st.integers(0, 25), min_size=1, max_size=5),
                min_size=2, max_size=14))
def test_way_two_hop_matches_bfs(ray_session, refs_lists):
    """way_two_hop == brute-force 2-hop BFS count over the same
    shared-node graph on random small inputs."""
    import itertools

    import ray.data as rd

    from go_osm_ray.pipelines.osm import way_two_hop

    rows = list(enumerate(refs_lists))
    adj = {i: set() for i, _ in rows}
    for (i, ra), (j, rb) in itertools.combinations(rows, 2):
        if set(ra) & set(rb):
            adj[i].add(j)
            adj[j].add(i)
    expect = {}
    for i, _ in rows:
        if not adj[i]:
            continue          # isolated: engine reports nothing
        two = set()
        for mid in adj[i]:
            two |= adj[mid]
        two -= adj[i]
        two.discard(i)
        expect[i] = (len(adj[i]), len(two))
    ds = rd.from_arrow(pa.table({
        "id": pa.array([i for i, _ in rows], pa.int64()),
        "refs": pa.array([r for _, r in rows], pa.list_(pa.int64()))}))
    got = {int(r["way_id"]): (int(r["deg"]), int(r["n_two_hop"]))
           for r in way_two_hop(ds, num_parts=4).take_all()}
    assert got == expect
