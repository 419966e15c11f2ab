"""Scale-plan guarantees for the distributed near-dup / job pipelines
(round-2 rework): the verify stage broadcasts only CANDIDATE rows, never
the corpus; relations flow through the job runner; drop flags honor the
merged-option precedence."""

import numpy as np
import pandas as pd
import pytest

import parity

SF = "/root/testdata/sf0.001"


def _corpus(n=300):
    rng = np.random.RandomState(7)
    base = [
        " ".join(f"w{v}" for v in rng.randint(0, 5000, size=20))
        for _ in range(n)
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(base)]
    rows.append({"doc_id": 1000, "text": base[0]})          # exact dup
    rows.append({"doc_id": 1001, "text": base[1] + " xx"})  # near dup
    return rows


def test_minhash_verify_broadcasts_only_candidates(ray_session, monkeypatch):
    """The round-1 plan shipped the WHOLE corpus text into the verify
    broadcast; the distributed plan must broadcast only the candidate
    ids' texts (semi-join result)."""
    import ray
    import ray.data as rd
    import go_osm_ray.relational as R
    from go_osm_ray.pipelines import text as T

    rows = _corpus()
    docs = rd.from_items(rows)
    sizes = []
    orig = R.broadcast_table

    def spy(ds, columns=None):
        ref = orig(ds, columns)
        sizes.append(len(ray.get(ref)))
        return ref

    monkeypatch.setattr(R, "broadcast_table", spy)
    pairs = parity.to_pandas(T.minhash_lsh_pairs(docs))
    found = set(zip(pairs["a"], pairs["b"]))
    assert (0, 1000) in found
    assert sizes, "verify must go through broadcast_table"
    # every broadcast is candidate-sized, nowhere near the 302-doc corpus
    assert max(sizes) < 50, sizes


def test_embed_neardup_planted_and_candidate_broadcast(ray_session, monkeypatch):
    """plant_neardups seeds deterministic cosine≈0.995 pairs; the banded
    LSH must find them all, and the verify broadcast must hold only the
    candidate embeddings."""
    import ray
    import ray.data as rd
    import go_osm_ray.relational as R
    from go_osm_ray.pipelines.text import embedding_neardup, plant_neardups

    emb = rd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    sizes = []
    orig = R.broadcast_table

    def spy(ds, columns=None):
        ref = orig(ds, columns)
        sizes.append(len(ray.get(ref)))
        return ref

    monkeypatch.setattr(R, "broadcast_table", spy)
    pairs = parity.to_pandas(embedding_neardup(plant_neardups(emb)))
    found = set(zip(pairs["a"], pairs["b"]))
    for vid in range(0, 500, 50):
        assert (vid, vid + 100_000) in found
    assert max(sizes) < 100, sizes  # 510-vector table never broadcast whole


def test_sessionize_partition_count(ray_session):
    """The partitioned sessionize must produce > 1 task-partition worth
    of groups and still match the single-task kernel output."""
    import __ray_entry__ as E
    got = parity.to_pandas(E.queries()["sessionize"](SF)) \
        .sort_values("user_id").reset_index(drop=True)
    # reference single-pass kernel on the driver
    import pyarrow.parquet as pq
    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    df = df.sort_values(["user_id", "ts"])
    gap = df.groupby("user_id")["ts"].diff().dt.total_seconds() > 1800
    want = df.assign(brk=gap).groupby("user_id").agg(
        n_sessions=("brk", lambda s: int(s.sum()) + 1),
        n_events=("brk", "size")).reset_index()
    got2 = got.astype({"n_sessions": "int64", "n_events": "int64"})
    pd.testing.assert_frame_equal(
        got2, want.astype({"n_sessions": "int64", "n_events": "int64"}),
        check_dtype=False)


@pytest.mark.parametrize("parts", [1, 3, 32])
def test_pairgen_plan_invariant_under_partitioning(ray_session, parts):
    """Partition count reshapes the exchange, never the answer: the
    near-dup pair sets must be identical at any num_parts."""
    import ray.data as rd
    from go_osm_ray.pipelines import text as T
    docs = rd.from_items(_corpus(120))
    mh = parity.to_pandas(T.minhash_lsh_pairs(docs, num_parts=parts))
    ng = parity.to_pandas(T.ngram_jaccard_pairs(docs, num_parts=parts))
    sh = parity.to_pandas(T.simhash_pairs(docs, num_parts=parts))
    key = (set(zip(mh["a"], mh["b"])), set(zip(ng["a"], ng["b"])),
           set(zip(sh["a"], sh["b"])))
    assert (0, 1000) in key[0] and (0, 1000) in key[1]
    if not hasattr(test_pairgen_plan_invariant_under_partitioning, "_ref"):
        test_pairgen_plan_invariant_under_partitioning._ref = key
    else:
        assert key == test_pairgen_plan_invariant_under_partitioning._ref


def test_ways_to_nodes_join_path_matches_broadcast(ray_session):
    """The hash-join attr attach (scale path) must equal the broadcast
    attach row-for-row."""
    import ray.data as rd
    from go_osm_ray.pipelines.osm import ways_to_nodes
    nodes = rd.read_parquet(f"/tmp/go_osm_ray_data/sf0.001/osm_nodes.parquet",
                            columns=["id", "lon", "lat"])
    ways = rd.read_parquet(f"/tmp/go_osm_ray_data/sf0.001/osm_ways.parquet",
                           columns=["id", "version", "changeset", "uid",
                                    "user", "refs"])
    a = parity.canonicalize(parity.to_pandas(
        ways_to_nodes(nodes, ways, broadcast_attrs=True)))
    b = parity.canonicalize(parity.to_pandas(
        ways_to_nodes(nodes, ways, broadcast_attrs=False)))
    pd.testing.assert_frame_equal(a, b)


def test_stdin_osm_xml_input(ray_session, tmp_path, monkeypatch):
    """S8: a stdin input parses the planet driver-side into a Dataset."""
    import io
    import sys
    import pyarrow.parquet as pq
    from go_osm_ray import datagen
    from go_osm_ray.job import run_job
    from go_osm_ray.sources.osm_xml import planet_to_xml_bytes
    paths = datagen.ensure_tables(0.001)
    nodes = pq.read_table(paths["osm_nodes"]).slice(0, 40)
    data = planet_to_xml_bytes(nodes, None)

    class FakeStdin:
        buffer = io.BytesIO(data)
    monkeypatch.setattr(sys, "stdin", FakeStdin)
    out = str(tmp_path / "stdin_sum")
    res = run_job({
        "inputs": [{"uri": "stdin", "kind": "nodes", "format": "osm_xml"}],
        "outputs": [{"uri": out, "format": "summary"}],
    })
    assert res[out]["rows"] == 40


def test_job_relations_flow(ray_session, tmp_path):
    """Relations read through the job runner, written to parquet, and
    gated by drop_relations from GLOBALS (merged-option precedence)."""
    import os
    import pyarrow.parquet as pq
    from go_osm_ray import datagen
    from go_osm_ray.job import run_job
    paths = datagen.ensure_tables(0.001)

    out1 = str(tmp_path / "with_rels")
    spec = {
        "inputs": [
            {"uri": paths["osm_nodes"], "kind": "nodes"},
            {"uri": paths["osm_relations"], "kind": "relations"},
        ],
        "outputs": [{"uri": out1, "format": "parquet"}],
    }
    run_job(spec)
    assert os.path.isdir(os.path.join(out1, "relations"))
    n_rels = pq.read_table(os.path.join(out1, "relations")).num_rows
    assert n_rels == pq.read_table(paths["osm_relations"]).num_rows

    out2 = str(tmp_path / "no_rels")
    spec2 = dict(spec, globals={"drop_relations": True},
                 outputs=[{"uri": out2, "format": "parquet"}])
    run_job(spec2)
    assert not os.path.exists(os.path.join(out2, "relations"))


def test_job_drop_nodes_from_globals(ray_session, tmp_path):
    """ADVICE fix: drop_nodes set in globals must gate the node output
    (round 1 read the raw output dict and ignored globals)."""
    import os
    from go_osm_ray import datagen
    from go_osm_ray.job import run_job
    paths = datagen.ensure_tables(0.001)
    out = str(tmp_path / "gdrop")
    spec = {
        "globals": {"drop_nodes": True},
        "inputs": [{"uri": paths["osm_nodes"], "kind": "nodes"},
                   {"uri": paths["osm_ways"], "kind": "ways"}],
        "outputs": [{"uri": out, "format": "parquet"}],
    }
    run_job(spec)
    assert not os.path.exists(os.path.join(out, "nodes"))
    assert os.path.isdir(os.path.join(out, "ways"))


def test_geojson_includes_way_features(ray_session, tmp_path):
    """ADVICE fix: GeoJSON outputs must carry way LineString/Polygon
    features alongside node Points (round 1 silently dropped ways)."""
    import json
    import os
    from go_osm_ray import datagen
    from go_osm_ray.job import run_job
    paths = datagen.ensure_tables(0.001)
    out = str(tmp_path / "feats.geojson")
    spec = {
        "inputs": [{"uri": paths["osm_nodes"], "kind": "nodes"},
                   {"uri": paths["osm_ways"], "kind": "ways"}],
        "outputs": [{"uri": out, "format": "geojson"}],
    }
    run_job(spec)
    doc = json.load(open(out))
    kinds = {f["geometry"]["type"] for f in doc["features"]}
    assert "Point" in kinds
    assert kinds & {"LineString", "Polygon"}


def test_stdout_feature_sink(ray_session, capsys):
    """Reference Output supports stdout: features stream as GeoJSON
    lines and the result reports the row count."""
    import json
    from go_osm_ray import datagen
    from go_osm_ray.job import run_job
    paths = datagen.ensure_tables(0.001)
    res = run_job({
        "inputs": [{"uri": paths["osm_nodes"], "kind": "nodes"}],
        "globals": {"keys_to_keep": ["amenity"]},
        "outputs": [{"uri": "stdout"}],
    })
    out = capsys.readouterr().out.strip().splitlines()
    assert res["stdout"]["rows"] == len(out) > 0
    first = json.loads(out[0])
    assert first["type"] == "Feature" and "coordinates" in first["geometry"]


def test_dedup_groups_distributed_matches_union_find(ray_session):
    """The BSP min-label-propagation components (scale path) must equal
    the single-task union-find on a multi-component random graph with
    chains (diameter > 1)."""
    import ray.data as rd
    from go_osm_ray.pipelines.text import dedup_groups, dedup_groups_distributed
    rng = np.random.RandomState(11)
    pairs = []
    # 5 chains of length 6 (diameter 5) + random extra edges + singleton pairs
    for c in range(5):
        base = 100 * c
        for i in range(5):
            pairs.append({"a": base + i, "b": base + i + 1})
    for _ in range(10):
        x, y = rng.randint(0, 30, 2)
        if x != y:
            pairs.append({"a": int(min(x, y)) + 1000, "b": int(max(x, y)) + 1000})
    ds = rd.from_items(pairs)
    want = parity.to_pandas(dedup_groups(ds)).sort_values("doc_id") \
        .reset_index(drop=True)
    got = parity.to_pandas(dedup_groups_distributed(ds, num_parts=5)) \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"))


def test_hll_approx_distinct_within_error(ray_session):
    """HLL sketch: per-group estimates within ~3x the theoretical
    standard error of the exact distinct counts, and exact on tiny
    groups (linear-counting range)."""
    import duckdb
    import __ray_entry__ as E
    got = parity.to_pandas(
        E.queries()["approx_distinct_users"](SF)).set_index("event_type")
    want = duckdb.sql(
        f"select event_type, count(distinct user_id) n "
        f"from read_parquet('{SF}/events.parquet') group by 1").df() \
        .set_index("event_type")
    for et, row in want.iterrows():
        exact = int(row["n"])
        approx = int(got.loc[et, "approx_n"])
        assert abs(approx - exact) <= max(2, 0.05 * exact), (et, exact, approx)


def test_hll_registers_merge_associative():
    from go_osm_ray.sketch import hll_estimate, hll_registers
    rng = np.random.RandomState(3)
    a = rng.randint(0, 1 << 40, 5000)
    b = rng.randint(0, 1 << 40, 5000)
    merged = np.maximum(hll_registers(a), hll_registers(b))
    whole = hll_registers(np.concatenate([a, b]))
    assert np.array_equal(merged, whole)
    n = len(np.unique(np.concatenate([a, b])))
    assert abs(hll_estimate(whole) - n) < 0.06 * n


def test_asof_join_matches_pandas_merge_asof(ray_session):
    """Random-data property check: asof_join == pandas.merge_asof
    (independent implementation) per user."""
    import datetime
    import ray.data as rd
    rng = np.random.RandomState(21)

    def mk(n, id0):
        ts = np.sort(rng.randint(0, 10_000_000, n))
        return pd.DataFrame({
            "event_id": np.arange(id0, id0 + n),
            "user_id": rng.randint(0, 12, n),
            "ts": pd.to_datetime(ts, unit="us"),
            "value": np.round(rng.uniform(0, 100, n), 3),
        })
    left = mk(300, 0)
    right = mk(120, 10_000).drop_duplicates(["user_id", "ts"])
    from go_osm_ray.pipelines.relq import asof_join
    got = parity.to_pandas(asof_join(
        rd.from_pandas(left), rd.from_pandas(right), num_parts=7)) \
        .sort_values("event_id").reset_index(drop=True)
    want = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="user_id", direction="backward",
        suffixes=("", "_r")).sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(want)
    gp = got["prev_event_id"].fillna(-1).astype(np.int64).tolist()
    wp = want["event_id_r"].fillna(-1).astype(np.int64).tolist()
    assert gp == wp


def test_range_join_matches_bruteforce(ray_session):
    """Random-data property check for range_join_count vs a per-row
    brute force; pandas datetimes arrive as ns-unit arrow timestamps,
    exercising the unit-aware horizon."""
    import ray.data as rd
    from go_osm_ray.pipelines.relq import range_join_count
    rng = np.random.RandomState(5)

    def mk(n, id0):
        ts = rng.randint(0, 30 * 86400 * 10 ** 6, n)
        return pd.DataFrame({
            "event_id": np.arange(id0, id0 + n),
            "user_id": rng.randint(0, 15, n),
            "ts": pd.to_datetime(np.sort(ts), unit="us"),
        })
    left, right = mk(200, 0), mk(600, 10_000)
    got = parity.to_pandas(range_join_count(
        rd.from_pandas(left), rd.from_pandas(right),
        horizon_s=86_400, num_parts=7)).sort_values("event_id")
    h = np.timedelta64(86_400, "s")
    want = [int(((right.user_id == r.user_id) & (right.ts >= r.ts)
                 & (right.ts < r.ts + h)).sum())
            for r in left.itertuples()]
    assert got.n_follow.tolist() == want


def test_asof_join_wide_span_no_overflow(ray_session):
    """Regression (ADVICE r2): the old kernel packed (key-rank, ts) as
    rank*span + ts, overflowing int64 for many keys x wide microsecond
    spans and silently wrapping. Span here is ~4e18 us with 50 keys —
    far past the old pack's range — and must still match merge_asof."""
    import ray.data as rd
    rng = np.random.RandomState(7)

    def mk(n, id0):
        ts = np.sort(rng.randint(0, 4_000_000_000_000_000_000, n))
        return pd.DataFrame({
            "event_id": np.arange(id0, id0 + n),
            "user_id": rng.randint(0, 50, n),
            "ts": ts,
            "value": np.round(rng.uniform(0, 100, n), 3),
        })
    left = mk(400, 0)
    right = mk(200, 10_000).drop_duplicates(["user_id", "ts"])
    from go_osm_ray.pipelines.relq import asof_join
    got = parity.to_pandas(asof_join(
        rd.from_pandas(left), rd.from_pandas(right), num_parts=5)) \
        .sort_values("event_id").reset_index(drop=True)
    want = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="user_id", direction="backward",
        suffixes=("", "_r")).sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(want)
    gp = got["prev_event_id"].fillna(-1).astype(np.int64).tolist()
    wp = want["event_id_r"].fillna(-1).astype(np.int64).tolist()
    assert gp == wp


@pytest.mark.parametrize("parts", [1, 3, 16])
def test_way_components_invariant_under_partitioning(ray_session, parts):
    """Star-edge generation and the BSP label exchange must give the
    same components at any partition count."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from go_osm_ray.pipelines.osm import way_components

    rng = np.random.default_rng(11)
    refs = [sorted(rng.choice(60, size=3, replace=False).tolist())
            for _ in range(40)]
    ways = rd.from_arrow(pa.table({
        "id": pa.array(np.arange(40, dtype=np.int64)),
        "refs": pa.array(refs, pa.list_(pa.int64())),
    }))
    got = way_components(ways, num_parts=parts).to_pandas() \
        .sort_values("way_id").reset_index(drop=True)
    key = list(zip(got["way_id"], got["component_id"]))
    ref = getattr(test_way_components_invariant_under_partitioning,
                  "_ref", None)
    if ref is None:
        test_way_components_invariant_under_partitioning._ref = key
        assert len(got) == 40
    else:
        assert key == ref


def test_way_geom_stats_matches_scalar_shoelace(ray_session):
    """Cumsum-difference segment sums equal the direct per-way shoelace
    on a hand-built fixture (two rings + one open line + a dangling ref)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from go_osm_ray.pipelines.osm import way_geom_stats

    nodes = rd.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "lon": pa.array([0.0, 1.0, 1.0, 0.0]),
        "lat": pa.array([0.0, 0.0, 1.0, 1.0]),
    }))
    ways = rd.from_arrow(pa.table({
        "id": pa.array([10, 11, 12, 13], pa.int64()),
        "refs": pa.array([[1, 2, 3, 4, 1],   # unit square, area 1, perim 4
                          [1, 2, 3, 1],      # right triangle, area .5
                          [1, 2, 3],         # open line -> dropped
                          [1, 2, 99, 1]],    # dangling ref -> dropped
                         pa.list_(pa.int64())),
    }))
    got = way_geom_stats(nodes, ways).to_pandas() \
        .sort_values("way_id").reset_index(drop=True)
    assert list(got["way_id"]) == [10, 11]
    assert list(got["area9"]) == [1.0, 0.5]
    assert got["perim9"][0] == 4.0
    assert abs(got["perim9"][1] - (2 + 2 ** 0.5)) < 1e-9


def test_min_label_static_matches_union_find_deep_chain(ray_session,
                                                        tmp_path):
    """A 300-deep chain needs 299 one-hop propagation rounds — far past
    dedup_groups_distributed's max_iters, where it must now REFUSE
    (silently-wrong labels before this guard). The static pointer-jump
    variant converges in O(log diameter) rounds and must match the
    union-find exactly."""
    import numpy as np
    import pandas as pd
    import pytest as _pt
    import ray.data as rd

    from go_osm_ray.pipelines.text import (dedup_groups,
                                           dedup_groups_distributed,
                                           min_label_components_static)

    rng = np.random.default_rng(5)
    a = np.arange(0, 299, dtype=np.int64)
    chain = pd.DataFrame({"a": a, "b": a + 1})
    cross = pd.DataFrame({"a": rng.integers(0, 300, 40),
                          "b": rng.integers(300, 600, 40)})
    selfp = pd.DataFrame({"a": [900, 901], "b": [900, 901]})
    pairs = rd.from_pandas(pd.concat([chain, cross, selfp])).materialize()

    want = dedup_groups(pairs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    got = min_label_components_static(
        pairs, num_parts=5, work_dir=str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert (want["group_id"].iloc[:300] == 0).all()

    with _pt.raises(RuntimeError, match="diameter"):
        dedup_groups_distributed(pairs, num_parts=5, max_iters=8)


def test_min_label_static_matches_distributed_shallow(ray_session,
                                                      tmp_path):
    """On shallow graphs (the near-dup shape) all three component
    implementations agree."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from go_osm_ray.pipelines.text import (dedup_groups,
                                           dedup_groups_distributed,
                                           min_label_components_static)

    rng = np.random.default_rng(7)
    pairs = rd.from_pandas(pd.DataFrame({
        "a": rng.integers(0, 80, 120),
        "b": rng.integers(0, 80, 120),
    })).materialize()
    want = dedup_groups(pairs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    got = min_label_components_static(
        pairs, num_parts=4, work_dir=str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    old = dedup_groups_distributed(pairs, num_parts=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    pd.testing.assert_frame_equal(old, want)


def test_dedup_keep_static_cc_path_matches(ray_session):
    """Forcing the edge limit to 0 routes dedup_keep through the
    static-edge CC runner; output must equal the union-find path."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from go_osm_ray.pipelines.text import dedup_keep

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64),
        "text": [f"d{i}" for i in range(20)],
    }))
    pairs = rd.from_pandas(pd.DataFrame({
        "a": [0, 1, 5, 9], "b": [1, 2, 6, 9],
    })).materialize()
    want = sorted(dedup_keep(docs, pairs).to_pandas()["doc_id"])
    got = sorted(dedup_keep(docs, pairs, single_task_edge_limit=0)
                 .to_pandas()["doc_id"])
    assert got == want
    assert 1 not in got and 2 not in got and 6 not in got


def test_way_clustering_partitioned_never_broadcasts(ray_session,
                                                     monkeypatch):
    """Past broadcast_threshold the LCC plan must run fully partitioned:
    zero broadcast_table calls (no ray.put of the edge set)."""
    import pyarrow as pa
    import ray.data as rd

    import go_osm_ray.relational as R
    from go_osm_ray.pipelines.osm import way_clustering_coef

    calls = []
    orig = R.broadcast_table

    def spy(ds, columns=None):
        calls.append(columns)
        return orig(ds, columns)

    monkeypatch.setattr(R, "broadcast_table", spy)
    ds = rd.from_arrow(pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "refs": pa.array([[10, 11], [10, 12], [11, 12]],
                         pa.list_(pa.int64()))}))
    df = parity.to_pandas(way_clustering_coef(ds, broadcast_threshold=0))
    assert set(df["lcc6"]) == {1.0}
    assert not calls, f"partitioned plan broadcast: {calls}"


def test_caption_edit_pairs_cap_and_template_isolation(ray_session):
    """Ids at/above id_cap never enter the pair census; pairs never
    cross digit-collapsed template groups even when captions are
    within edit distance 1."""
    import pyarrow as pa
    import ray.data as rd

    from go_osm_ray.pipelines.images import caption_edit_pairs

    rows = [
        ("img000000000001", "alpha 1 x"),
        ("img000000000002", "alpha 2 x"),     # same template, lev 1
        ("img000000000003", "alphb 3 x"),     # different template, lev 1
        ("img000000009999", "alpha 4 x"),     # above cap
    ]
    ds = rd.from_arrow(pa.table({
        "image_id": pa.array([r[0] for r in rows], pa.string()),
        "caption": pa.array([r[1] for r in rows], pa.string())}))
    df = parity.to_pandas(caption_edit_pairs(ds, max_lev=2, id_cap=100))
    got = set(zip(df["a"], df["b"]))
    assert got == {("img000000000001", "img000000000002")}


def test_supplier_ship_lag_pure_copartition(ray_session, monkeypatch):
    """The big x big orderkey join must not broadcast either fact
    table."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import go_osm_ray.relational as R
    from go_osm_ray.pipelines.relq import supplier_ship_lag

    def boom(ds, columns=None):
        raise AssertionError("supplier_ship_lag must not broadcast")

    monkeypatch.setattr(R, "broadcast_table", boom)
    d = np.datetime64("1995-01-01T00:00:00", "us")
    orders = rd.from_arrow(pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_orderdate": pa.array([d], pa.timestamp("us"))}))
    lineitem = rd.from_arrow(pa.table({
        "l_orderkey": pa.array([1], pa.int64()),
        "l_suppkey": pa.array([5], pa.int64()),
        "l_shipdate": pa.array([d + np.timedelta64(2, "D")],
                               pa.timestamp("us"))}))
    df = parity.to_pandas(supplier_ship_lag(lineitem, orders))
    assert df.iloc[0]["total_lag_days"] == 2
