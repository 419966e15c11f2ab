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
