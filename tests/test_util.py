import duckdb
import numpy as np
import pyarrow as pa

from go_osm_ray.util import round_half_away, sql_round


def test_round_half_away_matches_its_sql_mirror():
    rng = np.random.RandomState(9)
    vals = np.concatenate([
        rng.uniform(-1000, 1000, 5000),
        np.array([2.5e-7, -2.5e-7, 1.0000005, -1.0000005, 0.0,
                  1 / 128, 3 / 128, -5 / 128]),  # exact binary midpoints at 6dp
    ])
    for nd in (2, 6, 7):
        mine = round_half_away(vals, nd)
        con = duckdb.connect()
        con.register("t", pa.table({"x": pa.array(vals)}))
        sql = con.execute(f"SELECT {sql_round('x', nd)} FROM t").fetchnumpy()
        key = list(sql.keys())[0]
        assert np.array_equal(mine, sql[key]), nd


def test_scalar_and_arrow_inputs():
    assert round_half_away(1.2345675, 6) == round_half_away(np.array([1.2345675]), 6)[0]
    arr = pa.chunked_array([pa.array([0.15, -0.15])])
    out = round_half_away(arr, 1)
    assert out.to_pylist() == [0.2, -0.2] or out.to_pylist() == [0.1, -0.1]
    # whichever way the float landed, the SQL mirror agrees:
    con = duckdb.connect()
    got = con.execute(f"SELECT {sql_round('x', 1)} FROM (SELECT unnest([0.15::DOUBLE, -0.15::DOUBLE]) AS x)").fetchall()
    assert [g[0] for g in got] == out.to_pylist()


def test_dedup_exact_and_partial_groupby_agg(ray_session):
    """Scale-safe forms of the generic relational helpers: hash-partition
    exchange + per-partition vectorized kernels."""
    import pandas as pd
    import ray.data as rd
    from go_osm_ray.relational import dedup_exact, partial_groupby_agg
    df = pd.DataFrame({"k": [1, 2, 1, 3, 2, 1], "v": [5, 1, 3, 9, 0, 7]})
    ds = rd.from_pandas(df)
    got = dedup_exact(ds, "k", "v").to_pandas().sort_values("k")
    assert dict(zip(got["k"], got["v"])) == {1: 3, 2: 0, 3: 9}

    out = partial_groupby_agg(
        ds, ["k"],
        lambda d: d.groupby("k", as_index=False)["v"].sum(),
        lambda d: pd.DataFrame({"k": [d["k"].iloc[0]],
                                "total": [int(d["v"].sum())]}))
    got2 = out.to_pandas().sort_values("k")
    assert dict(zip(got2["k"], got2["total"])) == {1: 15, 2: 1, 3: 9}
