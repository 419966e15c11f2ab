import duckdb
import numpy as np
import pyarrow as pa
import pytest

from go_osm_ray.expr import Expression


@pytest.fixture()
def table():
    tags = pa.array([
        [{"key": "craft", "value": "brewery"}],
        [{"key": "craft", "value": "distillery"}, {"key": "name", "value": "x"}],
        [{"key": "amenity", "value": "cafe"}],
        [],
        [{"key": "craft", "value": "pottery"}],
    ], pa.list_(pa.struct([("key", pa.string()), ("value", pa.string())])))
    return pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "version": pa.array([1, 5, 3, 7, 2], pa.int64()),
        "tags": tags,
    })


CASES = [
    ("@craft like brewery", [1]),
    ("(@craft like brewery) or (@craft like distillery)", [1, 2]),
    ("@craft like '%ery'", [1, 2, 5]),
    ("@craft ilike 'BREW%'", [1]),
    ("not (@craft like brewery)", [2, 5]),  # NULL craft -> not NULL -> dropped (SQL semantics)
    ("@version > 2 and @version <= 5", [2, 3]),
    ("@amenity in [cafe, pub]", [3]),
    ("@craft == pottery", [5]),
    ("@craft != pottery", [1, 2]),
    # function-map surface (DFL FunctionMap parity, SURVEY §2.9)
    ("len(@craft) >= 8", [2]),
    ("len(@craft) == 7", [1, 5]),
    ("prefix(@craft, 'brew')", [1]),
    ("suffix(@craft, 'ery')", [1, 2, 5]),
    ("prefix(upper(@craft), 'POT')", [5]),
    ("len(trim(@name)) == 1", [2]),
    ("prefix(@craft, 'b') or suffix(lower(@craft), 'y')", [1, 2, 5]),
    # round-3 builtin breadth (DFL defaults beyond the first six)
    ("replace(@craft, 'ery', 'ER') like '%ER'", [1, 2, 5]),
    ("substr(@craft, 1, 4) == brew", [1]),
    ("len(split(@craft, 'e')) == 3", [1]),   # br-w-ry
    ("concat(@craft, '-x') like '%y-x'", [1, 2, 5]),
    ("ltrim(rtrim(@name)) == x", [2]),
    ("int64(@version) >= 5", [2, 4]),
    ("float64(@version) > 2.5", [2, 3, 4]),
]


@pytest.mark.parametrize("text,expected", CASES)
def test_eval_matches_expected_and_duckdb(table, text, expected):
    e = Expression(text)
    got = table.filter(pa.array(e.mask(table)))["id"].to_pylist()
    assert got == expected, text
    con = duckdb.connect()
    con.register("t", table)
    sql = e.to_sql({"id", "version"})
    oracle = [r[0] for r in con.execute(f"SELECT id FROM t WHERE {sql} ORDER BY id").fetchall()]
    assert oracle == expected, (text, sql)


def test_parse_errors():
    for bad in ["@craft like", "(@a == 1", "== 3", "", "@a >< 2"]:
        with pytest.raises(ValueError):
            Expression(bad)


def test_missing_attribute_raises(table):
    with pytest.raises(KeyError):
        Expression("@nope > 1").mask(table.select(["id"]))


def test_unknown_function_rejected():
    with pytest.raises(ValueError):
        Expression("nosuchfn(@craft)")


def test_register_function_engine_and_sql(table):
    import pyarrow.compute as pc
    from go_osm_ray.expr import register_function
    register_function(
        "rev",
        lambda a: pc.utf8_reverse(a.combine_chunks()
                                  if isinstance(a, pa.ChunkedArray) else a),
        lambda a: f"reverse({a})")
    e = Expression("prefix(rev(@craft), 'yre')")  # '...ery' reversed
    got = table.filter(pa.array(e.mask(table)))["id"].to_pylist()
    assert got == [1, 2, 5]
    con = duckdb.connect()
    con.register("t", table)
    sql = e.to_sql({"id"})
    oracle = [r[0] for r in con.execute(
        f"SELECT id FROM t WHERE {sql} ORDER BY id").fetchall()]
    assert oracle == got


def test_dfl_stdlib_remainder_builtins():
    """r4 additions to the function map (reference
    cmd/osm/main.go:252 dfl.NewFuntionMapWithDefaults remainder):
    element-wise min/max, abs, substring contains, list membership."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from go_osm_ray.expr import _FUNCTIONS

    f = {k: v["fn"] for k, v in _FUNCTIONS.items()}
    s = {k: v["sql"] for k, v in _FUNCTIONS.items()}
    a = pa.array([1, 5, 9], pa.int64())
    assert f["min"](a, 4).to_pylist() == [1, 4, 4]
    assert f["max"](a, 4).to_pylist() == [4, 5, 9]
    assert f["abs"](pa.array([-3, 0, 2])).to_pylist() == [3, 0, 2]
    txt = pa.array(["saint mark", "x", None])
    assert f["contains"](txt, "aint").to_pylist() == [True, False, None]
    lists = pa.array([["a", "St"], ["b"], []], pa.list_(pa.string()))
    assert f["has"](lists, "St").to_pylist() == [True, False, False]
    # SQL mirrors render DuckDB-runnable text
    import duckdb
    con = duckdb.connect()
    assert con.execute(f"SELECT {s['min']('1', '4')}").fetchone()[0] == 1
    assert con.execute(f"SELECT {s['max']('1', '4')}").fetchone()[0] == 4
    assert con.execute(f"SELECT {s['abs']('-3')}").fetchone()[0] == 3
    contains_sql = s["contains"]("'saint'", "'aint'")
    assert con.execute(f"SELECT {contains_sql}").fetchone()[0]
    has_sql = s["has"]("['a','St']", "'St'")
    assert con.execute(f"SELECT {has_sql}").fetchone()[0]


def test_list_has_sliced_offsets():
    """has() must respect non-zero list offsets (sliced batches)."""
    import pyarrow as pa

    from go_osm_ray.expr import _list_has

    lists = pa.array([["q"], ["a", "St"], ["b"], ["St"]],
                     pa.list_(pa.string())).slice(1, 3)
    assert _list_has(lists, "St").to_pylist() == [True, False, True]
