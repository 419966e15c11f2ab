import numpy as np
import pyarrow as pa

from go_osm_ray import tags as tg

TAGS_TYPE = pa.list_(pa.struct([("key", pa.string()), ("value", pa.string())]))


def mk(rows):
    return pa.array(rows, TAGS_TYPE)


def test_has_any_key_and_empty_rows():
    t = mk([[{"key": "a", "value": "1"}], [], [{"key": "b", "value": "2"}], []])
    assert tg.has_any_key(t, ["a"]).tolist() == [True, False, False, False]
    assert tg.has_any_key(t, ["a", "b"]).tolist() == [True, False, True, False]


def test_value_of_first_match_and_trailing_empty():
    t = mk([[{"key": "k", "value": "v1"}, {"key": "k", "value": "v2"}],
            [], [{"key": "x", "value": "y"}], []])
    v = tg.value_of(t, "k")
    assert v.to_pylist() == ["v1", None, None, None]


def test_project_keep_overrides_drop():
    t = mk([[{"key": "a", "value": "1"}, {"key": "b", "value": "2"}]])
    kept = tg.project_keys(t, keep=["a"], drop=["a"])  # keep wins (reference rule)
    assert kept.to_pylist() == [[{"key": "a", "value": "1"}]]
    dropped = tg.project_keys(t, drop=["a"])
    assert dropped.to_pylist() == [[{"key": "b", "value": "2"}]]
    noop = tg.project_keys(t)
    assert noop.to_pylist() == t.to_pylist()


def test_sliced_input():
    t = mk([[{"key": "a", "value": "1"}], [{"key": "b", "value": "2"}],
            [{"key": "c", "value": "3"}]])
    sl = t.slice(1, 2)
    assert tg.has_any_key(sl, ["b"]).tolist() == [True, False]
    assert tg.value_of(sl, "c").to_pylist() == [None, "3"]
