"""The driver gate, locally: every queries() entry vs its oracle_sql()
DuckDB ground truth at sf0.001 (row count + schema + sorted values)."""

import pytest

import parity

SF = "/root/testdata/sf0.001"


def _queries():
    import __ray_entry__ as E
    return E.queries()


def _oracles():
    from go_osm_ray import datagen, oracle
    datagen.ensure_tables(0.001)
    return oracle.build(0.001)


ORACLE_NAMES = sorted(_oracles())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(ray_session, name):
    qs = _queries()
    assert name in qs, f"oracle {name} has no engine query"
    engine_df = parity.to_pandas(qs[name](SF))
    oracle_df = parity.run_oracle(_oracles()[name], SF)
    problems = parity.compare(engine_df, oracle_df, name)
    assert not problems, problems
    assert len(engine_df) > 0, f"{name}: empty result weakens the gate"


def test_every_oracle_has_query():
    missing = set(ORACLE_NAMES) - set(_queries())
    assert not missing


def test_entry_smoke(ray_session):
    import __ray_entry__ as E
    ds = E.entry()
    assert ds.count() > 0
    names = ds.schema().names
    for col in ("image_id", "lon", "lat", "cell_r7", "tile14_x",
                "pip_feature_id", "knn_feature_id"):
        assert col in names
