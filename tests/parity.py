"""Shared engine-vs-DuckDB comparison harness (mimics the driver gate).

The driver runs queries()[name](sf_dir) and oracle_sql()[name] side by
side at sf0.01 and compares row count + schema + order-insensitive value
hash. This harness does the same locally at any sf: oracle SQL strings
are rewritten from the gate's hardcoded sf0.01 generated-table paths to
the requested sf, and the ten testdata views are registered explicitly.
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd

TESTDATA_TABLES = ["region", "nation", "customer", "supplier", "part",
                   "orders", "lineitem", "events", "documents", "embeddings"]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).df()


def rewrite_sql_for_sf(sql: str, sf: float) -> str:
    """The gate's oracle SQL embeds sf0.01 generated-table paths; point it
    at another scale for local testing."""
    from go_osm_ray import datagen
    return sql.replace(str(datagen.scale_dir(0.01)), str(datagen.scale_dir(sf)))


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(engine_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str = "") -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    problems = []
    a, b = canonicalize(engine_df), canonicalize(oracle_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"{name}: columns {list(a.columns)} != {list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"{name}: row count {len(a)} != {len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            eq = np.array_equal(av.astype(np.float64), bv.astype(np.float64),
                                equal_nan=True)
        else:
            eq = (pd.Series(av).astype(object) == pd.Series(bv).astype(object)).all()
        if not eq:
            idx = next((i for i in range(len(a))
                        if not _cell_eq(a[c].iloc[i], b[c].iloc[i])), None)
            problems.append(f"{name}.{c}: first diff at row {idx}: "
                            f"engine={a[c].iloc[idx]!r} "
                            f"oracle={b[c].iloc[idx]!r}"
                            if idx is not None else
                            f"{name}.{c}: arrays differ only in ordering"
                            f"/dtype after canonicalize")
    return problems


def _cell_eq(x, y) -> bool:
    if isinstance(x, float) and isinstance(y, float):
        return (math.isnan(x) and math.isnan(y)) or x == y
    return x == y
