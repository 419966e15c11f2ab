"""Distributed relational primitives on ray.data.Dataset.

The reference's only join machinery is a single in-heap hash map
(``nodesIndex``, /root/reference/osm/Planet.go:28-33) and sorted-slice
membership sets (/root/reference/osm/UInt64Slice.go:9-29).  At cluster
scale those become three explicit strategies, chosen by the caller:

- ``broadcast_lookup`` / ``semi_filter`` — small side shipped ONCE via
  ``ray.put`` and read per task/actor; no shuffle.  This is the
  distributed form of uid->UserName (/root/reference/osm/MarshalNode.go:33)
  and of the way-node retention id set (/root/reference/osm/Planet.go:523-531).
- ``hash_join`` — both sides large: Ray Data's hash-partitioned
  ``Dataset.join`` (all-to-all shuffle on the key).
- ``partial_groupby_agg`` — combiner-style pre-aggregation inside
  ``map_batches`` (one row per key per block) before the small final
  ``groupby``, so the wide shuffle moves partial states, not rows.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def broadcast_table(ds: ray.data.Dataset | pa.Table, columns: Sequence[str] | None = None) -> ray.ObjectRef:
    """ray.put a small table (or the selected columns of a small Dataset)."""
    if isinstance(ds, ray.data.Dataset):
        if columns:
            ds = ds.select_columns(list(columns))
        tabs = ray.get(ds.to_arrow_refs())
        # Ray canonicalizes zero-row transform outputs into schema-less
        # empty blocks — drop them (and schema metadata) before concat
        live = [t.replace_schema_metadata(None) for t in tabs
                if t.num_rows and t.num_columns]
        if live:
            tbl = pa.concat_tables(live)
        else:
            sch = ds.schema()
            tbl = pa.schema([(n, t) for n, t in
                             zip(sch.names, sch.types)]).empty_table()
    else:
        tbl = ds if columns is None else ds.select(list(columns))
    return ray.put(tbl.combine_chunks())


def semi_filter(ds: ray.data.Dataset, key: str, keys_ref: ray.ObjectRef,
                anti: bool = False) -> ray.data.Dataset:
    """Semi-(or anti-)join: keep rows whose ``key`` is in the broadcast set.

    The Ray-native form of the reference's sorted-uint64 ``Contains``
    membership test (/root/reference/osm/UInt64Slice.go:22-29).
    """
    def fn(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        arr = keys[key] if isinstance(keys, pa.Table) else pa.array(keys)
        m = pc.is_in(batch[key], value_set=arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr)
        if anti:
            m = pc.invert(m)
        return batch.filter(pc.fill_null(m, False))
    return ds.map_batches(fn, batch_format="pyarrow")


def hash_join(left: ray.data.Dataset, right: ray.data.Dataset, on: str | tuple[str, ...],
              how: str = "inner", num_partitions: int = 16,
              right_on: str | tuple[str, ...] | None = None,
              left_suffix: str | None = None, right_suffix: str = "_r") -> ray.data.Dataset:
    """Large-large equi-join via Ray Data's hash-partitioned join."""
    on_t = (on,) if isinstance(on, str) else tuple(on)
    r_t = None if right_on is None else ((right_on,) if isinstance(right_on, str) else tuple(right_on))
    return left.join(right, join_type=how, num_partitions=num_partitions,
                     on=on_t, right_on=r_t,
                     left_suffix=left_suffix, right_suffix=right_suffix)


def partial_groupby_agg(ds: ray.data.Dataset, keys: Sequence[str],
                        partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
                        final_fn: Callable[[pd.DataFrame], pd.DataFrame],
                        batch_size: int = 65536,
                        num_parts: int = 32) -> ray.data.Dataset:
    """Combiner pattern: ``partial_fn`` collapses each block to one row per
    key (pandas in/out); the partials then shuffle by a BOUNDED hash
    partition of the first key (each key wholly in one partition) and
    ONE task per partition applies ``final_fn`` per key group — no Ray
    per-key group calls. The shuffle moves O(keys x blocks) rows instead
    of O(rows)."""
    keys = list(keys)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = partial_fn(df)
        return out.reset_index() if out.index.name or out.index.nlevels > 1 else out

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[keys[0]], index=False).to_numpy()
        df = df.copy()
        df["part"] = hash_part(h, num_parts)
        return df

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["part"])
        outs = [final_fn(g) for _, g in df.groupby(keys, sort=False)]
        return pd.concat(outs, ignore_index=True) if outs else final_fn(df)

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=batch_size) \
        .map_batches(add_part, batch_format="pandas")
    return partials.groupby("part").map_groups(finish, batch_format="pandas")


_GOLD = np.uint64(0x9E3779B97F4A7C15)


def hash_part(key: np.ndarray, num_parts: int) -> np.ndarray:
    """Bounded hash-partition id for a key column (multiplicative mix so
    low-entropy keys still spread). The partition column is the shuffle
    key of the distributed per-key kernels: groupby("part") lands every
    key wholly inside one of ``num_parts`` partitions and the vectorized
    kernel runs once PER PARTITION, never per key."""
    with np.errstate(over="ignore"):
        mixed = key.astype(np.uint64) * _GOLD
    return ((mixed >> np.uint64(33)) % np.uint64(num_parts)).astype(np.int64)


def single_merge(ds: ray.data.Dataset, fn, batch_format: str = "pyarrow") -> ray.data.Dataset:
    """ONE-task merge for BOUNDED-size inputs (per-block partials over a
    bounded key space, top-k partials, verified pair lists).

    ``repartition(1)`` + ``map_batches(fn, batch_size=None)`` is only
    correct while the merged data lands in one block: if Ray's dynamic
    block splitting ever yields >1 block, per-block batches would make a
    holistic merge kernel silently emit duplicate/partial keys.  The huge
    explicit ``batch_size`` makes Ray coalesce every block into exactly
    one batch, so the kernel sees ALL rows or the job fails loudly.
    """
    return ds.repartition(1).map_batches(fn, batch_format=batch_format,
                                         batch_size=1 << 30)


def dedup_exact(ds: ray.data.Dataset, key: str, keep_order_col: str) -> ray.data.Dataset:
    """Exact dedup: one survivor per ``key`` (min ``keep_order_col``).

    Distributed form of the reference's error-on-duplicate-id ingest
    (/root/reference/osm/Planet.go:160-163) relaxed to keep-first.
    Physical plan: bounded hash-partition exchange on the key, then one
    vectorized sort + drop_duplicates per partition (never a Ray call
    per key)."""
    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[key], index=False).to_numpy()
        df = df.copy()
        df["part"] = hash_part(h, 32)
        return df

    def first(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values([key, keep_order_col]) \
            .drop_duplicates(key, keep="first").drop(columns=["part"])
    return ds.map_batches(add_part, batch_format="pandas") \
        .groupby("part").map_groups(first, batch_format="pandas")


def duplicate_keys(ds: ray.data.Dataset, key: str) -> ray.data.Dataset:
    """(key, n) for keys appearing more than once — dup detection as data,
    not as a fatal error (vs /root/reference/osm/Planet.go:160-163)."""
    from ray.data.aggregate import Count
    counts = ds.groupby(key).aggregate(Count(alias_name="n"))
    return counts.filter(expr="n > 1")


def add_revenue(batch: pa.Table, price: str = "l_extendedprice",
                disc: str = "l_discount", out: str = "revenue") -> pa.Table:
    return batch.append_column(out, pc.multiply(batch[price], pc.subtract(pa.scalar(1.0), batch[disc])))


from .util import round_half_away  # noqa: E402  (re-export; see util.py)
