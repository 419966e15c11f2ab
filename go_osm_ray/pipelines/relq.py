"""General relational pipelines over the TPC-H-ish testdata tables.

These exercise the engine's generic operator surface (groupby/aggregate
with combiner pre-aggregation, sort+limit top-k, hash join, broadcast
join, windowed aggregation, sessionization) with direct SQL oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from ..relational import broadcast_table, hash_part, round_half_away, single_merge


def q1_pricing(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """TPC-H Q1-shaped pricing summary with combiner pre-aggregation:
    each block collapses to one partial row per key before the shuffle."""
    def partial(t: pa.Table) -> pa.Table:
        # per-block combiner, vectorized in Arrow (pandas blocks would make
        # the downstream Ray groupby ~10x slower — measured)
        t = t.append_column("disc_price",
                            pc.multiply(t["l_extendedprice"],
                                        pc.subtract(pa.scalar(1.0), t["l_discount"])))
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("l_quantity", "count")])
        return g.rename_columns(["l_returnflag", "l_linestatus", "sum_qty",
                                 "sum_base_price", "sum_disc_price", "count_order"])

    partials = lineitem.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    final = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("count_order", alias_name="count_order"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        avg_qty = pc.divide(batch["sum_qty"], pc.cast(batch["count_order"], pa.float64()))
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "sum_qty": round_half_away(batch["sum_qty"], 2),
            "sum_base_price": round_half_away(batch["sum_base_price"], 2),
            "sum_disc_price": round_half_away(batch["sum_disc_price"], 2),
            "avg_qty": round_half_away(avg_qty, 4),
            "count_order": pc.cast(batch["count_order"], pa.int64()),
        })
    return final.map_batches(finish, batch_format="pyarrow")


def top_revenue_orders(lineitem: ray.data.Dataset, k: int = 10) -> ray.data.Dataset:
    """Top-k orders by revenue: partial per-block order sums -> groupby ->
    round -> global sort (desc, key asc tiebreak) -> limit."""
    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        g = pa.table({"l_orderkey": t["l_orderkey"], "revenue": rev}) \
            .group_by("l_orderkey").aggregate([("revenue", "sum")])
        return g.rename_columns(["l_orderkey", "revenue"])

    def merge_topk(t: pa.Table) -> pa.Table:
        g = t.group_by("l_orderkey").aggregate([("revenue", "sum")]) \
             .rename_columns(["l_orderkey", "revenue"])
        rev = np.asarray(round_half_away(g["revenue"].combine_chunks(), 2))
        keys = g["l_orderkey"].combine_chunks().to_numpy()
        order = np.lexsort((keys, -rev))[:k]
        return pa.table({"l_orderkey": pa.array(keys[order]),
                         "revenue": pa.array(rev[order])})

    # Per-block combine shrinks lineitem ~4x; the surviving per-order
    # partials (one small int64/double table) merge + sort + limit in ONE
    # guarded task (single_merge coalesces every block into one batch).
    # At 10^12-row scale swap for groupby("l_orderkey").aggregate(Sum) +
    # per-block local top-k — measured here, Ray's all-to-all on the
    # 147 K partials costs ~7 s vs ~0.3 s for the single-task merge.
    partials = lineitem.map_batches(partial, batch_format="pyarrow",
                                    batch_size=65536)
    return single_merge(partials, merge_topk)


def nation_revenue(orders: ray.data.Dataset, customer: ray.data.Dataset,
                   nation: ray.data.Dataset,
                   num_partitions: int = 4) -> ray.data.Dataset:
    """Revenue per nation: COMBINER pre-aggregation of orders per
    custkey inside map_batches (each block collapses to one partial row
    per customer — the join input shrinks from |orders| to ~|custkeys|
    before any shuffle, VERDICT r2 #5), then the hash-partitioned
    Dataset.join against customer (both sides scale with sf), then a
    broadcast map join for the 25-row nation dimension (SURVEY §2.5
    J3 pattern)."""
    def pre(t: pa.Table) -> pa.Table:
        g = pa.table({"o_custkey": t["o_custkey"], "tp": t["o_totalprice"]}) \
            .group_by("o_custkey").aggregate([("tp", "sum"), ("tp", "count")])
        return g.rename_columns(["o_custkey", "tp", "pn"])

    partials = orders.select_columns(["o_custkey", "o_totalprice"]) \
        .map_batches(pre, batch_format="pyarrow", batch_size=65536)
    joined = partials.join(
        customer.select_columns(["c_custkey", "c_nationkey"]),
        join_type="inner", num_partitions=num_partitions,
        on=("o_custkey",), right_on=("c_custkey",))
    nation_ref = broadcast_table(nation, ["n_nationkey", "n_name"])

    def add_name(batch: pa.Table) -> pa.Table:
        nt = ray.get(nation_ref)
        keys = nt["n_nationkey"].to_numpy()
        order = np.argsort(keys)
        idx = np.searchsorted(keys[order], batch["c_nationkey"].combine_chunks().to_numpy())
        names = nt["n_name"].take(pa.array(order[idx]))
        return batch.append_column("n_name", names)

    named = joined.map_batches(add_name, batch_format="pyarrow")

    # 25 nations: per-block combine then one-task merge beats a second
    # all-to-all after the join (the key space is bounded by the
    # dimension table, so this holds at any fact-table scale)
    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"n_name": t["n_name"], "tp": t["tp"], "pn": t["pn"]}) \
            .group_by("n_name").aggregate([("tp", "sum"), ("pn", "sum")])
        return g.rename_columns(["n_name", "tp", "pn"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("n_name").aggregate([("tp", "sum"), ("pn", "sum")])
        g = g.rename_columns(["n_name", "total_price", "n_orders"])
        return pa.table({
            "n_name": g["n_name"],
            "total_price": round_half_away(g["total_price"].combine_chunks(), 2),
            "n_orders": pc.cast(g["n_orders"], pa.int64()),
        })

    return single_merge(named.map_batches(partial, batch_format="pyarrow"),
                        merge)


def q3_shipping(lineitem: ray.data.Dataset, orders: ray.data.Dataset,
                customer: ray.data.Dataset, segment: str = "BUILDING",
                cutoff: str = "1998-06-01", k: int = 10,
                num_partitions: int = 8) -> ray.data.Dataset:
    """TPC-H Q3 shape (shipping-priority): top-k unshipped orders by
    revenue for one market segment — the canonical 3-way fact/fact/dim
    join + group + rank query.

    Scale plan: lineitem (the big fact) is filtered at the read and
    COMBINED per block to one partial revenue row per orderkey before
    any shuffle; orders filters by date, hash-joins customer (both
    sides scale with sf — no broadcast of a 1/5-of-customers segment
    at web scale), then ONE hash join matches the collapsed lineitem
    partials. Top-k is per-block partial + single bounded merge, no
    global sort. Revenue summed in integer cents (per-row round) so
    engine and SQL agree regardless of float summation order."""
    cut = np.datetime64(cutoff, "us").astype(np.int64)

    def li_partial(t: pa.Table) -> pa.Table:
        keep = t["l_shipdate"].combine_chunks().to_numpy().astype(np.int64) > cut
        t = t.filter(pa.array(keep))
        rev = round_half_away(
            t["l_extendedprice"].combine_chunks().to_numpy()
            * (1.0 - t["l_discount"].combine_chunks().to_numpy()) * 100.0,
            0).astype(np.int64)
        g = pa.table({"l_orderkey": t["l_orderkey"], "rc": pa.array(rev)}) \
            .group_by("l_orderkey").aggregate([("rc", "sum")])
        return g.rename_columns(["l_orderkey", "rc"])

    def li_part(t: pa.Table) -> pa.Table:
        part = hash_part(t["l_orderkey"].combine_chunks().to_numpy(),
                         num_partitions)
        return t.append_column("part", pa.array(part))

    def li_final(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by("l_orderkey") \
            .aggregate([("rc", "sum")])
        return g.rename_columns(["l_orderkey", "rc"])

    # collapse to EXACTLY one revenue row per orderkey before the join
    # (block-local partials + one orderkey-hash exchange) so the
    # post-join top-k partials rank complete sums, never fragments
    li = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]) \
        .map_batches(li_partial, batch_format="pyarrow", batch_size=65536) \
        .map_batches(li_part, batch_format="pyarrow") \
        .groupby("part").map_groups(li_final, batch_format="pyarrow")

    def ord_filter(t: pa.Table) -> pa.Table:
        keep = t["o_orderdate"].combine_chunks().to_numpy().astype(np.int64) < cut
        return t.filter(pa.array(keep))

    def cust_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["c_mktsegment"], segment)) \
            .select(["c_custkey"])

    ords = orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]) \
        .map_batches(ord_filter, batch_format="pyarrow") \
        .join(customer.select_columns(["c_custkey", "c_mktsegment"])
              .map_batches(cust_filter, batch_format="pyarrow"),
              join_type="inner", num_partitions=num_partitions,
              on=("o_custkey",), right_on=("c_custkey",))

    joined = li.join(ords, join_type="inner",
                     num_partitions=num_partitions,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def topk(t: pa.Table) -> pa.Table:
        # partial revenue rows for one orderkey may span blocks of the
        # lineitem combiner output; the join keyed them together, but a
        # final per-orderkey sum is still needed before ranking
        g = t.group_by(["l_orderkey", "o_orderdate", "o_orderpriority"]) \
            .aggregate([("rc", "sum")])
        rc = g["rc_sum"].combine_chunks().to_numpy()
        ok = g["l_orderkey"].combine_chunks().to_numpy()
        order = np.lexsort((ok, -rc))[:k]
        return pa.table({
            "l_orderkey": pa.array(ok[order]),
            "revenue_cents": pa.array(rc[order]),
            "o_orderdate": g["o_orderdate"].take(pa.array(order)),
            "o_orderpriority": g["o_orderpriority"].take(pa.array(order)),
        })

    def merge(t: pa.Table) -> pa.Table:
        rc = t["revenue_cents"].combine_chunks().to_numpy()
        ok = t["l_orderkey"].combine_chunks().to_numpy()
        order = np.lexsort((ok, -rc))[:k]
        return t.take(pa.array(order))

    return single_merge(joined.map_batches(topk, batch_format="pyarrow"),
                        merge)


def _topk_per_key(names: np.ndarray, vals: np.ndarray, keys: np.ndarray,
                  k: int):
    """Vectorized per-group top-k: one factorize + lexsort + rank-in-run
    (value desc, tiebreak key asc). Returns a keep mask + ranks."""
    codes, _ = pd.factorize(names)
    order = np.lexsort((keys, -vals, codes))
    cs = codes[order]
    starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
    runlen = np.diff(np.r_[starts, len(cs)])
    rank = np.arange(len(cs)) - np.repeat(starts, runlen)
    keep = rank < k
    idx = order[keep]
    return idx, (rank[keep] + 1).astype(np.int64)


def top_orders_per_nation(orders: ray.data.Dataset, customer: ray.data.Dataset,
                          nation: ray.data.Dataset, k: int = 3) -> ray.data.Dataset:
    """Grouped top-k: the k highest-value orders per nation. Hash join
    for the fact side, broadcast for the 25-row dimension, then the
    COMBINER form of grouped ranking: every block keeps only its local
    top-k per nation (one vectorized kernel), so the merge input is
    bounded by 25k x blocks rows and one guarded task finishes the exact
    ranking at any fact-table scale."""
    joined = orders.select_columns(["o_orderkey", "o_custkey",
                                    "o_totalprice"]).join(
        customer.select_columns(["c_custkey", "c_nationkey"]),
        join_type="inner", num_partitions=8,
        on=("o_custkey",), right_on=("c_custkey",))
    nation_ref = broadcast_table(nation, ["n_nationkey", "n_name"])

    def add_name(batch: pa.Table) -> pa.Table:
        nt = ray.get(nation_ref)
        keys = nt["n_nationkey"].to_numpy()
        order = np.argsort(keys)
        idx = np.searchsorted(keys[order],
                              batch["c_nationkey"].combine_chunks().to_numpy())
        return pa.table({
            "n_name": nt["n_name"].take(pa.array(order[idx])),
            "o_orderkey": batch["o_orderkey"],
            "o_totalprice": batch["o_totalprice"],
        })

    def partial(t: pa.Table) -> pa.Table:
        names = np.asarray(t["n_name"].to_pylist(), object)
        vals = t["o_totalprice"].combine_chunks().to_numpy()
        keys = t["o_orderkey"].combine_chunks().to_numpy()
        idx, _ = _topk_per_key(names, vals, keys, k)
        return t.take(pa.array(idx))

    def merge(t: pa.Table) -> pa.Table:
        names = np.asarray(t["n_name"].to_pylist(), object)
        vals = t["o_totalprice"].combine_chunks().to_numpy()
        keys = t["o_orderkey"].combine_chunks().to_numpy()
        idx, rank = _topk_per_key(names, vals, keys, k)
        return pa.table({
            "n_name": pa.array(names[idx].tolist(), pa.string()),
            "rank": pa.array(rank),
            "o_orderkey": pa.array(keys[idx]),
            "total_price": round_half_away(vals[idx], 2),
        })

    named = joined.map_batches(add_name, batch_format="pyarrow")
    return single_merge(named.map_batches(partial, batch_format="pyarrow"),
                        merge)


def _window_part(t: pa.Table, num_parts: int) -> pa.Table:
    """Bounded hash partition of the (event_type, window_start_s) key."""
    from ..relational import _col_hash
    win = t["window_start_s"].combine_chunks().to_numpy()
    with np.errstate(over="ignore"):
        key = win.astype(np.uint64) * np.uint64(1_000_003) \
            + _col_hash(t["event_type"])
    return t.append_column("part", pa.array(hash_part(key, num_parts)))


def _window_merge(t: pa.Table) -> pa.Table:
    g = t.drop_columns(["part"]) \
        .group_by(["event_type", "window_start_s"]) \
        .aggregate([("pn", "sum"), ("psum", "sum")])
    return pa.table({
        "event_type": g["event_type"],
        "window_start_s": g["window_start_s"],
        "n": pc.cast(g["pn_sum"], pa.int64()),
        "sum_value": round_half_away(g["psum_sum"].combine_chunks(), 4),
    })


def events_window(events: ray.data.Dataset, window_s: int = 3600,
                  num_parts: int = 32) -> ray.data.Dataset:
    """Tumbling-window aggregate: (event_type, window_start_s) -> count,
    sum(value). Window assignment is a vectorized epoch floor; Ray Data
    has no event-time windows, so the window IS the shuffle key (ray_guide
    streaming-shaped pattern). Physical plan: assignment fuses with a
    per-block Acero combine (one partial row per key per block), then the
    bounded hash-partition exchange + one Acero merge per partition — the
    key space grows with the covered time range, so a per-key Ray
    aggregate would pay per-group overhead at scale."""
    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].combine_chunks().cast(pa.int64()).to_numpy()  # us
        win = (ts // (window_s * 1_000_000)) * window_s
        g = pa.table({"event_type": batch["event_type"].combine_chunks(),
                      "window_start_s": pa.array(win.astype(np.int64)),
                      "value": batch["value"].combine_chunks()}) \
            .group_by(["event_type", "window_start_s"]) \
            .aggregate([("value", "sum"), ("value", "count")])
        g = g.rename_columns(["event_type", "window_start_s", "psum", "pn"])
        return _window_part(g, num_parts)

    return events.map_batches(partial, batch_format="pyarrow") \
        .groupby("part").map_groups(_window_merge, batch_format="pyarrow")


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset,
              by: str = "user_id", on: str = "ts",
              right_cols: tuple[str, ...] = ("event_id", "value"),
              num_parts: int = 16) -> ray.data.Dataset:
    """ASOF join — an operator Ray Data lacks: for every left row, the
    LATEST right row with the same ``by`` key and ``on`` <= left ``on``
    (left join; misses are null). Physical plan: both sides co-partition
    by a bounded hash of ``by`` (each key wholly in one partition), then
    ONE vectorized kernel per partition — dense-rank the keys, encode
    (rank, time) into a single monotonic int64, sort the right side
    once, and binary-search every left row (np.searchsorted). Mirrored
    by DuckDB's native ASOF LEFT JOIN in the oracle.

    Assumes (by, on) is unique on the right side (ties would make the
    winner undefined — same caveat as the SQL ASOF)."""
    def tag(is_left: bool):
        def fn(t: pa.Table) -> pa.Table:
            uid = t[by].combine_chunks().to_numpy()
            cols = {
                by: t[by].combine_chunks(),
                on: t[on].combine_chunks(),
                "_lid": t["event_id"].combine_chunks() if is_left
                else pa.nulls(len(t), pa.int64()),
            }
            for c in right_cols:
                cols[f"_r_{c}"] = pa.nulls(len(t), t.schema.field(c).type
                                           if c in t.column_names
                                           else pa.float64()) if is_left \
                    else t[c].combine_chunks()
            cols["_is_left"] = pa.array(np.full(len(t), is_left))
            cols["part"] = pa.array(hash_part(uid, num_parts))
            return pa.table(cols)
        return fn

    lt = left.map_batches(tag(True), batch_format="pyarrow")
    rt = right.map_batches(tag(False), batch_format="pyarrow")
    both = lt.union(rt)

    def kernel(t: pa.Table) -> pa.Table:
        # One merged lexsort by (key-rank, ts, side) with right rows
        # ordering BEFORE left rows on ts ties (ASOF is inclusive), then a
        # running last-right-position scan. No (rank, ts) packing — the
        # round-2 ``rank * span + ts`` int64 pack silently wrapped at
        # ~300k keys x microsecond-year spans (ADVICE r2).
        is_left = t["_is_left"].combine_chunks().to_numpy(zero_copy_only=False)
        uid = t[by].combine_chunks().to_numpy()
        ts = t[on].combine_chunks().cast(pa.int64()).to_numpy()
        _, rank = np.unique(uid, return_inverse=True)
        order = np.lexsort((is_left, ts, rank))
        rank_s = rank[order]
        left_s = is_left[order]
        # latest right-row position at or before each sorted slot
        rpos = np.where(~left_s, np.arange(len(order)), -1)
        last_right = np.maximum.accumulate(rpos) if len(rpos) \
            else rpos.astype(np.int64)
        cand = last_right[left_s]                      # per left row (sorted)
        ok = cand >= 0
        # a candidate from an earlier key-rank segment means "no right row
        # for this key yet" — reject it
        ok[ok] &= rank_s[cand[ok]] == rank_s[left_s][ok]
        left_orig = order[left_s]                      # original row indices
        lid = t["_lid"].combine_chunks()
        out = {
            "event_id": lid.take(pa.array(left_orig)),
            "ts_us": pa.array(ts[left_orig]),
        }
        match_orig = order[np.where(ok, cand, 0)]      # 0 = dummy, masked out
        for c in right_cols:
            col = t[f"_r_{c}"].combine_chunks()
            vals = col.take(pa.array(match_orig))
            out[f"prev_{c}"] = pc.if_else(pa.array(ok), vals,
                                          pa.nulls(len(ok), col.type))
        return pa.table(out)

    return both.groupby("part").map_groups(kernel, batch_format="pyarrow")


def range_join_count(left: ray.data.Dataset, right: ray.data.Dataset,
                     horizon_s: int = 3600, by: str = "user_id",
                     on: str = "ts", id_col: str = "event_id",
                     num_parts: int = 16) -> ray.data.Dataset:
    """RANGE join (count form) — the interval sibling of ``asof_join``:
    for every left row, how many right rows share its ``by`` key with
    ``on`` in [left.on, left.on + horizon)?  (event_id, ts_us,
    n_follow), left-join semantics (no matches -> 0).

    Physical plan: the same bounded co-partition by hash(``by``) as
    ASOF, then ONE merged-scan kernel per partition: each left row
    contributes TWO probe points (ts and ts + horizon), everything
    lexsorts by (key-rank, ts, probe-before-right-on-ties) and a
    single cumulative count of right rows gives the half-open interval
    count as run[hi_probe] - run[lo_probe].  No (rank, ts) packing
    (ADVICE r2), no per-key python, O((L + R) log) per partition."""
    def tag(is_left: bool):
        def fn(t: pa.Table) -> pa.Table:
            uid = t[by].combine_chunks().to_numpy()
            return pa.table({
                by: t[by].combine_chunks(),
                on: t[on].combine_chunks(),
                "_lid": t[id_col].combine_chunks() if is_left
                else pa.nulls(len(t), pa.int64()),
                "_is_left": pa.array(np.full(len(t), is_left)),
                "part": pa.array(hash_part(uid, num_parts)),
            })
        return fn

    both = left.map_batches(tag(True), batch_format="pyarrow") \
        .union(right.map_batches(tag(False), batch_format="pyarrow"))
    _PER_S = {"s": 1, "ms": 10 ** 3, "us": 10 ** 6, "ns": 10 ** 9}

    def kernel(t: pa.Table) -> pa.Table:
        ts_type = t.schema.field(on).type
        # horizon in the column's own resolution (a ns column with a
        # us-assumed offset would silently shrink the window 1000x)
        unit = ts_type.unit if pa.types.is_timestamp(ts_type) else "us"
        h_us = np.int64(horizon_s * _PER_S[unit])
        is_left = t["_is_left"].combine_chunks().to_numpy(zero_copy_only=False)
        uid = t[by].combine_chunks().to_numpy()
        ts = t[on].combine_chunks().cast(pa.int64()).to_numpy()
        _, rank = np.unique(uid, return_inverse=True)
        l_rank, l_ts = rank[is_left], ts[is_left]
        r_rank, r_ts = rank[~is_left], ts[~is_left]
        nl = len(l_ts)
        # probes: [lo]*nl then [hi]*nl; side=0 sorts probes BEFORE right
        # rows at ts ties, so run[probe] counts rights with ts strictly
        # below — giving [ts, ts+h) half-open semantics after differencing
        p_rank = np.concatenate([l_rank, l_rank])
        p_ts = np.concatenate([l_ts, l_ts + h_us])
        a_rank = np.concatenate([p_rank, r_rank])
        a_ts = np.concatenate([p_ts, r_ts])
        a_side = np.concatenate([np.zeros(2 * nl, np.int8),
                                 np.ones(len(r_ts), np.int8)])
        order = np.lexsort((a_side, a_ts, a_rank))
        run = np.cumsum(a_side[order] == 1) - (a_side[order] == 1)
        pos = np.empty(len(order), np.int64)
        pos[order] = np.arange(len(order))
        cnt = run[pos[nl:2 * nl]] - run[pos[:nl]]
        lid = t["_lid"].combine_chunks().filter(pa.array(is_left))
        return pa.table({
            "event_id": lid,
            "ts_us": pa.array(l_ts),
            "n_follow": pa.array(cnt.astype(np.int64)),
        })

    return both.groupby("part").map_groups(kernel, batch_format="pyarrow")


def events_sliding_window(events: ray.data.Dataset, size_s: int = 3600,
                          hop_s: int = 1800) -> ray.data.Dataset:
    """HOPPING-window aggregate (the sliding counterpart of
    events_window): every event replicates into the ``size_s/hop_s``
    windows covering it (vectorized np.repeat expansion — the
    streaming-semantics row multiplication), then the same
    per-block-partial + groupby pattern aggregates per
    (event_type, window_start_s). Ray Data has no event-time windows;
    the window IS the key."""
    def expand(batch: pa.Table) -> pa.Table:
        us = batch["ts"].combine_chunks().cast(pa.int64()).to_numpy()
        sec = us // 1_000_000
        k_lo = (sec - size_s) // hop_s + 1
        k_hi = sec // hop_s  # inclusive
        reps = (k_hi - k_lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(sec), dtype=np.int64), reps)
        offs = np.concatenate([np.arange(r) for r in reps]) \
            if len(reps) else np.empty(0, np.int64)
        ws = (np.repeat(k_lo, reps) + offs) * hop_s
        return pa.table({
            "event_type": pc.take(batch["event_type"].combine_chunks(),
                                  pa.array(idx)),
            "window_start_s": pa.array(ws),
            "value": pc.take(batch["value"].combine_chunks(), pa.array(idx)),
        })

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "window_start_s"]).aggregate(
            [("value", "sum"), ("value", "count")])
        g = g.rename_columns(["event_type", "window_start_s",
                              "psum", "pn"])
        return _window_part(g, 32)

    return (events.select_columns(["ts", "event_type", "value"])
            .map_batches(expand, batch_format="pyarrow")
            .map_batches(partial, batch_format="pyarrow")
            .groupby("part").map_groups(_window_merge,
                                        batch_format="pyarrow"))


def sessionize(events: ray.data.Dataset, gap_s: int = 1800,
               num_parts: int = 16) -> ray.data.Dataset:
    """Per-user session counts (sessions split at ts gaps > gap_s).

    Distributed plan: events shuffle by a BOUNDED user-hash partition
    (``hash_part`` — every user's rows land wholly in one of
    ``num_parts`` partitions) and ONE vectorized kernel per partition
    does lexsort by (user, ts) + segment boundaries + gap mask +
    reduceat. No per-user group calls (1500 map_groups calls cost ~5 s
    at sf0.1; the kernel is ~0.3 s) and no single all-users task (the
    round-1 plan) — raise num_parts with cluster size."""
    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(uid, num_parts)))

    def per_partition(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        order = np.lexsort((ts, uid))
        u, ts = uid[order], ts[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        gap = np.r_[False, (ts[1:] - ts[:-1]) > gap_s * 1_000_000]
        starts = np.flatnonzero(new_user)
        session_break = (gap & ~new_user).astype(np.int64)
        n_sessions = 1 + np.add.reduceat(session_break, starts)
        n_events = np.diff(np.r_[starts, len(u)])
        return pa.table({
            "user_id": pa.array(u[starts]),
            "n_sessions": pa.array(n_sessions, pa.int64()),
            "n_events": pa.array(n_events, pa.int64()),
        })
    return (events.select_columns(["user_id", "ts"])
            .map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(per_partition, batch_format="pyarrow"))


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot(events: ray.data.Dataset,
                 num_parts: int = 32) -> ray.data.Dataset:
    """Per-user event-type PIVOT: (user_id, n_click, n_error,
    n_purchase, n_signup, n_view, value_sum2).  The pivot is free under
    the combiner pattern — each block appends five int64 indicator
    columns (one Arrow comparison each) and collapses them with ONE
    Acero hash aggregation, so the exchange moves one partial row per
    (user, block), never events.  SQL mirror: COUNT(*) FILTER."""
    from ..relational import partial_groupby_agg

    def indicators(t: pa.Table) -> pa.Table:
        et = t["event_type"].combine_chunks()
        cols = {"user_id": t["user_id"].combine_chunks(),
                "value": t["value"].combine_chunks()}
        for ty in EVENT_TYPES:
            cols[f"n_{ty}"] = pc.cast(pc.equal(et, ty), pa.int64())
        return pa.table(cols)

    aggs = [(f"n_{ty}", "sum") for ty in EVENT_TYPES] + [("value", "sum")]
    g = partial_groupby_agg(
        events.map_batches(indicators, batch_format="pyarrow"),
        ["user_id"], aggs, num_parts=num_parts)

    def finish(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"]}
        for ty in EVENT_TYPES:
            cols[f"n_{ty}"] = t[f"n_{ty}_sum"]
        cols["value_sum2"] = pa.array(
            round_half_away(t["value_sum"], 2), pa.float64())
        return pa.table(cols)
    return g.map_batches(finish, batch_format="pyarrow")


def orders_rollup(orders: ray.data.Dataset,
                  num_parts: int = 32) -> ray.data.Dataset:
    """GROUP BY ROLLUP (o_orderstatus, o_orderpriority): counts and
    total price at all three levels, NULLing the rolled-up key like
    SQL. ONE combiner exchange produces the finest level; the coarser
    levels are exact re-aggregations of that small per-key table in a
    single bounded task (rows = key-combination count, never data),
    summed in sorted key order so the result is partition-invariant."""
    from ..relational import partial_groupby_agg, single_merge

    fine = partial_groupby_agg(
        orders.select_columns(["o_orderstatus", "o_orderpriority",
                               "o_totalprice"]),
        ["o_orderstatus", "o_orderpriority"],
        [("o_totalprice", "sum"), ("o_totalprice", "count")],
        num_parts=num_parts)

    def finish(t: pa.Table) -> pa.Table:
        t = t.sort_by([("o_orderstatus", "ascending"),
                       ("o_orderpriority", "ascending")])
        st = t["o_orderstatus"].combine_chunks()
        pr = t["o_orderpriority"].combine_chunks()
        s = t["o_totalprice_sum"].combine_chunks().to_numpy()
        n = t["o_totalprice_count"].combine_chunks().to_numpy()
        lv1 = pa.table({"o_orderstatus": st, "s": pa.array(s),
                        "n": pa.array(n)}) \
            .group_by("o_orderstatus").aggregate([("s", "sum"),
                                                  ("n", "sum")]) \
            .sort_by([("o_orderstatus", "ascending")])
        # 'ALL' sentinel instead of SQL's rollup NULL: the gate's
        # value-hash treats None vs NaN as distinct, and no real key is
        # ever null here (oracle mirrors with COALESCE)
        rows_st = pa.concat_arrays(
            [st, lv1["o_orderstatus"].combine_chunks(),
             pa.array(["ALL"], st.type)])
        rows_pr = pa.concat_arrays(
            [pr, pa.array(["ALL"] * (len(lv1) + 1), pr.type)])
        sums = np.concatenate([s, lv1["s_sum"].to_numpy(), [s.sum()]])
        ns = np.concatenate([n, lv1["n_sum"].to_numpy(), [n.sum()]])
        return pa.table({
            "o_orderstatus": rows_st,
            "o_orderpriority": rows_pr,
            "n": pa.array(ns, pa.int64()),
            "total2": pa.array(round_half_away(sums, 2), pa.float64()),
        })
    return single_merge(fine, finish)


FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_S = 24 * 3600


def events_funnel(events: ray.data.Dataset,
                  steps: tuple[str, ...] = FUNNEL_STEPS,
                  window_s: int = FUNNEL_WINDOW_S,
                  num_parts: int = 16) -> ray.data.Dataset:
    """(user_id, depth, dur_ms): ordered conversion funnel with
    first-occurrence (greedy) semantics — step 1 anchors at the user's
    EARLIEST ``steps[0]`` event, and each later step k anchors at the
    earliest ``steps[k]`` event strictly after step k-1 and within
    ``window_s`` of it.  ``depth`` is the deepest step reached (users
    with no step-1 event are absent); ``dur_ms`` is the whole-funnel
    duration for completers and -1 otherwise (sentinel, not NULL, so
    the driver's value hash is stable).

    Scale plan: the read keeps only (user_id, ts, event_type) rows whose
    type participates in the funnel (pushed filter — error/other events
    never leave the scan), those shuffle ONCE by bounded user-hash
    partition, and one vectorized kernel per partition resolves every
    step: per-user segment ids via lexsort + reduceat anchors, one
    boolean mask + minimum.reduceat per step — no per-user group calls,
    no window-function sort of the full event log."""
    step_list = list(steps)

    def add_part(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["event_type"], value_set=pa.array(step_list))
        t = t.filter(m)
        uid = t["user_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(uid, num_parts)))

    w_us = np.int64(window_s) * 1_000_000
    inf = np.iinfo(np.int64).max

    def per_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            e = pa.array(np.empty(0, np.int64))
            return pa.table({"user_id": e, "depth": e, "dur_ms": e})
        uid = t["user_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        ety = t["event_type"]
        order = np.lexsort((ts, uid))
        u, ts = uid[order], ts[order]
        step_masks = [pc.equal(ety, name).combine_chunks()
                      .to_numpy(zero_copy_only=False)[order]
                      for name in step_list]
        new_user = np.r_[True, u[1:] != u[:-1]]
        starts = np.flatnonzero(new_user)
        seg = np.cumsum(new_user) - 1          # per-row user segment id
        n_users = len(starts)

        t_prev = None                           # per-user anchor, int64 us
        t_first = None
        depth = np.zeros(n_users, np.int64)
        for k, is_step in enumerate(step_masks):
            if k == 0:
                cand = is_step
            else:
                anchored = t_prev[seg]
                cand = is_step & (anchored < inf) & (ts > anchored) \
                    & (ts <= anchored + w_us)
            val = np.where(cand, ts, inf)
            t_k = np.minimum.reduceat(val, starts)
            # reduceat on an empty trailing segment cannot happen: every
            # segment is nonempty by construction
            reached = t_k < inf
            depth += reached.astype(np.int64)
            if k == 0:
                t_first = t_k
            t_prev = t_k
        keep = depth >= 1
        dur = np.full(n_users, -1, np.int64)
        full = depth == len(step_list)
        dur[full] = (t_prev[full] - t_first[full]) // 1000
        return pa.table({"user_id": pa.array(u[starts][keep]),
                         "depth": pa.array(depth[keep], pa.int64()),
                         "dur_ms": pa.array(dur[keep], pa.int64())})

    return (events.select_columns(["user_id", "ts", "event_type"])
            .map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(per_partition, batch_format="pyarrow"))


def events_retention(events: ray.data.Dataset,
                     num_parts: int = 16) -> ray.data.Dataset:
    """(cohort_day, day_offset, n_users): classic cohort retention —
    users grouped by the UTC day of their first event; ``n_users``
    counts the cohort's distinct users active ``day_offset`` days later.

    Scale plan: one bounded user-hash exchange co-locates each user's
    rows; the per-partition kernel (lexsort + segment math) derives the
    cohort day and the user's distinct active days in one pass, then
    collapses to (cohort, offset, n) partials — so the second exchange
    (partial_groupby_agg) moves one row per (cohort, offset, partition),
    never per event.  Users are whole within a partition, so partial
    counts are exact."""
    from ..relational import partial_groupby_agg

    day_us = np.int64(86_400_000_000)

    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(uid, num_parts)))

    def per_partition(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        day = ts // day_us
        order = np.lexsort((day, uid))
        u, d = uid[order], day[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        seg = np.cumsum(new_user) - 1
        cohort = d[np.flatnonzero(new_user)]      # first (= min) day per user
        # distinct (user, day): day is sorted within user -> consecutive dedup
        first = new_user | np.r_[False, d[1:] != d[:-1]]
        off = d[first] - cohort[seg[first]]
        co = cohort[seg[first]]
        key = co * np.int64(1 << 20) + off        # offsets < 2^20 days
        ks, cnt = np.unique(key, return_counts=True)
        return pa.table({"cohort_day": pa.array(ks >> np.int64(20), pa.int64()),
                         "day_offset": pa.array(ks & np.int64((1 << 20) - 1),
                                                pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    partials = (events.select_columns(["user_id", "ts"])
                .map_batches(add_part, batch_format="pyarrow")
                .groupby("part")
                .map_groups(per_partition, batch_format="pyarrow"))
    g = partial_groupby_agg(partials, ["cohort_day", "day_offset"],
                            [("n", "sum")], num_parts=num_parts)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["cohort_day", "day_offset", "n_users"])
    return g.map_batches(rename, batch_format="pyarrow")


def events_latest(events: ray.data.Dataset,
                  num_parts: int = 16) -> ray.data.Dataset:
    """(user_id, event_id, ts_us, event_type): each user's LATEST event
    (max ts, event_id as the deterministic tie-break) — the per-key
    argmax every CDC / snapshot-maintenance pipeline runs.

    Scale plan: per-block argmax COMBINER (one row per user per block,
    lexsort + last-of-segment), then a bounded user-hash exchange and
    the same kernel per partition — the shuffle moves one candidate row
    per (user, block), never the event stream."""

    def argmax_last(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        ts = t["ts_us"].combine_chunks().to_numpy() \
            if "ts_us" in t.column_names else \
            t["ts"].combine_chunks().to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        eid = t["event_id"].combine_chunks().to_numpy()
        order = np.lexsort((eid, ts, uid))
        u = uid[order]
        last = np.r_[u[1:] != u[:-1], True]
        sel = order[last]
        et = t["event_type"].combine_chunks().take(pa.array(sel))
        return pa.table({
            "user_id": pa.array(uid[sel]),
            "event_id": pa.array(eid[sel]),
            "ts_us": pa.array(ts[sel], pa.int64()),
            "event_type": et,
            "part": pa.array(hash_part(uid[sel], num_parts)),
        })

    return events.map_batches(argmax_last, batch_format="pyarrow") \
        .groupby("part") \
        .map_groups(lambda t: argmax_last(t).drop_columns(["part"]),
                    batch_format="pyarrow")


def customers_without_orders(customer: ray.data.Dataset,
                             orders: ray.data.Dataset,
                             min_totalprice: float = 300_000.0,
                             num_parts: int = 32) -> ray.data.Dataset:
    """(c_custkey, c_name, c_acctbal): customers that placed NO order
    above ``min_totalprice`` — the exact ANTI join (TPC-H Q22's core),
    complementing the approximate ``bloom_semi`` membership path.

    Scale plan: the FK side is filtered then reduced to per-block
    DISTINCT custkeys (combiner — order keys repeat per customer), and
    both sides co-partition by key hash through
    ``relational.partitioned_anti_filter``'s single bounded exchange;
    no broadcast of the (potentially huge) order-key set, no driver
    materialization."""
    from ..relational import partitioned_anti_filter

    def pre(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["o_totalprice"], min_totalprice))
        v = np.unique(t["o_custkey"].combine_chunks().to_numpy())
        return pa.table({"c_custkey": pa.array(v)})

    keys = orders.map_batches(pre, batch_format="pyarrow")
    return partitioned_anti_filter(customer, "c_custkey", keys,
                                   num_parts=num_parts)


def events_transitions(events: ray.data.Dataset,
                       num_parts: int = 16) -> ray.data.Dataset:
    """(prev_type, next_type, n): counts of consecutive event-type
    bigrams per user — the first-order Markov transition matrix every
    behavioural / sequence-model pipeline derives from a clickstream.

    Distributed plan (same shape as ``sessionize``): ONE bounded
    user-hash exchange co-locates each user's rows, one vectorized
    kernel per partition does lexsort (user, ts, event_id) + adjacent
    pairing + dictionary-coded bincount, and the per-partition partial
    matrices (at most |types|^2 rows each) merge in a single bounded
    task. The exchange moves the event stream once; the merge moves
    only K^2-row partials."""
    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(uid, num_parts)))

    def per_partition(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        eid = t["event_id"].combine_chunks().to_numpy()
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy().astype(np.int64)
        vocab = et.dictionary
        k = len(vocab)
        order = np.lexsort((eid, ts, uid))
        u, c = uid[order], codes[order]
        same = u[1:] == u[:-1]
        prev, nxt = c[:-1][same], c[1:][same]
        cnt = np.bincount(prev * k + nxt, minlength=k * k)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "prev_type": vocab.take(pa.array(nz // k)),
            "next_type": vocab.take(pa.array(nz % k)),
            "pn": pa.array(cnt[nz], pa.int64()),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["prev_type", "next_type"]).aggregate([("pn", "sum")])
        return g.rename_columns(["prev_type", "next_type", "n"])

    from ..relational import single_merge
    parts = (events.select_columns(["event_id", "user_id", "ts",
                                    "event_type"])
             .map_batches(add_part, batch_format="pyarrow")
             .groupby("part")
             .map_groups(lambda t: per_partition(t.drop_columns(["part"])),
                         batch_format="pyarrow"))
    return single_merge(parts, merge)


def events_dau(events: ray.data.Dataset,
               num_parts: int = 16) -> ray.data.Dataset:
    """(day, dau, n_events): daily active users + event volume — the
    COUNT(DISTINCT) workhorse of every analytics pipeline, exact.

    Scale plan: each block collapses to DISTINCT (day, user) pairs
    carrying a partial event count (the combiner bounds the exchange by
    users-per-day, not events), then ONE day-hash exchange co-locates
    each day and a vectorized kernel dedups pairs + sums partials. Days
    are a bounded key space; per-day user sets are the only state a
    task holds. For web-scale per-day cardinalities beyond task memory,
    swap the exact pair dedup for the repo's HLL sketch
    (``sketch.hll_distinct``) — same exchange shape."""
    def _pair_reduce(day: np.ndarray, uid: np.ndarray, w: np.ndarray):
        """Collapse to distinct (day, uid) pairs, summing weights w."""
        order = np.lexsort((uid, day))
        d, u, ws = day[order], uid[order], w[order]
        first = np.r_[True, (d[1:] != d[:-1]) | (u[1:] != u[:-1])]
        starts = np.flatnonzero(first)
        return d[starts], u[starts], np.add.reduceat(ws, starts)

    def pre(t: pa.Table) -> pa.Table:
        day = t["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[D]").astype(np.int64)
        uid = t["user_id"].combine_chunks().to_numpy()
        d, u, pe = _pair_reduce(day, uid, np.ones(len(day), np.int64))
        return pa.table({
            "day": pa.array(d.astype("datetime64[D]").astype("datetime64[us]")),
            "user_id": pa.array(u),
            "pe": pa.array(pe),
            "part": pa.array(hash_part(d, num_parts)),
        })

    def per_partition(t: pa.Table) -> pa.Table:
        day = t["day"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        uid = t["user_id"].combine_chunks().to_numpy()
        pe = t["pe"].combine_chunks().to_numpy()
        d, u, pair_n = _pair_reduce(day, uid, pe)
        d_uniq, d_inv = np.unique(d, return_inverse=True)
        dau = np.bincount(d_inv, minlength=len(d_uniq)).astype(np.int64)
        n_ev = np.zeros(len(d_uniq), np.int64)
        np.add.at(n_ev, d_inv, pair_n)
        return pa.table({
            "day": pa.array(d_uniq.astype("datetime64[D]")
                            .astype("datetime64[us]")),
            "dau": pa.array(dau),
            "n_events": pa.array(n_ev),
        })

    return (events.select_columns(["user_id", "ts"])
            .map_batches(pre, batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda t: per_partition(t.drop_columns(["part"])),
                        batch_format="pyarrow"))


def events_props_stats(events: ray.data.Dataset) -> ray.data.Dataset:
    """(event_type, n, k_sum, k_min, k_max, k_mean): per-type stats of
    a field EXTRACTED from the semi-structured ``props`` JSON column —
    the log-parsing workhorse (schema-on-read over string payloads).

    Scale plan: extraction is a single vectorized RE2 kernel
    (``pc.extract_regex``) per block — the same regex engine DuckDB's
    ``regexp_extract`` uses, so engine and oracle parse identically —
    followed by a block-local combine over the BOUNDED event-type key
    space and one single-task merge of (types x blocks) partial rows.
    No shuffle; rows never leave their block un-aggregated."""
    def partial(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"].combine_chunks(),
                             pattern=r'(?P<k>-?[0-9]+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        g = pa.table({"event_type": t["event_type"], "k": k}) \
            .group_by("event_type") \
            .aggregate([("k", "count"), ("k", "sum"),
                        ("k", "min"), ("k", "max")])
        return g.rename_columns(["event_type", "n", "k_sum",
                                 "k_min", "k_max"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate(
            [("n", "sum"), ("k_sum", "sum"),
             ("k_min", "min"), ("k_max", "max")])
        g = g.rename_columns(["event_type", "n", "k_sum", "k_min", "k_max"])
        mean = round_half_away(
            g["k_sum"].combine_chunks().to_numpy().astype(np.float64)
            / g["n"].combine_chunks().to_numpy(), 6)
        return pa.table({
            "event_type": g["event_type"],
            "n": pc.cast(g["n"], pa.int64()),
            "k_sum": g["k_sum"],
            "k_min": g["k_min"],
            "k_max": g["k_max"],
            "k_mean": pa.array(mean),
        })

    return single_merge(
        events.select_columns(["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow"), merge)


def orders_cumsum(orders: ray.data.Dataset,
                  num_parts: int = 32) -> ray.data.Dataset:
    """(o_custkey, o_orderkey, order_seq, running_cents): per-customer
    running-total window — SUM(...) OVER (PARTITION BY cust ORDER BY
    date, orderkey) plus ROW_NUMBER, the canonical ordered-window shape
    the tumbling/sliding aggregates don't cover.

    Scale plan: ONE customer-hash exchange co-locates each customer's
    orders (per-customer history is small and bounded — the classic
    window-function partitioning assumption), then a single vectorized
    kernel per partition: lexsort by (cust, date, orderkey) and a
    segment-reset cumulative sum (global cumsum minus the segment-start
    offset). No global sort, no per-key group dispatch. Prices are
    converted to integer cents BEFORE summing so engine and SQL agree
    bit-for-bit regardless of float summation order."""
    def kernel(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].combine_chunks().to_numpy()
        ok = t["o_orderkey"].combine_chunks().to_numpy()
        dt = t["o_orderdate"].combine_chunks().to_numpy().astype(np.int64)
        cents = round_half_away(
            t["o_totalprice"].combine_chunks().to_numpy() * 100.0, 0
        ).astype(np.int64)
        order = np.lexsort((ok, dt, ck))
        ck, ok, cents = ck[order], ok[order], cents[order]
        cs = np.cumsum(cents)
        first = np.r_[True, ck[1:] != ck[:-1]]
        starts = np.flatnonzero(first)
        seg = np.cumsum(first) - 1
        offset = np.where(starts > 0, cs[starts - 1], 0)[seg]
        seq = np.arange(len(ck), dtype=np.int64) - starts[seg] + 1
        return pa.table({
            "o_custkey": pa.array(ck),
            "o_orderkey": pa.array(ok),
            "order_seq": pa.array(seq),
            "running_cents": pa.array(cs - offset),
        })

    def pre(t: pa.Table) -> pa.Table:
        part = hash_part(t["o_custkey"].combine_chunks().to_numpy(),
                         num_parts)
        return t.append_column("part", pa.array(part))

    return (orders.select_columns(["o_custkey", "o_orderkey",
                                   "o_orderdate", "o_totalprice"])
            .map_batches(pre, batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda t: kernel(t.drop_columns(["part"])),
                        batch_format="pyarrow"))


def q5_local_supplier(lineitem: ray.data.Dataset, orders: ray.data.Dataset,
                      customer: ray.data.Dataset, supplier: ray.data.Dataset,
                      nation: ray.data.Dataset, region: ray.data.Dataset,
                      region_name: str | None = None,
                      date_lo: str = "1995-01-01", date_hi: str = "1997-01-01",
                      num_partitions: int = 8) -> ray.data.Dataset:
    """(n_name, revenue_cents): TPC-H Q5 shape — local-supplier volume,
    the canonical snowflake join (fact x fact x 2 dims x 2 tiny dims)
    with the customer-nation == supplier-nation equality filter.

    Scale plan: nation x region (<=25 rows each) broadcast ONCE via
    ``ray.put`` and applied as in-task filters, never joined; customer
    and supplier prune to the region BEFORE entering any join; lineitem
    collapses per (orderkey, suppkey) in a block-local combiner so only
    partial rows reach the exchanges; exactly two hash joins move
    fact-scale data (orderkey, then suppkey — supplier is joined, not
    broadcast, because it scales with sf); the nation-equality filter
    runs before the bounded per-nation combine + one-task merge.
    Revenue is per-row integer cents (round-half-away) so engine and
    SQL agree regardless of float summation order.

    Reference parity: go-osm has no relational engine; this exercises
    the graft's generic join/aggregate surface (SURVEY §2.5-2.6)."""
    lo = np.datetime64(date_lo, "us").astype(np.int64)
    hi = np.datetime64(date_hi, "us").astype(np.int64)
    nat_ref = broadcast_table(nation, ["n_nationkey", "n_name", "n_regionkey"])
    reg_ref = broadcast_table(region, ["r_regionkey", "r_name"])

    def _region_nationkeys() -> np.ndarray:
        nt = ray.get(nat_ref)
        if region_name is None:
            return nt["n_nationkey"].to_numpy()
        rt = ray.get(reg_ref)
        rk = rt.filter(pc.equal(rt["r_name"], region_name))["r_regionkey"] \
            .to_numpy()
        keep = np.isin(nt["n_regionkey"].to_numpy(), rk)
        return nt["n_nationkey"].to_numpy()[keep]

    def cust_f(t: pa.Table) -> pa.Table:
        keep = np.isin(t["c_nationkey"].combine_chunks().to_numpy(),
                       _region_nationkeys())
        return t.filter(pa.array(keep))

    def supp_f(t: pa.Table) -> pa.Table:
        keep = np.isin(t["s_nationkey"].combine_chunks().to_numpy(),
                       _region_nationkeys())
        return t.filter(pa.array(keep))

    def ord_f(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].combine_chunks().to_numpy().astype(np.int64)
        return t.filter(pa.array((d >= lo) & (d < hi))) \
            .select(["o_orderkey", "o_custkey"])

    ords = orders.select_columns(["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(ord_f, batch_format="pyarrow") \
        .join(customer.select_columns(["c_custkey", "c_nationkey"])
              .map_batches(cust_f, batch_format="pyarrow"),
              join_type="inner", num_partitions=num_partitions,
              on=("o_custkey",), right_on=("c_custkey",))

    def li_partial(t: pa.Table) -> pa.Table:
        rc = round_half_away(
            t["l_extendedprice"].combine_chunks().to_numpy()
            * (1.0 - t["l_discount"].combine_chunks().to_numpy()) * 100.0,
            0).astype(np.int64)
        g = pa.table({"l_orderkey": t["l_orderkey"],
                      "l_suppkey": t["l_suppkey"], "rc": pa.array(rc)}) \
            .group_by(["l_orderkey", "l_suppkey"]).aggregate([("rc", "sum")])
        return g.rename_columns(["l_orderkey", "l_suppkey", "rc"])

    li = lineitem.select_columns(
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]) \
        .map_batches(li_partial, batch_format="pyarrow", batch_size=65536)

    j1 = li.join(ords, join_type="inner", num_partitions=num_partitions,
                 on=("l_orderkey",), right_on=("o_orderkey",))
    j2 = j1.join(supplier.select_columns(["s_suppkey", "s_nationkey"])
                 .map_batches(supp_f, batch_format="pyarrow"),
                 join_type="inner", num_partitions=num_partitions,
                 on=("l_suppkey",), right_on=("s_suppkey",))

    def nat_partial(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["c_nationkey"], t["s_nationkey"])
        t = t.filter(keep)
        g = pa.table({"nk": t["s_nationkey"], "rc": t["rc"]}) \
            .group_by("nk").aggregate([("rc", "sum")])
        return g.rename_columns(["nk", "rc"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("nk").aggregate([("rc", "sum")])
        g = g.rename_columns(["nk", "revenue_cents"])
        nt = ray.get(nat_ref)
        keys = nt["n_nationkey"].to_numpy()
        order = np.argsort(keys)
        idx = np.searchsorted(keys[order],
                              g["nk"].combine_chunks().to_numpy())
        names = nt["n_name"].take(pa.array(order[idx]))
        rc = g["revenue_cents"].combine_chunks().to_numpy()
        srt = np.lexsort((np.asarray(names), -rc))
        return pa.table({
            "n_name": names.take(pa.array(srt)),
            "revenue_cents": pa.array(rc[srt]),
        })

    return single_merge(j2.map_batches(nat_partial, batch_format="pyarrow"),
                        merge)


def audience_overlap(events: ray.data.Dataset,
                     num_parts: int = 16) -> ray.data.Dataset:
    """(type_a, type_b, users_a, users_b, n_both, jaccard): EXACT
    pairwise audience overlap between event types — the set-intersection
    workhorse behind cohort overlap / co-occurrence analysis.

    Scale plan: each block collapses to DISTINCT (user, type) pairs
    (the combiner bounds the exchange by active users x types, not
    events), ONE user-hash exchange co-locates each user, and the
    per-partition kernel builds a users x types 0/1 incidence matrix B
    and computes ALL pairwise intersections at once as B^T B (types are
    a bounded key space, so the t x t partial is tiny and merges by
    summation — no per-pair shuffles, no quadratic blowup in users).
    Jaccard derives from the merged matrix diagonal."""
    def pre(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        et = t["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
        _, codes = np.unique(et, return_inverse=True)
        order = np.lexsort((codes, uid))
        u, c = uid[order], codes[order]
        first = np.r_[True, (u[1:] != u[:-1]) | (c[1:] != c[:-1])]
        keep = order[first]
        return pa.table({
            "user_id": pa.array(uid[keep]),
            "event_type": t["event_type"].take(pa.array(keep)),
            "part": pa.array(hash_part(uid[keep], num_parts)),
        })

    def per_partition(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        et = t["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
        types, codes = np.unique(et, return_inverse=True)
        order = np.lexsort((codes, uid))
        u, c = uid[order], codes[order]
        first = np.r_[True, (u[1:] != u[:-1]) | (c[1:] != c[:-1])]
        u, c = u[first], c[first]
        _, u_inv = np.unique(u, return_inverse=True)
        schema = pa.schema([("type_a", pa.string()), ("type_b", pa.string()),
                            ("n", pa.int64())])
        if len(types) == 0:
            return schema.empty_table()
        B = np.zeros((u_inv.max() + 1, len(types)), dtype=np.int64)
        B[u_inv, c] = 1
        M = B.T @ B
        ia, ib = np.triu_indices(len(types))
        return pa.table({
            "type_a": pa.array(types[ia].astype(str)),
            "type_b": pa.array(types[ib].astype(str)),
            "n": pa.array(M[ia, ib]),
        }, schema=schema)

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["type_a", "type_b"]).aggregate([("n", "sum")])
        ta = g["type_a"].combine_chunks().to_numpy(zero_copy_only=False)
        tb = g["type_b"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy()
        diag = {a: v for a, b, v in zip(ta, tb, n) if a == b}
        # inner-join semantics: only pairs that actually co-occur
        off = (ta != tb) & (n > 0)
        ta, tb, n = ta[off], tb[off], n[off]
        ua = np.array([diag[a] for a in ta], np.int64)
        ub = np.array([diag[b] for b in tb], np.int64)
        jac = round_half_away(n.astype(np.float64) / (ua + ub - n), 6)
        order = np.lexsort((tb, ta))
        return pa.table({
            "type_a": pa.array(ta[order].astype(str), type=pa.string()),
            "type_b": pa.array(tb[order].astype(str), type=pa.string()),
            "users_a": pa.array(ua[order]),
            "users_b": pa.array(ub[order]),
            "n_both": pa.array(n[order]),
            "jaccard": pa.array(np.asarray(jac)[order]),
        })

    parts = (events.select_columns(["user_id", "event_type"])
             .map_batches(pre, batch_format="pyarrow", batch_size=65536)
             .groupby("part")
             .map_groups(lambda t: per_partition(t.drop_columns(["part"])),
                         batch_format="pyarrow"))
    return single_merge(parts, merge)


def events_anomaly(events: ray.data.Dataset,
                   nd: int = 6) -> ray.data.Dataset:
    """(event_type, day, n, z): per-type daily event volume with its
    z-score against that type's own across-days mean/std (population) —
    the volume-anomaly monitor every event pipeline runs.

    Scale plan: each block collapses to (type, day) partial counts (the
    key space is bounded by types x days, not events), partials merge
    in ONE guarded task where per-type moments and z-scores are a
    vectorized group pass — no shuffle. std==0 (constant series)
    defines z = 0."""
    def partial(t: pa.Table) -> pa.Table:
        day = t["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[D]").astype("datetime64[us]")
        g = pa.table({"event_type": t["event_type"],
                      "day": pa.array(day)}) \
            .group_by(["event_type", "day"]).aggregate([("day", "count")])
        return g.rename_columns(["event_type", "day", "pn"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "day"]).aggregate([("pn", "sum")])
        et = g["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
        day = g["day"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["pn_sum"].combine_chunks().to_numpy().astype(np.float64)
        _, code = np.unique(et, return_inverse=True)
        order = np.lexsort((day, code))
        et, day, n, code = et[order], day[order], n[order], code[order]
        cnt = np.bincount(code)
        mean = np.bincount(code, weights=n) / cnt
        var = np.bincount(code, weights=(n - mean[code]) ** 2) / cnt
        sd = np.sqrt(var)
        z = np.where(sd[code] > 0, (n - mean[code]) / np.where(
            sd[code] > 0, sd[code], 1.0), 0.0)
        return pa.table({
            "event_type": pa.array(et.astype(str), type=pa.string()),
            "day": pa.array(day),
            "n": pa.array(n.astype(np.int64)),
            "z": pa.array(np.asarray(round_half_away(z, nd))),
        })

    return single_merge(
        events.select_columns(["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        merge)


def basket_pairs(lineitem: ray.data.Dataset, k: int = 20,
                 num_parts: int = 16) -> ray.data.Dataset:
    """(pa_key, pb_key, n): top-``k`` part pairs co-occurring in the
    same order — market-basket pair mining, the first step of every
    association-rule / co-purchase pipeline.

    Scale plan: blocks collapse to DISTINCT (order, part) pairs, ONE
    orderkey-hash exchange co-locates each basket, the per-partition
    kernel enumerates each basket's C(k,2) pairs with the vectorized
    clique trick (basket size is bounded by lines-per-order — single
    digits in practice; a cap + analytic count is the web-scale guard
    for degenerate baskets) and pre-counts pairs locally; a second
    pair-hash exchange sums counts; top-k is per-partition partials +
    one bounded merge, never a global sort."""
    def pre(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].combine_chunks().to_numpy()
        pk = t["l_partkey"].combine_chunks().to_numpy()
        order = np.lexsort((pk, ok))
        o, p = ok[order], pk[order]
        first = np.r_[True, (o[1:] != o[:-1]) | (p[1:] != p[:-1])]
        o, p = o[first], p[first]
        return pa.table({"o": pa.array(o), "p": pa.array(p),
                         "part": pa.array(hash_part(o, num_parts))})

    def _clique(o: np.ndarray, p: np.ndarray):
        starts = np.flatnonzero(np.r_[True, o[1:] != o[:-1]]) \
            if len(o) else np.empty(0, np.int64)
        counts = np.diff(np.r_[starts, len(o)]) if len(o) \
            else np.empty(0, np.int64)
        pos = np.arange(len(p), dtype=np.int64)
        rep = np.repeat(counts, counts) - (pos - np.repeat(starts, counts)) - 1
        first_idx = np.repeat(pos, rep)
        base = np.repeat(np.cumsum(rep) - rep, rep)
        second_idx = first_idx + 1 + (np.arange(rep.sum(), dtype=np.int64)
                                      - base)
        return p[first_idx], p[second_idx]

    def baskets(t: pa.Table) -> pa.Table:
        o = t["o"].combine_chunks().to_numpy()
        p = t["p"].combine_chunks().to_numpy()
        order = np.lexsort((p, o))
        o, p = o[order], p[order]
        first = np.r_[True, (o[1:] != o[:-1]) | (p[1:] != p[:-1])] \
            if len(o) else np.empty(0, bool)
        o, p = o[first], p[first]
        a, b = _clique(o, p)
        g = pa.table({"pa_key": pa.array(a), "pb_key": pa.array(b)}) \
            .group_by(["pa_key", "pb_key"]).aggregate([([], "count_all")])
        ka = g["pa_key"].combine_chunks().to_numpy()
        return pa.table({
            "pa_key": g["pa_key"], "pb_key": g["pb_key"],
            "pn": pc.cast(g["count_all"], pa.int64()),
            "part": pa.array(hash_part(ka, num_parts)),
        })

    def count_topk(t: pa.Table) -> pa.Table:
        g = t.group_by(["pa_key", "pb_key"]).aggregate([("pn", "sum")])
        n = g["pn_sum"].combine_chunks().to_numpy()
        a = g["pa_key"].combine_chunks().to_numpy()
        b = g["pb_key"].combine_chunks().to_numpy()
        top = np.lexsort((b, a, -n))[:k]
        return pa.table({"pa_key": pa.array(a[top]),
                         "pb_key": pa.array(b[top]),
                         "n": pa.array(n[top])})

    def merge(t: pa.Table) -> pa.Table:
        a = t["pa_key"].combine_chunks().to_numpy()
        b = t["pb_key"].combine_chunks().to_numpy()
        n = t["n"].combine_chunks().to_numpy()
        top = np.lexsort((b, a, -n))[:k]
        return pa.table({"pa_key": pa.array(a[top]),
                         "pb_key": pa.array(b[top]),
                         "n": pa.array(n[top])})

    pairs = lineitem.select_columns(["l_orderkey", "l_partkey"]) \
        .map_batches(pre, batch_format="pyarrow", batch_size=65536) \
        .groupby("part") \
        .map_groups(lambda t: baskets(t.drop_columns(["part"])),
                    batch_format="pyarrow") \
        .groupby("part") \
        .map_groups(lambda t: count_topk(t.drop_columns(["part"])),
                    batch_format="pyarrow")
    return single_merge(pairs, merge)


def part_skyline(part: ray.data.Dataset) -> ray.data.Dataset:
    """(p_partkey, p_retailprice, p_size): the SKYLINE (Pareto front)
    of parts — minimize retail price, maximize size; a part is dominated
    if some other part is no worse on both axes and strictly better on
    one. The classic multi-criteria operator (Borzsony et al.).

    Scale plan: the skyline is DISTRIBUTIVE — skyline(union) =
    skyline(union of per-block skylines) — so each block collapses to
    its local front (sort by price asc / size desc + running-max scan,
    fully vectorized) and ONE bounded merge task runs the same kernel
    on the concatenated fronts. No shuffle; front size is bounded by
    the distinct-price count in practice."""
    def kernel(t: pa.Table) -> pa.Table:
        price = t["p_retailprice"].combine_chunks().to_numpy()
        size = t["p_size"].combine_chunks().to_numpy().astype(np.int64)
        pid = t["p_partkey"].combine_chunks().to_numpy()
        order = np.lexsort((pid, -size, price))
        p, s = price[order], size[order]
        # strictly-better-price running max: max size over all points
        # with price < p[i]
        grp = np.r_[True, p[1:] != p[:-1]]
        gidx = np.cumsum(grp) - 1                  # price-group index
        gmax = np.maximum.reduceat(s, np.flatnonzero(grp))
        run = np.maximum.accumulate(gmax)
        prev_max = np.where(gidx > 0, run[np.maximum(gidx - 1, 0)],
                            np.iinfo(np.int64).min)
        # dominated by a strictly cheaper part with size >= s, or by an
        # equal-price part with size > s (group max strictly greater)
        dom = (prev_max >= s) | (gmax[gidx] > s)
        keep = order[~dom]
        keep = keep[np.argsort(pid[keep], kind="stable")]
        return pa.table({
            "p_partkey": pa.array(pid[keep]),
            "p_retailprice": pa.array(price[keep]),
            "p_size": pa.array(size[keep]),
        })

    return single_merge(
        part.select_columns(["p_partkey", "p_retailprice", "p_size"])
        .map_batches(kernel, batch_format="pyarrow", batch_size=65536),
        kernel)


def events_trigrams(events: ray.data.Dataset,
                    num_parts: int = 16) -> ray.data.Dataset:
    """(t1, t2, t3, n): counts of every consecutive event-type TRIGRAM
    within each user's time-ordered stream — sequential pattern mining,
    the n=3 form of the funnel/transition analyses.

    Scale plan: ONE user-hash exchange co-locates each stream; the
    per-partition kernel sorts (user, ts, event_id) once and reads the
    three shifted views (no per-user loop); trigram keys live in the
    bounded types^3 space, so per-partition partials merge in one
    task."""
    def pre(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(uid, num_parts)))

    def kernel(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy().astype(np.int64)
        eid = t["event_id"].combine_chunks().to_numpy()
        et = t["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
        types, codes = np.unique(et, return_inverse=True)
        order = np.lexsort((eid, ts, uid))
        u, c = uid[order], codes[order]
        if len(u) < 3:
            return pa.schema([("t1", pa.string()), ("t2", pa.string()),
                              ("t3", pa.string()),
                              ("pn", pa.int64())]).empty_table()
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        k = len(types)
        key = (c[:-2] * k + c[1:-1]) * k + c[2:]
        key = key[same]
        kv, n = np.unique(key, return_counts=True)
        return pa.table({
            "t1": pa.array(types[kv // (k * k)].astype(str),
                           type=pa.string()),
            "t2": pa.array(types[(kv // k) % k].astype(str),
                           type=pa.string()),
            "t3": pa.array(types[kv % k].astype(str), type=pa.string()),
            "pn": pa.array(n.astype(np.int64)),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["t1", "t2", "t3"]).aggregate([("pn", "sum")])
        g = g.rename_columns(["t1", "t2", "t3", "n"])
        return g.sort_by([("t1", "ascending"), ("t2", "ascending"),
                          ("t3", "ascending")])

    return single_merge(
        events.select_columns(["user_id", "ts", "event_id", "event_type"])
        .map_batches(pre, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda t: kernel(t.drop_columns(["part"])),
                    batch_format="pyarrow"), merge)


def events_mau(events: ray.data.Dataset, window_days: int = 28,
               num_parts: int = 16) -> ray.data.Dataset:
    """(day, mau): EXACT rolling ``window_days``-day active users for
    every day that has events — the MAU/WAU dashboard metric, computed
    without any per-day distinct scan.

    Scale plan: blocks collapse to DISTINCT (user, day) pairs; ONE
    user-hash exchange co-locates each user's day set, where the
    per-partition kernel unions each user's coverage intervals
    [day, day + w - 1] (sorted days; gaps > w-1 split intervals — a
    user contributes +1/-1 difference marks per interval, NOT per day);
    the bounded (day, delta) difference partials merge in one task
    whose cumulative sum over the day span IS the rolling distinct
    count. Exchange volume is bounded by distinct pairs; the merge by
    the calendar span."""
    def pre(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        day = t["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[D]").astype(np.int64)
        order = np.lexsort((day, uid))
        u, d = uid[order], day[order]
        first = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
        return pa.table({"u": pa.array(u[first]), "d": pa.array(d[first]),
                         "part": pa.array(hash_part(u[first], num_parts))})

    w = window_days

    def kernel(t: pa.Table) -> pa.Table:
        uid = t["u"].combine_chunks().to_numpy()
        day = t["d"].combine_chunks().to_numpy()
        order = np.lexsort((day, uid))
        u, d = uid[order], day[order]
        first = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
        u, d = u[first], d[first]
        # interval starts: new user OR gap > w-1 since previous day
        new_iv = np.r_[True, (u[1:] != u[:-1]) | (d[1:] - d[:-1] > w - 1)]
        iv_start = d[new_iv]
        # interval end = last day of the run + w - 1
        iv_last = d[np.r_[new_iv[1:], True]]
        # difference marks + distinct active-day markers
        marks_day = np.concatenate([iv_start, iv_last + w])
        marks_delta = np.concatenate([np.ones(len(iv_start), np.int64),
                                      -np.ones(len(iv_last), np.int64)])
        g = pa.table({"d": pa.array(marks_day),
                      "delta": pa.array(marks_delta)}) \
            .group_by("d").aggregate([("delta", "sum")])
        active = np.unique(d)
        return pa.table({
            "d": pa.array(np.concatenate(
                [g["d"].combine_chunks().to_numpy(), active])),
            "delta": pa.array(np.concatenate(
                [g["delta_sum"].combine_chunks().to_numpy(),
                 np.zeros(len(active), np.int64)])),
            "act": pa.array(np.concatenate(
                [np.zeros(len(g), np.int64),
                 np.ones(len(active), np.int64)])),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("d").aggregate([("delta", "sum"), ("act", "sum")])
        d = g["d"].combine_chunks().to_numpy()
        delta = g["delta_sum"].combine_chunks().to_numpy()
        act = g["act_sum"].combine_chunks().to_numpy()
        order = np.argsort(d)
        d, delta, act = d[order], delta[order], act[order]
        mau = np.cumsum(delta)
        keep = act > 0
        # window is TRAILING: a user's interval [a, a+w-1] covers day x
        # iff some active day a is in [x-w+1, x], so the running sum at
        # an active day is exactly the w-day rolling distinct count
        return pa.table({
            "day": pa.array(d[keep].astype("datetime64[D]")
                            .astype("datetime64[us]")),
            "mau": pa.array(mau[keep]),
        })

    return single_merge(
        events.select_columns(["user_id", "ts"])
        .map_batches(pre, batch_format="pyarrow", batch_size=65536)
        .groupby("part")
        .map_groups(lambda t: kernel(t.drop_columns(["part"])),
                    batch_format="pyarrow"), merge)


def exact_quantiles(ds: ray.data.Dataset, col: str = "l_extendedprice",
                    ps: tuple = (0.5, 0.9, 0.99),
                    n_buckets: int = 65536) -> ray.data.Dataset:
    """(p, value): EXACT global quantiles (discrete, the ceil(n*p)-1
    order statistic — DuckDB quantile_disc semantics) of a numeric
    column WITHOUT a global sort: the classic two-phase distributed
    selection.

    Scale plan: pass 0 merges (min, max, n) partials; pass 1 builds a
    bounded ``n_buckets`` histogram (per-block bincount partials, one
    merge) that locates each quantile's bucket and its within-bucket
    rank; pass 2 collects ONLY the target buckets' values (expected
    n/n_buckets rows each) and picks the order statistics in one tiny
    task. Three streaming passes, every exchange bounded; a degenerate
    bucket (massive duplicate skew) would recurse the same histogram
    inside the bucket — not needed at any tested scale, documented."""
    from ..relational import single_merge

    sub = ds.select_columns([col])

    def mm_partial(t: pa.Table) -> pa.Table:
        x = t[col].combine_chunks().to_numpy()
        if not len(x):
            return pa.table({"mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"mn": pa.array([float(x.min())]),
                         "mx": pa.array([float(x.max())]),
                         "n": pa.array([len(x)], pa.int64())})

    def mm_merge(t: pa.Table) -> pa.Table:
        return pa.table({
            "mn": pa.array([float(pc.min(t["mn"]).as_py())]),
            "mx": pa.array([float(pc.max(t["mx"]).as_py())]),
            "n": pa.array([int(pc.sum(t["n"]).as_py())], pa.int64()),
        })

    row = single_merge(sub.map_batches(mm_partial, batch_format="pyarrow"),
                       mm_merge).take_all()[0]
    mn, mx, n = row["mn"], row["mx"], row["n"]
    span = (mx - mn) or 1.0

    def bucket_of(x: np.ndarray) -> np.ndarray:
        return np.clip(((x - mn) / span * n_buckets).astype(np.int64),
                       0, n_buckets - 1)

    def hist_partial(t: pa.Table) -> pa.Table:
        b = bucket_of(t[col].combine_chunks().to_numpy())
        u, c = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(u),
                         "c": pa.array(c.astype(np.int64))})

    def hist_merge(t: pa.Table) -> pa.Table:
        g = t.group_by("b").aggregate([("c", "sum")])
        return g.rename_columns(["b", "c"])

    hist = single_merge(sub.map_batches(hist_partial,
                                        batch_format="pyarrow"),
                        hist_merge).take_all()
    hb = np.array([r["b"] for r in hist], np.int64)
    hc = np.array([r["c"] for r in hist], np.int64)
    order = np.argsort(hb)
    hb, hc = hb[order], hc[order]
    cum = np.cumsum(hc)
    targets = []  # (p, bucket, within-bucket rank)
    for p in ps:
        k = int(np.ceil(n * p)) - 1
        i = int(np.searchsorted(cum, k + 1))
        before = int(cum[i - 1]) if i > 0 else 0
        targets.append((p, int(hb[i]), k - before))
    tgt_buckets = np.array(sorted({b for _, b, _ in targets}), np.int64)

    def collect(t: pa.Table) -> pa.Table:
        x = t[col].combine_chunks().to_numpy()
        b = bucket_of(x)
        keep = np.isin(b, tgt_buckets)
        return pa.table({"b": pa.array(b[keep]),
                         "x": pa.array(x[keep])})

    def pick(t: pa.Table) -> pa.Table:
        b = t["b"].combine_chunks().to_numpy()
        x = t["x"].combine_chunks().to_numpy()
        out_p, out_v = [], []
        for p, tb, r in targets:
            vals = np.sort(x[b == tb])
            out_p.append(p)
            out_v.append(float(vals[r]))
        return pa.table({"p": pa.array(out_p, pa.float64()),
                         "value": pa.array(out_v, pa.float64())})

    return single_merge(sub.map_batches(collect, batch_format="pyarrow"),
                        pick)


def events_gaps(events: ray.data.Dataset,
                num_parts: int = 16) -> ray.data.Dataset:
    """(bucket, n): log2-bucketed histogram of the seconds between a
    user's consecutive events (bucket = floor(log2(gap_s + 1)), exact
    integer math on both sides) — the inter-arrival distribution that
    calibrates session timeouts and window sizes.

    Scale plan: ONE user-hash exchange; per-partition sorted diff over
    (user, ts, event_id); the bounded (<=64-bucket) histogram partials
    merge in one task."""
    def pre(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(uid, num_parts)))

    pow2 = 2 ** np.arange(63, dtype=np.int64)

    def kernel(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy().astype(np.int64)
        eid = t["event_id"].combine_chunks().to_numpy()
        order = np.lexsort((eid, ts, uid))
        u, s = uid[order], ts[order]
        same = u[:-1] == u[1:] if len(u) > 1 else np.empty(0, bool)
        gap_s = (s[1:] - s[:-1])[same] // 1_000_000  # us -> whole seconds
        # exact integer log2 via a powers-of-two table (no float log)
        b = np.searchsorted(pow2, gap_s + 1, side="right") - 1
        u_b, n = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(u_b.astype(np.int64)),
                         "pn": pa.array(n.astype(np.int64))})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("bucket").aggregate([("pn", "sum")])
        g = g.rename_columns(["bucket", "n"])
        return g.sort_by([("bucket", "ascending")])

    return single_merge(
        events.select_columns(["user_id", "ts", "event_id"])
        .map_batches(pre, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda t: kernel(t.drop_columns(["part"])),
                    batch_format="pyarrow"), merge)


def priority_quantiles(orders: ray.data.Dataset,
                       ps: tuple = (0.5, 0.9),
                       n_buckets: int = 65536) -> ray.data.Dataset:
    """(o_orderpriority, p, value): EXACT per-priority order-value
    quantiles — ``exact_quantiles`` generalized to a bounded group
    space (priorities), the per-SLA latency/value report shape.

    Scale plan: identical three-pass histogram selection, with every
    partial keyed by (group, bucket) — groups are bounded (5), so all
    merges stay one task and pass 2 still collects only target-bucket
    rows."""
    from ..relational import single_merge

    sub = orders.select_columns(["o_orderpriority", "o_totalprice"])

    def mm_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderpriority").aggregate(
            [("o_totalprice", "min"), ("o_totalprice", "max"),
             ("o_totalprice", "count")])
        return g.rename_columns(["grp", "mn", "mx", "n"])

    def mm_merge(t: pa.Table) -> pa.Table:
        g = t.group_by("grp").aggregate(
            [("mn", "min"), ("mx", "max"), ("n", "sum")])
        return g.rename_columns(["grp", "mn", "mx", "n"])

    rows = single_merge(sub.map_batches(mm_partial, batch_format="pyarrow"),
                        mm_merge).take_all()
    meta = {r["grp"]: (r["mn"], r["mx"] - r["mn"] or 1.0, r["n"])
            for r in rows}
    groups = sorted(meta)

    def bucket_of(grp_codes: np.ndarray, x: np.ndarray,
                  mns: np.ndarray, spans: np.ndarray) -> np.ndarray:
        return np.clip(((x - mns[grp_codes]) / spans[grp_codes]
                        * n_buckets).astype(np.int64), 0, n_buckets - 1)

    mns = np.array([meta[g][0] for g in groups])
    spans = np.array([meta[g][1] for g in groups])
    garr = np.array(groups, dtype=object)

    def codes_of(col: pa.ChunkedArray) -> np.ndarray:
        v = col.to_numpy(zero_copy_only=False)
        return np.searchsorted(garr.astype(str), v.astype(str))

    def hist_partial(t: pa.Table) -> pa.Table:
        c = codes_of(t["o_orderpriority"].combine_chunks())
        b = bucket_of(c, t["o_totalprice"].combine_chunks().to_numpy(),
                      mns, spans)
        key = c * n_buckets + b
        u, n = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(u),
                         "c": pa.array(n.astype(np.int64))})

    def hist_merge(t: pa.Table) -> pa.Table:
        g = t.group_by("k").aggregate([("c", "sum")])
        return g.rename_columns(["k", "c"])

    hist = single_merge(sub.map_batches(hist_partial,
                                        batch_format="pyarrow"),
                        hist_merge).take_all()
    hk = np.array([r["k"] for r in hist], np.int64)
    hc = np.array([r["c"] for r in hist], np.int64)
    order = np.argsort(hk)
    hk, hc = hk[order], hc[order]
    targets = []   # (grp_code, p, bucket, within-rank)
    for gi, g in enumerate(groups):
        m = (hk // n_buckets) == gi
        kb, kc = hk[m] % n_buckets, hc[m]
        cum = np.cumsum(kc)
        n = meta[g][2]
        for p in ps:
            k = int(np.ceil(n * p)) - 1
            i = int(np.searchsorted(cum, k + 1))
            before = int(cum[i - 1]) if i > 0 else 0
            targets.append((gi, p, int(kb[i]), k - before))
    tgt_keys = np.array(sorted({gi * n_buckets + b
                                for gi, _, b, _ in targets}), np.int64)

    def collect(t: pa.Table) -> pa.Table:
        c = codes_of(t["o_orderpriority"].combine_chunks())
        x = t["o_totalprice"].combine_chunks().to_numpy()
        key = c * n_buckets + bucket_of(c, x, mns, spans)
        keep = np.isin(key, tgt_keys)
        return pa.table({"k": pa.array(key[keep]),
                         "x": pa.array(x[keep])})

    def pick(t: pa.Table) -> pa.Table:
        k = t["k"].combine_chunks().to_numpy()
        x = t["x"].combine_chunks().to_numpy()
        og, op, ov = [], [], []
        for gi, p, b, r in targets:
            vals = np.sort(x[k == gi * n_buckets + b])
            og.append(groups[gi])
            op.append(p)
            ov.append(float(vals[r]))
        return pa.table({"o_orderpriority": pa.array(og, pa.string()),
                         "p": pa.array(op, pa.float64()),
                         "value": pa.array(ov, pa.float64())})

    return single_merge(sub.map_batches(collect, batch_format="pyarrow"),
                        pick)


def events_heatmap(events: ray.data.Dataset) -> ray.data.Dataset:
    """(dow, hour, n): day-of-week x hour event heatmap (ISO dow,
    1=Monday) — the seasonality profile behind load shaping. Bounded
    168-key combiner, one merge."""
    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks().to_numpy().astype("datetime64[us]")
        days = ts.astype("datetime64[D]").astype(np.int64)
        # 1970-01-01 is a Thursday: ISO dow = ((days + 3) % 7) + 1
        dow = ((days + 3) % 7) + 1
        hour = (ts.astype(np.int64) // 3_600_000_000) % 24
        key = dow * 24 + hour
        u, n = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(u),
                         "pn": pa.array(n.astype(np.int64))})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("key").aggregate([("pn", "sum")])
        k = g["key"].combine_chunks().to_numpy()
        n = g["pn_sum"].combine_chunks().to_numpy()
        order = np.argsort(k)
        k, n = k[order], n[order]
        return pa.table({"dow": pa.array(k // 24),
                         "hour": pa.array(k % 24),
                         "n": pa.array(n.astype(np.int64))})

    return single_merge(events.select_columns(["ts"])
                        .map_batches(partial, batch_format="pyarrow",
                                     batch_size=65536), merge)


def q7_trade_volume(lineitem: ray.data.Dataset, orders: ray.data.Dataset,
                    customer: ray.data.Dataset, supplier: ray.data.Dataset,
                    nation: ray.data.Dataset,
                    year_lo: int = 1995, year_hi: int = 1996,
                    num_partitions: int = 8) -> ray.data.Dataset:
    """(supp_nation, cust_nation, l_year, revenue_cents): TPC-H Q7
    shape — shipping volume between every ORDERED pair of distinct
    nations by ship year (the reference query fixes two nations; the
    generalized pair grid is the harder shuffle).

    Scale plan: the q5 snowflake plan with the equality filter swapped
    for inequality — lineitem collapses per (orderkey, suppkey, year)
    in a block combiner, two hash joins attach customer/supplier
    nations, and the (25 x 25 x years)-bounded final combine merges in
    one task. Integer-cents revenue on both sides."""
    from ..relational import broadcast_table

    nat_ref = broadcast_table(nation, ["n_nationkey", "n_name"])
    lo = np.datetime64(f"{year_lo}-01-01", "us").astype(np.int64)
    hi = np.datetime64(f"{year_hi + 1}-01-01", "us").astype(np.int64)

    def li_partial(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].combine_chunks().to_numpy().astype(np.int64)
        keep = (sd >= lo) & (sd < hi)
        t = t.filter(pa.array(keep))
        year = t["l_shipdate"].combine_chunks().to_numpy() \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        rc = round_half_away(
            t["l_extendedprice"].combine_chunks().to_numpy()
            * (1.0 - t["l_discount"].combine_chunks().to_numpy()) * 100.0,
            0).astype(np.int64)
        g = pa.table({"l_orderkey": t["l_orderkey"],
                      "l_suppkey": t["l_suppkey"],
                      "l_year": pa.array(year), "rc": pa.array(rc)}) \
            .group_by(["l_orderkey", "l_suppkey", "l_year"]) \
            .aggregate([("rc", "sum")])
        return g.rename_columns(["l_orderkey", "l_suppkey", "l_year", "rc"])

    li = lineitem.select_columns(
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
         "l_shipdate"]) \
        .map_batches(li_partial, batch_format="pyarrow", batch_size=65536)

    ords = orders.select_columns(["o_orderkey", "o_custkey"]) \
        .join(customer.select_columns(["c_custkey", "c_nationkey"]),
              join_type="inner", num_partitions=num_partitions,
              on=("o_custkey",), right_on=("c_custkey",))

    j1 = li.join(ords, join_type="inner", num_partitions=num_partitions,
                 on=("l_orderkey",), right_on=("o_orderkey",))
    j2 = j1.join(supplier.select_columns(["s_suppkey", "s_nationkey"]),
                 join_type="inner", num_partitions=num_partitions,
                 on=("l_suppkey",), right_on=("s_suppkey",))

    def pair_partial(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(t["c_nationkey"], t["s_nationkey"]))
        t = t.filter(keep)
        g = pa.table({"sn": t["s_nationkey"], "cn": t["c_nationkey"],
                      "l_year": t["l_year"], "rc": t["rc"]}) \
            .group_by(["sn", "cn", "l_year"]).aggregate([("rc", "sum")])
        return g.rename_columns(["sn", "cn", "l_year", "rc"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["sn", "cn", "l_year"]).aggregate([("rc", "sum")])
        nt = ray.get(nat_ref)
        keys = nt["n_nationkey"].to_numpy()
        order = np.argsort(keys)

        def name_of(col):
            idx = np.searchsorted(keys[order],
                                  g[col].combine_chunks().to_numpy())
            return nt["n_name"].take(pa.array(order[idx]))

        out = pa.table({
            "supp_nation": name_of("sn"),
            "cust_nation": name_of("cn"),
            "l_year": pc.cast(g["l_year"], pa.int64()),
            "revenue_cents": pc.cast(g["rc_sum"], pa.int64()),
        })
        return out.sort_by([("supp_nation", "ascending"),
                            ("cust_nation", "ascending"),
                            ("l_year", "ascending")])

    return single_merge(j2.map_batches(pair_partial,
                                       batch_format="pyarrow"), merge)


def q4_late_orders(lineitem: ray.data.Dataset, orders: ray.data.Dataset,
                   date_lo: str = "1996-01-01", date_hi: str = "1997-01-01",
                   late_days: int = 90,
                   num_partitions: int = 8) -> ray.data.Dataset:
    """(o_orderpriority, n_orders): TPC-H Q4 shape — orders in a date
    window with at least one LATE lineitem, counted by priority.  The
    testdata carries no commit/receipt dates, so "late" is the
    cross-table predicate l_shipdate > o_orderdate + ``late_days``
    (EXISTS(shipdate > cutoff) == max(shipdate) > cutoff).

    Scale plan: lineitem collapses to ONE (orderkey, max shipdate) row
    per key (block combiner + bounded hash exchange) BEFORE the join,
    so the EXISTS semi-join ships one row per order, not one per
    lineitem; orders filters its window at the scan; the post-join
    priority count is a 5-row bounded combine."""
    from ..relational import partial_groupby_agg
    lo = np.datetime64(date_lo, "us").astype(np.int64)
    hi = np.datetime64(date_hi, "us").astype(np.int64)
    late_us = np.int64(late_days) * 86_400_000_000

    def li_sd(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "sd": pa.array(t["l_shipdate"].combine_chunks().to_numpy()
                           .astype(np.int64))})

    li = partial_groupby_agg(
        lineitem.select_columns(["l_orderkey", "l_shipdate"])
        .map_batches(li_sd, batch_format="pyarrow", batch_size=65536),
        ["l_orderkey"], [("sd", "max")])

    def ord_win(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].combine_chunks().to_numpy().astype(np.int64)
        t = t.append_column("od", pa.array(od))
        return t.filter(pa.array((od >= lo) & (od < hi))) \
            .select(["o_orderkey", "od", "o_orderpriority"])

    ords = orders.select_columns(
        ["o_orderkey", "o_orderdate", "o_orderpriority"]) \
        .map_batches(ord_win, batch_format="pyarrow")

    j = ords.join(li, join_type="inner", num_partitions=num_partitions,
                  on=("o_orderkey",), right_on=("l_orderkey",))

    def prio_partial(t: pa.Table) -> pa.Table:
        late = t["sd_max"].combine_chunks().to_numpy() \
            > t["od"].combine_chunks().to_numpy() + late_us
        g = t.filter(pa.array(late)).group_by("o_orderpriority") \
            .aggregate([("o_orderkey", "count")])
        return g.rename_columns(["o_orderpriority", "n"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderpriority").aggregate([("n", "sum")])
        return pa.table({
            "o_orderpriority": g["o_orderpriority"],
            "n_orders": pc.cast(g["n_sum"], pa.int64()),
        }).sort_by("o_orderpriority")

    return single_merge(j.map_batches(prio_partial, batch_format="pyarrow"),
                        merge)


def q6_revenue_delta(lineitem: ray.data.Dataset,
                     date_lo: str = "1996-01-01",
                     date_hi: str = "1997-01-01",
                     disc_lo: float = 0.05, disc_hi: float = 0.07,
                     qty_lt: float = 24.0) -> ray.data.Dataset:
    """(revenue_cents, n): TPC-H Q6 shape — the would-be revenue delta
    of dropping small discounts: SUM(extendedprice * discount) over a
    ship-year x discount-band x quantity filter.  One streaming pass,
    per-block scalar partials, one-row merge; per-row integer-cents
    rounding keeps the sum order-free."""
    lo = np.datetime64(date_lo, "us").astype(np.int64)
    hi = np.datetime64(date_hi, "us").astype(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].combine_chunks().to_numpy().astype(np.int64)
        disc = t["l_discount"].combine_chunks().to_numpy()
        qty = t["l_quantity"].combine_chunks().to_numpy()
        keep = ((sd >= lo) & (sd < hi) & (disc >= disc_lo)
                & (disc <= disc_hi) & (qty < qty_lt))
        ep = t["l_extendedprice"].combine_chunks().to_numpy()[keep]
        rc = round_half_away(ep * disc[keep] * 100.0, 0).astype(np.int64)
        return pa.table({"rc": pa.array([int(rc.sum())], pa.int64()),
                         "n": pa.array([int(keep.sum())], pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        return pa.table({
            "revenue_cents": pa.array(
                [int(pc.sum(t["rc"]).as_py() or 0)], pa.int64()),
            "n": pa.array([int(pc.sum(t["n"]).as_py() or 0)], pa.int64())})

    return single_merge(
        lineitem.select_columns(["l_shipdate", "l_discount", "l_quantity",
                                 "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        merge)


def q10_returned_revenue(lineitem: ray.data.Dataset,
                         orders: ray.data.Dataset,
                         customer: ray.data.Dataset,
                         nation: ray.data.Dataset,
                         date_lo: str = "1995-07-01",
                         date_hi: str = "1995-10-01",
                         k: int = 20,
                         num_partitions: int = 8) -> ray.data.Dataset:
    """(c_custkey, c_name, n_name, revenue_cents): TPC-H Q10 shape —
    top-k customers by revenue of RETURNED items for one order quarter.

    Scale plan: lineitem filters returnflag at the scan and collapses
    per orderkey (combiner) before the hash join with the date-filtered
    orders; per-customer revenue is a bounded hash-partition combine;
    top-k is per-block partial + one bounded merge.  Customer/nation
    names attach AFTER the rank: only the k winning custkeys are
    broadcast into a customer scan filter, so the big dim table is
    never shuffled (a semi-broadcast lookup, not a join)."""
    from ..relational import partial_groupby_agg

    lo = np.datetime64(date_lo, "us").astype(np.int64)
    hi = np.datetime64(date_hi, "us").astype(np.int64)

    def li_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        rc = round_half_away(
            t["l_extendedprice"].combine_chunks().to_numpy()
            * (1.0 - t["l_discount"].combine_chunks().to_numpy()) * 100.0,
            0).astype(np.int64)
        g = pa.table({"l_orderkey": t["l_orderkey"], "rc": pa.array(rc)}) \
            .group_by("l_orderkey").aggregate([("rc", "sum")])
        return g.rename_columns(["l_orderkey", "rc"])

    li = lineitem.select_columns(
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]) \
        .map_batches(li_partial, batch_format="pyarrow", batch_size=65536)

    def ord_win(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].combine_chunks().to_numpy().astype(np.int64)
        return t.filter(pa.array((od >= lo) & (od < hi))) \
            .select(["o_orderkey", "o_custkey"])

    ords = orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(ord_win, batch_format="pyarrow")

    j = li.join(ords, join_type="inner", num_partitions=num_partitions,
                on=("l_orderkey",), right_on=("o_orderkey",))

    percust = partial_groupby_agg(
        j.select_columns(["o_custkey", "rc"]), ["o_custkey"],
        [("rc", "sum")])

    def topk_partial(t: pa.Table) -> pa.Table:
        rc = t["rc_sum"].combine_chunks().to_numpy()
        ck = t["o_custkey"].combine_chunks().to_numpy()
        order = np.lexsort((ck, -rc))[:k]
        return pa.table({"c_custkey": pa.array(ck[order]),
                         "revenue_cents": pa.array(rc[order])})

    def topk_merge(t: pa.Table) -> pa.Table:
        rc = t["revenue_cents"].combine_chunks().to_numpy()
        ck = t["c_custkey"].combine_chunks().to_numpy()
        order = np.lexsort((ck, -rc))[:k]
        return t.take(pa.array(order))

    top = single_merge(percust.map_batches(topk_partial,
                                           batch_format="pyarrow"),
                       topk_merge).take_all()          # bounded: k rows
    win_keys = np.array(sorted(r["c_custkey"] for r in top), np.int64)
    rev_of = {r["c_custkey"]: r["revenue_cents"] for r in top}
    nat_ref = broadcast_table(nation, ["n_nationkey", "n_name"])

    def cust_pick(t: pa.Table) -> pa.Table:
        ck = t["c_custkey"].combine_chunks().to_numpy()
        keep = np.isin(ck, win_keys)
        return t.filter(pa.array(keep))

    def finish(t: pa.Table) -> pa.Table:
        nt = ray.get(nat_ref)
        nk = nt["n_nationkey"].to_numpy()
        order = np.argsort(nk)
        idx = order[np.searchsorted(
            nk[order], t["c_nationkey"].combine_chunks().to_numpy())]
        ck = t["c_custkey"].combine_chunks().to_numpy()
        rc = np.array([rev_of[int(c)] for c in ck], np.int64)
        out = pa.table({
            "c_custkey": pa.array(ck),
            "c_name": t["c_name"],
            "n_name": nt["n_name"].take(pa.array(idx)),
            "revenue_cents": pa.array(rc)})
        rank = np.lexsort((ck, -rc))
        return out.take(pa.array(rank))

    return single_merge(
        customer.select_columns(["c_custkey", "c_name", "c_nationkey"])
        .map_batches(cust_pick, batch_format="pyarrow"),
        finish)


def q13_order_distribution(orders: ray.data.Dataset,
                           customer: ray.data.Dataset) -> ray.data.Dataset:
    """(c_count, custdist): TPC-H Q13 shape — the distribution of
    customers by how many orders they placed, INCLUDING the zero-order
    bucket (the classic left-outer-join count).

    Scale plan: no join at all — per-custkey counts (block combiner +
    bounded hash exchange), then a count-of-counts combine; the zero
    bucket is total customers (parquet metadata count, no scan) minus
    the distinct custkeys seen in orders."""
    from ..relational import partial_groupby_agg
    n_cust = customer.count()   # metadata-only row count

    percust = partial_groupby_agg(
        orders.select_columns(["o_custkey", "o_orderkey"]),
        ["o_custkey"], [("o_orderkey", "count")])

    def coc_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderkey_count").aggregate([("o_custkey", "count")])
        return g.rename_columns(["c_count", "custdist"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("c_count").aggregate([("custdist", "sum")])
        cc = g["c_count"].combine_chunks().to_numpy().astype(np.int64)
        cd = g["custdist_sum"].combine_chunks().to_numpy().astype(np.int64)
        zero = n_cust - int(cd.sum())
        if zero > 0:
            cc = np.append(cc, 0)
            cd = np.append(cd, zero)
        order = np.lexsort((-cc, -cd))
        return pa.table({"c_count": pa.array(cc[order]),
                         "custdist": pa.array(cd[order])})

    return single_merge(percust.map_batches(coc_partial,
                                            batch_format="pyarrow"),
                        merge)


def q18_big_baskets(lineitem: ray.data.Dataset, orders: ray.data.Dataset,
                    customer: ray.data.Dataset,
                    qty_threshold: float = 250.0, k: int = 100,
                    num_partitions: int = 8) -> ray.data.Dataset:
    """(c_custkey, c_name, o_orderkey, o_orderdate, total_cents,
    sum_qty): TPC-H Q18 shape — large-volume orders (basket quantity
    above ``qty_threshold``), top-k by order value.

    Scale plan: lineitem collapses per orderkey (combiner + bounded
    exchange), the HAVING filter drops ~99 % of orders BEFORE any
    join, then two hash joins attach orders and customer; the final
    rank is per-block top-k partials + one bounded merge."""
    from ..relational import partial_groupby_agg

    qty = partial_groupby_agg(
        lineitem.select_columns(["l_orderkey", "l_quantity"]),
        ["l_orderkey"], [("l_quantity", "sum")])

    def keep_big(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["l_quantity_sum"], qty_threshold))

    big = qty.map_batches(keep_big, batch_format="pyarrow")

    j = big.join(orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]),
        join_type="inner", num_partitions=num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",))
    j = j.join(customer.select_columns(["c_custkey", "c_name"]),
               join_type="inner", num_partitions=num_partitions,
               on=("o_custkey",), right_on=("c_custkey",))

    def shape(t: pa.Table) -> pa.Table:
        tc = round_half_away(
            t["o_totalprice"].combine_chunks().to_numpy() * 100.0,
            0).astype(np.int64)
        ok = t["l_orderkey"].combine_chunks().to_numpy()
        order = np.lexsort((ok, -tc))[:k]
        return pa.table({
            "c_custkey": t["o_custkey"].take(pa.array(order)),
            "c_name": t["c_name"].take(pa.array(order)),
            "o_orderkey": pa.array(ok[order]),
            "o_orderdate": t["o_orderdate"].take(pa.array(order)),
            "total_cents": pa.array(tc[order]),
            "sum_qty": t["l_quantity_sum"].take(pa.array(order))})

    def merge(t: pa.Table) -> pa.Table:
        tc = t["total_cents"].combine_chunks().to_numpy()
        ok = t["o_orderkey"].combine_chunks().to_numpy()
        order = np.lexsort((ok, -tc))[:k]
        return t.take(pa.array(order))

    return single_merge(j.map_batches(shape, batch_format="pyarrow"),
                        merge)


def cohort_retention(events: ray.data.Dataset,
                     num_parts: int = 16) -> ray.data.Dataset:
    """(cohort_week, week_offset, n_users): weekly cohort retention
    matrix — users grouped by their first-activity week, counted in
    each later week they return (the training-corpus freshness /
    engagement-decay audit).

    Scale plan: blocks collapse to DISTINCT (user, week) pairs first
    (bounded by users x weeks, not events), ONE user-hash exchange
    co-locates each user's weeks, and the per-partition kernel derives
    (cohort, offset) pairs with a sort + reduceat — the final count is
    a (weeks x weeks)/2-bounded combine."""
    US_WEEK = np.int64(7 * 86_400_000_000)

    def uw_partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks().to_numpy().astype(np.int64)
        w = ts // np.int64(86_400_000_000) // np.int64(7)
        g = pa.table({"user_id": t["user_id"], "w": pa.array(w)}) \
            .group_by(["user_id", "w"]).aggregate([])
        u = g["user_id"].combine_chunks().to_numpy()
        return g.append_column("part",
                               pa.array(hash_part(u, num_parts)))

    def per_user(t: pa.Table) -> pa.Table:
        u = t["user_id"].combine_chunks().to_numpy()
        w = t["w"].combine_chunks().to_numpy()
        # global dedup within the partition (a user's pairs may repeat
        # across source blocks), then per-user first week
        uw = np.unique(np.stack([u, w], axis=1), axis=0)
        u, w = uw[:, 0], uw[:, 1]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        counts = np.diff(np.r_[starts, len(u)])
        cohort = np.repeat(w[starts], counts)
        g = pa.table({"cohort_week": pa.array(cohort),
                      "week_offset": pa.array(w - cohort)}) \
            .group_by(["cohort_week", "week_offset"]) \
            .aggregate([("cohort_week", "count")])
        return g.rename_columns(["cohort_week", "week_offset", "n"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["cohort_week", "week_offset"]) \
            .aggregate([("n", "sum")])
        return pa.table({
            "cohort_week": pc.cast(g["cohort_week"], pa.int64()),
            "week_offset": pc.cast(g["week_offset"], pa.int64()),
            "n_users": pc.cast(g["n_sum"], pa.int64()),
        }).sort_by([("cohort_week", "ascending"),
                    ("week_offset", "ascending")])

    pairs = events.select_columns(["user_id", "ts"]) \
        .map_batches(uw_partial, batch_format="pyarrow", batch_size=65536)
    percohort = pairs.groupby("part").map_groups(per_user,
                                                 batch_format="pyarrow")
    return single_merge(percohort, merge)


def customer_value_deciles(orders: ray.data.Dataset) -> ray.data.Dataset:
    """(decile, n_customers, sum_value_cents): customers bucketed by
    EXACT deciles of their lifetime order value — the two-phase
    "compute global thresholds, broadcast, assign" pattern (corpus
    value segmentation; same shape as loss-quantile data pruning).

    Scale plan: per-customer sums (combiner + bounded hash exchange,
    integer cents so float order can't drift) are MATERIALIZED once —
    the bounded per-customer table feeds both the exact-quantile
    selection (three streaming passes, no global sort) and the
    assignment pass; thresholds broadcast as 9 floats; decile = count
    of thresholds strictly below the value (DuckDB quantile_disc
    semantics on both sides)."""
    from ..relational import partial_groupby_agg

    def to_cents(t: pa.Table) -> pa.Table:
        rc = round_half_away(
            t["o_totalprice"].combine_chunks().to_numpy() * 100.0,
            0).astype(np.int64)
        return pa.table({"o_custkey": t["o_custkey"], "rc": pa.array(rc)})

    percust = partial_groupby_agg(
        orders.select_columns(["o_custkey", "o_totalprice"])
        .map_batches(to_cents, batch_format="pyarrow", batch_size=65536),
        ["o_custkey"], [("rc", "sum")]).materialize()

    def as_float(t: pa.Table) -> pa.Table:
        return pa.table({"v": pc.cast(t["rc_sum"], pa.float64())})

    vals = percust.map_batches(as_float, batch_format="pyarrow")
    ps = tuple(i / 10.0 for i in range(1, 10))
    th = sorted(r["value"] for r in
                exact_quantiles(vals, col="v", ps=ps).take_all())
    th_arr = np.array(th, np.float64)

    def assign(t: pa.Table) -> pa.Table:
        v = t["rc_sum"].combine_chunks().to_numpy().astype(np.float64)
        d = np.searchsorted(th_arr, v, side="left")   # #thresholds < v
        g = pa.table({"decile": pa.array(d.astype(np.int64)),
                      "v": pc.cast(t["rc_sum"], pa.int64())}) \
            .group_by("decile").aggregate([("v", "sum"), ("v", "count")])
        return g.rename_columns(["decile", "v_sum", "n"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("decile").aggregate([("v_sum", "sum"),
                                            ("n", "sum")])
        return pa.table({
            "decile": pc.cast(g["decile"], pa.int64()),
            "n_customers": pc.cast(g["n_sum"], pa.int64()),
            "sum_value_cents": pc.cast(g["v_sum_sum"], pa.int64()),
        }).sort_by("decile")

    return single_merge(percust.map_batches(assign, batch_format="pyarrow"),
                        merge)


def q14_promo_revenue(lineitem: ray.data.Dataset, part: ray.data.Dataset,
                      date_lo: str = "1996-03-01",
                      date_hi: str = "1996-06-01",
                      num_partitions: int = 8) -> ray.data.Dataset:
    """(promo_rev_cents, total_rev_cents, promo_share6): TPC-H Q14
    shape — the promo-type revenue share for one ship quarter.

    Scale plan: lineitem filters the window at the scan and collapses
    to per-partkey cent partials (combiner, output bounded by |part|)
    BEFORE the single-use hash join with part's (p_partkey, p_type)
    projection; the share is a one-row merge.  Per-row integer-cents
    rounding keeps both sums order-free."""
    from ..relational import partial_groupby_agg

    lo = np.datetime64(date_lo, "us").astype(np.int64)
    hi = np.datetime64(date_hi, "us").astype(np.int64)

    def li_partial(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].combine_chunks().to_numpy().astype(np.int64)
        t = t.filter(pa.array((sd >= lo) & (sd < hi)))
        rc = round_half_away(
            t["l_extendedprice"].combine_chunks().to_numpy()
            * (1.0 - t["l_discount"].combine_chunks().to_numpy()) * 100.0,
            0).astype(np.int64)
        return pa.table({"l_partkey": t["l_partkey"], "rc": pa.array(rc)})

    per_part = partial_groupby_agg(
        lineitem.select_columns(["l_partkey", "l_shipdate",
                                 "l_extendedprice", "l_discount"])
        .map_batches(li_partial, batch_format="pyarrow",
                     batch_size=65536),
        ["l_partkey"], [("rc", "sum")])

    j = per_part.join(part.select_columns(["p_partkey", "p_type"]),
                      join_type="inner", num_partitions=num_partitions,
                      on=("l_partkey",), right_on=("p_partkey",))

    def partial(t: pa.Table) -> pa.Table:
        rc = t["rc_sum"].combine_chunks().to_numpy()
        promo = pc.equal(t["p_type"], "PROMO").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "p": pa.array([int(rc[promo].sum())], pa.int64()),
            "tt": pa.array([int(rc.sum())], pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        p = int(pc.sum(t["p"]).as_py() or 0)
        tt = int(pc.sum(t["tt"]).as_py() or 0)
        share = 100.0 * p / tt if tt else 0.0
        return pa.table({
            "promo_rev_cents": pa.array([p], pa.int64()),
            "total_rev_cents": pa.array([tt], pa.int64()),
            "promo_share6": pa.array(round_half_away(
                np.array([share]), 6))})

    return single_merge(j.map_batches(partial, batch_format="pyarrow"),
                        merge)


def q15_top_supplier(lineitem: ray.data.Dataset,
                     supplier: ray.data.Dataset,
                     date_lo: str = "1996-01-01",
                     date_hi: str = "1996-04-01") -> ray.data.Dataset:
    """(s_suppkey, s_name, total_revenue_cents): TPC-H Q15 shape — the
    supplier(s) with the maximum revenue for one ship quarter (ties all
    kept, exact because revenue is integer cents).

    Scale plan: per-suppkey cent partials combine per block, one
    bounded hash exchange (output bounded by |supplier|), a one-task
    max+filter merge, then only the winning suppkeys gate a supplier
    scan (semi-broadcast lookup — the dim table is never shuffled)."""
    from ..relational import partial_groupby_agg

    lo = np.datetime64(date_lo, "us").astype(np.int64)
    hi = np.datetime64(date_hi, "us").astype(np.int64)

    def li_partial(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].combine_chunks().to_numpy().astype(np.int64)
        t = t.filter(pa.array((sd >= lo) & (sd < hi)))
        rc = round_half_away(
            t["l_extendedprice"].combine_chunks().to_numpy()
            * (1.0 - t["l_discount"].combine_chunks().to_numpy()) * 100.0,
            0).astype(np.int64)
        return pa.table({"l_suppkey": t["l_suppkey"], "rc": pa.array(rc)})

    per_supp = partial_groupby_agg(
        lineitem.select_columns(["l_suppkey", "l_shipdate",
                                 "l_extendedprice", "l_discount"])
        .map_batches(li_partial, batch_format="pyarrow",
                     batch_size=65536),
        ["l_suppkey"], [("rc", "sum")])

    def top_merge(t: pa.Table) -> pa.Table:
        rc = t["rc_sum"].combine_chunks().to_numpy()
        sk = t["l_suppkey"].combine_chunks().to_numpy()
        if not len(rc):
            return pa.table({"s_suppkey": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.int64())})
        m = rc == rc.max()
        return pa.table({"s_suppkey": pa.array(sk[m]),
                         "rev": pa.array(rc[m])})

    top = single_merge(per_supp, top_merge).take_all()  # bounded: ties
    win = np.array(sorted(r["s_suppkey"] for r in top), np.int64)
    rev_of = {r["s_suppkey"]: r["rev"] for r in top}

    def pick(t: pa.Table) -> pa.Table:
        sk = t["s_suppkey"].combine_chunks().to_numpy()
        t = t.filter(pa.array(np.isin(sk, win)))
        sk2 = t["s_suppkey"].combine_chunks().to_numpy()
        return pa.table({
            "s_suppkey": t["s_suppkey"], "s_name": t["s_name"],
            "total_revenue_cents": pa.array(
                np.array([rev_of[int(s)] for s in sk2], np.int64))})

    return supplier.select_columns(["s_suppkey", "s_name"]) \
        .map_batches(pick, batch_format="pyarrow")


def q16_part_suppliers(lineitem: ray.data.Dataset, part: ray.data.Dataset,
                       excl_brand: str = "Brand#4",
                       excl_type: str = "ECONOMY",
                       sizes: tuple = (1, 9, 14, 19, 23, 36, 45, 49),
                       num_partitions: int = 8) -> ray.data.Dataset:
    """(p_brand, p_type, p_size, supplier_cnt): TPC-H Q16 shape with
    lineitem as the part-supplier incidence (the testdata has no
    partsupp table): distinct suppliers that shipped each surviving
    (brand, type, size) bucket, one brand and one type excluded.

    Scale plan: per-block DISTINCT (partkey, suppkey) combiner first
    (pairs repeat per order), then ONE bounded hash exchange dedups
    globally (partial_groupby_agg keys), a single-use hash join with
    the filtered part projection, and a bounded (brand, type, size)
    count exchange — supplier ids are already distinct per part, so
    the count never needs a count-distinct shuffle."""
    from ..relational import partial_groupby_agg

    def pairs(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].combine_chunks().to_numpy()
        sk = t["l_suppkey"].combine_chunks().to_numpy()
        order = np.lexsort((sk, pk))
        pk, sk = pk[order], sk[order]
        if len(pk):
            keep = np.ones(len(pk), bool)
            keep[1:] = (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])
            pk, sk = pk[keep], sk[keep]
        return pa.table({"l_partkey": pa.array(pk),
                         "l_suppkey": pa.array(sk),
                         "one": pa.array(np.ones(len(pk), np.int64))})

    dpairs = partial_groupby_agg(
        lineitem.select_columns(["l_partkey", "l_suppkey"])
        .map_batches(pairs, batch_format="pyarrow", batch_size=65536),
        ["l_partkey", "l_suppkey"], [("one", "sum")])

    size_arr = np.array(sizes, np.int64)

    def part_filter(t: pa.Table) -> pa.Table:
        sz = t["p_size"].combine_chunks().to_numpy()
        keep = (np.isin(sz, size_arr)
                & pc.not_equal(t["p_brand"], excl_brand).combine_chunks()
                .to_numpy(zero_copy_only=False)
                & pc.not_equal(t["p_type"], excl_type).combine_chunks()
                .to_numpy(zero_copy_only=False))
        return t.filter(pa.array(keep)) \
            .select(["p_partkey", "p_brand", "p_type", "p_size"])

    pf = part.select_columns(["p_partkey", "p_brand", "p_type", "p_size"]) \
        .map_batches(part_filter, batch_format="pyarrow")

    j = dpairs.join(pf, join_type="inner", num_partitions=num_partitions,
                    on=("l_partkey",), right_on=("p_partkey",))

    def bucket_supp(t: pa.Table) -> pa.Table:
        return pa.table({
            "p_brand": t["p_brand"], "p_type": t["p_type"],
            "p_size": t["p_size"], "l_suppkey": t["l_suppkey"],
            "one": pa.array(np.ones(t.num_rows, np.int64))})

    # a supplier may ship SEVERAL parts of the same (brand, type, size)
    # bucket: dedup to (bucket, suppkey) before counting (Q16 counts
    # DISTINCT suppliers per bucket, not incidence pairs)
    bsupp = partial_groupby_agg(
        j.map_batches(bucket_supp, batch_format="pyarrow"),
        ["p_brand", "p_type", "p_size", "l_suppkey"], [("one", "sum")])

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({
            "p_brand": t["p_brand"], "p_type": t["p_type"],
            "p_size": t["p_size"],
            "one": pa.array(np.ones(t.num_rows, np.int64))})

    agg = partial_groupby_agg(
        bsupp.map_batches(ones, batch_format="pyarrow"),
        ["p_brand", "p_type", "p_size"], [("one", "sum")])

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({
            "p_brand": t["p_brand"], "p_type": t["p_type"],
            "p_size": pc.cast(t["p_size"], pa.int64()),
            "supplier_cnt": pc.cast(t["one_sum"], pa.int64())})

    return agg.map_batches(shape, batch_format="pyarrow")


def q17_small_qty(lineitem: ray.data.Dataset,
                  frac: float = 0.2) -> ray.data.Dataset:
    """(n_small, rev_cents, avg_yearly6): TPC-H Q17 shape over ALL
    parts — revenue of lineitems whose quantity is below ``frac`` x
    the part's average quantity (avg_yearly = rev / 7.0 as in the
    spec).  Quantities are integral doubles, so the per-part sums are
    exact in float64 and the avg (sum / n) is order-free on both the
    engine and the DuckDB side.

    Scale plan: pass 1 builds the per-part (sum_qty, n) table with a
    block combiner + one bounded exchange (output bounded by |part|);
    the avg table broadcasts once via ``ray.put`` (bounded by |part| —
    at web scale this is the side that would flip to the repo's
    hash-co-partition join past a broadcast threshold, the dedup_keep
    pattern); pass 2 streams lineitem against the broadcast lookup."""
    from ..relational import partial_groupby_agg

    def qn(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": t["l_partkey"], "q": t["l_quantity"],
            "one": pa.array(np.ones(t.num_rows, np.int64))})

    per_part = partial_groupby_agg(
        lineitem.select_columns(["l_partkey", "l_quantity"])
        .map_batches(qn, batch_format="pyarrow", batch_size=65536),
        ["l_partkey"], [("q", "sum"), ("one", "sum")])

    def avg_merge(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].combine_chunks().to_numpy()
        s = t["q_sum"].combine_chunks().to_numpy()
        n = t["one_sum"].combine_chunks().to_numpy()
        order = np.argsort(pk)
        return pa.table({"pk": pa.array(pk[order]),
                         "cut": pa.array(frac * (s[order] / n[order]))})

    cut_ref = broadcast_table(single_merge(per_part, avg_merge))

    def partial(t: pa.Table) -> pa.Table:
        ct = ray.get(cut_ref)
        pk_sorted = ct["pk"].to_numpy()
        cut = ct["cut"].to_numpy()
        pk = t["l_partkey"].combine_chunks().to_numpy()
        qty = t["l_quantity"].combine_chunks().to_numpy()
        idx = np.searchsorted(pk_sorted, pk)
        keep = qty < cut[idx]
        rc = round_half_away(
            t["l_extendedprice"].combine_chunks().to_numpy()[keep]
            * 100.0, 0).astype(np.int64)
        return pa.table({"n": pa.array([int(keep.sum())], pa.int64()),
                         "rc": pa.array([int(rc.sum())], pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        n = int(pc.sum(t["n"]).as_py() or 0)
        rc = int(pc.sum(t["rc"]).as_py() or 0)
        return pa.table({
            "n_small": pa.array([n], pa.int64()),
            "rev_cents": pa.array([rc], pa.int64()),
            "avg_yearly6": pa.array(round_half_away(
                np.array([rc / 100.0 / 7.0]), 6))})

    return single_merge(
        lineitem.select_columns(["l_partkey", "l_quantity",
                                 "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        merge)


def q19_brand_revenue(lineitem: ray.data.Dataset, part: ray.data.Dataset,
                      conds: tuple = (("Brand#2", 1, 5, 1.0, 11.0),
                                      ("Brand#4", 1, 10, 10.0, 20.0),
                                      ("Brand#19", 1, 15, 20.0, 30.0)),
                      ) -> ray.data.Dataset:
    """(revenue_cents, n): TPC-H Q19 shape — discounted revenue over a
    disjunction of (brand, size-range, quantity-range) condition sets.

    Scale plan: part's (partkey, brand, size) projection broadcasts
    once via ``ray.put`` (bounded by |part|; the hash-join flip applies
    past a broadcast threshold as in q17) and lineitem streams against
    it with the full OR predicate vectorized per batch; one-row
    merge."""
    part_ref = broadcast_table(part.select_columns(
        ["p_partkey", "p_brand", "p_size"]))

    def partial(t: pa.Table) -> pa.Table:
        pt = ray.get(part_ref).combine_chunks()
        pk_all = pt["p_partkey"].to_numpy()
        order = np.argsort(pk_all)
        brand = pt["p_brand"].to_numpy(zero_copy_only=False)[order]
        size = pt["p_size"].to_numpy()[order]
        pk_sorted = pk_all[order]

        pk = t["l_partkey"].combine_chunks().to_numpy()
        qty = t["l_quantity"].combine_chunks().to_numpy()
        idx = np.searchsorted(pk_sorted, pk)
        b, sz = brand[idx], size[idx]
        keep = np.zeros(len(pk), bool)
        for cb, s_lo, s_hi, q_lo, q_hi in conds:
            keep |= ((b == cb) & (sz >= s_lo) & (sz <= s_hi)
                     & (qty >= q_lo) & (qty <= q_hi))
        rc = round_half_away(
            t["l_extendedprice"].combine_chunks().to_numpy()[keep]
            * (1.0 - t["l_discount"].combine_chunks().to_numpy()[keep])
            * 100.0, 0).astype(np.int64)
        return pa.table({"rc": pa.array([int(rc.sum())], pa.int64()),
                         "n": pa.array([int(keep.sum())], pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        return pa.table({
            "revenue_cents": pa.array(
                [int(pc.sum(t["rc"]).as_py() or 0)], pa.int64()),
            "n": pa.array([int(pc.sum(t["n"]).as_py() or 0)], pa.int64())})

    return single_merge(
        lineitem.select_columns(["l_partkey", "l_quantity",
                                 "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        merge)


def q22_idle_customers(customer: ray.data.Dataset,
                       orders: ray.data.Dataset,
                       min_totalprice: float = 300_000.0,
                       num_parts: int = 32) -> ray.data.Dataset:
    """(c_mktsegment, n_custs, sum_acctbal_cents): TPC-H Q22 shape with
    the market segment standing in for the phone prefix — customers
    whose account balance exceeds the average POSITIVE balance and who
    placed no order above ``min_totalprice``, counted per segment.

    Scale plan: the global positive-average is a two-int scalar from a
    one-pass combiner (exact: integer cents); the no-order test is the
    exact hash-co-partitioned ANTI join (``partitioned_anti_filter``,
    per-block distinct-custkey combiner on the FK side); the segment
    rollup is a bounded combiner merge."""
    from ..relational import partial_groupby_agg, partitioned_anti_filter

    def bal_partial(t: pa.Table) -> pa.Table:
        cents = round_half_away(
            t["c_acctbal"].combine_chunks().to_numpy() * 100.0,
            0).astype(np.int64)
        pos = cents > 0
        return pa.table({"s": pa.array([int(cents[pos].sum())], pa.int64()),
                         "n": pa.array([int(pos.sum())], pa.int64())})

    def bal_merge(t: pa.Table) -> pa.Table:
        s = int(pc.sum(t["s"]).as_py() or 0)
        n = int(pc.sum(t["n"]).as_py() or 0)
        return pa.table({"avg_cents": pa.array([s / n if n else 0.0])})

    avg_cents = single_merge(
        customer.select_columns(["c_acctbal"])
        .map_batches(bal_partial, batch_format="pyarrow",
                     batch_size=65536),
        bal_merge).take_all()[0]["avg_cents"]

    def rich(t: pa.Table) -> pa.Table:
        cents = round_half_away(
            t["c_acctbal"].combine_chunks().to_numpy() * 100.0,
            0).astype(np.int64)
        return t.filter(pa.array(cents > avg_cents))

    rich_c = customer.select_columns(
        ["c_custkey", "c_mktsegment", "c_acctbal"]) \
        .map_batches(rich, batch_format="pyarrow")

    def fk(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["o_totalprice"], min_totalprice))
        v = np.unique(t["o_custkey"].combine_chunks().to_numpy())
        return pa.table({"c_custkey": pa.array(v)})

    keys = orders.select_columns(["o_custkey", "o_totalprice"]) \
        .map_batches(fk, batch_format="pyarrow")
    idle = partitioned_anti_filter(rich_c, "c_custkey", keys,
                                   num_parts=num_parts)

    def seg(t: pa.Table) -> pa.Table:
        cents = round_half_away(
            t["c_acctbal"].combine_chunks().to_numpy() * 100.0,
            0).astype(np.int64)
        return pa.table({
            "c_mktsegment": t["c_mktsegment"],
            "one": pa.array(np.ones(t.num_rows, np.int64)),
            "cents": pa.array(cents)})

    agg = partial_groupby_agg(
        idle.map_batches(seg, batch_format="pyarrow"),
        ["c_mktsegment"], [("one", "sum"), ("cents", "sum")])

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_mktsegment": t["c_mktsegment"],
            "n_custs": pc.cast(t["one_sum"], pa.int64()),
            "sum_acctbal_cents": pc.cast(t["cents_sum"], pa.int64())})

    return agg.map_batches(shape, batch_format="pyarrow")


_CKSUM_P = 2147483647          # 2^31 - 1 (Mersenne): products fit BIGINT
_CKSUM_M = (65539, 69623)      # two independent odd multipliers


def lineitem_checksum(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """(n, checksum1, checksum2): order-insensitive table digest — the
    data-validation primitive a 100-TB migration / resumable-write
    pipeline runs on both sides of a copy.  Each row hashes to two
    independent Horner chains h = (h * M + v) mod P over
    (l_orderkey, l_linenumber, quantity, price-cents), all values
    pre-reduced mod P = 2^31 - 1 so every product stays under 2^48
    (exact in int64 on the engine AND in DuckDB BIGINT — no
    wraparound-semantics divergence); the table digest is the SUM of
    row hashes mod P, which is commutative, so any partitioning /
    execution order yields the identical digest.

    Scale plan: one streaming pass, two-int partials per block, one-row
    merge — nothing is exchanged but per-block scalars."""
    P = np.int64(_CKSUM_P)

    def partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].combine_chunks().to_numpy() % P
        ln = t["l_linenumber"].combine_chunks().to_numpy() % P
        q = t["l_quantity"].combine_chunks().to_numpy() \
            .astype(np.int64) % P
        ec = round_half_away(
            t["l_extendedprice"].combine_chunks().to_numpy() * 100.0,
            0).astype(np.int64) % P
        out = {"n": pa.array([t.num_rows], pa.int64())}
        for i, m in enumerate(_CKSUM_M):
            M = np.int64(m)
            h = ok.copy()
            for v in (ln, q, ec):
                h = (h * M + v) % P
            out[f"c{i + 1}"] = pa.array([int(h.sum() % P)], pa.int64())
        return pa.table(out)

    def merge(t: pa.Table) -> pa.Table:
        return pa.table({
            "n": pa.array([int(pc.sum(t["n"]).as_py() or 0)], pa.int64()),
            "checksum1": pa.array(
                [int((pc.sum(t["c1"]).as_py() or 0) % _CKSUM_P)],
                pa.int64()),
            "checksum2": pa.array(
                [int((pc.sum(t["c2"]).as_py() or 0) % _CKSUM_P)],
                pa.int64())})

    return single_merge(
        lineitem.select_columns(["l_orderkey", "l_linenumber",
                                 "l_quantity", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        merge)


def lineitem_profile(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """(column, n, n_distinct, min6, max6, mean6): one-pass column
    profiler over lineitem's three numeric measures — the dataset-
    audit summary every ingestion pipeline emits before training.

    Scale plan: min/max/sum moments are per-block scalar partials
    merged in one bounded task (3 rows per block); the EXACT distinct
    counts route every (column, value) through per-block dedup + ONE
    bounded hash exchange (partial_groupby_agg keys) + a per-column
    combiner count, so no raw row is exchanged and nothing
    materializes driver-side but a 3-row moment table.  Means are
    integer-cent sums (quantities are integral, prices/discounts 2dp),
    so the floats are order-free and match DuckDB bit-for-bit."""
    from ..relational import partial_groupby_agg

    COLS = (("l_quantity", 1.0), ("l_extendedprice", 100.0),
            ("l_discount", 100.0))

    def moments(t: pa.Table) -> pa.Table:
        names, ns, mins, maxs, sums = [], [], [], [], []
        for c, scale in COLS:
            v = t[c].combine_chunks().to_numpy()
            sc = round_half_away(v * scale, 0).astype(np.int64)
            names.append(c)
            ns.append(len(v))
            mins.append(float(v.min()) if len(v) else np.inf)
            maxs.append(float(v.max()) if len(v) else -np.inf)
            sums.append(int(sc.sum()))
        return pa.table({
            "column": pa.array(names), "n": pa.array(ns, pa.int64()),
            "mn": pa.array(mins), "mx": pa.array(maxs),
            "s": pa.array(sums, pa.int64())})

    mom = single_merge(
        lineitem.select_columns([c for c, _ in COLS])
        .map_batches(moments, batch_format="pyarrow", batch_size=65536),
        lambda t: t.group_by("column").aggregate(
            [("n", "sum"), ("mn", "min"), ("mx", "max"), ("s", "sum")]),
    ).take_all()                                   # bounded: 3 rows
    mom_of = {r["column"]: r for r in mom}

    def vals(t: pa.Table) -> pa.Table:
        cols, vv = [], []
        for i, (c, _) in enumerate(COLS):
            u = np.unique(t[c].combine_chunks().to_numpy())
            cols.append(np.full(len(u), i, np.int64))
            vv.append(u)
        return pa.table({"ci": pa.array(np.concatenate(cols)),
                         "v": pa.array(np.concatenate(vv)),
                         "one": pa.array(np.ones(
                             sum(len(x) for x in vv), np.int64))})

    dv = partial_groupby_agg(
        lineitem.select_columns([c for c, _ in COLS])
        .map_batches(vals, batch_format="pyarrow", batch_size=65536),
        ["ci", "v"], [("one", "sum")])

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({"ci": t["ci"],
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    nd = partial_groupby_agg(dv.map_batches(ones, batch_format="pyarrow"),
                             ["ci"], [("one", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        ci = t["ci"].combine_chunks().to_numpy()
        ndist = t["one_sum"].combine_chunks().to_numpy().astype(np.int64)
        names = [COLS[int(i)][0] for i in ci]
        rows = [mom_of[nm] for nm in names]
        scale = np.array([COLS[int(i)][1] for i in ci])
        n = np.array([r["n_sum"] for r in rows], np.int64)
        mean = np.array([r["s_sum"] for r in rows], np.float64) \
            / scale / n
        return pa.table({
            "column": pa.array(names, pa.string()),
            "n": pa.array(n),
            "n_distinct": pa.array(ndist),
            "min6": pa.array(round_half_away(
                np.array([r["mn_min"] for r in rows]), 6)),
            "max6": pa.array(round_half_away(
                np.array([r["mx_max"] for r in rows]), 6)),
            "mean6": pa.array(round_half_away(mean, 6))})

    return nd.map_batches(finish, batch_format="pyarrow")


def q8_market_share(lineitem: ray.data.Dataset, orders: ray.data.Dataset,
                    customer: ray.data.Dataset, supplier: ray.data.Dataset,
                    nation: ray.data.Dataset, region: ray.data.Dataset,
                    target_region: str = "ASIA",
                    target_nation: str = "NATION_7",
                    num_partitions: int = 8) -> ray.data.Dataset:
    """(l_year, total_cents, nation_cents, share6): TPC-H Q8 shape —
    for orders placed by customers of ``target_region``, the fraction
    of ship-year revenue supplied by ``target_nation`` (the "market
    share" of one supplying nation inside one consuming region).

    Scale plan: nation x region (25 x 5 rows) broadcast once to derive
    the in-region customer-nation set; customer is filtered by that set
    in a streaming block pass BEFORE the orders hash join (the only
    all-to-all this query pays, custkey-partitioned); lineitem collapses
    per (orderkey, year) x supplier-flag in a block combiner keyed by
    the broadcast supplier→nation map (|supplier| bounded; past the
    repo's broadcast threshold this side flips to the dedup_keep
    hash-co-partition join). Final merge is bounded by |years|.
    Integer-cents revenue on both sides; share6 = nation/total rounded
    half-away at 6 dp, exact because both operands are exact int64
    sums. Reference parity: generalizes the nation-revenue rollup of
    go-osm's summarize counters (osm/Summary.go) to a graded share."""
    nat_t = nation.take_all()
    reg_t = region.take_all()
    reg_key = {r["r_regionkey"]: r["r_name"] for r in reg_t}
    in_region = {r["n_nationkey"] for r in nat_t
                 if reg_key[r["n_regionkey"]] == target_region}
    target_key = next(r["n_nationkey"] for r in nat_t
                      if r["n_name"] == target_nation)
    in_region_arr = np.array(sorted(in_region), np.int64)

    supp_ref = broadcast_table(supplier, ["s_suppkey", "s_nationkey"])

    def cust_filter(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].combine_chunks().to_numpy()
        return t.filter(pa.array(np.isin(nk, in_region_arr))) \
            .select(["c_custkey"])

    cust = customer.select_columns(["c_custkey", "c_nationkey"]) \
        .map_batches(cust_filter, batch_format="pyarrow")

    ords = orders.select_columns(["o_orderkey", "o_custkey"]) \
        .join(cust, join_type="inner", num_partitions=num_partitions,
              on=("o_custkey",), right_on=("c_custkey",)) \
        .select_columns(["o_orderkey"])

    def li_partial(t: pa.Table) -> pa.Table:
        st = ray.get(supp_ref)
        sk = st["s_suppkey"].to_numpy()
        order = np.argsort(sk)
        snat = st["s_nationkey"].to_numpy()[order]
        idx = np.searchsorted(sk[order],
                              t["l_suppkey"].combine_chunks().to_numpy())
        year = t["l_shipdate"].combine_chunks().to_numpy() \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        rc = round_half_away(
            t["l_extendedprice"].combine_chunks().to_numpy()
            * (1.0 - t["l_discount"].combine_chunks().to_numpy()) * 100.0,
            0).astype(np.int64)
        flag = (snat[idx] == target_key).astype(np.int64)
        g = pa.table({"l_orderkey": t["l_orderkey"],
                      "l_year": pa.array(year), "rc": pa.array(rc),
                      "nc": pa.array(rc * flag)}) \
            .group_by(["l_orderkey", "l_year"]) \
            .aggregate([("rc", "sum"), ("nc", "sum")])
        return g.rename_columns(["l_orderkey", "l_year", "rc", "nc"])

    li = lineitem.select_columns(
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
         "l_shipdate"]) \
        .map_batches(li_partial, batch_format="pyarrow", batch_size=65536)

    j = li.join(ords, join_type="inner", num_partitions=num_partitions,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def year_partial(t: pa.Table) -> pa.Table:
        g = t.select(["l_year", "rc", "nc"]).group_by(["l_year"]) \
            .aggregate([("rc", "sum"), ("nc", "sum")])
        return g.rename_columns(["l_year", "rc", "nc"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_year"]).aggregate([("rc", "sum"), ("nc", "sum")])
        tot = g["rc_sum"].to_numpy().astype(np.int64)
        nat = g["nc_sum"].to_numpy().astype(np.int64)
        return pa.table({
            "l_year": pc.cast(g["l_year"], pa.int64()),
            "total_cents": pa.array(tot),
            "nation_cents": pa.array(nat),
            "share6": pa.array(round_half_away(nat * 1.0 / tot, 6)),
        }).sort_by("l_year")

    return single_merge(j.map_batches(year_partial, batch_format="pyarrow"),
                        merge)


def q9_profit_proxy(lineitem: ray.data.Dataset, part: ray.data.Dataset,
                    supplier: ray.data.Dataset, nation: ray.data.Dataset,
                    cost_frac_x100: int = 60) -> ray.data.Dataset:
    """(n_name, l_year, profit_cents): TPC-H Q9 shape with the missing
    partsupp cost replaced by a deterministic proxy — unit cost =
    ``cost_frac_x100``% of p_retailprice, in integer cents — so profit
    per lineitem is round(extprice*(1-disc)*100) - qty*cost_cents,
    grouped by supplier nation and ship year.

    Scale plan: zero all-to-all joins — the part cost map and the
    supplier→nation map both broadcast once via ``ray.put`` (each
    bounded by its dimension table; past the repo's broadcast threshold
    either flips to the hash-co-partition join), lineitem streams once
    through a block combiner keyed by (nationkey, year), and the final
    merge is bounded by 25 x years. Quantities are integral doubles so
    qty*cost_cents is exact int64 arithmetic on both sides."""
    part_ref = broadcast_table(part, ["p_partkey", "p_retailprice"])
    supp_ref = broadcast_table(supplier, ["s_suppkey", "s_nationkey"])
    nat_ref = broadcast_table(nation, ["n_nationkey", "n_name"])

    def li_partial(t: pa.Table) -> pa.Table:
        pt, st = ray.get(part_ref), ray.get(supp_ref)
        pk = pt["p_partkey"].to_numpy()
        po = np.argsort(pk)
        cost = round_half_away(
            pt["p_retailprice"].to_numpy() * float(cost_frac_x100),
            0).astype(np.int64)[po]
        sk = st["s_suppkey"].to_numpy()
        so = np.argsort(sk)
        snat = st["s_nationkey"].to_numpy()[so]
        pidx = np.searchsorted(pk[po],
                               t["l_partkey"].combine_chunks().to_numpy())
        sidx = np.searchsorted(sk[so],
                               t["l_suppkey"].combine_chunks().to_numpy())
        year = t["l_shipdate"].combine_chunks().to_numpy() \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        rc = round_half_away(
            t["l_extendedprice"].combine_chunks().to_numpy()
            * (1.0 - t["l_discount"].combine_chunks().to_numpy()) * 100.0,
            0).astype(np.int64)
        qty = t["l_quantity"].combine_chunks().to_numpy().astype(np.int64)
        profit = rc - qty * cost[pidx]
        g = pa.table({"nk": pa.array(snat[sidx]),
                      "l_year": pa.array(year),
                      "pc": pa.array(profit)}) \
            .group_by(["nk", "l_year"]).aggregate([("pc", "sum")])
        return g.rename_columns(["nk", "l_year", "pc"])

    li = lineitem.select_columns(
        ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"]) \
        .map_batches(li_partial, batch_format="pyarrow", batch_size=65536)

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["nk", "l_year"]).aggregate([("pc", "sum")])
        nt = ray.get(nat_ref)
        keys = nt["n_nationkey"].to_numpy()
        order = np.argsort(keys)
        idx = np.searchsorted(keys[order],
                              g["nk"].combine_chunks().to_numpy())
        return pa.table({
            "n_name": nt["n_name"].take(pa.array(order[idx])),
            "l_year": pc.cast(g["l_year"], pa.int64()),
            "profit_cents": pc.cast(g["pc_sum"], pa.int64()),
        }).sort_by([("n_name", "ascending"), ("l_year", "ascending")])

    return single_merge(li, merge)


def q11_important_parts(lineitem: ray.data.Dataset,
                        mult: float = 1.2) -> ray.data.Dataset:
    """(l_partkey, value_cents): TPC-H Q11 shape with lineitem revenue
    as the stock-value proxy (no partsupp table) — parts whose total
    revenue exceeds ``mult`` x the mean per-part revenue (the
    scale-free analogue of Q11's fraction-of-total cut: the mean
    adapts to |parts| so the query stays non-degenerate at every sf).

    Scale plan: one bounded exchange builds the per-part value table
    (block combiner first, output bounded by |part|); the global cutoff
    is a two-scalar tree reduction over that table's blocks (sum + n,
    merged in one tiny task) broadcast back into a streaming filter —
    the per-part table is never single-task-merged. Both engines
    compute cutoff = mult * (sum/n) in float64 from exact int64 sums,
    so the comparison is bit-identical."""
    from ..relational import partial_groupby_agg

    def rc(t: pa.Table) -> pa.Table:
        v = round_half_away(
            t["l_extendedprice"].combine_chunks().to_numpy() * 100.0,
            0).astype(np.int64)
        return pa.table({"l_partkey": t["l_partkey"], "vc": pa.array(v)})

    per_part = partial_groupby_agg(
        lineitem.select_columns(["l_partkey", "l_extendedprice"])
        .map_batches(rc, batch_format="pyarrow", batch_size=65536),
        ["l_partkey"], [("vc", "sum")]).materialize()

    def scalar_partial(t: pa.Table) -> pa.Table:
        v = t["vc_sum"].combine_chunks().to_numpy().astype(np.int64)
        return pa.table({"s": pa.array([int(v.sum())]),
                         "n": pa.array([len(v)], pa.int64())})

    stats = per_part.map_batches(scalar_partial, batch_format="pyarrow") \
        .sum(["s", "n"])
    cutoff = mult * (float(stats["sum(s)"]) / float(stats["sum(n)"]))

    def keep(t: pa.Table) -> pa.Table:
        v = t["vc_sum"].combine_chunks().to_numpy().astype(np.int64)
        out = t.filter(pa.array(v > cutoff))
        return pa.table({
            "l_partkey": out["l_partkey"],
            "value_cents": pc.cast(out["vc_sum"], pa.int64())})

    return per_part.map_batches(keep, batch_format="pyarrow")


def events_attribution(events: ray.data.Dataset,
                       convert_type: str = "purchase",
                       num_parts: int = 16) -> ray.data.Dataset:
    """(attrib_type, n, value_u6): last-touch attribution — each
    ``convert_type`` event is credited to the user's most recent PRIOR
    event of any other type ('none' when the conversion is the user's
    first such activity), with conversion counts and exact micro-unit
    value sums per credited type.

    Distributed plan (sessionize-shaped): ONE bounded user-hash
    exchange co-locates each user's rows; the per-partition kernel
    lexsorts (user, ts, event_id), walks conversions against the
    running index of non-conversion events with a vectorized
    searchsorted (no Python row loop), and emits a partial matrix
    bounded by |types|+1 rows; partials merge in a single tiny task.
    Values aggregate as round(value*1e6) int64 so the sums are
    order-free on both engine and oracle."""
    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(uid, num_parts)))

    def per_partition(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        eid = t["event_id"].combine_chunks().to_numpy()
        et = t["event_type"].combine_chunks()
        val = t["value"].combine_chunks().to_numpy()
        order = np.lexsort((eid, ts, uid))
        u = uid[order]
        types = et.take(pa.array(order))
        v6 = round_half_away(val[order] * 1e6, 0).astype(np.int64)
        is_conv = pc.equal(types, convert_type).to_numpy(
            zero_copy_only=False)
        # segment starts per user (sorted by u)
        n = len(u)
        if n == 0:
            return pa.table({"attrib_type": pa.array([], pa.string()),
                             "pn": pa.array([], pa.int64()),
                             "pv": pa.array([], pa.int64())})
        nonc_pos = np.flatnonzero(~is_conv)
        conv_pos = np.flatnonzero(is_conv)
        # most recent non-conversion strictly before each conversion
        prev_idx = np.searchsorted(nonc_pos, conv_pos) - 1
        seg_start = np.searchsorted(u, u[conv_pos], side="left")
        valid = prev_idx >= 0
        cand = nonc_pos[np.maximum(prev_idx, 0)]
        valid &= cand >= seg_start  # same user segment
        attrib = np.where(valid, cand, -1)
        tdict = types.dictionary_encode()
        codes = tdict.indices.to_numpy().astype(np.int64)
        vocab = list(tdict.dictionary.to_pylist()) + ["none"]
        none_code = len(vocab) - 1
        acode = np.where(attrib >= 0, codes[np.maximum(attrib, 0)],
                         none_code)
        k = len(vocab)
        cnt = np.bincount(acode, minlength=k)
        vsum = np.zeros(k, np.int64)
        np.add.at(vsum, acode, v6[conv_pos])  # int64-exact value sums
        nz = np.flatnonzero(cnt)
        return pa.table({
            "attrib_type": pa.array([vocab[i] for i in nz], pa.string()),
            "pn": pa.array(cnt[nz], pa.int64()),
            "pv": pa.array(vsum[nz], pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["attrib_type"]).aggregate(
            [("pn", "sum"), ("pv", "sum")])
        return g.rename_columns(["attrib_type", "n", "value_u6"]) \
            .sort_by("attrib_type")

    parts = (events.select_columns(["event_id", "user_id", "ts",
                                    "event_type", "value"])
             .map_batches(add_part, batch_format="pyarrow")
             .groupby("part")
             .map_groups(lambda t: per_partition(t.drop_columns(["part"])),
                         batch_format="pyarrow"))
    return single_merge(parts, merge)


def events_concurrency(events: ray.data.Dataset,
                       base_dur_s: int = 60,
                       bucket_s: int = 86400) -> ray.data.Dataset:
    """(event_type, n_events, peak): peak concurrent activity per event
    type when each event opens a half-open interval
    [ts, ts + (base_dur_s + floor(value)) seconds) — the sweep-line
    "max sessions in flight" statistic, with the end-before-start tie
    rule at equal timestamps that half-open intervals imply.

    Distributed plan (token_pack-shaped two-phase prefix scan, no
    global sort): each block emits +1/-1 boundary rows; ONE bounded
    hash exchange co-locates (event_type, time-bucket) groups; the
    per-group kernel sorts its own boundaries (vectorized lexsort) and
    reduces to THREE scalars — boundary delta total, running-prefix
    max, and start count — so the merge is bounded by types x occupied
    buckets, never by events.  The merge chains bucket prefixes in
    time order per type (tiny numpy scan) and the global peak is
    max(prefix-before-bucket + bucket-local max).  All arithmetic is
    int64 epoch-microseconds, so engine and oracle agree exactly."""
    bucket_us = int(bucket_s) * 1_000_000

    def boundaries(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        dur = (int(base_dur_s)
               + np.floor(t["value"].combine_chunks().to_numpy())
               .astype(np.int64)) * 1_000_000
        et = t["event_type"].combine_chunks()
        tt = np.concatenate([ts, ts + dur])
        dd = np.concatenate([np.ones(len(ts), np.int64),
                             -np.ones(len(ts), np.int64)])
        typ = pa.chunked_array([et, et]).combine_chunks()
        return pa.table({"event_type": typ, "t": pa.array(tt),
                         "d": pa.array(dd),
                         "bucket": pa.array(tt // bucket_us)})

    def per_group(t: pa.Table) -> pa.Table:
        tt = t["t"].combine_chunks().to_numpy()
        dd = t["d"].combine_chunks().to_numpy()
        order = np.lexsort((dd, tt))  # ends (-1) before starts at ties
        run = np.cumsum(dd[order])
        return pa.table({
            "event_type": t["event_type"].slice(0, 1),
            "bucket": t["bucket"].slice(0, 1),
            "delta": pa.array([int(dd.sum())], pa.int64()),
            "lmax": pa.array([int(run.max())], pa.int64()),
            "starts": pa.array([int((dd > 0).sum())], pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        et = t["event_type"].combine_chunks()
        codes = et.dictionary_encode().indices.to_numpy().astype(np.int64)
        bucket = t["bucket"].combine_chunks().to_numpy()
        delta = t["delta"].combine_chunks().to_numpy()
        lmax = t["lmax"].combine_chunks().to_numpy()
        starts = t["starts"].combine_chunks().to_numpy()
        order = np.lexsort((bucket, codes))
        codes_s, delta_s, lmax_s = codes[order], delta[order], lmax[order]
        run = np.cumsum(delta_s)
        first = np.r_[True, codes_s[1:] != codes_s[:-1]]
        seg = np.flatnonzero(first)
        # prefix concurrency entering each bucket = running delta sum
        # minus the running sum at the start of this type's segment
        base = np.repeat(np.r_[0, run[seg - 1][1:]] if len(seg) > 1
                         else np.zeros(len(seg), np.int64),
                         np.diff(np.r_[seg, len(codes_s)]))
        enter = np.r_[0, run[:-1]] - base
        cand = enter + lmax_s
        peak = np.maximum.reduceat(cand, seg)
        n_ev = np.add.reduceat(starts[order], seg)
        out = pa.table({
            "event_type": et.take(pa.array(order[seg])),
            "n_events": pa.array(n_ev),
            "peak": pa.array(peak.astype(np.int64))})
        return out.sort_by("event_type")

    parts = (events.select_columns(["ts", "event_type", "value"])
             .map_batches(boundaries, batch_format="pyarrow",
                          batch_size=65536)
             .groupby(["event_type", "bucket"])
             .map_groups(per_group, batch_format="pyarrow"))
    return single_merge(parts, merge)


def part_top_supplier(lineitem: ray.data.Dataset,
                      num_parts: int = 32) -> ray.data.Dataset:
    """(l_partkey, s_best, value_cents): per part, the supplier with the
    LARGEST total lineitem revenue (integer cents), ties broken by the
    smallest suppkey — the grouped-argmax shape of TPC-H Q2's
    min-cost-supplier lookup over the tables this dataset carries.

    Scale plan: block combiner collapses to one (part, supp) partial
    per block pair BEFORE the single hash(part) exchange; the per-
    partition kernel re-sums duplicates across blocks (lexsort +
    reduceat) and takes first-of-group under the exact (part,
    -value, supp) order.  Output is bounded by |part|; int64 cents
    make the argmax order-free."""
    def rc(t: pa.Table) -> pa.Table:
        v = round_half_away(
            t["l_extendedprice"].combine_chunks().to_numpy() * 100.0,
            0).astype(np.int64)
        g = pa.table({"l_partkey": t["l_partkey"],
                      "l_suppkey": t["l_suppkey"], "vc": pa.array(v)}) \
            .group_by(["l_partkey", "l_suppkey"]).aggregate([("vc", "sum")])
        pk = g["l_partkey"].combine_chunks().to_numpy()
        return pa.table({"l_partkey": g["l_partkey"],
                         "l_suppkey": g["l_suppkey"],
                         "vc": g["vc_sum"],
                         "part": pa.array(hash_part(pk, num_parts))})

    def argmax_kernel(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].combine_chunks().to_numpy()
        sk = t["l_suppkey"].combine_chunks().to_numpy()
        vc = t["vc"].combine_chunks().to_numpy().astype(np.int64)
        # re-sum cross-block duplicates of (part, supp)
        o = np.lexsort((sk, pk))
        pk, sk, vc = pk[o], sk[o], vc[o]
        first = np.r_[True, (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])]
        starts = np.flatnonzero(first)
        vsum = np.add.reduceat(vc, starts)
        pk, sk = pk[starts], sk[starts]
        # argmax per part: sort (part asc, value desc, supp asc)
        o2 = np.lexsort((sk, -vsum, pk))
        pk, sk, vsum = pk[o2], sk[o2], vsum[o2]
        top = np.r_[True, pk[1:] != pk[:-1]]
        return pa.table({"l_partkey": pa.array(pk[top]),
                         "s_best": pa.array(sk[top]),
                         "value_cents": pa.array(vsum[top])})

    return lineitem.select_columns(
        ["l_partkey", "l_suppkey", "l_extendedprice"]) \
        .map_batches(rc, batch_format="pyarrow", batch_size=65536) \
        .groupby("part") \
        .map_groups(lambda t: argmax_kernel(t.drop_columns(["part"])),
                    batch_format="pyarrow")


def events_late_arrivals(events: ray.data.Dataset,
                         threshold_s: int = 3600,
                         bucket: int = 8192) -> ray.data.Dataset:
    """(event_type, n_events, n_late, sum_late_s): streaming watermark
    accounting — replaying each type's stream in arrival order
    (ascending event_id), an event is LATE when the running max
    timestamp seen strictly before it exceeds its own timestamp by
    more than ``threshold_s``; late seconds accumulate as exact
    floor-divided int64.

    Distributed plan: prefix max is associative, so the scan runs in
    two bounded phases — phase 1 is a block combiner producing each
    (type, event_id-bucket)'s max timestamp (output bounded by types x
    buckets); the tiny carry table (exclusive running max per bucket)
    is computed once and broadcast; phase 2 re-scans each bucket group
    with its carry, entirely vectorized (sort by event_id +
    running-max accumulate).  No global sort, no unbounded state."""
    from ..relational import partial_groupby_agg

    def keyed(t: pa.Table) -> pa.Table:
        eid = t["event_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        return pa.table({"event_type": t["event_type"],
                         "bucket": pa.array(eid // bucket),
                         "event_id": pa.array(eid), "ts_us": pa.array(ts)})

    src = events.select_columns(["event_id", "ts", "event_type"]) \
        .map_batches(keyed, batch_format="pyarrow", batch_size=65536) \
        .materialize()

    # phase 1: bounded carry table (exclusive prefix max per bucket)
    maxes = partial_groupby_agg(src, ["event_type", "bucket"],
                                [("ts_us", "max")]).take_all()
    by_type: dict = {}
    for r in maxes:
        by_type.setdefault(r["event_type"], []).append(
            (r["bucket"], r["ts_us_max"]))
    carry: dict = {}
    for et, rows in by_type.items():
        run = -(1 << 62)   # low sentinel; int64.min would wrap in wm-ts
        for b, mx in sorted(rows):
            carry[(et, b)] = run
            run = max(run, mx)
    carry_ref = ray.put(carry)
    thr_us = int(threshold_s) * 1_000_000

    def per_bucket(t: pa.Table) -> pa.Table:
        cd = ray.get(carry_ref)
        et = t["event_type"][0].as_py()
        b = int(t["bucket"][0].as_py())
        eid = t["event_id"].combine_chunks().to_numpy()
        ts = t["ts_us"].combine_chunks().to_numpy()
        o = np.argsort(eid, kind="stable")
        ts = ts[o]
        wm = np.maximum.accumulate(
            np.r_[cd[(et, b)], ts[:-1]])          # exclusive prefix max
        late = (wm - ts) > thr_us
        lsum = int(((wm[late] - ts[late]) // 1_000_000).sum()) \
            if late.any() else 0
        return pa.table({"event_type": pa.array([et]),
                         "pn": pa.array([len(ts)], pa.int64()),
                         "pl": pa.array([int(late.sum())], pa.int64()),
                         "ps": pa.array([lsum], pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type"]).aggregate(
            [("pn", "sum"), ("pl", "sum"), ("ps", "sum")])
        return g.rename_columns(
            ["event_type", "n_events", "n_late", "sum_late_s"]) \
            .sort_by("event_type")

    parts = src.groupby(["event_type", "bucket"]) \
        .map_groups(per_bucket, batch_format="pyarrow")
    return single_merge(parts, merge)


def q12_priority_by_status(lineitem: ray.data.Dataset,
                           orders: ray.data.Dataset,
                           date_lo: str = "1996-01-01",
                           date_hi: str = "1997-01-01",
                           num_partitions: int = 8) -> ray.data.Dataset:
    """(l_linestatus, high_line_count, low_line_count): TPC-H Q12
    shape — lineitems shipped in a window, counted per line status and
    split by order priority class (HIGH = 1-URGENT/2-HIGH).  The
    testdata has no l_shipmode column, so l_linestatus plays the
    grouping dimension (reference query: cmd/osm has no SQL layer;
    this exercises the generic join+conditional-count surface).

    Scale plan: lineitem filters its ship window at the scan and
    collapses to one (orderkey, status, n) partial per block pair
    BEFORE the hash join (ships one row per order-status, not one per
    lineitem); orders projects to (orderkey, is_high 0/1); the
    post-join conditional count is a 2-row bounded combine."""
    lo = np.datetime64(date_lo, "us").astype(np.int64)
    hi = np.datetime64(date_hi, "us").astype(np.int64)

    def li_partial(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].combine_chunks().to_numpy().astype(np.int64)
        t = t.filter(pa.array((sd >= lo) & (sd < hi)))
        g = t.group_by(["l_orderkey", "l_linestatus"]) \
            .aggregate([("l_orderkey", "count")])
        return g.rename_columns(["l_orderkey", "l_linestatus", "n"])

    li = lineitem.select_columns(
        ["l_orderkey", "l_linestatus", "l_shipdate"]) \
        .map_batches(li_partial, batch_format="pyarrow", batch_size=65536)

    def ord_high(t: pa.Table) -> pa.Table:
        hi_p = pc.is_in(t["o_orderpriority"],
                        value_set=pa.array(["1-URGENT", "2-HIGH"]))
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "is_high": pc.cast(hi_p, pa.int64())})

    ords = orders.select_columns(["o_orderkey", "o_orderpriority"]) \
        .map_batches(ord_high, batch_format="pyarrow")

    j = li.join(ords, join_type="inner", num_partitions=num_partitions,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def split_partial(t: pa.Table) -> pa.Table:
        n = t["n"].combine_chunks().to_numpy().astype(np.int64)
        ih = t["is_high"].combine_chunks().to_numpy().astype(np.int64)
        g = pa.table({"l_linestatus": t["l_linestatus"],
                      "hi": pa.array(n * ih),
                      "lo": pa.array(n * (1 - ih))}) \
            .group_by("l_linestatus").aggregate([("hi", "sum"),
                                                 ("lo", "sum")])
        return g.rename_columns(["l_linestatus", "hi", "lo"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("l_linestatus").aggregate([("hi", "sum"),
                                                  ("lo", "sum")])
        return pa.table({
            "l_linestatus": g["l_linestatus"],
            "high_line_count": pc.cast(g["hi_sum"], pa.int64()),
            "low_line_count": pc.cast(g["lo_sum"], pa.int64()),
        }).sort_by("l_linestatus")

    return single_merge(j.map_batches(split_partial,
                                      batch_format="pyarrow"), merge)


def q20_promo_share_suppliers(lineitem: ray.data.Dataset,
                              part: ray.data.Dataset,
                              supplier: ray.data.Dataset,
                              promo_type: str = "PROMO",
                              num_partitions: int = 8) -> ray.data.Dataset:
    """(s_name, promo_qty, total_qty): TPC-H Q20 shape — suppliers
    whose shipped quantity of ``promo_type`` parts exceeds the GLOBAL
    promo share of shipped quantity, i.e. pq_s / tq_s > PQ / TQ (the
    reference Q20 gates on partsupp availability, absent here; the
    semi-join-chain + per-supplier ratio-HAVING shape is the same,
    and the data-derived threshold stays discriminating at every
    scale).  Quantities are integral in the testdata, summed as exact
    int64; the ratio test is an integer cross-multiply, so the gate
    is order-free.

    Scale plan: lineitem collapses to one (partkey, suppkey) quantity
    partial per block pair before the part join (ships pairs, not
    lineitems); part projects to (partkey, is_promo); per-supplier
    totals go through the bounded partial_groupby_agg exchange
    (output bounded by |supplier|); only ratio-passing suppliers gate
    a supplier-table scan for names — the dim is never shuffled."""
    from ..relational import partial_groupby_agg

    def li_partial(t: pa.Table) -> pa.Table:
        q = np.rint(t["l_quantity"].combine_chunks().to_numpy()) \
            .astype(np.int64)
        g = pa.table({"l_partkey": t["l_partkey"],
                      "l_suppkey": t["l_suppkey"], "qty": pa.array(q)}) \
            .group_by(["l_partkey", "l_suppkey"]).aggregate([("qty", "sum")])
        return g.rename_columns(["l_partkey", "l_suppkey", "qty"])

    li = lineitem.select_columns(
        ["l_partkey", "l_suppkey", "l_quantity"]) \
        .map_batches(li_partial, batch_format="pyarrow", batch_size=65536)

    def part_promo(t: pa.Table) -> pa.Table:
        return pa.table({
            "p_partkey": t["p_partkey"],
            "is_promo": pc.cast(pc.equal(t["p_type"],
                                         pa.scalar(promo_type)),
                                pa.int64())})

    pt = part.select_columns(["p_partkey", "p_type"]) \
        .map_batches(part_promo, batch_format="pyarrow")

    j = li.join(pt, join_type="inner", num_partitions=num_partitions,
                on=("l_partkey",), right_on=("p_partkey",))

    def supp_partial(t: pa.Table) -> pa.Table:
        qty = t["qty"].combine_chunks().to_numpy().astype(np.int64)
        ip = t["is_promo"].combine_chunks().to_numpy().astype(np.int64)
        return pa.table({"l_suppkey": t["l_suppkey"],
                         "pq": pa.array(qty * ip), "tq": pa.array(qty)})

    per_supp = partial_groupby_agg(
        j.map_batches(supp_partial, batch_format="pyarrow"),
        ["l_suppkey"], [("pq", "sum"), ("tq", "sum")])

    def ratio_filter(t: pa.Table) -> pa.Table:
        pq = t["pq_sum"].combine_chunks().to_numpy().astype(np.int64)
        tq = t["tq_sum"].combine_chunks().to_numpy().astype(np.int64)
        gpq, gtq = int(pq.sum()), int(tq.sum())
        # integer cross-multiply: pq_s/tq_s > PQ/TQ exactly (python
        # ints -- pq_s*TQ overflows int64 only past ~9e18 quantity)
        keep = np.array([int(p) * gtq > gpq * int(q)
                         for p, q in zip(pq, tq)], bool)             if len(pq) else np.zeros(0, bool)
        t = t.filter(pa.array(keep))
        return pa.table({"s_suppkey": t["l_suppkey"],
                         "promo_qty": t["pq_sum"],
                         "total_qty": t["tq_sum"]})

    win_ds = single_merge(per_supp, ratio_filter)
    win = win_ds.take_all()                      # bounded by |supplier|
    keys = np.array(sorted(r["s_suppkey"] for r in win), np.int64)
    stats = {r["s_suppkey"]: (r["promo_qty"], r["total_qty"])
             for r in win}

    def pick(t: pa.Table) -> pa.Table:
        sk = t["s_suppkey"].combine_chunks().to_numpy()
        t = t.filter(pa.array(np.isin(sk, keys)))
        sk2 = t["s_suppkey"].combine_chunks().to_numpy()
        return pa.table({
            "s_name": t["s_name"],
            "promo_qty": pa.array(
                np.array([stats[int(s)][0] for s in sk2], np.int64)),
            "total_qty": pa.array(
                np.array([stats[int(s)][1] for s in sk2], np.int64))})

    return supplier.select_columns(["s_suppkey", "s_name"]) \
        .map_batches(pick, batch_format="pyarrow") \
        .sort("s_name")


def q21_waiting_suppliers(lineitem: ray.data.Dataset,
                          orders: ray.data.Dataset,
                          supplier: ray.data.Dataset,
                          late_days: int = 60,
                          num_partitions: int = 8,
                          num_parts: int = 32) -> ray.data.Dataset:
    """(s_name, numwait): TPC-H Q21 shape — for finished orders
    ('F' status) with lineitems from AT LEAST TWO distinct suppliers,
    count per supplier the orders where that supplier was the ONLY
    late one (late = its max shipdate for the order exceeds
    o_orderdate + ``late_days``; the testdata has no commit/receipt
    dates).  The EXISTS + NOT-EXISTS pair of the reference query
    becomes one bounded per-order kernel.

    Scale plan: lineitem collapses to one (orderkey, suppkey, max
    shipdate) row per pair (combiner + bounded exchange) BEFORE the
    orders join; the per-order exists/not-exists evaluation is a
    vectorized lexsort+reduceat kernel inside a hash(orderkey)
    partition (per-order state never leaves one task); per-supplier
    counts ride the bounded partial exchange; only qualifying
    suppkeys gate the supplier-name scan."""
    from ..relational import partial_groupby_agg

    def li_sd(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"], "l_suppkey": t["l_suppkey"],
            "sd": pa.array(t["l_shipdate"].combine_chunks().to_numpy()
                           .astype(np.int64))})

    pairs = partial_groupby_agg(
        lineitem.select_columns(["l_orderkey", "l_suppkey", "l_shipdate"])
        .map_batches(li_sd, batch_format="pyarrow", batch_size=65536),
        ["l_orderkey", "l_suppkey"], [("sd", "max")])

    def ord_f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], pa.scalar("F")))
        od = t["o_orderdate"].combine_chunks().to_numpy().astype(np.int64)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "od": pa.array(od)})

    ords = orders.select_columns(
        ["o_orderkey", "o_orderstatus", "o_orderdate"]) \
        .map_batches(ord_f, batch_format="pyarrow")

    j = pairs.join(ords, join_type="inner", num_partitions=num_partitions,
                   on=("l_orderkey",), right_on=("o_orderkey",))
    late_us = np.int64(late_days) * 86_400_000_000

    def keyed(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].combine_chunks().to_numpy()
        return t.append_column("part",
                               pa.array(hash_part(ok, num_parts)))

    def per_order(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].combine_chunks().to_numpy()
        sk = t["l_suppkey"].combine_chunks().to_numpy()
        late = t["sd_max"].combine_chunks().to_numpy() \
            > t["od"].combine_chunks().to_numpy() + late_us
        o = np.argsort(ok, kind="stable")
        ok, sk, late = ok[o], sk[o], late[o]
        first = np.r_[True, ok[1:] != ok[:-1]]
        starts = np.flatnonzero(first)
        n_supp = np.diff(np.r_[starts, len(ok)])
        n_late = np.add.reduceat(late.astype(np.int64), starts)
        gid = np.cumsum(first) - 1
        keep = late & (n_supp[gid] >= 2) & (n_late[gid] == 1)
        g = pa.table({"sk": pa.array(sk[keep]),
                      "one": pa.array(np.ones(int(keep.sum()), np.int64))}) \
            .group_by("sk").aggregate([("one", "sum")])
        return g.rename_columns(["l_suppkey", "nw"])

    per_supp = partial_groupby_agg(
        j.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda t: per_order(t.drop_columns(["part"])),
                    batch_format="pyarrow"),
        ["l_suppkey"], [("nw", "sum")])

    cnt = per_supp.take_all()                    # bounded by |supplier|
    keys = np.array(sorted(r["l_suppkey"] for r in cnt), np.int64)
    nw_of = {r["l_suppkey"]: r["nw_sum"] for r in cnt}

    def pick(t: pa.Table) -> pa.Table:
        sk = t["s_suppkey"].combine_chunks().to_numpy()
        t = t.filter(pa.array(np.isin(sk, keys)))
        sk2 = t["s_suppkey"].combine_chunks().to_numpy()
        return pa.table({
            "s_name": t["s_name"],
            "numwait": pa.array(
                np.array([nw_of[int(s)] for s in sk2], np.int64))})

    return supplier.select_columns(["s_suppkey", "s_name"]) \
        .map_batches(pick, batch_format="pyarrow") \
        .sort(["numwait", "s_name"], descending=[True, False])


def q2_min_cost_supplier(lineitem: ray.data.Dataset, part: ray.data.Dataset,
                         supplier: ray.data.Dataset,
                         nation: ray.data.Dataset, region: ray.data.Dataset,
                         region_name: str = "EUROPE",
                         sizes: tuple = (5, 15, 25, 35, 45),
                         types: tuple = ("STANDARD", "ECONOMY"),
                         num_partitions: int = 8) -> ray.data.Dataset:
    """(p_partkey, p_brand, s_name, n_name, acctbal_cents, cost_cents):
    TPC-H Q2 shape (correlated min-cost-supplier subquery) with lineitem
    as the part-supplier incidence (testdata has no partsupp): supply
    cost per (part, supplier) = MIN extendedprice in integer cents; for
    each part surviving the size x type cut, emit the ``region_name``
    supplier(s) achieving the per-part minimum (ties all kept).

    Completes the 22/22 TPC-H shape family (Q2 was the last gap).

    Scale plan: nation x region (<=25 rows) broadcast once via
    ``ray.put``; the part filter runs distributed and only the tiny
    survivor (id, brand) projection is broadcast back (bounded by the
    size x type selectivity, ~3%); lineitem drops non-surviving parts
    IN the block combiner so the ONLY fact-scale exchange is the
    bounded (part, supp) min aggregation; supplier is joined, not
    broadcast (it scales with sf), pruned to the region before the
    join; the correlated per-part min + winner filter runs in one
    bounded merge task (input is |surviving parts| x |region suppliers
    per part| partial rows). Costs are integer cents so the min is
    exact on both engine and SQL sides."""
    from ..relational import partial_groupby_agg

    nat_ref = broadcast_table(nation, ["n_nationkey", "n_name", "n_regionkey"])
    reg_ref = broadcast_table(region, ["r_regionkey", "r_name"])
    size_arr = np.array(sizes, np.int64)
    type_arr = list(types)

    def part_filter(t: pa.Table) -> pa.Table:
        sz = t["p_size"].combine_chunks().to_numpy().astype(np.int64)
        keep = np.isin(sz, size_arr) & pc.is_in(
            t["p_type"], value_set=pa.array(type_arr)).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        return t.filter(pa.array(keep)).select(["p_partkey", "p_brand"])

    part_ref = broadcast_table(
        part.select_columns(["p_partkey", "p_brand", "p_type", "p_size"])
        .map_batches(part_filter, batch_format="pyarrow"))

    def li_partial(t: pa.Table) -> pa.Table:
        pids = ray.get(part_ref)["p_partkey"].to_numpy()
        pk = t["l_partkey"].combine_chunks().to_numpy()
        t = t.filter(pa.array(np.isin(pk, pids)))
        cents = round_half_away(
            t["l_extendedprice"].combine_chunks().to_numpy() * 100.0,
            0).astype(np.int64)
        g = pa.table({"l_partkey": t["l_partkey"],
                      "l_suppkey": t["l_suppkey"],
                      "cost": pa.array(cents)}) \
            .group_by(["l_partkey", "l_suppkey"]).aggregate([("cost", "min")])
        return g.rename_columns(["l_partkey", "l_suppkey", "cost"])

    pair_cost = partial_groupby_agg(
        lineitem.select_columns(["l_partkey", "l_suppkey",
                                 "l_extendedprice"])
        .map_batches(li_partial, batch_format="pyarrow", batch_size=65536),
        ["l_partkey", "l_suppkey"], [("cost", "min")])

    def _region_nationkeys() -> np.ndarray:
        nt = ray.get(nat_ref)
        rt = ray.get(reg_ref)
        rk = rt.filter(pc.equal(rt["r_name"], region_name))["r_regionkey"] \
            .to_numpy()
        keep = np.isin(nt["n_regionkey"].to_numpy(), rk)
        return nt["n_nationkey"].to_numpy()[keep]

    def supp_f(t: pa.Table) -> pa.Table:
        keep = np.isin(t["s_nationkey"].combine_chunks().to_numpy()
                       .astype(np.int64), _region_nationkeys())
        return t.filter(pa.array(keep))

    supp = supplier.select_columns(
        ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]) \
        .map_batches(supp_f, batch_format="pyarrow")

    # attach supplier attrs via a union-tag hash co-partition, NOT
    # Dataset.join: the shuffle-join aggregator chokes when the pruned
    # supplier side leaves a partition with only canonicalized zero-row
    # shards (same Ray 2.49 failure family as the way_triangles
    # deadlock), and the co-partition kernel is the repo's standard
    # join shape anyway — one hash exchange either way.
    def tag_pair(t: pa.Table) -> pa.Table:
        sk = t["l_suppkey"].combine_chunks().to_numpy()
        return pa.table({
            "l_partkey": t["l_partkey"], "l_suppkey": t["l_suppkey"],
            "cost": pc.cast(t["cost_min"], pa.int64()),
            "s_name": pa.nulls(len(sk), pa.string()),
            "s_nationkey": pa.nulls(len(sk), pa.int64()),
            "s_acctbal": pa.nulls(len(sk), pa.float64()),
            "_is_s": pa.array(np.zeros(len(sk), bool)),
            "part": pa.array(hash_part(sk, num_partitions))})

    def tag_supp(t: pa.Table) -> pa.Table:
        sk = t["s_suppkey"].combine_chunks().to_numpy()
        return pa.table({
            "l_partkey": pa.nulls(len(sk), pa.int64()),
            "l_suppkey": pa.array(sk),
            "cost": pa.nulls(len(sk), pa.int64()),
            "s_name": t["s_name"],
            "s_nationkey": pc.cast(t["s_nationkey"], pa.int64()),
            "s_acctbal": t["s_acctbal"],
            "_is_s": pa.array(np.ones(len(sk), bool)),
            "part": pa.array(hash_part(sk, num_partitions))})

    def attach(t: pa.Table) -> pa.Table:
        is_s = t["_is_s"].combine_chunks().to_numpy(zero_copy_only=False)
        st = t.filter(pa.array(is_s))
        et = t.filter(pa.array(~is_s))
        sv = st["l_suppkey"].combine_chunks().to_numpy()
        order = np.argsort(sv)
        sv = sv[order]
        ek = et["l_suppkey"].combine_chunks().to_numpy()
        idx = np.searchsorted(sv, ek)
        ok = (idx < len(sv))
        ok[ok] &= sv[idx[ok]] == ek[ok]  # inner: region suppliers only
        et = et.filter(pa.array(ok))
        pick = pa.array(order[idx[ok]])
        return pa.table({
            "l_partkey": et["l_partkey"], "l_suppkey": et["l_suppkey"],
            "cost_min": et["cost"],
            "s_name": st["s_name"].combine_chunks().take(pick),
            "s_nationkey": st["s_nationkey"].combine_chunks().take(pick),
            "s_acctbal": st["s_acctbal"].combine_chunks().take(pick)})

    j = pair_cost.map_batches(tag_pair, batch_format="pyarrow") \
        .union(supp.map_batches(tag_supp, batch_format="pyarrow")) \
        .groupby("part") \
        .map_groups(lambda t: attach(t.drop_columns(["part"])),
                    batch_format="pyarrow")

    def winners(t: pa.Table) -> pa.Table:
        nt = ray.get(nat_ref)
        pt = ray.get(part_ref)
        name_of = dict(zip(nt["n_nationkey"].to_numpy().astype(np.int64),
                           nt["n_name"].to_pylist()))
        brand_of = dict(zip(pt["p_partkey"].to_numpy(),
                            pt["p_brand"].to_pylist()))
        pk = t["l_partkey"].combine_chunks().to_numpy()
        cost = t["cost_min"].combine_chunks().to_numpy()
        if not len(pk):
            return pa.table({
                "p_partkey": pa.array([], pa.int64()),
                "p_brand": pa.array([], pa.string()),
                "s_name": pa.array([], pa.string()),
                "n_name": pa.array([], pa.string()),
                "acctbal_cents": pa.array([], pa.int64()),
                "cost_cents": pa.array([], pa.int64())})
        # correlated min: per-part minimum via lexsort + reduceat
        order = np.lexsort((cost, pk))
        pk_s, cost_s = pk[order], cost[order]
        starts = np.flatnonzero(np.r_[True, pk_s[1:] != pk_s[:-1]])
        pmin = dict(zip(pk_s[starts], cost_s[starts]))
        win = cost == np.array([pmin[p] for p in pk], np.int64)
        t = t.filter(pa.array(win))
        pk = pk[win]
        nk = t["s_nationkey"].combine_chunks().to_numpy().astype(np.int64)
        ab = round_half_away(
            t["s_acctbal"].combine_chunks().to_numpy() * 100.0,
            0).astype(np.int64)
        return pa.table({
            "p_partkey": pa.array(pk),
            "p_brand": pa.array([brand_of[int(p)] for p in pk],
                                pa.string()),
            "s_name": t["s_name"],
            "n_name": pa.array([name_of[int(n)] for n in nk], pa.string()),
            "acctbal_cents": pa.array(ab),
            "cost_cents": pc.cast(t["cost_min"], pa.int64())})

    return single_merge(j, winners)


def events_dedup_window(events: ray.data.Dataset, window_s: int = 86400,
                        num_parts: int = 16) -> ray.data.Dataset:
    """(event_id, user_id, event_type, ts, gap_s): debounce dedup — an
    event is kept iff it is the first of its (user, type) stream or at
    least ``window_s`` seconds after the PREVIOUS event of the same
    (user, type) (lag semantics: the previous event whether or not it
    was itself kept), the duplicate-burst suppressor of an ingestion
    pipeline.  ``gap_s`` is the whole-second gap to that previous event
    (-1 for stream heads).

    Distributed plan (the sessionize shape): ONE bounded user-hash
    exchange co-locates each user's rows, the per-partition kernel is a
    vectorized lexsort (user, type, ts, id) + adjacent diff — no
    per-event python, no global sort.  Ties (identical ts) order by
    event_id, so the keep set is deterministic and the SQL lag mirror
    is exact."""
    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(uid, num_parts)))

    def per_partition(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        eid = t["event_id"].combine_chunks().to_numpy()
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy().astype(np.int64)
        order = np.lexsort((eid, ts, codes, uid))
        u, c, s = uid[order], codes[order], ts[order]
        head = np.r_[True, (u[1:] != u[:-1]) | (c[1:] != c[:-1])]
        gap = np.empty(len(s), np.int64)
        gap[head] = -1
        if len(s) > 1:
            later = ~head
            gap[later] = (s[1:][later[1:]] - s[:-1][later[1:]]) // 1_000_000
        keep = head | (gap >= window_s)
        sel = order[keep]
        return pa.table({
            "event_id": t["event_id"].take(pa.array(sel)),
            "user_id": t["user_id"].take(pa.array(sel)),
            "event_type": t["event_type"].take(pa.array(sel)),
            "ts": t["ts"].take(pa.array(sel)),
            "gap_s": pa.array(gap[keep], pa.int64())})

    return events.map_batches(add_part, batch_format="pyarrow",
                              batch_size=65536) \
        .groupby("part") \
        .map_groups(lambda t: per_partition(t.drop_columns(["part"])),
                    batch_format="pyarrow")


def events_zscore(events: ray.data.Dataset, out_z: float = 3.0,
                  nd: int = 6) -> ray.data.Dataset:
    """(event_id, event_type, z6, is_outlier): every event's value
    standardized against its own type's corpus mean/std (sample) — the
    two-pass normalize + outlier-flag transform of a feature pipeline.
    The threshold applies to the ROUNDED z (repo convention), so the
    flag is oracle-exact; std == 0 (constant series) defines z = 0.

    Scale plan: pass 1 collapses each block to per-type (n, sum,
    sum-of-squares) moment partials (bounded by |types|), merged in one
    guarded task and broadcast back via ``ray.put``; pass 2 is an
    embarrassingly-parallel row map.  The data crosses no exchange —
    the stats table does, once, at |types| rows."""
    from ..relational import single_merge
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].combine_chunks().to_numpy()
        g = pa.table({"event_type": t["event_type"],
                      "v": pa.array(v), "vv": pa.array(v * v),
                      "n": pa.array(np.ones(len(v), np.int64))}) \
            .group_by("event_type") \
            .aggregate([("v", "sum"), ("vv", "sum"), ("n", "sum")])
        return g.rename_columns(["event_type", "sv", "svv", "pn"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate(
            [("sv", "sum"), ("svv", "sum"), ("pn", "sum")])
        n = g["pn_sum"].combine_chunks().to_numpy().astype(np.float64)
        sv = g["sv_sum"].combine_chunks().to_numpy()
        svv = g["svv_sum"].combine_chunks().to_numpy()
        mean = sv / n
        var = np.maximum((svv - n * mean * mean)
                         / np.maximum(n - 1.0, 1.0), 0.0)
        return pa.table({"event_type": g["event_type"],
                         "mean": pa.array(mean),
                         "sd": pa.array(np.sqrt(var))})

    stats = pa.concat_tables(
        [b.replace_schema_metadata(None) for b in ray.get(
            single_merge(events.map_batches(
                partial, batch_format="pyarrow", batch_size=65536),
                merge).to_arrow_refs()) if b.num_rows])
    stats_ref = ray.put(stats.combine_chunks())

    def zmap(t: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        names = np.asarray(st["event_type"].to_pylist())
        order = np.argsort(names)
        names = names[order]
        mean = st["mean"].to_numpy()[order]
        sd = st["sd"].to_numpy()[order]
        et = t["event_type"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        i = np.searchsorted(names, et)
        v = t["value"].combine_chunks().to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(sd[i] > 0.0, (v - mean[i]) / sd[i], 0.0)
        z6 = round_half_away(z, nd)
        return pa.table({
            "event_id": t["event_id"], "event_type": t["event_type"],
            "z6": pa.array(z6, pa.float64()),
            "is_outlier": pa.array(np.abs(z6) > out_z)})

    return events.map_batches(zmap, batch_format="pyarrow",
                              batch_size=65536)


def events_trend(events: ray.data.Dataset, epoch_day0: str = "1995-01-01",
                 nd: int = 6, nd_i: int = 4) -> ray.data.Dataset:
    """(event_type, n, slope6, intercept4): per-type OLS regression of
    event value on event DAY (days since ``epoch_day0`` — a small
    abscissa on purpose: raw epoch-microsecond moments would lose the
    variance to catastrophic cancellation in float64) — the trend
    monitor of a metrics pipeline.

    Scale plan: one pass of per-block (n, Σx, Σy, Σxy, Σxx) moment
    partials bounded by |types|, one guarded merge task computes the
    closed-form slope/intercept.  No exchange touches the event
    stream.  SQL mirror: regr_slope over the same day abscissa.
    The intercept extrapolates to day 0 (|x̄| ~ 1e4 amplifies the
    ~1e-12 association drift to ~1e-8), so it rounds at 4 dp where
    the slope holds 6."""
    from ..relational import single_merge
    from ..util import round_half_away

    t0 = np.datetime64(epoch_day0, "D").astype(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        x = (t["ts"].combine_chunks().to_numpy()
             .astype("datetime64[D]").astype(np.int64) - t0) \
            .astype(np.float64)
        y = t["value"].combine_chunks().to_numpy()
        g = pa.table({"event_type": t["event_type"],
                      "sx": pa.array(x), "sy": pa.array(y),
                      "sxy": pa.array(x * y), "sxx": pa.array(x * x),
                      "n": pa.array(np.ones(len(x), np.int64))}) \
            .group_by("event_type") \
            .aggregate([("sx", "sum"), ("sy", "sum"), ("sxy", "sum"),
                        ("sxx", "sum"), ("n", "sum")])
        return g.rename_columns(
            ["event_type", "sx", "sy", "sxy", "sxx", "pn"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate(
            [("sx", "sum"), ("sy", "sum"), ("sxy", "sum"),
             ("sxx", "sum"), ("pn", "sum")])
        n = g["pn_sum"].combine_chunks().to_numpy().astype(np.float64)
        sx = g["sx_sum"].combine_chunks().to_numpy()
        sy = g["sy_sum"].combine_chunks().to_numpy()
        sxy = g["sxy_sum"].combine_chunks().to_numpy()
        sxx = g["sxx_sum"].combine_chunks().to_numpy()
        den = sxx - sx * sx / n
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = np.where(den > 0.0, (sxy - sx * sy / n) / den, 0.0)
        intercept = sy / n - slope * (sx / n)
        names = g["event_type"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        order = np.argsort(names)
        return pa.table({
            "event_type": pa.array(names[order]),
            "n": pa.array(n[order].astype(np.int64)),
            "slope6": pa.array(round_half_away(slope[order], nd),
                               pa.float64()),
            "intercept4": pa.array(round_half_away(intercept[order],
                                                   nd_i),
                                   pa.float64())})

    return single_merge(events.map_batches(
        partial, batch_format="pyarrow", batch_size=65536), merge)


def events_moving_avg(events: ray.data.Dataset, window_days: int = 7,
                      nd: int = 6) -> ray.data.Dataset:
    """(event_type, day, n, ma6): per-type daily event volume with its
    ``window_days``-day TRAILING moving average — a calendar RANGE
    frame (days with zero events contribute no row, so the mean is
    over the PRESENT days inside the range, exactly SQL's ``RANGE
    BETWEEN INTERVAL (w-1) DAYS PRECEDING AND CURRENT ROW``) — the
    smoothing window of a metrics dashboard.

    Scale plan: blocks collapse to (type, day) partial counts (bounded
    by types x days), ONE guarded merge task runs the window: per type
    the day-sorted counts take a two-pointer prefix-sum pass — O(rows)
    — never a per-row rescan.  The event stream crosses no exchange."""
    from ..relational import single_merge
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        day = t["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[D]").astype("datetime64[us]")
        g = pa.table({"event_type": t["event_type"],
                      "day": pa.array(day)}) \
            .group_by(["event_type", "day"]).aggregate([("day", "count")])
        return g.rename_columns(["event_type", "day", "pn"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "day"]).aggregate([("pn", "sum")])
        et = g["event_type"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        day = g["day"].combine_chunks().to_numpy()
        n = g["pn_sum"].combine_chunks().to_numpy().astype(np.int64)
        d_i = day.astype("datetime64[D]").astype(np.int64)
        _, code = np.unique(et, return_inverse=True)
        order = np.lexsort((d_i, code))
        et, day, n, d_i, code = (et[order], day[order], n[order],
                                 d_i[order], code[order])
        ps = np.concatenate([[0], np.cumsum(n)]).astype(np.float64)
        # two-pointer: first index of the same type with
        # day > current_day - window  ->  searchsorted per type slice
        ma = np.empty(len(n), np.float64)
        starts = np.flatnonzero(np.r_[True, code[1:] != code[:-1]]) \
            if len(n) else np.empty(0, np.int64)
        ends = np.r_[starts[1:], len(n)] if len(n) \
            else np.empty(0, np.int64)
        for s, e in zip(starts, ends):
            lo = s + np.searchsorted(d_i[s:e],
                                     d_i[s:e] - (window_days - 1))
            idx = np.arange(s, e)
            ma[s:e] = (ps[idx + 1] - ps[lo]) / (idx - lo + 1.0)
        return pa.table({
            "event_type": pa.array(et), "day": pa.array(day),
            "n": pa.array(n),
            "ma6": pa.array(round_half_away(ma, nd), pa.float64())})

    return single_merge(events.map_batches(
        partial, batch_format="pyarrow", batch_size=65536), merge)


def kmv_overlap(events: ray.data.Dataset, k: int = 64,
                nd: int = 6) -> ray.data.Dataset:
    """(type_a, type_b, kk, est_jac6, est_union3, est_inter3): pairwise
    audience overlap between event types ESTIMATED from k-minimum-value
    sketches — the mergeable-synopsis alternative to audience_overlap's
    exact B^T B incidence when the user universe no longer fits an
    exchange.  Standard KMV set algebra on md5_num_lower(user_id):
    per type the k smallest distinct user hashes; per pair the kk = 
    min(k, |union seen|) smallest of the sketch union with threshold
    tau = kk-th value; est_union = (kk-1) / (tau / 2^64),
    est_jac = |{h in U_kk : h in both sketches}| / kk,
    est_inter = est_jac * est_union.  Every float op is a ratio of
    exact integers evaluated in one fixed order, so the scalar oracle
    reproduces the estimates bit-for-bit.

    Scale plan: blocks collapse to per-type bottom-k partials over
    block-distinct users (bounded by types x k per block — the sketch
    property), ONE guarded merge task unions partials per type and
    runs the bounded t^2/2 pair algebra.  The event stream crosses no
    exchange."""
    from ..relational import single_merge
    from ..util import md5_num_lower, round_half_away

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = np.asarray(et.indices, np.int64)
        h = md5_num_lower(uid)
        order = np.lexsort((h, codes))
        c_s, h_s = codes[order], h[order]
        first = np.r_[True, (c_s[1:] != c_s[:-1]) | (h_s[1:] != h_s[:-1])]
        c_s, h_s = c_s[first], h_s[first]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]]) \
            if len(c_s) else np.empty(0, np.int64)
        counts = np.diff(np.r_[starts, len(c_s)]) if len(c_s) \
            else np.empty(0, np.int64)
        rank = np.arange(len(c_s)) - np.repeat(starts, counts)
        keep = rank < k
        return pa.table({
            "event_type": et.dictionary.take(pa.array(c_s[keep])),
            "h": pa.array(h_s[keep].astype(np.int64))})  # bit-cast u64

    def merge(t: pa.Table) -> pa.Table:
        et = t["event_type"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        h = t["h"].combine_chunks().to_numpy().astype(np.uint64)
        names = np.unique(et)
        sk = {}
        for nm in names:
            hs = np.unique(h[et == nm])  # sorted distinct
            sk[nm] = hs[:k]
        rows = []
        two64 = 18446744073709551616.0
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                a, b = sk[names[i]], sk[names[j]]
                u = np.unique(np.concatenate([a, b]))
                kk = min(k, len(u))
                ukk = u[:kk]
                tau = float(ukk[-1])
                inboth = np.isin(ukk, a) & np.isin(ukk, b)
                jac = float(inboth.sum()) / kk
                est_union = (kk - 1.0) / (tau / two64) if kk > 1 else 0.0
                rows.append((names[i], names[j], kk, jac,
                             est_union, jac * est_union))
        return pa.table({
            "type_a": pa.array([r[0] for r in rows], pa.string()),
            "type_b": pa.array([r[1] for r in rows], pa.string()),
            "kk": pa.array([r[2] for r in rows], pa.int64()),
            "est_jac6": pa.array(round_half_away(
                np.array([r[3] for r in rows], np.float64), nd),
                pa.float64()),
            "est_union3": pa.array(round_half_away(
                np.array([r[4] for r in rows], np.float64), 3),
                pa.float64()),
            "est_inter3": pa.array(round_half_away(
                np.array([r[5] for r in rows], np.float64), 3),
                pa.float64())})

    return single_merge(
        events.select_columns(["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        merge)


def customer_abc(orders: ray.data.Dataset, a_pct: int = 80,
                 b_pct: int = 95, nd: int = 6,
                 num_buckets: int = 4096) -> ray.data.Dataset:
    """(abc_class, n_customers, revenue_cents, share6): ABC / Lorenz
    classification — customers ranked by revenue (integer cents,
    DESC, custkey ties ASC), class A while the cumulative share BEFORE
    the customer is < a_pct%, B while < b_pct%, else C; the inventory
    80/15/5 analysis.  All class boundaries are integer comparisons
    (100 * cum_before < pct * total), so the result is exact.

    Scale plan (NO global sort): (1) per-customer cents via ONE bounded
    hash exchange; the bounded revenue table materializes once and is
    the only thing re-read.  (2) a driver-bounded stats row (total,
    max) and a uniform ``num_buckets`` value histogram of (count, sum)
    partials locate the buckets where the cumulative weight crosses
    each pct; (3) only those buckets' members (expected n/num_buckets
    rows; recurse/refine if a bucket ever exceeds a cap at real scale)
    plus the next lower nonempty bucket reach the driver, which finds
    the exact crossing (rc, custkey) threshold pair; (4) the classify
    pass broadcasts the two threshold pairs, compares lexicographically
    (rank never materializes), and collapses to 3 partial rows per
    block.  The fact table is touched once, the revenue table thrice,
    each time streaming."""
    from ..relational import partial_groupby_agg, single_merge
    from ..util import round_half_away

    def o_partial(t: pa.Table) -> pa.Table:
        rc = round_half_away(
            t["o_totalprice"].combine_chunks().to_numpy() * 100.0,
            0).astype(np.int64)
        g = pa.table({"c": t["o_custkey"], "rc": pa.array(rc)}) \
            .group_by("c").aggregate([("rc", "sum")])
        return g.rename_columns(["c", "rc"])

    rev = partial_groupby_agg(
        orders.select_columns(["o_custkey", "o_totalprice"])
        .map_batches(o_partial, batch_format="pyarrow",
                     batch_size=65536),
        ["c"], [("rc", "sum")]).materialize()  # (c, rc_sum) bounded

    # ---- driver-bounded stats: total + max --------------------------
    def s_partial(t: pa.Table) -> pa.Table:
        rc = t["rc_sum"].combine_chunks().to_numpy()
        return pa.table({"tot": pa.array([int(rc.sum())], pa.int64()),
                         "mx": pa.array([int(rc.max()) if len(rc)
                                         else 0], pa.int64())})

    st = single_merge(
        rev.map_batches(s_partial, batch_format="pyarrow"),
        lambda t: pa.table({
            "tot": pa.array([int(t["tot"].combine_chunks().to_numpy()
                                 .sum())], pa.int64()),
            "mx": pa.array([int(t["mx"].combine_chunks().to_numpy()
                                .max())], pa.int64())})).take_all()
    tot, mx = int(st[0]["tot"]), int(st[0]["mx"])

    def bucket_of(rc: np.ndarray) -> np.ndarray:
        return np.minimum(rc * np.int64(num_buckets) // np.int64(mx + 1),
                          np.int64(num_buckets - 1))

    # ---- histogram of (count, weight) per value bucket ---------------
    def h_partial(t: pa.Table) -> pa.Table:
        rc = t["rc_sum"].combine_chunks().to_numpy()
        g = pa.table({"b": pa.array(bucket_of(rc)),
                      "n": pa.array(np.ones(len(rc), np.int64)),
                      "s": pa.array(rc)}) \
            .group_by("b").aggregate([("n", "sum"), ("s", "sum")])
        return g.rename_columns(["b", "n", "s"])

    hist = single_merge(
        rev.map_batches(h_partial, batch_format="pyarrow"),
        lambda t: t.group_by("b").aggregate([("n", "sum"),
                                             ("s", "sum")])).take_all()
    hb = np.array([r["b"] for r in hist], np.int64)
    hs = np.array([r["s_sum"] for r in hist], np.int64)
    order = np.argsort(-hb)  # descending revenue buckets
    hb, hs = hb[order], hs[order]
    cum_incl = np.cumsum(hs)

    def crossing_buckets(pct: int) -> list[int]:
        """Bucket holding the crossing + the next lower nonempty one."""
        thr = pct * tot  # compare against 100 * cum
        i = int(np.searchsorted(100 * cum_incl, thr, side="left"))
        if i >= len(hb):
            return []
        picks = [int(hb[i])]
        if i + 1 < len(hb):
            picks.append(int(hb[i + 1]))
        return picks

    need = sorted(set(crossing_buckets(a_pct) + crossing_buckets(b_pct)))
    need_arr = np.array(need, np.int64)

    def member_filter(t: pa.Table) -> pa.Table:
        rc = t["rc_sum"].combine_chunks().to_numpy()
        return t.filter(pa.array(np.isin(bucket_of(rc), need_arr)))

    mem = pa.concat_tables(
        [b.replace_schema_metadata(None) for b in ray.get(
            rev.map_batches(member_filter, batch_format="pyarrow")
            .to_arrow_refs()) if b.num_rows])
    mc = mem["c"].to_numpy() if mem.num_rows else np.empty(0, np.int64)
    mr = mem["rc_sum"].to_numpy() if mem.num_rows \
        else np.empty(0, np.int64)
    morder = np.lexsort((mc, -mr))
    mc, mr = mc[morder], mr[morder]

    def threshold(pct: int):
        """(rc, c) of the FIRST customer whose cum_before >= pct% —
        the first NON-member of the class; None if the class holds
        everyone."""
        thr = pct * tot
        i = int(np.searchsorted(100 * cum_incl, thr, side="left"))
        if i >= len(hb):
            return None
        cum_above = int(cum_incl[i - 1]) if i > 0 else 0
        sel = bucket_of(mr) <= hb[i]  # crossing bucket + lower members
        run = cum_above
        for rc_v, c_v in zip(mr[sel], mc[sel]):
            if 100 * run >= thr:
                return (int(rc_v), int(c_v))
            run += int(rc_v)
        return None

    thr_a, thr_b = threshold(a_pct), threshold(b_pct)
    thr_ref = ray.put((thr_a, thr_b))

    def before(rc: np.ndarray, c: np.ndarray, thr) -> np.ndarray:
        if thr is None:
            return np.ones(len(rc), bool)
        return (rc > thr[0]) | ((rc == thr[0]) & (c < thr[1]))

    def classify(t: pa.Table) -> pa.Table:
        ta, tb = ray.get(thr_ref)
        rc = t["rc_sum"].combine_chunks().to_numpy()
        c = t["c"].combine_chunks().to_numpy()
        is_a = before(rc, c, ta)
        is_b = ~is_a & before(rc, c, tb)
        cls = np.where(is_a, "A", np.where(is_b, "B", "C"))
        g = pa.table({"abc_class": pa.array(cls),
                      "n": pa.array(np.ones(len(rc), np.int64)),
                      "s": pa.array(rc)}) \
            .group_by("abc_class").aggregate([("n", "sum"), ("s", "sum")])
        return g.rename_columns(["abc_class", "n", "s"])

    def final(t: pa.Table) -> pa.Table:
        g = t.group_by("abc_class").aggregate([("n", "sum"),
                                               ("s", "sum")])
        cls = g["abc_class"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        n = g["n_sum"].combine_chunks().to_numpy()
        s = g["s_sum"].combine_chunks().to_numpy()
        order2 = np.argsort(cls)
        return pa.table({
            "abc_class": pa.array(cls[order2]),
            "n_customers": pa.array(n[order2].astype(np.int64)),
            "revenue_cents": pa.array(s[order2].astype(np.int64)),
            "share6": pa.array(round_half_away(
                s[order2] / float(tot), nd), pa.float64())})

    return single_merge(rev.map_batches(classify,
                                        batch_format="pyarrow"), final)


def events_peak_rate(events: ray.data.Dataset, window_s: int = 3600,
                     num_parts: int = 16) -> ray.data.Dataset:
    """(user_id, peak_n): the maximum number of events a user fires in
    ANY sliding window of ``window_s`` seconds (inclusive bounds
    [t, t + window_s]) — the exact peak-rate / burst-ceiling statistic
    rate-limiter sizing needs.  Exact because every window worth
    checking starts at an event.

    Scale plan: ONE bounded user-hash exchange; the per-partition
    kernel lexsorts (user, ts) once and answers every window with two
    global searchsorteds over a composite key (per-user-disjoint
    offsets keep the piecewise-sorted ts array binary-searchable in
    one shot — no per-user loop, no self-join).  SQL mirror is the
    quadratic self-join; the engine is O(n log n) per partition."""
    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(uid, num_parts)))

    w_us = np.int64(window_s) * 1_000_000

    def per_partition(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        if not len(uid):
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "peak_n": pa.array([], pa.int64())})
        order = np.lexsort((ts, uid))
        u, ts = uid[order], ts[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        starts = np.flatnonzero(new_user)
        n_users = len(starts)
        # composite key: each user's NORMALIZED ts block shifted into a
        # disjoint range wider than per-user-span+window, so one
        # searchsorted never crosses a user boundary
        uidx = np.cumsum(new_user) - 1
        base = ts - np.repeat(ts[starts], np.diff(np.r_[starts, len(u)]))
        stride = np.int64(base.max()) + w_us + 2
        if stride * np.int64(n_users) < np.iinfo(np.int64).max // 2:
            key = base + uidx * stride
            ub = np.searchsorted(key, key + w_us, side="right")
            lb = np.searchsorted(key, key, side="left")  # dup-ts anchors
            counts = (ub - lb).astype(np.int64)
            peak = np.maximum.reduceat(counts, starts)
        else:
            # overflow-proof fallback (gigantic per-user spans x many
            # users in one partition): per-segment searchsorted — raise
            # num_parts instead of hitting this at scale
            ends = np.r_[starts[1:], len(u)]
            peak = np.empty(n_users, np.int64)
            for k in range(n_users):
                seg = ts[starts[k]:ends[k]]
                peak[k] = int(np.max(
                    np.searchsorted(seg, seg + w_us, side="right")
                    - np.searchsorted(seg, seg, side="left")))
        return pa.table({"user_id": pa.array(u[starts]),
                         "peak_n": pa.array(peak, pa.int64())})

    return (events.select_columns(["user_id", "ts"])
            .map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(per_partition, batch_format="pyarrow"))


def events_burstiness(events: ray.data.Dataset, nd: int = 6,
                      num_parts: int = 16) -> ray.data.Dataset:
    """(user_id, n_gaps, burst6): Goh–Barabási burstiness of each
    user's inter-event gap sequence, B = (sigma - mu) / (sigma + mu)
    with the SAMPLE stddev (ddof=1, matching SQL stddev_samp); users
    need >= 2 gaps (3 events).  B -> -1 periodic, 0 Poisson, -> 1
    bursty — the standard temporal-regularity feature for bot / alert
    triage.

    Scale plan: the same single user-hash exchange as sessionize; the
    kernel computes per-user gap sums S1/S2 via reduceat (exact
    integer microseconds) and only converts to float for the final
    mu/sigma, rounded at ``nd`` so the SQL window mirror agrees."""
    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(uid, num_parts)))

    def per_partition(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        order = np.lexsort((ts, uid))
        u, ts = uid[order], ts[order]
        same = np.r_[False, u[1:] == u[:-1]]
        gap_s = np.where(same, np.r_[np.int64(0), ts[1:] - ts[:-1]], 0) \
            / 1e6  # seconds, float64
        new_user = np.r_[True, ~same[1:]]
        starts = np.flatnonzero(new_user)
        n = np.add.reduceat(same.astype(np.int64), starts)
        s1 = np.add.reduceat(gap_s, starts)
        s2 = np.add.reduceat(gap_s * gap_s, starts)
        keep = n >= 2
        n, s1, s2 = n[keep], s1[keep], s2[keep]
        mu = s1 / n
        var = (s2 - s1 * s1 / n) / (n - 1)
        sigma = np.sqrt(np.maximum(var, 0.0))
        burst = np.where(sigma + mu > 0, (sigma - mu) / (sigma + mu), 0.0)
        return pa.table({
            "user_id": pa.array(u[starts][keep]),
            "n_gaps": pa.array(n, pa.int64()),
            "burst6": pa.array(round_half_away(burst, nd), pa.float64())})

    return (events.select_columns(["user_id", "ts"])
            .map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(per_partition, batch_format="pyarrow"))


def events_autocorr(events: ray.data.Dataset, nd: int = 6,
                    num_parts: int = 8) -> ray.data.Dataset:
    """(event_type, n_pairs, r1_6): lag-1 autocorrelation of each
    type's DAILY event-count series over the global calendar span
    (absent days count 0) — the seasonality/trend-memory screen.

    Scale plan: one combiner exchange collapses events to (type, day)
    integer counts — bounded by types x days, never events — and the
    single bounded final task densifies each type over the global
    [min_day, max_day] range and evaluates the textbook correlation
    from EXACT int64 moment sums (counts are integers), so the only
    float is the last ratio; 6 dp absorbs DuckDB corr()'s streaming
    accumulation."""
    from ..relational import partial_groupby_agg, single_merge

    def day_partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        g = pa.table({"event_type": t["event_type"].combine_chunks(),
                      "day": pa.array(ts // 86_400_000_000),
                      "n": pa.array(np.ones(len(ts), np.int64))}) \
            .group_by(["event_type", "day"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "day", "n"])

    counts = partial_groupby_agg(
        events.select_columns(["event_type", "ts"])
        .map_batches(day_partial, batch_format="pyarrow",
                     batch_size=65536),
        ["event_type", "day"], [("n", "sum")], num_parts=num_parts)

    def final(t: pa.Table) -> pa.Table:
        ty = np.asarray(t["event_type"].combine_chunks().to_pylist(),
                        dtype=object)
        day = t["day"].combine_chunks().to_numpy()
        n = t["n_sum"].combine_chunks().to_numpy()
        if not len(day):
            return pa.table({"event_type": pa.array([], pa.string()),
                             "n_pairs": pa.array([], pa.int64()),
                             "r1_6": pa.array([], pa.float64())})
        lo, hi = int(day.min()), int(day.max())
        m = hi - lo + 1
        out_t, out_n, out_r = [], [], []
        for tv in sorted(set(ty)):
            x = np.zeros(m, np.int64)
            sel = ty == tv
            x[day[sel] - lo] = n[sel]
            a, b = x[:-1], x[1:]
            npairs = m - 1
            sa, sb = int(a.sum()), int(b.sum())
            saa = int((a * a).sum())
            sbb = int((b * b).sum())
            sab = int((a * b).sum())
            num = npairs * sab - sa * sb
            den = (npairs * saa - sa * sa) * (npairs * sbb - sb * sb)
            r = num / np.sqrt(float(den)) if den > 0 else 0.0
            out_t.append(tv)
            out_n.append(npairs)
            out_r.append(float(round_half_away(np.float64(r), nd)))
        return pa.table({"event_type": pa.array(out_t, pa.string()),
                         "n_pairs": pa.array(out_n, pa.int64()),
                         "r1_6": pa.array(out_r, pa.float64())})

    return single_merge(counts, final)


def order_fulfillment_lag(lineitem: ray.data.Dataset,
                          orders: ray.data.Dataset,
                          num_partitions: int = 8,
                          num_parts: int = 32) -> ray.data.Dataset:
    """(o_orderpriority, lag_days, n_orders): fulfillment-lag
    distribution — per order, the whole-day gap between order date and
    its LAST lineitem shipment, histogrammed by priority.  The
    logistics SLA panel.  All integer day arithmetic (epoch floor
    division), so the histogram is exact.

    Scale plan: lineitem collapses to one (orderkey, max shipdate) row
    per key BEFORE the join (block combiner + bounded exchange, the
    q4 shape); the join ships one row per order; the histogram is a
    (priority x lag) bounded combine."""
    from ..relational import partial_groupby_agg

    def li_sd(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "sd": pa.array(t["l_shipdate"].combine_chunks().to_numpy()
                           .astype(np.int64))})

    li = partial_groupby_agg(
        lineitem.select_columns(["l_orderkey", "l_shipdate"])
        .map_batches(li_sd, batch_format="pyarrow", batch_size=65536),
        ["l_orderkey"], [("sd", "max")])

    def ord_pre(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].combine_chunks().to_numpy().astype(np.int64)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "od": pa.array(od),
                         "o_orderpriority": t["o_orderpriority"]})

    ords = orders.select_columns(
        ["o_orderkey", "o_orderdate", "o_orderpriority"]) \
        .map_batches(ord_pre, batch_format="pyarrow")
    j = ords.join(li, join_type="inner", num_partitions=num_partitions,
                  on=("o_orderkey",), right_on=("l_orderkey",))

    def lag_partial(t: pa.Table) -> pa.Table:
        sd = t["sd_max"].combine_chunks().to_numpy()
        od = t["od"].combine_chunks().to_numpy()
        lag = sd // 86_400_000_000 - od // 86_400_000_000
        g = pa.table({"o_orderpriority":
                      t["o_orderpriority"].combine_chunks(),
                      "lag_days": pa.array(lag),
                      "n": pa.array(np.ones(len(lag), np.int64))}) \
            .group_by(["o_orderpriority", "lag_days"]) \
            .aggregate([("n", "sum")])
        return g.rename_columns(["o_orderpriority", "lag_days", "n"])

    g = partial_groupby_agg(
        j.map_batches(lag_partial, batch_format="pyarrow"),
        ["o_orderpriority", "lag_days"], [("n", "sum")],
        num_parts=num_parts)
    return g.map_batches(
        lambda t: t.rename_columns(["o_orderpriority", "lag_days",
                                    "n_orders"]),
        batch_format="pyarrow")


def user_transition_entropy(events: ray.data.Dataset, nd: int = 6,
                            num_parts: int = 16) -> ray.data.Dataset:
    """(user_id, n_trans, h6): Shannon entropy (nats) of each user's
    event-type TRANSITION distribution, ordered by (ts, event_id) —
    the per-user behavioral-predictability feature (bots repeat one
    transition, H -> 0; erratic users approach ln(K^2)).

    Scale plan: ONE user-hash exchange; the kernel factorizes types
    once per partition, builds composite (user, from, to) keys, counts
    via np.unique and folds each user's -sum(p ln p) with reduceat —
    no per-user loop, no second exchange."""
    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(uid, num_parts)))

    def per_partition(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        eid = t["event_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        ty = np.asarray(t["event_type"].combine_chunks().to_pylist(),
                        dtype=object)
        order = np.lexsort((eid, ts, uid))
        u, ty = uid[order], ty[order]
        same = np.r_[False, u[1:] == u[:-1]] if len(u) else \
            np.empty(0, bool)
        src = ty[:-1][same[1:]] if len(u) > 1 else ty[:0]
        dst = ty[1:][same[1:]] if len(u) > 1 else ty[:0]
        tu = u[1:][same[1:]] if len(u) > 1 else u[:0]
        if not len(tu):
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_trans": pa.array([], pa.int64()),
                             "h6": pa.array([], pa.float64())})
        _, codes = np.unique(np.concatenate([src, dst]),
                             return_inverse=True)
        k = np.int64(codes.max()) + 1
        pair = codes[:len(src)] * k + codes[len(src):]
        key = tu * (k * k) + pair
        ukey, c = np.unique(key, return_counts=True)
        kuser = ukey // (k * k)
        starts = np.flatnonzero(np.r_[True, kuser[1:] != kuser[:-1]])
        n = np.add.reduceat(c, starts).astype(np.float64)
        p = c / np.repeat(n, np.diff(np.r_[starts, len(kuser)]))
        h = -np.add.reduceat(p * np.log(p), starts)
        return pa.table({
            "user_id": pa.array(kuser[starts]),
            "n_trans": pa.array(n.astype(np.int64)),
            "h6": pa.array(round_half_away(h, nd), pa.float64())})

    return (events.select_columns(["user_id", "event_id", "ts",
                                   "event_type"])
            .map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(per_partition, batch_format="pyarrow"))


def events_cusum(events: ray.data.Dataset, nd: int = 6,
                 num_parts: int = 8) -> ray.data.Dataset:
    """(event_type, cp_day, cusum6): CUSUM changepoint scan per type —
    over the dense daily count series, the day t maximizing
    |cumsum(x)[t] - t * mean| (ties earliest day), with the deviation
    reported in count units.  The level-shift detector.

    Exactness: the deviation is evaluated SCALED BY m (series length):
    dev_t = |cs_t * m - tot * t| is pure int64, so the argmax and tie
    handling are exact on both sides; only the final report divides by
    m.  Same bounded (type, day) combiner exchange as
    events_autocorr."""
    from ..relational import partial_groupby_agg, single_merge

    def day_partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        g = pa.table({"event_type": t["event_type"].combine_chunks(),
                      "day": pa.array(ts // 86_400_000_000),
                      "n": pa.array(np.ones(len(ts), np.int64))}) \
            .group_by(["event_type", "day"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "day", "n"])

    counts = partial_groupby_agg(
        events.select_columns(["event_type", "ts"])
        .map_batches(day_partial, batch_format="pyarrow",
                     batch_size=65536),
        ["event_type", "day"], [("n", "sum")], num_parts=num_parts)

    def final(t: pa.Table) -> pa.Table:
        ty = np.asarray(t["event_type"].combine_chunks().to_pylist(),
                        dtype=object)
        day = t["day"].combine_chunks().to_numpy()
        n = t["n_sum"].combine_chunks().to_numpy()
        out_t, out_d, out_s = [], [], []
        if len(day):
            lo, hi = int(day.min()), int(day.max())
            m = hi - lo + 1
            for tv in sorted(set(ty)):
                x = np.zeros(m, np.int64)
                sel = ty == tv
                x[day[sel] - lo] = n[sel]
                cs = np.cumsum(x)
                tot = int(cs[-1])
                tt = np.arange(1, m + 1, dtype=np.int64)
                dev = np.abs(cs * np.int64(m) - np.int64(tot) * tt)
                best = int(np.lexsort((tt, -dev))[0])
                out_t.append(tv)
                out_d.append(lo + best)
                out_s.append(float(round_half_away(
                    np.float64(int(dev[best]) / m), nd)))
        return pa.table({"event_type": pa.array(out_t, pa.string()),
                         "cp_day": pa.array(out_d, pa.int64()),
                         "cusum6": pa.array(out_s, pa.float64())})

    return single_merge(counts, final)


def lineitem_benford(lineitem: ray.data.Dataset, nd: int = 6,
                     num_parts: int = 8) -> ray.data.Dataset:
    """(l_returnflag, digit, n, share6): Benford first-digit
    distribution of extended prices (integer cents) per return flag —
    the classic fraud/synthetic-data screen.  The digit is taken from
    the DECIMAL STRING of the cents value on both sides (no log10
    float edge at powers of ten), so counts are exact.

    Scale plan: one bounded (flag x 9 digits) combiner exchange; the
    share denominator folds per flag in the final bounded task."""
    from ..relational import partial_groupby_agg, single_merge
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        cents = round_half_away(
            t["l_extendedprice"].combine_chunks().to_numpy() * 100.0,
            0).astype(np.int64)
        ndig = np.char.str_len(cents.astype("U")).astype(np.int64)
        first = cents // 10 ** (ndig - 1)
        g = pa.table({"l_returnflag":
                      t["l_returnflag"].combine_chunks(),
                      "digit": pa.array(first.astype(np.int64)),
                      "n": pa.array(np.ones(len(cents), np.int64))}) \
            .group_by(["l_returnflag", "digit"]).aggregate([("n", "sum")])
        return g.rename_columns(["l_returnflag", "digit", "n"])

    g = partial_groupby_agg(
        lineitem.select_columns(["l_returnflag", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        ["l_returnflag", "digit"], [("n", "sum")], num_parts=num_parts)

    def finish(t: pa.Table) -> pa.Table:
        f = np.asarray(t["l_returnflag"].combine_chunks().to_pylist(),
                       dtype=object)
        d = t["digit"].combine_chunks().to_numpy()
        n = t["n_sum"].combine_chunks().to_numpy()
        order = np.lexsort((d, f))
        f, d, n = f[order], d[order], n[order]
        starts = np.flatnonzero(np.r_[True, f[1:] != f[:-1]]) \
            if len(f) else np.empty(0, np.int64)
        tot = np.repeat(np.add.reduceat(n, starts),
                        np.diff(np.r_[starts, len(f)])) if len(f) \
            else n
        return pa.table({
            "l_returnflag": pa.array(f, pa.string()),
            "digit": pa.array(d.astype(np.int64)),
            "n": pa.array(n.astype(np.int64)),
            "share6": pa.array(round_half_away(
                n / tot.astype(np.float64), nd), pa.float64())})

    return single_merge(g, finish)


MARKOV_ITERS = 64


def events_markov_stationary(events: ray.data.Dataset,
                             iters: int = MARKOV_ITERS, nd: int = 6,
                             num_parts: int = 8) -> ray.data.Dataset:
    """(event_type, pi6): stationary distribution of the event-type
    Markov chain — per-user (ts, event_id)-ordered transitions counted
    once, the row-normalized K x K matrix power-iterated ``iters``
    times from uniform.  The long-run traffic-mix forecast.

    Scale plan: transitions collapse to a K^2-bounded combiner
    exchange (K event types); the iteration runs on the driver-free
    single bounded task over a 5x5 matrix.  Types with no outgoing
    transitions hold their mass (self-loop), keeping the matrix
    stochastic."""
    from ..relational import partial_groupby_agg, single_merge
    from ..util import round_half_away

    def trans_partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        eid = t["event_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        ty = np.asarray(t["event_type"].combine_chunks().to_pylist(),
                        dtype=object)
        order = np.lexsort((eid, ts, uid))
        u, ty = uid[order], ty[order]
        same = u[1:] == u[:-1] if len(u) > 1 else np.empty(0, bool)
        g = pa.table({"src": pa.array(ty[:-1][same].astype(str)),
                      "dst": pa.array(ty[1:][same].astype(str)),
                      "n": pa.array(np.ones(int(same.sum()), np.int64))})
        g = g.group_by(["src", "dst"]).aggregate([("n", "sum")])
        return g.rename_columns(["src", "dst", "n"])

    counts = partial_groupby_agg(
        events.select_columns(["user_id", "event_id", "ts",
                               "event_type"])
        .map_batches(trans_partial, batch_format="pyarrow",
                     batch_size=65536),
        ["src", "dst"], [("n", "sum")], num_parts=num_parts)

    def final(t: pa.Table) -> pa.Table:
        src = np.asarray(t["src"].combine_chunks().to_pylist(),
                         dtype=object)
        dst = np.asarray(t["dst"].combine_chunks().to_pylist(),
                         dtype=object)
        n = t["n_sum"].combine_chunks().to_numpy().astype(np.float64)
        types = sorted(set(src) | set(dst))
        k = len(types)
        if not k:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "pi6": pa.array([], pa.float64())})
        idx = {ty: i for i, ty in enumerate(types)}
        P = np.zeros((k, k))
        for s, d, c in zip(src, dst, n):
            P[idx[s], idx[d]] = c
        rs = P.sum(axis=1)
        for i in range(k):
            if rs[i] > 0:
                P[i] /= rs[i]
            else:
                P[i, i] = 1.0
        pi = np.full(k, 1.0 / k)
        for _ in range(iters):
            pi = pi @ P
        return pa.table({
            "event_type": pa.array(types, pa.string()),
            "pi6": pa.array(round_half_away(pi, nd), pa.float64())})

    return single_merge(counts, final)


def purchase_reconciliation(events: ray.data.Dataset,
                            orders: ray.data.Dataset,
                            num_parts: int = 32) -> ray.data.Dataset:
    """(id, n_purchases, n_orders, status): FULL-OUTER reconciliation
    of purchase events against the orders ledger keyed on user/
    customer id — 'both' / 'events_only' / 'orders_only'.  The
    cross-system integrity audit.

    Scale plan: both sides collapse to per-key counts at the block
    level, then ONE union-tag hash co-partition merges them (the house
    full-outer: no Dataset.join, zeros materialize the outer sides)."""
    from ..relational import partial_groupby_agg

    def ev_partial(t: pa.Table) -> pa.Table:
        m = pc.equal(t["event_type"].combine_chunks(), "purchase")
        u = t.filter(m)["user_id"].combine_chunks().to_numpy()
        k, c = np.unique(u, return_counts=True)
        return pa.table({"id": pa.array(k),
                         "n_p": pa.array(c.astype(np.int64)),
                         "n_o": pa.array(np.zeros(len(k), np.int64))})

    def ord_partial(t: pa.Table) -> pa.Table:
        u = t["o_custkey"].combine_chunks().to_numpy()
        k, c = np.unique(u, return_counts=True)
        return pa.table({"id": pa.array(k),
                         "n_p": pa.array(np.zeros(len(k), np.int64)),
                         "n_o": pa.array(c.astype(np.int64))})

    both = events.select_columns(["user_id", "event_type"]) \
        .map_batches(ev_partial, batch_format="pyarrow",
                     batch_size=65536) \
        .union(orders.select_columns(["o_custkey"])
               .map_batches(ord_partial, batch_format="pyarrow",
                            batch_size=65536))
    g = partial_groupby_agg(both, ["id"],
                            [("n_p", "sum"), ("n_o", "sum")],
                            num_parts=num_parts)

    def finish(t: pa.Table) -> pa.Table:
        np_ = t["n_p_sum"].combine_chunks().to_numpy()
        no = t["n_o_sum"].combine_chunks().to_numpy()
        status = np.where(np_ == 0, "orders_only",
                          np.where(no == 0, "events_only", "both"))
        return pa.table({"id": t["id"].combine_chunks(),
                         "n_purchases": pa.array(np_.astype(np.int64)),
                         "n_orders": pa.array(no.astype(np.int64)),
                         "status": pa.array(status)})

    return g.map_batches(finish, batch_format="pyarrow")


def user_rfm(events: ray.data.Dataset,
             num_parts: int = 32) -> ray.data.Dataset:
    """(user_id, recency_days, frequency, monetary_cents, r_score,
    f_score, m_score): RFM segmentation of the event stream — recency
    in whole days behind the stream's global max timestamp, frequency
    = event count, monetary = integer-cents sum of purchase values,
    each scored into exact quintiles (quantile_disc thresholds,
    score = 1 + #thresholds strictly below the value; recency scored
    INVERTED so 5 = most recent).  The classic audience-segmentation
    reduction.

    Scale plan: ONE bounded per-user combiner exchange
    (partial_groupby_agg: max ts / count / conditional cents sum);
    the bounded per-user table is materialized once and feeds three
    two-phase exact-quantile selections (no global sort); thresholds
    broadcast as 3x4 floats; scoring is a stateless vectorized pass.
    Integer cents + integer day floors keep both sides drift-free."""
    from ..relational import partial_groupby_agg

    US_DAY = 86_400_000_000

    def prep(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy()
        val = t["value"].combine_chunks().to_numpy()
        is_p = pc.equal(t["event_type"].combine_chunks(),
                        "purchase").to_numpy(zero_copy_only=False)
        cents = np.where(is_p, round_half_away(val * 100.0, 0), 0.0) \
            .astype(np.int64)
        return pa.table({"user_id": t["user_id"],
                         "ts": pa.array(ts),
                         "one": pa.array(np.ones(len(ts), np.int64)),
                         "cents": pa.array(cents)})

    base = events.select_columns(["user_id", "ts", "event_type",
                                  "value"]) \
        .map_batches(prep, batch_format="pyarrow", batch_size=65536)
    per_user = partial_groupby_agg(
        base, ["user_id"],
        [("ts", "max"), ("one", "sum"), ("cents", "sum")],
        num_parts=num_parts).materialize()

    # global max ts = max over the bounded per-user maxima
    now_us = int(per_user.max("ts_max"))

    def metrics(t: pa.Table) -> pa.Table:
        last = t["ts_max"].combine_chunks().to_numpy()
        return pa.table({
            "user_id": t["user_id"],
            "recency_days": pa.array((now_us - last) // US_DAY),
            "frequency": pc.cast(t["one_sum"], pa.int64()),
            "monetary_cents": pc.cast(t["cents_sum"], pa.int64())})

    m = per_user.map_batches(metrics, batch_format="pyarrow") \
        .materialize()

    ps = (0.2, 0.4, 0.6, 0.8)
    ths = {}
    for col in ("recency_days", "frequency", "monetary_cents"):
        def to_f(t: pa.Table, c=col) -> pa.Table:
            return pa.table({"v": pc.cast(t[c], pa.float64())})
        vals = m.map_batches(to_f, batch_format="pyarrow")
        ths[col] = np.array(sorted(
            r["value"] for r in
            exact_quantiles(vals, col="v", ps=ps).take_all()),
            np.float64)

    def score(t: pa.Table) -> pa.Table:
        rec = t["recency_days"].combine_chunks().to_numpy() \
            .astype(np.float64)
        fre = t["frequency"].combine_chunks().to_numpy() \
            .astype(np.float64)
        mon = t["monetary_cents"].combine_chunks().to_numpy() \
            .astype(np.float64)
        r_s = 5 - np.searchsorted(ths["recency_days"], rec, side="left")
        f_s = 1 + np.searchsorted(ths["frequency"], fre, side="left")
        m_s = 1 + np.searchsorted(ths["monetary_cents"], mon,
                                  side="left")
        return t.append_column("r_score", pa.array(r_s.astype(np.int64))) \
            .append_column("f_score", pa.array(f_s.astype(np.int64))) \
            .append_column("m_score", pa.array(m_s.astype(np.int64)))

    return m.map_batches(score, batch_format="pyarrow")


def user_gap_cv(events: ray.data.Dataset,
                num_parts: int = 32) -> ray.data.Dataset:
    """(user_id, n_gaps, total_s, cv6): coefficient of variation of a
    user's inter-event gaps (whole seconds, (ts, event_id) stream
    order) — the classic bot/automation screen (cv near 0 = metronome
    scheduling; humans are bursty, cv >~ 1).  Users need >= 2 gaps.

    Determinism: gaps are exact int64 seconds, so cv = sqrt(n*S2 -
    S1^2) / S1 is one sqrt and one division of exact integers — no
    accumulation-order drift.  cv6 = 0 when the gaps sum to zero.

    Scale plan: ONE bounded hash(user) exchange; the per-partition
    kernel lexsorts its users' events once and diffs in place."""
    from ..relational import hash_part

    def part(t: pa.Table) -> pa.Table:
        u = t["user_id"].combine_chunks().to_numpy()
        return pa.table({
            "user_id": t["user_id"],
            "ts": pa.array(t["ts"].combine_chunks().cast(pa.int64())
                           .to_numpy()),
            "event_id": t["event_id"],
            "part": pa.array(hash_part(u, num_parts))})

    def kernel(t: pa.Table) -> pa.Table:
        u = t["user_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy()
        eid = t["event_id"].combine_chunks().to_numpy()
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        same = u[1:] == u[:-1]
        gap = (ts[1:] - ts[:-1]) // 1_000_000
        gu, gap = u[1:][same], gap[same]
        if not len(gu):
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_gaps": pa.array([], pa.int64()),
                             "total_s": pa.array([], pa.int64()),
                             "cv6": pa.array([], pa.float64())})
        starts = np.flatnonzero(np.r_[True, gu[1:] != gu[:-1]])
        n = np.diff(np.r_[starts, len(gu)])
        s1 = np.add.reduceat(gap, starts)
        s2 = np.add.reduceat(gap * gap, starts)
        keep = n >= 2
        n, s1, s2 = n[keep], s1[keep], s2[keep]
        with np.errstate(divide="ignore", invalid="ignore"):
            cv = np.where(s1 > 0,
                          np.sqrt((n * s2 - s1 * s1).astype(np.float64))
                          / s1, 0.0)
        return pa.table({
            "user_id": pa.array(gu[starts][keep]),
            "n_gaps": pa.array(n.astype(np.int64)),
            "total_s": pa.array(s1.astype(np.int64)),
            "cv6": pa.array(round_half_away(cv, 6))})

    return events.select_columns(["user_id", "ts", "event_id"]) \
        .map_batches(part, batch_format="pyarrow", batch_size=65536) \
        .groupby("part") \
        .map_groups(lambda t: kernel(t.drop_columns(["part"])),
                    batch_format="pyarrow")


SURVIVAL_CHURN_DAYS = 1


def user_survival(events: ray.data.Dataset,
                  churn_days: int = SURVIVAL_CHURN_DAYS,
                  num_parts: int = 32) -> ray.data.Dataset:
    """(day, n_risk, n_events, km6): Kaplan-Meier survival curve of
    user LIFETIME (whole days between a user's first and last event);
    a user whose last event predates the stream horizon by more than
    ``churn_days`` is an observed churn event, anyone still active is
    censored — the retention curve a growth team actually reads.
    Rows are the KM event times (days with >= 1 churn).

    Determinism: all counts are exact integers; S(d) is the sequential
    product of (1 - d_i/n_i) over ASCENDING day on both sides — the
    final fold runs once in a bounded single merge (distinct lifetime
    days), never per-partition.

    Scale plan: one bounded per-user combiner exchange (min/max ts),
    a day-histogram combiner over the bounded per-user table, then the
    single bounded KM fold."""
    from ..relational import partial_groupby_agg, single_merge

    US_DAY = 86_400_000_000

    def prep(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks().cast(pa.int64()).to_numpy()
        return pa.table({"user_id": t["user_id"], "ts": pa.array(ts)})

    per_user = partial_groupby_agg(
        events.select_columns(["user_id", "ts"])
        .map_batches(prep, batch_format="pyarrow", batch_size=65536),
        ["user_id"], [("ts", "min"), ("ts", "max")],
        num_parts=num_parts).materialize()

    horizon = int(per_user.max("ts_max"))
    cut = horizon - churn_days * US_DAY

    def hist_partial(t: pa.Table) -> pa.Table:
        first = t["ts_min"].combine_chunks().to_numpy()
        last = t["ts_max"].combine_chunks().to_numpy()
        day = (last - first) // US_DAY
        evt = (last < cut).astype(np.int64)
        g = pa.table({"day": pa.array(day),
                      "tot": pa.array(np.ones(len(day), np.int64)),
                      "evt": pa.array(evt)}) \
            .group_by("day").aggregate([("tot", "sum"), ("evt", "sum")])
        return g.rename_columns(["day", "tot", "evt"])

    hist = partial_groupby_agg(
        per_user.map_batches(hist_partial, batch_format="pyarrow",
                             batch_size=65536),
        ["day"], [("tot", "sum"), ("evt", "sum")], num_parts=8)

    def km(t: pa.Table) -> pa.Table:
        day = t["day"].combine_chunks().to_numpy()
        tot = t["tot_sum"].combine_chunks().to_numpy()
        evt = t["evt_sum"].combine_chunks().to_numpy()
        order = np.argsort(day)
        day, tot, evt = day[order], tot[order], evt[order]
        n_users = int(tot.sum())
        risk = n_users - np.concatenate([[0], np.cumsum(tot)[:-1]])
        out = {"day": [], "n_risk": [], "n_events": [], "km6": []}
        s = 1.0
        for d, r, e in zip(day.tolist(), risk.tolist(), evt.tolist()):
            if e == 0:
                continue
            s = s * (1.0 - e / r)
            out["day"].append(d)
            out["n_risk"].append(r)
            out["n_events"].append(e)
            out["km6"].append(float(round_half_away(np.float64(s), 6)))
        return pa.table({
            "day": pa.array(out["day"], pa.int64()),
            "n_risk": pa.array(out["n_risk"], pa.int64()),
            "n_events": pa.array(out["n_events"], pa.int64()),
            "km6": pa.array(out["km6"], pa.float64())})

    return single_merge(hist, km)


def supplier_hhi(lineitem: ray.data.Dataset, supplier: ray.data.Dataset,
                 nation: ray.data.Dataset) -> ray.data.Dataset:
    """(n_name, n_suppliers, total_qty, hhi6): Herfindahl-Hirschman
    concentration index of supplied quantity per nation — the
    supply-chain-risk summary (1/n = perfectly even, ->1 = one supplier
    carries the nation). A data-mix sibling: the same statistic audits
    source concentration in a training-data corpus.

    Scale plan: lineitem collapses to ONE int64 quantity sum per
    supplier via the combiner exchange (output bounded by |supplier|);
    supplier->nation (bounded dims) broadcast once; the final merge is
    ONE task over the bounded per-supplier table computing per-nation
    sum(s), sum(s^2) with PYTHON ints (unbounded, so the squared sums
    stay exact at any scale) and exactly one float division. Exactness:
    quantities are integral, so every aggregate is an exact integer;
    hhi6 = round_half_away(sum_sq / (tot * tot), 6) matches the SQL
    mirror bit-for-bit. Reference parity: generalizes go-osm's
    summarize per-key counters (osm/Summary.go) to a concentration
    grade."""
    from ..relational import partial_groupby_agg

    def to_int(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].combine_chunks().to_numpy().astype(np.int64)
        return pa.table({"l_suppkey": t["l_suppkey"], "q": pa.array(q)})

    per_supp = partial_groupby_agg(
        lineitem.select_columns(["l_suppkey", "l_quantity"])
        .map_batches(to_int, batch_format="pyarrow"),
        ["l_suppkey"], [("q", "sum")])

    supp_ref = broadcast_table(supplier, ["s_suppkey", "s_nationkey"])
    nat_ref = broadcast_table(nation, ["n_nationkey", "n_name"])

    def finish(t: pa.Table) -> pa.Table:
        st = ray.get(supp_ref)
        sk = st["s_suppkey"].to_numpy()
        order = np.argsort(sk)
        snat = st["s_nationkey"].to_numpy().astype(np.int64)[order]
        nt = ray.get(nat_ref)
        nk = nt["n_nationkey"].to_numpy().astype(np.int64)
        nname = {int(k): v for k, v in zip(nk, nt["n_name"].to_pylist())}
        idx = np.searchsorted(sk[order],
                              t["l_suppkey"].combine_chunks().to_numpy())
        natkey = snat[idx]
        q = t["q_sum"].combine_chunks().to_numpy()
        acc: dict[int, list] = {}
        for k, s in zip(natkey.tolist(), q.tolist()):
            a = acc.setdefault(k, [0, 0, 0])
            a[0] += 1
            a[1] += s          # python ints: exact at any scale
            a[2] += s * s
        out = {"n_name": [], "n_suppliers": [], "total_qty": [], "hhi6": []}
        for k in sorted(acc):
            n, tot, sq = acc[k]
            h = sq / (tot * tot) if tot else 0.0
            out["n_name"].append(nname[k])
            out["n_suppliers"].append(n)
            out["total_qty"].append(tot)
            out["hhi6"].append(float(round_half_away(np.float64(h), 6)))
        return pa.table({
            "n_name": pa.array(out["n_name"], pa.string()),
            "n_suppliers": pa.array(out["n_suppliers"], pa.int64()),
            "total_qty": pa.array(out["total_qty"], pa.int64()),
            "hhi6": pa.array(out["hhi6"], pa.float64())})

    return single_merge(per_supp, finish)


def events_weekday_chi2(events: ray.data.Dataset) -> ray.data.Dataset:
    """(event_type, n, chi2_6): chi-square statistic of each event
    type's weekday distribution against uniform (df = 6) — the
    seasonality-flatness test behind events_heatmap (large chi2 =
    weekday-locked behavior, bots or batch jobs).

    Scale shape: bounded (type x 7) combiner + ONE merge. Exactness:
    with e = N/7, sum((o-e)^2/e) telescopes to (7*sum(o^2) - N^2)/N —
    every term an exact int64 (zero-count weekdays drop out of sum(o^2)
    but are covered by the closed form), one float division mirrored by
    the SQL's CAST(7*so2 - n*n AS DOUBLE)/CAST(n AS DOUBLE)."""
    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks().to_numpy().astype("datetime64[us]")
        days = ts.astype("datetime64[D]").astype(np.int64)
        dow = ((days + 3) % 7) + 1   # 1970-01-01 is a Thursday
        g = pa.table({"event_type": t["event_type"],
                      "dow": pa.array(dow)}) \
            .group_by(["event_type", "dow"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "dow", "pn"])

    def merge(t: pa.Table) -> pa.Table:
        from ..util import round_half_away
        g = t.group_by(["event_type", "dow"]).aggregate([("pn", "sum")])
        et = g["event_type"].to_pylist()
        o = g["pn_sum"].combine_chunks().to_numpy().astype(np.int64)
        acc: dict[str, list] = {}
        for e, c in zip(et, o.tolist()):
            a = acc.setdefault(e, [0, 0])
            a[0] += c
            a[1] += c * c
        out = {"event_type": [], "n": [], "chi2_6": []}
        for e in sorted(acc):
            n, so2 = acc[e]
            chi2 = float(7 * so2 - n * n) / float(n) if n else 0.0
            out["event_type"].append(e)
            out["n"].append(n)
            out["chi2_6"].append(float(round_half_away(np.float64(chi2), 6)))
        return pa.table({
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "chi2_6": pa.array(out["chi2_6"], pa.float64())})

    return single_merge(events.select_columns(["ts", "event_type"])
                        .map_batches(partial, batch_format="pyarrow",
                                     batch_size=65536), merge)


def ab_conversion_lift(events: ray.data.Dataset,
                       goal: str = "purchase") -> ray.data.Dataset:
    """(variant, n_users, n_converted, rate6, lift6): deterministic
    A/B split (variant = user_id % 2) and conversion to the ``goal``
    event type — the experimentation-analysis primitive (exact per-user
    dedup, exact integer counts, two float divisions; lift is B's rate
    over A's, emitted on both rows so the schema stays rectangular).

    Scale shape: per-block (user, variant, converted-flag) partials —
    per-user OR across blocks via a max combiner — one bounded
    user-hash exchange, then ONE tiny merge over per-partition counts.
    Here the partial collapses users in-block and the exchange is the
    repo's partial_groupby_agg on user_id."""
    from ..relational import partial_groupby_agg, single_merge
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        conv = pc.equal(t["event_type"], pa.scalar(goal)) \
            .combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"user_id": pa.array(uid),
                         "conv": pa.array(conv)})

    per_user = partial_groupby_agg(
        events.select_columns(["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        ["user_id"], [("conv", "max")])

    def finish(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        conv = t["conv_max"].combine_chunks().to_numpy()
        out = {"variant": [], "n_users": [], "n_converted": []}
        for v in (0, 1):
            m = (uid % 2) == v
            out["variant"].append(v)
            out["n_users"].append(int(m.sum()))
            out["n_converted"].append(int(conv[m].sum()))
        r = [c / u if u else 0.0
             for c, u in zip(out["n_converted"], out["n_users"])]
        lift = r[1] / r[0] if r[0] > 0.0 else 0.0
        return pa.table({
            "variant": pa.array(out["variant"], pa.int64()),
            "n_users": pa.array(out["n_users"], pa.int64()),
            "n_converted": pa.array(out["n_converted"], pa.int64()),
            "rate6": pa.array([float(round_half_away(np.float64(x), 6))
                               for x in r]),
            "lift6": pa.array([float(round_half_away(np.float64(lift),
                                                     6))] * 2)})

    return single_merge(per_user, finish)


def events_ewma(events: ray.data.Dataset, window_days: int = 24
                ) -> ray.data.Dataset:
    """(event_type, n_days, s_scaled, ewma6): dyadic-exact EWMA
    (alpha = 1/2) of DAILY event counts over the trailing
    ``window_days``-day window ending at the global max event day —
    the trend-smoothing readout of a streaming volume monitor
    (go-osm's -summarize counts graded to a decayed rate).

    Determinism contract: with alpha = 1/2 the K-day EWMA is
    sum(c_i * 2^i) / 2^K for day index i in [0, K-1] (i = K-1 the most
    recent day), so BOTH sides accumulate the integer s_scaled first
    and perform ONE float division by the exact power of two —
    no order-dependent float summation crosses the oracle boundary.
    K = 24 bounds the shift at 23 bits: s_scaled fits int64 while any
    per-day count stays below 2^39.

    Scale plan: per-block Acero partials collapse events to
    (event_type, day) counts (the combiner bounds the exchange by
    types x days, not events); the merged count table is tiny by
    construction (bounded key space), so ONE merge task computes the
    global max day, window weights, and per-type folds."""
    def pre(t: pa.Table) -> pa.Table:
        day = t["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[D]").astype(np.int64)
        return pa.table({"event_type": t["event_type"].combine_chunks(),
                         "day": pa.array(day),
                         "c": pa.array(np.ones(len(day), np.int64))})

    from ..relational import partial_groupby_agg
    counts = partial_groupby_agg(
        events.select_columns(["ts", "event_type"])
        .map_batches(pre, batch_format="pyarrow", batch_size=65536),
        ["event_type", "day"], [("c", "sum")])

    k = int(window_days)

    def finish(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].combine_chunks()
                        .to_numpy(zero_copy_only=False))
        day = t["day"].combine_chunks().to_numpy()
        c = t["c_sum"].combine_chunks().to_numpy()
        dmax = int(day.max()) if len(day) else 0
        keep = day > dmax - k
        et, day, c = et[keep], day[keep], c[keep]
        i = (day - dmax + k - 1).astype(np.int64)
        w = c.astype(np.int64) << i
        out = {"event_type": [], "n_days": [], "s_scaled": [], "ewma6": []}
        denom = float(2 ** k)
        for ty in sorted(set(et.tolist())):
            m = et == ty
            s = int(w[m].sum())
            out["event_type"].append(ty)
            out["n_days"].append(int(m.sum()))
            out["s_scaled"].append(s)
            out["ewma6"].append(float(round_half_away(
                np.float64(s / denom), 6)))
        return pa.table({
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_days": pa.array(out["n_days"], pa.int64()),
            "s_scaled": pa.array(out["s_scaled"], pa.int64()),
            "ewma6": pa.array(out["ewma6"], pa.float64())})

    return single_merge(counts, finish)


def events_interp(events: ray.data.Dataset,
                  num_parts: int = 8) -> ray.data.Dataset:
    """(event_type, day, interp6): LINEAR-INTERPOLATION as-of join —
    the value each type's signal takes at every midnight strictly
    inside its event range, interpolated between the bracketing events
    (events_asof's nearest-neighbour semantics upgraded to the lerp a
    time-series resampler needs).

    Bracketing contract (shared with the SQL window mirror): events
    order by (ts, event_id); the bracket for grid point g is the LAST
    event with ts < g and its successor (whose ts >= g by
    construction); interp = v0 + (g-t0)/(t1-t0) * (v1-v0) with the
    identical op order both sides before the 6dp round.

    Scale plan: ONE hash(event_type) exchange co-locates each type
    (types are a bounded vocabulary; the per-type grid is bounded by
    calendar days); the kernel sorts its types once and answers every
    grid point by vectorized searchsorted — no per-day scan."""
    def part(t: pa.Table) -> pa.Table:
        from ..relational import _col_hash
        et = t["event_type"].combine_chunks()
        h = _col_hash(et).astype(np.int64)
        return pa.table({"event_type": et,
                         "ts": t["ts"].combine_chunks(),
                         "event_id": t["event_id"].combine_chunks(),
                         "value": t["value"].combine_chunks(),
                         "part": pa.array(hash_part(h, num_parts))})

    DAY = 86_400_000_000  # us

    def kernel(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].combine_chunks()
                        .to_numpy(zero_copy_only=False))
        ts = t["ts"].combine_chunks().to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        eid = t["event_id"].combine_chunks().to_numpy()
        val = t["value"].combine_chunks().to_numpy()
        order = np.lexsort((eid, ts, et))
        et, ts, eid, val = et[order], ts[order], eid[order], val[order]
        out_t, out_d, out_v = [], [], []
        starts = np.flatnonzero(np.r_[True, et[1:] != et[:-1]]) \
            if len(et) else np.empty(0, np.int64)
        ends = np.r_[starts[1:], len(et)] if len(et) else starts
        for s, e in zip(starts, ends):
            tts, tval = ts[s:e], val[s:e]
            g0 = (tts[0] // DAY + 1) * DAY
            g1 = (tts[-1] // DAY) * DAY
            if g1 < g0:
                continue
            g = np.arange(g0, g1 + 1, DAY, dtype=np.int64)
            idx = np.searchsorted(tts, g, side="left")
            i0 = idx - 1
            t0, t1 = tts[i0], tts[i0 + 1]
            v0, v1 = tval[i0], tval[i0 + 1]
            w = (g - t0).astype(np.float64) / (t1 - t0).astype(np.float64)
            vi = v0 + w * (v1 - v0)
            out_t.extend([et[s]] * len(g))
            out_d.append(g)
            out_v.append(round_half_away(vi, 6))
        d = np.concatenate(out_d) if out_d else np.empty(0, np.int64)
        v = np.concatenate(out_v) if out_v else np.empty(0, np.float64)
        return pa.table({
            "event_type": pa.array(out_t, pa.string()),
            "day": pa.array(d.astype("datetime64[us]")),
            "interp6": pa.array(v, pa.float64())})

    return events.select_columns(["event_type", "ts", "event_id", "value"]) \
        .map_batches(part, batch_format="pyarrow", batch_size=65536) \
        .groupby("part") \
        .map_groups(lambda t: kernel(t.drop_columns(["part"])),
                    batch_format="pyarrow")


def orders_backlog(orders: ray.data.Dataset, lineitem: ray.data.Dataset,
                   num_parts: int = 16) -> ray.data.Dataset:
    """(day, n_opened, n_closed, backlog): the OPEN-ORDER BACKLOG time
    series — orders open at end of each active day (cumulative opens
    minus cumulative closes, close = the order's LAST ship date), the
    event-sourcing ledger readout of a fulfilment dashboard. Days with
    no activity are omitted (the running balance carries across gaps).

    Scale plan: closes collapse lineitem to one max-shipdate row per
    order via the combiner exchange (bounded by orders-per-block);
    opens collapse to per-day counts in one Acero pass; both partial
    streams union into ONE day-hash exchange (bounded by calendar
    days) and a single ordered integer cumsum task emits the series."""
    from ..relational import partial_groupby_agg

    def ship_int(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].combine_chunks().to_numpy() \
            .astype("datetime64[D]").astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"].combine_chunks(),
                         "d": pa.array(d)})

    per_order = partial_groupby_agg(
        lineitem.select_columns(["l_orderkey", "l_shipdate"])
        .map_batches(ship_int, batch_format="pyarrow"),
        ["l_orderkey"], [("d", "max")])

    def close_partial(t: pa.Table) -> pa.Table:
        d = t["d_max"].combine_chunks().to_numpy()
        u, n = np.unique(d, return_counts=True)
        return pa.table({"day": pa.array(u),
                         "n_opened": pa.array(np.zeros(len(u), np.int64)),
                         "n_closed": pa.array(n.astype(np.int64))})

    def open_partial(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].combine_chunks().to_numpy() \
            .astype("datetime64[D]").astype(np.int64)
        u, n = np.unique(d, return_counts=True)
        return pa.table({"day": pa.array(u),
                         "n_opened": pa.array(n.astype(np.int64)),
                         "n_closed": pa.array(np.zeros(len(u), np.int64))})

    daily = partial_groupby_agg(
        per_order.map_batches(close_partial, batch_format="pyarrow")
        .union(orders.select_columns(["o_orderdate"])
               .map_batches(open_partial, batch_format="pyarrow")),
        ["day"], [("n_opened", "sum"), ("n_closed", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        day = t["day"].combine_chunks().to_numpy()
        no = t["n_opened_sum"].combine_chunks().to_numpy()
        nc = t["n_closed_sum"].combine_chunks().to_numpy()
        order = np.argsort(day)
        day, no, nc = day[order], no[order], nc[order]
        backlog = np.cumsum(no - nc)
        return pa.table({
            "day": pa.array(day.astype("datetime64[D]")
                            .astype("datetime64[us]")),
            "n_opened": pa.array(no.astype(np.int64)),
            "n_closed": pa.array(nc.astype(np.int64)),
            "backlog": pa.array(backlog.astype(np.int64))})

    return single_merge(daily, finish)


def event_type_affinity(events: ray.data.Dataset,
                        num_parts: int = 16) -> ray.data.Dataset:
    """(a, b, n_ab, jac6): CO-ENGAGEMENT affinity matrix — Jaccard
    similarity between event types over their user sets (users who do
    a also do b), the cross-sell / feature-affinity readout; the user-
    set analogue of amenity_colocation's cell-presence PMI.

    Scale plan: per-block distinct (user, type) partials -> ONE
    hash(user) exchange (each user wholly in one partition; per-user
    type sets are bounded by the type vocabulary) -> per-partition
    global dedup + per-user pair emission + per-type user-count
    partials -> ONE tiny merge over the vocab^2-bounded count table."""
    from ..relational import single_merge as _sm

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([])
        uid = g["user_id"].combine_chunks().to_numpy()
        return pa.table({"user_id": pa.array(uid),
                         "event_type": g["event_type"].combine_chunks(),
                         "part": pa.array(hash_part(uid, num_parts))})

    def pairs(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]) \
            .group_by(["user_id", "event_type"]).aggregate([])
        uid = g["user_id"].combine_chunks().to_numpy()
        et = np.asarray(g["event_type"].combine_chunks()
                        .to_numpy(zero_copy_only=False))
        order = np.lexsort((et, uid))
        uid, et = uid[order], et[order]
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]]) \
            if len(uid) else np.empty(0, np.int64)
        counts = np.diff(np.r_[starts, len(uid)]) if len(uid) \
            else np.empty(0, np.int64)
        pos = np.arange(len(et), dtype=np.int64)
        rep = np.repeat(counts, counts) - (pos - np.repeat(starts, counts)) - 1
        first_idx = np.repeat(pos, rep)
        base = np.repeat(np.cumsum(rep) - rep, rep)
        second_idx = first_idx + 1 + (np.arange(rep.sum(), dtype=np.int64)
                                      - base)
        ka = ["p"] * len(first_idx) + ["n"] * len(et)
        a = np.r_[et[first_idx], et].tolist()
        b = np.r_[et[second_idx], ["" for _ in range(len(et))]].tolist()
        return pa.table({"kind": pa.array(ka, pa.string()),
                         "a": pa.array(a, pa.string()),
                         "b": pa.array(b, pa.string()),
                         "n": pa.array(np.ones(len(ka), np.int64))})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["kind", "a", "b"]).aggregate([("n", "sum")])
        kind = np.asarray(g["kind"].combine_chunks()
                          .to_numpy(zero_copy_only=False))
        a = np.asarray(g["a"].combine_chunks()
                       .to_numpy(zero_copy_only=False))
        b = np.asarray(g["b"].combine_chunks()
                       .to_numpy(zero_copy_only=False))
        n = g["n_sum"].combine_chunks().to_numpy()
        users = {x: int(c) for x, c in zip(a[kind == "n"], n[kind == "n"])}
        m = kind == "p"
        out = {"a": [], "b": [], "n_ab": [], "jac6": []}
        for va, vb, nab in zip(a[m], b[m], n[m]):
            nab = int(nab)
            jac = nab / (users[va] + users[vb] - nab)
            out["a"].append(va)
            out["b"].append(vb)
            out["n_ab"].append(nab)
            out["jac6"].append(float(round_half_away(np.float64(jac), 6)))
        return pa.table({
            "a": pa.array(out["a"], pa.string()),
            "b": pa.array(out["b"], pa.string()),
            "n_ab": pa.array(out["n_ab"], pa.int64()),
            "jac6": pa.array(out["jac6"], pa.float64())})

    partials = events.select_columns(["user_id", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=65536) \
        .groupby("part").map_groups(pairs, batch_format="pyarrow")
    return _sm(partials, finish)


def price_qty_corr(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """(l_returnflag, n, sum_qty, sum_cents, corr6): Pearson correlation
    between line quantity and extended price (integer cents) per return
    flag — the pricing-model sanity probe (price should track quantity;
    a flag whose correlation collapses signals mix drift).

    Exactness: quantities are integral and prices convert to integer
    cents per row (the orders_cumsum precedent), so all five moments
    are EXACT integers — squared-cents partials accumulate in PYTHON
    ints (the supplier_hhi precedent: int64 would overflow at scale)
    and ship as decimal strings; the merge re-sums exactly and the only
    floats are the correlation's casts/sqrt/divide, in the identical
    order as the SQL mirror.

    Scale plan: embarrassingly parallel per-block moment partials (one
    bounded row per flag per block) -> ONE tiny merge task."""
    from ..relational import single_merge as _sm

    def partial(t: pa.Table) -> pa.Table:
        flag = np.asarray(t["l_returnflag"].combine_chunks()
                          .to_numpy(zero_copy_only=False))
        q = t["l_quantity"].combine_chunks().to_numpy().astype(np.int64)
        c = round_half_away(
            t["l_extendedprice"].combine_chunks().to_numpy() * 100.0, 0
        ).astype(np.int64)
        out = {"flag": [], "n": [], "sq": [], "sp": [], "sqq": [],
               "spp": [], "sqp": []}
        for f in sorted(set(flag.tolist())):
            m = flag == f
            qi = q[m].tolist()
            ci = c[m].tolist()
            out["flag"].append(f)
            out["n"].append(len(qi))
            out["sq"].append(str(sum(qi)))
            out["sp"].append(str(sum(ci)))
            out["sqq"].append(str(sum(x * x for x in qi)))
            out["spp"].append(str(sum(x * x for x in ci)))
            out["sqp"].append(str(sum(x * y for x, y in zip(qi, ci))))
        return pa.table({
            "flag": pa.array(out["flag"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            **{k: pa.array(out[k], pa.string())
               for k in ("sq", "sp", "sqq", "spp", "sqp")}})

    def finish(t: pa.Table) -> pa.Table:
        flag = np.asarray(t["flag"].combine_chunks()
                          .to_numpy(zero_copy_only=False))
        nn = t["n"].combine_chunks().to_numpy()
        cols = {k: [int(x) for x in t[k].to_pylist()]
                for k in ("sq", "sp", "sqq", "spp", "sqp")}
        out = {"l_returnflag": [], "n": [], "sum_qty": [],
               "sum_cents": [], "corr6": []}
        for f in sorted(set(flag.tolist())):
            m = flag == f
            n = int(nn[m].sum())
            sq, sp, sqq, spp, sqp = (
                sum(v for v, keep in zip(cols[k], m) if keep)
                for k in ("sq", "sp", "sqq", "spp", "sqp"))
            num = float(n) * float(sqp) - float(sq) * float(sp)
            den = (np.sqrt(float(n) * float(sqq) - float(sq) * float(sq))
                   * np.sqrt(float(n) * float(spp) - float(sp) * float(sp)))
            corr = num / den if den > 0.0 else 0.0
            out["l_returnflag"].append(f)
            out["n"].append(n)
            out["sum_qty"].append(sq)
            out["sum_cents"].append(sp)
            out["corr6"].append(float(round_half_away(np.float64(corr), 6)))
        return pa.table({
            "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "sum_qty": pa.array(out["sum_qty"], pa.int64()),
            "sum_cents": pa.array(out["sum_cents"], pa.int64()),
            "corr6": pa.array(out["corr6"], pa.float64())})

    return _sm(
        lineitem.select_columns(["l_returnflag", "l_quantity",
                                 "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        finish)


def funnel_latency_hist(events: ray.data.Dataset,
                        first: str = "view", second: str = "purchase",
                        num_parts: int = 16) -> ray.data.Dataset:
    """(lag_days, n_users, share6): TIME-TO-CONVERT histogram — for
    every user whose first ``second`` event strictly follows their
    first ``first`` event, the whole-day lag between the two firsts
    (events_funnel counts who converts; this reads how fast).

    Exactness: all integer — epoch-microsecond mins, one floor
    division by 86.4e9; users whose first purchase precedes their
    first view never convert by the firsts-only definition.

    Scale plan: per-block Acero (user, type) min-partials -> ONE
    user-hash combiner exchange (each user wholly in one partition)
    -> per-partition lag + bounded (lag, n) partials -> one tiny
    merge."""
    from ..relational import partial_groupby_agg, single_merge
    from ..util import round_half_away

    def pre(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].combine_chunks()
                        .to_numpy(zero_copy_only=False))
        keep = (et == first) | (et == second)
        ts = t["ts"].combine_chunks().to_numpy()[keep] \
            .astype("datetime64[us]").astype(np.int64)
        uid = t["user_id"].combine_chunks().to_numpy()[keep]
        return pa.table({"user_id": pa.array(uid),
                         "is_first": pa.array(et[keep] == first),
                         "ts": pa.array(ts)})

    mins = partial_groupby_agg(
        events.select_columns(["user_id", "event_type", "ts"])
        .map_batches(pre, batch_format="pyarrow", batch_size=65536),
        ["user_id", "is_first"], [("ts", "min")])

    DAY = 86_400_000_000

    def lag_partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        isf = t["is_first"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["ts_min"].combine_chunks().to_numpy()
        order = np.lexsort((~isf, uid))       # first-event row leads
        uid, isf, ts = uid[order], isf[order], ts[order]
        both = np.flatnonzero((uid[:-1] == uid[1:])
                              & isf[:-1] & ~isf[1:]) \
            if len(uid) > 1 else np.empty(0, np.int64)
        t1, t2 = ts[both], ts[both + 1]
        lag = (t2 - t1) // DAY
        lag = lag[t2 > t1]
        u, n = np.unique(lag, return_counts=True)
        return pa.table({"lag_days": pa.array(u.astype(np.int64)),
                         "n_users": pa.array(n.astype(np.int64))})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("lag_days").aggregate([("n_users", "sum")])
        lag = g["lag_days"].combine_chunks().to_numpy()
        order = np.argsort(lag)
        n = g["n_users_sum"].combine_chunks().to_numpy()[order]
        tot = int(n.sum())
        return pa.table({
            "lag_days": pa.array(lag[order], pa.int64()),
            "n_users": pa.array(n.astype(np.int64)),
            "share6": pa.array(round_half_away(
                n.astype(np.float64) / float(tot), 6), pa.float64())})

    # batch_size=None: whole blocks — partial_groupby_agg emits one
    # block per user-hash partition, so each user's two min-rows stay
    # inside a single lag_partial invocation
    return single_merge(mins.map_batches(lag_partial, batch_size=None,
                                         batch_format="pyarrow"),
                        merge)


def events_runlength(events: ray.data.Dataset,
                     num_parts: int = 16) -> ray.data.Dataset:
    """(event_type, run_len, n_runs): distribution of CONSECUTIVE
    same-type run lengths within each user's (ts, event_id)-ordered
    stream — the behavioural-autocorrelation census (bots produce long
    single-type runs; organic sessions alternate). The distributed
    gaps-and-islands exercise: the SQL mirror is the classic
    double-row_number difference grouping.

    Scale plan: ONE user-hash exchange (each user wholly in one
    partition), vectorized boundary detection per partition, bounded
    (type, len) partials, one tiny merge."""
    from ..relational import single_merge

    def part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        return pa.table({"user_id": pa.array(uid),
                         "event_type": t["event_type"].combine_chunks(),
                         "event_id": t["event_id"].combine_chunks(),
                         "ts": t["ts"].combine_chunks(),
                         "part": pa.array(hash_part(uid, num_parts))})

    def runs(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        et = np.asarray(t["event_type"].combine_chunks()
                        .to_numpy(zero_copy_only=False))
        eid = t["event_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy().astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, et = uid[order], et[order]
        if not len(uid):
            return pa.table({"event_type": pa.array([], pa.string()),
                             "run_len": pa.array([], pa.int64()),
                             "n_runs": pa.array([], pa.int64())})
        new_run = np.r_[True, (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])]
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.r_[starts, len(uid)])
        g = pa.table({"event_type": pa.array(et[starts].tolist(),
                                             pa.string()),
                      "run_len": pa.array(lens.astype(np.int64)),
                      "n": pa.array(np.ones(len(starts), np.int64))}) \
            .group_by(["event_type", "run_len"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "run_len", "n_runs"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "run_len"]) \
            .aggregate([("n_runs", "sum")])
        return g.rename_columns(["event_type", "run_len", "n_runs"])

    partials = events.select_columns(["user_id", "event_type",
                                      "event_id", "ts"]) \
        .map_batches(part, batch_format="pyarrow", batch_size=65536) \
        .groupby("part") \
        .map_groups(lambda t: runs(t.drop_columns(["part"])),
                    batch_format="pyarrow")
    return single_merge(partials, merge)


def supplier_ship_lag(lineitem: ray.data.Dataset,
                      orders: ray.data.Dataset,
                      num_parts: int = 16) -> ray.data.Dataset:
    """(l_suppkey, n_lines, total_lag_days, mean_lag6): per-supplier
    order-to-ship latency — mean whole-day lag between o_orderdate and
    each of the supplier's l_shipdates, the fulfilment-speed league
    table (and a BIG x BIG join: every lineitem needs its order's
    date).

    Scale plan: ONE orderkey-hash co-partition exchange joins the two
    fact tables (union-tag kernel: order rows ship the date, lineitem
    rows the supplier; no broadcast — orders is not a dimension), then
    the bounded supplier-key combiner exchange sums integer day lags."""
    from ..relational import hash_part, partial_groupby_agg
    from ..util import round_half_away

    def tag_line(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].combine_chunks().to_numpy()
        d = t["l_shipdate"].combine_chunks().to_numpy() \
            .astype("datetime64[D]").astype(np.int64)
        return pa.table({"orderkey": pa.array(ok),
                         "suppkey": t["l_suppkey"].combine_chunks(),
                         "day": pa.array(d),
                         "is_order": pa.array(np.zeros(len(ok), bool)),
                         "part": pa.array(hash_part(ok, num_parts))})

    def tag_order(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].combine_chunks().to_numpy()
        d = t["o_orderdate"].combine_chunks().to_numpy() \
            .astype("datetime64[D]").astype(np.int64)
        return pa.table({"orderkey": pa.array(ok),
                         "suppkey": pa.array(np.zeros(len(ok), np.int64)),
                         "day": pa.array(d),
                         "is_order": pa.array(np.ones(len(ok), bool)),
                         "part": pa.array(hash_part(ok, num_parts))})

    def join_kernel(t: pa.Table) -> pa.Table:
        ok = t["orderkey"].combine_chunks().to_numpy()
        sk = t["suppkey"].combine_chunks().to_numpy()
        day = t["day"].combine_chunks().to_numpy()
        iso = t["is_order"].combine_chunks().to_numpy(zero_copy_only=False)
        o_k, o_d = ok[iso], day[iso]
        order = np.argsort(o_k)
        o_k, o_d = o_k[order], o_d[order]
        m = ~iso
        idx = np.searchsorted(o_k, ok[m])
        lag = day[m] - o_d[idx]
        return pa.table({"suppkey": pa.array(sk[m]),
                         "n": pa.array(np.ones(int(m.sum()), np.int64)),
                         "lag": pa.array(lag.astype(np.int64))})

    joined = lineitem.select_columns(["l_orderkey", "l_suppkey",
                                      "l_shipdate"]) \
        .map_batches(tag_line, batch_format="pyarrow", batch_size=65536) \
        .union(orders.select_columns(["o_orderkey", "o_orderdate"])
               .map_batches(tag_order, batch_format="pyarrow",
                            batch_size=65536)) \
        .groupby("part") \
        .map_groups(lambda t: join_kernel(t.drop_columns(["part"])),
                    batch_format="pyarrow")

    g = partial_groupby_agg(joined, ["suppkey"],
                            [("n", "sum"), ("lag", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_sum"].combine_chunks().to_numpy()
        lag = t["lag_sum"].combine_chunks().to_numpy()
        return pa.table({
            "l_suppkey": pc.cast(t["suppkey"], pa.int64()),
            "n_lines": pa.array(n.astype(np.int64)),
            "total_lag_days": pa.array(lag.astype(np.int64)),
            "mean_lag6": pa.array(round_half_away(
                lag.astype(np.float64) / n.astype(np.float64), 6),
                pa.float64())})

    return g.map_batches(finish, batch_format="pyarrow")


def user_sync_pairs(events: ray.data.Dataset, min_shared: int = 1,
                    num_parts: int = 16) -> ray.data.Dataset:
    """(a, b, n_shared): pairs of users active in the same MINUTE at
    least ``min_shared`` distinct minutes — the bot-net / replay
    screen (scripted account fleets fired from one scheduler collide
    repeatedly on the same minute buckets; organic co-activity is
    sparse).

    Scale plan: per-block distinct (minute, user) partials -> ONE
    minute-hash exchange (each bucket wholly in one partition) ->
    per-bucket clique pairs (quadratic in users-per-minute — a
    planet-scale guard would cap the per-bucket group like the LSH
    MAX_BUCKET) -> bounded pair-count combiner exchange -> threshold
    filter."""
    from ..relational import hash_part, partial_groupby_agg

    MIN = 60_000_000  # us

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[us]").astype(np.int64) // MIN
        g = pa.table({"ts": pa.array(ts),
                      "user_id": t["user_id"].combine_chunks()}) \
            .group_by(["ts", "user_id"]).aggregate([])
        ts2 = g["ts"].combine_chunks().to_numpy()
        return pa.table({"ts": pa.array(ts2),
                         "user_id": g["user_id"].combine_chunks(),
                         "part": pa.array(hash_part(ts2, num_parts))})

    def pairs(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by(["ts", "user_id"]) \
            .aggregate([])
        ts = g["ts"].combine_chunks().to_numpy()
        uid = g["user_id"].combine_chunks().to_numpy()
        order = np.lexsort((uid, ts))
        ts, uid = ts[order], uid[order]
        starts = np.flatnonzero(np.r_[True, ts[1:] != ts[:-1]]) \
            if len(ts) else np.empty(0, np.int64)
        counts = np.diff(np.r_[starts, len(ts)]) if len(ts) \
            else np.empty(0, np.int64)
        pos = np.arange(len(uid), dtype=np.int64)
        rep = np.repeat(counts, counts) - (pos - np.repeat(starts, counts)) - 1
        first_idx = np.repeat(pos, rep)
        base = np.repeat(np.cumsum(rep) - rep, rep)
        second_idx = first_idx + 1 + (np.arange(rep.sum(), dtype=np.int64)
                                      - base)
        return pa.table({"a": pa.array(uid[first_idx]),
                         "b": pa.array(uid[second_idx]),
                         "n": pa.array(np.ones(len(first_idx), np.int64))})

    cand = events.select_columns(["ts", "user_id"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=65536) \
        .groupby("part").map_groups(pairs, batch_format="pyarrow")

    g = partial_groupby_agg(cand, ["a", "b"], [("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_sum"].combine_chunks().to_numpy()
        keep = pa.array(n >= min_shared)
        return pa.table({
            "a": pc.cast(t["a"].combine_chunks().filter(keep), pa.int64()),
            "b": pc.cast(t["b"].combine_chunks().filter(keep), pa.int64()),
            "n_shared": pa.array(n[n >= min_shared].astype(np.int64))})

    return g.map_batches(finish, batch_format="pyarrow")


def weekly_mix_drift(events: ray.data.Dataset,
                     num_parts: int = 8) -> ray.data.Dataset:
    """(week, n_events, js6): Jensen-Shannon divergence between each
    epoch-week's event-type mix and the GLOBAL mix — the
    distribution-drift monitor a data pipeline reads to catch
    instrumentation changes (src_js_divergence grades corpora by
    source; this grades the same statistic over time).

    Determinism contract: all probabilities are ratios of exact
    integer counts; the per-week JS term sum runs in ASCENDING
    event_type order on both sides (the ordered-aggregate contract),
    term = 0.5*p*ln(p/m) + 0.5*q*ln(q/m), m = 0.5*(p+q), 0*ln = 0.

    Scale plan: one bounded (week, type) combiner exchange; the merged
    count table is weeks x types, so ONE task computes the global mix
    and every week's fold."""
    import math

    from ..relational import partial_groupby_agg, single_merge
    from ..util import round_half_away

    WEEK = 604_800_000_000  # us

    def pre(t: pa.Table) -> pa.Table:
        w = t["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[us]").astype(np.int64) // WEEK
        return pa.table({"week": pa.array(w),
                         "event_type": t["event_type"].combine_chunks(),
                         "c": pa.array(np.ones(len(w), np.int64))})

    counts = partial_groupby_agg(
        events.select_columns(["ts", "event_type"])
        .map_batches(pre, batch_format="pyarrow", batch_size=65536),
        ["week", "event_type"], [("c", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        wk = t["week"].combine_chunks().to_numpy()
        et = np.asarray(t["event_type"].combine_chunks()
                        .to_numpy(zero_copy_only=False))
        c = t["c_sum"].combine_chunks().to_numpy()
        types = sorted(set(et.tolist()))
        gc = {ty: int(c[et == ty].sum()) for ty in types}
        gt = sum(gc.values())
        out = {"week": [], "n_events": [], "js6": []}
        for w in sorted(set(wk.tolist())):
            m = wk == w
            cw = {ty: int(x) for ty, x in zip(et[m], c[m])}
            wtot = sum(cw.values())
            js = 0.0
            for ty in types:
                p = cw.get(ty, 0) / wtot
                q = gc[ty] / gt
                mm = 0.5 * (p + q)
                term = 0.0
                if p > 0.0:
                    term += 0.5 * (p * math.log(p / mm))
                if q > 0.0:
                    term += 0.5 * (q * math.log(q / mm))
                js += term
            out["week"].append(int(w))
            out["n_events"].append(wtot)
            out["js6"].append(float(round_half_away(np.float64(js), 6)))
        return pa.table({
            "week": pa.array(out["week"], pa.int64()),
            "n_events": pa.array(out["n_events"], pa.int64()),
            "js6": pa.array(out["js6"], pa.float64())})

    return single_merge(counts, finish)


def order_status_consistency(orders: ray.data.Dataset,
                             lineitem: ray.data.Dataset,
                             num_parts: int = 16) -> ray.data.Dataset:
    """(o_orderstatus, l_linestatus, n_lines, violation): status-model
    contingency between orders and their lines — TPC-H's contract is
    'F' orders carry only 'F' lines and 'O' orders only 'O' lines
    ('P' mixes); cells breaking that are flagged. The referential
    STATE-consistency audit (osm_ref_integrity checks existence; this
    checks agreement).

    Scale plan: ONE orderkey-hash co-partition exchange (the
    supplier_ship_lag union-tag shape) attaches each line's order
    status; bounded (status x status) combiner rollup."""
    from ..relational import hash_part, partial_groupby_agg

    def tag_line(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].combine_chunks().to_numpy()
        return pa.table({"orderkey": pa.array(ok),
                         "st": t["l_linestatus"].combine_chunks(),
                         "is_order": pa.array(np.zeros(len(ok), bool)),
                         "part": pa.array(hash_part(ok, num_parts))})

    def tag_order(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].combine_chunks().to_numpy()
        return pa.table({"orderkey": pa.array(ok),
                         "st": t["o_orderstatus"].combine_chunks(),
                         "is_order": pa.array(np.ones(len(ok), bool)),
                         "part": pa.array(hash_part(ok, num_parts))})

    def kernel(t: pa.Table) -> pa.Table:
        ok = t["orderkey"].combine_chunks().to_numpy()
        st = np.asarray(t["st"].combine_chunks()
                        .to_numpy(zero_copy_only=False))
        iso = t["is_order"].combine_chunks().to_numpy(zero_copy_only=False)
        o_k = ok[iso]
        o_s = st[iso]
        order = np.argsort(o_k)
        o_k, o_s = o_k[order], o_s[order]
        m = ~iso
        idx = np.searchsorted(o_k, ok[m])
        ostat = o_s[idx]
        g = pa.table({"o_orderstatus": pa.array(ostat.tolist(),
                                                pa.string()),
                      "l_linestatus": pa.array(st[m].tolist(),
                                               pa.string()),
                      "n": pa.array(np.ones(int(m.sum()), np.int64))}) \
            .group_by(["o_orderstatus", "l_linestatus"]) \
            .aggregate([("n", "sum")])
        return g.rename_columns(["o_orderstatus", "l_linestatus", "n"])

    joined = lineitem.select_columns(["l_orderkey", "l_linestatus"]) \
        .map_batches(tag_line, batch_format="pyarrow", batch_size=65536) \
        .union(orders.select_columns(["o_orderkey", "o_orderstatus"])
               .map_batches(tag_order, batch_format="pyarrow",
                            batch_size=65536)) \
        .groupby("part") \
        .map_groups(lambda t: kernel(t.drop_columns(["part"])),
                    batch_format="pyarrow")

    g = partial_groupby_agg(joined, ["o_orderstatus", "l_linestatus"],
                            [("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        os_ = np.asarray(t["o_orderstatus"].combine_chunks()
                         .to_numpy(zero_copy_only=False))
        ls = np.asarray(t["l_linestatus"].combine_chunks()
                        .to_numpy(zero_copy_only=False))
        bad = ((os_ == "F") & (ls != "F")) | ((os_ == "O") & (ls != "O"))
        return pa.table({
            "o_orderstatus": pa.array(os_.tolist(), pa.string()),
            "l_linestatus": pa.array(ls.tolist(), pa.string()),
            "n_lines": pc.cast(t["n_sum"], pa.int64()),
            "violation": pa.array(bad, pa.bool_())})

    return g.map_batches(finish, batch_format="pyarrow")


def events_id_ts_inversions(events: ray.data.Dataset,
                            num_parts: int = 16) -> ray.data.Dataset:
    """(n_users, total_pairs, n_inversions, inv6): per-user ORDERING
    audit — among each user's event pairs, how many have event_id and
    ts in OPPOSITE orders (late-arriving writes, clock skew, id reuse).
    A zero-inversion stream means ids are a safe substitute sort key;
    drift here breaks every events_* window op's tiebreak assumption.

    Scale plan: ONE user-hash exchange; per-user inversion counting is
    an O(k log k) merge count (numpy argsort + a vectorized
    rank-inversion fold per user, k = events-per-user); single tiny
    merge of the integer partials."""
    from ..relational import hash_part, single_merge
    from ..util import round_half_away

    def part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        return pa.table({"user_id": pa.array(uid),
                         "event_id": t["event_id"].combine_chunks(),
                         "ts": pa.array(ts),
                         "part": pa.array(hash_part(uid, num_parts))})

    def count_inv(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        eid = t["event_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy()
        order = np.lexsort((eid, uid))
        uid, eid, ts = uid[order], eid[order], ts[order]
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]]) \
            if len(uid) else np.empty(0, np.int64)
        ends = np.r_[starts[1:], len(uid)]
        n_users = len(starts)
        tot_pairs = 0
        inv = 0
        for s, e in zip(starts, ends):
            k = e - s
            tot_pairs += k * (k - 1) // 2
            seq = ts[s:e]
            # pairs i<j (ascending event_id) with ts[i] > ts[j]: the
            # vectorized k x k upper triangle is fine for bounded
            # per-user k; strictly-greater only (equal ts not inverted)
            inv += int(np.triu(seq[:, None] > seq[None, :], 1).sum())
        return pa.table({
            "n_users": pa.array([n_users], pa.int64()),
            "total_pairs": pa.array([tot_pairs], pa.int64()),
            "n_inversions": pa.array([inv], pa.int64())})

    def finish(t: pa.Table) -> pa.Table:
        nu = int(t["n_users"].combine_chunks().to_numpy().sum())
        tp = int(t["total_pairs"].combine_chunks().to_numpy().sum())
        ni = int(t["n_inversions"].combine_chunks().to_numpy().sum())
        return pa.table({
            "n_users": pa.array([nu], pa.int64()),
            "total_pairs": pa.array([tp], pa.int64()),
            "n_inversions": pa.array([ni], pa.int64()),
            "inv6": pa.array([float(round_half_away(
                np.float64(ni / tp if tp else 0.0), 6))], pa.float64())})

    return single_merge(
        events.select_columns(["user_id", "event_id", "ts"])
        .map_batches(part, batch_format="pyarrow", batch_size=65536)
        .groupby("part")
        .map_groups(lambda t: count_inv(t.drop_columns(["part"])),
                    batch_format="pyarrow"),
        finish)


def session_bounce_rate(events: ray.data.Dataset, gap_s: int = 1800,
                        num_parts: int = 16) -> ray.data.Dataset:
    """(first_type, n_sessions, n_bounce, bounce6): BOUNCE RATE by
    entry event type — sessions (sessionize's gap_s split, ordered by
    ts then event_id) grouped by their FIRST event's type, counting
    single-event sessions. The landing-page quality readout; the SQL
    mirror is the classic window-cumsum session id (gaps-and-islands
    over time).

    Scale plan: sessionize's ONE user-hash exchange + vectorized
    per-partition kernel (boundaries via gap mask, firsts via segment
    starts, lengths via reduceat), bounded (type, counts) partials,
    tiny merge."""
    from ..relational import hash_part, single_merge
    from ..util import round_half_away

    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        return pa.table({"user_id": pa.array(uid), "ts": pa.array(ts),
                         "event_id": t["event_id"].combine_chunks(),
                         "event_type": t["event_type"].combine_chunks(),
                         "part": pa.array(hash_part(uid, num_parts))})

    def kernel(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy()
        eid = t["event_id"].combine_chunks().to_numpy()
        et = np.asarray(t["event_type"].combine_chunks()
                        .to_numpy(zero_copy_only=False))
        order = np.lexsort((eid, ts, uid))
        uid, ts, et = uid[order], ts[order], et[order]
        if not len(uid):
            return pa.table({"first_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        new_sess = np.r_[True, (uid[1:] != uid[:-1])
                         | ((ts[1:] - ts[:-1]) > gap_s * 1_000_000)]
        starts = np.flatnonzero(new_sess)
        lens = np.diff(np.r_[starts, len(uid)])
        first = et[starts]
        bounce = (lens == 1).astype(np.int64)
        g = pa.table({"first_type": pa.array(first.tolist(), pa.string()),
                      "n": pa.array(np.ones(len(first), np.int64)),
                      "b": pa.array(bounce)}) \
            .group_by("first_type").aggregate([("n", "sum"), ("b", "sum")])
        return g.rename_columns(["first_type", "n", "b"])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("first_type").aggregate([("n", "sum"),
                                                ("b", "sum")])
        n = g["n_sum"].combine_chunks().to_numpy()
        b = g["b_sum"].combine_chunks().to_numpy()
        return pa.table({
            "first_type": g["first_type"],
            "n_sessions": pa.array(n.astype(np.int64)),
            "n_bounce": pa.array(b.astype(np.int64)),
            "bounce6": pa.array(round_half_away(
                b.astype(np.float64) / n.astype(np.float64), 6),
                pa.float64())})

    return single_merge(
        events.select_columns(["user_id", "ts", "event_id",
                               "event_type"])
        .map_batches(add_part, batch_format="pyarrow", batch_size=65536)
        .groupby("part")
        .map_groups(lambda t: kernel(t.drop_columns(["part"])),
                    batch_format="pyarrow"),
        finish)


def user_journey_endpoints(events: ray.data.Dataset,
                           num_parts: int = 16) -> ray.data.Dataset:
    """(first_type, last_type, n_users): the JOURNEY-ENDPOINT matrix —
    each user's first and last event type in (ts, event_id) order
    (entry-to-exit flow: signup->purchase cells are conversions,
    view->error cells are rage-quits).

    Scale plan: ONE user-hash exchange; vectorized segment firsts/lasts
    per partition; bounded (type x type) partials, tiny merge."""
    from ..relational import hash_part, single_merge

    def part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy() \
            .astype("datetime64[us]").astype(np.int64)
        return pa.table({"user_id": pa.array(uid), "ts": pa.array(ts),
                         "event_id": t["event_id"].combine_chunks(),
                         "event_type": t["event_type"].combine_chunks(),
                         "part": pa.array(hash_part(uid, num_parts))})

    def kernel(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        ts = t["ts"].combine_chunks().to_numpy()
        eid = t["event_id"].combine_chunks().to_numpy()
        et = np.asarray(t["event_type"].combine_chunks()
                        .to_numpy(zero_copy_only=False))
        order = np.lexsort((eid, ts, uid))
        uid, et = uid[order], et[order]
        if not len(uid):
            return pa.table({"first_type": pa.array([], pa.string()),
                             "last_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], len(uid)] - 1
        g = pa.table({"first_type": pa.array(et[starts].tolist(),
                                             pa.string()),
                      "last_type": pa.array(et[ends].tolist(),
                                            pa.string()),
                      "n": pa.array(np.ones(len(starts), np.int64))}) \
            .group_by(["first_type", "last_type"]) \
            .aggregate([("n", "sum")])
        return g.rename_columns(["first_type", "last_type", "n"])

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["first_type", "last_type"]) \
            .aggregate([("n", "sum")])
        return g.rename_columns(["first_type", "last_type", "n_users"]) \
            .set_column(2, "n_users", pc.cast(g["n_sum"], pa.int64()))

    return single_merge(
        events.select_columns(["user_id", "ts", "event_id",
                               "event_type"])
        .map_batches(part, batch_format="pyarrow", batch_size=65536)
        .groupby("part")
        .map_groups(lambda t: kernel(t.drop_columns(["part"])),
                    batch_format="pyarrow"),
        finish)


def user_error_profile(events: ray.data.Dataset,
                       num_parts: int = 16) -> ray.data.Dataset:
    """(decile, n_users, share6): histogram of per-user ERROR-event
    share in exact integer deciles (decile = (10*errors)//events,
    clipped to 9) — the user-health mix (a fat high-decile tail means
    a broken client cohort). All integer until the final share
    division.

    Scale plan: per-block Acero (user, n, err) partials -> ONE
    user-hash combiner exchange -> per-partition decile partials ->
    tiny merge."""
    from ..relational import hash_part, single_merge
    from ..util import round_half_away

    def pre(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks().to_numpy()
        et = np.asarray(t["event_type"].combine_chunks()
                        .to_numpy(zero_copy_only=False))
        g = pa.table({"user_id": pa.array(uid),
                      "n": pa.array(np.ones(len(uid), np.int64)),
                      "e": pa.array((et == "error").astype(np.int64))}) \
            .group_by("user_id").aggregate([("n", "sum"), ("e", "sum")])
        uid2 = g["user_id"].combine_chunks().to_numpy()
        return pa.table({"user_id": pa.array(uid2),
                         "n": pc.cast(g["n_sum"], pa.int64()),
                         "e": pc.cast(g["e_sum"], pa.int64()),
                         "part": pa.array(hash_part(uid2, num_parts))})

    def deciles(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by("user_id") \
            .aggregate([("n", "sum"), ("e", "sum")])
        n = g["n_sum"].combine_chunks().to_numpy()
        e = g["e_sum"].combine_chunks().to_numpy()
        d = np.minimum((10 * e) // np.maximum(n, 1), 9)
        u, c = np.unique(d, return_counts=True)
        return pa.table({"decile": pa.array(u.astype(np.int64)),
                         "n_users": pa.array(c.astype(np.int64))})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("decile").aggregate([("n_users", "sum")])
        k = g["decile"].combine_chunks().to_numpy()
        order = np.argsort(k)
        n = g["n_users_sum"].combine_chunks().to_numpy()[order]
        tot = int(n.sum())
        return pa.table({
            "decile": pa.array(k[order], pa.int64()),
            "n_users": pa.array(n.astype(np.int64)),
            "share6": pa.array(round_half_away(
                n.astype(np.float64) / float(tot), 6), pa.float64())})

    return single_merge(
        events.select_columns(["user_id", "event_type"])
        .map_batches(pre, batch_format="pyarrow", batch_size=65536)
        .groupby("part").map_groups(deciles, batch_format="pyarrow"),
        merge)
