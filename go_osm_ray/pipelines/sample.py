"""Deterministic sampling + sample-based quantiles over a Dataset.

A 100 TB training-data pipeline needs samples that are (a) shuffle-free
— a sample must never cost an all-to-all exchange, (b) restart-stable —
re-running a failed job must pick the SAME rows regardless of block
composition, and (c) oracle-checkable.  All three follow from keying
every decision on ``md5_num_lower(id)`` (util.py), the same hash DuckDB
evaluates as ``md5_number_lower(CAST(id AS VARCHAR))``:

- ``deterministic_sample`` — Bernoulli p%% sample: keep iff
  ``hash %% mod < pct``.  One embarrassingly-parallel filter; the
  sampled fraction is exact in expectation and independent of
  partitioning.  (The reference has no sampling; its closest analog is
  the whole-file filter pass, /root/reference/osm/Planet.go:447-470.)
- ``stratified_sample`` — per-group rates (e.g. downsample dominant
  languages, keep the tail): the rate is looked up per row from a tiny
  rate map; same single filter pass, no groupby.
- ``priority_sample`` — exact fixed-size uniform-without-replacement
  n-sample as a COMBINER: each block keeps its n smallest
  (hash, id) rows, one bounded merge keeps the global n smallest —
  O(n x blocks) through the exchange, never the data.  Equivalent to
  ``ORDER BY hash LIMIT n`` without the global sort.
- ``approx_quantiles`` — quantiles of a deterministic priority sample.
  With ``sample_n = 101``-style sizes every requested q lands on an
  integer sample index, so the sample quantile is an exact order
  statistic both numpy and DuckDB's ``quantile_cont`` reproduce
  bit-identically (no interpolation-formula drift), while the value is
  a true approximate quantile of the full data (error ~O(1/sqrt(n))).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pyarrow as pa
import ray.data

from ..relational import single_merge
from ..util import md5_num_lower, round_half_away


def deterministic_sample(ds: ray.data.Dataset, id_col: str, pct: int,
                         mod: int = 100) -> ray.data.Dataset:
    """Keep rows with ``md5_num_lower(id) % mod < pct``."""
    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        m = (md5_num_lower(ids) % np.uint64(mod)) < np.uint64(pct)
        return t.filter(pa.array(m))
    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds: ray.data.Dataset, id_col: str, group_col: str,
                      rates: dict[str, int], default_pct: int,
                      mod: int = 100) -> ray.data.Dataset:
    """Per-group Bernoulli rates: keep iff ``hash(id) % mod <
    rates.get(group, default_pct)``.  The rate map is a per-batch
    dictionary lookup over the group column's UNIQUE values — no
    shuffle, no broadcast object (the map travels in the closure; it is
    a handful of entries by construction)."""
    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        enc = t[group_col].combine_chunks().dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        thr = np.fromiter((rates.get(u, default_pct) for u in uniq),
                          np.uint64, len(uniq))
        per_row = thr[np.asarray(enc.indices, np.int64)] if len(t) \
            else np.zeros(0, np.uint64)
        m = (md5_num_lower(ids) % np.uint64(mod)) < per_row
        return t.filter(pa.array(m))
    return ds.map_batches(keep, batch_format="pyarrow")


def _bottom_n(t: pa.Table, id_col: str, n: int) -> pa.Table:
    ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    prio = t["_prio"].combine_chunks().to_numpy(zero_copy_only=False) \
        .astype(np.uint64)
    order = np.lexsort((ids, prio))[:n]
    return t.take(pa.array(order))


def priority_sample(ds: ray.data.Dataset, id_col: str, n: int,
                    keep_prio: bool = False) -> ray.data.Dataset:
    """The n rows with globally smallest (md5_num_lower(id), id) —
    an exact uniform n-sample.  Per-block bottom-n partials, one
    bounded merge (O(n x blocks) rows, guarded by single_merge)."""
    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        prio = md5_num_lower(ids)
        order = np.lexsort((ids, prio))[:n]
        return t.take(pa.array(order)).append_column(
            "_prio", pa.array(prio[order]))

    def merge(t: pa.Table) -> pa.Table:
        out = _bottom_n(t, id_col, n)
        return out if keep_prio else out.drop_columns(["_prio"])

    return single_merge(ds.map_batches(partial, batch_format="pyarrow"),
                        merge)


def approx_quantiles(ds: ray.data.Dataset, col: str, id_col: str,
                     qs: Sequence[float] = (0.5, 0.9, 0.99),
                     sample_n: int = 101) -> ray.data.Dataset:
    """(q, val6): quantiles of ``col`` over a deterministic
    ``priority_sample`` of ``sample_n`` rows.  Choose ``sample_n`` so
    that ``q * (sample_n - 1)`` is integral for every q (101 works for
    percent-grid qs): the quantile is then an exact order statistic —
    no interpolation, so numpy and ``quantile_cont`` agree exactly."""
    qs = [float(q) for q in qs]
    sample = priority_sample(ds.select_columns([id_col, col]), id_col,
                             sample_n)

    def qmerge(t: pa.Table) -> pa.Table:
        v = np.sort(t[col].combine_chunks().to_numpy(zero_copy_only=False)
                    .astype(np.float64))
        vals = np.quantile(v, qs, method="linear") if len(v) \
            else np.full(len(qs), np.nan)
        return pa.table({
            "q": pa.array(qs, pa.float64()),
            "val6": pa.array(round_half_away(vals, 6), pa.float64()),
        })
    return single_merge(sample, qmerge)


def _group_bottom_n(t: pa.Table, group_col: str, id_col: str, n: int,
                    prio: np.ndarray) -> pa.Table:
    """First ``n`` rows per group by (prio, id) — one lexsort + a
    run-position mask, no per-group python."""
    gv = t[group_col].combine_chunks()
    enc = gv.dictionary_encode()
    g = np.asarray(enc.indices, np.int64)
    ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, prio, g))
    gs = g[order]
    run_start = np.r_[True, gs[1:] != gs[:-1]]
    starts = np.flatnonzero(run_start)
    pos_in_run = np.arange(len(gs)) - np.repeat(starts, np.diff(
        np.r_[starts, len(gs)]))
    return t.take(pa.array(order[pos_in_run < n]))


def grouped_quantiles(ds: ray.data.Dataset, col: str, group_col: str,
                      id_col: str, qs: Sequence[float] = (0.5, 0.9),
                      sample_n: int = 101) -> ray.data.Dataset:
    """(group, q, val6): per-group quantiles over per-group
    deterministic ``sample_n``-samples (smallest (md5_num_lower(id),
    id) per group).  Per-block per-group bottom-n partials, one bounded
    merge (group space assumed bounded, like every single_merge site).
    Same integer-order-statistic pinning as ``approx_quantiles`` —
    exact vs ``quantile_cont`` whenever a group has >= sample_n rows
    (smaller groups fall back to linear interpolation, which both
    engines define identically)."""
    qs = [float(q) for q in qs]

    def partial(t: pa.Table) -> pa.Table:
        sub = t.select([group_col, id_col, col])
        ids = sub[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        prio = md5_num_lower(ids)
        out = _group_bottom_n(sub, group_col, id_col, sample_n, prio)
        pout = md5_num_lower(
            out[id_col].combine_chunks().to_numpy(zero_copy_only=False))
        return out.append_column("_prio", pa.array(pout))

    def merge(t: pa.Table) -> pa.Table:
        prio = t["_prio"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        top = _group_bottom_n(t, group_col, id_col, sample_n, prio)
        gv = top[group_col].combine_chunks()
        enc = gv.dictionary_encode()
        g = np.asarray(enc.indices, np.int64)
        vals = top[col].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        groups, out_q, out_v = [], [], []
        for gi in range(len(enc.dictionary)):  # bounded group space
            gvals = np.sort(vals[g == gi])
            res = np.quantile(gvals, qs, method="linear")
            groups += [enc.dictionary[gi].as_py()] * len(qs)
            out_q += qs
            out_v += list(round_half_away(res, 6))
        return pa.table({
            group_col: pa.array(groups, gv.type),
            "q": pa.array(out_q, pa.float64()),
            "val6": pa.array(out_v, pa.float64()),
        })

    parts = ds.select_columns([group_col, id_col, col]) \
        .map_batches(partial, batch_format="pyarrow")
    return single_merge(parts, merge)


def mixture_rates(ds: ray.data.Dataset, weights: dict[str, float],
                  budget_frac: float, group_col: str = "source",
                  size_col: str = "n_chars",
                  mod: int = 1000) -> dict[str, int]:
    """Per-group integer keep thresholds realizing a target corpus
    MIXTURE: group ``g`` should contribute ``weights[g]`` of a total
    budget of ``budget_frac`` x the corpus size (in ``size_col`` units,
    e.g. chars as the token proxy).  rate_g = min(1, target_g /
    available_g); the returned thresholds plug into the md5 Bernoulli
    filter (``thr_g = floor(rate_g * mod)``, keep iff ``hash % mod <
    thr_g``), keeping the sample shuffle-free, restart-stable and
    oracle-checkable like every sampler here.

    The availability aggregate is a per-block Acero partial over the
    BOUNDED group key space (a handful of sources) -> one guarded merge
    -> a tiny driver collect (len(weights) rows).  Groups without a
    weight get threshold 0 (dropped) — the mixture defines the corpus.

    Float discipline: rate is computed as ``(w * budget_frac * total) /
    avail * mod`` in exactly that association on BOTH sides (numpy here,
    the SQL mirror in oracle.py), so the floor can't straddle a
    libm-difference boundary."""
    def partial(t: pa.Table) -> pa.Table:
        g = t.select([group_col, size_col]).group_by(group_col) \
            .aggregate([(size_col, "sum")])
        return g.rename_columns([group_col, "sz"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(group_col).aggregate([("sz", "sum")])
        return g.rename_columns([group_col, "sz"])

    import ray as _ray
    refs = single_merge(ds.map_batches(partial, batch_format="pyarrow"),
                        merge).to_arrow_refs()
    avail_t = pa.concat_tables(
        t.replace_schema_metadata(None) for t in _ray.get(refs)
        if t.num_rows)
    avail = dict(zip(avail_t[group_col].to_pylist(),
                     (float(x) for x in avail_t["sz"].to_pylist())))
    total = float(sum(avail.values()))
    thr: dict[str, int] = {}
    for g, a in avail.items():
        w = weights.get(g)
        if w is None or a <= 0:
            thr[g] = 0
            continue
        rate = (w * budget_frac * total) / a
        thr[g] = int(np.floor(min(1.0, rate) * mod))
    return thr


def mixture_sample(ds: ray.data.Dataset, weights: dict[str, float],
                   budget_frac: float, id_col: str = "doc_id",
                   group_col: str = "source", size_col: str = "n_chars",
                   mod: int = 1000) -> ray.data.Dataset:
    """Rebalance the corpus to a target per-group mixture: compute the
    per-group thresholds (one bounded aggregate pass), then one
    embarrassingly-parallel md5-Bernoulli filter — the data-mixing step
    of a training pipeline (downsample the dominant web crawl, keep all
    of the small high-quality sources) at two narrow passes total."""
    thr = mixture_rates(ds, weights, budget_frac, group_col, size_col, mod)
    return stratified_sample(ds, id_col, group_col, rates=thr,
                             default_pct=0, mod=mod)


def source_quota_sample(ds: ray.data.Dataset, id_col: str,
                        group_col: str, k: int,
                        num_parts: int = 16) -> ray.data.Dataset:
    """(group, id, rk, ...): per-group quota cap — at most ``k`` rows
    per ``group_col`` value, chosen as the k smallest
    ``(md5_num_lower(id), id)`` within the group (restart-stable,
    partition-independent), with the within-group rank ``rk`` (1..k).
    The domain-cap / per-source-quota step of a crawl-curation
    pipeline: no single domain may dominate the corpus.

    Scale plan: each block keeps at most k rows PER GROUP PRESENT IN
    THE BLOCK (vectorized grouped bottom-k via lexsort + run starts),
    so the exchange carries O(groups x blocks x k) partial rows, never
    the data; ONE bounded hash exchange on the group co-locates each
    group's partials and the same kernel re-selects the exact global
    per-group bottom-k.  SQL mirror: ``QUALIFY row_number() OVER
    (PARTITION BY group ORDER BY md5_number_lower(id), id) <= k``."""
    from ..relational import _col_hash, hash_part

    def grouped_bottom_k(t: pa.Table, final: bool) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        if not len(ids):
            return (t.append_column("rk", pa.array([], pa.int64()))
                    if final else t)
        prio = md5_num_lower(ids)
        enc = t[group_col].combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices, np.int64)
        order = np.lexsort((ids, prio, codes))
        c_s = codes[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
        rank = np.arange(len(c_s)) - np.repeat(starts,
                                               np.diff(np.r_[starts,
                                                             len(c_s)]))
        keep = order[rank < k]
        out = t.take(pa.array(keep))
        if final:
            out = out.append_column(
                "rk", pa.array(rank[rank < k] + 1, pa.int64()))
        return out

    def partial(t: pa.Table) -> pa.Table:
        out = grouped_bottom_k(t, final=False)
        return out.append_column(
            "part", pa.array(hash_part(_col_hash(out[group_col]),
                                       num_parts)))

    return ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=65536) \
        .groupby("part") \
        .map_groups(lambda t: grouped_bottom_k(
            t.drop_columns(["part"]), final=True),
            batch_format="pyarrow")
