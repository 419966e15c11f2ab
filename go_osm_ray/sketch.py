"""Mergeable sketches for approximate aggregation at 100 TB scale.

HyperLogLog distinct counting as a Ray-Data combiner: every block
collapses to one (group, registers) row — registers are an elementwise-
max-mergeable uint8 vector — so the exchange moves O(groups x blocks x
2^p bytes) regardless of input rows, and the final merge is elementwise
max + the standard HLL estimator. This is the sketch-shaped custom
operator family the reference has no analog for (its summarize counts
distincts exactly in one heap, /root/reference/osm/Summary.go:8-40).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a well-distributed 64-bit hash of int ids."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + _C1
        z = (z ^ (z >> np.uint64(30))) * _C2
        z = (z ^ (z >> np.uint64(27))) * _C3
        return z ^ (z >> np.uint64(31))


def hll_registers(ids: np.ndarray, p: int = 12) -> np.ndarray:
    """One HLL register vector (2^p uint8) for a batch of ids."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    if not len(ids):
        return regs
    h = _mix64(ids)
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    # rho = leading-zero count of w within its (64-p)-bit window + 1
    # (w < 2^52 for p >= 12, so float64 log2 is exact at powers of two)
    lg = np.full(len(w), -1.0)
    nz = w > 0
    lg[nz] = np.floor(np.log2(w[nz].astype(np.float64)))
    rho = ((64 - p) - lg).astype(np.uint8)  # w==0 -> max rho (65-p)
    np.maximum.at(regs, bucket, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range linear-counting
    correction (Flajolet et al. 2007)."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds: ray.data.Dataset, group_col: str, id_col: str,
                    p: int = 12) -> ray.data.Dataset:
    """(group, approx_n) approximate distinct ``id_col`` per group.
    Per-block sketch partials (one register row per group per block),
    merged by elementwise max in one guarded task — the group space is
    assumed bounded (like every single_merge site); for unbounded
    groups swap the merge for a groupby(group) over the same partials.
    Standard error ~1.04/sqrt(2^p) (~1.6% at p=12)."""
    from .relational import single_merge

    def partial(t: pa.Table) -> pa.Table:
        g = t[group_col].combine_chunks()
        ids = t[id_col].combine_chunks().to_numpy()
        gv = np.asarray(g.to_pylist(), object)
        keys, out = [], []
        for k in pd.unique(gv):
            keys.append(k)
            out.append(hll_registers(ids[gv == k], p))
        return pa.table({
            group_col: pa.array(keys, g.type),
            "regs": pa.array([r.tobytes() for r in out], pa.binary()),
        })

    def merge(t: pa.Table) -> pa.Table:
        gv = np.asarray(t[group_col].to_pylist(), object)
        blobs = t["regs"].to_pylist()
        keys, ests = [], []
        for k in pd.unique(gv):
            regs = np.zeros(1 << p, np.uint8)
            for b in np.flatnonzero(gv == k):
                regs = np.maximum(regs, np.frombuffer(blobs[b], np.uint8))
            keys.append(k)
            ests.append(int(round(hll_estimate(regs))))
        return pa.table({group_col: pa.array(keys, t[group_col].type),
                         "approx_n": pa.array(ests, pa.int64())})

    parts = ds.select_columns([group_col, id_col]) \
        .map_batches(partial, batch_format="pyarrow")
    return single_merge(parts, merge)


# ---------------------------------------------------------------------------
# Count-min-sketch heavy hitters over an UNBOUNDED key space (top words
# of a 100 TB corpus): even one partial row per key per block is too
# much when blocks hold millions of distinct keys, so each block emits a
# FIXED-size state — a depth x width count matrix (sum-mergeable) plus
# its local top candidates — and the merge estimates every candidate
# from the summed sketch.  est >= true always; est <= true + eps*N with
# eps ~ 2/width per depth row (Cormode & Muthukrishnan 2005).
# ---------------------------------------------------------------------------

_CMS_SEEDS = (0x1234567, 0x89ABCDE, 0x5F5E10F, 0x2718281)


def _crc_hash(vals: list[str]) -> np.ndarray:
    import zlib
    return np.fromiter((zlib.crc32(str(v).encode()) for v in vals),
                       np.uint64, len(vals))


def _cms_rows(h: np.ndarray, depth: int, width: int) -> list[np.ndarray]:
    return [(_mix64(h + np.uint64(_CMS_SEEDS[i])) % np.uint64(width))
            .astype(np.int64) for i in range(depth)]


def cms_heavy_hitters(ds: ray.data.Dataset, col: str, k: int = 20,
                      width: int = 8192, depth: int = 4,
                      cand: int = 128) -> ray.data.Dataset:
    """(value, est_n): the top-k values of ``col`` by count-min-sketch
    estimate.  Per block: one Acero group_by collapses rows to (value,
    n) pairs, the pairs feed a depth x width CMS and the block's top
    ``cand`` pairs ride along as candidates.  One guarded merge sums the
    sketches (exact: CMS cells are sums), unions candidates and ranks
    them by sketch estimate.  A block's true heavy hitter is always in
    its candidate list, so any global top-k value survives in at least
    every block where it is locally top-``cand``."""
    def partial(t: pa.Table) -> pa.Table:
        g = t.select([col]).group_by([col]).aggregate([([], "count_all")])
        vals = g[col].to_pylist()
        ns = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        cms = np.zeros((depth, width), np.int64)
        if len(vals):
            rows = _cms_rows(_crc_hash(vals), depth, width)
            for i in range(depth):
                np.add.at(cms[i], rows[i], ns)
        top = np.argsort(-ns, kind="stable")[:cand]
        return pa.table({
            "cand": pa.array([[vals[i] for i in top]],
                             pa.list_(pa.string())),
            "cms": pa.array([cms.tobytes()], pa.binary()),
        })

    def merge(t: pa.Table) -> pa.Table:
        cms = np.zeros((depth, width), np.int64)
        for b in t["cms"].to_pylist():
            cms += np.frombuffer(b, np.int64).reshape(depth, width)
        cands = sorted({v for lst in t["cand"].to_pylist() for v in lst})
        if not cands:
            return pa.table({"value": pa.array([], pa.string()),
                             "est_n": pa.array([], pa.int64())})
        rows = _cms_rows(_crc_hash(cands), depth, width)
        est = np.min(np.stack([cms[i][rows[i]] for i in range(depth)]),
                     axis=0)
        order = np.lexsort((np.asarray(cands, object), -est))[:k]
        return pa.table({
            "value": pa.array([cands[i] for i in order], pa.string()),
            "est_n": pa.array(est[order], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")
    from .relational import single_merge as _sm
    return _sm(parts, merge)
