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
