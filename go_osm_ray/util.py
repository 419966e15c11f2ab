"""Shared numeric/SQL helpers keeping engine and DuckDB oracle bit-identical.

Rounding is the classic source of oracle drift: numpy's np.round is
half-to-even while DuckDB's ROUND is half-away-from-zero, and both apply
different internal scaling.  We sidestep both by defining ONE rounding
formula and evaluating it with identical IEEE-double operations on both
sides:

    x >= 0:  floor(x * 10^nd + 0.5) / 10^nd
    x <  0:  ceil(x * 10^nd - 0.5) / 10^nd

``round_half_away`` (numpy/arrow) and ``sql_round`` (SQL text) are exact
mirrors of each other.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def round_half_away(values, nd: int):
    """Half-away-from-zero rounding; accepts numpy array / arrow array /
    scalar, returns the same family (arrow in -> arrow out)."""
    is_arrow = isinstance(values, (pa.Array, pa.ChunkedArray))
    if is_arrow:
        arr = values.combine_chunks().to_numpy(zero_copy_only=False) \
            if isinstance(values, pa.ChunkedArray) else values.to_numpy(zero_copy_only=False)
    else:
        arr = values
    scalar = np.isscalar(arr) or getattr(arr, "ndim", 1) == 0
    x = np.asarray(arr, np.float64)
    s = float(10 ** nd)
    out = np.where(x >= 0, np.floor(x * s + 0.5) / s, np.ceil(x * s - 0.5) / s)
    if is_arrow:
        return pa.array(out)
    return float(out) if scalar else out


def default_pool(cap: int = 16) -> int:
    """Fixed actor-pool size for heavy stages: leave ~2 CPUs for the read
    and driver, cap to ``cap``. Fixed pools beat (min, max) autoscaling
    here — measured: autoscaling pools stayed near min and left the
    machine idle."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return max(2, min(cap, cpus - 2))


def md5_num_lower(ids) -> np.ndarray:
    """uint64 per id matching DuckDB ``md5_number_lower(CAST(id AS
    VARCHAR))`` — little-endian bytes 8:16 of md5(str(id)).  The ONE
    deterministic row-hash both the engine and the SQL oracle can
    evaluate identically, so hash-driven sampling/splitting is
    restart-stable AND oracle-checkable.  (hashlib has no vectorized
    form; ~1e6 ids/s/core — sampling decisions read only the id column,
    so at 100 TB this is a narrow single-column scan, not a row scan.)"""
    import hashlib
    a = np.asarray(ids)
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:], "little")
         for i in a),
        np.uint64, len(a))


def sql_md5_num_lower(id_expr: str) -> str:
    """SQL mirror of ``md5_num_lower``."""
    return f"md5_number_lower(CAST({id_expr} AS VARCHAR))"


def sql_round(expr: str, nd: int) -> str:
    """SQL mirror of ``round_half_away`` (same op order, same constants)."""
    s = float(10 ** nd)
    return (f"(CASE WHEN ({expr}) >= 0 THEN FLOOR(({expr}) * {s!r} + 0.5) / {s!r} "
            f"ELSE CEIL(({expr}) * {s!r} - 0.5) / {s!r} END)")
