"""Vectorized point-in-polygon with a geocell grid index.

Realizes the reference's vestigial R-tree ambition
(/root/reference/osm/Planet.go:36,50 — allocated, never queried) as the
stateful index loaded once per actor (stages load a ``PolygonIndex`` via
a single ``ray.put`` ref in ``__init__``).

Containment rule: even-odd ray casting with the exact edge test

    ((y1 > py) != (y2 > py)) and (px < (x2 - x1) * (py - y1) / (y2 - y1) + x1)

evaluated in IEEE float64 with this exact operation order, so the DuckDB
oracle (same expression in SQL) is bit-identical.  Candidate generation is
a geocell bucket lookup (cells covering each polygon's bbox at ``grid_res``)
— the single-shard analog of sharding polygons by cell prefix across a
cluster (SURVEY §7.3); no per-point polygon scan.
"""

from __future__ import annotations

import numpy as np

from . import tiles


class PolygonIndex:
    """Flat-array polygon set + cell-bucket candidate index (picklable)."""

    def __init__(self, feature_ids: np.ndarray, xs: list[np.ndarray],
                 ys: list[np.ndarray], grid_res: int = 12):
        self.feature_ids = np.asarray(feature_ids, np.int64)
        counts = np.array([len(a) for a in xs], np.int64)
        self.offsets = np.zeros(len(xs) + 1, np.int64)
        np.cumsum(counts, out=self.offsets[1:])
        self.vx = np.concatenate(xs) if xs else np.empty(0)
        self.vy = np.concatenate(ys) if ys else np.empty(0)
        self.grid_res = grid_res
        self.minx = np.array([a.min() if len(a) else np.nan for a in xs])
        self.maxx = np.array([a.max() if len(a) else np.nan for a in xs])
        self.miny = np.array([a.min() if len(a) else np.nan for a in ys])
        self.maxy = np.array([a.max() if len(a) else np.nan for a in ys])
        buckets: dict[int, list[int]] = {}
        for p in range(len(xs)):
            for c in tiles.cells_covering_bbox(self.minx[p], self.miny[p],
                                               self.maxx[p], self.maxy[p], grid_res):
                buckets.setdefault(int(c), []).append(p)
        self.buckets = {c: np.array(v, np.int64) for c, v in buckets.items()}

    def __len__(self) -> int:
        return len(self.feature_ids)

    def candidates(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(point_idx, poly_idx) candidate pairs via grid bucket lookup."""
        cells = tiles.cell_id(px, py, self.grid_res)
        pis, gis = [], []
        for i, c in enumerate(cells):
            b = self.buckets.get(int(c))
            if b is not None:
                pis.append(np.full(len(b), i, np.int64))
                gis.append(b)
        if not pis:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(pis), np.concatenate(gis)

    def contains_pairs(self, px: np.ndarray, py: np.ndarray,
                       pi: np.ndarray, gi: np.ndarray) -> np.ndarray:
        """Boolean per candidate pair: point pi inside polygon gi (even-odd)."""
        if len(pi) == 0:
            return np.empty(0, bool)
        ecnt = (self.offsets[gi + 1] - self.offsets[gi]) - 1  # edges per pair
        pair_off = np.zeros(len(pi) + 1, np.int64)
        np.cumsum(ecnt, out=pair_off[1:])
        total = pair_off[-1]
        # flat edge index: for each pair, offsets[gi] + 0..ecnt-1
        rep_pair = np.repeat(np.arange(len(pi)), ecnt)
        within = np.arange(total) - pair_off[rep_pair]
        e0 = self.offsets[gi][rep_pair] + within
        x1, y1 = self.vx[e0], self.vy[e0]
        x2, y2 = self.vx[e0 + 1], self.vy[e0 + 1]
        ppx = px[pi][rep_pair]
        ppy = py[pi][rep_pair]
        cond = (y1 > ppy) != (y2 > ppy)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (ppy - y1) / (y2 - y1) + x1
        cross = cond & (ppx < xint)
        csum = np.zeros(total + 1, np.int64)
        np.cumsum(cross, out=csum[1:])
        crossings = csum[pair_off[1:]] - csum[pair_off[:-1]]
        return (crossings % 2) == 1

    def query(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(point_idx, feature_id) for every containment match."""
        pi, gi = self.candidates(px, py)
        inside = self.contains_pairs(px, py, pi, gi)
        return pi[inside], self.feature_ids[gi[inside]]
