"""Raster <-> vector operators (north_rule: "raster<->vector" alongside
H3/S2, PIP and kNN).

The reference declares the tiling ambition but never rasterizes
(``Node.Tile``, /root/reference/osm/Node.go:26-33, is dead code); web-map
practice downstream of a go-osm export is tile rendering — so the graft
realizes it Ray-Data-first:

* ``rasterize_tiles`` (vector -> raster): every point lands in a
  ``grid`` x ``grid`` pixel of its zoom-``z`` slippy tile; output is the
  SPARSE raster (tile_x, tile_y, px, py, n) — at web scale most pixels
  of most tiles are empty, so dense grids would ship mostly zeros
  through the shuffle.  Physical plan is the repo's standard combiner
  exchange: per-block Acero group_by partials -> hash-partition on the
  packed global pixel -> per-partition Acero merge.  No per-key Ray
  aggregate, no single merge task; the exchange payload is one row per
  DISTINCT touched pixel per block, already collapsed.
* ``raster_to_features`` (raster -> vector): thresholded pixels back to
  vector point features at the pixel center (lon, lat, value) — the
  hotspot-extraction step that feeds a vector layer from a heatmap.
  Embarrassingly parallel over the sparse raster; no shuffle.
* ``pack_tile_grids``: the dense per-tile raster product (uint32
  ``grid`` x ``grid`` row-major bytes per tile) for a renderer sink;
  groups the sparse raster by tile inside the already-partitioned
  exchange output.

Pixel math == tile math at zoom ``z + log2(grid)`` (one floor of the
same Web-Mercator formula, so the DuckDB mirror is sql_tile_x/y at the
deeper zoom; tile = gx >> log2(grid) and pixel = gx & (grid-1) are exact
integer ops on both sides).  The pixel-center latitude uses
``(exp(v) - exp(-v)) / 2`` explicitly (not np.sinh) because DuckDB has
no sinh — both sides share the formula, and lat/lon are rounded to 6dp
(the repo's float-gate convention) so 1-ulp libm differences cannot
surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..geo import tiles
from ..relational import hash_part

NUM_PARTS = 32


def _pixel_key(t: pa.Table, z: int, kbits: int,
               lon_col: str, lat_col: str) -> np.ndarray:
    """Packed global pixel id: tile math at zoom z+kbits, one int64."""
    lon = t[lon_col].combine_chunks().to_numpy()
    lat = t[lat_col].combine_chunks().to_numpy()
    gx, gy = tiles.tile_xy(lon, lat, z + kbits)
    return (gx << np.int64(z + kbits + 1)) | gy


def rasterize_tiles(pts: ray.data.Dataset, z: int = 10, grid: int = 64,
                    lon_col: str = "lon", lat_col: str = "lat",
                    num_parts: int = NUM_PARTS) -> ray.data.Dataset:
    """Sparse zoom-``z`` raster of point counts at ``grid``x``grid``
    pixels per tile: (tile_x, tile_y, px, py, n), one row per touched
    pixel."""
    kbits = int(np.log2(grid))
    if (1 << kbits) != grid:
        raise ValueError(f"grid must be a power of two, got {grid}")

    def partial(t: pa.Table) -> pa.Table:
        key = _pixel_key(t, z, kbits, lon_col, lat_col)
        g = pa.table({"pix": pa.array(key)}).group_by("pix") \
            .aggregate([([], "count_all")])
        k = g["pix"].combine_chunks().to_numpy()
        return pa.table({
            "pix": g["pix"],
            "pn": pc.cast(g["count_all"], pa.int64()),
            "part": pa.array(hash_part(k, num_parts)),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by("pix").aggregate([("pn", "sum")])
        pix = g["pix"].combine_chunks().to_numpy()
        gx = pix >> np.int64(z + kbits + 1)
        gy = pix & np.int64((1 << (z + kbits + 1)) - 1)
        return pa.table({
            "tile_x": pa.array(gx >> np.int64(kbits)),
            "tile_y": pa.array(gy >> np.int64(kbits)),
            "px": pa.array(gx & np.int64(grid - 1)),
            "py": pa.array(gy & np.int64(grid - 1)),
            "n": pc.cast(g["pn_sum"], pa.int64()),
        })

    return pts.map_batches(partial, batch_format="pyarrow") \
        .groupby("part").map_groups(merge, batch_format="pyarrow")


def raster_to_features(raster: ray.data.Dataset, z: int, grid: int,
                       min_n: int = 2) -> ray.data.Dataset:
    """Vectorize hotspot pixels: rows with n >= ``min_n`` become point
    features at the pixel center — (tile_x, tile_y, px, py, n, lon6,
    lat6).  Pure per-batch math; streams."""
    kbits = int(np.log2(grid))
    nglob = float(1 << (z + kbits))

    def vectorize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n"], min_n))
        gx = (t["tile_x"].combine_chunks().to_numpy() << np.int64(kbits)) \
            | t["px"].combine_chunks().to_numpy()
        gy = (t["tile_y"].combine_chunks().to_numpy() << np.int64(kbits)) \
            | t["py"].combine_chunks().to_numpy()
        lon = (gx + 0.5) / nglob * 360.0 - 180.0
        v = np.pi * (1.0 - 2.0 * (gy + 0.5) / nglob)
        # explicit (e^v - e^-v)/2: DuckDB has no sinh, both sides share
        # this exact form (module docstring)
        lat = np.degrees(np.arctan((np.exp(v) - np.exp(-v)) / 2.0))
        from ..util import round_half_away
        return t.append_column("lon6", pa.array(round_half_away(lon, 6))) \
                .append_column("lat6", pa.array(round_half_away(lat, 6)))

    return raster.map_batches(vectorize, batch_format="pyarrow")


def tile_pyramid(raster: ray.data.Dataset, z: int, z_min: int,
                 grid: int, num_parts: int = NUM_PARTS) -> ray.data.Dataset:
    """Hierarchical rollup: from the zoom-``z`` sparse raster, the FULL
    pyramid of coarser levels ``z-1 .. z_min`` — the tile-pyramid build
    every map renderer runs after rasterization.  Each level halves the
    global pixel ids, so one pass emits every ancestor level per row
    (level count is small and fixed: z - z_min), then ONE exchange merges
    all levels at once — partitioned by (level, pixel) hash, never a
    per-level shuffle cascade.  Output: (zoom, tile_x, tile_y, px, py, n)
    for zoom in [z_min, z-1]."""
    kbits = int(np.log2(grid))
    levels = z - z_min
    if levels <= 0:
        raise ValueError("z_min must be < z")

    def partial(t: pa.Table) -> pa.Table:
        gx = (t["tile_x"].combine_chunks().to_numpy() << np.int64(kbits)) \
            | t["px"].combine_chunks().to_numpy()
        gy = (t["tile_y"].combine_chunks().to_numpy() << np.int64(kbits)) \
            | t["py"].combine_chunks().to_numpy()
        n = t["n"].combine_chunks().to_numpy()
        zs, xs, ys, ns = [], [], [], []
        for d in range(1, levels + 1):
            zs.append(np.full(len(n), z - d, np.int64))
            xs.append(gx >> np.int64(d))
            ys.append(gy >> np.int64(d))
            ns.append(n)
        zc = np.concatenate(zs)
        xc = np.concatenate(xs)
        yc = np.concatenate(ys)
        key = (zc << np.int64(58)) | (xc << np.int64(29)) | yc
        g = pa.table({"key": pa.array(key), "pn": pa.array(np.concatenate(ns))}) \
            .group_by("key").aggregate([("pn", "sum")])
        k = g["key"].combine_chunks().to_numpy()
        return pa.table({"key": g["key"],
                         "pn": pc.cast(g["pn_sum"], pa.int64()),
                         "part": pa.array(hash_part(k, num_parts))})

    def merge(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by("key").aggregate([("pn", "sum")])
        key = g["key"].combine_chunks().to_numpy()
        zc = key >> np.int64(58)
        gx = (key >> np.int64(29)) & np.int64((1 << 29) - 1)
        gy = key & np.int64((1 << 29) - 1)
        return pa.table({
            "zoom": pa.array(zc),
            "tile_x": pa.array(gx >> np.int64(kbits)),
            "tile_y": pa.array(gy >> np.int64(kbits)),
            "px": pa.array(gx & np.int64(grid - 1)),
            "py": pa.array(gy & np.int64(grid - 1)),
            "n": pc.cast(g["pn_sum"], pa.int64()),
        })

    return raster.map_batches(partial, batch_format="pyarrow") \
        .groupby("part").map_groups(merge, batch_format="pyarrow")


def pack_tile_grids(raster: ray.data.Dataset, grid: int,
                    num_parts: int = NUM_PARTS) -> ray.data.Dataset:
    """Dense per-tile rasters for a renderer sink: (tile_x, tile_y,
    grid_bytes) with ``grid``x``grid`` row-major uint32 counts.  The
    sparse raster re-partitions by TILE (coarser than the pixel exchange
    key, so a tile's pixels meet in one partition) and each partition
    scatters its rows into the dense grids."""
    def partial(t: pa.Table) -> pa.Table:
        tx = t["tile_x"].combine_chunks().to_numpy()
        ty = t["tile_y"].combine_chunks().to_numpy()
        key = (tx << np.int64(32)) | ty
        return t.append_column("part", pa.array(hash_part(key, num_parts)))

    def pack(t: pa.Table) -> pa.Table:
        tx = t["tile_x"].combine_chunks().to_numpy()
        ty = t["tile_y"].combine_chunks().to_numpy()
        key = (tx << np.int64(32)) | ty
        order = np.argsort(key, kind="stable")
        uniq, starts = np.unique(key[order], return_index=True)
        bounds = np.append(starts, len(key))
        px = t["px"].combine_chunks().to_numpy()[order]
        py = t["py"].combine_chunks().to_numpy()[order]
        n = t["n"].combine_chunks().to_numpy()[order]
        blobs = []
        for i in range(len(uniq)):
            dense = np.zeros(grid * grid, np.uint32)
            s, e = bounds[i], bounds[i + 1]
            dense[py[s:e] * grid + px[s:e]] = n[s:e]
            blobs.append(dense.tobytes())
        return pa.table({
            "tile_x": pa.array(uniq >> np.int64(32)),
            "tile_y": pa.array(uniq & np.int64((1 << 32) - 1)),
            "grid_bytes": pa.array(blobs, pa.binary()),
        })

    return raster.map_batches(partial, batch_format="pyarrow") \
        .groupby("part").map_groups(pack, batch_format="pyarrow")


def zonal_stats(raster: ray.data.Dataset, index_ref,
                z: int, grid: int,
                concurrency: int | tuple[int, int] | None = None,
                batch_size: int = 8192) -> ray.data.Dataset:
    """Per-polygon zonal statistics — the classic raster x vector
    overlay: every touched pixel's CENTER is point-in-polygon tagged
    against the broadcast polygon layer, then per-feature partials merge
    to (feature_id, n_pixels, pts_sum, n_max, mean6).

    mean6 = round(pts_sum / n_pixels, 6) computed AFTER the exact
    integer merge, mirrored by util.sql_round; the pixel-center formula
    is byte-identical to raster_to_features' (explicit (e^v - e^-v)/2,
    DuckDB has no sinh).  Plan: actor pool holds the polygon index
    (one ray.get per actor), per-batch Acero partials, one combiner
    exchange via relational.partial_groupby_agg — rows moved =
    O(features x blocks), never O(pixels)."""
    from ..relational import partial_groupby_agg
    from ..util import default_pool, round_half_away

    kbits = int(np.log2(grid))
    nglob = float(1 << (z + kbits))

    class ZonalTagger:
        def __init__(self, ref):
            self.index = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            gx = (t["tile_x"].combine_chunks().to_numpy() << np.int64(kbits)) \
                | t["px"].combine_chunks().to_numpy()
            gy = (t["tile_y"].combine_chunks().to_numpy() << np.int64(kbits)) \
                | t["py"].combine_chunks().to_numpy()
            lon = (gx + 0.5) / nglob * 360.0 - 180.0
            v = np.pi * (1.0 - 2.0 * (gy + 0.5) / nglob)
            lat = np.degrees(np.arctan((np.exp(v) - np.exp(-v)) / 2.0))
            pi_idx, fids = self.index.query(lon, lat)
            n = t["n"].combine_chunks().to_numpy()[pi_idx]
            return pa.table({"feature_id": pa.array(fids),
                             "n": pa.array(n.astype(np.int64))})

    tagged = raster.map_batches(
        ZonalTagger, fn_constructor_args=(index_ref,),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or default_pool(8))

    agg = partial_groupby_agg(
        tagged, ["feature_id"],
        [("n", "count"), ("n", "sum"), ("n", "max")])

    def finish(t: pa.Table) -> pa.Table:
        cnt = t["n_count"].combine_chunks().to_numpy().astype(np.int64)
        s = t["n_sum"].combine_chunks().to_numpy().astype(np.int64)
        return pa.table({
            "feature_id": t["feature_id"],
            "n_pixels": pa.array(cnt),
            "pts_sum": pa.array(s),
            "n_max": pc.cast(t["n_max"], pa.int64()),
            "mean6": pa.array(round_half_away(s.astype(np.float64) / cnt, 6)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def raster_gradient(raster: ray.data.Dataset, z: int, grid: int,
                    num_parts: int = NUM_PARTS) -> ray.data.Dataset:
    """Central-difference gradient magnitude over the sparse density
    raster: for every OCCUPIED pixel, grad = |n(E) - n(W)| + |n(S) -
    n(N)| with absent neighbors counting 0 — the edge-detection /
    slope stencil of raster GIS, on the sparse representation.

    Physical plan (sparse stencil as message passing): each occupied
    pixel emits its own row plus up to four signed neighbor
    contributions keyed by the packed global pixel; one bounded hash
    exchange sums the contributions per pixel and an inner merge with
    the own rows keeps output support = occupied pixels.  All-integer
    math, so the DuckDB self-join mirror is exact."""
    kbits = int(np.log2(grid))
    shift = np.int64(z + kbits + 1)
    nglob = np.int64(1 << (z + kbits))

    def contrib(t: pa.Table) -> pa.Table:
        gx = (t["tile_x"].combine_chunks().to_numpy() << np.int64(kbits)) \
            | t["px"].combine_chunks().to_numpy()
        gy = (t["tile_y"].combine_chunks().to_numpy() << np.int64(kbits)) \
            | t["py"].combine_chunks().to_numpy()
        n = t["n"].combine_chunks().to_numpy()
        outs = [(gx, gy, n, np.zeros_like(n), np.zeros_like(n))]
        # sx(target) = n(E) - n(W): this pixel is E of (gx-1), W of (gx+1)
        for dx, dy, sx_sign, sy_sign in ((-1, 0, 1, 0), (1, 0, -1, 0),
                                         (0, -1, 0, 1), (0, 1, 0, -1)):
            tx, ty = gx + dx, gy + dy
            m = (tx >= 0) & (tx < nglob) & (ty >= 0) & (ty < nglob)
            outs.append((tx[m], ty[m], np.zeros(int(m.sum()), n.dtype),
                         sx_sign * n[m], sy_sign * n[m]))
        gxa = np.concatenate([o[0] for o in outs])
        gya = np.concatenate([o[1] for o in outs])
        key = (gxa << shift) | gya
        return pa.table({
            "key": pa.array(key),
            "own": pa.array(np.concatenate([o[2] for o in outs])),
            "sx": pa.array(np.concatenate([o[3] for o in outs])),
            "sy": pa.array(np.concatenate([o[4] for o in outs])),
            "part": pa.array(hash_part(key, num_parts)),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by("key").aggregate(
            [("own", "sum"), ("sx", "sum"), ("sy", "sum")])
        own = g["own_sum"].combine_chunks().to_numpy()
        occ = own > 0
        key = g["key"].combine_chunks().to_numpy()[occ]
        gx = key >> shift
        gy = key & np.int64((1 << int(shift)) - 1)
        grad = np.abs(g["sx_sum"].combine_chunks().to_numpy()[occ]) \
            + np.abs(g["sy_sum"].combine_chunks().to_numpy()[occ])
        return pa.table({
            "tile_x": pa.array(gx >> np.int64(kbits)),
            "tile_y": pa.array(gy >> np.int64(kbits)),
            "px": pa.array(gx & np.int64(grid - 1)),
            "py": pa.array(gy & np.int64(grid - 1)),
            "n": pa.array(own[occ]),
            "grad": pa.array(grad),
        })

    return raster.map_batches(contrib, batch_format="pyarrow") \
        .groupby("part").map_groups(merge, batch_format="pyarrow")


def raster_smooth(raster: ray.data.Dataset, z: int, grid: int,
                  num_parts: int = NUM_PARTS) -> ray.data.Dataset:
    """3x3 binomial smoothing over the sparse density raster: for every
    OCCUPIED pixel, smooth = sum over the 3x3 neighborhood of
    w(dx, dy) * n with the separable binomial kernel w = (2-|dx|) *
    (2-|dy|) (center 4, edges 2, corners 1, total 16) and absent
    neighbors counting 0 — the low-pass / denoise stencil of raster
    GIS (a Gaussian-pyramid level), on the sparse representation.

    Physical plan (same sparse-stencil message passing as
    ``raster_gradient``): each occupied pixel scatters nine weighted
    contributions keyed by the packed global target pixel; ONE bounded
    hash exchange sums them and the merge keeps output support =
    occupied pixels (own-count > 0).  All-integer math, so the DuckDB
    band-join mirror is exact.  Per-pixel fan-out is a constant 9, so
    the exchange volume is 9x the occupied-cell count independent of
    data scale — no all-pairs, no materialization."""
    kbits = int(np.log2(grid))
    shift = np.int64(z + kbits + 1)
    nglob = np.int64(1 << (z + kbits))

    def contrib(t: pa.Table) -> pa.Table:
        gx = (t["tile_x"].combine_chunks().to_numpy() << np.int64(kbits)) \
            | t["px"].combine_chunks().to_numpy()
        gy = (t["tile_y"].combine_chunks().to_numpy() << np.int64(kbits)) \
            | t["py"].combine_chunks().to_numpy()
        n = t["n"].combine_chunks().to_numpy()
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                w = np.int64((2 - abs(dx)) * (2 - abs(dy)))
                tx, ty = gx + dx, gy + dy
                m = (tx >= 0) & (tx < nglob) & (ty >= 0) & (ty < nglob)
                own = n[m] if (dx, dy) == (0, 0) else \
                    np.zeros(int(m.sum()), n.dtype)
                outs.append((tx[m], ty[m], own, w * n[m]))
        gxa = np.concatenate([o[0] for o in outs])
        gya = np.concatenate([o[1] for o in outs])
        key = (gxa << shift) | gya
        return pa.table({
            "key": pa.array(key),
            "own": pa.array(np.concatenate([o[2] for o in outs])),
            "sm": pa.array(np.concatenate([o[3] for o in outs])),
            "part": pa.array(hash_part(key, num_parts)),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by("key").aggregate(
            [("own", "sum"), ("sm", "sum")])
        own = g["own_sum"].combine_chunks().to_numpy()
        occ = own > 0
        key = g["key"].combine_chunks().to_numpy()[occ]
        gx = key >> shift
        gy = key & np.int64((1 << int(shift)) - 1)
        return pa.table({
            "tile_x": pa.array(gx >> np.int64(kbits)),
            "tile_y": pa.array(gy >> np.int64(kbits)),
            "px": pa.array(gx & np.int64(grid - 1)),
            "py": pa.array(gy & np.int64(grid - 1)),
            "n": pa.array(own[occ]),
            "smooth": pa.array(g["sm_sum"].combine_chunks().to_numpy()[occ]),
        })

    return raster.map_batches(contrib, batch_format="pyarrow") \
        .groupby("part").map_groups(merge, batch_format="pyarrow")


def raster_hist_eq(pts: ray.data.Dataset, z: int = 10, grid: int = 64,
                   levels: int = 256,
                   num_parts: int = NUM_PARTS) -> ray.data.Dataset:
    """(tile_x, tile_y, px, py, n, eq): histogram equalization of the
    sparse density raster — each occupied pixel's count is remapped to
    ``round((levels-1) * cume_dist(n))`` over the occupied-pixel value
    distribution, the classic contrast-stretch every raster viewer
    applies before display.

    Scale shape: the raster itself is the existing hash-partitioned
    rasterize_tiles; the value HISTOGRAM is bounded by the number of
    distinct pixel counts (tiny), so its partials merge in one task and
    the cdf LUT broadcasts once; the remap pass is embarrassingly
    parallel. The raster lineage executes twice (histogram + remap) —
    recompute-over-materialize is deliberate: both passes stream, and
    at web scale a checkpointed raster (state/lineage.py) slots in as
    the input without changing this operator."""
    raster = rasterize_tiles(pts, z=z, grid=grid, num_parts=num_parts)

    def vhist(t: pa.Table) -> pa.Table:
        v, c = np.unique(t["n"].combine_chunks().to_numpy(),
                         return_counts=True)
        return pa.table({"v": pa.array(v),
                         "c": pa.array(c.astype(np.int64))})

    def vmerge(t: pa.Table) -> pa.Table:
        g = t.group_by("v").aggregate([("c", "sum")])
        return g.rename_columns(["v", "c"])

    from ..relational import single_merge
    from ..util import round_half_away
    lut_rows = single_merge(
        raster.map_batches(vhist, batch_format="pyarrow"),
        vmerge).take_all()
    v = np.array([r["v"] for r in lut_rows], np.int64)
    c = np.array([r["c"] for r in lut_rows], np.int64)
    order = np.argsort(v)
    v, c = v[order], c[order]
    total = float(c.sum())
    cd = np.cumsum(c).astype(np.float64) / total
    eq = np.asarray(round_half_away((levels - 1) * cd, 0)).astype(np.int64)
    lut_ref = ray.put((v, eq))

    def remap(t: pa.Table) -> pa.Table:
        vv, ee = ray.get(lut_ref)
        n = t["n"].combine_chunks().to_numpy()
        return t.append_column(
            "eq", pa.array(ee[np.searchsorted(vv, n)]))

    return raster.map_batches(remap, batch_format="pyarrow")


D8_OFFSETS = ((1, 0), (1, 1), (0, 1), (-1, 1),
              (-1, 0), (-1, -1), (0, -1), (1, -1))


def raster_flow_dir(raster: ray.data.Dataset, z: int, grid: int,
                    num_parts: int = NUM_PARTS) -> ray.data.Dataset:
    """(tile_x, tile_y, px, py, n, flow_dir): D8 steepest-descent flow
    direction over the sparse density raster — for each occupied pixel,
    the 8-neighbour direction with the largest positive drop
    n(self) - n(nbr) (absent neighbours count 0; ties pick the smallest
    direction code E=0, SE=1, ... NE=7; no positive drop = -1, a pit) —
    the hydrology / drainage stencil of raster GIS.

    Physical plan: the raster_gradient message-passing shape widened to
    8 directions — each occupied pixel scatters its value into the
    direction slot of each neighbour's accumulator row, ONE bounded
    pixel-hash exchange sums slots, and the merge computes the argmax
    in all-integer math (the DuckDB 8-way LEFT JOIN mirror is exact)."""
    kbits = int(np.log2(grid))
    shift = np.int64(z + kbits + 1)
    nglob = np.int64(1 << (z + kbits))

    def contrib(t: pa.Table) -> pa.Table:
        gx = (t["tile_x"].combine_chunks().to_numpy() << np.int64(kbits)) \
            | t["px"].combine_chunks().to_numpy()
        gy = (t["tile_y"].combine_chunks().to_numpy() << np.int64(kbits)) \
            | t["py"].combine_chunks().to_numpy()
        n = t["n"].combine_chunks().to_numpy()
        zero = np.zeros_like(n)
        cols = {f"v{d}": [zero] for d in range(8)}
        own = [n]
        gxa, gya = [gx], [gy]
        for d, (dx, dy) in enumerate(D8_OFFSETS):
            # this pixel is the d-direction neighbour of (gx-dx, gy-dy)
            tx, ty = gx - dx, gy - dy
            m = (tx >= 0) & (tx < nglob) & (ty >= 0) & (ty < nglob)
            cnt = int(m.sum())
            gxa.append(tx[m])
            gya.append(ty[m])
            own.append(np.zeros(cnt, n.dtype))
            for d2 in range(8):
                cols[f"v{d2}"].append(n[m] if d2 == d
                                      else np.zeros(cnt, n.dtype))
        key = (np.concatenate(gxa) << shift) | np.concatenate(gya)
        out = {"key": pa.array(key),
               "own": pa.array(np.concatenate(own))}
        for d in range(8):
            out[f"v{d}"] = pa.array(np.concatenate(cols[f"v{d}"]))
        out["part"] = pa.array(hash_part(key, num_parts))
        return pa.table(out)

    def merge(t: pa.Table) -> pa.Table:
        aggs = [("own", "sum")] + [(f"v{d}", "sum") for d in range(8)]
        g = t.drop_columns(["part"]).group_by("key").aggregate(aggs)
        own = g["own_sum"].combine_chunks().to_numpy()
        occ = own > 0
        key = g["key"].combine_chunks().to_numpy()[occ]
        n = own[occ]
        drops = np.stack([n - g[f"v{d}_sum"].combine_chunks()
                          .to_numpy()[occ] for d in range(8)])
        best = drops.max(axis=0)
        # argmax over axis 0 returns the FIRST (smallest code) maximum
        fdir = np.where(best > 0, np.argmax(drops, axis=0), -1)
        gx, gy = key >> shift, key & np.int64((1 << int(shift)) - 1)
        return pa.table({
            "tile_x": pa.array(gx >> np.int64(kbits)),
            "tile_y": pa.array(gy >> np.int64(kbits)),
            "px": pa.array(gx & np.int64(grid - 1)),
            "py": pa.array(gy & np.int64(grid - 1)),
            "n": pa.array(n),
            "flow_dir": pa.array(fdir.astype(np.int64)),
        })

    return raster.map_batches(contrib, batch_format="pyarrow") \
        .groupby("part").map_groups(merge, batch_format="pyarrow")


def raster_hillshade(raster: ray.data.Dataset, z: int, grid: int,
                     azimuth_deg: float = 315.0, altitude_deg: float = 45.0,
                     num_parts: int = NUM_PARTS) -> ray.data.Dataset:
    """Analytical hillshade over the sparse density raster (the classic
    cartographic relief formula, with the density count standing in for
    elevation): per OCCUPIED pixel, slope/aspect from the SIGNED
    central differences (dz/dx = (n(E) - n(W)) / 2, dz/dy = (n(S) -
    n(N)) / 2, absent neighbors 0) and

        shade = 255 * max(0, cos(zen)*cos(slope)
                             + sin(zen)*sin(slope)*cos(az - aspect))

    with zen = radians(90 - altitude), az = radians(360 - azimuth + 90)
    (the ESRI convention), aspect = atan2(dz/dy, -dz/dx).

    Physical plan: identical one-exchange sparse-stencil message
    passing as ``raster_gradient`` (its signed dual — contributions are
    summed per packed pixel, support = occupied pixels); the trig is
    vectorized per merge partition.  The stencil sums are all-integer,
    so engine and DuckDB mirror agree exactly up to the final 6-digit
    rounding of the shared float formula."""
    kbits = int(np.log2(grid))
    shift = np.int64(z + kbits + 1)
    nglob = np.int64(1 << (z + kbits))
    zen = np.radians(90.0 - altitude_deg)
    az = np.radians((360.0 - azimuth_deg + 90.0) % 360.0)

    def contrib(t: pa.Table) -> pa.Table:
        gx = (t["tile_x"].combine_chunks().to_numpy() << np.int64(kbits)) \
            | t["px"].combine_chunks().to_numpy()
        gy = (t["tile_y"].combine_chunks().to_numpy() << np.int64(kbits)) \
            | t["py"].combine_chunks().to_numpy()
        n = t["n"].combine_chunks().to_numpy()
        outs = [(gx, gy, n, np.zeros_like(n), np.zeros_like(n))]
        # sx(target) = n(E) - n(W); sy(target) = n(S) - n(N)
        for dx, dy, sx_sign, sy_sign in ((-1, 0, 1, 0), (1, 0, -1, 0),
                                         (0, -1, 0, 1), (0, 1, 0, -1)):
            tx, ty = gx + dx, gy + dy
            m = (tx >= 0) & (tx < nglob) & (ty >= 0) & (ty < nglob)
            outs.append((tx[m], ty[m], np.zeros(int(m.sum()), n.dtype),
                         sx_sign * n[m], sy_sign * n[m]))
        gxa = np.concatenate([o[0] for o in outs])
        gya = np.concatenate([o[1] for o in outs])
        key = (gxa << shift) | gya
        return pa.table({
            "key": pa.array(key),
            "own": pa.array(np.concatenate([o[2] for o in outs])),
            "sx": pa.array(np.concatenate([o[3] for o in outs])),
            "sy": pa.array(np.concatenate([o[4] for o in outs])),
            "part": pa.array(hash_part(key, num_parts)),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by("key").aggregate(
            [("own", "sum"), ("sx", "sum"), ("sy", "sum")])
        own = g["own_sum"].combine_chunks().to_numpy()
        occ = own > 0
        key = g["key"].combine_chunks().to_numpy()[occ]
        gx = key >> shift
        gy = key & np.int64((1 << int(shift)) - 1)
        dzdx = g["sx_sum"].combine_chunks().to_numpy()[occ] / 2.0
        dzdy = g["sy_sum"].combine_chunks().to_numpy()[occ] / 2.0
        # sqrt form (not np.hypot) so DuckDB's atan(sqrt(x*x + y*y))
        # reproduces it bit-for-bit
        slope = np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy))
        aspect = np.arctan2(dzdy, -dzdx)
        hs = 255.0 * (np.cos(zen) * np.cos(slope)
                      + np.sin(zen) * np.sin(slope) * np.cos(az - aspect))
        hs = np.maximum(hs, 0.0)
        from ..relational import round_half_away
        return pa.table({
            "tile_x": pa.array(gx >> np.int64(kbits)),
            "tile_y": pa.array(gy >> np.int64(kbits)),
            "px": pa.array(gx & np.int64(grid - 1)),
            "py": pa.array(gy & np.int64(grid - 1)),
            "n": pa.array(own[occ]),
            "shade6": pa.array(round_half_away(hs, 6)),
        })

    return raster.map_batches(contrib, batch_format="pyarrow") \
        .groupby("part").map_groups(merge, batch_format="pyarrow")


# ------------------------------------------------------------- contour

# marching-squares case tables (corner code = TL*8 + TR*4 + BR*2 + BL*1):
# corner-cut cases carry one diagonal half-cell segment, side-pair cases
# one straight unit segment, the two saddle cases two diagonals (counts
# and lengths are identical under either saddle resolution, so the
# statistic needs no ambiguity rule)
_MS_NSEG = np.array([0, 1, 1, 1, 1, 2, 1, 1, 1, 1, 2, 1, 1, 1, 1, 0],
                    np.int64)
_MS_DIAG = np.array([0, 1, 1, 0, 1, 2, 0, 1, 1, 0, 2, 1, 0, 1, 1, 0],
                    np.int64)
_MS_STRT = _MS_NSEG - _MS_DIAG
_MS_DIAG_LEN = 0.7071067811865476   # sqrt(0.5), shared with the oracle


def raster_contour(raster: ray.data.Dataset, z: int, grid: int,
                   levels: tuple = (1, 4, 16),
                   num_parts: int = NUM_PARTS) -> ray.data.Dataset:
    """(level, n_cells, n_segments, n_straight, n_diag, len6): global
    marching-squares census of the count raster's iso-contours at each
    ``levels`` threshold — per 2x2 pixel-corner cell the standard case
    index decides how many straight / diagonal unit segments the
    level-set boundary cuts through it, counted exactly once per cell
    on the GLOBAL pixel grid (no tile-seam double count: cells are
    keyed by their own corner coordinate, not by tile).

    Scale plan: each sparse-raster row (a distinct occupied pixel)
    emits its 4 incident cells with its corner role — O(4 x occupied
    pixels), the only exchange; the per-partition kernel reduces each
    cell's <= 4 corners to a case index per level (reduceat over the
    sorted cell key) and collapses to |levels| partial rows.  Cells
    with no occupied corner are all-below-threshold everywhere, so
    never materialize.  All counts are integers and the length is a
    closed form of two integer counts, so the merge is order-free."""
    from ..relational import single_merge
    kbits = int(np.log2(grid))
    side = np.int64(1) << np.int64(z + kbits)
    m = np.int64(int(side) + 2)
    lv = np.asarray(levels, np.int64)

    def emit(t: pa.Table) -> pa.Table:
        tx = t["tile_x"].combine_chunks().to_numpy().astype(np.int64)
        ty = t["tile_y"].combine_chunks().to_numpy().astype(np.int64)
        gx = (tx << np.int64(kbits)) \
            | t["px"].combine_chunks().to_numpy().astype(np.int64)
        gy = (ty << np.int64(kbits)) \
            | t["py"].combine_chunks().to_numpy().astype(np.int64)
        n = t["n"].combine_chunks().to_numpy().astype(np.int64)
        # (cell dx, cell dy, corner bit): the pixel is TL of its own
        # cell, TR of the west cell, BL of the north, BR of the NW
        keys, bits, vals = [], [], []
        for dx, dy, bit in ((0, 0, 8), (-1, 0, 4), (0, -1, 1),
                            (-1, -1, 2)):
            keys.append((gx + dx + 1) * m + (gy + dy + 1))
            bits.append(np.full(len(n), bit, np.int64))
            vals.append(n)
        key = np.concatenate(keys)
        return pa.table({
            "key": pa.array(key),
            "bit": pa.array(np.concatenate(bits)),
            "n": pa.array(np.concatenate(vals)),
            "part": pa.array(hash_part(key, num_parts))})

    def kernel(t: pa.Table) -> pa.Table:
        key = t["key"].combine_chunks().to_numpy()
        bit = t["bit"].combine_chunks().to_numpy()
        n = t["n"].combine_chunks().to_numpy()
        o = np.argsort(key, kind="stable")
        key, bit, n = key[o], bit[o], n[o]
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        out_lv, out = [], []
        for l in lv:
            case = np.add.reduceat(bit * (n >= l), starts)
            nseg = _MS_NSEG[case]
            out_lv.append(int(l))
            out.append((int((nseg > 0).sum()), int(nseg.sum()),
                        int(_MS_STRT[case].sum()),
                        int(_MS_DIAG[case].sum())))
        return pa.table({
            "level": pa.array(out_lv, pa.int64()),
            "pc": pa.array([v[0] for v in out], pa.int64()),
            "ps": pa.array([v[1] for v in out], pa.int64()),
            "pt": pa.array([v[2] for v in out], pa.int64()),
            "pd": pa.array([v[3] for v in out], pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        from ..util import round_half_away
        g = t.group_by(["level"]).aggregate(
            [("pc", "sum"), ("ps", "sum"), ("pt", "sum"), ("pd", "sum")])
        ns = g["pt_sum"].to_numpy().astype(np.int64)
        nd = g["pd_sum"].to_numpy().astype(np.int64)
        return pa.table({
            "level": pc.cast(g["level"], pa.int64()),
            "n_cells": pc.cast(g["pc_sum"], pa.int64()),
            "n_segments": pc.cast(g["ps_sum"], pa.int64()),
            "n_straight": pa.array(ns),
            "n_diag": pa.array(nd),
            "len6": pa.array(round_half_away(
                ns * 1.0 + nd * _MS_DIAG_LEN, 6)),
        }).sort_by("level")

    parts = raster.map_batches(emit, batch_format="pyarrow") \
        .groupby("part") \
        .map_groups(lambda t: kernel(t.drop_columns(["part"])),
                    batch_format="pyarrow")
    return single_merge(parts, merge)


def way_rasterize(ways: ray.data.Dataset, nodes: ray.data.Dataset,
                  z_px: int = 18, z_tile: int = 13,
                  num_parts: int = 16) -> ray.data.Dataset:
    """(tile_x, tile_y, n_px, visits): vector->raster burn-in of every
    way's polyline onto the slippy pixel grid at zoom ``z_px``,
    rolled up to tiles at ``z_tile`` — n_px is the count of DISTINCT
    covered pixels in the tile, visits the count of (segment, pixel)
    incidences (coverage density).  The rasterization is integer DDA:
    each segment samples n = Chebyshev-pixel-distance + 1 points,
    offset_k = round_half_away(k * d / n) evaluated in EXACT int64
    arithmetic ((2kd + n) // 2n, negated for d < 0), so the scalar
    oracle reproduces every pixel bit-for-bit; the dominant axis
    advances by exactly 1 per step, so a segment never revisits a
    pixel and per-segment dedup is unnecessary.

    Scale plan: coordinates resolve via the broadcast node lookup, ONE
    way-hash exchange co-locates ordered vertices, the kernel emits
    per-PIXEL partial counts (bounded by covered pixels per block,
    never samples), and ONE tile-hash exchange merges partials so each
    tile's distinct-pixel count is computed wholly in one task.  Total
    sample work is O(total polyline length in pixels) — raise z_tile
    partitioning, not pixel zoom, for bigger clusters."""
    from .osm import join_refs_to_coords

    pts = join_refs_to_coords(ways, nodes) \
        .select_columns(["way_id", "pos", "lon", "lat"])
    shift = z_px - z_tile
    if shift <= 0:
        raise ValueError("z_px must exceed z_tile")

    def pre(t: pa.Table) -> pa.Table:
        w = t["way_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(w, num_parts)))

    def _dda_offsets(t: np.ndarray, d: np.ndarray, n: np.ndarray
                     ) -> np.ndarray:
        ad = np.abs(d)
        n_safe = np.maximum(n, 1)
        off = (2 * t * ad + n_safe) // (2 * n_safe)
        return np.where(d >= 0, off, -off)

    def burn(t: pa.Table) -> pa.Table:
        w = t["way_id"].combine_chunks().to_numpy()
        pos = t["pos"].combine_chunks().to_numpy()
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        order = np.lexsort((pos, w))
        w, lon, lat = w[order], lon[order], lat[order]
        px, py = tiles.tile_xy(lon, lat, z_px)
        same = np.r_[False, w[1:] == w[:-1]]
        s = np.flatnonzero(same)  # segment end rows
        x0, y0 = px[s - 1], py[s - 1]
        dx, dy = px[s] - x0, py[s] - y0
        n = np.maximum(np.abs(dx), np.abs(dy))
        per = n + 1
        tot = int(per.sum())
        seg = np.repeat(np.arange(len(s), dtype=np.int64), per)
        k = np.arange(tot, dtype=np.int64) \
            - np.repeat(np.cumsum(per) - per, per)
        sx = np.repeat(x0, per) + _dda_offsets(k, np.repeat(dx, per),
                                               np.repeat(n, per))
        sy = np.repeat(y0, per) + _dda_offsets(k, np.repeat(dy, per),
                                               np.repeat(n, per))
        pix = (sx << np.int64(z_px)) | sy  # z_px <= 29: fits int64
        # per-pixel partial counts (bounded by covered pixels/block)
        u, cnt = np.unique(pix, return_counts=True)
        return pa.table({
            "pix": pa.array(u),
            "cnt": pa.array(cnt.astype(np.int64)),
            "part": pa.array(hash_part(
                ((u >> np.int64(z_px)) >> shift) << np.int64(32)
                | ((u & ((np.int64(1) << z_px) - 1)) >> shift),
                num_parts))})

    def merge(t: pa.Table) -> pa.Table:
        pix = t["pix"].combine_chunks().to_numpy()
        cnt = t["cnt"].combine_chunks().to_numpy()
        g = pa.table({"pix": pa.array(pix), "cnt": pa.array(cnt)}) \
            .group_by("pix").aggregate([("cnt", "sum")])
        pix = g["pix"].combine_chunks().to_numpy()
        cnt = g["cnt_sum"].combine_chunks().to_numpy()
        tx = (pix >> np.int64(z_px)) >> shift
        ty = (pix & ((np.int64(1) << z_px) - 1)) >> shift
        tk = (tx << np.int64(32)) | ty
        order = np.argsort(tk, kind="stable")
        tk, cnt = tk[order], cnt[order]
        starts = np.flatnonzero(np.r_[True, tk[1:] != tk[:-1]]) \
            if len(tk) else np.empty(0, np.int64)
        n_px = np.diff(np.r_[starts, len(tk)]) if len(tk) \
            else np.empty(0, np.int64)
        visits = np.add.reduceat(cnt, starts) if len(tk) \
            else np.empty(0, np.int64)
        tku = tk[starts] if len(tk) else tk
        return pa.table({
            "tile_x": pa.array(tku >> np.int64(32), pa.int64()),
            "tile_y": pa.array(tku & np.int64(0xFFFFFFFF), pa.int64()),
            "n_px": pa.array(n_px, pa.int64()),
            "visits": pa.array(visits.astype(np.int64), pa.int64())})

    return (pts.map_batches(pre, batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda t: burn(t.drop_columns(["part"])),
                        batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda t: merge(t.drop_columns(["part"])),
                        batch_format="pyarrow"))


def zonal_majority(raster: ray.data.Dataset, index_ref,
                   z: int, grid: int,
                   concurrency: int | tuple[int, int] | None = None,
                   num_parts: int = 8,
                   batch_size: int = 8192) -> ray.data.Dataset:
    """(feature_id, maj_bucket, maj_n, n_buckets): zonal MAJORITY —
    the categorical sibling of zonal_stats: every in-polygon pixel's
    count value folds to its exact floor(log2) magnitude bucket and
    each feature reports the most frequent bucket (ties lowest).  The
    land-cover-class rollup shape, where mean/max are meaningless.

    Plan: the zonal_stats actor-pool tagger emits (feature, bucket)
    rows, one combiner exchange collapses to per-(feature, bucket)
    counts, and one tiny feature-hash exchange (rows = features x
    buckets present) runs the argmax — pixels never cross twice."""
    from ..relational import hash_part, partial_groupby_agg
    from ..util import default_pool

    kbits = int(np.log2(grid))
    nglob = float(1 << (z + kbits))
    pow2 = np.int64(1) << np.arange(63, dtype=np.int64)

    class MajorityTagger:
        def __init__(self, ref):
            self.index = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            gx = (t["tile_x"].combine_chunks().to_numpy()
                  << np.int64(kbits)) \
                | t["px"].combine_chunks().to_numpy()
            gy = (t["tile_y"].combine_chunks().to_numpy()
                  << np.int64(kbits)) \
                | t["py"].combine_chunks().to_numpy()
            lon = (gx + 0.5) / nglob * 360.0 - 180.0
            v = np.pi * (1.0 - 2.0 * (gy + 0.5) / nglob)
            lat = np.degrees(np.arctan((np.exp(v) - np.exp(-v)) / 2.0))
            pi_idx, fids = self.index.query(lon, lat)
            n = t["n"].combine_chunks().to_numpy()[pi_idx]
            bucket = np.searchsorted(pow2, n, side="right") - 1
            g = pa.table({"feature_id": pa.array(fids),
                          "bucket": pa.array(bucket.astype(np.int64)),
                          "c": pa.array(np.ones(len(fids), np.int64))}) \
                .group_by(["feature_id", "bucket"]) \
                .aggregate([("c", "sum")])
            return g.rename_columns(["feature_id", "bucket", "c"])

    tagged = raster.map_batches(
        MajorityTagger, fn_constructor_args=(index_ref,),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or default_pool(8))
    bc = partial_groupby_agg(tagged, ["feature_id", "bucket"],
                             [("c", "sum")], num_parts=num_parts)

    def pre(t: pa.Table) -> pa.Table:
        f = t["feature_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(f, num_parts)))

    def argmax(t: pa.Table) -> pa.Table:
        f = t["feature_id"].combine_chunks().to_numpy()
        b = t["bucket"].combine_chunks().to_numpy()
        c = t["c_sum"].combine_chunks().to_numpy()
        order = np.lexsort((b, -c, f))
        f_o, b_o, c_o = f[order], b[order], c[order]
        starts = np.flatnonzero(np.r_[True, f_o[1:] != f_o[:-1]]) \
            if len(f_o) else np.empty(0, np.int64)
        nb = np.diff(np.r_[starts, len(f_o)]) if len(f_o) \
            else np.empty(0, np.int64)
        return pa.table({
            "feature_id": pa.array(f_o[starts]),
            "maj_bucket": pa.array(b_o[starts].astype(np.int64)),
            "maj_n": pa.array(c_o[starts].astype(np.int64)),
            "n_buckets": pa.array(nb.astype(np.int64))})

    return (bc.map_batches(pre, batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda t: argmax(t.drop_columns(["part"])),
                        batch_format="pyarrow"))


VIEWSHED_OBS_H = 1


def _los_blocked(H: np.ndarray, cx: int, cy: int, tx: np.ndarray,
                 ty: np.ndarray, h_obs: int) -> np.ndarray:
    """Shared line-of-sight definition (both gate sides call this for
    one tile): target (tx, ty) is blocked iff some intermediate sample
    k in 1..d-1 along the centre ray (Chebyshev steps d, nearest-pixel
    rounding xi = cx + (2k*dx + d) // (2d), floor semantics) satisfies
    (H[yi, xi] - h_obs) * d >= (H[ty, tx] - h_obs) * k — grazing
    equality OCCLUDES. All-integer; no atan, no floats."""
    dx = tx - cx
    dy = ty - cy
    d = np.maximum(np.abs(dx), np.abs(dy)).astype(np.int64)
    ht = H[ty, tx].astype(np.int64)
    blocked = np.zeros(len(tx), bool)
    kmax = int(d.max()) if len(d) else 0
    for k in range(1, kmax):
        m = k < d
        if not m.any():
            break
        dd = d[m]
        xi = cx + (2 * k * dx[m] + dd) // (2 * dd)
        yi = cy + (2 * k * dy[m] + dd) // (2 * dd)
        hi = H[yi, xi].astype(np.int64)
        blocked[m] |= (hi - h_obs) * dd >= (ht[m] - h_obs) * k
    return blocked


def raster_viewshed(raster: ray.data.Dataset, z: int, grid: int,
                    obs_h: int = VIEWSHED_OBS_H,
                    num_parts: int = NUM_PARTS) -> ray.data.Dataset:
    """(tile_x, tile_y, px, py, n, visible): TILE-LOCAL viewshed over
    the sparse density raster — each occupied pixel tested for line of
    sight from the tile's centre pixel (observer height = centre
    density + ``obs_h``), empty pixels counting as ground level 0.
    The raster-GIS visibility stencil, scoped to the tile by design
    (cross-tile occlusion is out of contract — documented, like the
    other tile-stencil ops' edge behavior).

    Scale plan: ONE bounded hash(tile) exchange co-locates each tile's
    sparse pixels; the kernel densifies grid x grid ONCE per tile and
    runs the all-integer LOS sweep vectorized over that tile's occupied
    pixels (work = occupied x grid steps, not grid^3)."""

    def part(t: pa.Table) -> pa.Table:
        key = (t["tile_x"].combine_chunks().to_numpy() << np.int64(32)) \
            | t["tile_y"].combine_chunks().to_numpy()
        return t.append_column("part",
                               pa.array(hash_part(key, num_parts)))

    def kernel(t: pa.Table) -> pa.Table:
        txl = t["tile_x"].combine_chunks().to_numpy()
        tyl = t["tile_y"].combine_chunks().to_numpy()
        px = t["px"].combine_chunks().to_numpy()
        py = t["py"].combine_chunks().to_numpy()
        n = t["n"].combine_chunks().to_numpy()
        key = (txl << np.int64(32)) | tyl
        order = np.argsort(key, kind="stable")
        cx = cy = grid // 2
        out_idx, out_vis = [], []
        starts = np.flatnonzero(np.r_[True, key[order][1:]
                                      != key[order][:-1]]) \
            if len(key) else np.empty(0, np.int64)
        bounds = np.r_[starts, len(key)]
        for s, e in zip(bounds[:-1], bounds[1:]):
            idx = order[s:e]
            H = np.zeros((grid, grid), np.int64)
            H[py[idx], px[idx]] = n[idx]
            h_obs = int(H[cy, cx]) + obs_h
            tgt = idx[(px[idx] != cx) | (py[idx] != cy)]
            blocked = _los_blocked(H, cx, cy, px[tgt], py[tgt], h_obs)
            out_idx.append(tgt)
            out_vis.append(~blocked)
            centre = idx[(px[idx] == cx) & (py[idx] == cy)]
            if len(centre):        # observer pixel: visible by fiat
                out_idx.append(centre)
                out_vis.append(np.ones(len(centre), bool))
        if not out_idx:
            return pa.table({
                "tile_x": pa.array([], pa.int64()),
                "tile_y": pa.array([], pa.int64()),
                "px": pa.array([], pa.int64()),
                "py": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "visible": pa.array([], pa.bool_())})
        oi = np.concatenate(out_idx)
        ov = np.concatenate(out_vis)
        return pa.table({
            "tile_x": pa.array(txl[oi]), "tile_y": pa.array(tyl[oi]),
            "px": pa.array(px[oi]), "py": pa.array(py[oi]),
            "n": pa.array(n[oi]),
            "visible": pa.array(ov)})

    return raster.map_batches(part, batch_format="pyarrow") \
        .groupby("part") \
        .map_groups(lambda t: kernel(t.drop_columns(["part"])),
                    batch_format="pyarrow")
