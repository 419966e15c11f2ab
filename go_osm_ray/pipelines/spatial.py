"""Spatial pipelines: polygon layer build, PIP tagging, kNN, ANN, S2.

The graft core (BASELINE.json north_star): geotagged image rows are
assigned cells/tiles (stages/assign.py), joined against OSM-derived
polygon layers for point-in-polygon tagging, and given nearest-feature
lookups — all as Dataset stages with stateful actor pools holding the
broadcast spatial index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..geo import s2 as s2geo
from ..geo.pip import PolygonIndex
from ..stages.assign import decode_geotag
from .osm import join_refs_to_coords


def _fanout(pool) -> int:
    """Blocks to split a compute-heavy input into: ~4 waves per actor."""
    n = pool if isinstance(pool, int) else pool[-1]
    return n * 4


def closed_ways(ways: ray.data.Dataset) -> ray.data.Dataset:
    """Ways forming closed rings (first ref == last ref, >= 4 refs) — the
    polygon half of /root/reference/osm/Planet.go:67-77, corrected."""
    def fn(batch: pa.Table) -> pa.Table:
        refs = batch["refs"].combine_chunks()
        offsets = np.asarray(refs.offsets, np.int64)
        flat = refs.flatten().to_numpy()
        n = np.diff(offsets)
        first = flat[offsets[:-1].clip(max=len(flat) - 1)] if len(flat) else np.empty(0, np.int64)
        last = flat[(offsets[1:] - 1).clip(min=0)] if len(flat) else np.empty(0, np.int64)
        closed = (n >= 4) & (first == last)
        return batch.filter(pa.array(closed))
    return ways.map_batches(fn, batch_format="pyarrow")


def build_polygon_index(nodes: ray.data.Dataset, ways: ray.data.Dataset,
                        grid_res: int | None = None) -> PolygonIndex:
    """Materialize the polygon layer (closed ways ⨝ nodes, ring order) into
    a PolygonIndex.

    The per-way coordinate resolution is the distributed join
    (pipelines/osm.join_refs_to_coords); only the final small polygon layer
    (feature_id + vertex arrays) is collected, to be ray.put once and
    loaded by index actors. At cluster scale this layer is sharded by cell
    prefix and each actor loads only its shard (SURVEY §7.3) — the
    single-shard build here is the num_shards=1 case.
    """
    fids, xs, ys = _collect_polygon_coords(nodes, ways)
    return PolygonIndex(fids, xs, ys, grid_res=grid_res)


class PIPTagger:
    """Actor-pool stage: point-in-polygon tagging against a broadcast index.

    ``__init__`` runs once per actor (ray.get of the index); ``__call__``
    per batch emits one row per (image, containing polygon) match.
    """

    def __init__(self, index_ref: ray.ObjectRef, id_col: str = "image_id"):
        self.index: PolygonIndex = ray.get(index_ref)
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch["lon"].combine_chunks().to_numpy()
        py = batch["lat"].combine_chunks().to_numpy()
        pi, fids = self.index.query(px, py)
        ids = batch[self.id_col].combine_chunks()
        return pa.table({
            self.id_col: pc.take(ids, pa.array(pi)),
            "feature_id": pa.array(fids),
        })


def pip_join(images: ray.data.Dataset, index_ref: ray.ObjectRef,
             concurrency: int | tuple[int, int] | None = None,
             batch_size: int = 8192) -> ray.data.Dataset:
    """(image_id, feature_id) for every image point inside a polygon."""
    from ..util import default_pool
    pool = concurrency or default_pool()
    # split blocks first: these inputs are byte-small but compute-heavy, so
    # Ray's 128MB block targeting would otherwise produce 1-2 tasks total
    pts = images.repartition(_fanout(pool)) \
        .map_batches(decode_geotag, batch_format="pyarrow")
    return pts.map_batches(PIPTagger, fn_constructor_args=(index_ref,),
                           batch_format="pyarrow", batch_size=batch_size,
                           concurrency=pool)


class PIPAntiTagger(PIPTagger):
    """Complement of PIPTagger: emits the points contained in NO polygon
    (the "open ocean" curation filter).  One row per unmatched image,
    with its decoded coordinates rounded to 7 dp."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..util import round_half_away
        px = batch["lon"].combine_chunks().to_numpy()
        py = batch["lat"].combine_chunks().to_numpy()
        pi, _ = self.index.query(px, py)
        keep = np.ones(len(batch), bool)
        keep[np.asarray(pi, np.int64)] = False
        return pa.table({
            self.id_col: batch[self.id_col].combine_chunks()
            .filter(pa.array(keep)),
            "lon7": pa.array(round_half_away(px[keep], 7), pa.float64()),
            "lat7": pa.array(round_half_away(py[keep], 7), pa.float64()),
        })


def pip_anti_join(images: ray.data.Dataset, index_ref: ray.ObjectRef,
                  concurrency: int | tuple[int, int] | None = None,
                  batch_size: int = 8192) -> ray.data.Dataset:
    """(image_id, lon7, lat7) for every image inside NO polygon — the
    spatial anti-join (same broadcast-index shape as pip_join; the scale
    path shards the index by cell prefix exactly as pip_join_sharded,
    since "no hit in the owning shard" == "no hit globally" given bbox
    replication into every covering shard)."""
    from ..util import default_pool
    pool = concurrency or default_pool()
    pts = images.repartition(_fanout(pool)) \
        .map_batches(decode_geotag, batch_format="pyarrow")
    return pts.map_batches(PIPAntiTagger, fn_constructor_args=(index_ref,),
                           batch_format="pyarrow", batch_size=batch_size,
                           concurrency=pool)


def _collect_polygon_coords(nodes: ray.data.Dataset,
                            ways: ray.data.Dataset):
    """(feature_ids, xs, ys) vertex arrays for the closed-way polygon
    layer — the BROADCAST (single-index) build, so a driver collect is
    the point; build_polygon_shards is the distributed form. Collected
    as zero-copy arrow refs, not pandas."""
    coords = join_refs_to_coords(closed_ways(ways), nodes) \
        .select_columns(["way_id", "pos", "lon", "lat"])
    t = pa.concat_tables([x.replace_schema_metadata(None) for x in
                          ray.get(coords.to_arrow_refs())
                          if x.num_rows and x.num_columns]).combine_chunks()
    wid = t["way_id"].to_numpy()
    order = np.lexsort((t["pos"].to_numpy(), wid))
    wid_s = wid[order]
    lon_s = t["lon"].to_numpy()[order]
    lat_s = t["lat"].to_numpy()[order]
    fids, starts = np.unique(wid_s, return_index=True)
    bounds = np.append(starts, len(wid_s))
    xs = [lon_s[bounds[i]:bounds[i + 1]] for i in range(len(fids))]
    ys = [lat_s[bounds[i]:bounds[i + 1]] for i in range(len(fids))]
    return fids.astype(np.int64), xs, ys


def build_polygon_shards(nodes: ray.data.Dataset, ways: ray.data.Dataset,
                         shard_res: int = 12,
                         num_parts: int = 32) -> dict[int, ray.ObjectRef]:
    """The SCALE path for the polygon layer (SURVEY §7.3, north star
    "polygon layers sharded by cell prefix"): one PolygonIndex per
    shard-resolution geocell, each its OWN object-store entry, so a task
    processing cell c ray.gets only shard c — never the global layer.
    Polygons are replicated into every shard cell their bbox covers
    (bbox ⊇ polygon, so containment never crosses an unvisited shard).

    The build is DISTRIBUTED (round 2 collected every closed-way vertex
    on the driver, VERDICT r2) and needs only ONE exchange, because a
    way's refs live in one list-column row — per-way locality is free
    inside each batch:
      fused stage (map_batches over closed ways) — explode refs, resolve
        coordinates against the broadcast node lookup, compute each
        way's bbox, and replicate its vertex rows into every covering
        shard cell, keyed by a bounded hash of the CELL;
      exchange — replicated rows shuffle by that cell hash; each
        partition kernel constructs the PolygonIndex for every cell it
        owns and emits one (cell, pickled index) row.
    The driver only streams that small manifest (iter_batches, bounded
    memory — one row per shard, never a vertex table) and ray.puts each
    shard. A production deployment would write the blobs to per-shard
    parquet and let query tasks lazy-load them; the object-store dict
    keeps parity with pip_join_sharded's interface here. (When the node
    table outgrows a broadcast, resolve coordinates with
    join_refs_to_coords(broadcast_nodes=False) and the two-exchange
    by-way/by-cell plan instead.)"""
    import pickle

    from ..geo.tiles import cells_covering_bbox
    from ..relational import broadcast_table, hash_part
    node_ref = broadcast_table(nodes, ["id", "lon", "lat"])

    empty_rep = pa.schema([("cell", pa.int64()), ("way_id", pa.int64()),
                           ("pos", pa.int64()), ("lon", pa.float64()),
                           ("lat", pa.float64()), ("part", pa.int64())])

    def fused(batch: pa.Table) -> pa.Table:
        refs = batch["refs"].combine_chunks()
        offs = np.asarray(refs.offsets, np.int64)
        offs = offs - offs[0]
        counts = np.diff(offs)
        if not len(batch) or counts.sum() == 0:
            return empty_rep.empty_table()
        wids = batch["id"].combine_chunks().to_numpy()
        flat = refs.flatten().to_numpy()
        pos = np.arange(len(flat)) - np.repeat(offs[:-1], counts)
        way_of = np.repeat(np.arange(len(batch)), counts)
        lk = ray.get(node_ref)
        nid = lk["id"].to_numpy()
        order = np.argsort(nid, kind="stable")
        nid_s = nid[order]
        lon_s = lk["lon"].to_numpy()[order]
        lat_s = lk["lat"].to_numpy()[order]
        j = np.clip(np.searchsorted(nid_s, flat), 0, len(nid_s) - 1)
        found = nid_s[j] == flat  # unseen refs drop (error-as-data)
        way_of, pos, j = way_of[found], pos[found], j[found]
        lon, lat = lon_s[j], lat_s[j]
        if not len(way_of):
            return empty_rep.empty_table()
        starts = np.flatnonzero(np.r_[True, way_of[1:] != way_of[:-1]])
        bounds = np.r_[starts, len(way_of)]
        idx_out: list[np.ndarray] = []
        cell_out: list[np.ndarray] = []
        for k in range(len(starts)):
            s, e = int(bounds[k]), int(bounds[k + 1])
            for c in cells_covering_bbox(
                    float(lon[s:e].min()), float(lat[s:e].min()),
                    float(lon[s:e].max()), float(lat[s:e].max()), shard_res):
                idx_out.append(np.arange(s, e))
                cell_out.append(np.full(e - s, int(c), np.int64))
        idx = np.concatenate(idx_out)
        cells = np.concatenate(cell_out)
        return pa.table({"cell": pa.array(cells),
                         "way_id": pa.array(wids[way_of[idx]]),
                         "pos": pa.array(pos[idx]),
                         "lon": pa.array(lon[idx]),
                         "lat": pa.array(lat[idx]),
                         "part": pa.array(hash_part(cells, num_parts))},
                        schema=empty_rep)

    def build(t: pa.Table) -> pa.Table:
        cell = t["cell"].combine_chunks().to_numpy()
        wid = t["way_id"].combine_chunks().to_numpy()
        pos = t["pos"].combine_chunks().to_numpy()
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        order = np.lexsort((pos, wid, cell))
        cell, wid = cell[order], wid[order]
        lon, lat = lon[order], lat[order]
        out_cell: list[int] = []
        out_blob: list[bytes] = []
        ucells, cstarts = np.unique(cell, return_index=True)
        cbounds = np.append(cstarts, len(cell))
        for ci in range(len(ucells)):
            cs, ce = int(cbounds[ci]), int(cbounds[ci + 1])
            uw, wstarts = np.unique(wid[cs:ce], return_index=True)
            wb = np.append(wstarts, ce - cs) + cs
            xs = [lon[wb[i]:wb[i + 1]] for i in range(len(uw))]
            ys = [lat[wb[i]:wb[i + 1]] for i in range(len(uw))]
            out_cell.append(int(ucells[ci]))
            out_blob.append(pickle.dumps(
                PolygonIndex(uw.astype(np.int64), xs, ys)))
        return pa.table({"cell": pa.array(out_cell, pa.int64()),
                         "blob": pa.array(out_blob, pa.binary())})

    manifest = closed_ways(ways).select_columns(["id", "refs"]) \
        .map_batches(fused, batch_format="pyarrow") \
        .groupby("part").map_groups(build, batch_format="pyarrow")
    shards: dict[int, ray.ObjectRef] = {}
    for batch in manifest.iter_batches(batch_size=256,
                                       batch_format="pyarrow"):
        for c, blob in zip(batch["cell"].to_pylist(),
                           batch["blob"].to_pylist()):
            shards[int(c)] = ray.put(pickle.loads(blob))
    return shards


def pip_join_sharded(images: ray.data.Dataset,
                     shard_refs: dict[int, ray.ObjectRef],
                     shard_res: int = 12,
                     id_col: str = "image_id",
                     num_parts: int = 32) -> ray.data.Dataset:
    """(image_id, feature_id) PIP matches via cell-prefix co-partitioning:
    images are PRUNED to cells that hold any polygon shard (vectorized
    membership — a point in a shardless cell can't match, so it never
    enters the exchange), then shuffle by a BOUNDED hash partition of the
    shard cell; each partition task sorts its rows once and queries each
    cell-run against only that cell's polygon shard (one Ray task per
    partition — the round-1 per-cell map_groups paid one Ray+pandas call
    per cell, ~15 s at sf0.1). Result is identical to the broadcast
    ``pip_join`` (same DuckDB oracle) — sharding reshapes the exchange,
    never the answer."""
    import pyarrow.compute as _pc
    from ..relational import hash_part
    from ..stages.assign import make_cell_assigner
    cell_col = f"cell_r{shard_res}"
    shard_cells = pa.array(sorted(shard_refs), pa.int64())

    def prune(batch: pa.Table) -> pa.Table:
        batch = batch.filter(_pc.is_in(batch[cell_col],
                                       value_set=shard_cells))
        cells = batch[cell_col].combine_chunks().to_numpy()
        return batch.append_column("part",
                                   pa.array(hash_part(cells, num_parts)))

    pts = images.map_batches(decode_geotag, batch_format="pyarrow") \
                .map_batches(make_cell_assigner((shard_res,)),
                             batch_format="pyarrow") \
                .map_batches(prune, batch_format="pyarrow")

    def per_partition(t: pa.Table) -> pa.Table:
        cells = t[cell_col].combine_chunks().to_numpy()
        order = np.argsort(cells, kind="stable")
        cs = cells[order]
        px = t["lon"].combine_chunks().to_numpy()[order]
        py = t["lat"].combine_chunks().to_numpy()[order]
        ids = t[id_col].combine_chunks().take(pa.array(order))
        ucells, starts = np.unique(cs, return_index=True)
        bounds = np.append(starts, len(cs))
        out_pi: list[np.ndarray] = []
        out_fid: list[np.ndarray] = []
        for i, c in enumerate(ucells):
            ref = shard_refs.get(int(c))
            if ref is None:
                continue
            idx: PolygonIndex = ray.get(ref)  # ONLY this cell's polygons
            s, e = int(bounds[i]), int(bounds[i + 1])
            pi, fids = idx.query(px[s:e], py[s:e])
            out_pi.append(pi + s)
            out_fid.append(fids)
        if not out_pi:
            return pa.table({id_col: ids.slice(0, 0),
                             "feature_id": pa.array([], pa.int64())})
        return pa.table({
            id_col: ids.take(pa.array(np.concatenate(out_pi))),
            "feature_id": pa.array(np.concatenate(out_fid)),
        })

    return pts.groupby("part").map_groups(per_partition,
                                          batch_format="pyarrow")


def _exact_scan(px: np.ndarray, py: np.ndarray, fid: np.ndarray,
                fx: np.ndarray, fy: np.ndarray,
                feat_chunk: int = 256, row_chunk: int = 128) -> np.ndarray:
    """EXACT nearest-feature full scan: the float64 formula tiled over
    BOTH rows and feature chunks with a strict running minimum. Feature
    arrays must be ASCENDING-id; np.argmin returns the first (= lowest
    id) occurrence within a chunk and the strict < keeps the earlier
    chunk's winner, so smallest-id tie-break needs no extra pass. The
    (row_chunk x feat_chunk) working buffers are ~0.5 MB — L2-resident,
    so 24+ concurrent actors scale near-linearly (measured: untiled
    n x 512 buffers were 4x slower per process and lost 2x more to
    shared-L3/DRAM contention at 24 procs). (A float32 GEMM prefilter
    was measured SLOWER here: OpenBLAS sgemm with inner dim 2 is
    pathological, ~1 s for a 4096x8614 product.)"""
    n, m = len(px), len(fid)
    best_id = np.full(n, -1, np.int64)
    if m == 0:
        return best_id
    best_d = np.full(n, np.inf)
    fck = min(feat_chunk, m)
    rck = min(row_chunk, max(n, 1))
    # preallocated buffers + explicit out= ufuncs: the plain broadcast
    # expression `px[:,None] - fx[None,:]` is ~17x slower on this numpy
    # build (fresh-allocation path); ops stay bit-identical
    bx = np.empty((rck, fck))
    by = np.empty((rck, fck))
    for rs in range(0, n, rck):
        re_ = min(rs + rck, n)
        rw = re_ - rs
        rpx = px[rs:re_, None]
        rpy = py[rs:re_, None]
        bd = best_d[rs:re_]
        bi = best_id[rs:re_]
        rows = np.arange(rw)
        for s in range(0, m, fck):
            e = min(s + fck, m)
            w = e - s
            dx, dy = bx[:rw, :w], by[:rw, :w]
            np.subtract(rpx, fx[None, s:e], out=dx)
            np.subtract(rpy, fy[None, s:e], out=dy)
            np.multiply(dx, dx, out=dx)
            np.multiply(dy, dy, out=dy)
            np.add(dx, dy, out=dx)  # d2
            j = np.argmin(dx, axis=1)
            dmin = dx[rows, j]
            upd = dmin < bd  # strict: earlier (smaller-id) chunk wins ties
            bd[upd] = dmin[upd]
            bi[upd] = fid[s + j[upd]]
    return best_id


def _ragged_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated (CSR expansion; zero counts
    fine — repeat simply skips them)."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    starts = np.concatenate([np.zeros(1, np.int64),
                             np.cumsum(counts)[:-1]])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


_INT64_MAX = np.iinfo(np.int64).max


class NearestFeature:
    """Actor-pool stage: EXACT nearest feature per point against a
    broadcast (id, lon, lat) feature table.

    Distance = squared euclidean in degrees, final ranking evaluated as
    ``(px-fx)*(px-fx) + (py-fy)*(py-fy)`` in float64 (same op order as the
    SQL oracle); ties broken toward the smallest feature id.

    Physical plan: a DATA-ADAPTIVE uniform grid over the feature bbox
    (~5 features per bucket; the repo's global geocells are useless here
    because the corpus spans ~0.2 degrees) prunes the scan — each point
    gathers candidates from an expanding square region of buckets and is
    DONE when its best squared distance is strictly below its squared
    distance to the region boundary, so any feature outside the region
    is provably farther (the same proof as the oracle-green
    _ring_search). The gather/score/argmin pipeline is fully vectorized
    across points (ragged CSR expansion + minimum.reduceat; the masked
    fid reduceat implements the smallest-id tie-break); nothing loops
    per point or per bucket. vs the r3 full tiled scan this cuts pair
    evaluations ~100x at sf0.1 (8.6k features): the scan visited every
    (point, feature) pair, 97% of all flagship compute. Small layers
    (< 512 features) or degenerate bboxes fall back to the exact tiled
    scan (_exact_scan), which is also the per-candidate kernel of the
    sharded ring path."""

    def __init__(self, feats_ref, id_col: str = "image_id",
                 feat_chunk: int = 256, row_chunk: int = 128):
        # accepts an ObjectRef (actor-pool path) or a plain pa.Table
        # (the no-Ray retention harness)
        t: pa.Table = ray.get(feats_ref) \
            if isinstance(feats_ref, ray.ObjectRef) else feats_ref
        fid = t["id"].to_numpy()
        order = np.argsort(fid, kind="stable")
        self.fid = fid[order]
        self.fx = t["lon"].to_numpy()[order]
        self.fy = t["lat"].to_numpy()[order]
        self.id_col = id_col
        self.feat_chunk = feat_chunk
        self.row_chunk = row_chunk
        m = len(self.fid)
        self.grid = None
        if m >= 512:
            x0, x1 = float(self.fx.min()), float(self.fx.max())
            y0, y1 = float(self.fy.min()), float(self.fy.max())
            g = int(np.clip(np.sqrt(m / 5.0), 4, 512))
            csx, csy = (x1 - x0) / g, (y1 - y0) / g
            if csx > 0 and csy > 0:
                gx = np.clip(((self.fx - x0) / csx).astype(np.int64),
                             0, g - 1)
                gy = np.clip(((self.fy - y0) / csy).astype(np.int64),
                             0, g - 1)
                key = gx * g + gy
                # stable by-key sort keeps ids ascending within bucket
                gidx = np.argsort(key, kind="stable")
                gkeys, gstart, gcount = np.unique(
                    key[gidx], return_index=True, return_counts=True)
                self.grid = {"g": g, "x0": x0, "y0": y0,
                             "csx": csx, "csy": csy, "gidx": gidx,
                             "gkeys": gkeys, "gstart": gstart,
                             "gcount": gcount}

    def nearest(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        if self.grid is None:
            return _exact_scan(px, py, self.fid, self.fx, self.fy,
                               self.feat_chunk, self.row_chunk)
        # process points in ~1024-point chunks: the ragged gather's
        # working set then stays cache-resident, measured 42 ms/4096-pt
        # batch at BOTH 6 and 24 concurrent processes (1.00 retention)
        # vs 60/72 ms unchunked — the same shared-L3/DRAM lesson as the
        # tiled scan, applied to the gather path
        n = len(px)
        if n > 1024:
            out = np.empty(n, np.int64)
            for s in range(0, n, 1024):
                out[s:s + 1024] = self._nearest_grid(px[s:s + 1024],
                                                     py[s:s + 1024])
            return out
        return self._nearest_grid(px, py)

    def _nearest_grid(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        gr = self.grid
        g = gr["g"]
        n = len(px)
        pix = np.clip(((px - gr["x0"]) / gr["csx"]).astype(np.int64),
                      0, g - 1)
        piy = np.clip(((py - gr["y0"]) / gr["csy"]).astype(np.int64),
                      0, g - 1)
        best = np.full(n, -1, np.int64)
        u = np.arange(n)
        k = 1
        while len(u):
            x0 = np.maximum(pix[u] - k, 0)
            x1 = np.minimum(pix[u] + k, g - 1)
            y0 = np.maximum(piy[u] - k, 0)
            y1 = np.minimum(piy[u] + k, g - 1)
            ncy = y1 - y0 + 1
            ncell = (x1 - x0 + 1) * ncy
            # (point, region-cell) ragged expansion
            pt_of_cell = np.repeat(np.arange(len(u)), ncell)
            r = _ragged_arange(ncell)
            keys = ((x0[pt_of_cell] + r // ncy[pt_of_cell]) * g
                    + (y0[pt_of_cell] + r % ncy[pt_of_cell]))
            pos = np.searchsorted(gr["gkeys"], keys) \
                .clip(max=max(len(gr["gkeys"]) - 1, 0))
            hit = gr["gkeys"][pos] == keys
            bstart = np.where(hit, gr["gstart"][pos], 0)
            blen = np.where(hit, gr["gcount"][pos], 0)
            # (point, candidate) ragged expansion
            cand = bstart.repeat(blen) + _ragged_arange(blen)
            f = gr["gidx"][cand]
            pt_of_cand = pt_of_cell.repeat(blen)
            dxx = px[u][pt_of_cand] - self.fx[f]
            dyy = py[u][pt_of_cand] - self.fy[f]
            d2 = dxx * dxx + dyy * dyy  # same per-pair op order as the scan
            seg_len = np.zeros(len(u), np.int64)
            np.add.at(seg_len, pt_of_cell, blen)
            has = seg_len > 0
            seg_start = np.concatenate(
                [np.zeros(1, np.int64), np.cumsum(seg_len)[:-1]])[has]
            dmin = np.full(len(u), np.inf)
            win = np.full(len(u), -1, np.int64)
            if has.any():
                dmin[has] = np.minimum.reduceat(d2, seg_start)
                tie = d2 == np.repeat(dmin[has], seg_len[has])
                fid_masked = np.where(tie, self.fid[f], _INT64_MAX)
                win[has] = np.minimum.reduceat(fid_masked, seg_start)
            # any unsearched feature lies in one of <= 4 complement SLABS
            # of the grid bbox (left/right of the region spanning full
            # grid height; below/above spanning the region's width); a
            # slab is absent when the region touches that grid edge. The
            # bound is the point-to-RECTANGLE distance to each slab —
            # infinite-line boundaries (the first cut) never resolve
            # points diagonally outside the bbox, which then escalate to
            # full-grid regions.
            gx1b = gr["x0"] + g * gr["csx"]
            gy1b = gr["y0"] + g * gr["csy"]
            rl = gr["x0"] + x0 * gr["csx"]   # region edges in degrees
            rr = gr["x0"] + (x1 + 1) * gr["csx"]
            rb = gr["y0"] + y0 * gr["csy"]
            rt = gr["y0"] + (y1 + 1) * gr["csy"]
            pux, puy = px[u], py[u]

            def slab_d2(sx0, sx1, sy0, sy1, absent):
                dx = np.maximum(np.maximum(sx0 - pux, pux - sx1), 0.0)
                dy = np.maximum(np.maximum(sy0 - puy, puy - sy1), 0.0)
                return np.where(absent, np.inf, dx * dx + dy * dy)

            out_d2 = np.minimum.reduce([
                slab_d2(gr["x0"], rl, gr["y0"], gy1b, x0 == 0),
                slab_d2(rr, gx1b, gr["y0"], gy1b, x1 == g - 1),
                slab_d2(rl, rr, gr["y0"], rb, y0 == 0),
                slab_d2(rl, rr, rt, gy1b, y1 == g - 1),
            ])
            done = has & (dmin < out_d2)
            best[u[done]] = win[done]
            u = u[~done]
            if len(u) and 4 * k + 1 >= g // 2:
                # Early tail escalation (round-5, mirrors _topk_grid):
                # once the next doubled region would span >= half the
                # grid, the ragged gather approaches all-m candidates per
                # unfinished point; the exact tiled scan is O(m) per
                # point with cache-resident tiles and identical
                # (d2, id) semantics. Also the safety valve for
                # unresolvable points (NaN coords etc.).
                best[u] = _exact_scan(px[u], py[u], self.fid,
                                      self.fx, self.fy,
                                      self.feat_chunk, self.row_chunk)
                break
            k *= 2
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch["lon"].combine_chunks().to_numpy()
        py = batch["lat"].combine_chunks().to_numpy()
        return pa.table({
            self.id_col: batch[self.id_col].combine_chunks(),
            "feature_id": pa.array(self.nearest(px, py)),
        })


def knn_nearest(images: ray.data.Dataset, feats_ref: ray.ObjectRef,
                concurrency: int | tuple[int, int] | None = None,
                batch_size: int = 2048) -> ray.data.Dataset:
    from ..util import default_pool
    pool = concurrency or default_pool()
    pts = images.repartition(_fanout(pool)) \
        .map_batches(decode_geotag, batch_format="pyarrow")
    return pts.map_batches(NearestFeature, fn_constructor_args=(feats_ref,),
                           batch_format="pyarrow", batch_size=batch_size,
                           concurrency=pool)


def build_knn_feature_cells(feats: pa.Table, res: int = 3) -> ray.ObjectRef:
    """Cell-bucketed feature layer for the sharded kNN path: features
    grouped by geocell at ``res``, sorted by id within cell. One
    broadcast object here; at cluster scale each bucket is its own
    object-store entry fetched per ring (like the PIP shards)."""
    from ..geo import tiles
    fid = feats["id"].to_numpy()
    fx = feats["lon"].to_numpy()
    fy = feats["lat"].to_numpy()
    order = np.argsort(fid, kind="stable")
    fid, fx, fy = fid[order], fx[order], fy[order]
    cells = tiles.cell_id(fx, fy, res)
    buckets: dict[int, tuple] = {}
    for c in np.unique(cells):
        m = cells == c
        buckets[int(c)] = (fid[m], fx[m], fy[m])
    return ray.put({"res": res, "total": len(fid), "buckets": buckets})


def _ring_search(layer: dict, cell: int, px: np.ndarray, py: np.ndarray,
                 res: int) -> np.ndarray:
    """EXACT nearest-feature ids for one cell's points: scan only the
    feature buckets inside an expanding square ring region, growing
    geometrically until every point's best squared distance is STRICTLY
    below its squared distance to the searched region's boundary — any
    feature outside the region is then provably farther, so the result
    (including smallest-id tie-breaks inside the region) equals the full
    scan."""
    from ..geo import tiles
    n_side = 1 << res
    buckets = layer["buckets"]
    total = layer["total"]
    _, cx, cy = tiles.cell_to_xy(np.array([cell]))
    cx, cy = int(cx[0]), int(cy[0])
    k = 1
    while True:
        x0, x1 = max(cx - k, 0), min(cx + k, n_side - 1)
        y0, y1 = max(cy - k, 0), min(cy + k, n_side - 1)
        cand = [buckets[c] for c in
                (int((np.int64(res) << np.int64(tiles.RES_SHIFT))
                     | (np.int64(x) << np.int64(tiles.XY_BITS)) | np.int64(y))
                 for x in range(x0, x1 + 1) for y in range(y0, y1 + 1))
                if c in buckets]
        m = sum(len(c[0]) for c in cand)
        full = (x0 == 0 and y0 == 0 and x1 == n_side - 1
                and y1 == n_side - 1)
        if m == 0:
            if full:  # empty feature layer: no match anywhere
                best = np.full(len(px), -1, np.int64)
                break
            k *= 2
            continue
        if m:
            cfid = np.concatenate([c[0] for c in cand])
            cfx = np.concatenate([c[1] for c in cand])
            cfy = np.concatenate([c[2] for c in cand])
            ord_ = np.argsort(cfid, kind="stable")
            cfid, cfx, cfy = cfid[ord_], cfx[ord_], cfy[ord_]
            best = _exact_scan(px, py, cfid, cfx, cfy,
                               feat_chunk=256, row_chunk=256)
            if full or m == total:
                break
            # region boundary in degrees (corner-cell bounds)
            lonL, _, _, _ = tiles.cell_bounds(np.array(
                [(np.int64(res) << np.int64(tiles.RES_SHIFT))
                 | (np.int64(x0) << np.int64(tiles.XY_BITS)) | np.int64(y0)]))
            _, _, lonR, latT = tiles.cell_bounds(np.array(
                [(np.int64(res) << np.int64(tiles.RES_SHIFT))
                 | (np.int64(x1) << np.int64(tiles.XY_BITS)) | np.int64(y0)]))
            _, latB, _, _ = tiles.cell_bounds(np.array(
                [(np.int64(res) << np.int64(tiles.RES_SHIFT))
                 | (np.int64(x0) << np.int64(tiles.XY_BITS)) | np.int64(y1)]))
            bdist = np.minimum.reduce([
                px - float(lonL[0]), float(lonR[0]) - px,
                py - float(latB[0]), float(latT[0]) - py])
            # recompute best squared distance for the criterion
            d2 = np.full(len(px), np.inf)
            ok = best >= 0
            if ok.any():
                j = np.searchsorted(cfid, best[ok])
                d2[ok] = (px[ok] - cfx[j]) ** 2 + (py[ok] - cfy[j]) ** 2
            if bool(np.all(d2 < np.maximum(bdist, 0.0) ** 2)):
                break
        k *= 2
    return best


def knn_nearest_sharded(images: ray.data.Dataset, cells_ref: ray.ObjectRef,
                        res: int = 3, id_col: str = "image_id",
                        num_parts: int = 32) -> ray.data.Dataset:
    """EXACT nearest feature via cell partitioning + neighbor-ring
    expansion (SURVEY §2.5 J5, the scale path next to the broadcast
    NearestFeature scan): images shuffle by a BOUNDED hash partition of
    their geocell; each partition task sorts its rows once and runs the
    ring search per cell-run (one Ray task per partition — the round-1
    per-cell map_groups paid one Ray+pandas call per cell, ~13 s at
    sf0.1). Verified against the same DuckDB oracle as knn_nearest."""
    from ..relational import hash_part
    from ..stages.assign import make_cell_assigner
    cell_col = f"cell_r{res}"

    def assign(batch: pa.Table) -> pa.Table:
        batch = make_cell_assigner((res,))(batch)
        cells = batch[cell_col].combine_chunks().to_numpy()
        return batch.append_column("part",
                                   pa.array(hash_part(cells, num_parts)))

    pts = images.map_batches(decode_geotag, batch_format="pyarrow") \
                .map_batches(assign, batch_format="pyarrow")

    def per_partition(t: pa.Table) -> pa.Table:
        layer = ray.get(cells_ref)  # the bucketed feature layer, once
        cells = t[cell_col].combine_chunks().to_numpy()
        order = np.argsort(cells, kind="stable")
        cs = cells[order]
        px = t["lon"].combine_chunks().to_numpy()[order]
        py = t["lat"].combine_chunks().to_numpy()[order]
        ids = t[id_col].combine_chunks().take(pa.array(order))
        ucells, starts = np.unique(cs, return_index=True)
        bounds = np.append(starts, len(cs))
        best = np.empty(len(cs), np.int64)
        for i, c in enumerate(ucells):
            s, e = int(bounds[i]), int(bounds[i + 1])
            best[s:e] = _ring_search(layer, int(c), px[s:e], py[s:e], res)
        return pa.table({id_col: ids, "feature_id": pa.array(best)})

    return pts.groupby("part").map_groups(per_partition,
                                          batch_format="pyarrow")


class TopKCosine:
    """Actor-pool partial top-k cosine stage for ANN over embeddings.

    Holds the normalized query matrix (broadcast once); per batch emits the
    per-batch top-k candidates per query — a mergeable partial, so the
    final exact top-k is a tiny groupby over k*num_blocks rows per query
    (combiner pattern, SURVEY §4 'pre-aggregate').
    """

    def __init__(self, queries_ref: ray.ObjectRef, k: int, dtype=np.float64):
        q: pa.Table = ray.get(queries_ref)
        self.qid = q["vec_id"].to_numpy()
        qm = np.stack(q["embedding"].to_numpy(zero_copy_only=False)).astype(dtype)
        self.qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        self.k = k
        self.dtype = dtype

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.stack(batch["embedding"].combine_chunks().to_numpy(zero_copy_only=False)).astype(self.dtype)
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        vids = batch["vec_id"].combine_chunks().to_numpy()
        sims = emb @ self.qm.T  # (n, q)
        k = min(self.k, sims.shape[0])
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            top = np.lexsort((vids, -col))[:k]  # sim desc, vec_id asc
            out_q.append(np.full(k, self.qid[qi], np.int64))
            out_v.append(vids[top].astype(np.int64))
            out_s.append(col[top])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "sim": pa.array(np.concatenate(out_s)),
        })



def _topk_final(score_col: str, out_cols: list[str], k: int):
    """Per-query top-k merge over actor-pool partials, Arrow end-to-end
    (the r3 finals were the repo's last pandas-format group kernels,
    VERDICT r3 wrong-#4): one sort_indices + take per query group."""
    def final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(score_col, "descending"),
                                            ("vec_id", "ascending")])
        top = t.take(idx[:k])
        top = top.append_column(
            "rank", pa.array(np.arange(1, top.num_rows + 1, dtype=np.int64)))
        return top.select(out_cols)
    return final


def ann_topk(embeddings: ray.data.Dataset, queries_ref: ray.ObjectRef, k: int,
             concurrency: int | tuple[int, int] | None = None,
             batch_size: int = 4096) -> ray.data.Dataset:
    """Exact top-k cosine neighbors per broadcast query (brute-force
    baseline; per-batch partials merged by a small groupby)."""
    from ..util import default_pool
    partials = embeddings.map_batches(TopKCosine, fn_constructor_args=(queries_ref, k),
                                      batch_format="pyarrow", batch_size=batch_size,
                                      concurrency=concurrency or default_pool(8))

    return partials.groupby("query_id").map_groups(
        _topk_final("sim", ["query_id", "rank", "vec_id"], k),
        batch_format="pyarrow")


def detect_hot_cells(pts: ray.data.Dataset, cell_col: str,
                     hot_fraction: float = 0.002) -> tuple[list[int], int]:
    """Cells holding more than ``hot_fraction`` of all rows (the skewed
    urban cells the north rule requires salting): per-block partial
    counts -> the bounded hash-partition combiner merge
    (relational.partial_groupby_agg) -> DISTRIBUTED filter. Only the hot
    list (at most 1/hot_fraction entries by definition) ever reaches the
    driver — the round-3 plan merged every partial row in one task and
    to_pandas'd it, a scale-killer at blocks x cells-per-block rows."""
    from ..relational import partial_groupby_agg

    def partial(t: pa.Table) -> pa.Table:
        c = t[cell_col].combine_chunks().to_numpy()
        u, n = np.unique(c, return_counts=True)
        return pa.table({"cell": pa.array(u), "pn": pa.array(n.astype(np.int64))})

    agg = partial_groupby_agg(
        pts.map_batches(partial, batch_format="pyarrow"),
        ["cell"], [("pn", "sum")]).materialize()
    total = int(agg.sum("pn_sum") or 0)
    cut = total * hot_fraction

    def only_hot(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.greater(t["pn_sum"], cut))

    hot = agg.map_batches(only_hot, batch_format="pyarrow").take_all()
    return sorted(int(r["cell"]) for r in hot), total


def salted_cell_histogram(images: ray.data.Dataset, resolution: int = 7,
                          hot_fraction: float = 0.002,
                          salt_buckets: int = 8,
                          id_col: str = "image_id") -> ray.data.Dataset:
    """Cell histogram through the SALTED shuffle path (north rule: "hot
    cells are salted and split before a groupby-cell shuffle").

    Stage 1 detects hot cells (per-block partials, broadcast once);
    stage 2 salts rows in hot cells so the first EXCHANGE keys on
    hash(cell, salt) — no reducer sees more than ~1/salt_buckets of a
    hot cell — and a second, tiny exchange keyed on hash(cell) folds the
    salt partials into final per-cell counts. Both exchanges are the
    bounded hash-partition + one-Acero-merge-per-partition pattern
    (Ray's per-key groupby.aggregate paid per-group overhead on the
    ~9k-cell space — measured ~2x the whole query). The result must be
    IDENTICAL to the unsalted histogram (same DuckDB oracle), proving
    salting only reshapes the exchange, never the answer."""
    from ..relational import hash_part
    from ..stages.assign import make_cell_assigner, make_salter

    cell_col = f"cell_r{resolution}"
    pts = images.map_batches(decode_geotag, batch_format="pyarrow") \
                .map_batches(make_cell_assigner((resolution,)),
                             batch_format="pyarrow") \
                .materialize()  # consumed by detection AND the salted pass
    hot, _ = detect_hot_cells(pts, cell_col, hot_fraction)
    hot_ref = ray.put(hot)
    salted = pts.map_batches(make_salter(cell_col, hot_ref, salt_buckets,
                                         id_col), batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({cell_col: t[cell_col], "salt": t["salt"]}) \
            .group_by([cell_col, "salt"]).aggregate([([], "count_all")])
        g = g.rename_columns([cell_col, "salt", "pn"])
        cells = g[cell_col].combine_chunks().to_numpy()
        salt = g["salt"].combine_chunks().to_numpy()
        with np.errstate(over="ignore"):
            key = cells.astype(np.uint64) * np.uint64(salt_buckets) \
                + salt.astype(np.uint64)
        return g.append_column("part", pa.array(hash_part(key, 32)))

    def merge_salt(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]) \
            .group_by([cell_col, "salt"]).aggregate([("pn", "sum")])
        g = g.rename_columns([cell_col, "salt", "sn"])
        cells = g[cell_col].combine_chunks().to_numpy()
        return g.append_column("part", pa.array(hash_part(cells, 32)))

    def merge_cell(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part", "salt"]) \
            .group_by(cell_col).aggregate([("sn", "sum")])
        g = g.rename_columns([cell_col, "n"])
        return pa.table({cell_col: g[cell_col],
                         "n": pc.cast(g["n"], pa.int64())})

    return salted.map_batches(partial, batch_format="pyarrow") \
        .groupby("part").map_groups(merge_salt, batch_format="pyarrow") \
        .groupby("part").map_groups(merge_cell, batch_format="pyarrow")


def _priority_sample_matrix(embeddings: ray.data.Dataset,
                            sample: int = 4096) -> np.ndarray:
    """Deterministic HASH-PRIORITY sample of embedding rows as one
    normalized float64 matrix (seed-free — same input, same rows,
    independent of block order/partitioning): the global sample = the
    ``sample`` rows with the smallest id-hash priorities; each block
    pre-trims to its local smallest ``sample`` (a mergeable combiner),
    the driver takes the global smallest. One streamed pass, no count(),
    no sort (the round-2 form paid a whole-dataset all-to-all sort for
    the same 4096 rows, VERDICT r2 #4). Shared by the IVF coarse
    quantizer and the PQ codebook trainer."""
    ds = embeddings.select_columns(["vec_id", "embedding"])
    gold = np.uint64(0x9E3779B97F4A7C15)

    def _pri(vid: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            return (vid.astype(np.uint64) * gold) >> np.uint64(33)

    def pick(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].combine_chunks().to_numpy()
        if len(vid) <= sample:
            return t
        # trim under the SAME (pri, vid) total order the driver uses:
        # pri has 31 bits, so priority TIES at the trim boundary are
        # real — an argpartition on pri alone could drop the tied row
        # the global order keeps, making the sample (and so the
        # centroids) depend on block boundaries
        keep = np.lexsort((vid, _pri(vid)))[:sample]
        return t.take(pa.array(np.sort(keep)))

    tabs = [x for x in ray.get(
        ds.map_batches(pick, batch_format="pyarrow").to_arrow_refs())
        if len(x)]
    t = pa.concat_tables(tabs).combine_chunks()
    vid = t["vec_id"].to_numpy()
    best = np.lexsort((vid, _pri(vid)))[:sample]
    order = best[np.argsort(vid[best], kind="stable")]
    x = np.stack(t["embedding"].to_numpy(zero_copy_only=False))[order] \
        .astype(np.float64)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def ivf_centroids(embeddings: ray.data.Dataset, n_lists: int,
                  iters: int = 3, sample: int = 4096) -> np.ndarray:
    """Deterministic coarse quantizer for IVF: k-means on the
    hash-priority sample (_priority_sample_matrix), initialized with
    evenly spaced sample vectors."""
    x = _priority_sample_matrix(embeddings, sample)
    cent = x[np.linspace(0, len(x) - 1, n_lists).astype(np.int64)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(n_lists):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cent[c] = v / np.linalg.norm(v)
    return cent


class IVFTopK:
    """IVF-bucketed ANN stage — the scale path next to the brute-force
    TopKCosine: each candidate vector is probed ONLY against queries
    whose ``nprobe`` nearest centroids include the vector's list, cutting
    the scan to ~nprobe/n_lists of the brute-force work. Emits mergeable
    per-batch top-k partials exactly like TopKCosine, so the final exact
    merge is the same small groupby. Recall < 1.0 by construction; the
    test gate asserts recall vs the exact scan."""

    def __init__(self, queries_ref: ray.ObjectRef, cent_ref: ray.ObjectRef,
                 k: int, nprobe: int = 4):
        q: pa.Table = ray.get(queries_ref)
        self.qid = q["vec_id"].to_numpy()
        qm = np.stack(q["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        self.qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        self.cent = ray.get(cent_ref)
        # per-query probed list set -> bool mask (n_queries, n_lists)
        qc = self.qm @ self.cent.T
        nprobe = min(nprobe, self.cent.shape[0])
        probed = np.argpartition(-qc, nprobe - 1, axis=1)[:, :nprobe]
        self.probe_mask = np.zeros((len(self.qid), self.cent.shape[0]), bool)
        self.probe_mask[np.arange(len(self.qid))[:, None], probed] = True
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.stack(batch["embedding"].combine_chunks()
                       .to_numpy(zero_copy_only=False)).astype(np.float64)
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        vids = batch["vec_id"].combine_chunks().to_numpy()
        lists = np.argmax(emb @ self.cent.T, axis=1)  # vector -> IVF list
        out_q, out_v, out_s = [], [], []
        for qi in range(len(self.qid)):
            m = self.probe_mask[qi, lists]
            if not m.any():
                continue
            col = emb[m] @ self.qm[qi]
            sub_v = vids[m]
            k = min(self.k, len(col))
            top = np.lexsort((sub_v, -col))[:k]
            out_q.append(np.full(k, self.qid[qi], np.int64))
            out_v.append(sub_v[top].astype(np.int64))
            out_s.append(col[top])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "vec_id": pa.array(np.concatenate(out_v)),
                         "sim": pa.array(np.concatenate(out_s))})


def ann_ivf_topk(embeddings: ray.data.Dataset, queries_ref: ray.ObjectRef,
                 k: int, n_lists: int = 16, nprobe: int = 8,
                 concurrency: int | tuple[int, int] | None = None,
                 batch_size: int = 4096) -> ray.data.Dataset:
    """Approximate top-k cosine via IVF lists (see IVFTopK)."""
    from ..util import default_pool
    cent_ref = ray.put(ivf_centroids(embeddings, n_lists))
    partials = embeddings.map_batches(
        IVFTopK, fn_constructor_args=(queries_ref, cent_ref, k, nprobe),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or default_pool(8))

    return partials.groupby("query_id").map_groups(
        _topk_final("sim", ["query_id", "rank", "vec_id"], k),
        batch_format="pyarrow")


def add_s2_cells(ds: ray.data.Dataset, levels: tuple[int, ...] = (10, 14)) -> ray.data.Dataset:
    """Append s2_l{level} cell-id columns (geo/s2.py scheme)."""
    def fn(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].combine_chunks().to_numpy()
        lat = batch["lat"].combine_chunks().to_numpy()
        for lev in levels:
            batch = batch.append_column(f"s2_l{lev}", pa.array(s2geo.cell_id(lon, lat, lev)))
        return batch
    return ds.map_batches(fn, batch_format="pyarrow")


def tagged_nodes(nodes: ray.data.Dataset, key: str) -> ray.data.Dataset:
    """Nodes carrying a tag key — the kNN feature layer."""
    from ..stages.filters import make_key_filter
    return nodes.map_batches(make_key_filter(keep=[key]), batch_format="pyarrow")


def cell_ring_density(pts: ray.data.Dataset, res: int = 9) -> ray.data.Dataset:
    """3x3 stencil density per occupied geocell: for every cell at ``res``
    holding at least one point, its own count plus the summed counts of
    the 8 edge/corner neighbors — the spatial-smoothing join every
    heatmap / hot-cell detector needs before thresholding.

    Physical plan: per-block partial counts (combiner) -> ONE guarded
    merge task (the cell key space at res<=9 is bounded by geometry —
    2^res x 2^res globally — not by data size, the cell_histogram
    argument) -> the 9-offset ring sum inside that task as nine sorted
    searchsorted lookups over the merged count vector, no pairwise join.
    World-edge cells take no wraparound: out-of-range neighbors simply
    contribute 0 (mirrored by the oracle's equi-join finding no row).
    """
    from ..geo import tiles as T
    from ..relational import single_merge
    from ..stages.assign import make_cell_assigner

    cells = pts.map_batches(make_cell_assigner((res,)),
                            batch_format="pyarrow")
    col = f"cell_r{res}"

    def partial(t: pa.Table) -> pa.Table:
        c = t[col].combine_chunks().to_numpy()
        u, n = np.unique(c, return_counts=True)
        return pa.table({col: pa.array(u), "pn": pa.array(n.astype(np.int64))})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(col).aggregate([("pn", "sum")])
        cell = g[col].combine_chunks().to_numpy()
        n = g["pn_sum"].combine_chunks().to_numpy().astype(np.int64)
        _, x, y = T.cell_to_xy(cell)
        # pack (x, y) so one sorted array serves all nine offset lookups
        key = (x << np.int64(32)) | y
        order = np.argsort(key, kind="stable")
        key_s, n_s = key[order], n[order]
        ring = np.zeros(len(cell), np.int64)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                q = ((x + dx) << np.int64(32)) | (y + dy)
                j = np.searchsorted(key_s, q).clip(max=max(len(key_s) - 1, 0))
                hit = key_s[j] == q if len(key_s) else np.zeros(len(q), bool)
                ring[hit] += n_s[j[hit]]
        return pa.table({col: pa.array(cell), "n": pa.array(n),
                         "ring_n": pa.array(ring)})

    return single_merge(cells.map_batches(partial, batch_format="pyarrow"),
                        merge)


def embedding_minmax(embeddings: ray.data.Dataset) -> tuple[np.ndarray, np.ndarray]:
    """Global per-dimension (min, max) over an embedding column — the
    calibration pass of scalar quantization. Per-block partials (one row
    per dim) merge elementwise; the dim count is a model constant, so the
    merge is bounded at any corpus size."""
    def partial(t: pa.Table) -> pa.Table:
        m = np.stack(t["embedding"].combine_chunks()
                     .to_numpy(zero_copy_only=False)).astype(np.float64)
        d = m.shape[1]
        return pa.table({"i": pa.array(np.arange(d, dtype=np.int64)),
                         "mn": pa.array(m.min(axis=0)),
                         "mx": pa.array(m.max(axis=0))})

    parts = [t for t in ray.get(
        embeddings.map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables([x.replace_schema_metadata(None) for x in parts])
    g = t.group_by("i").aggregate([("mn", "min"), ("mx", "max")])
    order = np.argsort(g["i"].combine_chunks().to_numpy())
    return (g["mn_min"].combine_chunks().to_numpy()[order],
            g["mx_max"].combine_chunks().to_numpy()[order])


def _sq_quantize(m: np.ndarray, mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    """uint8 scalar quantization, half-away rounding (sql_round mirror);
    degenerate dims (mx == mn) quantize to 0."""
    from ..util import round_half_away
    span = mx - mn
    x = np.where(span > 0, (m - mn) * 255.0 / np.where(span > 0, span, 1.0), 0.0)
    return round_half_away(x, 0).astype(np.int64)


class SQTopK:
    """Actor-pool partial top-k over scalar-quantized embeddings: the
    int8 memory-scale ANN path (4x smaller vectors than float32, integer
    dot products — exact-comparable, no float drift). Quantized query
    matrix and per-dim calibration load once per actor."""

    def __init__(self, queries_ref: ray.ObjectRef, minmax_ref: ray.ObjectRef,
                 k: int):
        q: pa.Table = ray.get(queries_ref)
        self.mn, self.mx = ray.get(minmax_ref)
        self.qid = q["vec_id"].to_numpy()
        qm = np.stack(q["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        self.qm = _sq_quantize(qm, self.mn, self.mx)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.stack(batch["embedding"].combine_chunks()
                       .to_numpy(zero_copy_only=False)).astype(np.float64)
        cq = _sq_quantize(emb, self.mn, self.mx)
        vids = batch["vec_id"].combine_chunks().to_numpy()
        dots = cq @ self.qm.T  # (n, q) int64
        k = min(self.k, dots.shape[0])
        out_q, out_v, out_d = [], [], []
        for qi in range(dots.shape[1]):
            col = dots[:, qi]
            # top-k by (dot desc, vec_id asc): lexsort ascending on
            # (-dot, vid), take first k
            idx = np.lexsort((vids, -col))[:k]
            out_q.append(np.full(k, self.qid[qi], np.int64))
            out_v.append(vids[idx])
            out_d.append(col[idx])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "dot": pa.array(np.concatenate(out_d)),
        })


def ann_sq_topk(embeddings: ray.data.Dataset, queries_ref: ray.ObjectRef,
                minmax_ref: ray.ObjectRef, k: int,
                concurrency: int | tuple[int, int] | None = None,
                batch_size: int = 4096) -> ray.data.Dataset:
    """Exact top-k by integer dot product over scalar-quantized vectors —
    same combiner shape as ann_topk; the quantized scores make the merge
    (and the oracle comparison) integer-exact."""
    from ..util import default_pool
    partials = embeddings.map_batches(
        SQTopK, fn_constructor_args=(queries_ref, minmax_ref, k),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or default_pool(8))

    return partials.groupby("query_id").map_groups(
        _topk_final("dot", ["query_id", "rank", "vec_id", "dot"], k),
        batch_format="pyarrow")


def cell_bbox(pts: ray.data.Dataset, res: int = 7,
              batch_size: int = 65536) -> ray.data.Dataset:
    """Per-geocell bounding box + count: for every occupied cell at
    ``res``, the min/max lon/lat of its points (rounded to 6 digits
    post-aggregation) and the point count — the tile-extent summary a
    renderer or spatial-partitioner derives before fetching payloads.

    Physical plan: the assigner fuses into the decode stage, then ONE
    combiner exchange (relational.partial_groupby_agg — per-block Acero
    partials, bounded hash partition of the cell key, per-partition
    Acero merge).  Rows moved = O(occupied cells x blocks), never
    O(points); min/max/sum are associative so the partials are exact.
    Rounding happens AFTER the merge (monotone, so round(min)=min(round))
    and mirrors util.sql_round in the DuckDB oracle."""
    from ..relational import partial_groupby_agg
    from ..stages.assign import make_cell_assigner
    from ..util import round_half_away

    assign = make_cell_assigner((res,))
    cell_col = f"cell_r{res}"

    def project(t: pa.Table) -> pa.Table:
        a = assign(t)
        return a.select([cell_col, "lon", "lat"])

    cells = pts.map_batches(project, batch_format="pyarrow",
                            batch_size=batch_size)
    agg = partial_groupby_agg(
        cells, [cell_col],
        [("lon", "min"), ("lon", "max"), ("lat", "min"), ("lat", "max"),
         ("lat", "count")])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            cell_col: t[cell_col],
            "lon_min6": round_half_away(t["lon_min"], 6),
            "lon_max6": round_half_away(t["lon_max"], 6),
            "lat_min6": round_half_away(t["lat_min"], 6),
            "lat_max6": round_half_away(t["lat_max"], 6),
            "n": pc.cast(t["lat_count"], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def radius_join(images: ray.data.Dataset, feats_ref: ray.ObjectRef,
                radius_m: float = 5000.0,
                concurrency: int | tuple[int, int] | None = None,
                batch_size: int = 4096) -> ray.data.Dataset:
    """Distance-within spatial join — the third classic next to PIP
    (containment) and kNN (nearest): (image_id, feature_id, dist_m3)
    for every pair whose haversine distance (sphere EARTH_R_M, the
    osm.way_length formula term-for-term) rounds at 3 digits to
    <= ``radius_m``.  The keep decision applies to the ROUNDED distance
    (clip_filter's boundary contract) so engine and SQL mirror agree
    exactly at the radius boundary.

    Plan: broadcast small side (one ray.put, read per actor in
    ``__init__``); per batch a conservative spherical-cap bounding-box
    prune — |dlat| <= r and sin(dlon/2) <= sin(r/2)/sqrt(cos phi_f
    cos phi_p), both evaluated at the layer's extreme latitude, so the
    box provably supersets every radius ball around a feature — then a
    chunked vectorized haversine verify over the survivors only.  With
    a continent-wide feature layer, swap the single box for the kNN
    cell-bucket layer (build_knn_feature_cells); the verify kernel is
    unchanged."""
    from .osm import EARTH_R_M
    from ..util import default_pool, round_half_away

    class RadiusJoin:
        def __init__(self, ref):
            t = ray.get(ref)
            self.fid = t["id"].to_numpy()
            self.fx = t["lon"].to_numpy()
            self.fy = t["lat"].to_numpy()
            rad = radius_m / EARTH_R_M
            dlat = np.degrees(rad)
            self.lat0 = float(self.fy.min()) - dlat if len(self.fy) else 1.0
            self.lat1 = float(self.fy.max()) + dlat if len(self.fy) else 0.0
            if len(self.fy):
                phimax = min(np.radians(89.9),
                             np.radians(float(np.abs(self.fy).max())) + rad)
                s = min(1.0, np.sin(rad / 2.0) / max(np.cos(phimax), 1e-12))
                dlon = float(np.degrees(2.0 * np.arcsin(s)))
                self.lon0 = float(self.fx.min()) - dlon
                self.lon1 = float(self.fx.max()) + dlon
            else:
                self.lon0, self.lon1 = 1.0, 0.0

        def __call__(self, t: pa.Table) -> pa.Table:
            lon = t["lon"].combine_chunks().to_numpy()
            lat = t["lat"].combine_chunks().to_numpy()
            ids = t["image_id"].combine_chunks()
            keep = ((lon >= self.lon0) & (lon <= self.lon1)
                    & (lat >= self.lat0) & (lat <= self.lat1))
            idx = np.flatnonzero(keep)
            d2r = np.pi / 180.0
            oi: list[np.ndarray] = []
            of: list[np.ndarray] = []
            od: list[np.ndarray] = []
            for lo in range(0, len(idx), 256):
                sl = idx[lo:lo + 256]
                p1 = lat[sl] * d2r
                cp1 = np.cos(p1)
                for flo in range(0, len(self.fid), 512):
                    fs = slice(flo, flo + 512)
                    p2 = self.fy[fs] * d2r
                    # term-for-term the osm.way_length haversine: lat
                    # operands converted THEN subtracted, lon subtracted
                    # THEN converted (mirrored by the SQL oracle)
                    sdp = np.sin((p2[None, :] - p1[:, None]) / 2.0)
                    sdl = np.sin((self.fx[fs][None, :] - lon[sl][:, None])
                                 * d2r / 2.0)
                    a = np.minimum(sdp * sdp
                                   + cp1[:, None] * np.cos(p2)[None, :]
                                   * sdl * sdl, 1.0)
                    d3 = round_half_away(
                        2.0 * EARTH_R_M * np.arcsin(np.sqrt(a)), 3)
                    ii, jj = np.nonzero(d3 <= radius_m)
                    if len(ii):
                        oi.append(sl[ii])
                        of.append(self.fid[fs][jj])
                        od.append(d3[ii, jj])
            if not oi:
                return pa.table({
                    "image_id": pa.array([], pa.string()),
                    "feature_id": pa.array([], pa.int64()),
                    "dist_m3": pa.array([], pa.float64())})
            return pa.table({
                "image_id": pc.take(ids, pa.array(np.concatenate(oi))),
                "feature_id": pa.array(np.concatenate(of)),
                "dist_m3": pa.array(np.concatenate(od)),
            })

    pool = concurrency or default_pool()
    pts = images.repartition(_fanout(pool)) \
        .map_batches(decode_geotag, batch_format="pyarrow")
    return pts.map_batches(RadiusJoin, fn_constructor_args=(feats_ref,),
                           batch_format="pyarrow", batch_size=batch_size,
                           concurrency=pool)


# --------------------------------------------------------- product quant

PQ_M, PQ_KSUB = 16, 256


def pq_codebooks(embeddings: ray.data.Dataset, m: int = PQ_M,
                 ksub: int = PQ_KSUB, iters: int = 3,
                 sample: int = 4096) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al.): split the
    normalized vector into ``m`` contiguous subspaces and run the same
    deterministic Lloyd recipe as ivf_centroids independently per
    subspace (hash-priority sample, evenly spaced init) — (m, ksub,
    d/m) float64.  Subspace centroids are NOT re-normalized (they
    approximate vector pieces, not directions)."""
    x = _priority_sample_matrix(embeddings, sample)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.empty((m, ksub, dsub), np.float64)
    for j in range(m):
        xs = x[:, j * dsub:(j + 1) * dsub]
        cent = xs[np.linspace(0, len(xs) - 1, ksub).astype(np.int64)].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ksub):
                mk = assign == c
                if mk.any():
                    cent[c] = xs[mk].mean(axis=0)
        books[j] = cent
    return books


def pq_encode(xn: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) int64 codes: per subspace, index of the nearest codeword
    (same broadcast expression as training — row-independent, so batch
    boundaries cannot change a code)."""
    m, _, dsub = books.shape
    codes = np.empty((len(xn), m), np.int64)
    for j in range(m):
        xs = xn[:, j * dsub:(j + 1) * dsub]
        d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


class PQTopK:
    """PQ-ADC ANN stage: queries precompute per-subspace lookup tables
    (query piece @ codebook.T) once per actor; each candidate batch is
    encoded to m uint-codes and scored by m table lookups accumulated in
    fixed subspace order (bit-deterministic regardless of batching) —
    the classic asymmetric-distance approximation of the dot product.
    Emits mergeable per-batch top-k partials like TopKCosine/IVFTopK."""

    def __init__(self, queries_ref: ray.ObjectRef, books_ref: ray.ObjectRef,
                 k: int):
        q: pa.Table = ray.get(queries_ref)
        self.qid = q["vec_id"].to_numpy()
        qm = np.stack(q["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        self.books = ray.get(books_ref)
        m, _, dsub = self.books.shape
        self.tabs = np.stack([
            qm[:, j * dsub:(j + 1) * dsub] @ self.books[j].T
            for j in range(m)])                 # (m, nq, ksub)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.stack(batch["embedding"].combine_chunks()
                       .to_numpy(zero_copy_only=False)).astype(np.float64)
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        vids = batch["vec_id"].combine_chunks().to_numpy()
        codes = pq_encode(emb, self.books)
        m = self.books.shape[0]
        s = np.zeros((len(self.qid), len(vids)), np.float64)
        for j in range(m):                      # fixed accumulation order
            s += self.tabs[j][:, codes[:, j]]
        out_q, out_v, out_s = [], [], []
        for qi in range(len(self.qid)):
            k = min(self.k, len(vids))
            top = np.lexsort((vids, -s[qi]))[:k]
            out_q.append(np.full(k, self.qid[qi], np.int64))
            out_v.append(vids[top].astype(np.int64))
            out_s.append(s[qi][top])
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "vec_id": pa.array(np.concatenate(out_v)),
                         "adc": pa.array(np.concatenate(out_s))})


def ann_pq_topk(embeddings: ray.data.Dataset, queries_ref: ray.ObjectRef,
                k: int, m: int = PQ_M, ksub: int = PQ_KSUB,
                concurrency: int | tuple[int, int] | None = None,
                batch_size: int = 4096) -> ray.data.Dataset:
    """Approximate top-k by PQ asymmetric-distance computation — the
    memory-side ANN next to IVF (routing) and SQ (int8): codes are
    m bytes/vector vs 8*d for raw float64, the compression that lets a
    100-TB embedding corpus fit a RAM-resident index."""
    from ..util import default_pool
    books_ref = ray.put(pq_codebooks(embeddings, m, ksub))
    partials = embeddings.map_batches(
        PQTopK, fn_constructor_args=(queries_ref, books_ref, k),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or default_pool(8))
    return partials.groupby("query_id").map_groups(
        _topk_final("adc", ["query_id", "rank", "vec_id"], k),
        batch_format="pyarrow")


def build_polygon_index_task(nodes_path: str, ways_path: str,
                             grid_res: int | None = None) -> ray.ObjectRef:
    """The single-index polygon-layer build as ONE Ray task over a
    direct pyarrow read — returns its ObjectRef immediately, so the
    ~3 s build (measured at sf0.1: a 4-stage Ray Data join + collect)
    OVERLAPS the flagship's read/decode stream instead of serializing in
    front of it (PIPTagger ray.gets the ref in ``__init__``).  Result is
    identical to build_polygon_index (pytest-asserted): same closed-ring
    filter, same drop-unfound-ref lookup, same (way, pos) vertex order.
    The Dataset build remains the path for non-parquet table registries;
    build_polygon_shards remains the at-scale sharded form."""
    @ray.remote(num_cpus=1)
    def _build(np_: str, wp: str, gr):
        return polygon_index_from_paths(np_, wp, gr)

    return _build.remote(nodes_path, ways_path, grid_res)


def polygon_index_from_paths(np_: str, wp: str,
                             gr: int | None = None) -> "PolygonIndex":
    """Plain (no-Ray) polygon-index build from parquet paths — the body
    of build_polygon_index_task, also used directly by the bench
    isolated-retention harness."""
    import pyarrow.parquet as pq2
    nt = pq2.read_table(np_, columns=["id", "lon", "lat"])
    wt = pq2.read_table(wp, columns=["id", "refs"])
    refs = wt["refs"].combine_chunks()
    offsets = np.asarray(refs.offsets, np.int64)
    flat = refs.flatten().to_numpy()
    n = np.diff(offsets)
    if len(flat):
        first = flat[offsets[:-1].clip(max=len(flat) - 1)]
        last = flat[(offsets[1:] - 1).clip(min=0)]
    else:
        first = last = np.empty(0, np.int64)
    cidx = np.flatnonzero((n >= 4) & (first == last))
    counts = n[cidx]
    wids = np.repeat(wt["id"].combine_chunks().to_numpy()[cidx], counts)
    pos = _ragged_arange(counts)
    tak = np.repeat(offsets[cidx], counts) + pos
    r = flat[tak]
    ids = nt["id"].to_numpy()
    order = np.argsort(ids, kind="stable")
    sorted_ids = ids[order]
    lon = nt["lon"].to_numpy()[order]
    lat = nt["lat"].to_numpy()[order]
    j = np.searchsorted(sorted_ids, r)
    j = np.clip(j, 0, max(len(sorted_ids) - 1, 0))
    found = sorted_ids[j] == r if len(sorted_ids) \
        else np.zeros(len(r), bool)
    wids, pos, j = wids[found], pos[found], j[found]
    x, y = lon[j], lat[j]
    order2 = np.lexsort((pos, wids))
    wid_s, lon_s, lat_s = wids[order2], x[order2], y[order2]
    fids, starts = np.unique(wid_s, return_index=True)
    bounds = np.append(starts, len(wid_s))
    xs = [lon_s[bounds[i]:bounds[i + 1]] for i in range(len(fids))]
    ys = [lat_s[bounds[i]:bounds[i + 1]] for i in range(len(fids))]
    return PolygonIndex(fids.astype(np.int64), xs, ys, grid_res=gr)


def feature_layer_task(nodes_path: str, key: str) -> ray.ObjectRef:
    """The kNN feature-layer build (tagged_nodes + broadcast_table) as
    ONE Ray task over a direct pyarrow read — same instant-ObjectRef
    overlap trick as build_polygon_index_task; content identical to the
    Dataset path (pytest-asserted)."""
    @ray.remote(num_cpus=1)
    def _build(np_: str, k: str) -> pa.Table:
        return feature_layer_from_path(np_, k)

    return _build.remote(nodes_path, key)


def feature_layer_from_path(np_: str, k: str) -> pa.Table:
    """Plain (no-Ray) kNN feature-layer build from a parquet path — the
    body of feature_layer_task, also used by the bench retention
    harness."""
    import pyarrow.parquet as pq2

    from ..stages.filters import make_key_filter
    t = pq2.read_table(np_, columns=["id", "lon", "lat", "tags"])
    t = make_key_filter(keep=[k])(t)
    return t.select(["id", "lon", "lat"]).combine_chunks()


# ------------------------------------------------------ bbox overlap join

def way_bboxes(nodes: ray.data.Dataset, ways: ray.data.Dataset
               ) -> ray.data.Dataset:
    """(way_id, x0, y0, x1, y1): per-way envelope over the RESOLVED
    refs (ways whose refs all dangle are dropped, mirroring the
    oracle's inner join).  Same physical plan as way_geom_stats: node
    table broadcast once, per-batch offsets math + min/max reduceat —
    no explode, no per-way python."""
    from ..relational import broadcast_table
    nodes_ref = broadcast_table(nodes, ["id", "lon", "lat"])

    def fn(batch: pa.Table) -> pa.Table:
        nt = ray.get(nodes_ref)
        nid = nt["id"].to_numpy()
        order = np.argsort(nid, kind="stable")
        nid_s, nlon, nlat = (nid[order], nt["lon"].to_numpy()[order],
                             nt["lat"].to_numpy()[order])
        refs = batch["refs"].combine_chunks()
        offsets = np.asarray(refs.offsets, np.int64)
        flat = refs.flatten().to_numpy()
        jj = np.searchsorted(nid_s, flat).clip(max=max(len(nid_s) - 1, 0))
        found = (nid_s[jj] == flat) if len(nid_s) \
            else np.zeros(len(flat), bool)
        rc = np.add.reduceat(
            found, offsets[:-1].clip(max=max(len(flat) - 1, 0))) \
            if len(offsets) > 1 and len(flat) else np.zeros(
                max(len(offsets) - 1, 0), np.int64)
        rc[np.diff(offsets) == 0] = 0  # reduceat quirk on empty segments
        keep = rc > 0
        if not keep.any():
            z = pa.array([], pa.float64())
            return pa.table({"way_id": pa.array([], batch["id"].type),
                             "x0": z, "y0": z, "x1": z, "y1": z})
        lon_r, lat_r = nlon[jj[found]], nlat[jj[found]]
        starts = np.concatenate([[0], np.cumsum(rc[keep])[:-1]]) \
            .astype(np.int64)
        return pa.table({
            "way_id": batch["id"].combine_chunks().filter(pa.array(keep)),
            "x0": pa.array(np.minimum.reduceat(lon_r, starts)
                           if len(starts) else np.empty(0)),
            "y0": pa.array(np.minimum.reduceat(lat_r, starts)
                           if len(starts) else np.empty(0)),
            "x1": pa.array(np.maximum.reduceat(lon_r, starts)
                           if len(starts) else np.empty(0)),
            "y1": pa.array(np.maximum.reduceat(lat_r, starts)
                           if len(starts) else np.empty(0)),
        })
    return ways.map_batches(fn, batch_format="pyarrow")


def bbox_overlap_join(nodes: ray.data.Dataset, ways: ray.data.Dataset,
                      cell_deg: float = 0.02, num_parts: int = 32,
                      nd: int = 6) -> ray.data.Dataset:
    """Envelope (bbox) overlap SELF-JOIN over the way layer — the
    filter step of every polygon-polygon spatial join (the refinement
    PIP/clip runs only on these candidates).  Emits (a, b, ov6) for
    every unordered way pair whose envelopes intersect (touching
    counts), ov6 = rectangle intersection area rounded half-away.

    Scale plan — grid candidate cells with OWNER-CELL dedup (no
    distinct shuffle): each bbox replicates to the ``cell_deg`` grid
    cells it covers (tiny expansion while bbox << cell); cells
    hash-exchange ONCE; per partition, intra-cell pairs come from the
    shared LSH pair kernel (_bucket_pairs_vec) and a pair is emitted
    ONLY by the unique cell containing the overlap region's min corner
    (max(ax0,bx0), max(ay0,by0)) — every surviving pair is produced
    exactly once globally, so no second dedup exchange exists.
    ``cell_deg`` is the skew knob: it must be sized to data density
    (hot urban cells -> smaller cells), exactly like the PIP shard
    grid.  Oracle: brute-force O(n^2) range self-join in DuckDB."""
    from ..relational import hash_part
    from ..util import round_half_away
    from .text import _bucket_pairs_vec

    bb = way_bboxes(nodes, ways)

    def cover(t: pa.Table) -> pa.Table:
        x0 = t["x0"].combine_chunks().to_numpy()
        y0 = t["y0"].combine_chunks().to_numpy()
        x1 = t["x1"].combine_chunks().to_numpy()
        y1 = t["y1"].combine_chunks().to_numpy()
        cx0 = np.floor((x0 + 180.0) / cell_deg).astype(np.int64)
        cx1 = np.floor((x1 + 180.0) / cell_deg).astype(np.int64)
        cy0 = np.floor((y0 + 90.0) / cell_deg).astype(np.int64)
        cy1 = np.floor((y1 + 90.0) / cell_deg).astype(np.int64)
        nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
        rep = (nx * ny).astype(np.int64)
        row = np.repeat(np.arange(len(rep)), rep)
        # per-replica local cell offset (col-major within each bbox)
        k = np.arange(len(row)) - np.repeat(
            np.concatenate([[0], np.cumsum(rep)[:-1]]), rep)
        cx = cx0[row] + k % nx[row]
        cy = cy0[row] + k // nx[row]
        cell = cx * np.int64(1 << 32) + cy
        return pa.table({
            "cell": pa.array(cell),
            "way_id": t["way_id"].combine_chunks().take(pa.array(row)),
            "x0": pa.array(x0[row]), "y0": pa.array(y0[row]),
            "x1": pa.array(x1[row]), "y1": pa.array(y1[row]),
            "part": pa.array(hash_part(cell, num_parts)),
        })

    def pairs(t: pa.Table) -> pa.Table:
        cell = t["cell"].combine_chunks().to_numpy()
        wid = t["way_id"].combine_chunks().to_numpy()
        x0 = t["x0"].combine_chunks().to_numpy()
        y0 = t["y0"].combine_chunks().to_numpy()
        x1 = t["x1"].combine_chunks().to_numpy()
        y1 = t["y1"].combine_chunks().to_numpy()
        ii, jj = _bucket_pairs_vec(cell, np.arange(len(cell), dtype=np.int64))
        if not len(ii):
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "ov6": pa.array([], pa.float64())})
        ox = np.maximum(x0[ii], x0[jj])
        oy = np.maximum(y0[ii], y0[jj])
        ex = np.minimum(x1[ii], x1[jj])
        ey = np.minimum(y1[ii], y1[jj])
        own = ((np.floor((ox + 180.0) / cell_deg).astype(np.int64)
                * np.int64(1 << 32)
                + np.floor((oy + 90.0) / cell_deg).astype(np.int64))
               == cell[ii])
        m = (ox <= ex) & (oy <= ey) & own & (wid[ii] != wid[jj])
        ii, jj = ii[m], jj[m]
        a = np.minimum(wid[ii], wid[jj])
        b = np.maximum(wid[ii], wid[jj])
        ov = (ex[m] - ox[m]) * (ey[m] - oy[m])
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "ov6": pa.array(round_half_away(ov, nd))})

    return bb.map_batches(cover, batch_format="pyarrow") \
        .groupby("part").map_groups(pairs, batch_format="pyarrow")


# ---------------------------------------------------- per-cell convex hull

def _strict_hull(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Indices of the strict convex hull (collinear boundary points
    excluded), CCW from the lexicographically smallest point — Andrew's
    monotone chain.  The sequential chain loop runs only over the
    block-local points of one cell; hull-of-hulls merging keeps every
    later input tiny."""
    order = np.lexsort((y, x))
    # dedup exact duplicate points (keep first in sort order)
    xs, ys = x[order], y[order]
    uniq = np.concatenate([[True], (xs[1:] != xs[:-1]) | (ys[1:] != ys[:-1])])
    order = order[uniq]
    if len(order) <= 2:
        return order

    def chain(idx):
        h: list[int] = []
        for i in idx:
            while len(h) >= 2:
                ax, ay = x[h[-2]], y[h[-2]]
                bx, by = x[h[-1]], y[h[-1]]
                if (bx - ax) * (y[i] - ay) - (by - ay) * (x[i] - ax) <= 0:
                    h.pop()
                else:
                    break
            h.append(i)
        return h

    lower = chain(order)
    upper = chain(order[::-1])
    return np.array(lower[:-1] + upper[:-1], np.int64)


def _hull_area(x: np.ndarray, y: np.ndarray) -> float:
    """Exactly-rounded shoelace (math.fsum), so engine and oracle agree
    bit-for-bit regardless of summation order."""
    import math
    if len(x) < 3:
        return 0.0
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    return abs(math.fsum((x * y2 - x2 * y).tolist())) / 2.0


def cell_convex_hull(pts: ray.data.Dataset, res: int = 7,
                     lon_col: str = "lon", lat_col: str = "lat",
                     num_parts: int = 32) -> ray.data.Dataset:
    """(cell, n_pts, n_hull, area6): strict convex hull of the points
    in every occupied res-``res`` cell — the per-region footprint
    summary (coverage extent per city-scale cell) of a geotagged
    corpus.

    Scale plan — hull-of-hulls COMBINER: a hull vertex of the union is
    always a hull vertex of any subset containing it, so each block
    collapses every cell it sees to its local strict hull (plus one
    exact point count), the exchange ships only hull vertices (O(h)
    per cell per block, h ~ log points), and one partition-local chain
    over collected vertices finishes each cell exactly.  The python
    chain loop is bounded by block-local per-cell points; everything
    around it (cell keys, dedup, sort) is numpy.  Area is fsum
    shoelace — exactly rounded, so partial/merge order cannot move it."""
    from ..geo import tiles
    from ..relational import hash_part
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        lon = t[lon_col].combine_chunks().to_numpy()
        lat = t[lat_col].combine_chunks().to_numpy()
        cell = tiles.cell_id(lon, lat, res)
        order = np.argsort(cell, kind="stable")
        cs, lo, la = cell[order], lon[order], lat[order]
        starts = np.flatnonzero(np.concatenate([[True], cs[1:] != cs[:-1]]))
        ends = np.concatenate([starts[1:], [len(cs)]])
        out_c, out_x, out_y, out_n = [], [], [], []
        for s, e in zip(starts, ends):
            hx, hy = lo[s:e], la[s:e]
            hidx = _strict_hull(hx, hy)
            out_c.append(np.full(len(hidx), cs[s], np.int64))
            out_x.append(hx[hidx])
            out_y.append(hy[hidx])
            n = np.zeros(len(hidx), np.int64)
            n[0] = e - s
            out_n.append(n)
        if not out_c:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "x": pa.array([], pa.float64()),
                             "y": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int64())})
        c = np.concatenate(out_c)
        return pa.table({"cell": pa.array(c),
                         "x": pa.array(np.concatenate(out_x)),
                         "y": pa.array(np.concatenate(out_y)),
                         "n": pa.array(np.concatenate(out_n)),
                         "part": pa.array(hash_part(c, num_parts))})

    def finish(t: pa.Table) -> pa.Table:
        cell = t["cell"].combine_chunks().to_numpy()
        x = t["x"].combine_chunks().to_numpy()
        y = t["y"].combine_chunks().to_numpy()
        n = t["n"].combine_chunks().to_numpy()
        order = np.argsort(cell, kind="stable")
        cs, xs, ys, ns = cell[order], x[order], y[order], n[order]
        starts = np.flatnonzero(np.concatenate([[True], cs[1:] != cs[:-1]]))
        ends = np.concatenate([starts[1:], [len(cs)]])
        rows = {"cell": [], "n_pts": [], "n_hull": [], "area6": []}
        for s, e in zip(starts, ends):
            hidx = _strict_hull(xs[s:e], ys[s:e])
            rows["cell"].append(int(cs[s]))
            rows["n_pts"].append(int(ns[s:e].sum()))
            rows["n_hull"].append(len(hidx))
            rows["area6"].append(float(round_half_away(
                np.float64(_hull_area(xs[s:e][hidx], ys[s:e][hidx])), 6)))
        return pa.table({"cell": pa.array(rows["cell"], pa.int64()),
                         "n_pts": pa.array(rows["n_pts"], pa.int64()),
                         "n_hull": pa.array(rows["n_hull"], pa.int64()),
                         "area6": pa.array(rows["area6"], pa.float64())})

    return pts.map_batches(partial, batch_format="pyarrow") \
        .groupby("part").map_groups(finish, batch_format="pyarrow")


# -------------------------------------------------- grid DBSCAN clustering

def grid_dbscan(pts: ray.data.Dataset, res: int = 7, min_pts: int = 2,
                lon_col: str = "lon", lat_col: str = "lat",
                num_parts: int = 32,
                single_task_edge_limit: int = 2_000_000,
                broadcast_limit: int = 2_000_000) -> ray.data.Dataset:
    """(cell, cluster, n_pts): density-grid DBSCAN — occupied res-``res``
    cells holding >= ``min_pts`` points are core cells; 8-adjacent core
    cells merge into one cluster labelled by the component's smallest
    cell id (hotspot / place detection over a geotagged corpus).

    Scale plan: points collapse to exact per-cell counts through the
    combiner exchange (O(cells x blocks) partial rows, never O(points)),
    so everything after stage 1 runs on the CELL table, orders of
    magnitude smaller than the corpus.  Adjacency needs no spatial join:
    two cells are 8-adjacent iff they share a 2x2 window, so each core
    cell emits its four window keys, a hash-partitioned exchange groups
    windows (<= 4 members each), and a pair is emitted exactly once — in
    the unique window anchored at the pair's coordinate minimum (the
    owner-window rule of bbox_overlap_join).  Components reuse the
    text-dedup machinery: one guarded union-find task while the edge
    list is small, the static-shard pointer-jumping BSP past
    ``single_task_edge_limit``.  Labels broadcast while small and fall
    back to the hash-partitioned join past ``broadcast_limit``."""
    from ..geo import tiles
    from ..relational import (broadcast_table, hash_join, hash_part,
                              partial_groupby_agg)
    from .text import dedup_groups, min_label_components_static

    xy_mask = np.int64((1 << tiles.XY_BITS) - 1)

    def assign(t: pa.Table) -> pa.Table:
        lon = t[lon_col].combine_chunks().to_numpy()
        lat = t[lat_col].combine_chunks().to_numpy()
        return pa.table({"cell": pa.array(tiles.cell_id(lon, lat, res))})

    counts = partial_groupby_agg(pts.map_batches(assign, batch_format="pyarrow"),
                                 ["cell"], [("cell", "count")],
                                 num_parts=num_parts)
    core = counts.filter(expr=f"cell_count >= {int(min_pts)}").materialize()

    def windows(t: pa.Table) -> pa.Table:
        cell = t["cell"].combine_chunks().to_numpy()
        x = (cell >> np.int64(tiles.XY_BITS)) & xy_mask
        y = cell & xy_mask
        # four 2x2 windows contain (x, y): anchors (x-1..x, y-1..y);
        # +1 offset keeps the packed key nonnegative at the x=0/y=0 edge
        ax = np.repeat(x, 4) + np.tile(np.array([-1, -1, 0, 0]), len(x))
        ay = np.repeat(y, 4) + np.tile(np.array([-1, 0, -1, 0]), len(x))
        wkey = ((ax + 1) << np.int64(32)) | (ay + 1)
        return pa.table({"wkey": pa.array(wkey),
                         "cell": pa.array(np.repeat(cell, 4)),
                         "part": pa.array(hash_part(wkey, num_parts))})

    def pairs(t: pa.Table) -> pa.Table:
        wkey = t["wkey"].combine_chunks().to_numpy()
        cell = t["cell"].combine_chunks().to_numpy()
        order = np.lexsort((cell, wkey))
        wk, cl = wkey[order], cell[order]
        starts = np.flatnonzero(np.concatenate([[True], wk[1:] != wk[:-1]]))
        cnt = np.diff(np.concatenate([starts, [len(wk)]]))
        out_a, out_b = [], []
        # vectorize over pair SLOTS, not windows: a window holds <= 4
        # cells, so six (i, j) slot combinations cover every pair
        for i, j in ((0, 1), (0, 2), (1, 2), (0, 3), (1, 3), (2, 3)):
            sel = np.flatnonzero(cnt > j)
            if not len(sel):
                continue
            a = cl[starts[sel] + i]
            b = cl[starts[sel] + j]
            anchor_x = ((wk[starts[sel]] >> np.int64(32)) & np.int64((1 << 31) - 1)) - 1
            anchor_y = (wk[starts[sel]] & np.int64((1 << 31) - 1)) - 1
            ax_, ay_ = (a >> np.int64(tiles.XY_BITS)) & xy_mask, a & xy_mask
            bx_, by_ = (b >> np.int64(tiles.XY_BITS)) & xy_mask, b & xy_mask
            own = (np.minimum(ax_, bx_) == anchor_x) \
                & (np.minimum(ay_, by_) == anchor_y)
            out_a.append(np.minimum(a[own], b[own]))
            out_b.append(np.maximum(a[own], b[own]))
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    edge_ds = core.map_batches(windows, batch_format="pyarrow") \
        .groupby("part").map_groups(pairs, batch_format="pyarrow") \
        .materialize()
    if edge_ds.count() > single_task_edge_limit:
        groups = min_label_components_static(edge_ds)
    else:
        groups = dedup_groups(edge_ds)
    groups = groups.materialize()

    if groups.count() <= broadcast_limit:
        ref = broadcast_table(groups, ["doc_id", "group_id"])

        def label(t: pa.Table) -> pa.Table:
            g = ray.get(ref)
            keys = g["doc_id"].combine_chunks().to_numpy()
            vals = g["group_id"].combine_chunks().to_numpy()
            order = np.argsort(keys)
            keys, vals = keys[order], vals[order]
            cell = t["cell"].combine_chunks().to_numpy()
            if len(keys):
                pos = np.clip(np.searchsorted(keys, cell), 0, len(keys) - 1)
                hit = keys[pos] == cell
                cluster = np.where(hit, vals[pos], cell)
            else:
                cluster = cell
            return pa.table({"cell": pa.array(cell),
                             "cluster": pa.array(cluster),
                             "n_pts": t["cell_count"]})
        return core.map_batches(label, batch_format="pyarrow")

    joined = hash_join(core, groups, on="cell", right_on="doc_id",
                       how="left_outer", num_partitions=num_parts)

    def finish(t: pa.Table) -> pa.Table:
        cell = t["cell"].combine_chunks()
        cluster = pc.coalesce(t["group_id"].combine_chunks(), cell)
        return pa.table({"cell": cell, "cluster": cluster,
                         "n_pts": t["cell_count"]})
    return joined.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------- per-cell caption token stats

def cell_caption_stats(images: ray.data.Dataset, res: int = 7,
                       num_parts: int = 32) -> ray.data.Dataset:
    """(cell, n_tokens, top_token, top_n): caption-token statistics per
    occupied res-``res`` cell — the cross-modal (geo x text) aggregate a
    captioned-image corpus needs for regional vocabulary audits.
    ``top_token`` is the cell's most frequent caption token, ties broken
    lexicographically.

    Scale plan: each block collapses to (cell, token, n) partials with
    ONE Acero hash aggregation (bounded by the block's distinct
    (cell, token) pairs, never its rows), partials exchange by a bounded
    cell-hash partition, and one vectorized merge per partition
    (lexsort + reduceat, then a (cell, -n, token) sort picking the first
    row per cell) emits exact results.  Tokenization is Arrow
    (utf8_lower + split_pattern) — no Python over rows."""
    from ..geo import tiles
    from ..relational import hash_part
    from ..stages.assign import decode_geotag

    def partial(t: pa.Table) -> pa.Table:
        t = decode_geotag(t)
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        cell = tiles.cell_id(lon, lat, res)
        toks = pc.split_pattern(pc.utf8_lower(t["caption"].combine_chunks()),
                                " ")
        offsets = np.asarray(toks.offsets, np.int64)
        flat = toks.flatten()
        rep = np.repeat(cell, np.diff(offsets))
        pairs = pa.table({"cell": pa.array(rep), "w": flat})
        agg = pairs.group_by(["cell", "w"]).aggregate([("cell", "count")])
        cells = agg["cell"].combine_chunks().to_numpy()
        return pa.table({"cell": agg["cell"],
                         "w": agg["w"],
                         "n": agg["cell_count"],
                         "part": pa.array(hash_part(cells, num_parts))})

    def finish(t: pa.Table) -> pa.Table:
        cell = t["cell"].combine_chunks().to_numpy()
        w = t["w"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy()
        # merge partials: exact counts per (cell, token)
        order = np.lexsort((w, cell))
        cell, w, n = cell[order], w[order], n[order]
        new = np.r_[True, (cell[1:] != cell[:-1]) | (w[1:] != w[:-1])]
        starts = np.flatnonzero(new)
        mc, mw = cell[starts], w[starts]
        mn = np.add.reduceat(n, starts)
        # per-cell totals and the (count desc, token asc) winner
        order2 = np.lexsort((mw, -mn, mc))
        c2, w2, n2 = mc[order2], mw[order2], mn[order2]
        cstart = np.flatnonzero(np.r_[True, c2[1:] != c2[:-1]])
        totals = np.add.reduceat(n2, cstart)
        return pa.table({"cell": pa.array(c2[cstart], pa.int64()),
                         "n_tokens": pa.array(totals, pa.int64()),
                         "top_token": pa.array(w2[cstart].tolist(),
                                               pa.string()),
                         "top_n": pa.array(n2[cstart], pa.int64())})

    return images.map_batches(partial, batch_format="pyarrow") \
        .groupby("part").map_groups(finish, batch_format="pyarrow")


# ------------------------------------------------- kNN majority classify

KNN_CLASSIFY_K = 5


def labeled_nodes(nodes: ray.data.Dataset, key: str) -> ray.data.Dataset:
    """(id, lon, lat, label): nodes carrying ``key``, labelled by its
    first value — the training set for the kNN classifier."""
    from ..tags import has_any_key, value_of

    def fn(t: pa.Table) -> pa.Table:
        tg = t["tags"].combine_chunks()
        t = t.filter(pa.array(has_any_key(tg, [key])))
        lab = value_of(t["tags"].combine_chunks(), key)
        return pa.table({"id": t["id"], "lon": t["lon"], "lat": t["lat"],
                         "label": lab})
    return nodes.map_batches(fn, batch_format="pyarrow")


class KnnVoteClassify:
    """Actor-pool stage: label each point by majority vote of its k
    nearest labelled features (ties: count desc, then lexicographically
    smallest label).  The feature layer loads ONCE per actor from the
    broadcast ref; the neighbour set is exact — a STABLE argsort over
    id-sorted features reproduces SQL's (d2 asc, feature_id asc)
    row_number order including distance ties.  At web scale the feature
    layer is the broadcast small side by definition of the op; a
    cell-sharded variant would mirror knn_nearest_sharded."""

    def __init__(self, feats_ref: ray.ObjectRef, k: int = KNN_CLASSIFY_K):
        t: pa.Table = ray.get(feats_ref)
        fid = t["id"].combine_chunks().to_numpy()
        order = np.argsort(fid, kind="stable")
        self.fx = t["lon"].combine_chunks().to_numpy()[order]
        self.fy = t["lat"].combine_chunks().to_numpy()[order]
        labels = t["label"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        # classes sorted lexicographically -> argmax tie = smallest label
        self.classes, codes = np.unique(labels.astype(str), return_inverse=True)
        self.codes = codes.astype(np.int64)
        self.k = min(k, len(self.fx))
        # the same data-adaptive uniform grid as NearestFeature (~5
        # features per bucket): feature POSITIONS are id-ascending, so
        # position order IS the tie-break order
        m = len(self.fx)
        self.grid = None
        if m >= 512:
            x0, x1 = float(self.fx.min()), float(self.fx.max())
            y0, y1 = float(self.fy.min()), float(self.fy.max())
            g = int(np.clip(np.sqrt(m / 5.0), 4, 512))
            csx, csy = (x1 - x0) / g, (y1 - y0) / g
            if csx > 0 and csy > 0:
                gx = np.clip(((self.fx - x0) / csx).astype(np.int64),
                             0, g - 1)
                gy = np.clip(((self.fy - y0) / csy).astype(np.int64),
                             0, g - 1)
                key = gx * g + gy
                gidx = np.argsort(key, kind="stable")
                gkeys, gstart, gcount = np.unique(
                    key[gidx], return_index=True, return_counts=True)
                self.grid = {"g": g, "x0": x0, "y0": y0,
                             "csx": csx, "csy": csy, "gidx": gidx,
                             "gkeys": gkeys, "gstart": gstart,
                             "gcount": gcount}

    def _topk_brute(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Exact (d2 asc, id asc) top-k over the full layer, chunked;
        argpartition to a candidate pool then a stable re-sort (the full
        argsort was the 43 s hot spot at sf0.1)."""
        n = len(lon)
        out = np.empty((n, self.k), np.int64)
        m = min(max(8 * self.k, 64), len(self.fx))
        for s in range(0, n, 1024):
            e = min(s + 1024, n)
            d2 = (lon[s:e, None] - self.fx[None, :]) ** 2 \
                + (lat[s:e, None] - self.fy[None, :]) ** 2
            if m < len(self.fx):
                cand = np.sort(np.argpartition(d2, m - 1, axis=1)[:, :m],
                               axis=1)
                rows_m = np.arange(e - s)[:, None]
                pool_d2 = d2[rows_m, cand]
                sub = np.argsort(pool_d2, axis=1,
                                 kind="stable")[:, :self.k]
                out[s:e] = cand[rows_m, sub]
                # Tie-closure guard (round-5 hardening): argpartition is
                # unstable among EQUAL d2 at the pool boundary, so if a
                # row's k-th distance equals the pool maximum, a tied
                # smaller-id feature could sit OUTSIDE the pool and the
                # (d2 asc, id asc) contract would pick wrong. Such rows
                # (coincident-feature ties only — never seen on real
                # layers) fall back to the full stable argsort.
                kth = np.take_along_axis(pool_d2, sub[:, -1:], axis=1)
                risky = (kth >= pool_d2.max(axis=1, keepdims=True)).ravel()
                if risky.any():
                    rr = np.flatnonzero(risky)
                    out[s + rr] = np.argsort(d2[rr], axis=1,
                                             kind="stable")[:, :self.k]
            else:
                out[s:e] = np.argsort(d2, axis=1,
                                      kind="stable")[:, :self.k]
        return out

    def _topk_grid(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Exact grid-pruned k-nearest positions per point: the
        NearestFeature expanding-region search generalized to k — a
        point is DONE when its k-th best squared distance is strictly
        below the distance to the region boundary slabs (any unseen
        feature is then provably farther than all k)."""
        gr = self.grid
        g = gr["g"]
        kk = self.k
        n = len(px)
        out = np.full((n, kk), -1, np.int64)
        pix = np.clip(((px - gr["x0"]) / gr["csx"]).astype(np.int64),
                      0, g - 1)
        piy = np.clip(((py - gr["y0"]) / gr["csy"]).astype(np.int64),
                      0, g - 1)
        u = np.arange(n)
        reg = 1
        while len(u):
            x0 = np.maximum(pix[u] - reg, 0)
            x1 = np.minimum(pix[u] + reg, g - 1)
            y0 = np.maximum(piy[u] - reg, 0)
            y1 = np.minimum(piy[u] + reg, g - 1)
            ncy = y1 - y0 + 1
            ncell = (x1 - x0 + 1) * ncy
            pt_of_cell = np.repeat(np.arange(len(u)), ncell)
            r = _ragged_arange(ncell)
            keys = ((x0[pt_of_cell] + r // ncy[pt_of_cell]) * g
                    + (y0[pt_of_cell] + r % ncy[pt_of_cell]))
            pos = np.searchsorted(gr["gkeys"], keys) \
                .clip(max=max(len(gr["gkeys"]) - 1, 0))
            hit = gr["gkeys"][pos] == keys
            bstart = np.where(hit, gr["gstart"][pos], 0)
            blen = np.where(hit, gr["gcount"][pos], 0)
            cand = bstart.repeat(blen) + _ragged_arange(blen)
            f = gr["gidx"][cand]
            pt_of_cand = pt_of_cell.repeat(blen)
            dxx = px[u][pt_of_cand] - self.fx[f]
            dyy = py[u][pt_of_cand] - self.fy[f]
            d2 = dxx * dxx + dyy * dyy
            # per-point (d2 asc, id asc) ranking of the candidates
            order = np.lexsort((f, d2, pt_of_cand))
            pt_s, f_s, d2_s = pt_of_cand[order], f[order], d2[order]
            cnt = np.bincount(pt_of_cand, minlength=len(u))
            seg_start = np.concatenate(
                [np.zeros(1, np.int64), np.cumsum(cnt)[:-1]])
            kth_d2 = np.full(len(u), np.inf)
            enough = cnt >= kk
            kth_d2[enough] = d2_s[seg_start[enough] + kk - 1]
            # boundary bound: same 4 complement slabs as NearestFeature
            gx1b = gr["x0"] + g * gr["csx"]
            gy1b = gr["y0"] + g * gr["csy"]
            rl = gr["x0"] + x0 * gr["csx"]
            rr = gr["x0"] + (x1 + 1) * gr["csx"]
            rb = gr["y0"] + y0 * gr["csy"]
            rt = gr["y0"] + (y1 + 1) * gr["csy"]
            pux, puy = px[u], py[u]

            def slab_d2(sx0, sx1, sy0, sy1, absent):
                dx = np.maximum(np.maximum(sx0 - pux, pux - sx1), 0.0)
                dy = np.maximum(np.maximum(sy0 - puy, puy - sy1), 0.0)
                return np.where(absent, np.inf, dx * dx + dy * dy)

            out_d2 = np.minimum.reduce([
                slab_d2(gr["x0"], rl, gr["y0"], gy1b, x0 == 0),
                slab_d2(rr, gx1b, gr["y0"], gy1b, x1 == g - 1),
                slab_d2(rl, rr, gr["y0"], rb, y0 == 0),
                slab_d2(rl, rr, rt, gy1b, y1 == g - 1),
            ])
            done = enough & (kth_d2 < out_d2)
            if done.any():
                take = done[pt_s]  # first kk per done point, rank < kk
                rank = np.arange(len(pt_s), dtype=np.int64) \
                    - seg_start[pt_s]
                take &= rank < kk
                out[u[pt_s[take & (rank == 0)]], :] = \
                    f_s[take].reshape(-1, kk)
            u = u[~done]
            # Early tail escalation (round-5 sf1 rehearsal finding): once
            # the NEXT doubled region would span >= half the grid, its
            # ragged gather collects a large fraction of ALL m features
            # per unfinished point and lexsorts them — measured 5.3 s per
            # 4096-pt batch at sf1 vs 0.4 s for sending the ~10-20 % tail
            # (points in feature-sparse margins) straight to the exact
            # argpartition brute path, which is O(m) per point with no
            # sort. Identical output: both paths honor the (d2 asc,
            # id asc) contract.
            if len(u) and 4 * reg + 1 >= g // 2:
                out[u] = self._topk_brute(px[u], py[u])
                break
            reg *= 2
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].combine_chunks().to_numpy()
        lat = batch["lat"].combine_chunks().to_numpy()
        n = len(lon)
        if self.grid is not None:
            idx = np.empty((n, self.k), np.int64)
            for s in range(0, n, 1024):   # cache-resident gather slabs
                e = min(s + 1024, n)
                idx[s:e] = self._topk_grid(lon[s:e], lat[s:e])
        else:
            idx = self._topk_brute(lon, lat)
        votes = np.zeros((n, len(self.classes)), np.int64)
        rows = np.repeat(np.arange(n), self.k)
        np.add.at(votes, (rows, self.codes[idx].ravel()), 1)
        win = np.argmax(votes, axis=1)
        return pa.table({
            "image_id": batch["image_id"],
            "label": pa.array(self.classes[win].tolist(), pa.string()),
            "n_votes": pa.array(votes[np.arange(n), win], pa.int64())})


def knn_classify(images: ray.data.Dataset, feats_ref: ray.ObjectRef,
                 k: int = KNN_CLASSIFY_K,
                 concurrency: int | tuple[int, int] | None = None,
                 batch_size: int = 4096) -> ray.data.Dataset:
    """(image_id, label, n_votes): majority-vote kNN classification of
    geotagged images against a broadcast labelled feature layer.
    batch_size 4096 measured fastest at sf0.1 (2048: 10.9 s, 4096:
    9.4 s, 8192: 12.6 s — same cache sweet spot as the grid-kNN
    flagship)."""
    from ..util import default_pool
    pool = concurrency or default_pool()
    pts = images.repartition(_fanout(pool)) \
        .map_batches(decode_geotag, batch_format="pyarrow")
    return pts.map_batches(KnnVoteClassify, fn_constructor_args=(feats_ref, k),
                           batch_format="pyarrow", batch_size=batch_size,
                           concurrency=pool)


def cell_format_entropy(images: ray.data.Dataset, res: int = 7,
                        num_parts: int = 32,
                        nd: int = 6) -> ray.data.Dataset:
    """(cell, n, n_fmts, entropy6): Shannon entropy (nats) of the image
    FORMAT mix per occupied res-``res`` cell — the per-region diversity
    audit a multimodal corpus runs before rebalancing (a cell whose
    images are all one codec is a collection artifact).

    Same scale shape as cell_caption_stats: one Acero (cell, fmt)
    partial per block, a bounded cell-hash exchange, one vectorized
    merge per partition (lexsort + reduceat) — the shuffle moves
    O(distinct pairs x blocks) rows, never the corpus."""
    from ..geo import tiles
    from ..relational import hash_part
    from ..stages.assign import decode_geotag
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        t = decode_geotag(t)
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        cell = tiles.cell_id(lon, lat, res)
        pairs = pa.table({"cell": pa.array(cell), "fmt": t["fmt"]})
        agg = pairs.group_by(["cell", "fmt"]).aggregate([("cell", "count")])
        cells = agg["cell"].combine_chunks().to_numpy()
        return pa.table({"cell": agg["cell"], "fmt": agg["fmt"],
                         "n": agg["cell_count"],
                         "part": pa.array(hash_part(cells, num_parts))})

    def finish(t: pa.Table) -> pa.Table:
        cell = t["cell"].combine_chunks().to_numpy()
        fmt = t["fmt"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy()
        order = np.lexsort((fmt, cell))
        cell, fmt, n = cell[order], fmt[order], n[order]
        new = np.r_[True, (cell[1:] != cell[:-1]) | (fmt[1:] != fmt[:-1])]
        starts = np.flatnonzero(new)
        mc = cell[starts]
        mn = np.add.reduceat(n, starts).astype(np.float64)
        cstart = np.flatnonzero(np.r_[True, mc[1:] != mc[:-1]])
        tot = np.add.reduceat(mn, cstart)
        nf = np.diff(np.append(cstart, len(mc)))
        p = mn / np.repeat(tot, nf)
        # + 0.0 normalizes IEEE -0.0 (single-format cells) for the gate
        ent = -np.add.reduceat(p * np.log(p), cstart) + 0.0
        return pa.table({
            "cell": pa.array(mc[cstart], pa.int64()),
            "n": pa.array(tot.astype(np.int64)),
            "n_fmts": pa.array(nf.astype(np.int64)),
            "entropy6": pa.array(round_half_away(ent, nd), pa.float64()),
        })

    return images.map_batches(partial, batch_format="pyarrow") \
        .groupby("part").map_groups(finish, batch_format="pyarrow")


def grid_nn_interp(images: ray.data.Dataset, step: float = 2.0,
                   num_parts: int = 32) -> ray.data.Dataset:
    """(gx, gy, n_ring, nn_image_id, d2_9): nearest-neighbour gridding —
    for every OCCUPIED ``step``-degree planar cell, the closest point
    (squared planar distance to the cell center; image_id tie-break)
    among all points in the 3x3 neighbourhood, plus the candidate count.
    The raster-interpolation primitive (Voronoi rasterization) built so
    every comparison is on bit-identical doubles: argmin is
    order-independent (unlike an IDW float SUM, whose two-level partial
    summation would vary with block layout), so the result cannot drift
    with read parallelism and the DuckDB window mirror is exact.

    Scale shape: each point replicates to its <= 9 covering target
    cells (the stencil scatter), one bounded cell-hash exchange, one
    vectorized argmin merge per partition."""
    from ..relational import hash_part
    from ..stages.assign import decode_geotag

    off = np.int64(1 << 20)               # planar grid ids are tiny
    shift = np.int64(21)

    def contrib(t: pa.Table) -> pa.Table:
        t = decode_geotag(t)
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        iid = t["image_id"].combine_chunks()
        gx = np.floor(lon / step).astype(np.int64)
        gy = np.floor(lat / step).astype(np.int64)
        ks, d2s, owns = [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                tx, ty = gx + dx, gy + dy
                cx = (tx + 0.5) * step
                cy = (ty + 0.5) * step
                ddx = lon - cx
                ddy = lat - cy
                ks.append(((tx + off) << shift) | (ty + off))
                d2s.append(ddx * ddx + ddy * ddy)
                owns.append(np.full(len(lon), dx == 0 and dy == 0,
                                    np.int64))
        key = np.concatenate(ks)
        return pa.table({
            "key": pa.array(key),
            "d2": pa.array(np.concatenate(d2s)),
            "image_id": pa.chunked_array([iid] * 9).combine_chunks(),
            "own": pa.array(np.concatenate(owns)),
            "part": pa.array(hash_part(key, num_parts)),
        })

    def merge(t: pa.Table) -> pa.Table:
        from ..util import round_half_away
        key = t["key"].combine_chunks().to_numpy()
        d2 = t["d2"].combine_chunks().to_numpy()
        iid = t["image_id"].combine_chunks().to_numpy(zero_copy_only=False)
        own = t["own"].combine_chunks().to_numpy()
        order = np.lexsort((iid, d2, key))
        k, d, i = key[order], d2[order], iid[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        counts = np.diff(np.append(starts, len(k)))
        # occupancy: a cell is emitted only if one of its candidates is
        # its OWN point (own flag set on the dx=dy=0 replica)
        occ_n = np.zeros(len(starts), np.int64)
        np.add.at(occ_n, np.searchsorted(k[starts], key), own)
        m = occ_n > 0
        sel = starts[m]
        kk = k[sel]
        return pa.table({
            "gx": pa.array((kk >> shift) - off, pa.int64()),
            "gy": pa.array((kk & np.int64((1 << int(shift)) - 1)) - off,
                           pa.int64()),
            "n_ring": pa.array(counts[m]),
            "nn_image_id": pa.array(i[sel].tolist(), pa.string()),
            "d2_9": pa.array(round_half_away(d[sel], 9), pa.float64()),
        })

    return images.map_batches(contrib, batch_format="pyarrow") \
        .groupby("part").map_groups(merge, batch_format="pyarrow")


def morans_i(images: ray.data.Dataset, res: int = 7,
             nd: int = 6) -> ray.data.Dataset:
    """(n_cells, w_pairs, morans_i): global Moran's I spatial
    autocorrelation of the image density over occupied res-``res`` grid
    cells with rook (4-neighbour) binary weights — the standard "is the
    corpus geographically clustered or dispersed?" audit before
    cell-balanced sampling.

    Scale plan: each block collapses to one (cell, count) partial row
    (the res-7 grid is globally bounded at 2^14 cells, same argument as
    cell_histogram), partials merge in ONE guarded task where the
    neighbour sums are a vectorized sorted-key searchsorted against the
    four rook offsets — no pairwise join, no shuffle. The statistic
    I = N/W * sum_ij w_ij z_i z_j / sum_i z_i^2 uses ordered adjacent
    pairs (W counts both directions), matching the SQL mirror's
    4-way equality-join union."""
    from ..geo import tiles
    from ..relational import single_merge
    from ..stages.assign import decode_geotag
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        t = decode_geotag(t)
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        x, y = tiles.tile_xy(lon, lat, res)
        key = (x.astype(np.int64) << 32) | y.astype(np.int64)
        u, n = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(u),
                         "pn": pa.array(n.astype(np.int64))})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("key").aggregate([("pn", "sum")])
        key = g["key"].combine_chunks().to_numpy()
        n = g["pn_sum"].combine_chunks().to_numpy().astype(np.float64)
        order = np.argsort(key)
        key, n = key[order], n[order]
        x, y = key >> 32, key & np.int64(0xFFFFFFFF)
        m = n.mean()
        z = n - m
        nbr = np.zeros(len(n), np.float64)
        w = 0
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nk = ((x + dx) << 32) | (y + dy)
            idx = np.searchsorted(key, nk).clip(max=len(key) - 1)
            hit = key[idx] == nk
            nbr[hit] += z[idx[hit]]
            w += int(hit.sum())
        den = float((z * z).sum())
        num = float((z * nbr).sum())
        i_val = num * len(n) / w / den if w > 0 and den > 0.0 else 0.0
        return pa.table({
            "n_cells": pa.array([len(n)], pa.int64()),
            "w_pairs": pa.array([w], pa.int64()),
            "morans_i": pa.array([float(round_half_away(i_val, nd))]),
        })

    return single_merge(
        images.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536), merge)


def cell_representative(images: ray.data.Dataset, res: int = 7,
                        num_parts: int = 16) -> ray.data.Dataset:
    """(cell_r7, image_id, px, n_imgs): per occupied cell, the
    REPRESENTATIVE image — largest pixel count, image_id as the
    deterministic tiebreak — plus the cell population; the thumbnail /
    exemplar pick every map-browse tile layer and contact-sheet build
    runs (geo x image).

    Scale plan: the events_latest per-key-argmax shape — per-block
    argmax COMBINER (one candidate row + one count partial per cell per
    block), a bounded cell-hash exchange, the same kernel per
    partition. The shuffle moves candidates, never images."""
    from ..geo import tiles
    from ..relational import hash_part
    from ..stages.assign import decode_geotag

    def kernel(t: pa.Table, pn_col: str | None) -> pa.Table:
        cell = t["cell_r7"].combine_chunks().to_numpy()
        px = t["px"].combine_chunks().to_numpy()
        iid = t["image_id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((iid, -px, cell))
        cs = cell[order]
        first = np.r_[True, cs[1:] != cs[:-1]] if len(cs) \
            else np.empty(0, bool)
        sel = order[first]
        pn = t[pn_col].combine_chunks().to_numpy() if pn_col \
            else np.ones(len(cell), np.int64)
        u, inv = np.unique(cell, return_inverse=True)
        n = np.zeros(len(u), np.int64)
        np.add.at(n, inv, pn)
        return pa.table({
            "cell_r7": pa.array(u),
            "image_id": t["image_id"].take(pa.array(sel)),
            "px": pa.array(px[sel]),
            "pn": pa.array(n),
            "part": pa.array(hash_part(u, num_parts)),
        })

    def partial(t: pa.Table) -> pa.Table:
        t = decode_geotag(t)
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        px = (t["w"].combine_chunks().to_numpy().astype(np.int64)
              * t["h"].combine_chunks().to_numpy().astype(np.int64))
        base = pa.table({
            "cell_r7": pa.array(tiles.cell_id(lon, lat, res)),
            "image_id": t["image_id"].combine_chunks(),
            "px": pa.array(px),
        })
        return kernel(base, None)

    def finish(t: pa.Table) -> pa.Table:
        out = kernel(t, "pn")
        return pa.table({
            "cell_r7": out["cell_r7"],
            "image_id": out["image_id"],
            "px": out["px"],
            "n_imgs": out["pn"],
        })

    return images.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536) \
        .groupby("part") \
        .map_groups(lambda t: finish(t.drop_columns(["part"])),
                    batch_format="pyarrow")


def hotspot_gi(images: ray.data.Dataset, res: int = 7,
               nd: int = 6) -> ray.data.Dataset:
    """(cell, n, k_nbrs, gi): Getis-Ord Gi* hotspot statistic of the
    image density per occupied res-``res`` cell — binary rook weights
    PLUS self (the * variant), lattice = occupied cells. The per-cell
    sibling of morans_i: which exact cells are significantly hot/cold.

    Scale plan: identical to morans_i — bounded (cell, count) partials,
    ONE guarded merge with vectorized searchsorted neighbour sums;
    Gi* = (sum_j x_j - xbar k_i) / (S sqrt((n k_i - k_i^2)/(n-1)))
    evaluated in that exact term order on both sides."""
    from ..geo import tiles
    from ..relational import single_merge
    from ..stages.assign import decode_geotag
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        t = decode_geotag(t)
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        x, y = tiles.tile_xy(lon, lat, res)
        key = (x.astype(np.int64) << 32) | y.astype(np.int64)
        u, n = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(u),
                         "pn": pa.array(n.astype(np.int64))})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("key").aggregate([("pn", "sum")])
        key = g["key"].combine_chunks().to_numpy()
        cnt = g["pn_sum"].combine_chunks().to_numpy().astype(np.float64)
        order = np.argsort(key)
        key, cnt = key[order], cnt[order]
        x, y = key >> 32, key & np.int64(0xFFFFFFFF)
        n = len(cnt)
        xbar = cnt.mean()
        s = np.sqrt((cnt * cnt).sum() / n - xbar * xbar)
        nbr_sum = cnt.copy()          # self weight
        k = np.ones(n, np.int64)      # self counts as a neighbour
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nk = ((x + dx) << 32) | (y + dy)
            idx = np.searchsorted(key, nk).clip(max=n - 1)
            hit = key[idx] == nk
            nbr_sum[hit] += cnt[idx[hit]]
            k[hit] += 1
        kf = k.astype(np.float64)
        denom = s * np.sqrt((n * kf - kf * kf) / (n - 1)) if n > 1 \
            else np.ones(n)
        gi = np.where(denom > 0, (nbr_sum - xbar * kf) / np.where(
            denom > 0, denom, 1.0), 0.0)
        return pa.table({
            "cell": pa.array(key),
            "n": pa.array(cnt.astype(np.int64)),
            "k_nbrs": pa.array(k),
            "gi": pa.array(np.asarray(round_half_away(gi, nd))),
        })

    return single_merge(
        images.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536), merge)


def cell_compact(images: ray.data.Dataset, res: int = 9,
                 min_res: int = 7) -> ray.data.Dataset:
    """(cell, cell_res, n_leaves): the COMPACTED covering of the
    occupied res-``res`` cells — a parent replaces its 4 children iff
    all 4 are covered, applied recursively up to ``min_res`` (the H3
    compact() analog on the quadtree grid). The minimal multi-res
    covering every tile-serving / geofence layer stores instead of the
    leaf set. ``n_leaves`` = res-``res`` cells each output cell covers.

    Scale plan: the occupied leaf set at res 9 is globally bounded
    (2^18 cells), so — like cell_histogram — per-block distinct-cell
    partials merge in ONE guarded task where compaction is a vectorized
    parent-count pass per level (unique + count==4). At finer leaf
    resolutions the same pass runs as a parent-hash exchange per level
    (parent locality is a prefix of the child key, so the exchange is
    prefix-local)."""
    from ..geo import tiles
    from ..relational import single_merge
    from ..stages.assign import decode_geotag

    def partial(t: pa.Table) -> pa.Table:
        t = decode_geotag(t)
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        return pa.table({"cell": pa.array(np.unique(
            tiles.cell_id(lon, lat, res)))})

    def merge(t: pa.Table) -> pa.Table:
        cur = np.unique(t["cell"].combine_chunks().to_numpy())
        out_cells: list[np.ndarray] = []
        out_res: list[np.ndarray] = []
        out_leaves: list[np.ndarray] = []
        r = res
        while r > min_res:
            parent = tiles.cell_parent(cur, r - 1)
            pu, inv, cnt = np.unique(parent, return_inverse=True,
                                     return_counts=True)
            full = cnt == 4
            kept = cur[~full[inv]]
            leaves = np.full(len(kept), 4 ** (res - r), np.int64)
            out_cells.append(kept)
            out_res.append(np.full(len(kept), r, np.int64))
            out_leaves.append(leaves)
            cur = pu[full]
            r -= 1
        out_cells.append(cur)
        out_res.append(np.full(len(cur), r, np.int64))
        out_leaves.append(np.full(len(cur), 4 ** (res - r), np.int64))
        cell = np.concatenate(out_cells)
        order = np.argsort(cell)
        return pa.table({
            "cell": pa.array(cell[order]),
            "cell_res": pa.array(np.concatenate(out_res)[order]),
            "n_leaves": pa.array(np.concatenate(out_leaves)[order]),
        })

    return single_merge(
        images.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536), merge)


def polygon_hierarchy(nodes: ray.data.Dataset, ways: ray.data.Dataset,
                      index_ref: ray.ObjectRef,
                      num_parts: int = 16) -> ray.data.Dataset:
    """(way_id, parent_id): polygon CONTAINMENT pairs — each closed
    way's vertex-mean probe point ray-cast against every OTHER polygon
    (the admin-area / nesting hierarchy build). The probe is the mean
    of ALL ring vertices (closing duplicate included) summed in
    position order, so engine and SQL compute the identical float64
    point before the shared ray-cast.

    Scale plan: probes build via ONE way-hash exchange (sequential
    reduceat mean per way); containment is the broadcast PolygonIndex
    the PIP family already uses — per batch, one vectorized query; the
    self pair filters out post-query."""
    from ..relational import hash_part
    from .osm import join_refs_to_coords

    pts = join_refs_to_coords(closed_ways(ways), nodes)

    def pre(t: pa.Table) -> pa.Table:
        w = t["way_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(w, num_parts)))

    def cent(t: pa.Table) -> pa.Table:
        w = t["way_id"].combine_chunks().to_numpy()
        pos = t["pos"].combine_chunks().to_numpy()
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        order = np.lexsort((pos, w))
        w, lon, lat = w[order], lon[order], lat[order]
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]]) \
            if len(w) else np.empty(0, np.int64)
        cnt = np.diff(np.r_[starts, len(w)]).astype(np.float64)
        return pa.table({
            "way_id": pa.array(w[starts]),
            "cx": pa.array(np.add.reduceat(lon, starts) / cnt
                           if len(starts) else np.empty(0)),
            "cy": pa.array(np.add.reduceat(lat, starts) / cnt
                           if len(starts) else np.empty(0)),
        })

    probes = pts.map_batches(pre, batch_format="pyarrow") \
        .groupby("part") \
        .map_groups(lambda t: cent(t.drop_columns(["part"])),
                    batch_format="pyarrow")

    def tag(t: pa.Table) -> pa.Table:
        idx = ray.get(index_ref)
        wid = t["way_id"].combine_chunks().to_numpy()
        pi, fid = idx.query(t["cx"].combine_chunks().to_numpy(),
                            t["cy"].combine_chunks().to_numpy())
        pi = np.asarray(pi, np.int64)
        fid = np.asarray(fid, np.int64)
        keep = fid != wid[pi]
        return pa.table({"way_id": pa.array(wid[pi[keep]]),
                         "parent_id": pa.array(fid[keep])})

    return probes.map_batches(tag, batch_format="pyarrow")


def segment_crossings(nodes: ray.data.Dataset, ways: ray.data.Dataset,
                      res: int = 16, num_parts: int = 16) -> ray.data.Dataset:
    """(n_segments, n_crossings): count of PROPER crossings between
    segments of DIFFERENT ways — the planar-conflict audit (bridges /
    digitization errors) complementing way_self_intersect.

    Scale plan: segments build via the way-hash exchange, replicate to
    their covering res-``res`` cells (segments are tiny — almost always
    one cell), ONE cell-hash exchange groups candidates, and the
    per-cell kernel enumerates cross-way pairs (clique trick) and tests
    the shared ccw predicate. ``res`` must track segment extent: cells
    much larger than a dense cluster make the per-cell clique quadratic
    (sf0.1 sweep: res 14 = 79 s, 15 = 17 s, 16 = 4.3 s, 17 = 4.9 s —
    the sweet spot is a cell just UNDER the p99 segment extent, where
    per-cell cliques shrink faster than replication grows). Exactly-once counting WITHOUT a dedup
    exchange: a crossing pair is counted only in the cell that contains
    its intersection POINT (which lies on both segments, hence inside
    both covering sets — the bbox_overlap_join owner-cell trick applied
    to the crossing point)."""
    from ..geo import tiles
    from ..relational import hash_part, single_merge
    from .osm import join_refs_to_coords

    pts = join_refs_to_coords(ways, nodes)

    def pre(t: pa.Table) -> pa.Table:
        w = t["way_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(w, num_parts)))

    def seg_rows(t: pa.Table) -> pa.Table:
        w = t["way_id"].combine_chunks().to_numpy()
        pos = t["pos"].combine_chunks().to_numpy()
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        order = np.lexsort((pos, w))
        w, lon, lat = w[order], lon[order], lat[order]
        same = w[:-1] == w[1:] if len(w) > 1 else np.empty(0, bool)
        sw = w[:-1][same]
        seq = np.flatnonzero(same).astype(np.int64)
        ax, ay = lon[:-1][same], lat[:-1][same]
        bx, by = lon[1:][same], lat[1:][same]
        x0, y0t = tiles.tile_xy(np.minimum(ax, bx), np.maximum(ay, by), res)
        x1, y1t = tiles.tile_xy(np.maximum(ax, bx), np.minimum(ay, by), res)
        ncy = y1t - y0t + 1
        ncell = (x1 - x0 + 1) * ncy
        seg_of = np.repeat(np.arange(len(sw)), ncell)
        starts = np.concatenate([np.zeros(1, np.int64),
                                 np.cumsum(ncell)[:-1]])
        r = np.arange(int(ncell.sum()), dtype=np.int64) \
            - np.repeat(starts, ncell)
        cx = x0[seg_of] + r // ncy[seg_of]
        cy = y0t[seg_of] + r % ncy[seg_of]
        cell = (np.int64(res) << np.int64(58)) | (cx << np.int64(29)) | cy
        return pa.table({
            "cell": pa.array(cell), "w": pa.array(sw[seg_of]),
            "seq": pa.array(seq[seg_of]),
            "ax": pa.array(ax[seg_of]), "ay": pa.array(ay[seg_of]),
            "bx": pa.array(bx[seg_of]), "by": pa.array(by[seg_of]),
            "part": pa.array(hash_part(cell, num_parts)),
        })

    def cross_kernel(t: pa.Table) -> pa.Table:
        cell = t["cell"].combine_chunks().to_numpy()
        w = t["w"].combine_chunks().to_numpy()
        seq = t["seq"].combine_chunks().to_numpy()
        ax = t["ax"].combine_chunks().to_numpy()
        ay = t["ay"].combine_chunks().to_numpy()
        bx = t["bx"].combine_chunks().to_numpy()
        by = t["by"].combine_chunks().to_numpy()
        order = np.lexsort((seq, w, cell))
        cell, w, ax, ay, bx, by = (cell[order], w[order], ax[order],
                                   ay[order], bx[order], by[order])
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]]) \
            if len(cell) else np.empty(0, np.int64)
        counts = np.diff(np.r_[starts, len(cell)]) if len(cell) \
            else np.empty(0, np.int64)
        posi = np.arange(len(cell), dtype=np.int64)
        rep = np.repeat(counts, counts) - (posi - np.repeat(starts, counts)) - 1
        i1 = np.repeat(posi, rep)
        base = np.repeat(np.cumsum(rep) - rep, rep)
        i2 = i1 + 1 + (np.arange(rep.sum(), dtype=np.int64) - base)
        diff = w[i1] != w[i2]
        i1, i2 = i1[diff], i2[diff]
        d1 = (bx[i1] - ax[i1]) * (ay[i2] - ay[i1]) \
            - (by[i1] - ay[i1]) * (ax[i2] - ax[i1])
        d2 = (bx[i1] - ax[i1]) * (by[i2] - ay[i1]) \
            - (by[i1] - ay[i1]) * (bx[i2] - ax[i1])
        d3 = (bx[i2] - ax[i2]) * (ay[i1] - ay[i2]) \
            - (by[i2] - ay[i2]) * (ax[i1] - ax[i2])
        d4 = (bx[i2] - ax[i2]) * (by[i1] - ay[i2]) \
            - (by[i2] - ay[i2]) * (bx[i1] - ax[i2])
        cross = (d1 * d2 < 0) & (d3 * d4 < 0)
        i1, i2 = i1[cross], i2[cross]
        if len(i1):
            # d1/d2 are seg2's endpoints vs seg1's line, so the crossing
            # parameter ALONG seg2 is d1/(d1-d2): P = A2 + t * (B2 - A2)
            tpar = d1[cross] / (d1[cross] - d2[cross])
            px = ax[i2] + tpar * (bx[i2] - ax[i2])
            py = ay[i2] + tpar * (by[i2] - ay[i2])
            ox, oy = tiles.tile_xy(px, py, res)
            owner = (np.int64(res) << np.int64(58)) \
                | (ox << np.int64(29)) | oy
            n = int((owner == cell[i1]).sum())
        else:
            n = 0
        return pa.table({"metric": pa.array(["n_crossings"]),
                         "value": pa.array([n], pa.int64())})

    def nseg_partial(t: pa.Table) -> pa.Table:
        refs = t["refs"].combine_chunks()
        ln = np.diff(np.asarray(refs.offsets, np.int64))
        return pa.table({
            "metric": pa.array(["n_segments"]),
            "value": pa.array([int(np.maximum(ln - 1, 0).sum())],
                              pa.int64()),
        })

    partials = pts.map_batches(pre, batch_format="pyarrow") \
        .groupby("part") \
        .map_groups(lambda t: seg_rows(t.drop_columns(["part"])),
                    batch_format="pyarrow") \
        .groupby("part") \
        .map_groups(lambda t: cross_kernel(t.drop_columns(["part"])),
                    batch_format="pyarrow") \
        .union(ways.select_columns(["refs"])
               .map_batches(nseg_partial, batch_format="pyarrow"))

    def merge(t: pa.Table) -> pa.Table:
        m = t["metric"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["value"].combine_chunks().to_numpy()
        return pa.table({
            "n_segments": pa.array([int(v[m == "n_segments"].sum())],
                                   pa.int64()),
            "n_crossings": pa.array([int(v[m == "n_crossings"].sum())],
                                    pa.int64()),
        })

    return single_merge(partials, merge)


def cell_storage(images: ray.data.Dataset, res: int = 7,
                 nd: int = 6, num_parts: int = 16) -> ray.data.Dataset:
    """(cell_r7, n_imgs, bytes_total, bytes_mean): per-cell encoded
    storage footprint — the shard/capacity-planning census a tile-store
    runs before laying out a region-partitioned corpus. Exact integer
    byte sums (arrow binary_length), one bounded cell exchange."""
    from ..geo import tiles
    from ..relational import hash_part, single_merge
    from ..stages.assign import decode_geotag
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        t2 = decode_geotag(t)
        lon = t2["lon"].combine_chunks().to_numpy()
        lat = t2["lat"].combine_chunks().to_numpy()
        nb = pc.binary_length(t["bytes"].combine_chunks()) \
            .cast(pa.int64())
        g = pa.table({
            "cell_r7": pa.array(tiles.cell_id(lon, lat, res)),
            "nb": nb,
        }).group_by("cell_r7").aggregate([("nb", "sum"), ("nb", "count")])
        return g.rename_columns(["cell_r7", "pb", "pn"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("cell_r7").aggregate([("pb", "sum"), ("pn", "sum")])
        g = g.rename_columns(["cell_r7", "bytes_total", "n_imgs"])
        mean = round_half_away(
            g["bytes_total"].combine_chunks().to_numpy().astype(np.float64)
            / g["n_imgs"].combine_chunks().to_numpy(), nd)
        return pa.table({
            "cell_r7": g["cell_r7"],
            "n_imgs": pc.cast(g["n_imgs"], pa.int64()),
            "bytes_total": pc.cast(g["bytes_total"], pa.int64()),
            "bytes_mean": pa.array(np.asarray(mean)),
        })

    return single_merge(
        images.map_batches(partial, batch_format="pyarrow",
                           batch_size=4096), merge)


def cell_gini(images: ray.data.Dataset, res: int = 7,
              nd: int = 6) -> ray.data.Dataset:
    """(n_cells, n_points, gini): Gini coefficient of the image count
    distribution over occupied cells — the spatial-inequality summary
    (0 = uniform coverage, ->1 = everything in a few hot cells) that
    motivates the salted-shuffle path.

    Scale shape: cell_histogram partials + ONE bounded merge where
    G = (2 * sum(i * x_i asc-sorted) / (n * sum x)) - (n + 1) / n is a
    vectorized sort over the bounded cell space."""
    from ..geo import tiles
    from ..relational import single_merge
    from ..stages.assign import decode_geotag
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        t = decode_geotag(t)
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        c = tiles.cell_id(lon, lat, res)
        u, n = np.unique(c, return_counts=True)
        return pa.table({"cell": pa.array(u),
                         "pn": pa.array(n.astype(np.int64))})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("cell").aggregate([("pn", "sum")])
        x = np.sort(g["pn_sum"].combine_chunks().to_numpy()
                    .astype(np.float64))
        n = len(x)
        tot = x.sum()
        i = np.arange(1, n + 1, dtype=np.float64)
        gini = (2.0 * (i * x).sum() / (n * tot)) - (n + 1.0) / n \
            if n and tot > 0 else 0.0
        return pa.table({
            "n_cells": pa.array([n], pa.int64()),
            "n_points": pa.array([int(tot)], pa.int64()),
            "gini": pa.array([float(round_half_away(gini, nd))]),
        })

    return single_merge(
        images.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536), merge)


def cell_morisita(images: ray.data.Dataset, res: int = 7,
                  nd: int = 6) -> ray.data.Dataset:
    """(n_cells, n_points, morisita6): Morisita dispersion index of the
    image points over OCCUPIED res-``res`` cells — I = Q * sum(x(x-1))
    / (N(N-1)); 1 = Poisson-random, >1 = clustered (the hot-box recipe
    makes it strongly clustered), <1 = over-dispersed. Q counts
    occupied quadrats (the globe's empty-cell universe is unbounded, a
    documented departure from fixed-frame Morisita).

    Scale shape: cell_histogram partials + ONE bounded merge (rows =
    occupied cells). Exactness: every aggregate is an exact int64
    (x(x-1) summed per cell, order-free); the single float division
    float(Q*sxx)/float(N*(N-1)) mirrors the SQL's
    CAST(q*sxx AS DOUBLE)/CAST(nn*(nn-1) AS DOUBLE) bit-for-bit."""
    from ..geo import tiles
    from ..relational import single_merge
    from ..stages.assign import decode_geotag
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        t = decode_geotag(t)
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        c = tiles.cell_id(lon, lat, res)
        u, n = np.unique(c, return_counts=True)
        return pa.table({"cell": pa.array(u),
                         "pn": pa.array(n.astype(np.int64))})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("cell").aggregate([("pn", "sum")])
        x = g["pn_sum"].combine_chunks().to_numpy().astype(np.int64)
        q = int(len(x))
        nn = int(x.sum())
        sxx = int((x * (x - 1)).sum())
        mor = float(q * sxx) / float(nn * (nn - 1)) \
            if nn > 1 and q else 0.0
        return pa.table({
            "n_cells": pa.array([q], pa.int64()),
            "n_points": pa.array([nn], pa.int64()),
            "morisita6": pa.array(
                [float(round_half_away(np.float64(mor), nd))]),
        })

    return single_merge(
        images.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536), merge)


def cell_diameter(pts: ray.data.Dataset, res: int = 7,
                  num_parts: int = 32,
                  batch_size: int = 65536) -> ray.data.Dataset:
    """(cell_r{res}, n, diam_m3): exact diameter — max pairwise
    haversine distance in meters (sphere EARTH_R_M, the osm.way_length
    kernel term-for-term) — of the points in every occupied res-``res``
    cell, plus the point count.  The per-region dispersion summary a
    spatial partitioner uses to size shards (reference analogue: the
    per-tile extent summaries around osm/Summary.go's bbox math).

    Scale plan: assign fuses into the decode read; ONE hash(cell)
    exchange ships (cell, lon, lat) — O(points), the same volume as
    the histogram family; each partition then lexsorts its cells and
    runs the within-cell max in two regimes.  SMALL cells (n <= 128)
    go through the vectorized clique kernel with the DIRECT haversine
    (bounded: <= 64 pairs per point).  BIG cells (the hot urban ones —
    sf0.1 has a 12.6k-point cell owning 79M of the 212M total pairs)
    use a TILED two-pass scan that never materializes pair-index
    arrays: pass 1 finds the max of an algebraically expanded
    haversine argument (per-point sin/cos precomputed, so each pair
    costs ~7 multiply-adds and no transcendentals); pass 2 re-scans
    only the tiles whose expanded max is within 1e-9 of the global
    expanded max and evaluates the DIRECT kernel on just those
    candidate pairs.  |expanded - direct| is O(1e-15) absolutely, so
    the true direct-max pair always survives the 1e-9 margin and the
    reported max equals the oracle's full direct scan bit-for-bit.
    Haversine is float-symmetric in its operands (squares and products
    only), so pair orientation cannot move the max; rounding is
    applied once, after the max."""
    from ..geo import tiles
    from ..relational import hash_part
    from ..util import round_half_away
    from .osm import EARTH_R_M

    cell_col = f"cell_r{res}"
    d2r = np.pi / 180.0

    def partial(t: pa.Table) -> pa.Table:
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        c = tiles.cell_id(lon, lat, res)
        return pa.table({"cell": pa.array(c), "lon": pa.array(lon),
                         "lat": pa.array(lat),
                         "part": pa.array(hash_part(c, num_parts))})

    SMALL = 128
    TI, TJ = 1024, 8192

    def _direct_a(lon1, lat1, lon2, lat2):
        p1 = lat1 * d2r
        p2 = lat2 * d2r
        sdp = np.sin((p2 - p1) / 2.0)
        sdl = np.sin((lon2 - lon1) * d2r / 2.0)
        return np.minimum(sdp * sdp + np.cos(p1) * np.cos(p2) * sdl * sdl,
                          1.0)

    def _big_cell_amax(lon, lat):
        """Exact max DIRECT haversine argument over all pairs.  Pruning
        pass: the expanded argument is (1 - G)/2 with G the dot product
        of the points' 3-D unit vectors (spherical law of cosines), so
        max-a ranking == min-G ranking and each tile is ONE BLAS matmul
        (U @ U.T) instead of four outer products.  Pairs within 1e-9 of
        the global G-min (|float(G) - real| is O(1e-15), so the true
        direct-max pair always qualifies) are then re-evaluated with
        the DIRECT kernel and the max of those is the exact answer."""
        sp, cp = np.sin(lat * d2r), np.cos(lat * d2r)
        sl, cl = np.sin(lon * d2r), np.cos(lon * d2r)
        u = np.stack([cp * cl, cp * sl, sp], axis=1)
        n = len(lon)
        tiles_ = [(i0, j0) for i0 in range(0, n, TI)
                  for j0 in range(i0, n, TJ)]
        tmin = np.empty(len(tiles_), np.float64)
        for ti, (i0, j0) in enumerate(tiles_):
            i1, j1 = min(i0 + TI, n), min(j0 + TJ, n)
            g = u[i0:i1] @ u[j0:j1].T
            tmin[ti] = g.min() if g.size else np.inf
        gmin = float(tmin.min())
        best = -np.inf
        for ti, (i0, j0) in enumerate(tiles_):
            if tmin[ti] > gmin + 1e-9:
                continue
            i1, j1 = min(i0 + TI, n), min(j0 + TJ, n)
            g = u[i0:i1] @ u[j0:j1].T
            gi, gj = np.nonzero(g <= gmin + 1e-9)
            gi, gj = gi + i0, gj + j0
            keep = gi != gj  # self-pairs can't win (g ~ 1) but be safe
            if keep.any():
                cand = _direct_a(lon[gi[keep]], lat[gi[keep]],
                                 lon[gj[keep]], lat[gj[keep]])
                best = max(best, float(cand.max()))
        return best if best > -np.inf else 0.0

    def finish(t: pa.Table) -> pa.Table:
        c = t["cell"].combine_chunks().to_numpy()
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        order = np.argsort(c, kind="stable")
        c, lon, lat = c[order], lon[order], lat[order]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]]) \
            if len(c) else np.empty(0, np.int64)
        counts = np.diff(np.r_[starts, len(c)]) if len(c) \
            else np.empty(0, np.int64)
        diam = np.zeros(len(counts), np.float64)

        small = counts <= SMALL
        if small.any():
            # vectorized clique kernel over ALL small cells at once
            sel = np.repeat(small, counts)
            lo_s, la_s = lon[sel], lat[sel]
            cnt_s = counts[small]
            st_s = np.append(0, np.cumsum(cnt_s))[:-1]
            pos = np.arange(len(lo_s), dtype=np.int64)
            rep = np.repeat(cnt_s, cnt_s) - (pos - np.repeat(st_s, cnt_s)) - 1
            i = np.repeat(pos, rep)
            base = np.repeat(np.cumsum(rep) - rep, rep)
            j = i + 1 + (np.arange(int(rep.sum()), dtype=np.int64) - base)
            a = _direct_a(lo_s[i], la_s[i], lo_s[j], la_s[j])
            d = 2.0 * EARTH_R_M * np.arcsin(np.sqrt(a))
            ppc = (cnt_s * (cnt_s - 1)) // 2
            dm = np.zeros(len(cnt_s), np.float64)
            has = ppc > 0
            if has.any():
                pstarts = (np.cumsum(ppc) - ppc)[has]
                dm[has] = np.maximum.reduceat(d, pstarts)
            diam[small] = dm
        for k in np.flatnonzero(~small):
            s, e = starts[k], starts[k] + counts[k]
            amax = _big_cell_amax(lon[s:e], lat[s:e])
            diam[k] = 2.0 * EARTH_R_M * float(np.arcsin(np.sqrt(amax)))
        return pa.table({
            cell_col: pa.array(c[starts]),
            "n": pa.array(counts, pa.int64()),
            "diam_m3": pa.array(round_half_away(diam, 3)),
        })

    return pts.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size) \
        .groupby("part").map_groups(finish, batch_format="pyarrow")


# ---------------------------------------------------------------- snap


def build_segment_cells(nodes: ray.data.Dataset, ways: ray.data.Dataset,
                        res: int = 16) -> ray.ObjectRef:
    """Cell-bucketed way-SEGMENT layer for map-matching: every resolved
    consecutive node pair (way_id, seq, ax, ay, bx, by), registered in
    EVERY res-``res`` slippy cell its bbox touches.  Segments are
    globally sorted by (way_id, seq), so ascending segment INDEX order
    is (way_id, seq) order and a first-of-group scan realizes the
    lexicographic tie rule.  The layer is flat numpy arrays — sorted
    bucket keys + offsets + flattened per-bucket index lists — so the
    probe path is pure searchsorted, no dict.  One broadcast object
    (the network is city-extract-scale, ~15 MB at sf0.1); at planet
    scale each cell-prefix shard becomes its own object-store entry
    fetched by co-partitioned tasks, exactly like the PIP / kNN shard
    layers."""
    from ..geo import tiles
    from ..relational import broadcast_table
    nt_t = ray.get(broadcast_table(nodes, ["id", "lon", "lat"]))
    wt_t = ray.get(broadcast_table(ways, ["id", "refs"]))
    nid = nt_t["id"].combine_chunks().to_numpy()
    order = np.argsort(nid, kind="stable")
    nid_s = nid[order]
    nlon = nt_t["lon"].combine_chunks().to_numpy()[order]
    nlat = nt_t["lat"].combine_chunks().to_numpy()[order]

    refs = wt_t["refs"].combine_chunks()
    offsets = np.asarray(refs.offsets, np.int64)
    flat = refs.flatten().to_numpy()
    wid = wt_t["id"].combine_chunks().to_numpy()
    n = np.diff(offsets)

    jj = np.searchsorted(nid_s, flat).clip(max=max(len(nid_s) - 1, 0))
    found = nid_s[jj] == flat if len(nid_s) else np.zeros(len(flat), bool)
    x = np.where(found, nlon[jj], np.nan)
    y = np.where(found, nlat[jj], np.nan)

    # consecutive pairs; drop the cross-way seam rows and any pair with
    # an unresolved endpoint
    seg_way = np.repeat(wid, np.maximum(n - 1, 0))
    last_of_way = np.zeros(len(flat), bool)
    last_of_way[(offsets[1:] - 1).clip(min=0)] = True
    pair_ok = ~last_of_way[:-1] if len(flat) else np.zeros(0, bool)
    ax, ay = x[:-1][pair_ok], y[:-1][pair_ok]
    bx, by = x[1:][pair_ok], y[1:][pair_ok]
    ok = ~(np.isnan(ax) | np.isnan(bx))
    ax, ay, bx, by, seg_way = ax[ok], ay[ok], bx[ok], by[ok], seg_way[ok]
    # 1-based seq of the segment's FIRST point within its way
    pos = np.arange(len(flat), dtype=np.int64)
    rel = (pos - np.repeat(offsets[:-1], n))[:-1][pair_ok][ok] + 1

    so = np.lexsort((rel, seg_way))
    seg_way, rel = seg_way[so], rel[so]
    ax, ay, bx, by = ax[so], ay[so], bx[so], by[so]

    x0t, y1t = tiles.tile_xy(np.minimum(ax, bx), np.minimum(ay, by), res)
    x1t, y0t = tiles.tile_xy(np.maximum(ax, bx), np.maximum(ay, by), res)
    span = (x1t - x0t + 1) * (y1t - y0t + 1)
    idx = np.repeat(np.arange(len(seg_way), dtype=np.int64), span)
    base = np.repeat(np.cumsum(span) - span, span)
    k = np.arange(int(span.sum()), dtype=np.int64) - base
    w_ = np.repeat(x1t - x0t + 1, span)
    cx = np.repeat(x0t, span) + (k % w_)
    cy = np.repeat(y0t, span) + (k // w_)
    keys = (cx << np.int64(32)) | cy

    co = np.lexsort((idx, keys))  # bucket-major, ascending seg idx within
    keys_s, idx_s = keys[co], idx[co]
    ukeys, starts = np.unique(keys_s, return_index=True)
    off = np.append(starts, len(keys_s)).astype(np.int64)
    return ray.put({"res": res, "ukeys": ukeys, "off": off,
                    "segidx": idx_s, "way": seg_way, "seq": rel,
                    "ax": ax, "ay": ay, "bx": bx, "by": by})


def snap_to_segment(images: ray.data.Dataset, layer_ref: ray.ObjectRef,
                    max_snap_deg: float = 0.005,
                    id_col: str = "image_id",
                    batch_size: int = 4096,
                    pair_chunk: int = 4_000_000) -> ray.data.Dataset:
    """(image_id, way_id, seq, dist_deg7): map-matching — snap every
    geotagged image within ``max_snap_deg`` (planar degrees, the kNN
    layer's metric) of the way network to its nearest way SEGMENT,
    reporting the owning way, the segment's 1-based position, and the
    point-to-segment distance rounded at 7 digits.  Ties resolve
    lexicographically by (distance, way_id, seq); images farther than
    the threshold from every segment are dropped (the standard
    map-matching radius — a photo an ocean away from the network has
    no meaningful match, and the radius is what keeps BOTH sides of
    the oracle contract scan-bounded).

    NO shuffle: the bucket layer broadcasts once and every batch
    probes it independently — for each point, the probed region is the
    tile rectangle spanned by tile_xy(p ± T), which provably contains
    the bbox-cover cells of every segment within T of p (tile_xy is
    monotone per axis), so the candidate set is a superset of all
    in-radius segments and the min over it equals the full scan's min
    whenever that min is within the radius.  The per-(point, segment)
    projection expression — residuals as (rx - t*dx), NOT
    (p - (a + t*dx)) — is mirrored term-for-term by the SQL oracle's
    bbox-prefiltered join, so results match bit-for-bit."""
    from ..geo import tiles
    from ..util import round_half_away
    T = float(max_snap_deg)

    def fn(t: pa.Table) -> pa.Table:
        layer = ray.get(layer_ref)
        res = layer["res"]
        ukeys, off, segidx = layer["ukeys"], layer["off"], layer["segidx"]
        px = t["lon"].combine_chunks().to_numpy()
        py = t["lat"].combine_chunks().to_numpy()
        x0t, y1t = tiles.tile_xy(px - T, py - T, res)
        x1t, y0t = tiles.tile_xy(px + T, py + T, res)
        span = (x1t - x0t + 1) * (y1t - y0t + 1)
        pi0 = np.repeat(np.arange(len(px), dtype=np.int64), span)
        base = np.repeat(np.cumsum(span) - span, span)
        k = np.arange(int(span.sum()), dtype=np.int64) - base
        w_ = np.repeat(x1t - x0t + 1, span)
        qx = np.repeat(x0t, span) + (k % w_)
        qy = np.repeat(y0t, span) + (k // w_)
        qk = (qx << np.int64(32)) | qy
        j = np.searchsorted(ukeys, qk).clip(max=max(len(ukeys) - 1, 0))
        hit = (ukeys[j] == qk) if len(ukeys) else np.zeros(len(qk), bool)
        bslot, bpi = j[hit], pi0[hit]
        blen = off[bslot + 1] - off[bslot]
        # flatten (point, bucket) -> (point, segment) candidate pairs
        cpi = np.repeat(bpi, blen)
        cbase = np.repeat(np.cumsum(blen) - blen, blen)
        coff = np.arange(int(blen.sum()), dtype=np.int64) - cbase
        cseg = segidx[np.repeat(off[bslot], blen) + coff]
        # evaluate d2 in bounded chunks
        d2 = np.empty(len(cseg), np.float64)
        for s in range(0, len(cseg), pair_chunk):
            e = min(s + pair_chunk, len(cseg))
            ci, cs = cpi[s:e], cseg[s:e]
            axc, ayc = layer["ax"][cs], layer["ay"][cs]
            dx = layer["bx"][cs] - axc
            dy = layer["by"][cs] - ayc
            L2 = dx * dx + dy * dy
            rx = px[ci] - axc
            ry = py[ci] - ayc
            with np.errstate(divide="ignore", invalid="ignore"):
                tt = np.where(L2 > 0.0, (rx * dx + ry * dy)
                              / np.where(L2 > 0.0, L2, 1.0), 0.0)
            tt = np.clip(tt, 0.0, 1.0)
            ex = rx - tt * dx
            ey = ry - tt * dy
            d2[s:e] = ex * ex + ey * ey
        # min per point with the (d2, way_id, seq) tie rule: segment
        # index order IS (way_id, seq) order
        o = np.lexsort((cseg, d2, cpi))
        cpi, cseg, d2 = cpi[o], cseg[o], d2[o]
        first = np.flatnonzero(np.r_[True, cpi[1:] != cpi[:-1]]) \
            if len(cpi) else np.empty(0, np.int64)
        wpi, wseg, wd2 = cpi[first], cseg[first], d2[first]
        keep = wd2 <= T * T
        wpi, wseg, wd2 = wpi[keep], wseg[keep], wd2[keep]
        return pa.table({
            id_col: t[id_col].combine_chunks().take(pa.array(wpi)),
            "way_id": pa.array(layer["way"][wseg]),
            "seq": pa.array(layer["seq"][wseg], pa.int64()),
            "dist_deg7": pa.array(round_half_away(np.sqrt(wd2), 7)),
        })

    return images.map_batches(fn, batch_format="pyarrow",
                              batch_size=batch_size)


def cell_kde(pts: ray.data.Dataset, grid_bits: int = 12,
             radius_deg: float = 0.05,
             batch_size: int = 65536) -> ray.data.Dataset:
    """(gx, gy, n, kde6): quartic-kernel (biweight) density estimate of
    the point field sampled at the centers of a LINEAR lon/lat grid
    (2^``grid_bits`` cells per axis — 360/4096 and 180/4096 are exact
    dyadic degrees, so centers are float-exact on both engine and SQL
    sides): every grid cell whose center lies strictly within
    ``radius_deg`` of at least one point gets
    kde = sum_points (1 - d2/r2)^2 and the contributing count — the
    smooth heatmap surface a tile renderer shades, next to
    cell_histogram's hard binning.

    Scale plan: the kernel radius is under one cell width, so each
    point touches at most its 3x3 neighbor centers — a 9-offset
    candidate expansion inside map_batches (no point leaves its task),
    each batch pre-collapses to one partial row per touched cell, and
    ONE bounded hash exchange (partial_groupby_agg) merges partials.
    Shuffle volume is O(touched cells x blocks), not O(points).
    Rounding at 6 digits absorbs the summation-order float noise of
    both sides' parallel sums (caption_align precedent)."""
    from ..relational import partial_groupby_agg
    from ..util import round_half_away
    n_side = 1 << grid_bits
    cw = 360.0 / n_side
    ch = 180.0 / n_side
    r2 = float(radius_deg) * float(radius_deg)

    def expand(t: pa.Table) -> pa.Table:
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        gx = np.floor((lon + 180.0) / 360.0 * n_side)
        gy = np.floor((lat + 90.0) / 180.0 * n_side)
        outs = []
        for dx in (-1.0, 0.0, 1.0):
            for dy in (-1.0, 0.0, 1.0):
                cx = (gx + dx + 0.5) * cw - 180.0
                cy = (gy + dy + 0.5) * ch - 90.0
                dxc = lon - cx
                dyc = lat - cy
                d2 = dxc * dxc + dyc * dyc
                ok = ((d2 < r2) & (gx + dx >= 0) & (gx + dx < n_side)
                      & (gy + dy >= 0) & (gy + dy < n_side))
                if not ok.any():
                    continue
                w = 1.0 - d2[ok] / r2
                outs.append(pa.table({
                    "gx": pa.array((gx + dx)[ok].astype(np.int64)),
                    "gy": pa.array((gy + dy)[ok].astype(np.int64)),
                    "pn": pa.array(np.ones(int(ok.sum()), np.int64)),
                    "pk": pa.array(w * w),
                }))
        if not outs:
            return pa.table({"gx": pa.array([], pa.int64()),
                             "gy": pa.array([], pa.int64()),
                             "pn": pa.array([], pa.int64()),
                             "pk": pa.array([], pa.float64())})
        return pa.concat_tables(outs)

    agg = partial_groupby_agg(
        pts.map_batches(expand, batch_format="pyarrow",
                        batch_size=batch_size),
        ["gx", "gy"], [("pn", "sum"), ("pk", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "gx": t["gx"], "gy": t["gy"],
            "n": t["pn_sum"],
            "kde6": pa.array(round_half_away(
                t["pk_sum"].combine_chunks().to_numpy(zero_copy_only=False),
                6)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def term_cell_lift(images: ray.data.Dataset, res: int = 5,
                   min_n: int = 5, num_parts: int = 32) -> ray.data.Dataset:
    """(cell_r{res}, token, n, lift6): pointwise lift of each caption
    token inside each res-``res`` cell vs its global rate —
    lift = (n_tc * N) / (n_t * n_c) — the geographic-bias audit a
    caption corpus gets before training (does "beach" concentrate in
    coastal cells, is a template string stamped over one region?).
    Pairs below ``min_n`` occurrences are suppressed (rate estimates
    are noise there, and the floor bounds the output).

    Scale plan: blocks collapse to (token, cell) partials and ONE
    token-hash exchange (partial_groupby_agg) makes pair counts exact;
    token and cell marginals are then two aggregations OVER THE
    COLLAPSED PAIR TABLE (vocab- and cell-bounded, nothing touches the
    raw corpus again) that broadcast into a final stateless map.  At
    open-web vocabulary the marginal broadcast takes the tfidf_capped
    top-V treatment; the pair exchange itself is already bounded."""
    from ..geo import tiles
    from ..relational import broadcast_table, partial_groupby_agg
    from ..util import round_half_away
    from .text import _tokens_flat

    cell_col = f"cell_r{res}"

    def expand(t: pa.Table) -> pa.Table:
        counts, toks = _tokens_flat(t["caption"].combine_chunks())
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        cell = np.repeat(tiles.cell_id(lon, lat, res), counts)
        return pa.table({"token": pa.array(toks.astype(str),
                                           type=pa.string()),
                         "cell": pa.array(cell),
                         "one": pa.array(np.ones(len(cell), np.int64))})

    pairs = partial_groupby_agg(
        images.map_batches(expand, batch_format="pyarrow",
                           batch_size=8192),
        ["token", "cell"], [("one", "sum")],
        num_parts=num_parts)  # -> token, cell, one_sum

    def _rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["token", "cell", "n"])

    pairs = pairs.map_batches(_rename, batch_format="pyarrow").materialize()
    tok_tot = partial_groupby_agg(pairs, ["token"], [("n", "sum")],
                                  num_parts=num_parts)
    cell_tot = partial_groupby_agg(pairs, ["cell"], [("n", "sum")],
                                   num_parts=num_parts)
    tok_ref = broadcast_table(tok_tot, ["token", "n_sum"])
    cell_ref = broadcast_table(cell_tot, ["cell", "n_sum"])

    def finish(t: pa.Table) -> pa.Table:
        tt = ray.get(tok_ref)
        ct = ray.get(cell_ref)
        tw = np.asarray(tt["token"].combine_chunks().to_pylist(), dtype=str)
        tn = tt["n_sum"].combine_chunks().to_numpy()
        to = np.argsort(tw, kind="stable")
        tw, tn = tw[to], tn[to]
        cv = ct["cell"].combine_chunks().to_numpy()
        cn = ct["n_sum"].combine_chunks().to_numpy()
        co = np.argsort(cv, kind="stable")
        cv, cn = cv[co], cn[co]
        total = float(cn.sum())

        n = t["n"].combine_chunks().to_numpy()
        keep = n >= min_n
        tok = t["token"].combine_chunks().filter(pa.array(keep))
        cell = t["cell"].combine_chunks().to_numpy()[keep]
        n = n[keep]
        qw = np.asarray(tok.to_pylist(), dtype=str)
        nt = tn[np.searchsorted(tw, qw)]
        nc = cn[np.searchsorted(cv, cell)]
        lift = (n.astype(np.float64) * total) \
            / (nt.astype(np.float64) * nc.astype(np.float64))
        return pa.table({
            cell_col: pa.array(cell),
            "token": tok,
            "n": pa.array(n, pa.int64()),
            "lift6": pa.array(round_half_away(lift, 6)),
        })

    return pairs.map_batches(finish, batch_format="pyarrow")


def cell_anisotropy(pts: ray.data.Dataset, res: int = 7,
                    num_parts: int = 32,
                    batch_size: int = 65536) -> ray.data.Dataset:
    """(cell_r{res}, n, angle6, ecc6): principal orientation (radians,
    0.5*atan2(2*cxy, cxx-cyy)) and eccentricity sqrt(1 - l2/l1) of each
    occupied cell's point-cloud covariance — does the imagery in a cell
    string out along a coastline/highway or spread isotropically?  The
    shard-shape signal a spatial partitioner reads next to
    cell_diameter's extent.

    Float contract with the SQL mirror: moments are accumulated about
    each cell's EXACT per-cell minimum corner (min is order-free and
    float-exact on both sides, unlike a mean), which bounds every
    centered term by the cell extent so the engine-vs-DuckDB summation-
    order noise stays ~1e-11 absolute and the 6-digit rounding absorbs
    it; the covariance, eigenvalue, and angle expressions then mirror
    term-for-term.  Plan: ONE hash(cell) exchange of (cell, lon, lat) —
    the cell_diameter volume — and a fully vectorized reduceat pass per
    partition."""
    from ..geo import tiles
    from ..relational import hash_part
    from ..util import round_half_away

    cell_col = f"cell_r{res}"

    def assign(t: pa.Table) -> pa.Table:
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        c = tiles.cell_id(lon, lat, res)
        return pa.table({"cell": pa.array(c), "lon": pa.array(lon),
                         "lat": pa.array(lat),
                         "part": pa.array(hash_part(c, num_parts))})

    def finish(t: pa.Table) -> pa.Table:
        c = t["cell"].combine_chunks().to_numpy()
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        order = np.argsort(c, kind="stable")
        c, lon, lat = c[order], lon[order], lat[order]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]]) \
            if len(c) else np.empty(0, np.int64)
        counts = np.diff(np.r_[starts, len(c)]) if len(c) \
            else np.empty(0, np.int64)
        mlon = np.minimum.reduceat(lon, starts) if len(c) \
            else np.empty(0, np.float64)
        mlat = np.minimum.reduceat(lat, starts) if len(c) \
            else np.empty(0, np.float64)
        dx = lon - np.repeat(mlon, counts)
        dy = lat - np.repeat(mlat, counts)
        nd = counts.astype(np.float64)
        sx = np.add.reduceat(dx, starts) if len(c) else nd
        sy = np.add.reduceat(dy, starts) if len(c) else nd
        sxx = np.add.reduceat(dx * dx, starts) if len(c) else nd
        syy = np.add.reduceat(dy * dy, starts) if len(c) else nd
        sxy = np.add.reduceat(dx * dy, starts) if len(c) else nd
        cxx = sxx / nd - (sx / nd) * (sx / nd)
        cyy = syy / nd - (sy / nd) * (sy / nd)
        cxy = sxy / nd - (sx / nd) * (sy / nd)
        disc = np.sqrt((cxx - cyy) * (cxx - cyy) + 4.0 * cxy * cxy)
        l1 = ((cxx + cyy) + disc) / 2.0
        l2 = ((cxx + cyy) - disc) / 2.0
        angle = 0.5 * np.arctan2(2.0 * cxy, cxx - cyy)
        with np.errstate(divide="ignore", invalid="ignore"):
            ecc = np.where(l1 > 0.0,
                           np.sqrt(np.maximum(
                               1.0 - l2 / np.where(l1 > 0.0, l1, 1.0),
                               0.0)),
                           0.0)
        return pa.table({
            cell_col: pa.array(c[starts]),
            "n": pa.array(counts, pa.int64()),
            "angle6": pa.array(round_half_away(angle, 6)),
            "ecc6": pa.array(round_half_away(ecc, 6)),
        })

    return pts.map_batches(assign, batch_format="pyarrow",
                           batch_size=batch_size) \
        .groupby("part").map_groups(finish, batch_format="pyarrow")


def geohash_rollup(images: ray.data.Dataset,
                   levels: tuple = (2, 4, 6)) -> ray.data.Dataset:
    """(lvl, prefix, n): multi-resolution geohash census — image counts
    per geohash cell at every precision in ``levels`` via PREFIX
    truncation of the finest hash (each level-p cell is the substr(gh,
    1, p) ancestor), the string-hierarchical drill-down companion to
    cell_histogram/tile_pyramid.

    Scale plan: one pass computes the finest geohash (vectorized
    quantize + morton interleave), the block combiner emits one
    (lvl, prefix) partial row per distinct cell per level, and the
    merge is bounded by the cell universe, not the row count."""
    from ..geo.tiles import geohash
    from ..relational import partial_groupby_agg
    fine = max(levels)

    def fn(t: pa.Table) -> pa.Table:
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        gh = pa.array(np.char.decode(geohash(lon, lat, fine), "ascii"))
        parts = []
        for lvl in levels:
            parts.append(pa.table({
                "lvl": pa.array(np.full(len(lon), lvl, np.int64)),
                "prefix": pc.utf8_slice_codeunits(gh, 0, lvl),
                "one": pa.array(np.ones(len(lon), np.int64)),
            }))
        return pa.concat_tables(parts)

    cells = images.map_batches(fn, batch_format="pyarrow",
                               batch_size=65536)
    agg = partial_groupby_agg(cells, ["prefix", "lvl"], [("one", "sum")])

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({
            "lvl": pc.cast(t["lvl"], pa.int64()),
            "prefix": t["prefix"],
            "n": pc.cast(t["one_sum"], pa.int64()),
        })

    return agg.map_batches(shape, batch_format="pyarrow")


def cell_phash_diversity(images: ray.data.Dataset,
                         res: int = 7) -> ray.data.Dataset:
    """(cell, n, n_sig, diversity6): perceptual-signature diversity per
    geo cell — image count, DISTINCT low-16-bit phash signatures, and
    their ratio per occupied res-``res`` cell.  The geo-curation dual
    of image_sig_dedup: a cell whose images collapse onto few
    signatures is dominated by re-posts/near-dups, the standard signal
    for location-balanced training-corpus sampling.

    Scale plan: per-block (cell, sig) dedup combiner first (signatures
    repeat within a block), ONE bounded hash exchange dedups globally
    and counts members, and the per-cell rollup is a second bounded
    exchange over at most one row per (cell, sig) — no distinct-count
    shuffle of raw rows, no driver materialization."""
    from ..geo import tiles
    from ..relational import partial_groupby_agg
    from ..util import round_half_away

    def sig(t: pa.Table) -> pa.Table:
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        cell = tiles.cell_id(lon, lat, res).astype(np.int64)
        s = t["phash"].combine_chunks().to_numpy() & np.int64(0xFFFF)
        # cell ids use ~61 bits — dedup the (cell, sig) pairs by
        # lexsort, never by bit-packing into one int64
        order = np.lexsort((s, cell))
        cell, s = cell[order], s[order]
        new = np.ones(len(cell), bool)
        if len(cell):
            new[1:] = (cell[1:] != cell[:-1]) | (s[1:] != s[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.r_[starts, len(cell)]) if len(cell) \
            else np.empty(0, np.int64)
        return pa.table({"cell": pa.array(cell[starts]),
                         "sig": pa.array(s[starts]),
                         "pn": pa.array(cnt.astype(np.int64))})

    per_sig = partial_groupby_agg(
        images.select_columns(["phash", "lon", "lat"])
        .map_batches(sig, batch_format="pyarrow", batch_size=65536),
        ["cell", "sig"], [("pn", "sum")])

    def cell_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "cell": t["cell"],
            "one": pa.array(np.ones(t.num_rows, np.int64)),
            "pn": t["pn_sum"]})

    agg = partial_groupby_agg(
        per_sig.map_batches(cell_rows, batch_format="pyarrow"),
        ["cell"], [("one", "sum"), ("pn", "sum")])

    def shape(t: pa.Table) -> pa.Table:
        nsig = t["one_sum"].combine_chunks().to_numpy().astype(np.int64)
        n = t["pn_sum"].combine_chunks().to_numpy().astype(np.int64)
        return pa.table({
            "cell": t["cell"], "n": pa.array(n),
            "n_sig": pa.array(nsig),
            "diversity6": pa.array(round_half_away(nsig / n, 6))})

    return agg.map_batches(shape, batch_format="pyarrow")


def tile_coverage(pts: ray.data.Dataset, z_coarse: int = 10,
                  z_fine: int = 14) -> ray.data.Dataset:
    """(tile_x, tile_y, n_subtiles, n_pts, coverage6): quadtree
    occupancy — for every occupied z_coarse web-mercator-grid tile, how
    many of its 4^(z_fine - z_coarse) z_fine descendants contain data,
    and the occupancy fraction.  The standard spatial-completeness /
    sampling-bias audit (a tile with many points but few occupied
    subtiles is a point-mass hotspot, not areal coverage).

    Scale plan: fine tiles dedup per block (combiner), ONE bounded
    hash exchange makes them globally unique with counts, the parent
    rollup dedups per block again and a second bounded exchange sums —
    every exchanged row is a distinct tile, never a raw point."""
    from ..geo import tiles
    from ..relational import partial_groupby_agg
    from ..util import round_half_away
    dz = z_fine - z_coarse
    denom = float(1 << (2 * dz))

    def fine(t: pa.Table) -> pa.Table:
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        tx, ty = tiles.tile_xy(lon, lat, z_fine)
        key = (tx << np.int64(z_fine + 1)) | ty
        u, cnt = np.unique(key, return_counts=True)
        return pa.table({"fx": pa.array(u >> np.int64(z_fine + 1)),
                         "fy": pa.array(u & np.int64((1 << (z_fine + 1)) - 1)),
                         "pn": pa.array(cnt.astype(np.int64))})

    fine_tiles = partial_groupby_agg(
        pts.select_columns(["lon", "lat"])
        .map_batches(fine, batch_format="pyarrow", batch_size=65536),
        ["fx", "fy"], [("pn", "sum")])

    def parent(t: pa.Table) -> pa.Table:
        return pa.table({
            "tile_x": pc.shift_right(t["fx"], dz),
            "tile_y": pc.shift_right(t["fy"], dz),
            "one": pa.array(np.ones(t.num_rows, np.int64)),
            "pn": t["pn_sum"]})

    agg = partial_groupby_agg(
        fine_tiles.map_batches(parent, batch_format="pyarrow"),
        ["tile_x", "tile_y"], [("one", "sum"), ("pn", "sum")])

    def shape(t: pa.Table) -> pa.Table:
        nsub = t["one_sum"].combine_chunks().to_numpy().astype(np.int64)
        return pa.table({
            "tile_x": pc.cast(t["tile_x"], pa.int64()),
            "tile_y": pc.cast(t["tile_y"], pa.int64()),
            "n_subtiles": pa.array(nsub),
            "n_pts": pc.cast(t["pn_sum"], pa.int64()),
            "coverage6": pa.array(round_half_away(nsub / denom, 6))})

    return agg.map_batches(shape, batch_format="pyarrow")


# ---------------------------------------------------------------- ripley


def ripley_k(pts: ray.data.Dataset, res: int = 7,
             radii: tuple = (100.0, 300.0, 1000.0),
             num_parts: int = 32,
             batch_size: int = 65536,
             max_pairs_chunk: int = 4_000_000) -> ray.data.Dataset:
    """(cell_r{res}, n, le100, le300, le1000): Ripley's-K numerators —
    for every occupied res-``res`` cell, the exact number of unordered
    point pairs whose haversine distance (meters, sphere EARTH_R_M,
    rounded half-away at 3 dp BEFORE the threshold, the radius_join
    contract) is <= each radius, plus the point count.  The classic
    second-order clustering statistic a curation pipeline uses to
    tell photographic hot-spots from uniform coverage (reference
    analogue: the per-tile density summaries around osm/Summary.go).

    Scale plan: ONE hash(cell) exchange ships (cell, lon, lat) —
    O(points), nothing pairwise crosses the wire.  Each partition
    buckets its points into a 2-D fine grid sized to max(radii) —
    lat box = the provable latitude band (d >= R|dphi|), lon box
    widened per cell by (pi/2)/cos(lat) (from d >= (2/pi) R cos(phi)
    dlambda, the asin/sin lower bounds) — so every qualifying pair
    sits in the same or an adjacent box and the kernel enumerates
    only the 5-offset half-neighborhood (same box j>i, E, SW, S, SE:
    each unordered pair is seen exactly once).  Candidates expand
    through the clique-trick index arithmetic in bounded chunks
    (<= ``max_pairs_chunk`` pairs in flight), so a dense urban cell
    costs O(true near-pairs), not O(n^2) — 11.6 M candidates for the
    2.8 M true near-pairs across sf0.1's 200 k points (vs 79 M pairs
    in the hot cell alone under a 1-D latitude band).  Counts are
    integers —
    exchange- and merge-order-free — so the engine matches the
    oracle's brute-force self-join exactly."""
    from ..geo import tiles
    from ..relational import hash_part
    from ..util import round_half_away
    from .osm import EARTH_R_M

    cell_col = f"cell_r{res}"
    d2r = np.pi / 180.0
    rmax = float(max(radii))
    # lat box (degrees) that provably contains every pair whose ROUNDED
    # distance can be <= rmax: d >= R*|dphi| and rounding moves <= 0.5mm
    band_deg = (rmax + 1e-3) / (EARTH_R_M * d2r)

    def partial(t: pa.Table) -> pa.Table:
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        c = tiles.cell_id(lon, lat, res)
        return pa.table({"cell": pa.array(c), "lon": pa.array(lon),
                         "lat": pa.array(lat),
                         "part": pa.array(hash_part(c, num_parts))})

    def _hav(lon1, lat1, lon2, lat2):
        p1 = lat1 * d2r
        p2 = lat2 * d2r
        sdp = np.sin((p2 - p1) / 2.0)
        sdl = np.sin((lon2 - lon1) * d2r / 2.0)
        a = np.minimum(sdp * sdp + np.cos(p1) * np.cos(p2) * sdl * sdl, 1.0)
        return 2.0 * EARTH_R_M * np.arcsin(np.sqrt(a))

    def finish(t: pa.Table) -> pa.Table:
        c = t["cell"].combine_chunks().to_numpy()
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        cells, crank0, counts = np.unique(c, return_inverse=True,
                                          return_counts=True)
        ncell = len(cells)
        acc = np.zeros((len(radii), ncell), np.int64)
        if len(c):
            # per-cell lon box width: pairs in one r7 cell share lon
            # range (no antimeridian wrap), widened by the cell-min cos
            cosl = np.cos(lat * d2r)
            cosmin = np.full(ncell, 1.0)
            np.minimum.at(cosmin, crank0, cosl)
            bw = (np.pi / 2.0) * band_deg / np.maximum(cosmin, 1e-9)
            by = np.floor(lat / band_deg).astype(np.int64)
            bx = np.floor(lon / bw[crank0]).astype(np.int64)
            # composite int64 key, strictly lexicographic (cell, by, bx);
            # crank < 2^19 per partition, |by| <= 90/band ~ 1e4 < 2^21,
            # |bx| <= 180/bw_min < 2^21 (bw >= (pi/2)*band)
            key = (((crank0.astype(np.int64) << np.int64(22))
                    + (by + np.int64(1 << 21))) << np.int64(22)) \
                + (bx + np.int64(1 << 21))
            order = np.argsort(key, kind="stable")
            keys = key[order]
            lon_s, lat_s, cr_s = lon[order], lat[order], crank0[order]
            pos = np.arange(len(c), dtype=np.int64)
            DY = np.int64(1) << np.int64(22)

            def emit(rep, jbase):
                # chunked clique-trick expansion: bounded pair memory
                csum = np.cumsum(rep)
                lo = 0
                while lo < len(rep):
                    base0 = csum[lo - 1] if lo else 0
                    hi = int(np.searchsorted(csum, base0 + max_pairs_chunk,
                                             side="left")) + 1
                    hi = min(max(hi, lo + 1), len(rep))
                    r = rep[lo:hi]
                    tot = int(r.sum())
                    if tot:
                        i = np.repeat(pos[lo:hi], r)
                        local = np.cumsum(r) - r
                        w = np.arange(tot, dtype=np.int64) \
                            - np.repeat(local, r)
                        j = np.repeat(jbase[lo:hi], r) + w
                        d3 = round_half_away(_hav(lon_s[i], lat_s[i],
                                                  lon_s[j], lat_s[j]), 3)
                        ci = cr_s[i]
                        for k, rad in enumerate(radii):
                            m = d3 <= rad
                            if m.any():
                                acc[k] += np.bincount(ci[m],
                                                      minlength=ncell)
                    lo = hi

            # same box: j > i within the key run
            hi0 = np.searchsorted(keys, keys, side="right")
            emit(np.maximum(hi0 - pos - 1, 0), pos + 1)
            # forward half-neighborhood: E, SW, S, SE (each unordered
            # cross-box pair is enumerated from exactly one side)
            for delta in (np.int64(1), DY - 1, DY, DY + 1):
                tgt = keys + delta
                lo1 = np.searchsorted(keys, tgt, side="left")
                hi1 = np.searchsorted(keys, tgt, side="right")
                emit(np.maximum(hi1 - lo1, 0), lo1)
        cols = {cell_col: pa.array(cells),
                "n": pa.array(counts.astype(np.int64))}
        for k, rad in enumerate(radii):
            cols[f"le{int(rad)}"] = pa.array(acc[k])
        return pa.table(cols)

    return pts.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size) \
        .groupby("part").map_groups(finish, batch_format="pyarrow")


def cell_nn_stats(pts: ray.data.Dataset, res: int = 7,
                  base_m: float = 200.0,
                  num_parts: int = 32,
                  batch_size: int = 65536,
                  max_pairs_chunk: int = 4_000_000) -> ray.data.Dataset:
    """(cell_r{res}, n, nn_mean6, nn_min3, nn_max3): exact
    nearest-neighbour distance statistics per occupied res-``res``
    cell with n >= 2 — each point's distance to its closest same-cell
    neighbour (haversine meters, rounded half-away at 3 dp per point),
    aggregated as mean/min/max.  The Clark-Evans ingredient that
    separates clustered from dispersed coverage.

    Scale plan: ONE hash(cell) exchange ships (cell, lon, lat).  The
    per-partition kernel runs a doubling grid search: level L buckets
    every point into boxes spanning ``base_m * 2^L`` meters (lat box
    from d >= R|dphi|; lon box widened per cell by (pi/2)/cos(phi)),
    scans the 3x3 neighborhood of each UNRESOLVED point, and accepts
    a candidate min that is <= the level guarantee G_L = base_m*2^L —
    any point outside the neighborhood is provably farther than G_L,
    so the accepted value is the true NN.  Dense cells resolve at the
    first level (O(true near-neighbour) candidates); sparse cells
    escalate with geometrically fewer unresolved points, terminating
    when one box covers the whole cell (the scan is then exhaustive).
    Per-point NN converts to integer millimetres before summing, so
    cell means are summation-order-free and match the oracle's
    brute-force self-join exactly."""
    from ..geo import tiles
    from ..relational import hash_part
    from ..util import round_half_away
    from .osm import EARTH_R_M

    cell_col = f"cell_r{res}"
    d2r = np.pi / 180.0
    cell_span = 360.0 / float(1 << res)

    def partial(t: pa.Table) -> pa.Table:
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        c = tiles.cell_id(lon, lat, res)
        return pa.table({"cell": pa.array(c), "lon": pa.array(lon),
                         "lat": pa.array(lat),
                         "part": pa.array(hash_part(c, num_parts))})

    def _hav(lon1, lat1, lon2, lat2):
        p1 = lat1 * d2r
        p2 = lat2 * d2r
        sdp = np.sin((p2 - p1) / 2.0)
        sdl = np.sin((lon2 - lon1) * d2r / 2.0)
        a = np.minimum(sdp * sdp + np.cos(p1) * np.cos(p2) * sdl * sdl, 1.0)
        return 2.0 * EARTH_R_M * np.arcsin(np.sqrt(a))

    def finish(t: pa.Table) -> pa.Table:
        c = t["cell"].combine_chunks().to_numpy()
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        cells, crank0, counts = np.unique(c, return_inverse=True,
                                          return_counts=True)
        ncell = len(cells)
        npts = len(c)
        nn = np.full(npts, np.inf)
        if npts:
            cosl = np.cos(lat * d2r)
            cosmin = np.full(ncell, 1.0)
            np.minimum.at(cosmin, crank0, cosl)
            # points in singleton cells have no neighbour by definition
            unresolved = np.flatnonzero(counts[crank0] >= 2)
            level = 0
            while len(unresolved):
                g_m = base_m * (2.0 ** level)
                band = g_m / (EARTH_R_M * d2r)
                bw = (np.pi / 2.0) * band / np.maximum(cosmin, 1e-9)
                by = np.floor(lat / band).astype(np.int64)
                bx = np.floor(lon / bw[crank0]).astype(np.int64)
                key = (((crank0.astype(np.int64) << np.int64(22))
                        + (by + np.int64(1 << 21))) << np.int64(22)) \
                    + (bx + np.int64(1 << 21))
                order = np.argsort(key, kind="stable")
                keys = key[order]
                lon_s, lat_s = lon[order], lat[order]
                inv = np.empty(npts, np.int64)
                inv[order] = np.arange(npts, dtype=np.int64)
                up = inv[unresolved]          # sorted-domain index of each
                DY = np.int64(1) << np.int64(22)
                best = np.full(len(up), np.inf)
                for dy in (-DY, np.int64(0), DY):
                    for dx in (np.int64(-1), np.int64(0), np.int64(1)):
                        tgt = keys[up] + dy + dx
                        lo1 = np.searchsorted(keys, tgt, side="left")
                        hi1 = np.searchsorted(keys, tgt, side="right")
                        rep = np.maximum(hi1 - lo1, 0)
                        csum = np.cumsum(rep)
                        s = 0
                        while s < len(rep):
                            b0 = csum[s - 1] if s else 0
                            e = int(np.searchsorted(
                                csum, b0 + max_pairs_chunk, "left")) + 1
                            e = min(max(e, s + 1), len(rep))
                            r = rep[s:e]
                            tot = int(r.sum())
                            if tot:
                                ii = np.repeat(np.arange(s, e), r)
                                local = np.cumsum(r) - r
                                w = np.arange(tot, dtype=np.int64) \
                                    - np.repeat(local, r)
                                jj = np.repeat(lo1[s:e], r) + w
                                pi_ = up[ii]
                                d = _hav(lon_s[pi_], lat_s[pi_],
                                         lon_s[jj], lat_s[jj])
                                d[jj == pi_] = np.inf   # self
                                np.minimum.at(best, ii, d)
                            s = e
                accept = best <= g_m
                if band >= cell_span:
                    accept[:] = True    # one box covers the whole cell
                nn[unresolved[accept]] = best[accept]
                unresolved = unresolved[~accept]
                level += 1
        # integer-millimetre per-point NN (monotone round commutes
        # with min, so this equals the oracle's min of rounded values)
        has = np.isfinite(nn)
        mm = round_half_away(np.where(has, nn, 0.0) * 1000.0, 0) \
            .astype(np.int64)
        summ = np.zeros(ncell, np.int64)
        np.add.at(summ, crank0[has], mm[has])
        mn = np.full(ncell, np.iinfo(np.int64).max)
        np.minimum.at(mn, crank0[has], mm[has])
        mx = np.zeros(ncell, np.int64)
        np.maximum.at(mx, crank0[has], mm[has])
        keep = counts >= 2
        n_k = counts[keep].astype(np.int64)
        return pa.table({
            cell_col: pa.array(cells[keep]),
            "n": pa.array(n_k),
            "nn_mean6": pa.array(round_half_away(
                summ[keep] / (n_k * 1000.0), 6)),
            "nn_min3": pa.array(mn[keep] / 1000.0),
            "nn_max3": pa.array(mx[keep] / 1000.0),
        })

    return pts.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size) \
        .groupby("part").map_groups(finish, batch_format="pyarrow")


def hilbert_order(pts: ray.data.Dataset, order: int = 16,
                  shard_bits: int = 8) -> ray.data.Dataset:
    """(image_id, hilbert{order}, shard): Hilbert-curve linearization
    of the image field plus its top-``shard_bits`` range shard — the
    locality-preserving partitioning key (contiguous index ranges are
    spatially compact, unlike the morton/Z key's diagonal jumps) a
    planet-scale run uses to range-split Lance fragments so co-located
    images land in the same shard.  Pure per-row map: vectorized bit
    walk, no exchange."""
    from ..geo import tiles

    col = f"hilbert{order}"
    shift = np.int64(2 * order - shard_bits)

    def fn(t: pa.Table) -> pa.Table:
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        d = tiles.hilbert_d(lon, lat, order)
        return pa.table({"image_id": t["image_id"],
                         col: pa.array(d),
                         "shard": pa.array(d >> shift)})

    return pts.map_batches(fn, batch_format="pyarrow")


def ann_recall(embeddings: ray.data.Dataset, queries_ref: ray.ObjectRef,
               k: int, n_lists: int = 16, nprobe: int = 8,
               concurrency: int | tuple[int, int] | None = None,
               batch_size: int = 4096) -> ray.data.Dataset:
    """(query_id, n_hit, recall4): recall@k of the IVF probe path
    against the exact brute-force scan — the eval harness every ANN
    deployment runs before trading exactness for probe locality.

    Scale plan: both legs are the existing distributed operators (one
    data pass each, actor-pool kernels, bounded per-query top-k
    merges); their outputs are Q x k rows, so the comparison is a
    union-tag of two TINY tables into one bounded merge task — the
    data is never touched a third time.  Queries whose probed lists
    are all empty simply score 0 hits."""
    from ..relational import single_merge

    exact = ann_topk(embeddings, queries_ref, k,
                     concurrency=concurrency, batch_size=batch_size)
    approx = ann_ivf_topk(embeddings, queries_ref, k, n_lists, nprobe,
                          concurrency=concurrency, batch_size=batch_size)

    def tag(flag: bool):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({
                "query_id": pc.cast(t["query_id"], pa.int64()),
                "vec_id": pc.cast(t["vec_id"], pa.int64()),
                "_ex": pa.array(np.full(t.num_rows, flag))})
        return f

    def merge(t: pa.Table) -> pa.Table:
        from ..util import round_half_away
        q = t["query_id"].combine_chunks().to_numpy()
        v = t["vec_id"].combine_chunks().to_numpy()
        ex = t["_ex"].combine_chunks().to_numpy(zero_copy_only=False)
        key = (q.astype(np.int64) << np.int64(32)) | v.astype(np.int64)
        uq = np.unique(q[ex])  # every query has an exact top-k row
        hits = np.isin(key[~ex], key[ex])
        codes = np.searchsorted(uq, q[~ex])
        n_hit = np.bincount(codes[hits], minlength=len(uq)) \
            .astype(np.int64)
        return pa.table({
            "query_id": pa.array(uq),
            "n_hit": pa.array(n_hit),
            "recall4": pa.array(round_half_away(n_hit / k, 4),
                                pa.float64())})

    # materialize each leg's Q x k rows before the union: the two legs
    # share the candidate Dataset's lineage, and a union over reused
    # actor-pool lineage deadlocks Ray 2.49's shuffle aggregators at
    # small CPU counts (the way_triangles precedent); the materialized
    # tables are bounded by construction so this is free at any scale
    both = exact.map_batches(tag(True), batch_format="pyarrow") \
        .materialize() \
        .union(approx.map_batches(tag(False), batch_format="pyarrow")
               .materialize())
    return single_merge(both, merge)


def partition_skew_stats(images: ray.data.Dataset, res: int = 7,
                         nd: int = 6) -> ray.data.Dataset:
    """(n_cells, n_points, max_n, top_cell, skew6): partition-skew
    audit of the cell key space — skew = max cell count over the mean
    (1 = balanced; the hot-box recipe makes it large). The
    observability probe the salted-shuffle path is sized from (the
    north rule's skew handling, quantified).

    Scale shape: cell_histogram partials + ONE bounded merge.
    Exactness: all counts int64; skew6 = float(max*Q)/float(N) — one
    float division mirrored by CAST(mx*q AS DOUBLE)/CAST(nn AS DOUBLE);
    top_cell ties break to the smallest cell id on both sides."""
    from ..geo import tiles
    from ..relational import single_merge
    from ..stages.assign import decode_geotag
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        t = decode_geotag(t)
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        c = tiles.cell_id(lon, lat, res)
        u, n = np.unique(c, return_counts=True)
        return pa.table({"cell": pa.array(u),
                         "pn": pa.array(n.astype(np.int64))})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("cell").aggregate([("pn", "sum")])
        cell = g["cell"].combine_chunks().to_numpy()
        x = g["pn_sum"].combine_chunks().to_numpy().astype(np.int64)
        order = np.argsort(cell)          # min-id tiebreak for argmax
        cell, x = cell[order], x[order]
        q = int(len(x))
        nn = int(x.sum())
        mx = int(x.max()) if q else 0
        top = int(cell[np.argmax(x)]) if q else -1
        skew = float(mx * q) / float(nn) if nn else 0.0
        return pa.table({
            "n_cells": pa.array([q], pa.int64()),
            "n_points": pa.array([nn], pa.int64()),
            "max_n": pa.array([mx], pa.int64()),
            "top_cell": pa.array([top], pa.int64()),
            "skew6": pa.array([float(round_half_away(np.float64(skew),
                                                     nd))])})

    return single_merge(
        images.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536), merge)


def cell_node_way_ols(nodes: ray.data.Dataset, ways: ray.data.Dataset,
                      res: int = 7, nd: int = 6) -> ray.data.Dataset:
    """(n_cells, sx, sy, sxy, sxx, slope6, intercept6): exact
    integer-moment OLS of way-vertex density against node density over
    occupied res-``res`` cells — the cross-layer regression ("does way
    coverage track node coverage?") a map-completeness audit reads.
    Every moment is an exact int64 sum; slope and intercept are the
    only float expressions, mirrored term-for-term in SQL.

    Scale shape: two tagged per-cell count partials (nodes direct; way
    vertices resolve refs against the broadcast node table — the same
    small side every way-geometry pass ships once) -> ONE bounded merge
    over the occupied-cell space."""
    from ..geo import tiles
    from ..relational import broadcast_table, single_merge
    from ..util import round_half_away

    nodes_ref = broadcast_table(nodes, ["id", "lon", "lat"])

    def node_partial(t: pa.Table) -> pa.Table:
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        c = tiles.cell_id(lon, lat, res)
        u, n = np.unique(c, return_counts=True)
        return pa.table({"cell": pa.array(u),
                         "x": pa.array(n.astype(np.int64)),
                         "y": pa.array(np.zeros(len(u), np.int64))})

    def way_partial(t: pa.Table) -> pa.Table:
        nt = ray.get(nodes_ref)
        nid = nt["id"].to_numpy()
        order = np.argsort(nid, kind="stable")
        nid_s = nid[order]
        nlon = nt["lon"].to_numpy()[order]
        nlat = nt["lat"].to_numpy()[order]
        refs = t["refs"].combine_chunks()
        flat = refs.flatten().to_numpy()
        idx = np.searchsorted(nid_s, flat)
        idx = np.minimum(idx, max(len(nid_s) - 1, 0))
        ok = (nid_s[idx] == flat) if len(nid_s) else \
            np.zeros(len(flat), bool)
        c = tiles.cell_id(nlon[idx[ok]], nlat[idx[ok]], res)
        u, n = np.unique(c, return_counts=True)
        return pa.table({"cell": pa.array(u),
                         "x": pa.array(np.zeros(len(u), np.int64)),
                         "y": pa.array(n.astype(np.int64))})

    both = nodes.select_columns(["lon", "lat"]) \
        .map_batches(node_partial, batch_format="pyarrow",
                     batch_size=65536) \
        .union(ways.select_columns(["refs"])
               .map_batches(way_partial, batch_format="pyarrow",
                            batch_size=65536))

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("cell").aggregate([("x", "sum"), ("y", "sum")])
        x = g["x_sum"].combine_chunks().to_numpy().astype(np.int64)
        y = g["y_sum"].combine_chunks().to_numpy().astype(np.int64)
        n = int(len(x))
        sx = int(x.sum())
        sy = int(y.sum())
        sxy = int((x * y).sum())
        sxx = int((x * x).sum())
        den = n * sxx - sx * sx
        slope = float(n * sxy - sx * sy) / float(den) if den else 0.0
        intercept = (float(sy) - slope * float(sx)) / float(n) \
            if n else 0.0
        return pa.table({
            "n_cells": pa.array([n], pa.int64()),
            "sx": pa.array([sx], pa.int64()),
            "sy": pa.array([sy], pa.int64()),
            "sxy": pa.array([sxy], pa.int64()),
            "sxx": pa.array([sxx], pa.int64()),
            "slope6": pa.array(
                [float(round_half_away(np.float64(slope), nd))]),
            "intercept6": pa.array(
                [float(round_half_away(np.float64(intercept), nd))])})

    return single_merge(both, merge)


def phash_bit_balance(images: ray.data.Dataset) -> ray.data.Dataset:
    """(bit, n_ones, n_rows, share6): per-bit 0/1 balance of the phash
    column across the corpus — the HASH-QUALITY audit every
    LSH/banding consumer should run first (a stuck bit halves band
    selectivity; phash here encodes the geotag morton code, so skewed
    bits ALSO reveal spatial clustering, linking the image and geo
    views of the same column).

    Scale plan: embarrassingly parallel — each block collapses to 64
    (bit, ones) partial rows via vectorized shifts; ONE tiny merge
    task sums and divides. Nothing but 64-row partials move."""
    from ..relational import single_merge
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        ph = t["phash"].combine_chunks().to_numpy().astype(np.uint64)
        ones = np.array([int(((ph >> np.uint64(i)) & np.uint64(1)).sum())
                         for i in range(64)], np.int64)
        return pa.table({"bit": pa.array(np.arange(64, dtype=np.int64)),
                         "n_ones": pa.array(ones),
                         "n_rows": pa.array(np.full(64, len(ph),
                                                    np.int64))})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("bit").aggregate([("n_ones", "sum"),
                                         ("n_rows", "sum")])
        bit = g["bit"].combine_chunks().to_numpy()
        order = np.argsort(bit)
        ones = g["n_ones_sum"].combine_chunks().to_numpy()[order]
        rows = g["n_rows_sum"].combine_chunks().to_numpy()[order]
        share = ones.astype(np.float64) / rows.astype(np.float64)
        return pa.table({
            "bit": pa.array(bit[order], pa.int64()),
            "n_ones": pa.array(ones.astype(np.int64)),
            "n_rows": pa.array(rows.astype(np.int64)),
            "share6": pa.array(round_half_away(share, 6), pa.float64())})

    return single_merge(
        images.select_columns(["phash"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        merge)


def cell_aspect_mix(images: ray.data.Dataset, res: int = 7
                    ) -> ray.data.Dataset:
    """(cell, n_images, n_portrait, n_landscape, n_square, landscape6):
    per-cell ASPECT-RATIO mix of the image corpus — the image x geo
    fusion audit an aspect-bucketing trainer reads per region
    (screenshot-heavy cells are portrait-skewed, landscape photography
    cells the reverse; aspect_bucket_pack sizes its buckets globally,
    this shows where the mix is regional).

    Scale plan: embarrassingly parallel — per-block Acero partials
    over (cell, class counts), ONE bounded combiner exchange by hash of
    cell (partial_groupby_agg), integer-exact with one float division."""
    from ..geo import tiles
    from ..relational import partial_groupby_agg
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        t = decode_geotag(t)
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        cell = tiles.cell_id(lon, lat, res)
        w = t["w"].combine_chunks().to_numpy().astype(np.int64)
        h = t["h"].combine_chunks().to_numpy().astype(np.int64)
        return pa.table({
            "cell": pa.array(cell),
            "n": pa.array(np.ones(len(cell), np.int64)),
            "p": pa.array((h > w).astype(np.int64)),
            "l": pa.array((w > h).astype(np.int64)),
            "s": pa.array((w == h).astype(np.int64))})

    g = partial_groupby_agg(
        images.select_columns(["phash", "w", "h"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        ["cell"], [("n", "sum"), ("p", "sum"), ("l", "sum"), ("s", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_sum"].combine_chunks().to_numpy()
        lan = t["l_sum"].combine_chunks().to_numpy()
        return pa.table({
            "cell": pc.cast(t["cell"], pa.int64()),
            "n_images": pa.array(n.astype(np.int64)),
            "n_portrait": pc.cast(t["p_sum"], pa.int64()),
            "n_landscape": pa.array(lan.astype(np.int64)),
            "n_square": pc.cast(t["s_sum"], pa.int64()),
            "landscape6": pa.array(round_half_away(
                lan.astype(np.float64) / n.astype(np.float64), 6),
                pa.float64())})

    return g.map_batches(finish, batch_format="pyarrow")


def cell_node_usage(nodes: ray.data.Dataset, ways: ray.data.Dataset,
                    res: int = 9,
                    num_parts: int = 16) -> ray.data.Dataset:
    """(cell, n_nodes, n_way_nodes, share6): per-cell split of nodes
    into way VERTICES vs standalone POIs — the cross-layer density
    audit (a cell whose share collapses is POI spam or an unmapped
    road grid; conflation pipelines weight the two populations
    differently).

    Scale plan: way refs collapse per block to distinct ids; node rows
    carry their cell; ONE id-hash co-partition marks membership with a
    sorted merge (the semi-join shape), then the bounded (cell,
    counts) combiner exchange rolls up."""
    from ..geo import tiles
    from ..relational import hash_part, partial_groupby_agg
    from ..util import round_half_away

    def node_rows(t: pa.Table) -> pa.Table:
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        nid = t["id"].combine_chunks().to_numpy()
        return pa.table({"id": pa.array(nid),
                         "cell": pa.array(tiles.cell_id(lon, lat, res)),
                         "is_ref": pa.array(np.zeros(len(nid), bool)),
                         "part": pa.array(hash_part(nid, num_parts))})

    def ref_rows(t: pa.Table) -> pa.Table:
        refs = np.unique(t["refs"].combine_chunks().flatten().to_numpy())
        return pa.table({"id": pa.array(refs),
                         "cell": pa.array(np.zeros(len(refs), np.int64)),
                         "is_ref": pa.array(np.ones(len(refs), bool)),
                         "part": pa.array(hash_part(refs, num_parts))})

    def mark(t: pa.Table) -> pa.Table:
        nid = t["id"].combine_chunks().to_numpy()
        cell = t["cell"].combine_chunks().to_numpy()
        isr = t["is_ref"].combine_chunks().to_numpy(zero_copy_only=False)
        ref_ids = np.unique(nid[isr])
        m = ~isr
        used = np.isin(nid[m], ref_ids)
        return pa.table({
            "cell": pa.array(cell[m]),
            "n": pa.array(np.ones(int(m.sum()), np.int64)),
            "u": pa.array(used.astype(np.int64))})

    marked = nodes.select_columns(["id", "lon", "lat"]) \
        .map_batches(node_rows, batch_format="pyarrow",
                     batch_size=65536) \
        .union(ways.select_columns(["refs"])
               .map_batches(ref_rows, batch_format="pyarrow",
                            batch_size=65536)) \
        .groupby("part") \
        .map_groups(lambda t: mark(t.drop_columns(["part"])),
                    batch_format="pyarrow")

    g = partial_groupby_agg(marked, ["cell"], [("n", "sum"), ("u", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_sum"].combine_chunks().to_numpy()
        u = t["u_sum"].combine_chunks().to_numpy()
        return pa.table({
            "cell": pc.cast(t["cell"], pa.int64()),
            "n_nodes": pa.array(n.astype(np.int64)),
            "n_way_nodes": pa.array(u.astype(np.int64)),
            "share6": pa.array(round_half_away(
                u.astype(np.float64) / n.astype(np.float64), 6),
                pa.float64())})

    return g.map_batches(finish, batch_format="pyarrow")


def cell_image_node_ratio(images: ray.data.Dataset,
                          nodes: ray.data.Dataset, res: int = 7
                          ) -> ray.data.Dataset:
    """(cell, n_images, n_nodes, ratio6): image density per OSM node
    per quadtree cell — the cross-layer coverage audit (cells rich in
    map features but starved of imagery are collection targets; the
    reverse flags geocoding drift). Cells with either layer empty
    report the other count with ratio 0.

    Scale plan: two point streams collapse to per-cell partials behind
    ONE shared bounded combiner exchange (union-tagged columns)."""
    from ..geo import tiles
    from ..relational import partial_groupby_agg
    from ..util import round_half_away

    def img_partial(t: pa.Table) -> pa.Table:
        t2 = decode_geotag(t)
        cell = tiles.cell_id(t2["lon"].combine_chunks().to_numpy(),
                             t2["lat"].combine_chunks().to_numpy(), res)
        return pa.table({"cell": pa.array(cell),
                         "i": pa.array(np.ones(len(cell), np.int64)),
                         "n": pa.array(np.zeros(len(cell), np.int64))})

    def node_partial(t: pa.Table) -> pa.Table:
        cell = tiles.cell_id(t["lon"].combine_chunks().to_numpy(),
                             t["lat"].combine_chunks().to_numpy(), res)
        return pa.table({"cell": pa.array(cell),
                         "i": pa.array(np.zeros(len(cell), np.int64)),
                         "n": pa.array(np.ones(len(cell), np.int64))})

    g = partial_groupby_agg(
        images.select_columns(["phash"])
        .map_batches(img_partial, batch_format="pyarrow",
                     batch_size=65536)
        .union(nodes.select_columns(["lon", "lat"])
               .map_batches(node_partial, batch_format="pyarrow",
                            batch_size=65536)),
        ["cell"], [("i", "sum"), ("n", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        i = t["i_sum"].combine_chunks().to_numpy()
        n = t["n_sum"].combine_chunks().to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            r = i.astype(np.float64) / n.astype(np.float64)
        r = np.where(n > 0, r, 0.0)
        return pa.table({
            "cell": pc.cast(t["cell"], pa.int64()),
            "n_images": pa.array(i.astype(np.int64)),
            "n_nodes": pa.array(n.astype(np.int64)),
            "ratio6": pa.array(round_half_away(r, 6), pa.float64())})

    return g.map_batches(finish, batch_format="pyarrow")
