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
from ray.data.aggregate import Count

from ..geo import s2 as s2geo
from ..geo.pip import PolygonIndex
from ..relational import broadcast_table
from ..stages.assign import decode_geotag
from .osm import join_refs_to_coords


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
                        grid_res: int = 12) -> PolygonIndex:
    """Materialize the polygon layer (closed ways ⨝ nodes, ring order) into
    a PolygonIndex.

    The per-way coordinate resolution is the distributed join
    (pipelines/osm.join_refs_to_coords); only the final small polygon layer
    (feature_id + vertex arrays) is collected, to be ray.put once and
    loaded by index actors. At cluster scale this layer is sharded by cell
    prefix and each actor loads only its shard (SURVEY §7.3) — the
    single-shard build here is the num_shards=1 case.
    """
    coords = join_refs_to_coords(closed_ways(ways), nodes)
    pdf = coords.to_pandas()
    pdf = pdf.sort_values(["way_id", "pos"])
    xs, ys, fids = [], [], []
    for wid, g in pdf.groupby("way_id", sort=True):
        fids.append(wid)
        xs.append(g["lon"].to_numpy())
        ys.append(g["lat"].to_numpy())
    return PolygonIndex(np.array(fids, np.int64), xs, ys, grid_res=grid_res)


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
             concurrency: int | tuple[int, int] = (2, 8),
             batch_size: int = 8192) -> ray.data.Dataset:
    """(image_id, feature_id) for every image point inside a polygon."""
    pts = images.map_batches(decode_geotag, batch_format="pyarrow")
    return pts.map_batches(PIPTagger, fn_constructor_args=(index_ref,),
                           batch_format="pyarrow", batch_size=batch_size,
                           concurrency=concurrency)


class NearestFeature:
    """Actor-pool stage: brute-force nearest feature per point against a
    broadcast (id, lon, lat) feature table, chunked to bound memory.

    Distance = squared euclidean in degrees, evaluated as
    ``(px-fx)*(px-fx) + (py-fy)*(py-fy)`` (same op order as the SQL
    oracle); ties broken toward the smallest feature id (features are
    scanned in ascending-id order with a strict '<' running min).
    At cluster scale this becomes per-cell-partition search with
    neighbor-ring expansion; brute force is the correctness baseline
    (SURVEY §2.5 J5).
    """

    def __init__(self, feats_ref: ray.ObjectRef, id_col: str = "image_id",
                 chunk: int = 8192):
        t: pa.Table = ray.get(feats_ref)
        fid = t["id"].to_numpy()
        order = np.argsort(fid, kind="stable")
        self.fid = fid[order]
        self.fx = t["lon"].to_numpy()[order]
        self.fy = t["lat"].to_numpy()[order]
        self.id_col = id_col
        self.chunk = chunk

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch["lon"].combine_chunks().to_numpy()
        py = batch["lat"].combine_chunks().to_numpy()
        n = len(px)
        best_d = np.full(n, np.inf)
        best_id = np.full(n, -1, np.int64)
        for s in range(0, len(self.fid), self.chunk):
            fx = self.fx[s:s + self.chunk]
            fy = self.fy[s:s + self.chunk]
            dx = px[:, None] - fx[None, :]
            dy = py[:, None] - fy[None, :]
            d2 = dx * dx + dy * dy
            j = np.argmin(d2, axis=1)
            dmin = d2[np.arange(n), j]
            upd = dmin < best_d  # strict: earlier (smaller-id) chunk wins ties
            best_d[upd] = dmin[upd]
            best_id[upd] = self.fid[s + j[upd]]
        return pa.table({
            self.id_col: batch[self.id_col].combine_chunks(),
            "feature_id": pa.array(best_id),
        })


def knn_nearest(images: ray.data.Dataset, feats_ref: ray.ObjectRef,
                concurrency: int | tuple[int, int] = (2, 8),
                batch_size: int = 4096) -> ray.data.Dataset:
    pts = images.map_batches(decode_geotag, batch_format="pyarrow")
    return pts.map_batches(NearestFeature, fn_constructor_args=(feats_ref,),
                           batch_format="pyarrow", batch_size=batch_size,
                           concurrency=concurrency)


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


def ann_topk(embeddings: ray.data.Dataset, queries_ref: ray.ObjectRef, k: int,
             concurrency: int | tuple[int, int] = (2, 8),
             batch_size: int = 4096) -> ray.data.Dataset:
    """Exact top-k cosine neighbors per broadcast query (brute-force
    baseline; per-batch partials merged by a small groupby)."""
    partials = embeddings.map_batches(TopKCosine, fn_constructor_args=(queries_ref, k),
                                      batch_format="pyarrow", batch_size=batch_size,
                                      concurrency=concurrency)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["query_id", "rank", "vec_id"]]
    return partials.groupby("query_id").map_groups(final, batch_format="pandas")


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
