"""Reference-semantics pipelines over the OSM-model tables, Ray-Data-first.

Each pipeline re-expresses a go-osm transform (SURVEY.md §2) as a lazy
Dataset graph; nothing materializes the big tables on the driver. Column
names are stable and match the DuckDB oracle SQL in __ray_entry__.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min

from .. import tags as tagops
from ..expr import Expression
from ..relational import broadcast_table, round_half_away, single_merge


def explode_refs(ways: ray.data.Dataset, keep_cols: tuple[str, ...] = ()) -> ray.data.Dataset:
    """ways(id, refs, ...) -> one row per (way_id, ref, pos).

    The columnar form of the way->node foreign-key walk at
    /root/reference/osm/Planet.go:214-225; duplicate closing refs are kept,
    matching ConvertWayToNode's unweighted mean over w.NodeReferences.
    """
    def fn(batch: pa.Table) -> pa.Table:
        refs = batch["refs"].combine_chunks()
        offsets = np.asarray(refs.offsets, dtype=np.int64)
        base = offsets[0]
        counts = np.diff(offsets)
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        flat = refs.flatten()
        cols = {
            "way_id": pc.take(batch["id"].combine_chunks(), pa.array(idx)),
            "ref": flat,
            "pos": pa.array(np.concatenate([np.arange(c, dtype=np.int64) for c in counts])
                            if len(counts) else np.empty(0, np.int64)),
        }
        for c in keep_cols:
            cols[c] = pc.take(batch[c].combine_chunks(), pa.array(idx))
        return pa.table(cols)
    return ways.map_batches(fn, batch_format="pyarrow")


def join_refs_to_coords(ways: ray.data.Dataset, nodes: ray.data.Dataset,
                        broadcast_nodes: bool = True) -> ray.data.Dataset:
    """(way_id, ref, pos, lon, lat): way refs resolved to coordinates.

    Strategy: broadcast the (id, lon, lat) lookup when the node table fits
    the object store comfortably (single ray.put, read per task — the
    distributed nodesIndex of /root/reference/osm/Planet.go:63); else a
    hash-partitioned Dataset.join keyed on node id.
    """
    exploded = explode_refs(ways)
    if broadcast_nodes:
        ref = broadcast_table(nodes, ["id", "lon", "lat"])

        def lookup(batch: pa.Table) -> pa.Table:
            lk = ray.get(ref)
            ids = lk["id"].to_numpy()
            order = np.argsort(ids, kind="stable")
            sorted_ids = ids[order]
            lon = lk["lon"].to_numpy()[order]
            lat = lk["lat"].to_numpy()[order]
            r = batch["ref"].combine_chunks().to_numpy()
            j = np.searchsorted(sorted_ids, r)
            j = np.clip(j, 0, len(sorted_ids) - 1)
            found = sorted_ids[j] == r
            if not found.all():
                # reference hard-errors on unseen refs (Planet.go:216-218);
                # we drop them and let the caller count (error-as-data).
                batch = batch.filter(pa.array(found))
                j = j[found]
            return (batch.append_column("lon", pa.array(lon[j]))
                         .append_column("lat", pa.array(lat[j])))
        return exploded.map_batches(lookup, batch_format="pyarrow")
    joined = exploded.join(nodes.select_columns(["id", "lon", "lat"]),
                           join_type="inner", num_partitions=16,
                           on=("ref",), right_on=("id",))
    return joined


def ways_to_nodes(nodes: ray.data.Dataset, ways: ray.data.Dataset,
                  max_all_id: int | None = None,
                  min_way_id: int | None = None,
                  node_shaped: bool = False,
                  broadcast_attrs: bool = True) -> ray.data.Dataset:
    """ways -> synthetic centroid nodes (/root/reference/osm/Planet.go:209-244).

    Centroid = unweighted mean of referenced node coords (closing duplicate
    ref INCLUDED, as the reference iterates raw NodeReferences). The way's
    element attrs are copied onto the new node. Synthetic ids: the
    reference allocates maxId + a running counter (Planet.go:99,111-112) —
    order-dependent and irreproducible under parallelism — so we assign
    the deterministic, shuffle-free equivalent
    ``new_id = max_all_id + 1 + (way_id - min_way_id)``.
    """
    if max_all_id is None or min_way_id is None:
        # one pass over ways for BOTH extremes (not two Dataset jobs)
        wagg = ways.aggregate(Max("id", alias_name="mx"),
                              Min("id", alias_name="mn"))
        if max_all_id is None:
            max_all_id = int(max(nodes.max("id"), wagg["mx"]))
        if min_way_id is None:
            min_way_id = int(wagg["mn"])
    coords = join_refs_to_coords(ways, nodes)

    # combiner before the exchange: per-block (way_id, sum, count)
    # partials shrink the 35-ref-per-way coordinate rows ~30x; the
    # surviving per-way partials merge in ONE guarded task (ways are the
    # small element class). At 10^12-element scale swap the single_merge
    # for groupby("way_id") over the same partial rows.
    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"way_id": t["way_id"], "slon": t["lon"],
                      "slat": t["lat"]}).group_by("way_id") \
            .aggregate([("slon", "sum"), ("slat", "sum"), ("slon", "count")])
        return g.rename_columns(["way_id", "slon", "slat", "pn"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("way_id").aggregate(
            [("slon", "sum"), ("slat", "sum"), ("pn", "sum")])
        g = g.rename_columns(["way_id", "slon", "slat", "n"])
        n = g["n"].combine_chunks().to_numpy().astype(np.float64)
        return pa.table({
            "way_id": g["way_id"],
            "lon_c": pa.array(g["slon"].combine_chunks().to_numpy() / n),
            "lat_c": pa.array(g["slat"].combine_chunks().to_numpy() / n),
            "n_refs": pc.cast(g["n"], pa.int64()),
        })

    cent = single_merge(coords.map_batches(partial, batch_format="pyarrow"),
                        merge)

    attr_cols = ["id", "version", "changeset", "uid", "user"]
    if node_shaped:  # full node schema for appending to a node output
        way_schema = ways.schema().names
        attr_cols += [c for c in ("ts", "tags") if c in way_schema]
    if not broadcast_attrs:
        # SCALE path: the way-attr table grows with the input, so attach
        # via the hash-partitioned join instead of a whole-table
        # broadcast (same rows; the gate sorts before hashing)
        from ..relational import hash_join
        joined = hash_join(cent, ways.select_columns(attr_cols),
                           on="way_id", right_on="id")
        def shape(batch: pa.Table) -> pa.Table:
            w = batch["way_id"].combine_chunks().to_numpy()
            new_id = max_all_id + 1 + (w - min_way_id)
            lon = round_half_away(batch["lon_c"].combine_chunks(), 7)
            lat = round_half_away(batch["lat_c"].combine_chunks(), 7)
            if node_shaped:
                return pa.table({
                    "id": pa.array(new_id),
                    "version": batch["version"],
                    "ts": batch["ts"] if "ts" in batch.column_names
                    else pa.nulls(len(w), pa.timestamp("us")),
                    "changeset": batch["changeset"],
                    "uid": batch["uid"], "user": batch["user"],
                    "lon": lon, "lat": lat,
                    "tags": batch["tags"] if "tags" in batch.column_names
                    else pa.nulls(len(w), pa.list_(pa.struct(
                        [("key", pa.string()), ("value", pa.string())]))),
                })
            return pa.table({
                "new_id": pa.array(new_id),
                "way_id": batch["way_id"].combine_chunks(),
                "lon_c": lon, "lat_c": lat,
                "n_refs": pc.cast(batch["n_refs"].combine_chunks(), pa.int64()),
                "version": batch["version"], "uid": batch["uid"],
                "user": batch["user"],
            })
        return joined.map_batches(shape, batch_format="pyarrow")
    attrs_ref = broadcast_table(ways, attr_cols)

    def attach(batch: pa.Table) -> pa.Table:
        at = ray.get(attrs_ref)
        ids = at["id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        sids = ids[order]
        w = batch["way_id"].combine_chunks().to_numpy()
        j = pa.array(order[np.searchsorted(sids, w)])
        new_id = max_all_id + 1 + (w - min_way_id)
        lon = round_half_away(batch["lon_c"].combine_chunks(), 7)
        lat = round_half_away(batch["lat_c"].combine_chunks(), 7)
        if node_shaped:
            # the way's attrs AND tags are copied onto the synthetic
            # node (Planet.ConvertWayToNode, Planet.go:209-244)
            return pa.table({
                "id": pa.array(new_id),
                "version": pc.take(at["version"], j),
                "ts": pc.take(at["ts"], j) if "ts" in at.column_names
                else pa.nulls(len(w), pa.timestamp("us")),
                "changeset": pc.take(at["changeset"], j),
                "uid": pc.take(at["uid"], j),
                "user": pc.take(at["user"], j),
                "lon": lon, "lat": lat,
                "tags": pc.take(at["tags"], j) if "tags" in at.column_names
                else pa.nulls(len(w), pa.list_(pa.struct(
                    [("key", pa.string()), ("value", pa.string())]))),
            })
        return pa.table({
            "new_id": pa.array(new_id),
            "way_id": batch["way_id"].combine_chunks(),
            "lon_c": lon,
            "lat_c": lat,
            "n_refs": pc.cast(batch["n_refs"].combine_chunks(), pa.int64()),
            "version": pc.take(at["version"], j),
            "uid": pc.take(at["uid"], j),
            "user": pc.take(at["user"], j),
        })
    return cent.map_batches(attach, batch_format="pyarrow")


def way_geometry(nodes: ray.data.Dataset, ways: ray.data.Dataset) -> ray.data.Dataset:
    """Way -> geometry kind (/root/reference/osm/Planet.go:59-78).

    Closed ring (first ref == last ref, >= 4 refs) -> 'polygon', else
    'line' — the corrected form of the reference's off-by-one closed-ring
    test (Planet.go:67 indexes coordinates[len], a latent panic; SURVEY
    §2.3 P9). Emits (way_id, kind, n_points, x0, y0).
    """
    from ..relational import broadcast_table
    from ..util import round_half_away as _rnd
    nodes_ref = broadcast_table(nodes, ["id", "lon", "lat"])

    # fully vectorized over the refs LIST column — kind and n_points are
    # offsets math, x0/y0 one broadcast lookup of the first ref; no
    # explode, no per-way groups (a per-way map_groups paid one
    # Ray+pandas call per way — 20k calls, ~5 s at sf0.1; this is ~0.5 s)
    def fn(batch: pa.Table) -> pa.Table:
        nt = ray.get(nodes_ref)
        nid = nt["id"].to_numpy()
        order = np.argsort(nid, kind="stable")
        nid_s = nid[order]
        refs = batch["refs"].combine_chunks()
        offsets = np.asarray(refs.offsets, np.int64)
        flat = refs.flatten().to_numpy()
        n = np.diff(offsets)
        first = flat[offsets[:-1].clip(max=max(len(flat) - 1, 0))]
        last = flat[(offsets[1:] - 1).clip(min=0)]
        closed = (n >= 4) & (first == last)
        # dangling first refs (routine in real OSM extracts) would index
        # past the node table or silently hit the wrong node — clip the
        # searchsorted result and DROP unresolvable ways, mirroring the
        # oracle's inner join on refs[1]
        jj = np.searchsorted(nid_s, first).clip(max=max(len(nid_s) - 1, 0))
        found = nid_s[jj] == first if len(nid_s) else np.zeros(len(first), bool)
        j = order[jj[found]]
        return pa.table({
            "way_id": batch["id"].combine_chunks().filter(pa.array(found)),
            "kind": pa.array(np.where(closed[found], "polygon", "line")),
            "n_points": pa.array(n[found], pa.int64()),
            "x0": pa.array(_rnd(nt["lon"].to_numpy()[j], 7)),
            "y0": pa.array(_rnd(nt["lat"].to_numpy()[j], 7)),
        })
    return ways.map_batches(fn, batch_format="pyarrow")


def way_geom_stats(nodes: ray.data.Dataset, ways: ray.data.Dataset) -> ray.data.Dataset:
    """Planar polygon metrics per closed way: shoelace area + ring
    perimeter (degree units, half-away-rounded to 9 decimals).

    The natural extension of the reference's way->geometry materialization
    (/root/reference/osm/Planet.go:59-78 stops at the coordinate list;
    area/length is what a consumer computes next). Physical plan mirrors
    ``way_geometry``: broadcast node table (ray.put once, read per actor),
    per-batch offsets math — the per-way segment sums are two cumsum
    differences over the flattened ref coordinates, no explode and no
    per-way Python. Ways with any unresolvable ref are dropped (mirrors
    the oracle's resolved = n_points guard).
    """
    from ..relational import broadcast_table
    from ..util import round_half_away as _rnd
    nodes_ref = broadcast_table(nodes, ["id", "lon", "lat"])

    def fn(batch: pa.Table) -> pa.Table:
        nt = ray.get(nodes_ref)
        nid = nt["id"].to_numpy()
        order = np.argsort(nid, kind="stable")
        nid_s = nid[order]
        nlon = nt["lon"].to_numpy()[order]
        nlat = nt["lat"].to_numpy()[order]

        refs = batch["refs"].combine_chunks()
        offsets = np.asarray(refs.offsets, np.int64)
        flat = refs.flatten().to_numpy()
        n = np.diff(offsets)
        first = flat[offsets[:-1].clip(max=max(len(flat) - 1, 0))]
        last = flat[(offsets[1:] - 1).clip(min=0)]
        closed = (n >= 4) & (first == last)

        jj = np.searchsorted(nid_s, flat).clip(max=max(len(nid_s) - 1, 0))
        found = nid_s[jj] == flat if len(nid_s) else np.zeros(len(flat), bool)
        # a way is kept iff closed AND every ref resolved
        nf = np.add.reduceat(found.astype(np.int64), offsets[:-1]) \
            if len(flat) else np.zeros(0, np.int64)
        keep = closed & (nf == n)

        x = np.where(found, nlon[jj], 0.0)
        y = np.where(found, nlat[jj], 0.0)
        # consecutive-pair contributions over the flat arrays; sums taken
        # per way via prefix-sum differences so way boundaries never mix
        # (the last in-way index offsets[k+1]-1 has no successor segment)
        if len(flat) >= 2:
            cross = x[:-1] * y[1:] - x[1:] * y[:-1]
            seg = np.sqrt((x[1:] - x[:-1]) ** 2 + (y[1:] - y[:-1]) ** 2)
        else:
            cross = seg = np.zeros(0, np.float64)
        pc_ = np.concatenate([[0.0], np.cumsum(cross)])
        pl_ = np.concatenate([[0.0], np.cumsum(seg)])
        lo = offsets[:-1].clip(max=max(len(cross), 0))
        hi = (offsets[1:] - 1).clip(min=0, max=max(len(cross), 0))
        a2 = pc_[hi] - pc_[lo]
        pl = pl_[hi] - pl_[lo]
        return pa.table({
            "way_id": batch["id"].combine_chunks().filter(pa.array(keep)),
            "n_points": pa.array(n[keep], pa.int64()),
            "area9": pa.array(_rnd(np.abs(a2[keep]) / 2.0, 9)),
            "perim9": pa.array(_rnd(pl[keep], 9)),
        })
    return ways.map_batches(fn, batch_format="pyarrow")


EARTH_R_M = 6371000.0  # sphere radius shared with the SQL mirror


def way_length_m(nodes: ray.data.Dataset,
                 ways: ray.data.Dataset) -> ray.data.Dataset:
    """Geodesic (haversine, sphere radius EARTH_R_M) length per way in
    meters — lines and rings alike; the metric consumers actually want
    where way_geom_stats' planar degrees are unit-checking. Same
    broadcast-node + cumsum-difference plan; per-segment haversine is
    one vectorized expression whose exact op order is mirrored in the
    SQL oracle (sub-ulp libm drift vanishes under the millimeter
    rounding). Emits (way_id, n_points, closed, len_m3)."""
    from ..relational import broadcast_table
    from ..util import round_half_away as _rnd
    nodes_ref = broadcast_table(nodes, ["id", "lon", "lat"])
    d2r = np.pi / 180.0

    def fn(batch: pa.Table) -> pa.Table:
        nt = ray.get(nodes_ref)
        nid = nt["id"].to_numpy()
        order = np.argsort(nid, kind="stable")
        nid_s = nid[order]
        nlon = nt["lon"].to_numpy()[order]
        nlat = nt["lat"].to_numpy()[order]

        refs = batch["refs"].combine_chunks()
        offsets = np.asarray(refs.offsets, np.int64)
        flat = refs.flatten().to_numpy()
        n = np.diff(offsets)
        first = flat[offsets[:-1].clip(max=max(len(flat) - 1, 0))]
        last = flat[(offsets[1:] - 1).clip(min=0)]
        closed = (n >= 4) & (first == last)

        jj = np.searchsorted(nid_s, flat).clip(max=max(len(nid_s) - 1, 0))
        found = nid_s[jj] == flat if len(nid_s) else np.zeros(len(flat), bool)
        nf = np.add.reduceat(found.astype(np.int64), offsets[:-1]) \
            if len(flat) else np.zeros(0, np.int64)
        keep = (n >= 2) & (nf == n)

        x = np.where(found, nlon[jj], 0.0)
        y = np.where(found, nlat[jj], 0.0)
        if len(flat) >= 2:
            p1 = y[:-1] * d2r
            p2 = y[1:] * d2r
            sdp = np.sin((p2 - p1) / 2.0)
            sdl = np.sin((x[1:] - x[:-1]) * d2r / 2.0)
            a = np.minimum(sdp * sdp + np.cos(p1) * np.cos(p2) * sdl * sdl,
                           1.0)
            seg = 2.0 * EARTH_R_M * np.arcsin(np.sqrt(a))
        else:
            seg = np.zeros(0, np.float64)
        ps = np.concatenate([[0.0], np.cumsum(seg)])
        lo = offsets[:-1].clip(max=max(len(seg), 0))
        hi = (offsets[1:] - 1).clip(min=0, max=max(len(seg), 0))
        ln = ps[hi] - ps[lo]
        return pa.table({
            "way_id": batch["id"].combine_chunks().filter(pa.array(keep)),
            "n_points": pa.array(n[keep], pa.int64()),
            "closed": pa.array(closed[keep]),
            "len_m3": pa.array(_rnd(ln[keep], 3)),
        })
    return ways.map_batches(fn, batch_format="pyarrow")


SIMPLIFY_EPS = 0.003  # degrees; shared with the pyoracle scalar reference


def _dp_keep_mask(x: np.ndarray, y: np.ndarray, eps2: float) -> np.ndarray:
    """Douglas-Peucker kept-point mask (iterative, first-max tie rule).

    Distances use the point-to-SEGMENT form (not the infinite chord) so
    closed rings — whose top-level chord is degenerate because first ==
    last — simplify sanely. The per-split scan is one vectorized numpy
    expression over the span; only the split recursion is a Python stack,
    bounded by the way's point count."""
    n = len(x)
    keep = np.zeros(n, bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        ax, ay, bx, by = x[i], y[i], x[j], y[j]
        dx, dy = bx - ax, by - ay
        L2 = dx * dx + dy * dy
        px, py = x[i + 1:j], y[i + 1:j]
        if L2 == 0.0:
            d2 = (px - ax) * (px - ax) + (py - ay) * (py - ay)
        else:
            t = np.clip(((px - ax) * dx + (py - ay) * dy) / L2, 0.0, 1.0)
            qx, qy = ax + t * dx, ay + t * dy
            d2 = (px - qx) * (px - qx) + (py - qy) * (py - qy)
        k = int(np.argmax(d2))
        if d2[k] > eps2:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return keep


def simplify_ways(nodes: ray.data.Dataset, ways: ray.data.Dataset,
                  eps: float = SIMPLIFY_EPS) -> ray.data.Dataset:
    """Douglas-Peucker simplification per way (planar degree tolerance).

    Emits (way_id, n_points, n_kept, kept_seq_sum) where kept_seq_sum is
    the sum of kept 0-based positions — an integer checksum of WHICH
    points survived, immune to float formatting drift. Ways with any
    unresolvable ref are dropped (way_geom_stats semantics); ways with
    < 3 points pass through unchanged (endpoints always kept).

    Parallelism is across ways (map_batches over the broadcast node
    table); within a way the split scan is vectorized and the recursion
    depth is bounded by the way's own point count, so per-task cost is
    O(points^2) worst case on a ~1e1-point way — negligible next to the
    batch's resolve step."""
    from ..relational import broadcast_table
    nodes_ref = broadcast_table(nodes, ["id", "lon", "lat"])
    eps2 = float(eps) * float(eps)

    def fn(batch: pa.Table) -> pa.Table:
        nt = ray.get(nodes_ref)
        nid = nt["id"].to_numpy()
        order = np.argsort(nid, kind="stable")
        nid_s = nid[order]
        nlon = nt["lon"].to_numpy()[order]
        nlat = nt["lat"].to_numpy()[order]

        refs = batch["refs"].combine_chunks()
        offsets = np.asarray(refs.offsets, np.int64)
        flat = refs.flatten().to_numpy()
        n = np.diff(offsets)
        jj = np.searchsorted(nid_s, flat).clip(max=max(len(nid_s) - 1, 0))
        found = nid_s[jj] == flat if len(nid_s) else np.zeros(len(flat), bool)
        nf = np.add.reduceat(found.astype(np.int64), offsets[:-1]) \
            if len(flat) else np.zeros(0, np.int64)
        keep_way = (n >= 2) & (nf == n)

        x_all = np.where(found, nlon[jj], 0.0)
        y_all = np.where(found, nlat[jj], 0.0)
        wid = batch["id"].combine_chunks().to_numpy()
        out_id, out_np, out_nk, out_ss = [], [], [], []
        for w in np.flatnonzero(keep_way):
            lo, hi = offsets[w], offsets[w + 1]
            m = _dp_keep_mask(x_all[lo:hi], y_all[lo:hi], eps2)
            out_id.append(wid[w])
            out_np.append(int(hi - lo))
            out_nk.append(int(m.sum()))
            out_ss.append(int(np.flatnonzero(m).sum()))
        return pa.table({
            "way_id": pa.array(out_id, pa.int64()),
            "n_points": pa.array(out_np, pa.int64()),
            "n_kept": pa.array(out_nk, pa.int64()),
            "kept_seq_sum": pa.array(out_ss, pa.int64()),
        })
    return ways.map_batches(fn, batch_format="pyarrow")


def semi_join_retention(nodes: ray.data.Dataset, ways: ray.data.Dataset,
                        expression: str) -> ray.data.Dataset:
    """The J2 retention rule (/root/reference/osm/MarshalPlanet.go:100-141):
    a node is written iff it passes the filter itself OR is referenced by
    any way that passed the filter (reference bypasses node filters for
    referenced nodes). Returns the distinct kept node ids.
    """
    from ..relational import partitioned_distinct
    e = Expression(expression)
    kept_ways = ways.map_batches(lambda t: e.filter(t), batch_format="pyarrow")
    ref_ids = explode_refs(kept_ways).select_columns(["ref"]) \
        .map_batches(lambda t: t.rename_columns(["id"]), batch_format="pyarrow")
    pass_nodes = nodes.map_batches(lambda t: e.filter(t), batch_format="pyarrow") \
        .select_columns(["id"])
    # block-distinct combiner -> bounded hash exchange -> per-partition
    # unique (Ray's per-key groupby paid per-group overhead on the
    # unbounded id space)
    return partitioned_distinct(ref_ids.union(pass_nodes), "id")


def shared_node_star_edges(ways: ray.data.Dataset,
                           num_parts: int = 32) -> ray.data.Dataset:
    """(a, b) edges of the way graph: per shared node ref, every sharing
    way connects to the ref group's MINIMUM way id — k-1 star edges per
    k-way node, never k^2 (the hot-bucket cap applied to graph build).
    Connectivity-equivalent to the full pairwise clique per node."""
    from ..relational import hash_part

    exploded = explode_refs(ways).select_columns(["way_id", "ref"])

    def part_by_ref(t: pa.Table) -> pa.Table:
        r = t["ref"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(r, num_parts)))

    def star_edges(t: pa.Table) -> pa.Table:
        r = t["ref"].combine_chunks().to_numpy()
        w = t["way_id"].combine_chunks().to_numpy()
        order = np.lexsort((w, r))
        r, w = r[order], w[order]
        if len(r):
            keep = np.ones(len(r), bool)
            keep[1:] = (r[1:] != r[:-1]) | (w[1:] != w[:-1])
            r, w = r[keep], w[keep]
        starts = np.flatnonzero(np.r_[True, r[1:] != r[:-1]]) \
            if len(r) else np.empty(0, np.int64)
        counts = np.diff(np.r_[starts, len(r)]) if len(r) else np.empty(0, np.int64)
        hub = np.repeat(w[starts], counts)   # min way id per ref group
        m = hub != w                         # drop the hub's self row
        a, b = hub[m], w[m]
        if len(a):  # distinct (a, b) within the partition
            key = np.lexsort((b, a))
            a, b = a[key], b[key]
            keep = np.ones(len(a), bool)
            keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            a, b = a[keep], b[keep]
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    return exploded.map_batches(part_by_ref, batch_format="pyarrow") \
        .groupby("part").map_groups(star_edges, batch_format="pyarrow")


def way_components(ways: ray.data.Dataset,
                   num_parts: int = 32) -> ray.data.Dataset:
    """Connected components of the way graph (ways joined by any shared
    node ref): (way_id, component_id = min way id in the component) —
    the road-network/ring-assembly grouping every OSM consumer builds
    on top of the reference's way/node model.

    Scale shape: the shared-node edge list is generated as STAR edges —
    per ref, every sharing way connects to the group's minimum way id —
    so a node shared by k ways emits k-1 edges, never k^2 (the hot-bucket
    cap lesson applied to graph building). Edges co-partition by ref
    hash; components run on the static-edge pointer-jumping BSP
    (pipelines.text.min_label_components_static: edges shard to disk
    once, each round shuffles ONLY labels, convergence in O(log
    diameter) rounds — road networks are exactly the deep-chain graphs
    one-hop propagation cannot finish). Self-edges from every way keep
    isolated ways in the output with their own id as the component.
    """
    from .text import min_label_components_static

    edges = shared_node_star_edges(ways, num_parts)

    def self_edges(t: pa.Table) -> pa.Table:
        w = t["id"].combine_chunks()
        return pa.table({"a": w, "b": w})

    # no materialize: the BSP runner consumes the pair graph exactly ONCE
    # (the shard-build exchange); node universe comes from the shards
    pairs = edges.union(ways.select_columns(["id"])
                        .map_batches(self_edges, batch_format="pyarrow"))
    comps = min_label_components_static(pairs, num_parts=num_parts)
    return comps.map_batches(
        lambda t: t.rename_columns(["way_id", "component_id"]),
        batch_format="pyarrow")


PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 10


def way_pagerank(ways: ray.data.Dataset, damping: float = PAGERANK_DAMPING,
                 iters: int = PAGERANK_ITERS,
                 num_parts: int = 8) -> ray.data.Dataset:
    """PageRank over the TRUE shared-node way graph — the deduped full
    pairwise (a < b) edge set way_components' SQL oracle defines: two
    ways are adjacent iff they share >= 1 node, and deg is the count of
    distinct adjacent ways.  (Rounds 1-4 ranked the k-1 star-reduced
    proxy, which is connectivity-equivalent but NOT rank-equivalent —
    VERDICT r4 next #4; the star reduction remains the documented fast
    path for connectivity-only callers like way_components.)  Per-node
    emission is quadratic in the k ways sharing it — the way_triangles
    hot-node cap discussion applies at planet scale, and the same
    full_shared_node_edges build already feeds triangles / k-core /
    jaccard / adamic-adar.

    Physical plan: full_shared_node_edges (clique pairs per ref group,
    partition dedup, one hash(a) exchange for GLOBAL dedup — parallel
    edges are idempotent for min-label but WRONG for rank sums, so the
    global dedup is load-bearing) -> both-direction edge shards +
    way-id node markers written once (shard_static_edges) -> resident
    BSP actors (state.bsp._PageRankPart): degree is counted locally
    from the shard, each of the ``iters`` rounds is one actor RPC
    exchanging only (dst, pr/deg) contribution payloads through the
    object store.  Isolated ways (no shared node) hold the dangling
    rank (1-d)/N throughout; dangling mass is not redistributed
    (documented simplification, mirrored exactly by the scalar
    oracle). Emits (way_id, deg, pr9)."""
    from ..state.bsp import run_pagerank
    from .text import shard_static_edges

    pairs = full_shared_node_edges(ways, num_parts)
    d, has_shard, owned = shard_static_edges(
        pairs, num_parts, extra_nodes=ways.select_columns(["id"]))
    return run_pagerank(d, has_shard, num_parts, iters, damping,
                        cleanup=owned)


BFS_SEED_MOD = 41
BFS_MAX_DEPTH = 16


def way_bfs_depth(ways: ray.data.Dataset, seed_mod: int = BFS_SEED_MOD,
                  max_depth: int = BFS_MAX_DEPTH,
                  num_parts: int = 8) -> ray.data.Dataset:
    """(way_id, depth): minimum hop distance from the seed ways (id %
    seed_mod == 0) over the TRUE shared-node way graph, capped at
    ``max_depth`` hops; unreached ways are dropped.

    Distances run on the BIPARTITE way<->ref graph (way node 2*id, ref
    node 2*ref+1): a node shared by k ways contributes k edges — never
    the k^2 pairwise clique, and unlike the star reduction
    way_components uses for connectivity, bipartite distance/2 IS the
    exact shared-node hop count (the star hub would distort path
    lengths). Same static-shard BSP as components/pagerank: edges shard
    once, each round exchanges only frontier (node, dist) messages, and
    the round count is bounded by 2 x max_depth."""
    from ..state.bsp import run_bfs
    from .text import shard_static_edges

    def bipartite(t: pa.Table) -> pa.Table:
        w = t["way_id"].combine_chunks().to_numpy()
        r = t["ref"].combine_chunks().to_numpy()
        return pa.table({"a": pa.array(w * 2),
                         "b": pa.array(r * 2 + 1)})

    pairs = explode_refs(ways).select_columns(["way_id", "ref"]) \
        .map_batches(bipartite, batch_format="pyarrow")
    d, has_shard, owned = shard_static_edges(pairs, num_parts)
    return run_bfs(d, has_shard, num_parts, max_rounds=2 * max_depth,
                   seed_mod=seed_mod, cleanup=owned)


def ref_degree(ways: ray.data.Dataset, min_degree: int = 2) -> ray.data.Dataset:
    """(id, n_refs_to) for node ids referenced >= min_degree times across all
    ways — duplicate detection as data (vs error-on-dup ingest,
    /root/reference/osm/Planet.go:160-163). Physical plan: per-block
    partial counts (combiner) -> bounded hash-partition exchange -> one
    Acero merge per partition (no per-key Ray aggregate)."""
    from ..relational import hash_part

    def partial(t: pa.Table) -> pa.Table:
        ref, n = np.unique(t["ref"].combine_chunks().to_numpy(),
                           return_counts=True)
        return pa.table({"id": pa.array(ref),
                         "pn": pa.array(n.astype(np.int64)),
                         "part": pa.array(hash_part(ref, 32))})

    def merge(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by("id").aggregate([("pn", "sum")])
        g = g.rename_columns(["id", "n_refs_to"])
        return g.filter(pc.greater_equal(g["n_refs_to"],
                                         pa.scalar(min_degree, pa.int64())))

    return explode_refs(ways).select_columns(["ref"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("part").map_groups(merge, batch_format="pyarrow")


def summarize(nodes: ray.data.Dataset, ways: ray.data.Dataset,
              relations: ray.data.Dataset) -> pd.DataFrame:
    """Dataset summary (/root/reference/osm/Planet.go:497-520, Summary.go:8-40):
    element counts, distinct users, distinct tag keys, distinct key=value
    pairs, bounding box. The bbox is RECOMPUTED from node coords (the
    reference passes through the input header, UnmarshalPlanet.go:64-69 —
    documented improvement).

    ONE streaming pass: every block emits a small partial-summary table
    (block count, block-distinct kv pairs and uids, block bbox) and a
    single task merges them — the combiner pattern (SURVEY §4): distinct
    sets shrink to the bounded tag/user vocabulary per block, so the
    merge input stays tiny at any input scale.
    """
    def partial_of(name: str, has_geo: bool):
        def fn(batch: pa.Table) -> pa.Table:
            kind, s1, s2, f1, f2 = [], [], [], [], []
            _, ks, vs = tagops.explode_keys(batch["tags"])
            if len(ks):
                kv = pa.table({"k": ks, "v": vs}).group_by(["k", "v"]) \
                       .aggregate([])
                kind += ["kv"] * len(kv)
                s1 += kv["k"].to_pylist()
                s2 += kv["v"].to_pylist()
                f1 += [0.0] * len(kv)
                f2 += [0.0] * len(kv)
            for u in np.unique(batch["uid"].combine_chunks().to_numpy()):
                kind.append("uid"); s1.append(str(u)); s2.append("")
                f1.append(0.0); f2.append(0.0)
            kind.append("count"); s1.append(name); s2.append("")
            f1.append(float(len(batch))); f2.append(0.0)
            if has_geo and len(batch):
                lon = batch["lon"].combine_chunks().to_numpy()
                lat = batch["lat"].combine_chunks().to_numpy()
                kind += ["bbox_min", "bbox_max"]; s1 += ["", ""]; s2 += ["", ""]
                f1 += [float(lon.min()), float(lon.max())]
                f2 += [float(lat.min()), float(lat.max())]
            return pa.table({"kind": pa.array(kind, pa.string()),
                             "s1": pa.array(s1, pa.string()),
                             "s2": pa.array(s2, pa.string()),
                             "f1": pa.array(f1, pa.float64()),
                             "f2": pa.array(f2, pa.float64())})
        return fn

    partials = (nodes.map_batches(partial_of("nodes", True), batch_format="pyarrow")
                .union(ways.map_batches(partial_of("ways", False), batch_format="pyarrow"))
                .union(relations.map_batches(partial_of("relations", False),
                                             batch_format="pyarrow")))

    from ..util import round_half_away as _rnd

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        counts = df[df["kind"] == "count"].groupby("s1")["f1"].sum()
        kv = df[df["kind"] == "kv"]
        kv_u = kv.drop_duplicates(["s1", "s2"])
        users = df[df["kind"] == "uid"]["s1"].nunique()
        mins = df[df["kind"] == "bbox_min"]
        maxs = df[df["kind"] == "bbox_max"]
        return pd.DataFrame({
            "n_nodes": [np.int64(counts.get("nodes", 0))],
            "n_ways": [np.int64(counts.get("ways", 0))],
            "n_relations": [np.int64(counts.get("relations", 0))],
            "n_users": [np.int64(users)],
            "n_keys": [np.int64(kv_u["s1"].nunique())],
            "n_tags": [np.int64(len(kv_u))],
            "min_lon": [_rnd(mins["f1"].min(), 7)],
            "min_lat": [_rnd(mins["f2"].min(), 7)],
            "max_lon": [_rnd(maxs["f1"].max(), 7)],
            "max_lat": [_rnd(maxs["f2"].max(), 7)],
        })

    return merge(partials.to_pandas())


def format_summary(s: pd.DataFrame) -> str:
    """Render the summary in the reference's printed contract
    (osm/Summary.go:25-40; worked example /root/reference/README.md:92-99):
    ``Bounding Box: minlon,minlat,maxlon,maxlat`` then per-class counts."""
    r = s.iloc[0]
    return "\n".join([
        f"Bounding Box: {r.min_lon:.6f},{r.min_lat:.6f},"
        f"{r.max_lon:.6f},{r.max_lat:.6f}",
        f"Number of users: {int(r.n_users)}",
        f"Number of nodes: {int(r.n_nodes)}",
        f"Number of ways: {int(r.n_ways)}",
        f"Number of relations: {int(r.n_relations)}",
        f"Number of keys: {int(r.n_keys)}",
        f"Number of tags: {int(r.n_tags)}",
    ])


def per_key_counts(nodes: ray.data.Dataset, ways: ray.data.Dataset,
                   relations: ray.data.Dataset, keys: list[str]) -> pd.DataFrame:
    """-summarize_keys (/root/reference/osm/Planet.go:418-453): per requested
    key, how many nodes/ways/relations carry it."""
    keyset = list(keys)

    def count_table(ds: ray.data.Dataset) -> pd.DataFrame:
        def fn(batch: pa.Table) -> pa.Table:
            # combiner: one partial row per requested key per block, so
            # the groupby exchange moves O(keys x blocks) rows, never one
            # row per tag occurrence
            _, ks, _ = tagops.explode_keys(batch["tags"])
            m = pc.is_in(ks, value_set=pa.array(keyset, pa.string()))
            g = pa.table({"key": ks.filter(m)}).group_by("key") \
                .aggregate([([], "count_all")])
            return g.rename_columns(["key", "pn"])
        from ray.data.aggregate import Sum
        agg = ds.map_batches(fn, batch_format="pyarrow") \
                .groupby("key").aggregate(Sum("pn", alias_name="n"))
        df = agg.to_pandas()
        if "key" not in df.columns:  # empty element class -> no schema
            df = pd.DataFrame({"key": pd.Series([], dtype=str),
                               "n": pd.Series([], dtype=np.int64)})
        return df

    out = pd.DataFrame({"key": sorted(keyset)})
    for name, ds in (("nodes_n", nodes), ("ways_n", ways), ("rels_n", relations)):
        c = count_table(ds).rename(columns={"n": name})
        out = out.merge(c, on="key", how="left")
    for c in ("nodes_n", "ways_n", "rels_n"):
        out[c] = out[c].fillna(0).astype(np.int64)
    return out


def relation_multipolygons(relations: ray.data.Dataset,
                           ways: ray.data.Dataset,
                           nodes: ray.data.Dataset,
                           num_parts: int = 32) -> ray.data.Dataset:
    """Multipolygon assembly from relation way-members — the one OSM
    capability real consumers want that the reference never built: it
    parses members (/root/reference/osm/Relation.go:13-16) but resolves
    them nowhere (SURVEY §1.2; VERDICT r3 next-#9).

    Semantics (mirrored exactly by the scalar pyoracle):
    - way members only; role 'inner' -> inner pool, anything else
      (incl. the OSM-conventional empty role) -> outer pool; (way, role)
      pairs deduped per relation.
    - rings stitch by matching endpoint NODE REFS: start from the unused
      way with the smallest id; extend the chain's tail with the
      smallest-id unused way sharing that endpoint (forward match
      preferred over reversed); a chain that returns to its start with
      >= 4 points (closing repeat included) is a ring, anything stuck or
      shorter counts in n_open.
    - ring area = |fsum(x_i*y_{i+1} - x_{i+1}*y_i)| / 2 in squared
      degrees; area6 = round_half_away(fsum(outer) - fsum(inner), 6).
      math.fsum is exactly rounded, so engine and oracle agree
      bit-for-bit regardless of accumulation order (the way_simplify
      float-parity lesson, generalized).

    Physical plan (one broadcast + two exchanges): the relation
    membership table is the SMALL side (relations are ~1% of way volume
    on real OSM) and broadcasts once; ways semi-join against it at the
    read so only member ways' coordinates resolve (prune-at-read);
    resolved coordinate rows exchange ONCE by hash(way_id) to pack one
    (refs, xs, ys) row per way, replicate per owning relation, and
    exchange ONCE by hash(rel_id); the stitch kernel loops python only
    across a single relation's member ways. Emits (relation_id, n_outer,
    n_inner, n_open, area6)."""
    import math

    from ..relational import broadcast_table, hash_part
    from ..util import round_half_away

    def explode_members(t: pa.Table) -> pa.Table:
        mem = t["members"].combine_chunks()
        offs = np.asarray(mem.offsets, np.int64)
        offs = offs - offs[0]
        counts = np.diff(offs)
        idx = np.repeat(np.arange(len(t), dtype=np.int64), counts)
        flat = mem.flatten()
        rel = pc.take(t["id"].combine_chunks(), pa.array(idx))
        typ = flat.field("type")
        is_way = pc.equal(typ, "way")
        inner = pc.equal(flat.field("role"), "inner")
        out = pa.table({
            "rel_id": rel,
            "way_ref": flat.field("ref"),
            "inner": inner,
        }).filter(is_way)
        return out

    members = relations.select_columns(["id", "members"]) \
        .map_batches(explode_members, batch_format="pyarrow")
    mem_ref = broadcast_table(members, ["rel_id", "way_ref", "inner"])

    state: dict = {}

    def member_ways_only(t: pa.Table) -> pa.Table:
        if "wset" not in state:
            state["wset"] = np.unique(
                ray.get(mem_ref)["way_ref"].to_numpy())
        wids = t["id"].combine_chunks().to_numpy()
        j = np.searchsorted(state["wset"], wids) \
            .clip(max=max(len(state["wset"]) - 1, 0))
        keep = state["wset"][j] == wids if len(state["wset"]) else \
            np.zeros(len(wids), bool)
        return t.filter(pa.array(keep))

    coords = join_refs_to_coords(
        ways.map_batches(member_ways_only, batch_format="pyarrow"), nodes)

    def part_by_way(t: pa.Table) -> pa.Table:
        w = t["way_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(w, num_parts)))

    def pack_and_assign(t: pa.Table) -> pa.Table:
        """One (refs, xs, ys) row per (relation, member way, role)."""
        mem = ray.get(mem_ref)
        m_rel = mem["rel_id"].to_numpy()
        m_way = mem["way_ref"].to_numpy()
        m_inner = mem["inner"].to_numpy(zero_copy_only=False)
        wid = t["way_id"].combine_chunks().to_numpy()
        order = np.lexsort((t["pos"].combine_chunks().to_numpy(), wid))
        wid_s = wid[order]
        ref_s = t["ref"].combine_chunks().to_numpy()[order]
        lon_s = t["lon"].combine_chunks().to_numpy()[order]
        lat_s = t["lat"].combine_chunks().to_numpy()[order]
        uw, starts = np.unique(wid_s, return_index=True)
        bounds = np.append(starts, len(wid_s))
        rows = {"rel_id": [], "inner": [], "way_id": [],
                "refs": [], "xs": [], "ys": [], "part": []}
        j = np.searchsorted(uw, m_way).clip(max=max(len(uw) - 1, 0))
        hit = uw[j] == m_way if len(uw) else np.zeros(len(m_way), bool)
        parts = hash_part(m_rel, num_parts)
        for mi in np.flatnonzero(hit):
            s, e = int(bounds[j[mi]]), int(bounds[j[mi] + 1])
            rows["rel_id"].append(int(m_rel[mi]))
            rows["inner"].append(bool(m_inner[mi]))
            rows["way_id"].append(int(m_way[mi]))
            rows["refs"].append(ref_s[s:e].tolist())
            rows["xs"].append(lon_s[s:e].tolist())
            rows["ys"].append(lat_s[s:e].tolist())
            rows["part"].append(int(parts[mi]))
        return pa.table({
            "rel_id": pa.array(rows["rel_id"], pa.int64()),
            "inner": pa.array(rows["inner"], pa.bool_()),
            "way_id": pa.array(rows["way_id"], pa.int64()),
            "refs": pa.array(rows["refs"], pa.list_(pa.int64())),
            "xs": pa.array(rows["xs"], pa.list_(pa.float64())),
            "ys": pa.array(rows["ys"], pa.list_(pa.float64())),
            "part": pa.array(rows["part"], pa.int64()),
        })

    packed = coords.map_batches(part_by_way, batch_format="pyarrow") \
        .groupby("part").map_groups(pack_and_assign, batch_format="pyarrow")

    def stitch_pool(pool: list[tuple[int, list, list, list]]):
        """(n_rings, n_open, ring areas) for one role pool; ways sorted
        by id, (way, role) already deduped."""
        used = [False] * len(pool)
        rings, n_open, areas = 0, 0, []
        for i in range(len(pool)):
            if used[i]:
                continue
            used[i] = True
            refs = list(pool[i][1])
            xs = list(pool[i][2])
            ys = list(pool[i][3])
            while len(refs) >= 2 and refs[0] != refs[-1]:
                nxt, rev = -1, False
                for k in range(len(pool)):
                    if used[k] or len(pool[k][1]) < 2:
                        continue
                    if pool[k][1][0] == refs[-1]:
                        nxt, rev = k, False
                        break
                    if pool[k][1][-1] == refs[-1]:
                        nxt, rev = k, True
                        break
                if nxt < 0:
                    break
                used[nxt] = True
                r2, x2, y2 = pool[nxt][1], pool[nxt][2], pool[nxt][3]
                if rev:
                    r2, x2, y2 = r2[::-1], x2[::-1], y2[::-1]
                refs.extend(r2[1:])
                xs.extend(x2[1:])
                ys.extend(y2[1:])
            if len(refs) >= 4 and refs[0] == refs[-1]:
                rings += 1
                areas.append(abs(math.fsum(
                    xs[k] * ys[k + 1] - xs[k + 1] * ys[k]
                    for k in range(len(xs) - 1))) / 2.0)
            else:
                n_open += 1
        return rings, n_open, areas

    def stitch(t: pa.Table) -> pa.Table:
        rel = t["rel_id"].combine_chunks().to_numpy()
        order = np.argsort(rel, kind="stable")
        rel_s = rel[order]
        inner = t["inner"].combine_chunks().to_numpy(
            zero_copy_only=False)[order]
        wid = t["way_id"].combine_chunks().to_numpy()[order]
        refs = t["refs"].to_pylist()
        xs = t["xs"].to_pylist()
        ys = t["ys"].to_pylist()
        urel, starts = np.unique(rel_s, return_index=True)
        bounds = np.append(starts, len(rel_s))
        out = {"relation_id": [], "n_outer": [], "n_inner": [],
               "n_open": [], "area6": []}
        for i, r in enumerate(urel):
            s, e = int(bounds[i]), int(bounds[i + 1])
            pools: dict[bool, dict[int, tuple]] = {False: {}, True: {}}
            for k in range(s, e):
                oi = order[k]
                pools[bool(inner[k])].setdefault(
                    int(wid[k]), (int(wid[k]), refs[oi], xs[oi], ys[oi]))
            res = {}
            for role in (False, True):
                pool = [pools[role][w] for w in sorted(pools[role])]
                res[role] = stitch_pool(pool)
            area = math.fsum(res[False][2]) - math.fsum(res[True][2])
            out["relation_id"].append(int(r))
            out["n_outer"].append(res[False][0])
            out["n_inner"].append(res[True][0])
            out["n_open"].append(res[False][1] + res[True][1])
            out["area6"].append(float(round_half_away(
                np.array([area]), 6)[0]))
        return pa.table({
            "relation_id": pa.array(out["relation_id"], pa.int64()),
            "n_outer": pa.array(out["n_outer"], pa.int64()),
            "n_inner": pa.array(out["n_inner"], pa.int64()),
            "n_open": pa.array(out["n_open"], pa.int64()),
            "area6": pa.array(out["area6"], pa.float64()),
        })

    return packed.groupby("part").map_groups(stitch,
                                             batch_format="pyarrow")


# ------------------------------------------------------- changeset merge

DIFF_MODIFY_EVERY = 50
DIFF_DELETE_EVERY = 97
DIFF_CREATE_EVERY = 131
DIFF_CREATE_OFFSET = 10_000_000
DIFF_LON_SHIFT = 0.001


def make_node_diff(nodes: ray.data.Dataset) -> ray.data.Dataset:
    """Deterministic synthetic changeset derived from the snapshot (the
    plant_neardups pattern — engine and oracle derive the SAME delta from
    the same table): every DIFF_MODIFY_EVERY-th id re-appears with
    version+1 and lon shifted DIFF_LON_SHIFT; every DIFF_DELETE_EVERY-th
    id gets a delete marker; every DIFF_CREATE_EVERY-th id spawns a new
    node at id+DIFF_CREATE_OFFSET with version 1.

    The reference parses OSM snapshots only — .osc changeset application
    (the real-world update path) exists in neither repo; this realizes it
    as the CDC upsert/delete merge every snapshot-maintenance pipeline
    needs (reference data model: /root/reference/osm/Element.go:8-15)."""
    def fn(t: pa.Table) -> pa.Table:
        iid = t["id"].combine_chunks().to_numpy()
        ver = t["version"].combine_chunks().to_numpy().astype(np.int64)
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        m = iid % DIFF_MODIFY_EVERY == 0
        d = iid % DIFF_DELETE_EVERY == 0
        c = iid % DIFF_CREATE_EVERY == 0
        out_id = np.concatenate([iid[m], iid[d],
                                 iid[c] + DIFF_CREATE_OFFSET])
        out_ver = np.concatenate([ver[m] + 1, np.zeros(d.sum(), np.int64),
                                  np.ones(c.sum(), np.int64)])
        out_lon = np.concatenate([lon[m] + DIFF_LON_SHIFT, lon[d], lon[c]])
        out_lat = np.concatenate([lat[m], lat[d], lat[c]])
        deleted = np.zeros(len(out_id), bool)
        deleted[m.sum():m.sum() + d.sum()] = True
        return pa.table({
            "id": pa.array(out_id), "version": pa.array(out_ver),
            "lon": pa.array(out_lon), "lat": pa.array(out_lat),
            "deleted": pa.array(deleted),
        })
    return nodes.map_batches(fn, batch_format="pyarrow")


def apply_diff(base: ray.data.Dataset, delta: ray.data.Dataset,
               num_parts: int = 32) -> ray.data.Dataset:
    """CDC merge: apply an upsert/delete changeset to a snapshot —
    surviving row per id = highest version among base+delta rows, ids
    carrying a delete marker removed entirely.

    Plan: both streams normalized to (id, version, lon, lat, deleted),
    ONE hash-partition exchange on id (every id wholly inside one
    partition — no global sort), per-partition vectorized lexsort +
    boundary reduceat kernel.  Output (id, version, lon7, lat7) with the
    shared 7-digit rounding mirror."""
    from ..relational import hash_part
    from ..util import round_half_away

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({
            "id": t["id"],
            "version": pc.cast(t["version"], pa.int64()),
            "lon": t["lon"], "lat": t["lat"],
            "deleted": pa.array(np.zeros(len(t), bool)),
        })

    both = base.select_columns(["id", "version", "lon", "lat"]) \
        .map_batches(norm, batch_format="pyarrow").union(delta)

    def part_of(t: pa.Table) -> pa.Table:
        return t.append_column("part", pa.array(
            hash_part(t["id"].combine_chunks().to_numpy(), num_parts)))

    def kernel(t: pa.Table) -> pa.Table:
        iid = t["id"].combine_chunks().to_numpy()
        ver = t["version"].combine_chunks().to_numpy()
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        dl = t["deleted"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ver, iid))
        iid, ver, lon, lat, dl = (iid[order], ver[order], lon[order],
                                  lat[order], dl[order])
        starts = np.flatnonzero(np.r_[True, iid[1:] != iid[:-1]])
        ends = np.r_[starts[1:], len(iid)] - 1   # max-version row per id
        has_del = np.add.reduceat(dl.astype(np.int64), starts) > 0
        keep = ends[~has_del]
        return pa.table({
            "id": pa.array(iid[keep]),
            "version": pa.array(ver[keep]),
            "lon7": pa.array(round_half_away(lon[keep], 7)),
            "lat7": pa.array(round_half_away(lat[keep], 7)),
        })

    return both.map_batches(part_of, batch_format="pyarrow") \
        .groupby("part").map_groups(kernel, batch_format="pyarrow")


def full_shared_node_edges(ways: ray.data.Dataset,
                           num_parts: int = 16) -> ray.data.Dataset:
    """Globally deduped FULL pairwise (a < b) shared-node way edges:
    per ref group every clique pair (k(k-1)/2 per k-way node — see
    way_triangles' cap discussion), partition dedup, then one a-hash
    exchange for global dedup. Materialized because consumers
    (triangles, k-core) read it multiple times."""
    from ..relational import hash_part

    exploded = explode_refs(ways).select_columns(["way_id", "ref"])

    def part_by_ref(t: pa.Table) -> pa.Table:
        r = t["ref"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(r, num_parts)))

    def _pair_dedup_np(a: np.ndarray, b: np.ndarray):
        if len(a):
            order = np.lexsort((b, a))
            a, b = a[order], b[order]
            keep = np.ones(len(a), bool)
            keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            a, b = a[keep], b[keep]
        return a, b

    def clique_pairs(t: pa.Table) -> pa.Table:
        r = t["ref"].combine_chunks().to_numpy()
        w = t["way_id"].combine_chunks().to_numpy()
        order = np.lexsort((w, r))
        r, w = r[order], w[order]
        if len(r):
            keep = np.ones(len(r), bool)
            keep[1:] = (r[1:] != r[:-1]) | (w[1:] != w[:-1])
            r, w = r[keep], w[keep]
        starts = np.flatnonzero(np.r_[True, r[1:] != r[:-1]]) \
            if len(r) else np.empty(0, np.int64)
        counts = np.diff(np.r_[starts, len(r)]) if len(r) \
            else np.empty(0, np.int64)
        pos = np.arange(len(w), dtype=np.int64)
        rep = np.repeat(counts, counts) - (pos - np.repeat(starts, counts)) - 1
        first_idx = np.repeat(pos, rep)
        base = np.repeat(np.cumsum(rep) - rep, rep)
        second_idx = first_idx + 1 + (np.arange(rep.sum(), dtype=np.int64)
                                      - base)
        a, b = _pair_dedup_np(w[first_idx], w[second_idx])
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    def part_by_a(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(a, num_parts)))

    def dedup_kernel(t: pa.Table) -> pa.Table:
        a, b = _pair_dedup_np(t["a"].combine_chunks().to_numpy(),
                              t["b"].combine_chunks().to_numpy())
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    edges = exploded.map_batches(part_by_ref, batch_format="pyarrow") \
        .groupby("part").map_groups(clique_pairs, batch_format="pyarrow") \
        .map_batches(part_by_a, batch_format="pyarrow") \
        .groupby("part") \
        .map_groups(lambda t: dedup_kernel(t.drop_columns(["part"])),
                    batch_format="pyarrow").materialize()

    return edges


def way_triangles(ways: ray.data.Dataset, num_parts: int = 16,
                  broadcast_threshold: int = 4_000_000
                  ) -> ray.data.Dataset:
    """(n_nodes, n_edges, n_wedges, n_triangles, clustering): global
    triangle census of the TRUE shared-node way graph (ways joined by
    any common node ref) — the graph-quality audit (global clustering
    coefficient = 3*triangles/wedges) behind road-mesh density checks.

    Unlike way_components/way_pagerank this NEEDS the full pairwise
    edge set (a star reduction has no triangles among leaves), so each
    ref group emits its k(k-1)/2 clique pairs — per-node way-sharing
    degree is small in OSM practice (a node is shared by the handful of
    ways meeting at an intersection); a web-scale guard would cap k and
    count capped cliques analytically (C(k,3) inside the clique).

    Physical plan (the standard distributed wedge-check algorithm,
    MapReduce triangle counting a la Suri-Vassilvitskii):
      1. ref-hash exchange -> per-group clique pairs (a < b), partition
         dedup, then ONE a-hash exchange for global pair dedup;
      2. endpoint-count partials -> node-hash exchange -> degrees;
      3. two hash joins attach (deg, id) ranks to both endpoints; each
         edge orients low-rank -> high-rank (bounds out-degree by
         ~sqrt(m), the step that makes wedge counts tractable);
      4. u-hash exchange groups oriented out-neighbourhoods; each u
         emits its C(outdeg,2) wedge pairs ordered by rank;
      5. wedges and oriented edges co-partition by hash(first) and a
         sorted merge counts wedges whose closing pair IS an edge.
    All exchanges move bounded pair/label rows; partials from steps
    2/4/5 union into one (metric, value) merge task."""
    from ..relational import hash_part, single_merge
    from ..util import round_half_away

    edges = full_shared_node_edges(ways, num_parts)

    # ---- degrees ------------------------------------------------------
    def deg_partial(t: pa.Table) -> pa.Table:
        v = np.concatenate([t["a"].combine_chunks().to_numpy(),
                            t["b"].combine_chunks().to_numpy()])
        u, n = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u), "pd": pa.array(n.astype(np.int64)),
                         "part": pa.array(hash_part(u, num_parts))})

    def deg_merge(t: pa.Table) -> pa.Table:
        if "part" in t.column_names:
            t = t.drop_columns(["part"])
        g = t.group_by("v").aggregate([("pd", "sum")])
        return g.rename_columns(["v", "d"])

    def _wedge_pairs(u: np.ndarray, v: np.ndarray, dv: np.ndarray):
        """Rank-ordered out-neighbour pairs per u (the clique trick)."""
        order = np.lexsort((v, dv, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]]) \
            if len(u) else np.empty(0, np.int64)
        counts = np.diff(np.r_[starts, len(u)]) if len(u) \
            else np.empty(0, np.int64)
        pos = np.arange(len(v), dtype=np.int64)
        rep = np.repeat(counts, counts) - (pos - np.repeat(starts, counts)) - 1
        first_idx = np.repeat(pos, rep)
        base = np.repeat(np.cumsum(rep) - rep, rep)
        second_idx = first_idx + 1 + (np.arange(rep.sum(), dtype=np.int64)
                                      - base)
        return v[first_idx], v[second_idx]

    def _close_triangles(x: np.ndarray, y: np.ndarray,
                         e: np.ndarray) -> pa.Table:
        """Count wedge rows whose (x, y) pair IS an edge row (e flag)."""
        order = np.lexsort((e, y, x))
        x, y, e = x[order], y[order], e[order]
        starts = np.flatnonzero(np.r_[True, (x[1:] != x[:-1])
                                      | (y[1:] != y[:-1])]) \
            if len(x) else np.empty(0, np.int64)
        ends = np.r_[starts[1:], len(x)] if len(x) else starts
        # within a (x, y) group wedge rows sort first (is_edge False),
        # the edge row (unique after dedup) last
        has_edge = e[ends - 1] if len(x) else np.empty(0, bool)
        n_wedge = (ends - starts) - has_edge.astype(np.int64)
        tri = int(n_wedge[has_edge].sum()) if len(x) else 0
        return pa.table({"metric": pa.array(["n_triangles"]),
                         "value": pa.array([tri], pa.int64())})

    n_edge_rows = edges.count()

    if n_edge_rows <= broadcast_threshold:
        # ---- broadcast small-side plan (the dedup_keep precedent): the
        # degree table and oriented edge set are edge-scale; below the
        # threshold two ray.put broadcasts replace the attach-a/attach-b
        # exchanges and the closing-join exchange (7 exchanges -> 4),
        # which dominated wall time at toy scale. Past the threshold the
        # fully partitioned plan below runs instead.
        from ..relational import broadcast_table

        deg = single_merge(
            edges.map_batches(
                lambda t: deg_partial(t).drop_columns(["part"]),
                batch_format="pyarrow"),
            deg_merge).materialize()
        deg_ref = broadcast_table(deg, ["v", "d"])

        def orient_b(t: pa.Table) -> pa.Table:
            dt = ray.get(deg_ref)
            dv_ = dt["v"].to_numpy()
            dd_ = dt["d"].to_numpy()
            o = np.argsort(dv_)
            dv_, dd_ = dv_[o], dd_[o]
            a = t["a"].combine_chunks().to_numpy()
            b = t["b"].combine_chunks().to_numpy()
            da = dd_[np.searchsorted(dv_, a)]
            db = dd_[np.searchsorted(dv_, b)]
            fwd = (da < db) | ((da == db) & (a < b))
            u = np.where(fwd, a, b)
            v = np.where(fwd, b, a)
            dv = np.where(fwd, db, da)
            return pa.table({"u": pa.array(u), "v": pa.array(v),
                             "dv": pa.array(dv),
                             "part": pa.array(hash_part(u, num_parts))})

        oriented = edges.map_batches(orient_b, batch_format="pyarrow") \
            .materialize()
        edge_ref = broadcast_table(oriented, ["u", "v"])

        def wedges_close(t: pa.Table) -> pa.Table:
            wx, wy = _wedge_pairs(t["u"].combine_chunks().to_numpy(),
                                  t["v"].combine_chunks().to_numpy(),
                                  t["dv"].combine_chunks().to_numpy())
            et = ray.get(edge_ref)
            eu = et["u"].to_numpy()
            ev = et["v"].to_numpy()
            x = np.concatenate([wx, eu])
            y = np.concatenate([wy, ev])
            e = np.r_[np.zeros(len(wx), bool), np.ones(len(eu), bool)]
            return _close_triangles(x, y, e)

        tri_partials = oriented.groupby("part") \
            .map_groups(lambda t: wedges_close(t.drop_columns(["part"])),
                        batch_format="pyarrow")
    else:
        deg = edges.map_batches(deg_partial, batch_format="pyarrow") \
            .groupby("part").map_groups(deg_merge, batch_format="pyarrow") \
            .materialize()

        # ---- orient by (deg, id) rank via two co-partition passes ------
        # (a union-tag exchange per endpoint, NOT Dataset.join: the joins'
        # shuffle-aggregator actor pools deadlocked the duplicated-lineage
        # plan at small CPU counts, and the co-partition kernel is the
        # repo's standard join shape anyway)
        def _attach(ds: ray.data.Dataset, cols_in: list, key: str,
                    out_col: str) -> ray.data.Dataset:
            """Append deg(key) as ``out_col`` via hash(key) co-partition."""
            def tag_edge(t: pa.Table) -> pa.Table:
                k = t[key].combine_chunks().to_numpy()
                cols = {c: t[c].combine_chunks() for c in t.column_names
                        if c != "part"}
                cols["_d"] = pa.array(np.zeros(len(k), np.int64))
                cols["_is_deg"] = pa.array(np.zeros(len(k), bool))
                cols["part"] = pa.array(hash_part(k, num_parts))
                return pa.table(cols)

            def tag_deg(t: pa.Table) -> pa.Table:
                v = t["v"].combine_chunks().to_numpy()
                cols = {c: (pa.array(v) if c == key
                            else pa.nulls(len(v), pa.int64()))
                        for c in cols_in}
                cols["_d"] = t["d"].combine_chunks()
                cols["_is_deg"] = pa.array(np.ones(len(v), bool))
                cols["part"] = pa.array(hash_part(v, num_parts))
                return pa.table(cols)

            def kernel(t: pa.Table) -> pa.Table:
                is_deg = t["_is_deg"].combine_chunks() \
                    .to_numpy(zero_copy_only=False)
                k = t[key].combine_chunks().to_numpy()
                d = t["_d"].combine_chunks().to_numpy()
                dv, dd = k[is_deg], d[is_deg]
                order = np.argsort(dv)
                dv, dd = dv[order], dd[order]
                e = t.filter(pa.array(~is_deg)) \
                    .drop_columns(["_d", "_is_deg"])
                ek = e[key].combine_chunks().to_numpy()
                idx = np.searchsorted(dv, ek)
                return e.append_column(out_col, pa.array(dd[idx]))

            both = ds.map_batches(tag_edge, batch_format="pyarrow") \
                .union(deg.map_batches(tag_deg, batch_format="pyarrow"))
            return both.groupby("part") \
                .map_groups(lambda t: kernel(t.drop_columns(["part"])),
                            batch_format="pyarrow")

        j = _attach(_attach(edges, ["a", "b"], "a", "da"),
                    ["a", "b", "da"], "b", "db")

        def orient(t: pa.Table) -> pa.Table:
            a = t["a"].combine_chunks().to_numpy()
            b = t["b"].combine_chunks().to_numpy()
            da = t["da"].combine_chunks().to_numpy()
            db = t["db"].combine_chunks().to_numpy()
            fwd = (da < db) | ((da == db) & (a < b))
            u = np.where(fwd, a, b)
            v = np.where(fwd, b, a)
            dv = np.where(fwd, db, da)
            return pa.table({"u": pa.array(u), "v": pa.array(v),
                             "dv": pa.array(dv),
                             "part": pa.array(hash_part(u, num_parts))})

        oriented = j.map_batches(orient, batch_format="pyarrow") \
            .materialize()

        def wedges(t: pa.Table) -> pa.Table:
            x, y = _wedge_pairs(t["u"].combine_chunks().to_numpy(),
                                t["v"].combine_chunks().to_numpy(),
                                t["dv"].combine_chunks().to_numpy())
            return pa.table({"x": pa.array(x), "y": pa.array(y),
                             "is_edge": pa.array(np.zeros(len(x), bool)),
                             "part": pa.array(hash_part(x, num_parts))})

        wedge_rows = oriented.groupby("part") \
            .map_groups(lambda t: wedges(t.drop_columns(["part"])),
                        batch_format="pyarrow")

        def edge_rows_fn(t: pa.Table) -> pa.Table:
            u = t["u"].combine_chunks().to_numpy()
            v = t["v"].combine_chunks().to_numpy()
            return pa.table({"x": pa.array(u), "y": pa.array(v),
                             "is_edge": pa.array(np.ones(len(u), bool)),
                             "part": pa.array(hash_part(u, num_parts))})

        edge_rows = oriented.map_batches(edge_rows_fn,
                                         batch_format="pyarrow")

        def close_count(t: pa.Table) -> pa.Table:
            return _close_triangles(
                t["x"].combine_chunks().to_numpy(),
                t["y"].combine_chunks().to_numpy(),
                t["is_edge"].combine_chunks().to_numpy(zero_copy_only=False))

        tri_partials = wedge_rows.union(edge_rows).groupby("part") \
            .map_groups(lambda t: close_count(t.drop_columns(["part"])),
                        batch_format="pyarrow")

    def deg_stats(t: pa.Table) -> pa.Table:
        d = t["d"].combine_chunks().to_numpy()
        return pa.table({
            "metric": pa.array(["n_nodes", "n_wedges"]),
            "value": pa.array([len(d), int((d * (d - 1) // 2).sum())],
                              pa.int64()),
        })

    def edge_count(t: pa.Table) -> pa.Table:
        return pa.table({"metric": pa.array(["n_edges"]),
                         "value": pa.array([len(t)], pa.int64())})

    partials = tri_partials \
        .union(deg.map_batches(deg_stats, batch_format="pyarrow")) \
        .union(edges.map_batches(edge_count, batch_format="pyarrow"))

    def merge(t: pa.Table) -> pa.Table:
        m = t["metric"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["value"].combine_chunks().to_numpy()
        tot = {k: int(v[m == k].sum()) for k in
               ("n_nodes", "n_edges", "n_wedges", "n_triangles")}
        clus = (3.0 * tot["n_triangles"] / tot["n_wedges"]
                if tot["n_wedges"] else 0.0)
        return pa.table({
            "n_nodes": pa.array([tot["n_nodes"]], pa.int64()),
            "n_edges": pa.array([tot["n_edges"]], pa.int64()),
            "n_wedges": pa.array([tot["n_wedges"]], pa.int64()),
            "n_triangles": pa.array([tot["n_triangles"]], pa.int64()),
            "clustering": pa.array([float(round_half_away(clus, 6))]),
        })

    return single_merge(partials, merge)


def way_bearings(ways: ray.data.Dataset, nodes: ray.data.Dataset,
                 bins: int = 16, nd: int = 6,
                 num_parts: int = 16) -> ray.data.Dataset:
    """(bin, n, share): the street-grid ORIENTATION histogram — every
    way segment's undirected equirectangular bearing folded to
    [0, 180) and bucketed into ``bins`` equal sectors (the popular
    city-grid-entropy analysis over OSM road networks).

    Scale plan: refs resolve to coordinates via the broadcast node
    lookup (join_refs_to_coords), ONE way-hash exchange co-locates each
    way's ordered points, the per-partition kernel pairs adjacent
    positions vectorized and bincounts into the bounded ``bins`` space;
    partials merge in one task. Bearing math runs the exact SQL term
    order (atan2(dlon * cos(mid_lat), dlat), fmod-folded) so bins
    agree bit-exactly."""
    from ..relational import hash_part, single_merge

    pts = join_refs_to_coords(ways, nodes)

    def pre(t: pa.Table) -> pa.Table:
        w = t["way_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(w, num_parts)))

    def kernel(t: pa.Table) -> pa.Table:
        w = t["way_id"].combine_chunks().to_numpy()
        pos = t["pos"].combine_chunks().to_numpy()
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        order = np.lexsort((pos, w))
        w, lon, lat = w[order], lon[order], lat[order]
        same = w[:-1] == w[1:] if len(w) > 1 else np.empty(0, bool)
        x1, x2 = lon[:-1][same], lon[1:][same]
        y1, y2 = lat[:-1][same], lat[1:][same]
        dx = (x2 - x1) * np.cos(np.radians((y1 + y2) / 2.0))
        theta = np.degrees(np.arctan2(dx, y2 - y1))
        folded = np.fmod(np.fmod(theta, 180.0) + 180.0, 180.0)
        b = np.floor(folded / (180.0 / bins)).astype(np.int64)
        cnt = np.bincount(np.clip(b, 0, bins - 1), minlength=bins)
        return pa.table({"bin": pa.array(np.arange(bins, dtype=np.int64)),
                         "pn": pa.array(cnt.astype(np.int64))})

    def merge(t: pa.Table) -> pa.Table:
        from ..util import round_half_away
        g = t.group_by("bin").aggregate([("pn", "sum")])
        b = g["bin"].combine_chunks().to_numpy()
        n = g["pn_sum"].combine_chunks().to_numpy()
        order = np.argsort(b)
        b, n = b[order], n[order]
        total = float(n.sum())
        share = round_half_away(n.astype(np.float64) / total, nd)
        return pa.table({"bin": pa.array(b), "n": pa.array(n),
                         "share": pa.array(np.asarray(share))})

    parts = pts.map_batches(pre, batch_format="pyarrow") \
        .groupby("part") \
        .map_groups(lambda t: kernel(t.drop_columns(["part"])),
                    batch_format="pyarrow")
    return single_merge(parts, merge)


def way_self_intersect(ways: ray.data.Dataset, nodes: ray.data.Dataset,
                       num_parts: int = 16) -> ray.data.Dataset:
    """(way_id, n_segments, n_crossings, simple): per-way PROPER
    self-intersection count — two segments of the same way cross iff
    the endpoints of each strictly straddle the other's supporting line
    (shared endpoints / collinear touches are NOT proper and are
    excluded by the strict tests) — the polygon-validity audit before
    ring assembly / area math.

    Scale plan: the way_bearings shape — broadcast node lookup, ONE
    way-hash exchange, then a per-partition vectorized kernel: all
    segment pairs WITHIN a way via the clique trick (pair count is
    bounded by way length squared — ways are short; a mega-way guard
    would cap and flag), orientation tests evaluated in one batch.
    The ccw expression tree matches the SQL mirror exactly."""
    from ..relational import hash_part

    pts = join_refs_to_coords(ways, nodes)

    def pre(t: pa.Table) -> pa.Table:
        w = t["way_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(w, num_parts)))

    def kernel(t: pa.Table) -> pa.Table:
        w = t["way_id"].combine_chunks().to_numpy()
        pos = t["pos"].combine_chunks().to_numpy()
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        order = np.lexsort((pos, w))
        w, lon, lat = w[order], lon[order], lat[order]
        same = w[:-1] == w[1:] if len(w) > 1 else np.empty(0, bool)
        # segment arrays (one per adjacent same-way pair)
        sw = w[:-1][same]
        ax, ay = lon[:-1][same], lat[:-1][same]
        bx, by = lon[1:][same], lat[1:][same]
        # per-way all segment pairs i < j (clique trick over segments)
        starts = np.flatnonzero(np.r_[True, sw[1:] != sw[:-1]]) \
            if len(sw) else np.empty(0, np.int64)
        counts = np.diff(np.r_[starts, len(sw)]) if len(sw) \
            else np.empty(0, np.int64)
        posi = np.arange(len(sw), dtype=np.int64)
        rep = np.repeat(counts, counts) - (posi - np.repeat(starts, counts)) - 1
        i1 = np.repeat(posi, rep)
        base = np.repeat(np.cumsum(rep) - rep, rep)
        i2 = i1 + 1 + (np.arange(rep.sum(), dtype=np.int64) - base)

        def ccw(px, py, qx, qy, rx, ry):
            return (qx - px) * (ry - py) - (qy - py) * (rx - px)

        d1 = ccw(ax[i1], ay[i1], bx[i1], by[i1], ax[i2], ay[i2])
        d2 = ccw(ax[i1], ay[i1], bx[i1], by[i1], bx[i2], by[i2])
        d3 = ccw(ax[i2], ay[i2], bx[i2], by[i2], ax[i1], ay[i1])
        d4 = ccw(ax[i2], ay[i2], bx[i2], by[i2], bx[i1], by[i1])
        cross = (d1 * d2 < 0) & (d3 * d4 < 0)
        wu = np.unique(w)
        nseg = np.zeros(len(wu), np.int64)
        if len(sw):
            np.add.at(nseg, np.searchsorted(wu, sw), 1)
        ncross = np.zeros(len(wu), np.int64)
        if len(i1):
            pair_way = np.searchsorted(wu, sw[i1])
            np.add.at(ncross, pair_way, cross.astype(np.int64))
        return pa.table({
            "way_id": pa.array(wu),
            "n_segments": pa.array(nseg),
            "n_crossings": pa.array(ncross),
            "simple": pa.array(ncross == 0),
        })

    return pts.map_batches(pre, batch_format="pyarrow") \
        .groupby("part") \
        .map_groups(lambda t: kernel(t.drop_columns(["part"])),
                    batch_format="pyarrow")


def way_kcore(ways: ray.data.Dataset,
              num_parts: int = 8) -> ray.data.Dataset:
    """(way_id, core): exact k-core decomposition of the TRUE
    shared-node way graph by distributed iterated neighbourhood
    h-index (state.bsp._KCorePart) — the "how structurally embedded is
    this road?" peeling metric (core 0 = isolated, high core = dense
    mesh interior).

    Physical plan: the full pairwise edge set (full_shared_node_edges,
    deduped) shards once via shard_static_edges (both directions +
    node markers for isolated ways), then resident BSP actors iterate
    c(v) <- H(c(neighbours)) with one bound-change exchange per round —
    monotone, converges to the exact core numbers (Montresor et al.),
    verified against the scalar peeling oracle."""
    from ..state.bsp import run_kcore
    from .text import shard_static_edges

    pairs = full_shared_node_edges(ways, num_parts)
    d, has_shard, owned = shard_static_edges(
        pairs, num_parts, extra_nodes=ways.select_columns(["id"]))
    return run_kcore(d, has_shard, num_parts, max_iters=256, cleanup=owned)


def way_sinuosity(nodes: ray.data.Dataset,
                  ways: ray.data.Dataset) -> ray.data.Dataset:
    """(way_id, n_points, len_m3, chord_m3, sinuosity4): haversine path
    length over the resolved node chain divided by the haversine chord
    (first node -> last node) — the classic road-curviness metric
    (sinuosity 1.0 = straight, ~1.5+ = mountain switchbacks).  Rings
    and degenerate chords are excluded by the ROUNDED-chord > 0 boundary
    contract (clip_filter's convention) so the engine and SQL mirror
    agree exactly at the cut.

    Same physical plan as way_length_m (reference analogue of the way
    geometry pass, osm/Way.go:15-30): broadcast node table read once per
    task, per-way segment haversine in the shared term order, chord as
    one more vectorized haversine over (first, last).  Rounding of the
    ratio happens once at 4 digits; len/chord are also emitted at
    millimeter rounding for inspection."""
    from ..relational import broadcast_table
    from ..util import round_half_away as _rnd
    nodes_ref = broadcast_table(nodes, ["id", "lon", "lat"])
    d2r = np.pi / 180.0

    def hav(x1, y1, x2, y2):
        p1 = y1 * d2r
        p2 = y2 * d2r
        sdp = np.sin((p2 - p1) / 2.0)
        sdl = np.sin((x2 - x1) * d2r / 2.0)
        a = np.minimum(sdp * sdp + np.cos(p1) * np.cos(p2) * sdl * sdl, 1.0)
        return 2.0 * EARTH_R_M * np.arcsin(np.sqrt(a))

    def fn(batch: pa.Table) -> pa.Table:
        nt = ray.get(nodes_ref)
        nid = nt["id"].to_numpy()
        order = np.argsort(nid, kind="stable")
        nid_s = nid[order]
        nlon = nt["lon"].to_numpy()[order]
        nlat = nt["lat"].to_numpy()[order]

        refs = batch["refs"].combine_chunks()
        offsets = np.asarray(refs.offsets, np.int64)
        flat = refs.flatten().to_numpy()
        n = np.diff(offsets)

        jj = np.searchsorted(nid_s, flat).clip(max=max(len(nid_s) - 1, 0))
        found = nid_s[jj] == flat if len(nid_s) else np.zeros(len(flat), bool)
        nf = np.add.reduceat(found.astype(np.int64), offsets[:-1]) \
            if len(flat) else np.zeros(0, np.int64)
        keep = (n >= 2) & (nf == n)

        x = np.where(found, nlon[jj], 0.0)
        y = np.where(found, nlat[jj], 0.0)
        if len(flat) >= 2:
            seg = hav(x[:-1], y[:-1], x[1:], y[1:])
        else:
            seg = np.zeros(0, np.float64)
        ps = np.concatenate([[0.0], np.cumsum(seg)])
        lo = offsets[:-1].clip(max=max(len(seg), 0))
        hi = (offsets[1:] - 1).clip(min=0, max=max(len(seg), 0))
        ln = ps[hi] - ps[lo]
        fi = offsets[:-1].clip(max=max(len(flat) - 1, 0))
        li = (offsets[1:] - 1).clip(min=0)
        chord = hav(x[fi], y[fi], x[li], y[li])
        chord3 = _rnd(chord, 3)
        keep &= chord3 > 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            sin4 = _rnd(np.where(chord > 0, ln / np.where(chord > 0, chord,
                                                          1.0), 0.0), 4)
        return pa.table({
            "way_id": batch["id"].combine_chunks().filter(pa.array(keep)),
            "n_points": pa.array(n[keep], pa.int64()),
            "len_m3": pa.array(_rnd(ln[keep], 3)),
            "chord_m3": pa.array(chord3[keep]),
            "sinuosity4": pa.array(sin4[keep]),
        })
    return ways.map_batches(fn, batch_format="pyarrow")


def way_assortativity(ways: ray.data.Dataset,
                      num_parts: int = 16) -> ray.data.Dataset:
    """(n_vertices, n_edges, assortativity6): degree assortativity
    (Newman's r — Pearson correlation of endpoint degrees over both
    edge orientations) of the TRUE shared-node way graph — the
    road-mesh topology audit next to way_triangles' clustering (do
    high-degree trunk ways attach to other trunks, or fan into
    residential capillaries?).

    The whole statistic reduces to four EXACT integer sums — m (deduped
    edges), S2 = sum deg^2, S3 = sum deg^3 (both orientations make
    sum x = S2 and sum x^2 = S3), and Sxy = sum_{(u,v) in E}
    deg(u)*deg(v) — so the float closed form
    r = (2m*2Sxy - S2^2) / (2m*S3 - S2^2) is bit-identical between the
    engine and the SQL mirror (every operand an exact int64 < 2^53).

    Physical plan: full_shared_node_edges (one ref-hash exchange +
    global pair dedup, shared with triangles/k-core), a v-hash degree
    exchange, then the degree table BROADCASTS (vertex-scale — the
    way_triangles small-side precedent; past that the attach becomes
    the two hash co-partition exchanges of the triangles at-scale arm)
    and each edge block emits one (m, Sxy) partial row; int64 partials
    union into a single bounded merge."""
    from ..relational import broadcast_table, single_merge, hash_part
    from ..util import round_half_away

    edges = full_shared_node_edges(ways, num_parts)

    def deg_partial(t: pa.Table) -> pa.Table:
        v = np.concatenate([t["a"].combine_chunks().to_numpy(),
                            t["b"].combine_chunks().to_numpy()])
        u, n = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u),
                         "pd": pa.array(n.astype(np.int64))})

    def deg_merge(t: pa.Table) -> pa.Table:
        g = t.group_by("v").aggregate([("pd", "sum")])
        return g.rename_columns(["v", "d"])

    deg = single_merge(edges.map_batches(deg_partial,
                                         batch_format="pyarrow"),
                       deg_merge).materialize()
    deg_ref = broadcast_table(deg, ["v", "d"])

    def edge_moments(t: pa.Table) -> pa.Table:
        dt = ray.get(deg_ref)
        dv = dt["v"].to_numpy()
        dd = dt["d"].to_numpy()
        o = np.argsort(dv)
        dv, dd = dv[o], dd[o]
        a = t["a"].combine_chunks().to_numpy()
        b = t["b"].combine_chunks().to_numpy()
        da = dd[np.searchsorted(dv, a)]
        db = dd[np.searchsorted(dv, b)]
        return pa.table({
            "metric": pa.array(["m", "sxy"]),
            "value": pa.array([len(a), int((da * db).sum())], pa.int64())})

    def deg_moments(t: pa.Table) -> pa.Table:
        d = t["d"].combine_chunks().to_numpy()
        return pa.table({
            "metric": pa.array(["nv", "s2", "s3"]),
            "value": pa.array([len(d), int((d * d).sum()),
                               int((d * d * d).sum())], pa.int64())})

    partials = edges.map_batches(edge_moments, batch_format="pyarrow") \
        .union(deg.map_batches(deg_moments, batch_format="pyarrow"))

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("metric").aggregate([("value", "sum")])
        s = {k: int(v) for k, v in zip(g["metric"].to_pylist(),
                                       g["value_sum"].to_pylist())}
        m, sxy = s.get("m", 0), s.get("sxy", 0)
        s2, s3 = s.get("s2", 0), s.get("s3", 0)
        num = (2.0 * m) * (2.0 * sxy) - float(s2) * float(s2)
        den = (2.0 * m) * float(s3) - float(s2) * float(s2)
        r = num / den if den != 0.0 else 0.0
        return pa.table({
            "n_vertices": pa.array([s.get("nv", 0)], pa.int64()),
            "n_edges": pa.array([m], pa.int64()),
            "assortativity6": pa.array([float(round_half_away(r, 6))]),
        })

    return single_merge(partials, merge)



def way_jaccard(ways: ray.data.Dataset, num_parts: int = 16,
                threshold: float = 0.2) -> ray.data.Dataset:
    """(a, b, common, jac6): neighborhood-Jaccard link prediction over
    the true shared-node way graph — every way pair with at least one
    common neighbor scored |N(a) n N(b)| / |N(a) u N(b)|, kept above
    ``threshold`` (the classic common-neighbors candidate generator
    for graph dedup / entity resolution).

    Physical plan (3 bounded exchanges past the shared edge build):
      1. the deduped edge set (full_shared_node_edges, materialized —
         reused from the triangle/k-core family) explodes to both
         directions and exchanges by hash(center) so each node's
         full neighbor list lands in ONE partition;
      2. per center z: C(deg,2) neighbor pairs via the vectorized
         clique trick, partial-counted per (x, y) in-kernel; the
         kernel also emits z's exact degree row (z is whole here);
      3. pairs exchange by hash(x) to sum common counts and attach
         deg(x); degree rows ride the SAME hash so no extra shuffle;
      4. exchange by hash(y) attaches deg(y) and scores — union-tag
         co-partition both times (never a Dataset.join on reused
         lineage: the r4 deadlock precedent, see way_triangles).
    Per-center pair emission is quadratic in degree — the same
    documented clique-cap consideration as way_triangles applies at
    web scale (cap k, count capped analytically)."""
    from ..relational import hash_part

    edges = full_shared_node_edges(ways, num_parts)

    def bi(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy()
        b = t["b"].combine_chunks().to_numpy()
        z = np.concatenate([a, b])
        v = np.concatenate([b, a])
        return pa.table({"z": pa.array(z), "v": pa.array(v),
                         "part": pa.array(hash_part(z, num_parts))})

    def per_center(t: pa.Table) -> pa.Table:
        z = t["z"].combine_chunks().to_numpy()
        v = t["v"].combine_chunks().to_numpy()
        order = np.lexsort((v, z))
        z, v = z[order], v[order]
        starts = np.flatnonzero(np.r_[True, z[1:] != z[:-1]]) \
            if len(z) else np.empty(0, np.int64)
        counts = np.diff(np.r_[starts, len(z)]) if len(z) \
            else np.empty(0, np.int64)
        pos = np.arange(len(v), dtype=np.int64)
        rep = np.repeat(counts, counts) - (pos - np.repeat(starts, counts)) - 1
        first_idx = np.repeat(pos, rep)
        base = np.repeat(np.cumsum(rep) - rep, rep)
        second_idx = first_idx + 1 + (np.arange(rep.sum(), dtype=np.int64)
                                      - base)
        x, y = v[first_idx], v[second_idx]     # x < y (v sorted per z)
        pairs = pa.table({"x": pa.array(x), "y": pa.array(y)}) \
            .group_by(["x", "y"]).aggregate([("x", "count")])
        px = pairs["x"].combine_chunks().to_numpy()
        deg_z = z[starts]
        deg_d = counts.astype(np.int64)
        return pa.table({
            "x": pa.array(np.concatenate([px, deg_z])),
            "y": pa.array(np.concatenate(
                [pairs["y"].combine_chunks().to_numpy(),
                 np.full(len(deg_z), -1, np.int64)])),
            "c": pa.array(np.concatenate(
                [pairs["x_count"].combine_chunks().to_numpy()
                 .astype(np.int64), deg_d])),
            "da": pa.array(np.zeros(len(px) + len(deg_z), np.int64)),
            "tag": pa.array(np.concatenate(
                [np.zeros(len(px), np.int64),
                 np.ones(len(deg_z), np.int64)])),
            "part": pa.array(hash_part(
                np.concatenate([px, deg_z]), num_parts)),
        })

    def attach_x(t: pa.Table) -> pa.Table:
        tag = t["tag"].combine_chunks().to_numpy()
        x = t["x"].combine_chunks().to_numpy()
        y = t["y"].combine_chunks().to_numpy()
        c = t["c"].combine_chunks().to_numpy()
        dk, dv = x[tag == 1], c[tag == 1]
        do = np.argsort(dk)
        px, py, pc_ = x[tag == 0], y[tag == 0], c[tag == 0]
        # sum the per-center partials for each (x, y)
        g = pa.table({"x": pa.array(px), "y": pa.array(py),
                      "c": pa.array(pc_)}) \
            .group_by(["x", "y"]).aggregate([("c", "sum")])
        gx = g["x"].combine_chunks().to_numpy()
        gy = g["y"].combine_chunks().to_numpy()
        gc = g["c_sum"].combine_chunks().to_numpy()
        da = dv[do[np.searchsorted(dk[do], gx)]]
        out_x = np.concatenate([gx, dk])
        return pa.table({
            "x": pa.array(out_x),
            "y": pa.array(np.concatenate(
                [gy, np.full(len(dk), -1, np.int64)])),
            "c": pa.array(np.concatenate([gc, dv])),
            "da": pa.array(np.concatenate([da, np.zeros(len(dk),
                                                        np.int64)])),
            "tag": pa.array(np.concatenate(
                [np.zeros(len(gx), np.int64), np.ones(len(dk),
                                                      np.int64)])),
            "part": pa.array(hash_part(
                np.concatenate([gy, dk]), num_parts)),
        })

    def score_y(t: pa.Table) -> pa.Table:
        tag = t["tag"].combine_chunks().to_numpy()
        x = t["x"].combine_chunks().to_numpy()
        y = t["y"].combine_chunks().to_numpy()
        c = t["c"].combine_chunks().to_numpy()
        da = t["da"].combine_chunks().to_numpy()
        dk, dv = x[tag == 1], c[tag == 1]
        do = np.argsort(dk)
        px, py = x[tag == 0], y[tag == 0]
        pc_, pda = c[tag == 0], da[tag == 0]
        db = dv[do[np.searchsorted(dk[do], py)]]
        jac = pc_ / (pda + db - pc_)
        keep = jac >= threshold
        return pa.table({
            "a": pa.array(px[keep]), "b": pa.array(py[keep]),
            "common": pa.array(pc_[keep].astype(np.int64)),
            "jac6": pa.array(round_half_away(jac[keep], 6)),
        })

    cn = edges.map_batches(bi, batch_format="pyarrow") \
        .groupby("part") \
        .map_groups(lambda t: per_center(t.drop_columns(["part"])),
                    batch_format="pyarrow") \
        .groupby("part") \
        .map_groups(lambda t: attach_x(t.drop_columns(["part"])),
                    batch_format="pyarrow") \
        .groupby("part") \
        .map_groups(lambda t: score_y(t.drop_columns(["part"])),
                    batch_format="pyarrow")
    return cn


def way_mst(ways: ray.data.Dataset,
            num_parts: int = 8) -> ray.data.Dataset:
    """(component, n_ways, n_edges, total_w): minimum spanning forest
    of the TRUE shared-node way graph under the deterministic pseudo-
    weight ``state.bsp.mst_edge_weight`` (total order (w, a, b) makes
    the MSF unique), summarized per connected component keyed by its
    minimum way id — the "cheapest skeleton that keeps the road mesh
    connected" reduction (reference analogue: none; this extends the
    way/node model of osm/Way.go:15-30 the way way_components does).

    Physical plan: the deduped full pairwise edge set
    (full_shared_node_edges) shards ONCE via shard_static_edges (both
    directions + isolated-way markers); resident BSP actors
    (state.bsp._MSTPart) run distributed Boruvka — per round one
    vectorized shard scan finds each component's min outgoing edge,
    mutual-pair hooking + pointer-jump compression merge components,
    and only labels/claims move between actors. O(log n) rounds, edges
    never reshuffled. Post-pass: one co-partition exchange attaches
    each forest edge's final component, then a single bounded
    partial_groupby_agg emits (min way id, way count, edge count,
    int64 weight sum) per component."""
    from ..relational import hash_part, partial_groupby_agg
    from ..state.bsp import run_mst
    from .text import shard_static_edges

    pairs = full_shared_node_edges(ways, num_parts)
    d, has_shard, owned = shard_static_edges(
        pairs, num_parts, extra_nodes=ways.select_columns(["id"]))
    labels, forest = run_mst(d, has_shard, num_parts, cleanup=owned)

    imax = np.iinfo(np.int64).max

    def tag_label(t: pa.Table) -> pa.Table:
        k = t["way_id"].combine_chunks().to_numpy()
        return pa.table({"k": t["way_id"], "root": t["root"],
                         "w": pa.array(np.zeros(len(k), np.int64)),
                         "is_node": pa.array(np.ones(len(k), bool)),
                         "part": pa.array(hash_part(k, num_parts))})

    def tag_edge(t: pa.Table) -> pa.Table:
        k = t["a"].combine_chunks().to_numpy()
        return pa.table({"k": t["a"],
                         "root": pa.array(np.zeros(len(k), np.int64)),
                         "w": t["w"],
                         "is_node": pa.array(np.zeros(len(k), bool)),
                         "part": pa.array(hash_part(k, num_parts))})

    def attach_root(t: pa.Table) -> pa.Table:
        """Edges inherit the component of endpoint ``a`` (both endpoints
        are in the same component once the forest is final); unified
        rows then feed ONE bounded per-component aggregation: nodes
        carry (min way id, way count), edges carry (edge count, weight
        sum) via a +inf way-id sentinel."""
        isn = t["is_node"].combine_chunks().to_numpy(zero_copy_only=False)
        k = t["k"].combine_chunks().to_numpy()
        root = t["root"].combine_chunks().to_numpy()
        w = t["w"].combine_chunks().to_numpy()
        nk, nroot = k[isn], root[isn]
        o = np.argsort(nk, kind="stable")
        nk, nroot = nk[o], nroot[o]
        ek, ew = k[~isn], w[~isn]
        j = np.searchsorted(nk, ek).clip(max=max(len(nk) - 1, 0))
        eroot = nroot[j] if len(nk) else ek
        return pa.table({
            "root": pa.array(np.concatenate([nroot, eroot])),
            "way_min": pa.array(np.concatenate(
                [nk, np.full(len(ek), imax, np.int64)])),
            "n_node": pa.array(np.concatenate(
                [np.ones(len(nk), np.int64), np.zeros(len(ek), np.int64)])),
            "n_edge": pa.array(np.concatenate(
                [np.zeros(len(nk), np.int64), np.ones(len(ek), np.int64)])),
            "w": pa.array(np.concatenate(
                [np.zeros(len(nk), np.int64), ew])),
        })

    unified = labels.map_batches(tag_label, batch_format="pyarrow") \
        .union(forest.map_batches(tag_edge, batch_format="pyarrow")) \
        .groupby("part") \
        .map_groups(lambda t: attach_root(t.drop_columns(["part"])),
                    batch_format="pyarrow")

    agg = partial_groupby_agg(
        unified, ["root"],
        [("way_min", "min"), ("n_node", "sum"),
         ("n_edge", "sum"), ("w", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "component": pc.cast(t["way_min_min"], pa.int64()),
            "n_ways": pc.cast(t["n_node_sum"], pa.int64()),
            "n_edges": pc.cast(t["n_edge_sum"], pa.int64()),
            "total_w": pc.cast(t["w_sum"], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort("component")


def way_hausdorff(ways: ray.data.Dataset, nodes: ray.data.Dataset,
                  num_parts: int = 16) -> ray.data.Dataset:
    """(a, b, hausdorff3): discrete Hausdorff distance (meters,
    haversine on the EARTH_R_M sphere, each vertex-pair distance
    rounded half-away at 3 dp BEFORE the min/max lattice so the SQL
    mirror is exact) between every pair of ways sharing >= 1 node —
    the geometric near-duplicate / conflation metric on top of the
    way graph's topological edges.

    Scale plan: candidate pairs are the globally-deduped shared-node
    edges (full_shared_node_edges — bounded per-node clique emission,
    see way_triangles' cap discussion), NEVER all way pairs.  Vertex
    sets ship through exactly two bounded hash exchanges: exchange 1
    co-locates each edge with side-a's vertices (edge rows replicate
    per a-vertex, O(edges x |A|) intermediate), exchange 2 re-keys by
    b and the kernel evaluates the full |A| x |B| distance matrix per
    edge — both directions of the Hausdorff max-min at once, chunked
    numpy, no python per vertex pair.  Per-edge cost is |A| x |B|;
    ways are short by construction (p99 ~13 vertices), and a length
    cap on pathological ways would bound the worst case at web scale."""
    from ..relational import hash_part

    pts = join_refs_to_coords(ways, nodes) \
        .select_columns(["way_id", "lon", "lat"])
    edges = full_shared_node_edges(ways, num_parts)
    d2r = np.pi / 180.0

    def _pt_rows(key_part: np.ndarray, way: np.ndarray, lon, lat,
                 n: int) -> dict:
        return {"a": pa.array(way), "b": pa.nulls(n, pa.int64()),
                "alon": lon, "alat": lat,
                "_is_pt": pa.array(np.ones(n, bool)),
                "part": pa.array(key_part)}

    def tag_edge1(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy()
        n = len(a)
        return pa.table({
            "a": t["a"], "b": t["b"],
            "alon": pa.nulls(n, pa.float64()),
            "alat": pa.nulls(n, pa.float64()),
            "_is_pt": pa.array(np.zeros(n, bool)),
            "part": pa.array(hash_part(a, num_parts))})

    def tag_pts(t: pa.Table) -> pa.Table:
        w = t["way_id"].combine_chunks().to_numpy()
        return pa.table(_pt_rows(hash_part(w, num_parts), w,
                                 t["lon"].combine_chunks(),
                                 t["lat"].combine_chunks(), len(w)))

    def attach_a(t: pa.Table) -> pa.Table:
        """Replicate each edge once per a-side vertex."""
        is_pt = t["_is_pt"].combine_chunks().to_numpy(zero_copy_only=False)
        ptt = t.filter(pa.array(is_pt))
        ett = t.filter(pa.array(~is_pt))
        w = ptt["a"].combine_chunks().to_numpy()
        lon = ptt["alon"].combine_chunks().to_numpy()
        lat = ptt["alat"].combine_chunks().to_numpy()
        order = np.argsort(w, kind="stable")
        w, lon, lat = w[order], lon[order], lat[order]
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]]) \
            if len(w) else np.empty(0, np.int64)
        uniq = w[starts] if len(w) else w
        counts = np.diff(np.r_[starts, len(w)]) if len(w) \
            else np.empty(0, np.int64)
        ea = ett["a"].combine_chunks().to_numpy()
        eb = ett["b"].combine_chunks().to_numpy()
        ei = np.searchsorted(uniq, ea)
        ok = (ei < len(uniq))
        ok[ok] &= uniq[ei[ok]] == ea[ok]
        ea, eb, ei = ea[ok], eb[ok], ei[ok]
        rep = counts[ei]
        base = np.repeat(np.cumsum(rep) - rep, rep)
        vidx = np.repeat(starts[ei], rep) \
            + (np.arange(int(rep.sum()), dtype=np.int64) - base)
        out_b = np.repeat(eb, rep)
        return pa.table({
            "a": pa.array(np.repeat(ea, rep)), "b": pa.array(out_b),
            "alon": pa.array(lon[vidx]), "alat": pa.array(lat[vidx]),
            "_is_pt": pa.array(np.zeros(len(out_b), bool)),
            "part": pa.array(hash_part(out_b, num_parts))})

    def hausdorff(t: pa.Table) -> pa.Table:
        from ..util import round_half_away
        is_pt = t["_is_pt"].combine_chunks().to_numpy(zero_copy_only=False)
        ptt = t.filter(pa.array(is_pt))
        ett = t.filter(pa.array(~is_pt))
        w = ptt["a"].combine_chunks().to_numpy()
        plon = ptt["alon"].combine_chunks().to_numpy()
        plat = ptt["alat"].combine_chunks().to_numpy()
        order = np.argsort(w, kind="stable")
        w, plon, plat = w[order], plon[order], plat[order]
        wstarts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]]) \
            if len(w) else np.empty(0, np.int64)
        wuniq = w[wstarts] if len(w) else w
        wcounts = np.diff(np.r_[wstarts, len(w)]) if len(w) \
            else np.empty(0, np.int64)
        ea = ett["a"].combine_chunks().to_numpy()
        eb = ett["b"].combine_chunks().to_numpy()
        alon = ett["alon"].combine_chunks().to_numpy()
        alat = ett["alat"].combine_chunks().to_numpy()
        eorder = np.lexsort((eb, ea))
        ea, eb = ea[eorder], eb[eorder]
        alon, alat = alon[eorder], alat[eorder]
        estarts = np.flatnonzero(
            np.r_[True, (ea[1:] != ea[:-1]) | (eb[1:] != eb[:-1])]) \
            if len(ea) else np.empty(0, np.int64)
        ecounts = np.diff(np.r_[estarts, len(ea)]) if len(ea) \
            else np.empty(0, np.int64)
        out_a, out_b, out_h = [], [], []
        for s, c in zip(estarts, ecounts):
            bway = eb[s]
            bi = np.searchsorted(wuniq, bway)
            if bi >= len(wuniq) or wuniq[bi] != bway:
                continue  # b-side unresolved: no vertex pair exists
            bs, bc = wstarts[bi], wcounts[bi]
            p1 = alat[s:s + c, None] * d2r
            p2 = plat[None, bs:bs + bc] * d2r
            sdp = np.sin((p2 - p1) / 2.0)
            sdl = np.sin((plon[None, bs:bs + bc]
                          - alon[s:s + c, None]) * d2r / 2.0)
            aa = np.minimum(sdp * sdp + np.cos(p1) * np.cos(p2)
                            * sdl * sdl, 1.0)
            dm = round_half_away(
                2.0 * EARTH_R_M * np.arcsin(np.sqrt(aa)), 3)
            h = max(dm.min(axis=1).max(), dm.min(axis=0).max())
            out_a.append(ea[s])
            out_b.append(bway)
            out_h.append(h)
        return pa.table({
            "a": pa.array(out_a, pa.int64()),
            "b": pa.array(out_b, pa.int64()),
            "hausdorff3": pa.array(out_h, pa.float64())})

    stage1 = edges.map_batches(tag_edge1, batch_format="pyarrow") \
        .union(pts.map_batches(tag_pts, batch_format="pyarrow")) \
        .groupby("part") \
        .map_groups(lambda t: attach_a(t.drop_columns(["part"])),
                    batch_format="pyarrow")
    return stage1 \
        .union(pts.map_batches(tag_pts, batch_format="pyarrow")) \
        .groupby("part") \
        .map_groups(lambda t: hausdorff(t.drop_columns(["part"])),
                    batch_format="pyarrow")


def cell_orientation_entropy(ways: ray.data.Dataset,
                             nodes: ray.data.Dataset,
                             res: int = 14, bins: int = 8, nd: int = 6,
                             num_parts: int = 16) -> ray.data.Dataset:
    """(cell, n_seg, entropy6): per-cell street-grid orientation
    entropy — every way segment's undirected bearing (the way_bearings
    formula, bit-shared with the SQL mirror) folds into ``bins``
    sectors, bucketed by the quadtree cell of the segment MIDPOINT at
    ``res``, and each cell reports its Shannon entropy (natural log)
    over the sector distribution.  The city-grid-orientation analysis
    (regular grids score near 0; organic street nets approach
    ln(bins)).

    Scale plan: coordinates resolve via the broadcast node lookup, ONE
    way-hash exchange co-locates each way's ordered points, the
    per-partition kernel pairs adjacent positions vectorized and
    collapses to (cell, bin) partial counts (bounded by cells x bins
    present, never segments), and ONE bounded cell-hash exchange later
    the final kernel sums counts and computes the entropy per cell —
    the segment stream itself crosses exactly one exchange."""
    from ..geo import tiles
    from ..relational import hash_part

    pts = join_refs_to_coords(ways, nodes)

    def pre(t: pa.Table) -> pa.Table:
        w = t["way_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(w, num_parts)))

    def seg_partial(t: pa.Table) -> pa.Table:
        w = t["way_id"].combine_chunks().to_numpy()
        pos = t["pos"].combine_chunks().to_numpy()
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        order = np.lexsort((pos, w))
        w, lon, lat = w[order], lon[order], lat[order]
        same = w[:-1] == w[1:] if len(w) > 1 else np.empty(0, bool)
        x1, x2 = lon[:-1][same], lon[1:][same]
        y1, y2 = lat[:-1][same], lat[1:][same]
        dx = (x2 - x1) * np.cos(np.radians((y1 + y2) / 2.0))
        theta = np.degrees(np.arctan2(dx, y2 - y1))
        folded = np.fmod(np.fmod(theta, 180.0) + 180.0, 180.0)
        b = np.clip(np.floor(folded / (180.0 / bins)).astype(np.int64),
                    0, bins - 1)
        cell = tiles.cell_id((x1 + x2) / 2.0, (y1 + y2) / 2.0, res)
        # cell ids use the high bits (res << 58): build the composite
        # count key on the block-local dictionary index, not the id
        uc, inv = np.unique(cell, return_inverse=True)
        key = inv.astype(np.int64) * np.int64(bins) + b
        uk, cnt = np.unique(key, return_counts=True)
        out_cell = uc[uk // np.int64(bins)]
        return pa.table({
            "cell": pa.array(out_cell),
            "bin": pa.array(uk % np.int64(bins)),
            "pn": pa.array(cnt.astype(np.int64)),
            "part": pa.array(hash_part(out_cell, num_parts))})

    def entropy_final(t: pa.Table) -> pa.Table:
        from ..util import round_half_away
        g = t.group_by(["cell", "bin"]).aggregate([("pn", "sum")])
        cell = g["cell"].combine_chunks().to_numpy()
        n = g["pn_sum"].combine_chunks().to_numpy().astype(np.float64)
        order = np.lexsort((g["bin"].combine_chunks().to_numpy(), cell))
        cell, n = cell[order], n[order]
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]]) \
            if len(cell) else np.empty(0, np.int64)
        ends = np.r_[starts[1:], len(cell)] if len(cell) \
            else np.empty(0, np.int64)
        out_c, out_n, out_h = [], [], []
        for s, e in zip(starts, ends):
            tot = n[s:e].sum()
            p = n[s:e] / tot
            out_c.append(cell[s])
            out_n.append(int(tot))
            out_h.append(-np.sum(p * np.log(p)))
        return pa.table({
            "cell": pa.array(out_c, pa.int64()),
            "n_seg": pa.array(out_n, pa.int64()),
            "entropy6": pa.array(round_half_away(
                np.array(out_h, np.float64), nd), pa.float64())})

    return pts.map_batches(pre, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby("part") \
        .map_groups(lambda t: seg_partial(t.drop_columns(["part"])),
                    batch_format="pyarrow") \
        .groupby("part") \
        .map_groups(lambda t: entropy_final(t.drop_columns(["part"])),
                    batch_format="pyarrow")


def way_frechet(ways: ray.data.Dataset, nodes: ray.data.Dataset,
                num_parts: int = 16,
                chunk_pairs: int = 2048,
                edges: ray.data.Dataset | None = None) -> ray.data.Dataset:
    """(a, b, frechet3): DISCRETE Frechet distance (meters, haversine
    on the EARTH_R_M sphere, every vertex-pair distance rounded
    half-away at 3 dp BEFORE the DP lattice so the scalar oracle is
    exact) between every pair of ways sharing >= 1 node.  Unlike
    way_hausdorff this respects VERTEX ORDER — the conflation metric
    for directed traces (GPS-track-vs-way matching), where a reversed
    or re-ordered geometry must score far even when the point SETS
    coincide.

    Scale plan: way_hausdorff's two bounded hash exchanges, with the
    vertex position carried so order survives the shuffle; the kernel
    runs the O(|A| x |B|) Frechet DP for ALL pairs of a chunk AT ONCE
    on a padded (pairs, maxA, maxB) distance tensor — the coupled
    recurrence iterates maxA x maxB times but each step is vectorized
    across the chunk, so per-pair work is numpy, not python.  Ways are
    short by construction (p99 ~13 vertices); chunk_pairs bounds the
    tensor at roughly chunk_pairs x maxlen^2 x 8 B.

    ``edges`` overrides the candidate pair set (schema (a, b) int64,
    a < b, deduped) — way_conflate passes the shared-node ∪ geometric
    grid-candidate union so truly disjoint duplicate geometries are
    scored too."""
    from ..relational import hash_part

    pts = join_refs_to_coords(ways, nodes) \
        .select_columns(["way_id", "pos", "lon", "lat"])
    if edges is None:
        edges = full_shared_node_edges(ways, num_parts)
    d2r = np.pi / 180.0

    def tag_edge1(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy()
        n = len(a)
        return pa.table({
            "a": t["a"], "b": t["b"],
            "apos": pa.nulls(n, pa.int64()),
            "alon": pa.nulls(n, pa.float64()),
            "alat": pa.nulls(n, pa.float64()),
            "_is_pt": pa.array(np.zeros(n, bool)),
            "part": pa.array(hash_part(a, num_parts))})

    def tag_pts(t: pa.Table) -> pa.Table:
        w = t["way_id"].combine_chunks().to_numpy()
        return pa.table({
            "a": pa.array(w), "b": pa.nulls(len(w), pa.int64()),
            "apos": t["pos"].combine_chunks().cast(pa.int64()),
            "alon": t["lon"].combine_chunks(),
            "alat": t["lat"].combine_chunks(),
            "_is_pt": pa.array(np.ones(len(w), bool)),
            "part": pa.array(hash_part(w, num_parts))})

    def attach_a(t: pa.Table) -> pa.Table:
        """Replicate each edge once per ORDERED a-side vertex.  Edge
        pairs are DEDUPED here first: the stage is partitioned by
        hash(a), so every copy of an (a, b) pair lands in this kernel —
        callers (way_conflate's shared ∪ grid union) may therefore feed
        a pair stream with duplicates and skip their own dedup
        exchange; already-unique streams pass through unchanged."""
        is_pt = t["_is_pt"].combine_chunks().to_numpy(zero_copy_only=False)
        ptt = t.filter(pa.array(is_pt))
        ett = t.filter(pa.array(~is_pt))
        w = ptt["a"].combine_chunks().to_numpy()
        pos = ptt["apos"].combine_chunks().to_numpy()
        lon = ptt["alon"].combine_chunks().to_numpy()
        lat = ptt["alat"].combine_chunks().to_numpy()
        order = np.lexsort((pos, w))
        w, pos, lon, lat = w[order], pos[order], lon[order], lat[order]
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]]) \
            if len(w) else np.empty(0, np.int64)
        uniq = w[starts] if len(w) else w
        counts = np.diff(np.r_[starts, len(w)]) if len(w) \
            else np.empty(0, np.int64)
        ea = ett["a"].combine_chunks().to_numpy()
        eb = ett["b"].combine_chunks().to_numpy()
        if len(ea):
            eorder = np.lexsort((eb, ea))
            ea, eb = ea[eorder], eb[eorder]
            ekeep = np.ones(len(ea), bool)
            ekeep[1:] = (ea[1:] != ea[:-1]) | (eb[1:] != eb[:-1])
            ea, eb = ea[ekeep], eb[ekeep]
        ei = np.searchsorted(uniq, ea)
        ok = (ei < len(uniq))
        ok[ok] &= uniq[ei[ok]] == ea[ok]
        ea, eb, ei = ea[ok], eb[ok], ei[ok]
        rep = counts[ei]
        base = np.repeat(np.cumsum(rep) - rep, rep)
        off = np.arange(int(rep.sum()), dtype=np.int64) - base
        vidx = np.repeat(starts[ei], rep) + off
        out_b = np.repeat(eb, rep)
        return pa.table({
            "a": pa.array(np.repeat(ea, rep)), "b": pa.array(out_b),
            "apos": pa.array(off),  # contiguous order within (a, b)
            "alon": pa.array(lon[vidx]), "alat": pa.array(lat[vidx]),
            "_is_pt": pa.array(np.zeros(len(out_b), bool)),
            "part": pa.array(hash_part(out_b, num_parts))})

    def _frechet_chunk(alon, alat, astarts, acnt, blon, blat, bstarts,
                       bcnt) -> np.ndarray:
        """Batched padded DP; inputs are per-pair slices into the flat
        a-vertex / b-vertex arrays (chunk-local)."""
        P = len(acnt)
        An, Bn = int(acnt.max()), int(bcnt.max())
        # flat (p, i, j) index triples for every VALID cell
        per = acnt * bcnt
        tot = int(per.sum())
        p_of = np.repeat(np.arange(P, dtype=np.int64), per)
        cell = np.arange(tot, dtype=np.int64) \
            - np.repeat(np.cumsum(per) - per, per)
        i_of = cell // np.repeat(bcnt, per)
        j_of = cell % np.repeat(bcnt, per)
        ai = np.repeat(astarts, per) + i_of
        bj = np.repeat(bstarts, per) + j_of
        p1 = alat[ai] * d2r
        p2 = blat[bj] * d2r
        sdp = np.sin((p2 - p1) / 2.0)
        sdl = np.sin((blon[bj] - alon[ai]) * d2r / 2.0)
        aa = np.minimum(sdp * sdp + np.cos(p1) * np.cos(p2)
                        * sdl * sdl, 1.0)
        dm = round_half_away(2.0 * EARTH_R_M * np.arcsin(np.sqrt(aa)), 3)
        d = np.full((P, An, Bn), np.inf)
        d[p_of, i_of, j_of] = dm
        ans = np.full(P, np.inf)
        dp_prev = np.full((P, Bn), np.inf)
        last_row = acnt - 1
        ans_col = bcnt - 1
        for i in range(An):
            dp_new = np.empty((P, Bn))
            dp_new[:, 0] = d[:, i, 0] if i == 0 \
                else np.maximum(dp_prev[:, 0], d[:, i, 0])
            for j in range(1, Bn):
                e = np.minimum(np.minimum(dp_prev[:, j],
                                          dp_prev[:, j - 1]),
                               dp_new[:, j - 1])
                dp_new[:, j] = np.maximum(d[:, i, j], e)
            hit = last_row == i
            if hit.any():
                ans[hit] = dp_new[hit, ans_col[hit]]
            dp_prev = dp_new
        return ans

    def frechet(t: pa.Table) -> pa.Table:
        is_pt = t["_is_pt"].combine_chunks().to_numpy(zero_copy_only=False)
        ptt = t.filter(pa.array(is_pt))
        ett = t.filter(pa.array(~is_pt))
        w = ptt["a"].combine_chunks().to_numpy()
        bpos = ptt["apos"].combine_chunks().to_numpy()
        plon = ptt["alon"].combine_chunks().to_numpy()
        plat = ptt["alat"].combine_chunks().to_numpy()
        order = np.lexsort((bpos, w))
        w, plon, plat = w[order], plon[order], plat[order]
        wstarts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]]) \
            if len(w) else np.empty(0, np.int64)
        wuniq = w[wstarts] if len(w) else w
        wcounts = np.diff(np.r_[wstarts, len(w)]) if len(w) \
            else np.empty(0, np.int64)
        ea = ett["a"].combine_chunks().to_numpy()
        eb = ett["b"].combine_chunks().to_numpy()
        apos = ett["apos"].combine_chunks().to_numpy()
        alon = ett["alon"].combine_chunks().to_numpy()
        alat = ett["alat"].combine_chunks().to_numpy()
        eorder = np.lexsort((apos, eb, ea))
        ea, eb = ea[eorder], eb[eorder]
        alon, alat = alon[eorder], alat[eorder]
        estarts = np.flatnonzero(
            np.r_[True, (ea[1:] != ea[:-1]) | (eb[1:] != eb[:-1])]) \
            if len(ea) else np.empty(0, np.int64)
        ecounts = np.diff(np.r_[estarts, len(ea)]) if len(ea) \
            else np.empty(0, np.int64)
        # resolve the b-side vertex slice for every (a, b) pair
        bkey = eb[estarts] if len(ea) else np.empty(0, np.int64)
        bi = np.searchsorted(wuniq, bkey)
        okb = (bi < len(wuniq))
        okb[okb] &= wuniq[bi[okb]] == bkey[okb]
        out_a, out_b, out_f = [], [], []
        sel = np.flatnonzero(okb)
        for c0 in range(0, len(sel), chunk_pairs):
            idx = sel[c0:c0 + chunk_pairs]
            f = _frechet_chunk(alon, alat, estarts[idx], ecounts[idx],
                               plon, plat, wstarts[bi[idx]],
                               wcounts[bi[idx]])
            out_a.append(ea[estarts[idx]])
            out_b.append(bkey[idx])
            out_f.append(f)
        if not out_a:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "frechet3": pa.array([], pa.float64())})
        return pa.table({
            "a": pa.array(np.concatenate(out_a)),
            "b": pa.array(np.concatenate(out_b)),
            "frechet3": pa.array(np.concatenate(out_f), pa.float64())})

    stage1 = edges.map_batches(tag_edge1, batch_format="pyarrow") \
        .union(pts.map_batches(tag_pts, batch_format="pyarrow")) \
        .groupby("part") \
        .map_groups(lambda t: attach_a(t.drop_columns(["part"])),
                    batch_format="pyarrow")
    return stage1 \
        .union(pts.map_batches(tag_pts, batch_format="pyarrow")) \
        .groupby("part") \
        .map_groups(lambda t: frechet(t.drop_columns(["part"])),
                    batch_format="pyarrow")


def way_pseudo_diameter(ways: ray.data.Dataset,
                        num_parts: int = 16,
                        max_hops: int = 128) -> ray.data.Dataset:
    """(component, n_ways, diameter): double-sweep pseudo-diameter of
    every connected component of the shared-node way graph — BFS from
    the component's canonical (min-id) way, then BFS from the farthest
    way found (ties min id); the second eccentricity is the classic
    lower bound that is exact on trees and near-exact on road
    networks.  Hop counts run on the BIPARTITE way<->ref graph
    (dist // 2 is the exact shared-node hop count, see way_bfs_depth).

    Scale plan: the bipartite edge shards build ONCE and both BFS
    phases run on the same resident BSP actors' files; each phase
    exchanges only frontier (node, dist) messages.  Between phases,
    depths join component labels by ONE way-hash co-partition (the
    union-tag pattern — no Dataset.join), collapse to per-partition
    (component, argmax) partials, and only per-COMPONENT rows (seeds,
    n_ways, eccentricities) ever reach the driver — bounded by the
    component count, never ways."""
    from ..relational import hash_part, single_merge
    from ..state.bsp import run_bfs
    from .text import shard_static_edges

    comp = way_components(ways, num_parts).materialize()

    def comp_ids(t: pa.Table) -> pa.Table:
        c = t["component_id"].combine_chunks().to_numpy()
        return pa.table({"c": pa.array(np.unique(c))})

    seeds1 = np.unique(np.concatenate([
        b["c"].combine_chunks().to_numpy() for b in ray.get(
            comp.map_batches(comp_ids, batch_format="pyarrow")
            .to_arrow_refs()) if b.num_rows] or
        [np.empty(0, np.int64)]))

    def bipartite(t: pa.Table) -> pa.Table:
        w = t["way_id"].combine_chunks().to_numpy()
        r = t["ref"].combine_chunks().to_numpy()
        return pa.table({"a": pa.array(w * 2),
                         "b": pa.array(r * 2 + 1)})

    pairs = explode_refs(ways).select_columns(["way_id", "ref"]) \
        .map_batches(bipartite, batch_format="pyarrow")
    d, has_shard, owned = shard_static_edges(pairs, num_parts)

    def _tag(ds: ray.data.Dataset, is_depth: bool) -> ray.data.Dataset:
        def f(t: pa.Table) -> pa.Table:
            w = t["way_id"].combine_chunks().to_numpy()
            if is_depth:
                dep = t["depth"].combine_chunks().to_numpy()
                c = np.full(len(w), -1, np.int64)
            else:
                dep = np.full(len(w), -1, np.int64)
                c = t["component_id"].combine_chunks().to_numpy()
            return pa.table({
                "w": pa.array(w), "dep": pa.array(dep), "c": pa.array(c),
                "part": pa.array(hash_part(w, num_parts))})
        return ds.map_batches(f, batch_format="pyarrow")

    def _join_depth(depth_ds: ray.data.Dataset) -> ray.data.Dataset:
        """co-partition comp + depth; emit per-(partition, component)
        partials: n_ways, max depth, argmax way (depth desc, way asc).
        Ways absent from the BFS universe (no refs) count depth 0."""
        def kernel(t: pa.Table) -> pa.Table:
            c_rows = t.filter(pc.greater_equal(t["c"], 0))
            d_rows = t.filter(pc.greater_equal(t["dep"], 0))
            w = c_rows["w"].combine_chunks().to_numpy()
            c = c_rows["c"].combine_chunks().to_numpy()
            dw = d_rows["w"].combine_chunks().to_numpy()
            dd = d_rows["dep"].combine_chunks().to_numpy()
            dorder = np.argsort(dw, kind="stable")
            dw, dd = dw[dorder], dd[dorder]
            if len(dw):
                j = np.clip(np.searchsorted(dw, w), 0, len(dw) - 1)
                dep = np.where(dw[j] == w, dd[j], 0)
            else:
                dep = np.zeros(len(w), np.int64)
            order = np.lexsort((w, -dep, c))
            c_o, w_o, dep_o = c[order], w[order], dep[order]
            starts = np.flatnonzero(np.r_[True, c_o[1:] != c_o[:-1]]) \
                if len(c_o) else np.empty(0, np.int64)
            n = np.diff(np.r_[starts, len(c_o)]) if len(c_o) \
                else np.empty(0, np.int64)
            return pa.table({
                "component": pa.array(c_o[starts]),
                "n_ways": pa.array(n, pa.int64()),
                "ecc": pa.array(dep_o[starts], pa.int64()),
                "far_way": pa.array(w_o[starts], pa.int64())})
        return (_tag(comp, False).union(_tag(depth_ds, True))
                .groupby("part")
                .map_groups(lambda t: kernel(t.drop_columns(["part"])),
                            batch_format="pyarrow"))

    def _merge_pick(t: pa.Table) -> pa.Table:
        c = t["component"].combine_chunks().to_numpy()
        n = t["n_ways"].combine_chunks().to_numpy()
        e = t["ecc"].combine_chunks().to_numpy()
        f = t["far_way"].combine_chunks().to_numpy()
        order = np.lexsort((f, -e, c))
        c_o, e_o, f_o = c[order], e[order], f[order]
        starts = np.flatnonzero(np.r_[True, c_o[1:] != c_o[:-1]]) \
            if len(c_o) else np.empty(0, np.int64)
        nsum = np.zeros(len(starts), np.int64)
        if len(c_o):
            grp = np.cumsum(np.r_[True, c_o[1:] != c_o[:-1]]) - 1
            np.add.at(nsum, grp, n[order])
        return pa.table({
            "component": pa.array(c_o[starts]),
            "n_ways": pa.array(nsum, pa.int64()),
            "ecc": pa.array(e_o[starts], pa.int64()),
            "far_way": pa.array(f_o[starts], pa.int64())})

    p1 = single_merge(_join_depth(run_bfs(
        d, has_shard, num_parts, max_rounds=2 * max_hops,
        seed_ways=seeds1)), _merge_pick).take_all()
    seeds2 = np.array(sorted(r["far_way"] for r in p1), np.int64)
    n_of = {int(r["component"]): int(r["n_ways"]) for r in p1}

    p2 = single_merge(_join_depth(run_bfs(
        d, has_shard, num_parts, max_rounds=2 * max_hops,
        seed_ways=seeds2, cleanup=owned)), _merge_pick).take_all()
    comps = sorted(int(r["component"]) for r in p2)
    diam = {int(r["component"]): int(r["ecc"]) for r in p2}
    return ray.data.from_arrow(pa.table({
        "component": pa.array(comps, pa.int64()),
        "n_ways": pa.array([n_of[c] for c in comps], pa.int64()),
        "diameter": pa.array([diam[c] for c in comps], pa.int64())}))


def osm_tag_cooccurrence(ways: ray.data.Dataset, n_ways: int,
                         num_parts: int = 8,
                         nd: int = 6) -> ray.data.Dataset:
    """(k1, k2, n_pair, pmi6): pointwise mutual information between
    tag KEYS across ways — PMI = ln(n_pair * N / (n_k1 * n_k2)) over
    distinct-key-per-way occurrences, the tag-schema discovery /
    preset-mining analysis (which keys travel together: building +
    landuse, highway + maxspeed).

    Scale plan: per-block kernels emit (key) and (k1 < k2) clique
    partials over each way's DISTINCT key set (ways carry a handful of
    tags, so the clique is O(tags^2) per way, bounded); pair partials
    merge through one bounded hash exchange (partial_groupby_agg), and
    the per-key count table — bounded by the tag-key vocabulary, which
    is small by OSM's nature — broadcasts into the final PMI pass."""
    from ..relational import broadcast_table, partial_groupby_agg

    def _way_keys(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """(per-way distinct-key counts, flat sorted-distinct keys) —
        vectorized: lexsort (row, key), adjacent-dup mask, bincount."""
        lst = t["tags"].combine_chunks()
        offs = np.asarray(lst.offsets, np.int64)
        offs = offs - offs[0]
        keys = np.asarray(lst.flatten().field("key").to_pylist(),
                          dtype=object)
        n_rows = len(offs) - 1
        lens = np.diff(offs)
        row = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
        if not len(keys):
            return np.zeros(n_rows, np.int64), keys
        order = np.lexsort((keys, row))
        row, keys = row[order], keys[order]
        keep = np.r_[True, (row[1:] != row[:-1]) | (keys[1:] != keys[:-1])]
        row, keys = row[keep], keys[keep]
        return np.bincount(row, minlength=n_rows).astype(np.int64), keys

    def key_partial(t: pa.Table) -> pa.Table:
        _, flat = _way_keys(t)
        u, c = np.unique(flat, return_counts=True)
        return pa.table({"k": pa.array(u.astype(str)),
                         "n": pa.array(c.astype(np.int64))})

    def pair_partial(t: pa.Table) -> pa.Table:
        counts, flat = _way_keys(t)
        if not len(flat):
            return pa.table({"k1": pa.array([], pa.string()),
                             "k2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        pos = np.arange(len(flat), dtype=np.int64)
        starts = np.cumsum(counts) - counts
        rep = np.repeat(counts, counts) - (pos - np.repeat(starts,
                                                           counts)) - 1
        first = np.repeat(pos, rep)
        base = np.repeat(np.cumsum(rep) - rep, rep)
        second = first + 1 + (np.arange(int(rep.sum()), dtype=np.int64)
                              - base)
        tb = pa.table({"k1": pa.array(flat[first].astype(str)),
                       "k2": pa.array(flat[second].astype(str)),
                       "n": pa.array(np.ones(len(first), np.int64))})
        g = tb.group_by(["k1", "k2"]).aggregate([("n", "sum")])
        return g.rename_columns(["k1", "k2", "n"])

    kc = broadcast_table(
        partial_groupby_agg(
            ways.map_batches(key_partial, batch_format="pyarrow"),
            ["k"], [("n", "sum")], num_parts=num_parts),
        ["k", "n_sum"])
    pairs = partial_groupby_agg(
        ways.map_batches(pair_partial, batch_format="pyarrow"),
        ["k1", "k2"], [("n", "sum")], num_parts=num_parts)

    state: dict = {}

    def pmi(t: pa.Table) -> pa.Table:
        if "lut" not in state:
            v = ray.get(kc)
            state["lut"] = dict(zip(v["k"].to_pylist(),
                                    v["n_sum"].to_pylist()))
        lut = state["lut"]
        k1 = t["k1"].combine_chunks().to_pylist()
        k2 = t["k2"].combine_chunks().to_pylist()
        n = t["n_sum"].combine_chunks().to_numpy()
        ca = np.array([lut[k] for k in k1], np.int64)
        cb = np.array([lut[k] for k in k2], np.int64)
        val = np.log(n.astype(np.float64) * float(n_ways)
                     / (ca * cb).astype(np.float64))
        return pa.table({
            "k1": pa.array(k1, pa.string()),
            "k2": pa.array(k2, pa.string()),
            "n_pair": pa.array(n.astype(np.int64)),
            "pmi6": pa.array(round_half_away(val, nd), pa.float64())})

    return pairs.map_batches(pmi, batch_format="pyarrow")


def way_turn_stats(ways: ray.data.Dataset, nodes: ray.data.Dataset,
                   nd: int = 6,
                   num_parts: int = 16) -> ray.data.Dataset:
    """(way_id, n_turns, total_turn6, max_turn6): per-way curvature —
    at every interior vertex the DIRECTED equirectangular bearing
    change between the incoming and outgoing segment, folded to
    (-180, 180], absolute-summed and maxed.  The route-geometry
    quality screen (switchback detection, digitization-zigzag
    flagging) on top of the way model.

    Scale plan: the way_bearings skeleton — broadcast node lookup, ONE
    way-hash exchange, per-partition vectorized kernel (adjacent
    segment pairs via two shifted masks, no per-way loop); bearings
    and the fmod fold run the exact SQL term order so turns agree to
    the 6 dp round."""
    from ..relational import hash_part

    pts = join_refs_to_coords(ways, nodes)

    def pre(t: pa.Table) -> pa.Table:
        w = t["way_id"].combine_chunks().to_numpy()
        return t.append_column("part", pa.array(hash_part(w, num_parts)))

    def kernel(t: pa.Table) -> pa.Table:
        w = t["way_id"].combine_chunks().to_numpy()
        pos = t["pos"].combine_chunks().to_numpy()
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        order = np.lexsort((pos, w))
        w, lon, lat = w[order], lon[order], lat[order]
        same = w[:-1] == w[1:] if len(w) > 1 else np.empty(0, bool)
        dx = (lon[1:] - lon[:-1]) \
            * np.cos(np.radians((lat[:-1] + lat[1:]) / 2.0))
        theta = np.degrees(np.arctan2(dx, lat[1:] - lat[:-1]))
        # interior vertices: segment i and i+1 both within one way
        inner = same[:-1] & same[1:] if len(same) > 1 \
            else np.empty(0, bool)
        d = theta[1:][inner] - theta[:-1][inner]
        turn = np.abs(np.fmod(np.fmod(d, 360.0) + 540.0, 360.0) - 180.0)
        wway = w[1:-1][inner] if len(w) > 2 else np.empty(0, np.int64)
        if not len(wway):
            return pa.table({"way_id": pa.array([], pa.int64()),
                             "n_turns": pa.array([], pa.int64()),
                             "total_turn6": pa.array([], pa.float64()),
                             "max_turn6": pa.array([], pa.float64())})
        starts = np.flatnonzero(np.r_[True, wway[1:] != wway[:-1]])
        n = np.diff(np.r_[starts, len(wway)])
        tot = np.add.reduceat(turn, starts)
        mx = np.maximum.reduceat(turn, starts)
        return pa.table({
            "way_id": pa.array(wway[starts]),
            "n_turns": pa.array(n.astype(np.int64)),
            "total_turn6": pa.array(round_half_away(tot, nd),
                                    pa.float64()),
            "max_turn6": pa.array(round_half_away(mx, nd),
                                  pa.float64())})

    return (pts.map_batches(pre, batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda t: kernel(t.drop_columns(["part"])),
                        batch_format="pyarrow"))


#: Conflation geometric-candidate grid: cell edge in degrees (~278 m of
#: latitude — >= the default eps_m=250), the skew cap on ways
#: considered per cell (minhash MAX_BUCKET house pattern: ascending-id
#: truncation so the cap is deterministic and oracle-mirrorable), and
#: the signature-alignment prune: grid pairs survive only if the MAX
#: haversine over the k arc-length-ALIGNED resample points (each 3 dp
#: rounded — the house scalar-exact grid) is <= CONFLATE_SIG_GATE_M.
#: 2x eps_m leaves generous recall margin (a Frechet<=250 m duplicate
#: has aligned-signature distance ~ the jitter, far under 500 m) while
#: pruning the dense-cell false candidates that would otherwise feed
#: the quadratic Frechet DP.
CONFLATE_GRID_DEG = 0.0025
CONFLATE_MAX_CELL = 4096
CONFLATE_SIG_GATE_M = 500.0


def conflate_candidate_edges(ways: ray.data.Dataset,
                             nodes: ray.data.Dataset,
                             num_parts: int = 16) -> ray.data.Dataset:
    """(a < b) conflation candidate pairs: the shared-node clique edges
    UNION cell-bucketed geometric candidates, so truly disjoint
    duplicate geometries (separate imports of the same corridor share
    zero node ids) still become candidates — VERDICT r4 next #3.  The
    stream may carry cross-source/cross-partition duplicates; the
    consumer (way_frechet's hash(a)-partitioned attach_a kernel)
    performs the global dedup, saving a dedicated exchange.

    Geometric rule (LSH-style, recall documented not proven, exactly
    mirrored by the pyoracle gate): each way's k=8 equal-arclength
    resample signature (way_resample — already driver-gated bit-equal
    at 6 dp) contributes its MIDPOINT (pt_idx = k//2); the midpoint is
    quantized to a CONFLATE_GRID_DEG grid and emitted into its home
    cell plus the 8 neighbors; every distinct way pair co-emitted into
    a cell whose aligned-signature distance (max 3 dp haversine over
    the k aligned resample points) is <= CONFLATE_SIG_GATE_M is a
    candidate — any pair whose midpoints lie within 2 grid cells
    (~556 m) Chebyshev is bucketed, comfortably covering eps_m=250
    midpoint separations, and the signature prune (measured: 682k ->
    ~shared-scale pairs at sf0.1) keeps the downstream Frechet DP off
    dense-cell false candidates.  Per-cell skew is capped at
    CONFLATE_MAX_CELL ascending ids (the minhash hot-bucket pattern).

    Physical plan: the signature build FUSES into the way scan (the
    _resample_wide kernel + broadcast nodes — zero exchanges, 1 wide
    row/way, 16 doubles); 9x cell emission then ONE hash(cell)
    exchange generates and signature-filters pairs, and ONE hash(a)
    exchange globally dedups against the shared-node edges — no
    all-pairs, no driver materialization."""
    from ..relational import broadcast_table, hash_part
    from ..util import round_half_away as _rnd

    shared = full_shared_node_edges(ways, num_parts)
    nodes_ref = broadcast_table(nodes, ["id", "lon", "lat"])
    k = RESAMPLE_K
    half_k = k // 2
    d2r = np.pi / 180.0

    def emit_cells(batch: pa.Table) -> pa.Table:
        """Fused resample-signature + 9-cell-neighborhood emission,
        keyed by the quantized midpoint."""
        wid, lon_m, lat_m = _resample_wide(batch, ray.get(nodes_ref), k)
        cx = np.floor(lon_m[:, half_k] / CONFLATE_GRID_DEG).astype(np.int64)
        cy = np.floor(lat_m[:, half_k] / CONFLATE_GRID_DEG).astype(np.int64)
        off = np.arange(-1, 2, dtype=np.int64)
        dx = np.tile(np.repeat(off, 3), len(wid))
        dy = np.tile(np.tile(off, 3), len(wid))
        cell = ((np.repeat(cx, 9) + dx + 200_000) * 1_000_000
                + (np.repeat(cy, 9) + dy + 200_000))
        rep = np.repeat(np.arange(len(wid), dtype=np.int64), 9)
        return pa.table({
            "cell": pa.array(cell), "way_id": pa.array(wid[rep]),
            "sig_lon": pa.FixedSizeListArray.from_arrays(
                pa.array(lon_m[rep].ravel()), k),
            "sig_lat": pa.FixedSizeListArray.from_arrays(
                pa.array(lat_m[rep].ravel()), k),
            "part": pa.array(hash_part(cell, num_parts))})

    def _sig_dist(alon, alat, blon, blat) -> np.ndarray:
        """Max 3dp-rounded haversine over aligned points; (P, k) in."""
        p1, p2 = alat * d2r, blat * d2r
        sdp = np.sin((p2 - p1) / 2.0)
        sdl = np.sin((blon - alon) * d2r / 2.0)
        aa = np.minimum(sdp * sdp + np.cos(p1) * np.cos(p2) * sdl * sdl,
                        1.0)
        d = _rnd(2.0 * EARTH_R_M * np.arcsin(np.sqrt(aa)), 3)
        return d.max(axis=1)

    def cell_pairs(t: pa.Table) -> pa.Table:
        """Vectorized grouped pair generation (the clique_pairs
        rep/cumsum trick) + one batched signature-distance gate."""
        c = t["cell"].combine_chunks().to_numpy()
        w = t["way_id"].combine_chunks().to_numpy()
        slon = t["sig_lon"].combine_chunks().flatten().to_numpy() \
            .reshape(-1, k)
        slat = t["sig_lat"].combine_chunks().flatten().to_numpy() \
            .reshape(-1, k)
        order = np.lexsort((w, c))
        c, w = c[order], w[order]
        slon, slat = slon[order], slat[order]
        if not len(c):
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        counts = np.diff(np.r_[starts, len(c)])
        # per-cell ascending-id truncation at the skew cap
        pos = np.arange(len(c), dtype=np.int64) - np.repeat(starts, counts)
        inside = pos < CONFLATE_MAX_CELL
        c, w = c[inside], w[inside]
        slon, slat = slon[inside], slat[inside]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]]) \
            if len(c) else np.empty(0, np.int64)
        counts = np.diff(np.r_[starts, len(c)]) if len(c) \
            else np.empty(0, np.int64)
        pos = np.arange(len(w), dtype=np.int64)
        rep = np.repeat(counts, counts) - (pos - np.repeat(starts,
                                                           counts)) - 1
        first_idx = np.repeat(pos, rep)
        base = np.repeat(np.cumsum(rep) - rep, rep)
        second_idx = first_idx + 1 + (np.arange(rep.sum(),
                                                dtype=np.int64) - base)
        dist = _sig_dist(slon[first_idx], slat[first_idx],
                         slon[second_idx], slat[second_idx])
        keep = dist <= CONFLATE_SIG_GATE_M
        a, b = w[first_idx[keep]], w[second_idx[keep]]
        if len(a):
            order = np.lexsort((b, a))
            a, b = a[order], b[order]
            kp = np.ones(len(a), bool)
            kp[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            a, b = a[kp], b[kp]
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64())})

    grid = ways.select_columns(["id", "refs"]) \
        .map_batches(emit_cells, batch_format="pyarrow") \
        .groupby("part") \
        .map_groups(lambda t: cell_pairs(t.drop_columns(["part"])),
                    batch_format="pyarrow")
    # No dedup exchange here: way_frechet's attach_a kernel (partitioned
    # by hash(a)) globally dedups the pair stream, so the shared ∪ grid
    # union may carry cross-source duplicates — one exchange saved.
    return shared.union(grid)


def way_conflate(ways: ray.data.Dataset, nodes: ray.data.Dataset,
                 eps_m: float = 250.0,
                 num_parts: int = 16) -> ray.data.Dataset:
    """(way_id, keeper, is_dup): geometric CONFLATION dedup — ways
    whose discrete Frechet distance is <= ``eps_m`` meters merge into
    one cluster (transitive closure) and every way maps to its
    cluster's min-id keeper.  The near-duplicate-geometry purge the
    dedup family runs on documents, applied to the way model: a map
    built from overlapping imports keeps one rendition per corridor.

    Scale plan: candidate pairs are conflate_candidate_edges' —
    shared-node clique edges UNION the cell-bucketed geometric
    candidates (resample-midpoint grid LSH, CONFLATE_MAX_CELL skew
    cap), so disjoint duplicate geometries — the actual conflation use
    case — are scored too; the filtered pair graph plus self-edges
    runs the static-shard pointer-jumping components BSP, so the
    closure exchanges only labels."""
    from .text import min_label_components_static

    cand = conflate_candidate_edges(ways, nodes, num_parts=num_parts)
    pairs = way_frechet(ways, nodes, num_parts=num_parts, edges=cand)

    def close_pairs(t: pa.Table) -> pa.Table:
        keep = pc.less_equal(t["frechet3"], eps_m)
        f = t.filter(keep)
        return pa.table({"a": f["a"], "b": f["b"]})

    def self_edges(t: pa.Table) -> pa.Table:
        w = t["id"].combine_chunks()
        return pa.table({"a": w, "b": w})

    graph = pairs.map_batches(close_pairs, batch_format="pyarrow").union(
        ways.select_columns(["id"])
        .map_batches(self_edges, batch_format="pyarrow")).materialize()
    # dedup_keep's scale switch, identical output: the filtered pair
    # graph + self-edges is tiny after the Frechet gate, so the
    # one-guarded-task union-find skips the BSP actor spin-up; past the
    # guard the static-edge pointer-jumping BSP takes over.
    if graph.count() > 2_000_000:
        comps = min_label_components_static(graph, num_parts=num_parts)
    else:
        from .text import dedup_groups
        comps = dedup_groups(graph)

    def finish(t: pa.Table) -> pa.Table:
        w = t["doc_id"].combine_chunks().to_numpy()
        lab = t["group_id"].combine_chunks().to_numpy()
        return pa.table({"way_id": pa.array(w),
                         "keeper": pa.array(lab),
                         "is_dup": pa.array(lab != w)})

    return comps.map_batches(finish, batch_format="pyarrow")


def way_adamic_adar(ways: ray.data.Dataset,
                    num_parts: int = 16) -> ray.data.Dataset:
    """(a, b, common, aa6): Adamic-Adar link prediction over the true
    shared-node way graph — each connected-candidate pair scored
    sum over common neighbors z of 1/ln(deg(z)), the degree-discounted
    sibling of way_jaccard (hub neighbors count less).

    Physical plan (TWO bounded exchanges past the shared edge build,
    one fewer than way_jaccard: the weight depends only on the CENTER's
    degree, which the per-center kernel knows for free):
      1. deduped edges (full_shared_node_edges) explode both directions
         and exchange by hash(center) — each z's whole neighbor list in
         one partition, deg(z) = its local count;
      2. per center: vectorized clique pairs (x < y) tagged d = deg(z),
         partial-counted per (x, y, d) in-kernel;
      3. one hash(x) exchange; the final kernel Acero-sums cnt per
         (x, y, d) then accumulates aa = sum cnt/ln(d) in ASCENDING-d
         sequential order (np.add.reduceat), bit-matching the oracle's
         ordered aggregate.  deg(z) = 1 centers produce no pairs, so
         ln(d) is never 0.  Per-center emission is quadratic in degree
         — the way_triangles clique-cap consideration applies at web
         scale."""
    from ..relational import hash_part

    edges = full_shared_node_edges(ways, num_parts)

    def bi(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy()
        b = t["b"].combine_chunks().to_numpy()
        z = np.concatenate([a, b])
        v = np.concatenate([b, a])
        return pa.table({"z": pa.array(z), "v": pa.array(v),
                         "part": pa.array(hash_part(z, num_parts))})

    def per_center(t: pa.Table) -> pa.Table:
        z = t["z"].combine_chunks().to_numpy()
        v = t["v"].combine_chunks().to_numpy()
        order = np.lexsort((v, z))
        z, v = z[order], v[order]
        starts = np.flatnonzero(np.r_[True, z[1:] != z[:-1]]) \
            if len(z) else np.empty(0, np.int64)
        counts = np.diff(np.r_[starts, len(z)]) if len(z) \
            else np.empty(0, np.int64)
        pos = np.arange(len(v), dtype=np.int64)
        rep = np.repeat(counts, counts) - (pos - np.repeat(starts,
                                                           counts)) - 1
        first_idx = np.repeat(pos, rep)
        base = np.repeat(np.cumsum(rep) - rep, rep)
        second_idx = first_idx + 1 + (np.arange(rep.sum(),
                                                dtype=np.int64) - base)
        x, y = v[first_idx], v[second_idx]      # x < y (v sorted per z)
        d = np.repeat(np.repeat(counts, counts), rep)  # deg of center
        g = pa.table({"x": pa.array(x), "y": pa.array(y),
                      "d": pa.array(d),
                      "one": pa.array(np.ones(len(x), np.int64))}) \
            .group_by(["x", "y", "d"]).aggregate([("one", "sum")])
        gx = g["x"].combine_chunks().to_numpy()
        return pa.table({
            "x": g["x"], "y": g["y"], "d": g["d"],
            "cnt": pc.cast(g["one_sum"], pa.int64()),
            "part": pa.array(hash_part(gx, num_parts))})

    def score(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by(["x", "y", "d"]) \
            .aggregate([("cnt", "sum")])
        x = g["x"].combine_chunks().to_numpy()
        y = g["y"].combine_chunks().to_numpy()
        d = g["d"].combine_chunks().to_numpy()
        c = g["cnt_sum"].combine_chunks().to_numpy()
        order = np.lexsort((d, y, x))
        x, y, d, c = x[order], y[order], d[order], c[order]
        w = c / np.log(d.astype(np.float64))
        starts = np.flatnonzero(np.r_[True, (x[1:] != x[:-1])
                                      | (y[1:] != y[:-1])]) \
            if len(x) else np.empty(0, np.int64)
        if not len(x):
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "common": pa.array([], pa.int64()),
                             "aa6": pa.array([], pa.float64())})
        aa = np.add.reduceat(w, starts)
        common = np.add.reduceat(c, starts)
        return pa.table({
            "a": pa.array(x[starts]), "b": pa.array(y[starts]),
            "common": pa.array(common.astype(np.int64)),
            "aa6": pa.array(round_half_away(aa, 6))})

    return edges.map_batches(bi, batch_format="pyarrow") \
        .groupby("part") \
        .map_groups(lambda t: per_center(t.drop_columns(["part"])),
                    batch_format="pyarrow") \
        .groupby("part") \
        .map_groups(score, batch_format="pyarrow")


RESAMPLE_K = 8


def _resample_wide(batch: pa.Table, nt, k: int):
    """Shared per-batch resample kernel (way_resample's exact scalar
    sequence — any change here changes the gated resample values):
    returns (way_ids, lon6 (n, k), lat6 (n, k)) for every way with >= 2
    fully-resolved points and 3 dp length > 0."""
    from ..util import round_half_away as _rnd
    d2r = np.pi / 180.0
    nid = nt["id"].to_numpy()
    order = np.argsort(nid, kind="stable")
    nid_s = nid[order]
    nlon = nt["lon"].to_numpy()[order]
    nlat = nt["lat"].to_numpy()[order]

    refs = batch["refs"].combine_chunks()
    offsets = np.asarray(refs.offsets, np.int64)
    flat = refs.flatten().to_numpy()
    wids = batch["id"].combine_chunks().to_numpy()

    jj = np.searchsorted(nid_s, flat).clip(max=max(len(nid_s) - 1, 0))
    found = nid_s[jj] == flat if len(nid_s) \
        else np.zeros(len(flat), bool)
    x = np.where(found, nlon[jj], 0.0)
    y = np.where(found, nlat[jj], 0.0)

    # 3dp-rounded per-segment haversine (shared scalar-exact grid)
    if len(flat) >= 2:
        p1, p2 = y[:-1] * d2r, y[1:] * d2r
        sdp = np.sin((p2 - p1) / 2.0)
        sdl = np.sin((x[1:] - x[:-1]) * d2r / 2.0)
        a = np.minimum(sdp * sdp + np.cos(p1) * np.cos(p2)
                       * sdl * sdl, 1.0)
        seg = _rnd(2.0 * EARTH_R_M * np.arcsin(np.sqrt(a)), 3)
    else:
        seg = np.zeros(0, np.float64)

    out_w, out_lon, out_lat = [], [], []
    nf = np.add.reduceat(found.astype(np.int64), offsets[:-1]) \
        if len(flat) else np.zeros(0, np.int64)
    for w in range(len(wids)):
        lo, hi = offsets[w], offsets[w + 1]
        m = hi - lo
        if m < 2 or nf[w] != m:
            continue
        s = seg[lo:hi - 1]
        cum = np.concatenate([[0.0], np.cumsum(s)])
        L = cum[-1]
        if _rnd(np.float64(L), 3) <= 0.0:
            continue
        wx, wy = x[lo:hi], y[lo:hi]
        row_lon, row_lat = [], []
        for j in range(k):
            t = j * L / (k - 1)
            i = int(np.searchsorted(cum, t, side="right")) - 1
            i = min(max(i, 0), m - 2)
            f = (t - cum[i]) / s[i] if s[i] > 0.0 else 0.0
            row_lon.append(float(_rnd(
                np.float64(wx[i] + f * (wx[i + 1] - wx[i])), 6)))
            row_lat.append(float(_rnd(
                np.float64(wy[i] + f * (wy[i + 1] - wy[i])), 6)))
        out_w.append(int(wids[w]))
        out_lon.append(row_lon)
        out_lat.append(row_lat)
    return (np.asarray(out_w, np.int64),
            np.asarray(out_lon, np.float64).reshape(-1, k),
            np.asarray(out_lat, np.float64).reshape(-1, k))


def way_resample(nodes: ray.data.Dataset, ways: ray.data.Dataset,
                 k: int = RESAMPLE_K) -> ray.data.Dataset:
    """(way_id, pt_idx, lon6, lat6): each way's polyline resampled to
    ``k`` points equally spaced by cumulative arc length — the
    fixed-size shape signature a geometry-embedding model trains on
    (and the classic pre-step for trajectory similarity).

    Determinism contract (the way_frechet trick): every segment
    haversine is rounded to 3 dp (millimetres) BEFORE the cumulative
    sum, so both gate sides accumulate the identical double sequence;
    target offsets are t_j = j * L / (k-1); the carrying segment is
    the last i with cum[i] <= t_j (bisect-right), linear lon/lat
    interpolation, 6 dp output rounding.  Ways keep the sinuosity
    boundary contract: >= 2 fully-resolved points and 3 dp length > 0.

    Scale plan: same one-pass broadcast-nodes shape as way_length_m —
    zero exchanges past the node-table broadcast; per-way work is
    linear in points and k.  The kernel itself lives in _resample_wide
    (shared with conflate_candidate_edges' fused signature stage)."""
    from ..relational import broadcast_table
    nodes_ref = broadcast_table(nodes, ["id", "lon", "lat"])

    def fn(batch: pa.Table) -> pa.Table:
        wid, lon_m, lat_m = _resample_wide(batch, ray.get(nodes_ref), k)
        return pa.table({
            "way_id": pa.array(np.repeat(wid, k)),
            "pt_idx": pa.array(np.tile(np.arange(k, dtype=np.int64),
                                       len(wid))),
            "lon6": pa.array(lon_m.ravel()),
            "lat6": pa.array(lat_m.ravel())})

    return ways.map_batches(fn, batch_format="pyarrow")


def osm_way_closure(ways: ray.data.Dataset) -> ray.data.Dataset:
    """(way_id, n_refs, n_unique, is_closed, has_repeat): per-way ring/
    validity audit — is_closed = first ref == last ref (the polygon
    precondition osm_way_area assumes, reference semantics
    osm/Way.go:15-30), n_unique counts distinct refs, has_repeat flags
    interior node reuse beyond the closing duplicate (a degenerate
    geometry screen). Pure per-row block pass, zero exchanges; each
    way's refs live in one list cell so in-block stats are global."""
    def fn(t: pa.Table) -> pa.Table:
        refs = t["refs"].combine_chunks()
        off = np.asarray(refs.offsets, np.int64)
        off = off - off[0]
        flat = refs.flatten().to_numpy()
        n = np.diff(off)
        first = flat[off[:-1]]
        last = flat[off[1:] - 1]
        closed = (n >= 2) & (first == last)
        # distinct count per way: sort values within each way, count
        # boundaries (vectorized over the whole block)
        way_idx = np.repeat(np.arange(len(n), dtype=np.int64), n)
        order = np.lexsort((flat, way_idx))
        wi, fv = way_idx[order], flat[order]
        new = np.r_[True, (wi[1:] != wi[:-1]) | (fv[1:] != fv[:-1])] \
            if len(fv) else np.empty(0, bool)
        nuniq = np.bincount(wi[new], minlength=len(n)).astype(np.int64) \
            if len(fv) else np.zeros(len(n), np.int64)
        has_repeat = nuniq < (n - closed.astype(np.int64))
        return pa.table({
            "way_id": t["id"],
            "n_refs": pa.array(n),
            "n_unique": pa.array(nuniq),
            "is_closed": pa.array(closed),
            "has_repeat": pa.array(has_repeat)})

    return ways.select_columns(["id", "refs"]) \
        .map_batches(fn, batch_format="pyarrow")


def way_shared_segments(ways: ray.data.Dataset,
                        num_parts: int = 16) -> ray.data.Dataset:
    """(a, b, n_shared): number of undirected node-id SEGMENTS
    (consecutive ref pairs) shared by each way pair — the
    duplicate-geometry audit conflation pipelines read (two ways
    sharing whole segment runs are digitized duplicates; sharing one
    node is just an intersection, which way_jaccard already grades).

    Physical plan: per-block segment explode (vectorized consecutive
    pairs, normalized lo<hi, self-loops dropped, per-way dedup IN
    KERNEL — each way's refs sit in one list cell so block-local dedup
    is global) -> ONE hash(lo) exchange co-locating every (lo, hi)
    group -> per-partition clique pairs over each segment's owner list
    (ways sorted ascending, so a < b with no post-sort) -> combiner
    count per (a, b) via the bounded partial_groupby_agg exchange.
    Per-segment pair emission is quadratic in owners-per-segment; the
    same documented cap consideration as way_triangles applies (hot
    segments are motorway trunks at planet scale)."""
    from ..relational import hash_part, partial_groupby_agg

    def segs(t: pa.Table) -> pa.Table:
        refs = t["refs"].combine_chunks()
        off = np.asarray(refs.offsets, np.int64)
        off = off - off[0]
        flat = refs.flatten().to_numpy()
        ids = t["id"].combine_chunks().to_numpy()
        n = np.diff(off)
        a = flat[:-1]
        b = flat[1:]
        # positions p where p+1 starts a new way are not segments
        keep = np.ones(max(len(flat) - 1, 0), bool)
        keep[off[1:-1] - 1] = False
        way = np.repeat(ids, np.maximum(n - 1, 0))
        a, b = a[keep], b[keep]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        m = lo != hi
        way, lo, hi = way[m], lo[m], hi[m]
        order = np.lexsort((hi, lo, way))
        way, lo, hi = way[order], lo[order], hi[order]
        uniq = np.r_[True, (way[1:] != way[:-1]) | (lo[1:] != lo[:-1])
                     | (hi[1:] != hi[:-1])] if len(way) else \
            np.empty(0, bool)
        way, lo, hi = way[uniq], lo[uniq], hi[uniq]
        return pa.table({"way": pa.array(way), "lo": pa.array(lo),
                         "hi": pa.array(hi),
                         "part": pa.array(hash_part(lo, num_parts))})

    def pairs(t: pa.Table) -> pa.Table:
        lo = t["lo"].combine_chunks().to_numpy()
        hi = t["hi"].combine_chunks().to_numpy()
        way = t["way"].combine_chunks().to_numpy()
        order = np.lexsort((way, hi, lo))
        lo, hi, way = lo[order], hi[order], way[order]
        newg = np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])] \
            if len(lo) else np.empty(0, bool)
        starts = np.flatnonzero(newg)
        counts = np.diff(np.r_[starts, len(lo)])
        pos = np.arange(len(lo), dtype=np.int64)
        rep = np.repeat(counts, counts) - (pos - np.repeat(starts, counts)) - 1
        tot = int(rep.sum())
        first = np.repeat(pos, rep)
        offs = np.arange(tot, dtype=np.int64) \
            - np.repeat(np.cumsum(rep) - rep, rep)
        second = first + 1 + offs
        g = pa.table({"a": pa.array(way[first]),
                      "b": pa.array(way[second])}) \
            .group_by(["a", "b"]).aggregate([([], "count_all")])
        return g.rename_columns(["a", "b", "c"])

    seg = ways.select_columns(["id", "refs"]) \
        .map_batches(segs, batch_format="pyarrow", batch_size=65536)
    pair_partials = seg.groupby("part").map_groups(
        pairs, batch_format="pyarrow")
    out = partial_groupby_agg(pair_partials, ["a", "b"], [("c", "sum")])
    return out.map_batches(
        lambda t: t.rename_columns(["a", "b", "n_shared"]),
        batch_format="pyarrow")


def way_modularity(ways: ray.data.Dataset,
                   block: int = 16,
                   num_parts: int = 16) -> ray.data.Dataset:
    """(n_edges, n_within, d2_sum, q6): Newman modularity of the
    spatial-BLOCK partition over the deduped shared-node way graph —
    community c(w) = (first_ref(w) - 1) // ``block`` (the datagen
    spatial block every way's refs live in), Q = W/m - D2/(4 m^2)
    where W counts within-community edges, m all edges and D2 the sum
    of squared community degree totals. The partition-quality metric a
    graph-aware sharding layer reads (high Q = cell-partitioning the
    way graph cuts few edges).

    Exactness: the per-community float sum in the textbook form is
    order-dependent, so both sides use the algebraically equal
    all-integer reduction (W, m, D2 exact int64) with exactly two
    float divisions and one subtraction in the same order. Scale
    shape: reuses full_shared_node_edges (one exchange, already
    deduped); the way->community map is two int columns broadcast once
    (past the repo's broadcast threshold this flips to the union-tag
    hash co-partition, the dedup_keep pattern); the final merge is ONE
    bounded task over per-block (community, degree, within) partials."""
    from ..relational import single_merge

    def comm_map(t: pa.Table) -> pa.Table:
        refs = t["refs"].combine_chunks()
        off = np.asarray(refs.offsets, np.int64)
        off = off - off[0]
        flat = refs.flatten().to_numpy()
        first = flat[off[:-1]]
        return pa.table({"way_id": t["id"],
                         "c": pa.array((first - 1) // block)})

    cm = ways.select_columns(["id", "refs"]) \
        .map_batches(comm_map, batch_format="pyarrow")
    cm_ref = broadcast_table(cm, ["way_id", "c"])

    edges = full_shared_node_edges(ways, num_parts)

    def partial(t: pa.Table) -> pa.Table:
        mt = ray.get(cm_ref)
        wid = mt["way_id"].to_numpy()
        order = np.argsort(wid, kind="stable")
        wid_s = wid[order]
        comm = mt["c"].to_numpy()[order]
        a = t["a"].combine_chunks().to_numpy()
        b = t["b"].combine_chunks().to_numpy()
        ca = comm[np.searchsorted(wid_s, a)]
        cb = comm[np.searchsorted(wid_s, b)]
        within = ca == cb
        cc = np.concatenate([ca, cb])
        u, d = np.unique(cc, return_counts=True)
        wu, wn = np.unique(ca[within], return_counts=True)
        wcnt = np.zeros(len(u), np.int64)
        wcnt[np.searchsorted(u, wu)] = wn
        return pa.table({"c": pa.array(u),
                         "d": pa.array(d.astype(np.int64)),
                         "w": pa.array(wcnt)})

    def merge(t: pa.Table) -> pa.Table:
        from ..util import round_half_away
        g = t.group_by("c").aggregate([("d", "sum"), ("w", "sum")])
        d = g["d_sum"].combine_chunks().to_numpy().astype(np.int64)
        w = g["w_sum"].combine_chunks().to_numpy().astype(np.int64)
        m = int(d.sum()) // 2
        W = int(w.sum())
        d2 = int((d * d).sum())
        q = float(W) / float(m) - float(d2) / float(4 * m * m) \
            if m else 0.0
        return pa.table({
            "n_edges": pa.array([m], pa.int64()),
            "n_within": pa.array([W], pa.int64()),
            "d2_sum": pa.array([d2], pa.int64()),
            "q6": pa.array([float(round_half_away(np.float64(q), 6))])})

    return single_merge(
        edges.map_batches(partial, batch_format="pyarrow",
                          batch_size=65536), merge)


def way_tag_length_stats(nodes: ray.data.Dataset, ways: ray.data.Dataset,
                         num_parts: int = 16) -> ray.data.Dataset:
    """(key, n_ways, total_len3): total geodesic way length per tag
    key — the per-theme length rollup (how much highway vs waterway vs
    building outline) that generalizes the reference's per-key COUNT
    summary (osm/Summary.go, README's summarize table) to a measure.

    Float-sum determinism: per-way len_m3 comes from the SHARED
    way_length_m kernel (millimeter-rounded); the cross-way sum per key
    is a SEQUENTIAL ascending-way_id fold (np.add.reduceat) mirrored by
    the SQL's sum(len_m3 ORDER BY way_id) ordered aggregate —
    bit-identical left folds. Scale shape: tag-key explode and length
    rows co-partition by hash(way_id) (union-tag, no Dataset.join),
    then ONE hash(key) exchange for the per-key ordered fold."""
    from ..relational import hash_part
    from ..util import round_half_away

    wl = way_length_m(nodes, ways).select_columns(["way_id", "len_m3"])

    def key_rows(t: pa.Table) -> pa.Table:
        row_idx, ks, _ = tagops.explode_keys(t["tags"].combine_chunks())
        wid = t["id"].combine_chunks().to_numpy()[row_idx]
        return pa.table({
            "way_id": pa.array(wid),
            "key": ks,
            "len_m3": pa.array(np.zeros(len(wid), np.float64)),
            "is_len": pa.array(np.zeros(len(wid), bool)),
            "part": pa.array(hash_part(wid, num_parts))})

    def len_rows(t: pa.Table) -> pa.Table:
        wid = t["way_id"].combine_chunks().to_numpy()
        return pa.table({
            "way_id": t["way_id"],
            "key": pa.array([""] * len(t), pa.string()),
            "len_m3": t["len_m3"],
            "is_len": pa.array(np.ones(len(t), bool)),
            "part": pa.array(hash_part(wid, num_parts))})

    tagged = ways.select_columns(["id", "tags"]) \
        .map_batches(key_rows, batch_format="pyarrow", batch_size=65536) \
        .union(wl.map_batches(len_rows, batch_format="pyarrow",
                              batch_size=65536))

    def attach(t: pa.Table) -> pa.Table:
        is_len = t["is_len"].combine_chunks().to_numpy(zero_copy_only=False)
        wid = t["way_id"].combine_chunks().to_numpy()
        ln = t["len_m3"].combine_chunks().to_numpy()
        lw, lv = wid[is_len], ln[is_len]
        order = np.argsort(lw, kind="stable")
        lw, lv = lw[order], lv[order]
        kw = wid[~is_len]
        keys = t["key"].combine_chunks().filter(
            pa.array(~is_len)).to_pylist()
        idx = np.searchsorted(lw, kw)
        # ways filtered out by way_length_m (unresolved refs) drop here
        ok = (idx < len(lw))
        idx = np.minimum(idx, max(len(lw) - 1, 0))
        ok &= (lw[idx] == kw) if len(lw) else False
        kh = _crc32_str(np.asarray(keys, object))
        return pa.table({
            "key": pa.array(np.asarray(keys, object)[ok].astype(str),
                            pa.string()),
            "way_id": pa.array(kw[ok]),
            "len_m3": pa.array(lv[idx[ok]] if len(lw) else
                               np.empty(0, np.float64)),
            "kpart": pa.array(hash_part(kh[ok].astype(np.int64),
                                        num_parts))})

    def finish(t: pa.Table) -> pa.Table:
        keys = np.asarray(t["key"].combine_chunks().to_pylist(), object)
        wid = t["way_id"].combine_chunks().to_numpy()
        ln = t["len_m3"].combine_chunks().to_numpy()
        order = np.lexsort((wid, keys))
        keys, ln = keys[order], ln[order]
        new = np.r_[True, keys[1:] != keys[:-1]] if len(keys) \
            else np.empty(0, bool)
        starts = np.flatnonzero(new)
        tot = np.add.reduceat(ln, starts) if len(keys) else \
            np.empty(0, np.float64)
        cnt = np.diff(np.r_[starts, len(keys)])
        return pa.table({
            "key": pa.array(keys[new].astype(str), pa.string()),
            "n_ways": pa.array(cnt.astype(np.int64)),
            "total_len3": pa.array(round_half_away(tot, 3))})

    joined = tagged.groupby("part").map_groups(attach,
                                               batch_format="pyarrow")
    return joined.groupby("kpart").map_groups(finish,
                                              batch_format="pyarrow")


def _crc32_str(vals: np.ndarray) -> np.ndarray:
    """crc32 per string value (vectorized over uniques)."""
    import zlib
    if not len(vals):
        return np.empty(0, np.uint64)
    codes, uniq = pd.factorize(vals)
    uh = np.fromiter((zlib.crc32(str(u).encode()) for u in uniq),
                     np.uint64, len(uniq))
    return uh[codes]


def relation_member_roles(relations: ray.data.Dataset) -> ray.data.Dataset:
    """(member_type, role, n_members, n_relations): census of relation
    membership by member type and role — the structure audit behind
    multipolygon assembly (reference parses exactly these fields,
    osm/Relation.go:13-16, but never aggregates them). Bounded
    (type x role) combiner + ONE merge; the per-block distinct-relation
    count is globally correct because each relation's member list sits
    in one row."""
    def partial(t: pa.Table) -> pa.Table:
        mem = t["members"].combine_chunks()
        off = np.asarray(mem.offsets, np.int64)
        off = off - off[0]
        flat = mem.flatten()
        rid = np.repeat(t["id"].combine_chunks().to_numpy(), np.diff(off))
        mtype = np.asarray(flat.field("type").to_pylist(), object)
        role = np.asarray(flat.field("role").to_pylist(), object)
        g1 = pa.table({"member_type": pa.array(mtype.astype(str)),
                       "role": pa.array(role.astype(str)),
                       "rid": pa.array(rid)}) \
            .group_by(["member_type", "role", "rid"]) \
            .aggregate([([], "count_all")])
        g1 = g1.rename_columns(["member_type", "role", "rid", "nm"])
        g2 = g1.group_by(["member_type", "role"]) \
            .aggregate([("nm", "sum"), ([], "count_all")])
        return g2.rename_columns(["member_type", "role", "pn", "pr"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["member_type", "role"]) \
            .aggregate([("pn", "sum"), ("pr", "sum")])
        return pa.table({
            "member_type": g["member_type"],
            "role": g["role"],
            "n_members": pc.cast(g["pn_sum"], pa.int64()),
            "n_relations": pc.cast(g["pr_sum"], pa.int64())})

    from ..relational import single_merge
    return single_merge(
        relations.select_columns(["id", "members"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        merge)


def osm_user_activity(nodes: ray.data.Dataset, ways: ray.data.Dataset,
                      relations: ray.data.Dataset) -> ray.data.Dataset:
    """(uid, user, n_nodes, n_ways, n_relations, max_version): per-user
    contribution census across all three element classes — the
    user-dictionary rollup (reference tracks usernames per element,
    osm/Planet.go UserNames; this grades them). One union of three
    pruned streams through the bounded combiner exchange."""
    from ..relational import partial_groupby_agg

    def tag(is_n: int, is_w: int, is_r: int):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            return pa.table({
                "uid": t["uid"],
                "user": t["user"],
                "version": pc.cast(t["version"], pa.int64()),
                "is_n": pa.array(np.full(n, is_n, np.int64)),
                "is_w": pa.array(np.full(n, is_w, np.int64)),
                "is_r": pa.array(np.full(n, is_r, np.int64))})
        return fn

    cols = ["uid", "user", "version"]
    u = nodes.select_columns(cols) \
        .map_batches(tag(1, 0, 0), batch_format="pyarrow") \
        .union(ways.select_columns(cols)
               .map_batches(tag(0, 1, 0), batch_format="pyarrow"),
               relations.select_columns(cols)
               .map_batches(tag(0, 0, 1), batch_format="pyarrow"))
    g = partial_groupby_agg(u, ["uid"],
                            [("is_n", "sum"), ("is_w", "sum"),
                             ("is_r", "sum"), ("version", "max"),
                             ("user", "min")])
    return g.map_batches(
        lambda t: t.rename_columns(["uid", "n_nodes", "n_ways",
                                    "n_relations", "max_version", "user"]),
        batch_format="pyarrow")


def way_clustering_coef(ways: ray.data.Dataset, num_parts: int = 16,
                        broadcast_threshold: int = 4_000_000
                        ) -> ray.data.Dataset:
    """(way_id, deg, n_tri, lcc6): LOCAL clustering coefficient per way
    over the TRUE shared-node way graph — lcc = 2*tri(v)/(deg(v)*(deg(v)-1)),
    the per-vertex companion of way_triangles' global census (which
    ways sit in tightly meshed grids vs tree-like suburbs). Vertices
    with deg < 2 report lcc6 = 0.0.

    Physical plan (way_triangles' dual-plan precedent). Below
    ``broadcast_threshold`` edge rows, the degree table and oriented
    edge set broadcast once and the six exchanges collapse to three
    (deg partials, one wedge+closure pass, the final count/deg join) —
    measured 15.2 -> ~4 s at sf0.1. Past the threshold the fully
    partitioned 100-TB plan runs instead:
      1. full pairwise deduped edges (full_shared_node_edges,
         materialized: read by degrees, orientation and closure);
      2. endpoint partials -> ONE v-hash exchange -> (v, deg);
      3. two union-tag co-partition passes attach (da, db); each edge
         orients low (deg, id) rank -> high rank, bounding
         out-degrees by ~sqrt(m);
      4. ONE u-hash exchange groups oriented out-neighbourhoods; each
         u emits its rank-ordered wedge pairs (x, y) CARRYING u;
      5. wedges and oriented edges co-partition by hash(x); a sorted
         merge finds closed wedges and attributes each triangle to all
         THREE vertices (u, x, y) as per-vertex count partials;
      6. ONE v-hash exchange sums triangle counts and joins them to
         degrees in the same kernel (deg rows carry tc=0, count rows
         deg=0; a single Acero sum-groupby is the left join).
    Per-node clique emission inside full_shared_node_edges carries
    way_triangles' documented hot-node cap consideration."""
    from ..relational import hash_part

    edges = full_shared_node_edges(ways, num_parts)

    # ---- 2. degrees ----------------------------------------------------
    def deg_partial(t: pa.Table) -> pa.Table:
        v = np.concatenate([t["a"].combine_chunks().to_numpy(),
                            t["b"].combine_chunks().to_numpy()])
        u, n = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u),
                         "pd": pa.array(n.astype(np.int64)),
                         "part": pa.array(hash_part(u, num_parts))})

    def deg_merge(t: pa.Table) -> pa.Table:
        if "part" in t.column_names:
            t = t.drop_columns(["part"])
        g = t.group_by("v").aggregate([("pd", "sum")])
        return g.rename_columns(["v", "d"])

    deg = edges.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby("part").map_groups(deg_merge, batch_format="pyarrow") \
        .materialize()

    n_edge_rows = edges.count()

    # ---- 3. attach degrees to both endpoints (union-tag co-partition) --
    def _attach(ds: ray.data.Dataset, cols_in: list, key: str,
                out_col: str) -> ray.data.Dataset:
        def tag_edge(t: pa.Table) -> pa.Table:
            k = t[key].combine_chunks().to_numpy()
            cols = {c: t[c].combine_chunks() for c in t.column_names
                    if c != "part"}
            cols["_d"] = pa.array(np.zeros(len(k), np.int64))
            cols["_is_deg"] = pa.array(np.zeros(len(k), bool))
            cols["part"] = pa.array(hash_part(k, num_parts))
            return pa.table(cols)

        def tag_deg(t: pa.Table) -> pa.Table:
            v = t["v"].combine_chunks().to_numpy()
            cols = {c: (pa.array(v) if c == key
                        else pa.nulls(len(v), pa.int64()))
                    for c in cols_in}
            cols["_d"] = t["d"].combine_chunks()
            cols["_is_deg"] = pa.array(np.ones(len(v), bool))
            cols["part"] = pa.array(hash_part(v, num_parts))
            return pa.table(cols)

        def kernel(t: pa.Table) -> pa.Table:
            is_deg = t["_is_deg"].combine_chunks() \
                .to_numpy(zero_copy_only=False)
            k = t[key].combine_chunks().to_numpy()
            d = t["_d"].combine_chunks().to_numpy()
            dv, dd = k[is_deg], d[is_deg]
            order = np.argsort(dv)
            dv, dd = dv[order], dd[order]
            e = t.filter(pa.array(~is_deg)).drop_columns(["_d", "_is_deg"])
            ek = e[key].combine_chunks().to_numpy()
            idx = np.searchsorted(dv, ek)
            return e.append_column(out_col, pa.array(dd[idx]))

        both = ds.map_batches(tag_edge, batch_format="pyarrow") \
            .union(deg.map_batches(tag_deg, batch_format="pyarrow"))
        return both.groupby("part") \
            .map_groups(lambda t: kernel(t.drop_columns(["part"])),
                        batch_format="pyarrow")

    use_broadcast = n_edge_rows <= broadcast_threshold

    if use_broadcast:
        from ..relational import broadcast_table
        deg_ref = broadcast_table(deg, ["v", "d"])

        def orient_b(t: pa.Table) -> pa.Table:
            dt = ray.get(deg_ref)
            dv_ = dt["v"].to_numpy()
            o = np.argsort(dv_)
            dv_s = dv_[o]
            dd_s = dt["d"].to_numpy()[o]
            a = t["a"].combine_chunks().to_numpy()
            b = t["b"].combine_chunks().to_numpy()
            da = dd_s[np.searchsorted(dv_s, a)]
            db = dd_s[np.searchsorted(dv_s, b)]
            fwd = (da < db) | ((da == db) & (a < b))
            u = np.where(fwd, a, b)
            v = np.where(fwd, b, a)
            dv = np.where(fwd, db, da)
            return pa.table({"u": pa.array(u), "v": pa.array(v),
                             "dv": pa.array(dv),
                             "part": pa.array(hash_part(u, num_parts))})

        oriented = edges.map_batches(orient_b, batch_format="pyarrow") \
            .materialize()
        edge_ref = broadcast_table(oriented, ["u", "v"])
    else:
        j = _attach(_attach(edges, ["a", "b"], "a", "da"),
                    ["a", "b", "da"], "b", "db")

        def orient(t: pa.Table) -> pa.Table:
            a = t["a"].combine_chunks().to_numpy()
            b = t["b"].combine_chunks().to_numpy()
            da = t["da"].combine_chunks().to_numpy()
            db = t["db"].combine_chunks().to_numpy()
            fwd = (da < db) | ((da == db) & (a < b))
            u = np.where(fwd, a, b)
            v = np.where(fwd, b, a)
            dv = np.where(fwd, db, da)
            return pa.table({"u": pa.array(u), "v": pa.array(v),
                             "dv": pa.array(dv),
                             "part": pa.array(hash_part(u, num_parts))})

        oriented = j.map_batches(orient, batch_format="pyarrow") \
            .materialize()

    # ---- 4. wedges per u-partition, carrying u -------------------------
    def wedges(t: pa.Table) -> pa.Table:
        u = t["u"].combine_chunks().to_numpy()
        v = t["v"].combine_chunks().to_numpy()
        dv = t["dv"].combine_chunks().to_numpy()
        order = np.lexsort((v, dv, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]]) \
            if len(u) else np.empty(0, np.int64)
        counts = np.diff(np.r_[starts, len(u)]) if len(u) \
            else np.empty(0, np.int64)
        pos = np.arange(len(v), dtype=np.int64)
        rep = np.repeat(counts, counts) - (pos - np.repeat(starts, counts)) - 1
        first_idx = np.repeat(pos, rep)
        base = np.repeat(np.cumsum(rep) - rep, rep)
        second_idx = first_idx + 1 + (np.arange(rep.sum(), dtype=np.int64)
                                      - base)
        x, y, wu = v[first_idx], v[second_idx], u[first_idx]
        return pa.table({"x": pa.array(x), "y": pa.array(y),
                         "wu": pa.array(wu),
                         "e": pa.array(np.zeros(len(x), bool)),
                         "part": pa.array(hash_part(x, num_parts))})

    def edge_rows(t: pa.Table) -> pa.Table:
        u = t["u"].combine_chunks().to_numpy()
        v = t["v"].combine_chunks().to_numpy()
        return pa.table({"x": pa.array(u), "y": pa.array(v),
                         "wu": pa.array(np.full(len(u), -1, np.int64)),
                         "e": pa.array(np.ones(len(u), bool)),
                         "part": pa.array(hash_part(u, num_parts))})

    # ---- 5. co-partitioned closure with 3-vertex attribution -----------
    def close(t: pa.Table) -> pa.Table:
        x = t["x"].combine_chunks().to_numpy()
        y = t["y"].combine_chunks().to_numpy()
        wu = t["wu"].combine_chunks().to_numpy()
        e = t["e"].combine_chunks().to_numpy(zero_copy_only=False)
        if not len(x):
            return pa.table({"v": pa.array([], pa.int64()),
                             "tc": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int64())})
        order = np.lexsort((e, y, x))
        x, y, wu, e = x[order], y[order], wu[order], e[order]
        starts = np.flatnonzero(np.r_[True, (x[1:] != x[:-1])
                                      | (y[1:] != y[:-1])])
        ends = np.r_[starts[1:], len(x)]
        has_edge = e[ends - 1]
        grp = np.repeat(np.arange(len(starts)), ends - starts)
        closed = has_edge[grp] & ~e
        v = np.concatenate([wu[closed], x[closed], y[closed]])
        uv, tc = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uv),
                         "tc": pa.array(tc.astype(np.int64)),
                         "part": pa.array(hash_part(uv, num_parts))})

    if use_broadcast:
        def wedges_close_b(t: pa.Table) -> pa.Table:
            w = wedges(t)
            et = ray.get(edge_ref)
            eu = et["u"].to_numpy()
            ev = et["v"].to_numpy()
            both = pa.table({
                "x": pa.array(np.concatenate(
                    [w["x"].combine_chunks().to_numpy(), eu])),
                "y": pa.array(np.concatenate(
                    [w["y"].combine_chunks().to_numpy(), ev])),
                "wu": pa.array(np.concatenate(
                    [w["wu"].combine_chunks().to_numpy(),
                     np.full(len(eu), -1, np.int64)])),
                "e": pa.array(np.r_[np.zeros(len(w), bool),
                                    np.ones(len(eu), bool)])})
            return close(both)

        tri_partials = oriented.groupby("part") \
            .map_groups(lambda t: wedges_close_b(t.drop_columns(["part"])),
                        batch_format="pyarrow")
    else:
        tri_partials = oriented.groupby("part") \
            .map_groups(lambda t: wedges(t.drop_columns(["part"])),
                        batch_format="pyarrow") \
            .union(oriented.map_batches(edge_rows,
                                        batch_format="pyarrow")) \
            .groupby("part") \
            .map_groups(lambda t: close(t.drop_columns(["part"])),
                        batch_format="pyarrow")

    # ---- 6. one v-hash exchange: sum counts + left-join degrees --------
    def deg_side(t: pa.Table) -> pa.Table:
        v = t["v"].combine_chunks().to_numpy()
        return pa.table({"v": pa.array(v),
                         "d": t["d"].combine_chunks(),
                         "tc": pa.array(np.zeros(len(v), np.int64)),
                         "part": pa.array(hash_part(v, num_parts))})

    def tc_side(t: pa.Table) -> pa.Table:
        v = t["v"].combine_chunks().to_numpy()
        return pa.table({"v": pa.array(v),
                         "d": pa.array(np.zeros(len(v), np.int64)),
                         "tc": t["tc"].combine_chunks(),
                         "part": pa.array(hash_part(v, num_parts))})

    def final(t: pa.Table) -> pa.Table:
        from ..util import round_half_away
        g = t.drop_columns(["part"]).group_by("v") \
            .aggregate([("d", "sum"), ("tc", "sum")])
        v = g["v"].to_numpy()
        d = g["d_sum"].to_numpy()
        tc = g["tc_sum"].to_numpy()
        dd = d.astype(np.float64) * (d - 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            raw = (2.0 * tc) / dd
        lcc = np.where(d < 2, 0.0, round_half_away(raw, 6))
        return pa.table({"way_id": pa.array(v, pa.int64()),
                         "deg": pa.array(d, pa.int64()),
                         "n_tri": pa.array(tc, pa.int64()),
                         "lcc6": pa.array(lcc, pa.float64())})

    return deg.map_batches(deg_side, batch_format="pyarrow") \
        .union(tri_partials.map_batches(tc_side, batch_format="pyarrow")) \
        .groupby("part") \
        .map_groups(final, batch_format="pyarrow")


def amenity_colocation(nodes: ray.data.Dataset, res: int = 9,
                       key: str = "amenity",
                       num_parts: int = 16) -> ray.data.Dataset:
    """(a, b, n_ab, pmi6): spatial COLOCATION mining — pointwise mutual
    information between pairs of ``key`` tag VALUES that land in the
    same quadtree cell (res = zoom). PMI = ln(n_ab * Q / (n_a * n_b))
    over cell presence sets (n_a = cells containing value a, n_ab =
    cells containing both, Q = cells containing any tagged node) — the
    classic co-location pattern score (which amenities cluster:
    cafe+bench vs fuel+parking). osm_tag_cooccurrence grades per-WAY
    key pairs; this grades per-CELL value pairs.

    Scale plan: per-block distinct (cell, value) partials (vectorized
    tag extraction + cell assign) -> ONE hash(cell) exchange (each cell
    wholly in one partition, so partition-local dedup is global) ->
    per-partition clique pairs + presence partials; the merged
    (kind, a, b) table is bounded by the tag-value vocabulary squared,
    so ONE merge task computes the PMI joins. Per-cell pair emission is
    quadratic in distinct values per cell — bounded by the vocabulary,
    not the data."""
    from ..geo import tiles
    from ..relational import _col_hash, hash_part

    def partial(t: pa.Table) -> pa.Table:
        val = tagops.value_of(t["tags"].combine_chunks(), key)
        keep = pc.is_valid(val)
        val = val.filter(keep)
        lon = t["lon"].combine_chunks().filter(keep).to_numpy()
        lat = t["lat"].combine_chunks().filter(keep).to_numpy()
        cell = tiles.cell_id(lon, lat, res)
        g = pa.table({"cell": pa.array(cell), "val": val}) \
            .group_by(["cell", "val"]).aggregate([])
        return g.append_column(
            "part", pa.array(hash_part(g["cell"].combine_chunks()
                                       .to_numpy(), num_parts)))

    def pairs(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by(["cell", "val"]).aggregate([])
        cell = g["cell"].combine_chunks().to_numpy()
        val = np.asarray(g["val"].combine_chunks()
                         .to_numpy(zero_copy_only=False))
        order = np.lexsort((val, cell))
        cell, val = cell[order], val[order]
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]]) \
            if len(cell) else np.empty(0, np.int64)
        counts = np.diff(np.r_[starts, len(cell)]) if len(cell) \
            else np.empty(0, np.int64)
        pos = np.arange(len(val), dtype=np.int64)
        rep = np.repeat(counts, counts) - (pos - np.repeat(starts, counts)) - 1
        first_idx = np.repeat(pos, rep)
        base = np.repeat(np.cumsum(rep) - rep, rep)
        second_idx = first_idx + 1 + (np.arange(rep.sum(), dtype=np.int64)
                                      - base)
        rows = {
            "kind": ["pair"] * len(first_idx) + ["amen"] * len(val)
            + ["q"],
            "a": np.r_[val[first_idx], val, ["__cells__"]].tolist(),
            "b": np.r_[val[second_idx], ["" for _ in val], [""]].tolist(),
            "n": np.r_[np.ones(len(first_idx), np.int64),
                       np.ones(len(val), np.int64),
                       [len(starts)]].tolist(),
        }
        return pa.table({"kind": pa.array(rows["kind"], pa.string()),
                         "a": pa.array(rows["a"], pa.string()),
                         "b": pa.array(rows["b"], pa.string()),
                         "n": pa.array(rows["n"], pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        import math
        g = t.group_by(["kind", "a", "b"]).aggregate([("n", "sum")])
        kind = np.asarray(g["kind"].combine_chunks()
                          .to_numpy(zero_copy_only=False))
        a = np.asarray(g["a"].combine_chunks()
                       .to_numpy(zero_copy_only=False))
        b = np.asarray(g["b"].combine_chunks()
                       .to_numpy(zero_copy_only=False))
        n = g["n_sum"].combine_chunks().to_numpy()
        q_tot = int(n[kind == "q"].sum())
        pres = {x: int(c) for x, c in zip(a[kind == "amen"],
                                          n[kind == "amen"])}
        m = kind == "pair"
        out = {"a": [], "b": [], "n_ab": [], "pmi6": []}
        for va, vb, nab in zip(a[m], b[m], n[m]):
            nab = int(nab)
            pmi = math.log((nab * q_tot) / (pres[va] * pres[vb]))
            out["a"].append(va)
            out["b"].append(vb)
            out["n_ab"].append(nab)
            out["pmi6"].append(float(round_half_away(np.float64(pmi), 6)))
        return pa.table({
            "a": pa.array(out["a"], pa.string()),
            "b": pa.array(out["b"], pa.string()),
            "n_ab": pa.array(out["n_ab"], pa.int64()),
            "pmi6": pa.array(out["pmi6"], pa.float64())})

    partials = nodes.select_columns(["lon", "lat", "tags"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=65536) \
        .groupby("part") \
        .map_groups(pairs, batch_format="pyarrow")
    return single_merge(partials, final)


def cell_tag_entropy(nodes: ray.data.Dataset, res: int = 9,
                     key: str = "amenity",
                     num_parts: int = 16) -> ray.data.Dataset:
    """(cell, n_nodes, n_values, ent6): Shannon entropy (nats) of the
    ``key`` tag-value mix per quadtree cell — the neighbourhood
    DIVERSITY index (monoculture strip mall vs mixed-use block) that
    complements amenity_colocation's pair view.

    Determinism contract (the doc_char_entropy precedent): ent =
    ln(n) - sum(c*ln(c))/n with the inner sum accumulated in ASCENDING
    value order on both sides (exact integer counts; the SQL mirror
    uses an ordered aggregate), so the double sequence is identical.

    Scale plan: per-block Acero (cell, val) count partials -> ONE
    hash(cell) exchange (each cell wholly in one partition) -> one
    Acero merge + a sorted sequential reduceat fold per partition —
    exchange payload bounded by cells x values per block."""
    from ..geo import tiles
    from ..relational import hash_part
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        val = tagops.value_of(t["tags"].combine_chunks(), key)
        keep = pc.is_valid(val)
        val = val.filter(keep)
        lon = t["lon"].combine_chunks().filter(keep).to_numpy()
        lat = t["lat"].combine_chunks().filter(keep).to_numpy()
        cell = tiles.cell_id(lon, lat, res)
        g = pa.table({"cell": pa.array(cell), "val": val,
                      "n": pa.array(np.ones(len(cell), np.int64))}) \
            .group_by(["cell", "val"]).aggregate([("n", "sum")])
        return g.rename_columns(["cell", "val", "n"]).append_column(
            "part", pa.array(hash_part(g["cell"].combine_chunks()
                                       .to_numpy(), num_parts)))

    def kernel(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by(["cell", "val"]) \
            .aggregate([("n", "sum")]) \
            .sort_by([("cell", "ascending"), ("val", "ascending")])
        cell = g["cell"].combine_chunks().to_numpy()
        cnt = g["n_sum"].combine_chunks().to_numpy()
        if not len(cell):
            return pa.table({"cell": pa.array([], pa.int64()),
                             "n_nodes": pa.array([], pa.int64()),
                             "n_values": pa.array([], pa.int64()),
                             "ent6": pa.array([], pa.float64())})
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        c = cnt.astype(np.float64)
        term = c * np.log(c)          # cnt=1 -> exactly 0.0, like ln(1)
        # reduceat is SEQUENTIAL left-to-right: matches the oracle's
        # sum(... ORDER BY val) ordered aggregate
        s = np.add.reduceat(term, starts)
        n = np.add.reduceat(cnt, starts)
        nv = np.diff(np.r_[starts, len(cell)])
        ent = np.log(n.astype(np.float64)) - s / n
        return pa.table({
            "cell": pa.array(cell[starts], pa.int64()),
            "n_nodes": pa.array(n, pa.int64()),
            "n_values": pa.array(nv.astype(np.int64)),
            "ent6": pa.array(round_half_away(ent, 6), pa.float64())})

    return nodes.select_columns(["lon", "lat", "tags"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=65536) \
        .groupby("part").map_groups(kernel, batch_format="pyarrow")


def way_two_hop(ways: ray.data.Dataset,
                num_parts: int = 16) -> ray.data.Dataset:
    """(way_id, deg, n_two_hop): FRIEND-OF-FRIEND reach — for each way,
    the number of ways at shared-node-graph distance EXACTLY 2 (2-hop
    candidates minus direct neighbours), the neighbourhood-growth probe
    behind "how fast does a BFS frontier expand here".

    Physical plan: full deduped pairwise edges (full_shared_node_edges)
    -> both directions exchanged by hash(center) -> per-center ordered
    neighbour pairs (k(k-1) per center: the way_triangles hot-node cap
    consideration applies) with partition dedup -> ONE hash(x) exchange
    joint with both-direction edge rows -> per-partition global dedup +
    sorted-merge ANTI join drops distance-1 pairs -> per-x counts ->
    final v-hash co-partition joins counts to degrees (deg rows carry
    n2=0, the single-Acero-sum left join)."""
    from ..relational import hash_part

    edges = full_shared_node_edges(ways, num_parts)

    def deg_partial(t: pa.Table) -> pa.Table:
        v = np.concatenate([t["a"].combine_chunks().to_numpy(),
                            t["b"].combine_chunks().to_numpy()])
        u, n = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u),
                         "pd": pa.array(n.astype(np.int64)),
                         "part": pa.array(hash_part(u, num_parts))})

    def deg_merge(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by("v").aggregate([("pd", "sum")])
        return g.rename_columns(["v", "d"])

    deg = edges.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby("part").map_groups(deg_merge, batch_format="pyarrow") \
        .materialize()

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy()
        b = t["b"].combine_chunks().to_numpy()
        u = np.concatenate([a, b])
        v = np.concatenate([b, a])
        return pa.table({"u": pa.array(u), "v": pa.array(v),
                         "part": pa.array(hash_part(u, num_parts))})

    def cand_pairs(t: pa.Table) -> pa.Table:
        """All ordered neighbour pairs (x != y) per center u."""
        u = t["u"].combine_chunks().to_numpy()
        v = t["v"].combine_chunks().to_numpy()
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]]) \
            if len(u) else np.empty(0, np.int64)
        counts = np.diff(np.r_[starts, len(u)]) if len(u) \
            else np.empty(0, np.int64)
        # ordered pairs: for each center, each member vs every other
        k = np.repeat(counts, counts)
        pos = np.arange(len(v), dtype=np.int64)
        grp_start = np.repeat(starts, counts)
        x = np.repeat(v, k - 1)
        # offsets of the "other" elements, skipping self
        tot = int((k * (k - 1) - 0).sum()) if len(k) else 0
        if tot:
            rep = k - 1
            first = np.repeat(pos, rep)
            base = np.repeat(np.cumsum(rep) - rep, rep)
            off = np.arange(int(rep.sum()), dtype=np.int64) - base
            other = np.repeat(grp_start, rep) + off
            # skip the self slot: positions >= own index shift by one
            own = np.repeat(pos - grp_start, rep)
            other = other + (off >= own)
            y = v[other]
        else:
            x = np.empty(0, np.int64)
            y = np.empty(0, np.int64)
        if len(x):
            o2 = np.lexsort((y, x))
            x, y = x[o2], y[o2]
            keep = np.r_[True, (x[1:] != x[:-1]) | (y[1:] != y[:-1])]
            x, y = x[keep], y[keep]
        return pa.table({"x": pa.array(x), "y": pa.array(y),
                         "e": pa.array(np.zeros(len(x), bool)),
                         "part": pa.array(hash_part(x, num_parts))})

    def edge_rows(t: pa.Table) -> pa.Table:
        u = t["u"].combine_chunks().to_numpy()
        v = t["v"].combine_chunks().to_numpy()
        return pa.table({"x": pa.array(u), "y": pa.array(v),
                         "e": pa.array(np.ones(len(u), bool)),
                         "part": pa.array(hash_part(u, num_parts))})

    both = edges.map_batches(both_dirs, batch_format="pyarrow") \
        .materialize()

    def anti_count(t: pa.Table) -> pa.Table:
        x = t["x"].combine_chunks().to_numpy()
        y = t["y"].combine_chunks().to_numpy()
        e = t["e"].combine_chunks().to_numpy(zero_copy_only=False)
        if not len(x):
            return pa.table({"v": pa.array([], pa.int64()),
                             "n2": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int64())})
        order = np.lexsort((e, y, x))
        x, y, e = x[order], y[order], e[order]
        starts = np.flatnonzero(np.r_[True, (x[1:] != x[:-1])
                                      | (y[1:] != y[:-1])])
        ends = np.r_[starts[1:], len(x)]
        has_edge = e[ends - 1]
        has_cand = ~e[starts]
        keep = has_cand & ~has_edge          # candidate pair, not an edge
        xs = x[starts[keep]]
        u, n2 = np.unique(xs, return_counts=True)
        return pa.table({"v": pa.array(u),
                         "n2": pa.array(n2.astype(np.int64)),
                         "part": pa.array(hash_part(u, num_parts))})

    n2 = both.groupby("part") \
        .map_groups(lambda t: cand_pairs(t.drop_columns(["part"])),
                    batch_format="pyarrow") \
        .union(both.map_batches(edge_rows, batch_format="pyarrow")) \
        .groupby("part") \
        .map_groups(lambda t: anti_count(t.drop_columns(["part"])),
                    batch_format="pyarrow")

    def deg_side(t: pa.Table) -> pa.Table:
        v = t["v"].combine_chunks().to_numpy()
        return pa.table({"v": pa.array(v), "d": t["d"].combine_chunks(),
                         "n2": pa.array(np.zeros(len(v), np.int64)),
                         "part": pa.array(hash_part(v, num_parts))})

    def n2_side(t: pa.Table) -> pa.Table:
        v = t["v"].combine_chunks().to_numpy()
        return pa.table({"v": pa.array(v),
                         "d": pa.array(np.zeros(len(v), np.int64)),
                         "n2": t["n2"].combine_chunks(),
                         "part": pa.array(hash_part(v, num_parts))})

    def final(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by("v") \
            .aggregate([("d", "sum"), ("n2", "sum")])
        return pa.table({
            "way_id": pc.cast(g["v"], pa.int64()),
            "deg": pc.cast(g["d_sum"], pa.int64()),
            "n_two_hop": pc.cast(g["n2_sum"], pa.int64())})

    return deg.map_batches(deg_side, batch_format="pyarrow") \
        .union(n2.map_batches(n2_side, batch_format="pyarrow")) \
        .groupby("part").map_groups(final, batch_format="pyarrow")


def osm_changeset_stats(nodes: ray.data.Dataset, ways: ray.data.Dataset,
                        relations: ray.data.Dataset) -> ray.data.Dataset:
    """(changeset, n_nodes, n_ways, n_relations, n_total, n_users):
    per-changeset contribution census across all three element classes
    — the edit-session rollup (how big are upload batches, do bots
    shotgun single-element changesets) that extends osm_user_activity's
    per-user view to the reference's changeset attribute
    (/root/reference/osm/Node.go element attrs).

    Scale plan: each class collapses per block to (changeset, count,
    distinct-uid partial rows); ONE bounded changeset-hash combiner
    exchange merges them (distinct uids re-deduped per partition —
    each changeset wholly in one partition)."""
    from ..relational import hash_part

    def cls_partial(name: str):
        def fn(t: pa.Table) -> pa.Table:
            cs = t["changeset"].combine_chunks().to_numpy()
            uid = t["uid"].combine_chunks().to_numpy()
            order = np.lexsort((uid, cs))
            cs, uid = cs[order], uid[order]
            keep = np.r_[True, (cs[1:] != cs[:-1]) | (uid[1:] != uid[:-1])] \
                if len(cs) else np.empty(0, bool)
            g = pa.table({"changeset": pa.array(cs),
                          "cls": pa.array([name] * len(cs), pa.string()),
                          "n": pa.array(np.ones(len(cs), np.int64))}) \
                .group_by(["changeset", "cls"]).aggregate([("n", "sum")]) \
                .rename_columns(["changeset", "cls", "n"])
            u = pa.table({"changeset": pa.array(cs[keep]),
                          "uid": pa.array(uid[keep])})
            full = pa.table({
                "changeset": pa.concat_arrays(
                    [g["changeset"].combine_chunks(),
                     u["changeset"].combine_chunks()]),
                "cls": pa.array(g["cls"].to_pylist()
                                + ["uid"] * len(u), pa.string()),
                "val": pa.concat_arrays(
                    [g["n"].combine_chunks(),
                     u["uid"].combine_chunks()])})
            key = full["changeset"].combine_chunks().to_numpy()
            return full.append_column("part",
                                      pa.array(hash_part(key, 16)))
        return fn

    def merge(t: pa.Table) -> pa.Table:
        cs = t["changeset"].combine_chunks().to_numpy()
        cls = np.asarray(t["cls"].combine_chunks()
                         .to_numpy(zero_copy_only=False))
        val = t["val"].combine_chunks().to_numpy()
        out = {}
        for c, k, v in zip(cs.tolist(), cls.tolist(), val.tolist()):
            a = out.setdefault(c, {"node": 0, "way": 0, "relation": 0,
                                   "uids": set()})
            if k == "uid":
                a["uids"].add(v)
            else:
                a[k] += v
        keys = sorted(out)
        return pa.table({
            "changeset": pa.array(keys, pa.int64()),
            "n_nodes": pa.array([out[k]["node"] for k in keys], pa.int64()),
            "n_ways": pa.array([out[k]["way"] for k in keys], pa.int64()),
            "n_relations": pa.array([out[k]["relation"] for k in keys],
                                    pa.int64()),
            "n_total": pa.array([out[k]["node"] + out[k]["way"]
                                 + out[k]["relation"] for k in keys],
                                pa.int64()),
            "n_users": pa.array([len(out[k]["uids"]) for k in keys],
                                pa.int64())})

    parts = nodes.select_columns(["changeset", "uid"]) \
        .map_batches(cls_partial("node"), batch_format="pyarrow",
                     batch_size=65536) \
        .union(ways.select_columns(["changeset", "uid"])
               .map_batches(cls_partial("way"), batch_format="pyarrow",
                            batch_size=65536),
               relations.select_columns(["changeset", "uid"])
               .map_batches(cls_partial("relation"),
                            batch_format="pyarrow", batch_size=65536))
    return parts.groupby("part") \
        .map_groups(lambda t: merge(t.drop_columns(["part"])),
                    batch_format="pyarrow")


def way_degree_hist(ways: ray.data.Dataset,
                    num_parts: int = 16) -> ray.data.Dataset:
    """(degree, n_ways, share6): degree distribution of the shared-node
    way graph — the power-law fingerprint every graph-algorithm cost
    model starts from (hot-node caps, orientation bounds, BSP round
    counts all key off this tail). Isolated ways (degree 0) included.

    Scale plan: full deduped edges -> endpoint partials -> ONE v-hash
    exchange -> per-vertex degrees; isolated ways counted by a second
    tiny partial stream (way ids minus edge endpoints, co-partitioned);
    the bounded (degree, n) table merges in one task."""
    from ..relational import hash_part, single_merge

    edges = full_shared_node_edges(ways, num_parts)

    def deg_partial(t: pa.Table) -> pa.Table:
        v = np.concatenate([t["a"].combine_chunks().to_numpy(),
                            t["b"].combine_chunks().to_numpy()])
        u, n = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u),
                         "pd": pa.array(n.astype(np.int64)),
                         "part": pa.array(hash_part(u, num_parts))})

    def id_partial(t: pa.Table) -> pa.Table:
        v = t["id"].combine_chunks().to_numpy()
        return pa.table({"v": pa.array(v),
                         "pd": pa.array(np.zeros(len(v), np.int64)),
                         "part": pa.array(hash_part(v, num_parts))})

    def deg_hist(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by("v") \
            .aggregate([("pd", "sum")])
        d = g["pd_sum"].combine_chunks().to_numpy()
        u, n = np.unique(d, return_counts=True)
        return pa.table({"degree": pa.array(u.astype(np.int64)),
                         "n_ways": pa.array(n.astype(np.int64))})

    partials = edges.map_batches(deg_partial, batch_format="pyarrow") \
        .union(ways.select_columns(["id"])
               .map_batches(id_partial, batch_format="pyarrow")) \
        .groupby("part").map_groups(deg_hist, batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        from ..util import round_half_away
        g = t.group_by("degree").aggregate([("n_ways", "sum")])
        d = g["degree"].combine_chunks().to_numpy()
        order = np.argsort(d)
        n = g["n_ways_sum"].combine_chunks().to_numpy()[order]
        tot = int(n.sum())
        return pa.table({
            "degree": pa.array(d[order], pa.int64()),
            "n_ways": pa.array(n.astype(np.int64)),
            "share6": pa.array(round_half_away(
                n.astype(np.float64) / float(tot), 6), pa.float64())})

    return single_merge(partials, finish)


def osm_ref_integrity(nodes: ray.data.Dataset, ways: ray.data.Dataset,
                      relations: ray.data.Dataset,
                      num_parts: int = 16) -> ray.data.Dataset:
    """(ref_kind, n_refs, n_distinct, n_dangling): referential-
    integrity audit across the OSM model — way->node refs and relation
    members against the actual id sets (the planet-file consistency
    check behind the reference's ways_to_nodes join, which silently
    drops dangling refs: /root/reference/osm/Planet.go:214-225 guards
    with a map lookup).

    Scale plan: each ref stream collapses per block to distinct ids
    with occurrence counts; id streams tag presence; ONE id-hash
    co-partition per kind resolves existence with a sorted merge (the
    union-tag anti-join shape), and per-kind partials sum in one tiny
    task."""
    from ..relational import hash_part, single_merge

    def ref_stream(kind: str, explode_members: str | None):
        def fn(t: pa.Table) -> pa.Table:
            if explode_members is None:
                refs = t["refs"].combine_chunks()
                flat = refs.flatten().to_numpy()
            else:
                m = t["members"].combine_chunks()
                flat_m = m.flatten()
                typ = np.asarray(flat_m.field("type")
                                 .to_numpy(zero_copy_only=False))
                ref = flat_m.field("ref").to_numpy()
                flat = ref[typ == explode_members]
            u, n = np.unique(flat, return_counts=True)
            return pa.table({
                "kind": pa.array([kind] * len(u), pa.string()),
                "id": pa.array(u.astype(np.int64)),
                "n": pa.array(n.astype(np.int64)),
                "is_def": pa.array(np.zeros(len(u), bool)),
                "part": pa.array(hash_part(u.astype(np.int64),
                                           num_parts))})
        return fn

    def def_stream(kind: str):
        def fn(t: pa.Table) -> pa.Table:
            v = t["id"].combine_chunks().to_numpy()
            return pa.table({
                "kind": pa.array([kind] * len(v), pa.string()),
                "id": pa.array(v),
                "n": pa.array(np.zeros(len(v), np.int64)),
                "is_def": pa.array(np.ones(len(v), bool)),
                "part": pa.array(hash_part(v, num_parts))})
        return fn

    streams = [
        ways.select_columns(["refs"]).map_batches(
            ref_stream("way->node", None),
            batch_format="pyarrow", batch_size=65536),
        relations.select_columns(["members"]).map_batches(
            ref_stream("rel->node", "node"),
            batch_format="pyarrow", batch_size=65536),
        relations.select_columns(["members"]).map_batches(
            ref_stream("rel->way", "way"),
            batch_format="pyarrow", batch_size=65536),
        nodes.select_columns(["id"]).map_batches(
            def_stream("way->node"), batch_format="pyarrow",
            batch_size=65536),
        nodes.select_columns(["id"]).map_batches(
            def_stream("rel->node"), batch_format="pyarrow",
            batch_size=65536),
        ways.select_columns(["id"]).map_batches(
            def_stream("rel->way"), batch_format="pyarrow",
            batch_size=65536),
    ]
    allp = streams[0].union(*streams[1:])

    def kernel(t: pa.Table) -> pa.Table:
        kind = np.asarray(t["kind"].combine_chunks()
                          .to_numpy(zero_copy_only=False))
        ids = t["id"].combine_chunks().to_numpy()
        n = t["n"].combine_chunks().to_numpy()
        isd = t["is_def"].combine_chunks().to_numpy(zero_copy_only=False)
        out = {"kind": [], "n_refs": [], "n_distinct": [],
               "n_dangling": []}
        for k in sorted(set(kind.tolist())):
            m = kind == k
            ki, kn, kd = ids[m], n[m], isd[m]
            ref_m = ~kd
            defined = np.unique(ki[kd])
            ru, idx = np.unique(ki[ref_m], return_inverse=True)
            rn = np.bincount(idx, weights=kn[ref_m]).astype(np.int64) \
                if len(ru) else np.empty(0, np.int64)
            miss = ~np.isin(ru, defined)
            out["kind"].append(k)
            out["n_refs"].append(int(rn.sum()))
            out["n_distinct"].append(len(ru))
            out["n_dangling"].append(int(rn[miss].sum()))
        return pa.table({
            "kind": pa.array(out["kind"], pa.string()),
            "n_refs": pa.array(out["n_refs"], pa.int64()),
            "n_distinct": pa.array(out["n_distinct"], pa.int64()),
            "n_dangling": pa.array(out["n_dangling"], pa.int64())})

    partials = allp.groupby("part") \
        .map_groups(lambda t: kernel(t.drop_columns(["part"])),
                    batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("kind").aggregate([("n_refs", "sum"),
                                          ("n_distinct", "sum"),
                                          ("n_dangling", "sum")])
        return g.rename_columns(["ref_kind", "n_refs", "n_distinct",
                                 "n_dangling"])

    return single_merge(partials, finish)


def tag_value_cardinality(ways: ray.data.Dataset,
                          num_parts: int = 16) -> ray.data.Dataset:
    """(key, n_uses, n_values, top_value, top_n): tag VALUE vocabulary
    audit per key over ways — cardinality (free-text keys explode, enum
    keys stay small) and the dominant value (ties to the lexically
    smallest), the schema-inference readout a tag-projection pipeline
    reads before deciding keep-lists.

    Scale plan: per-block Acero (key, value) count partials -> ONE
    key-hash exchange (each key wholly in one partition) -> per-key
    vectorized rollup."""
    from ..relational import _col_hash, hash_part

    def partial(t: pa.Table) -> pa.Table:
        _, keys, vals = tagops.explode_keys(t["tags"].combine_chunks())
        g = pa.table({"key": keys, "value": vals,
                      "n": pa.array(np.ones(len(keys), np.int64))}) \
            .group_by(["key", "value"]).aggregate([("n", "sum")])
        h = _col_hash(g["key"]).astype(np.int64)
        return pa.table({"key": g["key"], "value": g["value"],
                         "n": pc.cast(g["n_sum"], pa.int64()),
                         "part": pa.array(hash_part(h, num_parts))})

    def rollup(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by(["key", "value"]) \
            .aggregate([("n", "sum")]) \
            .sort_by([("key", "ascending"), ("n_sum", "descending"),
                      ("value", "ascending")])
        key = np.asarray(g["key"].combine_chunks()
                         .to_numpy(zero_copy_only=False))
        val = np.asarray(g["value"].combine_chunks()
                         .to_numpy(zero_copy_only=False))
        n = g["n_sum"].combine_chunks().to_numpy()
        if not len(key):
            return pa.table({"key": pa.array([], pa.string()),
                             "n_uses": pa.array([], pa.int64()),
                             "n_values": pa.array([], pa.int64()),
                             "top_value": pa.array([], pa.string()),
                             "top_n": pa.array([], pa.int64())})
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        ends = np.r_[starts[1:], len(key)]
        return pa.table({
            "key": pa.array(key[starts].tolist(), pa.string()),
            "n_uses": pa.array(np.add.reduceat(n, starts)
                               .astype(np.int64)),
            "n_values": pa.array((ends - starts).astype(np.int64)),
            "top_value": pa.array(val[starts].tolist(), pa.string()),
            "top_n": pa.array(n[starts].astype(np.int64))})

    return ways.select_columns(["tags"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=65536) \
        .groupby("part").map_groups(rollup, batch_format="pyarrow")


def way_chaikin_smooth(nodes: ray.data.Dataset, ways: ray.data.Dataset
                       ) -> ray.data.Dataset:
    """(way_id, pt_idx, lon7, lat7): ONE iteration of Chaikin corner
    cutting per way — endpoints kept, each segment replaced by its
    1/4 and 3/4 points — the geometry-smoothing companion of
    way_simplify (subdivision instead of decimation; cartographic
    pre-render and trajectory denoising both use it).

    Determinism contract: the 0.75/0.25 weights are dyadic, so
    0.75*a + 0.25*b is the same IEEE sequence on both sides; 7 dp
    output rounding. Ways must have EVERY ref resolved (the SQL mirror
    enforces the same completeness filter); pt_idx preserves original
    segment positions (P0 -> 0, segment p -> 2p+1 and 2p+2, last
    point -> 2(n-1)+1).

    Scale plan: one node-table broadcast, zero exchanges; per-way work
    linear in points (way_resample's shape)."""
    from ..relational import broadcast_table
    from ..util import round_half_away as _rnd

    nodes_ref = broadcast_table(nodes, ["id", "lon", "lat"])

    def fn(batch: pa.Table) -> pa.Table:
        nt = ray.get(nodes_ref)
        nid = nt["id"].to_numpy()
        order = np.argsort(nid, kind="stable")
        nid_s = nid[order]
        nlon = nt["lon"].to_numpy()[order]
        nlat = nt["lat"].to_numpy()[order]
        refs = batch["refs"].combine_chunks()
        off = np.asarray(refs.offsets, np.int64)
        off = off - off[0]
        flat = refs.flatten().to_numpy()
        wid = batch["id"].combine_chunks().to_numpy()
        idx = np.searchsorted(nid_s, flat)
        idx_c = np.minimum(idx, len(nid_s) - 1)
        found = nid_s[idx_c] == flat
        n_per = np.diff(off)
        ok_per = np.add.reduceat(found.astype(np.int64), off[:-1]) \
            == n_per if len(n_per) else np.empty(0, bool)
        ok_per &= n_per >= 1
        lon = nlon[idx_c]
        lat = nlat[idx_c]
        out_w, out_i, out_x, out_y = [], [], [], []
        for w in np.flatnonzero(ok_per):
            s, e = off[w], off[w + 1]
            n = e - s
            px, py = lon[s:e], lat[s:e]
            out_w.append(np.full(1, wid[w]))
            out_i.append(np.zeros(1, np.int64))
            out_x.append(px[:1].copy())
            out_y.append(py[:1].copy())
            if n >= 2:
                p = np.arange(n - 1, dtype=np.int64)
                qx = 0.75 * px[:-1] + 0.25 * px[1:]
                qy = 0.75 * py[:-1] + 0.25 * py[1:]
                rx = 0.25 * px[:-1] + 0.75 * px[1:]
                ry = 0.25 * py[:-1] + 0.75 * py[1:]
                out_w.append(np.full(2 * (n - 1), wid[w]))
                out_i.append(np.concatenate([2 * p + 1, 2 * p + 2]))
                out_x.append(np.concatenate([qx, rx]))
                out_y.append(np.concatenate([qy, ry]))
                out_w.append(np.full(1, wid[w]))
                out_i.append(np.full(1, 2 * (n - 1) + 1, np.int64))
                out_x.append(px[-1:].copy())
                out_y.append(py[-1:].copy())
        if not out_w:
            return pa.table({"way_id": pa.array([], pa.int64()),
                             "pt_idx": pa.array([], pa.int64()),
                             "lon7": pa.array([], pa.float64()),
                             "lat7": pa.array([], pa.float64())})
        return pa.table({
            "way_id": pa.array(np.concatenate(out_w)),
            "pt_idx": pa.array(np.concatenate(out_i)),
            "lon7": pa.array(_rnd(np.concatenate(out_x), 7)),
            "lat7": pa.array(_rnd(np.concatenate(out_y), 7))})

    return ways.select_columns(["id", "refs"]) \
        .map_batches(fn, batch_format="pyarrow", batch_size=8192)


def way_dead_ends(ways: ray.data.Dataset,
                  num_parts: int = 16) -> ray.data.Dataset:
    """(way_id, n_endpoints, n_dead): DEAD-END census per way — an
    endpoint node is dead when exactly ONE distinct way references it
    (a cul-de-sac / digitization gap), the road-network connectivity
    QA that complements osm_ref_degree's per-node view. Closed rings
    count their shared endpoint once.

    Scale plan: per-block distinct (node, way) partials -> ONE
    node-hash exchange computes distinct-way degrees and marks the
    endpoint rows in the same kernel -> bounded per-way combiner
    exchange sums the flags."""
    from ..relational import hash_part, partial_groupby_agg

    def rows(t: pa.Table) -> pa.Table:
        refs = t["refs"].combine_chunks()
        off = np.asarray(refs.offsets, np.int64)
        off = off - off[0]
        flat = refs.flatten().to_numpy()
        wid = t["id"].combine_chunks().to_numpy()
        n = np.diff(off)
        keep = n >= 1
        # all (node, way) pairs, deduped block-locally (whole way in row)
        way_all = np.repeat(wid, n)
        o = np.lexsort((flat, way_all))
        wa, fa = way_all[o], flat[o]
        d = np.r_[True, (wa[1:] != wa[:-1]) | (fa[1:] != fa[:-1])] \
            if len(wa) else np.empty(0, bool)
        wa, fa = wa[d], fa[d]
        # endpoint rows (first/last ref), deduped per way
        first = flat[off[:-1][keep]]
        last = flat[(off[1:] - 1)[keep]]
        ew = np.concatenate([wid[keep], wid[keep]])
        en = np.concatenate([first, last])
        o2 = np.lexsort((en, ew))
        ew, en = ew[o2], en[o2]
        d2 = np.r_[True, (ew[1:] != ew[:-1]) | (en[1:] != en[:-1])] \
            if len(ew) else np.empty(0, bool)
        ew, en = ew[d2], en[d2]
        return pa.table({
            "node": pa.array(np.concatenate([fa, en])),
            "way": pa.array(np.concatenate([wa, ew])),
            "is_ep": pa.array(np.r_[np.zeros(len(fa), bool),
                                    np.ones(len(ew), bool)]),
            "part": pa.array(hash_part(
                np.concatenate([fa, en]), num_parts))})

    def degree_mark(t: pa.Table) -> pa.Table:
        node = t["node"].combine_chunks().to_numpy()
        way = t["way"].combine_chunks().to_numpy()
        isep = t["is_ep"].combine_chunks().to_numpy(zero_copy_only=False)
        m = ~isep
        o = np.lexsort((way[m], node[m]))
        nn, ww = node[m][o], way[m][o]
        d = np.r_[True, (nn[1:] != nn[:-1]) | (ww[1:] != ww[:-1])] \
            if len(nn) else np.empty(0, bool)
        nn = nn[d]
        u, deg = np.unique(nn, return_counts=True)
        ei = np.searchsorted(u, node[isep])
        dead = deg[np.minimum(ei, max(len(u) - 1, 0))] == 1 \
            if len(u) else np.zeros(int(isep.sum()), bool)
        return pa.table({
            "way_id": pa.array(way[isep]),
            "ep": pa.array(np.ones(int(isep.sum()), np.int64)),
            "dead": pa.array(dead.astype(np.int64))})

    marked = ways.select_columns(["id", "refs"]) \
        .map_batches(rows, batch_format="pyarrow", batch_size=65536) \
        .groupby("part") \
        .map_groups(lambda t: degree_mark(t.drop_columns(["part"])),
                    batch_format="pyarrow")

    g = partial_groupby_agg(marked, ["way_id"],
                            [("ep", "sum"), ("dead", "sum")])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "way_id": pc.cast(t["way_id"], pa.int64()),
            "n_endpoints": pc.cast(t["ep_sum"], pa.int64()),
            "n_dead": pc.cast(t["dead_sum"], pa.int64())})

    return g.map_batches(finish, batch_format="pyarrow")


def way_length_gini(nodes: ray.data.Dataset, ways: ray.data.Dataset
                    ) -> ray.data.Dataset:
    """(n_ways, total_mm, gini6): GINI coefficient of way lengths — the
    network-inequality summary (a planet extract mixing motorways with
    micro-footpaths ginis high; a residential grid low), sharing
    way_length_m's exact length contract (per-segment 3 dp rounding
    before the fold) and converting to integer MILLIMETRES so the
    Lorenz sum is exact integer arithmetic on both sides (python ints
    in the engine, HUGEINT in the mirror; gini =
    (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over the ascending
    sort, tie-order-free).

    Scale plan: way_length_m's zero-exchange broadcast pass, then ONE
    merge task over the bounded (one int per way) length list; the
    customer_abc bucketed-Lorenz exchange is the documented fallback
    when the way count outgrows a single task."""
    from ..relational import single_merge
    from ..util import round_half_away

    lengths = way_length_m(nodes, ways)

    def partial(t: pa.Table) -> pa.Table:
        mm = round_half_away(
            t["len_m3"].combine_chunks().to_numpy() * 1000.0, 0
        ).astype(np.int64)
        return pa.table({"mm": pa.array(mm)})

    def finish(t: pa.Table) -> pa.Table:
        mm = np.sort(t["mm"].combine_chunks().to_numpy())
        n = len(mm)
        tot = int(mm.sum())
        s2 = 0
        for i, x in enumerate(mm.tolist(), start=1):
            s2 += i * x
        gini = float(2 * s2 - (n + 1) * tot) / float(n * tot) \
            if n and tot else 0.0
        return pa.table({
            "n_ways": pa.array([n], pa.int64()),
            "total_mm": pa.array([tot], pa.int64()),
            "gini6": pa.array([float(round_half_away(
                np.float64(gini), 6))], pa.float64())})

    return single_merge(
        lengths.select_columns(["len_m3"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        finish)


def way_cell_span(nodes: ray.data.Dataset, ways: ray.data.Dataset,
                  res: int = 11) -> ray.data.Dataset:
    """(way_id, n_points, n_cells): how many DISTINCT quadtree cells a
    way's vertices touch — the spatial-locality census behind shard
    sizing (a way inside one cell joins locally; a span-many trunk
    road crosses shard boundaries and pays the sharded-PIP ring
    expansion).

    Scale plan: the way_length_m zero-exchange broadcast-nodes shape;
    per-way distinct-cell count is a block-local unique over the
    resolved vertices (the whole way sits in one list cell)."""
    from ..geo import tiles
    from ..relational import broadcast_table

    nodes_ref = broadcast_table(nodes, ["id", "lon", "lat"])

    def fn(batch: pa.Table) -> pa.Table:
        nt = ray.get(nodes_ref)
        nid = nt["id"].to_numpy()
        order = np.argsort(nid, kind="stable")
        nid_s = nid[order]
        nlon = nt["lon"].to_numpy()[order]
        nlat = nt["lat"].to_numpy()[order]
        refs = batch["refs"].combine_chunks()
        off = np.asarray(refs.offsets, np.int64)
        off = off - off[0]
        flat = refs.flatten().to_numpy()
        wid = batch["id"].combine_chunks().to_numpy()
        idx = np.minimum(np.searchsorted(nid_s, flat), len(nid_s) - 1)
        found = nid_s[idx] == flat
        cell = tiles.cell_id(nlon[idx], nlat[idx], res)
        way = np.repeat(wid, np.diff(off))
        way, cell = way[found], cell[found]
        order2 = np.lexsort((cell, way))
        way, cell = way[order2], cell[order2]
        if len(way):
            newp = np.r_[True, (way[1:] != way[:-1])]
            newc = np.r_[True, (way[1:] != way[:-1])
                         | (cell[1:] != cell[:-1])]
            starts = np.flatnonzero(newp)
            npts = np.diff(np.r_[starts, len(way)])
            ncell = np.add.reduceat(newc.astype(np.int64), starts)
            ids = way[starts]
        else:
            ids = np.empty(0, np.int64)
            npts = np.empty(0, np.int64)
            ncell = np.empty(0, np.int64)
        return pa.table({"way_id": pa.array(ids),
                         "n_points": pa.array(npts.astype(np.int64)),
                         "n_cells": pa.array(ncell.astype(np.int64))})

    return ways.select_columns(["id", "refs"]) \
        .map_batches(fn, batch_format="pyarrow", batch_size=8192)


def node_tag_hist(nodes: ray.data.Dataset) -> ray.data.Dataset:
    """(n_tags, n_nodes, share6): tags-per-node histogram — the
    annotation-density profile (how much of the corpus carries no
    metadata at all).

    Scale plan: embarrassingly parallel bounded partials, one tiny
    merge."""
    from ..relational import single_merge
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        tags = t["tags"].combine_chunks()
        off = np.asarray(tags.offsets, np.int64)
        n = np.diff(off)
        u, c = np.unique(n, return_counts=True)
        return pa.table({"n_tags": pa.array(u.astype(np.int64)),
                         "n_nodes": pa.array(c.astype(np.int64))})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("n_tags").aggregate([("n_nodes", "sum")])
        k = g["n_tags"].combine_chunks().to_numpy()
        order = np.argsort(k)
        n = g["n_nodes_sum"].combine_chunks().to_numpy()[order]
        tot = int(n.sum())
        return pa.table({
            "n_tags": pa.array(k[order], pa.int64()),
            "n_nodes": pa.array(n.astype(np.int64)),
            "share6": pa.array(round_half_away(
                n.astype(np.float64) / float(tot), 6), pa.float64())})

    return single_merge(
        nodes.select_columns(["tags"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        merge)


def tagged_way_connectivity(ways: ray.data.Dataset, key: str = "highway",
                            num_parts: int = 16) -> ray.data.Dataset:
    """(tagged, n_ways, total_deg, mean_deg6): does carrying the
    ``key`` tag correlate with graph connectivity? The tag x topology
    crosstab (amenity-tagged ways are destinations — do they sit in
    denser mesh?). Isolated ways count with degree 0.

    Scale plan: full deduped edges -> endpoint partials -> ONE v-hash
    exchange for degrees; way (id, tagged) rows co-partition by the
    same hash and the kernel joins + collapses to TWO partial rows;
    tiny final merge."""
    from ..relational import hash_part, single_merge
    from ..util import round_half_away

    edges = full_shared_node_edges(ways, num_parts)

    def deg_partial(t: pa.Table) -> pa.Table:
        v = np.concatenate([t["a"].combine_chunks().to_numpy(),
                            t["b"].combine_chunks().to_numpy()])
        u, n = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u),
                         "d": pa.array(n.astype(np.int64)),
                         "tagged": pa.array(np.zeros(len(u), np.int64)),
                         "is_way": pa.array(np.zeros(len(u), bool)),
                         "part": pa.array(hash_part(u, num_parts))})

    def way_rows(t: pa.Table) -> pa.Table:
        val = tagops.value_of(t["tags"].combine_chunks(), key)
        tagged = pc.is_valid(val).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        wid = t["id"].combine_chunks().to_numpy()
        return pa.table({"v": pa.array(wid),
                         "d": pa.array(np.zeros(len(wid), np.int64)),
                         "tagged": pa.array(tagged),
                         "is_way": pa.array(np.ones(len(wid), bool)),
                         "part": pa.array(hash_part(wid, num_parts))})

    def kernel(t: pa.Table) -> pa.Table:
        v = t["v"].combine_chunks().to_numpy()
        d = t["d"].combine_chunks().to_numpy()
        tg = t["tagged"].combine_chunks().to_numpy()
        isw = t["is_way"].combine_chunks().to_numpy(zero_copy_only=False)
        # sum partial degrees per vertex
        uv, inv = np.unique(v, return_inverse=True)
        dsum = np.bincount(inv, weights=d).astype(np.int64)
        w_m = isw
        out = {"tagged": [], "n": [], "td": []}
        for flag in (0, 1):
            m = w_m & (tg == flag)
            vidx = inv[m]
            out["tagged"].append(flag)
            out["n"].append(int(m.sum()))
            out["td"].append(int(dsum[vidx].sum()))
        return pa.table({"tagged": pa.array(out["tagged"], pa.int64()),
                         "n": pa.array(out["n"], pa.int64()),
                         "td": pa.array(out["td"], pa.int64())})

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by("tagged").aggregate([("n", "sum"), ("td", "sum")])
        tg = g["tagged"].combine_chunks().to_numpy()
        order = np.argsort(tg)
        n = g["n_sum"].combine_chunks().to_numpy()[order]
        td = g["td_sum"].combine_chunks().to_numpy()[order]
        keep = n > 0          # a flag class absent from the corpus
        tg, n, td = tg[order][keep], n[keep], td[keep]
        mean = td.astype(np.float64) / n.astype(np.float64)
        return pa.table({
            "tagged": pa.array((tg == 1)),
            "n_ways": pa.array(n.astype(np.int64)),
            "total_deg": pa.array(td.astype(np.int64)),
            "mean_deg6": pa.array(round_half_away(mean, 6),
                                  pa.float64())})

    parts = edges.map_batches(deg_partial, batch_format="pyarrow") \
        .union(ways.select_columns(["id", "tags"])
               .map_batches(way_rows, batch_format="pyarrow",
                            batch_size=65536)) \
        .groupby("part") \
        .map_groups(lambda t: kernel(t.drop_columns(["part"])),
                    batch_format="pyarrow")
    return single_merge(parts, finish)


def component_size_hist(ways: ray.data.Dataset,
                        num_parts: int = 32) -> ray.data.Dataset:
    """(size, n_components, share6): component-SIZE histogram of the
    shared-node way graph — the fragmentation profile on top of
    way_components (one giant component = healthy road network; a fat
    tail of 2-3-way islands = import debris).

    Scale plan: way_components' star-edge BSP labels, then TWO bounded
    combiner exchanges (per-component counts -> per-size counts) and a
    tiny merge."""
    from ..relational import partial_groupby_agg, single_merge
    from ..util import round_half_away

    labels = way_components(ways, num_parts)

    def one(t: pa.Table) -> pa.Table:
        return pa.table({"component_id":
                         t["component_id"].combine_chunks(),
                         "n": pa.array(np.ones(len(t), np.int64))})

    per_comp = partial_groupby_agg(
        labels.map_batches(one, batch_format="pyarrow",
                           batch_size=65536),
        ["component_id"], [("n", "sum")])

    def size_partial(t: pa.Table) -> pa.Table:
        n = t["n_sum"].combine_chunks().to_numpy()
        u, c = np.unique(n, return_counts=True)
        return pa.table({"size": pa.array(u.astype(np.int64)),
                         "n_components": pa.array(c.astype(np.int64))})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("size").aggregate([("n_components", "sum")])
        k = g["size"].combine_chunks().to_numpy()
        order = np.argsort(k)
        n = g["n_components_sum"].combine_chunks().to_numpy()[order]
        tot = int(n.sum())
        return pa.table({
            "size": pa.array(k[order], pa.int64()),
            "n_components": pa.array(n.astype(np.int64)),
            "share6": pa.array(round_half_away(
                n.astype(np.float64) / float(tot), 6), pa.float64())})

    return single_merge(
        per_comp.map_batches(size_partial, batch_format="pyarrow"),
        merge)
