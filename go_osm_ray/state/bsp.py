"""Actor-resident BSP for iterative graph algorithms (components, PageRank).

Why actors, not per-round Dataset groupbys: each
``groupby("part").map_groups`` round in Ray Data pays a fixed sort-shuffle
(measured 2-4 s per round on this box at ANY payload size), and an iterative
algorithm pays it every round — way_components needed ~10 rounds = ~33 s at
sf0.1 with the Dataset runner. The edge list is STATIC across rounds and the
per-node label/rank vector is shared mutable state read-modify-written every
round — exactly the "shared mutable index" case where the Dataset API can't
express the semantics and raw Ray actors are the sanctioned fallback.

Topology: one actor per hash partition (``relational.hash_part`` keys both
the edge shards and every exchange). Each actor loads its edge shard ONCE in
``__init__`` from the shard dir ``shard_static_edges`` wrote (after all
actors report ready the driver DELETES the dir when it owns it — the graph
lives in actor memory from then on). Each round is one actor RPC whose
outbound pushes return as ``n_live`` separate ObjectRefs (``num_returns``);
the driver routes the REFS to the destination actors' next ``step`` —
payload bytes move actor-to-actor through the object store and never through
the driver. The driver fetches only the tiny per-round ``changed`` counter.

Partitioning assumptions (documented per the custom-operator rule):
- node ids are non-negative int64; ``hash_part(id)`` places a node's state,
  and BOTH directions of every edge are sharded by hash(src), so a node's
  full adjacency is local to its actor and every message's destination
  partition is guaranteed to hold a shard (hence an actor);
- one partition's edge shard + label vector must fit in one actor's heap —
  size ``num_parts`` to the graph (edges / desired shard bytes), not to the
  CPU count; actors are ``num_cpus=0`` + SPREAD because their work is
  bursty vectorized numpy between waits, and a round must not deadlock when
  ``num_parts`` exceeds the CPU count (pytest runs at num_cpus=4).
"""
from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import ray

from ..relational import hash_part


class _ShardPart:
    """Shared shard-loading base: node universe, src-sorted edges, the
    precomputed src->uid index, and vectorized outbox routing."""

    def __init__(self, shard_dir: str, part: int, num_parts: int,
                 live_parts: list[int]):
        import pyarrow.parquet as pq
        self.part = part
        self.num_parts = num_parts
        self.live_arr = np.asarray(live_parts, np.int64)  # sorted
        self.n_live = len(live_parts)
        t = pq.read_table(os.path.join(shard_dir,
                                       f"edges-{part:05d}.parquet"))
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        self.uid = np.unique(src)         # markers (dst == -1) count too
        real = dst != -1
        src, dst = src[real], dst[real]
        order = np.argsort(src, kind="stable")
        self.src, self.dst = src[order], dst[order]
        # src -> position in uid, fixed across rounds
        self.src_j = np.searchsorted(self.uid, self.src)

    def ready(self) -> int:
        return len(self.uid)

    def _fold_index(self, ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """uid positions for inbound message ids (masked: a message for a
        node this shard doesn't hold is dropped, which cannot happen by the
        sharding invariant but must not corrupt state if it did)."""
        j = np.searchsorted(self.uid, ids).clip(max=max(len(self.uid) - 1, 0))
        ok = self.uid[j] == ids if len(self.uid) else \
            np.zeros(len(ids), bool)
        return j, ok

    def _dest_segments(self, ids: np.ndarray) -> list[np.ndarray]:
        """Row-index array per live destination actor for target node ids
        (vectorized: hash -> live-slot via searchsorted over live parts)."""
        dest = hash_part(ids, self.num_parts)
        slot = np.searchsorted(self.live_arr, dest) \
            .clip(max=max(self.n_live - 1, 0))
        ok = self.live_arr[slot] == dest if self.n_live else \
            np.zeros(len(dest), bool)
        slot = np.where(ok, slot, self.n_live)  # drop-bucket for misses
        order = np.argsort(slot, kind="stable")
        bounds = np.searchsorted(slot[order], np.arange(self.n_live + 1))
        return [order[bounds[i]:bounds[i + 1]] for i in range(self.n_live)]


@ray.remote(num_cpus=0)
class _ComponentsPart(_ShardPart):
    """One partition of pointer-jumping min-label connected components.

    Message kinds on the exchange (same protocol as the retired Dataset
    runner): 1 = candidate label value for a node, 2 = pointer-jump request
    ("node ``val`` asks for the label of node ``id``")."""

    def __init__(self, shard_dir: str, part: int, num_parts: int,
                 live_parts: list[int]):
        super().__init__(shard_dir, part, num_parts, live_parts)
        self.label = self.uid.copy()      # init: own id
        self.first = True                 # round 0 pushes everything

    def step(self, *inbox):
        uid, label = self.uid, self.label
        cand_id, cand_val = [], []
        req_about, req_asker = [], []
        for msg in inbox:
            if msg is None:
                continue
            ids, vals, kinds = msg
            c = kinds == 1
            cand_id.append(ids[c])
            cand_val.append(vals[c])
            r = kinds == 2
            req_about.append(ids[r])
            req_asker.append(vals[r])
        # --- fold candidate labels (kind 1) ------------------------------
        changed = np.zeros(len(uid), bool)
        if cand_id and len(uid):
            cid = np.concatenate(cand_id)
            cval = np.concatenate(cand_val)
            j, ok = self._fold_index(cid)
            new = label.copy()
            np.minimum.at(new, j[ok], cval[ok])
            changed = new < label
            self.label = label = new
        if self.first:
            changed = np.ones(len(uid), bool)
            self.first = False
        out_id, out_val, out_kind = [], [], []
        # --- answer pointer-jump requests when they shortcut --------------
        if req_about and len(uid):
            about = np.concatenate(req_about)
            asker = np.concatenate(req_asker)
            j, ok = self._fold_index(about)
            hit = ok & (label[j] < about)
            if hit.any():
                out_id.append(asker[hit])
                out_val.append(label[j[hit]])
                out_kind.append(np.ones(int(hit.sum()), np.int8))
        # --- push changed labels along local edges (delta propagation) ----
        if changed.any() and len(self.src):
            hit = changed[self.src_j]
            if hit.any():
                out_id.append(self.dst[hit])
                out_val.append(label[self.src_j[hit]])
                out_kind.append(np.ones(int(hit.sum()), np.int8))
        # --- re-issue pointer-jump requests for every non-root ------------
        # (label(u) may itself improve later, so ask again each round)
        nr = label < uid
        if nr.any():
            out_id.append(label[nr])
            out_val.append(uid[nr])
            out_kind.append(np.full(int(nr.sum()), 2, np.int8))
        if out_id:
            ids = np.concatenate(out_id)
            vals = np.concatenate(out_val)
            kinds = np.concatenate(out_kind)
            segs = self._dest_segments(ids)
            boxes = [None if len(s) == 0 else (ids[s], vals[s], kinds[s])
                     for s in segs]
        else:
            boxes = [None] * self.n_live
        return (*boxes, int(changed.sum()))

    def result(self) -> pa.Table:
        return pa.table({"doc_id": pa.array(self.uid),
                         "group_id": pa.array(self.label)})


def run_components(shard_dir: str, live_parts: set[int], num_parts: int,
                   max_iters: int, cleanup: bool = False) -> ray.data.Dataset:
    """Drive the components actors to the 2-consecutive-quiet fixpoint
    (pointer-jump answers land one round behind label updates, so one quiet
    round can still have messages in flight). Raises past ``max_iters``
    rather than returning silently-wrong labels."""
    live = sorted(live_parts)
    if not live:
        return ray.data.from_arrow(pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "group_id": pa.array([], pa.int64())}))
    actors = [
        _ComponentsPart.options(scheduling_strategy="SPREAD")
        .remote(shard_dir, p, num_parts, live) for p in live]
    ray.get([a.ready.remote() for a in actors])
    if cleanup:                         # graph now lives in actor memory
        shutil.rmtree(shard_dir, ignore_errors=True)
    n = len(actors)
    inbox: list[list] = [[] for _ in range(n)]
    quiet = 0
    for _ in range(max_iters):
        outs = [a.step.options(num_returns=n + 1).remote(*inbox[i])
                for i, a in enumerate(actors)]
        inbox = [[outs[si][di] for si in range(n)] for di in range(n)]
        changed = sum(ray.get([o[n] for o in outs]))
        quiet = quiet + 1 if changed == 0 else 0
        if quiet >= 2:
            break
    else:
        raise RuntimeError(
            f"min_label_components_static: no fixpoint in {max_iters} "
            f"rounds — raise max_iters (graph diameter beyond 2^iters?)")
    return ray.data.from_arrow_refs(
        [a.result.remote() for a in actors]).materialize()


@ray.remote(num_cpus=0)
class _PageRankPart(_ShardPart):
    """One partition of undirected PageRank on the static edge shards.
    Degree is computed LOCALLY (both directions of the globally-deduped
    edge set are sharded by hash(src), so count-of-src == undirected
    degree) — the Dataset runner's separate degree exchange is gone.
    Dangling (edge-less) nodes hold (1-d)/N throughout; dangling mass is
    not redistributed (documented simplification, mirrored exactly by the
    scalar oracle)."""

    def __init__(self, shard_dir: str, part: int, num_parts: int,
                 live_parts: list[int], damping: float):
        super().__init__(shard_dir, part, num_parts, live_parts)
        self.damping = damping
        self.deg = (np.searchsorted(self.src, self.uid, side="right")
                    - np.searchsorted(self.src, self.uid, side="left")
                    ).astype(np.int64)
        self.pr = np.empty(0)
        self.base = 0.0
        self.edge_segs = self._dest_segments(self.dst)  # static routing

    def set_n(self, n_total: int) -> None:
        self.pr = np.full(len(self.uid), 1.0 / float(n_total))
        self.base = (1.0 - self.damping) / float(n_total)

    def _emit(self):
        contrib = self.pr[self.src_j] / self.deg[self.src_j].astype(
            np.float64)
        return [None if len(s) == 0 else (self.dst[s], contrib[s])
                for s in self.edge_segs]

    def step(self, fold: bool, emit: bool, *inbox):
        if fold:
            s = np.zeros(len(self.uid), np.float64)
            for msg in inbox:
                if msg is None:
                    continue
                ids, vals = msg
                j, ok = self._fold_index(ids)
                np.add.at(s, j[ok], vals[ok])
            self.pr = self.base + self.damping * s
        if emit:
            return (*self._emit(), 0)
        return (*([None] * self.n_live), 0)

    def result(self) -> pa.Table:
        from ..util import round_half_away
        return pa.table({
            "way_id": pa.array(self.uid),
            "deg": pa.array(self.deg),
            "pr9": pa.array(round_half_away(self.pr, 9)),
        })


def run_pagerank(shard_dir: str, live_parts: set[int], num_parts: int,
                 iters: int, damping: float,
                 cleanup: bool = False) -> ray.data.Dataset:
    """Round 0 emits from the uniform init ranks; rounds 1..iters-1 fold
    then emit; the final round folds only — the same schedule as the
    retired Dataset runner so the scalar oracle matches at 9-decimal
    rounding."""
    live = sorted(live_parts)
    if not live:
        return ray.data.from_arrow(pa.table(
            {"way_id": pa.array([], pa.int64()),
             "deg": pa.array([], pa.int64()),
             "pr9": pa.array([], pa.float64())}))
    actors = [
        _PageRankPart.options(scheduling_strategy="SPREAD")
        .remote(shard_dir, p, num_parts, live, damping) for p in live]
    counts = ray.get([a.ready.remote() for a in actors])
    if cleanup:
        shutil.rmtree(shard_dir, ignore_errors=True)
    ray.get([a.set_n.remote(int(sum(counts))) for a in actors])
    n = len(actors)
    inbox: list[list] = [[] for _ in range(n)]
    schedule = [(False, True)] + [(True, it < iters - 1)
                                  for it in range(iters)]
    for fold, emit in schedule:
        outs = [a.step.options(num_returns=n + 1).remote(fold, emit,
                                                         *inbox[i])
                for i, a in enumerate(actors)]
        inbox = [[outs[si][di] for si in range(n)] for di in range(n)]
        ray.get([o[n] for o in outs])    # barrier per BSP round
    return ray.data.from_arrow_refs(
        [a.result.remote() for a in actors]).materialize()


@ray.remote(num_cpus=0)
class _BFSPart(_ShardPart):
    """One partition of multi-source BFS (min hop distance).  State is
    one int64 distance per local node (-1 = unreached); each round folds
    inbound candidate distances with min and pushes dist+1 along local
    edges for nodes whose distance improved — pure frontier traffic, no
    pointer jumps (distances are already shortest-path monotone)."""

    def __init__(self, shard_dir: str, part: int, num_parts: int,
                 live_parts: list[int], seed_ways: np.ndarray | None = None,
                 seed_mod: int = 41):
        super().__init__(shard_dir, part, num_parts, live_parts)
        way = self.uid // 2
        if seed_ways is not None:
            # explicit SORTED way-id seed set (pseudo-diameter phases)
            if len(seed_ways):
                j = np.clip(np.searchsorted(seed_ways, way), 0,
                            len(seed_ways) - 1)
                seeded = (self.uid % 2 == 0) & (seed_ways[j] == way)
            else:
                seeded = np.zeros(len(self.uid), bool)
        else:
            # WAY-namespace nodes (even id) with (id//2) % seed_mod == 0
            seeded = (self.uid % 2 == 0) & (way % seed_mod == 0)
        self.dist = np.where(seeded, 0, -1).astype(np.int64)
        self.first = True

    def step(self, *inbox):
        uid, dist = self.uid, self.dist
        cand_id, cand_val = [], []
        for msg in inbox:
            if msg is None:
                continue
            ids, vals = msg
            cand_id.append(ids)
            cand_val.append(vals)
        changed = np.zeros(len(uid), bool)
        if cand_id and len(uid):
            cid = np.concatenate(cand_id)
            cval = np.concatenate(cand_val)
            j, ok = self._fold_index(cid)
            new = dist.copy()
            unreached = new == -1
            big = np.where(unreached, np.iinfo(np.int64).max, new)
            np.minimum.at(big, j[ok], cval[ok])
            new = np.where(big == np.iinfo(np.int64).max, -1, big)
            changed = new != dist
            self.dist = dist = new
        if self.first:
            changed = dist == 0          # round 0: seed frontier
            self.first = False
        if changed.any() and len(self.src):
            hit = changed[self.src_j] & (dist[self.src_j] >= 0)
            if hit.any():
                ids = self.dst[hit]
                vals = dist[self.src_j[hit]] + 1
                segs = self._dest_segments(ids)
                boxes = [None if len(s) == 0 else (ids[s], vals[s])
                         for s in segs]
                return (*boxes, int(changed.sum()))
        return (*([None] * self.n_live), int(changed.sum()))

    def result(self) -> pa.Table:
        # emit WAY-namespace reached nodes; bipartite dist 2k == k hops
        m = (self.uid % 2 == 0) & (self.dist >= 0)
        return pa.table({"way_id": pa.array(self.uid[m] // 2),
                         "depth": pa.array(self.dist[m] // 2)})


def run_bfs(shard_dir: str, live_parts: set[int], num_parts: int,
            max_rounds: int, seed_mod: int = 41,
            seed_ways: np.ndarray | None = None,
            cleanup: bool = False) -> ray.data.Dataset:
    """Drive the BFS actors for at most ``max_rounds`` rounds (= 2x the
    way-hop cap on the bipartite graph) or to a quiet round."""
    live = sorted(live_parts)
    if not live:
        return ray.data.from_arrow(pa.table(
            {"way_id": pa.array([], pa.int64()),
             "depth": pa.array([], pa.int64())}))
    actors = [
        _BFSPart.options(scheduling_strategy="SPREAD")
        .remote(shard_dir, p, num_parts, live, seed_ways, seed_mod)
        for p in live]
    ray.get([a.ready.remote() for a in actors])
    if cleanup:
        shutil.rmtree(shard_dir, ignore_errors=True)
    n = len(actors)
    inbox: list[list] = [[] for _ in range(n)]
    for _ in range(max_rounds + 1):      # +1: round 0 only seeds
        outs = [a.step.options(num_returns=n + 1).remote(*inbox[i])
                for i, a in enumerate(actors)]
        inbox = [[outs[si][di] for si in range(n)] for di in range(n)]
        if sum(ray.get([o[n] for o in outs])) == 0:
            break
    return ray.data.from_arrow_refs(
        [a.result.remote() for a in actors]).materialize()


@ray.remote(num_cpus=0)
class _KCorePart(_ShardPart):
    """One partition of distributed k-core decomposition by iterated
    neighbourhood H-INDEX (Montresor et al., "Distributed k-core
    decomposition"): every node keeps a coreness upper bound c(v)
    initialized to deg(v); each round c(v) <- H(c(neighbours)) — the
    largest h with >= h neighbours whose bound is >= h. The sequence is
    monotone non-increasing and converges exactly to the core numbers.
    Messages carry (sender node id, new bound) and are ROUTED by the
    neighbour (receiver) id; each receiver caches the latest bound per
    incident edge, so a round with zero changes is a global fixpoint."""

    def __init__(self, shard_dir: str, part: int, num_parts: int,
                 live_parts: list[int]):
        super().__init__(shard_dir, part, num_parts, live_parts)
        self.deg = np.bincount(self.src_j, minlength=len(self.uid)) \
            .astype(np.int64)
        self.c = self.deg.copy()
        # latest known bound per incident edge's far end (optimistic init)
        self.nbr_c = np.full(len(self.dst), np.int64(1) << 62, np.int64)
        # dst lookup structures for the per-edge cache update
        self.dst_order = np.argsort(self.dst, kind="stable")
        self.dst_sorted = self.dst[self.dst_order]
        # segment starts per src node, in (src, -nbr_c) re-sort each round
        self.first = True

    def _update_cache(self, ids: np.ndarray, vals: np.ndarray) -> None:
        lo = np.searchsorted(self.dst_sorted, ids, side="left")
        hi = np.searchsorted(self.dst_sorted, ids, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if not total:
            return
        starts = np.concatenate([np.zeros(1, np.int64),
                                 np.cumsum(cnt)[:-1]])
        flat = np.repeat(lo, cnt) + (np.arange(total, dtype=np.int64)
                                     - np.repeat(starts, cnt))
        self.nbr_c[self.dst_order[flat]] = np.repeat(vals, cnt)

    def step(self, *inbox):
        for msg in inbox:
            if msg is None:
                continue
            ids, vals = msg
            self._update_cache(ids, vals)
        changed = np.zeros(len(self.uid), bool)
        if len(self.src):
            # per-node h-index over the cached neighbour bounds
            order = np.lexsort((-self.nbr_c, self.src_j))
            sj = self.src_j[order]
            vals = self.nbr_c[order]
            seg = np.r_[True, sj[1:] != sj[:-1]]
            starts = np.flatnonzero(seg)
            rank = np.arange(len(sj), dtype=np.int64) \
                - np.repeat(starts, np.diff(np.r_[starts, len(sj)])) + 1
            m = np.minimum(rank, vals)
            h = np.maximum.reduceat(m, starts)
            new = self.c.copy()
            nodes = sj[starts]
            new[nodes] = np.minimum(new[nodes], h)
            changed = new < self.c
            self.c = new
        if self.first:
            changed = self.deg > 0
            self.first = False
        # push changed bounds to each neighbour's owner (route by dst)
        if changed.any() and len(self.src):
            hit = changed[self.src_j]
            d = self.dst[hit]
            u = self.src[hit]
            v = self.c[self.src_j[hit]]
            segs = self._dest_segments(d)
            boxes = [None if len(s) == 0 else (u[s], v[s]) for s in segs]
        else:
            boxes = [None] * self.n_live
        return (*boxes, int(changed.sum()))

    def result(self) -> pa.Table:
        return pa.table({"way_id": pa.array(self.uid),
                         "core": pa.array(self.c)})


def run_kcore(shard_dir: str, live_parts: set[int], num_parts: int,
              max_iters: int, cleanup: bool = False) -> ray.data.Dataset:
    """Drive the k-core actors to the quiet fixpoint (a zero-change
    round empties every outbox, so one quiet round IS convergence; two
    kept for symmetry with the other runners)."""
    live = sorted(live_parts)
    if not live:
        return ray.data.from_arrow(pa.table(
            {"way_id": pa.array([], pa.int64()),
             "core": pa.array([], pa.int64())}))
    actors = [
        _KCorePart.options(scheduling_strategy="SPREAD")
        .remote(shard_dir, p, num_parts, live) for p in live]
    ray.get([a.ready.remote() for a in actors])
    if cleanup:
        shutil.rmtree(shard_dir, ignore_errors=True)
    n = len(actors)
    inbox: list[list] = [[] for _ in range(n)]
    quiet = 0
    for _ in range(max_iters):
        outs = [a.step.options(num_returns=n + 1).remote(*inbox[i])
                for i, a in enumerate(actors)]
        inbox = [[outs[si][di] for si in range(n)] for di in range(n)]
        changed = sum(ray.get([o[n] for o in outs]))
        quiet = quiet + 1 if changed == 0 else 0
        if quiet >= 2:
            break
    else:
        raise RuntimeError(
            f"run_kcore: no fixpoint in {max_iters} rounds")
    return ray.data.from_arrow_refs(
        [a.result.remote() for a in actors]).materialize()


# --------------------------------------------------------------- Boruvka MSF

_W1 = np.uint64(0x9E3779B97F4A7C15)
_W2 = np.uint64(0xC2B2AE3D27D4EB4F)


def mst_edge_weight(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Deterministic pseudo-weight of the canonical (a < b) edge: a
    64-bit multiply-xor mix truncated to [0, 2^32) so per-component
    int64 weight sums stay exact past billions of edges. Collisions are
    harmless: every comparison in the engine AND the oracle uses the
    total order (w, a, b), so the minimum spanning forest is unique."""
    with np.errstate(over="ignore"):
        x = a.astype(np.uint64) * _W1 + b.astype(np.uint64) * _W2
        x ^= x >> np.uint64(33)
        x *= _W1
        x ^= x >> np.uint64(29)
    return (x >> np.uint64(32)).astype(np.int64)


@ray.remote(num_cpus=0)
class _MSTPart(_ShardPart):
    """One partition of distributed Boruvka minimum-spanning-forest.

    Roles held by every actor (all keyed by ``hash_part``):
    - NODE owner (hash(node)): label vector of its nodes + the cached
      label of every local edge's far endpoint (exact, not stale: every
      label change is pushed along the mirror edges at round end);
    - COMPONENT owner (hash(component id)): this round's min outgoing
      edge of its components (``sel``) and the hooking parent pointers
      the jump phases compress.

    One Boruvka round = find_cands -> pick_min -> resolve ->
    (jump_ask/answer/apply)* -> label_ask/answer -> apply_labels ->
    apply_dst_labels, each phase one all-to-all of numpy arrays routed
    actor-to-actor through the object store. Components at least halve
    per round, so the driver loop is O(log n) rounds; per round every
    actor scans its static edge shard once (no contraction — the scan
    is vectorized and the shard never moves)."""

    def __init__(self, shard_dir: str, part: int, num_parts: int,
                 live_parts: list[int]):
        super().__init__(shard_dir, part, num_parts, live_parts)
        self.label = self.uid.copy()
        self.e_dst_lbl = self.dst.copy()         # exact far-end labels
        lo = np.minimum(self.src, self.dst)
        hi = np.maximum(self.src, self.dst)
        self.e_a, self.e_b = lo, hi
        self.e_w = mst_edge_weight(lo, hi)
        # component-owner round state
        self.sel = None
        self.parent_c = np.empty(0, np.int64)
        self.parent_p = np.empty(0, np.int64)
        self.mst_a: list = []
        self.mst_b: list = []
        self.mst_w: list = []

    @staticmethod
    def _cat(inbox, width):
        cols = [[] for _ in range(width)]
        for msg in inbox:
            if msg is None:
                continue
            for i in range(width):
                cols[i].append(msg[i])
        if not cols[0]:
            return [np.empty(0, np.int64) for _ in range(width)]
        return [np.concatenate(c) for c in cols]

    def _boxes(self, route_ids, *cols):
        segs = self._dest_segments(route_ids)
        return [None if len(s) == 0 else tuple(c[s] for c in cols)
                for s in segs]

    # --- phase 1: local per-component argmin of cross edges -----------
    def find_cands(self):
        c = self.label[self.src_j] if len(self.src) \
            else np.empty(0, np.int64)
        cross = c != self.e_dst_lbl
        n_cross = int(cross.sum())
        if n_cross == 0:
            return (*([None] * self.n_live), 0)
        cc, w = c[cross], self.e_w[cross]
        a, b, co = self.e_a[cross], self.e_b[cross], self.e_dst_lbl[cross]
        o = np.lexsort((b, a, w, cc))
        cc, w, a, b, co = cc[o], w[o], a[o], b[o], co[o]
        first = np.r_[True, cc[1:] != cc[:-1]]
        boxes = self._boxes(cc[first], cc[first], w[first], a[first],
                            b[first], co[first])
        return (*boxes, n_cross)

    # --- phase 2: global argmin per owned component + claims ----------
    def pick_min(self, *inbox):
        cc, w, a, b, co = self._cat(inbox, 5)
        if len(cc):
            o = np.lexsort((b, a, w, cc))
            cc, w, a, b, co = cc[o], w[o], a[o], b[o], co[o]
            first = np.r_[True, cc[1:] != cc[:-1]]
            cc, w, a, b, co = (cc[first], w[first], a[first], b[first],
                               co[first])
        self.sel = (cc, w, a, b, co)
        # claim to owner(co): "component cc picked edge (a, b) to you"
        return self._boxes(co, co, cc, a, b)

    # --- phase 3: mutual-pair hooking + MSF edge recording ------------
    def resolve(self, *inbox):
        t, frm, ca, cb = self._cat(inbox, 4)
        # claims are unique per `frm` (one pick per component)
        fo = np.argsort(frm, kind="stable")
        frm_s, t_s, ca_s, cb_s = frm[fo], t[fo], ca[fo], cb[fo]
        cc, w, a, b, co = self.sel
        if len(cc):
            if len(frm_s):
                j = np.searchsorted(frm_s, co).clip(max=len(frm_s) - 1)
                mutual = ((frm_s[j] == co) & (t_s[j] == cc)
                          & (ca_s[j] == a) & (cb_s[j] == b))
            else:
                mutual = np.zeros(len(co), bool)
            self.parent_c = cc
            self.parent_p = np.where(mutual, np.minimum(cc, co), co)
            keep = ~mutual | (cc < co)
            self.mst_a.append(a[keep])
            self.mst_b.append(b[keep])
            self.mst_w.append(w[keep])
        else:
            self.parent_c = np.empty(0, np.int64)
            self.parent_p = np.empty(0, np.int64)
        # sort the parent map once for the jump/answer lookups
        po = np.argsort(self.parent_c, kind="stable")
        self.parent_c = self.parent_c[po]
        self.parent_p = self.parent_p[po]
        return len(self.parent_c)

    def _root_of(self, ids: np.ndarray) -> np.ndarray:
        """parent[ids] with inactive components as their own root."""
        if not len(self.parent_c):
            return ids
        j = np.searchsorted(self.parent_c, ids) \
            .clip(max=len(self.parent_c) - 1)
        hit = self.parent_c[j] == ids
        return np.where(hit, self.parent_p[j], ids)

    # --- phase 4 (iterated): pointer-jump compression ------------------
    def jump_ask(self):
        m = self.parent_p != self.parent_c
        return self._boxes(self.parent_p[m], self.parent_p[m],
                           self.parent_c[m])

    def jump_answer(self, *inbox):
        p, asker = self._cat(inbox, 2)
        return self._boxes(asker, asker, self._root_of(p))

    def jump_apply(self, *inbox):
        asker, newp = self._cat(inbox, 2)
        if not len(asker) or not len(self.parent_c):
            return 0
        j = np.searchsorted(self.parent_c, asker) \
            .clip(max=max(len(self.parent_c) - 1, 0))
        hit = self.parent_c[j] == asker if len(self.parent_c) \
            else np.zeros(len(asker), bool)
        changed = hit & (self.parent_p[j] != newp)
        self.parent_p[j[changed]] = newp[changed]
        return int(changed.sum())

    # --- phase 5: relabel nodes + refresh cached far-end labels --------
    def label_ask(self):
        ulab = np.unique(self.label)
        me = np.full(len(ulab), self.part, np.int64)
        return self._boxes(ulab, ulab, me)

    def label_answer(self, *inbox):
        c, pt = self._cat(inbox, 2)
        root = self._root_of(c)
        # route by EXPLICIT requesting part, not by id hash
        slot = np.searchsorted(self.live_arr, pt) \
            .clip(max=max(self.n_live - 1, 0))
        order = np.argsort(slot, kind="stable")
        bounds = np.searchsorted(slot[order],
                                 np.arange(self.n_live + 1))
        out = []
        for i in range(self.n_live):
            s = order[bounds[i]:bounds[i + 1]]
            out.append(None if len(s) == 0 else (c[s], root[s]))
        return out

    def apply_labels(self, *inbox):
        c, root = self._cat(inbox, 2)
        o = np.argsort(c, kind="stable")
        c, root = c[o], root[o]
        if len(self.label) and len(c):
            j = np.searchsorted(c, self.label).clip(max=len(c) - 1)
            hit = c[j] == self.label
            new = np.where(hit, root[j], self.label)
        else:
            new = self.label
        changed = new != self.label
        self.label = new
        if not changed.any() or not len(self.src):
            return [None] * self.n_live
        hit = changed[self.src_j]
        # mirror edges (x -> y) live at hash(x): route the new label of
        # local node y to every neighbour's owner
        return self._boxes(self.dst[hit], self.src[hit],
                           new[self.src_j[hit]])

    def apply_dst_labels(self, *inbox):
        y, lab = self._cat(inbox, 2)
        if not len(y) or not len(self.dst):
            return 0
        o = np.argsort(y, kind="stable")
        y, lab = y[o], lab[o]
        first = np.r_[True, y[1:] != y[:-1]]
        y, lab = y[first], lab[first]
        j = np.searchsorted(y, self.dst).clip(max=len(y) - 1)
        hit = y[j] == self.dst
        self.e_dst_lbl[hit] = lab[j[hit]]
        return int(hit.sum())

    def result_labels(self) -> pa.Table:
        return pa.table({"way_id": pa.array(self.uid),
                         "root": pa.array(self.label)})

    def result_edges(self) -> pa.Table:
        a = np.concatenate(self.mst_a) if self.mst_a \
            else np.empty(0, np.int64)
        b = np.concatenate(self.mst_b) if self.mst_b \
            else np.empty(0, np.int64)
        w = np.concatenate(self.mst_w) if self.mst_w \
            else np.empty(0, np.int64)
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "w": pa.array(w)})


def run_mst(shard_dir: str, live_parts: set[int], num_parts: int,
            max_rounds: int = 60, cleanup: bool = False
            ) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Drive the Boruvka actors until a round finds ZERO cross edges
    (the MSF is then complete — every remaining edge is intra-component).
    Components at least halve per round, so ``max_rounds`` = 60 covers
    any int64-addressable graph; raises rather than returning a partial
    forest. Returns (labels, msf_edges) as materialized Datasets."""
    empty_l = pa.table({"way_id": pa.array([], pa.int64()),
                        "root": pa.array([], pa.int64())})
    empty_e = pa.table({"a": pa.array([], pa.int64()),
                        "b": pa.array([], pa.int64()),
                        "w": pa.array([], pa.int64())})
    live = sorted(live_parts)
    if not live:
        return (ray.data.from_arrow(empty_l), ray.data.from_arrow(empty_e))
    actors = [
        _MSTPart.options(scheduling_strategy="SPREAD")
        .remote(shard_dir, p, num_parts, live) for p in live]
    ray.get([a.ready.remote() for a in actors])
    if cleanup:                         # graph now lives in actor memory
        shutil.rmtree(shard_dir, ignore_errors=True)
    n = len(actors)

    def route(outs):
        return [[outs[si][di] for si in range(n)] for di in range(n)]

    for _ in range(max_rounds):
        outs = [a.find_cands.options(num_returns=n + 1).remote()
                for a in actors]
        if sum(ray.get([o[n] for o in outs])) == 0:
            break
        inbox = route(outs)
        outs = [a.pick_min.options(num_returns=n).remote(*inbox[i])
                for i, a in enumerate(actors)]
        inbox = route(outs)
        ray.get([a.resolve.remote(*inbox[i])
                 for i, a in enumerate(actors)])
        for _j in range(64):
            outs = [a.jump_ask.options(num_returns=n).remote()
                    for a in actors]
            inbox = route(outs)
            outs = [a.jump_answer.options(num_returns=n).remote(*inbox[i])
                    for i, a in enumerate(actors)]
            inbox = route(outs)
            if sum(ray.get([a.jump_apply.remote(*inbox[i])
                            for i, a in enumerate(actors)])) == 0:
                break
        else:
            raise RuntimeError("run_mst: pointer jumping did not "
                               "converge in 64 iterations")
        outs = [a.label_ask.options(num_returns=n).remote()
                for a in actors]
        inbox = route(outs)
        outs = [a.label_answer.options(num_returns=n).remote(*inbox[i])
                for i, a in enumerate(actors)]
        inbox = route(outs)
        outs = [a.apply_labels.options(num_returns=n).remote(*inbox[i])
                for i, a in enumerate(actors)]
        inbox = route(outs)
        ray.get([a.apply_dst_labels.remote(*inbox[i])
                 for i, a in enumerate(actors)])
    else:
        raise RuntimeError(
            f"run_mst: no fixpoint in {max_rounds} rounds — components "
            "must at least halve per round, so this is a protocol bug")
    labels = ray.data.from_arrow_refs(
        [a.result_labels.remote() for a in actors]).materialize()
    edges = ray.data.from_arrow_refs(
        [a.result_edges.remote() for a in actors]).materialize()
    return labels, edges
