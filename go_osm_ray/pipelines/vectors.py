"""Distributed vector analytics over an embedding column.

Covariance is the canonical mergeable linear-algebra combiner: every
block collapses to the fixed-size moment state (n, sum, X^T X) — d=64
means 32 KiB per block regardless of rows — one bounded merge
assembles the exact d x d sample covariance, and PCA is an eigh of
that tiny matrix on the driver followed by an embarrassingly parallel
broadcast projection.  This is how whitening / dim-reduction runs at
100 TB: the data never moves, only 2nd-moment partials do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..relational import single_merge
from ..util import round_half_away


def _stack(t: pa.Table, col: str) -> np.ndarray:
    return np.stack(t[col].combine_chunks().to_numpy(zero_copy_only=False)) \
        .astype(np.float64)


def _moment_partials(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    def partial(t: pa.Table) -> pa.Table:
        if not len(t):
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.binary()),
                             "ss": pa.array([], pa.binary())})
        x = _stack(t, col)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "s": pa.array([x.sum(0).tobytes()], pa.binary()),
            "ss": pa.array([(x.T @ x).tobytes()], pa.binary()),
        })
    return ds.map_batches(partial, batch_format="pyarrow")


def _merge_moments(t: pa.Table) -> tuple[int, np.ndarray, np.ndarray]:
    n = int(np.sum(t["n"].to_numpy(zero_copy_only=False)))
    s = sum(np.frombuffer(b, np.float64) for b in t["s"].to_pylist())
    d = len(s)
    ss = sum(np.frombuffer(b, np.float64).reshape(d, d)
             for b in t["ss"].to_pylist())
    return n, s, ss


def embedding_covariance(ds: ray.data.Dataset,
                         col: str = "embedding") -> ray.data.Dataset:
    """(i, j, cov6): exact d x d sample covariance of the embedding
    column, via the moment combiner.  Mirrored by DuckDB
    ``covar_samp`` over positionally-unnested components."""
    def finish(t: pa.Table) -> pa.Table:
        n, s, ss = _merge_moments(t)
        mean = s / n
        cov = (ss - n * np.outer(mean, mean)) / (n - 1)
        d = len(mean)
        i, j = np.divmod(np.arange(d * d, dtype=np.int64), d)
        return pa.table({
            "i": pa.array(i), "j": pa.array(j),
            "cov6": pa.array(round_half_away(cov.ravel(), 6), pa.float64()),
        })
    return single_merge(_moment_partials(ds, col), finish)


def pca_components(ds: ray.data.Dataset, col: str = "embedding",
                   top_m: int = 8) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean, eigenvalues desc, components (m, d)) from the merged
    moment state — one driver-side eigh of the d x d covariance.
    Deterministic sign convention: each component's largest-|.|
    coordinate is made positive."""
    t = pa.concat_tables([b.replace_schema_metadata(None) for b in
                          ray.get(_moment_partials(ds, col).to_arrow_refs())
                          if b.num_rows])
    n, s, ss = _merge_moments(t)
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / (n - 1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:top_m]
    comps = v[:, order].T
    flip = np.sign(comps[np.arange(len(comps)),
                         np.argmax(np.abs(comps), axis=1)])
    return mean, w[order], comps * flip[:, None]


def kmeans_assign(ds: ray.data.Dataset, n_clusters: int = 8,
                  col: str = "embedding",
                  id_col: str = "vec_id") -> ray.data.Dataset:
    """(vec_id, cluster): nearest-centroid label under the deterministic
    hash-sample Lloyd quantizer (spatial.ivf_centroids — seed-free,
    block-order independent).  Centroids broadcast once via ray.put;
    assignment is one matmul + argmax per batch, so the clustering pass
    moves no data.  This is the corpus-bucketing step (topic sharding,
    per-cluster sampling quotas) of an embedding-curated pipeline."""
    from .spatial import ivf_centroids
    sub = ds.select_columns([id_col, col])
    if (id_col, col) != ("vec_id", "embedding"):
        # ivf_centroids reads fixed column names
        sub = sub.rename_columns({id_col: "vec_id", col: "embedding"})
    cent_ref = ray.put(ivf_centroids(sub, n_clusters))

    def assign(t: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        x = _stack(t, col)
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        return pa.table({
            id_col: t[id_col].combine_chunks(),
            "cluster": pa.array(np.argmax(x @ cent.T, axis=1)
                                .astype(np.int64)),
        })
    return ds.map_batches(assign, batch_format="pyarrow")


def pca_project(ds: ray.data.Dataset, mean: np.ndarray,
                components: np.ndarray, col: str = "embedding",
                id_col: str = "vec_id") -> ray.data.Dataset:
    """(vec_id, proj): project each embedding onto the given components
    — components broadcast ONCE via ray.put, one matmul per batch."""
    state_ref = ray.put((mean, components))

    def proj(t: pa.Table) -> pa.Table:
        m, c = ray.get(state_ref)
        x = _stack(t, col) - m
        p = x @ c.T
        return pa.table({
            id_col: t[id_col].combine_chunks(),
            "proj": pa.array(list(p), pa.list_(pa.float64())),
        })
    return ds.map_batches(proj, batch_format="pyarrow")

def clip_filter(ds: ray.data.Dataset, threshold: float = 0.25,
                nd: int = 6, col: str = "embedding",
                id_col: str = "vec_id") -> ray.data.Dataset:
    """LAION-style image-text cosine filter: each row carries BOTH tower
    embeddings of one sample (first half of ``col`` = image tower, second
    half = text tower — at production scale the two encoders write into
    the same row upstream, so the filter needs NO join).  Keep rows whose
    half-vs-half cosine, rounded half-away to ``nd`` digits (the repo's
    shared float-parity contract, util.round_half_away / sql_round),
    reaches ``threshold``.

    Scale: pure row-local ``map_batches`` — one (n, d/2) x 2 slice + three
    row-wise reductions per batch, no exchange, no broadcast, streaming
    end to end.  This is the curation step the reference lacks entirely
    (go-osm has no embedding ops); it belongs to the brief's
    training-data family."""
    def fn(t: pa.Table) -> pa.Table:
        if not len(t):
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cos6": pa.array([], pa.float64())})
        m = _stack(t, col)
        h = m.shape[1] // 2
        a, b = m[:, :h], m[:, h:]
        # plain num/den (no zero-norm guard) — mirrors DuckDB
        # list_cosine_similarity on DOUBLE[] exactly (measured parity
        # 2e-16 on the sf0.01 table; rounding grid is 5e-7)
        cos = (a * b).sum(1) / (np.sqrt((a * a).sum(1))
                                * np.sqrt((b * b).sum(1)))
        c6 = round_half_away(cos, nd)
        keep = c6 >= threshold
        return pa.table({
            id_col: t[id_col].combine_chunks().filter(pa.array(keep)),
            "cos6": pa.array(c6[keep], pa.float64()),
        })
    return ds.map_batches(fn, batch_format="pyarrow")


def semdedup(ds: ray.data.Dataset, n_clusters: int = 8,
             threshold: float = 0.95, nd: int = 6,
             col: str = "embedding", id_col: str = "vec_id",
             chunk: int = 1024) -> ray.data.Dataset:
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-bucket the embedding space with the
    deterministic quantizer (spatial.ivf_centroids — seed-free), then
    WITHIN each cluster drop every row whose cosine to ANY
    lower-vec_id cluster member reaches ``threshold``.  Emits one row
    per input: (vec_id, cluster, maxcos6, kept) where maxcos6 is the
    max cosine to earlier members rounded half-away to ``nd`` digits
    (-2.0 sentinel for each cluster's first member) and the keep
    decision compares the ROUNDED value (the repo's float-parity
    contract).

    Scale plan: centroids broadcast once (ray.put); assignment is one
    matmul per batch; the only exchange is the groupby(cluster) that
    co-locates each cluster.  The O(c^2) in-cluster similarity runs as
    ``chunk``-row gemm slabs against the earlier-member prefix, so
    peak memory is chunk x cluster_size, never c^2.  At 100 TB
    n_clusters scales with the corpus (the paper uses ~1e5 clusters)
    so cluster size — the partitioning assumption this op relies on —
    stays worker-bounded; hot clusters are the caller's signal to
    raise n_clusters, exactly as the paper tunes k.

    The reference has no embedding ops at all (go-osm is pure
    OSM-XML); this belongs to the brief's training-data dedup family
    next to minhash/simhash/embedding_neardup.
    """
    from .spatial import ivf_centroids
    sub = ds.select_columns([id_col, col])
    if (id_col, col) != ("vec_id", "embedding"):
        sub = sub.rename_columns({id_col: "vec_id", col: "embedding"})
    cent_ref = ray.put(ivf_centroids(sub, n_clusters))

    def assign(t: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        if not len(t):
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             col: t[col]})
        x = _stack(t, col)
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        return pa.table({
            id_col: t[id_col].combine_chunks(),
            "cluster": pa.array(np.argmax(x @ cent.T, axis=1)
                                .astype(np.int64)),
            col: t[col].combine_chunks(),
        })

    def purge(g: pa.Table) -> pa.Table:
        vid = g[id_col].combine_chunks().to_numpy()
        order = np.argsort(vid)          # ids unique -> total order
        vid = vid[order]
        x = _stack(g, col)[order]
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        n = len(vid)
        maxcos = np.full(n, -2.0)
        for i0 in range(1, n, chunk):
            i1 = min(i0 + chunk, n)
            sims = x[i0:i1] @ x[:i1].T   # (slab, prefix)
            mask = np.arange(i1)[None, :] < np.arange(i0, i1)[:, None]
            maxcos[i0:i1] = np.where(mask, sims, -np.inf).max(axis=1)
        c6 = round_half_away(maxcos, nd)
        return pa.table({
            id_col: pa.array(vid, pa.int64()),
            "cluster": pa.array(
                np.full(n, g["cluster"][0].as_py(), np.int64)),
            "maxcos6": pa.array(c6, pa.float64()),
            "kept": pa.array(c6 < threshold),
        })

    return ds.map_batches(assign, batch_format="pyarrow") \
        .groupby("cluster").map_groups(purge, batch_format="pyarrow")


def kcenter_sample(ds: ray.data.Dataset, k: int = 16,
                   col: str = "embedding", id_col: str = "vec_id",
                   nd: int = 6) -> pa.Table:
    """Greedy k-center coreset (Gonzalez 1985 farthest-point traversal)
    in cosine distance — the diversity-maximizing sample a curation
    pipeline draws before expensive labeling/inspection.  Deterministic:
    round 0 picks the smallest vec_id (all distances are the 2.0
    sentinel when no center exists); every later round picks the row
    maximizing distance-to-chosen-set, ties to the smaller id.  Returns
    a small driver-side table (rank, vec_id, dist6) — k rows.

    Scale plan: the narrow (id, vector) projection materializes ONCE
    into the object store; each of the k rounds is one map_batches over
    those cached blocks computing a matmul against the <=k chosen
    centers (broadcast per round as a k x d array) and collapsing to
    ONE candidate row per block — (id, dist, 8d vector bytes), so only
    block-count rows reach the driver and the vector of the winner
    arrives with it (no second lookup pass).  k passes, zero shuffles.

    The reference has no sampling ops; this joins the training-data
    sampler family (det/stratified/priority/mixture) as the
    diversity-coreset member."""
    import ray

    from ..util import round_half_away

    emb = ds.select_columns([id_col, col]).materialize()
    chosen_ids: list[int] = []
    chosen_vecs: list[np.ndarray] = []
    dists: list[float] = []

    for _ in range(k):
        state = ray.put((np.array(chosen_ids, np.int64),
                         np.array(chosen_vecs, np.float64)
                         if chosen_vecs else np.zeros((0, 0))))

        def cand(t: pa.Table) -> pa.Table:
            empty = pa.table({id_col: pa.array([], pa.int64()),
                              "d": pa.array([], pa.float64()),
                              "v": pa.array([], pa.binary())})
            ids = t[id_col].combine_chunks().to_numpy()
            if not len(ids):
                return empty
            x = _stack(t, col)
            x = x / np.linalg.norm(x, axis=1, keepdims=True)
            cids, c = ray.get(state)
            d = (1.0 - (x @ c.T).max(axis=1)) if c.size                 else np.full(len(ids), 2.0)
            d[np.isin(ids, cids)] = -np.inf
            if not np.isfinite(d).any():
                return empty
            j = np.lexsort((ids, -d))[0]
            return pa.table({id_col: pa.array([int(ids[j])], pa.int64()),
                             "d": pa.array([float(d[j])], pa.float64()),
                             "v": pa.array([x[j].tobytes()], pa.binary())})

        parts = [b.replace_schema_metadata(None) for b in
                 ray.get(emb.map_batches(cand, batch_format="pyarrow")
                         .to_arrow_refs()) if b.num_rows]
        if not parts:
            break
        cat = pa.concat_tables(parts)
        ids = cat[id_col].to_numpy()
        d = cat["d"].to_numpy()
        j = np.lexsort((ids, -d))[0]
        chosen_ids.append(int(ids[j]))
        chosen_vecs.append(np.frombuffer(cat["v"][j].as_py(), np.float64))
        dists.append(float(d[j]))

    return pa.table({
        "rank": pa.array(np.arange(len(chosen_ids)), pa.int64()),
        id_col: pa.array(chosen_ids, pa.int64()),
        "dist6": pa.array(round_half_away(np.array(dists), nd),
                          pa.float64()),
    })


def embed_outliers(ds: ray.data.Dataset, n_clusters: int = 8,
                   m: int = 50, col: str = "embedding",
                   id_col: str = "vec_id", nd: int = 6) -> ray.data.Dataset:
    """(rank, vec_id, cluster, dist): the ``m`` corpus embeddings
    FARTHEST (cosine distance) from their assigned k-means centroid —
    the standard embedding-space outlier pruning pass (mislabeled /
    off-distribution rows live in the cluster tails).

    Scale shape: the deterministic quantizer (spatial.ivf_centroids)
    builds from a bounded hash-priority sample, broadcasts once, and
    scoring is one matmul + argmax per batch; top-m is per-block
    partials + one bounded merge — never a global sort. Complements
    semdedup (which prunes the over-dense CORE of each cluster)."""
    from .spatial import ivf_centroids

    sub = ds.select_columns([id_col, col])
    if (id_col, col) != ("vec_id", "embedding"):
        sub = sub.rename_columns({id_col: "vec_id", col: "embedding"})
    cent_ref = ray.put(ivf_centroids(sub, n_clusters))

    def score(t: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        x = _stack(t, col)
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        sims = x @ cent.T
        c = np.argmax(sims, axis=1)
        d = 1.0 - sims[np.arange(len(c)), c]
        vid = t[id_col].combine_chunks().to_numpy()
        top = np.lexsort((vid, -d))[:m]
        return pa.table({
            "vec_id": pa.array(vid[top]),
            "cluster": pa.array(c[top].astype(np.int64)),
            "dist": pa.array(d[top]),
        })

    def merge(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].combine_chunks().to_numpy()
        d = t["dist"].combine_chunks().to_numpy()
        top = np.lexsort((vid, -d))[:m]
        return pa.table({
            "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
            "vec_id": pa.array(vid[top]),
            "cluster": t["cluster"].combine_chunks().take(pa.array(top)),
            "dist": pa.array(np.asarray(round_half_away(d[top], nd))),
        })

    return single_merge(ds.map_batches(score, batch_format="pyarrow",
                                       batch_size=4096), merge)


def embed_pca(ds: ray.data.Dataset, top_m: int = 2,
              nd: int = 4, col: str = "embedding",
              id_col: str = "vec_id") -> ray.data.Dataset:
    """(vec_id, pc1, pc2, ...): project every embedding onto the top-m
    principal components of the corpus — the 2-D map / whitening step
    of an embedding-curation pipeline.  One moment-combiner pass gives
    the exact d x d covariance (32 KiB partial per block), the d x d
    eigh runs ONCE on the driver (d is the embedding dim, never the
    data), components broadcast via ray.put, and the projection is one
    matmul per batch — no shuffle anywhere.  Sign-deterministic
    (largest-|coordinate| positive per component, pca_components), so
    the output is partition-order independent; values rounded to
    ``nd`` dp (the distributed moment merge agrees with a single-pass
    oracle to ~1e-9, far inside the rounding step)."""
    mean, _w, comps = pca_components(ds, col=col, top_m=top_m)
    proj = pca_project(ds, mean, comps, col=col, id_col=id_col)

    def shape(t: pa.Table) -> pa.Table:
        p = np.asarray([np.asarray(r, np.float64) for r in
                        t["proj"].to_pylist()], np.float64) \
            if t.num_rows else np.zeros((0, top_m))
        cols = {id_col: t[id_col].combine_chunks()}
        for m in range(top_m):
            cols[f"pc{m + 1}"] = pa.array(
                round_half_away(p[:, m], nd), pa.float64())
        return pa.table(cols)

    return proj.map_batches(shape, batch_format="pyarrow")


def mmr_select(embeddings: ray.data.Dataset, queries_ref: "ray.ObjectRef",
               k: int = 10, n_cand: int = 64, lam: float = 0.7,
               nd: int = 6, batch_size: int = 4096) -> ray.data.Dataset:
    """(query_id, rank, vec_id, mmr6): Maximal Marginal Relevance
    diversified top-k per broadcast query — rank 1 is the most
    RELEVANT candidate; each later pick maximizes
    lam * cos(q, c) - (1 - lam) * max_{s in picked} cos(c, s),
    ties by vec_id ASC.  The standard diversity-aware retrieval /
    training-subset selection primitive (dedup-aware nearest docs).

    Scale plan: stage 1 is the mergeable partial top-``n_cand`` cosine
    pattern (TopKCosine's shape) with the candidate's NORMALIZED
    embedding carried in the partial row, so stage 2 — one tiny
    groupby over n_cand x num_blocks rows per query — can run the
    greedy MMR entirely locally: the candidate-candidate similarity
    matrix is n_cand^2 at most, never corpus-sized.  Exactness: the
    global top-n_cand candidate set equals the merged per-block
    top-n_cand sets, and MMR never looks beyond that set by
    definition of the relevance cutoff it implements."""
    state: dict = {}

    def partial(t: pa.Table) -> pa.Table:
        if "qm" not in state:
            q: pa.Table = ray.get(queries_ref)
            state["qid"] = q["vec_id"].to_numpy()
            qm = np.stack(q["embedding"].to_numpy(zero_copy_only=False)) \
                .astype(np.float64)
            state["qm"] = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        qid, qm = state["qid"], state["qm"]
        emb = _stack(t, "embedding")
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        vids = t["vec_id"].combine_chunks().to_numpy()
        sims = emb @ qm.T
        kk = min(n_cand, sims.shape[0])
        out = []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            top = np.lexsort((vids, -col))[:kk]
            out.append(pa.table({
                "query_id": pa.array(np.full(kk, qid[qi], np.int64)),
                "vec_id": pa.array(vids[top].astype(np.int64)),
                "sim": pa.array(col[top], pa.float64()),
                "nemb": pa.array(list(emb[top]),
                                 pa.list_(pa.float64()))}))
        return pa.concat_tables(out) if out else pa.table(
            {"query_id": pa.array([], pa.int64()),
             "vec_id": pa.array([], pa.int64()),
             "sim": pa.array([], pa.float64()),
             "nemb": pa.array([], pa.list_(pa.float64()))})

    def mmr(t: pa.Table) -> pa.Table:
        vids = t["vec_id"].combine_chunks().to_numpy()
        sim = t["sim"].combine_chunks().to_numpy()
        order = np.lexsort((vids, -sim))[:n_cand]
        vids, sim = vids[order], sim[order]
        lst = t["nemb"].combine_chunks()
        d = len(lst[0]) if len(lst) else 0
        em = lst.flatten().to_numpy().reshape(-1, d)[order]
        qid = int(t["query_id"][0].as_py())
        cc = em @ em.T  # candidate-candidate cosine
        n = len(vids)
        picked = np.zeros(n, bool)
        maxdiv = np.full(n, -np.inf)
        ranks, ids, scores = [], [], []
        for step in range(min(k, n)):
            if step == 0:
                mscore = lam * sim  # no diversity term yet
            else:
                mscore = lam * sim - (1.0 - lam) * maxdiv
            mscore = np.where(picked, -np.inf, mscore)
            # ties by vec_id ASC
            best = np.lexsort((vids, -mscore))[0]
            picked[best] = True
            ranks.append(step + 1)
            ids.append(int(vids[best]))
            scores.append(float(mscore[best]))
            maxdiv = np.maximum(maxdiv, cc[:, best])
        return pa.table({
            "query_id": pa.array([qid] * len(ranks), pa.int64()),
            "rank": pa.array(ranks, pa.int64()),
            "vec_id": pa.array(ids, pa.int64()),
            "mmr6": pa.array(round_half_away(np.array(scores), nd),
                             pa.float64())})

    return (embeddings.map_batches(partial, batch_format="pyarrow",
                                   batch_size=batch_size)
            .groupby("query_id")
            .map_groups(mmr, batch_format="pyarrow"))


def embed_hard_negatives(embeddings: ray.data.Dataset,
                         queries_ref: "ray.ObjectRef", nd: int = 6,
                         batch_size: int = 4096) -> ray.data.Dataset:
    """(query_id, pos_id, neg_id, pos6, neg6, margin6): triplet mining
    — for every broadcast labeled query, the most-similar SAME-label
    candidate (positive) and the most-similar DIFFERENT-label
    candidate (hard negative), with the cosine margin between them.
    The contrastive-training batch-construction primitive.

    Scale plan: per-batch partials emit at most TWO rows per query
    (local best positive / best negative — an argmax is mergeable),
    one tiny groupby per query finishes; ties break by vec_id ASC.
    Identical normalization/matmul conventions as ann_topk so the
    single-matrix pyoracle is bit-comparable."""
    state: dict = {}

    def partial(t: pa.Table) -> pa.Table:
        if "qm" not in state:
            q: pa.Table = ray.get(queries_ref)
            state["qid"] = q["vec_id"].to_numpy()
            state["qlab"] = q["label"].to_numpy()
            qm = np.stack(q["embedding"].to_numpy(zero_copy_only=False)) \
                .astype(np.float64)
            state["qm"] = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        qid, qlab, qm = state["qid"], state["qlab"], state["qm"]
        emb = _stack(t, "embedding")
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        vids = t["vec_id"].combine_chunks().to_numpy()
        labs = t["label"].combine_chunks().to_numpy()
        sims = emb @ qm.T
        out_q, out_p, out_v, out_s = [], [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            for is_pos in (True, False):
                m = labs == qlab[qi] if is_pos else labs != qlab[qi]
                if not m.any():
                    continue
                sub = np.flatnonzero(m)
                best = sub[np.lexsort((vids[sub], -col[sub]))[0]]
                out_q.append(int(qid[qi]))
                out_p.append(is_pos)
                out_v.append(int(vids[best]))
                out_s.append(float(col[best]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "is_pos": pa.array(out_p, pa.bool_()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    def finish(t: pa.Table) -> pa.Table:
        qid = int(t["query_id"][0].as_py())
        isp = t["is_pos"].combine_chunks().to_numpy(zero_copy_only=False)
        vid = t["vec_id"].combine_chunks().to_numpy()
        sim = t["sim"].combine_chunks().to_numpy()
        row = {}
        for flag in (True, False):
            m = isp == flag
            if not m.any():
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "pos_id": pa.array([], pa.int64()),
                                 "neg_id": pa.array([], pa.int64()),
                                 "pos6": pa.array([], pa.float64()),
                                 "neg6": pa.array([], pa.float64()),
                                 "margin6": pa.array([], pa.float64())})
            sub = np.flatnonzero(m)
            best = sub[np.lexsort((vid[sub], -sim[sub]))[0]]
            row[flag] = (int(vid[best]), float(sim[best]))
        return pa.table({
            "query_id": pa.array([qid], pa.int64()),
            "pos_id": pa.array([row[True][0]], pa.int64()),
            "neg_id": pa.array([row[False][0]], pa.int64()),
            "pos6": pa.array([float(round_half_away(
                np.float64(row[True][1]), nd))], pa.float64()),
            "neg6": pa.array([float(round_half_away(
                np.float64(row[False][1]), nd))], pa.float64()),
            "margin6": pa.array([float(round_half_away(
                np.float64(row[True][1] - row[False][1]), nd))],
                pa.float64())})

    return (embeddings.map_batches(partial, batch_format="pyarrow",
                                   batch_size=batch_size)
            .groupby("query_id")
            .map_groups(finish, batch_format="pyarrow"))


def cluster_cohesion(ds: ray.data.Dataset, n_clusters: int = 8,
                     col: str = "embedding",
                     id_col: str = "vec_id") -> ray.data.Dataset:
    """(cluster, n, mean_cos6, min_cos6): per-kmeans-cluster cohesion —
    the cosine of every member to its (normalized) assigned centroid,
    reduced to mean and min per cluster.  The cluster-quality audit a
    curation pipeline reads before trusting per-cluster sampling quotas
    (a low-cohesion cluster is a junk drawer, not a topic).

    Determinism: each member cosine lands on the exact 1e-9 integer
    grid (round-half-away) BEFORE summation, so the per-cluster mean is
    a ratio of exact int64s — block order cannot drift it; min is
    order-free on the 6 dp grid.  ONE bounded combiner exchange."""
    from ..relational import partial_groupby_agg
    from .spatial import ivf_centroids

    sub = ds.select_columns([id_col, col])
    if (id_col, col) != ("vec_id", "embedding"):
        sub = sub.rename_columns({id_col: "vec_id", col: "embedding"})
    cent = ivf_centroids(sub, n_clusters)
    cent_n = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    cent_ref = ray.put((cent, cent_n))

    def partial(t: pa.Table) -> pa.Table:
        c, cn = ray.get(cent_ref)
        x = _stack(t, col)
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        cl = np.argmax(x @ c.T, axis=1)
        cos = np.einsum("ij,ij->i", x, cn[cl])
        q = round_half_away(cos * 1e9, 0).astype(np.int64)
        c6 = round_half_away(cos, 6)
        g = pa.table({"cluster": pa.array(cl.astype(np.int64)),
                      "one": pa.array(np.ones(len(cl), np.int64)),
                      "q": pa.array(q), "c6": pa.array(c6)}) \
            .group_by("cluster").aggregate(
                [("one", "sum"), ("q", "sum"), ("c6", "min")])
        return g.rename_columns(["cluster", "one", "q", "c6"])

    g = partial_groupby_agg(
        ds.map_batches(partial, batch_format="pyarrow",
                       batch_size=8192),
        ["cluster"], [("one", "sum"), ("q", "sum"), ("c6", "min")],
        num_parts=8)

    def finish(t: pa.Table) -> pa.Table:
        n = t["one_sum"].combine_chunks().to_numpy()
        q = t["q_sum"].combine_chunks().to_numpy()
        return pa.table({
            "cluster": t["cluster"],
            "n": pa.array(n.astype(np.int64)),
            "mean_cos6": pa.array(round_half_away(
                q / (n * 1e9), 6), pa.float64()),
            "min_cos6": pc.cast(t["c6_min"], pa.float64())})

    return g.map_batches(finish, batch_format="pyarrow")


def embed_angular_hist(ds: ray.data.Dataset, id_cap: int = 256,
                       bins: int = 20, grid: float = 512.0,
                       num_parts: int = 8) -> ray.data.Dataset:
    """(bucket, n_pairs): the corpus ISOTROPY probe — histogram of
    pairwise cosine similarities over the deterministic vec_id < cap
    sample (the phash_pairs cap rationale: the oracle is O(n^2) brute
    force, and at web scale the probe runs on an id-prefix sample, not
    the full table). A cosine mass piled near 1.0 flags anisotropic /
    collapsed embedding spaces before they poison ANN recall.

    Determinism contract (the cluster_cohesion integer-grid precedent):
    components land on the exact ``grid`` integer lattice (round-half-
    away) FIRST, so dots and norms are exact int64 and the only float
    ops are one sqrt + one division + one floor, identical both sides.

    Scale plan: the read prunes to vec_id < cap (columns + filter);
    per-block quantized partials collapse to at most ``cap`` rows, and
    ONE tiny merge task runs the exact int64 gram matmul (cap^2 at 256
    = 65 K cells) — nothing rowwise ever reaches the driver."""
    def partial(t: pa.Table) -> pa.Table:
        keep = pc.less(t["vec_id"], pa.scalar(id_cap))
        t = t.filter(keep)
        if not len(t):
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "q": pa.array([], pa.list_(pa.int64()))})
        x = _stack(t, "embedding")
        q = round_half_away(x * grid, 0).astype(np.int64)
        return pa.table({
            "vec_id": pc.cast(t["vec_id"].combine_chunks(), pa.int64()),
            "q": pa.array(list(q), pa.list_(pa.int64()))})

    def merge(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].combine_chunks().to_numpy()
        order = np.argsort(vid)
        q = np.stack(t["q"].combine_chunks()
                     .to_numpy(zero_copy_only=False))[order].astype(np.int64)
        gram = q @ q.T                      # exact int64
        nn = np.diag(gram).astype(np.float64)
        iu = np.triu_indices(len(vid), k=1)
        dot = gram[iu].astype(np.float64)
        cos = dot / np.sqrt(nn[iu[0]] * nn[iu[1]])
        b = np.clip(np.floor((cos + 1.0) * (bins / 2.0)), 0,
                    bins - 1).astype(np.int64)
        u, n = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(u, pa.int64()),
                         "n_pairs": pa.array(n.astype(np.int64))})

    return single_merge(
        ds.select_columns(["vec_id", "embedding"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192),
        merge)


def knn_mutuality(ds: ray.data.Dataset, id_cap: int = 256,
                  grid: float = 512.0) -> ray.data.Dataset:
    """(vec_id, nn_id, mutual): 1-NN RECIPROCITY over the deterministic
    vec_id < cap sample — whether each vector's cosine nearest
    neighbour points back (the kNN-graph symmetry diagnostic: hubness
    in high dimensions shows up as low mutuality, and ANN recall
    targets are easier to hit on mutual graphs). embed_angular_hist's
    integer-lattice determinism contract; ties break to the smaller
    candidate id on both sides.

    Scale plan: read pruned to the cap; per-block quantized partials;
    ONE tiny merge runs the exact int64 gram and the argmax — a
    corpus-health probe, not a full-table kNN (that is ann_* /
    knn_classify's job)."""
    def partial(t: pa.Table) -> pa.Table:
        keep = pc.less(t["vec_id"], pa.scalar(id_cap))
        t = t.filter(keep)
        if not len(t):
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "q": pa.array([], pa.list_(pa.int64()))})
        x = _stack(t, "embedding")
        q = round_half_away(x * grid, 0).astype(np.int64)
        return pa.table({
            "vec_id": pc.cast(t["vec_id"].combine_chunks(), pa.int64()),
            "q": pa.array(list(q), pa.list_(pa.int64()))})

    def merge(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].combine_chunks().to_numpy()
        order = np.argsort(vid)
        vid = vid[order]
        q = np.stack(t["q"].combine_chunks()
                     .to_numpy(zero_copy_only=False))[order].astype(np.int64)
        gram = q @ q.T
        nn_ = np.diag(gram).astype(np.float64)
        with np.errstate(invalid="ignore"):
            cos = gram.astype(np.float64) / np.sqrt(np.outer(nn_, nn_))
        np.fill_diagonal(cos, -np.inf)
        nn_idx = np.argmax(cos, axis=1)   # first max = smallest id (sorted)
        nn_id = vid[nn_idx]
        mutual = nn_id[nn_idx] == vid     # nn(nn(i)) == i
        return pa.table({"vec_id": pa.array(vid, pa.int64()),
                         "nn_id": pa.array(nn_id, pa.int64()),
                         "mutual": pa.array(mutual, pa.bool_())})

    return single_merge(
        ds.select_columns(["vec_id", "embedding"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192),
        merge)


def label_cohesion(ds: ray.data.Dataset, grid: float = 512.0,
                   num_parts: int = 8) -> ray.data.Dataset:
    """(label, n, mean_cos6, min_cos6): per-LABEL embedding cohesion —
    each member's cosine to its label's (unnormalized) centroid sum,
    reduced to mean and min. cluster_cohesion grades discovered kmeans
    clusters (pyoracle-gated); this grades the GIVEN supervised labels
    with a direct SQL oracle, via the n-cancellation trick:
    cos(x, S/n) == cos(x, S), so the centroid never needs a float
    division.

    Determinism: components land on the integer ``grid`` lattice, so
    per-label component sums S and all dots/norms are exact int64;
    each member cosine lands on the exact 1e-9 grid before the integer
    mean (cluster_cohesion's contract).

    Scale plan: per-block integer component-sum partials (d x labels
    rows) -> tiny merge builds S per label -> broadcast -> one
    embarrassingly parallel cosine pass with a bounded combiner."""
    from ..relational import broadcast_table, partial_groupby_agg

    def sum_partial(t: pa.Table) -> pa.Table:
        if not len(t):
            return pa.table({"label": pa.array([], pa.int64()),
                             "s": pa.array([], pa.list_(pa.int64()))})
        x = _stack(t, "embedding")
        q = round_half_away(x * grid, 0).astype(np.int64)
        lab = t["label"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        out_l, out_s = [], []
        for lb in sorted(set(lab.tolist())):
            out_l.append(lb)
            out_s.append(q[lab == lb].sum(axis=0))
        return pa.table({"label": pa.array(out_l, pa.int64()),
                         "s": pa.array([v.tolist() for v in out_s],
                                       pa.list_(pa.int64()))})

    def sum_merge(t: pa.Table) -> pa.Table:
        lab = t["label"].combine_chunks().to_numpy()
        vs = np.stack(t["s"].combine_chunks()
                      .to_numpy(zero_copy_only=False)).astype(np.int64) \
            if len(t) else np.empty((0, 0), np.int64)
        out_l, out_s = [], []
        for lb in sorted(set(lab.tolist())):
            out_l.append(lb)
            out_s.append(vs[lab == lb].sum(axis=0))
        return pa.table({"label": pa.array(out_l, pa.int64()),
                         "s": pa.array([v.tolist() for v in out_s],
                                       pa.list_(pa.int64()))})

    sums = single_merge(
        ds.select_columns(["label", "embedding"])
        .map_batches(sum_partial, batch_format="pyarrow",
                     batch_size=8192),
        sum_merge).materialize()
    s_ref = broadcast_table(sums, ["label", "s"])

    def cos_partial(t: pa.Table) -> pa.Table:
        st_ = ray.get(s_ref)
        labs = st_["label"].to_numpy()
        order = np.argsort(labs)
        labs = labs[order]
        S = np.stack(st_["s"].to_numpy(zero_copy_only=False))[order] \
            .astype(np.int64)
        if not len(t):
            return pa.table({"label": pa.array([], pa.int64()),
                             "one": pa.array([], pa.int64()),
                             "q9": pa.array([], pa.int64()),
                             "c6": pa.array([], pa.float64())})
        x = _stack(t, "embedding")
        q = round_half_away(x * grid, 0).astype(np.int64)
        lab = t["label"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        idx = np.searchsorted(labs, lab)
        Sv = S[idx]
        dot = np.einsum("ij,ij->i", q, Sv).astype(np.float64)
        nx = np.einsum("ij,ij->i", q, q).astype(np.float64)
        ns = np.einsum("ij,ij->i", Sv, Sv).astype(np.float64)
        cos = dot / np.sqrt(nx * ns)
        q9 = round_half_away(cos * 1e9, 0).astype(np.int64)
        c6 = round_half_away(cos, 6)
        g = pa.table({"label": pa.array(lab),
                      "one": pa.array(np.ones(len(lab), np.int64)),
                      "q9": pa.array(q9), "c6": pa.array(c6)}) \
            .group_by("label").aggregate([("one", "sum"), ("q9", "sum"),
                                          ("c6", "min")])
        return g.rename_columns(["label", "one", "q9", "c6"])

    g = partial_groupby_agg(
        ds.map_batches(cos_partial, batch_format="pyarrow",
                       batch_size=8192),
        ["label"], [("one", "sum"), ("q9", "sum"), ("c6", "min")])

    def finish(t: pa.Table) -> pa.Table:
        n = t["one_sum"].combine_chunks().to_numpy()
        q9 = t["q9_sum"].combine_chunks().to_numpy()
        return pa.table({
            "label": pc.cast(t["label"], pa.int64()),
            "n": pa.array(n.astype(np.int64)),
            "mean_cos6": pa.array(round_half_away(
                q9.astype(np.float64) / (n.astype(np.float64) * 1e9), 6),
                pa.float64()),
            "min_cos6": pc.cast(t["c6_min"], pa.float64())})

    return g.map_batches(finish, batch_format="pyarrow")


def embed_norm_hist(ds: ray.data.Dataset, grid: float = 512.0
                    ) -> ray.data.Dataset:
    """(bucket, n_vecs, share6): log2 histogram of embedding SQUARED
    norms on the integer lattice (bucket = bit_length of the exact
    int64 norm^2) — the normalization audit (a normalized corpus
    collapses to one or two buckets; stragglers flag un-normalized or
    zero vectors). Exact integers end to end: no float log.

    Scale plan: embarrassingly parallel bounded partials, one tiny
    merge."""
    from ..relational import single_merge
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        if not len(t):
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n_vecs": pa.array([], pa.int64())})
        x = _stack(t, "embedding")
        q = round_half_away(x * grid, 0).astype(np.int64)
        n2 = np.einsum("ij,ij->i", q, q)
        bits = np.array([int(v).bit_length() for v in n2.tolist()],
                        np.int64)
        u, c = np.unique(bits, return_counts=True)
        return pa.table({"bucket": pa.array(u),
                         "n_vecs": pa.array(c.astype(np.int64))})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("bucket").aggregate([("n_vecs", "sum")])
        k = g["bucket"].combine_chunks().to_numpy()
        order = np.argsort(k)
        n = g["n_vecs_sum"].combine_chunks().to_numpy()[order]
        tot = int(n.sum())
        return pa.table({
            "bucket": pa.array(k[order], pa.int64()),
            "n_vecs": pa.array(n.astype(np.int64)),
            "share6": pa.array(round_half_away(
                n.astype(np.float64) / float(tot), 6), pa.float64())})

    return single_merge(
        ds.select_columns(["embedding"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192),
        merge)


def embed_exact_dupes(ds: ray.data.Dataset, grid: float = 512.0,
                      num_parts: int = 16) -> ray.data.Dataset:
    """(n_vecs, n_distinct, n_dupes, max_group): EXACT-duplicate census
    of embeddings on the integer lattice (identical quantized vectors)
    — the cheap first tier of the vector-dedup funnel (semdedup /
    embed_neardup catch near-dups; byte-identical re-ingests are this
    one's job). Zero dupes is a healthy answer, not an empty one.

    Scale plan: per-block lattice-hash partials -> ONE hash exchange
    (full quantized vector carried for exactness, grouped by a
    mixed-hash partition) -> per-partition group census -> tiny merge."""
    from ..relational import hash_part, single_merge

    def partial(t: pa.Table) -> pa.Table:
        if not len(t):
            return pa.table({"h": pa.array([], pa.int64()),
                             "q": pa.array([], pa.list_(pa.int64()))})
        x = _stack(t, "embedding")
        q = round_half_away(x * grid, 0).astype(np.int64)
        # deterministic row hash: golden-mix fold over components
        h = np.zeros(len(q), np.uint64)
        GOLD = np.uint64(0x9E3779B97F4A7C15)
        with np.errstate(over="ignore"):
            for j in range(q.shape[1]):
                h = (h ^ q[:, j].astype(np.uint64)) * GOLD
        return pa.table({
            "h": pa.array(h.astype(np.int64)),
            "q": pa.array(list(q), pa.list_(pa.int64())),
            "part": pa.array(hash_part(h.astype(np.int64), num_parts))})

    def census(t: pa.Table) -> pa.Table:
        if not len(t):
            return pa.table({"n": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        q = np.stack(t["q"].combine_chunks()
                     .to_numpy(zero_copy_only=False)).astype(np.int64)
        view = np.ascontiguousarray(q).view(
            [("", np.int64)] * q.shape[1]).ravel()
        _, counts = np.unique(view, return_counts=True)
        return pa.table({
            "n": pa.array([int(counts.sum())], pa.int64()),
            "d": pa.array([len(counts)], pa.int64()),
            "mx": pa.array([int(counts.max())], pa.int64())})

    def finish(t: pa.Table) -> pa.Table:
        n = int(t["n"].combine_chunks().to_numpy().sum())
        d = int(t["d"].combine_chunks().to_numpy().sum())
        mx = int(t["mx"].combine_chunks().to_numpy().max()) if len(t) \
            else 0
        return pa.table({
            "n_vecs": pa.array([n], pa.int64()),
            "n_distinct": pa.array([d], pa.int64()),
            "n_dupes": pa.array([n - d], pa.int64()),
            "max_group": pa.array([mx], pa.int64())})

    parts = ds.select_columns(["embedding"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=8192) \
        .groupby("part") \
        .map_groups(lambda t: census(t.drop_columns(["part"])
                                     .drop_columns(["h"])),
                    batch_format="pyarrow")
    return single_merge(parts, finish)
