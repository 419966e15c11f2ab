"""Independent scalar / brute-force Python oracles, materialized as parquet.

For operators whose ground truth is not SQL-expressible (LSH pair
generation, winnowing fingerprints, the numpy S2 scheme), the driver's
DuckDB gate reads an EXPECTED parquet computed here by a deliberately
DIFFERENT plan: per-row scalar loops and O(n^2) brute force instead of
the engine's vectorized kernels and hash-partitioned exchanges.  Engine
and oracle share only the primitive constant definitions (hash
multiplier, band layout, bit layouts); the batch vectorization, the
distributed exchange, and the candidate-generation recall under test
are all exercised end-to-end against these files.

This is the "python-oracle parquet the driver can diff" pattern: the
oracle SQL for these queries is just ``SELECT ... FROM
read_parquet('<expected>')``.
"""

from __future__ import annotations

import math
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import datagen

TESTDATA_ROOT = os.environ.get("GO_OSM_RAY_TESTDATA", "/root/testdata")

# bump when any expected-table definition changes (cache key)
_V = 2


def _testdata(sf: float, name: str) -> str:
    return os.path.join(TESTDATA_ROOT, f"sf{sf:g}", f"{name}.parquet")


def _docs(sf: float) -> tuple[list[int], list[str]]:
    t = pq.read_table(_testdata(sf, "documents"), columns=["doc_id", "text"])
    return t["doc_id"].to_pylist(), t["text"].to_pylist()


# ------------------------------------------------------------ minhash pairs

def _bucket_candidates(buckets: dict, max_bucket: int | None
                       ) -> set[tuple[int, int]]:
    """Unordered candidate pairs from LSH buckets, mirroring the engine's
    hot-bucket cap (text._bucket_pairs_vec): a bucket with more than
    ``max_bucket`` members emits the sorted-id CHAIN (c-1 consecutive
    pairs), not the O(c^2) clique — so the documented recall reduction at
    the cap boundary is itself oracle-checked (ADVICE r3) instead of the
    engine/oracle contract silently diverging at exactly the scale the
    cap targets."""
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        ms = sorted(members)
        if max_bucket is not None and len(ms) > max_bucket:
            cand.update(zip(ms[:-1], ms[1:]))
            continue
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                cand.add((ms[x], ms[y]))
    return cand


def _minhash_pairs_table(sf: float, threshold: float = 0.5,
                         num_hashes: int = 64, bands: int = 16,
                         max_bucket: int | None = None) -> pa.Table:
    """Brute-force reference for minhash_lsh_pairs: scalar per-doc
    signatures, python-dict banding, bucket expansion (clique, or the
    engine-mirrored chain above ``max_bucket`` — defaults to None here
    because the gated corpora never produce an oversized bucket, which
    tests/test_skew.py asserts via the capped variant), scalar
    set-Jaccard verify.  Same (a, b, jac6) the distributed exchange must
    produce."""
    ids, texts = _docs(sf)
    return minhash_pairs_from(ids, texts, threshold, num_hashes, bands,
                              max_bucket)


def minhash_pairs_from(ids, texts, threshold: float = 0.5,
                       num_hashes: int = 64, bands: int = 16,
                       max_bucket: int | None = None) -> pa.Table:
    """Core of _minhash_pairs_table on an explicit corpus (so planted-skew
    tests can oracle-check the capped contract)."""
    from .pipelines.text import _SH_MULT, jaccard, minhash_signature
    r = num_hashes // bands
    sigs = {i: minhash_signature(t, num_hashes) for i, t in zip(ids, texts)}
    buckets: dict[tuple[int, int], list[int]] = {}
    for i in ids:
        s = sigs[i]
        for b in range(bands):
            h = np.uint64(0)
            with np.errstate(over="ignore"):
                for j in range(r):
                    h = h * _SH_MULT + s[b * r + j]
            buckets.setdefault((b, int(h)), []).append(i)
    cand = _bucket_candidates(buckets, max_bucket)
    text_of = dict(zip(ids, texts))
    rows_a, rows_b, rows_j = [], [], []
    for a, b2 in sorted(cand):
        jac = jaccard(text_of[a], text_of[b2])
        if jac >= threshold:
            rows_a.append(a)
            rows_b.append(b2)
            rows_j.append(float(np.round(jac, 6)))
    return pa.table({"a": pa.array(rows_a, pa.int64()),
                     "b": pa.array(rows_b, pa.int64()),
                     "jac6": pa.array(rows_j, pa.float64())})


# ------------------------------------------------------------ simhash pairs

def simhash_pairs_from(ids, texts, max_hamming: int = 3,
                       max_bucket: int | None = None) -> pa.Table:
    """Engine-mirrored simhash reference on an explicit corpus: 4x16-bit
    banding, hot-bucket chain cap, exact hamming verify — so planted-skew
    tests can oracle-check the capped contract (ADVICE r3)."""
    from .pipelines.text import simhash64
    sigs = np.array([simhash64(t) for t in texts], np.uint64)
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, s in zip(ids, sigs):
        for b in range(4):
            key = int((s >> np.uint64(16 * b)) & np.uint64(0xFFFF))
            buckets.setdefault((b, key), []).append(i)
    cand = sorted(_bucket_candidates(buckets, max_bucket))
    sig_of = dict(zip(ids, sigs))
    rows = []
    for a0, b0 in cand:
        h0 = int(bin(int(sig_of[a0] ^ sig_of[b0])).count("1"))
        if h0 <= max_hamming:
            rows.append((a0, b0, h0))
    return pa.table({
        "a": pa.array([r[0] for r in rows], pa.int64()),
        "b": pa.array([r[1] for r in rows], pa.int64()),
        "hamming": pa.array([r[2] for r in rows], pa.int64())})


def _simhash_pairs_table(sf: float, max_hamming: int = 3,
                         max_bucket: int | None = None) -> pa.Table:
    """Brute-force reference for simhash_pairs: scalar per-doc simhash64,
    ALL-pairs hamming (no banding — any pair with hamming <= 3 shares at
    least one of the engine's 4 bands by pigeonhole, so the engine's
    banded plan must recover exactly this set).  With ``max_bucket`` set,
    candidates come from the engine's 4x16-bit banding with the
    hot-bucket CHAIN cap mirrored (ADVICE r3) before the hamming filter,
    so the capped contract is oracle-checkable on planted skew corpora
    (the gated corpora never produce an oversized bucket; the driver gate
    itself would flag divergence if one appeared)."""
    from .pipelines.text import simhash64
    ids, texts = _docs(sf)
    if max_bucket is not None:
        return simhash_pairs_from(ids, texts, max_hamming, max_bucket)
    sigs = np.array([simhash64(t) for t in texts], np.uint64)
    idv = np.array(ids, np.int64)
    x = sigs[:, None] ^ sigs[None, :]
    ham = np.unpackbits(x.view(np.uint8).reshape(len(ids), len(ids), 8),
                        axis=2).sum(axis=2).astype(np.int64)
    ii, jj = np.triu_indices(len(ids), k=1)
    m = ham[ii, jj] <= max_hamming
    a, b = idv[ii[m]], idv[jj[m]]
    h = ham[ii[m], jj[m]]
    swap = a > b
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    order = np.lexsort((b2, a2))
    return pa.table({"a": pa.array(a2[order]), "b": pa.array(b2[order]),
                     "hamming": pa.array(h[order])})


# ------------------------------------------------- ngram cutoff / purge

def _ngram_cutoff_pairs_table(sf: float, threshold: float = 0.5,
                              k: int = 3, max_df: int = 64) -> pa.Table:
    """Brute-force reference for the CUTOFF form of ngram_jaccard_pairs:
    global document frequency per distinct shingle, shingles with
    df > max_df dropped before blocking, |A∩B| counted over the KEPT
    shingles while |A| |B| stay full — the exact skew-control semantics
    the partitioned plan implements (df is exact there because a shingle
    lives wholly in one partition)."""
    from collections import Counter

    from .pipelines.text import _shingle_hashes
    from .util import round_half_away
    ids, texts = _docs(sf)
    shs = {i: set(_shingle_hashes(t, k).tolist())
           for i, t in zip(ids, texts)}
    df = Counter(s for v in shs.values() for s in v)
    kept = {s for s, c in df.items() if c <= max_df}
    by_sh: dict[int, list[int]] = {}
    for i in ids:
        for s in shs[i] & kept:
            by_sh.setdefault(s, []).append(i)
    cand: set[tuple[int, int]] = set()
    for members in by_sh.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                a, b = members[x], members[y]
                cand.add((a, b) if a < b else (b, a))
    rows_a, rows_b, rows_j = [], [], []
    for a, b in sorted(cand):
        inter = len(shs[a] & shs[b] & kept)
        jac = inter / (len(shs[a]) + len(shs[b]) - inter)
        if jac >= threshold:
            rows_a.append(a)
            rows_b.append(b)
            rows_j.append(float(round_half_away(np.float64(jac), 6)))
    return pa.table({"a": pa.array(rows_a, pa.int64()),
                     "b": pa.array(rows_b, pa.int64()),
                     "jac6": pa.array(rows_j, pa.float64())})


def _neardup_keep_table(sf: float, threshold: float = 0.5) -> pa.Table:
    """Reference for the minhash-LSH purge: brute-force pairs (above) ->
    python union-find -> keep each component's smallest id plus every
    unpaired doc."""
    pairs = _minhash_pairs_table(sf, threshold)
    ids, _ = _docs(sf)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"].to_pylist(), pairs["b"].to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    keep = [i for i in ids if find(i) == i]
    return pa.table({"doc_id": pa.array(sorted(keep), pa.int64())})


# ------------------------------------------------------------ winnow fp

def _winnow_fp_table(sf: float, k: int = 8) -> pa.Table:
    """Scalar reference for winnow_fingerprint_batch: per-doc python loop
    computing every k-byte polynomial rolling hash (mod 2^64) over the
    lowercased utf8 bytes and taking the min; docs shorter than k hash
    their whole byte string; empty docs -> 0."""
    from .pipelines.text import _SH_MULT
    mult = int(_SH_MULT)
    mask = (1 << 64) - 1
    ids, texts = _docs(sf)
    # share arrow's lowercasing (the rolling hash is the logic under test)
    import pyarrow.compute as pc
    lowered = pc.utf8_lower(pa.array(texts, pa.string())).to_pylist()
    out = []
    for text in lowered:
        bs = text.encode("utf-8")
        if not bs:
            out.append(0)
            continue
        kk = min(k, len(bs))
        best = None
        for s in range(len(bs) - kk + 1):
            h = 0
            for j in range(kk):
                h = (h * mult + bs[s + j]) & mask
            if best is None or h < best:
                best = h
        out.append(best)
    fp = np.array(out, np.uint64).view(np.int64)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "winnow_fp": pa.array(fp)})


# ------------------------------------------------------------- IVF ANN

def _lloyd_centroids(vid: np.ndarray, x_norm: np.ndarray, n_lists: int,
                     iters: int, sample: int) -> np.ndarray:
    """The deterministic quantizer definition (shared with
    spatial.ivf_centroids), evaluated whole-table: hash-priority sample,
    evenly spaced init, Lloyd on normalized float64."""
    gold = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        pri = (vid.astype(np.uint64) * gold) >> np.uint64(33)
    best = np.lexsort((vid, pri))[:sample]
    order = best[np.argsort(vid[best], kind="stable")]
    x = x_norm[order]
    cent = x[np.linspace(0, len(x) - 1, n_lists).astype(np.int64)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(n_lists):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cent[c] = v / np.linalg.norm(v)
    return cent


def _ann_ivf_table(sf: float, n_lists: int = 16, nprobe: int = 8,
                   iters: int = 3, sample: int = 4096) -> pa.Table:
    """Single-matrix reference for ann_ivf_topk: the same deterministic
    quantizer definition (hash-priority sample, evenly spaced init,
    Lloyd on normalized float64) evaluated in ONE numpy pass over the
    whole candidate table — no blocks, no per-batch top-k partials, no
    merge groupby — then a per-query scalar probe loop with one global
    top-k. Output carries only (query_id, rank, vec_id), so the gate
    checks the distributed plan's probe routing and merge exactly."""
    from .oracle import ANN_K, ANN_QUERY_MAX_ID
    t = pq.read_table(_testdata(sf, "embeddings"),
                      columns=["vec_id", "embedding"])
    vid = t["vec_id"].to_numpy()
    emb = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
        .astype(np.float64)
    qsel = vid < ANN_QUERY_MAX_ID
    qid, qm = vid[qsel], emb[qsel]
    cvid, cemb = vid[~qsel], emb[~qsel]
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    cemb = cemb / np.linalg.norm(cemb, axis=1, keepdims=True)

    # quantizer (definition shared with spatial.ivf_centroids; evaluated
    # whole-table here — the engine's block combiner must be a no-op)
    cent = _lloyd_centroids(cvid, cemb, n_lists, iters, sample)

    lists = np.argmax(cemb @ cent.T, axis=1)
    qc = qm @ cent.T
    npb = min(nprobe, n_lists)
    probed = np.argpartition(-qc, npb - 1, axis=1)[:, :npb]
    rows_q, rows_r, rows_v = [], [], []
    for qi in range(len(qid)):
        m = np.isin(lists, probed[qi])
        if not m.any():
            continue
        col = cemb[m] @ qm[qi]
        sub_v = cvid[m]
        k = min(ANN_K, len(col))
        top = np.lexsort((sub_v, -col))[:k]
        rows_q.append(np.full(k, qid[qi], np.int64))
        rows_r.append(np.arange(1, k + 1, dtype=np.int64))
        rows_v.append(sub_v[top].astype(np.int64))
    if not rows_q:  # every query probed only empty lists
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64())})
    return pa.table({"query_id": pa.array(np.concatenate(rows_q)),
                     "rank": pa.array(np.concatenate(rows_r)),
                     "vec_id": pa.array(np.concatenate(rows_v))})


def _ann_recall_table(sf: float, n_lists: int = 16,
                      nprobe: int = 8) -> pa.Table:
    """Recall@k reference for spatial.ann_recall: the approx leg reuses
    _ann_ivf_table (the gated IVF reference) verbatim; the exact leg is
    one whole-matrix normalized-f64 matmul with the shared
    (sim desc, vec_id) tie rule; hits are a set intersection per
    query."""
    from .oracle import ANN_K, ANN_QUERY_MAX_ID
    from .util import round_half_away

    approx = _ann_ivf_table(sf, n_lists=n_lists, nprobe=nprobe)
    t = pq.read_table(_testdata(sf, "embeddings"),
                      columns=["vec_id", "embedding"])
    vid = t["vec_id"].to_numpy()
    emb = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
        .astype(np.float64)
    qsel = vid < ANN_QUERY_MAX_ID
    qid, qm = vid[qsel], emb[qsel]
    cvid, cemb = vid[~qsel], emb[~qsel]
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    cemb = cemb / np.linalg.norm(cemb, axis=1, keepdims=True)
    sims = qm @ cemb.T
    rows = []
    akey = set(zip(approx["query_id"].to_numpy().tolist(),
                   approx["vec_id"].to_numpy().tolist()))
    for qi in np.argsort(qid):
        top = np.lexsort((cvid, -sims[qi]))[:ANN_K]
        n_hit = sum((int(qid[qi]), int(cvid[j])) in akey for j in top)
        rows.append((int(qid[qi]), n_hit))
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_hit": pa.array([r[1] for r in rows], pa.int64()),
        "recall4": pa.array(round_half_away(
            np.array([r[1] for r in rows], np.float64) / ANN_K, 4),
            pa.float64())})


def _ann_pq_table(sf: float, m: int = 16, ksub: int = 256,
                  iters: int = 3, sample: int = 4096) -> pa.Table:
    """Single-matrix reference for ann_pq_topk: the same deterministic
    per-subspace Lloyd codebook definition (hash-priority sample, evenly
    spaced init, identical broadcast distance expression) evaluated in
    ONE numpy pass, then whole-matrix ADC scoring with one global top-k
    per query — no blocks, no partial merges.  Output (query_id, rank,
    vec_id) only, so the gate checks the distributed plan's encode/
    lookup/merge routing exactly."""
    from .oracle import ANN_K, ANN_QUERY_MAX_ID
    t = pq.read_table(_testdata(sf, "embeddings"),
                      columns=["vec_id", "embedding"])
    vid = t["vec_id"].to_numpy()
    emb = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
        .astype(np.float64)
    qsel = vid < ANN_QUERY_MAX_ID
    qid, qm = vid[qsel], emb[qsel]
    cvid, cemb = vid[~qsel], emb[~qsel]
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    cemb = cemb / np.linalg.norm(cemb, axis=1, keepdims=True)

    gold = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        pri = (cvid.astype(np.uint64) * gold) >> np.uint64(33)
    best = np.lexsort((cvid, pri))[:sample]
    order = best[np.argsort(cvid[best], kind="stable")]
    x = cemb[order]
    d = x.shape[1]
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

    codes = np.empty((len(cemb), m), np.int64)
    for j in range(m):
        xs = cemb[:, j * dsub:(j + 1) * dsub]
        d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1)
    tabs = np.stack([qm[:, j * dsub:(j + 1) * dsub] @ books[j].T
                     for j in range(m)])
    s = np.zeros((len(qid), len(cvid)), np.float64)
    for j in range(m):
        s += tabs[j][:, codes[:, j]]
    rows_q, rows_r, rows_v = [], [], []
    for qi in range(len(qid)):
        k = min(ANN_K, len(cvid))
        top = np.lexsort((cvid, -s[qi]))[:k]
        rows_q.append(np.full(k, qid[qi], np.int64))
        rows_r.append(np.arange(1, k + 1, dtype=np.int64))
        rows_v.append(cvid[top].astype(np.int64))
    return pa.table({"query_id": pa.array(np.concatenate(rows_q)),
                     "rank": pa.array(np.concatenate(rows_r)),
                     "vec_id": pa.array(np.concatenate(rows_v))})


def _kmeans_table(sf: float, n_clusters: int = 8, iters: int = 3,
                  sample: int = 4096) -> pa.Table:
    """Whole-matrix reference for vectors.kmeans_assign: same quantizer
    definition, one argmax over the full normalized table — no blocks,
    no broadcast."""
    t = pq.read_table(_testdata(sf, "embeddings"),
                      columns=["vec_id", "embedding"])
    vid = t["vec_id"].to_numpy()
    emb = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
        .astype(np.float64)
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    cent = _lloyd_centroids(vid, emb, n_clusters, iters, sample)
    return pa.table({"vec_id": pa.array(vid, pa.int64()),
                     "cluster": pa.array(np.argmax(emb @ cent.T, axis=1)
                                         .astype(np.int64))})


# ------------------------------------------------------- approx distinct

def _approx_distinct_table(sf: float, p: int = 12) -> pa.Table:
    """Scalar reference for sketch.approx_distinct: per-row python-int
    splitmix64 and register maxima (one sequential loop, no blocks, no
    merge), then the shared estimator once.  Register maxima are order-
    invariant, so the engine's per-block partials + elementwise-max
    exchange must land on the identical register vector and estimate."""
    from .sketch import hll_estimate
    t = pq.read_table(_testdata(sf, "events"),
                      columns=["event_type", "user_id"])
    types = t["event_type"].to_pylist()
    users = t["user_id"].to_pylist()
    mask = (1 << 64) - 1
    regs: dict[str, list[int]] = {}
    for et, uid in zip(types, users):
        z = (int(uid) + 0x9E3779B97F4A7C15) & mask
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
        h = z ^ (z >> 31)
        bucket = h >> (64 - p)
        w = h & ((1 << (64 - p)) - 1)
        rho = (65 - p) if w == 0 else (65 - p - w.bit_length())
        r = regs.setdefault(et, [0] * (1 << p))
        if rho > r[bucket]:
            r[bucket] = rho
    keys = sorted(regs)
    ests = [int(round(hll_estimate(np.array(regs[k], np.uint8))))
            for k in keys]
    return pa.table({"event_type": pa.array(keys, pa.string()),
                     "approx_n": pa.array(ests, pa.int64())})


# ------------------------------------------------------------ images s2

def _scalar_morton_decode(phash: int) -> tuple[float, float]:
    """Bit-by-bit scalar inverse of geo/morton.encode_phash."""
    m = phash >> 12
    u = 0
    v = 0
    for i in range(25):
        u |= ((m >> (2 * i)) & 1) << i
        v |= ((m >> (2 * i + 1)) & 1) << i
    scale = 1 << 25
    return (-180.0 + 360.0 * (u + 0.5) / scale,
            -90.0 + 180.0 * (v + 0.5) / scale)


def _scalar_s2_cell(lon: float, lat: float, level: int) -> int:
    """Per-row scalar re-derivation of geo/s2.cell_id: cube-face
    projection, quadratic st transform, classic Hilbert rotate/flip
    recurrence, standard S2 id bit layout."""
    lo, la = math.radians(lon), math.radians(lat)
    cl = math.cos(la)
    x, y, z = cl * math.cos(lo), cl * math.sin(lo), math.sin(la)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        face = 0 if x >= 0 else 3
    elif ay >= az:
        face = 1 if y >= 0 else 4
    else:
        face = 2 if z >= 0 else 5
    u, v = [(y / x, z / x), (-x / y, z / y), (-x / z, -y / z),
            (z / x, y / x), (z / y, -x / y), (-y / z, -x / z)][face]

    def st(t: float) -> float:
        return 0.5 * math.sqrt(1.0 + 3.0 * t) if t >= 0 \
            else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * t)

    n = 1 << 30
    i = min(max(int(math.floor(st(u) * n)), 0), n - 1)
    j = min(max(int(math.floor(st(v) * n)), 0), n - 1)
    # Hilbert position (classic recurrence, scalar ints)
    xq, yq, d = i, j, 0
    s = 1 << 29
    while s > 0:
        rx = 1 if (xq & s) > 0 else 0
        ry = 1 if (yq & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                xq = s - 1 - xq
                yq = s - 1 - yq
            xq, yq = yq, xq
        s >>= 1
    raw = (face << 61) | (d << 1) | 1
    lsb = 1 << (2 * (30 - level))
    out = (raw & ~(2 * lsb - 1)) | lsb
    return out if out < (1 << 63) else out - (1 << 64)


def _images_s2_table(sf: float, levels: tuple[int, ...] = (10, 14)) -> pa.Table:
    paths = datagen.ensure_tables(sf)
    t = pq.read_table(paths["images"], columns=["image_id", "phash"])
    ids = t["image_id"].to_pylist()
    ph = t["phash"].to_pylist()
    cols: dict[str, list] = {f"s2_l{lev}": [] for lev in levels}
    for p in ph:
        lon, lat = _scalar_morton_decode(int(p))
        for lev in levels:
            cols[f"s2_l{lev}"].append(_scalar_s2_cell(lon, lat, lev))
    out: dict[str, pa.Array] = {"image_id": pa.array(ids, pa.string())}
    for lev in levels:
        out[f"s2_l{lev}"] = pa.array(cols[f"s2_l{lev}"], pa.int64())
    return pa.table(out)


def _scalar_geohash(lon: float, lat: float, precision: int) -> str:
    """Textbook geohash: alternating lon/lat interval bisection, 5 bits
    per base-32 char — the independent construction mirroring the
    engine's quantize+morton-interleave kernel (geo/tiles.geohash; the
    two agree exactly because every input sits >= half a 2^25 morton
    cell away from any bisection boundary)."""
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lo_x, hi_x, lo_y, hi_y = -180.0, 180.0, -90.0, 90.0
    out, ch, bit, even = [], 0, 0, True
    while len(out) < precision:
        if even:
            mid = (lo_x + hi_x) / 2
            if lon >= mid:
                ch, lo_x = ch * 2 + 1, mid
            else:
                ch, hi_x = ch * 2, mid
        else:
            mid = (lo_y + hi_y) / 2
            if lat >= mid:
                ch, lo_y = ch * 2 + 1, mid
            else:
                ch, hi_y = ch * 2, mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(b32[ch])
            ch, bit = 0, 0
    return "".join(out)


def _images_geohash_table(sf: float, precision: int = 6,
                          prefix: int = 4) -> pa.Table:
    t = _images_rows(sf, ["image_id", "phash"])
    ids = t["image_id"].to_pylist()
    gh6, gh4 = [], []
    for p in t["phash"].to_pylist():
        lon, lat = _scalar_morton_decode(int(p))
        g = _scalar_geohash(lon, lat, precision)
        gh6.append(g)
        gh4.append(g[:prefix])
    return pa.table({"image_id": pa.array(ids, pa.string()),
                     f"gh{precision}": pa.array(gh6, pa.string()),
                     f"gh{prefix}": pa.array(gh4, pa.string())})


def _geohash_rollup_table(sf: float,
                          levels: tuple = (2, 4, 6)) -> pa.Table:
    """Scalar reference for geohash_rollup: per-image textbook bisection
    geohash at the finest level, scalar Counter rollup over prefix
    truncations — independent of the engine's vectorized
    quantize+morton construction and its block-combiner exchange."""
    from collections import Counter
    t = _images_rows(sf, ["phash"])
    fine = max(levels)
    cnt: Counter = Counter()
    for p in t["phash"].to_pylist():
        lon, lat = _scalar_morton_decode(int(p))
        g = _scalar_geohash(lon, lat, fine)
        for lvl in levels:
            cnt[(lvl, g[:lvl])] += 1
    rows = sorted(cnt.items())
    return pa.table({
        "lvl": pa.array([k[0] for k, _ in rows], pa.int64()),
        "prefix": pa.array([k[1] for k, _ in rows], pa.string()),
        "n": pa.array([v for _, v in rows], pa.int64()),
    })


def _images_hex_table(sf: float, size_f: float = 0.5,
                      size_c: float = 2.0) -> pa.Table:
    """Scalar reference for images_hex: per-row axial hex binning via an
    ARGMIN-over-candidates rounding (pick the closest of the naive
    rounded cube and its 6 neighbors by planar distance to the hex
    center) — a genuinely different algorithm from the engine's
    fix-largest-residual cube rounding; they agree everywhere because
    both return the nearest hex center."""
    t = _images_rows(sf, ["image_id", "phash"])
    ids = t["image_id"].to_pylist()
    cols: dict[str, list[int]] = {"hq_f": [], "hr_f": [],
                                  "hq_c": [], "hr_c": []}

    def nearest(lon: float, lat: float, s: float) -> tuple[int, int]:
        qf = (math.sqrt(3.0) / 3.0 * lon - lat / 3.0) / s
        rf = (2.0 / 3.0 * lat) / s
        q0, r0 = round(qf), round(rf)
        best, bq, br = None, 0, 0
        for dq, dr in ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1),
                       (1, -1), (-1, 1)):
            q, r = q0 + dq, r0 + dr
            cx = s * math.sqrt(3.0) * (q + r / 2.0)
            cy = s * 1.5 * r
            d = (lon - cx) ** 2 + (lat - cy) ** 2
            if best is None or d < best:
                best, bq, br = d, q, r
        return bq, br

    for p in t["phash"].to_pylist():
        lon, lat = _scalar_morton_decode(int(p))
        qf_, rf_ = nearest(lon, lat, size_f)
        qc_, rc_ = nearest(lon, lat, size_c)
        cols["hq_f"].append(qf_)
        cols["hr_f"].append(rf_)
        cols["hq_c"].append(qc_)
        cols["hr_c"].append(rc_)
    return pa.table({"image_id": pa.array(ids, pa.string()),
                     **{k: pa.array(v, pa.int64())
                        for k, v in cols.items()}})


# ------------------------------------------------------- image / media

def _images_rows(sf: float, columns: list[str]) -> pa.Table:
    paths = datagen.ensure_tables(sf)
    return pq.read_table(paths["images"], columns=columns)


def _image_stats_table(sf: float) -> pa.Table:
    """Scalar reference for image_stats: per-row decode loop straight off
    the parquet, mean via EXACT integer summation (uint8 sums < 2^53 are
    exact in float64 regardless of summation order, so this matches the
    engine's np.mean bit-for-bit). Shares only codecs.decode."""
    from . import codecs
    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    out = {"image_id": [], "ok": [], "w_px": [], "h_px": [], "mean_px6": []}
    for iid, f, b in zip(t["image_id"].to_pylist(), t["fmt"].to_pylist(),
                         t["bytes"].to_pylist()):
        out["image_id"].append(iid)
        try:
            px = codecs.decode(b, f)
            out["ok"].append(True)
            out["h_px"].append(px.shape[0])
            out["w_px"].append(px.shape[1])
            out["mean_px6"].append(
                round(int(px.astype(np.int64).sum()) / px.size, 6))
        except Exception:
            out["ok"].append(False)
            out["h_px"].append(0)
            out["w_px"].append(0)
            out["mean_px6"].append(0.0)
    return pa.table({
        "image_id": pa.array(out["image_id"], pa.string()),
        "ok": pa.array(out["ok"], pa.bool_()),
        "w_px": pa.array(out["w_px"], pa.int32()),
        "h_px": pa.array(out["h_px"], pa.int32()),
        "mean_px6": pa.array(out["mean_px6"], pa.float64()),
    })


def _image_verify_table(sf: float) -> pa.Table:
    """Scalar reference for the input_hint per-row invariant: decoded
    dims == metadata, lossless bit-equality / lossy PSNR >= 40. Shares
    the codec + psnr + generator-recipe primitives."""
    from . import codecs
    from .datagen import _image_caption, _image_pixels
    t = _images_rows(sf, ["image_id", "fmt", "bytes", "w", "h", "caption"])
    rows = {"image_id": [], "dims_ok": [], "pixels_ok": [],
            "caption_ok": [], "psnr6": []}
    for iid, f, b, w, h, cap in zip(
            t["image_id"].to_pylist(), t["fmt"].to_pylist(),
            t["bytes"].to_pylist(), t["w"].to_pylist(),
            t["h"].to_pylist(), t["caption"].to_pylist()):
        i = int(iid[3:])
        px = codecs.decode(b, f)
        ref = _image_pixels(i, w, h)
        p = codecs.psnr(ref, px)
        rows["image_id"].append(iid)
        rows["dims_ok"].append(px.shape == (h, w, 3))
        rows["pixels_ok"].append(bool(np.array_equal(ref, px))
                                 if codecs.is_lossless(f) else bool(p >= 40.0))
        rows["caption_ok"].append(cap == _image_caption(i))
        rows["psnr6"].append(round(min(p, 999.0), 6))
    return pa.table({k: pa.array(v) for k, v in rows.items()})


def _patch_stats_table(sf: float, patch: int = 16) -> pa.Table:
    """Scalar reference for patch_extract: per-row decode + an explicit
    (r, c) double loop over patch slices — the engine's reshaped
    mean(axis=(1,3,4)) must agree bit-for-bit because uint8 patch sums
    (<= 32*32*3*255) are exact in float64 under any summation order."""
    from . import codecs
    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    ids, pys, pxs, means = [], [], [], []
    for iid, f, b in zip(t["image_id"].to_pylist(), t["fmt"].to_pylist(),
                         t["bytes"].to_pylist()):
        px = codecs.decode(b, f)
        gh, gw = px.shape[0] // patch, px.shape[1] // patch
        for r in range(gh):
            for c in range(gw):
                blk = px[r * patch:(r + 1) * patch,
                         c * patch:(c + 1) * patch].astype(np.float64)
                ids.append(iid)
                pys.append(r)
                pxs.append(c)
                means.append(round(float(blk.mean()), 6))
    return pa.table({"image_id": pa.array(ids, pa.string()),
                     "py": pa.array(pys, pa.int32()),
                     "px": pa.array(pxs, pa.int32()),
                     "patch_mean6": pa.array(means, pa.float64())})


def _image_ahash_table(sf: float) -> pa.Table:
    """Scalar reference for image_ahash: per-row decode + the shared
    ahash64 primitive (codecs.py documents why the per-image float
    semantics must be one definition)."""
    from . import codecs
    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    ids = t["image_id"].to_pylist()
    hashes = [codecs.ahash64(codecs.decode(b, f))
              for f, b in zip(t["fmt"].to_pylist(), t["bytes"].to_pylist())]
    return pa.table({"image_id": pa.array(ids, pa.string()),
                     "ahash": pa.array(hashes, pa.int64())})


def _image_sig_dedup_table(sf: float, every: int = 100,
                           id_offset: int = 1_000_000_000) -> pa.Table:
    """Scalar reference for image_sig_dedup: re-play the deterministic
    re-encode augmentation (every 100th image re-encoded as bmp under
    id+1e9), hash every payload, then group with a python dict — min
    numeric id and count per signature.  The engine's combiner exchange
    (per-block Acero partials -> hash-partition -> merge) is what the
    gate exercises."""
    from . import codecs
    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    groups: dict[int, list[int]] = {}

    def add(nid: int, ah: int) -> None:
        g = groups.setdefault(ah, [nid, 0])
        g[0] = min(g[0], nid)
        g[1] += 1

    for iid, f, b in zip(t["image_id"].to_pylist(), t["fmt"].to_pylist(),
                         t["bytes"].to_pylist()):
        n = int(iid[3:])
        px = codecs.decode(b, f)
        add(n, codecs.ahash64(px))
        if n % every == 0:
            add(n + id_offset, codecs.ahash64(
                codecs.decode(codecs.encode(px, "bmp"), "bmp")))
    ah = sorted(groups)
    return pa.table({
        "ahash": pa.array(ah, pa.int64()),
        "keeper_id": pa.array([groups[a][0] for a in ah], pa.int64()),
        "group_n": pa.array([groups[a][1] for a in ah], pa.int64()),
    })


def _audio_features_table(sf: float, sample_rate: int = 16_000,
                          n_bands: int = 13) -> pa.Table:
    """Scalar reference for the exploded audio-feature rows: per-clip
    stub decode + the shared band-energy primitive, float32-cast exactly
    like the stage, rounded to 6dp like the query wrapper."""
    from .pipelines.media import _band_energies, _decode_audio_stub
    t = _images_rows(sf, ["image_id", "bytes"])
    ids, bands, vals = [], [], []
    for iid, b in zip(t["image_id"].to_pylist(), t["bytes"].to_pylist()):
        e = _band_energies(_decode_audio_stub(b, sample_rate),
                           n_bands).astype(np.float32).astype(np.float64)
        for bi in range(n_bands):
            ids.append(iid)
            bands.append(bi)
            vals.append(float(np.round(e[bi], 6)))
    return pa.table({"media_id": pa.array(ids, pa.string()),
                     "band": pa.array(bands, pa.int64()),
                     "energy6": pa.array(vals, pa.float64())})


def _video_frames_table(sf: float, k: int = 2) -> pa.Table:
    """Scalar reference for video_frames: per-clip frame windows via the
    shared stub, emitting (media_id, frame_idx, frame_len)."""
    from .pipelines.media import _decode_frame_stub
    t = _images_rows(sf, ["image_id", "bytes"])
    ids, idxs, lens = [], [], []
    for iid, b in zip(t["image_id"].to_pylist(), t["bytes"].to_pylist()):
        for f in range(k):
            ids.append(iid)
            idxs.append(f)
            lens.append(len(_decode_frame_stub(b, f)))
    return pa.table({"media_id": pa.array(ids, pa.string()),
                     "frame_idx": pa.array(idxs, pa.int64()),
                     "frame_len": pa.array(lens, pa.int64())})


# ------------------------------------------------------------ cache layer

def _simplify_ways_table(sf: float) -> pa.Table:
    """Scalar recursive Douglas-Peucker reference for simplify_ways:
    python-float point-to-segment distances, explicit recursion, strict
    first-max update — shares only the epsilon constant with the engine's
    vectorized span kernel."""
    from .pipelines.osm import SIMPLIFY_EPS
    d = datagen.scale_dir(sf)
    nt = pq.read_table(str(d / "osm_nodes.parquet"),
                       columns=["id", "lon", "lat"])
    coord = {i: (lo, la) for i, lo, la in
             zip(nt["id"].to_pylist(), nt["lon"].to_pylist(),
                 nt["lat"].to_pylist())}
    wt = pq.read_table(str(d / "osm_ways.parquet"), columns=["id", "refs"])
    eps2 = SIMPLIFY_EPS * SIMPLIFY_EPS

    def seg_d2(px, py, ax, ay, bx, by):
        dx, dy = bx - ax, by - ay
        L2 = dx * dx + dy * dy
        if L2 == 0.0:
            return (px - ax) * (px - ax) + (py - ay) * (py - ay)
        t = ((px - ax) * dx + (py - ay) * dy) / L2
        t = 0.0 if t < 0.0 else (1.0 if t > 1.0 else t)
        qx, qy = ax + t * dx, ay + t * dy
        return (px - qx) * (px - qx) + (py - qy) * (py - qy)

    def dp(xs, ys, i, j, keep):
        if j - i < 2:
            return
        best, bd = -1, -1.0
        for k in range(i + 1, j):
            d2 = seg_d2(xs[k], ys[k], xs[i], ys[i], xs[j], ys[j])
            if d2 > bd:
                bd, best = d2, k
        if bd > eps2:
            keep.add(best)
            dp(xs, ys, i, best, keep)
            dp(xs, ys, best, j, keep)

    rows = {"way_id": [], "n_points": [], "n_kept": [], "kept_seq_sum": []}
    for wid, refs in zip(wt["id"].to_pylist(), wt["refs"].to_pylist()):
        if len(refs) < 2 or any(r not in coord for r in refs):
            continue
        xs = [coord[r][0] for r in refs]
        ys = [coord[r][1] for r in refs]
        keep = {0, len(refs) - 1}
        dp(xs, ys, 0, len(refs) - 1, keep)
        rows["way_id"].append(wid)
        rows["n_points"].append(len(refs))
        rows["n_kept"].append(len(keep))
        rows["kept_seq_sum"].append(sum(keep))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})


def _way_pagerank_table(sf: float) -> pa.Table:
    """Scalar PageRank reference for way_pagerank: python-dict TRUE
    shared-node pairwise graph (every clique pair per ref group — the
    way_components oracle's adjacency), per-node float sums in plain
    loops — shares only the damping / iteration constants and the rank
    formula with the engine's static-shard exchange."""
    from collections import defaultdict

    from .pipelines.osm import PAGERANK_DAMPING, PAGERANK_ITERS
    from .util import round_half_away
    d = datagen.scale_dir(sf)
    wt = pq.read_table(str(d / "osm_ways.parquet"), columns=["id", "refs"])
    ids = wt["id"].to_pylist()
    byref: dict[int, list[int]] = defaultdict(list)
    for wid, refs in zip(ids, wt["refs"].to_pylist()):
        for r in set(refs):
            byref[r].append(wid)
    pairs: set[tuple[int, int]] = set()
    for ws in byref.values():
        ms = sorted(ws)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                pairs.add((ms[x], ms[y]))
    deg: dict[int, int] = defaultdict(int)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    n = len(ids)
    base = (1.0 - PAGERANK_DAMPING) / float(n)
    pr = {i: 1.0 / float(n) for i in ids}
    for _ in range(PAGERANK_ITERS):
        s: dict[int, float] = defaultdict(float)
        for a, b in pairs:
            s[b] += pr[a] / deg[a]
            s[a] += pr[b] / deg[b]
        pr = {i: base + PAGERANK_DAMPING * s[i] for i in ids}
    out = sorted(ids)
    return pa.table({
        "way_id": pa.array(out, pa.int64()),
        "deg": pa.array([deg[i] for i in out], pa.int64()),
        "pr9": pa.array([float(round_half_away(np.float64(pr[i]), 9))
                         for i in out], pa.float64()),
    })


def _relation_multipolygons_table(sf: float) -> pa.Table:
    """Scalar multipolygon-assembly reference: pure-python dict stitching
    over the relation member ways, written independently of the engine's
    two-exchange plan. Shared contract (see
    pipelines.osm.relation_multipolygons): inner role -> inner pool,
    everything else outer; (way, role) deduped; chains extend at the tail
    with the smallest-id unused way (forward match preferred); closed
    chains of >= 4 points are rings; ring area = |fsum shoelace| / 2 and
    area6 = round6(fsum(outer) - fsum(inner)) — math.fsum makes both
    sides exactly rounded, so order of accumulation cannot diverge."""
    import math

    from .util import round_half_away
    d = datagen.scale_dir(sf)
    nt = pq.read_table(str(d / "osm_nodes.parquet"),
                       columns=["id", "lon", "lat"])
    coord = dict(zip(nt["id"].to_pylist(),
                     zip(nt["lon"].to_pylist(), nt["lat"].to_pylist())))
    wt = pq.read_table(str(d / "osm_ways.parquet"), columns=["id", "refs"])
    way_refs = dict(zip(wt["id"].to_pylist(), wt["refs"].to_pylist()))
    rt = pq.read_table(str(d / "osm_relations.parquet"),
                       columns=["id", "members"])

    def stitch(pool_ways: list[int]) -> tuple[int, int, list[float]]:
        seqs = [(w, [r for r in way_refs[w] if r in coord])
                for w in sorted(pool_ways)]
        used = [False] * len(seqs)
        rings, n_open, areas = 0, 0, []
        for i in range(len(seqs)):
            if used[i]:
                continue
            used[i] = True
            chain = list(seqs[i][1])
            while len(chain) >= 2 and chain[0] != chain[-1]:
                nxt, rev = -1, False
                for k in range(len(seqs)):
                    if used[k] or len(seqs[k][1]) < 2:
                        continue
                    if seqs[k][1][0] == chain[-1]:
                        nxt, rev = k, False
                        break
                    if seqs[k][1][-1] == chain[-1]:
                        nxt, rev = k, True
                        break
                if nxt < 0:
                    break
                used[nxt] = True
                ext = seqs[nxt][1][::-1] if rev else seqs[nxt][1]
                chain.extend(ext[1:])
            if len(chain) >= 4 and chain[0] == chain[-1]:
                rings += 1
                pts = [coord[r] for r in chain]
                areas.append(abs(math.fsum(
                    pts[k][0] * pts[k + 1][1] - pts[k + 1][0] * pts[k][1]
                    for k in range(len(pts) - 1))) / 2.0)
            else:
                n_open += 1
        return rings, n_open, areas

    rows = {"relation_id": [], "n_outer": [], "n_inner": [],
            "n_open": [], "area6": []}
    for rid, members in zip(rt["id"].to_pylist(), rt["members"].to_pylist()):
        pools: dict[bool, set[int]] = {False: set(), True: set()}
        for m in members:
            # the engine's coordinate join drops unresolved refs, so a
            # way only reaches its stitch kernel with >= 1 resolved ref
            if (m["type"] == "way" and m["ref"] in way_refs
                    and any(r in coord for r in way_refs[m["ref"]])):
                pools[m["role"] == "inner"].add(m["ref"])
        if not pools[False] and not pools[True]:
            continue  # engine only sees relations with >= 1 way member
        ro = stitch(sorted(pools[False]))
        ri = stitch(sorted(pools[True]))
        rows["relation_id"].append(rid)
        rows["n_outer"].append(ro[0])
        rows["n_inner"].append(ri[0])
        rows["n_open"].append(ro[1] + ri[1])
        rows["area6"].append(float(round_half_away(
            np.array([math.fsum(ro[2]) - math.fsum(ri[2])]), 6)[0]))
    return pa.table({
        "relation_id": pa.array(rows["relation_id"], pa.int64()),
        "n_outer": pa.array(rows["n_outer"], pa.int64()),
        "n_inner": pa.array(rows["n_inner"], pa.int64()),
        "n_open": pa.array(rows["n_open"], pa.int64()),
        "area6": pa.array(rows["area6"], pa.float64()),
    })


def _kcenter_table(sf: float, k: int = 16, nd: int = 6) -> pa.Table:
    """Whole-matrix reference for vectors.kcenter_sample: one
    sequential Gonzalez traversal over the full normalized matrix —
    an explicit per-round argmax with python tie-breaking, no blocks,
    no per-block candidates."""
    from .util import round_half_away
    t = pq.read_table(_testdata(sf, "embeddings"),
                      columns=["vec_id", "embedding"])
    vid = t["vec_id"].to_numpy()
    x = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
        .astype(np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    order = np.argsort(vid)
    vid, x = vid[order], x[order]
    chosen = [0]  # smallest vec_id
    dists = [2.0]
    mind = 1.0 - x @ x[0]
    mind[0] = -np.inf
    for _ in range(k - 1):
        j = int(np.lexsort((vid, -mind))[0])
        if not np.isfinite(mind[j]):
            break
        chosen.append(j)
        dists.append(float(mind[j]))
        mind = np.minimum(mind, 1.0 - x @ x[j])
        mind[j] = -np.inf
    return pa.table({
        "rank": pa.array(np.arange(len(chosen)), pa.int64()),
        "vec_id": pa.array(vid[chosen], pa.int64()),
        "dist6": pa.array(round_half_away(np.array(dists), nd),
                          pa.float64()),
    })


def _semdedup_table(sf: float, n_clusters: int = 8,
                    threshold: float = 0.95, nd: int = 6,
                    every: int = 50, id_offset: int = 100_000,
                    alpha: float = 0.1, iters: int = 3,
                    sample: int = 4096) -> pa.Table:
    """Whole-matrix reference for vectors.semdedup over the
    plant_neardups-augmented embedding table: the scalar plant mirror
    (v + alpha*reverse(v), cast through the table's float32 element
    type exactly as the engine's perturb stage does), ONE Lloyd pass on
    the full matrix (_lloyd_centroids — the shared quantizer
    definition), then per cluster the full O(c^2) cosine matrix with a
    strict lower-triangle max — no blocks, no slab chunking, no
    groupby exchange."""
    t = pq.read_table(_testdata(sf, "embeddings"),
                      columns=["vec_id", "embedding"])
    vid = t["vec_id"].to_numpy()
    emb32 = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
        .astype(np.float32)
    m = (vid % every) == 0
    planted = (emb32[m].astype(np.float64)
               + alpha * emb32[m].astype(np.float64)[:, ::-1]) \
        .astype(np.float32)
    all_vid = np.concatenate([vid, vid[m] + id_offset])
    x = np.vstack([emb32, planted]).astype(np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    cent = _lloyd_centroids(all_vid, x, n_clusters, iters, sample)
    cl = np.argmax(x @ cent.T, axis=1).astype(np.int64)
    out_v, out_c, out_m = [], [], []
    for c in range(n_clusters):
        sel = np.flatnonzero(cl == c)
        if not len(sel):
            continue
        mv = all_vid[sel]
        o = np.argsort(mv)
        mv, xm = mv[o], x[sel][o]
        sims = xm @ xm.T
        n = len(mv)
        tri = np.tril(np.ones((n, n), bool), -1)
        maxcos = np.where(tri, sims, -np.inf).max(axis=1)
        maxcos[0] = -2.0
        out_v.append(mv)
        out_c.append(np.full(n, c, np.int64))
        out_m.append(maxcos)
    vids = np.concatenate(out_v)
    cls = np.concatenate(out_c)
    from .util import round_half_away
    c6 = np.concatenate([round_half_away(m_, nd) for m_ in out_m]) \
        if out_m else np.array([])
    o = np.argsort(vids)
    return pa.table({"vec_id": pa.array(vids[o], pa.int64()),
                     "cluster": pa.array(cls[o], pa.int64()),
                     "maxcos6": pa.array(c6[o], pa.float64()),
                     "kept": pa.array(c6[o] < threshold)})


# ------------------------------------------------- per-cell convex hull

def _jarvis_strict(pts: list[tuple[float, float]]) -> list[tuple[float, float]]:
    """Strict convex hull of unique points by gift wrapping (Jarvis
    march) — a deliberately different algorithm from the engine's
    monotone-chain hull-of-hulls combiner.  Collinear boundary points
    are excluded by walking to the FARTHEST point among orientation
    ties, so only corner vertices survive (matching the engine's strict
    `<= 0` chain pop)."""
    if len(pts) <= 2:
        return list(pts)
    start = min(pts)
    hull = []
    cur = start
    while True:
        hull.append(cur)
        nxt = None
        for p in pts:
            if p == cur:
                continue
            if nxt is None:
                nxt = p
                continue
            cr = ((nxt[0] - cur[0]) * (p[1] - cur[1])
                  - (nxt[1] - cur[1]) * (p[0] - cur[0]))
            d_p = (p[0] - cur[0]) ** 2 + (p[1] - cur[1]) ** 2
            d_n = (nxt[0] - cur[0]) ** 2 + (nxt[1] - cur[1]) ** 2
            if cr < 0.0 or (cr == 0.0 and d_p > d_n):
                nxt = p
        cur = nxt
        if cur == start:
            break
    return hull


def _cell_hull_table(sf: float, res: int = 7) -> pa.Table:
    """(cell, n_pts, n_hull, area6) per occupied cell, scalar plan:
    per-row morton decode + scalar slippy cell, per-cell Jarvis strict
    hull, fsum shoelace — independent of spatial.cell_convex_hull's
    vectorized hull-of-hulls exchange."""
    from .util import round_half_away
    t = _images_rows(sf, ["phash"])
    cells: dict[int, list[tuple[float, float]]] = {}
    n = 1 << res
    for ph in t["phash"].to_pylist():
        lon, lat = _scalar_morton_decode(ph)
        r = math.radians(lat)
        x = math.floor((lon + 180.0) / 360.0 * n)
        y = math.floor((1.0 - math.log(math.tan(r) + 1.0 / math.cos(r))
                        / math.pi) / 2.0 * n)
        x = min(max(int(x), 0), n - 1)
        y = min(max(int(y), 0), n - 1)
        cell = (res << 58) | (x << 29) | y
        cells.setdefault(cell, []).append((lon, lat))
    rows: dict[str, list] = {"cell": [], "n_pts": [], "n_hull": [], "area6": []}
    for cell in sorted(cells):
        pts = cells[cell]
        hull = _jarvis_strict(sorted(set(pts)))
        if len(hull) >= 3:
            area = abs(math.fsum(
                px * qy - qx * py
                for (px, py), (qx, qy) in zip(hull, hull[1:] + hull[:1]))) / 2.0
        else:
            area = 0.0
        rows["cell"].append(cell)
        rows["n_pts"].append(len(pts))
        rows["n_hull"].append(len(hull))
        rows["area6"].append(float(round_half_away(np.float64(area), 6)))
    return pa.table({"cell": pa.array(rows["cell"], pa.int64()),
                     "n_pts": pa.array(rows["n_pts"], pa.int64()),
                     "n_hull": pa.array(rows["n_hull"], pa.int64()),
                     "area6": pa.array(rows["area6"], pa.float64())})


def _grid_dbscan_table(sf: float, res: int = 7, min_pts: int = 2) -> pa.Table:
    """(cell, cluster, n_pts) scalar plan: per-row slippy cell counts,
    then plain BFS over the 8-neighbour lattice of core cells — no
    window keys, no union-find, fully independent of the engine's
    owner-window pair exchange + pointer-jump components."""
    t = _images_rows(sf, ["phash"])
    n = 1 << res
    counts: dict[tuple[int, int], int] = {}
    for ph in t["phash"].to_pylist():
        lon, lat = _scalar_morton_decode(ph)
        r = math.radians(lat)
        x = math.floor((lon + 180.0) / 360.0 * n)
        y = math.floor((1.0 - math.log(math.tan(r) + 1.0 / math.cos(r))
                        / math.pi) / 2.0 * n)
        xy = (min(max(int(x), 0), n - 1), min(max(int(y), 0), n - 1))
        counts[xy] = counts.get(xy, 0) + 1
    core = {xy for xy, c in counts.items() if c >= min_pts}

    def cid(xy: tuple[int, int]) -> int:
        return (res << 58) | (xy[0] << 29) | xy[1]

    seen: set[tuple[int, int]] = set()
    label: dict[tuple[int, int], int] = {}
    for start in core:
        if start in seen:
            continue
        comp = [start]
        seen.add(start)
        i = 0
        while i < len(comp):
            cx, cy = comp[i]
            i += 1
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nb = (cx + dx, cy + dy)
                    if nb in core and nb not in seen:
                        seen.add(nb)
                        comp.append(nb)
        lab = min(cid(xy) for xy in comp)
        for xy in comp:
            label[xy] = lab

    rows = sorted((cid(xy), label[xy], counts[xy]) for xy in core)
    return pa.table({"cell": pa.array([r[0] for r in rows], pa.int64()),
                     "cluster": pa.array([r[1] for r in rows], pa.int64()),
                     "n_pts": pa.array([r[2] for r in rows], pa.int64())})


# ------------------------------------------------------------ DSIR sampling

def _dsir_table(sf: float, target_lang: str = "en", k: int = 200,
                n_buckets: int = 1024, alpha: float = 1.0,
                nd: int = 6) -> pa.Table:
    """Scalar DSIR mirror: per-doc dict counting + sorted-bucket
    sequential float accumulation (the engine's reduceat order)."""
    import math
    import zlib

    t = pq.read_table(_testdata(sf, "documents"),
                      columns=["doc_id", "text", "lang"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    langs = t["lang"].to_pylist()
    tgt = [0] * n_buckets
    raw = [0] * n_buckets
    per_doc = []
    for text, lang in zip(texts, langs):
        cnt: dict[int, int] = {}
        for tok in text.lower().split():
            b = zlib.crc32(tok.encode()) % n_buckets
            cnt[b] = cnt.get(b, 0) + 1
        per_doc.append(cnt)
        for b, c in cnt.items():
            raw[b] += c
            if lang == target_lang:
                tgt[b] += c
    tgt_tot = float(sum(tgt))
    raw_tot = float(sum(raw))
    lam = [math.log((tgt[b] + alpha) / (tgt_tot + alpha * n_buckets))
           - math.log((raw[b] + alpha) / (raw_tot + alpha * n_buckets))
           for b in range(n_buckets)]
    ws = []
    for cnt in per_doc:
        w = np.float64(0.0)
        for b in sorted(cnt):
            w = w + np.float64(cnt[b]) * np.float64(lam[b])
        ws.append(float(w))
    order = sorted(range(len(ids)), key=lambda i: (-ws[i], ids[i]))[:k]
    rd = 10.0 ** nd
    return pa.table({
        "rank": pa.array(range(1, len(order) + 1), pa.int64()),
        "doc_id": pa.array([ids[i] for i in order], pa.int64()),
        "w": pa.array([math.floor(ws[i] * rd + 0.5) / rd if ws[i] >= 0
                       else math.ceil(ws[i] * rd - 0.5) / rd
                       for i in order]),
    })


def _embed_outliers_table(sf: float, n_clusters: int = 8, m: int = 50,
                          iters: int = 3, sample: int = 4096,
                          nd: int = 6) -> pa.Table:
    """Whole-matrix reference for vectors.embed_outliers: same quantizer
    definition, one matmul, full-table top-m by (dist desc, vec_id)."""
    import math

    t = pq.read_table(_testdata(sf, "embeddings"),
                      columns=["vec_id", "embedding"])
    vid = t["vec_id"].to_numpy()
    emb = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
        .astype(np.float64)
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    cent = _lloyd_centroids(vid, emb, n_clusters, iters, sample)
    sims = emb @ cent.T
    c = np.argmax(sims, axis=1)
    d = 1.0 - sims[np.arange(len(c)), c]
    top = np.lexsort((vid, -d))[:m]
    rd = 10.0 ** nd
    dr = [math.floor(x * rd + 0.5) / rd if x >= 0
          else math.ceil(x * rd - 0.5) / rd for x in d[top]]
    return pa.table({
        "rank": pa.array(range(1, len(top) + 1), pa.int64()),
        "vec_id": pa.array(vid[top], pa.int64()),
        "cluster": pa.array(c[top].astype(np.int64)),
        "dist": pa.array(dr),
    })


def _kmv_overlap_table(sf: float, k: int = 64, nd: int = 6) -> pa.Table:
    """Scalar mirror for relq.kmv_overlap: python-set sketches over the
    shared md5_num_lower user hash and the same KMV set algebra in the
    same float op order (every estimate is a ratio of exact integers,
    so parity is bit-for-bit).  Independence under test: the engine's
    block-level bottom-k combiner + merge."""
    from .util import md5_num_lower, round_half_away

    t = pq.read_table(_testdata(sf, "events"),
                      columns=["event_type", "user_id"])
    et = t["event_type"].to_numpy(zero_copy_only=False)
    uid = t["user_id"].to_numpy()
    names = sorted(set(et.tolist()))
    two64 = 18446744073709551616.0
    sk = {}
    for nm in names:
        hs = sorted(set(md5_num_lower(uid[et == nm]).tolist()))
        sk[nm] = hs[:k]
    rows = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = sk[names[i]], sk[names[j]]
            sa, sb = set(a), set(b)
            u = sorted(sa | sb)
            kk = min(k, len(u))
            ukk = u[:kk]
            tau = float(ukk[-1])
            cnt = sum(1 for x in ukk if x in sa and x in sb)
            jac = float(cnt) / kk
            est_union = (kk - 1.0) / (tau / two64) if kk > 1 else 0.0
            rows.append((names[i], names[j], kk, jac, est_union,
                         jac * est_union))
    return pa.table({
        "type_a": pa.array([r[0] for r in rows], pa.string()),
        "type_b": pa.array([r[1] for r in rows], pa.string()),
        "kk": pa.array([r[2] for r in rows], pa.int64()),
        "est_jac6": pa.array(round_half_away(
            np.array([r[3] for r in rows], np.float64), nd), pa.float64()),
        "est_union3": pa.array(round_half_away(
            np.array([r[4] for r in rows], np.float64), 3), pa.float64()),
        "est_inter3": pa.array(round_half_away(
            np.array([r[5] for r in rows], np.float64), 3), pa.float64())})


def _neardup_eval_table(sf: float, nd: int = 4) -> pa.Table:
    """Counts-level reference for text.neardup_eval: both legs reuse
    the existing gated brute-force builders (scalar banding + clique
    expansion for LSH, global-df blocked exact Jaccard with the cutoff
    disabled for truth); the set comparison is a python set
    intersection."""
    from .util import round_half_away

    lsh = _minhash_pairs_table(sf)
    truth = _ngram_cutoff_pairs_table(sf, max_df=1 << 62)
    lset = set(zip(lsh["a"].to_numpy().tolist(),
                   lsh["b"].to_numpy().tolist()))
    tset = set(zip(truth["a"].to_numpy().tolist(),
                   truth["b"].to_numpy().tolist()))
    n_hit = len(lset & tset)
    n_lsh, n_true = len(lset), len(tset)
    prec = n_hit / n_lsh if n_lsh else 1.0
    rec = n_hit / n_true if n_true else 1.0
    return pa.table({
        "n_true": pa.array([n_true], pa.int64()),
        "n_lsh": pa.array([n_lsh], pa.int64()),
        "n_hit": pa.array([n_hit], pa.int64()),
        "precision4": pa.array(round_half_away(np.array([prec]), nd),
                               pa.float64()),
        "recall4": pa.array(round_half_away(np.array([rec]), nd),
                            pa.float64())})


def _embed_pca_table(sf: float, top_m: int = 2, nd: int = 4) -> pa.Table:
    """Single-pass whole-matrix mirror for vectors.embed_pca: direct
    centered covariance (xc.T @ xc, no distributed moment merge), the
    same eigh + largest-|coordinate|-positive sign convention, one
    matmul.  Independence under test: the engine's covariance comes
    from merged per-block (n, sum, sum-of-squares) partials."""
    from .util import round_half_away

    t = pq.read_table(_testdata(sf, "embeddings"),
                      columns=["vec_id", "embedding"])
    vid = t["vec_id"].to_numpy()
    x = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
        .astype(np.float64)
    mean = x.mean(axis=0)
    xc = x - mean
    cov = xc.T @ xc / (len(x) - 1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:top_m]
    comps = v[:, order].T
    flip = np.sign(comps[np.arange(len(comps)),
                         np.argmax(np.abs(comps), axis=1)])
    comps = comps * flip[:, None]
    p = xc @ comps.T
    cols = {"vec_id": pa.array(vid, pa.int64())}
    for m in range(top_m):
        cols[f"pc{m + 1}"] = pa.array(round_half_away(p[:, m], nd),
                                      pa.float64())
    return pa.table(cols)


def _src_js_table(sf: float, n_buckets: int = 1024, nd: int = 6) -> pa.Table:
    """Scalar-count mirror for scoring.src_js_divergence: per-doc dict
    counting into per-source vectors, then the shared JS definition
    (scoring.js_divergence_matrix is a pure function of the exact
    integer counts; the independence under test is the distributed
    counting plan)."""
    import math
    import zlib

    from .pipelines.scoring import js_divergence_matrix

    t = pq.read_table(_testdata(sf, "documents"), columns=["source", "text"])
    srcs = t["source"].to_pylist()
    texts = t["text"].to_pylist()
    names = sorted(set(srcs))
    idx = {s: i for i, s in enumerate(names)}
    mat = np.zeros((len(names), n_buckets), np.int64)
    for s, text in zip(srcs, texts):
        for tok in text.lower().split():
            mat[idx[s], zlib.crc32(tok.encode()) % n_buckets] += 1
    js = js_divergence_matrix(mat)
    rows = []
    rd = 10.0 ** nd
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            x = js[i, j]
            r = math.floor(x * rd + 0.5) / rd if x >= 0 \
                else math.ceil(x * rd - 0.5) / rd
            rows.append((names[i], names[j], r))
    return pa.table({
        "src_a": pa.array([r[0] for r in rows], pa.string()),
        "src_b": pa.array([r[1] for r in rows], pa.string()),
        "js": pa.array([r[2] for r in rows], pa.float64()),
    })


def _image_entropy_table(sf: float) -> pa.Table:
    """Scalar reference for image_entropy: per-row decode loop + the
    shared entropy definition over exact integer bucket counts."""
    import math

    from . import codecs
    from .pipelines.images import _entropy_from_counts

    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    out = {"image_id": [], "ok": [], "entropy6": [], "n_buckets": []}
    for iid, f, b in zip(t["image_id"].to_pylist(), t["fmt"].to_pylist(),
                         t["bytes"].to_pylist()):
        out["image_id"].append(iid)
        try:
            px = codecs.decode(b, f)
            cnt = np.bincount((px.ravel() >> 4), minlength=16)
            e = _entropy_from_counts(cnt)
            out["ok"].append(True)
            out["entropy6"].append(
                math.floor(e * 1e6 + 0.5) / 1e6 if e >= 0
                else math.ceil(e * 1e6 - 0.5) / 1e6)
            out["n_buckets"].append(int((cnt > 0).sum()))
        except Exception:
            out["ok"].append(False)
            out["entropy6"].append(0.0)
            out["n_buckets"].append(0)
    return pa.table({
        "image_id": pa.array(out["image_id"], pa.string()),
        "ok": pa.array(out["ok"], pa.bool_()),
        "entropy6": pa.array(out["entropy6"], pa.float64()),
        "n_buckets": pa.array(out["n_buckets"], pa.int64()),
    })


def _way_kcore_table(sf: float) -> pa.Table:
    """Scalar k-core reference: python-dict full pairwise shared-node
    graph + textbook min-degree peeling (completely different plan from
    the engine's h-index BSP iteration)."""
    import heapq
    from collections import defaultdict

    d = datagen.scale_dir(sf)
    wt = pq.read_table(str(d / "osm_ways.parquet"), columns=["id", "refs"])
    ids = wt["id"].to_pylist()
    byref: dict[int, list[int]] = defaultdict(list)
    for wid, refs in zip(ids, wt["refs"].to_pylist()):
        for r in set(refs):
            byref[r].append(wid)
    adj: dict[int, set] = {w: set() for w in ids}
    for ws in byref.values():
        for i, a in enumerate(ws):
            for b in ws[i + 1:]:
                if a != b:
                    adj[a].add(b)
                    adj[b].add(a)
    deg = {w: len(adj[w]) for w in ids}
    core: dict[int, int] = {}
    heap = [(dv, w) for w, dv in deg.items()]
    heapq.heapify(heap)
    k = 0
    alive = set(ids)
    while heap:
        dv, w = heapq.heappop(heap)
        if w not in alive or dv != deg[w]:
            continue
        k = max(k, dv)
        core[w] = k
        alive.discard(w)
        for nb in adj[w]:
            if nb in alive:
                deg[nb] -= 1
                heapq.heappush(heap, (deg[nb], nb))
    return pa.table({
        "way_id": pa.array(sorted(ids), pa.int64()),
        "core": pa.array([core[w] for w in sorted(ids)], pa.int64()),
    })


def _mst_w_scalar(a: int, b: int) -> int:
    """Scalar mirror of state.bsp.mst_edge_weight (same constants, same
    64-bit multiply-xor mix, truncated to 32 bits)."""
    m = (1 << 64) - 1
    x = (a * 0x9E3779B97F4A7C15 + b * 0xC2B2AE3D27D4EB4F) & m
    x ^= x >> 33
    x = (x * 0x9E3779B97F4A7C15) & m
    x ^= x >> 29
    return x >> 32


def _way_mst_table(sf: float) -> pa.Table:
    """Scalar Kruskal reference for way_mst: dict ref-grouping, full
    pairwise edge set, edges sorted by the total order (w, a, b),
    textbook union-find — a deliberately different plan from the
    engine's distributed Boruvka BSP (min-outgoing-edge hooking)."""
    from collections import defaultdict

    d = datagen.scale_dir(sf)
    wt = pq.read_table(str(d / "osm_ways.parquet"), columns=["id", "refs"])
    ids = wt["id"].to_pylist()
    byref: dict[int, list[int]] = defaultdict(list)
    for wid, refs in zip(ids, wt["refs"].to_pylist()):
        for r in set(refs):
            byref[r].append(wid)
    edges: set[tuple[int, int]] = set()
    for ws in byref.values():
        for i, a in enumerate(ws):
            for b in ws[i + 1:]:
                if a != b:
                    edges.add((min(a, b), max(a, b)))
    elist = sorted((_mst_w_scalar(a, b), a, b) for a, b in edges)

    parent = {w: w for w in ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    accepted: list[tuple[int, int, int]] = []
    for w, a, b in elist:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            accepted.append((w, a, b))
    comp_min: dict[int, int] = {}
    comp_n: dict[int, int] = {}
    for wid in ids:
        r = find(wid)
        comp_min[r] = min(comp_min.get(r, wid), wid)
        comp_n[r] = comp_n.get(r, 0) + 1
    comp_e: dict[int, int] = {}
    comp_w: dict[int, int] = {}
    for w, a, b in accepted:
        r = find(a)
        comp_e[r] = comp_e.get(r, 0) + 1
        comp_w[r] = comp_w.get(r, 0) + w
    roots = sorted(comp_min, key=lambda r: comp_min[r])
    return pa.table({
        "component": pa.array([comp_min[r] for r in roots], pa.int64()),
        "n_ways": pa.array([comp_n[r] for r in roots], pa.int64()),
        "n_edges": pa.array([comp_e.get(r, 0) for r in roots], pa.int64()),
        "total_w": pa.array([comp_w.get(r, 0) for r in roots], pa.int64()),
    })


def _scalar_hilbert(lon: float, lat: float, order: int) -> int:
    """Textbook scalar xy2d (rotate/flip per MSB level) — independent
    of the engine's vectorized bit walk in geo/tiles.hilbert_d."""
    n = 1 << order
    vx = (lon + 180.0) / 360.0 * float(n)
    vy = (lat + 90.0) / 180.0 * float(n)
    x = int(min(max(vx, 0.0), float(n - 1)))
    y = int(min(max(vy, 0.0), float(n - 1)))
    d = 0
    s = n >> 1
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s >>= 1
    return d


def _hilbert_order_table(sf: float, order: int = 16,
                         shard_bits: int = 8) -> pa.Table:
    t = _images_rows(sf, ["image_id", "phash"])
    ids = t["image_id"].to_pylist()
    hs, sh = [], []
    shift = 2 * order - shard_bits
    for p in t["phash"].to_pylist():
        lon, lat = _scalar_morton_decode(int(p))
        d = _scalar_hilbert(lon, lat, order)
        hs.append(d)
        sh.append(d >> shift)
    return pa.table({"image_id": pa.array(ids, pa.string()),
                     f"hilbert{order}": pa.array(hs, pa.int64()),
                     "shard": pa.array(sh, pa.int64())})


_SM_MASK = (1 << 64) - 1


def _scalar_splitmix(z: int) -> int:
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9 & _SM_MASK
    z = (z ^ (z >> 27)) * 0x94D049BB133111EB & _SM_MASK
    return z ^ (z >> 31)


def _detect_nms_table(sf: float, k: int = 6,
                      iou_thresh: float = 0.5) -> pa.Table:
    """Scalar greedy NMS over the deterministic synthetic boxes —
    per-image python loops, independent of the engine's
    batch-vectorized k x k suppression passes."""
    t = _images_rows(sf, ["image_id", "phash", "w", "h"])
    out_n, out_m = [], []
    for iid, p, w, h in zip(t["image_id"].to_pylist(),
                            t["phash"].to_pylist(),
                            t["w"].to_pylist(), t["h"].to_pylist()):
        pu = int(p) & _SM_MASK
        cand = []
        for j in range(k):
            r = _scalar_splitmix((pu + (j + 1) * 0x9E3779B97F4A7C15)
                                 & _SM_MASK)
            cx = ((r & 0xFFFF) / 65536.0) * float(w)
            cy = (((r >> 16) & 0xFFFF) / 65536.0) * float(h)
            bw = (0.15 + ((r >> 32) & 0xFFFF) / 65536.0 * 0.45) * float(w)
            bh = (0.15 + ((r >> 48) & 0xFFFF) / 65536.0 * 0.45) * float(h)
            score = _scalar_splitmix(r) & 0xFFFFFF
            cand.append((score, j, cx - bw / 2.0, cy - bh / 2.0,
                         cx + bw / 2.0, cy + bh / 2.0))
        cand.sort(key=lambda b: (-b[0], b[1]))
        kept = []
        mask = 0
        for b in cand:
            ok = True
            for kb in kept:
                ix0 = max(b[2], kb[2])
                iy0 = max(b[3], kb[3])
                ix1 = min(b[4], kb[4])
                iy1 = min(b[5], kb[5])
                inter = max(ix1 - ix0, 0.0) * max(iy1 - iy0, 0.0)
                ab = (b[4] - b[2]) * (b[5] - b[3])
                akb = (kb[4] - kb[2]) * (kb[5] - kb[3])
                iou = inter / (ab + akb - inter)
                if iou > iou_thresh:
                    ok = False
                    break
            if ok:
                kept.append(b)
                mask |= 1 << b[1]
        out_n.append(len(kept))
        out_m.append(mask)
    return pa.table({"image_id": t["image_id"].combine_chunks(),
                     "n_kept": pa.array(out_n, pa.int64()),
                     "keep_mask": pa.array(out_m, pa.int64())})


def _osm_refs_coord(sf: float):
    """(refs_of, coord) dicts for the scalar way-geometry oracles."""
    d = datagen.scale_dir(sf)
    nt = pq.read_table(str(d / "osm_nodes.parquet"),
                       columns=["id", "lon", "lat"])
    coord = {i: (lo, la) for i, lo, la in
             zip(nt["id"].to_pylist(), nt["lon"].to_pylist(),
                 nt["lat"].to_pylist())}
    wt = pq.read_table(str(d / "osm_ways.parquet"), columns=["id", "refs"])
    refs_of = dict(zip(wt["id"].to_pylist(), wt["refs"].to_pylist()))
    return refs_of, coord


def _scalar_shared_node_pairs(refs_of) -> set[tuple[int, int]]:
    from collections import defaultdict
    byref: dict[int, list[int]] = defaultdict(list)
    for wid, refs in refs_of.items():
        for r in set(refs):
            byref[r].append(wid)
    pairs: set[tuple[int, int]] = set()
    for members in byref.values():
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                pairs.add((ms[x], ms[y]))
    return pairs


def _scalar_frechet_pairs(pairs, refs_of, coord) -> pa.Table:
    """Textbook per-pair O(n*m) discrete-Frechet DP with scalar math.*
    haversine — shares only EARTH_R_M and the 3 dp half-away rounding
    convention with the engine's padded-tensor batched DP."""
    from .pipelines.osm import EARTH_R_M
    from .util import round_half_away

    d2r = math.pi / 180.0

    def hav(lo1, la1, lo2, la2) -> float:
        p1, p2 = la1 * d2r, la2 * d2r
        sdp = math.sin((p2 - p1) / 2.0)
        sdl = math.sin((lo2 - lo1) * d2r / 2.0)
        aa = min(sdp * sdp + math.cos(p1) * math.cos(p2) * sdl * sdl, 1.0)
        return float(round_half_away(
            np.float64(2.0 * EARTH_R_M * math.asin(math.sqrt(aa))), 3))

    rows = {"a": [], "b": [], "frechet3": []}
    for a, b in sorted(pairs):
        A = [coord[r] for r in refs_of[a]]
        B = [coord[r] for r in refs_of[b]]
        dp = [[0.0] * len(B) for _ in range(len(A))]
        for i in range(len(A)):
            for j in range(len(B)):
                c = hav(A[i][0], A[i][1], B[j][0], B[j][1])
                if i == 0 and j == 0:
                    dp[i][j] = c
                elif i == 0:
                    dp[i][j] = max(dp[i][j - 1], c)
                elif j == 0:
                    dp[i][j] = max(dp[i - 1][j], c)
                else:
                    dp[i][j] = max(min(dp[i - 1][j], dp[i - 1][j - 1],
                                       dp[i][j - 1]), c)
        rows["a"].append(a)
        rows["b"].append(b)
        rows["frechet3"].append(dp[-1][-1])
    return pa.table({"a": pa.array(rows["a"], pa.int64()),
                     "b": pa.array(rows["b"], pa.int64()),
                     "frechet3": pa.array(rows["frechet3"], pa.float64())})


def _way_frechet_table(sf: float) -> pa.Table:
    """Scalar reference for way_frechet: python-dict shared-node pair
    enumeration + the scalar Frechet DP."""
    refs_of, coord = _osm_refs_coord(sf)
    return _scalar_frechet_pairs(_scalar_shared_node_pairs(refs_of),
                                 refs_of, coord)


def _way_conflate_pairs_table(sf: float) -> pa.Table:
    """Scalar reference for way_conflate's candidate pair set
    (shared-node pairs UNION the grid-bucketed geometric candidates)
    with their Frechet values.  Mirrors conflate_candidate_edges
    exactly but by a python-dict plan: each way's signature comes from
    the already-gated way_resample oracle rows, the MIDPOINT
    (pt_idx = k//2) is floored onto the CONFLATE_GRID_DEG grid and
    emitted into the 3x3 cell neighborhood; a distinct co-emitted pair
    is a candidate iff the max 3 dp haversine over the k ALIGNED
    signature points is <= CONFLATE_SIG_GATE_M, with per-cell
    ascending-id truncation at CONFLATE_MAX_CELL."""
    from collections import defaultdict

    from .pipelines.osm import (CONFLATE_GRID_DEG, CONFLATE_MAX_CELL,
                                CONFLATE_SIG_GATE_M, EARTH_R_M,
                                RESAMPLE_K)
    from .util import round_half_away

    refs_of, coord = _osm_refs_coord(sf)
    pairs = _scalar_shared_node_pairs(refs_of)

    rs = _way_resample_table(sf)
    sig: dict[int, list[tuple[float, float]]] = defaultdict(list)
    for wid, pi, lo, la in zip(rs["way_id"].to_pylist(),
                               rs["pt_idx"].to_pylist(),
                               rs["lon6"].to_pylist(),
                               rs["lat6"].to_pylist()):
        sig[wid].append((lo, la))  # pt_idx-ordered by construction
    bycell: dict[int, set[int]] = defaultdict(set)
    for wid, pts in sig.items():
        lo, la = pts[RESAMPLE_K // 2]
        cx = int(math.floor(lo / CONFLATE_GRID_DEG))
        cy = int(math.floor(la / CONFLATE_GRID_DEG))
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cell = (cx + dx + 200_000) * 1_000_000 \
                    + (cy + dy + 200_000)
                bycell[cell].add(wid)

    d2r = math.pi / 180.0

    def hav3(lo1, la1, lo2, la2) -> float:
        p1, p2 = la1 * d2r, la2 * d2r
        sdp = math.sin((p2 - p1) / 2.0)
        sdl = math.sin((lo2 - lo1) * d2r / 2.0)
        aa = min(sdp * sdp + math.cos(p1) * math.cos(p2) * sdl * sdl, 1.0)
        return float(round_half_away(
            np.float64(2.0 * EARTH_R_M * math.asin(math.sqrt(aa))), 3))

    for members in bycell.values():
        ms = sorted(members)[:CONFLATE_MAX_CELL]
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                sa, sb = sig[ms[x]], sig[ms[y]]
                dmax = max(hav3(a[0], a[1], b[0], b[1])
                           for a, b in zip(sa, sb))
                if dmax <= CONFLATE_SIG_GATE_M:
                    pairs.add((ms[x], ms[y]))
    return _scalar_frechet_pairs(pairs, refs_of, coord)


def _way_rasterize_table(sf: float, z_px: int = 18,
                         z_tile: int = 13) -> pa.Table:
    """Scalar reference for way_rasterize: per-segment python DDA loop
    into a pixel dict, then a per-tile dict rollup — shares only the
    tile formula constants and the integer offset rule
    ((2kd + n) // 2n, negated for d < 0) with the engine's
    repeat-trick vectorization."""
    from collections import defaultdict
    d = datagen.scale_dir(sf)
    nt = pq.read_table(str(d / "osm_nodes.parquet"),
                       columns=["id", "lon", "lat"])
    coord = {i: (lo, la) for i, lo, la in
             zip(nt["id"].to_pylist(), nt["lon"].to_pylist(),
                 nt["lat"].to_pylist())}
    wt = pq.read_table(str(d / "osm_ways.parquet"), columns=["id", "refs"])
    n_grid = 1 << z_px

    def px_of(lon: float, lat: float) -> tuple[int, int]:
        lat_r = np.radians(np.float64(lat))
        x = np.floor((np.float64(lon) + 180.0) / 360.0 * n_grid)
        y = np.floor((1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r))
                      / np.pi) / 2.0 * n_grid)
        return (int(min(max(x, 0), n_grid - 1)),
                int(min(max(y, 0), n_grid - 1)))

    def off(k: int, dd: int, n: int) -> int:
        if n == 0:
            return 0
        o = (2 * k * abs(dd) + n) // (2 * n)
        return o if dd >= 0 else -o

    pix: dict[tuple[int, int], int] = defaultdict(int)
    for refs in wt["refs"].to_pylist():
        pts = [px_of(*coord[r]) for r in refs]
        for (x0, y0), (x1, y1) in zip(pts[:-1], pts[1:]):
            dx, dy = x1 - x0, y1 - y0
            n = max(abs(dx), abs(dy))
            for k in range(n + 1):
                pix[(x0 + off(k, dx, n), y0 + off(k, dy, n))] += 1
    shift = z_px - z_tile
    tiles_d: dict[tuple[int, int], list[int]] = defaultdict(lambda: [0, 0])
    for (x, y), c in pix.items():
        t = tiles_d[(x >> shift, y >> shift)]
        t[0] += 1
        t[1] += c
    keys = sorted(tiles_d)
    return pa.table({
        "tile_x": pa.array([k[0] for k in keys], pa.int64()),
        "tile_y": pa.array([k[1] for k in keys], pa.int64()),
        "n_px": pa.array([tiles_d[k][0] for k in keys], pa.int64()),
        "visits": pa.array([tiles_d[k][1] for k in keys], pa.int64())})


def _mmr_select_table(sf: float, k: int = 10, n_cand: int = 64,
                      lam: float = 0.7) -> pa.Table:
    """Single-matrix reference for mmr_select: full-corpus cosine to
    every query, python greedy MMR loop over the top-n_cand set —
    shares only the normalization/matmul conventions (np.linalg.norm,
    float64 @) and the lam constant with the engine's partial-top-k
    exchange."""
    from .oracle import ANN_QUERY_MAX_ID
    from .util import round_half_away
    t = pq.read_table(_testdata(sf, "embeddings"),
                      columns=["vec_id", "embedding"])
    vid = t["vec_id"].to_numpy()
    X = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
        .astype(np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    isq = vid < ANN_QUERY_MAX_ID
    qid, qm = vid[isq], X[isq]
    cid, cm = vid[~isq], X[~isq]
    rows = {"query_id": [], "rank": [], "vec_id": [], "mmr6": []}
    for qi in range(len(qid)):
        sims = cm @ qm[qi]
        top = np.lexsort((cid, -sims))[:n_cand]
        tv, ts, tm = cid[top], sims[top], cm[top]
        cc = tm @ tm.T
        picked: list[int] = []
        maxdiv = np.full(len(tv), -np.inf)
        for step in range(min(k, len(tv))):
            best, bscore = -1, None
            for j in range(len(tv)):
                if j in picked:
                    continue
                sc = lam * ts[j] if step == 0 \
                    else lam * ts[j] - (1.0 - lam) * maxdiv[j]
                if bscore is None or sc > bscore or \
                        (sc == bscore and tv[j] < tv[best]):
                    best, bscore = j, sc
            picked.append(best)
            maxdiv = np.maximum(maxdiv, cc[:, best])
            rows["query_id"].append(int(qid[qi]))
            rows["rank"].append(step + 1)
            rows["vec_id"].append(int(tv[best]))
            rows["mmr6"].append(float(round_half_away(
                np.float64(bscore), 6)))
    return pa.table({
        "query_id": pa.array(rows["query_id"], pa.int64()),
        "rank": pa.array(rows["rank"], pa.int64()),
        "vec_id": pa.array(rows["vec_id"], pa.int64()),
        "mmr6": pa.array(rows["mmr6"], pa.float64())})


def _way_pseudo_diameter_table(sf: float) -> pa.Table:
    """Scalar reference for way_pseudo_diameter: python-dict adjacency
    (full pairwise within each ref group), deque BFS components, then
    the double sweep — BFS from the component min id, pick the farthest
    way (ties min id), BFS again, report its eccentricity."""
    from collections import defaultdict, deque
    d = datagen.scale_dir(sf)
    wt = pq.read_table(str(d / "osm_ways.parquet"), columns=["id", "refs"])
    ids = wt["id"].to_pylist()
    byref: dict[int, list[int]] = defaultdict(list)
    for wid, refs in zip(ids, wt["refs"].to_pylist()):
        for r in set(refs):
            byref[r].append(wid)
    adj: dict[int, set[int]] = defaultdict(set)
    for members in byref.values():
        for x in members:
            for y in members:
                if x != y:
                    adj[x].add(y)

    def bfs(src: int) -> dict[int, int]:
        dist = {src: 0}
        dq = deque([src])
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        return dist

    seen: set[int] = set()
    rows = {"component": [], "n_ways": [], "diameter": []}
    for wid in sorted(ids):
        if wid in seen:
            continue
        d1 = bfs(wid)
        seen.update(d1)
        far = min((w for w in d1), key=lambda w: (-d1[w], w))
        d2 = bfs(far)
        rows["component"].append(wid)
        rows["n_ways"].append(len(d1))
        rows["diameter"].append(max(d2.values()))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})


def _cell_image_mosaic_table(sf: float, res: int = 7, k: int = 4,
                             side: int = 16) -> pa.Table:
    """Scalar reference for cell_image_mosaic: python-dict cell
    grouping (scalar morton + slippy formula), sorted-id pick, decode
    + nn_thumb per winner, same canvas layout — shares only the codec
    / thumbnail primitives and the layout constants with the engine's
    pre-selected two-stage exchange."""
    import zlib
    from . import codecs
    t = _images_rows(sf, ["image_id", "fmt", "bytes", "phash"])
    n = 1 << res
    groups: dict[int, list[tuple[str, str, bytes]]] = {}
    for iid, f, b, ph in zip(t["image_id"].to_pylist(),
                             t["fmt"].to_pylist(),
                             t["bytes"].to_pylist(),
                             t["phash"].to_pylist()):
        lon, lat = _scalar_morton_decode(int(ph))
        r = math.radians(lat)
        x = math.floor((lon + 180.0) / 360.0 * n)
        y = math.floor((1.0 - math.log(math.tan(r) + 1.0 / math.cos(r))
                        / math.pi) / 2.0 * n)
        xy = (min(max(int(x), 0), n - 1), min(max(int(y), 0), n - 1))
        cell = (res << 58) | (xy[0] << 29) | xy[1]
        groups.setdefault(cell, []).append((iid, f, b))
    grid = math.ceil(math.sqrt(k))
    rows = {"cell": [], "n_imgs": [], "mean6": [], "crc": []}
    for cell in sorted(groups):
        picks = sorted(groups[cell])[:k]
        canvas = np.zeros((grid * side, grid * side, 3), np.uint8)
        for slot, (_, f, b) in enumerate(picks):
            th = codecs.nn_thumb(codecs.decode(b, f), side)
            yy, xx = (slot // grid) * side, (slot % grid) * side
            canvas[yy:yy + side, xx:xx + side] = th
        rows["cell"].append(cell)
        rows["n_imgs"].append(len(picks))
        rows["mean6"].append(round(
            int(canvas.astype(np.int64).sum()) / canvas.size, 6))
        rows["crc"].append(zlib.crc32(canvas.tobytes()))
    return pa.table({
        "cell": pa.array(rows["cell"], pa.int64()),
        "n_imgs": pa.array(rows["n_imgs"], pa.int64()),
        "mean6": pa.array(rows["mean6"], pa.float64()),
        "crc": pa.array(rows["crc"], pa.int64())})


def _image_transcode_table(sf: float) -> pa.Table:
    """Scalar reference for image_transcode: per-row decode -> qnt5
    encode -> decode loop straight off the parquet — shares only the
    codec primitives; exercises the actor pool, batching and id
    alignment around them."""
    from . import codecs
    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    rows = {"image_id": [], "fmt": [], "in_bytes": [], "out_bytes": [],
            "psnr6": []}
    for iid, f, b in zip(t["image_id"].to_pylist(), t["fmt"].to_pylist(),
                         t["bytes"].to_pylist()):
        px = codecs.decode(b, f)
        out = codecs.encode(px, "qnt5")
        rt = codecs.decode(out, "qnt5")
        rows["image_id"].append(iid)
        rows["fmt"].append(f)
        rows["in_bytes"].append(len(b))
        rows["out_bytes"].append(len(out))
        rows["psnr6"].append(round(min(codecs.psnr(px, rt), 999.0), 6))
    return pa.table({
        "image_id": pa.array(rows["image_id"], pa.string()),
        "fmt": pa.array(rows["fmt"], pa.string()),
        "in_bytes": pa.array(rows["in_bytes"], pa.int64()),
        "out_bytes": pa.array(rows["out_bytes"], pa.int64()),
        "psnr6": pa.array(rows["psnr6"], pa.float64())})


def _embed_hard_negatives_table(sf: float) -> pa.Table:
    """Single-matrix reference for embed_hard_negatives: full-corpus
    cosine per query, scalar argmax per label class (ties vec_id
    ASC)."""
    from .oracle import ANN_QUERY_MAX_ID
    from .util import round_half_away
    t = pq.read_table(_testdata(sf, "embeddings"),
                      columns=["vec_id", "embedding", "label"])
    vid = t["vec_id"].to_numpy()
    lab = t["label"].to_numpy()
    X = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
        .astype(np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    isq = vid < ANN_QUERY_MAX_ID
    rows = {"query_id": [], "pos_id": [], "neg_id": [], "pos6": [],
            "neg6": [], "margin6": []}
    for qi in np.flatnonzero(isq):
        sims = X[~isq] @ X[qi]
        cv, cl = vid[~isq], lab[~isq]
        picks = {}
        for flag in (True, False):
            m = cl == lab[qi] if flag else cl != lab[qi]
            sub = np.flatnonzero(m)
            best = sub[np.lexsort((cv[sub], -sims[sub]))[0]]
            picks[flag] = (int(cv[best]), float(sims[best]))
        rows["query_id"].append(int(vid[qi]))
        rows["pos_id"].append(picks[True][0])
        rows["neg_id"].append(picks[False][0])
        rows["pos6"].append(float(round_half_away(
            np.float64(picks[True][1]), 6)))
        rows["neg6"].append(float(round_half_away(
            np.float64(picks[False][1]), 6)))
        rows["margin6"].append(float(round_half_away(
            np.float64(picks[True][1] - picks[False][1]), 6)))
    return pa.table({
        "query_id": pa.array(rows["query_id"], pa.int64()),
        "pos_id": pa.array(rows["pos_id"], pa.int64()),
        "neg_id": pa.array(rows["neg_id"], pa.int64()),
        "pos6": pa.array(rows["pos6"], pa.float64()),
        "neg6": pa.array(rows["neg6"], pa.float64()),
        "margin6": pa.array(rows["margin6"], pa.float64())})


def _events_markov_table(sf: float) -> pa.Table:
    """Scalar reference for events_markov_stationary: python-dict
    transition counts in one pass over the sorted rows, nested-loop
    row normalization and power iteration — shares only the iteration
    count and the uniform start."""
    from .pipelines.relq import MARKOV_ITERS
    from .util import round_half_away
    t = pq.read_table(_testdata(sf, "events"),
                      columns=["user_id", "event_id", "ts", "event_type"])
    rows = sorted(zip(t["user_id"].to_pylist(),
                      [v.timestamp() for v in t["ts"].to_pylist()],
                      t["event_id"].to_pylist(),
                      t["event_type"].to_pylist()))
    cnt: dict[tuple[str, str], float] = {}
    for (u1, _, _, a), (u2, _, _, b) in zip(rows[:-1], rows[1:]):
        if u1 == u2:
            cnt[(a, b)] = cnt.get((a, b), 0.0) + 1.0
    types = sorted({a for a, _ in cnt} | {b for _, b in cnt})
    k = len(types)
    idx = {ty: i for i, ty in enumerate(types)}
    P = np.zeros((k, k))
    for (a, b), c in cnt.items():
        P[idx[a], idx[b]] = c
    rs = P.sum(axis=1)
    for i in range(k):
        if rs[i] > 0:
            P[i] /= rs[i]
        else:
            P[i, i] = 1.0
    pi = np.full(k, 1.0 / k)
    for _ in range(MARKOV_ITERS):
        nxt = np.zeros(k)
        for j in range(k):
            acc = 0.0
            for i in range(k):
                acc += pi[i] * P[i, j]
            nxt[j] = acc
        pi = nxt
    return pa.table({"event_type": pa.array(types, pa.string()),
                     "pi6": pa.array(round_half_away(pi, 6),
                                     pa.float64())})


def _doc_compression_table(sf: float, level: int = 6) -> pa.Table:
    """Scalar reference for doc_compression_ratio: per-row zlib loop
    straight off the parquet — shares only the zlib level constant
    and the repo-wide half-away rounding."""
    import zlib

    from .util import round_half_away
    t = pq.read_table(_testdata(sf, "documents"),
                      columns=["doc_id", "text"])
    rows = {"doc_id": [], "raw_len": [], "comp_len": [], "ratio6": []}
    for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        b = s.encode("utf-8")
        c = len(zlib.compress(b, level))
        rows["doc_id"].append(did)
        rows["raw_len"].append(len(b))
        rows["comp_len"].append(c)
        rows["ratio6"].append(
            float(round_half_away(np.float64(c / len(b)), 6))
            if len(b) else 0.0)
    return pa.table({
        "doc_id": pa.array(rows["doc_id"], pa.int64()),
        "raw_len": pa.array(rows["raw_len"], pa.int64()),
        "comp_len": pa.array(rows["comp_len"], pa.int64()),
        "ratio6": pa.array(rows["ratio6"], pa.float64())})




def _image_sharpness_table(sf: float) -> pa.Table:
    """Scalar reference for image_sharpness: per-row decode loop, the
    Laplacian built via explicit shifted COPIES (np.roll + edge trim,
    a different construction than the engine's slice arithmetic) and
    the variance from the same exact integer sums."""
    from . import codecs
    from .util import round_half_away

    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    out = {"image_id": [], "ok": [], "n_px": [], "lap_var6": []}
    for iid, f, b in zip(t["image_id"].to_pylist(), t["fmt"].to_pylist(),
                         t["bytes"].to_pylist()):
        out["image_id"].append(iid)
        try:
            px = codecs.decode(b, f)
            lum = px.astype(np.int64).sum(axis=2)
            lap_full = (4 * lum
                        - np.roll(lum, 1, axis=0) - np.roll(lum, -1, axis=0)
                        - np.roll(lum, 1, axis=1) - np.roll(lum, -1, axis=1))
            lap = lap_full[1:-1, 1:-1]
            n = int(lap.size)
            s1 = int(lap.sum())
            s2 = int((lap.astype(object) ** 2).sum())
            v = (n * s2 - s1 * s1) / (n * n)
            out["ok"].append(True)
            out["n_px"].append(n)
            out["lap_var6"].append(float(round_half_away(np.float64(v), 6)))
        except Exception:
            out["ok"].append(False)
            out["n_px"].append(0)
            out["lap_var6"].append(0.0)
    return pa.table({
        "image_id": pa.array(out["image_id"], pa.string()),
        "ok": pa.array(out["ok"], pa.bool_()),
        "n_px": pa.array(out["n_px"], pa.int64()),
        "lap_var6": pa.array(out["lap_var6"], pa.float64())})


def _image_palette_table(sf: float) -> pa.Table:
    """Scalar reference for image_palette: bucket ids built by integer
    DIVISION (c // 64) instead of bit shifts, counts via a python
    Counter — independent path, identical exact integers."""
    from collections import Counter

    from . import codecs
    from .util import round_half_away

    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    out = {"image_id": [], "ok": [], "top_bucket": [], "top_share6": [],
           "n_colors": []}
    for iid, f, b in zip(t["image_id"].to_pylist(), t["fmt"].to_pylist(),
                         t["bytes"].to_pylist()):
        out["image_id"].append(iid)
        try:
            px = codecs.decode(b, f).astype(np.int64)
            buckets = (px[..., 0] // 64) * 16 + (px[..., 1] // 64) * 4 \
                + (px[..., 2] // 64)
            c = Counter(buckets.ravel().tolist())
            # ties -> smallest bucket id
            top = min(k for k, v in c.items() if v == max(c.values()))
            out["ok"].append(True)
            out["top_bucket"].append(int(top))
            out["top_share6"].append(float(round_half_away(
                np.float64(c[top] / buckets.size), 6)))
            out["n_colors"].append(len(c))
        except Exception:
            out["ok"].append(False)
            out["top_bucket"].append(-1)
            out["top_share6"].append(0.0)
            out["n_colors"].append(0)
    return pa.table({
        "image_id": pa.array(out["image_id"], pa.string()),
        "ok": pa.array(out["ok"], pa.bool_()),
        "top_bucket": pa.array(out["top_bucket"], pa.int64()),
        "top_share6": pa.array(out["top_share6"], pa.float64()),
        "n_colors": pa.array(out["n_colors"], pa.int64())})


def _image_ssim_table(sf: float) -> pa.Table:
    """Scalar reference for image_ssim: per-row decode + qnt5 round
    trip, integer moments via python-int accumulation (independent of
    the engine's numpy sums — both exact), shared final expression
    (_ssim_from_moments, the declared common numeric definition)."""
    from . import codecs
    from .pipelines.images import _ssim_from_moments
    from .util import round_half_away

    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    out = {"image_id": [], "fmt": [], "ssim6": []}
    for iid, f, b in zip(t["image_id"].to_pylist(), t["fmt"].to_pylist(),
                         t["bytes"].to_pylist()):
        px = codecs.decode(b, f)
        rt = codecs.decode(codecs.encode(px, "qnt5"), "qnt5")
        x = px.astype(np.int64).sum(axis=2).ravel().tolist()
        y = rt.astype(np.int64).sum(axis=2).ravel().tolist()
        sx = sum(x); sy = sum(y)
        sxx = sum(v * v for v in x)
        syy = sum(v * v for v in y)
        sxy = sum(a * c for a, c in zip(x, y))
        s = _ssim_from_moments(len(x), sx, sy, sxx, syy, sxy)
        out["image_id"].append(iid)
        out["fmt"].append(f)
        out["ssim6"].append(float(round_half_away(np.float64(s), 6)))
    return pa.table({
        "image_id": pa.array(out["image_id"], pa.string()),
        "fmt": pa.array(out["fmt"], pa.string()),
        "ssim6": pa.array(out["ssim6"], pa.float64())})


def _image_border_table(sf: float) -> pa.Table:
    """Scalar reference for image_border_contrast: border sum built by
    explicit frame-strip slices (top/bottom rows + side columns) rather
    than the engine's total-minus-interior — identical exact ints."""
    from . import codecs
    from .util import round_half_away

    W = 2
    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    out = {"image_id": [], "ok": [], "border_mean6": [], "ratio6": []}
    for iid, f, b in zip(t["image_id"].to_pylist(), t["fmt"].to_pylist(),
                         t["bytes"].to_pylist()):
        out["image_id"].append(iid)
        try:
            px = codecs.decode(b, f)
            lum = px.astype(np.int64).sum(axis=2)
            s_b = int(lum[:W].sum()) + int(lum[-W:].sum()) \
                + int(lum[W:-W, :W].sum()) + int(lum[W:-W, -W:].sum())
            n_b = lum.size - (lum.shape[0] - 2 * W) * (lum.shape[1] - 2 * W)
            s_i = int(lum.sum()) - s_b
            n_i = lum.size - n_b
            out["ok"].append(True)
            out["border_mean6"].append(float(round_half_away(
                np.float64(s_b / n_b), 6)))
            out["ratio6"].append(float(round_half_away(
                np.float64((s_b * n_i) / (s_i * n_b)), 6)))
        except Exception:
            out["ok"].append(False)
            out["border_mean6"].append(0.0)
            out["ratio6"].append(0.0)
    return pa.table({
        "image_id": pa.array(out["image_id"], pa.string()),
        "ok": pa.array(out["ok"], pa.bool_()),
        "border_mean6": pa.array(out["border_mean6"], pa.float64()),
        "ratio6": pa.array(out["ratio6"], pa.float64())})




def _way_resample_table(sf: float) -> pa.Table:
    """Scalar reference for way_resample: python dict/bisect per-way
    loop with math.* haversine on the shared 3 dp segment grid —
    shares only EARTH_R_M, RESAMPLE_K and the rounding convention."""
    import bisect

    from .pipelines.osm import EARTH_R_M, RESAMPLE_K
    from .util import round_half_away

    d = datagen.scale_dir(sf)
    nt = pq.read_table(str(d / "osm_nodes.parquet"),
                       columns=["id", "lon", "lat"])
    coord = {i: (lo, la) for i, lo, la in
             zip(nt["id"].to_pylist(), nt["lon"].to_pylist(),
                 nt["lat"].to_pylist())}
    wt = pq.read_table(str(d / "osm_ways.parquet"), columns=["id", "refs"])
    d2r = math.pi / 180.0
    k = RESAMPLE_K
    out = {"way_id": [], "pt_idx": [], "lon6": [], "lat6": []}
    for wid, refs in zip(wt["id"].to_pylist(), wt["refs"].to_pylist()):
        if len(refs) < 2 or any(r not in coord for r in refs):
            continue
        pts = [coord[r] for r in refs]
        seg = []
        for (lo1, la1), (lo2, la2) in zip(pts, pts[1:]):
            p1, p2 = la1 * d2r, la2 * d2r
            sdp = math.sin((p2 - p1) / 2.0)
            sdl = math.sin((lo2 - lo1) * d2r / 2.0)
            aa = min(sdp * sdp + math.cos(p1) * math.cos(p2) * sdl * sdl,
                     1.0)
            seg.append(float(round_half_away(np.float64(
                2.0 * EARTH_R_M * math.asin(math.sqrt(aa))), 3)))
        cum = [0.0]
        for s in seg:
            cum.append(cum[-1] + s)
        L = cum[-1]
        if float(round_half_away(np.float64(L), 3)) <= 0.0:
            continue
        for j in range(k):
            t = j * L / (k - 1)
            i = bisect.bisect_right(cum, t) - 1
            i = min(max(i, 0), len(seg) - 1)
            f = (t - cum[i]) / seg[i] if seg[i] > 0.0 else 0.0
            out["way_id"].append(wid)
            out["pt_idx"].append(j)
            out["lon6"].append(float(round_half_away(np.float64(
                pts[i][0] + f * (pts[i + 1][0] - pts[i][0])), 6)))
            out["lat6"].append(float(round_half_away(np.float64(
                pts[i][1] + f * (pts[i + 1][1] - pts[i][1])), 6)))
    return pa.table({
        "way_id": pa.array(out["way_id"], pa.int64()),
        "pt_idx": pa.array(out["pt_idx"], pa.int64()),
        "lon6": pa.array(out["lon6"], pa.float64()),
        "lat6": pa.array(out["lat6"], pa.float64())})




def _image_orientation_table(sf: float) -> pa.Table:
    """Scalar reference for image_orientation: per-row decode, gradients
    via explicit python index loops, histogram via Counter — shares only
    codecs.decode and the _octant_bins boundary definition."""
    from collections import Counter

    from . import codecs
    from .pipelines.images import _octant_bins
    from .util import round_half_away

    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    out = {"image_id": [], "ok": [], "n_grad": [], "dom_oct": [],
           "dom_share6": []}
    for iid, f, b in zip(t["image_id"].to_pylist(), t["fmt"].to_pylist(),
                         t["bytes"].to_pylist()):
        out["image_id"].append(iid)
        try:
            px = codecs.decode(b, f)
            lum = px.astype(np.int64).sum(axis=2)
            h, w = lum.shape
            dxs, dys = [], []
            for i in range(1, h - 1):
                for j in range(1, w - 1):
                    dx = int(lum[i, j + 1] - lum[i, j - 1])
                    dy = int(lum[i + 1, j] - lum[i - 1, j])
                    if dx or dy:
                        dxs.append(dx)
                        dys.append(dy)
            c = Counter(_octant_bins(np.array(dxs, np.int64),
                                     np.array(dys, np.int64)).tolist()) \
                if dxs else Counter()
            n = sum(c.values())
            if n:
                best = max(c.values())
                dom = min(k for k, v in c.items() if v == best)
            else:
                dom = -1
            out["ok"].append(True)
            out["n_grad"].append(n)
            out["dom_oct"].append(dom)
            out["dom_share6"].append(float(round_half_away(
                np.float64(c[dom] / n), 6)) if n else 0.0)
        except Exception:
            out["ok"].append(False)
            out["n_grad"].append(0)
            out["dom_oct"].append(-1)
            out["dom_share6"].append(0.0)
    return pa.table({
        "image_id": pa.array(out["image_id"], pa.string()),
        "ok": pa.array(out["ok"], pa.bool_()),
        "n_grad": pa.array(out["n_grad"], pa.int64()),
        "dom_oct": pa.array(out["dom_oct"], pa.int64()),
        "dom_share6": pa.array(out["dom_share6"], pa.float64())})




def _raster_viewshed_table(sf: float, z: int = 10,
                           grid: int = 64) -> pa.Table:
    """Scalar reference for raster_viewshed: per-row scalar pixel math
    (morton decode + math.* slippy at z + log2(grid)), python-dict
    per-tile densification, then the SHARED all-integer line-of-sight
    definition (_los_blocked) applied one tile at a time."""
    from .pipelines.raster import VIEWSHED_OBS_H, _los_blocked

    t = _images_rows(sf, ["phash"])
    kbits = int(math.log2(grid))
    n_glob = 1 << (z + kbits)
    tiles: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    for ph in t["phash"].to_pylist():
        lon, lat = _scalar_morton_decode(ph)
        r = math.radians(lat)
        gx = math.floor((lon + 180.0) / 360.0 * n_glob)
        gy = math.floor((1.0 - math.log(math.tan(r) + 1.0 / math.cos(r))
                         / math.pi) / 2.0 * n_glob)
        gx = min(max(int(gx), 0), n_glob - 1)
        gy = min(max(int(gy), 0), n_glob - 1)
        tk = (gx >> kbits, gy >> kbits)
        pk = (gx & (grid - 1), gy & (grid - 1))
        tiles.setdefault(tk, {}).setdefault(pk, 0)
        tiles[tk][pk] += 1
    cx = cy = grid // 2
    rows = {"tile_x": [], "tile_y": [], "px": [], "py": [], "n": [],
            "visible": []}
    for (tx, ty) in sorted(tiles):
        pix = tiles[(tx, ty)]
        H = np.zeros((grid, grid), np.int64)
        for (x, y), cnt in pix.items():
            H[y, x] = cnt
        h_obs = int(H[cy, cx]) + VIEWSHED_OBS_H
        for (x, y) in sorted(pix):
            if x == cx and y == cy:
                vis = True
            else:
                vis = not bool(_los_blocked(
                    H, cx, cy, np.array([x], np.int64),
                    np.array([y], np.int64), h_obs)[0])
            rows["tile_x"].append(tx)
            rows["tile_y"].append(ty)
            rows["px"].append(x)
            rows["py"].append(y)
            rows["n"].append(pix[(x, y)])
            rows["visible"].append(vis)
    return pa.table({
        "tile_x": pa.array(rows["tile_x"], pa.int64()),
        "tile_y": pa.array(rows["tile_y"], pa.int64()),
        "px": pa.array(rows["px"], pa.int64()),
        "py": pa.array(rows["py"], pa.int64()),
        "n": pa.array(rows["n"], pa.int64()),
        "visible": pa.array(rows["visible"], pa.bool_())})




def _cluster_cohesion_table(sf: float, n_clusters: int = 8) -> pa.Table:
    """Whole-matrix reference for vectors.cluster_cohesion: one argmax
    + one einsum over the full table off the shared _lloyd_centroids
    quantizer; per-member cosines land on the same 1e-9 integer grid,
    summed per cluster with python ints."""
    from .util import round_half_away

    t = pq.read_table(_testdata(sf, "embeddings"),
                      columns=["vec_id", "embedding"])
    vid = t["vec_id"].to_numpy()
    emb = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
        .astype(np.float64)
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    cent = _lloyd_centroids(vid, emb, n_clusters, 3, 4096)
    cent_n = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    cl = np.argmax(emb @ cent.T, axis=1)
    cos = np.einsum("ij,ij->i", emb, cent_n[cl])
    q = round_half_away(cos * 1e9, 0).astype(np.int64)
    c6 = round_half_away(cos, 6)
    rows = {"cluster": [], "n": [], "mean_cos6": [], "min_cos6": []}
    for c in sorted(set(cl.tolist())):
        m = cl == c
        n = int(m.sum())
        qsum = sum(int(x) for x in q[m])
        rows["cluster"].append(c)
        rows["n"].append(n)
        rows["mean_cos6"].append(float(round_half_away(
            np.float64(qsum / (n * 1e9)), 6)))
        rows["min_cos6"].append(float(c6[m].min()))
    return pa.table({
        "cluster": pa.array(rows["cluster"], pa.int64()),
        "n": pa.array(rows["n"], pa.int64()),
        "mean_cos6": pa.array(rows["mean_cos6"], pa.float64()),
        "min_cos6": pa.array(rows["min_cos6"], pa.float64())})




def _user_survival_table(sf: float, churn_days: int = 1) -> pa.Table:
    """Scalar reference for relq.user_survival: python-dict per-user
    first/last, the same churn-horizon rule, and the ascending-day
    sequential KM fold — shares only the day/churn constants and the
    rounding convention."""
    from .util import round_half_away

    t = pq.read_table(_testdata(sf, "events"), columns=["user_id", "ts"])
    us_day = 86_400_000_000
    span: dict[int, list[int]] = {}
    for uid, ts in zip(t["user_id"].to_pylist(),
                       [int(x.value) for x in t["ts"]]):
        if uid in span:
            if ts < span[uid][0]:
                span[uid][0] = ts
            if ts > span[uid][1]:
                span[uid][1] = ts
        else:
            span[uid] = [ts, ts]
    horizon = max(v[1] for v in span.values())
    cut = horizon - churn_days * us_day
    hist: dict[int, list[int]] = {}
    for lo, hi in span.values():
        d = (hi - lo) // us_day
        h = hist.setdefault(d, [0, 0])
        h[0] += 1
        if hi < cut:
            h[1] += 1
    n_users = len(span)
    rows = {"day": [], "n_risk": [], "n_events": [], "km6": []}
    s = 1.0
    passed = 0
    for d in sorted(hist):
        tot, evt = hist[d]
        r = n_users - passed
        passed += tot
        if evt == 0:
            continue
        s = s * (1.0 - evt / r)
        rows["day"].append(d)
        rows["n_risk"].append(r)
        rows["n_events"].append(evt)
        rows["km6"].append(float(round_half_away(np.float64(s), 6)))
    return pa.table({
        "day": pa.array(rows["day"], pa.int64()),
        "n_risk": pa.array(rows["n_risk"], pa.int64()),
        "n_events": pa.array(rows["n_events"], pa.int64()),
        "km6": pa.array(rows["km6"], pa.float64())})


_BUILDERS = {
    "minhash_pairs": _minhash_pairs_table,
    "simhash_pairs": _simhash_pairs_table,
    "winnow_fp": _winnow_fp_table,
    "images_s2": _images_s2_table,
    "ngram_jaccard_pairs": _ngram_cutoff_pairs_table,
    "neardup_keep": _neardup_keep_table,
    "approx_distinct_users": _approx_distinct_table,
    "ann_ivf_topk": _ann_ivf_table,
    "embed_kmeans": _kmeans_table,
    "image_stats": _image_stats_table,
    "image_verify": _image_verify_table,
    "image_ahash": _image_ahash_table,
    "patch_extract": _patch_stats_table,
    "image_sig_dedup": _image_sig_dedup_table,
    "audio_features": _audio_features_table,
    "video_frames": _video_frames_table,
    "way_simplify": _simplify_ways_table,
    "way_pagerank": _way_pagerank_table,
    "relation_multipolygons": _relation_multipolygons_table,
    "images_geohash": _images_geohash_table,
    "geohash_rollup": _geohash_rollup_table,
    "images_hex": _images_hex_table,
    "ann_pq_topk": _ann_pq_table,
    "ann_recall": _ann_recall_table,
    "semdedup": _semdedup_table,
    "kcenter_sample": _kcenter_table,
    "cell_convex_hull": _cell_hull_table,
    "grid_dbscan": _grid_dbscan_table,
    "dsir_sample": _dsir_table,
    "embed_outliers": _embed_outliers_table,
    "src_js_divergence": _src_js_table,
    "embed_pca": _embed_pca_table,
    "neardup_eval": _neardup_eval_table,
    "kmv_overlap": _kmv_overlap_table,
    "image_entropy": _image_entropy_table,
    "way_kcore": _way_kcore_table,
    "way_mst": _way_mst_table,
    "hilbert_order": _hilbert_order_table,
    "detect_nms": _detect_nms_table,
    "way_frechet": _way_frechet_table,
    "way_conflate_pairs": _way_conflate_pairs_table,
    "way_rasterize": _way_rasterize_table,
    "mmr_select": _mmr_select_table,
    "way_pseudo_diameter": _way_pseudo_diameter_table,
    "cell_image_mosaic": _cell_image_mosaic_table,
    "image_transcode": _image_transcode_table,
    "embed_hard_negatives": _embed_hard_negatives_table,
    "events_markov_stationary": _events_markov_table,
    "doc_compression_ratio": _doc_compression_table,
    "image_sharpness": _image_sharpness_table,
    "image_palette": _image_palette_table,
    "image_ssim": _image_ssim_table,
    "image_border_contrast": _image_border_table,
    "way_resample": _way_resample_table,
    "image_orientation": _image_orientation_table,
    "raster_viewshed": _raster_viewshed_table,
    "cluster_cohesion": _cluster_cohesion_table,
    "user_survival": _user_survival_table,
}


def ensure_expected(sf: float) -> dict[str, str]:
    """Build (once per sf, cached) every expected parquet; return paths."""
    d: Path = datagen.scale_dir(sf) / "expected"
    d.mkdir(parents=True, exist_ok=True)
    out: dict[str, str] = {}
    for name, builder in _BUILDERS.items():
        path = d / f"{name}_v{_V}.parquet"
        if not path.exists():
            tmp = path.with_suffix(".tmp")
            pq.write_table(builder(sf), tmp)
            os.replace(tmp, path)
        out[name] = str(path)
    return out


def _image_flip_asym_table(sf: float) -> pa.Table:
    """Scalar reference for image_flip_asym: per-row decode, the
    mirror comparison done COLUMN BY COLUMN (j vs w-1-j) accumulating
    python ints — independent of the engine's whole-array slice."""
    from . import codecs
    from .util import round_half_away

    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    out = {"image_id": [], "ok": [], "n_px": [], "asym6": [], "max_d": []}
    for iid, f, b in zip(t["image_id"].to_pylist(), t["fmt"].to_pylist(),
                         t["bytes"].to_pylist()):
        out["image_id"].append(iid)
        try:
            lum = codecs.decode(b, f).astype(np.int64).sum(axis=2)
            h, w = lum.shape
            s = 0
            mx = 0
            for j in range(w):
                col = np.abs(lum[:, j] - lum[:, w - 1 - j])
                s += int(col.sum())
                mx = max(mx, int(col.max()))
            n = h * w
            out["ok"].append(True)
            out["n_px"].append(n)
            out["asym6"].append(float(round_half_away(np.float64(s / n), 6)))
            out["max_d"].append(mx)
        except Exception:
            out["ok"].append(False)
            out["n_px"].append(0)
            out["asym6"].append(0.0)
            out["max_d"].append(0)
    return pa.table({
        "image_id": pa.array(out["image_id"], pa.string()),
        "ok": pa.array(out["ok"], pa.bool_()),
        "n_px": pa.array(out["n_px"], pa.int64()),
        "asym6": pa.array(out["asym6"], pa.float64()),
        "max_d": pa.array(out["max_d"], pa.int64())})


def _image_blob_count_table(sf: float) -> pa.Table:
    """Scalar reference for image_blob_count: the same strict
    integer-cross-multiply threshold, but components labeled by BFS
    FLOOD FILL from each unvisited foreground pixel — an independent
    algorithm from the engine's union-find over the edge list."""
    from collections import deque

    from . import codecs

    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    out = {"image_id": [], "ok": [], "n_px": [], "n_fg": [],
           "n_blobs": [], "max_blob": []}
    for iid, f, b in zip(t["image_id"].to_pylist(), t["fmt"].to_pylist(),
                         t["bytes"].to_pylist()):
        out["image_id"].append(iid)
        try:
            lum = codecs.decode(b, f).astype(np.int64).sum(axis=2)
            h, w = lum.shape
            n = h * w
            s = int(lum.sum())
            mask = (lum * n > s)
            seen = np.zeros((h, w), bool)
            blobs = []
            for y in range(h):
                for x in range(w):
                    if not mask[y, x] or seen[y, x]:
                        continue
                    sz = 0
                    dq = deque([(y, x)])
                    seen[y, x] = True
                    while dq:
                        cy, cx = dq.popleft()
                        sz += 1
                        for ny, nx in ((cy - 1, cx), (cy + 1, cx),
                                       (cy, cx - 1), (cy, cx + 1)):
                            if 0 <= ny < h and 0 <= nx < w \
                                    and mask[ny, nx] and not seen[ny, nx]:
                                seen[ny, nx] = True
                                dq.append((ny, nx))
                    blobs.append(sz)
            out["ok"].append(True)
            out["n_px"].append(n)
            out["n_fg"].append(int(mask.sum()))
            out["n_blobs"].append(len(blobs))
            out["max_blob"].append(max(blobs) if blobs else 0)
        except Exception:
            out["ok"].append(False)
            out["n_px"].append(0)
            out["n_fg"].append(0)
            out["n_blobs"].append(0)
            out["max_blob"].append(0)
    return pa.table({
        "image_id": pa.array(out["image_id"], pa.string()),
        "ok": pa.array(out["ok"], pa.bool_()),
        "n_px": pa.array(out["n_px"], pa.int64()),
        "n_fg": pa.array(out["n_fg"], pa.int64()),
        "n_blobs": pa.array(out["n_blobs"], pa.int64()),
        "max_blob": pa.array(out["max_blob"], pa.int64())})


_BUILDERS["image_flip_asym"] = _image_flip_asym_table
_BUILDERS["image_blob_count"] = _image_blob_count_table


def _image_crop_retention_table(sf: float) -> pa.Table:
    """Scalar reference for image_crop_retention: the complement sum —
    total minus the four margin strips accumulated ROW BY ROW with
    python ints — an independent construction from the engine's single
    crop-slice sum."""
    from . import codecs
    from .util import round_half_away

    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    out = {"image_id": [], "ok": [], "crop_side": [], "ret6": []}
    for iid, f, b in zip(t["image_id"].to_pylist(), t["fmt"].to_pylist(),
                         t["bytes"].to_pylist()):
        out["image_id"].append(iid)
        try:
            lum = codecs.decode(b, f).astype(np.int64).sum(axis=2)
            h, w = lum.shape
            s = min(h, w)
            y0 = (h - s) // 2
            x0 = (w - s) // 2
            tot = 0
            margin = 0
            for y in range(h):
                row = lum[y]
                tot += int(row.sum())
                if y < y0 or y >= y0 + s:
                    margin += int(row.sum())
                else:
                    margin += int(row[:x0].sum()) + int(row[x0 + s:].sum())
            inside = tot - margin
            r = inside / tot if tot else 1.0
            out["ok"].append(True)
            out["crop_side"].append(s)
            out["ret6"].append(float(round_half_away(np.float64(r), 6)))
        except Exception:
            out["ok"].append(False)
            out["crop_side"].append(0)
            out["ret6"].append(0.0)
    return pa.table({
        "image_id": pa.array(out["image_id"], pa.string()),
        "ok": pa.array(out["ok"], pa.bool_()),
        "crop_side": pa.array(out["crop_side"], pa.int64()),
        "ret6": pa.array(out["ret6"], pa.float64())})


_BUILDERS["image_crop_retention"] = _image_crop_retention_table


def _cell_luma_morans_table(sf: float, res: int = 7) -> pa.Table:
    """Scalar reference for cell_luma_morans: per-row decode + scalar
    slippy cell into a python dict of integer (lum, px) totals; rook
    neighbours via DICT LOOKUP (vs the engine's sorted searchsorted);
    all cross-cell folds through math.fsum (exactly rounded, so fold
    order cannot differ between the plans)."""
    from . import codecs
    from .util import round_half_away

    t = _images_rows(sf, ["phash", "fmt", "bytes"])
    n = 1 << res
    acc: dict[tuple[int, int], list] = {}
    for ph, f, b in zip(t["phash"].to_pylist(), t["fmt"].to_pylist(),
                        t["bytes"].to_pylist()):
        lon, lat = _scalar_morton_decode(ph)
        r = math.radians(lat)
        x = math.floor((lon + 180.0) / 360.0 * n)
        y = math.floor((1.0 - math.log(math.tan(r) + 1.0 / math.cos(r))
                        / math.pi) / 2.0 * n)
        x = min(max(int(x), 0), n - 1)
        y = min(max(int(y), 0), n - 1)
        px = codecs.decode(b, f).astype(np.int64)
        a = acc.setdefault((x, y), [0, 0])
        a[0] += int(px.sum())
        a[1] += px.shape[0] * px.shape[1]
    cells = sorted(acc)
    q = len(cells)
    v = {c: acc[c][0] / acc[c][1] for c in cells}
    mean = math.fsum(v[c] for c in cells) / q if q else 0.0
    z = {c: v[c] - mean for c in cells}
    prods = []
    w = 0
    for (x, y) in cells:
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = (x + dx, y + dy)
            if nb in z:
                prods.append(z[(x, y)] * z[nb])
                w += 1
    num = math.fsum(prods)
    den = math.fsum(z[c] * z[c] for c in cells)
    i_val = num * q / w / den if w > 0 and den > 0.0 else 0.0
    return pa.table({
        "n_cells": pa.array([q], pa.int64()),
        "w_pairs": pa.array([w], pa.int64()),
        "morans_i6": pa.array(
            [float(round_half_away(np.float64(i_val), 6))])})


_BUILDERS["cell_luma_morans"] = _cell_luma_morans_table


def _image_rle_ratio_table(sf: float) -> pa.Table:
    """Scalar reference for image_rle_ratio: same 8-level quantization
    (summed-channel luma // 96) but runs counted ROW BY ROW with a
    python scan — an independent construction from the engine's single
    whole-array column diff."""
    from . import codecs
    from .util import round_half_away

    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    out = {"image_id": [], "ok": [], "n_px": [], "n_runs": [], "rle6": []}
    for iid, f, b in zip(t["image_id"].to_pylist(), t["fmt"].to_pylist(),
                         t["bytes"].to_pylist()):
        out["image_id"].append(iid)
        try:
            lum = codecs.decode(b, f).astype(np.int64).sum(axis=2)
            q = lum // 96
            h, w = q.shape
            runs = 0
            for y in range(h):
                row = q[y].tolist()
                runs += 1
                for j in range(1, w):
                    if row[j] != row[j - 1]:
                        runs += 1
            n = h * w
            out["ok"].append(True)
            out["n_px"].append(n)
            out["n_runs"].append(runs)
            out["rle6"].append(float(round_half_away(np.float64(runs / n),
                                                     6)))
        except Exception:
            out["ok"].append(False)
            out["n_px"].append(0)
            out["n_runs"].append(0)
            out["rle6"].append(0.0)
    return pa.table({
        "image_id": pa.array(out["image_id"], pa.string()),
        "ok": pa.array(out["ok"], pa.bool_()),
        "n_px": pa.array(out["n_px"], pa.int64()),
        "n_runs": pa.array(out["n_runs"], pa.int64()),
        "rle6": pa.array(out["rle6"], pa.float64())})


_BUILDERS["image_rle_ratio"] = _image_rle_ratio_table


def _image_exposure_clip_table(sf: float) -> pa.Table:
    """Scalar reference for image_exposure_clip: row-by-row python
    scans counting exact-0 / exact-765 luma rows — independent of the
    engine's whole-array boolean sums."""
    from . import codecs
    from .util import round_half_away

    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    out = {"image_id": [], "ok": [], "n_px": [], "n_black": [],
           "n_white": [], "black6": [], "white6": []}
    for iid, f, b in zip(t["image_id"].to_pylist(), t["fmt"].to_pylist(),
                         t["bytes"].to_pylist()):
        out["image_id"].append(iid)
        try:
            lum = codecs.decode(b, f).astype(np.int64).sum(axis=2)
            h, w = lum.shape
            lo = hi = 0
            for y in range(h):
                row = lum[y].tolist()
                lo += sum(1 for v in row if v == 0)
                hi += sum(1 for v in row if v == 765)
            n = h * w
            out["ok"].append(True)
            out["n_px"].append(n)
            out["n_black"].append(lo)
            out["n_white"].append(hi)
            out["black6"].append(float(round_half_away(np.float64(lo / n),
                                                       6)))
            out["white6"].append(float(round_half_away(np.float64(hi / n),
                                                       6)))
        except Exception:
            out["ok"].append(False)
            for k in ("n_px", "n_black", "n_white"):
                out[k].append(0)
            out["black6"].append(0.0)
            out["white6"].append(0.0)
    return pa.table({
        "image_id": pa.array(out["image_id"], pa.string()),
        "ok": pa.array(out["ok"], pa.bool_()),
        "n_px": pa.array(out["n_px"], pa.int64()),
        "n_black": pa.array(out["n_black"], pa.int64()),
        "n_white": pa.array(out["n_white"], pa.int64()),
        "black6": pa.array(out["black6"], pa.float64()),
        "white6": pa.array(out["white6"], pa.float64())})


def _image_channel_balance_table(sf: float) -> pa.Table:
    """Scalar reference for image_channel_balance: per-channel sums
    accumulated ROW BY ROW in python ints; deviation argmax re-derived
    with an explicit comparison chain (R then G then B)."""
    from . import codecs
    from .util import round_half_away

    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    out = {"image_id": [], "ok": [], "sum_r": [], "sum_g": [],
           "sum_b": [], "share_r6": [], "share_g6": [], "share_b6": [],
           "skew_channel": []}
    for iid, f, b in zip(t["image_id"].to_pylist(), t["fmt"].to_pylist(),
                         t["bytes"].to_pylist()):
        out["image_id"].append(iid)
        try:
            px = codecs.decode(b, f).astype(np.int64)
            s = [0, 0, 0]
            for y in range(px.shape[0]):
                for c in range(3):
                    s[c] += int(px[y, :, c].sum())
            tot = sum(s)
            sh = [x / tot if tot else 0.0 for x in s]
            dev = [abs(x - 1.0 / 3.0) for x in sh]
            best, name = dev[0], "r"
            if dev[1] > best:
                best, name = dev[1], "g"
            if dev[2] > best:
                best, name = dev[2], "b"
            out["ok"].append(True)
            out["sum_r"].append(s[0])
            out["sum_g"].append(s[1])
            out["sum_b"].append(s[2])
            out["share_r6"].append(float(round_half_away(
                np.float64(sh[0]), 6)))
            out["share_g6"].append(float(round_half_away(
                np.float64(sh[1]), 6)))
            out["share_b6"].append(float(round_half_away(
                np.float64(sh[2]), 6)))
            out["skew_channel"].append(name)
        except Exception:
            out["ok"].append(False)
            for k in ("sum_r", "sum_g", "sum_b"):
                out[k].append(0)
            for k in ("share_r6", "share_g6", "share_b6"):
                out[k].append(0.0)
            out["skew_channel"].append("")
    return pa.table({
        "image_id": pa.array(out["image_id"], pa.string()),
        "ok": pa.array(out["ok"], pa.bool_()),
        "sum_r": pa.array(out["sum_r"], pa.int64()),
        "sum_g": pa.array(out["sum_g"], pa.int64()),
        "sum_b": pa.array(out["sum_b"], pa.int64()),
        "share_r6": pa.array(out["share_r6"], pa.float64()),
        "share_g6": pa.array(out["share_g6"], pa.float64()),
        "share_b6": pa.array(out["share_b6"], pa.float64()),
        "skew_channel": pa.array(out["skew_channel"], pa.string())})


def _image_noise_mad_table(sf: float) -> pa.Table:
    """Scalar reference for image_noise_mad: the 4-neighbour Laplacian
    evaluated PIXEL BY PIXEL in python, absolute values collected into
    a list, lower median by explicit index — independent of the
    engine's sliced-array construction and in-place sort."""
    from . import codecs

    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    out = {"image_id": [], "ok": [], "n_interior": [], "mad_lap": []}
    for iid, f, b in zip(t["image_id"].to_pylist(), t["fmt"].to_pylist(),
                         t["bytes"].to_pylist()):
        out["image_id"].append(iid)
        try:
            lum = codecs.decode(b, f).astype(np.int64).sum(axis=2)
            h, w = lum.shape
            vals = []
            for y in range(1, h - 1):
                row = lum[y]
                up, dn = lum[y - 1], lum[y + 1]
                for x in range(1, w - 1):
                    lap = (4 * int(row[x]) - int(up[x]) - int(dn[x])
                           - int(row[x - 1]) - int(row[x + 1]))
                    vals.append(abs(lap))
            vals.sort()
            n = len(vals)
            out["ok"].append(True)
            out["n_interior"].append(n)
            out["mad_lap"].append(vals[(n - 1) // 2] if n else 0)
        except Exception:
            out["ok"].append(False)
            out["n_interior"].append(0)
            out["mad_lap"].append(0)
    return pa.table({
        "image_id": pa.array(out["image_id"], pa.string()),
        "ok": pa.array(out["ok"], pa.bool_()),
        "n_interior": pa.array(out["n_interior"], pa.int64()),
        "mad_lap": pa.array(out["mad_lap"], pa.int64())})


_BUILDERS["image_exposure_clip"] = _image_exposure_clip_table
_BUILDERS["image_channel_balance"] = _image_channel_balance_table
_BUILDERS["image_noise_mad"] = _image_noise_mad_table


def _image_luma_percentiles_table(sf: float) -> pa.Table:
    """Scalar reference for image_luma_percentiles: order statistics
    selected from a 766-bin COUNTING histogram (no sort) — independent
    of the engine's in-place sort + index."""
    from . import codecs

    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    out = {"image_id": [], "ok": [], "p5": [], "p50": [], "p95": [],
           "spread": []}
    for iid, f, b in zip(t["image_id"].to_pylist(), t["fmt"].to_pylist(),
                         t["bytes"].to_pylist()):
        out["image_id"].append(iid)
        try:
            lum = codecs.decode(b, f).astype(np.int64).sum(axis=2)
            h, w = lum.shape
            n = h * w
            hist = [0] * 766
            for y in range(h):
                for v in lum[y].tolist():
                    hist[v] += 1
            vals = []
            for q in (5, 50, 95):
                target = (n - 1) * q // 100
                seen = 0
                for v in range(766):
                    seen += hist[v]
                    if seen > target:
                        vals.append(v)
                        break
            out["ok"].append(True)
            out["p5"].append(vals[0])
            out["p50"].append(vals[1])
            out["p95"].append(vals[2])
            out["spread"].append(vals[2] - vals[0])
        except Exception:
            out["ok"].append(False)
            for k in ("p5", "p50", "p95", "spread"):
                out[k].append(0)
    return pa.table({
        "image_id": pa.array(out["image_id"], pa.string()),
        "ok": pa.array(out["ok"], pa.bool_()),
        "p5": pa.array(out["p5"], pa.int64()),
        "p50": pa.array(out["p50"], pa.int64()),
        "p95": pa.array(out["p95"], pa.int64()),
        "spread": pa.array(out["spread"], pa.int64())})


def _image_quadrant_luma_table(sf: float) -> pa.Table:
    """Scalar reference for image_quadrant_luma: quadrant sums
    accumulated pixel ROW BY ROW with explicit per-row slicing, argmax
    re-derived with a comparison chain."""
    from . import codecs
    from .util import round_half_away

    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    names = ("tl", "tr", "bl", "br")
    out = {"image_id": [], "ok": [], "sum_tl": [], "sum_tr": [],
           "sum_bl": [], "sum_br": [], "bright_quad": [],
           "imbalance6": []}
    for iid, f, b in zip(t["image_id"].to_pylist(), t["fmt"].to_pylist(),
                         t["bytes"].to_pylist()):
        out["image_id"].append(iid)
        try:
            lum = codecs.decode(b, f).astype(np.int64).sum(axis=2)
            h, w = lum.shape
            hh, hw = h // 2, w // 2
            qs = [0, 0, 0, 0]
            for y in range(h):
                row = lum[y]
                top = y < hh
                bot = y >= h - hh
                if top:
                    qs[0] += int(row[:hw].sum())
                    qs[1] += int(row[w - hw:].sum())
                if bot:
                    qs[2] += int(row[:hw].sum())
                    qs[3] += int(row[w - hw:].sum())
            mx = max(qs)
            mn = min(qs)
            best = 0
            for i in range(1, 4):
                if qs[i] > qs[best]:
                    best = i
            out["ok"].append(True)
            out["sum_tl"].append(qs[0])
            out["sum_tr"].append(qs[1])
            out["sum_bl"].append(qs[2])
            out["sum_br"].append(qs[3])
            out["bright_quad"].append(names[best])
            out["imbalance6"].append(float(round_half_away(
                np.float64(mx / mn if mn else 0.0), 6)))
        except Exception:
            out["ok"].append(False)
            for k in ("sum_tl", "sum_tr", "sum_bl", "sum_br"):
                out[k].append(0)
            out["bright_quad"].append("")
            out["imbalance6"].append(0.0)
    return pa.table({
        "image_id": pa.array(out["image_id"], pa.string()),
        "ok": pa.array(out["ok"], pa.bool_()),
        "sum_tl": pa.array(out["sum_tl"], pa.int64()),
        "sum_tr": pa.array(out["sum_tr"], pa.int64()),
        "sum_bl": pa.array(out["sum_bl"], pa.int64()),
        "sum_br": pa.array(out["sum_br"], pa.int64()),
        "bright_quad": pa.array(out["bright_quad"], pa.string()),
        "imbalance6": pa.array(out["imbalance6"], pa.float64())})


_BUILDERS["image_luma_percentiles"] = _image_luma_percentiles_table
_BUILDERS["image_quadrant_luma"] = _image_quadrant_luma_table


def _audio_silence_table(sf: float, sample_rate: int = 16_000,
                         win_ms: int = 20,
                         threshold: float = 0.2) -> pa.Table:
    """Scalar reference for audio_silence_ratio: per-clip stub decode +
    the shared window-energy primitive, silent windows counted in a
    python loop."""
    from .pipelines.media import _decode_audio_stub, _window_energies
    from .util import round_half_away

    t = _images_rows(sf, ["image_id", "bytes"])
    win = sample_rate * win_ms // 1000
    ids, nw, ns, ratio = [], [], [], []
    for iid, b in zip(t["image_id"].to_pylist(), t["bytes"].to_pylist()):
        e = _window_energies(_decode_audio_stub(b, sample_rate), win)
        k = len(e)
        s = sum(1 for x in e.tolist() if x < threshold)
        ids.append(iid)
        nw.append(k)
        ns.append(s)
        ratio.append(float(round_half_away(
            np.float64(s / k if k else 0.0), 6)))
    return pa.table({"media_id": pa.array(ids, pa.string()),
                     "n_windows": pa.array(nw, pa.int64()),
                     "n_silent": pa.array(ns, pa.int64()),
                     "silence6": pa.array(ratio, pa.float64())})


def _video_shot_cuts_table(sf: float, k: int = 8,
                           threshold: float = 0.5) -> pa.Table:
    """Scalar reference for video_shot_cuts: shared frame-signature
    primitive, adjacent distances in a python loop."""
    from .pipelines.media import _decode_frame_stub, _frame_signature
    from .util import round_half_away

    t = _images_rows(sf, ["image_id", "bytes"])
    ids, cuts, mx = [], [], []
    for iid, b in zip(t["image_id"].to_pylist(), t["bytes"].to_pylist()):
        sigs = [_frame_signature(_decode_frame_stub(b, f))
                for f in range(k)]
        d = [float(np.abs(sigs[i + 1] - sigs[i]).sum())
             for i in range(k - 1)]
        ids.append(iid)
        cuts.append(sum(1 for x in d if x > threshold))
        mx.append(float(round_half_away(
            np.float64(max(d) if d else 0.0), 6)))
    return pa.table({"media_id": pa.array(ids, pa.string()),
                     "n_cuts": pa.array(cuts, pa.int64()),
                     "max_d6": pa.array(mx, pa.float64())})


_BUILDERS["audio_silence_ratio"] = _audio_silence_table
_BUILDERS["video_shot_cuts"] = _video_shot_cuts_table


def _image_colorfulness_table(sf: float) -> pa.Table:
    """Scalar reference for image_colorfulness: per-pixel max/min via
    explicit channel comparisons accumulated row by row in python."""
    from . import codecs
    from .util import round_half_away

    t = _images_rows(sf, ["image_id", "fmt", "bytes"])
    out = {"image_id": [], "ok": [], "n_px": [], "spread_sum": [],
           "mean_spread6": []}
    for iid, f, b in zip(t["image_id"].to_pylist(), t["fmt"].to_pylist(),
                         t["bytes"].to_pylist()):
        out["image_id"].append(iid)
        try:
            px = codecs.decode(b, f).astype(np.int64)
            h, w, _ = px.shape
            s = 0
            for y in range(h):
                r, g, bl = (px[y, :, 0].tolist(), px[y, :, 1].tolist(),
                            px[y, :, 2].tolist())
                for rv, gv, bv in zip(r, g, bl):
                    mx = rv if rv >= gv else gv
                    mx = mx if mx >= bv else bv
                    mn = rv if rv <= gv else gv
                    mn = mn if mn <= bv else bv
                    s += mx - mn
            n = h * w
            out["ok"].append(True)
            out["n_px"].append(n)
            out["spread_sum"].append(s)
            out["mean_spread6"].append(float(round_half_away(
                np.float64(s / n), 6)))
        except Exception:
            out["ok"].append(False)
            out["n_px"].append(0)
            out["spread_sum"].append(0)
            out["mean_spread6"].append(0.0)
    return pa.table({
        "image_id": pa.array(out["image_id"], pa.string()),
        "ok": pa.array(out["ok"], pa.bool_()),
        "n_px": pa.array(out["n_px"], pa.int64()),
        "spread_sum": pa.array(out["spread_sum"], pa.int64()),
        "mean_spread6": pa.array(out["mean_spread6"], pa.float64())})


_BUILDERS["image_colorfulness"] = _image_colorfulness_table
