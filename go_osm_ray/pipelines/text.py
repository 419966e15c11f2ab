"""Text-analysis and deduplication pipelines over the ``documents`` table.

The training-data-pipeline operator family (round brief): exact dedup,
MinHash-LSH / SimHash / n-gram-Jaccard near-dup, embedding near-dup,
language ID, quality scoring, token counting, fingerprinting.

Physical plan (round 2, the distributed form): every near-dup pipeline
is  sketch stage (actor pool / map_batches, batch-vectorized)
  -> hash-partitioned candidate exchange (``groupby("part")`` so each
     bucket key lands wholly inside one of NUM_PARTS partitions and the
     vectorized pair kernel runs once PER PARTITION, never per bucket
     and never in a single driver-sized task)
  -> verify against ONLY the candidate rows (semi-join the corpus down
     to candidate ids, broadcast that small side)
  -> one small groupby over verified pairs for cross-partition dedup.
Nothing broadcasts or single-tasks anything that grows with the corpus.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

# Hash partitions for the candidate-pair exchanges. Bounds the rows per
# pair-kernel task to ~total/NUM_PARTS; raise with cluster size (the
# exchange is a real groupby shuffle, so partitions spread over nodes).
NUM_PARTS = 32

# Hot-bucket cap for LSH pair generation (minhash/simhash/embed): an LSH
# bucket bigger than this — a boilerplate / exact-duplicate class on a web
# corpus — emits a linear id-chain instead of the O(c^2) clique, so a
# corpus with millions of identical docs cannot make candidate generation
# quadratic (VERDICT r2 #2). ngram_jaccard_pairs uses its max_df cutoff
# for the same skew class. 4096 keeps full recall on merely-dense corpora
# (a capped bucket still costs only ~8M pair rows) while bounding the
# true duplicate-class blowup.
MAX_BUCKET = 4096

from ..relational import hash_part as _part_of  # noqa: E402 (shared mixer)


def _by_partition(rows: ray.data.Dataset, kernel) -> ray.data.Dataset:
    """The candidate exchange: shuffle by the bounded ``part`` column and
    run the partition-local vectorized ``kernel`` once per partition."""
    return rows.groupby("part").map_groups(kernel, batch_format="pyarrow")


def _pair_merge(pairs: ray.data.Dataset, aggs: list[tuple[str, str]],
                num_parts: int = NUM_PARTS) -> ray.data.Dataset:
    """Cross-partition (a, b) pair dedup/merge: hash-partition by the
    packed pair key, then ONE Acero (arrow C++) hash-aggregation per
    partition. Ray's per-key ``groupby(["a","b"]).aggregate`` pays
    per-group overhead — measured ~40-60 s on the ~10^6 pre-dedup pair
    rows the sf0.1 near-dup suites emit; this path is ~2 s for the same
    exchange. ``aggs`` = [(col, arrow_fn)] merged per pair; empty aggs =
    pure dedup."""
    def add_part(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy()
        b = t["b"].combine_chunks().to_numpy()
        _check_id31(a, b)
        key = (a.astype(np.uint64) << np.uint64(31)) + b.astype(np.uint64)
        return t.append_column("part", pa.array(_part_of(key, num_parts)))

    cols = [c for c, _ in aggs]

    def merge(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["part"])
        if not aggs:
            a = t["a"].combine_chunks().to_numpy()
            b = t["b"].combine_chunks().to_numpy()
            a, b = _dedup_pairs(a, b)
            return pa.table({"a": pa.array(a), "b": pa.array(b)},
                            schema=_PAIR_SCHEMA)
        g = t.group_by(["a", "b"]).aggregate(aggs)
        out = {"a": g["a"], "b": g["b"]}
        for c, fn in aggs:
            out[c] = g[f"{c}_{fn}"]
        return pa.table(out)

    return pairs.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(merge, batch_format="pyarrow")


# Deterministic per-language stopword lists for the langid heuristic.
# Scoring = |distinct tokens ∩ stoplist| per language; prediction = the
# alphabetically-first language among the max scorers, 'und' if all zero.
STOPLISTS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "en": ["the", "a", "and", "of", "to", "is", "in", "that"],
    "es": ["el", "la", "los", "que", "y", "de", "un", "es"],
    "fr": ["le", "la", "les", "et", "de", "un", "est", "que"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1"],
}
LANGS = sorted(STOPLISTS)

_TOKEN_RE = r"[A-Za-z]+|[0-9]+|\S"  # BPE-ish pre-tokenizer regex


def _split_tokens(texts: pa.Array) -> tuple[np.ndarray, pa.Array]:
    """(offsets, flat lowercase tokens) via arrow split (vectorized)."""
    lowered = pc.utf8_lower(texts)
    lists = pc.split_pattern(lowered, " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offsets = np.asarray(lists.offsets, np.int64)
    return offsets - offsets[0], lists.flatten()


def _seg_count(mask: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    c = np.zeros(len(mask) + 1, np.int64)
    np.cumsum(mask, out=c[1:])
    return c[offsets[1:]] - c[offsets[:-1]]


# ------------------------------------------------------------- fingerprints

def _md5_col(texts: list[str]) -> list[str]:
    return [hashlib.md5(t.encode()).hexdigest() for t in texts]


def add_fingerprint(batch: pa.Table, text_col: str = "text",
                    out: str = "fp") -> pa.Table:
    """md5 of whitespace-normalized lowercase text (content fingerprint)."""
    norm = pc.replace_substring_regex(pc.utf8_lower(batch[text_col]), r"\s+", " ")
    return batch.append_column(out, pa.array(_md5_col(norm.to_pylist()), pa.string()))


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """One survivor (min doc_id) per distinct normalized text; shuffle key =
    md5 fingerprint. Physical plan: per-block Acero partials (one row per
    fingerprint per block — the combiner) -> bounded hash-partition
    exchange on the fingerprint -> one Acero merge per partition (Ray's
    per-key groupby paid per-group overhead on the ~n_docs group space)."""
    from ..relational import _col_hash, hash_part

    def partial(t: pa.Table) -> pa.Table:
        t = add_fingerprint(t)
        g = pa.table({"fp": t["fp"], "doc_id": t["doc_id"]}) \
            .group_by("fp").aggregate([("doc_id", "min"), ("doc_id", "count")])
        g = g.rename_columns(["fp", "pk", "pn"])
        return g.append_column(
            "part", pa.array(hash_part(_col_hash(g["fp"]), 32)))

    def merge(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by("fp").aggregate(
            [("pk", "min"), ("pn", "sum")])
        return pa.table({"fp": g["fp"],
                         "keeper_id": g["pk_min"],
                         "group_n": pc.cast(g["pn_sum"], pa.int64())})

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("part").map_groups(merge, batch_format="pyarrow")


# -------------------------------------------------- shingles (vectorized)

_SH_MULT = np.uint64(1000003)
_PAD_HASH = np.uint64(zlib.crc32(b"_pad"))


def _rolling_hash(th: np.ndarray, k: int) -> np.ndarray:
    """Flat k-window polynomial combine of per-token hashes."""
    m = len(th) - k + 1
    if m <= 0:
        return np.empty(0, np.uint64)
    with np.errstate(over="ignore"):
        h = th[:m].copy()
        for j in range(1, k):
            h = h * _SH_MULT + th[j:j + m]
    return h


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Per-doc distinct k-token shingle hashes (scalar reference form;
    the batch path below is bit-identical)."""
    toks = text.lower().split()
    if len(toks) < k:
        toks = toks + ["_pad"] * (k - len(toks))
    th = np.fromiter((zlib.crc32(t.encode()) for t in toks), np.uint64, len(toks))
    return np.unique(_rolling_hash(th, k))


def _tokens_flat(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """python-``str.split()``-equivalent tokenization over a batch:
    (per-doc token counts, flat lowercase token ndarray[object])."""
    lists = pc.utf8_split_whitespace(pc.utf8_lower(texts))
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offsets = np.asarray(lists.offsets, np.int64)
    offsets = offsets - offsets[0]
    flat = lists.flatten()
    # arrow keeps ''-artifacts at leading/trailing whitespace; split() doesn't
    nonempty = np.asarray(pc.utf8_length(flat)).astype(bool)
    counts = _seg_count(nonempty, offsets)
    toks = np.asarray(flat.filter(pa.array(nonempty)).to_pylist(), dtype=object)
    return counts, toks


def _crc32_map(toks: np.ndarray) -> np.ndarray:
    """crc32 per token — each UNIQUE token hashed once (factorize is the
    C-speed dedup), then broadcast back by code."""
    if not len(toks):
        return np.empty(0, np.uint64)
    codes, uniq = pd.factorize(toks)
    uh = np.fromiter((zlib.crc32(t.encode()) for t in uniq), np.uint64, len(uniq))
    return uh[codes]


def _shingle_hashes_batch(texts: pa.Array, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Batch form of ``_shingle_hashes``: (doc_idx, shingle_hash) flat
    arrays, per-doc DISTINCT, doc_idx ascending. One rolling-hash pass
    over the batch's concatenated token hashes (the per-doc python loop
    was the round-1 near-dup hot spot)."""
    counts, toks = _tokens_flat(texts)
    th = _crc32_map(toks)
    short = counts < k
    if short.any():
        # pad-extend short docs so every doc yields >= 1 shingle (parity
        # with the scalar path's ["_pad"] * (k - len) extension)
        new_counts = np.maximum(counts, k)
        new_offs = np.r_[0, np.cumsum(new_counts)]
        offs = np.r_[0, np.cumsum(counts)]
        out = np.full(new_offs[-1], _PAD_HASH, np.uint64)
        pos = (np.arange(offs[-1]) - np.repeat(offs[:-1], counts)
               + np.repeat(new_offs[:-1], counts))
        out[pos] = th
        th, counts = out, new_counts
    h = _rolling_hash(th, k)
    doc_of = np.repeat(np.arange(len(counts)), counts)
    m = len(h)
    valid = doc_of[:m] == doc_of[k - 1:]  # window fully inside one doc
    d, h = doc_of[:m][valid], h[valid]
    if not len(d):
        return d, h
    order = np.lexsort((h, d))
    d, h = d[order], h[order]
    keep = np.r_[True, (d[1:] != d[:-1]) | (h[1:] != h[:-1])]
    return d[keep], h[keep]


# ------------------------------------------------------------- minhash LSH

_MH_A: np.ndarray | None = None
_MH_B: np.ndarray | None = None
_MH_PRIME = np.uint64((1 << 61) - 1)


def _mh_params(num: int) -> tuple[np.ndarray, np.ndarray]:
    global _MH_A, _MH_B
    if _MH_A is None or len(_MH_A) != num:
        rs = np.random.RandomState(1234)  # fixed seed: deterministic everywhere
        _MH_A = rs.randint(1, 1 << 61, size=num).astype(np.uint64)
        _MH_B = rs.randint(0, 1 << 61, size=num).astype(np.uint64)
    return _MH_A, _MH_B


def minhash_signature(text: str, num_hashes: int = 64) -> np.ndarray:
    sh = _shingle_hashes(text)
    a, b = _mh_params(num_hashes)
    with np.errstate(over="ignore"):
        vals = (sh[:, None] * a[None, :] + b[None, :]) % _MH_PRIME
    return vals.min(axis=0)


class MinHashStage:
    """Actor-pool stage: per-doc minhash signature -> (band_id, band_hash,
    part) rows, fully batch-vectorized: ONE (shingles x hashes) matrix per
    batch + ``np.minimum.reduceat`` segment minima + a per-band polynomial
    combine for the band hashes (the per-doc python loop was the round-1
    hot spot). ``part`` is the hash-partition key of the candidate
    exchange. Hash params built once per actor in __init__."""

    def __init__(self, num_hashes: int = 64, bands: int = 16,
                 num_parts: int = NUM_PARTS):
        self.num = num_hashes
        self.bands = bands
        self.rows = num_hashes // bands
        self.num_parts = num_parts
        _mh_params(num_hashes)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].combine_chunks().to_numpy()
        d, sh = _shingle_hashes_batch(batch["text"].combine_chunks())
        if not len(d):  # empty batch (possible downstream of filters)
            e = pa.array(np.empty(0, np.int64))
            return pa.table({"doc_id": e, "band_id": e, "band_hash": e,
                             "part": e})
        a, b = _mh_params(self.num)
        with np.errstate(over="ignore"):
            vals = (sh[:, None] * a[None, :] + b[None, :]) % _MH_PRIME
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        sigs = np.minimum.reduceat(vals, starts, axis=0)  # (ndocs, num)
        n = len(starts)
        nb, r = self.bands, self.rows
        s3 = sigs.reshape(n, nb, r)
        with np.errstate(over="ignore"):
            bh = np.zeros((n, nb), np.uint64)
            for j in range(r):
                bh = bh * _SH_MULT + s3[:, :, j]
        band_hash = bh.ravel().view(np.int64)
        doc = np.repeat(ids[d[starts]], nb)
        band_id = np.tile(np.arange(nb, dtype=np.int64), n)
        key = bh.ravel() * np.uint64(nb) + band_id.astype(np.uint64)
        return pa.table({
            "doc_id": pa.array(doc),
            "band_id": pa.array(band_id),
            "band_hash": pa.array(band_hash),
            "part": pa.array(_part_of(key, self.num_parts)),
        })


def _bucket_pairs_vec(key: np.ndarray, doc: np.ndarray,
                      sig: np.ndarray | None = None,
                      max_bucket: int | None = None):
    """All unordered (a, b) doc pairs sharing a bucket key — vectorized:
    one lexsort, then a python loop ONLY over buckets with >= 2 members
    (rare). Replaces groupby().map_groups(per_bucket_fn), which paid one
    Ray+pandas group-call per bucket — measured ~9 s for 80 K mostly
    singleton buckets vs ~50 ms here.

    HOT-BUCKET CAP (skew control): a bucket with more than ``max_bucket``
    members — on a web corpus, almost always an exact-duplicate /
    boilerplate class that landed one band hash — emits a sorted-id CHAIN
    (c-1 consecutive pairs) instead of the O(c^2) clique, so candidate
    volume stays linear in the corpus.  For true duplicate classes every
    chain pair verifies, so downstream connected components (dedup_keep)
    are IDENTICAL to the clique's; only the exhaustive pair *listing*
    inside such a bucket is reduced (documented recall note: near-misses
    bridged solely by an oversized bucket may drop).  Within each bucket
    ids are ascending (the lexsort), so a < b always holds."""
    order = np.lexsort((doc, key))
    k, d = key[order], doc[order]
    s = sig[order] if sig is not None else None
    _, start, counts = np.unique(k, return_index=True, return_counts=True)
    a_out, b_out, sa_out, sb_out = [], [], [], []
    for st, c in zip(start[counts >= 2], counts[counts >= 2]):
        ids = d[st:st + c]
        if max_bucket is not None and c > max_bucket:
            ii = np.arange(int(c) - 1)
            jj = ii + 1
        else:
            ii, jj = np.triu_indices(int(c), k=1)
        a_out.append(ids[ii])
        b_out.append(ids[jj])
        if s is not None:
            sa_out.append(s[st:st + c][ii])
            sb_out.append(s[st:st + c][jj])
    if not a_out:
        e = np.empty(0, np.int64)
        return (e, e, e, e) if sig is not None else (e, e)
    a, b = np.concatenate(a_out), np.concatenate(b_out)
    if sig is None:
        return a, b
    return a, b, np.concatenate(sa_out), np.concatenate(sb_out)


def _check_id31(*cols: np.ndarray) -> None:
    """The packed-pair int64 arithmetic (a*(2^31)+b) requires ids < 2^31;
    fail LOUDLY instead of silently corrupting pairs (ADVICE r2). Ids at
    that magnitude need the structured-dtype unique variant instead."""
    for c in cols:
        if len(c) and int(c.max()) >= (1 << 31):
            raise ValueError(
                f"pair id {int(c.max())} >= 2^31: packed-int64 pair keys "
                "would overflow — re-id the corpus or widen the pack")


def _dedup_pairs(a: np.ndarray, b: np.ndarray):
    """Unique (a, b) pairs via one packed-int64 unique (doc ids < 2^31,
    asserted)."""
    _check_id31(a, b)
    pk = np.unique(a.astype(np.int64) * (1 << 31) + b.astype(np.int64))
    return pk >> 31, pk & ((1 << 31) - 1)


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa = set(_shingle_hashes(a, k).tolist())
    sb = set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


_PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def _band_pairgen(nb: int, id_col: str = "doc_id",
                  key_col: str = "band_hash", band_col: str = "band_id",
                  max_bucket: int | None = MAX_BUCKET):
    """Partition-local candidate kernel: all unordered id pairs sharing a
    (band key, band id) bucket (chained above ``max_bucket`` — see
    _bucket_pairs_vec), deduped within the partition."""
    def pairgen(t: pa.Table) -> pa.Table:
        key = (t[key_col].combine_chunks().to_numpy().view(np.uint64)
               * np.uint64(nb)
               + t[band_col].combine_chunks().to_numpy().astype(np.uint64))
        doc = t[id_col].combine_chunks().to_numpy()
        a, b = _bucket_pairs_vec(key, doc, max_bucket=max_bucket)
        a, b = _dedup_pairs(a, b)
        return pa.table({"a": pa.array(a), "b": pa.array(b)}, schema=_PAIR_SCHEMA)
    return pairgen


def _collect_pair_ids(cand: ray.data.Dataset) -> np.ndarray:
    """Distinct ids appearing in the (small, materialized) candidate pair
    table — the broadcastable side of the verify semi-join."""
    tabs = ray.get(cand.select_columns(["a", "b"]).to_arrow_refs())
    tabs = [t for t in tabs if len(t)]
    if not tabs:
        return np.empty(0, np.int64)
    t = pa.concat_tables(tabs)
    return np.unique(np.concatenate([t["a"].to_numpy(), t["b"].to_numpy()]))


def _empty_ds(schema: pa.Schema) -> ray.data.Dataset:
    return ray.data.from_arrow(schema.empty_table())


def _make_jaccard_verify(texts_ref: ray.ObjectRef, threshold: float):
    """Verify kernel for minhash candidates: shingles each candidate doc
    ONCE PER TASK (batch kernel over the broadcast candidate texts,
    cached in the closure), then per pair counts the sorted-array
    intersection — the round-2 form re-shingled both texts from scratch
    per pair (python sets per candidate, VERDICT r2 #7). Emits exactly
    the pairs with exact set-Jaccard >= threshold. A closure (not an
    actor pool) because the candidate table is tiny; actor startup would
    dominate at this stage's scale."""
    state: dict = {}

    def verify(batch: pa.Table) -> pa.Table:
        if "sh" not in state:
            t: pa.Table = ray.get(texts_ref)  # candidate texts ONLY
            ids = t["doc_id"].to_numpy()
            d, h = _shingle_hashes_batch(t["text"].combine_chunks())
            counts = np.bincount(d, minlength=len(ids))
            bounds = np.r_[0, np.cumsum(counts)]
            # per-doc shingle hashes ascending (the batch kernel lexsort)
            state["sh"] = {int(ids[i]): h[bounds[i]:bounds[i + 1]]
                           for i in range(len(ids))}
        sh = state["sh"]
        a = batch["a"].combine_chunks().to_numpy()
        b = batch["b"].combine_chunks().to_numpy()
        jac = np.empty(len(a), np.float64)
        for i in range(len(a)):
            ha, hb = sh[int(a[i])], sh[int(b[i])]
            inter = np.count_nonzero(np.isin(ha, hb, assume_unique=True))
            union = len(ha) + len(hb) - inter
            jac[i] = inter / union if union else 1.0
        keep = jac >= threshold if len(jac) else np.empty(0, bool)
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep]),
                         "jac6": pa.array(np.round(jac[keep], 6))})
    return verify


def minhash_lsh_pairs(docs: ray.data.Dataset, threshold: float = 0.5,
                      num_hashes: int = 64, bands: int = 16,
                      concurrency: int | tuple[int, int] = (2, 8),
                      num_parts: int = NUM_PARTS,
                      max_bucket: int | None = MAX_BUCKET) -> ray.data.Dataset:
    """Near-dup candidate pairs via MinHash banding, verified by exact
    shingle Jaccard >= threshold. Distributed plan: the band table
    shuffles by hash partition of (band_hash, band_id) and the pair
    kernel runs per partition; verification semi-joins the corpus down
    to the CANDIDATE ids and broadcasts only that small side (never the
    whole documents table); a final tiny groupby dedups pairs found in
    more than one band partition. Output: (a, b, jac6) with a < b.
    """
    from ..relational import broadcast_table, semi_filter
    sigs = docs.map_batches(MinHashStage,
                            fn_constructor_args=(num_hashes, bands, num_parts),
                            batch_format="pyarrow", batch_size=1024,
                            concurrency=concurrency)
    # materialize: the candidate list is the small survivor of the LSH
    # exchange, and both the id-collect below and the verify pass read it
    cand = _by_partition(sigs, _band_pairgen(bands, max_bucket=max_bucket)) \
        .materialize()
    ids = _collect_pair_ids(cand)
    if not len(ids):
        return _empty_ds(pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                    ("jac6", pa.float64())]))
    ids_ref = ray.put(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    texts_ref = broadcast_table(semi_filter(docs, "doc_id", ids_ref),
                                ["doc_id", "text"])

    verified = cand.map_batches(_make_jaccard_verify(texts_ref, threshold),
                                batch_format="pyarrow")
    # cross-partition dedup (a pair can surface from several bands)
    return _pair_merge(verified, [("jac6", "max")], num_parts)


# ------------------------------------------------------------- ngram jaccard

def ngram_jaccard_pairs(docs: ray.data.Dataset, threshold: float = 0.5,
                        k: int = 3, max_df: int = 64,
                        num_parts: int = NUM_PARTS) -> ray.data.Dataset:
    """Exact n-gram-Jaccard near-dup pairs via shared-shingle blocking:
    docs sharing >= 1 (non-ubiquitous) k-shingle are candidates, with the
    exact Jaccard computed from pair multiplicities (no text re-read).

    Buckets bigger than ``max_df`` are dropped before pair generation —
    the standard common-shingle cutoff (skew control; the computed
    jaccard is then a LOWER bound, so filtering >= threshold yields no
    false positives). Distributed plan: the (shingle, doc) table
    shuffles by shingle-hash partition; each partition kernel applies
    the df cutoff (a shingle lives wholly in one partition) and emits
    per-partition pair intersection counts; a groupby((a, b)) sums the
    partial intersections — |A∩B| — and |A∪B| follows from the per-doc
    distinct-shingle counts carried on the rows."""
    def shingle_stage(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].combine_chunks().to_numpy()
        d, h = _shingle_hashes_batch(batch["text"].combine_chunks(), k)
        n_sh = np.bincount(d, minlength=len(batch)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids[d]),
            "shingle": pa.array(h.view(np.int64)),
            "n_sh": pa.array(n_sh[d]),
            "part": pa.array(_part_of(h, num_parts)),
        })

    rows = docs.map_batches(shingle_stage, batch_format="pyarrow",
                            batch_size=1024)

    empty = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                       ("inter_p", pa.int64()), ("ca", pa.int64()),
                       ("cb", pa.int64())])

    def pairgen(t: pa.Table) -> pa.Table:
        key = t["shingle"].combine_chunks().to_numpy()
        doc = t["doc_id"].combine_chunks().to_numpy()
        nsh = t["n_sh"].combine_chunks().to_numpy()
        # common-shingle cutoff before pair expansion (df is exact here:
        # a shingle's rows all hash to this partition)
        u, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
        keep = cnt[inv] <= max_df
        a, b = _bucket_pairs_vec(key[keep], doc[keep])
        if not len(a):
            return empty.empty_table()
        # pre-dedup multiplicity inside this partition = the partition's
        # contribution to |A∩B|
        _check_id31(a, b)
        pk, inter = np.unique(a * (1 << 31) + b, return_counts=True)
        a, b = pk >> 31, pk & ((1 << 31) - 1)
        ud, ui = np.unique(doc, return_index=True)
        ns = nsh[ui]
        ca = ns[np.searchsorted(ud, a)]
        cb = ns[np.searchsorted(ud, b)]
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "inter_p": pa.array(inter.astype(np.int64)),
                         "ca": pa.array(ca), "cb": pa.array(cb)}, schema=empty)

    partials = _by_partition(rows, pairgen)
    agg = _pair_merge(partials, [("inter_p", "sum"), ("ca", "max"),
                                 ("cb", "max")], num_parts)

    def finish(t: pa.Table) -> pa.Table:
        inter = t["inter_p"].combine_chunks().to_numpy().astype(np.float64)
        ca = t["ca"].combine_chunks().to_numpy().astype(np.float64)
        cb = t["cb"].combine_chunks().to_numpy().astype(np.float64)
        jac = inter / (ca + cb - inter)
        m = jac >= threshold
        from ..util import round_half_away
        return pa.table({"a": t["a"].combine_chunks().filter(pa.array(m)),
                         "b": t["b"].combine_chunks().filter(pa.array(m)),
                         "jac6": pa.array(round_half_away(jac[m], 6))})
    return agg.map_batches(finish, batch_format="pyarrow")


def dedup_groups(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """Near-dup pair list -> connected components: (doc_id, group_id)
    with group_id = smallest doc_id in the component (the canonical
    keeper). Pairs are tiny relative to the corpus (they survived
    LSH + verify), so the union-find runs in ONE guarded task over the
    edge list (relational.single_merge coalesces every block into one
    batch); ``dedup_groups_distributed`` below is the BUILT scale path
    (BSP min-label propagation, no single task — tested equivalent).
    Vectorized path-halving union-find on dense-ranked ids."""
    from ..relational import single_merge

    def components(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy()
        b = t["b"].combine_chunks().to_numpy()
        if not len(a):
            e = pa.array(np.empty(0, np.int64))
            return pa.table({"doc_id": e, "group_id": e})
        ids = np.unique(np.concatenate([a, b]))
        parent = np.arange(len(ids))
        ia = np.searchsorted(ids, a)
        ib = np.searchsorted(ids, b)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for x, y in zip(ia, ib):
            rx, ry = find(int(x)), find(int(y))
            if rx != ry:  # union by smaller original id -> canonical min
                if ids[rx] < ids[ry]:
                    parent[ry] = rx
                else:
                    parent[rx] = ry
        roots = np.array([find(i) for i in range(len(ids))])
        return pa.table({"doc_id": pa.array(ids),
                         "group_id": pa.array(ids[roots])})
    return single_merge(pairs, components)


def dedup_groups_distributed(pairs: ray.data.Dataset,
                             num_parts: int = NUM_PARTS,
                             max_iters: int = 64) -> ray.data.Dataset:
    """Connected components WITHOUT any single merge task: iterative
    min-label propagation as BSP rounds of hash-partitioned exchanges
    (the scale path promised next to ``dedup_groups``'s one-task
    union-find). Each round: (1) co-partition label rows with edge rows
    by hash(src) and push every node's current label to its neighbors,
    (2) re-partition by node id and take the min candidate label;
    converges when no label changes (O(component diameter) rounds —
    near-dup components are shallow). Labels are materialized per round
    (one small row per node in the PAIR graph, not the corpus).
    Output matches dedup_groups: (doc_id, group_id=min id in component).
    """
    def edges_both(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy()
        b = t["b"].combine_chunks().to_numpy()
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table({
            "id": pa.array(src), "val": pa.array(dst),
            "is_edge": pa.array(np.ones(len(src), bool)),
            "part": pa.array(_part_of(src, num_parts)),
        })

    edges = pairs.map_batches(edges_both, batch_format="pyarrow") \
        .materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate([
            t["a"].combine_chunks().to_numpy(),
            t["b"].combine_chunks().to_numpy()]))
        return pa.table({
            "id": pa.array(ids), "val": pa.array(ids),  # lbl := id
            "is_edge": pa.array(np.zeros(len(ids), bool)),
            "part": pa.array(_part_of(ids, num_parts)),
        })

    labels = pairs.map_batches(init_labels, batch_format="pyarrow")
    # per-batch init can duplicate ids across blocks — one dedup round
    labels = _min_label_round(labels, edges, num_parts,
                              propagate=False)[0].materialize()

    for _ in range(max_iters):
        labels, changed = _min_label_round(labels, edges, num_parts)
        labels = labels.materialize()
        if changed == 0:
            break
    else:
        # one hop per round: a component whose min-node eccentricity
        # exceeds max_iters would silently get WRONG labels — refuse.
        # (Deep graphs: use min_label_components_static, which pointer-
        # jumps in O(log diameter) rounds.)
        raise RuntimeError(
            f"dedup_groups_distributed: labels still changing after "
            f"{max_iters} rounds — component diameter exceeds max_iters")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["id"], "group_id": t["val"]})
    return labels.map_batches(finish, batch_format="pyarrow")


def _min_label_round(labels: ray.data.Dataset, edges: ray.data.Dataset,
                     num_parts: int, propagate: bool = True):
    """One BSP round; returns (new labels Dataset, changed count)."""
    def push(t: pa.Table) -> pa.Table:
        # partition-local: label lookup id -> lbl, then each edge (src
        # here) emits its label to dst; labels re-emit themselves as the
        # 'self' candidate so the next stage sees the old value
        is_edge = t["is_edge"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = t["id"].combine_chunks().to_numpy()
        vals = t["val"].combine_chunks().to_numpy()
        lid, lval = ids[~is_edge], vals[~is_edge]
        order = np.argsort(lid, kind="stable")
        lid_s, lval_s = lid[order], lval[order]
        out_id = [lid, ]
        out_val = [lval, ]
        out_self = [np.ones(len(lid), bool), ]
        if propagate and is_edge.any():
            esrc, edst = ids[is_edge], vals[is_edge]
            j = np.searchsorted(lid_s, esrc)
            out_id.append(edst)
            out_val.append(lval_s[j])
            out_self.append(np.zeros(len(edst), bool))
        oid = np.concatenate(out_id)
        return pa.table({
            "id": pa.array(oid),
            "val": pa.array(np.concatenate(out_val)),
            "is_self": pa.array(np.concatenate(out_self)),
            "part": pa.array(_part_of(oid, num_parts)),
        })

    def take_min(t: pa.Table) -> pa.Table:
        ids = t["id"].combine_chunks().to_numpy()
        vals = t["val"].combine_chunks().to_numpy()
        selfm = t["is_self"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, ids))
        ids, vals, selfm = ids[order], vals[order], selfm[order]
        uid, starts = np.unique(ids, return_index=True)
        new = vals[starts]  # min per id (sorted)
        old = np.full(len(uid), np.iinfo(np.int64).max)
        sm = np.flatnonzero(selfm)
        old[np.searchsorted(uid, ids[sm])] = np.minimum(
            old[np.searchsorted(uid, ids[sm])], vals[sm])
        changed = (new < old).astype(np.int64)
        return pa.table({
            "id": pa.array(uid), "val": pa.array(new),
            "is_edge": pa.array(np.zeros(len(uid), bool)),
            "part": pa.array(_part_of(uid, num_parts)),
            "changed": pa.array(changed),
        })

    lab2 = labels
    if "changed" in lab2.schema().names:
        lab2 = lab2.drop_columns(["changed"])
    merged = lab2.union(edges) if propagate else lab2
    pushed = merged.groupby("part").map_groups(push, batch_format="pyarrow")
    out = pushed.groupby("part").map_groups(take_min, batch_format="pyarrow")
    out = out.materialize()
    changed = int(out.sum("changed") or 0)
    return out.drop_columns(["changed"]), changed


def shard_static_edges(pairs: ray.data.Dataset, num_parts: int,
                       work_dir: str | None = None,
                       extra_nodes: "ray.data.Dataset | None" = None,
                       ) -> tuple[str, set[int], bool]:
    """Write the (a, b) pair list as BOTH-direction per-partition edge
    shards keyed by hash(src) — the one-time exchange that lets iterative
    graph algorithms (components, PageRank) shuffle only their per-node
    state each round while the static adjacency loads ONCE into each BSP
    actor (``state.bsp``). Self pairs (a == b) and every id of
    ``extra_nodes`` (column "id") become node-marker rows (dst = -1) so
    edge-less nodes still enter the actor's node universe.

    ``work_dir`` must be readable by every worker. The node-local /tmp
    default is only valid on a single-node cluster: with >1 alive node a
    BSP actor scheduled elsewhere would fail mid-build, so this FAILS
    FAST and demands an explicit shared-fs/object-store path. Returns
    (dir, parts with a shard, owned) — ``owned`` means this call created
    a temp dir the consumer must clean up (the BSP runners do, right
    after their actors load)."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    owned = work_dir is None
    if owned:
        alive = sum(1 for n in ray.nodes() if n.get("Alive"))
        if alive > 1:
            raise ValueError(
                "shard_static_edges: default work_dir is node-local /tmp, "
                f"but this cluster has {alive} alive nodes — pass a "
                "work_dir on a shared filesystem/object store that every "
                "worker can read")
    d = work_dir or tempfile.mkdtemp(prefix="go_osm_ray_graph_")
    os.makedirs(d, exist_ok=True)

    def shard(t: pa.Table) -> pa.Table:
        p = int(t["part"][0].as_py())
        path = os.path.join(d, f"edges-{p:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(t.select(["src", "dst"]), tmp)
        os.replace(tmp, path)
        return pa.table({"part": pa.array([p], pa.int64()),
                         "n_edges": pa.array([t.num_rows], pa.int64())})

    def edges_both(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy()
        b = t["b"].combine_chunks().to_numpy()
        m = a != b
        # real edges in both directions; a==b rows as node markers
        src = np.concatenate([a[m], b[m], a[~m]])
        dst = np.concatenate([b[m], a[m],
                              np.full(int((~m).sum()), -1, a.dtype)])
        return pa.table({"src": pa.array(src), "dst": pa.array(dst),
                         "part": pa.array(_part_of(src, num_parts))})

    def node_markers(t: pa.Table) -> pa.Table:
        ids = t["id"].combine_chunks().to_numpy()
        return pa.table({"src": pa.array(ids),
                         "dst": pa.array(np.full(len(ids), -1, ids.dtype)),
                         "part": pa.array(_part_of(ids, num_parts))})

    rows = pairs.map_batches(edges_both, batch_format="pyarrow")
    if extra_nodes is not None:
        rows = rows.union(extra_nodes.map_batches(
            node_markers, batch_format="pyarrow"))
    manifest = rows.groupby("part") \
        .map_groups(shard, batch_format="pyarrow").to_pandas()
    return d, set(manifest["part"].tolist()), owned


def min_label_components_static(pairs: ray.data.Dataset,
                                num_parts: int = 32,
                                max_iters: int = 64,
                                work_dir: str | None = None,
                                ) -> ray.data.Dataset:
    """Connected components shuffling ONLY labels: the edge list is
    static across BSP rounds, so re-exchanging it every round (what
    ``dedup_groups_distributed`` pays: labels UNION edges through two
    groupbys per round) is pure waste at scale. Edges are written ONCE
    as per-partition parquet shards keyed by hash(src)
    (``shard_static_edges``), then each partition becomes a resident BSP
    actor (``state.bsp._ComponentsPart``) that loads its shard ONCE and
    exchanges ONLY per-node label messages — min-merge, delta pushes
    along local edges, and pointer-jump (label-of-label) requests, so
    convergence is O(log diameter) rounds. The per-round cost is one
    actor RPC with object-store routed payloads, not a Dataset
    sort-shuffle (the retired groupby runner paid 2-4 s of fixed shuffle
    per round regardless of payload).

    ``work_dir`` must be storage every worker can read (node-local /tmp
    on one machine — the default FAILS FAST on a multi-node cluster; a
    shared filesystem or object store otherwise); a temp default dir is
    deleted as soon as the actors have loaded. Output matches
    dedup_groups: (doc_id, group_id = min id in component)."""
    from ..state.bsp import run_components

    d, has_shard, owned = shard_static_edges(pairs, num_parts, work_dir)
    return run_components(d, has_shard, num_parts, max_iters,
                          cleanup=owned)


def dedup_keep(docs: ray.data.Dataset, pairs: ray.data.Dataset,
               id_col: str = "doc_id",
               broadcast_limit: int = 2_000_000,
               single_task_edge_limit: int = 2_000_000) -> ray.data.Dataset:
    """Near-dup purge: keep every doc that is its component's canonical
    (smallest-id) member — docs in no pair are all keepers.

    Scale switches, each with identical output: connected components run
    the one-guarded-task union-find while the edge list stays under
    ``single_task_edge_limit`` and the static-edge pointer-jumping BSP
    (``min_label_components_static`` — one label exchange per round,
    O(log diameter) rounds, loud failure instead of silent wrong labels
    on deep graphs) beyond it; the drop list broadcasts
    while small (one ray.put, one vectorized membership filter per
    batch) and switches to the hash-partitioned ANTI join
    (relational.partitioned_anti_filter, VERDICT r2 #9) past
    ``broadcast_limit`` so a duplicate-heavy corpus never ships a
    corpus-sized drop list to every task."""
    pairs = pairs.materialize()  # consumed by the count probe + CC build
    if pairs.count() > single_task_edge_limit:
        groups = min_label_components_static(pairs)
    else:
        groups = dedup_groups(pairs)
    drops = groups.filter(expr="doc_id != group_id") \
        .select_columns(["doc_id"]).materialize()
    if drops.count() > broadcast_limit:
        from ..relational import partitioned_anti_filter
        keys_ds = drops if id_col == "doc_id" else drops.map_batches(
            lambda t: pa.table({id_col: t["doc_id"]}),
            batch_format="pyarrow")
        return partitioned_anti_filter(docs, id_col, keys_ds)
    from ..relational import broadcast_table
    drop_ref = broadcast_table(drops, ["doc_id"])

    def keep(batch: pa.Table) -> pa.Table:
        t = ray.get(drop_ref)
        drop = pa.array(t["doc_id"].to_numpy(), pa.int64())
        m = pc.invert(pc.is_in(batch[id_col], value_set=drop))
        return batch.filter(m)
    return docs.map_batches(keep, batch_format="pyarrow")


# ------------------------------------------------------------- simhash

def simhash64(text: str) -> np.uint64:
    acc = np.zeros(64, np.int64)
    for tok in set(text.lower().split()):
        h = np.uint64(zlib.crc32(tok.encode()) | (zlib.crc32(tok[::-1].encode()) << 32))
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = np.uint64(0)
    for i in np.flatnonzero(acc > 0):
        out |= np.uint64(1) << np.uint64(i)
    return out


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """Vectorized simhash64 over a batch (bit-identical to the scalar
    reference impl): hash each UNIQUE token once, expand to a +/-1 bit
    matrix, then segment-sum per document with np.add.reduceat — the
    per-token python/numpy loop was the sim_stage hot spot."""
    doc_tok: list[tuple[int, str]] = []
    for i, t in enumerate(texts):
        for tok in set(t.lower().split()):
            doc_tok.append((i, tok))
    if not doc_tok:
        return np.zeros(len(texts), np.uint64)
    docs_idx = np.array([d for d, _ in doc_tok], np.int64)
    toks = [t for _, t in doc_tok]
    uniq = sorted(set(toks))
    h = np.array([zlib.crc32(t.encode()) | (zlib.crc32(t[::-1].encode()) << 32)
                  for t in uniq], np.uint64)
    # V x 64 signed bit matrix (+1 where bit set, -1 otherwise)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int8)
    signed = (bits * 2 - 1).astype(np.int32)
    tok_idx = np.searchsorted(np.array(uniq, dtype=object), np.array(toks, dtype=object))
    rows = signed[tok_idx]  # (pairs, 64), already grouped by doc order
    starts = np.flatnonzero(np.r_[True, docs_idx[1:] != docs_idx[:-1]])
    acc = np.add.reduceat(rows, starts, axis=0)  # (ndocs_with_toks, 64)
    present = docs_idx[starts]
    out = np.zeros(len(texts), np.uint64)
    pos = (acc > 0).astype(np.uint64)
    out[present] = (pos << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
    return out


def simhash_pairs(docs: ray.data.Dataset, max_hamming: int = 3,
                  num_parts: int = NUM_PARTS,
                  max_bucket: int | None = MAX_BUCKET) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: 4-band exact-match blocking (any pair
    within hamming<=3 shares at least one of 4 16-bit bands), exact
    hamming verified from the signatures carried through the exchange.
    Distributed plan: band rows shuffle by hash partition of
    (band_key, band_id); the pair kernel runs per partition; a final
    groupby dedups pairs found in more than one band partition."""
    def sim_stage(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].combine_chunks().to_numpy()
        sigs = simhash64_batch(batch["text"].to_pylist())
        n = len(ids)
        band_id = np.tile(np.arange(4, dtype=np.int64), n)
        keys = np.empty((n, 4), np.int64)
        for b in range(4):
            keys[:, b] = ((sigs >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        key_flat = keys.ravel()
        packed = key_flat.astype(np.uint64) * np.uint64(4) + band_id.astype(np.uint64)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, 4)),
            "band_id": pa.array(band_id),
            "band_key": pa.array(key_flat),
            "sig": pa.array(np.repeat(sigs.view(np.int64), 4)),
            "part": pa.array(_part_of(packed, num_parts)),
        })

    sigs = docs.map_batches(sim_stage, batch_format="pyarrow", batch_size=1024)

    empty = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                       ("hamming", pa.int64())])

    def pairgen(t: pa.Table) -> pa.Table:
        key = (t["band_key"].combine_chunks().to_numpy() * 4
               + t["band_id"].combine_chunks().to_numpy())
        doc = t["doc_id"].combine_chunks().to_numpy()
        sig = t["sig"].combine_chunks().to_numpy()
        a, b, _, _ = _bucket_pairs_vec(key, doc, sig, max_bucket=max_bucket)
        a, b = _dedup_pairs(a, b)
        if not len(a):
            return empty.empty_table()
        # vectorized hamming: map pair ids -> sigs via sorted uniques,
        # then unpackbits popcount (a python bin() loop was the hot spot)
        ud, uidx = np.unique(doc, return_index=True)
        sig_u = sig[uidx].astype(np.uint64)
        x = sig_u[np.searchsorted(ud, a)] ^ sig_u[np.searchsorted(ud, b)]
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                            axis=1).sum(axis=1).astype(np.int64)
        m = ham <= max_hamming
        return pa.table({"a": pa.array(a[m]), "b": pa.array(b[m]),
                         "hamming": pa.array(ham[m])}, schema=empty)

    pairs = _by_partition(sigs, pairgen)
    return _pair_merge(pairs, [("hamming", "min")], num_parts)


# ------------------------------------------------------------- embeddings

def plant_neardups(embeddings: ray.data.Dataset, every: int = 50,
                   id_offset: int = 100_000,
                   alpha: float = 0.1) -> ray.data.Dataset:
    """Deterministic near-dup augmentation for the embed_neardup gate:
    every ``every``-th vec_id gains a perturbed copy
    ``v' = v + alpha * reverse(v)`` (cosine(v, v') ≈ 1/sqrt(1+alpha²)
    ≈ 0.995 for near-orthogonal reverse) with id ``vec_id + id_offset``.
    The DuckDB oracle mirrors this exactly (list_zip + list_reverse), so
    the planted pairs give the near-dup gate real ground truth — the
    round-1 gate returned 0 rows on the natural table and verified
    nothing."""
    elem_type = None

    def perturb(batch: pa.Table) -> pa.Table:
        nonlocal elem_type
        vid = batch["vec_id"].combine_chunks().to_numpy()
        m = (vid % every) == 0
        if elem_type is None:
            elem_type = batch.schema.field("embedding").type
        sub = batch.filter(pa.array(m))
        if len(sub) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "embedding": pa.array([], elem_type)})
        emb = np.stack(sub["embedding"].combine_chunks()
                       .to_numpy(zero_copy_only=False)).astype(np.float64)
        v = emb + alpha * emb[:, ::-1]
        new_ids = sub["vec_id"].combine_chunks().to_numpy() + id_offset
        np_elem = np.float32 if pa.types.is_float32(elem_type.value_type) \
            else np.float64
        return pa.table({
            "vec_id": pa.array(new_ids, pa.int64()),
            "embedding": pa.array(list(v.astype(np_elem)), type=elem_type),
        })

    aug = embeddings.select_columns(["vec_id", "embedding"]) \
        .map_batches(perturb, batch_format="pyarrow")
    return embeddings.select_columns(["vec_id", "embedding"]).union(aug)


def embedding_neardup(embeddings: ray.data.Dataset, threshold: float = 0.95,
                      planes: int = 128, bands: int = 8,
                      num_parts: int = NUM_PARTS,
                      max_bucket: int | None = MAX_BUCKET) -> ray.data.Dataset:
    """Near-dup vector pairs (cosine >= threshold) via BANDED
    random-hyperplane sign LSH: the ``planes``-bit sign signature splits
    into ``bands`` 16-bit bands and vectors sharing ANY band pattern are
    candidates. At 128 planes / 8 bands a cos≈0.995 pair is missed with
    prob ~(1-0.968^16)^8 ≈ 7e-4 while an unrelated pair false-candidates
    at ~8·2^-16 ≈ 1e-4 (so the candidate set stays tiny). Candidates
    verify by EXACT cosine over a broadcast of ONLY the candidate
    embeddings (semi-join, never the whole table). Output: distinct
    (a, b) id pairs, a < b. The single-band round-1 form both recalled
    ~nothing (0 rows at 16 planes — a vacuous gate) and double-executed
    the pipeline via a driver-side count(); this plan executes once per
    consumer and is oracle-gated against planted near-dups."""
    from ..relational import broadcast_table, semi_filter
    bits = planes // bands
    weights = (1 << np.arange(bits, dtype=np.int64))
    state: dict = {}  # per-task lazy hyperplane cache

    def bucketize(batch: pa.Table) -> pa.Table:
        emb = np.stack(batch["embedding"].combine_chunks()
                       .to_numpy(zero_copy_only=False)).astype(np.float64)
        if "H" not in state:
            # seed-fixed, so every task derives the IDENTICAL matrix from
            # the batch's dim — no driver-side take(1) probe (that was a
            # whole extra execution of the input pipeline)
            state["H"] = np.random.RandomState(4321) \
                .normal(size=(emb.shape[1], planes))
        Hm = state["H"]
        nrm = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        signs = (nrm @ Hm) > 0  # (n, planes)
        n = len(batch)
        keys = signs.reshape(n, bands, bits).astype(np.int64) @ weights  # (n, bands)
        band_id = np.tile(np.arange(bands, dtype=np.int64), n)
        key_flat = keys.ravel()
        packed = key_flat.astype(np.uint64) * np.uint64(bands) + band_id.astype(np.uint64)
        return pa.table({
            "vec_id": pa.array(np.repeat(
                batch["vec_id"].combine_chunks().to_numpy(), bands)),
            "band_id": pa.array(band_id),
            "band_key": pa.array(key_flat),
            "part": pa.array(_part_of(packed, num_parts)),
        })

    rows = embeddings.map_batches(bucketize, batch_format="pyarrow")
    cand = _by_partition(rows, _band_pairgen(bands, id_col="vec_id",
                                             key_col="band_key",
                                             max_bucket=max_bucket)) \
        .materialize()
    ids = _collect_pair_ids(cand)
    if not len(ids):
        return _empty_ds(_PAIR_SCHEMA)
    ids_ref = ray.put(pa.table({"vec_id": pa.array(ids, pa.int64())}))
    emb_ref = broadcast_table(semi_filter(embeddings, "vec_id", ids_ref),
                              ["vec_id", "embedding"])

    def verify(batch: pa.Table) -> pa.Table:
        t = ray.get(emb_ref)  # candidate embeddings ONLY
        vids = t["vec_id"].to_numpy()
        order = np.argsort(vids, kind="stable")
        vids_s = vids[order]
        M = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)[order]
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        a = batch["a"].combine_chunks().to_numpy()
        b = batch["b"].combine_chunks().to_numpy()
        if not len(a):
            return _PAIR_SCHEMA.empty_table()
        cos = np.einsum("ij,ij->i", M[np.searchsorted(vids_s, a)],
                        M[np.searchsorted(vids_s, b)])
        keep = cos >= threshold
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])},
                        schema=_PAIR_SCHEMA)

    verified = cand.map_batches(verify, batch_format="pyarrow")
    return _pair_merge(verified, [], num_parts)


# ------------------------------------------------------------- text analysis

_ALL_STOPS = sorted({w for ws in STOPLISTS.values() for w in ws})
_STOP_LANG_IDX = {lang: np.array([_ALL_STOPS.index(w) for w in STOPLISTS[lang]],
                                 np.int64) for lang in LANGS}


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic language ID: distinct-token stoplist overlap per language.
    Vectorized: one arrow split, ONE index_in over the union stoplist,
    one (doc, stopword) distinct pass, then 5 tiny membership scatters
    (the round-1 form did 40 full-array equality passes)."""
    offsets, flat = _split_tokens(batch[text_col].combine_chunks())
    n = len(batch)
    codes = np.asarray(pc.index_in(flat, value_set=pa.array(_ALL_STOPS))
                       .fill_null(-1), np.int64)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    m = codes >= 0
    K = len(_ALL_STOPS)
    uk = np.unique(doc_of[m] * K + codes[m])  # distinct (doc, stopword)
    ud, uc = uk // K, uk % K
    scores = np.zeros((n, len(LANGS)), np.int64)
    for li, lang in enumerate(LANGS):
        hit = np.isin(uc, _STOP_LANG_IDX[lang])
        np.add.at(scores[:, li], ud[hit], 1)
    best = scores.max(axis=1)
    pred_idx = scores.argmax(axis=1)  # argmax -> first max -> alphabetical (LANGS sorted)
    pred = np.where(best > 0, np.array(LANGS, object)[pred_idx], "und")
    return pa.table({
        "doc_id": batch["doc_id"].combine_chunks(),
        "pred_lang": pa.array(pred.tolist(), pa.string()),
    })


def lang_token_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-predicted-language corpus stats (n_docs, n_tokens) in ONE
    pass: each batch runs langid + token count and collapses to one row
    per language (combiner), then the bounded 6-key partials merge in a
    single guarded task — no doc-level shuffle at any scale."""
    from ..relational import single_merge

    def stage(batch: pa.Table) -> pa.Table:
        lang = langid_batch(batch)["pred_lang"]
        tok = token_count_batch(batch)["n_tokens"]
        g = pa.table({"pred_lang": lang, "n": tok}) \
            .group_by("pred_lang").aggregate([("n", "sum"), ("n", "count")])
        return g.rename_columns(["pred_lang", "pn_tokens", "pn_docs"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("pred_lang").aggregate(
            [("pn_docs", "sum"), ("pn_tokens", "sum")])
        return pa.table({
            "pred_lang": g["pred_lang"],
            "n_docs": pc.cast(g["pn_docs_sum"], pa.int64()),
            "n_tokens": pc.cast(g["pn_tokens_sum"], pa.int64()),
        })

    return single_merge(docs.map_batches(stage, batch_format="pyarrow"),
                        merge)


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality scores: word count, char count, avg word length, stopword
    ratio (multiplicity, 'the/a/and/of/to'), all vectorized."""
    texts = batch[text_col].combine_chunks()
    offsets, flat = _split_tokens(texts)
    n_words = np.diff(offsets)
    n_chars = np.asarray(pc.utf8_length(texts), np.int64)
    stop = ["the", "a", "and", "of", "to"]
    member = np.asarray(pc.is_in(flat, value_set=pa.array(stop))).astype(bool)
    n_stop = _seg_count(member, offsets)
    avg_wl = (n_chars - (n_words - 1)) / n_words
    from ..util import round_half_away as _rnd
    return pa.table({
        "doc_id": batch["doc_id"].combine_chunks(),
        "n_words": pa.array(n_words.astype(np.int64)),
        "n_chars": pa.array(n_chars.astype(np.int64)),
        "avg_word_len": pa.array(_rnd(avg_wl, 6)),
        "stop_ratio": pa.array(_rnd(n_stop / n_words, 6)),
    })


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """BPE-ish token count via one vectorized regex count."""
    cnt = pc.count_substring_regex(batch[text_col].combine_chunks(), _TOKEN_RE)
    return pa.table({
        "doc_id": batch["doc_id"].combine_chunks(),
        "n_tokens": pc.cast(cnt, pa.int64()),
    })


def doc_split_batch(batch: pa.Table, id_col: str = "doc_id",
                    train: int = 90, val: int = 5) -> pa.Table:
    """Deterministic train/val/test assignment by id hash — the
    standard reproducible-split staple: bucket = md5(str(id)) taken as
    DuckDB's md5_number_lower (little-endian bytes 8:16) mod 100, so
    the SQL oracle computes the IDENTICAL buckets. Shuffle-free,
    restart-stable, and independent of row order/partitioning."""
    ids = batch[id_col].combine_chunks().to_numpy()
    buckets = np.fromiter(
        (int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:],
                        "little") % 100 for i in ids),
        np.int64, len(ids))
    split = np.where(buckets < train, "train",
                     np.where(buckets < train + val, "val", "test"))
    return pa.table({
        id_col: batch[id_col].combine_chunks(),
        "bucket": pa.array(buckets),
        "split": pa.array(split.tolist(), pa.string()),
    })


def token_pack(docs: ray.data.Dataset, seq_len: int = 512,
               range_size: int = 64, super_size: int = 4096,
               num_parts: int = NUM_PARTS,
               collect_limit: int = 200_000) -> ray.data.Dataset:
    """LM-training sequence packing: assign every doc its position in the
    doc_id-ordered token stream — (doc_id, seq_id, seq_offset) where
    seq_id = prev_token_cumsum // seq_len (docs split across sequence
    boundaries, the standard packed-pretraining layout).

    The global cumulative sum is a TWO-LEVEL DISTRIBUTED SCAN with no
    block-order assumptions (round 2 collected one row per range on the
    driver — fine to ~10^6 ranges; this tree form bounds the collect by
    another factor of ``super_size``, VERDICT r2 #10):
      phase A: per-block Acero partials of token counts per bounded
        doc_id range (``doc_id // range_size``);
      phase B: range partials shuffle by hash of their SUPER-range
        (``r // super_size``; every super wholly in one partition) —
        per-super totals (one row per super, n_ranges/super_size rows)
        are the ONLY thing collected; their exclusive prefix broadcasts
        as a tiny table;
      phase C: the same super-partitioned kernel cumsums ranges inside
        each super and adds the super offset -> a DISTRIBUTED
        (range, offset) table, re-keyed by hash(range);
      phase D: token counts co-partition with the range offsets by
        hash(range); each partition kernel sorts its runs by doc_id,
        cumsums within each range and rebases at range boundaries.
    While the range count stays under ``collect_limit`` the tree levels
    are SKIPPED: the materialized range partials (already one small row
    per range per block) collect directly and the offsets go straight to
    phase D — the two extra exchanges only buy anything past ~10^5
    ranges. The property test forces the tree path with collect_limit=0.
    Oracle: ``sum(n) OVER (ORDER BY doc_id) - n`` windowed SQL."""
    counts = docs.map_batches(token_count_batch,
                              batch_format="pyarrow").materialize()

    _OUT = pa.schema([("doc_id", pa.int64()), ("seq_id", pa.int64()),
                      ("seq_offset", pa.int64())])
    _ROFF = pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                       ("rkey", pa.int64()), ("off", pa.int64()),
                       ("_is_off", pa.bool_()), ("part", pa.int64())])

    def _roff_table(ru: np.ndarray, off: np.ndarray) -> pa.Table:
        return pa.table({"doc_id": pa.nulls(len(ru), pa.int64()),
                         "n_tokens": pa.nulls(len(ru), pa.int64()),
                         "rkey": pa.array(ru),
                         "off": pa.array(off),
                         "_is_off": pa.array(np.ones(len(ru), bool)),
                         "part": pa.array(_part_of(ru, num_parts))},
                        schema=_ROFF)

    def partial(t: pa.Table) -> pa.Table:
        r = t["doc_id"].combine_chunks().to_numpy() // range_size
        g = pa.table({"r": pa.array(r), "n": t["n_tokens"]}) \
            .group_by("r").aggregate([("n", "sum")])
        g = g.rename_columns(["r", "pn"])
        s = g["r"].combine_chunks().to_numpy() // super_size
        return g.append_column("part", pa.array(_part_of(s, num_parts)))

    partials = counts.map_batches(partial,
                                  batch_format="pyarrow").materialize()
    n_range_rows = partials.count()
    if n_range_rows == 0:
        return _empty_ds(_OUT)
    if n_range_rows <= collect_limit:
        # single-level fast path: the partial table IS small — collect,
        # prefix on the driver, feed phase D directly
        ptab = pa.concat_tables(
            [t.replace_schema_metadata(None) for t in
             ray.get(partials.to_arrow_refs())
             if t.num_rows and t.num_columns])
        rs = ptab["r"].to_numpy()
        ns = ptab["pn"].to_numpy()
        order = np.argsort(rs, kind="stable")
        ru, starts = np.unique(rs[order], return_index=True)
        rtot = np.add.reduceat(ns[order], starts)
        off = np.r_[0, np.cumsum(rtot)[:-1]]
        roff = ray.data.from_arrow(_roff_table(ru, off))
        return _token_pack_rebase(counts, roff, range_size, seq_len,
                                  num_parts)

    def super_totals(t: pa.Table) -> pa.Table:
        s = t["r"].combine_chunks().to_numpy() // super_size
        g = pa.table({"s": pa.array(s), "pn": t["pn"]}) \
            .group_by("s").aggregate([("pn", "sum")])
        return g.rename_columns(["s", "total"])

    stabs = [t.replace_schema_metadata(None) for t in ray.get(
        partials.groupby("part").map_groups(super_totals,
                                            batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows and t.num_columns]
    if not stabs:
        return _empty_ds(pa.schema([("doc_id", pa.int64()),
                                    ("seq_id", pa.int64()),
                                    ("seq_offset", pa.int64())]))
    st = pa.concat_tables(stabs)
    ss = st["s"].to_numpy()
    tot = st["total"].to_numpy()
    order = np.argsort(ss, kind="stable")
    su, soff = ss[order], np.r_[0, np.cumsum(tot[order])[:-1]]
    soff_ref = ray.put(pa.table({"s": pa.array(su), "off": pa.array(soff)}))

    def range_offsets(t: pa.Table) -> pa.Table:
        ot = ray.get(soff_ref)
        osu, ooff = ot["s"].to_numpy(), ot["off"].to_numpy()
        r = t["r"].combine_chunks().to_numpy()
        pn = t["pn"].combine_chunks().to_numpy()
        order = np.argsort(r, kind="stable")
        r, pn = r[order], pn[order]
        ru, starts = np.unique(r, return_index=True)
        rtot = np.add.reduceat(pn, starts)
        s = ru // super_size
        cum = np.r_[0, np.cumsum(rtot)[:-1]]  # running prefix in-partition
        sstarts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        base = ooff[np.searchsorted(osu, s[sstarts])] - cum[sstarts]
        off = cum + np.repeat(base, np.diff(np.r_[sstarts, len(s)]))
        return _roff_table(ru, off)

    roff = partials.groupby("part").map_groups(range_offsets,
                                               batch_format="pyarrow")
    return _token_pack_rebase(counts, roff, range_size, seq_len, num_parts)


def _token_pack_rebase(counts: ray.data.Dataset, roff: ray.data.Dataset,
                       range_size: int, seq_len: int,
                       num_parts: int) -> ray.data.Dataset:
    """token_pack phase D: co-partition the token counts with the
    (range, offset) rows by hash(range) and rebase the in-partition
    cumsum at every range boundary."""
    def tag_counts(t: pa.Table) -> pa.Table:
        r = t["doc_id"].combine_chunks().to_numpy() // range_size
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": t["n_tokens"],
                         "rkey": pa.array(r),
                         "off": pa.nulls(len(t), pa.int64()),
                         "_is_off": pa.array(np.zeros(len(t), bool)),
                         "part": pa.array(_part_of(r, num_parts))})

    both = counts.map_batches(tag_counts, batch_format="pyarrow") \
        .union(roff)

    def per_partition(t: pa.Table) -> pa.Table:
        is_off = t["_is_off"].combine_chunks().to_numpy(zero_copy_only=False)
        # fill nulls BEFORE to_numpy: a null-bearing int64 column converts
        # via float64 (NaN), which would round offsets past 2^53
        oru = t["rkey"].combine_chunks().to_numpy()[is_off]
        ooff = np.asarray(pc.fill_null(t["off"].combine_chunks(), 0),
                          np.int64)[is_off]
        o = np.argsort(oru, kind="stable")
        oru, ooff = oru[o], ooff[o]
        did = np.asarray(pc.fill_null(t["doc_id"].combine_chunks(), 0),
                         np.int64)[~is_off]
        n = np.asarray(pc.fill_null(t["n_tokens"].combine_chunks(), 0),
                       np.int64)[~is_off]
        order = np.argsort(did, kind="stable")
        did, n = did[order], n[order]
        r = did // range_size
        cum = np.cumsum(n) - n  # running prefix within this partition
        # rebase to the co-partitioned range offset at every range boundary
        starts = np.flatnonzero(np.r_[True, r[1:] != r[:-1]])
        base = ooff[np.searchsorted(oru, r[starts])] - cum[starts]
        prev = cum + np.repeat(base, np.diff(np.r_[starts, len(r)]))
        return pa.table({
            "doc_id": pa.array(did),
            "seq_id": pa.array(prev // seq_len),
            "seq_offset": pa.array(prev % seq_len),
        })

    return both.groupby("part").map_groups(per_partition,
                                           batch_format="pyarrow")


def winnow_fingerprint_batch(batch: pa.Table, text_col: str = "text",
                             k: int = 8, window: int = 4) -> pa.Table:
    """Winnowing document fingerprint (Schleimer et al. 2003): rolling
    k-byte hashes, per-window minima, fingerprint = min of the selected
    hashes (compact single-value form — the min of all window minima is
    the global min rolling hash once every hash sits in some window).
    Vectorized: ONE polynomial rolling-hash pass over the batch's
    concatenated utf8 bytes with doc-boundary masking (the round-1 form
    looped python crc32 per byte window)."""
    arr = pc.utf8_lower(batch[text_col].combine_chunks())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # StringArray exposes no .offsets — read the offsets buffer directly
    # (buffers: [validity, offsets, data]); zero-copy. large_string (>2GB
    # blocks) carries int64 offsets — branch on the type (ADVICE r2).
    off_t = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], off_t)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    base = offs[0]
    data = np.frombuffer(arr.buffers()[2], np.uint8)[base:offs[-1]]
    offs = offs - base
    counts = np.diff(offs)
    n = len(counts)
    fp = np.zeros(n, np.uint64)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    m = len(data) - k + 1
    if m > 0:
        h = _rolling_hash(data.astype(np.uint64), k)
        valid = doc_of[:m] == doc_of[k - 1:]
        d, hv = doc_of[:m][valid], h[valid]
        if len(d):
            starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
            fp[d[starts]] = np.minimum.reduceat(hv, starts)
    short = counts < k
    for i in np.flatnonzero(short):  # rare: whole-doc hash, same combine
        seg = data[offs[i]:offs[i + 1]].astype(np.uint64)
        fp[i] = _rolling_hash(seg, len(seg))[0] if len(seg) else 0
    return pa.table({"doc_id": batch["doc_id"].combine_chunks(),
                     "winnow_fp": pa.array(fp.view(np.int64))})


def lang_top_tokens(docs: ray.data.Dataset, k: int = 10,
                    num_parts: int = 32) -> ray.data.Dataset:
    """(lang, rank, token, n): the exact top-``k`` tokens per language
    (labelled ``lang`` column) — grouped heavy hitters, the per-slice
    vocabulary audit run before mixing multilingual corpora.

    Scale plan: blocks collapse to (lang, token) partial counts, ONE
    token-hash exchange makes counts exact (lang rides along — the pair
    key space is vocab x langs but each partition holds only its hash
    slice), and per-partition top-k partials (langs are bounded) merge
    in one task. The global-sort-free grouped top-k pattern."""
    from ..relational import hash_part, single_merge

    def partial(t: pa.Table) -> pa.Table:
        counts, toks = _tokens_flat(t["text"].combine_chunks())
        lang = np.repeat(
            t["lang"].combine_chunks().to_numpy(zero_copy_only=False),
            counts)
        g = pa.table({"lang": pa.array(lang.astype(str), type=pa.string()),
                      "token": pa.array(toks.astype(str), type=pa.string())}) \
            .group_by(["lang", "token"]).aggregate([([], "count_all")])
        th = _crc32_map(g["token"].combine_chunks()
                        .to_numpy(zero_copy_only=False))
        return pa.table({
            "lang": g["lang"], "token": g["token"],
            "pn": pc.cast(g["count_all"], pa.int64()),
            "part": pa.array(hash_part(th.astype(np.int64), num_parts)),
        })

    def local_topk(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "token"]).aggregate([("pn", "sum")])
        lang = g["lang"].combine_chunks().to_numpy(zero_copy_only=False)
        tok = g["token"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["pn_sum"].combine_chunks().to_numpy()
        _, lcode = np.unique(lang, return_inverse=True)
        order = np.lexsort((tok, -n, lcode))
        lang, tok, n, lcode = (lang[order], tok[order], n[order],
                               lcode[order])
        starts = np.flatnonzero(np.r_[True, lcode[1:] != lcode[:-1]]) \
            if len(lcode) else np.empty(0, np.int64)
        rank = np.arange(len(lcode), dtype=np.int64) \
            - np.repeat(starts, np.diff(np.r_[starts, len(lcode)]))
        keep = rank < k
        return pa.table({
            "lang": pa.array(lang[keep].astype(str), type=pa.string()),
            "token": pa.array(tok[keep].astype(str), type=pa.string()),
            "n": pa.array(n[keep]),
        })

    def merge(t: pa.Table) -> pa.Table:
        lang = t["lang"].combine_chunks().to_numpy(zero_copy_only=False)
        tok = t["token"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n"].combine_chunks().to_numpy()
        _, lcode = np.unique(lang, return_inverse=True)
        order = np.lexsort((tok, -n, lcode))
        lang, tok, n, lcode = (lang[order], tok[order], n[order],
                               lcode[order])
        starts = np.flatnonzero(np.r_[True, lcode[1:] != lcode[:-1]]) \
            if len(lcode) else np.empty(0, np.int64)
        rank = np.arange(len(lcode), dtype=np.int64) \
            - np.repeat(starts, np.diff(np.r_[starts, len(lcode)]))
        keep = rank < k
        return pa.table({
            "lang": pa.array(lang[keep].astype(str), type=pa.string()),
            "rank": pa.array(rank[keep] + 1),
            "token": pa.array(tok[keep].astype(str), type=pa.string()),
            "n": pa.array(n[keep]),
        })

    parts = docs.select_columns(["lang", "text"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=4096) \
        .groupby("part") \
        .map_groups(lambda t: local_topk(t.drop_columns(["part"])),
                    batch_format="pyarrow")
    return single_merge(parts, merge)


def collocations(docs: ray.data.Dataset, k: int = 20, min_count: int = 5,
                 num_parts: int = 32, nd: int = 6) -> ray.data.Dataset:
    """(rank, w1, w2, n, pmi): the top-``k`` adjacent-token bigram
    collocations by pointwise mutual information (min support
    ``min_count``) — the corpus phrase-mining pass (tokenizer vocab
    candidates, stopword-glue detection).

    Scale plan: blocks collapse to bigram partial counts and ONE
    bigram-hash exchange + ``min_count`` filter makes the candidate
    set exact and small; per-block unigram partials union into the
    same single merge task, which therefore holds candidate bigrams +
    the (word, n) vocabulary — fine up to vocabulary scale, and past
    it the unigram side takes the tfidf path (top-V cap via
    cms_heavy_hitters, or w-hash co-partition attach like
    way_triangles' degree passes). The merge never holds the corpus,
    only counts."""
    from ..relational import hash_part, single_merge

    def partial(t: pa.Table) -> pa.Table:
        counts, toks = _tokens_flat(t["text"].combine_chunks())
        doc_of = np.repeat(np.arange(len(counts)), counts)
        m = len(toks)
        if m == 0:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "pn": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int64())})
        adj = doc_of[:-1] == doc_of[1:] if m > 1 \
            else np.empty(0, bool)
        w1 = toks[:-1][adj]
        w2 = toks[1:][adj]
        g = pa.table({"w1": pa.array(w1.astype(str), type=pa.string()),
                      "w2": pa.array(w2.astype(str), type=pa.string())}) \
            .group_by(["w1", "w2"]).aggregate([([], "count_all")])
        h = _crc32_map(g["w1"].combine_chunks()
                       .to_numpy(zero_copy_only=False)) \
            ^ (_crc32_map(g["w2"].combine_chunks()
                          .to_numpy(zero_copy_only=False))
               * np.uint64(0x9E3779B97F4A7C15))
        return pa.table({
            "w1": g["w1"], "w2": g["w2"],
            "pn": pc.cast(g["count_all"], pa.int64()),
            "part": pa.array(hash_part(h.astype(np.int64), num_parts)),
        })

    def local_count(t: pa.Table) -> pa.Table:
        g = t.group_by(["w1", "w2"]).aggregate([("pn", "sum")])
        g = g.rename_columns(["w1", "w2", "n"])
        return g.filter(pc.greater_equal(g["n"], min_count))

    def uni_partial(t: pa.Table) -> pa.Table:
        counts, toks = _tokens_flat(t["text"].combine_chunks())
        if not len(toks):
            return pa.table({"w": pa.array([], pa.string()),
                             "un": pa.array([], pa.int64())})
        u, n = np.unique(toks.astype(str), return_counts=True)
        return pa.table({"w": pa.array(u, type=pa.string()),
                         "un": pa.array(n.astype(np.int64))})

    bigrams = docs.select_columns(["text"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=4096) \
        .groupby("part") \
        .map_groups(lambda t: local_count(t.drop_columns(["part"])),
                    batch_format="pyarrow") \
        .map_batches(lambda t: t.append_column(
            "kind", pa.array(np.zeros(len(t), np.int64))),
            batch_format="pyarrow")

    unis = docs.select_columns(["text"]) \
        .map_batches(uni_partial, batch_format="pyarrow", batch_size=4096) \
        .map_batches(lambda t: pa.table({
            "w1": t["w"], "w2": t["w"], "n": t["un"],
            "kind": pa.array(np.ones(len(t), np.int64))}),
            batch_format="pyarrow")

    def merge(t: pa.Table) -> pa.Table:
        from ..util import round_half_away
        kind = t["kind"].combine_chunks().to_numpy()
        uni = t.filter(pa.array(kind == 1))
        ug = uni.group_by("w1").aggregate([("n", "sum")])
        words = ug["w1"].combine_chunks().to_numpy(zero_copy_only=False)
        un = ug["n_sum"].combine_chunks().to_numpy()
        worder = np.argsort(words)
        words, un = words[worder], un[worder]
        total = float(un.sum())
        bg = t.filter(pa.array(kind == 0))
        w1 = bg["w1"].combine_chunks().to_numpy(zero_copy_only=False)
        w2 = bg["w2"].combine_chunks().to_numpy(zero_copy_only=False)
        n = bg["n"].combine_chunks().to_numpy()
        n1 = un[np.searchsorted(words, w1)].astype(np.float64)
        n2 = un[np.searchsorted(words, w2)].astype(np.float64)
        pmi = np.log(n.astype(np.float64) * total / (n1 * n2))
        top = np.lexsort((w2, w1, -pmi))[:k]
        return pa.table({
            "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
            "w1": pa.array(w1[top].astype(str), type=pa.string()),
            "w2": pa.array(w2[top].astype(str), type=pa.string()),
            "n": pa.array(n[top]),
            "pmi": pa.array(np.asarray(round_half_away(pmi[top], nd))),
        })

    return single_merge(bigrams.union(unis), merge)


def vocab_stats(docs: ray.data.Dataset, max_freq: int = 10,
                num_parts: int = 32) -> ray.data.Dataset:
    """(freq, n_words): the corpus FREQUENCY SPECTRUM — how many
    distinct words occur exactly ``freq`` times (freq 1..max_freq; the
    hapax row is freq=1) plus the totals rows freq=0 -> vocabulary size
    and freq=-1 -> total token count. The Good-Turing / Heaps-law
    audit run before smoothing or vocab sizing.

    Scale plan: blocks collapse to (word, count) partials, ONE
    word-hash exchange makes per-word counts exact, each partition
    collapses to its bounded count-of-counts histogram, and the
    (max_freq + 2)-row partials merge in one task — the merge never
    sees words."""
    from ..relational import hash_part, single_merge

    def partial(t: pa.Table) -> pa.Table:
        counts, toks = _tokens_flat(t["text"].combine_chunks())
        if not len(toks):
            return pa.table({"w": pa.array([], pa.string()),
                             "pn": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int64())})
        u, n = np.unique(toks.astype(str), return_counts=True)
        h = _crc32_map(u.astype(object))
        return pa.table({"w": pa.array(u, type=pa.string()),
                         "pn": pa.array(n.astype(np.int64)),
                         "part": pa.array(hash_part(
                             h.astype(np.int64), num_parts))})

    def spectrum(t: pa.Table) -> pa.Table:
        g = t.group_by("w").aggregate([("pn", "sum")])
        n = g["pn_sum"].combine_chunks().to_numpy()
        freq = np.arange(1, max_freq + 1, dtype=np.int64)
        spec = np.array([(n == f).sum() for f in freq], np.int64)
        return pa.table({
            "freq": pa.array(np.r_[freq, [0, -1]]),
            "pn": pa.array(np.r_[spec, [len(n), int(n.sum())]]),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("freq").aggregate([("pn", "sum")])
        g = g.rename_columns(["freq", "n_words"])
        return g.sort_by([("freq", "ascending")])

    return single_merge(
        docs.select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .groupby("part")
        .map_groups(lambda t: spectrum(t.drop_columns(["part"])),
                    batch_format="pyarrow"), merge)


def langid_confusion(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(lang, pred_lang, n): confusion matrix of the stopword-profile
    language identifier against the labelled ``lang`` column — the
    classifier-quality audit run before trusting langid-based filters.

    Scale plan: one fused pass (langid + pair combine per block), then
    the bounded langs x langs partials merge in a single task."""
    from ..relational import single_merge

    def stage(batch: pa.Table) -> pa.Table:
        pred = langid_batch(batch)["pred_lang"]
        g = pa.table({"lang": batch["lang"], "pred_lang": pred}) \
            .group_by(["lang", "pred_lang"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "pred_lang", "pn"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "pred_lang"]).aggregate([("pn", "sum")])
        g = g.rename_columns(["lang", "pred_lang", "n"])
        return g.sort_by([("lang", "ascending"),
                          ("pred_lang", "ascending")])

    return single_merge(docs.select_columns(["doc_id", "lang", "text"])
                        .map_batches(stage, batch_format="pyarrow",
                                     batch_size=4096), merge)


def zipf_slope(docs: ray.data.Dataset, k: int = 100,
               num_parts: int = 32) -> ray.data.Dataset:
    """(k, slope6, intercept6): ordinary-least-squares fit of
    ln(frequency) against ln(rank) over the corpus's top-``k`` words —
    the Zipf-law exponent audit (natural English sits near slope -1;
    a synthetic or template-heavy corpus drifts far from it) run next
    to vocab_stats' Good-Turing spectrum before LM training.

    Scale plan: per-block (word, count) partials, ONE word-hash
    exchange makes counts exact, each partition keeps only its local
    top-``k`` by (count DESC, word ASC) — a true combiner, since every
    word lives in exactly one partition — and the bounded k-per-
    partition candidate set merges in one task that selects the global
    top-``k`` and evaluates the closed-form OLS sums. The tie rule at
    the cut (count DESC, word ASC) is deterministic on both sides."""
    from ..relational import hash_part, single_merge
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        _, toks = _tokens_flat(t["text"].combine_chunks())
        if not len(toks):
            return pa.table({"w": pa.array([], pa.string()),
                             "pn": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int64())})
        u, n = np.unique(toks.astype(str), return_counts=True)
        h = _crc32_map(u.astype(object))
        return pa.table({"w": pa.array(u, type=pa.string()),
                         "pn": pa.array(n.astype(np.int64)),
                         "part": pa.array(hash_part(
                             h.astype(np.int64), num_parts))})

    def topk_local(t: pa.Table) -> pa.Table:
        g = t.group_by("w").aggregate([("pn", "sum")])
        w = np.asarray(g["w"].to_pylist(), dtype=object)
        n = g["pn_sum"].combine_chunks().to_numpy()
        order = np.lexsort((w, -n))[:k]
        return pa.table({"w": pa.array(w[order], pa.string()),
                         "n": pa.array(n[order], pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        w = np.asarray(t["w"].to_pylist(), dtype=object)
        n = t["n"].combine_chunks().to_numpy()
        order = np.lexsort((w, -n))[:k]
        y = np.log(n[order].astype(np.float64))
        x = np.log(np.arange(1, len(order) + 1, dtype=np.float64))
        kk = float(len(order))
        sx, sy = float(x.sum()), float(y.sum())
        sxx, sxy = float((x * x).sum()), float((x * y).sum())
        den = kk * sxx - sx * sx
        slope = (kk * sxy - sx * sy) / den if den != 0.0 else 0.0
        intercept = (sy - slope * sx) / kk if kk else 0.0
        return pa.table({
            "k": pa.array([len(order)], pa.int64()),
            "slope6": pa.array([float(round_half_away(slope, 6))]),
            "intercept6": pa.array([float(round_half_away(intercept, 6))]),
        })

    return single_merge(
        docs.select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .groupby("part").map_groups(topk_local, batch_format="pyarrow"),
        merge)


def neardup_eval(docs: ray.data.Dataset, threshold: float = 0.5,
                 nd: int = 4) -> ray.data.Dataset:
    """(n_true, n_lsh, n_hit, precision4, recall4): quality eval of the
    MinHash-LSH near-dup pipeline against the exact shared-shingle
    ground truth at the same Jaccard threshold — the
    banding-parameters sign-off every dedup deployment runs (recall
    dips when a true pair agrees on no band; precision is 1.0 by
    construction because the LSH leg verifies candidates exactly).

    Scale plan: both legs are the existing distributed operators (one
    corpus pass each); their pair outputs are bounded by the true
    near-dup rate, so the comparison is a union-tag of two small
    tables into one merge task.  Each leg materializes first — reused
    corpus lineage under one union would rerun the reads and can
    deadlock 2.49's shuffle aggregators (the way_triangles
    precedent)."""
    from ..relational import single_merge
    from ..util import round_half_away

    lsh = minhash_lsh_pairs(docs, threshold)
    truth = ngram_jaccard_pairs(docs, threshold, max_df=1 << 62)

    def tag(flag: bool):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({
                "a": pc.cast(t["a"], pa.int64()),
                "b": pc.cast(t["b"], pa.int64()),
                "_lsh": pa.array(np.full(t.num_rows, flag))})
        return f

    def merge(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().to_numpy()
        b = t["b"].combine_chunks().to_numpy()
        is_l = t["_lsh"].combine_chunks().to_numpy(zero_copy_only=False)
        key = (a.astype(np.int64) << np.int64(32)) | b.astype(np.int64)
        lk, tk = key[is_l], key[~is_l]
        n_hit = int(np.isin(lk, tk).sum())
        n_lsh, n_true = len(lk), len(tk)
        prec = n_hit / n_lsh if n_lsh else 1.0
        rec = n_hit / n_true if n_true else 1.0
        return pa.table({
            "n_true": pa.array([n_true], pa.int64()),
            "n_lsh": pa.array([n_lsh], pa.int64()),
            "n_hit": pa.array([n_hit], pa.int64()),
            "precision4": pa.array(round_half_away(
                np.array([prec]), nd), pa.float64()),
            "recall4": pa.array(round_half_away(
                np.array([rec]), nd), pa.float64())})

    both = lsh.map_batches(tag(True), batch_format="pyarrow") \
        .materialize() \
        .union(truth.map_batches(tag(False), batch_format="pyarrow")
               .materialize())
    return single_merge(both, merge)


def doc_novelty(docs: ray.data.Dataset, k: int = 3, nd: int = 6,
                num_parts: int = 16) -> ray.data.Dataset:
    """(doc_id, n_shingles, n_novel, novelty6): per-document novelty —
    the fraction of the doc's DISTINCT word ``k``-gram shingles whose
    global FIRST OWNER (minimum doc_id over the corpus) is the doc
    itself.  The dedup-adjacent freshness profile: boilerplate scores
    near 0, genuinely new text near 1.  Docs with fewer than ``k``
    tokens emit nothing (no shingles).

    Scale plan: per-batch kernels emit each doc's distinct shingles
    (vectorized lexsort dedup) plus a per-doc total row; ONE
    shingle-hash exchange finds each shingle's min owner wholly inside
    a partition and collapses to (owner, novel-count) partials; totals
    and novel counts then merge through one bounded per-doc combiner
    as two columns of the same union — two exchanges total, both
    keyed, nothing corpus-sized on the driver."""
    import pandas as pd

    from ..relational import partial_groupby_agg
    from ..util import round_half_away

    def shingles(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        counts, toks = _tokens_flat(t["text"].combine_chunks())
        n_sh_raw = np.maximum(counts - (k - 1), 0)
        doc_rep = np.repeat(np.arange(len(counts), dtype=np.int64),
                            n_sh_raw)
        if not len(doc_rep):
            return doc_rep, np.empty(0, dtype=object)
        # flat positions of each shingle's first token
        starts = np.cumsum(counts) - counts
        base = np.repeat(starts, n_sh_raw) + (
            np.arange(len(doc_rep), dtype=np.int64)
            - np.repeat(np.cumsum(n_sh_raw) - n_sh_raw, n_sh_raw))
        s = pd.Series(toks[base])
        for j in range(1, k):
            s = s + " " + pd.Series(toks[base + j])
        sv = s.to_numpy(dtype=object)
        order = np.lexsort((sv, doc_rep))
        doc_rep, sv = doc_rep[order], sv[order]
        keep = np.r_[True, (doc_rep[1:] != doc_rep[:-1])
                     | (sv[1:] != sv[:-1])]
        return doc_rep[keep], sv[keep]

    def stage1(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy()
        doc_rep, sv = shingles(t)
        part = _crc32_map(sv) % np.uint32(num_parts) if len(sv) \
            else np.empty(0, np.uint32)
        return pa.table({
            "doc_id": pa.array(ids[doc_rep]),
            "s": pa.array(sv.astype(str) if len(sv) else [],
                          pa.string()),
            "part": pa.array(part.astype(np.int64))})

    def totals(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy()
        doc_rep, _ = shingles(t)
        u, c = np.unique(doc_rep, return_counts=True)
        return pa.table({"doc_id": pa.array(ids[u]),
                         "n_sh": pa.array(c.astype(np.int64)),
                         "n_novel": pa.array(np.zeros(len(u), np.int64))})

    def owners(t: pa.Table) -> pa.Table:
        d = t["doc_id"].combine_chunks().to_numpy()
        sv = np.asarray(t["s"].combine_chunks().to_pylist(), dtype=object)
        order = np.lexsort((d, sv))
        d, sv = d[order], sv[order]
        first = np.r_[True, sv[1:] != sv[:-1]] if len(sv) else \
            np.empty(0, bool)
        u, c = np.unique(d[first], return_counts=True)
        return pa.table({"doc_id": pa.array(u),
                         "n_sh": pa.array(np.zeros(len(u), np.int64)),
                         "n_novel": pa.array(c.astype(np.int64))})

    novel = (docs.map_batches(stage1, batch_format="pyarrow")
             .groupby("part")
             .map_groups(lambda t: owners(t.drop_columns(["part"])),
                         batch_format="pyarrow"))
    tot = docs.map_batches(totals, batch_format="pyarrow")
    g = partial_groupby_agg(novel.union(tot), ["doc_id"],
                            [("n_sh", "sum"), ("n_novel", "sum")],
                            num_parts=num_parts)

    def finish(t: pa.Table) -> pa.Table:
        n_sh = t["n_sh_sum"].combine_chunks().to_numpy()
        n_nov = t["n_novel_sum"].combine_chunks().to_numpy()
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks(),
            "n_shingles": pa.array(n_sh.astype(np.int64)),
            "n_novel": pa.array(n_nov.astype(np.int64)),
            "novelty6": pa.array(round_half_away(
                n_nov / n_sh.astype(np.float64), nd), pa.float64())})

    return g.map_batches(finish, batch_format="pyarrow")


def doc_compression_ratio(docs: ray.data.Dataset, level: int = 6,
                          nd: int = 6,
                          batch_size: int = 4096) -> ray.data.Dataset:
    """(doc_id, raw_len, comp_len, ratio6): zlib(level) compressed
    size per document over the UTF-8 bytes — the classic redundancy
    screen for corpus curation (boilerplate and repetition compress
    far below prose; ratio = comp/raw, lower = more redundant).

    Scale plan: embarrassingly parallel map_batches; zlib is C-speed
    per doc and the blobs never leave the task.  ratio6 =
    round(comp/raw, 6); empty docs report ratio 0."""
    import zlib

    from ..util import round_half_away

    def kernel(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks()
        texts = t["text"].combine_chunks().to_pylist()
        raw = np.empty(len(texts), np.int64)
        comp = np.empty(len(texts), np.int64)
        for i, s in enumerate(texts):
            b = s.encode("utf-8")
            raw[i] = len(b)
            comp[i] = len(zlib.compress(b, level))
        ratio = np.where(raw > 0, comp / np.maximum(raw, 1), 0.0)
        return pa.table({
            "doc_id": ids,
            "raw_len": pa.array(raw),
            "comp_len": pa.array(comp),
            "ratio6": pa.array(round_half_away(ratio, nd),
                               pa.float64())})

    return docs.map_batches(kernel, batch_format="pyarrow",
                            batch_size=batch_size)


def doc_char_entropy(docs: ray.data.Dataset, nd: int = 6,
                     batch_size: int = 8192) -> ray.data.Dataset:
    """(doc_id, n_ch, distinct_ch, ent6): character-unigram Shannon
    entropy (nats) per document — the cheapest gibberish / low-diversity
    screen in a text-curation funnel (base64 blobs and repeated fills
    sit far from prose's ~3 nats).

    Determinism contract: ent = ln(n) - sum(c*ln(c))/n with the inner
    sum accumulated in ASCENDING character order on both sides (exact
    integer counts; the SQL mirror uses an ordered aggregate), so the
    double sequence is identical.  Documents are ASCII by generator
    contract, making byte order == character order.

    Scale plan: embarrassingly parallel; per batch ONE np.bincount over
    (row_index * 256 + byte) and two reduceats — no python per-row
    loop, nothing leaves the task but the stat row."""
    from ..util import round_half_away

    def kernel(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks()
        txt = t["text"].combine_chunks()
        # zero-copy-ish: concatenated utf-8 buffer + offsets
        joined = "".join(txt.to_pylist()).encode("utf-8")
        lens = np.array([len(s.encode("utf-8"))
                         for s in txt.to_pylist()], np.int64)
        b = np.frombuffer(joined, np.uint8).astype(np.int64)
        row = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        cnt = np.bincount(row * 256 + b,
                          minlength=len(lens) * 256) \
            .reshape(len(lens), 256)
        n = cnt.sum(axis=1)
        nz = cnt.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            term = np.where(cnt > 0, nz * np.log(np.maximum(nz, 1.0)),
                            0.0)
        # ascending byte order == ascending char order (ASCII docs);
        # reduceat is SEQUENTIAL left-to-right (numpy's pairwise
        # row-sum would drift from the oracle's ordered aggregate)
        s = np.add.reduceat(term.ravel(),
                            np.arange(0, len(lens) * 256, 256))
        with np.errstate(divide="ignore", invalid="ignore"):
            ent = np.where(n > 0, np.log(np.maximum(n, 1))
                           - s / np.maximum(n, 1), 0.0)
        return pa.table({
            "doc_id": ids,
            "n_ch": pa.array(n.astype(np.int64)),
            "distinct_ch": pa.array((cnt > 0).sum(axis=1)
                                    .astype(np.int64)),
            "ent6": pa.array(round_half_away(ent, nd), pa.float64())})

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(kernel, batch_format="pyarrow",
                     batch_size=batch_size)


def term_burstiness(docs: ray.data.Dataset, min_cf: int = 5,
                    num_parts: int = 32) -> ray.data.Dataset:
    """(token, cf, df, burst6): Church-Gale term burstiness — total
    occurrences over containing-document count (1.0 = the token never
    repeats within a doc; content words burst, function words don't).
    The feature behind burstiness-aware TF-IDF damping and stopword
    discovery.

    Scale plan: each block collapses to per-token (cf, df) partials —
    the (doc, token) dedup for df is block-LOCAL yet globally correct
    because every document's text sits in one row — then ONE token-hash
    exchange sums the partials and filters cf >= ``min_cf`` (bounding
    the output to the repeated-vocabulary tail). Exact integer counts,
    one float division, half-away 6 dp on both sides."""
    from ..relational import hash_part, single_merge
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        counts, toks = _tokens_flat(t["text"].combine_chunks())
        doc = np.repeat(t["doc_id"].combine_chunks().to_numpy(), counts)
        g1 = pa.table({"token": pa.array(toks.astype(str), pa.string()),
                       "doc": pa.array(doc)}) \
            .group_by(["token", "doc"]).aggregate([([], "count_all")])
        g1 = g1.rename_columns(["token", "doc", "c"])
        g2 = g1.group_by("token").aggregate([("c", "sum"),
                                             ([], "count_all")])
        g2 = g2.rename_columns(["token", "cf", "df"])
        th = _crc32_map(g2["token"].combine_chunks()
                        .to_numpy(zero_copy_only=False))
        return pa.table({
            "token": g2["token"],
            "cf": pc.cast(g2["cf"], pa.int64()),
            "df": pc.cast(g2["df"], pa.int64()),
            "part": pa.array(hash_part(th.astype(np.int64), num_parts))})

    def merge(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by("token") \
            .aggregate([("cf", "sum"), ("df", "sum")])
        cf = g["cf_sum"].combine_chunks().to_numpy()
        df = g["df_sum"].combine_chunks().to_numpy()
        keep = cf >= min_cf
        cf, df = cf[keep], df[keep]
        b6 = round_half_away(cf.astype(np.float64) / df.astype(np.float64),
                             6)
        return pa.table({
            "token": g["token"].combine_chunks().filter(pa.array(keep)),
            "cf": pa.array(cf.astype(np.int64)),
            "df": pa.array(df.astype(np.int64)),
            "burst6": pa.array(b6)})

    partials = docs.select_columns(["doc_id", "text"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby("part").map_groups(merge,
                                               batch_format="pyarrow")


def vocab_growth(docs: ray.data.Dataset,
                 checkpoints: tuple = tuple(1 << k for k in range(4, 21)),
                 num_parts: int = 32) -> ray.data.Dataset:
    """(checkpoint, n_tokens, n_distinct): HEAPS'-LAW vocabulary growth
    curve — running token total and distinct-vocabulary size after the
    docs with doc_id < each power-of-two checkpoint. The curve's
    log-log slope is the corpus-health scaling exponent (natural text
    ~0.5; a flattening curve means duplication, a linear one means
    noise/ids); saturated tail checkpoints repeat the full-corpus
    totals by construction.

    Exactness: "first occurrence" is the min-owner fold (doc_novelty's
    convention) — a token counts as distinct at checkpoint c iff its
    MINIMUM containing doc_id < c; all counts integers.

    Scale plan: token totals are embarrassingly parallel per-block
    17-row partials; owners collapse per block to (token, min doc)
    and take ONE token-hash exchange (bounded by vocabulary) whose
    per-partition merge emits 17-row partials too; one tiny final
    merge sums both streams."""
    from ..relational import hash_part, single_merge

    cps = np.array(sorted(checkpoints), np.int64)

    def tot_partial(t: pa.Table) -> pa.Table:
        counts, _ = _tokens_flat(t["text"].combine_chunks())
        doc = t["doc_id"].combine_chunks().to_numpy()
        vals = [int(counts[doc < c].sum()) for c in cps]
        return pa.table({"c": pa.array(cps),
                         "kind": pa.array(["t"] * len(cps), pa.string()),
                         "n": pa.array(vals, pa.int64())})

    def own_partial(t: pa.Table) -> pa.Table:
        counts, toks = _tokens_flat(t["text"].combine_chunks())
        doc = np.repeat(t["doc_id"].combine_chunks().to_numpy(), counts)
        g = pa.table({"token": pa.array(toks.astype(str), pa.string()),
                      "own": pa.array(doc)}) \
            .group_by("token").aggregate([("own", "min")])
        th = _crc32_map(g["token"].combine_chunks()
                        .to_numpy(zero_copy_only=False))
        return pa.table({"token": g["token"],
                         "own": pc.cast(g["own_min"], pa.int64()),
                         "part": pa.array(hash_part(th.astype(np.int64),
                                                    num_parts))})

    def own_merge(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by("token") \
            .aggregate([("own", "min")])
        own = g["own_min"].combine_chunks().to_numpy()
        vals = [int((own < c).sum()) for c in cps]
        return pa.table({"c": pa.array(cps),
                         "kind": pa.array(["d"] * len(cps), pa.string()),
                         "n": pa.array(vals, pa.int64())})

    owners = docs.select_columns(["doc_id", "text"]) \
        .map_batches(own_partial, batch_format="pyarrow",
                     batch_size=8192) \
        .groupby("part").map_groups(own_merge, batch_format="pyarrow")
    totals = docs.select_columns(["doc_id", "text"]) \
        .map_batches(tot_partial, batch_format="pyarrow",
                     batch_size=8192)

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by(["c", "kind"]).aggregate([("n", "sum")])
        c = g["c"].combine_chunks().to_numpy()
        kind = np.asarray(g["kind"].combine_chunks()
                          .to_numpy(zero_copy_only=False))
        n = g["n_sum"].combine_chunks().to_numpy()
        out_c = np.sort(np.unique(c))
        tot = {int(ci): 0 for ci in out_c}
        dis = {int(ci): 0 for ci in out_c}
        for ci, ki, ni in zip(c.tolist(), kind.tolist(), n.tolist()):
            (tot if ki == "t" else dis)[ci] += ni
        return pa.table({
            "checkpoint": pa.array(out_c, pa.int64()),
            "n_tokens": pa.array([tot[int(x)] for x in out_c], pa.int64()),
            "n_distinct": pa.array([dis[int(x)] for x in out_c],
                                   pa.int64())})

    return single_merge(totals.union(owners), finish)


def doc_token_len_hist(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(token_len, n_tokens, share6): token-LENGTH histogram over the
    corpus (character counts of whitespace tokens) — the pre-tokenizer
    fertility probe (a heavy 15+ tail means ids/urls/agglutination
    that will fragment under BPE; mass at 1-2 means over-splitting).

    Scale plan: embarrassingly parallel — one Arrow utf8_length pass
    per block collapses to a bounded (len, n) partial; ONE tiny merge
    sums and divides."""
    from ..relational import single_merge
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        lists = pc.utf8_split_whitespace(
            pc.utf8_lower(t["text"].combine_chunks()))
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        ln = np.asarray(pc.utf8_length(flat)).astype(np.int64)
        ln = ln[ln > 0]              # drop ''-artifacts (str.split parity)
        u, n = np.unique(ln, return_counts=True)
        return pa.table({"token_len": pa.array(u),
                         "n_tokens": pa.array(n.astype(np.int64))})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("token_len").aggregate([("n_tokens", "sum")])
        ln = g["token_len"].combine_chunks().to_numpy()
        order = np.argsort(ln)
        n = g["n_tokens_sum"].combine_chunks().to_numpy()[order]
        tot = int(n.sum())
        return pa.table({
            "token_len": pa.array(ln[order], pa.int64()),
            "n_tokens": pa.array(n.astype(np.int64)),
            "share6": pa.array(round_half_away(
                n.astype(np.float64) / float(tot), 6), pa.float64())})

    return single_merge(
        docs.select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192),
        merge)


def corpus_vocab_overlap(docs: ray.data.Dataset,
                         images: ray.data.Dataset,
                         num_parts: int = 32) -> ray.data.Dataset:
    """(n_doc_vocab, n_cap_vocab, n_shared, jac6): VOCABULARY overlap
    between the documents corpus and the image-caption corpus (same
    whitespace-lowercase tokenization both sides) — the cross-corpus
    domain-shift probe a multimodal trainer reads before sharing one
    tokenizer across text and caption towers.

    Scale plan: each corpus collapses per block to distinct tokens
    with side flags; ONE token-hash exchange (bounded by vocabulary)
    dedups per side and counts intersections; one tiny final sum."""
    from ..relational import hash_part, single_merge

    def side(col: str, flag: int):
        def fn(t: pa.Table) -> pa.Table:
            _, toks = _tokens_flat(t[col].combine_chunks())
            u = np.unique(toks.astype(str))
            th = _crc32_map(u)
            return pa.table({
                "token": pa.array(u, pa.string()),
                "side": pa.array(np.full(len(u), flag, np.int64)),
                "part": pa.array(hash_part(th.astype(np.int64),
                                           num_parts))})
        return fn

    def kernel(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by("token") \
            .aggregate([("side", "min"), ("side", "max")])
        mn = g["side_min"].combine_chunks().to_numpy()
        mx = g["side_max"].combine_chunks().to_numpy()
        n_doc = int((mn == 1).sum())          # docs flag 1
        n_cap = int((mx == 2).sum())          # captions flag 2
        n_shared = int(((mn == 1) & (mx == 2)).sum())
        return pa.table({"nd": pa.array([n_doc], pa.int64()),
                         "nc": pa.array([n_cap], pa.int64()),
                         "ns": pa.array([n_shared], pa.int64())})

    def finish(t: pa.Table) -> pa.Table:
        from ..util import round_half_away
        nd = int(t["nd"].combine_chunks().to_numpy().sum())
        nc = int(t["nc"].combine_chunks().to_numpy().sum())
        ns = int(t["ns"].combine_chunks().to_numpy().sum())
        un = nd + nc - ns
        return pa.table({
            "n_doc_vocab": pa.array([nd], pa.int64()),
            "n_cap_vocab": pa.array([nc], pa.int64()),
            "n_shared": pa.array([ns], pa.int64()),
            "jac6": pa.array([float(round_half_away(
                np.float64(ns / un if un else 0.0), 6))], pa.float64())})

    parts = docs.select_columns(["text"]) \
        .map_batches(side("text", 1), batch_format="pyarrow",
                     batch_size=8192) \
        .union(images.select_columns(["caption"])
               .map_batches(side("caption", 2), batch_format="pyarrow",
                            batch_size=8192)) \
        .groupby("part").map_groups(kernel, batch_format="pyarrow")
    return single_merge(parts, finish)


def doc_len_token_corr(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(lang, n, sum_chars, sum_tokens, corr6): per-language Pearson
    correlation between document character length (the stored n_chars
    column) and whitespace token count — the tokenizer-fertility
    consistency audit (a language whose correlation sags has
    mixed-script or whitespace-free contamination). price_qty_corr's
    exact-moment contract: python-int sums, HUGEINT mirror, identical
    cast-then-multiply float sequence.

    Scale plan: embarrassingly parallel bounded per-lang moment
    partials, one tiny merge."""
    from ..relational import single_merge
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        lang = np.asarray(t["lang"].combine_chunks()
                          .to_numpy(zero_copy_only=False))
        nch = t["n_chars"].combine_chunks().to_numpy().astype(np.int64)
        counts, _ = _tokens_flat(t["text"].combine_chunks())
        out = {"lang": [], "n": [], "sc": [], "st": [], "scc": [],
               "stt": [], "sct": []}
        for lg in sorted(set(lang.tolist())):
            m = lang == lg
            c = nch[m].tolist()
            k = counts[m].tolist()
            out["lang"].append(lg)
            out["n"].append(len(c))
            out["sc"].append(str(sum(c)))
            out["st"].append(str(sum(k)))
            out["scc"].append(str(sum(x * x for x in c)))
            out["stt"].append(str(sum(x * x for x in k)))
            out["sct"].append(str(sum(x * y for x, y in zip(c, k))))
        return pa.table({
            "lang": pa.array(out["lang"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            **{kk: pa.array(out[kk], pa.string())
               for kk in ("sc", "st", "scc", "stt", "sct")}})

    def finish(t: pa.Table) -> pa.Table:
        lang = np.asarray(t["lang"].combine_chunks()
                          .to_numpy(zero_copy_only=False))
        nn = t["n"].combine_chunks().to_numpy()
        cols = {k: [int(x) for x in t[k].to_pylist()]
                for k in ("sc", "st", "scc", "stt", "sct")}
        out = {"lang": [], "n": [], "sum_chars": [], "sum_tokens": [],
               "corr6": []}
        for lg in sorted(set(lang.tolist())):
            m = lang == lg
            n = int(nn[m].sum())
            sc, st, scc, stt, sct = (
                sum(v for v, keep in zip(cols[k], m) if keep)
                for k in ("sc", "st", "scc", "stt", "sct"))
            num = float(n) * float(sct) - float(sc) * float(st)
            den = (np.sqrt(float(n) * float(scc) - float(sc) * float(sc))
                   * np.sqrt(float(n) * float(stt)
                             - float(st) * float(st)))
            corr = num / den if den > 0.0 else 0.0
            out["lang"].append(lg)
            out["n"].append(n)
            out["sum_chars"].append(sc)
            out["sum_tokens"].append(st)
            out["corr6"].append(float(round_half_away(np.float64(corr),
                                                      6)))
        return pa.table({
            "lang": pa.array(out["lang"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "sum_chars": pa.array(out["sum_chars"], pa.int64()),
            "sum_tokens": pa.array(out["sum_tokens"], pa.int64()),
            "corr6": pa.array(out["corr6"], pa.float64())})

    return single_merge(
        docs.select_columns(["lang", "n_chars", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192),
        finish)


def doc_ttr(docs: ray.data.Dataset,
            batch_size: int = 8192) -> ray.data.Dataset:
    """(doc_id, n_tokens, n_types, ttr6): per-document TYPE-TOKEN
    ratio — the lexical-richness screen (low TTR = repetitive
    boilerplate, 1.0 = no word repeats; vocab_stats grades the corpus
    spectrum, this grades each document).

    Scale plan: embarrassingly parallel — each document's text sits in
    one row, so the per-doc distinct count is block-local; nothing
    leaves the task but the stat rows."""
    from ..util import round_half_away

    def kernel(t: pa.Table) -> pa.Table:
        counts, toks = _tokens_flat(t["text"].combine_chunks())
        ids = t["doc_id"].combine_chunks().to_numpy()
        doc = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
        order = np.lexsort((toks.astype(str), doc))
        d2, t2 = doc[order], toks[order]
        newt = np.r_[True, (d2[1:] != d2[:-1]) | (t2[1:] != t2[:-1])] \
            if len(d2) else np.empty(0, bool)
        types = np.zeros(len(ids), np.int64)
        if len(d2):
            np.add.at(types, d2, newt.astype(np.int64))
        n = counts.astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            ttr = types.astype(np.float64) / n.astype(np.float64)
        ttr = np.where(n > 0, ttr, 0.0)
        return pa.table({
            "doc_id": pa.array(ids),
            "n_tokens": pa.array(n),
            "n_types": pa.array(types),
            "ttr6": pa.array(round_half_away(ttr, 6), pa.float64())})

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(kernel, batch_format="pyarrow",
                     batch_size=batch_size)
