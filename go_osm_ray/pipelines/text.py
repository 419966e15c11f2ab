"""Text-analysis and deduplication pipelines over the ``documents`` table.

The training-data-pipeline operator family (round brief): exact dedup,
MinHash-LSH / SimHash / n-gram-Jaccard near-dup, embedding near-dup,
language ID, quality scoring, token counting, fingerprinting. All hot
paths are per-batch vectorized (arrow splits + segment sums) or C-level
(hashlib/zlib); shuffles move candidate rows or partial sketches, never
full documents where avoidable.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Min

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
    md5 fingerprint (hash-partition + per-group first, SURVEY dedup row)."""
    with_fp = docs.map_batches(add_fingerprint, batch_format="pyarrow")
    return (with_fp.select_columns(["doc_id", "fp"])
            .groupby("fp")
            .aggregate(Min("doc_id", alias_name="keeper_id"),
                       Count(alias_name="group_n")))


# ------------------------------------------------------------- minhash LSH

def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    toks = text.lower().split()
    if len(toks) < k:
        toks = toks + ["_pad"] * (k - len(toks))
    return np.unique(np.array(
        [zlib.crc32(" ".join(toks[i:i + k]).encode()) for i in range(len(toks) - k + 1)],
        dtype=np.uint64))


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
    """Actor-pool stage: per-doc minhash signature -> (band_id, band_hash)
    rows. Params built once per actor in __init__."""

    def __init__(self, num_hashes: int = 64, bands: int = 16):
        self.num = num_hashes
        self.bands = bands
        self.rows = num_hashes // bands
        _mh_params(num_hashes)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].combine_chunks().to_numpy()
        out_doc, out_band, out_hash = [], [], []
        for did, t in zip(ids, texts):
            sig = minhash_signature(t, self.num)
            for b in range(self.bands):
                h = zlib.crc32(sig[b * self.rows:(b + 1) * self.rows].tobytes())
                out_doc.append(did)
                out_band.append(b)
                out_hash.append(h)
        return pa.table({
            "doc_id": pa.array(np.array(out_doc, np.int64)),
            "band_id": pa.array(np.array(out_band, np.int64)),
            "band_hash": pa.array(np.array(out_hash, np.int64)),
        })


def _bucket_pairs_vec(key: np.ndarray, doc: np.ndarray,
                      sig: np.ndarray | None = None):
    """All unordered (a, b) doc pairs sharing a bucket key — vectorized:
    one lexsort, then a python loop ONLY over buckets with >= 2 members
    (rare). Replaces groupby().map_groups(per_bucket_fn), which paid one
    Ray+pandas group-call per bucket — measured ~9 s for 80 K mostly
    singleton buckets vs ~50 ms here."""
    order = np.lexsort((doc, key))
    k, d = key[order], doc[order]
    s = sig[order] if sig is not None else None
    _, start, counts = np.unique(k, return_index=True, return_counts=True)
    a_out, b_out, sa_out, sb_out = [], [], [], []
    for st, c in zip(start[counts >= 2], counts[counts >= 2]):
        ii, jj = np.triu_indices(int(c), k=1)
        ids = d[st:st + c]
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


def _dedup_pairs(a: np.ndarray, b: np.ndarray):
    """Unique (a, b) pairs via one packed-int64 unique (doc ids < 2^31)."""
    pk = np.unique(a.astype(np.int64) * (1 << 31) + b.astype(np.int64))
    return pk >> 31, pk & ((1 << 31) - 1)


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa = set(_shingle_hashes(a, k).tolist())
    sb = set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_lsh_pairs(docs: ray.data.Dataset, threshold: float = 0.5,
                      num_hashes: int = 64, bands: int = 16,
                      concurrency: int | tuple[int, int] = (2, 8)) -> ray.data.Dataset:
    """Near-dup candidate pairs via MinHash banding, verified by exact
    shingle Jaccard >= threshold. Shuffle key = (band_id, band_hash);
    verification joins the two documents' texts via a broadcast lookup
    (documents table is the small side at verify time because candidates
    are rare; at 10^12 scale verification co-partitions by min(doc_id)).
    Output: (a, b, jac6) with a < b, deduped.
    """
    sigs = docs.map_batches(MinHashStage, fn_constructor_args=(num_hashes, bands),
                            batch_format="pyarrow", concurrency=concurrency)

    def pairgen(t: pa.Table) -> pa.Table:
        # bucket key packs (band_hash, band_id); crc32 band hashes < 2^32
        key = (t["band_hash"].combine_chunks().to_numpy() * bands
               + t["band_id"].combine_chunks().to_numpy())
        doc = t["doc_id"].combine_chunks().to_numpy()
        a, b = _bucket_pairs_vec(key, doc)
        a, b = _dedup_pairs(a, b)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    # The band table is tiny after the signature stage (bands x docs
    # rows, 3 int64 cols), so candidate generation is ONE vectorized
    # task; at 10^12-doc scale this repartition(1) becomes the
    # groupby((band_id, band_hash)) shuffle with the same kernel run
    # per partition.
    cand = sigs.repartition(1).map_batches(pairgen, batch_format="pyarrow")

    from ..relational import broadcast_table
    texts_ref = broadcast_table(docs, ["doc_id", "text"])

    def verify(batch: pa.Table) -> pa.Table:
        t = ray.get(texts_ref)
        lookup = dict(zip(t["doc_id"].to_numpy(),
                          t["text"].to_pylist()))
        a = batch["a"].combine_chunks().to_numpy()
        b = batch["b"].combine_chunks().to_numpy()
        jac = np.array([jaccard(lookup[int(x)], lookup[int(y)]) for x, y in zip(a, b)])
        keep = jac >= threshold
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep]),
                         "jac6": pa.array(np.round(jac[keep], 6))})
    return cand.map_batches(verify, batch_format="pyarrow")


# ------------------------------------------------------------- simhash

def ngram_jaccard_pairs(docs: ray.data.Dataset, threshold: float = 0.5,
                        k: int = 3, max_df: int = 64) -> ray.data.Dataset:
    """Exact n-gram-Jaccard near-dup pairs via shared-shingle blocking:
    docs sharing >= 1 (non-ubiquitous) k-shingle are candidates, then the
    exact shingle Jaccard >= threshold verifies.

    Buckets bigger than ``max_df`` are dropped before pair generation —
    the standard common-shingle cutoff: a shingle appearing in more than
    max_df docs is uninformative and its bucket would emit O(df^2)
    candidate pairs (skew control; any true near-dup pair at Jaccard>=0.5
    still shares many rarer shingles). Same shuffle shape as
    minhash_lsh_pairs: (shingle_hash, doc_id) rows -> bucket pair kernel
    -> broadcast-text verify.
    """
    def shingle_stage(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].combine_chunks().to_numpy()
        out_doc, out_sh = [], []
        for did, t in zip(ids, batch["text"].to_pylist()):
            sh = _shingle_hashes(t, k)
            out_doc.append(np.full(len(sh), did, np.int64))
            out_sh.append(sh.astype(np.int64))
        return pa.table({"doc_id": pa.array(np.concatenate(out_doc)),
                         "shingle": pa.array(np.concatenate(out_sh))})

    rows = docs.map_batches(shingle_stage, batch_format="pyarrow")

    def pairgen(t: pa.Table) -> pa.Table:
        key = t["shingle"].combine_chunks().to_numpy()
        doc = t["doc_id"].combine_chunks().to_numpy()
        # per-doc distinct-shingle counts (rows are unique per doc)
        docs_u, doc_cnt = np.unique(doc, return_counts=True)
        # common-shingle cutoff before pair expansion
        u, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
        keep = cnt[inv] <= max_df
        a, b = _bucket_pairs_vec(key[keep], doc[keep])
        if not len(a):
            e = pa.array(np.empty(0, np.int64))
            return pa.table({"a": e, "b": e,
                             "jac6": pa.array(np.empty(0, np.float64))})
        # EXACT jaccard from the blocking itself, no text re-verify: a
        # pair appears once per shared shingle, so its pre-dedup
        # multiplicity IS |A∩B|; |A∪B| = |A|+|B|-|A∩B| from the per-doc
        # counts. (A python re-shingling verify over the 1.1M candidate
        # pairs at sf0.1 was measured at ~90 s; this is ~1 s.) When the
        # max_df cutoff fires, the computed jaccard is a LOWER bound
        # (dropped ubiquitous shingles shrink the intersection), so
        # filtering >= threshold yields no false positives.
        pk, inter = np.unique(a * (1 << 31) + b, return_counts=True)
        a, b = pk >> 31, pk & ((1 << 31) - 1)
        ca = doc_cnt[np.searchsorted(docs_u, a)]
        cb = doc_cnt[np.searchsorted(docs_u, b)]
        jac = inter / (ca + cb - inter)
        m = jac >= threshold
        return pa.table({"a": pa.array(a[m]), "b": pa.array(b[m]),
                         "jac6": pa.array(np.round(jac[m], 6))})

    # the shingle table shuffles once; at 10^12-doc scale repartition(1)
    # becomes a groupby(shingle-hash range) with the same kernel
    return rows.repartition(1).map_batches(pairgen, batch_format="pyarrow")


def dedup_groups(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """Near-dup pair list -> connected components: (doc_id, group_id)
    with group_id = smallest doc_id in the component (the canonical
    keeper). Pairs are tiny relative to the corpus (they survived
    LSH + verify), so the union-find runs in ONE task over the collected
    edge list; at larger pair volumes this becomes iterative
    label-propagation over a (doc_id -> min neighbor label) groupby
    until fixpoint. Vectorized path-halving union-find on dense-ranked
    ids."""
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
    return pairs.repartition(1).map_batches(components, batch_format="pyarrow")


def dedup_keep(docs: ray.data.Dataset, pairs: ray.data.Dataset,
               id_col: str = "doc_id") -> ray.data.Dataset:
    """Near-dup purge: keep every doc that is its component's canonical
    (smallest-id) member — docs in no pair are all keepers. The group
    table is broadcast (it is small by construction); the corpus streams
    through one vectorized membership filter."""
    groups = dedup_groups(pairs)
    from ..relational import broadcast_table
    drop_ref = broadcast_table(
        groups.filter(expr="doc_id != group_id"), ["doc_id"])

    def keep(batch: pa.Table) -> pa.Table:
        t = ray.get(drop_ref)
        drop = pa.array(t["doc_id"].to_numpy(), pa.int64())
        m = pc.invert(pc.is_in(batch[id_col], value_set=drop))
        return batch.filter(m)
    return docs.map_batches(keep, batch_format="pyarrow")


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


def simhash_pairs(docs: ray.data.Dataset, max_hamming: int = 3) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: 4-band exact-match blocking (any pair
    within hamming<=3 shares at least one of 4 16-bit bands), then exact
    hamming verify inside each bucket group."""
    def sim_stage(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].combine_chunks().to_numpy()
        sigs = simhash64_batch(batch["text"].to_pylist())
        doc, band, key, sig = [], [], [], []
        for d, s in zip(ids, sigs):
            sv = int(s)
            if sv >= 1 << 63:  # two's-complement into int64
                sv -= 1 << 64
            for b in range(4):
                doc.append(d)
                band.append(b)
                key.append(int((s >> np.uint64(16 * b)) & np.uint64(0xFFFF)))
                sig.append(sv)
        return pa.table({"doc_id": pa.array(doc, pa.int64()),
                         "band_id": pa.array(band, pa.int64()),
                         "band_key": pa.array(key, pa.int64()),
                         "sig": pa.array(sig, pa.int64())})

    sigs = docs.map_batches(sim_stage, batch_format="pyarrow")

    def pairgen(t: pa.Table) -> pa.Table:
        key = (t["band_key"].combine_chunks().to_numpy() * 4
               + t["band_id"].combine_chunks().to_numpy())
        doc = t["doc_id"].combine_chunks().to_numpy()
        sig = t["sig"].combine_chunks().to_numpy()
        a, b, _, _ = _bucket_pairs_vec(key, doc, sig)
        a, b = _dedup_pairs(a, b)
        if not len(a):
            e = pa.array(np.empty(0, np.int64))
            return pa.table({"a": e, "b": e, "hamming": e})
        # vectorized hamming: map pair ids -> sigs via sorted uniques,
        # then unpackbits popcount (a python bin() loop was the hot spot)
        ud, uidx = np.unique(doc, return_index=True)
        sig_u = sig[uidx].astype(np.uint64)
        x = sig_u[np.searchsorted(ud, a)] ^ sig_u[np.searchsorted(ud, b)]
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                            axis=1).sum(axis=1).astype(np.int64)
        m = ham <= max_hamming
        return pa.table({"a": pa.array(a[m]), "b": pa.array(b[m]),
                         "hamming": pa.array(ham[m])})

    # band table is small (4 rows/doc); one vectorized task — at scale
    # this becomes the groupby((band_id, band_key)) shuffle (see
    # minhash_lsh_pairs note)
    return sigs.repartition(1).map_batches(pairgen, batch_format="pyarrow")


# ------------------------------------------------------------- embeddings

def embedding_neardup(embeddings: ray.data.Dataset, threshold: float = 0.95,
                      planes: int = 16) -> ray.data.Dataset:
    """Near-dup vec pairs (cosine >= threshold) via random-hyperplane LSH
    sign buckets, then exact cosine verify per bucket."""
    rs = np.random.RandomState(4321)
    dim = len(embeddings.take(1)[0]["embedding"])
    H = rs.normal(size=(dim, planes))
    H_ref = ray.put(H)

    def bucketize(batch: pa.Table) -> pa.Table:
        planes_m = ray.get(H_ref)
        emb = np.stack(batch["embedding"].combine_chunks().to_numpy(zero_copy_only=False)).astype(np.float64)
        nrm = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        signs = (nrm @ planes_m) > 0
        keys = signs.dot(1 << np.arange(planes_m.shape[1], dtype=np.int64))
        out = pa.table({
            "vec_id": batch["vec_id"].combine_chunks(),
            "bucket": pa.array(keys.astype(np.int64)),
            "embedding": batch["embedding"].combine_chunks(),
        })
        return out

    buckets = embeddings.map_batches(bucketize, batch_format="pyarrow")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "cos6": pd.Series(dtype=np.float64)})
        df = df.sort_values("vec_id")
        ids = df["vec_id"].to_numpy()
        emb = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        nrm = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        sims = nrm @ nrm.T
        ii, jj = np.triu_indices(len(ids), k=1)
        m = sims[ii, jj] >= threshold
        return pd.DataFrame({"a": ids[ii[m]], "b": ids[jj[m]],
                             "cos6": np.round(sims[ii[m], jj[m]], 6)})

    pairs = buckets.groupby("bucket").map_groups(verify, batch_format="pandas")
    if pairs.count() == 0:
        return pairs
    from ray.data.aggregate import Max
    return pairs.groupby(["a", "b"]).aggregate(Max("cos6", alias_name="cos6"))


# ------------------------------------------------------------- text analysis

def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic language ID: distinct-token stoplist overlap per language
    (vectorized: one arrow split + per-language membership segment-sum)."""
    offsets, flat = _split_tokens(batch[text_col].combine_chunks())
    n = len(batch)
    scores = np.zeros((n, len(LANGS)), np.int64)
    for li, lang in enumerate(LANGS):
        member = np.asarray(pc.is_in(flat, value_set=pa.array(STOPLISTS[lang])))
        # distinct overlap: count distinct matched stopwords per row
        # (cheap trick: count first occurrences only, via per-row sorting cost
        #  avoided — stoplists are small, count each stopword once)
        for w in STOPLISTS[lang]:
            hit = np.asarray(pc.equal(flat, w)).astype(bool)
            scores[:, li] += (_seg_count(hit, offsets) > 0)
    best = scores.max(axis=1)
    pred_idx = scores.argmax(axis=1)  # argmax -> first max -> alphabetical (LANGS sorted)
    pred = np.where(best > 0, np.array(LANGS, object)[pred_idx], "und")
    return pa.table({
        "doc_id": batch["doc_id"].combine_chunks(),
        "pred_lang": pa.array(pred.tolist(), pa.string()),
    })


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


def winnow_fingerprint_batch(batch: pa.Table, text_col: str = "text",
                             k: int = 8, window: int = 4) -> pa.Table:
    """Winnowing document fingerprint (Schleimer et al. 2003): rolling
    k-gram crc32 hashes, per-window minima, fingerprint = min of the
    selected hashes (compact single-value form)."""
    out_id, out_fp = [], []
    ids = batch["doc_id"].combine_chunks().to_numpy()
    for did, text in zip(ids, batch[text_col].to_pylist()):
        s = text.lower().encode()
        if len(s) < k:
            hashes = np.array([zlib.crc32(s)], np.int64)
        else:
            hashes = np.array([zlib.crc32(s[i:i + k]) for i in range(len(s) - k + 1)],
                              np.int64)
        if len(hashes) >= window:
            mins = np.array([hashes[i:i + window].min()
                             for i in range(len(hashes) - window + 1)], np.int64)
        else:
            mins = hashes
        out_id.append(did)
        out_fp.append(int(mins.min()))
    return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                     "winnow_fp": pa.array(out_fp, pa.int64())})
