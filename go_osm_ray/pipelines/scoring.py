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


def tfidf_score(docs: ray.data.Dataset, n_docs: int,
                text_col: str = "text", id_col: str = "doc_id",
                nd: int = 6) -> ray.data.Dataset:
    """(doc_id, tfidf6): mean ln(N/df) over the doc's tokens — the
    rare-word-weighted quality score.  The df table broadcasts once;
    at web scale cap it to a top-V vocabulary first (rare tails get
    idf ~= ln N anyway; pick V with sketch.cms_heavy_hitters) so the
    broadcast stays a few hundred MB, or swap the broadcast for a
    word-hash co-partition of tokens and df when even V is too large."""
    df_tbl = document_frequencies(docs, text_col)
    refs = df_tbl.to_arrow_refs()
    live = [t for t in ray.get(refs) if t.num_rows]
    vocab = pa.concat_tables([t.replace_schema_metadata(None) for t in live]) \
        if live else pa.table({"word": pa.array([], pa.string()),
                               "df": pa.array([], pa.int64())})
    vocab_ref = ray.put(vocab.combine_chunks())

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
        tok_idf = lut.reindex(toks).to_numpy(np.float64)  # df>=1 by constr.
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
