"""Corpus-quality filtering: repetition stats + regex redaction.

Gopher-style repetition heuristics (Rae et al. 2021 §A1.1 — duplicate
word fraction, most-common-n-gram fraction) as ONE vectorized Arrow
kernel per batch, and RE2 regex redaction (PII scrubbing) via
``pyarrow.compute.replace_substring_regex`` — both embarrassingly
parallel map_batches stages: no shuffle, no state, linear at 100 TB.

Oracle parity: the stats are mirrored in DuckDB list SQL
(``string_split`` / ``list_distinct`` / bigram unnest) and the
redaction in ``regexp_replace(..., 'g')`` — Arrow and DuckDB both use
RE2, so the patterns behave identically on both sides.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import round_half_away

# keep = not dominated by repetition (Gopher drops dup-word-heavy and
# single-ngram-heavy pages; thresholds are corpus-tuning knobs)
DUP_WORD_MAX = 0.6
TOP_BIGRAM_MAX = 0.2


def repetition_batch(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id",
                     dup_word_max: float = DUP_WORD_MAX,
                     top_bigram_max: float = TOP_BIGRAM_MAX) -> pa.Table:
    """Per-doc repetition stats, one vectorized pass:

    - ``n_words``     — space-separated word count
    - ``dup_word6``   — 1 - distinct_words / n_words
    - ``top_bigram6`` — occurrences of the most frequent bigram /
                        (n_words - 1); 0.0 when the doc has < 2 words
    - ``keep``        — both fractions under their thresholds

    Whole batch at once: flatten the split list array, dictionary-encode
    words to codes, and count distinct (row, code) / max (row, bigram)
    pairs with packed-int64 np.unique — no per-row python."""
    nrows = len(batch)
    words = pc.split_pattern(
        pc.utf8_lower(batch[text_col].combine_chunks()), " ")
    counts = np.asarray(pc.list_value_length(words), np.int64)
    flat = words.flatten()
    enc = flat.dictionary_encode()
    codes = np.asarray(enc.indices, np.int64)
    k = np.int64(max(len(enc.dictionary), 1))
    row = np.repeat(np.arange(nrows, dtype=np.int64), counts)
    # (row, code, code) packs into one int64; loud failure beats silent
    # wrap (ADVICE r2 on packed-key overflow).  Shrink batch_size if hit.
    if len(codes) and int(nrows) * int(k) * int(k) >= 2 ** 63:
        raise ValueError(f"repetition_batch pack overflow: {nrows} rows x "
                         f"{k} distinct words; reduce batch_size")

    distinct = np.zeros(nrows, np.int64)
    if len(codes):
        uniq_rows = np.unique(row * k + codes) // k
        np.add.at(distinct, uniq_rows, 1)

    top_bg = np.zeros(nrows, np.int64)
    if len(codes) > 1:
        same_row = row[1:] == row[:-1]
        bg = (row[:-1] * k + codes[:-1]) * k + codes[1:]
        pairs, pair_n = np.unique(bg[same_row], return_counts=True)
        np.maximum.at(top_bg, (pairs // k) // k, pair_n)

    nw = counts.astype(np.float64)
    dup6 = round_half_away(
        np.where(counts > 0, 1.0 - distinct / np.maximum(nw, 1.0), 0.0), 6)
    nbg = np.maximum(counts - 1, 1).astype(np.float64)
    topbg6 = round_half_away(
        np.where(counts > 1, top_bg / nbg, 0.0), 6)
    keep = (dup6 <= dup_word_max) & (topbg6 <= top_bigram_max)
    return pa.table({
        id_col: batch[id_col].combine_chunks(),
        "n_words": pa.array(counts),
        "dup_word6": pa.array(dup6, pa.float64()),
        "top_bigram6": pa.array(topbg6, pa.float64()),
        "keep": pa.array(keep),
    })


# RE2-safe defaults (Arrow and DuckDB both run RE2): digit runs and
# email-shaped tokens.  No backreferences/lookaround — RE2 has neither.
REDACT_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"[0-9]+", "<NUM>"),
)


def normalize_batch(batch: pa.Table, col: str = "text",
                    out_col: str = "norm_text") -> pa.Table:
    """Canonical text normalization (the pass every corpus runs before
    exact/near dedup): NFC unicode normalization -> lowercase ->
    collapse whitespace runs to one space -> trim.  All four are Arrow
    kernels (RE2 for the collapse), mirrored exactly by DuckDB
    ``trim(regexp_replace(lower(nfc_normalize(text)), '\\s+', ' ',
    'g'))`` — verified identical on ligature/fullwidth/combining-mark
    inputs.  The final trim strips SPACES only (``utf8_trim`` with
    ``' '``), matching DuckDB ``trim()`` exactly: RE2 ``\\s`` excludes
    VT/NEL/LS/PS, so those survive the collapse on both sides and a
    whitespace-class trim here would diverge from the SQL mirror.
    Embarrassingly parallel; no shuffle."""
    arr = batch[col].combine_chunks()
    arr = pc.utf8_normalize(arr, form="NFC")
    arr = pc.utf8_lower(arr)
    arr = pc.replace_substring_regex(arr, pattern=r"\s+", replacement=" ")
    arr = pc.utf8_trim(arr, characters=" ")
    return batch.append_column(out_col, arr)


def quality_funnel(docs, min_chars: int = 150, min_words: int = 30,
                   min_stop: float = 0.03, wl_lo: float = 4.35,
                   wl_hi: float = 4.72):
    """Per-source curation funnel (the RefinedWeb/CCNet accounting view):
    how many documents of each ``source`` survive each CUMULATIVE
    filter stage —

      n_total  — all docs
      n_len    — AND n_chars >= min_chars
      n_tok    — AND n_words >= min_words
      n_stopw  — AND stop_ratio >= min_stop (rounded metric, as served
                 by doc_quality / its DuckDB mirror)
      n_clean  — AND avg_word_len in [wl_lo, wl_hi]

    One vectorized pass reusing quality_batch's metrics, per-block Acero
    partial sums per source, one bounded merge (source spaces are
    catalog-sized; swap the final for a hash_part exchange if not)."""
    from ..relational import single_merge
    from .text import quality_batch

    cols = ("n_total", "n_len", "n_tok", "n_stopw", "n_clean")

    def partial(t: pa.Table) -> pa.Table:
        q = quality_batch(t)
        nc = q["n_chars"].to_numpy()
        nw = q["n_words"].to_numpy()
        sr = q["stop_ratio"].to_numpy()
        wl = q["avg_word_len"].to_numpy()
        f1 = nc >= min_chars
        f2 = f1 & (nw >= min_words)
        f3 = f2 & (sr >= min_stop)
        f4 = f3 & (wl >= wl_lo) & (wl <= wl_hi)
        stage = pa.table({
            "source": t["source"].combine_chunks(),
            "n_total": pa.array(np.ones(len(t), np.int64)),
            "n_len": pa.array(f1.astype(np.int64)),
            "n_tok": pa.array(f2.astype(np.int64)),
            "n_stopw": pa.array(f3.astype(np.int64)),
            "n_clean": pa.array(f4.astype(np.int64)),
        })
        g = stage.group_by("source").aggregate([(c, "sum") for c in cols])
        return g.rename_columns(["source", *cols])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([(c, "sum") for c in cols])
        out = {"source": g["source"]}
        for c in cols:
            out[c] = pc.cast(g[f"{c}_sum"], pa.int64())
        return pa.table(out)

    return single_merge(docs.map_batches(partial, batch_format="pyarrow"),
                        merge)


def redact_batch(batch: pa.Table, col: str,
                 patterns: Sequence[tuple[str, str]] = REDACT_PATTERNS,
                 out_col: str | None = None) -> pa.Table:
    """Apply each (pattern, replacement) in order with RE2
    ``replace_substring_regex`` (global, like regexp_replace 'g')."""
    arr = batch[col].combine_chunks()
    for pat, rep in patterns:
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement=rep)
    return batch.set_column(batch.schema.get_field_index(col),
                            out_col or col, arr)
