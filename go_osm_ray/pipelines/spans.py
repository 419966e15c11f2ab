"""Exact duplicated-substring spans — training-data exact-substring
dedup in the style of Lee et al. 2022 ("Deduplicating Training Data
Makes Language Models Better"): a fixed CHARACTER window slid at a
fixed stride; a window is duplicated when it occurs in >= 2 distinct
documents; the result is every (doc_id, pos) carrying one.

The reference engine has no analog (it dedups whole elements by id,
/root/reference/osm/Planet.go:160-163); this is the span-granular
sibling of exact_dedup for a 100 TB web corpus.

Physical plan, Ray-Data-first:
  1. one vectorized stage slices windows with pyarrow
     utf8_slice_codeunits over the WHOLE text column per position
     offset — the python loop is over the bounded position count
     (max_chars/stride per batch), never over rows;
  2. the exchange keys on hash_part(crc of the window string), so
     every distinct window lands wholly in one partition;
  3. each partition resolves exact duplicates with one Acero group_by
     (distinct doc count per window) + an is_in semi-filter back over
     its rows.

Windows travel as their strings by default, which is exact and fine
while window << doc size; ``carry="hash"`` is the 100 TB path — only
(win_hash, doc_id, pos) crosses the exchange (24 bytes/window instead
of ~window bytes) and duplicate resolution groups on the 64-bit hash,
accepting ~n^2/2^65 false-dup collisions (re-verify against storage
if that matters).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..relational import hash_part

WIN = 64
STRIDE = 32
_MULT = np.uint64(1099511628211)  # FNV-64 prime


def _str_hash64(arr: pa.Array) -> np.ndarray:
    """uint64 polynomial (Horner) hash of each utf8 string's full byte
    run — vectorized over ROWS per byte position, so the python loop is
    bounded by the window's byte width (<= 4*WIN), never the row count."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off_t = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], off_t)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    base = offs[0]
    data = np.frombuffer(arr.buffers()[2], np.uint8)[base:offs[-1]] \
        .astype(np.uint64)
    offs = offs - base
    counts = np.diff(offs)
    h = np.zeros(len(counts), np.uint64)
    starts = offs[:-1]
    with np.errstate(over="ignore"):
        for j in range(int(counts.max()) if len(counts) else 0):
            m = counts > j
            h[m] = h[m] * _MULT + data[starts[m] + j]
    return h


def window_batch(t: pa.Table, text_col: str = "text",
                 num_parts: int = 32, carry: str = "win") -> pa.Table:
    """(doc_id, pos, win|win_hash, part) for every full WIN-char window
    at STRIDE-char steps. Character (codepoint) offsets, matching SQL
    substr semantics. ``carry="hash"`` ships only the 64-bit crc key."""
    texts = t[text_col].combine_chunks()
    ids = t["doc_id"].combine_chunks()
    n = np.asarray(pc.utf8_length(texts), np.int64)
    out_id, out_pos, out_win = [], [], []
    pos = 0
    max_n = int(n.max()) if len(n) else 0
    while pos + WIN <= max_n:
        mask = n >= pos + WIN
        wins = pc.utf8_slice_codeunits(texts.filter(pa.array(mask)),
                                       start=pos, stop=pos + WIN)
        out_id.append(ids.filter(pa.array(mask)))
        out_pos.append(pa.array(np.full(len(wins), pos, np.int64)))
        out_win.append(wins)
        pos += STRIDE
    key_col = "win" if carry == "win" else "win_hash"
    if not out_id:
        # inherit the input types so empty blocks unify with full ones
        # (a large_string text column yields large_string windows)
        empty_key = pa.array([], t[text_col].type if carry == "win"
                             else pa.int64())
        return pa.table({"doc_id": pa.array([], t["doc_id"].type),
                         "pos": pa.array([], pa.int64()),
                         key_col: empty_key,
                         "part": pa.array([], pa.int64())})
    win = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                            else a for a in out_win])
    h = _str_hash64(win)  # vectorized; _col_hash would crc per unique row
    if carry == "win":
        key_arr, part_key = win, h
    else:
        key_arr, part_key = pa.array(h.view(np.int64)), h
    return pa.table({
        "doc_id": pa.concat_arrays([a.combine_chunks()
                                    if isinstance(a, pa.ChunkedArray) else a
                                    for a in out_id]),
        "pos": pa.concat_arrays(out_pos),
        key_col: key_arr,
        "part": pa.array(hash_part(part_key, num_parts)),
    })


def _resolve(t: pa.Table) -> pa.Table:
    """Partition-local exact resolution: windows seen in >= 2 distinct
    docs -> emit their (doc_id, pos) rows."""
    key = "win" if "win" in t.schema.names else "win_hash"
    g = t.select([key, "doc_id"]).group_by(key) \
        .aggregate([("doc_id", "count_distinct")])
    dup = g.filter(pc.greater(g["doc_id_count_distinct"], 1))[key]
    out = t.filter(pc.is_in(t[key], value_set=dup.combine_chunks()))
    return pa.table({"doc_id": out["doc_id"], "pos": out["pos"]})


def span_dedup(docs: ray.data.Dataset, text_col: str = "text",
               num_parts: int = 32, carry: str = "win") -> ray.data.Dataset:
    """(doc_id, pos): every stride-aligned WIN-char window that also
    appears (exactly) in at least one other document. ``carry="hash"``
    is the 100 TB exchange (fixed 24 bytes/window, collision-accepted)."""
    wins = docs.map_batches(
        lambda t: window_batch(t, text_col, num_parts, carry),
        batch_format="pyarrow")
    return wins.groupby("part").map_groups(_resolve, batch_format="pyarrow")


# ------------------------------------------------------------- line dedup

LINE_K = 10  # words per pseudo-line


def _chunk_lists(t: pa.Table, text_col: str, k: int
                 ) -> tuple[pa.Array, pa.Array, np.ndarray]:
    """Row-major flat chunk strings + per-row chunk counts: split each
    text into consecutive ``k``-word pseudo-lines (the last may be
    short).  The python loop is over the bounded chunk-index range
    (max_words/k per batch), each step two Arrow kernels (list_slice +
    binary_join) over the whole column — never a loop over rows."""
    words = pc.split_pattern(t[text_col].combine_chunks(), " ")
    nw = pc.list_value_length(words).to_numpy().astype(np.int64)
    n_chunks = -(-nw // k)  # ceil
    max_c = int(n_chunks.max()) if len(n_chunks) else 0
    per_c = []          # chunk strings, c-major
    rows_c = []         # source row index per chunk
    for c in range(max_c):
        mask = n_chunks > c
        sel = words.filter(pa.array(mask))
        ch = pc.binary_join(pc.list_slice(sel, c * k, (c + 1) * k), " ")
        per_c.append(ch.combine_chunks() if isinstance(ch, pa.ChunkedArray)
                     else ch)
        rows_c.append(np.flatnonzero(mask))
    if not per_c:
        return (pa.array([], pa.string()), pa.array([], pa.int64()),
                n_chunks)
    flat_cmaj = pa.concat_arrays(per_c)
    rows = np.concatenate(rows_c)
    cidx = np.concatenate([np.full(len(r), c, np.int64)
                           for c, r in enumerate(rows_c)])
    order = np.lexsort((cidx, rows))  # -> row-major
    return (flat_cmaj.take(pa.array(order)),
            pa.array(cidx[order]), n_chunks)


def line_dedup(docs: ray.data.Dataset, k: int = LINE_K,
               text_col: str = "text",
               num_parts: int = 32) -> ray.data.Dataset:
    """C4-style corpus line dedup (Raffel et al. 2020 §2.2 apply the
    rule at three-sentence granularity; here a "line" is a consecutive
    ``k``-word pseudo-line, the delimiter these whitespace-stream docs
    have): any line occurring in >= 2 DISTINCT documents is removed
    from every document, and each doc is rewritten from its kept lines.
    Emits (doc_id, n_chunks, n_kept, text_clean).

    Physical plan: (1) per-block chunking, block-level (chunk, doc)
    pre-dedup, then a hash(chunk) partition exchange so each distinct
    line resolves in exactly one partition (the span_dedup exchange);
    (2) the duplicated-line set collects to the driver and broadcasts
    ONCE via ray.put — it is the corpus's repeated boilerplate, tiny
    next to the corpus (C4 removed 0.02% of text this way); if it ever
    outgrows the driver, partitioned_semi_filter + a doc_id re-exchange
    is the drop-in scale path; (3) the rewrite is a row-local pass over
    the original blocks (is_in against the broadcast set + one
    binary_join), so document bytes never shuffle."""
    import ray

    def chunk_pairs(t: pa.Table) -> pa.Table:
        flat, _, n_chunks = _chunk_lists(t, text_col, k)
        doc = np.repeat(t["doc_id"].combine_chunks().to_numpy(), n_chunks)
        pre = pa.table({"chunk": flat, "doc_id": pa.array(doc)}) \
            .group_by(["chunk", "doc_id"]).aggregate([])
        return pre.append_column("part", pa.array(
            hash_part(_str_hash64(pre["chunk"].combine_chunks()),
                      num_parts)))

    def dup_lines(t: pa.Table) -> pa.Table:
        g = t.group_by("chunk").aggregate([("doc_id", "count_distinct")])
        return pa.table({"chunk": g.filter(
            pc.greater(g["doc_id_count_distinct"], 1))["chunk"]})

    dups = docs.map_batches(chunk_pairs, batch_format="pyarrow") \
        .groupby("part").map_groups(dup_lines, batch_format="pyarrow")
    dup_blocks = [b.replace_schema_metadata(None)
                  for b in ray.get(dups.to_arrow_refs())]
    dup_set = pa.concat_arrays(
        [b["chunk"].combine_chunks() for b in dup_blocks if b.num_rows]) \
        if any(b.num_rows for b in dup_blocks) else pa.array([], pa.string())
    dup_ref = ray.put(dup_set)

    def rewrite(t: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        flat, _, n_chunks = _chunk_lists(t, text_col, k)
        keep = pc.fill_null(pc.invert(pc.is_in(flat, value_set=dup)),
                            True).to_numpy(zero_copy_only=False)
        rows = np.repeat(np.arange(len(t)), n_chunks)
        n_kept = np.bincount(rows[keep], minlength=len(t)).astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(n_kept)])
        kept_list = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            flat.filter(pa.array(keep)))
        clean = pc.binary_join(kept_list, " ")
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks(),
            "n_chunks": pa.array(n_chunks),
            "n_kept": pa.array(n_kept),
            "text_clean": clean,
        })

    return docs.map_batches(rewrite, batch_format="pyarrow")
