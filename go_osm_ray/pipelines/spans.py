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

Windows travel as their strings here, which is exact and fine while
window << doc size; at 100 TB carry (hash128, doc_id, pos) instead and
re-verify colliding groups against storage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..relational import _col_hash, hash_part

WIN = 64
STRIDE = 32


def window_batch(t: pa.Table, text_col: str = "text",
                 num_parts: int = 32) -> pa.Table:
    """(doc_id, pos, win, part) for every full WIN-char window at
    STRIDE-char steps. Character (codepoint) offsets, matching SQL
    substr semantics."""
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
    if not out_id:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64()),
                         "win": pa.array([], pa.string()),
                         "part": pa.array([], pa.int64())})
    win = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                            else a for a in out_win])
    return pa.table({
        "doc_id": pa.concat_arrays([a.combine_chunks()
                                    if isinstance(a, pa.ChunkedArray) else a
                                    for a in out_id]),
        "pos": pa.concat_arrays(out_pos),
        "win": win,
        "part": pa.array(hash_part(_col_hash(win), num_parts)),
    })


def _resolve(t: pa.Table) -> pa.Table:
    """Partition-local exact resolution: windows seen in >= 2 distinct
    docs -> emit their (doc_id, pos) rows."""
    g = t.select(["win", "doc_id"]).group_by("win") \
        .aggregate([("doc_id", "count_distinct")])
    dup = g.filter(pc.greater(g["doc_id_count_distinct"], 1))["win"]
    out = t.filter(pc.is_in(t["win"], value_set=dup.combine_chunks()))
    return pa.table({"doc_id": out["doc_id"], "pos": out["pos"]})


def span_dedup(docs: ray.data.Dataset, text_col: str = "text",
               num_parts: int = 32) -> ray.data.Dataset:
    """(doc_id, pos): every stride-aligned WIN-char window that also
    appears (exactly) in at least one other document."""
    wins = docs.map_batches(
        lambda t: window_batch(t, text_col, num_parts),
        batch_format="pyarrow")
    return wins.groupby("part").map_groups(_resolve, batch_format="pyarrow")
