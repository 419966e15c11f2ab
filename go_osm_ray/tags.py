"""Vectorized operations on the ``tags`` list<struct<key,value>> column.

The reference stores tags as a planet-global dictionary plus per-element
index lists (/root/reference/osm/TagsCache.go:4-7, TaggedElement.go:4-8);
Arrow's columnar layout (one flat child array + offsets, dictionary-encoded
on disk) is the distributed equivalent, so every tag operation here works
on the flattened child arrays with numpy segment math — no per-row Python.

Implemented semantics:
- ``has_any_key``      — key-presence row mask (KeepNode/KeepWay/KeepRelation,
  /root/reference/osm/KeepNode.go:23-47)
- ``project_keys``     — keep-list/drop-list tag projection; keep-list wins
  when both given (/root/reference/osm/UnmarshalTags.go:34-53)
- ``value_of``         — first value for a key per row (the ``@key`` lookup
  feeding DFL filters, /root/reference/osm/KeepNode.go:17-21)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _parts(tags: pa.Array) -> tuple[np.ndarray, pa.Array, pa.Array]:
    """(offsets int64[n+1], flat keys, flat values) of a list<struct> column."""
    if isinstance(tags, pa.ChunkedArray):
        tags = tags.combine_chunks()
    offsets = np.asarray(tags.offsets)
    flat = tags.flatten()
    base = offsets[0]
    if base:  # sliced array: re-base offsets onto the flattened children
        offsets = offsets - base
    return offsets.astype(np.int64), flat.field("key"), flat.field("value")


def _seg_any(mask: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row 'any true in segment' via prefix sums (empty rows -> False)."""
    c = np.zeros(len(mask) + 1, np.int64)
    np.cumsum(mask, out=c[1:])
    return (c[offsets[1:]] - c[offsets[:-1]]) > 0


def has_any_key(tags: pa.Array, keys: list[str]) -> np.ndarray:
    offsets, flat_keys, _ = _parts(tags)
    member = np.asarray(pc.is_in(flat_keys, value_set=pa.array(keys, pa.string())))
    return _seg_any(member, offsets)


def project_keys(tags: pa.Array, keep: list[str] | None = None,
                 drop: list[str] | None = None) -> pa.Array:
    """Rewrite the tags column pruning keys; rows survive (not a filter).

    Keep-list, when non-empty, overrides the drop-list — the reference's
    rule at /root/reference/osm/UnmarshalTags.go:34-53.
    """
    offsets, flat_keys, flat_vals = _parts(tags)
    if keep:
        m = np.asarray(pc.is_in(flat_keys, value_set=pa.array(keep, pa.string())))
    elif drop:
        m = ~np.asarray(pc.is_in(flat_keys, value_set=pa.array(drop, pa.string())))
    else:
        if isinstance(tags, pa.ChunkedArray):
            return tags.combine_chunks()
        return tags
    c = np.zeros(len(m) + 1, np.int64)
    np.cumsum(m, out=c[1:])
    new_offsets = c[offsets]
    mask_pa = pa.array(m)
    struct = pa.StructArray.from_arrays(
        [flat_keys.filter(mask_pa), flat_vals.filter(mask_pa)], names=["key", "value"])
    return pa.ListArray.from_arrays(pa.array(new_offsets, pa.int32()), struct)


def value_of(tags: pa.Array, key: str) -> pa.Array:
    """First value of ``key`` per row; null where absent."""
    offsets, flat_keys, flat_vals = _parts(tags)
    m = np.asarray(pc.equal(flat_keys, key)).astype(bool)
    nflat = len(m)
    pos = np.where(m, np.arange(nflat, dtype=np.int64), np.int64(nflat))
    pos = np.append(pos, np.int64(nflat))  # sentinel so trailing empty rows index safely
    starts = offsets[:-1]
    firsts = np.minimum.reduceat(pos, starts) if len(starts) else np.empty(0, np.int64)
    # reduceat misbehaves on empty segments (offsets[i] == offsets[i+1]): it
    # returns pos[offsets[i]], an element of the NEXT row — mask those out.
    empty = offsets[1:] == offsets[:-1]
    firsts = np.where(empty, nflat, firsts)
    valid = firsts < nflat
    taken = pa.compute.take(flat_vals, pa.array(np.where(valid, firsts, 0), pa.int64()))
    return pc.if_else(pa.array(valid), taken, pa.scalar(None, pa.string()))


def explode_keys(tags: pa.Array) -> tuple[np.ndarray, pa.Array, pa.Array]:
    """(row_index, key, value) exploded view for summary aggregations."""
    offsets, flat_keys, flat_vals = _parts(tags)
    row_idx = np.repeat(np.arange(len(offsets) - 1, dtype=np.int64),
                        np.diff(offsets))
    return row_idx, flat_keys, flat_vals
