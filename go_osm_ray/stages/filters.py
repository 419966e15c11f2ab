"""Row-filter stages mirroring the reference's filter semantics.

- ``make_bbox_filter`` — MaxExtent point containment
  (/root/reference/osm/Filter.go:39-45, Bounds.go:24-26). The reference
  has a latent bug testing ``lon >= MinimumLatitude`` (Bounds.go:25);
  implemented CORRECTLY here (SURVEY §2.3 P3) and the oracle encodes the
  correct form.
- ``make_key_filter`` — key-presence row keep/drop
  (/root/reference/osm/KeepNode.go:23-47); keep and drop are mutually
  exclusive, enforced like cmd/osm/main.go:257-260.
- ``make_expr_filter`` — compiled DFL-subset predicate (expr.py), the
  engine-side form of /root/reference/osm/EvaluateExpression.go:19-42.
- ``make_tag_projector`` — tag keep/drop projection (NOT a row filter;
  /root/reference/osm/UnmarshalTags.go:34-53).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .. import tags as tagops
from ..expr import Expression


def make_bbox_filter(min_lon: float, min_lat: float, max_lon: float, max_lat: float,
                     lon_col: str = "lon", lat_col: str = "lat"):
    def fn(batch: pa.Table) -> pa.Table:
        lon, lat = batch[lon_col], batch[lat_col]
        m = pc.and_(pc.and_(pc.greater_equal(lon, min_lon), pc.less_equal(lon, max_lon)),
                    pc.and_(pc.greater_equal(lat, min_lat), pc.less_equal(lat, max_lat)))
        return batch.filter(pc.fill_null(m, False))
    return fn


def make_key_filter(keep: list[str] | None = None, drop: list[str] | None = None,
                    tags_col: str = "tags"):
    if keep and drop:
        raise ValueError("keys_to_keep and keys_to_drop are mutually exclusive "
                         "(reference: cmd/osm/main.go:257-260)")
    keys = keep or drop or []

    def fn(batch: pa.Table) -> pa.Table:
        if not keys:
            return batch
        m = tagops.has_any_key(batch[tags_col], keys)
        if drop:
            m = ~m
        return batch.filter(pa.array(m))
    return fn


def make_expr_filter(expression: str | Expression, tags_col: str = "tags"):
    e = expression if isinstance(expression, Expression) else Expression(expression)

    def fn(batch: pa.Table) -> pa.Table:
        return e.filter(batch, tags_col)
    return fn


def make_tag_projector(keep: list[str] | None = None, drop: list[str] | None = None,
                       tags_col: str = "tags"):
    def fn(batch: pa.Table) -> pa.Table:
        new = tagops.project_keys(batch[tags_col], keep=keep, drop=drop)
        i = batch.schema.get_field_index(tags_col)
        return batch.set_column(i, tags_col, new)
    return fn


def drop_attributes(batch: pa.Table, drop: list[str]) -> pa.Table:
    """Attribute dropping (P6) = projection: just don't carry the columns
    (/root/reference/osm/Element.go:23-67 zeroes them; columnar form drops).
    The reference-facing attr name 'timestamp' maps to the Arrow column
    'ts' (the XML writer keeps the reference spelling)."""
    names = {"ts" if d == "timestamp" else d for d in drop}
    keep = [c for c in batch.column_names if c not in names]
    return batch.select(keep)
