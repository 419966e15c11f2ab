"""PNG tile-pyramid sink: the canonical renderer output of a tiling
engine (slippy ``{z}/{x}/{y}.png`` directory a web map serves directly).

The reference stops at filtered planet files; its downstream consumers
(tile renderers) are the reason bbox/key filters exist — so the graft
closes the loop with a real, resumable raster sink built on the repo's
own spec-conformant PNG codec (codecs.py; no image libraries in this
container, and none needed).

Physical plan mirrors the partitioned-write contract (state/lineage.py):
the sparse raster exchanges by TILE-hash partition; each partition task
densifies its tiles, encodes PNGs, writes them under the slippy layout,
and commits ONE lineage record — so a killed run resumes by skipping
completed partitions, never re-encoding finished tiles.  Rendering is
deterministic (pure function of the counts): grayscale value
``255 * n // max_n`` with ``max_n`` the GLOBAL max passed in by the
caller (compute it from the raster's own bounded ``n`` column), so tile
brightness is comparable across the layer and re-runs are byte-stable.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict

import numpy as np
import pyarrow as pa
import ray.data

from .. import codecs
from ..relational import hash_part
from ..state.lineage import (LineageRecord, _atomic_write_bytes,
                             _lineage_dir, _record_path,
                             completed_partitions)

NUM_PARTS = 32


def raster_max_n(raster: ray.data.Dataset) -> int:
    """Global max pixel count (one tiny per-block partial -> driver max);
    the deterministic brightness scale for render_tile_pngs."""
    def partial(t: pa.Table) -> pa.Table:
        n = t["n"].combine_chunks().to_numpy()
        return pa.table({"m": pa.array([int(n.max()) if len(n) else 0])})
    import ray as _ray
    parts = raster.map_batches(partial, batch_format="pyarrow")
    return max((int(t["m"][0].as_py()) for t in _ray.get(parts.to_arrow_refs())
                if t.num_rows), default=0)


def render_tile_pngs(raster: ray.data.Dataset, out_dir: str, z: int,
                     grid: int, max_n: int, resume: bool = True,
                     num_parts: int = NUM_PARTS,
                     fail_parts: frozenset | None = None) -> list[dict]:
    """Render the sparse zoom-``z`` raster to ``out_dir/{z}/{x}/{y}.png``
    (grayscale heatmap, ``grid`` x ``grid`` px).  Returns the manifest:
    one record per hash partition with its tile count.  ``fail_parts``
    injects a crash before those partitions (resume-test hook only)."""
    os.makedirs(_lineage_dir(out_dir), exist_ok=True)
    done = completed_partitions(out_dir) if resume else set()
    scale = max(int(max_n), 1)

    def assign(t: pa.Table) -> pa.Table:
        tx = t["tile_x"].combine_chunks().to_numpy()
        ty = t["tile_y"].combine_chunks().to_numpy()
        part = hash_part((tx << np.int64(32)) | ty, num_parts)
        t = t.append_column("part", pa.array(part))
        if done:
            keep = ~np.isin(part.astype("U"), list(done))
            t = t.filter(pa.array(keep))
        return t

    def render(t: pa.Table) -> pa.Table:
        part = str(t["part"][0].as_py())
        if fail_parts and part in fail_parts:
            raise RuntimeError(f"injected failure before partition {part}")
        tx = t["tile_x"].combine_chunks().to_numpy()
        ty = t["tile_y"].combine_chunks().to_numpy()
        key = (tx << np.int64(32)) | ty
        order = np.argsort(key, kind="stable")
        uniq, starts = np.unique(key[order], return_index=True)
        bounds = np.append(starts, len(key))
        px = t["px"].combine_chunks().to_numpy()[order]
        py = t["py"].combine_chunks().to_numpy()[order]
        n = t["n"].combine_chunks().to_numpy()[order]
        total_bytes = 0
        for i in range(len(uniq)):
            x, y = int(uniq[i] >> np.int64(32)), int(uniq[i] & np.int64((1 << 32) - 1))
            dense = np.zeros((grid, grid), np.int64)
            s, e = bounds[i], bounds[i + 1]
            dense[py[s:e], px[s:e]] = n[s:e]
            gray = (dense * 255 // scale).astype(np.uint8)
            png = codecs.encode(np.repeat(gray[..., None], 3, axis=2), "png")
            d = os.path.join(out_dir, str(z), str(x))
            os.makedirs(d, exist_ok=True)
            _atomic_write_bytes(os.path.join(d, f"{y}.png"), png)
            total_bytes += len(png)
        rec = LineageRecord(key=part, rows=len(uniq), bytes=total_bytes,
                            digest=f"tiles-{len(uniq)}", path=out_dir,
                            completed_at=time.time())
        _atomic_write_bytes(_record_path(out_dir, part),
                            json.dumps(asdict(rec)).encode())
        return pa.table({"part": pa.array([part]),
                         "tiles": pa.array([len(uniq)], pa.int64())})

    raster.map_batches(assign, batch_format="pyarrow") \
        .groupby("part").map_groups(render, batch_format="pyarrow").count()
    from ..state.lineage import read_manifest
    return [asdict(r) for r in read_manifest(out_dir)]
