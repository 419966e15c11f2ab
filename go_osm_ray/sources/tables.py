"""Columnar-table source router for the engine's primary input.

The north-star input (BASELINE.json ``input_hint``) is a Lance table of
image + caption pairs ``(image_id, bytes, w, h, fmt, caption, phash)``.
This container ships no ``lance`` package, so the synthetic fixtures are
parquet part-file directories of exactly that schema (datagen.py) — but
the ENGINE routes on the table format, so a deployment with pylance
installed reads the real thing with zero pipeline changes:

* ``*.lance`` / ``lance://``  -> ``ray.data.read_lance`` (column
  projection pushed down; Lance is the one format here with true random
  access, which also makes it the preferred substrate for the resumable
  per-partition checkpoint reads in state/checkpoint.py).
* parquet file                -> ``ray.data.read_parquet``.
* directory of parquet parts  -> part files expanded EXPLICITLY before
  ``read_parquet`` — Ray assigns read tasks per *path*, so passing the
  bare directory serializes a multi-GB byte-wide table into one task
  (measured: one 2.4 GB images dir read 3.3 s sequential vs ~25 parallel
  part tasks; see datagen.FILE_ROWS).

Always pass ``columns=``: the payload column is ~99% of the bytes, and a
metadata-only pipeline (tiling, geotag decode) must not lift it off
storage.
"""

from __future__ import annotations

import glob
import os

import ray.data


def is_lance(path: str) -> bool:
    return path.startswith("lance://") or path.rstrip("/").endswith(".lance")


def read_table(path: str, columns: list[str] | None = None,
               override_num_blocks: int | None = None) -> ray.data.Dataset:
    """Read a columnar table (Lance or parquet) as a Dataset with column
    pruning pushed down to the format layer."""
    kw = {}
    if override_num_blocks:
        kw["override_num_blocks"] = override_num_blocks
    if is_lance(path):
        try:
            return ray.data.read_lance(
                path.removeprefix("lance://"), columns=columns, **kw)
        except ImportError as e:
            raise ImportError(
                "reading .lance tables requires the 'pylance' package "
                "(pip install pylance); this environment has none — use "
                "the parquet fixtures or install it") from e
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            raise FileNotFoundError(f"no parquet parts under {path}")
        return ray.data.read_parquet(parts, columns=columns, **kw)
    return ray.data.read_parquet(path, columns=columns, **kw)
