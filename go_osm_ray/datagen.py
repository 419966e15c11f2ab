"""Deterministic synthetic input tables (seed-fixed, no external data).

Two table families, both pure functions of (SEED=42, scale factor):

1. ``images`` — the graft's primary input, *exactly* the shape demanded by
   BASELINE.json ``input_hint``: (image_id:string, bytes:binary, w:int32,
   h:int32, fmt:string, caption:string, phash:int64).  The geotag rides in
   ``phash`` (Morton code, geo/morton.py).  A ``hot`` fraction of rows is
   concentrated in 3 small urban bboxes (one of them the DC bbox of the
   reference's README example, /root/reference/README.md:95-99) to
   exercise hot-cell salting.

2. ``osm_nodes`` / ``osm_ways`` / ``osm_relations`` — the reference's data
   model (/root/reference/osm/Element.go:8-15, Node.go:12-16, Way.go:17-24,
   Relation.go:7-16) as Arrow tables: tags are list<struct<key,value>>
   (the columnar form of TagsCache dictionary semantics,
   /root/reference/osm/TagsCache.go:4-7), way refs are list<int64>.
   Node ids are grouped into 16-id spatial blocks so way rings are
   geographically compact; ~25% of ways are closed rings
   (/root/reference/osm/Planet.go:67-77 polygon-vs-line semantics).

Tables are generated once per scale and cached as parquet under
``DATA_ROOT`` (atomic: tmp dir + rename). The DuckDB oracle reads the
same files via read_parquet(), so engine and oracle share one input.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import codecs
from .geo import morton

SEED = 42
DATA_ROOT = Path(os.environ.get("GO_OSM_RAY_DATA", "/tmp/go_osm_ray_data"))

# DC bbox from the reference summarize example (README.md:96) + two more hot boxes
HOT_BBOXES = [
    (-77.12, 38.79, -76.90, 38.99),   # "DC"
    (2.25, 48.81, 2.42, 48.90),       # "Paris-ish"
    (139.60, 35.55, 139.85, 35.75),   # "Tokyo-ish"
]
DC_BBOX = HOT_BBOXES[0]

_ADJ = ["quiet", "bright", "old", "busy", "green", "small", "grand", "hidden"]
_NOUN = ["market", "bridge", "garden", "tower", "museum", "harbor", "plaza", "station"]

_FMTS = ["bmp", "png", "qnt5", "raw"]
_WDIMS = [16, 24, 32]
_HDIMS = [16, 24, 32]

NODE_TAG_KEYS = ["amenity", "craft", "leisure", "shop", "tourism", "name", "addr:city"]
NODE_TAG_VALUES = {
    "amenity": ["cafe", "pub", "school", "bench", "fountain"],
    "craft": ["brewery", "distillery", "carpenter", "pottery"],
    "leisure": ["park", "pitch", "garden"],
    "shop": ["bakery", "books", "florist"],
    "tourism": ["museum", "viewpoint"],
    "name": ["alpha", "beta", "gamma", "delta", "epsilon"],
    "addr:city": ["Washington", "Arlington"],
}
WAY_TAG_KEYS = ["building", "highway", "landuse", "craft", "name"]
WAY_TAG_VALUES = {
    "building": ["yes", "house", "retail"],
    "highway": ["residential", "service", "footway"],
    "landuse": ["grass", "commercial"],
    "craft": ["brewery", "pottery"],
    "name": ["alpha", "beta", "gamma", "delta"],
}


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64: deterministic uint64 hash of uint64."""
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        z = (np.asarray(x, np.uint64) + np.uint64(0x9E3779B97F4A7C15 * (SEED + 1) & 0xFFFFFFFFFFFFFFFF))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _h(i: np.ndarray, stream: int) -> np.ndarray:
    return _splitmix64(np.asarray(i, np.uint64) * np.uint64(1000003) + np.uint64(stream))


def _frac(i: np.ndarray, stream: int) -> np.ndarray:
    """Deterministic uniform [0,1) float64 per (i, stream)."""
    return (_h(i, stream) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def n_images(sf: float) -> int:
    return max(200, int(2_000_000 * sf))


def n_nodes(sf: float) -> int:
    return max(160, int(1_000_000 * sf))


def sf_of_dir(sf_dir: str) -> float:
    """Parse the scale factor out of a testdata dir name like .../sf0.01."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if not base.startswith("sf"):
        raise ValueError(f"cannot parse scale factor from {sf_dir!r}")
    return float(base[2:])


def scale_dir(sf: float) -> Path:
    return DATA_ROOT / f"sf{sf:g}"


# ----------------------------------------------------------------- images

def _image_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Procedural gradient + per-image checkerboard; pure function of i."""
    ys, xs = np.mgrid[0:h, 0:w]
    base = (xs * 5 + ys * 3 + i * 7)[..., None] + np.array([0, 31, 67])
    checker = (((xs // 4 + ys // 4 + i) % 2) * 40)[..., None]
    return ((base + checker) % 256).astype(np.uint8)


def gen_images_lonlat(n: int) -> tuple[np.ndarray, np.ndarray]:
    i = np.arange(n, dtype=np.uint64)
    sel = _h(i, 1) & np.uint64(0xF)
    hot = sel < np.uint64(3)  # ~19% of rows in hot urban boxes
    box_idx = (_h(i, 2) % np.uint64(len(HOT_BBOXES))).astype(np.int64)
    u, v = _frac(i, 3), _frac(i, 4)
    lon = -180.0 + 360.0 * u
    lat = -85.0 + 170.0 * v
    for b, (x0, y0, x1, y1) in enumerate(HOT_BBOXES):
        m = hot & (box_idx == b)
        lon[m] = x0 + (x1 - x0) * u[m]
        lat[m] = y0 + (y1 - y0) * v[m]
    return lon, lat


def _image_caption(i: int) -> str:
    """Deterministic caption recipe — the 'reference rendition' for the
    input_hint's caption-equality invariant (image_verify checks stored
    captions against this, like pixels against _image_pixels)."""
    return f"synthetic caption {i} {_ADJ[i % 8]} {_NOUN[(i // 8) % 8]}"


def build_images_table(n: int, start: int = 0) -> pa.Table:
    idx = np.arange(start, start + n, dtype=np.int64)
    lon, lat = gen_images_lonlat(start + n)
    lon, lat = lon[start:], lat[start:]
    phash = morton.encode_phash(lon, lat, idx % 4096)
    w = np.array(_WDIMS, np.int32)[idx % 3]
    h = np.array(_HDIMS, np.int32)[(idx // 3) % 3]
    fmts = [_FMTS[int(i) % 4] for i in idx]
    blobs = [codecs.encode(_image_pixels(int(i), int(wi), int(hi)), f)
             for i, wi, hi, f in zip(idx, w, h, fmts)]
    captions = [_image_caption(int(i)) for i in idx]
    return pa.table({
        "image_id": pa.array([f"img{int(i):012d}" for i in idx], pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(w, pa.int32()),
        "h": pa.array(h, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "caption": pa.array(captions, pa.string()),
        "phash": pa.array(phash, pa.int64()),
    })


# ----------------------------------------------------------------- OSM tables

def _tags_column(ids: np.ndarray, keys: list[str], values: dict[str, list[str]],
                 tagged_mod: int, tagged_lt: int, stream: int) -> pa.Array:
    """Vectorized list<struct<key,value>> tag column.

    A row is tagged iff hash % tagged_mod < tagged_lt; tagged rows get
    1-3 distinct keys with hash-chosen values.
    """
    n = len(ids)
    hsel = _h(ids, stream)
    tagged = (hsel % np.uint64(tagged_mod)) < np.uint64(tagged_lt)
    ntags = np.where(tagged, 1 + (_h(ids, stream + 1) % np.uint64(3)).astype(np.int64), 0)
    offsets = np.zeros(n + 1, np.int32)
    np.cumsum(ntags, out=offsets[1:])
    flat_keys: list[str] = []
    flat_vals: list[str] = []
    nk = len(keys)
    for j, (rid, k) in enumerate(zip(ids, ntags)):
        if not k:
            continue
        first = int(_h(np.uint64(rid), stream + 2) % np.uint64(nk))
        for t in range(int(k)):
            key = keys[(first + t * 2) % nk]
            pool = values[key]
            val = pool[int(_h(np.uint64(rid), stream + 3 + t) % np.uint64(len(pool)))]
            flat_keys.append(key)
            flat_vals.append(val)
    struct_arr = pa.StructArray.from_arrays(
        [pa.array(flat_keys, pa.string()), pa.array(flat_vals, pa.string())],
        names=["key", "value"])
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct_arr)


def _element_columns(ids: np.ndarray) -> dict[str, pa.Array]:
    """Shared Element columns (/root/reference/osm/Element.go:8-15)."""
    i = ids.astype(np.int64)
    uid = i % 50
    base = np.datetime64("2020-01-01T00:00:00", "us")
    ts = base + i.astype("timedelta64[s]")
    return {
        "id": pa.array(i, pa.int64()),
        "version": pa.array((i % 7 + 1).astype(np.int32), pa.int32()),
        "ts": pa.array(ts),
        "changeset": pa.array(i // 100, pa.int64()),
        "uid": pa.array(uid, pa.int64()),
        "user": pa.array([f"user{u}" for u in uid], pa.string()),
    }


BLOCK = 16          # node ids are grouped into spatial blocks of 16
BLOCK_JITTER = 0.004  # degrees; way rings stay within ~0.9 km


def build_osm_nodes(n: int) -> pa.Table:
    ids = np.arange(1, n + 1, dtype=np.int64)
    block = (ids - 1) // BLOCK
    x0, y0, x1, y1 = DC_BBOX
    bx = x0 + (x1 - x0) * _frac(block, 10)
    by = y0 + (y1 - y0) * _frac(block, 11)
    lon = bx + (2.0 * _frac(ids, 12) - 1.0) * BLOCK_JITTER
    lat = by + (2.0 * _frac(ids, 13) - 1.0) * BLOCK_JITTER
    cols = _element_columns(ids)
    cols["lon"] = pa.array(lon, pa.float64())
    cols["lat"] = pa.array(lat, pa.float64())
    cols["tags"] = _tags_column(ids, NODE_TAG_KEYS, NODE_TAG_VALUES, 10, 3, 20)
    return pa.table(cols)


def build_osm_ways(num_ways: int, num_nodes: int) -> pa.Table:
    ids = np.arange(num_nodes + 1, num_nodes + num_ways + 1, dtype=np.int64)
    wseq = np.arange(num_ways, dtype=np.int64)
    nblocks = num_nodes // BLOCK
    block = (_h(wseq, 30) % np.uint64(max(nblocks, 1))).astype(np.int64)
    start_off = (_h(wseq, 31) % np.uint64(3)).astype(np.int64)
    k = 3 + (_h(wseq, 32) % np.uint64(10)).astype(np.int64)       # 3..12 refs
    k = np.minimum(k, BLOCK - start_off)
    closed = (_h(wseq, 33) % np.uint64(4)) == 0                   # ~25% closed rings
    refs_flat: list[int] = []
    offsets = [0]
    for b, s, kk, cl in zip(block, start_off, k, closed):
        base = int(b) * BLOCK + 1 + int(s)
        rr = list(range(base, base + int(kk)))
        if cl:
            rr.append(rr[0])
        refs_flat.extend(rr)
        offsets.append(len(refs_flat))
    cols = _element_columns(ids)
    cols["refs"] = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(refs_flat, pa.int64()))
    cols["tags"] = _tags_column(ids, WAY_TAG_KEYS, WAY_TAG_VALUES, 10, 6, 40)
    return pa.table(cols)


def build_osm_relations(num_rels: int, num_nodes: int, num_ways: int) -> pa.Table:
    base_id = num_nodes + num_ways
    ids = np.arange(base_id + 1, base_id + num_rels + 1, dtype=np.int64)
    rseq = np.arange(num_rels, dtype=np.int64)
    nmem = 2 + (_h(rseq, 50) % np.uint64(5)).astype(np.int64)
    roles = ["", "inner", "outer"]
    m_type: list[str] = []
    m_ref: list[int] = []
    m_role: list[str] = []
    offsets = [0]
    for r, km in zip(rseq, nmem):
        for t in range(int(km)):
            hv = int(_h(np.uint64(r), 51 + t))
            if hv % 2 == 0:
                m_type.append("node")
                m_ref.append(hv % num_nodes + 1)
            else:
                m_type.append("way")
                m_ref.append(num_nodes + hv % num_ways + 1)
            m_role.append(roles[hv % 3])
        offsets.append(len(m_ref))
    members = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        pa.StructArray.from_arrays(
            [pa.array(m_type, pa.string()), pa.array(m_ref, pa.int64()),
             pa.array(m_role, pa.string())],
            names=["type", "ref", "role"]))
    cols = _element_columns(ids)
    cols["members"] = members
    cols["tags"] = _tags_column(ids, NODE_TAG_KEYS, NODE_TAG_VALUES, 10, 4, 60)
    return pa.table(cols)


# ----------------------------------------------------------------- cache layer

ROW_GROUP = 8192  # small row groups so Ray's parquet read splits into
                  # enough blocks to feed every actor (4 x 50k groups gave
                  # only 4 read tasks — measured 10x under-parallelism)
FILE_ROWS = 8192  # rows per images part-file: Ray assigns read TASKS per
                  # file (row groups only split post-read), so one big
                  # images.parquet serialized its whole 2.4 GB read into
                  # a single task — measured 3.3 s before any decode ran


def _write_atomic(table_fn, path: Path, chunked_n: int | None = None) -> None:
    tmp = path.with_suffix(".tmp")
    if chunked_n is None:
        pq.write_table(table_fn(), tmp, row_group_size=ROW_GROUP)
        os.replace(tmp, path)
        return
    # byte-wide images table: a DIRECTORY of bounded part files, streamed
    # to bound generator memory and to parallelize the downstream read
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    for fi, start in enumerate(range(0, chunked_n, FILE_ROWS)):
        t = table_fn(min(FILE_ROWS, chunked_n - start), start)
        pq.write_table(t, tmp / f"part-{fi:04d}.parquet",
                       row_group_size=ROW_GROUP)
    if path.is_dir():
        shutil.rmtree(path)
    elif path.exists():  # pre-round-3 single-file layout
        os.remove(path)
    os.replace(tmp, path)


def ensure_tables(sf: float) -> dict[str, str]:
    """Generate (once) and return paths for all synthetic tables at ``sf``."""
    d = scale_dir(sf)
    d.mkdir(parents=True, exist_ok=True)
    paths = {name: d / f"{name}.parquet"
             for name in ("images", "osm_nodes", "osm_ways", "osm_relations")}
    done = d / ".done_v2"  # v2: images is a part-file directory
    if not done.exists():
        ni, nn = n_images(sf), n_nodes(sf)
        nw, nr = nn // 5, max(nn // 50, 4)
        _write_atomic(lambda c, s: build_images_table(c, s), paths["images"], chunked_n=ni)
        _write_atomic(lambda: build_osm_nodes(nn), paths["osm_nodes"])
        _write_atomic(lambda: build_osm_ways(nw, nn), paths["osm_ways"])
        _write_atomic(lambda: build_osm_relations(nr, nn, nw), paths["osm_relations"])
        done.touch()
    return {k: str(v) for k, v in paths.items()}


def ensure_tables_for_dir(sf_dir: str) -> dict[str, str]:
    return ensure_tables(sf_of_dir(sf_dir))


def ensure_osm_xml(sf: float, shards: int = 4) -> list[str]:
    """Generate (once) sharded .osm.gz fixtures from the parquet tables —
    the multi-file input layout the XML source parallelizes over."""
    import pyarrow.parquet as pq
    from .sources.osm_xml import write_osm_xml
    d = scale_dir(sf)
    xml_dir = d / "osm_xml"
    done = xml_dir / ".done"
    if not done.exists():
        paths = ensure_tables(sf)
        nodes = pq.read_table(paths["osm_nodes"])
        ways = pq.read_table(paths["osm_ways"])
        xml_dir.mkdir(parents=True, exist_ok=True)
        for s in range(shards):
            n0, n1 = (len(nodes) * s) // shards, (len(nodes) * (s + 1)) // shards
            w0, w1 = (len(ways) * s) // shards, (len(ways) * (s + 1)) // shards
            write_osm_xml(str(xml_dir / f"part-{s:03d}.osm.gz"),
                          nodes.slice(n0, n1 - n0), ways.slice(w0, w1 - w0))
        done.touch()
    return sorted(str(p) for p in xml_dir.glob("part-*.osm.gz"))


def reset_cache() -> None:
    if DATA_ROOT.exists():
        shutil.rmtree(DATA_ROOT)
