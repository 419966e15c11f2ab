"""Multimodal (image) pipelines: decode / verify / resize / fingerprint.

Image payloads are opaque ``binary`` columns with typed metadata
(w/h/fmt), per BASELINE.json ``input_hint``. Decode and feature
extraction are stateful actor-pool stages (codec registry per actor);
batches are sized by BYTES not rows for wide binary payloads. The codecs
are real pure-python implementations (codecs.py) — no external image
libraries exist in this container.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .. import codecs
from ..geo import tiles
from ..stages.assign import decode_geotag, make_cell_assigner, make_tile_assigner


class DecodeStats:
    """Actor-pool stage: decode each image and emit pixel statistics.

    __init__ binds the codec registry once per actor; __call__ decodes a
    batch and emits (image_id, ok, w_px, h_px, mean_px6). Decode errors
    become ok=false rows (error-as-data), never task failures.
    """

    def __init__(self):
        self.registry = codecs.FORMATS

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ok, wpx, hpx, mean = [], [], [], []
        for f, b in zip(fmts, blobs):
            try:
                px = codecs.decode(b, f)
                ok.append(True)
                hpx.append(px.shape[0])
                wpx.append(px.shape[1])
                mean.append(round(float(px.mean()), 6))
            except Exception:
                ok.append(False)
                hpx.append(0)
                wpx.append(0)
                mean.append(0.0)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "ok": pa.array(ok, pa.bool_()),
            "w_px": pa.array(wpx, pa.int32()),
            "h_px": pa.array(hpx, pa.int32()),
            "mean_px6": pa.array(mean, pa.float64()),
        })


class DecodeVerify:
    """Decode-verify stage for the per-row invariant (input_hint): decoded
    dims must equal the metadata columns; lossy formats must reconstruct a
    reference rendition at PSNR >= ``min_psnr``. Emits one row per image
    with the checks' outcomes; the reference rendition is recomputed from
    the deterministic generator recipe (datagen._image_pixels)."""

    def __init__(self, min_psnr: float = 40.0):
        self.min_psnr = min_psnr

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..datagen import _image_caption, _image_pixels
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        caps = (batch["caption"].to_pylist() if "caption" in batch.column_names
                else [None] * len(ids))
        rows = {"image_id": [], "dims_ok": [], "pixels_ok": [],
                "caption_ok": [], "psnr6": []}
        for iid, f, b, w, h, cap in zip(ids, fmts, blobs, ws, hs, caps):
            px = codecs.decode(b, f)
            i = int(iid[3:])
            ref = _image_pixels(i, w, h)
            dims_ok = px.shape == (h, w, 3)
            p = codecs.psnr(ref, px)
            pixels_ok = bool(np.array_equal(ref, px)) if codecs.is_lossless(f) \
                else bool(p >= self.min_psnr)
            rows["image_id"].append(iid)
            rows["dims_ok"].append(dims_ok)
            rows["pixels_ok"].append(pixels_ok)
            rows["caption_ok"].append(cap == _image_caption(i))
            rows["psnr6"].append(round(min(p, 999.0), 6))
        return pa.table({k: pa.array(v) for k, v in rows.items()})


class ResizeAHash:
    """Actor-pool stage: decode -> nearest-neighbor resize to ``side`` x
    ``side`` -> average-hash fingerprint (64-bit). The decode/resize path
    any multimodal training pipeline needs, on real codecs."""

    def __init__(self, side: int = 8):
        self.side = side

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        out = []
        for f, b in zip(fmts, blobs):
            px = codecs.decode(b, f)
            out.append(codecs.ahash64(px, self.side))
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         "ahash": pa.array(out, pa.int64())})


def image_stats(images: ray.data.Dataset, concurrency=None,
                batch_size: int = 1024) -> ray.data.Dataset:
    from ..util import default_pool
    pool = concurrency or default_pool(24)
    # no repartition: it is an all-to-all barrier on byte-heavy payloads;
    # the images parquet is written with 8K-row row groups, so the read
    # already splits into enough blocks to feed the pool
    return images.map_batches(
        DecodeStats, batch_format="pyarrow", batch_size=batch_size,
        concurrency=pool)


def image_verify(images: ray.data.Dataset, concurrency=None,
                 batch_size: int = 1024) -> ray.data.Dataset:
    from ..util import default_pool
    pool = concurrency or default_pool(24)
    return images.map_batches(
        DecodeVerify, batch_format="pyarrow", batch_size=batch_size,
        concurrency=pool)


def image_ahash(images: ray.data.Dataset, concurrency=None,
                batch_size: int = 1024) -> ray.data.Dataset:
    from ..util import default_pool
    pool = concurrency or default_pool(24)
    return images.map_batches(
        ResizeAHash, batch_format="pyarrow", batch_size=batch_size,
        concurrency=pool)


class PatchStats:
    """Actor-pool stage: decode each image and explode it into its
    ViT-style non-overlapping patch grid, one row per patch with the
    patch-mean pixel value — the patchification pass a vision-training
    pipeline runs before embedding.  Edge remainders (w or h not a
    multiple of the patch size) are truncated, exactly like a ViT crop.
    Decode failures drop the image's patches (error-as-data precedent:
    DecodeStats marks, exploders drop)."""

    def __init__(self, patch: int = 16):
        self.registry = codecs.FORMATS
        self.patch = patch

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = self.patch
        ids, pys, pxs, means = [], [], [], []
        for iid, f, b in zip(batch["image_id"].to_pylist(),
                             batch["fmt"].to_pylist(),
                             batch["bytes"].to_pylist()):
            try:
                px = codecs.decode(b, f)
            except Exception:
                continue
            gh, gw = px.shape[0] // p, px.shape[1] // p
            if gh == 0 or gw == 0:
                continue
            m = px[:gh * p, :gw * p].astype(np.float64) \
                .reshape(gh, p, gw, p, 3).mean(axis=(1, 3, 4))
            for r in range(gh):
                for c in range(gw):
                    ids.append(iid)
                    pys.append(r)
                    pxs.append(c)
                    means.append(round(float(m[r, c]), 6))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "py": pa.array(pys, pa.int32()),
            "px": pa.array(pxs, pa.int32()),
            "patch_mean6": pa.array(means, pa.float64()),
        })


def patch_extract(images: ray.data.Dataset, patch: int = 16,
                  concurrency=None,
                  batch_size: int = 1024) -> ray.data.Dataset:
    """(image_id, py, px, patch_mean6): the non-overlapping patch grid
    of every decodable image — rows explode ~(w*h)/patch^2 per image, so
    batch_size stays byte-sized like every decode stage."""
    from ..util import default_pool
    pool = concurrency or default_pool(24)
    return images.map_batches(
        PatchStats, fn_constructor_kwargs={"patch": patch},
        batch_format="pyarrow", batch_size=batch_size, concurrency=pool)


def flagship_kernel(batch: pa.Table, index, knn, assign_cells,
                    assign_tiles, decode_stats: bool = False) -> pa.Table:
    """The flagship per-batch kernel (decode-geotag -> cells -> tiles ->
    PIP tag -> kNN), shared by the actor-pool stage AND the no-Ray
    isolated-retention harness (bench.py --scaling) so both measure the
    IDENTICAL code path including the output-block build."""
    mean6 = None
    if decode_stats and "bytes" in batch.column_names:
        mean = []
        for f, b in zip(batch["fmt"].to_pylist(),
                        batch["bytes"].to_pylist()):
            px = codecs.decode(b, f)
            mean.append(round(float(px.mean()), 6))
        mean6 = pa.array(mean, pa.float64())
        batch = batch.drop_columns(
            [c for c in ("bytes", "fmt") if c in batch.column_names])
    batch = assign_tiles(assign_cells(decode_geotag(batch)))
    px = batch["lon"].combine_chunks().to_numpy()
    py = batch["lat"].combine_chunks().to_numpy()
    pi, fids = index.query(px, py)
    feat = np.full(len(batch), -1, np.int64)
    if len(pi):  # smallest feature id wins when multiple contain
        order = np.lexsort((fids, pi))[::-1]
        feat[pi[order]] = fids[order]
    batch = batch.append_column("pip_feature_id", pa.array(feat))
    if knn is not None:
        near = knn.nearest(px, py)
        batch = batch.append_column("knn_feature_id", pa.array(near))
    if mean6 is not None:
        batch = batch.append_column("mean_px6", mean6)
    if "phash" in batch.column_names:
        # lon/lat carry the decoded geotag; re-shipping the spent
        # 8 B/row hash through every downstream block is waste
        batch = batch.drop_columns(["phash"])
    return batch


def flagship(images: ray.data.Dataset, pip_index_ref: ray.ObjectRef,
             knn_feats_ref: ray.ObjectRef | None = None,
             resolutions=(7, 8, 9, 10, 11), zooms=(10, 12, 14),
             pip_concurrency=None, batch_size: int = 4096,
             prepartition: bool | None = None,
             decode_stats: bool = False,
             finest_only: bool = False) -> ray.data.Dataset:
    """The headline spatial-join + tiling pipeline (BASELINE.json metric):
    geotag decode -> H-cell + S2-analog + slippy-tile assignment ->
    point-in-polygon tagging (left join: every image kept,
    pip_feature_id = -1 when outside all polygons) against the broadcast
    polygon index -> kNN nearest-feature lookup against the broadcast
    feature layer.

    All stages are fused into ONE actor-pool pass: the cell/tile math is
    cheap relative to the PIP/kNN scans, so extra operator boundaries
    would only re-ship batches through the object store. Both spatial
    kernels are L2-tiled so concurrent actors scale near-linearly
    (NearestFeature docstring).

    ``decode_stats=True`` folds the image DECODE into the same fused
    pass (north_star verbatim: "geotagged rows ... are assigned H3 cells
    ... then joined against OSM-derived polygon layers ... stateful
    decode/index actors run in actor pools"): the byte payload is
    decoded once per row, summarized (mean_px6), and DROPPED before the
    batch flows on — pixels never transit a second operator boundary.
    Pass the byte-heavy input with a small ``batch_size``.

    ``finest_only=True`` emits ONLY the finest cell and tile columns
    (cell_r{max(resolutions)}, tile{max(zooms)}_x/y): every coarser
    level is an exact bit-derivation of the finest (geo.tiles
    cell_parent — prefix truncation; tile x/y at z-k = x >> k), so
    consumers derive parents on read instead of shipping 4 redundant
    int64 + 4 int32 columns through the object store per row.  At
    10^12 rows that redundancy is the dominant output-DRAM term
    (BASELINE.md round-4 rows measured output-block construction at
    ~25% of in-actor time at 24 actors); the round-5 scaling runs use
    this layout and BASELINE.md records the effect.  Default False —
    the driver contract and the gated queries keep the full layout."""
    from ..geo.pip import PolygonIndex
    from ..util import default_pool

    assign_cells = make_cell_assigner(
        (max(resolutions),) if finest_only else resolutions)
    # int32 tile coords + dropping the spent phash shrink the fused
    # pass's output rows ~22% (147 -> ~115 B/row) — output-block build
    # is the measured DRAM-bound term at high actor counts (BASELINE.md
    # round-4 rows), so narrower blocks lift BOTH the absolute rate and
    # the shared-DRAM 8->32 scaling ratio
    assign_tiles = make_tile_assigner(
        (max(zooms),) if finest_only else zooms, dtype=np.int32)

    class FlagshipStage:
        def __init__(self):
            self.index: PolygonIndex = ray.get(pip_index_ref)
            from .spatial import NearestFeature
            self.knn = (NearestFeature(knn_feats_ref)
                        if knn_feats_ref is not None else None)

        def __call__(self, batch: pa.Table) -> pa.Table:
            return flagship_kernel(batch, self.index, self.knn,
                                   assign_cells, assign_tiles,
                                   decode_stats=decode_stats)

    pool = pip_concurrency or default_pool(24)
    # Repartition only when the input can't already feed the pool: it is
    # an all-to-all BARRIER (read fully materializes before actors start),
    # so on inputs with enough files we skip it and let read/compute
    # pipeline. NB input_files() DEDUPES repeated paths, so a replicated
    # [path]*k read list still counts as 1 — callers doing that pass
    # prepartition=False explicitly.
    if prepartition is None:
        try:
            prepartition = len(images.input_files()) < pool
        except Exception:
            prepartition = True
    if prepartition:
        images = images.repartition(pool * 4)
    return images.map_batches(
        FlagshipStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=pool)


def plant_reencodes(images: ray.data.Dataset, every: int = 100,
                    id_offset: int = 1_000_000_000,
                    fmt: str = "bmp") -> ray.data.Dataset:
    """Deterministic duplicate augmentation for the image-dedup gate:
    every ``every``-th image gains a re-encode under a different codec
    and a new id — byte-DIFFERENT but pixel-identical duplicates (the
    cross-format dedup case signature dedup exists for; lossless bmp by
    default — pass fmt='qnt5' for lossy near-identical payloads). The
    natural synthetic table has no duplicate images, which would make a
    dedup gate vacuous."""
    def with_reencodes(batch: pa.Table) -> pa.Table:
        # emit original rows AND their re-encodes from the SAME pass —
        # a base.union(base.map_batches(...)) would execute the byte-wide
        # parquet read twice (measured ~2x the read cost of the query)
        ids = batch["image_id"].to_pylist()
        out_id, out_fmt, out_bytes = [], [], []
        for i, s in enumerate(ids):
            n = int(s[3:])
            if n % every:
                continue
            px = codecs.decode(batch["bytes"][i].as_py(),
                               batch["fmt"][i].as_py())
            out_id.append(f"img{n + id_offset:012d}")
            out_fmt.append(fmt)
            out_bytes.append(codecs.encode(px, fmt))
        extra = pa.table({
            "image_id": pa.array(out_id, pa.string()),
            "fmt": pa.array(out_fmt, pa.string()),
            "bytes": pa.array(out_bytes, pa.binary()),
        })
        base_t = batch.select(["image_id", "fmt", "bytes"])
        return pa.concat_tables([base_t, extra.cast(base_t.schema)])

    return images.select_columns(["image_id", "fmt", "bytes"]) \
        .map_batches(with_reencodes, batch_format="pyarrow")


def image_sig_dedup(images: ray.data.Dataset, max_hamming: int = 6,
                    num_parts: int = 32) -> ray.data.Dataset:
    """Multimodal dedup: decode -> ahash 64-bit signature (actor pool)
    -> GROUP BY signature -> (ahash, keeper_id, group_n), keeper = the
    smallest numeric image id. The image analog of text.exact_dedup.

    Pairwise banding (the simhash plan) is deliberately NOT used here:
    visually structured corpora collapse to few distinct signatures
    (the sf0.1 synthetic table has 1,659 distinct ahash values over
    200k images), so pair expansion is quadratic while signature groups
    stay bounded — group dedup is the scale-appropriate shape. The
    physical plan is combiner-style: per-block Acero partials ->
    hash-partition exchange on the signature -> per-partition Acero
    merge (no per-key Ray aggregate)."""
    from ..relational import hash_part
    ah = image_ahash(images)

    def partial(t: pa.Table) -> pa.Table:
        nid = np.array([int(s[3:]) for s in t["image_id"].to_pylist()],
                       np.int64)
        g = pa.table({"ahash": t["ahash"], "nid": pa.array(nid)}) \
            .group_by("ahash").aggregate([("nid", "min"), ("nid", "count")])
        g = g.rename_columns(["ahash", "pk", "pn"])
        key = g["ahash"].combine_chunks().to_numpy()
        return g.append_column("part", pa.array(hash_part(key, num_parts)))

    def merge(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by("ahash").aggregate(
            [("pk", "min"), ("pn", "sum")])
        return pa.table({
            "ahash": g["ahash"],
            "keeper_id": g["pk_min"],
            "group_n": pc.cast(g["pn_sum"], pa.int64()),
        })

    return ah.map_batches(partial, batch_format="pyarrow") \
        .groupby("part").map_groups(merge, batch_format="pyarrow")


# 11 bands partition the 64 phash bits: widths 6x9 + 5x2.  Pigeonhole:
# a pair within hamming distance d <= 10 is identical in at least one
# band, so banded exact-match blocking is a LOSSLESS candidate generator
# (multi-index hamming, Norouzi et al. "Fast Search in Hamming Space
# with Multi-Index Hashing", CVPR 2012 — public method).
PHASH_BANDS: list[tuple[int, int]] = [(0, 6), (6, 6), (12, 6), (18, 6),
                                      (24, 6), (30, 6), (36, 6), (42, 6),
                                      (48, 6), (54, 5), (59, 5)]


def phash_hamming_pairs(images: ray.data.Dataset, max_hamming: int = 10,
                        num_parts: int = 32,
                        max_bucket: int | None = None) -> ray.data.Dataset:
    """Image near-duplicate PAIRS by perceptual-hash hamming distance —
    the pairwise complement of image_sig_dedup (which collapses EXACT
    signature groups): (a, b, hamming) for every image pair whose 64-bit
    phash differs in <= ``max_hamming`` bits.

    Distributed plan (the repo's standard banded exchange, text.py):
      1. map_batches emits one (band_id, band_key, id, phash) row per
         band — 11 bands covering all 64 bits, exact for d <= 10;
      2. hash-partition exchange on the packed bucket key;
      3. partition-local vectorized candidate pairs (text._bucket_pairs_vec);
      4. verify: popcount(xor) <= d from the phash carried through the
         exchange (24 B/row — never the payload bytes);
      5. global pair dedup via the packed-key merge exchange.

    ``max_bucket=None`` keeps in-bucket expansion exhaustive so the gate
    is exact; production corpora with dense top-band buckets (morton-
    style hashes cluster high bits geographically) should pass the
    text.MAX_BUCKET chain cap and accept its documented recall note.
    """
    from .text import (_bucket_pairs_vec, _by_partition, _dedup_pairs,
                       _pair_merge)
    from ..relational import hash_part

    nb = len(PHASH_BANDS)

    def band_stage(t: pa.Table) -> pa.Table:
        ids = pc.cast(pc.utf8_slice_codeunits(
            t["image_id"].combine_chunks(), 3, 99), pa.int64()).to_numpy()
        ph = t["phash"].combine_chunks().to_numpy().view(np.uint64)
        n = len(ids)
        keys = np.empty((n, nb), np.int64)
        for bi, (start, width) in enumerate(PHASH_BANDS):
            keys[:, bi] = ((ph >> np.uint64(start))
                           & np.uint64((1 << width) - 1)).astype(np.int64)
        band_id = np.tile(np.arange(nb, dtype=np.int64), n)
        key_flat = keys.ravel()
        packed = key_flat.astype(np.uint64) * np.uint64(nb) \
            + band_id.astype(np.uint64)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, nb)),
            "band_id": pa.array(band_id),
            "band_key": pa.array(key_flat),
            "sig": pa.array(np.repeat(ph.view(np.int64), nb)),
            "part": pa.array(hash_part(packed, num_parts)),
        })

    rows = images.select_columns(["image_id", "phash"]) \
        .map_batches(band_stage, batch_format="pyarrow", batch_size=4096)

    empty = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                       ("hamming", pa.int64())])

    def pairgen(t: pa.Table) -> pa.Table:
        key = (t["band_key"].combine_chunks().to_numpy() * nb
               + t["band_id"].combine_chunks().to_numpy())
        doc = t["doc_id"].combine_chunks().to_numpy()
        sig = t["sig"].combine_chunks().to_numpy()
        a, b, _, _ = _bucket_pairs_vec(key, doc, sig, max_bucket=max_bucket)
        a, b = _dedup_pairs(a, b)
        if not len(a):
            return empty.empty_table()
        ud, uidx = np.unique(doc, return_index=True)
        sig_u = sig[uidx].astype(np.uint64)
        x = sig_u[np.searchsorted(ud, a)] ^ sig_u[np.searchsorted(ud, b)]
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                            axis=1).sum(axis=1).astype(np.int64)
        m = ham <= max_hamming
        return pa.table({"a": pa.array(a[m]), "b": pa.array(b[m]),
                         "hamming": pa.array(ham[m])}, schema=empty)

    pairs = _by_partition(rows, pairgen)
    return _pair_merge(pairs, [("hamming", "min")], num_parts)


def curation_funnel(images: ray.data.Dataset, min_pixels: int = 512,
                    aspect_num: int = 3, aspect_den: int = 2,
                    min_caption_chars: int = 34) -> ray.data.Dataset:
    """Per-format image curation funnel (the LAION/DataComp accounting
    view, the image sibling of filtering.quality_funnel): how many images
    of each ``fmt`` survive each CUMULATIVE filter stage —

      n_total   — all images
      n_px      — AND w*h >= min_pixels            (resolution floor)
      n_aspect  — AND max(w,h)*aspect_den <= min(w,h)*aspect_num
                  (aspect ratio <= aspect_num/aspect_den, kept as an
                  INTEGER cross-multiply so the DuckDB mirror is exact)
      n_caption — AND length(caption) >= min_caption_chars

    One vectorized metadata-only pass (never touches ``bytes``), Acero
    per-block partials per fmt, one bounded merge (format spaces are
    codec-catalog-sized)."""
    from ..relational import single_merge

    cols = ("n_total", "n_px", "n_aspect", "n_caption")

    def partial(t: pa.Table) -> pa.Table:
        w = t["w"].combine_chunks().to_numpy().astype(np.int64)
        h = t["h"].combine_chunks().to_numpy().astype(np.int64)
        cap = pc.utf8_length(t["caption"].combine_chunks()).to_numpy()
        f1 = (w * h) >= min_pixels
        f2 = f1 & (np.maximum(w, h) * aspect_den
                   <= np.minimum(w, h) * aspect_num)
        f3 = f2 & (cap >= min_caption_chars)
        stage = pa.table({
            "fmt": t["fmt"].combine_chunks(),
            "n_total": pa.array(np.ones(len(t), np.int64)),
            "n_px": pa.array(f1.astype(np.int64)),
            "n_aspect": pa.array(f2.astype(np.int64)),
            "n_caption": pa.array(f3.astype(np.int64)),
        })
        g = stage.group_by("fmt").aggregate([(c, "sum") for c in cols])
        return g.rename_columns(["fmt", *cols])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("fmt").aggregate([(c, "sum") for c in cols])
        out = {"fmt": g["fmt"]}
        for c in cols:
            out[c] = pc.cast(g[f"{c}_sum"], pa.int64())
        return pa.table(out)

    meta = images.select_columns(["fmt", "w", "h", "caption"])
    return single_merge(meta.map_batches(partial, batch_format="pyarrow"),
                        merge)


# (bw, bh) training buckets sorted by aspect ratio ascending — the
# SDXL-style multi-aspect layout quantized to exact small rationals
# (0.5, 2/3, 3/4, 1, 4/3, 3/2, 2) so bucket boundaries are decidable in
# integer arithmetic.
ASPECT_BUCKETS = [(768, 1536), (832, 1248), (864, 1152), (1024, 1024),
                  (1152, 864), (1248, 832), (1536, 768)]


def assign_aspect_bucket(w: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Exact nearest-log-aspect bucket index: the cut between adjacent
    buckets i, i+1 is their geometric-mean ratio, and ``ar >= cut_i``
    is evaluated as the INTEGER cross-multiplication
    ``w*w*(bh_i*bh_{i+1}) >= h*h*(bw_i*bw_{i+1})`` — no float logs, so
    the DuckDB mirror is the identical int64 comparison ladder (the
    same trick image curation_funnel uses for its aspect gate)."""
    w2 = w.astype(np.int64) ** 2
    h2 = h.astype(np.int64) ** 2
    bucket = np.zeros(len(w), np.int64)
    for i in range(len(ASPECT_BUCKETS) - 1):
        bw1, bh1 = ASPECT_BUCKETS[i]
        bw2, bh2 = ASPECT_BUCKETS[i + 1]
        bucket += (w2 * (bh1 * bh2) >= h2 * (bw1 * bw2)).astype(np.int64)
    return bucket


def aspect_bucket_pack(images: ray.data.Dataset, batch_size: int = 64,
                       range_size: int = 64, num_parts: int = 32,
                       ) -> ray.data.Dataset:
    """Multi-aspect training-batch packing: every image goes to its
    exact nearest-aspect bucket (ASPECT_BUCKETS) and gets a
    deterministic (batch_idx, slot) position in the image_id-ordered
    stream of its bucket — the batching layout aspect-bucketed
    diffusion training consumes (one resolution per micro-batch).
    Emits (image_id, bucket, bucket_w, bucket_h, batch_idx, slot).

    Physical plan (the token_pack recipe, §2.9-adjacent): bucket
    assignment is row-local integer math; per-bucket global ranks come
    from (a) bounded per-(bucket, id-range) Acero count partials whose
    per-range totals collect to the driver for an exclusive prefix
    (rows collected = n_buckets x n_ranges — past ~1e5 ranges the
    token_pack phase-B super-range tree is the drop-in scale path),
    and (b) ONE narrow hash(range) exchange of (image_id, bucket) rows
    so each partition kernel ranks its ranges locally (sort by id,
    cumcount per (bucket, range), rebase on the broadcast prefix).
    The wide columns (bytes) never enter the exchange."""
    from ..relational import hash_part

    n_cuts = len(ASPECT_BUCKETS)

    def tag(t: pa.Table) -> pa.Table:
        iid = pc.cast(pc.utf8_slice_codeunits(
            t["image_id"].combine_chunks(), 3, 15), pa.int64()).to_numpy()
        w = t["w"].combine_chunks().to_numpy()
        h = t["h"].combine_chunks().to_numpy()
        b = assign_aspect_bucket(w, h)
        return pa.table({
            "image_id": t["image_id"].combine_chunks(),
            "iid": pa.array(iid),
            "bucket": pa.array(b),
            "rkey": pa.array(iid // range_size),
        })

    tagged = images.select_columns(["image_id", "w", "h"]) \
        .map_batches(tag, batch_format="pyarrow").materialize()

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.select(["bucket", "rkey"]).append_column(
            "one", pa.array(np.ones(len(t), np.int64))) \
            .group_by(["bucket", "rkey"]).aggregate([("one", "sum")])
        return g.rename_columns(["bucket", "rkey", "n"])

    parts = [b.replace_schema_metadata(None) for b in
             ray.get(tagged.map_batches(count_partial,
                                        batch_format="pyarrow")
                     .to_arrow_refs())]
    counts = pa.concat_tables([b for b in parts if b.num_rows]) \
        .group_by(["bucket", "rkey"]).aggregate([("n", "sum")]) \
        .rename_columns(["bucket", "rkey", "n"])
    cb = counts["bucket"].to_numpy()
    cr = counts["rkey"].to_numpy()
    cn = counts["n"].to_numpy()
    o = np.lexsort((cr, cb))
    cb, cr, cn = cb[o], cr[o], cn[o]
    base = np.concatenate([[0], np.cumsum(cn)[:-1]])
    # restart the prefix at each bucket boundary
    starts = np.flatnonzero(np.concatenate([[True], cb[1:] != cb[:-1]]))
    base = base - np.repeat(base[starts], np.diff(
        np.concatenate([starts, [len(cb)]])))
    big = np.int64(1) << np.int64(40)
    off_ref = ray.put((cb * big + cr, base))

    def part_col(t: pa.Table) -> pa.Table:
        return t.append_column("part", pa.array(
            hash_part(t["rkey"].combine_chunks().to_numpy(), num_parts)))

    bw = np.array([b[0] for b in ASPECT_BUCKETS], np.int64)
    bh = np.array([b[1] for b in ASPECT_BUCKETS], np.int64)

    def rank_kernel(t: pa.Table) -> pa.Table:
        keys_sorted, bases = ray.get(off_ref)
        iid = t["iid"].combine_chunks().to_numpy()
        b = t["bucket"].combine_chunks().to_numpy()
        r = t["rkey"].combine_chunks().to_numpy()
        k = b * big + r
        o = np.lexsort((iid, k))
        ks, iids = k[o], iid[o]
        run = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
        lens = np.diff(np.concatenate([run, [len(ks)]]))
        within = np.arange(len(ks)) - np.repeat(run, lens)
        grp_base = bases[np.searchsorted(keys_sorted, ks[run])]
        rank = within + np.repeat(grp_base, lens)
        bo = b[o]
        return pa.table({
            "image_id": t["image_id"].combine_chunks().take(pa.array(o)),
            "bucket": pa.array(bo),
            "bucket_w": pa.array(bw[bo]),
            "bucket_h": pa.array(bh[bo]),
            "batch_idx": pa.array(rank // batch_size),
            "slot": pa.array(rank % batch_size),
        })

    return tagged.map_batches(part_col, batch_format="pyarrow") \
        .groupby("part").map_groups(rank_kernel, batch_format="pyarrow")


def caption_align(images: ray.data.Dataset, nd: int = 6) -> ray.data.Dataset:
    """(fmt, n, corr): per-format Pearson correlation between caption
    character length and image pixel count — the cheap caption/image
    agreement audit a multimodal corpus runs before pairing-quality
    filtering (a format whose captions don't grow with image size is a
    scraping artifact).

    Scale shape: the classic 6-moment correlation combiner — each block
    collapses to (fmt, n, sx, sy, sxx, syy, sxy); formats are a bounded
    key space so partials merge in one task. Matches DuckDB's corr()
    within 6dp (sample correlation is scale-invariant, so the
    population-moment formula below is algebraically identical)."""
    import pyarrow.compute as pc

    from ..relational import single_merge
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        x = pc.utf8_length(t["caption"].combine_chunks()).to_numpy() \
            .astype(np.float64)
        y = (t["w"].combine_chunks().to_numpy().astype(np.float64)
             * t["h"].combine_chunks().to_numpy().astype(np.float64))
        g = pa.table({
            "fmt": t["fmt"], "one": pa.array(np.ones(len(x), np.int64)),
            "sx": pa.array(x), "sy": pa.array(y),
            "sxx": pa.array(x * x), "syy": pa.array(y * y),
            "sxy": pa.array(x * y),
        }).group_by("fmt").aggregate(
            [("one", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")])
        return g.rename_columns(["fmt", "n", "sx", "sy",
                                 "sxx", "syy", "sxy"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("fmt").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")])
        n = g["n_sum"].combine_chunks().to_numpy().astype(np.float64)
        sx = g["sx_sum"].combine_chunks().to_numpy()
        sy = g["sy_sum"].combine_chunks().to_numpy()
        sxx = g["sxx_sum"].combine_chunks().to_numpy()
        syy = g["syy_sum"].combine_chunks().to_numpy()
        sxy = g["sxy_sum"].combine_chunks().to_numpy()
        num = n * sxy - sx * sy
        den = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
        r = np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0)
        return pa.table({
            "fmt": g["fmt"],
            "n": pc.cast(g["n_sum"], pa.int64()),
            "corr": pa.array(np.asarray(round_half_away(r, nd))),
        })

    return single_merge(
        images.select_columns(["fmt", "caption", "w", "h"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        merge)


def _entropy_from_counts(cnt: np.ndarray) -> float:
    """Shannon entropy (nats) of a bucket-count vector — the shared
    numeric definition (bucket-ascending nonzero p*log(p) sum over
    exact integer counts; both gate sides call this)."""
    nz = cnt[cnt > 0].astype(np.float64)
    p = nz / float(cnt.sum())
    return float(-(p * np.log(p)).sum())


class ImageEntropy:
    """Actor-pool stage: decode each image and emit the Shannon entropy
    of its 16-bucket (px >> 4) luma histogram — the flat/blank-image
    detector of an image-curation funnel (near-zero entropy = solid
    fills, synthetic gradients, failed captures). Error-as-data like
    DecodeStats."""

    def __init__(self):
        self.registry = codecs.FORMATS

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        from ..util import round_half_away
        ok, ent, used = [], [], []
        for f, b in zip(fmts, blobs):
            try:
                px = codecs.decode(b, f)
                cnt = np.bincount((px.ravel() >> 4), minlength=16)
                ok.append(True)
                ent.append(float(round_half_away(
                    _entropy_from_counts(cnt), 6)))
                used.append(int((cnt > 0).sum()))
            except Exception:
                ok.append(False)
                ent.append(0.0)
                used.append(0)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "ok": pa.array(ok, pa.bool_()),
            "entropy6": pa.array(ent, pa.float64()),
            "n_buckets": pa.array(used, pa.int64()),
        })


def image_entropy(images: ray.data.Dataset, concurrency=None,
                  batch_size: int = 1024) -> ray.data.Dataset:
    from ..util import default_pool
    pool = concurrency or default_pool(24)
    return images.map_batches(
        ImageEntropy, batch_format="pyarrow", batch_size=batch_size,
        concurrency=pool)


# ----------------------------------------------------------------- nms

_NMS_GOLD = np.uint64(0x9E3779B97F4A7C15)
_NMS_M1 = np.uint64(0xBF58476D1CE4E5B9)
_NMS_M2 = np.uint64(0x94D049BB133111EB)


def _nms_splitmix(z: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (wrapping uint64 arithmetic)."""
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * _NMS_M1
        z = (z ^ (z >> np.uint64(27))) * _NMS_M2
        return z ^ (z >> np.uint64(31))


def synth_boxes(phash: np.ndarray, w: np.ndarray, h: np.ndarray,
                k: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic per-image candidate boxes: box j of an image is a
    pure function of (phash, j) via splitmix64, sized 15-60% of the
    image and centred anywhere on it, with a 24-bit integer score.
    Returns (boxes[N,k,4] float64 x0,y0,x1,y1, scores[N,k] int64).
    (The container has no detector model — per the brief the decode /
    model step is faked deterministically while the Ray plumbing and
    the NMS kernel are real.)"""
    ph = phash.astype(np.int64).view(np.uint64)[:, None]
    ks = (np.arange(k, dtype=np.uint64) + np.uint64(1))[None, :]
    with np.errstate(over="ignore"):
        r = _nms_splitmix(ph + ks * _NMS_GOLD)
    f16 = np.float64(65536.0)
    m16 = np.uint64(0xFFFF)
    wf, hf = w.astype(np.float64)[:, None], h.astype(np.float64)[:, None]
    cx = ((r & m16).astype(np.float64) / f16) * wf
    cy = (((r >> np.uint64(16)) & m16).astype(np.float64) / f16) * hf
    bw = (0.15 + ((r >> np.uint64(32)) & m16).astype(np.float64)
          / f16 * 0.45) * wf
    bh = (0.15 + ((r >> np.uint64(48)) & m16).astype(np.float64)
          / f16 * 0.45) * hf
    boxes = np.stack([cx - bw / 2.0, cy - bh / 2.0,
                      cx + bw / 2.0, cy + bh / 2.0], axis=2)
    scores = (_nms_splitmix(r) & np.uint64(0xFFFFFF)).astype(np.int64)
    return boxes, scores


def detect_nms(images: ray.data.Dataset, k: int = 6,
               iou_thresh: float = 0.5,
               batch_size: int = 4096) -> ray.data.Dataset:
    """(image_id, n_kept, keep_mask): greedy non-maximum suppression
    over each image's k synthetic detection boxes — a box is dropped
    when a higher-scoring kept box overlaps it with IoU > ``iou_thresh``
    (ties broken by ascending box index; scores are 24-bit integers so
    ordering is exact).  keep_mask packs the surviving original box
    indices as a bitmask, so the result is integer-exact and
    order-free.

    Scale plan: pure per-row map_batches — the greedy scan is O(k^2)
    per image but vectorized ACROSS the batch (k x k passes of numpy
    over all images at once, no per-row Python), the exact shape a
    batched detector post-process has at 100 TB."""
    def fn(t: pa.Table) -> pa.Table:
        ph = t["phash"].combine_chunks().to_numpy()
        w = t["w"].combine_chunks().to_numpy()
        h = t["h"].combine_chunks().to_numpy()
        boxes, scores = synth_boxes(ph, w, h, k)
        n = len(ph)
        # per-image order: score DESC, box index ASC (exact int key)
        key = scores * np.int64(k) + (np.int64(k - 1)
                                      - np.arange(k, dtype=np.int64))
        idx = np.argsort(-key, axis=1, kind="stable")
        rows = np.arange(n)[:, None]
        b = boxes[rows, idx]          # (n, k, 4) sorted by rank
        area = (b[:, :, 2] - b[:, :, 0]) * (b[:, :, 3] - b[:, :, 1])
        keep = np.ones((n, k), bool)
        for a in range(1, k):
            for p in range(a):
                ix0 = np.maximum(b[:, a, 0], b[:, p, 0])
                iy0 = np.maximum(b[:, a, 1], b[:, p, 1])
                ix1 = np.minimum(b[:, a, 2], b[:, p, 2])
                iy1 = np.minimum(b[:, a, 3], b[:, p, 3])
                inter = np.maximum(ix1 - ix0, 0.0) \
                    * np.maximum(iy1 - iy0, 0.0)
                iou = inter / (area[:, a] + area[:, p] - inter)
                keep[:, a] &= ~(keep[:, p] & (iou > iou_thresh))
        mask = np.zeros(n, np.int64)
        for a in range(k):
            mask |= np.where(keep[:, a],
                             np.int64(1) << idx[:, a].astype(np.int64),
                             0)
        return pa.table({
            "image_id": t["image_id"],
            "n_kept": pa.array(keep.sum(axis=1).astype(np.int64)),
            "keep_mask": pa.array(mask)})

    return images.map_batches(fn, batch_format="pyarrow",
                               batch_size=batch_size)


def cell_image_mosaic(images: ray.data.Dataset, res: int = 7,
                      k: int = 4, side: int = 16, num_parts: int = 8,
                      nd: int = 6) -> ray.data.Dataset:
    """(cell, n_imgs, mean6, crc): per-geocell CONTACT SHEET — the k
    lexicographically-first images of each slippy cell at ``res``
    decode, thumbnail (codecs.nn_thumb, the ahash subsample rule) and
    paste row-major onto a ceil(sqrt(k))-grid canvas; the query emits
    the canvas's exact integer mean and crc32 so the full byte surface
    is oracle-checkable without shipping canvases through the gate.
    The map-tile preview / visual-QA layer over a geotagged corpus.

    Scale plan: the per-block kernel selects each cell's k smallest
    image ids BEFORE the exchange (bytes for at most k x cells-per-
    block rows move, never the corpus), one bounded cell-hash exchange
    co-locates finalists, and the per-partition merge re-selects the
    global k and decodes only winners — decode cost is k x occupied
    cells no matter the corpus size.  Selection by id is deterministic
    and restart-stable."""
    import zlib

    from ..geo import tiles
    from ..relational import hash_part
    from ..stages.assign import decode_geotag
    from ..util import round_half_away

    grid = int(np.ceil(np.sqrt(k)))

    def partial(t: pa.Table) -> pa.Table:
        t = decode_geotag(t)
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        cell = tiles.cell_id(lon, lat, res)
        iid = np.asarray(t["image_id"].combine_chunks().to_pylist(),
                         dtype=object)
        order = np.lexsort((iid, cell))
        c_o = cell[order]
        starts = np.flatnonzero(np.r_[True, c_o[1:] != c_o[:-1]]) \
            if len(c_o) else np.empty(0, np.int64)
        rank = np.arange(len(c_o), dtype=np.int64) - np.repeat(
            starts, np.diff(np.r_[starts, len(c_o)]))
        take = order[rank < k]
        sub = t.select(["image_id", "fmt", "bytes"]).take(pa.array(take))
        return (sub.append_column("cell", pa.array(cell[take]))
                .append_column("part", pa.array(
                    hash_part(cell[take], num_parts))))

    def merge(t: pa.Table) -> pa.Table:
        cell = t["cell"].combine_chunks().to_numpy()
        iid = np.asarray(t["image_id"].combine_chunks().to_pylist(),
                         dtype=object)
        order = np.lexsort((iid, cell))
        c_o = cell[order]
        starts = np.flatnonzero(np.r_[True, c_o[1:] != c_o[:-1]]) \
            if len(c_o) else np.empty(0, np.int64)
        rank = np.arange(len(c_o), dtype=np.int64) - np.repeat(
            starts, np.diff(np.r_[starts, len(c_o)]))
        keep = rank < k
        sel = order[keep]
        fmts = t["fmt"].combine_chunks()
        blobs = t["bytes"].combine_chunks()
        out = {"cell": [], "n_imgs": [], "mean6": [], "crc": []}
        canvas_cells = c_o[keep]
        bounds = np.flatnonzero(
            np.r_[True, canvas_cells[1:] != canvas_cells[:-1]])
        for gi, s in enumerate(bounds):
            e = bounds[gi + 1] if gi + 1 < len(bounds) \
                else len(canvas_cells)
            canvas = np.zeros((grid * side, grid * side, 3), np.uint8)
            for slot, row in enumerate(sel[s:e]):
                px = codecs.decode(blobs[int(row)].as_py(),
                                   fmts[int(row)].as_py())
                th = codecs.nn_thumb(px, side)
                y, x = (slot // grid) * side, (slot % grid) * side
                canvas[y:y + side, x:x + side] = th
            out["cell"].append(int(canvas_cells[s]))
            out["n_imgs"].append(e - s)
            out["mean6"].append(float(round_half_away(np.float64(
                int(canvas.astype(np.int64).sum()) / canvas.size), nd)))
            out["crc"].append(zlib.crc32(canvas.tobytes()))
        return pa.table({
            "cell": pa.array(out["cell"], pa.int64()),
            "n_imgs": pa.array(out["n_imgs"], pa.int64()),
            "mean6": pa.array(out["mean6"], pa.float64()),
            "crc": pa.array(out["crc"], pa.int64())})

    return (images.map_batches(partial, batch_format="pyarrow",
                               batch_size=1024)
            .groupby("part")
            .map_groups(lambda t: merge(t.drop_columns(["part"])),
                        batch_format="pyarrow"))


class TranscodeQnt5:
    """Actor-pool stage: decode -> re-encode to the 5-bit quantized
    codec -> round-trip decode; emits the compression outcome per
    image (output size, exact byte-shrink ratio, round-trip PSNR).
    The format-migration / storage-planning pass of an image corpus:
    all state-free codec work, batched in the pool so the byte blobs
    never cross an exchange."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        rows = {"image_id": [], "fmt": [], "in_bytes": [],
                "out_bytes": [], "psnr6": []}
        for iid, f, b in zip(ids, fmts, blobs):
            px = codecs.decode(b, f)
            out = codecs.encode(px, "qnt5")
            rt = codecs.decode(out, "qnt5")
            p = codecs.psnr(px, rt)
            rows["image_id"].append(iid)
            rows["fmt"].append(f)
            rows["in_bytes"].append(len(b))
            rows["out_bytes"].append(len(out))
            rows["psnr6"].append(round(min(p, 999.0), 6))
        return pa.table({
            "image_id": pa.array(rows["image_id"], pa.string()),
            "fmt": pa.array(rows["fmt"], pa.string()),
            "in_bytes": pa.array(rows["in_bytes"], pa.int64()),
            "out_bytes": pa.array(rows["out_bytes"], pa.int64()),
            "psnr6": pa.array(rows["psnr6"], pa.float64())})


def image_transcode(images: ray.data.Dataset, concurrency=None,
                    batch_size: int = 512) -> ray.data.Dataset:
    """(image_id, fmt, in_bytes, out_bytes, psnr6): qnt5 migration
    outcome per image — see TranscodeQnt5."""
    from ..util import default_pool
    return images.map_batches(TranscodeQnt5, batch_format="pyarrow",
                              batch_size=batch_size,
                              concurrency=concurrency or default_pool())


# ------------------------------------------------- curation quality gates


def _ssim_from_moments(n: int, sx: int, sy: int, sxx: int, syy: int,
                       sxy: int, lum_range: float = 765.0) -> float:
    """Global SSIM from EXACT integer luma moments — the shared numeric
    definition (both gate sides call this with independently-computed
    integer sums, so the double expression order is identical)."""
    c1 = (0.01 * lum_range) ** 2
    c2 = (0.03 * lum_range) ** 2
    mx, my = sx / n, sy / n
    vx = sxx / n - mx * mx
    vy = syy / n - my * my
    cov = sxy / n - mx * my
    return ((2.0 * mx * my + c1) * (2.0 * cov + c2)) / \
        ((mx * mx + my * my + c1) * (vx + vy + c2))


class ImageSharpness:
    """Actor-pool stage: decode -> summed-channel luma -> interior
    Laplacian (4c - up - down - left - right) -> its EXACT integer
    variance ((n*S2 - S1^2) / n^2) — the classic blur/defocus screen
    of an image-curation funnel (low variance = blurry or flat).
    Error-as-data like DecodeStats."""

    def __init__(self):
        self.registry = codecs.FORMATS

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..util import round_half_away
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ok, npx, var6 = [], [], []
        for f, b in zip(fmts, blobs):
            try:
                px = codecs.decode(b, f)
                lum = px.astype(np.int64).sum(axis=2)
                lap = (4 * lum[1:-1, 1:-1] - lum[:-2, 1:-1]
                       - lum[2:, 1:-1] - lum[1:-1, :-2] - lum[1:-1, 2:])
                n = lap.size
                s1 = int(lap.sum())
                s2 = int((lap * lap).sum())
                v = (n * s2 - s1 * s1) / (n * n)
                ok.append(True)
                npx.append(n)
                var6.append(float(round_half_away(np.float64(v), 6)))
            except Exception:
                ok.append(False)
                npx.append(0)
                var6.append(0.0)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "ok": pa.array(ok, pa.bool_()),
            "n_px": pa.array(npx, pa.int64()),
            "lap_var6": pa.array(var6, pa.float64())})


def image_sharpness(images: ray.data.Dataset, concurrency=None,
                    batch_size: int = 1024) -> ray.data.Dataset:
    """(image_id, ok, n_px, lap_var6): Laplacian-variance sharpness
    per image — see ImageSharpness."""
    from ..util import default_pool
    return images.map_batches(ImageSharpness, batch_format="pyarrow",
                              batch_size=batch_size,
                              concurrency=concurrency or default_pool(24))


class ImagePalette:
    """Actor-pool stage: decode -> 4x4x4 RGB cube histogram (64 buckets,
    2 high bits per channel) -> dominant bucket + its share + color
    count — the monochrome/solid-fill and palette-diversity screen.
    Ties break to the SMALLEST bucket id (argmax-first both sides);
    all stats are exact integer ratios."""

    def __init__(self):
        self.registry = codecs.FORMATS

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..util import round_half_away
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ok, top, share, ncol = [], [], [], []
        for f, b in zip(fmts, blobs):
            try:
                px = codecs.decode(b, f).astype(np.int64)
                bucket = ((px[..., 0] >> 6) << 4) | \
                    ((px[..., 1] >> 6) << 2) | (px[..., 2] >> 6)
                cnt = np.bincount(bucket.ravel(), minlength=64)
                t = int(np.argmax(cnt))
                ok.append(True)
                top.append(t)
                share.append(float(round_half_away(
                    np.float64(cnt[t] / bucket.size), 6)))
                ncol.append(int((cnt > 0).sum()))
            except Exception:
                ok.append(False)
                top.append(-1)
                share.append(0.0)
                ncol.append(0)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "ok": pa.array(ok, pa.bool_()),
            "top_bucket": pa.array(top, pa.int64()),
            "top_share6": pa.array(share, pa.float64()),
            "n_colors": pa.array(ncol, pa.int64())})


def image_palette(images: ray.data.Dataset, concurrency=None,
                  batch_size: int = 1024) -> ray.data.Dataset:
    """(image_id, ok, top_bucket, top_share6, n_colors): dominant
    RGB-cube bucket per image — see ImagePalette."""
    from ..util import default_pool
    return images.map_batches(ImagePalette, batch_format="pyarrow",
                              batch_size=batch_size,
                              concurrency=concurrency or default_pool(24))


class ImageSSIM:
    """Actor-pool stage: decode -> qnt5 round-trip -> GLOBAL SSIM on
    the summed-channel luma (exact integer moments fed to the shared
    _ssim_from_moments expression) — the perceptual fidelity sibling
    of image_transcode's PSNR (what a lossy-migration QA gate reads)."""

    def __init__(self):
        self.registry = codecs.FORMATS

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..util import round_half_away
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        rows = {"image_id": [], "fmt": [], "ssim6": []}
        for iid, f, b in zip(ids, fmts, blobs):
            px = codecs.decode(b, f)
            rt = codecs.decode(codecs.encode(px, "qnt5"), "qnt5")
            x = px.astype(np.int64).sum(axis=2).ravel()
            y = rt.astype(np.int64).sum(axis=2).ravel()
            s = _ssim_from_moments(
                x.size, int(x.sum()), int(y.sum()),
                int((x * x).sum()), int((y * y).sum()),
                int((x * y).sum()))
            rows["image_id"].append(iid)
            rows["fmt"].append(f)
            rows["ssim6"].append(float(round_half_away(np.float64(s),
                                                       6)))
        return pa.table({
            "image_id": pa.array(rows["image_id"], pa.string()),
            "fmt": pa.array(rows["fmt"], pa.string()),
            "ssim6": pa.array(rows["ssim6"], pa.float64())})


def image_ssim(images: ray.data.Dataset, concurrency=None,
               batch_size: int = 512) -> ray.data.Dataset:
    """(image_id, fmt, ssim6): luma SSIM of the qnt5 round-trip —
    see ImageSSIM."""
    from ..util import default_pool
    return images.map_batches(ImageSSIM, batch_format="pyarrow",
                              batch_size=batch_size,
                              concurrency=concurrency or default_pool())


class ImageBorderContrast:
    """Actor-pool stage: decode -> mean luma of the 2-px border frame
    vs the interior, as EXACT integer cross-products — the solid
    border / letterbox / watermark-frame screen (ratio far from 1 =
    framed content). Error-as-data like DecodeStats."""

    BORDER = 2

    def __init__(self):
        self.registry = codecs.FORMATS

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..util import round_half_away
        w = self.BORDER
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ok, bm6, ratio6 = [], [], []
        for f, b in zip(fmts, blobs):
            try:
                px = codecs.decode(b, f)
                lum = px.astype(np.int64).sum(axis=2)
                tot = int(lum.sum())
                inner = lum[w:-w, w:-w]
                s_i = int(inner.sum())
                n_i = inner.size
                s_b = tot - s_i
                n_b = lum.size - n_i
                ok.append(True)
                bm6.append(float(round_half_away(
                    np.float64(s_b / n_b), 6)))
                # one double division of exact integer products
                ratio6.append(float(round_half_away(
                    np.float64((s_b * n_i) / (s_i * n_b)), 6)))
            except Exception:
                ok.append(False)
                bm6.append(0.0)
                ratio6.append(0.0)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "ok": pa.array(ok, pa.bool_()),
            "border_mean6": pa.array(bm6, pa.float64()),
            "ratio6": pa.array(ratio6, pa.float64())})


def image_border_contrast(images: ray.data.Dataset, concurrency=None,
                          batch_size: int = 1024) -> ray.data.Dataset:
    """(image_id, ok, border_mean6, ratio6): border-vs-interior luma
    contrast per image — see ImageBorderContrast."""
    from ..util import default_pool
    return images.map_batches(ImageBorderContrast,
                              batch_format="pyarrow",
                              batch_size=batch_size,
                              concurrency=concurrency or default_pool(24))


def _octant_bins(dx: np.ndarray, dy: np.ndarray) -> np.ndarray:
    """Exact-integer gradient octant (0..7, counter-clockwise from
    east, pi/4 each) — the shared numeric definition for the
    orientation histogram (both gate sides call this; boundaries are
    fixed by the strict/non-strict choices below, no atan2)."""
    a, b = np.abs(dx), np.abs(dy)
    # quadrant by signs (dy >= 0 owns the upper half, dx >= 0 the
    # right half), then the |dy| > |dx| diagonal splits each quadrant
    q = np.where(dy >= 0, np.where(dx > 0, 0, 1),
                 np.where(dx < 0, 2, 3))
    steep = b > a
    oct0 = np.where(steep, 1, 0)   # 0: E..NE, 1: NE..N
    oct1 = np.where(steep, 2, 3)   # 2: N..NW, 3: NW..W
    oct2 = np.where(steep, 5, 4)   # 4: W..SW, 5: SW..S
    oct3 = np.where(steep, 6, 7)   # 6: S..SE, 7: SE..E
    return np.choose(q, [oct0, oct1, oct2, oct3])


class ImageOrientation:
    """Actor-pool stage: decode -> integer central-difference gradients
    on the summed-channel luma -> exact octant histogram (HOG-lite) ->
    dominant octant + share — the texture-direction screen (scan lines,
    rotated documents, synthetic gratings all show a spiked histogram).
    Zero gradients are excluded; ties break to the smallest octant."""

    def __init__(self):
        self.registry = codecs.FORMATS

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..util import round_half_away
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ok, ng, dom, share = [], [], [], []
        for f, b in zip(fmts, blobs):
            try:
                px = codecs.decode(b, f)
                lum = px.astype(np.int64).sum(axis=2)
                dx = lum[1:-1, 2:] - lum[1:-1, :-2]
                dy = lum[2:, 1:-1] - lum[:-2, 1:-1]
                nz = (dx != 0) | (dy != 0)
                bins = _octant_bins(dx[nz], dy[nz])
                cnt = np.bincount(bins, minlength=8)
                n = int(cnt.sum())
                t = int(np.argmax(cnt)) if n else -1
                ok.append(True)
                ng.append(n)
                dom.append(t)
                share.append(float(round_half_away(
                    np.float64(cnt[t] / n), 6)) if n else 0.0)
            except Exception:
                ok.append(False)
                ng.append(0)
                dom.append(-1)
                share.append(0.0)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "ok": pa.array(ok, pa.bool_()),
            "n_grad": pa.array(ng, pa.int64()),
            "dom_oct": pa.array(dom, pa.int64()),
            "dom_share6": pa.array(share, pa.float64())})


def image_orientation(images: ray.data.Dataset, concurrency=None,
                      batch_size: int = 1024) -> ray.data.Dataset:
    """(image_id, ok, n_grad, dom_oct, dom_share6): dominant gradient
    octant per image — see ImageOrientation."""
    from ..util import default_pool
    return images.map_batches(ImageOrientation, batch_format="pyarrow",
                              batch_size=batch_size,
                              concurrency=concurrency or default_pool(24))


def caption_dupes(images: ray.data.Dataset,
                  num_parts: int = 32) -> ray.data.Dataset:
    """(template, n_images, n_fmts, keeper): duplicate caption-TEMPLATE
    groups across the image corpus (digit runs collapsed to '#', every
    group with n >= 2) — the boilerplate/alt-text-template screen of an
    image+caption training set (crawled captions differ only in ids or
    counters far more often than verbatim); keeper = the smallest
    image_id, n_fmts = distinct encodings carrying the template.

    Scale plan: per-block Arrow regex normalize + Acero (template, fmt)
    partials, ONE bounded hash(template) exchange (payload = one row
    per distinct pair per block), two-level Acero merge per partition.
    RE2 is shared with the DuckDB mirror (the pii_redact precedent)."""
    from ..relational import _col_hash, hash_part

    def partial(t: pa.Table) -> pa.Table:
        t = t.set_column(
            t.schema.get_field_index("caption"), "caption",
            pc.replace_substring_regex(t["caption"].combine_chunks(),
                                       "[0-9]+", "#"))
        g = t.group_by(["caption", "fmt"]).aggregate(
            [("image_id", "count"), ("image_id", "min")])
        h = _col_hash(g["caption"]).astype(np.int64)
        return pa.table({
            "caption": g["caption"],
            "fmt": g["fmt"],
            "n": pc.cast(g["image_id_count"], pa.int64()),
            "keeper": g["image_id_min"],
            "part": pa.array(hash_part(h, num_parts))})

    def merge(t: pa.Table) -> pa.Table:
        g = t.drop_columns(["part"]).group_by(["caption", "fmt"]) \
            .aggregate([("n", "sum"), ("keeper", "min")])
        g2 = g.group_by("caption").aggregate(
            [("n_sum", "sum"), ([], "count_all"), ("keeper_min", "min")])
        n = g2["n_sum_sum"].combine_chunks().to_numpy()
        keep = n >= 2
        return pa.table({
            "template": g2["caption"].combine_chunks().filter(
                pa.array(keep)),
            "n_images": pa.array(n[keep].astype(np.int64)),
            "n_fmts": pc.cast(g2["count_all"], pa.int64())
            .combine_chunks().filter(pa.array(keep)),
            "keeper": g2["keeper_min_min"].combine_chunks().filter(
                pa.array(keep))})

    return images.select_columns(["image_id", "caption", "fmt"]) \
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=65536) \
        .groupby("part") \
        .map_groups(merge, batch_format="pyarrow")


class ImageFlipAsym:
    """Actor-pool stage: decode -> exact integer horizontal-flip
    asymmetry of the summed-channel luma — mean |L(x,y) - L(w-1-x,y)|
    over all pixels plus the max deviation. A cheap augmentation probe:
    near-zero asym means horizontal flips are free; large asym flags
    orientation-sensitive content (text, gradients)."""

    def __init__(self):
        self.registry = codecs.FORMATS

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..util import round_half_away
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ok, npx, asym, mx = [], [], [], []
        for f, b in zip(fmts, blobs):
            try:
                lum = codecs.decode(b, f).astype(np.int64).sum(axis=2)
                d = np.abs(lum - lum[:, ::-1])
                n = int(d.size)
                s = int(d.sum())
                ok.append(True)
                npx.append(n)
                asym.append(float(round_half_away(np.float64(s / n), 6)))
                mx.append(int(d.max()))
            except Exception:
                ok.append(False)
                npx.append(0)
                asym.append(0.0)
                mx.append(0)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "ok": pa.array(ok, pa.bool_()),
            "n_px": pa.array(npx, pa.int64()),
            "asym6": pa.array(asym, pa.float64()),
            "max_d": pa.array(mx, pa.int64())})


def image_flip_asym(images: ray.data.Dataset, concurrency=None,
                    batch_size: int = 1024) -> ray.data.Dataset:
    """(image_id, ok, n_px, asym6, max_d): horizontal-flip asymmetry
    per image — see ImageFlipAsym."""
    from ..util import default_pool
    return images.map_batches(ImageFlipAsym, batch_format="pyarrow",
                              batch_size=batch_size,
                              concurrency=concurrency or default_pool(24))


class ImageBlobCount:
    """Actor-pool stage: decode -> threshold the summed-channel luma
    STRICTLY above its exact per-image mean (integer cross-multiply
    lum * n_px > sum, no float mean) -> count 4-connected foreground
    components + the largest blob, via union-find with path compression
    over the adjacent-pixel edge list (the pyoracle mirror uses BFS
    flood fill — an independent labeling algorithm). The
    segmentation-complexity screen of an image-curation funnel: 1 blob
    = flat/gradient content, many = texture."""

    def __init__(self):
        self.registry = codecs.FORMATS

    @staticmethod
    def _label(mask: np.ndarray) -> tuple[int, int]:
        """(n_blobs, max_blob) of a 2-D bool mask, 4-connectivity."""
        idx = np.full(mask.shape, -1, np.int64)
        fg = np.flatnonzero(mask)
        if fg.size == 0:
            return 0, 0
        idx.ravel()[fg] = np.arange(fg.size)
        right = mask[:, :-1] & mask[:, 1:]
        down = mask[:-1, :] & mask[1:, :]
        ea = np.concatenate([idx[:, :-1][right], idx[:-1, :][down]])
        eb = np.concatenate([idx[:, 1:][right], idx[1:, :][down]])
        parent = list(range(fg.size))

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(ea.tolist(), eb.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        roots = np.fromiter((find(i) for i in range(fg.size)),
                            np.int64, fg.size)
        sizes = np.bincount(roots)
        sizes = sizes[sizes > 0]
        return int(len(sizes)), int(sizes.max())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ok, npx, nfg, nb, mb = [], [], [], [], []
        for f, b in zip(fmts, blobs):
            try:
                lum = codecs.decode(b, f).astype(np.int64).sum(axis=2)
                n = int(lum.size)
                s = int(lum.sum())
                mask = lum * n > s
                k, m = self._label(mask)
                ok.append(True)
                npx.append(n)
                nfg.append(int(mask.sum()))
                nb.append(k)
                mb.append(m)
            except Exception:
                ok.append(False)
                npx.append(0)
                nfg.append(0)
                nb.append(0)
                mb.append(0)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "ok": pa.array(ok, pa.bool_()),
            "n_px": pa.array(npx, pa.int64()),
            "n_fg": pa.array(nfg, pa.int64()),
            "n_blobs": pa.array(nb, pa.int64()),
            "max_blob": pa.array(mb, pa.int64())})


def image_blob_count(images: ray.data.Dataset, concurrency=None,
                     batch_size: int = 1024) -> ray.data.Dataset:
    """(image_id, ok, n_px, n_fg, n_blobs, max_blob): 4-connected
    above-mean-luma component census per image — see ImageBlobCount."""
    from ..util import default_pool
    return images.map_batches(ImageBlobCount, batch_format="pyarrow",
                              batch_size=batch_size,
                              concurrency=concurrency or default_pool(24))


class ImageCropRetention:
    """Actor-pool stage: decode -> exact fraction of total luma mass
    retained by the max centered square crop (side = min(w, h), offset
    (dim - side) // 2) — the aspect-ratio-normalization safety probe a
    curation funnel reads before center-cropping to square (low
    retention = the signal lives in the trimmed margins)."""

    def __init__(self):
        self.registry = codecs.FORMATS

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..util import round_half_away
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ok, side, ret = [], [], []
        for f, b in zip(fmts, blobs):
            try:
                lum = codecs.decode(b, f).astype(np.int64).sum(axis=2)
                h, w = lum.shape
                s = min(h, w)
                y0 = (h - s) // 2
                x0 = (w - s) // 2
                tot = int(lum.sum())
                inside = int(lum[y0:y0 + s, x0:x0 + s].sum())
                r = inside / tot if tot else 1.0
                ok.append(True)
                side.append(s)
                ret.append(float(round_half_away(np.float64(r), 6)))
            except Exception:
                ok.append(False)
                side.append(0)
                ret.append(0.0)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "ok": pa.array(ok, pa.bool_()),
            "crop_side": pa.array(side, pa.int64()),
            "ret6": pa.array(ret, pa.float64())})


def image_crop_retention(images: ray.data.Dataset, concurrency=None,
                         batch_size: int = 1024) -> ray.data.Dataset:
    """(image_id, ok, crop_side, ret6): center-square-crop luma
    retention per image — see ImageCropRetention."""
    from ..util import default_pool
    return images.map_batches(ImageCropRetention, batch_format="pyarrow",
                              batch_size=batch_size,
                              concurrency=concurrency or default_pool(24))


def image_corpus_card(images: ray.data.Dataset) -> ray.data.Dataset:
    """(fmt, n, total_bytes, total_px, mean_w6, mean_h6,
    mean_caption_len6): the per-format dataset-card rollup (corpus
    composition, storage and shape profile) a curation run publishes
    next to its output — all from metadata columns, no decode.
    Bounded per-fmt combiner + ONE merge; exact integer sums, three
    final float divisions mirrored in SQL."""
    from ..relational import single_merge
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        nb = pc.binary_length(t["bytes"]).cast(pa.int64())
        w = pc.cast(t["w"], pa.int64())
        h = pc.cast(t["h"], pa.int64())
        g = pa.table({
            "fmt": t["fmt"],
            "nb": nb,
            "px": pc.multiply(w, h),
            "w": w,
            "h": h,
            "cl": pc.utf8_length(t["caption"]).cast(pa.int64()),
        }).group_by("fmt").aggregate(
            [("nb", "sum"), ("px", "sum"), ("w", "sum"), ("h", "sum"),
             ("cl", "sum"), ([], "count_all")])
        return g.rename_columns(["fmt", "nb", "px", "w", "h", "cl", "n"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("fmt").aggregate(
            [("nb", "sum"), ("px", "sum"), ("w", "sum"), ("h", "sum"),
             ("cl", "sum"), ("n", "sum")])
        n = g["n_sum"].combine_chunks().to_numpy().astype(np.int64)
        fl = n.astype(np.float64)
        out = {"mean_w6": g["w_sum"], "mean_h6": g["h_sum"],
               "mean_caption_len6": g["cl_sum"]}
        cols = {
            "fmt": g["fmt"],
            "n": pa.array(n),
            "total_bytes": pc.cast(g["nb_sum"], pa.int64()),
            "total_px": pc.cast(g["px_sum"], pa.int64()),
        }
        for name, col in out.items():
            v = col.combine_chunks().to_numpy().astype(np.float64)
            cols[name] = pa.array(round_half_away(v / fl, 6))
        return pa.table(cols)

    return single_merge(
        images.select_columns(["fmt", "bytes", "w", "h", "caption"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        merge)


class _CellLumaPartial:
    """Actor-pool stage for cell_luma_morans: decode -> per-image exact
    integer luma sum + pixel count -> per-cell (key, lum, px) partials
    (geotag from phash, slippy tile key at the chosen res)."""

    def __init__(self, res: int = 7):
        self.res = res
        self.registry = codecs.FORMATS

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = decode_geotag(batch)
        lon = t["lon"].combine_chunks().to_numpy()
        lat = t["lat"].combine_chunks().to_numpy()
        x, y = tiles.tile_xy(lon, lat, self.res)
        key = (x.astype(np.int64) << 32) | y.astype(np.int64)
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        lum = np.empty(len(key), np.int64)
        npx = np.empty(len(key), np.int64)
        for i, (f, b) in enumerate(zip(fmts, blobs)):
            px = codecs.decode(b, f).astype(np.int64)
            lum[i] = int(px.sum())
            npx[i] = px.shape[0] * px.shape[1]
        order = np.argsort(key, kind="stable")
        key = key[order]
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]]) \
            if len(key) else np.empty(0, np.int64)
        return pa.table({
            "key": pa.array(key[starts]),
            "lum": pa.array(np.add.reduceat(lum[order], starts)
                            if len(key) else np.empty(0, np.int64)),
            "px": pa.array(np.add.reduceat(npx[order], starts)
                           if len(key) else np.empty(0, np.int64))})


def cell_luma_morans(images: ray.data.Dataset, res: int = 7,
                     nd: int = 6, concurrency=None,
                     batch_size: int = 1024) -> ray.data.Dataset:
    """(n_cells, w_pairs, morans_i6): global Moran's I spatial
    autocorrelation of the per-cell MEAN IMAGE LUMA over occupied
    res-``res`` slippy cells with rook binary weights — the
    image x geospatial fusion audit ("do bright images cluster
    geographically?") a multimodal curation run reads next to the
    density Moran's I.

    Determinism contract: per-cell luma/pixel totals are exact int64;
    cell value v = lum/px is one exact division; every cross-cell fold
    (mean, z^2 sum, rook pair-product sum) runs through math.fsum —
    EXACTLY-rounded and therefore order-independent — so the engine's
    vectorized searchsorted neighbours and the pyoracle's scalar dict
    walk produce bit-identical statistics. Scale shape: decode actor
    pool -> bounded per-cell partials -> ONE merge over the bounded
    cell space."""
    import math

    from ..relational import single_merge
    from ..util import default_pool, round_half_away

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("key").aggregate([("lum", "sum"), ("px", "sum")])
        key = g["key"].combine_chunks().to_numpy()
        order = np.argsort(key)
        key = key[order]
        lum = g["lum_sum"].combine_chunks().to_numpy()[order]
        px = g["px_sum"].combine_chunks().to_numpy()[order]
        q = len(key)
        v = np.array([int(a) / int(b) for a, b in zip(lum, px)],
                     np.float64)
        mean = math.fsum(v) / q if q else 0.0
        z = v - mean
        x, yy = key >> 32, key & np.int64(0xFFFFFFFF)
        prods = []
        w = 0
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nk = ((x + dx) << 32) | (yy + dy)
            idx = np.searchsorted(key, nk).clip(max=max(q - 1, 0))
            hit = key[idx] == nk if q else np.empty(0, bool)
            prods.append(z[hit] * z[idx[hit]])
            w += int(hit.sum())
        num = math.fsum(np.concatenate(prods)) if q else 0.0
        den = math.fsum(z * z)
        i_val = num * q / w / den if w > 0 and den > 0.0 else 0.0
        return pa.table({
            "n_cells": pa.array([q], pa.int64()),
            "w_pairs": pa.array([w], pa.int64()),
            "morans_i6": pa.array(
                [float(round_half_away(np.float64(i_val), nd))])})

    partials = images.map_batches(
        _CellLumaPartial, fn_constructor_kwargs={"res": res},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or default_pool(24))
    return single_merge(partials, merge)


class ImageRleRatio:
    """Actor-pool stage: decode -> quantize the summed-channel luma to
    8 levels (lum // 96, range 0..765) -> count horizontal RUNS (one
    per row plus every adjacent within-row level change), the
    run-length-encoding compressibility screen of an image-curation
    funnel: a run ratio near 0 means flat/synthetic content (screenshots,
    solid fills — cheap to store, low training value), near 1 means
    per-pixel noise. Whole-array vectorized diff; the pyoracle mirror
    counts transitions ROW BY ROW in python."""

    def __init__(self):
        self.registry = codecs.FORMATS

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..util import round_half_away
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ok, npx, nruns, rle = [], [], [], []
        for f, b in zip(fmts, blobs):
            try:
                lum = codecs.decode(b, f).astype(np.int64).sum(axis=2)
                q = lum // 96
                h, w = q.shape
                runs = h + int((q[:, 1:] != q[:, :-1]).sum())
                n = h * w
                ok.append(True)
                npx.append(n)
                nruns.append(runs)
                rle.append(float(round_half_away(np.float64(runs / n), 6)))
            except Exception:
                ok.append(False)
                npx.append(0)
                nruns.append(0)
                rle.append(0.0)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "ok": pa.array(ok, pa.bool_()),
            "n_px": pa.array(npx, pa.int64()),
            "n_runs": pa.array(nruns, pa.int64()),
            "rle6": pa.array(rle, pa.float64())})


def image_rle_ratio(images: ray.data.Dataset, concurrency=None,
                    batch_size: int = 1024) -> ray.data.Dataset:
    """(image_id, ok, n_px, n_runs, rle6): horizontal run-length
    compressibility per image — see ImageRleRatio."""
    from ..util import default_pool
    return images.map_batches(ImageRleRatio, batch_format="pyarrow",
                              batch_size=batch_size,
                              concurrency=concurrency or default_pool(24))


def _lev_banded(sa: list, sb: list, t: int = 2) -> np.ndarray:
    """Exact Levenshtein distance for every (sa[i], sb[i]) pair whose
    true distance is <= ``t`` (band half-width t; values above t are
    over-estimates, by construction never under — callers filter
    ``<= t`` so the kept set and values are exact). Vectorized across
    pairs: buckets by (len_a, len_b) and runs the banded DP with
    len_a * (2t+1) small vector ops per bucket, never per pair."""
    big = np.int16(10_000)
    la = np.array([len(s) for s in sa], np.int64)
    lb = np.array([len(s) for s in sb], np.int64)
    out = np.full(len(sa), big, np.int16)
    feasible = np.abs(la - lb) <= t
    w = 2 * t + 1
    for key in set(zip(la[feasible].tolist(), lb[feasible].tolist())):
        na, nb = key
        sel = np.flatnonzero((la == na) & (lb == nb))
        A = np.frombuffer("".join(sa[i] for i in sel).encode("utf-32-le"),
                          np.uint32).reshape(len(sel), na) if na else \
            np.empty((len(sel), 0), np.uint32)
        B = np.frombuffer("".join(sb[i] for i in sel).encode("utf-32-le"),
                          np.uint32).reshape(len(sel), nb) if nb else \
            np.empty((len(sel), 0), np.uint32)
        band = np.full((len(sel), w), big, np.int16)
        for k in range(w):
            j = k - t
            if 0 <= j <= nb:
                band[:, k] = j
        for i in range(1, na + 1):
            new = np.full((len(sel), w), big, np.int16)
            ai = A[:, i - 1]
            for k in range(w):
                j = i - t + k
                if j < 0 or j > nb:
                    continue
                if j == 0:
                    new[:, k] = i
                    continue
                best = np.full(len(sel), big, np.int16)
                if k + 1 < w:                      # d[i-1][j] + 1
                    best = np.minimum(best, band[:, k + 1] + 1)
                diag = band[:, k] \
                    + (ai != B[:, j - 1]).astype(np.int16)
                best = np.minimum(best, diag)      # d[i-1][j-1] + cost
                if k >= 1:                         # d[i][j-1] + 1
                    best = np.minimum(best, new[:, k - 1] + 1)
                new[:, k] = best
            band = new
        kk = nb - na + t
        out[sel] = np.minimum(band[:, kk], big)
    return out.astype(np.int64)


def caption_edit_pairs(images: ray.data.Dataset, max_lev: int = 2,
                       id_cap: int = 4000,
                       num_parts: int = 32) -> ray.data.Dataset:
    """(a, b, lev): near-duplicate CAPTION pairs by exact edit distance
    — pairs sharing a digit-collapsed template (caption_dupes' groups)
    whose full captions sit within Levenshtein distance ``max_lev``,
    the character-level near-dup screen that catches counter/id-only
    caption variants MinHash shingles are too coarse for.

    ``id_cap`` bounds the O(n^2)-per-group pair census (the
    PHASH_PAIR_CAP precedent: the oracle is brute force, and at scale
    the screen runs on a deterministic id prefix as a corpus-health
    sample, not the full table).

    Scale plan: per-block regex template + ONE hash(template) exchange
    (each template group wholly in one partition) -> per-group pair
    enumeration (groups bounded by the id cap) -> exact banded
    Levenshtein vectorized ACROSS pairs (len-bucketed band DP,
    la x (2t+1) vector ops per bucket — no per-pair python DP)."""
    from ..relational import _col_hash, hash_part

    def partial(t: pa.Table) -> pa.Table:
        ids = t["image_id"].combine_chunks()
        num = pc.cast(pc.utf8_slice_codeunits(ids, 3, 99), pa.int64())
        keep = pc.less(num, pa.scalar(id_cap, pa.int64()))
        t = pa.table({"image_id": ids, "caption":
                      t["caption"].combine_chunks()}).filter(keep)
        tpl = pc.replace_substring_regex(t["caption"].combine_chunks(),
                                         "[0-9]+", "#")
        h = _col_hash(tpl).astype(np.int64)
        return pa.table({"image_id": t["image_id"].combine_chunks(),
                         "caption": t["caption"].combine_chunks(),
                         "tpl": tpl,
                         "part": pa.array(hash_part(h, num_parts))})

    def pairs(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["image_id"].combine_chunks()
                         .to_numpy(zero_copy_only=False))
        cap = np.asarray(t["caption"].combine_chunks()
                         .to_numpy(zero_copy_only=False))
        tpl = np.asarray(t["tpl"].combine_chunks()
                         .to_numpy(zero_copy_only=False))
        order = np.lexsort((ids, tpl))
        ids, cap, tpl = ids[order], cap[order], tpl[order]
        starts = np.flatnonzero(np.r_[True, tpl[1:] != tpl[:-1]]) \
            if len(tpl) else np.empty(0, np.int64)
        counts = np.diff(np.r_[starts, len(tpl)]) if len(tpl) \
            else np.empty(0, np.int64)
        pos = np.arange(len(ids), dtype=np.int64)
        rep = np.repeat(counts, counts) - (pos - np.repeat(starts, counts)) - 1
        first_idx = np.repeat(pos, rep)
        base = np.repeat(np.cumsum(rep) - rep, rep)
        second_idx = first_idx + 1 + (np.arange(rep.sum(), dtype=np.int64)
                                      - base)
        sa = cap[first_idx].tolist()
        sb = cap[second_idx].tolist()
        lev = _lev_banded(sa, sb, max_lev)
        keep = lev <= max_lev
        return pa.table({
            "a": pa.array(ids[first_idx][keep], pa.string()),
            "b": pa.array(ids[second_idx][keep], pa.string()),
            "lev": pa.array(lev[keep], pa.int64())})

    return images.select_columns(["image_id", "caption"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=65536) \
        .groupby("part") \
        .map_groups(lambda t: pairs(t.drop_columns(["part"])),
                    batch_format="pyarrow")


class ImageExposureClip:
    """Actor-pool stage: decode -> fraction of pixels clipped at the
    sensor extremes per channel-summed luma (0 = crushed black, 765 =
    blown white) plus per-CHANNEL clip counts — the over/under-exposure
    screen of an image-curation funnel (clipped histograms carry no
    gradient signal). All counts exact integers; two float divisions."""

    def __init__(self):
        self.registry = codecs.FORMATS

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..util import round_half_away
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ok, npx, nlo, nhi, lo6, hi6 = [], [], [], [], [], []
        for f, b in zip(fmts, blobs):
            try:
                px = codecs.decode(b, f)
                n = px.shape[0] * px.shape[1]
                lum = px.astype(np.int64).sum(axis=2)
                lo = int((lum == 0).sum())
                hi = int((lum == 765).sum())
                ok.append(True)
                npx.append(n)
                nlo.append(lo)
                nhi.append(hi)
                lo6.append(float(round_half_away(np.float64(lo / n), 6)))
                hi6.append(float(round_half_away(np.float64(hi / n), 6)))
            except Exception:
                ok.append(False)
                npx.append(0)
                nlo.append(0)
                nhi.append(0)
                lo6.append(0.0)
                hi6.append(0.0)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "ok": pa.array(ok, pa.bool_()),
            "n_px": pa.array(npx, pa.int64()),
            "n_black": pa.array(nlo, pa.int64()),
            "n_white": pa.array(nhi, pa.int64()),
            "black6": pa.array(lo6, pa.float64()),
            "white6": pa.array(hi6, pa.float64())})


def image_exposure_clip(images: ray.data.Dataset, concurrency=None,
                        batch_size: int = 1024) -> ray.data.Dataset:
    """(image_id, ok, n_px, n_black, n_white, black6, white6): clipped
    black/white pixel shares — see ImageExposureClip."""
    from ..util import default_pool
    return images.map_batches(ImageExposureClip, batch_format="pyarrow",
                              batch_size=batch_size,
                              concurrency=concurrency or default_pool(24))


class ImageChannelBalance:
    """Actor-pool stage: decode -> exact integer per-channel sums ->
    gray-world white-balance deviation: each channel's share of the
    total energy (exact thirds for neutral content). One float division
    per channel; the max-deviation channel name breaks ties R<G<B."""

    def __init__(self):
        self.registry = codecs.FORMATS

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..util import round_half_away
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        names = ("r", "g", "b")
        ok, sr, sg, sb, r6, g6, b6, dom = ([] for _ in range(8))
        for f, b in zip(fmts, blobs):
            try:
                px = codecs.decode(b, f).astype(np.int64)
                s = [int(px[:, :, c].sum()) for c in range(3)]
                tot = sum(s)
                sh = [x / tot if tot else 0.0 for x in s]
                dev = [abs(x - 1.0 / 3.0) for x in sh]
                ok.append(True)
                sr.append(s[0])
                sg.append(s[1])
                sb.append(s[2])
                r6.append(float(round_half_away(np.float64(sh[0]), 6)))
                g6.append(float(round_half_away(np.float64(sh[1]), 6)))
                b6.append(float(round_half_away(np.float64(sh[2]), 6)))
                dom.append(names[int(np.argmax(dev))])
            except Exception:
                ok.append(False)
                sr.append(0)
                sg.append(0)
                sb.append(0)
                r6.append(0.0)
                g6.append(0.0)
                b6.append(0.0)
                dom.append("")
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "ok": pa.array(ok, pa.bool_()),
            "sum_r": pa.array(sr, pa.int64()),
            "sum_g": pa.array(sg, pa.int64()),
            "sum_b": pa.array(sb, pa.int64()),
            "share_r6": pa.array(r6, pa.float64()),
            "share_g6": pa.array(g6, pa.float64()),
            "share_b6": pa.array(b6, pa.float64()),
            "skew_channel": pa.array(dom, pa.string())})


def image_channel_balance(images: ray.data.Dataset, concurrency=None,
                          batch_size: int = 1024) -> ray.data.Dataset:
    """(image_id, ok, sum_r, sum_g, sum_b, share_*6, skew_channel):
    gray-world channel balance — see ImageChannelBalance."""
    from ..util import default_pool
    return images.map_batches(ImageChannelBalance, batch_format="pyarrow",
                              batch_size=batch_size,
                              concurrency=concurrency or default_pool(24))


class ImageNoiseMad:
    """Actor-pool stage: decode -> 4-neighbour integer Laplacian of the
    summed-channel luma on the interior -> MAD (median of absolute
    values, LOWER median on even counts) — the classic noise-sigma
    estimator, complementing image_sharpness's Laplacian VARIANCE
    (variance reads texture+noise; the median is robust to edges, so
    high MAD with ordinary variance flags sensor noise). All integer."""

    def __init__(self):
        self.registry = codecs.FORMATS

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ok, nin, mad = [], [], []
        for f, b in zip(fmts, blobs):
            try:
                lum = codecs.decode(b, f).astype(np.int64).sum(axis=2)
                lap = (4 * lum[1:-1, 1:-1] - lum[:-2, 1:-1]
                       - lum[2:, 1:-1] - lum[1:-1, :-2] - lum[1:-1, 2:])
                a = np.abs(lap).ravel()
                a.sort()
                n = len(a)
                ok.append(True)
                nin.append(n)
                mad.append(int(a[(n - 1) // 2]) if n else 0)
            except Exception:
                ok.append(False)
                nin.append(0)
                mad.append(0)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "ok": pa.array(ok, pa.bool_()),
            "n_interior": pa.array(nin, pa.int64()),
            "mad_lap": pa.array(mad, pa.int64())})


def image_noise_mad(images: ray.data.Dataset, concurrency=None,
                    batch_size: int = 1024) -> ray.data.Dataset:
    """(image_id, ok, n_interior, mad_lap): integer Laplacian MAD noise
    estimate — see ImageNoiseMad."""
    from ..util import default_pool
    return images.map_batches(ImageNoiseMad, batch_format="pyarrow",
                              batch_size=batch_size,
                              concurrency=concurrency or default_pool(24))


def format_bpp_stats(images: ray.data.Dataset) -> ray.data.Dataset:
    """(fmt, n_images, total_bytes, total_px, bpp6, min_bpp6, max_bpp6):
    BYTES-PER-PIXEL profile per encoding — the compression-sanity
    screen (a format whose min collapses toward 0 hides truncated
    blobs; a max far above the codec norm hides corrupt or adversarial
    payloads). Pure metadata pass: byte lengths and declared w*h, NO
    decode — the cheap first gate before decode-tier screens.

    Exactness: integer byte/pixel sums; ratios are single double
    divisions; min/max over per-image ratios compare identical doubles
    on both sides.

    Scale plan: embarrassingly parallel bounded partials per block,
    one tiny merge."""
    from ..relational import single_merge
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        fmt = np.asarray(t["fmt"].combine_chunks()
                         .to_numpy(zero_copy_only=False))
        blen = np.asarray(pc.binary_length(t["bytes"].combine_chunks())) \
            .astype(np.int64)
        px = (t["w"].combine_chunks().to_numpy().astype(np.int64)
              * t["h"].combine_chunks().to_numpy().astype(np.int64))
        bpp = blen.astype(np.float64) / px.astype(np.float64)
        out = {"fmt": [], "n": [], "tb": [], "tp": [], "mn": [], "mx": []}
        for f in sorted(set(fmt.tolist())):
            m = fmt == f
            out["fmt"].append(f)
            out["n"].append(int(m.sum()))
            out["tb"].append(int(blen[m].sum()))
            out["tp"].append(int(px[m].sum()))
            out["mn"].append(float(bpp[m].min()))
            out["mx"].append(float(bpp[m].max()))
        return pa.table({
            "fmt": pa.array(out["fmt"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "tb": pa.array(out["tb"], pa.int64()),
            "tp": pa.array(out["tp"], pa.int64()),
            "mn": pa.array(out["mn"], pa.float64()),
            "mx": pa.array(out["mx"], pa.float64())})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("fmt").aggregate([("n", "sum"), ("tb", "sum"),
                                         ("tp", "sum"), ("mn", "min"),
                                         ("mx", "max")])
        tb = g["tb_sum"].combine_chunks().to_numpy()
        tp = g["tp_sum"].combine_chunks().to_numpy()
        return pa.table({
            "fmt": g["fmt"],
            "n_images": pc.cast(g["n_sum"], pa.int64()),
            "total_bytes": pa.array(tb.astype(np.int64)),
            "total_px": pa.array(tp.astype(np.int64)),
            "bpp6": pa.array(round_half_away(
                tb.astype(np.float64) / tp.astype(np.float64), 6),
                pa.float64()),
            "min_bpp6": pa.array(round_half_away(
                g["mn_min"].combine_chunks().to_numpy(), 6), pa.float64()),
            "max_bpp6": pa.array(round_half_away(
                g["mx_max"].combine_chunks().to_numpy(), 6),
                pa.float64())})

    return single_merge(
        images.select_columns(["fmt", "bytes", "w", "h"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        merge)


class ImageLumaPercentiles:
    """Actor-pool stage: decode -> exact order statistics of the
    summed-channel luma (p5/p50/p95 by the LOWER index convention
    idx = (n-1)*q // 100) — the tonal-range screen (p95-p5 collapse =
    flat content; p50 pinned at an extreme = exposure bias). All
    integer; the pyoracle mirror selects via a 766-bin counting
    histogram instead of a sort."""

    def __init__(self):
        self.registry = codecs.FORMATS

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ok, p5, p50, p95, spread = [], [], [], [], []
        for f, b in zip(fmts, blobs):
            try:
                lum = codecs.decode(b, f).astype(np.int64).sum(axis=2) \
                    .ravel()
                lum.sort()
                n = len(lum)
                vals = [int(lum[(n - 1) * q // 100]) for q in (5, 50, 95)]
                ok.append(True)
                p5.append(vals[0])
                p50.append(vals[1])
                p95.append(vals[2])
                spread.append(vals[2] - vals[0])
            except Exception:
                ok.append(False)
                p5.append(0)
                p50.append(0)
                p95.append(0)
                spread.append(0)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "ok": pa.array(ok, pa.bool_()),
            "p5": pa.array(p5, pa.int64()),
            "p50": pa.array(p50, pa.int64()),
            "p95": pa.array(p95, pa.int64()),
            "spread": pa.array(spread, pa.int64())})


def image_luma_percentiles(images: ray.data.Dataset, concurrency=None,
                           batch_size: int = 1024) -> ray.data.Dataset:
    """(image_id, ok, p5, p50, p95, spread): exact luma order
    statistics — see ImageLumaPercentiles."""
    from ..util import default_pool
    return images.map_batches(ImageLumaPercentiles,
                              batch_format="pyarrow",
                              batch_size=batch_size,
                              concurrency=concurrency or default_pool(24))


class ImageQuadrantLuma:
    """Actor-pool stage: decode -> exact integer luma sums of the four
    h//2 x w//2 quadrants (odd center row/column excluded so quadrants
    are congruent) -> brightest quadrant (ties TL<TR<BL<BR) and the
    imbalance ratio max/min — the lighting-composition probe
    (vignettes, split lighting, watermark corners)."""

    def __init__(self):
        self.registry = codecs.FORMATS

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..util import round_half_away
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        names = ("tl", "tr", "bl", "br")
        ok, s_tl, s_tr, s_bl, s_br, dom, imb = ([] for _ in range(7))
        for f, b in zip(fmts, blobs):
            try:
                lum = codecs.decode(b, f).astype(np.int64).sum(axis=2)
                h, w = lum.shape
                hh, hw = h // 2, w // 2
                qs = [int(lum[:hh, :hw].sum()), int(lum[:hh, w - hw:].sum()),
                      int(lum[h - hh:, :hw].sum()),
                      int(lum[h - hh:, w - hw:].sum())]
                mx, mn = max(qs), min(qs)
                ok.append(True)
                s_tl.append(qs[0])
                s_tr.append(qs[1])
                s_bl.append(qs[2])
                s_br.append(qs[3])
                dom.append(names[qs.index(mx)])
                imb.append(float(round_half_away(
                    np.float64(mx / mn if mn else 0.0), 6)))
            except Exception:
                ok.append(False)
                for lst in (s_tl, s_tr, s_bl, s_br):
                    lst.append(0)
                dom.append("")
                imb.append(0.0)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "ok": pa.array(ok, pa.bool_()),
            "sum_tl": pa.array(s_tl, pa.int64()),
            "sum_tr": pa.array(s_tr, pa.int64()),
            "sum_bl": pa.array(s_bl, pa.int64()),
            "sum_br": pa.array(s_br, pa.int64()),
            "bright_quad": pa.array(dom, pa.string()),
            "imbalance6": pa.array(imb, pa.float64())})


def image_quadrant_luma(images: ray.data.Dataset, concurrency=None,
                        batch_size: int = 1024) -> ray.data.Dataset:
    """(image_id, ok, sum_tl/tr/bl/br, bright_quad, imbalance6):
    quadrant lighting composition — see ImageQuadrantLuma."""
    from ..util import default_pool
    return images.map_batches(ImageQuadrantLuma, batch_format="pyarrow",
                              batch_size=batch_size,
                              concurrency=concurrency or default_pool(24))


def caption_id_consistency(images: ray.data.Dataset) -> ray.data.Dataset:
    """(n_images, n_match, n_mismatch, match6): cross-modal consistency
    audit — does the FIRST number in each caption equal the image_id's
    numeric suffix (the datagen contract: captions embed the image
    index)? The cheap referential check between the text and image
    sides of a paired corpus; mismatches flag mis-joined shards after
    a bad repartition. RE2 regex shared with the DuckDB mirror.

    Scale plan: embarrassingly parallel per-block counting, one tiny
    merge."""
    from ..relational import single_merge
    from ..util import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        ids = t["image_id"].combine_chunks()
        num = pc.cast(pc.utf8_slice_codeunits(ids, 3, 99), pa.int64())
        ext = pc.extract_regex(t["caption"].combine_chunks(),
                               r"(?P<n>[0-9]+)")
        cap_num = pc.cast(pc.struct_field(ext, "n"), pa.int64())
        match = pc.equal(num, cap_num)
        n = len(ids)
        nm = int(pc.sum(pc.cast(match, pa.int64())).as_py() or 0)
        return pa.table({"n_images": pa.array([n], pa.int64()),
                         "n_match": pa.array([nm], pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        n = int(t["n_images"].combine_chunks().to_numpy().sum())
        nm = int(t["n_match"].combine_chunks().to_numpy().sum())
        return pa.table({
            "n_images": pa.array([n], pa.int64()),
            "n_match": pa.array([nm], pa.int64()),
            "n_mismatch": pa.array([n - nm], pa.int64()),
            "match6": pa.array([float(round_half_away(
                np.float64(nm / n if n else 0.0), 6))], pa.float64())})

    return single_merge(
        images.select_columns(["image_id", "caption"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        merge)


class ImageColorfulness:
    """Actor-pool stage: decode -> exact integer per-pixel channel
    spread (max(R,G,B) - min(R,G,B)) summed over the image — the
    saturation/colorfulness screen (0 = pure grayscale; high = vivid),
    complementing image_channel_balance's global cast detection with
    per-pixel chroma."""

    def __init__(self):
        self.registry = codecs.FORMATS

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..util import round_half_away
        ids = batch["image_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ok, npx, ss, m6 = [], [], [], []
        for f, b in zip(fmts, blobs):
            try:
                px = codecs.decode(b, f).astype(np.int64)
                spread = px.max(axis=2) - px.min(axis=2)
                n = int(spread.size)
                s = int(spread.sum())
                ok.append(True)
                npx.append(n)
                ss.append(s)
                m6.append(float(round_half_away(np.float64(s / n), 6)))
            except Exception:
                ok.append(False)
                npx.append(0)
                ss.append(0)
                m6.append(0.0)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "ok": pa.array(ok, pa.bool_()),
            "n_px": pa.array(npx, pa.int64()),
            "spread_sum": pa.array(ss, pa.int64()),
            "mean_spread6": pa.array(m6, pa.float64())})


def image_colorfulness(images: ray.data.Dataset, concurrency=None,
                       batch_size: int = 1024) -> ray.data.Dataset:
    """(image_id, ok, n_px, spread_sum, mean_spread6): per-pixel channel
    spread — see ImageColorfulness."""
    from ..util import default_pool
    return images.map_batches(ImageColorfulness, batch_format="pyarrow",
                              batch_size=batch_size,
                              concurrency=concurrency or default_pool(24))
