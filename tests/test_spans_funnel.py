"""Unit gates for span_dedup / quality_funnel / kmeans_assign beyond
the oracle parity sweep: planted duplicates, codepoint (not byte)
window semantics, funnel monotonicity, cluster-label sanity."""

import numpy as np
import pyarrow as pa
import ray.data

from go_osm_ray.pipelines.spans import STRIDE, WIN, span_dedup, window_batch


def _docs_ds(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_window_batch_positions_and_short_docs():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a" * 130, "short"], pa.string())})
    w = window_batch(t)
    # doc 1: positions 0, 32, 64 (96+64 > 130); doc 2: too short -> none
    assert w["doc_id"].to_pylist() == [1, 1, 1]
    assert w["pos"].to_pylist() == [0, STRIDE, 2 * STRIDE]
    assert all(len(x) == WIN for x in w["win"].to_pylist())


def test_window_batch_counts_codepoints_not_bytes(ray_session):
    # 'é' is 2 utf-8 bytes; a 64-CHAR shared window must match across
    # docs and report CHARACTER positions (SQL substr semantics)
    shared = "é" * WIN
    ds = _docs_ds([shared + "x" * STRIDE, "y" * STRIDE + shared])
    rows = sorted(map(tuple, span_dedup(ds).to_pandas().values.tolist()))
    assert (0, 0) in rows and (1, STRIDE) in rows


def test_span_dedup_planted(ray_session):
    import string
    rng = np.random.default_rng(7)
    alpha = np.array(list(string.ascii_lowercase))
    uniq = ["".join(rng.choice(alpha, 192)) for _ in range(6)]
    dup = "the exact same sixty-four character window content block 0123456"
    assert len(dup) >= WIN
    texts = [uniq[0] + dup[:WIN] + uniq[1][:STRIDE],
             uniq[2] + dup[:WIN] + uniq[3][:STRIDE],
             uniq[4], uniq[5]]
    # the planted copy starts at position 192 = 6*STRIDE, stride-aligned
    # -> the window at 192 (the full dup) appears in docs 0 and 1
    out = span_dedup(_docs_ds(texts)).to_pandas()
    got = set(map(tuple, out.values.tolist()))
    assert (0, 192) in got and (1, 192) in got
    assert all(d in (0, 1) for d, _ in got)


def test_span_dedup_hash_carry_matches_strings(ray_session):
    # the 100 TB exchange (64-bit hash instead of window strings) must
    # produce the identical span set on real testdata
    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text"])
    a = sorted(map(tuple, span_dedup(ds).to_pandas().values.tolist()))
    b = sorted(map(tuple,
                   span_dedup(ds, carry="hash").to_pandas().values.tolist()))
    assert a == b and len(a) > 0


def test_quality_funnel_monotone(ray_session):
    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "source", "text"])
    from go_osm_ray.pipelines.filtering import quality_funnel
    df = quality_funnel(ds).to_pandas()
    assert int(df["n_total"].sum()) == ds.count()
    for a, b in (("n_total", "n_len"), ("n_len", "n_tok"),
                 ("n_tok", "n_stopw"), ("n_stopw", "n_clean")):
        assert (df[a] >= df[b]).all()
    assert int(df["n_clean"].sum()) > 0  # funnel must not drop everything


def test_kmeans_assign_labels(ray_session):
    ds = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    from go_osm_ray.pipelines.vectors import kmeans_assign
    df = kmeans_assign(ds, n_clusters=8).to_pandas()
    assert len(df) == ds.count()
    assert df["cluster"].between(0, 7).all()
    assert df["cluster"].nunique() > 1  # non-degenerate clustering
