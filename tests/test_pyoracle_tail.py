"""Python-oracle gates for the tail (rows-only in the driver window)
text queries: the engine's distributed plans must reproduce brute-force
scalar references exactly (same pattern as the pyoracle parquet gates,
asserted in pytest because the driver's 50-slot oracle window is full)."""

import numpy as np
import pandas as pd

import parity

SF = "/root/testdata/sf0.001"


def _docs_ds():
    import ray.data as rd
    return rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])


def test_ngram_cutoff_pairs_match_bruteforce(ray_session):
    from go_osm_ray.pipelines.text import ngram_jaccard_pairs
    from go_osm_ray.pyoracle import _ngram_cutoff_pairs_table
    got = parity.to_pandas(ngram_jaccard_pairs(_docs_ds())) \
        .sort_values(["a", "b"]).reset_index(drop=True)
    want = _ngram_cutoff_pairs_table(0.001).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    assert len(got) > 0
    assert got["a"].tolist() == want["a"].tolist()
    assert got["b"].tolist() == want["b"].tolist()
    assert np.array_equal(got["jac6"].to_numpy(), want["jac6"].to_numpy())


def test_approx_distinct_matches_scalar_hll_oracle(ray_session):
    """The distributed HLL (vectorized registers, per-block partials,
    elementwise-max merge) must equal a SEQUENTIAL scalar re-derivation
    (python-int splitmix + bit_length rho) row by row — same estimator,
    independent plan and rho computation."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from go_osm_ray.sketch import approx_distinct, hll_estimate

    p = 12
    got = approx_distinct(
        rd.read_parquet(f"{SF}/events.parquet",
                        columns=["event_type", "user_id"]),
        "event_type", "user_id", p=p).to_pandas()
    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_type", "user_id"])
    mask64 = (1 << 64) - 1
    regs: dict[str, np.ndarray] = {}
    for et, uid in zip(t["event_type"].to_pylist(),
                       t["user_id"].to_pylist()):
        z = (int(uid) + 0x9E3779B97F4A7C15) & mask64
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask64
        h = z ^ (z >> 31)
        bucket = h >> (64 - p)
        w = h & ((1 << (64 - p)) - 1)
        rho = (64 - p) - (w.bit_length() - 1) if w else 65 - p
        r = regs.setdefault(et, np.zeros(1 << p, np.uint8))
        r[bucket] = max(r[bucket], rho)
    want = {et: int(round(hll_estimate(r))) for et, r in regs.items()}
    assert dict(zip(got["event_type"], got["approx_n"])) == want


def test_neardup_keep_matches_bruteforce(ray_session):
    from go_osm_ray.pipelines.text import dedup_keep, minhash_lsh_pairs
    from go_osm_ray.pyoracle import _neardup_keep_table
    docs = _docs_ds()
    pairs = minhash_lsh_pairs(docs).materialize()
    want = _neardup_keep_table(0.001)["doc_id"].to_pylist()
    got = sorted(dedup_keep(docs, pairs).to_pandas()["doc_id"])
    assert got == want
    # forced distributed-CC + anti-join path: identical output
    got2 = sorted(dedup_keep(docs, pairs, broadcast_limit=0,
                             single_task_edge_limit=0)
                  .to_pandas()["doc_id"])
    assert got2 == want
