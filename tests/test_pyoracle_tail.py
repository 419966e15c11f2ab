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
