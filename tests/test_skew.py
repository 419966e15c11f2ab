"""Hot-bucket skew control in LSH pair generation (VERDICT r2 #2).

A duplicate-heavy corpus (one boilerplate class of N identical docs)
must NOT make candidate generation O(N^2): oversized LSH buckets emit a
sorted-id chain, so pair output stays linear while connected components
(the dedup answer) are identical to the clique's.
"""

import numpy as np
import pyarrow as pa
import pytest

from go_osm_ray.pipelines.text import (_bucket_pairs_vec, dedup_groups,
                                       minhash_lsh_pairs, simhash_pairs)

N_DUP = 3000
BOILER = "the quick brown fox jumps over the lazy dog again and again"


def _dup_docs():
    import ray.data
    ids = np.arange(N_DUP, dtype=np.int64)
    texts = [BOILER] * N_DUP
    # two unrelated docs that must not join the component
    ids = np.r_[ids, [50_000, 50_001]]
    texts += ["completely different content about ray data pipelines",
              "another unrelated string with its own words entirely"]
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids), "text": pa.array(texts, pa.string())}))


def test_bucket_pairs_vec_chains_oversized_buckets():
    key = np.zeros(10, np.uint64)          # one bucket of 10
    doc = np.arange(10, dtype=np.int64)
    a, b = _bucket_pairs_vec(key, doc, max_bucket=4)
    assert len(a) == 9                     # chain, not 45-pair clique
    assert np.array_equal(a, np.arange(9))
    assert np.array_equal(b, np.arange(1, 10))
    a2, b2 = _bucket_pairs_vec(key, doc, max_bucket=None)
    assert len(a2) == 45                   # uncapped clique unchanged


def test_bucket_pairs_vec_cap_keeps_small_buckets_exact():
    key = np.repeat(np.arange(5, dtype=np.uint64), 3)   # five 3-buckets
    doc = np.arange(15, dtype=np.int64)
    capped = _bucket_pairs_vec(key, doc, max_bucket=64)
    full = _bucket_pairs_vec(key, doc, max_bucket=None)
    assert np.array_equal(capped[0], full[0])
    assert np.array_equal(capped[1], full[1])


@pytest.mark.parametrize("pipeline", ["minhash", "simhash"])
def test_duplicate_class_bounded_pairs(ray_session, pipeline):
    docs = _dup_docs()
    if pipeline == "minhash":
        pairs = minhash_lsh_pairs(docs, max_bucket=256)
    else:
        pairs = simhash_pairs(docs, max_bucket=256)
    t = pa.concat_tables(
        [x for x in __import__("ray").get(pairs.to_arrow_refs()) if len(x)])
    # chain emission: pair count is linear in the class size, not O(N^2)
    assert N_DUP - 1 <= len(t) < 4 * N_DUP
    # the dedup COMPONENT is still the full duplicate class
    groups = dedup_groups(pairs).to_pandas()
    comp = groups[groups["group_id"] == 0]
    assert len(comp) == N_DUP
    assert not (groups["doc_id"] >= 50_000).any()


def test_dedup_keep_anti_join_path_matches_broadcast(ray_session):
    """The hash-partitioned anti-join purge (scale path when the drop
    list outgrows broadcast) returns exactly the broadcast plan's rows."""
    from go_osm_ray.pipelines.text import dedup_keep, minhash_lsh_pairs
    docs = _dup_docs()
    pairs = minhash_lsh_pairs(docs, max_bucket=256).materialize()
    bc = dedup_keep(docs, pairs).to_pandas()
    anti = dedup_keep(docs, pairs, broadcast_limit=0).to_pandas()
    assert sorted(bc["doc_id"]) == sorted(anti["doc_id"])
    assert sorted(bc["doc_id"]) == [0, 50_000, 50_001]


def test_way_components_hot_node_stays_linear(ray_session):
    """A node shared by k ways must emit k-1 star edges, never k^2 —
    and the component must still close over all k ways."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from go_osm_ray.pipelines.osm import way_components

    K = 2_000
    # every way references hot node 7 plus one private node
    ways = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(K, dtype=np.int64)),
        "refs": pa.array([[7, 100_000 + i] for i in range(K)],
                         pa.list_(pa.int64())),
    }))
    out = way_components(ways, num_parts=4).to_pandas()
    assert len(out) == K
    # one component, labeled by the minimum way id
    assert (out["component_id"] == 0).all()


def test_capped_contract_is_oracle_checked(ray_session):
    """ADVICE r3: the hot-bucket cap's recall reduction must itself be
    oracle-checked, not only asserted linear.  Plant a corpus whose LSH
    bucket EXCEEDS a small cap, run engine and the engine-mirrored capped
    pyoracle, and require exact pair-set parity — while the UNCAPPED
    oracle (the gated default) returns the full clique, proving the cap
    binds on this corpus."""
    import pandas as pd
    import ray.data

    from go_osm_ray.pipelines.text import minhash_lsh_pairs, simhash_pairs
    from go_osm_ray.pyoracle import minhash_pairs_from, simhash_pairs_from

    n = 40
    ids = list(range(n)) + [900]
    texts = [BOILER] * n + ["something else entirely, unrelated words"]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["a", "b"]).reset_index(drop=True)

    got_m = norm(minhash_lsh_pairs(docs, max_bucket=8).to_pandas())
    want_m = norm(minhash_pairs_from(ids, texts, max_bucket=8).to_pandas())
    pd.testing.assert_frame_equal(got_m, want_m)
    assert len(got_m) == n - 1            # chain, engine == capped oracle
    full_m = minhash_pairs_from(ids, texts, max_bucket=None)
    assert len(full_m) == n * (n - 1) // 2  # the cap binds vs the clique

    got_s = norm(simhash_pairs(docs, max_bucket=8).to_pandas())
    want_s = norm(simhash_pairs_from(ids, texts, max_bucket=8).to_pandas())
    pd.testing.assert_frame_equal(got_s, want_s)
    assert len(got_s) == n - 1
