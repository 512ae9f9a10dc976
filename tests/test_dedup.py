"""Dedup determinism under parallelism — the property the reference gets
for free by being serial (SURVEY §5)."""

import pandas as pd
import pyarrow as pa
import ray.data

from kg_covid_19_ray.stages.dedup import distinct, first_wins


def _rows():
    # id 'a' appears 3 times with different names; first = min order_key
    return [
        {"id": "a", "name": "third", "order_key": 30},
        {"id": "b", "name": "only", "order_key": 5},
        {"id": "a", "name": "FIRST", "order_key": 1},
        {"id": "c", "name": "late", "order_key": 99},
        {"id": "a", "name": "second", "order_key": 2},
        {"id": "c", "name": "EARLY", "order_key": 7},
    ]


def test_first_wins_basic(ray_session):
    ds = ray.data.from_items(_rows())
    out = first_wins(ds, ["id"], "order_key").to_pandas()
    got = dict(zip(out["id"], out["name"]))
    assert got == {"a": "FIRST", "b": "only", "c": "EARLY"}


def test_first_wins_parallelism_invariant(ray_session):
    """Same result at different block layouts / shuffled input order."""
    base = _rows()
    results = []
    for seed in (1, 2):
        ds = ray.data.from_items(base).random_shuffle(seed=seed).repartition(5)
        out = first_wins(ds, ["id"], "order_key").to_pandas()
        results.append(out.sort_values("id").reset_index(drop=True)[["id", "name"]])
    pd.testing.assert_frame_equal(results[0], results[1])
    assert dict(zip(results[0]["id"], results[0]["name"]))["a"] == "FIRST"


def test_distinct_composite_key(ray_session):
    rows = [{"s": "x", "o": str(i % 3), "junk": i} for i in range(30)]
    ds = ray.data.from_items(rows).repartition(4)
    out = distinct(ds, ["s", "o"]).to_pandas()
    assert len(out) == 3
    assert sorted(out.columns) == ["o", "s"]  # non-key columns dropped


def test_first_wins_hot_key_skew(ray_session):
    """SURVEY §7.4 hub-entity skew: 90% of rows share ONE key. The
    per-block combiner must shrink the hot key to one row per block
    before the bucket exchange, and the result must still be the
    global minimum-order row."""
    import numpy as np
    import pandas as pd
    import ray.data
    from kg_covid_19_ray.stages.dedup import first_wins

    n = 20_000
    rng = np.random.RandomState(3)
    keys = np.where(rng.rand(n) < 0.9, "HOT:1",
                    [f"K:{i}" for i in rng.randint(0, 500, n)])
    order = rng.permutation(n).astype(np.int64)
    df = pd.DataFrame({"id": keys, "order_key": order,
                       "payload": [f"p{o}" for o in order]})
    ds = ray.data.from_pandas(df).repartition(16)
    out = first_wins(ds, ["id"], "order_key").to_pandas()

    exp = df.sort_values("order_key", kind="mergesort") \
            .drop_duplicates("id")
    assert len(out) == len(exp)
    got_hot = out[out["id"] == "HOT:1"].iloc[0]
    exp_hot = exp[exp["id"] == "HOT:1"].iloc[0]
    assert got_hot["order_key"] == exp_hot["order_key"]
    assert got_hot["payload"] == exp_hot["payload"]
    merged = out.merge(exp, on="id", suffixes=("_got", "_exp"))
    assert (merged["order_key_got"] == merged["order_key_exp"]).all()


def test_assert_blockwise_unique_detects_violation(ray_session):
    """The co-partitioning guard must raise when a key crosses block
    boundaries, and pass (returning the distinct count) when it
    doesn't."""
    import pytest
    import ray.data
    from kg_covid_19_ray.stages.dedup import assert_blockwise_unique

    # one duplicate key split across two blocks -> violation
    bad = ray.data.from_items(
        [{"k": 1, "v": "a"}, {"k": 1, "v": "b"}]).repartition(2)
    with pytest.raises(ValueError, match="co-partitioning violated"):
        assert_blockwise_unique(bad, ["k"])

    ok = ray.data.from_items([{"k": i} for i in range(10)])
    assert assert_blockwise_unique(ok, ["k"]) == 10


def test_mention_edges_safe_path_under_repartition(ray_session, sf_small):
    """D2 hardening: a REPARTITIONED mention table (the layout that
    breaks the block-local assumption) run through the shuffled
    distinct path must equal the detector-layout result."""
    from kg_covid_19_ray.pipelines import flagship

    mentions = flagship.canonical_mentions(sf_small)
    fast = flagship.mention_edges(mentions).to_pandas()
    safe = flagship.mention_edges(mentions.repartition(7),
                                  copartitioned=False).to_pandas()
    key = ["subject", "object"]
    a = fast.sort_values(key).reset_index(drop=True)
    b = safe.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    # the detector-produced layout really is co-partitioned
    from kg_covid_19_ray.stages.dedup import assert_blockwise_unique
    assert_blockwise_unique(mentions, ["doc_id", "curie"])


def test_minhash_clusters_properties(ray_session):
    # every doc appears once; canon <= member; both ends of a verified
    # near-dup pair share a canon; singletons map to themselves
    from kg_covid_19_ray.pipelines.dedup_ops import (
        minhash_clusters, minhash_near_dups)

    sf = "/root/testdata/sf0.001"
    cl = minhash_clusters(sf).to_pandas()
    assert cl["doc_id"].is_unique
    assert (cl["canon_doc"] <= cl["doc_id"]).all()
    canon = dict(zip(cl["doc_id"], cl["canon_doc"]))
    pairs = minhash_near_dups(sf).to_pandas()
    assert len(pairs) > 0
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        assert canon[a] == canon[b]
    in_pairs = set(pairs["doc_a"]) | set(pairs["doc_b"])
    singles = cl[~cl["doc_id"].isin(in_pairs)]
    assert (singles["canon_doc"] == singles["doc_id"]).all()


def test_resolve_num_buckets_and_invariance(ray_session):
    """Round-5: bucket counts for combiner-bounded exchanges derive
    from cluster width when not pinned (resolve_num_buckets(None)),
    and results are bucket-count-INVARIANT — buckets are internal
    exchange keys dropped before output."""
    import pandas as pd
    import ray.data

    from kg_covid_19_ray.stages.dedup import (distinct, first_wins,
                                              resolve_num_buckets)

    assert resolve_num_buckets(7) == 7          # explicit pin wins
    assert resolve_num_buckets(None) >= 4       # derived, floored

    df = pd.DataFrame({
        "k": [f"k{i % 13}" for i in range(200)],
        "v": [f"v{i}" for i in range(200)],
        "ord": list(range(200)),
    })
    ds = ray.data.from_pandas(df).repartition(7)

    def norm(d):
        return d.sort_values(list(d.columns)).reset_index(drop=True)

    base_d = norm(distinct(ds, ["k"], num_buckets=3).to_pandas())
    base_f = norm(first_wins(ds, ["k"], "ord", num_buckets=3).to_pandas())
    for nb in (1, 64, None):
        got_d = norm(distinct(ds, ["k"], num_buckets=nb).to_pandas())
        got_f = norm(first_wins(ds, ["k"], "ord",
                                num_buckets=nb).to_pandas())
        pd.testing.assert_frame_equal(base_d, got_d)
        pd.testing.assert_frame_equal(base_f, got_f[base_f.columns])
