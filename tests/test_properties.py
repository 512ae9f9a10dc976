"""Property-based tests (hypothesis) — a strengthening the reference
doesn't have (SURVEY §5: property-style assertions only). Pure-function
properties run at full example counts; Ray-backed dedup properties run
fewer examples against a pandas oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

keys = st.text(alphabet="abcdef", min_size=1, max_size=3)


@st.composite
def keyed_frames(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    ks = draw(st.lists(keys, min_size=n, max_size=n))
    order = draw(st.permutations(list(range(n))))
    return pd.DataFrame({"id": ks,
                         "order_key": np.array(order, dtype=np.int64),
                         "payload": [f"p{i}" for i in order]})


@settings(max_examples=12, deadline=None)
@given(df=keyed_frames(), nparts=st.integers(min_value=1, max_value=5))
def test_first_wins_matches_pandas_oracle(ray_session, df, nparts):
    import ray.data
    from kg_covid_19_ray.stages.dedup import first_wins
    ds = ray.data.from_pandas(df).repartition(nparts)
    got = first_wins(ds, ["id"], "order_key").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    exp = df.sort_values("order_key", kind="mergesort") \
        .drop_duplicates("id").sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["id", "order_key", "payload"]],
                                  exp[["id", "order_key", "payload"]])


@settings(max_examples=12, deadline=None)
@given(df=keyed_frames(), nparts=st.integers(min_value=1, max_value=5))
def test_distinct_matches_pandas_oracle(ray_session, df, nparts):
    import ray.data
    from kg_covid_19_ray.stages.dedup import distinct
    ds = ray.data.from_pandas(df[["id"]]).repartition(nparts)
    got = sorted(distinct(ds, ["id"]).to_pandas()["id"])
    assert got == sorted(df["id"].unique())


token_sets = st.sets(st.integers(min_value=0, max_value=1 << 31),
                     min_size=1, max_size=50)


@settings(max_examples=200)
@given(a=token_sets, b=token_sets)
def test_minhash_union_is_elementwise_min(a, b):
    """Exact MinHash identity: sig(A ∪ B) == min(sig(A), sig(B))."""
    from kg_covid_19_ray.pipelines.dedup_ops import _minhash_signature
    sa, sb = _minhash_signature(a), _minhash_signature(b)
    su = _minhash_signature(a | b)
    assert (su == np.minimum(sa, sb)).all()


@settings(max_examples=200)
@given(s=token_sets)
def test_minhash_identical_sets_identical_sigs(s):
    from kg_covid_19_ray.pipelines.dedup_ops import _minhash_signature
    assert (_minhash_signature(s) == _minhash_signature(set(s))).all()


texts = st.text(alphabet="ab |", max_size=30)


@settings(max_examples=200)
@given(t=texts)
def test_pipe_roundtrip_without_pipes(t):
    from kg_covid_19_ray.functions.strings import pipe_join, pipe_split
    parts = [p for p in t.split(" ") if p and "|" not in p]
    assert pipe_split(pipe_join(parts)) == (parts if parts else [])


@settings(max_examples=200)
@given(c=st.text(alphabet=st.characters(
    whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=127),
    min_size=1, max_size=20))
def test_collapse_isoform_idempotent(c):
    from kg_covid_19_ray.functions.curies import collapse_uniprot_isoform
    once = collapse_uniprot_isoform(c)
    assert collapse_uniprot_isoform(once) == once


@settings(max_examples=100)
@given(x=st.integers(min_value=0, max_value=(1 << 64) - 1))
def test_simhash_segments_cover_word(x):
    """The 4 pigeonhole segments partition the 64-bit word: any two
    words within hamming distance 3 share at least one segment."""
    from kg_covid_19_ray.pipelines.dedup_ops import (
        SIMHASH_MAX_HAMMING, SIMHASH_SEGMENTS)
    import random
    rng = random.Random(x)
    y = x
    for _ in range(SIMHASH_MAX_HAMMING):
        y ^= 1 << rng.randrange(64)
    segs_equal = sum(
        ((x >> (16 * s)) & 0xFFFF) == ((y >> (16 * s)) & 0xFFFF)
        for s in range(SIMHASH_SEGMENTS))
    assert segs_equal >= 1
