"""Property tests for the holdout suite (reference
tests/test_holdouts.py analog: negatives don't overlap positives, no
reflexive edges, split is a partition) and the multimodal plumbing
(schema, determinism, stride, codec fallback)."""

from __future__ import annotations

import numpy as np

from kg_covid_19_ray.pipelines import holdouts, multimodal

SF = "/root/testdata/sf0.001"


def test_holdout_split_partitions_edges(ray_session):
    edges = holdouts._edges(SF).to_pandas()
    split = holdouts.holdout_split(SF).to_pandas()
    assert len(split) == len(edges)
    assert set(split["split"]) <= {"train", "test"}
    # both sides non-empty at this scale and fraction
    counts = split["split"].value_counts()
    assert counts.get("train", 0) > counts.get("test", 0) > 0
    # deterministic: second run identical
    split2 = holdouts.holdout_split(SF).to_pandas()
    key = lambda df: sorted(map(tuple, df.to_numpy()))
    assert key(split) == key(split2)


def test_holdout_negatives_properties(ray_session):
    pos = holdouts._edges(SF).to_pandas()
    neg = holdouts.holdout_negatives(SF).to_pandas()
    assert len(neg) == holdouts.NEG_N
    pos_set = set(zip(pos["subject"], pos["object"]))
    neg_set = set(zip(neg["subject"], neg["object"]))
    assert not (pos_set & neg_set)          # anti-join held
    assert len(neg_set) == len(neg)         # no duplicate pairs
    assert all(s != o for s, o in neg_set)  # no reflexive edges
    # endpoints drawn from the positive graph's vocabulary
    assert set(neg["subject"]) <= set(pos["subject"])
    assert set(neg["object"]) <= set(pos["object"])


def test_holdout_degrees_match_pandas(ray_session):
    out = holdouts.holdout_degrees(SF).to_pandas()
    sd = out.groupby("subject")["object"].transform("count")
    od = out.groupby("object")["subject"].transform("count")
    assert (out["subj_degree"] == sd).all()
    assert (out["obj_degree"] == od).all()


def test_media_table_schema_and_determinism(ray_session):
    t = multimodal.media_table(SF).take_batch(10, batch_format="pyarrow")
    assert set(t.column_names) == {"asset_id", "doc_id", "kind", "payload",
                                   "width", "height", "n_frames"}
    row = {c: t[c][0].as_py() for c in t.column_names}
    assert isinstance(row["payload"], bytes)
    assert multimodal._payload_for(row["doc_id"], row["kind"], row["width"],
                                   row["height"]) == row["payload"]
    # the payload is a real encoded asset: decoding recovers the
    # arithmetic pixel content exactly
    x = multimodal._Codec().decode(row["payload"], row["width"],
                                   row["height"])
    want = multimodal._pixels_for(row["doc_id"], row["width"],
                                  row["height"]).reshape(row["height"],
                                                         row["width"])
    assert (x == want).all()


def test_media_codec_stdlib_backend():
    from kg_covid_19_ray.functions import codecs
    codec = multimodal._Codec()
    assert codec.backend == "stdlib"  # no PIL in this container
    arr = np.arange(12, dtype=np.uint8).reshape(3, 4)
    x = codec.decode(codecs.encode_png_gray(arr), 4, 3)
    assert x.dtype == np.uint8 and (x == arr).all()
    wav = codecs.encode_wav_u8(np.arange(12, dtype=np.uint8))
    assert (codec.decode(wav, 4, 3) == arr).all()
    import pytest
    with pytest.raises(ValueError):  # unknown containers fail loudly
        codec.decode(bytes(range(12)), 4, 3)
    with pytest.raises(ValueError):  # metadata mismatch fails loudly
        codec.decode(codecs.encode_png_gray(arr), 5, 3)


def test_media_thumbnails_exploded_cells(ray_session):
    vec = multimodal._thumb_vectors(SF).take_batch(
        5, batch_format="pyarrow")
    import pyarrow as pa
    k = multimodal.THUMB_W * multimodal.THUMB_H
    assert vec["thumb"].type == pa.list_(pa.float64(), k)
    v = np.asarray(vec["thumb"][0].as_py())
    assert v.shape == (k,) and 0 <= v.min() and v.max() <= 255
    out = multimodal.media_thumbnails(SF).to_pandas()
    assert set(out.columns) == {"asset_id", "ty", "tx", "val"}
    per = out.groupby("asset_id").size()
    assert (per == k).all()


def test_media_frame_sample_stride(ray_session):
    out = multimodal.media_frame_sample(SF).to_pandas()
    assert (out["frame_idx"] % multimodal.FRAME_STEP == 0).all()
    for aid, g in out.groupby("asset_id"):
        nf = 8 + int(aid) % 8
        assert sorted(g["frame_idx"]) == list(
            range(0, nf, multimodal.FRAME_STEP))


def test_media_near_dups_composition(ray_session):
    """Multimodal decode feeding pairwise similarity: top-K asset
    pairs, deterministic, no self pairs, ordered pairs only."""
    out1 = multimodal.media_near_dups(SF).to_pandas()
    assert len(out1) == multimodal.MEDIA_PAIR_TOPK
    assert (out1["asset_a"] < out1["asset_b"]).all()
    assert out1["cos"].between(-1.0, 1.0).all()
    out2 = multimodal.media_near_dups(SF).to_pandas()
    key = lambda df: list(map(tuple, df.to_numpy()))
    assert key(out1) == key(out2)


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_spanning_forest_preserves_connectivity(ray_session):
    """The forest must have exactly n_nodes - n_components edges and
    the same component structure as the input graph."""
    import numpy as np
    import ray.data
    from kg_covid_19_ray.stages.cluster import spanning_forest

    rng = np.random.RandomState(9)
    edges = [(f"N:{a}", f"N:{b}")
             for a, b in zip(rng.randint(0, 400, 2000),
                             rng.randint(0, 400, 2000)) if a != b]
    # plus a long chain in a separate component
    edges += [(f"C:{i:03d}", f"C:{i+1:03d}") for i in range(50)]
    ds = ray.data.from_items(
        [{"a": a, "b": b} for a, b in edges]).repartition(8)
    forest = spanning_forest(ds).to_pandas()

    full = _uf_components(edges)
    n_nodes = len(full)
    n_comps = len(set(full.values()))
    assert len(forest) == n_nodes - n_comps
    got = _uf_components(list(zip(forest["a"], forest["b"])))
    # identical node partition
    assert len(got) == n_nodes
    remap = {}
    for n, c in got.items():
        assert remap.setdefault(c, full[n]) == full[n]


def test_holdout_connected_train_keeps_components(ray_session, sf_small):
    """Train must have the same component structure as the full edge
    graph (the ensmallen random_holdout guarantee), and test edges must
    be non-forest only."""
    from kg_covid_19_ray.pipelines.holdouts import holdout_connected

    df = holdout_connected(sf_small).to_pandas()
    assert set(df["split"]) == {"train", "test"}
    all_edges = list(zip(df["subject"], df["object"]))
    train_edges = [e for e, s in zip(all_edges, df["split"])
                   if s == "train"]
    full = _uf_components(all_edges)
    train = _uf_components(train_edges)
    assert len(train) == len(full)  # no node lost
    remap = {}
    for n, c in train.items():
        assert remap.setdefault(c, full[n]) == full[n]


def test_spanning_forest_boruvka_path(ray_session):
    """Force the distributed Boruvka finish (max_local_edges below the
    survivor count) and assert the same forest invariants: exact edge
    count and identical component partition."""
    import numpy as np
    import ray.data
    from kg_covid_19_ray.stages.cluster import spanning_forest

    rng = np.random.RandomState(13)
    edges = [(f"N:{a:04d}", f"N:{b:04d}")
             for a, b in zip(rng.randint(0, 300, 1500),
                             rng.randint(0, 300, 1500)) if a != b]
    edges += [(f"C:{i:03d}", f"C:{i+1:03d}") for i in range(80)]
    ds = ray.data.from_items(
        [{"a": a, "b": b} for a, b in edges]).repartition(8)
    forest = spanning_forest(ds, max_local_edges=50).to_pandas()

    full = _uf_components(edges)
    n_nodes = len(full)
    n_comps = len(set(full.values()))
    assert len(forest) == n_nodes - n_comps
    got = _uf_components(list(zip(forest["a"], forest["b"])))
    assert len(got) == n_nodes
    remap = {}
    for n, c in got.items():
        assert remap.setdefault(c, full[n]) == full[n]
    # every forest edge is an input edge (originals, not supernode ids)
    eset = set(edges) | {(b, a) for a, b in edges}
    assert all(t in eset for t in zip(forest["a"], forest["b"]))


def test_sample_stratified(ray_session):
    import pandas as pd
    from kg_covid_19_ray.pipelines.holdouts import (
        SAMPLE_PER_SOURCE, sample_stratified)

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "source"])
    out = sample_stratified(sf).to_pandas()
    # per-source counts == min(K, group size); sampled ids exist
    want = docs.groupby("source").size().clip(upper=SAMPLE_PER_SOURCE)
    got = out.groupby("source").size()
    assert got.sort_index().equals(want.sort_index())
    assert out["doc_id"].isin(docs["doc_id"]).all()
    # deterministic under a different block layout
    out2 = sample_stratified(sf).to_pandas()
    key = lambda df: df.sort_values(["source", "doc_id"]) \
        .reset_index(drop=True)
    assert key(out).equals(key(out2))
