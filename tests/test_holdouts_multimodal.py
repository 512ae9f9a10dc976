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
    assert len(row["payload"]) == row["width"] * row["height"]
    assert multimodal._payload_for(row["doc_id"], row["width"],
                                   row["height"]) == row["payload"]


def test_media_codec_falls_back_to_fake():
    codec = multimodal._Codec()
    assert codec.backend == "fake"  # no PIL in this container
    buf = bytes(range(12))
    x = codec.decode(buf, 4, 3)
    assert x.shape == (3, 4) and x.dtype == np.uint8
    assert x[0, 0] == 0 and x[2, 3] == 11


def test_media_thumbnails_fixed_width_list(ray_session):
    b = multimodal.media_thumbnails(SF).take_batch(5, batch_format="pyarrow")
    import pyarrow as pa
    assert b["thumb"].type == pa.list_(
        pa.float32(), multimodal.THUMB_W * multimodal.THUMB_H)
    v = np.asarray(b["thumb"][0].as_py())
    assert v.shape == (64,) and 0 <= v.min() and v.max() <= 255


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
