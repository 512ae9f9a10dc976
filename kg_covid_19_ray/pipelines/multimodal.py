"""Multimodal (image/audio/video) column handling: opaque ``binary``
payloads + typed metadata, with decode / feature-extraction / resize /
frame-sampling as actor-pool ``map_batches`` stages.

The container has no image/audio codecs, so the DECODE step is stubbed
behind ``_Codec``: it tries real libraries (PIL) in ``__init__`` and
falls back to a clearly-marked DETERMINISTIC FAKE that reinterprets the
payload bytes as the pixel/sample buffer. Everything around the stub —
schema, broadcast-free dataflow, actor signatures, small-batch sizing
for large payloads, output layout — is real and tested.

Media rows are synthesized deterministically from the documents table
(doc_id-seeded bytes; metadata is pure arithmetic on doc_id so the
metadata aggregate has a DuckDB oracle). At web scale the payloads are
the large side: batches are kept small (``MEDIA_BATCH``) so
batch x concurrency fits a worker heap, and payload columns are dropped
as soon as features are extracted (project early).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

MEDIA_BATCH = 64  # payload rows per batch: large-binary safety sizing
KINDS = ("image", "audio", "video")
FRAME_STEP = 4  # video frame sampling stride

THUMB_W, THUMB_H = 8, 8


def _meta_for(doc_id: int) -> tuple[str, int, int, int]:
    """Pure-arithmetic metadata (SQL-reproducible): kind, width,
    height, n_frames."""
    kind = KINDS[doc_id % 3]
    width = 32 + (doc_id % 8) * 16
    height = 32 + (doc_id % 5) * 16
    n_frames = 8 + doc_id % 8 if kind == "video" else 1
    return kind, width, height, n_frames


def _payload_for(doc_id: int, width: int, height: int) -> bytes:
    """Deterministic opaque bytes standing in for an encoded asset."""
    seed = hashlib.md5(str(doc_id).encode()).digest()
    rng = np.random.RandomState(int.from_bytes(seed[:4], "big"))
    return rng.bytes(width * height)


def media_table(sf_dir: str) -> ray.data.Dataset:
    """Typed media table derived from documents: one asset per doc.
    Schema: asset_id, doc_id, kind, payload:binary, width, height,
    n_frames."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        metas = [_meta_for(int(i)) for i in ids]
        return pa.table({
            "asset_id": pa.array(ids, pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
            "kind": pa.array([m[0] for m in metas], pa.string()),
            "payload": pa.array(
                [_payload_for(int(i), m[1], m[2])
                 for i, m in zip(ids, metas)], pa.binary()),
            "width": pa.array([m[1] for m in metas], pa.int32()),
            "height": pa.array([m[2] for m in metas], pa.int32()),
            "n_frames": pa.array([m[3] for m in metas], pa.int32()),
        })

    return docs.map_batches(synth, batch_format="pyarrow",
                            batch_size=MEDIA_BATCH)


class _Codec:
    """Decode stub. Tries the real codec libraries once per actor; the
    sandbox has none, so the deterministic fake path runs: payload
    bytes ARE the sample buffer. Swapping in a real decoder changes
    ONLY this class."""

    def __init__(self):
        try:  # pragma: no cover - not installed in this container
            from PIL import Image  # noqa: F401
            self.backend = "pil"
        except ImportError:
            self.backend = "fake"

    def decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self.backend == "fake":
            return np.frombuffer(payload, dtype=np.uint8)[
                :width * height].reshape(height, width)
        raise NotImplementedError(  # pragma: no cover
            "real codec path requires PIL; not available in sandbox")


class MediaFeatures:
    """Actor-pool stage: codec built once per actor (``__init__``),
    per-batch decode + vectorized feature extraction; payload column is
    DROPPED from the output (project early)."""

    def __init__(self):
        self.codec = _Codec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        pix = [self.codec.decode(p.as_py(), w.as_py(), h.as_py())
               for p, w, h in zip(batch["payload"], batch["width"],
                                  batch["height"])]
        mean = np.array([float(x.mean()) for x in pix])
        std = np.array([float(x.std()) for x in pix])
        return pa.table({
            "asset_id": batch["asset_id"],
            "kind": batch["kind"],
            "px_mean": pa.array(np.floor(mean * 1e4 + 0.5) / 1e4),
            "px_std": pa.array(np.floor(std * 1e4 + 0.5) / 1e4),
        })


def media_features(sf_dir: str) -> ray.data.Dataset:
    return media_table(sf_dir).map_batches(
        MediaFeatures, batch_format="pyarrow", batch_size=MEDIA_BATCH,
        concurrency=(1, 4), num_cpus=1)


class MediaResize:
    """Actor-pool resize stage: decode then area-average down to a
    THUMB_W x THUMB_H thumbnail (pure numpy on the fake buffer; a real
    backend would call Image.resize here). Output is the flattened
    thumbnail as a fixed-size list column."""

    def __init__(self):
        self.codec = _Codec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumbs = []
        for p, w, h in zip(batch["payload"], batch["width"],
                           batch["height"]):
            x = self.codec.decode(p.as_py(), w.as_py(), h.as_py())
            hs, ws = x.shape[0] // THUMB_H, x.shape[1] // THUMB_W
            t = x[:hs * THUMB_H, :ws * THUMB_W] \
                .reshape(THUMB_H, hs, THUMB_W, ws).mean(axis=(1, 3))
            thumbs.append(t.reshape(-1).astype(np.float32))
        return pa.table({
            "asset_id": batch["asset_id"],
            "thumb": pa.array(list(thumbs),
                              pa.list_(pa.float32(), THUMB_W * THUMB_H)),
        })


def media_thumbnails(sf_dir: str) -> ray.data.Dataset:
    return media_table(sf_dir).map_batches(
        MediaResize, batch_format="pyarrow", batch_size=MEDIA_BATCH,
        concurrency=(1, 4), num_cpus=1)


def media_frame_sample(sf_dir: str) -> ray.data.Dataset:
    """Video frame sampling: one output row per sampled frame index
    (every FRAME_STEP-th frame), payload dropped — the Ray-side
    plumbing of a frame extractor (row explosion, not decode)."""
    vids = media_table(sf_dir).filter(expr="kind == 'video'")

    def explode(batch: pa.Table) -> pa.Table:
        a_ids, d_ids, frames = [], [], []
        for aid, did, nf in zip(batch["asset_id"].to_numpy(),
                                batch["doc_id"].to_numpy(),
                                batch["n_frames"].to_numpy()):
            idx = list(range(0, int(nf), FRAME_STEP))
            a_ids += [int(aid)] * len(idx)
            d_ids += [int(did)] * len(idx)
            frames += idx
        return pa.table({"asset_id": pa.array(a_ids, pa.int64()),
                         "doc_id": pa.array(d_ids, pa.int64()),
                         "frame_idx": pa.array(frames, pa.int32())})

    return vids.map_batches(explode, batch_format="pyarrow",
                            batch_size=MEDIA_BATCH)


def media_meta_stats(sf_dir: str) -> ray.data.Dataset:
    """Metadata aggregate per kind (oracle-backed: metadata is pure
    arithmetic on doc_id)."""
    from ray.data.aggregate import Count, Max, Mean
    t = media_table(sf_dir).drop_columns(["payload"])
    return t.groupby("kind").aggregate(
        Count(alias_name="n_assets"),
        Mean("width", alias_name="avg_width"),
        Max("n_frames", alias_name="max_frames"),
    )


MEDIA_META_STATS_SQL = """
SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       ELSE 'video' END AS kind,
       count(*) AS n_assets,
       avg(32 + (doc_id % 8) * 16) AS avg_width,
       max(CASE WHEN doc_id % 3 = 2 THEN 8 + doc_id % 8 ELSE 1 END)
           AS max_frames
FROM documents GROUP BY 1
"""

MEDIA_FRAME_SAMPLE_SQL = f"""
SELECT doc_id AS asset_id, doc_id,
       frame_idx::INTEGER AS frame_idx
FROM documents,
     LATERAL (SELECT unnest(range(0, 8 + doc_id % 8, {FRAME_STEP}))
              AS frame_idx)
WHERE doc_id % 3 = 2
"""


MEDIA_PAIR_TOPK = 25


def media_near_dups(sf_dir: str) -> ray.data.Dataset:
    """Multimodal -> similarity composition: decode + thumbnail each
    asset (the fake-codec feature vector), then find the
    MEDIA_PAIR_TOPK most-cosine-similar asset pairs among LSH candidate
    pairs — the image near-duplicate detector's dataflow. Rows-only
    driver check (the features come from the fake decode).

    Web-scale shape: NO driver materialization — the thumbnail Dataset
    is hashed into hyperplane-LSH buckets (reusing similarity's seeded
    planes), pairs are scored only within a bucket, per-bucket partial
    top-k, then one small global sort+limit. Thumbnails are mean-
    centered before hashing (area-averaged pixel vectors are nearly
    parallel in the raw space, which would collapse every asset into
    one bucket); the re-rank cosine stays in the raw space."""
    import numpy as np
    import pandas as pd

    from kg_covid_19_ray.pipelines.similarity import (LSH_TABLES,
                                                      _signatures)

    thumbs = media_thumbnails(sf_dir)

    def emit_buckets(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack([np.asarray(v, dtype=np.float64)
                        for v in batch["thumb"]])
        centered = mat - mat.mean(axis=1, keepdims=True)
        sigs = _signatures(centered)  # (n, LSH_TABLES)
        n = len(batch)
        return pd.DataFrame({
            "table_id": np.repeat(np.arange(LSH_TABLES, dtype=np.int32), n),
            "bucket": sigs.T.reshape(-1),
            "asset_id": np.tile(batch["asset_id"].to_numpy(), LSH_TABLES),
            "thumb": list(batch["thumb"]) * LSH_TABLES,
        })

    buckets = thumbs.map_batches(emit_buckets, batch_format="pandas",
                                 batch_size=MEDIA_BATCH)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("asset_id").drop_duplicates("asset_id")
        if len(g) < 2:
            return pd.DataFrame({"asset_a": pd.Series([], dtype=np.int64),
                                 "asset_b": pd.Series([], dtype=np.int64),
                                 "cos": pd.Series([], dtype=np.float64)})
        ids = g["asset_id"].to_numpy()
        m = np.stack([np.asarray(v, dtype=np.float64)
                      for v in g["thumb"]])
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        ia, ib = np.triu_indices(len(ids), k=1)
        c = (m @ m.T)[ia, ib]
        c = np.floor(np.abs(c) * 1e6 + 0.5) / 1e6 * np.sign(c)
        a, b = ids[ia], ids[ib]
        # per-bucket partial top-k (rounded-before-cut: union-safe)
        if len(c) > MEDIA_PAIR_TOPK:
            top = np.lexsort((b, a, -c))[:MEDIA_PAIR_TOPK]
            a, b, c = a[top], b[top], c[top]
        return pd.DataFrame({"asset_a": a.astype(np.int64),
                             "asset_b": b.astype(np.int64),
                             "cos": c})

    pairs = buckets.groupby(["table_id", "bucket"]).map_groups(
        bucket_pairs, batch_format="pandas")
    # a pair colliding in several tables appears once per table with the
    # same cos — distinct on the full row collapses them
    from kg_covid_19_ray.stages.dedup import distinct
    pairs = distinct(pairs, ["asset_a", "asset_b", "cos"])
    return pairs.sort(["cos", "asset_a", "asset_b"],
                      descending=[True, False, False]) \
                .limit(MEDIA_PAIR_TOPK)


REGISTRY = {
    "media_meta_stats": (media_meta_stats, MEDIA_META_STATS_SQL),
    "media_near_dups": (media_near_dups, None),  # fake-decode features
    "media_frame_sample": (media_frame_sample, MEDIA_FRAME_SAMPLE_SQL),
    "media_features": (media_features, None),   # fake-decode features
    "media_thumbnails": (media_thumbnails, None),  # fake-decode resize
}
