"""Multimodal (image/audio/video) column handling: opaque ``binary``
payloads + typed metadata, with decode / feature-extraction / resize /
frame-sampling as actor-pool ``map_batches`` stages.

The DECODE step runs for real: payloads are spec-conformant grayscale
8-bit PNG (images, video keyframes) and mono 8-bit PCM WAV (audio),
decoded by the pure-stdlib codecs in ``functions/codecs.py``
(chunk/CRC parsing, DEFLATE, PNG row unfiltering — no PIL needed).
``_Codec`` still probes for PIL first per actor so a production
deployment swaps the backend without touching the dataflow; a payload
that is neither PNG nor RIFF/WAVE raises loudly. Video is one encoded
keyframe + frame-count metadata — frame extraction from a real
container format is the one remaining stubbed seam (no video codec in
the sandbox); ``media_frame_sample`` exercises its row-explosion
plumbing against the metadata.

Media rows are synthesized deterministically from the documents table:
metadata AND pixel/sample content are pure arithmetic on ``doc_id``
(pixel i = (doc_id*7 + i*13) % 256), so decode-dependent outputs
(``media_features``, ``media_thumbnails``) have full DuckDB value
oracles — the SQL regenerates the pixels with ``range()`` and
aggregates them. All feature math uses exact int64 sums before one
float64 division so numpy and DuckDB produce bit-identical doubles.
At web scale the payloads are the large side: batches are kept small
(``MEDIA_BATCH``) so batch x concurrency fits a worker heap, and
payload columns are dropped as soon as features are extracted
(project early).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from kg_covid_19_ray.functions.arrow_meta import read_parquet_clean
from kg_covid_19_ray.functions.codecs import (_PNG_SIG, decode_png_gray,
                                              decode_wav_u8,
                                              encode_png_gray,
                                              encode_wav_u8)

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


def _pixels_for(doc_id: int, width: int, height: int) -> np.ndarray:
    """SQL-reproducible content: pixel/sample i = (doc_id*7+i*13)%256."""
    i = np.arange(width * height, dtype=np.int64)
    return ((doc_id * 7 + i * 13) % 256).astype(np.uint8)


def _payload_for(doc_id: int, kind: str, width: int, height: int) -> bytes:
    """Deterministic ENCODED asset: PNG for image/video keyframes, WAV
    for audio. (Test/bench scaffolding — a real deployment reads assets
    from storage; the decode stages below are the product code.)"""
    pix = _pixels_for(doc_id, width, height)
    if kind == "audio":
        return encode_wav_u8(pix)
    return encode_png_gray(pix.reshape(height, width))


def media_table(sf_dir: str) -> ray.data.Dataset:
    """Typed media table derived from documents: one asset per doc.
    Schema: asset_id, doc_id, kind, payload:binary, width, height,
    n_frames."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        metas = [_meta_for(int(i)) for i in ids]
        return pa.table({
            "asset_id": pa.array(ids, pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
            "kind": pa.array([m[0] for m in metas], pa.string()),
            "payload": pa.array(
                [_payload_for(int(i), m[0], m[1], m[2])
                 for i, m in zip(ids, metas)], pa.binary()),
            "width": pa.array([m[1] for m in metas], pa.int32()),
            "height": pa.array([m[2] for m in metas], pa.int32()),
            "n_frames": pa.array([m[3] for m in metas], pa.int32()),
        })

    return docs.map_batches(synth, batch_format="pyarrow",
                            batch_size=MEDIA_BATCH)


class _Codec:
    """Real decode seam, built once per actor. Probes PIL first (the
    production backend); the sandbox has none, so the pure-stdlib
    PNG/WAV decoders run — real chunk parsing, CRC verification,
    DEFLATE and row unfiltering, not a byte-reinterpretation fake.
    Swapping in a richer decoder changes ONLY this class."""

    def __init__(self):
        try:  # pragma: no cover - not installed in this container
            from PIL import Image  # noqa: F401
            self.backend = "pil"
        except ImportError:
            self.backend = "stdlib"

    def decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        """Sniff the container and decode to a (height, width) uint8
        grid (audio samples are reshaped to the metadata grid). Unknown
        containers raise — corrupt assets must surface, not alias."""
        if payload[:8] == _PNG_SIG:
            x = decode_png_gray(payload)
            if x.shape != (height, width):
                raise ValueError(
                    f"decoded PNG shape {x.shape} != metadata "
                    f"({height}, {width})")
            return x
        if payload[:4] == b"RIFF":
            s = decode_wav_u8(payload)
            if s.size != width * height:
                raise ValueError(
                    f"decoded WAV length {s.size} != metadata "
                    f"{width * height}")
            return s.reshape(height, width)
        raise ValueError("unknown media container (not PNG or WAV)")


class MediaFeatures:
    """Actor-pool stage: codec built once per actor (``__init__``),
    per-batch decode + vectorized feature extraction; payload column is
    DROPPED from the output (project early)."""

    def __init__(self):
        self.codec = _Codec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        # exact int64 sums then ONE float64 division each — mirrors the
        # SQL oracle's sum()/count() arithmetic bit-for-bit
        mean = np.empty(len(batch))
        std = np.empty(len(batch))
        for j, (p, w, h) in enumerate(zip(batch["payload"],
                                          batch["width"],
                                          batch["height"])):
            x = self.codec.decode(p.as_py(), w.as_py(),
                                  h.as_py()).astype(np.int64)
            n = x.size
            m = x.sum() / n
            var = (x * x).sum() / n - m * m
            mean[j] = m
            std[j] = np.sqrt(max(var, 0.0))
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


# Oracle regenerates the pixel stream with range() and aggregates with
# exact BIGINT sums; float ops then match numpy exactly (sums < 2^53).
MEDIA_FEATURES_SQL = """
WITH px AS (
  SELECT d.doc_id,
         (d.doc_id * 7 + i * 13) % 256 AS v
  FROM documents d,
       LATERAL (SELECT unnest(range((32 + (d.doc_id % 8) * 16)
                                    * (32 + (d.doc_id % 5) * 16))) AS i)
)
SELECT doc_id AS asset_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS kind,
       floor((sum(v)::DOUBLE / count(*)) * 1e4 + 0.5) / 1e4 AS px_mean,
       floor(sqrt(greatest(
           sum(v * v)::DOUBLE / count(*)
           - (sum(v)::DOUBLE / count(*)) * (sum(v)::DOUBLE / count(*)),
           0.0)) * 1e4 + 0.5) / 1e4 AS px_std
FROM px GROUP BY doc_id
"""


class MediaResize:
    """Actor-pool resize stage: decode then area-average down to a
    THUMB_W x THUMB_H thumbnail (exact int64 block sums, one float64
    division, rounded at 1e-4 — a PIL backend would call Image.resize
    here). Output is the flattened thumbnail as a fixed-size list
    column."""

    def __init__(self):
        self.codec = _Codec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumbs = []
        for p, w, h in zip(batch["payload"], batch["width"],
                           batch["height"]):
            x = self.codec.decode(p.as_py(), w.as_py(),
                                  h.as_py()).astype(np.int64)
            hs, ws = x.shape[0] // THUMB_H, x.shape[1] // THUMB_W
            t = x[:hs * THUMB_H, :ws * THUMB_W] \
                .reshape(THUMB_H, hs, THUMB_W, ws) \
                .sum(axis=(1, 3)) / (hs * ws)
            thumbs.append((np.floor(t.reshape(-1) * 1e4 + 0.5) / 1e4))
        return pa.table({
            "asset_id": batch["asset_id"],
            "thumb": pa.array(list(thumbs),
                              pa.list_(pa.float64(), THUMB_W * THUMB_H)),
        })


def _thumb_vectors(sf_dir: str) -> ray.data.Dataset:
    """Internal list-form thumbnails (feature vectors for near-dup)."""
    return media_table(sf_dir).map_batches(
        MediaResize, batch_format="pyarrow", batch_size=MEDIA_BATCH,
        concurrency=(1, 4), num_cpus=1)


def media_thumbnails(sf_dir: str) -> ray.data.Dataset:
    """Registered thumbnail query: one row per (asset, cell) so the
    list payload is value-checkable against the SQL oracle (the driver
    compare hashes scalar columns; the list form stays available via
    ``_thumb_vectors`` for downstream vector consumers)."""
    def explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        k = THUMB_W * THUMB_H
        flat = np.asarray(batch["thumb"].combine_chunks().flatten()) \
            if n else np.empty(0)
        cell = np.tile(np.arange(k, dtype=np.int64), n)
        return pa.table({
            "asset_id": pa.array(
                np.repeat(batch["asset_id"].to_numpy(), k), pa.int64()),
            "ty": pa.array(cell // THUMB_W, pa.int32()),
            "tx": pa.array(cell % THUMB_W, pa.int32()),
            "val": pa.array(flat, pa.float64()),
        })

    return _thumb_vectors(sf_dir).map_batches(
        explode, batch_format="pyarrow", batch_size=MEDIA_BATCH)


# Thumbnail oracle: every width/height is a multiple of 8 (32 + 16k),
# so blocks tile exactly and each cell is an exact BIGINT sum over
# hs*ws pixels divided once in float64 — bit-identical to numpy.
MEDIA_THUMBNAILS_SQL = f"""
WITH dims AS (
  SELECT doc_id, 32 + (doc_id % 8) * 16 AS w, 32 + (doc_id % 5) * 16 AS h
  FROM documents
), px AS (
  SELECT doc_id, w, h, w // {THUMB_W} AS ws, h // {THUMB_H} AS hs,
         (doc_id * 7 + i * 13) % 256 AS v,
         i // w AS y, i % w AS x
  FROM dims, LATERAL (SELECT unnest(range(w * h)) AS i)
)
SELECT doc_id AS asset_id,
       (y // hs)::INTEGER AS ty, (x // ws)::INTEGER AS tx,
       floor((sum(v)::DOUBLE / count(*)) * 1e4 + 0.5) / 1e4 AS val
FROM px
GROUP BY doc_id, y // hs, x // ws
"""


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
    asset (real PNG/WAV decode), then find the MEDIA_PAIR_TOPK
    most-cosine-similar asset pairs among LSH candidate pairs — the
    image near-duplicate detector's dataflow. Rows-only driver check
    (the LSH bucket recall + float32-era cosine path is approximate by
    design; the underlying thumbnail values are oracle-pinned via
    ``media_thumbnails``).

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

    thumbs = _thumb_vectors(sf_dir)

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


def _media_near_dups_sql() -> str:
    """SQL oracle for media_near_dups, same trick as ``_ann_lsh_sql``:
    the seeded hyperplanes are embedded as float literals. Pixel stream
    -> thumbnail cells -> mean-centered vectors -> per-table bucket ids
    -> any-bucket candidate pairs -> exact-cosine global top-K. The
    per-bucket partial top-K in the Ray plan is pure pruning: any pair
    it cuts is dominated by >= MEDIA_PAIR_TOPK distinct candidates in
    the same total order (cos DESC, a, b), so the global top-K over all
    candidate pairs is identical."""
    from kg_covid_19_ray.pipelines.similarity import (LSH_BITS, LSH_TABLES,
                                                      _lsh_planes)
    planes = _lsh_planes(THUMB_W * THUMB_H)
    sig_exprs = []
    for t in range(LSH_TABLES):
        bits = []
        for b in range(LSH_BITS):
            vec = ", ".join(repr(float(x)) for x in planes[t, b])
            bits.append(f"(CASE WHEN list_inner_product(cthumb, [{vec}]) > 0"
                        f" THEN {1 << b} ELSE 0 END)")
        sig_exprs.append(" + ".join(bits) + f" AS b{t}")
    sig_cols = ",\n         ".join(sig_exprs)
    any_bucket = " OR ".join(f"x.b{t} = y.b{t}" for t in range(LSH_TABLES))
    return f"""
WITH dims AS (
  SELECT doc_id, 32 + (doc_id % 8) * 16 AS w, 32 + (doc_id % 5) * 16 AS h
  FROM documents
), px AS (
  SELECT doc_id, w // {THUMB_W} AS ws, h // {THUMB_H} AS hs,
         (doc_id * 7 + i * 13) % 256 AS v,
         i // w AS y, i % w AS x
  FROM dims, LATERAL (SELECT unnest(range(w * h)) AS i)
), cells AS (
  SELECT doc_id AS asset_id,
         (y // hs) * {THUMB_W} + (x // ws) AS cell,
         floor((sum(v)::DOUBLE / count(*)) * 1e4 + 0.5) / 1e4 AS val
  FROM px GROUP BY doc_id, (y // hs) * {THUMB_W} + (x // ws)
), vecs AS (
  SELECT asset_id, list(val ORDER BY cell) AS thumb
  FROM cells GROUP BY asset_id
), sig AS (
  SELECT asset_id, thumb,
         {sig_cols}
  FROM (SELECT asset_id, thumb,
               list_transform(thumb,
                   e -> e - list_aggregate(thumb, 'avg')) AS cthumb
        FROM vecs) c
), pairs AS (
  SELECT DISTINCT x.asset_id AS asset_a, y.asset_id AS asset_b
  FROM sig x JOIN sig y
    ON x.asset_id < y.asset_id AND ({any_bucket})
)
SELECT p.asset_a, p.asset_b,
       round(list_cosine_similarity(a.thumb, b.thumb), 6) AS cos
FROM pairs p
JOIN vecs a ON a.asset_id = p.asset_a
JOIN vecs b ON b.asset_id = p.asset_b
ORDER BY cos DESC, p.asset_a, p.asset_b
LIMIT {MEDIA_PAIR_TOPK}
"""


REGISTRY = {
    "media_meta_stats": (media_meta_stats, MEDIA_META_STATS_SQL),
    "media_near_dups": (media_near_dups, _media_near_dups_sql()),
    "media_frame_sample": (media_frame_sample, MEDIA_FRAME_SAMPLE_SQL),
    "media_features": (media_features, MEDIA_FEATURES_SQL),
    "media_thumbnails": (media_thumbnails, MEDIA_THUMBNAILS_SQL),
}
