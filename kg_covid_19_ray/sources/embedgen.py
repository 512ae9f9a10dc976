"""Deterministic large-scale embeddings generator for similarity/ANN
benchmarks: expands the driver's embeddings table by a replica factor
with PLANTED cluster structure (replica vectors are noisy copies of
the base vectors), so IVF cell assignment and LSH bucketing are
exercised at 10^6+ vectors with realistic geometry. No external data —
everything derives from the seeded sf tables (mirrors sources/docgen).

vec_id = r * base_n + base id; replica 0 is the base table itself, so
the ANN query set (vec_id < ANN_NUM_QUERIES) is unchanged, and each
query's planted near-neighbors are its own noisy copies.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

NOISE_SIGMA = 0.15


def write_embeddings_parquet(sf_dir: str, out_dir: str, *,
                             replicas: int) -> int:
    """Expand embeddings.parquet by ``replicas`` into
    ``out_dir/embeddings.parquet`` (a parquet directory, one file per
    replica task); returns total rows."""
    base = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    mat = np.stack(base["embedding"].to_pylist()).astype(np.float32)
    labels = base["label"].to_numpy().astype(np.int32)
    n, dim = mat.shape
    ref = ray.put((mat, labels))

    def one_replica(row: dict) -> pa.Table:
        r = int(row["id"])
        m, lab = ray.get(ref)
        if r == 0:
            out = m
        else:
            rng = np.random.RandomState(1_000_000 + r)
            out = m + rng.standard_normal(m.shape).astype(np.float32) \
                * NOISE_SIGMA
        ids = (r * n + np.arange(n)).astype(np.int64)
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(out.reshape(-1), pa.float32()), dim).cast(
            pa.list_(pa.float32()))
        return pa.table({"vec_id": pa.array(ids),
                         "embedding": emb,
                         "label": pa.array(np.tile(lab, 1))})

    ray.data.range(replicas).map_batches(
        lambda b: pa.concat_tables(
            [one_replica({"id": i}) for i in b["id"].to_pylist()]),
        batch_size=8, batch_format="pyarrow") \
        .write_parquet(f"{out_dir}/embeddings.parquet")
    return replicas * n
