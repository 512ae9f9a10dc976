"""Cardinality sketches: KMV (k-minimum-values) distinct-count estimate.

The planning primitive a distributed engine wants before committing to
a shuffle: "how many distinct keys does this column have?" answered in
one narrow streaming pass — per block, only the k smallest value
hashes survive (a few KB), merged once at the end. Exact distinct
(`stages/dedup.distinct`) is a full hash exchange of every key; the
sketch is O(k) communication total.

KMV estimator (Bar-Yossef et al. 2002, "Counting distinct elements in
a data stream"): hash values uniformly into [0, 1); if the kth
smallest of the distinct hashes is h_k, the distinct count is
~ (k-1) / h_k. DETERMINISTIC given the hash function — no RNG — which
is what makes an *approximate* operator value-hash-oracle-able: both
sides hash with md5, order by the first 60 bits, and compute the same
integer floor division, so the estimate is bit-identical (the same
trick as ann_lsh's literal-embedded hyperplanes: pin the randomness,
oracle the arithmetic).

Integer contract shared with the DuckDB oracle:
    v        = int(md5(value)[:15 hex], 16)         in [0, 2^60)
    estimate = (n_kept - 1) * 2^60 // v_kth          if n_kept == k
             = n_kept (exact — fewer distincts than k) otherwise
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from kg_covid_19_ray.functions.arrow_meta import read_parquet_clean

HASH_SPACE = 1 << 60  # first 15 hex digits of md5


def _kmv_hashes(values, k: int) -> np.ndarray:
    """k smallest distinct 60-bit md5 hashes of the given values.

    Nulls are dropped before hashing — SQL ``md5(NULL)`` is NULL and
    falls out of the oracle's sketch, so the engine must not count a
    null as the distinct value md5('None') (round-3 ADVICE; also keeps
    a literal 'None' string from colliding with null). Values are
    hashed as their string value directly, not ``str(v)`` of a
    wrapper."""
    uniq = pd.unique(pd.Series(values, dtype=object).dropna())
    h = np.fromiter(
        (int(hashlib.md5(
            (v if isinstance(v, str) else str(v)).encode()
         ).hexdigest()[:15], 16)
         for v in uniq), dtype=np.int64, count=len(uniq))
    h = np.unique(h)  # distinct hashes (collisions collapse, as in SQL)
    return h[:k] if len(h) > k else h


def kmv_distinct(
    ds: ray.data.Dataset,
    column: str,
    *,
    k: int = 64,
) -> ray.data.Dataset:
    """-> one-row Dataset(k_used:int64, kth_hash:int64,
    distinct_estimate:int64).

    Streaming shape: one map pass emits <= k hashes per block (md5 over
    the block's DISTINCT values only — the exact_dedup pattern); the
    driver folds the tiny partials (k x blocks ints, the small-result
    exception) and applies the estimator once."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[column].to_pandas()
        return pa.table({"v": pa.array(_kmv_hashes(vals, k))})

    parts = ds.select_columns([column]) \
        .map_batches(partial, batch_format="pyarrow")

    merged: list[np.ndarray] = []
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows:
            merged.append(b["v"].to_numpy(zero_copy_only=False))
    allh = np.unique(np.concatenate(merged)) if merged \
        else np.array([], np.int64)
    kept = allh[:k] if len(allh) > k else allh
    n_kept = int(len(kept))
    if n_kept == k and n_kept > 0:
        estimate = (n_kept - 1) * HASH_SPACE // int(kept[-1])
    else:
        estimate = n_kept  # saw every distinct value: exact
    return ray.data.from_arrow(pa.table({
        "k_used": pa.array([n_kept], pa.int64()),
        "kth_hash": pa.array([int(kept[-1]) if n_kept else 0],
                             pa.int64()),
        "distinct_estimate": pa.array([estimate], pa.int64()),
    }))


def q_sketch_distinct_texts(sf_dir: str) -> ray.data.Dataset:
    """KMV estimate of the number of distinct document texts — the
    pre-dedup cardinality probe (k=64 < true cardinality at every test
    sf, so the ESTIMATION path is exercised, not the exact fallback)."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["text"])
    return kmv_distinct(ds, "text", k=64)


SKETCH_TEXTS_SQL = """
WITH kmv_h AS (
  SELECT DISTINCT
      ('0x' || substr(md5(text), 1, 15))::BIGINT AS v
  FROM documents),
kmv_k AS (SELECT v FROM kmv_h ORDER BY v LIMIT 64)
SELECT CAST(count(*) AS BIGINT) AS k_used,
       CAST(coalesce(max(v), 0) AS BIGINT) AS kth_hash,
       CAST(CASE WHEN count(*) = 64
                 THEN CAST(count(*) - 1 AS HUGEINT)
                      * 1152921504606846976 // max(v)
                 ELSE count(*) END AS BIGINT) AS distinct_estimate
FROM kmv_k
"""

REGISTRY: dict = {
    "sketch_distinct_texts": (q_sketch_distinct_texts, SKETCH_TEXTS_SQL),
}
