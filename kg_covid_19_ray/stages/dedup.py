"""Exact dedup stages: first-wins and composite-key distinct (D1/D2/D3).

The reference dedups with in-process ``seen`` sets whose semantics depend
on file/line order (drug_central.py:102-131, scibite_cord.py:205-218,
string_ppi.py:185-243) — correct only single-threaded. Here every dedup
is a hash-partitioned reduce with an EXPLICIT deterministic order key
(SURVEY §2.9/§7.4): "first" = minimum of ``order_col``, so the result is
identical at any parallelism.

Two-phase shape, sized for high-cardinality keys:

1. COMBINE inside ``map_batches``: per-batch vectorized dedup (Arrow
   ``group_by``), so the shuffle moves at most one row per distinct key
   per block;
2. hash-BUCKET exchange: rows are routed by ``hash(key) % num_buckets``
   and each bucket is reduced with ONE vectorized Arrow call.
   ``groupby(key).map_groups`` would invoke Python once per group —
   O(distinct keys) interpreter calls; bucketing keeps the per-group
   work in C and the Python call count at ``num_buckets``.

Row hashes come from ``pandas.util.hash_pandas_object`` (deterministic,
process-independent — unlike builtin ``hash`` under PYTHONHASHSEED).
Skew: a hot key occupies one bucket but is pre-combined per block, so a
bucket sees at most one row per (key, upstream block) — bounded by block
count, not row count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

def resolve_num_buckets(num_buckets=None) -> int:
    """None -> cluster-width-derived count (2x CPUs, floor 4, cap 512
    via functions.partitions); an int passes through (tests pin it)."""
    if num_buckets is not None:
        return num_buckets
    from kg_covid_19_ray.functions.partitions import derive_num_partitions
    return derive_num_partitions()


def _row_bucket(batch: pa.Table, keys: list[str], num_buckets: int) -> pa.Array:
    df = batch.select(keys).to_pandas()
    h = pd.util.hash_pandas_object(df, index=False).to_numpy()
    return pa.array((h % np.uint64(num_buckets)).astype(np.int64))


def _sorted_first_per_key(batch: pa.Table, key_cols: list[str],
                          order_col: str) -> pa.Table:
    """Within one Arrow table: keep the min-order row per key (all in C)."""
    if batch.num_rows == 0:
        return batch
    cols = list(batch.column_names)
    value_cols = [c for c in cols if c not in key_cols]
    if value_cols == [order_col]:
        # fast path: no payload beyond the order key itself -> a hash
        # group-by min, skipping the full multi-key sort (the flagship
        # edge-dedup case: every output column is part of the key)
        agg = batch.group_by(key_cols, use_threads=False).aggregate(
            [(order_col, "min")])
        agg = agg.rename_columns(
            [order_col if c == f"{order_col}_min" else c
             for c in agg.column_names])
        return agg.select(cols)
    sort_keys = [(k, "ascending") for k in key_cols] + [(order_col, "ascending")]
    batch = batch.sort_by(sort_keys)
    agg = batch.group_by(key_cols, use_threads=False).aggregate(
        [(c, "first") for c in cols if c not in key_cols])
    renames = {f"{c}_first": c for c in cols if c not in key_cols}
    agg = agg.rename_columns([renames.get(c, c) for c in agg.column_names])
    return agg.select(cols)


def first_wins(ds: ray.data.Dataset, key_cols: list[str], order_col: str,
               *, num_buckets: int | None = None) -> ray.data.Dataset:
    """Deterministic first-wins dedup: per key keep the row with the
    smallest ``order_col``."""
    keys = list(key_cols)
    num_buckets = resolve_num_buckets(num_buckets)

    def combine(batch: pa.Table) -> pa.Table:
        batch = _sorted_first_per_key(batch, keys, order_col)
        return batch.append_column(
            "__bucket", _row_bucket(batch, keys, num_buckets))

    pre = ds.map_batches(combine, batch_format="pyarrow")

    def reduce_bucket(bucket: pa.Table) -> pa.Table:
        bucket = bucket.drop_columns(["__bucket"])
        return _sorted_first_per_key(bucket, keys, order_col)

    return pre.groupby("__bucket").map_groups(
        reduce_bucket, batch_format="pyarrow")


def distinct_within_blocks(ds: ray.data.Dataset,
                           cols: list[str]) -> ray.data.Dataset:
    """Shuffle-free distinct for keys that are CO-PARTITIONED with the
    block layout. Partitioning assumption (documented per SURVEY §2.10):
    all rows sharing a key live in the same block — true for
    (doc_id, term) mention pairs, which are emitted per page by the
    detector and never cross block boundaries. NOT valid for keys that
    repeat across blocks (use ``distinct``)."""
    keys = list(cols)

    def per_batch(batch: pa.Table) -> pa.Table:
        return batch.select(keys).group_by(
            keys, use_threads=False).aggregate([])

    return ds.map_batches(per_batch, batch_format="pyarrow")


def assert_blockwise_unique(ds: ray.data.Dataset, cols: list[str],
                            *, num_buckets: int | None = None
                            ) -> int:
    """Runtime guard for ``distinct_within_blocks``'s co-partitioning
    assumption: verifies no key appears in more than one block by
    comparing the blockwise-deduped row count against the true global
    distinct count (a shuffle of the already-narrow deduped keys —
    debug/validation cost, not a hot-path stage). Returns the distinct
    count; raises ``ValueError`` if the assumption is violated.
    """
    local = distinct_within_blocks(ds.select_columns(cols), cols)
    local_rows = local.count()
    global_rows = distinct(local, cols, num_buckets=num_buckets).count()
    if local_rows != global_rows:
        raise ValueError(
            f"co-partitioning violated for key {cols}: blockwise dedup "
            f"kept {local_rows} rows but only {global_rows} are globally "
            f"distinct — a key crosses block boundaries; use distinct()")
    return global_rows


def distinct(ds: ray.data.Dataset, cols: list[str],
             *, num_buckets: int | None = None) -> ray.data.Dataset:
    """Exact distinct on a column subset (edge dedup D2: one edge per
    composite key). Other columns are dropped."""
    keys = list(cols)
    num_buckets = resolve_num_buckets(num_buckets)

    def per_batch(batch: pa.Table) -> pa.Table:
        if batch.schema.metadata:
            # unhashable pandas metadata would defeat Ray's schema-dedup
            # fast path in the bucket exchange (zero-copy strip)
            batch = batch.replace_schema_metadata(None)
        batch = batch.select(keys).group_by(
            keys, use_threads=False).aggregate([])
        return batch.append_column(
            "__bucket", _row_bucket(batch, keys, num_buckets))

    pre = ds.map_batches(per_batch, batch_format="pyarrow")

    def reduce_bucket(bucket: pa.Table) -> pa.Table:
        return bucket.select(keys).group_by(
            keys, use_threads=False).aggregate([])

    return pre.groupby("__bucket").map_groups(
        reduce_bucket, batch_format="pyarrow")
