"""Exact dedup stages: first-wins and composite-key distinct (D1/D2/D3).

The reference dedups with in-process ``seen`` sets whose semantics depend
on file/line order (drug_central.py:102-131, scibite_cord.py:205-218,
string_ppi.py:185-243) — correct only single-threaded. Here every dedup
is a hash-partitioned ``groupby`` with an EXPLICIT deterministic order
key (SURVEY §2.9/§7.4): "first" = minimum of ``order_col``, which the
pipeline derives from stable row identity (e.g. ``doc_id*K + gaz_idx``),
so the result is identical at any parallelism.

Both dedups pre-reduce inside ``map_batches`` (a combiner) before the
shuffle, so the exchange moves at most one row per distinct key per
block — the difference between shipping 10^12 mention rows and shipping
the distinct entity table.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def _sorted_first_per_key(batch: pa.Table, key_cols: list[str],
                          order_col: str) -> pa.Table:
    """Within one Arrow table: keep the min-order row per key, stably."""
    if batch.num_rows == 0:
        return batch
    cols = list(batch.column_names)
    sort_keys = [(k, "ascending") for k in key_cols] + [(order_col, "ascending")]
    batch = batch.sort_by(sort_keys)
    agg = batch.group_by(key_cols, use_threads=False).aggregate(
        [(c, "first") for c in cols if c not in key_cols])
    renames = {f"{c}_first": c for c in cols if c not in key_cols}
    agg = agg.rename_columns([renames.get(c, c) for c in agg.column_names])
    return agg.select(cols)


def first_wins(ds: ray.data.Dataset, key_cols: list[str],
               order_col: str) -> ray.data.Dataset:
    """Deterministic first-wins dedup: per key keep the row with the
    smallest ``order_col``. Combiner per batch, then global groupby."""
    keys = list(key_cols)

    def combine(batch: pa.Table) -> pa.Table:
        return _sorted_first_per_key(batch, keys, order_col)

    pre = ds.map_batches(combine, batch_format="pyarrow")

    def reduce_group(batch: pa.Table) -> pa.Table:
        return _sorted_first_per_key(batch, keys, order_col)

    return pre.groupby(keys).map_groups(reduce_group, batch_format="pyarrow")


def distinct(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    """Exact distinct on a column subset (edge dedup D2: one edge per
    composite key). Pre-distinct per batch, then grouped head(1)."""
    keys = list(cols)

    def per_batch(batch: pa.Table) -> pa.Table:
        return batch.select(keys).group_by(keys, use_threads=False).aggregate([])

    pre = ds.map_batches(per_batch, batch_format="pyarrow")
    return pre.groupby(keys).map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow")
