"""Arrow schema-metadata hygiene for shuffle-bearing pipelines.

Parquet files written via pandas (the driver's testdata, and any
``pa.Table.from_pandas`` conversion Ray performs for a
``batch_format="pandas"`` stage) carry a ``b'pandas'`` schema-metadata
entry whose nested dict is unhashable. Ray Data's
``unify_schemas`` / hash-shuffle aggregators try ``set(schemas)`` as a
dedup fast path (ray/data/_internal/arrow_ops/transform_pyarrow.py:181,
Ray 2.49) and fall back to a full per-bundle schema unification with a
logged ``Failed to hash the schemas`` warning whenever that metadata is
present — per-block overhead and log noise at every exchange.

The fix is to strip the metadata at the stage that EMITS it into a
shuffle: ``replace_schema_metadata(None)`` is a metadata-only, zero-copy
operation, and a ``map_batches`` of it fuses with the upstream operator.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def strip_schema_metadata(batch: pa.Table) -> pa.Table:
    """Zero-copy removal of all schema-level metadata (no-op when
    already clean)."""
    if batch.schema.metadata:
        return batch.replace_schema_metadata(None)
    return batch


def stripped(ds: ray.data.Dataset) -> ray.data.Dataset:
    """A fused, zero-copy stage that makes every downstream block's
    schema hashable. Insert after a parquet read or a pandas-format
    stage whose output feeds a native join / hash exchange."""
    return ds.map_batches(strip_schema_metadata, batch_format="pyarrow")


def _footer_schema(path: str) -> pa.Schema:
    """Schema from ONE parquet footer (metadata-only read, no data).
    For a directory, the first ``*.parquet`` file found (all shards of
    an engine-written dataset share a schema); non-parquet siblings
    (``_SUCCESS`` markers, fingerprint files) are ignored."""
    import glob
    import os

    import pyarrow.parquet as pq
    if os.path.isdir(path):
        hits = sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                                recursive=True))
        if not hits:
            raise FileNotFoundError(f"no *.parquet under {path}")
        path = hits[0]
    return pq.read_schema(path)


def read_parquet_clean(path: str, *, columns: list[str] | None = None,
                       **kwargs) -> ray.data.Dataset:
    """``ray.data.read_parquet`` with a metadata-FREE explicit schema,
    so even the read task's own block-splitting (ReadParquet ->
    SplitBlocks) sees hashable schemas — a post-read strip stage can't
    reach that far upstream. The schema comes from one footer read,
    projected to ``columns``."""
    full = _footer_schema(path)
    names = columns if columns is not None else full.names
    clean = pa.schema([full.field(c) for c in names]).remove_metadata()
    return ray.data.read_parquet(path, columns=columns, schema=clean,
                                 **kwargs)
