"""Deterministic large-event-stream generator for scale benchmarks:
expands the driver's events table by a replica factor so the windowed
operators (sessionization, sliding count, as-of join) can be exercised
at 10^7+ events (round-4 VERDICT item 1's ``events_big`` evidence that
the derived bucket count holds at scale). No external data; everything
derives from the seeded sf tables, mirroring sources/docgen.

Per replica ``r`` the base table is re-emitted with

- ``event_id``  -> ``r * n + event_id``      (globally unique),
- ``user_id``   -> ``r * user_span + user_id`` (disjoint user
  populations per replica, so the per-user kernels see ``replicas`` x
  more users — the dimension that actually grows in a bigger crawl —
  while each user's event stream, and therefore every session/window
  ground truth, is identical to the base table's),
- ``ts`` / ``event_type`` / ``value`` / ``props`` unchanged.

Replication is one vectorized pyarrow rewrite per replica task; the
caller caches the output directory on disk.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data


def write_events_parquet(sf_dir: str, out_dir: str, *,
                         replicas: int) -> int:
    """Expand ``{sf_dir}/events.parquet`` by ``replicas`` into
    ``{out_dir}/events.parquet``; returns total rows. One Ray task per
    replica (parallel, deterministic, vectorized)."""
    base = pq.read_table(f"{sf_dir}/events.parquet")
    # strip pandas schema metadata: it is unhashable and defeats Ray's
    # block-schema dedup fast path in every downstream shuffle
    base = base.replace_schema_metadata(None)
    n = base.num_rows
    user_span = int(pc.max(base["user_id"]).as_py()) + 1
    base_ref = ray.put(base)

    def one_replica(batch: pa.Table) -> pa.Table:
        t: pa.Table = ray.get(base_ref)
        out = []
        for r in batch["id"].to_pylist():
            shifted = t.set_column(
                t.schema.get_field_index("event_id"), "event_id",
                pc.add(t["event_id"], pa.scalar(r * n, pa.int64())))
            shifted = shifted.set_column(
                shifted.schema.get_field_index("user_id"), "user_id",
                pc.add(t["user_id"], pa.scalar(r * user_span, pa.int64())))
            out.append(shifted)
        return pa.concat_tables(out)

    ray.data.range(replicas).map_batches(
        one_replica, batch_format="pyarrow", batch_size=1,
    ).write_parquet(f"{out_dir}/events.parquet")
    return replicas * n
