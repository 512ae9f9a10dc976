"""Per-stage run metrics (north-rule "lineage + metrics" companion to
state/checkpoint): row/batch counters for any point of a streaming
pipeline, plus derived dedup-hit counts.

The reference exposes no metrics at all (its per-record skip semantics
are silent ``continue`` branches); checkpoint manifests already record
per-partition rows for checkpointed stages. This module covers the
STREAMING stages between checkpoints: a ``metered(ds, "name")`` tap
counts rows/batches as blocks flow through, accumulated in ONE named
Ray actor per run — the legitimate shared-mutable-state case that the
Dataset API cannot express (SURVEY §2.10 guidance). Each tap awaits
the actor's ack for its block (one tiny round-trip per BLOCK, not per
row — negligible against block-sized work), so by the time the
consuming execution returns every add has been applied and
``snapshot()`` is exact; fire-and-forget adds could still be in flight
at snapshot time (actor message ordering is only per-sender).

Counters accumulate PER EXECUTION: re-executing a tapped (lazy)
dataset runs the tap again and double-counts — ``reset()`` between
executions, or consume the dataset once.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data


@ray.remote(num_cpus=0)
class _MetricsActor:
    def __init__(self):
        self._c: dict[str, dict[str, int]] = {}

    def add(self, stage: str, rows: int, batches: int = 1) -> None:
        c = self._c.setdefault(stage, {"rows": 0, "batches": 0})
        c["rows"] += rows
        c["batches"] += batches

    def snapshot(self) -> dict[str, dict[str, int]]:
        return {k: dict(v) for k, v in self._c.items()}

    def reset(self) -> None:
        self._c.clear()


class Metrics:
    """Handle on the per-run metrics actor (created on first use,
    shared by name so every worker taps the same accumulator)."""

    def __init__(self, run_id: str = "default"):
        self.run_id = run_id
        self.actor = _MetricsActor.options(
            name=f"kg_ray_metrics_{run_id}", get_if_exists=True).remote()

    def snapshot(self) -> dict[str, dict[str, int]]:
        return ray.get(self.actor.snapshot.remote())

    def reset(self) -> None:
        ray.get(self.actor.reset.remote())

    def dedup_hits(self, stage: str) -> int:
        """rows dropped between ``<stage>.in`` and ``<stage>.out``
        taps — the dedup-hit counter."""
        snap = self.snapshot()
        return snap.get(f"{stage}.in", {}).get("rows", 0) \
            - snap.get(f"{stage}.out", {}).get("rows", 0)


def metered(ds: ray.data.Dataset, stage: str,
            metrics: Metrics) -> ray.data.Dataset:
    """Identity tap: counts rows/batches flowing through ``stage``.
    Blocks pass through unchanged (entire-block batches, pyarrow
    zero-copy); the count is one acked actor call per block — the ack
    is the flush barrier that makes a post-execution ``snapshot()``
    exact (a fire-and-forget add from another worker can still be
    queued when the driver reads the actor). Counts accumulate per
    execution of the tapped dataset; ``reset()`` between executions.
    """
    actor = metrics.actor

    def tap(batch: pa.Table) -> pa.Table:
        ray.get(actor.add.remote(stage, batch.num_rows))
        return batch

    return ds.map_batches(tap, batch_format="pyarrow", batch_size=None)
