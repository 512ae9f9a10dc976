"""Per-stage run metrics (north-rule "lineage + metrics" companion to
state/checkpoint): row/batch counters for any point of a streaming
pipeline, plus derived dedup-hit counts.

The reference exposes no metrics at all (its per-record skip semantics
are silent ``continue`` branches); checkpoint manifests already record
per-partition rows for checkpointed stages. This module covers the
STREAMING stages between checkpoints: a ``metered(ds, "name")`` tap
counts rows/batches as blocks flow through, accumulated in ONE named
Ray actor per run — the legitimate shared-mutable-state case that the
Dataset API cannot express (SURVEY §2.10 guidance). Counting is
fire-and-forget (one tiny actor call per BLOCK, not per row), so the
tap adds no synchronization to the hot path; read ``snapshot()`` after
the consuming execution finishes.
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
    zero-copy); the count is one fire-and-forget actor call per block.
    """
    actor = metrics.actor

    def tap(batch: pa.Table) -> pa.Table:
        actor.add.remote(stage, batch.num_rows)
        return batch

    return ds.map_batches(tap, batch_format="pyarrow", batch_size=None)
