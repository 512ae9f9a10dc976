"""Scale-derived partition counts for shuffle-bearing operators.

Round-2 review flagged hardcoded ``num_partitions=4/8`` on native joins
and bucketed exchanges: correct at sf0.1, but a cap on join parallelism
at cluster scale. Every shuffle-bearing op now derives its partition
count from the Ray cluster's CPU total (the same source
``stages.mentions.detect_mentions`` uses for actor-pool sizing), with
an env override for experiments and tests.
"""

from __future__ import annotations

import os


def derive_num_partitions(*, per_cpu: int = 2, floor: int = 4,
                          cap: int = 512,
                          env: str = "KG_RAY_NUM_PARTITIONS") -> int:
    """Partition count for a hash exchange: ``per_cpu`` x cluster CPUs
    (2-4x CPUs keeps every core busy through stragglers without
    drowning the scheduler), floored for single-digit-CPU test
    sessions, capped so a huge cluster doesn't produce millions of
    tiny partitions for a small table. ``KG_RAY_NUM_PARTITIONS``
    overrides everything."""
    v = os.environ.get(env)
    if v:
        return max(1, int(v))
    cpus = 0
    try:
        import ray
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    if cpus <= 0:
        cpus = os.cpu_count() or 8
    return min(cap, max(floor, cpus * per_cpu))
