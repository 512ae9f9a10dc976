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


def _cluster_cpus() -> int:
    cpus = 0
    try:
        import ray
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    if cpus <= 0:
        cpus = os.cpu_count() or 8
    return cpus


def derive_join_partitions(*, floor: int = 4, cap: int = 512,
                           env: str = "KG_RAY_JOIN_PARTITIONS") -> int:
    """Partition count for a NATIVE hash-shuffle ``Dataset.join``.

    Ray's hash-shuffle operator reserves ~``min(num_partitions,
    cluster_cpus / 2)`` CPUs of aggregator ACTORS per join operator
    (hash_shuffle._get_aggregator_num_cpus_per_partition: ``min(1,
    (CPU/2)/P)`` per partition x ``ceil(P/A)`` partitions per
    aggregator). Two joins in one plan — the repo's standard
    candidate-verification pattern joins on doc_a then doc_b — can
    therefore reserve ALL session CPUs and starve the upstream map
    tasks that feed them: observed live as a full stall at
    num_partitions = 2 x cpus on a 32-CPU session. ``cpus // 4`` keeps
    two concurrent aggregator pools at <= half the CPUs with the other
    half free for map tasks (round 2's hardcoded 8 on a 32-CPU box was
    exactly this ratio, and healthy). Aggregators cap partition count
    per actor internally, so larger tables on big clusters still remap
    partitions -> aggregators without needing P above this."""
    v = os.environ.get(env) or os.environ.get("KG_RAY_NUM_PARTITIONS")
    if v:
        return max(1, int(v))
    return min(cap, max(floor, _cluster_cpus() // 4))


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
    return min(cap, max(floor, _cluster_cpus() * per_cpu))
