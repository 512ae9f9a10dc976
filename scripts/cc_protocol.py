"""Connected-components scale-validation protocol (NOTES.md).

Generates a seeded random same-as graph, runs
``stages.cluster.connected_components`` at the session CPU count, and
validates EVERY row against a single-process union-find oracle.

    python scripts/cc_protocol.py [n_edges] [num_cpus]

Round-2 baseline (min-label propagation + pointer jumping):
100k edges = 52s at 16 cpus; 1M edges = 325.6s at 32 cpus.
Round-3 target (quotient-graph contraction): >=3x at the 1M protocol.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import ray
import ray.data


from kg_covid_19_ray.sources.graphgen import random_edges  # noqa: E402


def union_find_oracle(edges):
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    return {m: find(m) for m in parent}


def main():
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    from kg_covid_19_ray.stages.cluster import connected_components

    edges = random_edges(n_edges)
    ds = ray.data.from_items([{"a": a, "b": b} for a, b in edges]) \
        .repartition(max(4, num_cpus)).materialize()

    t0 = time.perf_counter()
    out = connected_components(ds).to_pandas()
    wall = time.perf_counter() - t0

    oracle = union_find_oracle(edges)
    got = dict(zip(out["member"], out["canon"]))
    mismatches = sum(1 for m, c in oracle.items() if got.get(m) != c)
    extra = len(got) - len(oracle)
    n_comp = out["canon"].nunique()
    print(f"edges={n_edges} nodes={len(oracle)} components={n_comp} "
          f"cpus={num_cpus} wall={wall:.1f}s "
          f"mismatches={mismatches} extra_members={extra}")
    assert mismatches == 0 and extra == 0, "VALIDATION FAILED"
    ray.shutdown()


if __name__ == "__main__":
    main()
