"""Seeded same-as-graph fixture generator for the connected-components
scale protocol (NOTES.md; scripts/cc_protocol.py) and the bench's
``cc_components`` entry. Heavy-tailed degree (a few hubs), many
components — the shape of a node-canonicalization ("same as") edge
table in a merged KG."""

from __future__ import annotations

import numpy as np


def random_edges(n_edges: int, seed: int = 7) -> list[tuple[str, str]]:
    """~n_edges/2 nodes, mix of local chain-ish edges and global
    shortcuts."""
    rng = np.random.RandomState(seed)
    n_nodes = n_edges // 2
    a = rng.randint(0, n_nodes, n_edges)
    off = rng.geometric(1 / 8.0, n_edges)
    b = np.where(rng.rand(n_edges) < 0.8,
                 np.minimum(a + off, n_nodes - 1),
                 rng.randint(0, n_nodes, n_edges))
    return [(f"N:{x:08d}", f"N:{y:08d}") for x, y in zip(a, b)]


def write_edges_parquet(path: str, n_edges: int, seed: int = 7) -> None:
    """Materialize the fixture as parquet (row-group sized for ~32-way
    parallel reads) so bench generation is cached and untimed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    edges = random_edges(n_edges, seed)
    t = pa.table({"a": pa.array([e[0] for e in edges]),
                  "b": pa.array([e[1] for e in edges])})
    pq.write_table(t, path, row_group_size=max(1024, n_edges // 32))
