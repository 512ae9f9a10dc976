"""Iterative k-core peeling: graph cleaning by degree pruning.

The standard web/KG-graph denoiser: repeatedly drop nodes of degree
< k — what survives is the densely-connected core (spam pages, stub
entities and crawl fringe fall off first). The true k-core is the
fixpoint; this operator is DEFINED as exactly ``rounds`` peel
iterations, which makes it deterministic whether or not the fixpoint
was reached — each extra round only tightens the superset, and pinning
the round count is what lets an iterative algorithm carry an unrolled
value-hash SQL oracle (same move as pagerank's fixed iteration count).

Per round, over the surviving edge set:
    1. degree per node — one bucketed count exchange;
    2. drop edges with either endpoint's degree < k — one bucketed
       semi-join per endpoint side against the alive-node table.

Skew: a hub node is one (id, degree) row per round; the per-endpoint
filters route edges by that endpoint's hash, so a hub's edges share a
bucket but are filtered by one vectorized isin — no per-row Python.
Output is the surviving NODE set (ids with degree >= k in the final
surviving edge set).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from kg_covid_19_ray.functions.partitions import derive_num_partitions


def _bucket_of(values: pd.Series, num_buckets: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(values, index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _degrees(pairs: ray.data.Dataset, *,
             num_buckets: int) -> ray.data.Dataset:
    """(lo, hi) edge table -> (id, d, __bucket=hash(id)) degree table."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "lo" not in batch.column_names:
            return pa.table({"id": pa.array([], pa.string()),
                             "d": pa.array([], pa.int64()),
                             "__bucket": pa.array([], pa.int64())})
        ids = pd.concat([batch["lo"].to_pandas(),
                         batch["hi"].to_pandas()])
        cnt = ids.value_counts()
        return pa.table({
            "id": pa.array(cnt.index, pa.string()),
            "d": pa.array(cnt.to_numpy(np.int64)),
            "__bucket": pa.array(_bucket_of(
                pd.Series(cnt.index), num_buckets)),
        })

    def reduce_(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "id" not in g.column_names:
            # empty blocks lose their schema in Ray groupby (cluster.py
            # note) — emit the explicit empty degree schema
            return pa.table({"id": pa.array([], pa.string()),
                             "d": pa.array([], pa.int64()),
                             "__bucket": pa.array([], pa.int64())})
        df = g.to_pandas().groupby("id", sort=False) \
            .agg(d=("d", "sum"), __bucket=("__bucket", "first")) \
            .reset_index()
        return pa.table({
            "id": pa.array(df["id"], pa.string()),
            "d": pa.array(df["d"].to_numpy(np.int64)),
            "__bucket": pa.array(df["__bucket"].to_numpy(np.int64)),
        })

    return pairs.map_batches(partial, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(reduce_, batch_format="pyarrow")


def _filter_endpoint(pairs: ray.data.Dataset, col: str, other: str,
                     alive: ray.data.Dataset, *,
                     num_buckets: int) -> ray.data.Dataset:
    """Keep edge rows whose ``col`` endpoint appears in ``alive`` —
    bucketed semi-join (route both sides by hash(endpoint id))."""

    def route_edges(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or col not in batch.column_names:
            return pa.table({"k": pa.array([], pa.string()),
                             "o": pa.array([], pa.string()),
                             "kind": pa.array([], pa.string()),
                             "__bucket": pa.array([], pa.int64())})
        df = batch.to_pandas()
        return pa.table({
            "k": pa.array(df[col], pa.string()),
            "o": pa.array(df[other], pa.string()),
            "kind": pa.array(["e"] * len(df), pa.string()),
            "__bucket": pa.array(_bucket_of(df[col], num_buckets)),
        })

    def route_alive(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "id" not in batch.column_names:
            return pa.table({"k": pa.array([], pa.string()),
                             "o": pa.array([], pa.string()),
                             "kind": pa.array([], pa.string()),
                             "__bucket": pa.array([], pa.int64())})
        df = batch.to_pandas()
        return pa.table({
            "k": pa.array(df["id"], pa.string()),
            "o": pa.array([None] * len(df), pa.string()),
            "kind": pa.array(["a"] * len(df), pa.string()),
            "__bucket": pa.array(df["__bucket"].to_numpy(np.int64)),
        })

    def keep(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "kind" not in g.column_names:
            return pa.table({col: pa.array([], pa.string()),
                             other: pa.array([], pa.string())})
        df = g.to_pandas()
        e = df[df["kind"] == "e"]
        ok = e["k"].isin(df.loc[df["kind"] == "a", "k"])
        kept = e[ok]
        return pa.table({
            col: pa.array(kept["k"], pa.string()),
            other: pa.array(kept["o"], pa.string()),
        })

    return pairs.map_batches(route_edges, batch_format="pyarrow") \
        .union(alive.map_batches(route_alive, batch_format="pyarrow")) \
        .groupby("__bucket").map_groups(keep, batch_format="pyarrow")


def kcore_nodes(
    edges: ray.data.Dataset,
    src: str = "subject",
    dst: str = "object",
    *,
    k: int = 2,
    rounds: int = 3,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """-> Dataset(id:string): nodes surviving ``rounds`` k-core peel
    iterations of the undirected simple graph (the true k-core once the
    peel has converged; otherwise a deterministic superset that each
    extra round tightens)."""
    import pyarrow.compute as pc

    if num_partitions is None:
        num_partitions = derive_num_partitions()
    num_buckets = max(4, num_partitions)

    from kg_covid_19_ray.stages.dedup import distinct

    def norm(batch: pa.Table) -> pa.Table:
        a = pc.cast(batch[src], pa.string())
        b = pc.cast(batch[dst], pa.string())
        t = pa.table({"lo": pc.min_element_wise(a, b),
                      "hi": pc.max_element_wise(a, b)})
        return t.filter(pc.not_equal(t["lo"], t["hi"]))

    pairs = distinct(edges.map_batches(norm, batch_format="pyarrow"),
                     ["lo", "hi"], num_buckets=num_buckets).materialize()

    deg = None
    for _ in range(rounds):
        deg = _degrees(pairs, num_buckets=num_buckets).materialize()
        alive = deg.filter(expr=f"d >= {k}")
        pairs = _filter_endpoint(pairs, "lo", "hi", alive,
                                 num_buckets=num_buckets)
        pairs = _filter_endpoint(pairs, "hi", "lo", alive,
                                 num_buckets=num_buckets) \
            .repartition(num_buckets).materialize()

    final_deg = _degrees(pairs, num_buckets=num_buckets)

    def out(batch: pa.Table) -> pa.Table:
        # in-table filter + project with an explicit empty schema:
        # expr-filter output blocks can arrive schema-less once the
        # peel empties the graph
        if batch.num_rows == 0 or "id" not in batch.column_names:
            return pa.table({"id": pa.array([], pa.string())})
        keep = pc.greater_equal(batch["d"], k)
        return pa.table({"id": batch.filter(keep)["id"]})

    res = final_deg.map_batches(out, batch_format="pyarrow").materialize()
    if res.count() == 0:
        # a fully-peeled graph can leave ZERO blocks (not just empty
        # ones), which would surface downstream as a schema-less
        # dataset; return an explicit empty node table instead
        return ray.data.from_arrow(
            pa.table({"id": pa.array([], pa.string())}))
    return res
