"""Distributed PageRank in exact int64 fixed-point arithmetic.

Graph-centrality analytics over the constructed KG — the natural next
aggregate after degree counts (pipelines/kg_queries A2): which entities
does the mention graph concentrate authority on? The reference has no
graph-analytic op at all (its closest is the merge-time networkx stats
dump, which materializes the whole graph in one driver heap); this is
the partition-parallel construction.

Arithmetic is INTEGER throughout — ranks are int64 micro-units
(``scale`` per unit), per-edge shares use floor division, and the
damping step is ``teleport + (85 * in_sum) // 100``. Integer addition
is associative and commutative EXACTLY, so the result is bit-identical
under any partitioning, block order, or parallelism — which is what
makes a value-hash oracle possible for an iterative distributed
algorithm (DuckDB reproduces the same integers; float PageRank would
diverge in the last ulp per summation order). Overflow bound:
``85 * max_indegree * scale`` must stay below 2^63 — at the default
``scale=10^6`` that allows in-degrees up to ~10^11.

Dangling mass (nodes with no out-edges) is NOT redistributed — the
classic "leaked mass" variant; ranks are therefore comparable within a
run, which is all a centrality ranking needs, and both sides of the
oracle implement the identical recurrence.

Dataflow per iteration (all exchanges are the repo's standard
hash-bucket tagged merges — ``Dataset.join`` drops schema on empty
partitions and ``groupby().aggregate`` pays per-group Python at node
cardinality, see stages/cluster.py):

    edges are bucketed by hash(src) ONCE and pinned with their
    out-degree attached (the src-side join is paid once, not per
    iteration);
    A: ranks route to hash(id) buckets; per bucket each edge emits
       share = rank[src] // outdeg[src], pre-summed per dst before the
       next exchange (combiner);
    B: shares route to hash(dst) buckets against the pinned node
       universe; new rank = teleport + (85 * sum) // 100 (nodes with
       no in-edges keep the bare teleport term).

Skew: a hub dst (entity mentioned by millions of pages) is pre-summed
per source block in exchange A, so exchange B sees at most one row per
(hub, upstream block) — bounded by block count, not in-degree.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kg_covid_19_ray.functions.partitions import derive_num_partitions

DAMP_NUM = 85
DAMP_DEN = 100


def _bucket_of(values: pd.Series, num_buckets: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(values, index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _edges_with_outdeg(edges: ray.data.Dataset, src: str, dst: str, *,
                       num_buckets: int) -> ray.data.Dataset:
    """-> pinned Dataset(src, dst, d, __bucket=hash(src) % B): each
    edge carries its source's out-degree and already lives in its
    src-hash bucket (exchange A reuses the column, so the src side is
    shuffled once for the whole run).

    One exchange does everything: because ALL edges of a src land in
    its bucket, the (src, dst) dedup and the out-degree count are both
    globally exact computed in-bucket — no separate distinct() pass,
    no degree-row side channel."""

    def route(batch: pa.Table) -> pa.Table:
        # Arrow C-level cast, NOT pandas astype(str): the latter runs a
        # Python str() per row (measured 90x slower on int columns and
        # 73ms per 200k rows even on strings, vs 0.8ms for the cast)
        s = pc.cast(batch[src].combine_chunks(), pa.string())
        d = pc.cast(batch[dst].combine_chunks(), pa.string())
        return pa.table({
            "src": s,
            "dst": d,
            "__bucket": pa.array(_bucket_of(s.to_pandas(), num_buckets)),
        })

    def attach(g: pa.Table) -> pa.Table:
        df = g.to_pandas().drop_duplicates(["src", "dst"])
        d = df.groupby("src", sort=False)["dst"].transform("size")
        return pa.table({
            "src": pa.array(df["src"], pa.string()),
            "dst": pa.array(df["dst"], pa.string()),
            "d": pa.array(d.to_numpy(np.int64)),
            "__bucket": pa.array(df["__bucket"].to_numpy(np.int64)),
        })

    return edges.map_batches(route, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(attach, batch_format="pyarrow") \
        .materialize()


def _node_universe(edges_b: ray.data.Dataset, *,
                   num_buckets: int) -> ray.data.Dataset:
    """-> pinned Dataset(id, __bucket=hash(id) % B): every distinct
    endpoint, bucketed for exchange B."""

    def endpoints(batch: pa.Table) -> pa.Table:
        ids = pd.concat([batch["src"].to_pandas(),
                         batch["dst"].to_pandas()]).drop_duplicates()
        return pa.table({
            "id": pa.array(ids, pa.string()),
            "__bucket": pa.array(_bucket_of(ids, num_buckets)),
        })

    def dedup(g: pa.Table) -> pa.Table:
        df = g.to_pandas().drop_duplicates("id")
        return pa.table({
            "id": pa.array(df["id"], pa.string()),
            "__bucket": pa.array(df["__bucket"].to_numpy(np.int64)),
        })

    return edges_b.map_batches(endpoints, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(dedup, batch_format="pyarrow") \
        .materialize()


def pagerank_fixed_point(
    edges: ray.data.Dataset,
    src: str = "subject",
    dst: str = "object",
    *,
    iterations: int = 3,
    scale: int = 1_000_000,
    num_partitions: int | None = None,
    plan: str | None = None,
) -> ray.data.Dataset:
    """-> Dataset(id:string, rank_fp:int64) after ``iterations`` exact
    integer PageRank steps from a uniform ``scale`` start.

    Two physical plans, bit-identical by integer associativity (pinned
    by test_actor_plan_bit_identical), routed by ``plan`` /
    ``KG_RAY_PR_PLAN``:

    - ``"actor"`` (default): bucket-pinned actors
      (stages/pagerank_actors.py) — edges ship ONCE, iterations move
      only combiner-summed contributions. Measured 4.5-4.8x the
      dataset plan (1M edges: 4.8s vs 21.6s; 4M: 9.2s vs 44.4s,
      32 CPUs, same host/session conditions). Requires the deduped
      edge table to fit aggregate actor HEAP (edges/B per actor).
    - ``"dataset"``: the bucketed-exchange plan below — pure Dataset
      API; the pinned edge table re-enters a ``groupby(__bucket)``
      exchange every iteration (2 exchanges/iteration), but all state
      lives in the object store and can SPILL — route here when the
      edge table exceeds cluster heap.

    Duplicate input edge rows are deduplicated for free inside the
    src-bucket setup exchange (they would otherwise double-count
    shares).

    Bucket count: the setup exchange runs once at the standard
    cluster-width count; the ITERATION bucket count is derived from a
    per-bucket row budget (``KG_RAY_PR_ROWS_PER_BUCKET``, default 1M)
    over the deduplicated edge count, floored at cluster CPUs — each
    of the 2 x ``iterations`` exchanges pays per-task overhead per
    bucket, so over-bucketing small graphs is a measured 2x wall
    (64 -> 35.5s at 128 buckets vs 17.0s at 32, 1M edges / 32 CPUs)
    while the budget keeps per-kernel memory bounded at scale."""
    import os

    from kg_covid_19_ray.functions.partitions import _cluster_cpus

    if (plan or os.environ.get("KG_RAY_PR_PLAN", "actor")) == "actor":
        from kg_covid_19_ray.stages.pagerank_actors import \
            pagerank_actor_plan
        return pagerank_actor_plan(edges, src, dst,
                                   iterations=iterations, scale=scale)

    setup_buckets = max(4, num_partitions if num_partitions is not None
                        else derive_num_partitions())
    edges_b = _edges_with_outdeg(edges.select_columns([src, dst]),
                                 src, dst, num_buckets=setup_buckets)
    if num_partitions is None:
        budget = int(os.environ.get("KG_RAY_PR_ROWS_PER_BUCKET",
                                    "1000000"))
        n_edges = edges_b.count()  # materialized -> metadata-only
        num_buckets = max(4, min(_cluster_cpus(),
                                 max(1, n_edges // 10_000)),
                          (n_edges + budget - 1) // budget)
    else:
        num_buckets = max(4, num_partitions)
    # when iteration buckets differ from setup buckets, tag_edges
    # recomputes __bucket on the fly (fused into the lazy exchange-A
    # plan — ~10ms per block, cheaper than a rebucket materialize pass)
    rebucket_edges = num_buckets != setup_buckets
    nodes_b = _node_universe(edges_b, num_buckets=num_buckets)
    teleport = (scale * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN

    def init_ranks(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "r", pa.array(np.full(batch.num_rows, scale, np.int64)))

    # ranks live in the same (id-hash) buckets as the node universe
    ranks = nodes_b.map_batches(init_ranks, batch_format="pyarrow") \
        .materialize()

    # kind tags are int8 constants, dst padding is pa.nulls: building
    # ["e"] * n / [None] * n Python lists costs ~45ms per 1M rows PER
    # ITERATION vs ~1ms for the vectorized forms
    KIND_E, KIND_R, KIND_C, KIND_N = 0, 1, 2, 3

    def tag_edges(batch: pa.Table) -> pa.Table:
        bucket = (pa.array(_bucket_of(batch["src"].to_pandas(),
                                      num_buckets))
                  if rebucket_edges else batch["__bucket"])
        return pa.table({
            "k": batch["src"],
            "dst": batch["dst"],
            "v": batch["d"],
            "kind": pa.array(
                np.full(batch.num_rows, KIND_E, np.int8)),
            "__bucket": bucket,
        })

    def tag_ranks(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": batch["id"],
            "dst": pa.nulls(batch.num_rows, pa.string()),
            "v": batch["r"],
            "kind": pa.array(
                np.full(batch.num_rows, KIND_R, np.int8)),
            "__bucket": batch["__bucket"],
        })

    def shares(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        e = df[df["kind"] == KIND_E]
        r = df[df["kind"] == KIND_R].drop_duplicates("k") \
            .set_index("k")["v"]
        rank = e["k"].map(r).to_numpy(np.int64)
        share = rank // e["v"].to_numpy(np.int64)
        out = pd.DataFrame({"dst": e["dst"].to_numpy(), "s": share})
        # combiner: one row per dst per bucket into exchange B
        out = out.groupby("dst", sort=False)["s"].sum().reset_index()
        return pa.table({
            "k": pa.array(out["dst"], pa.string()),
            "v": pa.array(out["s"].to_numpy(np.int64)),
            "kind": pa.array(np.full(len(out), KIND_C, np.int8)),
            "__bucket": pa.array(_bucket_of(out["dst"], num_buckets)),
        })

    def tag_nodes(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": batch["id"],
            "v": pa.array(np.zeros(batch.num_rows, np.int64)),
            "kind": pa.array(
                np.full(batch.num_rows, KIND_N, np.int8)),
            "__bucket": batch["__bucket"],
        })

    def damp(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        n = df[df["kind"] == KIND_N]
        c = df[df["kind"] == KIND_C].groupby("k", sort=False)["v"].sum()
        # reindex with an int fill, NOT map+fillna: fillna promotes the
        # whole column to float64 whenever any node lacks contributions,
        # silently rounding sums above 2^53 and breaking the exact-int64
        # bit-identity the value-hash oracle relies on
        s = c.reindex(n["k"], fill_value=0).to_numpy(np.int64)
        r_new = teleport + (DAMP_NUM * s) // DAMP_DEN
        return pa.table({
            "id": pa.array(n["k"], pa.string()),
            "__bucket": pa.array(n["__bucket"].to_numpy(np.int64)),
            "r": pa.array(r_new),
        })

    for _ in range(iterations):
        # pin between the two exchanges: a lazy plan with two chained
        # all-to-all sorts serializes them (NOTES.md, cluster.py mid-
        # round materialize) — pinned, A and B each stream at full width
        contribs = edges_b.map_batches(tag_edges, batch_format="pyarrow") \
            .union(ranks.map_batches(tag_ranks, batch_format="pyarrow")) \
            .groupby("__bucket") \
            .map_groups(shares, batch_format="pyarrow").materialize()
        # iterative loop: pin each state (cluster.py lineage note).
        # repartition before the pin: each sort exchange emits as many
        # blocks as it was fed, so without this the block count grows
        # by ~2x num_buckets per iteration and exchange cost doubles
        # each round (measured: 4.8s -> 9.6s -> 19.2s per iteration)
        ranks = contribs.union(
            nodes_b.map_batches(tag_nodes, batch_format="pyarrow")) \
            .groupby("__bucket") \
            .map_groups(damp, batch_format="pyarrow") \
            .repartition(num_buckets).materialize()

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({"id": batch["id"], "rank_fp": batch["r"]})

    return ranks.map_batches(finalize, batch_format="pyarrow")
