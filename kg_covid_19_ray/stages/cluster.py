"""Same-as clustering: distributed connected components (north star).

Computes, for every node that appears in a same-as edge table, the
lexicographic-min member of its connected component (the canonical id).
This replaces the reference's merge-time ``remap_node_identifier``
(merge.yaml:42-47) with a scalable construction: iterative min-label
propagation — the dataflow formulation of distributed union-find
(pointer-jumping), converging in O(log(diameter)) rounds.

Per round (all Ray Data ops, hash-partitioned):
    1. candidate labels for x = labels of every neighbor of x (hash join
       of the undirected edge list against the current label table);
    2. new label(x) = min(current label, candidates)  (groupby-min);
    3. stop when no label changed (cheap order-insensitive fingerprint:
       global sum of row hashes).

Checkpointing between rounds (SURVEY §7.4 "union-find at scale") is the
caller's choice via ``state.checkpoint``; rounds are bounded.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min


def _undirected(edges: ray.data.Dataset, src: str, dst: str) -> ray.data.Dataset:
    def both(batch: pa.Table) -> pa.Table:
        a = batch[src].combine_chunks() if isinstance(batch[src], pa.ChunkedArray) else batch[src]
        b = batch[dst].combine_chunks() if isinstance(batch[dst], pa.ChunkedArray) else batch[dst]
        return pa.table({
            "node": pa.concat_arrays([a, b]),
            "nbr": pa.concat_arrays([b, a]),
        })
    return edges.map_batches(both, batch_format="pyarrow")


def _fingerprint(labels: ray.data.Dataset) -> int:
    """Order-insensitive int fingerprint of (member,label) rows.

    Vectorized: one ``hash_pandas_object`` pass per block (deterministic
    across processes) wrapped into a uint64 sum — this runs INSIDE the
    convergence loop, so no per-row Python. The per-block partials are
    tiny (one row each) and summed driver-side in arbitrary precision
    to dodge int64 overflow."""
    import numpy as np
    import pandas as pd

    def h(batch: pa.Table) -> pa.Table:
        df = batch.select(["member", "label"]).to_pandas()
        hashes = pd.util.hash_pandas_object(df, index=False).to_numpy()
        total = int(hashes.sum(dtype=np.uint64))
        return pa.table({"h": pa.array([total], pa.uint64())})

    parts = labels.map_batches(h, batch_format="pyarrow").take_all()
    return sum(r["h"] for r in parts) & 0xFFFFFFFFFFFFFFFF


def _local_labels(und: ray.data.Dataset) -> ray.data.Dataset:
    """Per-block union-find contraction: (member, label) rows with
    ``label`` = the block-local lexicographic-min member (union-by-min
    + path compression). A member seen in several blocks carries
    several labels; the global groupby-min reconciles.

    Why: whole intra-block paths collapse BEFORE the first global
    round, so the O(log diameter) loop starts from the block-quotient
    graph — typically several rounds fewer, each round being 3 global
    exchanges. The sequential dict loop here runs over the SAME-AS edge
    table (orders of magnitude smaller than the corpus), one block at a
    time; union-find has no vectorized form, and this is the standard
    local-contraction step of distributed CC."""
    def contract(batch: pa.Table) -> pa.Table:
        a = batch["node"].to_pylist()
        b = batch["nbr"].to_pylist()
        parent: dict = {}

        def find(x):
            r = x
            while parent.setdefault(r, r) != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for x, y in zip(a, b):
            rx, ry = find(x), find(y)
            if rx == ry:
                continue
            if ry < rx:
                rx, ry = ry, rx
            parent[ry] = rx  # min member stays root
        members = list(parent.keys())
        return pa.table({
            "member": pa.array(members, pa.string()),
            "label": pa.array([find(m) for m in members], pa.string()),
        })

    return und.map_batches(contract, batch_format="pyarrow",
                           batch_size=None)


def _pointer_jump(labels: ray.data.Dataset, *,
                  num_buckets: int) -> ray.data.Dataset:
    """label(x) <- label(label(x)) for every row of (member, label).

    Emits each row into hash(label)'s bucket tagged ``kind=base`` and a
    parent copy into hash(member)'s bucket tagged ``kind=parent``, then
    merges within each bucket — a base row always finds its parent in
    its own bucket because both route by the same hashed value."""
    import numpy as np
    import pandas as pd

    def route(batch: pa.Table) -> pa.Table:
        df = batch.select(["member", "label"]).to_pandas()
        h_label = pd.util.hash_pandas_object(df["label"], index=False) \
            .to_numpy() % np.uint64(num_buckets)
        h_member = pd.util.hash_pandas_object(df["member"], index=False) \
            .to_numpy() % np.uint64(num_buckets)
        base = pa.table({
            "member": pa.array(df["member"], pa.string()),
            "label": pa.array(df["label"], pa.string()),
            "kind": pa.array(["base"] * len(df)),
            "__bucket": pa.array(h_label.astype(np.int64)),
        })
        parent = pa.table({
            "member": pa.array(df["member"], pa.string()),
            "label": pa.array(df["label"], pa.string()),
            "kind": pa.array(["parent"] * len(df)),
            "__bucket": pa.array(h_member.astype(np.int64)),
        })
        return pa.concat_tables([base, parent])

    def merge_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        base = df[df["kind"] == "base"]
        parent = df[df["kind"] == "parent"] \
            .rename(columns={"member": "label", "label": "label2"})
        out = base[["member", "label"]].merge(
            parent[["label", "label2"]], on="label", how="left")
        # a label is always a member; missing only if the parent row
        # landed in a different... it cannot: same hash of same value
        out["label"] = out["label2"].fillna(out["label"])
        return pa.table({
            "member": pa.array(out["member"], pa.string()),
            "label": pa.array(out["label"], pa.string()),
        })

    return labels.map_batches(route, batch_format="pyarrow") \
        .groupby("__bucket") \
        .map_groups(merge_bucket, batch_format="pyarrow")


def connected_components(
    edges: ray.data.Dataset,
    src: str = "a",
    dst: str = "b",
    *,
    num_partitions: int = 8,
    max_rounds: int = 30,
) -> ray.data.Dataset:
    """-> Dataset(member:string, canon:string), one row per distinct node.

    ``num_partitions`` sizes the hash joins/groupbys; set ~2-4x the
    cluster CPU count at scale. Hub components (one famous entity
    same-as'ed by millions) are benign here: min-label propagation's
    per-node state is one label, and the groupby-min combiner
    pre-aggregates within partitions before the exchange.
    """
    # The same-as edge/label tables are orders of magnitude smaller than
    # the corpus (only ids appearing in same-as assertions), so pinning
    # them per round is cheap — and REQUIRED: without materialize() each
    # round's Dataset would chain on the previous round's lazy lineage,
    # re-executing all prior rounds on every fingerprint (O(rounds^2))
    # and growing an unboundedly deep DAG.
    und = _undirected(edges, src, dst).materialize()

    # init: per-block union-find contraction reconciled by groupby-min —
    # distributed (no driver-side unique()) and already collapsed within
    # each block, which cuts global rounds.
    # repartition before pinning: the groupby inherits the block count
    # of the (many, tiny) per-block contraction outputs, and every later
    # round's exchange would carry that block count forward as task
    # overhead
    labels = _local_labels(und).groupby("member").aggregate(
        Min("label", alias_name="label")) \
        .repartition(num_partitions).materialize()

    prev_fp = None
    for _ in range(max_rounds):
        # neighbor labels: join undirected edges (node,nbr) with current
        # labels on nbr -> candidate label for node
        cand = und.join(
            labels.rename_columns({"member": "nbr"}),
            join_type="inner",
            num_partitions=num_partitions,
            on=("nbr",),
        ).select_columns(["node", "label"]).rename_columns({"node": "member"})
        merged = cand.union(labels)
        # materialize between the min-reduce and the jump: measured
        # FASTER than lazy chaining (58s vs 102s at the 100k-edge
        # validation) — the combined join+groupby+jump plan serializes
        # its two sort exchanges, while the pin lets each run wide
        labels = merged.groupby("member").aggregate(
            Min("label", alias_name="label")).materialize()
        # POINTER JUMPING: label <- label(label). Plain neighbor
        # propagation needs O(diameter) rounds — a 100-node same-as
        # chain would exhaust max_rounds and silently return wrong
        # components. Following the label table through itself halves
        # path lengths each round -> O(log diameter). Every label value
        # is itself a member, so the lookup is total.
        #
        # The jump is a BUCKETED merge, not Dataset.join: once a
        # component collapses, one label value dominates and a hash
        # join leaves most partitions empty — Ray's join loses the
        # schema on empty partitions (ArrowInvalid FieldRef). Routing
        # base rows by hash(label) and parent rows by hash(member)
        # into shared buckets and pandas-merging inside each bucket is
        # skew-proof: a hot label is ONE parent row per bucket.
        labels = _pointer_jump(labels,
                               num_buckets=num_partitions * 8).materialize()
        fp = _fingerprint(labels)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            f"rounds — raise max_rounds (graph diameter > 2^rounds)")
    return labels.rename_columns({"label": "canon"})


def canonical_map_from_components(labels: ray.data.Dataset) -> dict[str, str]:
    """Collect the (small) member->canon table to a broadcastable dict.

    The component table is orders of magnitude smaller than the corpus
    (only ids appearing in same-as assertions); it is the classic
    broadcast-small-side of SURVEY §2.4.
    """
    out: dict[str, str] = {}
    for batch in labels.iter_batches(batch_format="pyarrow"):
        for m, c in zip(batch["member"].to_pylist(), batch["canon"].to_pylist()):
            out[m] = c
    return out


def spanning_forest(edges: ray.data.Dataset,
                    src: str = "a", dst: str = "b", *,
                    num_partitions: int = 8,
                    fold_factor: int = 4) -> ray.data.Dataset:
    """-> Dataset(a, b): a subset of the input edges whose union
    preserves the connectivity of the full graph (a spanning forest of
    each component). The enabler for ensmallen-style
    connectivity-preserving holdouts (reference make_holdouts.py:59-77
    ``random_holdout``): edges NOT in the forest can move to a test
    split without disconnecting train.

    Shape: hierarchical cycle-pruning. Each fold repartitions the
    surviving edges into fewer blocks and drops, per block, every edge
    that closes a cycle within that block (local union-find over the
    block's edges in sorted order) — dropping a local cycle edge never
    changes connectivity, so the invariant "survivors preserve the
    input's connectivity" holds per fold. The final single-block pass
    leaves exactly one spanning forest: n_nodes - n_components edges
    (a count invariant of ANY forest, so the output size is
    deterministic even though Ray's repartition boundaries are not).
    The last fold holds one block of <= n_nodes - 1 surviving edges —
    the same O(|same-as nodes|) bound as the broadcast canonical map,
    orders of magnitude below the corpus."""
    import pyarrow.compute as pc

    def norm(batch: pa.Table) -> pa.Table:
        a, b = batch[src], batch[dst]
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        t = pa.table({"a": lo, "b": hi})
        return t.filter(pc.not_equal(t["a"], t["b"]))

    from kg_covid_19_ray.stages.dedup import distinct
    surviving = distinct(edges.map_batches(norm, batch_format="pyarrow"),
                         ["a", "b"])

    def local_forest(batch: pa.Table) -> pa.Table:
        # per-block union-find in (a, b) sorted order; sequential loop
        # over the (small) same-as edge table, as in _local_labels
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        order = sorted(range(len(a)), key=lambda i: (a[i], b[i]))
        parent: dict = {}

        def find(x):
            r = x
            while parent.setdefault(r, r) != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        keep_a, keep_b = [], []
        for i in order:
            ra, rb = find(a[i]), find(b[i])
            if ra == rb:
                continue  # closes a cycle in this block: redundant
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
            keep_a.append(a[i])
            keep_b.append(b[i])
        return pa.table({"a": pa.array(keep_a, pa.string()),
                         "b": pa.array(keep_b, pa.string())})

    blocks = max(1, num_partitions)
    while True:
        surviving = surviving.repartition(blocks).map_batches(
            local_forest, batch_format="pyarrow",
            batch_size=None).materialize()
        if blocks == 1:
            return surviving
        blocks = max(1, blocks // fold_factor)
