"""Same-as clustering: distributed connected components (north star).

Computes, for every node that appears in a same-as edge table, the
lexicographic-min member of its connected component (the canonical id).
This replaces the reference's merge-time ``remap_node_identifier``
(merge.yaml:42-47) with a scalable construction: QUOTIENT-GRAPH
CONTRACTION (distributed union-find by repeated local contraction):

    per level:
      1. per-block union-find over the current edge blocks ->
         partial labels (member -> block-local min root), reconciled
         across blocks by a bucketed group-by-min;
      2. relabel both edge endpoints through the partial labels
         (two bucketed substitutions), drop self-loops, distinct —
         the edge table SHRINKS GEOMETRICALLY (every block-local
         structure collapses to one node per local component);
      3. recurse on the contracted edges in fewer blocks, until no
         edge survives;
    then compose the per-level relabel maps top-down (one bucketed
    substitution per level) to get member -> global-min canonical id.

vs the previous min-label-propagation loop: each propagation round
re-joined the FULL edge table against the full label table and paid a
full groupby + pointer-jump + fingerprint even when almost nothing
changed. Contraction touches the full tables once per LEVEL, and the
per-level cost is proportional to the SURVIVING edge count — the
geometric sum is ~2x the first level instead of rounds x full price
(round-2 verdict item 1: the active-set rewrite).

Correctness: the per-level map sends every node to a member of its own
component (block roots are reachable; min over blocks is reachable),
so quotienting merges only within components and preserves
cross-component separation; the global min member is a fixpoint of
every level's map (it is its own local root in any block it appears
in), so the deepest level's labels are the true component minima.

All exchanges are BUCKETED merges (hash route + one vectorized
reconcile per bucket), never ``Dataset.join``: Ray's join loses the
schema on empty partitions — guaranteed here once components collapse
and one label value dominates — and ``groupby().aggregate`` pays
per-group Python at label cardinality (NOTES.md). Skew-proof: a hot
label is one mapping row per bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kg_covid_19_ray.functions.partitions import derive_num_partitions

# target surviving-edge count per block at each contraction level: the
# per-block union-find is a Python loop, so blocks are kept small
# enough to parallelize but large enough to collapse real structure
_EDGES_PER_BLOCK = 100_000


def _local_labels(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-block union-find contraction of (a, b) edge rows:
    (member, label) rows with ``label`` = the block-local
    lexicographic-min member (union-by-min + path compression). A
    member seen in several blocks carries several labels; the bucketed
    group-by-min reconciles. Self-loop rows still register their node
    as a member (labels must cover every endpoint).

    The sequential dict loop runs over the SAME-AS edge table (orders
    of magnitude smaller than the corpus), one block at a time;
    union-find has no vectorized form, and this is the standard local
    contraction step of distributed CC."""
    def contract(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
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

    return pairs.map_batches(contract, batch_format="pyarrow",
                             batch_size=None)


def _min_label(labels: ray.data.Dataset, *,
               num_buckets: int) -> ray.data.Dataset:
    """Reconcile per-block partial labels: min label per member, as a
    hash-bucket exchange + ONE pyarrow group_by per bucket (stages/
    dedup pattern — Ray's groupby().aggregate would pay per-GROUP
    Python at member cardinality)."""
    def add_bucket(batch: pa.Table) -> pa.Table:
        # pre-combine within the block before the exchange
        agg = batch.group_by("member", use_threads=False).aggregate(
            [("label", "min")])
        agg = agg.rename_columns(
            ["label" if c == "label_min" else c for c in agg.column_names])
        h = pd.util.hash_pandas_object(
            agg["member"].to_pandas(), index=False).to_numpy()
        return agg.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets))
                                 .astype(np.int64)))

    def reduce_bucket(t: pa.Table) -> pa.Table:
        agg = t.group_by("member", use_threads=False).aggregate(
            [("label", "min")])
        agg = agg.rename_columns(
            ["label" if c == "label_min" else c for c in agg.column_names])
        return agg.select(["member", "label"])

    return labels.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__bucket") \
        .map_groups(reduce_bucket, batch_format="pyarrow")


def _subst(rows: ray.data.Dataset, key_col: str, other_col: str,
           mapping: ray.data.Dataset, *,
           num_buckets: int) -> ray.data.Dataset:
    """rows[key_col] <- mapping.label where rows[key_col] ==
    mapping.member, else unchanged; ``other_col`` carried through.

    Bucketed merge, not ``Dataset.join``: row copies route by
    hash(key value), mapping rows by hash(member), so every row finds
    its mapping in its own bucket; empty buckets keep the schema and a
    hot mapping value costs one row per bucket."""
    def route_rows(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, other_col]).to_pandas()
        h = pd.util.hash_pandas_object(df[key_col], index=False) \
            .to_numpy() % np.uint64(num_buckets)
        return pa.table({
            "k": pa.array(df[key_col], pa.string()),
            "v": pa.array(df[other_col], pa.string()),
            "kind": pa.array(["r"] * len(df), pa.string()),
            "__bucket": pa.array(h.astype(np.int64)),
        })

    def route_map(batch: pa.Table) -> pa.Table:
        df = batch.select(["member", "label"]).to_pandas()
        h = pd.util.hash_pandas_object(df["member"], index=False) \
            .to_numpy() % np.uint64(num_buckets)
        return pa.table({
            "k": pa.array(df["member"], pa.string()),
            "v": pa.array(df["label"], pa.string()),
            "kind": pa.array(["m"] * len(df), pa.string()),
            "__bucket": pa.array(h.astype(np.int64)),
        })

    both = rows.map_batches(route_rows, batch_format="pyarrow").union(
        mapping.map_batches(route_map, batch_format="pyarrow"))

    def merge_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        r = df[df["kind"] == "r"]
        m = df[df["kind"] == "m"].drop_duplicates("k") \
            .rename(columns={"k": "mk", "v": "sub"})
        out = r.merge(m[["mk", "sub"]], left_on="k", right_on="mk",
                      how="left")
        resolved = out["sub"].where(out["sub"].notna(), out["k"])
        return pa.table({
            key_col: pa.array(resolved, pa.string()),
            other_col: pa.array(out["v"], pa.string()),
        })

    return both.groupby("__bucket").map_groups(
        merge_bucket, batch_format="pyarrow")


def connected_components(
    edges: ray.data.Dataset,
    src: str = "a",
    dst: str = "b",
    *,
    num_partitions: int | None = None,
    max_rounds: int = 30,
) -> ray.data.Dataset:
    """-> Dataset(member:string, canon:string), one row per distinct
    node appearing in ``edges`` (including self-loop-only nodes).

    ``num_partitions`` sizes the bucketed exchanges; defaults to
     2x cluster CPUs (functions/partitions). ``max_rounds`` bounds the
    contraction levels — each level collapses all block-local
    structure, so levels ~ log_fold(initial blocks) + graph pathology
    margin; non-convergence raises.

    Hub components (one famous entity same-as'ed by millions) are
    benign: contraction's per-node state is one label, the bucketed
    merges see one mapping row per bucket per hot label, and the local
    union-find collapses a hub star in one pass.
    """
    from kg_covid_19_ray.stages.dedup import distinct

    if num_partitions is None:
        num_partitions = derive_num_partitions()
    num_buckets = max(4, num_partitions)

    def norm(batch: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(batch[src], batch[dst])
        hi = pc.max_element_wise(batch[src], batch[dst])
        return pa.table({"a": pc.cast(lo, pa.string()),
                         "b": pc.cast(hi, pa.string())})

    # keep self-loops at level 0: their endpoint must still appear as a
    # member of the output (the relabel step drops them from level 1+)
    cur = edges.map_batches(norm, batch_format="pyarrow").materialize()
    n_edges = cur.count()
    if n_edges == 0:
        return ray.data.from_arrow(pa.table({
            "member": pa.array([], pa.string()),
            "canon": pa.array([], pa.string())}))

    # Each level's tables are materialize()'d: the loop is iterative, and
    # without pinning each level's Dataset would chain on the previous
    # level's lazy lineage (O(levels^2) recomputation). The same-as edge
    # table is orders of magnitude smaller than the corpus, so the pins
    # are cheap.
    level_maps: list[ray.data.Dataset] = []
    for _ in range(max_rounds):
        blocks = max(1, min(num_partitions,
                            (n_edges + _EDGES_PER_BLOCK - 1)
                            // _EDGES_PER_BLOCK))
        cur = cur.repartition(blocks)
        labels = _min_label(_local_labels(cur),
                            num_buckets=num_buckets).materialize()
        level_maps.append(labels)
        # contract: quotient the edge set through the partial labels
        relabeled = _subst(cur, "a", "b", labels, num_buckets=num_buckets)
        relabeled = _subst(relabeled, "b", "a", labels,
                           num_buckets=num_buckets)

        def renorm(batch: pa.Table) -> pa.Table:
            lo = pc.min_element_wise(batch["a"], batch["b"])
            hi = pc.max_element_wise(batch["a"], batch["b"])
            t = pa.table({"a": lo, "b": hi})
            return t.filter(pc.not_equal(t["a"], t["b"]))

        cur = distinct(relabeled.map_batches(renorm, batch_format="pyarrow"),
                       ["a", "b"], num_buckets=num_buckets).materialize()
        n_edges = cur.count()
        if n_edges == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            f"contraction levels — pathological block layout; raise "
            f"max_rounds")

    # compose top-down: canon over level i's members =
    # level_maps[i] with labels substituted through the level-i+1 canon
    # (labels absent from the deeper map are already canonical)
    canon = level_maps[-1]
    for lab in reversed(level_maps[:-1]):
        canon = _subst(lab, "label", "member", canon,
                       num_buckets=num_buckets).materialize()
    return canon.select_columns(["member", "label"]) \
        .rename_columns({"label": "canon"})


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


def _subst_cols(rows: ray.data.Dataset, key_col: str,
                carry_cols: list[str], mapping: ray.data.Dataset, *,
                num_buckets: int) -> ray.data.Dataset:
    """``_subst`` generalized to N carried columns (all string-typed):
    rows[key_col] <- mapping.label where rows[key_col] == mapping.member,
    else unchanged; every ``carry_cols`` column rides along. Same
    bucketed-merge shape (skew-proof, schema-stable on empty buckets)."""
    names = [f"c{i}" for i in range(len(carry_cols))]

    def route_rows(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, *carry_cols]).to_pandas()
        h = pd.util.hash_pandas_object(df[key_col], index=False) \
            .to_numpy() % np.uint64(num_buckets)
        cols = {"k": pa.array(df[key_col], pa.string())}
        for n, c in zip(names, carry_cols):
            cols[n] = pa.array(df[c], pa.string())
        cols["kind"] = pa.array(["r"] * len(df), pa.string())
        cols["__bucket"] = pa.array(h.astype(np.int64))
        return pa.table(cols)

    def route_map(batch: pa.Table) -> pa.Table:
        df = batch.select(["member", "label"]).to_pandas()
        h = pd.util.hash_pandas_object(df["member"], index=False) \
            .to_numpy() % np.uint64(num_buckets)
        cols = {"k": pa.array(df["member"], pa.string())}
        cols[names[0]] = pa.array(df["label"], pa.string())
        for n in names[1:]:
            cols[n] = pa.array([None] * len(df), pa.string())
        cols["kind"] = pa.array(["m"] * len(df), pa.string())
        cols["__bucket"] = pa.array(h.astype(np.int64))
        return pa.table(cols)

    both = rows.map_batches(route_rows, batch_format="pyarrow").union(
        mapping.map_batches(route_map, batch_format="pyarrow"))

    def merge_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        r = df[df["kind"] == "r"]
        m = df[df["kind"] == "m"].drop_duplicates("k") \
            [["k", names[0]]].rename(columns={"k": "mk",
                                              names[0]: "sub"})
        out = r.merge(m, left_on="k", right_on="mk", how="left")
        resolved = out["sub"].where(out["sub"].notna(), out["k"])
        cols = {key_col: pa.array(resolved, pa.string())}
        for n, c in zip(names, carry_cols):
            cols[c] = pa.array(out[n], pa.string())
        return pa.table(cols)

    return both.groupby("__bucket").map_groups(
        merge_bucket, batch_format="pyarrow")


def _boruvka_round(E: ray.data.Dataset, *,
                   num_buckets: int) -> tuple[ray.data.Dataset,
                                              ray.data.Dataset]:
    """One distributed Boruvka contraction round over a supernode edge
    table E(a, b, oa, ob) — (a, b) the contracted endpoints (a < b, one
    row per distinct (a, b)), (oa, ob) a representative ORIGINAL edge.

    Returns (E', picked): ``picked`` is each supernode's minimum
    incident edge under the (a, b) lexicographic order. Because the
    (a, b) keys are distinct, the edge "weights" are unique, and the
    classic Boruvka argument applies: the union of per-node minimum
    edges is ACYCLIC (the heaviest edge of any would-be cycle is not
    the minimum of either endpoint), so picked's (oa, ob) rows can go
    straight into the forest output. ``E'`` is E quotiented through
    picked's connected components (labels from the already-distributed
    ``connected_components``), self-loops dropped, one representative
    original edge kept per contracted pair. Every edge-incident
    supernode merges with at least one neighbour per round, so the
    supernode count at least halves: O(log n) rounds."""
    def emit(batch: pa.Table) -> pa.Table:
        body = batch.select(["a", "b", "oa", "ob"])
        t = pa.concat_tables([
            body.append_column("node", batch["a"]),
            body.append_column("node", batch["b"]),
        ])
        h = pd.util.hash_pandas_object(
            t["node"].to_pandas(), index=False).to_numpy() \
            % np.uint64(num_buckets)
        return t.append_column(
            "__bucket", pa.array(h.astype(np.int64)))

    def pick_min(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        df = df.sort_values(["node", "a", "b"], kind="mergesort") \
            .drop_duplicates("node")
        return pa.table({c: pa.array(df[c], pa.string())
                         for c in ("a", "b", "oa", "ob")})

    from kg_covid_19_ray.stages.dedup import distinct
    picked = E.map_batches(emit, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(pick_min, batch_format="pyarrow")
    # two nodes may pick the same edge; (a,b) determines (oa,ob)
    picked = distinct(picked, ["a", "b", "oa", "ob"],
                      num_buckets=num_buckets).materialize()

    labels = connected_components(picked, src="a", dst="b") \
        .rename_columns({"canon": "label"}).materialize()

    relabeled = _subst_cols(E, "a", ["b", "oa", "ob"], labels,
                            num_buckets=num_buckets)
    relabeled = _subst_cols(relabeled, "b", ["a", "oa", "ob"], labels,
                            num_buckets=num_buckets)

    def renorm(batch: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(batch["a"], batch["b"])
        hi = pc.max_element_wise(batch["a"], batch["b"])
        t = pa.table({"a": lo, "b": hi,
                      "oa": batch["oa"], "ob": batch["ob"]})
        return t.filter(pc.not_equal(t["a"], t["b"]))

    contracted = relabeled.map_batches(renorm, batch_format="pyarrow")

    # one representative original edge per contracted (a, b): the
    # row-wise minimum (a per-COLUMN min would splice oa from one row
    # with ob from another — a fabricated edge), bucketed exchange
    def rep_row(t: pa.Table) -> pa.Table:
        df = t.select(["a", "b", "oa", "ob"]).to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["a", "b", "oa", "ob"], kind="mergesort")
              .drop_duplicates(["a", "b"]), preserve_index=False)

    def add_bucket(batch: pa.Table) -> pa.Table:
        agg = rep_row(batch)
        h = pd.util.hash_pandas_object(
            agg.select(["a", "b"]).to_pandas(), index=False).to_numpy()
        return agg.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets))
                                 .astype(np.int64)))

    def reduce_bucket(t: pa.Table) -> pa.Table:
        return rep_row(t)

    contracted = contracted.map_batches(add_bucket,
                                        batch_format="pyarrow") \
        .groupby("__bucket") \
        .map_groups(reduce_bucket, batch_format="pyarrow").materialize()
    return contracted, picked.select_columns(["oa", "ob"])


def spanning_forest(edges: ray.data.Dataset,
                    src: str = "a", dst: str = "b", *,
                    num_partitions: int | None = None,
                    fold_factor: int = 4,
                    max_local_edges: int = 2_000_000,
                    max_rounds: int = 60) -> ray.data.Dataset:
    """-> Dataset(a, b): a subset of the input edges whose union
    preserves the connectivity of the full graph (a spanning forest of
    each component). The enabler for ensmallen-style
    connectivity-preserving holdouts (reference make_holdouts.py:59-77
    ``random_holdout``): edges NOT in the forest can move to a test
    split without disconnecting train.

    Shape: hierarchical cycle-pruning + bounded finish. Each fold
    repartitions the surviving edges into fewer blocks and drops, per
    block, every edge that closes a cycle within that block (local
    union-find over the block's edges in sorted order) — dropping a
    local cycle edge never changes connectivity, so the invariant
    "survivors preserve the input's connectivity" holds per fold.

    The round-2 version finished with ONE block of up to n_nodes - 1
    edges in a single task's union-find — a single-worker choke point
    at 10^9 nodes (round-2 verdict item 6). Now the single-block
    finish only runs when the survivor count is <= ``max_local_edges``
    (a fixed budget independent of graph size); above it, distributed
    Boruvka contraction rounds (``_boruvka_round``) emit per-supernode
    minimum edges straight into the forest and quotient the survivor
    graph through their components until the remainder fits the local
    budget. Forest edges found inside contracted components plus a
    spanning forest of the quotient graph lift to a spanning forest of
    the original graph (the standard Boruvka/contraction argument), so
    the output still has exactly n_nodes - n_components edges — a
    count invariant of ANY forest, deterministic even though Ray's
    repartition boundaries are not."""
    import pyarrow.compute as pc

    if num_partitions is None:
        num_partitions = derive_num_partitions()

    def norm(batch: pa.Table) -> pa.Table:
        a, b = batch[src], batch[dst]
        lo = pc.min_element_wise(pc.cast(a, pa.string()),
                                 pc.cast(b, pa.string()))
        hi = pc.max_element_wise(pc.cast(a, pa.string()),
                                 pc.cast(b, pa.string()))
        t = pa.table({"a": lo, "b": hi})
        t = t.filter(pc.not_equal(t["a"], t["b"]))
        # contracted endpoints start as the original endpoints
        return t.append_column("oa", t["a"]).append_column("ob", t["b"])

    from kg_covid_19_ray.stages.dedup import distinct
    surviving = distinct(edges.map_batches(norm, batch_format="pyarrow"),
                         ["a", "b", "oa", "ob"])

    def local_forest(batch: pa.Table) -> pa.Table:
        # per-block union-find over the CONTRACTED endpoints in (a, b)
        # sorted order; keeps the representative original edge columns
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

        keep = []
        for i in order:
            ra, rb = find(a[i]), find(b[i])
            if ra == rb:
                continue  # closes a cycle in this block: redundant
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
            keep.append(i)
        return batch.take(pa.array(keep, pa.int64()))

    num_buckets = max(4, num_partitions)
    forest_parts: list[ray.data.Dataset] = []
    blocks = max(1, num_partitions)
    for _ in range(max_rounds):
        surviving = surviving.repartition(blocks).map_batches(
            local_forest, batch_format="pyarrow",
            batch_size=None).materialize()
        if blocks == 1:
            break
        next_blocks = max(1, blocks // fold_factor)
        if next_blocks == 1:
            n = surviving.count()
            if n > max_local_edges:
                # too big for a single-task finish: contract
                surviving, picked = _boruvka_round(
                    surviving, num_buckets=num_buckets)
                forest_parts.append(picked)
                n = surviving.count()
                blocks = max(1, min(num_partitions,
                                    (n + _EDGES_PER_BLOCK - 1)
                                    // _EDGES_PER_BLOCK))
                continue
        blocks = next_blocks
    else:
        raise RuntimeError(
            f"spanning_forest did not converge in {max_rounds} folds")

    out = surviving.select_columns(["oa", "ob"])
    for part in forest_parts:
        out = out.union(part)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch["oa"], "b": batch["ob"]})

    return out.map_batches(rename, batch_format="pyarrow")


def canonicalize_ids(pairs: ray.data.Dataset, ids: ray.data.Dataset, *,
                     id_col: str, out_col: str) -> ray.data.Dataset:
    """Shared tail of every near-duplicate CLUSTERING op (SemDeDup-style
    embedding dedup, MinHash lexical dedup): same-cluster ``pairs``
    (a, b) of zero-padded id strings -> connected components -> every
    id mapped to its cluster's min member, singletons to themselves.

    ``ids``: one row per universe element with ``id_col`` (int64) and
    ``member`` (the zero-padded string form — padding makes the
    component stage's lexicographic min equal the numeric min the SQL
    oracles compute). Returns (id_col, out_col) int64 rows; dropping
    ``id_col != out_col`` rows is the dedup."""
    from kg_covid_19_ray.functions.partitions import derive_join_partitions

    if pairs.count() == 0:
        # no clusters: identity map (and no empty-side join, which
        # would lose the schema)
        def ident(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({id_col: b[id_col],
                                 out_col: b[id_col]})

        return ids.map_batches(ident, batch_format="pandas")

    # join inputs come through pandas-format stages whose pandas schema
    # metadata is unhashable — strip so the hash-shuffle aggregators
    # keep their schema-dedup fast path (round-4 VERDICT item 6)
    from kg_covid_19_ray.functions.arrow_meta import stripped
    comp = connected_components(pairs)
    joined = stripped(ids).join(stripped(comp), join_type="left_outer",
                                num_partitions=derive_join_partitions(),
                                on=("member",))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        canon = b["canon"].fillna(b["member"]).map(int).astype(np.int64)
        return pd.DataFrame({id_col: b[id_col].astype(np.int64),
                             out_col: canon})

    return joined.map_batches(finish, batch_format="pandas")
