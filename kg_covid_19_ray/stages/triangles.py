"""Distributed triangle counting via degree-ordered orientation.

Graph analytics over the constructed KG (after degrees and PageRank):
global triangle count (``count_triangles``) and per-node triangle +
degree table (``node_triangle_counts``, the integer core of local
clustering coefficients — coefficient = 2T / (d(d-1)), left to the
consumer so the operator output stays exact int64 and hash-oracle-able).

Algorithm (the standard shuffle-bounded shape, cf. Suri & Vassilvitskii
"Counting Triangles and the Curse of the Last Reducer", WWW'11):

1. normalize to distinct undirected edges (lo < hi, self-loops
   dropped) — one bucketed dedup that also emits per-node degree
   partials (post-dedup), folded with the degree sum and the two
   degree attaches into THREE id-keyed exchanges (see
   ``_oriented_edges``; round-4 fold of what were six);
2. degree per node — summed inside the same exchanges;
3. ORIENT each edge from its lower-(degree, id) endpoint to the
   higher one. Every out-adjacency is then O(sqrt(E))-bounded, so the
   wedge explosion of a hub star dies: a degree-10^6 celebrity node
   ORIGINATES no wedges — its incident edges all point INTO it and
   the wedge work lands on its low-degree neighbours ("the curse of
   the last reducer" fix);
4. wedges: per source u, every ordered out-neighbour pair (v, w),
   emitted canonically (v before w in the same (degree, id) total
   order), fully vectorized (repeat/cumsum pair construction — a
   per-source Python groupby loop costs minutes at millions of
   sources);
5. one bucketed semi-join of wedges against the oriented edge set:
   a wedge that is itself an edge closes a triangle. Each triangle is
   counted EXACTLY once (u is its minimum corner in the total order,
   (v, w) its canonical closing edge).

All exchanges are the repo's hash-bucket tagged merges (see
stages/cluster.py for why not Dataset.join / groupby().aggregate).
Honest single-node note: an in-process columnar engine (DuckDB) wins
~100x on graphs that fit one machine — dictionary-int hash joins in
one address space; this shape is for edge tables that don't.
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


def _bucket_of_pairs(v, w, num_buckets: int) -> np.ndarray:
    """Route a (v, w) pair stream without materializing concat-string
    keys (routing needs only consistency — the closing comparison
    stays exact on the actual values)."""
    h = pd.util.hash_pandas_object(
        pd.DataFrame({"v": v, "w": w}), index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _mixed(a, b, n, kind, bucket) -> pa.Table:
    """The shared exchange schema: pair rows and degree rows flow
    through the SAME groupby (a=lo|id, b=hi|null, n=payload int)."""
    return pa.table({
        "a": pa.array(a, pa.string()), "b": pa.array(b, pa.string()),
        "n": pa.array(np.asarray(n, np.int64)),
        "kind": pa.array([kind] * len(n), pa.string()),
        "__bucket": pa.array(np.asarray(bucket, np.int64)),
    })


def _oriented_edges(edges: ray.data.Dataset, src: str, dst: str, *,
                    num_buckets: int
                    ) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """-> (oriented, deg): oriented Dataset(u, v, du, dv,
    __bucket=hash(u) % B) pinned for wedge generation, plus the pinned
    degree table (the node universe).

    THREE folded exchanges (round-4; was six as separate
    dedup/degree-sum/attach-lo/attach-hi stages):

    1. route by hash(lo): dedup distinct undirected edges, and emit
       per-group degree PARTIALS for both endpoints (post-dedup, so
       duplicates never over-count) routed by hash(id);
    2. route by hash(id): sum partials into final degrees, attach dlo
       to the co-routed pair rows (pairs ride the same exchange keyed
       by their lo), re-route pairs by hash(hi) and keep one degree
       row per id;
    3. route by hash(hi)=hash(id): attach dhi and ORIENT in the same
       kernel, emitting wedge-ready rows routed by hash(u).

    Skew note: exchanges 1-3 are id-keyed, so a mega-hub concentrates
    its incident rows in one bucket — the same bound the old
    attach-degree merges had; the wedge stage stays protected by the
    degree orientation regardless."""
    import pyarrow.compute as pc

    def norm(batch: pa.Table) -> pa.Table:
        a = pc.cast(batch[src], pa.string())
        b = pc.cast(batch[dst], pa.string())
        t = pa.table({"lo": pc.min_element_wise(a, b),
                      "hi": pc.max_element_wise(a, b)})
        t = t.filter(pc.not_equal(t["lo"], t["hi"]))
        df = t.to_pandas().drop_duplicates()  # per-block combiner
        return _mixed(df["lo"], df["hi"], np.zeros(len(df), np.int64),
                      "r", _bucket_of(df["lo"], num_buckets))

    def dedup_and_partials(g: pa.Table) -> pa.Table:
        df = g.to_pandas().drop_duplicates(["a", "b"])
        pairs = _mixed(df["a"], df["b"], np.zeros(len(df), np.int64),
                       "r", df["__bucket"].to_numpy(np.int64))
        cnt = pd.concat([df["a"], df["b"]]).value_counts()
        ids = pd.Series(cnt.index)
        partials = _mixed(ids, [None] * len(ids),
                          cnt.to_numpy(np.int64), "p",
                          _bucket_of(ids, num_buckets))
        return pa.concat_tables([pairs, partials])

    def sum_and_attach_dlo(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        deg = df[df["kind"] == "p"].groupby("a", sort=False)["n"].sum()
        r = df[df["kind"] == "r"]
        dlo = r["a"].map(deg).to_numpy(np.int64)
        pairs = _mixed(r["a"], r["b"], dlo, "r",
                       _bucket_of(r["b"], num_buckets))
        ids = pd.Series(deg.index)
        degs = _mixed(ids, [None] * len(ids), deg.to_numpy(np.int64),
                      "d", _bucket_of(ids, num_buckets))
        return pa.concat_tables([pairs, degs])

    def attach_dhi_and_orient(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        d = df[df["kind"] == "d"].set_index("a")["n"]
        r = df[df["kind"] == "r"]
        lo, hi = r["a"].to_numpy(), r["b"].to_numpy()
        dlo = r["n"].to_numpy(np.int64)
        dhi = r["b"].map(d).to_numpy(np.int64)
        lo_first = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
        u = np.where(lo_first, lo, hi)
        v = np.where(lo_first, hi, lo)
        du = np.where(lo_first, dlo, dhi).astype(np.int64)
        dv = np.where(lo_first, dhi, dlo).astype(np.int64)
        return pa.table({
            "u": pa.array(u, pa.string()), "v": pa.array(v, pa.string()),
            "du": pa.array(du), "dv": pa.array(dv),
            "__bucket": pa.array(_bucket_of(pd.Series(u), num_buckets)),
        })

    summed = edges.map_batches(norm, batch_format="pyarrow") \
        .groupby("__bucket") \
        .map_groups(dedup_and_partials, batch_format="pyarrow") \
        .groupby("__bucket") \
        .map_groups(sum_and_attach_dlo, batch_format="pyarrow") \
        .materialize()

    def deg_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2
        t = batch.filter(pc2.equal(batch["kind"], "d"))
        return pa.table({"id": t["a"], "n": t["n"],
                         "__bucket": t["__bucket"]})

    deg = summed.map_batches(deg_rows, batch_format="pyarrow")
    oriented = summed.groupby("__bucket") \
        .map_groups(attach_dhi_and_orient, batch_format="pyarrow") \
        .materialize()
    return oriented, deg


def _closed_wedges(oriented: ray.data.Dataset, *, num_buckets: int,
                   corners: bool) -> ray.data.Dataset:
    """Wedge-generate + closing-edge semi-join.

    ``corners=False`` -> partial global counts: rows (n:int64).
    ``corners=True``  -> per-node partial triangle counts: rows
    (k:string, c:int64, __bucket=hash(k) % B) — every matched wedge
    credits its three corners (wedge rows carry the corner u through
    the exchange for this)."""

    def wedges(g: pa.Table) -> pa.Table:
        # vectorized variable-size within-group pair generation: sort
        # by (u, dv, v) — canonical closing-edge order is the same
        # (degree, id) total order the orientation uses — then pair
        # each row with every LATER row of its u-run (repeat/cumsum)
        df = g.to_pandas().sort_values(["u", "dv", "v"],
                                       kind="mergesort")
        u_arr = df["u"].to_numpy()
        names = df["v"].to_numpy()
        n = len(df)
        if n == 0:
            uu = v = w = np.array([], object)
        else:
            run_start = np.empty(n, np.bool_)
            run_start[0] = True
            run_start[1:] = u_arr[1:] != u_arr[:-1]
            run_ids = np.cumsum(run_start) - 1
            counts = np.bincount(run_ids)
            ends = np.cumsum(counts)  # group end offset per run
            c = ends[run_ids] - np.arange(n) - 1  # partners after row
            firsts = np.repeat(np.arange(n), c)
            seg = np.cumsum(c) - c
            seconds = np.arange(c.sum()) - np.repeat(seg, c) \
                + np.repeat(np.arange(n) + 1, c)
            uu, v, w = u_arr[firsts], names[firsts], names[seconds]
        cols = {}
        if corners:
            cols["u"] = pa.array(uu, pa.string())
        cols.update({
            "v": pa.array(v, pa.string()), "w": pa.array(w, pa.string()),
            "kind": pa.array(["w"] * len(v), pa.string()),
            "__bucket": pa.array(
                _bucket_of_pairs(v, w, num_buckets)),
        })
        return pa.table(cols)

    def tag_edges(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cols = {}
        if corners:
            cols["u"] = pa.array([None] * len(df), pa.string())
        cols.update({
            "v": pa.array(df["u"], pa.string()),
            "w": pa.array(df["v"], pa.string()),
            "kind": pa.array(["e"] * len(df), pa.string()),
            "__bucket": pa.array(
                _bucket_of_pairs(df["u"].to_numpy(),
                                 df["v"].to_numpy(), num_buckets)),
        })
        return pa.table(cols)

    def close(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        e = df[df["kind"] == "e"]
        wdf = df[df["kind"] == "w"]
        edge_keys = pd.MultiIndex.from_frame(e[["v", "w"]])
        hit = pd.MultiIndex.from_frame(wdf[["v", "w"]]).isin(edge_keys)
        if not corners:
            return pa.table({"n": pa.array([int(hit.sum())], pa.int64())})
        m = wdf[hit]
        ids = pd.concat([m["u"], m["v"], m["w"]])
        cnt = ids.value_counts()  # per-close-bucket combiner
        return pa.table({
            "k": pa.array(cnt.index, pa.string()),
            "c": pa.array(cnt.to_numpy(np.int64)),
            "__bucket": pa.array(_bucket_of(
                pd.Series(cnt.index), num_buckets)),
        })

    return oriented.groupby("__bucket") \
        .map_groups(wedges, batch_format="pyarrow") \
        .union(oriented.map_batches(tag_edges, batch_format="pyarrow")) \
        .groupby("__bucket").map_groups(close, batch_format="pyarrow")


def count_triangles(
    edges: ray.data.Dataset,
    src: str = "subject",
    dst: str = "object",
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """-> one-row Dataset(n_triangles:int64): exact triangle count of
    the undirected simple graph spanned by the input edge rows."""
    if num_partitions is None:
        num_partitions = derive_num_partitions()
    num_buckets = max(4, num_partitions)

    oriented, _deg = _oriented_edges(edges, src, dst,
                                     num_buckets=num_buckets)
    counts = _closed_wedges(oriented, num_buckets=num_buckets,
                            corners=False)

    # sum EVERY row of every batch: one output block may carry several
    # groups' partial counts (group results coalesce into shared
    # blocks when the input block count is low)
    total = sum(sum(b["n"].to_pylist())
                for b in counts.iter_batches(batch_format="pyarrow",
                                             batch_size=None)
                if b.num_rows)
    return ray.data.from_arrow(
        pa.table({"n_triangles": pa.array([total], pa.int64())}))


def node_triangle_counts(
    edges: ray.data.Dataset,
    src: str = "subject",
    dst: str = "object",
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """-> Dataset(id:string, triangles:int64, degree:int64), one row
    per node of the undirected simple graph: how many triangles the
    node is a corner of, and its degree. Local clustering coefficient
    = 2 * triangles / (degree * (degree - 1)) — the division is left
    to the consumer so the operator output stays exact integers."""
    if num_partitions is None:
        num_partitions = derive_num_partitions()
    num_buckets = max(4, num_partitions)

    oriented, deg = _oriented_edges(edges, src, dst,
                                    num_buckets=num_buckets)
    corner_counts = _closed_wedges(oriented, num_buckets=num_buckets,
                                   corners=True)

    def tag_counts(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": batch["k"], "c": batch["c"],
            "kind": pa.array(["c"] * batch.num_rows, pa.string()),
            "__bucket": batch["__bucket"],
        })

    def tag_deg(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": batch["id"], "c": batch["n"],
            "kind": pa.array(["d"] * batch.num_rows, pa.string()),
            "__bucket": batch["__bucket"],
        })

    def finalize(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        d = df[df["kind"] == "d"]
        c = df[df["kind"] == "c"].groupby("k", sort=False)["c"].sum()
        # reindex with an int fill (map+fillna would promote the column
        # to float64 when any node has zero triangles — same exactness
        # hazard as pagerank.damp)
        tri = c.reindex(d["k"], fill_value=0).to_numpy(np.int64)
        return pa.table({
            "id": pa.array(d["k"], pa.string()),
            "triangles": pa.array(tri),
            "degree": pa.array(d["c"].to_numpy(np.int64)),
        })

    return corner_counts.map_batches(tag_counts, batch_format="pyarrow") \
        .union(deg.map_batches(tag_deg, batch_format="pyarrow")) \
        .groupby("__bucket").map_groups(finalize, batch_format="pyarrow")
