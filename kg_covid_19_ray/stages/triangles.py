"""Distributed triangle counting via degree-ordered orientation.

The third graph-analytic over the constructed KG (after degrees and
PageRank): triangles in the term co-occurrence graph are the
tightly-knit topic clusters. Exact integer output — trivially
hash-oracle-able (DuckDB counts the same triangles with a 3-way
self-join).

Algorithm (the standard shuffle-bounded shape, cf. Suri & Vassilvitskii
"Counting Triangles and the Curse of the Last Reducer", WWW'11):

1. normalize to distinct undirected edges (lo < hi, self-loops
   dropped) — one bucketed dedup;
2. degree per node — one bucketed count;
3. ORIENT each edge from its lower-(degree, id) endpoint to the
   higher one. Every out-adjacency is then O(sqrt(E))-bounded, so the
   wedge explosion of a hub star dies: a degree-10^6 celebrity node
   ORIGINATES no wedges — its incident edges all point INTO it and
   the wedge work lands on its low-degree neighbours ("the curse of
   the last reducer" fix);
4. wedges: per source u, every ordered out-neighbour pair (v, w),
   emitted canonically (v before w in the same (degree, id) total
   order);
5. one bucketed semi-join of wedges against the oriented edge set:
   a wedge that is itself an edge closes a triangle. Each triangle is
   counted EXACTLY once (u is its minimum corner in the total order,
   (v, w) its canonical closing edge).

All exchanges are the repo's hash-bucket tagged merges (see
stages/cluster.py for why not Dataset.join / groupby().aggregate).
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


def _distinct_undirected(edges: ray.data.Dataset, src: str, dst: str, *,
                         num_buckets: int) -> ray.data.Dataset:
    """-> pinned Dataset(lo, hi, __bucket=hash(lo,hi) % B), one row per
    unordered endpoint pair, self-loops dropped."""
    import pyarrow.compute as pc

    def norm(batch: pa.Table) -> pa.Table:
        a = pc.cast(batch[src], pa.string())
        b = pc.cast(batch[dst], pa.string())
        t = pa.table({"lo": pc.min_element_wise(a, b),
                      "hi": pc.max_element_wise(a, b)})
        t = t.filter(pc.not_equal(t["lo"], t["hi"]))
        df = t.to_pandas().drop_duplicates()  # per-block combiner
        return pa.table({
            "lo": pa.array(df["lo"], pa.string()),
            "hi": pa.array(df["hi"], pa.string()),
            "__bucket": pa.array(_bucket_of(
                pd.util.hash_pandas_object(df, index=False),
                num_buckets)),
        })

    def dedup(g: pa.Table) -> pa.Table:
        df = g.to_pandas().drop_duplicates(["lo", "hi"])
        return pa.table({
            "lo": pa.array(df["lo"], pa.string()),
            "hi": pa.array(df["hi"], pa.string()),
            "__bucket": pa.array(df["__bucket"].to_numpy(np.int64)),
        })

    return edges.map_batches(norm, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(dedup, batch_format="pyarrow") \
        .materialize()


def _attach_degrees(pairs: ray.data.Dataset, *,
                    num_buckets: int) -> ray.data.Dataset:
    """-> Dataset(lo, hi, dlo, dhi): each endpoint annotated with its
    degree. One bucketed exchange per endpoint side; the degree table
    itself comes from a bucketed count over the pair endpoints."""

    def endpoint_counts(batch: pa.Table) -> pa.Table:
        ids = pd.concat([batch["lo"].to_pandas(),
                         batch["hi"].to_pandas()])
        cnt = ids.value_counts()  # per-block combiner
        return pa.table({
            "id": pa.array(cnt.index, pa.string()),
            "n": pa.array(cnt.to_numpy(np.int64)),
            "__bucket": pa.array(_bucket_of(
                pd.Series(cnt.index), num_buckets)),
        })

    def sum_counts(g: pa.Table) -> pa.Table:
        df = g.to_pandas().groupby("id", sort=False) \
            .agg(n=("n", "sum"), __bucket=("__bucket", "first")) \
            .reset_index()
        return pa.table({
            "id": pa.array(df["id"], pa.string()),
            "n": pa.array(df["n"].to_numpy(np.int64)),
            "__bucket": pa.array(df["__bucket"].to_numpy(np.int64)),
        })

    deg = pairs.map_batches(endpoint_counts, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(sum_counts,
                                        batch_format="pyarrow")

    out = _merge_degree(pairs, "lo", "dlo", deg, ["hi"],
                        num_buckets=num_buckets)
    return _merge_degree(out, "hi", "dhi", deg, ["lo", "dlo"],
                         num_buckets=num_buckets)


def _merge_degree(rows: ray.data.Dataset, key: str, dcol: str,
                  deg: ray.data.Dataset, carry: list[str], *,
                  num_buckets: int) -> ray.data.Dataset:
    def route_rows(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cols = {"k": pa.array(df[key], pa.string())}
        for c in carry:
            arr = df[c]
            cols[c] = (pa.array(arr.to_numpy(np.int64))
                       if c.startswith("d")
                       else pa.array(arr, pa.string()))
        cols["n"] = pa.array(np.zeros(len(df), np.int64))
        cols["kind"] = pa.array(["r"] * len(df), pa.string())
        cols["__bucket"] = pa.array(_bucket_of(df[key], num_buckets))
        return pa.table(cols)

    def route_deg(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cols = {"k": pa.array(df["id"], pa.string())}
        for c in carry:
            cols[c] = (pa.array(np.zeros(len(df), np.int64))
                       if c.startswith("d")
                       else pa.array([None] * len(df), pa.string()))
        cols["n"] = pa.array(df["n"].to_numpy(np.int64))
        cols["kind"] = pa.array(["d"] * len(df), pa.string())
        cols["__bucket"] = pa.array(_bucket_of(df["id"], num_buckets))
        return pa.table(cols)

    both = rows.map_batches(route_rows, batch_format="pyarrow").union(
        deg.map_batches(route_deg, batch_format="pyarrow"))

    def merge(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        r = df[df["kind"] == "r"]
        d = df[df["kind"] == "d"].drop_duplicates("k") \
            .set_index("k")["n"]
        got = r["k"].map(d).to_numpy(np.int64)
        cols = {key: pa.array(r["k"], pa.string())}
        for c in carry:
            cols[c] = (pa.array(r[c].to_numpy(np.int64))
                       if c.startswith("d")
                       else pa.array(r[c], pa.string()))
        cols[dcol] = pa.array(got)
        return pa.table(cols)

    return both.groupby("__bucket").map_groups(
        merge, batch_format="pyarrow")


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

    pairs = _distinct_undirected(edges, src, dst,
                                 num_buckets=num_buckets)
    with_deg = _attach_degrees(pairs, num_buckets=num_buckets)

    def orient(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        lo_first = (df["dlo"].to_numpy() < df["dhi"].to_numpy()) | (
            (df["dlo"].to_numpy() == df["dhi"].to_numpy())
            & (df["lo"].to_numpy() < df["hi"].to_numpy()))
        u = np.where(lo_first, df["lo"], df["hi"])
        v = np.where(lo_first, df["hi"], df["lo"])
        du = np.where(lo_first, df["dlo"], df["dhi"]).astype(np.int64)
        dv = np.where(lo_first, df["dhi"], df["dlo"]).astype(np.int64)
        return pa.table({
            "u": pa.array(u, pa.string()), "v": pa.array(v, pa.string()),
            "du": pa.array(du), "dv": pa.array(dv),
            "__bucket": pa.array(_bucket_of(pd.Series(u), num_buckets)),
        })

    # oriented edges, bucketed by source for wedge generation
    oriented = with_deg.map_batches(orient, batch_format="pyarrow") \
        .materialize()

    def wedges(g: pa.Table) -> pa.Table:
        # fully vectorized variable-size within-group pair generation:
        # sort by (u, dv, v) — canonical closing-edge order is the same
        # (degree, id) total order the orientation uses — then for each
        # row, pair it with every LATER row of its u-run via the
        # repeat/cumsum index construction. Zero per-group Python (a
        # `for u, grp in groupby` loop here costs minutes at millions
        # of sources).
        df = g.to_pandas().sort_values(["u", "dv", "v"], kind="mergesort")
        u = df["u"].to_numpy()
        names = df["v"].to_numpy()
        n = len(df)
        if n == 0:
            v = w = np.array([], object)
        else:
            run_start = np.empty(n, np.bool_)
            run_start[0] = True
            run_start[1:] = u[1:] != u[:-1]
            run_ids = np.cumsum(run_start) - 1
            counts = np.bincount(run_ids)
            ends = np.cumsum(counts)  # group end offset per run
            # partners after each row within its run
            c = ends[run_ids] - np.arange(n) - 1
            firsts = np.repeat(np.arange(n), c)
            seg = np.cumsum(c) - c
            seconds = np.arange(c.sum()) - np.repeat(seg, c) \
                + np.repeat(np.arange(n) + 1, c)
            v, w = names[firsts], names[seconds]
        key = (pd.Series(v.astype(str)) + "\x00"
               + pd.Series(w.astype(str))) \
            if len(v) else pd.Series([], dtype=object)
        return pa.table({
            "v": pa.array(v, pa.string()), "w": pa.array(w, pa.string()),
            "kind": pa.array(["w"] * len(v), pa.string()),
            "__bucket": pa.array(_bucket_of(key, num_buckets)),
        })

    def tag_edges(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        key = df["u"].astype(str) + "\x00" + df["v"].astype(str)
        return pa.table({
            "v": pa.array(df["u"], pa.string()),
            "w": pa.array(df["v"], pa.string()),
            "kind": pa.array(["e"] * len(df), pa.string()),
            "__bucket": pa.array(_bucket_of(key, num_buckets)),
        })

    def close(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        e = df[df["kind"] == "e"]
        wdf = df[df["kind"] == "w"]
        edge_keys = pd.MultiIndex.from_frame(e[["v", "w"]])
        wedge_keys = pd.MultiIndex.from_frame(wdf[["v", "w"]])
        n = int(wedge_keys.isin(edge_keys).sum())
        return pa.table({"n": pa.array([n], pa.int64())})

    counts = oriented.groupby("__bucket") \
        .map_groups(wedges, batch_format="pyarrow") \
        .union(oriented.map_batches(tag_edges, batch_format="pyarrow")) \
        .groupby("__bucket").map_groups(close, batch_format="pyarrow")

    # sum EVERY row of every batch: one output block may carry several
    # groups' partial counts (group results coalesce into shared
    # blocks when the input block count is low)
    total = sum(sum(b["n"].to_pylist())
                for b in counts.iter_batches(batch_format="pyarrow",
                                             batch_size=None)
                if b.num_rows)
    return ray.data.from_arrow(
        pa.table({"n_triangles": pa.array([total], pa.int64())}))
