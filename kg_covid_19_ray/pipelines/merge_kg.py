"""Config-driven KG merge — the ``merge.yaml`` + KGX merge analog
(reference merge_utils/merge_kg.py:22-34 and merge.yaml:6-144), rebuilt
as a streaming union + shuffle dedup instead of an in-memory
``networkx.MultiDiGraph`` (the reference's merge is single-node,
memory-bound — Jenkinsfile:126 needs -Xmx128G downstream).

Pieces:

- ``MergeConfig``: sources with per-source node/edge whitelists
  (merge.yaml:27-41), operations (currently ``remap_node_identifier``,
  merge.yaml:42-47 / SURVEY J3), destinations (parquet / kgx-tsv / nt).
- Schema union (A3, ChEMBL dynamic headers chembl_transform.py:79-89):
  per-source tables with heterogeneous columns are unified —
  missing columns null-filled, column order = sorted union.
- Node unify (D3): global hash-bucketed reduce per ``id`` where each
  property takes its FIRST NON-EMPTY value in (source_rank, row) order
  — the KGX property-merge pinned deterministic.
- Edge dedup: exact composite key (subject, predicate, object,
  relation, provided_by) — parallel edges with different keys survive
  (MultiDiGraph semantics), and non-key edge properties (type, scores,
  per-source channels) are carried on the kept row (first-wins by
  source_rank), matching KGX's property-preserving merge.
- Graph stats (A1, merge.yaml:114-122): counts per category /
  provided_by / predicate.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from kg_covid_19_ray.stages.dedup import (_row_bucket,
                                          resolve_num_buckets)

EDGE_KEY = ["subject", "predicate", "object", "relation", "provided_by"]


@dataclass
class SourceSpec:
    name: str
    nodes: ray.data.Dataset
    edges: ray.data.Dataset
    node_categories: list[str] | None = None   # whitelist, merge.yaml:27-33
    edge_predicates: list[str] | None = None   # whitelist, merge.yaml:34-41


@dataclass
class MergeConfig:
    sources: list[SourceSpec]
    # operations (merge.yaml:42-47): [("remap_node_identifier",
    #   {"category": ..., "alternative_property": ..., "prefix": ...})]
    operations: list[tuple[str, dict]] = field(default_factory=list)
    # typed property columns (reference merge.yaml:128-144
    # ``property_types: xsd:float`` on score columns): the schema-union
    # carries every column as string so heterogeneous sources align;
    # columns declared here are cast back to their Arrow type AFTER the
    # unify / dedup, so numeric edge properties (combined_score etc.)
    # leave merge() typed instead of as strings downstream consumers
    # must re-parse. Applied to nodes and edges alike (absent columns
    # are ignored).
    property_types: dict[str, str] = field(default_factory=dict)


_XSD_ARROW_TYPES = {
    "xsd:float": pa.float64(), "xsd:double": pa.float64(),
    "xsd:decimal": pa.float64(),
    "xsd:int": pa.int64(), "xsd:integer": pa.int64(),
    "xsd:long": pa.int64(),
    "xsd:boolean": pa.bool_(),
}


def _cast_declared_properties(ds: ray.data.Dataset,
                              property_types: dict[str, str]
                              ) -> ray.data.Dataset:
    """Cast declared property columns from the union's all-strings
    representation back to typed Arrow columns. Empty strings (the
    null-fill of sources lacking the column) become nulls, never cast
    errors; an unknown xsd type raises immediately."""
    if not property_types:
        return ds
    want = {c: _XSD_ARROW_TYPES[t] for c, t in property_types.items()}

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cols = {}
        for name in batch.column_names:
            col = batch[name]
            target = want.get(name)
            if target is not None and col.type != target:
                if pa.types.is_string(col.type):
                    col = pc.if_else(pc.equal(col, pa.scalar("")),
                                     pa.scalar(None, pa.string()), col)
                col = pc.cast(col, target)
            cols[name] = col
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def _union_with_schema_union(tables: list[ray.data.Dataset],
                             ranks: list[int],
                             all_cols: list[str] | None = None
                             ) -> ray.data.Dataset:
    """Union heterogeneous per-source Datasets: sorted-union column
    set, missing columns null-filled, plus a ``source_rank`` order
    column (A3 + the explicit rank replacing file order).

    ``all_cols`` lets the caller supply the column union computed from
    pre-filter schemas (a fully-filtered-out source has no schema)."""
    if all_cols is None:
        all_cols = sorted({c for t in tables
                           for c in t.schema(fetch_if_missing=True).names})

    def conform(rank: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for c in all_cols:
                if c in batch.column_names:
                    col = batch[c]
                    if not pa.types.is_string(col.type):
                        import pyarrow.compute as pc
                        col = pc.cast(col, pa.string())
                    cols[c] = col
                else:
                    cols[c] = pa.nulls(n, pa.string())
            cols["source_rank"] = pa.array([rank] * n, pa.int64())
            return pa.table(cols)
        return fn

    conformed = [t.map_batches(conform(r), batch_format="pyarrow")
                 for t, r in zip(tables, ranks)]
    out = conformed[0]
    for t in conformed[1:]:
        out = out.union(t)
    return out


def _first_nonempty_unify(ds: ray.data.Dataset, key: str,
                          order_col: str,
                          num_buckets: int | None = None
                          ) -> ray.data.Dataset:
    """D3 property-merge: one row per key; every column takes its first
    non-empty value in ``order_col`` order. Hash-bucketed two-phase
    reduce (combiner per block, then per-bucket reduce) — same scale
    shape as stages/dedup.first_wins, but merging per COLUMN instead
    of taking the whole first row."""
    num_buckets = resolve_num_buckets(num_buckets)

    def merge_table(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        df = batch.to_pandas()
        df = df.sort_values([key, order_col], kind="mergesort")
        value_cols = [c for c in df.columns
                      if c not in (key, "__bucket")]
        # first non-empty per column within each key group
        cleaned = df[value_cols].replace("", np.nan)
        agg = cleaned.groupby(df[key], sort=False).first()
        agg.index.name = key
        out = agg.reset_index()
        if "__bucket" in df.columns:
            out["__bucket"] = df.groupby(df[key], sort=False)["__bucket"] \
                                .first().to_numpy()
        # strip pandas schema metadata: its nested dict is unhashable
        # and triggers Ray's "Failed to hash the schemas" warning in
        # every downstream shuffle
        tbl = pa.Table.from_pandas(out, preserve_index=False) \
                      .replace_schema_metadata(None)
        # all-NaN columns come back as double: cast to the input types
        in_types = {f.name: f.type for f in batch.schema}
        cols = {}
        for name in tbl.column_names:
            col = tbl[name]
            want = in_types.get(name)
            if want is not None and col.type != want:
                col = pc.cast(col, want)
            cols[name] = col
        return pa.table(cols)

    def combine(batch: pa.Table) -> pa.Table:
        merged = merge_table(batch)
        return merged.append_column(
            "__bucket", _row_bucket(merged, [key], num_buckets))

    combined = ds.map_batches(combine, batch_format="pyarrow")
    reduced = combined.groupby("__bucket").map_groups(
        merge_table, batch_format="pyarrow")
    return reduced.drop_columns(["__bucket"])


# Above this many (old_id, new_id) pairs the remap table no longer
# belongs on the driver / in every worker's heap: the rewrite switches
# from a broadcast dict to bucketed hash substitutions. Overridable for
# tests via KG_RAY_REMAP_BROADCAST_MAX.
REMAP_BROADCAST_MAX = 2_000_000


def _remap_broadcast_max() -> int:
    import os
    return int(os.environ.get("KG_RAY_REMAP_BROADCAST_MAX",
                              str(REMAP_BROADCAST_MAX)))


def _subst_column(rows: ray.data.Dataset, key_col: str,
                  mapping: ray.data.Dataset, *,
                  num_buckets: int | None = None
                  ) -> ray.data.Dataset:
    """``rows[key_col] <- mapping.new_id where rows[key_col] ==
    mapping.old_id``, all other columns carried through unchanged.

    Bucketed merge, not ``Dataset.join`` (the pinned-bucket
    substitution of stages/cluster._subst generalized to arbitrary row
    schemas): row copies route by ``hash(key) % B``, mapping rows by
    ``hash(old_id) % B``, so every row meets its mapping in its own
    bucket. Empty buckets keep the schema; a hot mapping value costs
    one row per bucket; the mapping never lands on the driver."""
    num_buckets = resolve_num_buckets(num_buckets)
    schema = rows.schema(fetch_if_missing=True)  # ray.data.Schema
    row_cols = list(schema.names)
    types = dict(zip(schema.names, schema.types))

    def route_rows(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in row_cols}
        cols["__map_new"] = pa.nulls(batch.num_rows, pa.string())
        cols["__kind"] = pa.array(["r"] * batch.num_rows, pa.string())
        cols["__bucket"] = _row_bucket(batch, [key_col], num_buckets)
        return pa.table(cols)

    def route_map(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keyed = pa.table({key_col: batch["old_id"]})
        cols = {}
        for c in row_cols:
            cols[c] = batch["old_id"] if c == key_col \
                else pa.nulls(n, types[c])
        cols["__map_new"] = batch["new_id"]
        cols["__kind"] = pa.array(["m"] * n, pa.string())
        cols["__bucket"] = _row_bucket(keyed, [key_col], num_buckets)
        return pa.table(cols)

    both = rows.map_batches(route_rows, batch_format="pyarrow").union(
        mapping.map_batches(route_map, batch_format="pyarrow"))

    def merge_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        m = df[df["__kind"] == "m"]
        r = df[df["__kind"] == "r"]
        sub = r[key_col].map(dict(zip(m[key_col], m["__map_new"])))
        r = r[row_cols].copy()
        r[key_col] = sub.where(sub.notna(), r[key_col]).to_numpy()
        out = pa.Table.from_pandas(r, preserve_index=False) \
            .replace_schema_metadata(None)
        # all-null columns round-trip pandas as double: cast back
        cols = {}
        for c in row_cols:
            col = out[c]
            cols[c] = col if col.type == types[c] \
                else col.cast(types[c])
        return pa.table(cols)

    return both.groupby("__bucket").map_groups(
        merge_bucket, batch_format="pyarrow")


def remap_node_identifier(nodes: ray.data.Dataset,
                          edges: ray.data.Dataset, *,
                          category: str, alternative_property: str,
                          prefix: str,
                          broadcast_max: int | None = None
                          ) -> tuple[ray.data.Dataset,
                                                ray.data.Dataset]:
    """J3 (merge.yaml:42-47 / KGX remap_node_identifier): for nodes of
    ``category`` whose ``alternative_property`` (pipe-joined xrefs)
    holds a CURIE with ``prefix``, rewrite the node id to that xref —
    and every edge endpoint referencing the old id.

    Two physical plans behind one semantic (round-3 VERDICT item 3):

    - map <= REMAP_BROADCAST_MAX pairs: broadcast dict via ``ray.put``
      read inside ``map_batches`` (the reference loads its map fully in
      memory too — string_ppi.py:61-132);
    - larger maps: three bucketed hash substitutions (nodes.id,
      edges.subject, edges.object) via ``_subst_column`` — the
      reference's real use remaps ALL ENSEMBL protein ids, a map
      proportional to node count that must never be driver-collected.

    Conflicting pairs (same old_id seen with different xrefs across
    per-source duplicates) are pinned min-new_id-wins on BOTH paths, so
    the plans are value-identical."""
    import ray

    def build_map(batch: pa.Table) -> pa.Table:
        olds, news = [], []
        cats = batch["category"].to_pylist() \
            if "category" in batch.column_names else [None] * batch.num_rows
        alts = batch[alternative_property].to_pylist() \
            if alternative_property in batch.column_names else \
            [None] * batch.num_rows
        for nid, cat, alt in zip(batch["id"].to_pylist(), cats, alts):
            if cat != category or not alt:
                continue
            for x in str(alt).split("|"):
                if x.startswith(prefix + ":"):
                    olds.append(nid)
                    news.append(x)
                    break
        t = pa.table({"old_id": pa.array(olds, pa.string()),
                      "new_id": pa.array(news, pa.string())})
        # per-block combine: min new_id per old_id
        agg = t.group_by("old_id", use_threads=False).aggregate(
            [("new_id", "min")])
        return agg.rename_columns(["old_id", "new_id"])

    pairs = nodes.map_batches(build_map, batch_format="pyarrow") \
        .materialize()
    n_pairs = pairs.count()

    if broadcast_max is None:
        broadcast_max = _remap_broadcast_max()
    if n_pairs > broadcast_max:
        # global min-new_id per old_id (blocks may disagree), then the
        # three bucketed substitutions; the map stays distributed
        from kg_covid_19_ray.stages.dedup import first_wins
        mapping = first_wins(pairs, ["old_id"], "new_id")
        nodes = _subst_column(nodes, "id", mapping)
        edges = _subst_column(edges, "subject", mapping)
        edges = _subst_column(edges, "object", mapping)
        return nodes, edges

    remap: dict[str, str] = {}
    for r in pairs.take_all():
        prev = remap.get(r["old_id"])
        if prev is None or r["new_id"] < prev:
            remap[r["old_id"]] = r["new_id"]
    remap_ref = ray.put(remap)

    def rewrite(cols: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            from kg_covid_19_ray.stages.linking import map_distinct
            m = ray.get(remap_ref)
            if not m:
                return batch
            out = {}
            for c in batch.column_names:
                if c in cols:
                    # dictionary-encode -> map distinct -> take: cost
                    # scales with distinct ids per batch, not rows
                    out[c] = map_distinct(batch[c],
                                          lambda v: m.get(v, v))
                else:
                    out[c] = batch[c]
            return pa.table(out)
        return fn

    nodes = nodes.map_batches(rewrite(["id"]), batch_format="pyarrow")
    edges = edges.map_batches(rewrite(["subject", "object"]),
                              batch_format="pyarrow")
    return nodes, edges


_OPERATIONS = {"remap_node_identifier": remap_node_identifier}


def _filter_in(ds: ray.data.Dataset, column: str,
               allowed: list[str]) -> ray.data.Dataset:
    """Vectorized whitelist filter (merge.yaml:27-41): pc.is_in inside
    map_batches, not a per-row Python predicate."""
    value_set = pa.array(sorted(allowed), pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.is_in(batch[column], value_set=value_set))

    return ds.map_batches(fn, batch_format="pyarrow")


def merge(config: MergeConfig) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Run the config-driven merge: filter -> schema-union -> ops ->
    node unify (D3) + edge exact dedup -> (nodes, edges)."""
    node_tables, edge_tables, ranks = [], [], []
    node_cols: set[str] = set()
    edge_cols: set[str] = set()
    for rank, spec in enumerate(config.sources):
        nodes, edges = spec.nodes, spec.edges
        node_cols.update(nodes.schema(fetch_if_missing=True).names)
        edge_cols.update(edges.schema(fetch_if_missing=True).names)
        if spec.node_categories is not None:
            nodes = _filter_in(nodes, "category", spec.node_categories)
        if spec.edge_predicates is not None:
            edges = _filter_in(edges, "predicate", spec.edge_predicates)
        node_tables.append(nodes)
        edge_tables.append(edges)
        ranks.append(rank)

    nodes = _union_with_schema_union(node_tables, ranks, sorted(node_cols))
    edges = _union_with_schema_union(edge_tables, ranks, sorted(edge_cols))

    for op_name, kwargs in config.operations:
        nodes, edges = _OPERATIONS[op_name](nodes, edges, **kwargs)

    nodes = _first_nonempty_unify(nodes, "id", "source_rank") \
        .drop_columns(["source_rank"])
    # Edge dedup must PRESERVE edge properties (type, combined_score,
    # the per-source channel columns...) — the reference's KGX merge
    # carries them into the merged graph. distinct() drops non-key
    # columns, so dedup is a first-wins reduce keyed on the composite
    # EDGE_KEY with source_rank as the deterministic order.
    from kg_covid_19_ray.stages.dedup import first_wins
    edges = first_wins(edges, EDGE_KEY, "source_rank") \
        .drop_columns(["source_rank"])
    nodes = _cast_declared_properties(nodes, config.property_types)
    edges = _cast_declared_properties(edges, config.property_types)
    return nodes, edges


def graph_stats(nodes: ray.data.Dataset,
                edges: ray.data.Dataset) -> dict[str, dict]:
    """A1 (merge.yaml:114-122 generate_graph_stats): small driver-side
    summary dict from distributed aggregates."""
    from ray.data.aggregate import Count
    node_counts = nodes.groupby("category").aggregate(
        Count(alias_name="n")).take_all()
    edge_counts = edges.groupby("predicate").aggregate(
        Count(alias_name="n")).take_all()
    by_provider = edges.groupby("provided_by").aggregate(
        Count(alias_name="n")).take_all()
    return {
        "node_stats": {r["category"]: r["n"] for r in node_counts},
        "edge_stats": {r["predicate"]: r["n"] for r in edge_counts},
        "edges_by_source": {r["provided_by"]: r["n"] for r in by_provider},
        "total_nodes": sum(r["n"] for r in node_counts),
        "total_edges": sum(r["n"] for r in edge_counts),
    }
