"""KG-pipeline query registry: Ray callables + DuckDB oracle SQL.

Each entry maps a name to ``(ray_callable, oracle_sql_or_None)``.
The callable takes ``sf_dir`` and returns a Dataset / DataFrame / Arrow
Table; the SQL runs on the driver's pre-registered DuckDB views of the
same parquet tables. Column names match EXACTLY between both sides
(driver hashes values after sorting columns by name).

The oracle re-derives the whole dataflow independently (detection scan,
SSSOM normalize, same-as closure via recursive CTE, dedup, aggregation);
only the static gazetteer VALUES (with pre-contracted CURIEs,
unit-tested separately) are shared — see sources/gazetteer.py.
"""

from __future__ import annotations

import ray.data
from ray.data.aggregate import Count

from kg_covid_19_ray.sources import gazetteer as gz
from kg_covid_19_ray.pipelines.flagship import (
    build_kg,
    canonical_mentions,
    extracted_docs,
    mention_edges,
)
from kg_covid_19_ray.stages.cluster import connected_components
from kg_covid_19_ray.stages.linking import link_mentions_batch
from kg_covid_19_ray.stages.mentions import detect_mentions


def q_kg_mentions(sf_dir: str):
    """Linked mentions, pre-normalization (M10 + M11-M14)."""
    docs = extracted_docs(sf_dir)
    m = detect_mentions(docs).map_batches(link_mentions_batch,
                                          batch_format="pyarrow")
    return m.select_columns(["doc_id", "surface", "curie"])


def q_kg_edges(sf_dir: str):
    """Final deduped, canonicalized mention edges (D2 + M15 + J3)."""
    return mention_edges(canonical_mentions(sf_dir))


def q_kg_nodes(sf_dir: str):
    """Final merged node table: publications + first-wins terms (D1/D3)."""
    nodes, _ = build_kg(sf_dir)
    return nodes


def q_kg_node_stats(sf_dir: str):
    """Graph-stats aggregate (A1; merge.yaml:114-122 analog)."""
    nodes, _ = build_kg(sf_dir)
    return nodes.groupby(["category", "provided_by"]).aggregate(
        Count(alias_name="n"))


def q_kg_degrees(sf_dir: str):
    """Term in-degree over deduped mention edges (A2;
    make_holdouts.py:269-281 value_counts analog)."""
    edges = mention_edges(canonical_mentions(sf_dir))
    return edges.groupby("object").aggregate(Count(alias_name="degree"))


def q_kg_components(sf_dir: str):
    """Distributed connected components over the same-as table —
    label-propagation union-find (north star); oracle = recursive CTE."""
    edges = ray.data.from_items(
        [{"a": a, "b": b} for a, b in gz.SAMEAS_EDGES])
    return connected_components(edges, num_partitions=2)


def _with(select: str) -> str:
    return f"WITH RECURSIVE {gz.mentions_ctes()} {select}"


_NODES_SELECT = """
SELECT 'WEB:' || CAST(doc_id AS VARCHAR) AS id,
       'Doc ' || CAST(doc_id AS VARCHAR) AS name,
       'biolink:Publication' AS category,
       '{provided_by}' AS provided_by
FROM documents
UNION ALL
SELECT curie AS id,
       arg_min(name, doc_id * 100 + gaz_idx) AS name,
       arg_min(category, doc_id * 100 + gaz_idx) AS category,
       '{provided_by}' AS provided_by
FROM mentions GROUP BY curie
""".format(provided_by=gz.PROVIDED_BY)

_EDGES_SELECT = """
SELECT DISTINCT 'WEB:' || CAST(doc_id AS VARCHAR) AS subject,
       'biolink:mentions' AS predicate,
       curie AS object,
       'SIO:000255' AS relation,
       '{provided_by}' AS provided_by
FROM mentions
""".format(provided_by=gz.PROVIDED_BY)


REGISTRY: dict = {
    "kg_mentions": (
        q_kg_mentions,
        _with("SELECT doc_id, surface, curie FROM mentions_raw"),
    ),
    "kg_edges": (q_kg_edges, _with(_EDGES_SELECT)),
    "kg_nodes": (q_kg_nodes, _with(_NODES_SELECT)),
    "kg_node_stats": (
        q_kg_node_stats,
        _with(f"SELECT category, provided_by, count(*) AS n "
              f"FROM ({_NODES_SELECT}) GROUP BY category, provided_by"),
    ),
    "kg_degrees": (
        q_kg_degrees,
        _with(f"SELECT object, count(*) AS degree "
              f"FROM ({_EDGES_SELECT}) GROUP BY object"),
    ),
    "kg_components": (
        q_kg_components,
        _with("SELECT member, canon FROM canon"),
    ),
}
