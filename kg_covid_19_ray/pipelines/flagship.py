"""Flagship pipeline: web pages -> merged KGX-style node/edge tables.

The Ray-Data re-expression of the reference's transform-then-merge flow
(SURVEY §3.4): where the reference runs a serial per-line loop appending
TSV lines with in-process ``seen`` sets (transform.py:41-66;
scibite_cord.py:141-232), this pipeline is a streaming Dataset DAG:

    read pages (Parquet)
      -> extract_text             (vectorized Arrow; html dropped)
      -> MentionDetector          (actor pool; gazetteer state per actor)
      -> link_mentions            (CURIE contraction, category, M11-M14)
      -> canonicalize             (SSSOM + same-as cluster remap, M15/J3)
      -> edges: distinct (subject,object)           (D2 shuffle)
         nodes: publication rows UNION term rows,
                first-wins by explicit order key    (D1/D3 shuffle)
      -> sort("id") / sort(subject,object)          (O5)

Dedup order keys replace the reference's file-order "first-wins":
``order_key = doc_id * 100 + gaz_idx`` (gaz_idx < 100), a total order
over mention rows that is stable under any parallelism.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kg_covid_19_ray.sources import gazetteer as gz
from kg_covid_19_ray.sources.pages import read_pages
from kg_covid_19_ray.stages.dedup import distinct, first_wins
from kg_covid_19_ray.stages.extract import extract_text
from kg_covid_19_ray.stages.linking import link_mentions_batch, make_canonicalize
from kg_covid_19_ray.stages.mentions import detect_mentions

MENTIONS_PREDICATE = "biolink:mentions"  # scibite_cord.py:227
MENTIONS_RELATION = "SIO:000255"  # scibite_cord.py:229
EDGE_COLUMNS = ["subject", "predicate", "object", "relation", "provided_by"]
NODE_COLUMNS = ["id", "name", "category", "provided_by"]


def _doc_curie(doc_id_col) -> pa.Array:
    """``WEB:<doc_id>`` — the page analog of ``CORD:<paper_id>``
    (scibite_cord.py:178)."""
    n = len(doc_id_col)
    return pc.binary_join_element_wise(
        pa.array(["WEB"] * n), pc.cast(doc_id_col, pa.string()), ":")


def extracted_docs(sf_dir: str, *, concurrency=None) -> ray.data.Dataset:
    """pages -> extracted (url, warc_ts, lang, doc_id, title, text)."""
    return extract_text(read_pages(sf_dir))


def canonical_mentions(sf_dir: str, *, detector_concurrency=(2, 8),
                       batch_size: int = 2048) -> ray.data.Dataset:
    """-> Dataset(doc_id, gaz_idx, surface, curie, name, category,
    order_key): linked + SSSOM-normalized + cluster-remapped mentions."""
    docs = extracted_docs(sf_dir)
    mentions = detect_mentions(docs, concurrency=detector_concurrency,
                               batch_size=batch_size)
    mentions = mentions.map_batches(link_mentions_batch, batch_format="pyarrow")
    canon = gz.sameas_canonical_map()  # static side table: driver union-find
    mentions = mentions.map_batches(
        make_canonicalize(gz.SSSOM_MAP, canon), batch_format="pyarrow")

    def add_order(batch: pa.Table) -> pa.Table:
        order = pc.add(
            pc.multiply(pc.cast(batch["doc_id"], pa.int64()), 100),
            pc.cast(batch["gaz_idx"], pa.int64()))
        return batch.append_column("order_key", order)

    return mentions.map_batches(add_order, batch_format="pyarrow")


def mention_edges(mentions: ray.data.Dataset) -> ray.data.Dataset:
    """distinct (page, term) -> biolink:mentions edge rows (D2;
    scibite_cord.py:220-232 edge assembly)."""
    def assemble(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "subject": _doc_curie(batch["doc_id"].combine_chunks()
                                  if isinstance(batch["doc_id"], pa.ChunkedArray)
                                  else batch["doc_id"]),
            "predicate": pa.array([MENTIONS_PREDICATE] * n),
            "object": pc.cast(batch["curie"], pa.string()),
            "relation": pa.array([MENTIONS_RELATION] * n),
            "provided_by": pa.array([gz.PROVIDED_BY] * n),
        })

    edges = mentions.map_batches(assemble, batch_format="pyarrow")
    return distinct(edges, EDGE_COLUMNS)


def kg_nodes(sf_dir: str,
             mentions: ray.data.Dataset | None = None) -> ray.data.Dataset:
    """Publication node per page + first-wins term nodes (D1/D3/ST6)."""
    docs = extracted_docs(sf_dir)

    def pub_nodes(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "id": _doc_curie(batch["doc_id"].combine_chunks()
                             if isinstance(batch["doc_id"], pa.ChunkedArray)
                             else batch["doc_id"]),
            "name": pc.cast(batch["title"], pa.string()),
            "category": pa.array(["biolink:Publication"] * n),
            "provided_by": pa.array([gz.PROVIDED_BY] * n),
        })

    pubs = docs.map_batches(pub_nodes, batch_format="pyarrow")

    if mentions is None:
        mentions = canonical_mentions(sf_dir)

    def term_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "id": pc.cast(batch["curie"], pa.string()),
            "name": pc.cast(batch["name"], pa.string()),
            "category": pc.cast(batch["category"], pa.string()),
            "provided_by": pa.array([gz.PROVIDED_BY] * n),
            "order_key": batch["order_key"],
        })

    terms = mentions.map_batches(term_rows, batch_format="pyarrow")
    terms = first_wins(terms, ["id"], "order_key").drop_columns(["order_key"])
    return pubs.union(terms)


def build_kg(sf_dir: str, *, sort_output: bool = False):
    """-> (nodes Dataset, edges Dataset). ``sort_output`` adds the O5
    deterministic final sort (a full shuffle; enable for materialized
    exports, skip for order-insensitive consumers)."""
    mentions = canonical_mentions(sf_dir)
    edges = mention_edges(mentions)
    nodes = kg_nodes(sf_dir, mentions=mentions)
    if sort_output:
        nodes = nodes.sort("id")
        edges = edges.sort(["subject", "object"])
    return nodes, edges
