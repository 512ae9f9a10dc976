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
from kg_covid_19_ray.stages.dedup import (
    distinct,
    distinct_within_blocks,
    first_wins,
)
from kg_covid_19_ray.stages.extract import extract_text
from kg_covid_19_ray.stages.linking import link_mentions_batch, make_canonicalize
from kg_covid_19_ray.stages.mentions import detect_mentions
from kg_covid_19_ray.functions.arrow_meta import read_parquet_clean

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


def pages_dataset(source: str) -> ray.data.Dataset:
    """Resolve a pages input: a directory of pages parquet (realistic
    crawl-dump path, used by bench) or a testdata sf dir (pages
    synthesized on the fly from documents.parquet)."""
    import os
    if os.path.isdir(source) and (
            os.path.exists(os.path.join(source, "_SUCCESS"))
            or any(f.endswith(".parquet") and not f.startswith("documents")
                   for f in os.listdir(source))
    ) and not os.path.exists(os.path.join(source, "documents.parquet")):
        return read_parquet_clean(
            source, columns=["url", "warc_ts", "html", "lang"])
    return read_pages(source)


def extracted_docs(source: str | ray.data.Dataset) -> ray.data.Dataset:
    """pages -> extracted (url, warc_ts, lang, doc_id, title, text)."""
    pages = source if isinstance(source, ray.data.Dataset) else pages_dataset(source)
    return extract_text(pages)


def canonical_mentions(source: str | ray.data.Dataset,
                       *, detector_concurrency=(1, 32),
                       batch_size: int = 2048) -> ray.data.Dataset:
    """-> Dataset(doc_id, gaz_idx, surface, curie, name, category,
    order_key): linked + SSSOM-normalized + cluster-remapped mentions.
    ``source`` may be an sf dir, a pages parquet dir, or an
    already-extracted docs Dataset (carrying doc_id + text)."""
    if isinstance(source, ray.data.Dataset):
        docs = source
    else:
        docs = extracted_docs(source)
    # project early: the mention branch only needs (doc_id, text)
    docs = docs.select_columns(["doc_id", "text"])
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


def mention_edges(mentions: ray.data.Dataset, *,
                  copartitioned: bool = True) -> ray.data.Dataset:
    """distinct (page, term) -> biolink:mentions edge rows (D2;
    scibite_cord.py:220-232 edge assembly).

    Dedup runs on the NARROW key (doc_id:int64, curie) BEFORE the
    constant columns are attached. ``copartitioned=True`` (the default
    for detector-produced mention tables): all of a page's mentions
    live in one block, so dedup is block-local and SHUFFLE-FREE
    (``distinct_within_blocks``). For any OTHER layout — a
    repartitioned/reloaded mention table, or when the env flag
    ``KG_RAY_SAFE_DEDUP=1`` forces it — pass/force
    ``copartitioned=False`` to run the shuffled exact ``distinct``.
    The co-partitioning claim is checkable at runtime with
    ``stages.dedup.assert_blockwise_unique`` (exercised in tests)."""
    import os
    if os.environ.get("KG_RAY_SAFE_DEDUP") == "1":
        copartitioned = False
    if copartitioned:
        pairs = distinct_within_blocks(mentions, ["doc_id", "curie"])
    else:
        pairs = distinct(mentions.select_columns(["doc_id", "curie"]),
                         ["doc_id", "curie"])

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

    return pairs.map_batches(assemble, batch_format="pyarrow")


def kg_nodes(source: str | ray.data.Dataset,
             mentions: ray.data.Dataset | None = None) -> ray.data.Dataset:
    """Publication node per page + first-wins term nodes (D1/D3/ST6).
    ``source``: sf dir / pages dir / extracted-docs Dataset."""
    docs = source if isinstance(source, ray.data.Dataset) else extracted_docs(source)

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

    # project early: the publication branch needs only (doc_id, title)
    pubs = docs.select_columns(["doc_id", "title"]) \
               .map_batches(pub_nodes, batch_format="pyarrow")

    if mentions is None:
        mentions = canonical_mentions(source)

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


def build_kg(source: str | ray.data.Dataset, *, sort_output: bool = False,
             materialize_mentions: bool = False,
             share: str = "none", checkpoint_dir: str | None = None,
             source_key: str | None = None, metrics=None):
    """-> (nodes Dataset, edges Dataset).

    ``metrics``: optional ``state.metrics.Metrics`` — taps the mention
    stream before and after edge dedup, so
    ``metrics.dedup_hits("mention_dedup")`` reports dropped duplicates
    after the run.

    ``sort_output`` adds the O5 deterministic final sort (a full shuffle;
    enable for materialized exports, skip for order-insensitive
    consumers).

    The DAG consumes the extracted docs twice (mention branch +
    publication-node branch) and the mention table twice (edge dedup +
    term-node dedup). ``share`` controls how that fan-out is executed:

    - ``"none"``: pure streaming; each consumer re-runs its lineage.
      Right for one-shot single-output runs.
    - ``"materialize"``: pin extracted docs in the object store (spills
      under pressure). Right when both outputs are consumed in one
      session at moderate scale (bench).
    - ``"checkpoint"``: write extracted docs through
      ``state.checkpoint.run_stage`` under ``checkpoint_dir`` —
      the resumable, any-scale path (re-runs skip extraction entirely).

    ``materialize_mentions`` additionally pins the narrow mention
    table. Measured guidance (sf0.1, 32 cpus): leave it OFF — pinning
    72M mention rows costs an object-store round trip and breaks
    operator fusion (the fused detect chain re-run per branch is
    cheaper: 28.6s vs 41s for both outputs).
    """
    if share == "checkpoint":
        from kg_covid_19_ray.state.checkpoint import (
            fingerprint_for_path, run_stage)
        assert checkpoint_dir, "share='checkpoint' needs checkpoint_dir"
        # source_key lets a Dataset input (e.g. a WARC-dir read) carry
        # its originating path so the checkpoint fingerprint tracks the
        # real input files rather than the opaque "<dataset>" key
        src_key = source_key or (
            source if isinstance(source, str) else "<dataset>")
        docs = run_stage(
            checkpoint_dir, "extracted_docs",
            fingerprint_for_path(src_key, "extract-v1"),
            lambda: extracted_docs(source), inputs=[src_key])
    elif share == "materialize":
        # project BEFORE pinning: downstream needs only (doc_id, title,
        # text) — url/warc_ts/lang never leave this stage, so they
        # shouldn't occupy object-store memory
        docs = extracted_docs(source) \
            .select_columns(["doc_id", "title", "text"]).materialize()
    else:
        docs = extracted_docs(source)

    mentions = canonical_mentions(docs)
    if materialize_mentions:
        # edge dedup needs (doc_id, curie); term dedup needs
        # (curie, name, category, order_key) — `surface` is dead weight
        mentions = mentions.drop_columns(["surface"]).materialize()
    edge_input = mentions
    if metrics is not None:
        from kg_covid_19_ray.state.metrics import metered
        edge_input = metered(edge_input, "mention_dedup.in", metrics)
    edges = mention_edges(edge_input)
    if metrics is not None:
        from kg_covid_19_ray.state.metrics import metered
        edges = metered(edges, "mention_dedup.out", metrics)
    nodes = kg_nodes(docs, mentions=mentions)
    if sort_output:
        nodes = nodes.sort("id")
        edges = edges.sort(["subject", "object"])
    return nodes, edges
