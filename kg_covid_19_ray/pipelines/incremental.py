"""Incremental KG construction: shard-wise checkpointed builds + merge.

The reference rebuilds its whole graph on every run (``run.py
transform`` + cat-merge re-read every source; the only resume story is
the raw-download cache, download_utils.py:50-56). Real crawl-scale KG
maintenance is incremental: a new crawl delta arrives, only that delta
is transformed, and the merged graph is updated — the transform cost of
history is never paid twice.

Model here (north-rule "resumable from checkpoint with per-partition
lineage + metrics" taken one step further — resumable AND extendable):

- The page corpus is partitioned into deterministic SHARDS. The
  production shape is IMPLEMENTED: pass a list of crawl-dump parquet
  directories and each shard reads only its own dir
  (``build_crawl_shard`` — no full-corpus re-read, shard cost ∝ shard
  size); a single corpus dir falls back to the ``doc_id % modulus``
  filter stand-in used by the fixed sf test tables.
- Per shard, the flagship chain runs once and its three artifacts are
  checkpointed via ``state.checkpoint.run_stage`` (partitioned parquet
  + lineage manifest): ``edges`` (shard-locally deduped), ``pub_nodes``,
  and ``term_nodes_keyed`` (shard-local first-wins WITH the explicit
  ``order_key`` retained).
- The merge is pure dataflow over checkpoints: edge shards are
  DISJOINT by construction (an edge's subject is ``WEB:<doc_id>`` and
  shards partition doc_ids), so edges = plain union, no shuffle; term
  nodes need one ``first_wins`` reduce over the keyed shard tables —
  min(order_key) composes associatively, so shard-local-then-global
  first-wins is EXACTLY the from-scratch result.

Equality with the from-scratch build is therefore structural, and it is
enforced: the ``kg_incr_edges`` / ``kg_incr_nodes`` driver queries
share the from-scratch oracle SQL (kg_queries ``_EDGES_SELECT`` /
``_NODES_SELECT``), and tests/test_incremental.py pins Dataset-level
equality plus the resume path (second run hits every manifest and
re-runs nothing).

Shard identity is stable under growth: the corpus is split by a FIXED
``modulus`` (production: one parquet directory per crawl dump), and a
build covers an explicit ``shard_ids`` subset. Adding a new crawl =
appending one shard id — history shards resume from their manifests
untouched; only the new shard is computed (pinned by
tests/test_incremental.py::test_adding_a_shard_reuses_history).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kg_covid_19_ray.pipelines.flagship import (
    canonical_mentions,
    extracted_docs,
    mention_edges,
)
from kg_covid_19_ray.sources import gazetteer as gz
from kg_covid_19_ray.stages.dedup import first_wins
from kg_covid_19_ray.state.checkpoint import fingerprint_for_path, run_stage

NODE_COLUMNS = ["id", "name", "category", "provided_by"]


def default_checkpoint_root(source: str) -> str:
    key = hashlib.md5(os.path.abspath(source).encode()).hexdigest()[:12]
    return os.path.join("/tmp/kg_ray_incr", key)


def _code_fingerprint() -> str:
    """Engine-code component of the shard fingerprint: a change to ANY
    package source invalidates cached shard artifacts. Without this, a
    default-root checkpoint written by an older engine build would keep
    serving stale (and now wrong) results — resume must never outlive
    the code that produced it."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.md5()
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames.sort()
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for name in sorted(filenames):
            if not name.endswith(".py"):
                continue
            p = os.path.join(dirpath, name)
            st = os.stat(p)
            h.update(f"{os.path.relpath(p, pkg)}:{st.st_mtime:.0f}:"
                     f"{st.st_size}".encode())
    return h.hexdigest()[:12]


def _shard_docs(docs: ray.data.Dataset, shard: int,
                modulus: int) -> ray.data.Dataset:
    """Deterministic shard selector over extracted docs. Blocks keep
    their layout (filter only), so the detector's per-page in-block
    invariant — and with it the shuffle-free edge dedup — holds
    unchanged within a shard."""

    def keep(batch: pa.Table) -> pa.Table:
        # no modulo kernel in pyarrow.compute; int64 -> numpy is zero-copy
        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return batch.filter(pa.array(ids % modulus == shard))

    return docs.map_batches(keep, batch_format="pyarrow")


def _pub_nodes(docs: ray.data.Dataset) -> ray.data.Dataset:
    def assemble(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        doc_id = batch["doc_id"]
        if isinstance(doc_id, pa.ChunkedArray):
            doc_id = doc_id.combine_chunks()
        return pa.table({
            "id": pc.binary_join_element_wise(
                pa.array(["WEB"] * n), pc.cast(doc_id, pa.string()), ":"),
            "name": pc.cast(batch["title"], pa.string()),
            "category": pa.array(["biolink:Publication"] * n),
            "provided_by": pa.array([gz.PROVIDED_BY] * n),
        })

    return docs.select_columns(["doc_id", "title"]) \
               .map_batches(assemble, batch_format="pyarrow")


def _term_nodes_keyed(mentions: ray.data.Dataset) -> ray.data.Dataset:
    """Shard-local first-wins term nodes, ``order_key`` RETAINED so the
    cross-shard merge can re-reduce exactly."""

    def rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "id": pc.cast(batch["curie"], pa.string()),
            "name": pc.cast(batch["name"], pa.string()),
            "category": pc.cast(batch["category"], pa.string()),
            "provided_by": pa.array([gz.PROVIDED_BY] * n),
            "order_key": batch["order_key"],
        })

    return first_wins(mentions.map_batches(rows, batch_format="pyarrow"),
                      ["id"], "order_key")


def build_shard(source: str, checkpoint_root: str, shard: int,
                modulus: int) -> dict[str, ray.data.Dataset]:
    """Run (or resume) one shard's flagship chain; returns the three
    checkpoint-backed merge artifacts. Each stage is its own
    ``run_stage`` so a crash resumes mid-shard, and the two expensive
    passes run ONCE: extraction commits a ``docs`` checkpoint, the
    detector/linker chain commits a ``mentions`` checkpoint, and the
    three artifacts are cheap derivations of those. ``modulus`` is the
    FIXED corpus partitioning; a shard's fingerprint never depends on
    which other shards a merge covers."""
    tag = f"shard{shard}of{modulus}"
    fp = fingerprint_for_path(source, "incr-v1", tag, _code_fingerprint())

    docs = run_stage(
        checkpoint_root, f"docs_{tag}", fp,
        lambda: _shard_docs(
            extracted_docs(source).select_columns(
                ["doc_id", "title", "text"]),
            shard, modulus),
        inputs=[source])
    mentions = run_stage(
        checkpoint_root, f"mentions_{tag}", fp,
        lambda: canonical_mentions(docs), inputs=[source])

    # a checkpoint-read mention table does NOT carry the detector's
    # per-page block layout, so edge dedup must take the shuffled
    # exact path (flagship.mention_edges layout contract)
    edges = run_stage(
        checkpoint_root, f"edges_{tag}", fp,
        lambda: mention_edges(mentions, copartitioned=False),
        inputs=[source])
    pubs = run_stage(
        checkpoint_root, f"pub_nodes_{tag}", fp,
        lambda: _pub_nodes(docs), inputs=[source])
    terms = run_stage(
        checkpoint_root, f"term_nodes_keyed_{tag}", fp,
        lambda: _term_nodes_keyed(mentions), inputs=[source])
    return {"edges": edges, "pub_nodes": pubs, "term_nodes_keyed": terms}


def build_crawl_shard(crawl_dir: str,
                      checkpoint_root: str) -> dict[str, ray.data.Dataset]:
    """One shard = one crawl dump directory (the PRODUCTION shape): the
    shard's pages are read from ``crawl_dir`` alone — no full-corpus
    re-read, no filter; shard cost is proportional to shard size. Shard
    identity is the crawl dir's path + content fingerprint, so
    appending new crawl dirs never invalidates history."""
    tag = "crawl_" + hashlib.md5(
        os.path.abspath(crawl_dir).encode()).hexdigest()[:10]
    fp = fingerprint_for_path(crawl_dir, "incr-v1", tag,
                              _code_fingerprint())

    docs = run_stage(
        checkpoint_root, f"docs_{tag}", fp,
        lambda: extracted_docs(crawl_dir).select_columns(
            ["doc_id", "title", "text"]),
        inputs=[crawl_dir])
    mentions = run_stage(
        checkpoint_root, f"mentions_{tag}", fp,
        lambda: canonical_mentions(docs), inputs=[crawl_dir])
    edges = run_stage(
        checkpoint_root, f"edges_{tag}", fp,
        lambda: mention_edges(mentions, copartitioned=False),
        inputs=[crawl_dir])
    pubs = run_stage(
        checkpoint_root, f"pub_nodes_{tag}", fp,
        lambda: _pub_nodes(docs), inputs=[crawl_dir])
    terms = run_stage(
        checkpoint_root, f"term_nodes_keyed_{tag}", fp,
        lambda: _term_nodes_keyed(mentions), inputs=[crawl_dir])
    return {"edges": edges, "pub_nodes": pubs, "term_nodes_keyed": terms}


def split_pages_to_crawl_dirs(source: str, out_root: str, *,
                              num_crawls: int = 4) -> list[str]:
    """Materialize an sf corpus as per-crawl page dumps (the stand-in
    that makes the driver queries exercise the production per-dir
    path): ONE partitioned-parquet pass (``partition_cols``), one
    directory per crawl, idempotent via marker. Returns the crawl
    dirs."""
    from kg_covid_19_ray.pipelines.flagship import pages_dataset

    doc_table = os.path.join(source, "documents.parquet")
    key = fingerprint_for_path(
        doc_table if os.path.exists(doc_table) else source,
        f"crawlsplit-v1:{num_crawls}")
    marker = os.path.join(out_root, f"_SUCCESS_{key}")
    dirs = [os.path.join(out_root, f"crawl={k}")
            for k in range(num_crawls)]
    if os.path.exists(marker):
        return dirs
    import shutil
    shutil.rmtree(out_root, ignore_errors=True)
    os.makedirs(out_root, exist_ok=True)

    def add_crawl(batch: pa.Table) -> pa.Table:
        # crawl key from the url's trailing doc id (pages carry no
        # doc_id column; extraction parses it the same way —
        # stages/extract.py)
        import numpy as np
        urls = batch["url"].to_pylist()
        ids = np.array([int(u.rsplit("-", 1)[1]) for u in urls], np.int64)
        return batch.append_column(
            "crawl", pa.array(ids % num_crawls, pa.int64()))

    pages_dataset(source).map_batches(add_crawl, batch_format="pyarrow") \
        .write_parquet(out_root, partition_cols=["crawl"])
    with open(marker, "w") as f:
        f.write("ok")
    return dirs


def build_kg_incremental(
    source: str | list[str],
    *,
    checkpoint_root: str | None = None,
    modulus: int = 2,
    shard_ids: list[int] | None = None,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """-> (nodes, edges), built shard-by-shard with per-shard resume.

    ``source`` as a LIST of crawl-dump directories is the production
    shape: each dir is one shard, read alone (``build_crawl_shard``).
    ``source`` as a single corpus dir is the test stand-in: shards are
    a deterministic ``doc_id % modulus`` filter over the one corpus
    (``shard_ids`` selects a subset; default all, which is
    hash-identical to ``flagship.build_kg`` over the same corpus).

    Merge cost is the part that must scale: edges and publication nodes
    are disjoint unions (zero shuffle — reading checkpoints IS the
    merge); the only exchange is the term-node ``first_wins`` over
    tables already reduced to one row per (shard, term) — bounded by
    ``num_shards × |gazetteer|`` rows, not by corpus size."""
    if isinstance(source, list):
        if checkpoint_root is None:
            checkpoint_root = default_checkpoint_root(
                "|".join(os.path.abspath(d) for d in source))
        shards = [build_crawl_shard(d, checkpoint_root) for d in source]
    else:
        if checkpoint_root is None:
            checkpoint_root = default_checkpoint_root(source)
        if shard_ids is None:
            shard_ids = list(range(modulus))
        shards = [build_shard(source, checkpoint_root, k, modulus)
                  for k in shard_ids]

    edges = shards[0]["edges"]
    pubs = shards[0]["pub_nodes"]
    terms_keyed = shards[0]["term_nodes_keyed"]
    for s in shards[1:]:
        edges = edges.union(s["edges"])
        pubs = pubs.union(s["pub_nodes"])
        terms_keyed = terms_keyed.union(s["term_nodes_keyed"])

    terms = first_wins(terms_keyed, ["id"], "order_key") \
        .drop_columns(["order_key"]).select_columns(NODE_COLUMNS)
    return pubs.union(terms), edges


def _crawl_dirs_for(sf_dir: str) -> list[str]:
    out_root = os.path.join(
        "/tmp/kg_ray_crawls",
        hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12])
    return split_pages_to_crawl_dirs(sf_dir, out_root, num_crawls=4)


def q_kg_incr_edges(sf_dir: str) -> ray.data.Dataset:
    """Incremental build through the PRODUCTION shape: the corpus is
    materialized once as per-crawl page dumps, each shard reads ONLY
    its own dir, and the merged edges share the from-scratch oracle."""
    _nodes, edges = build_kg_incremental(_crawl_dirs_for(sf_dir))
    return edges


def q_kg_incr_nodes(sf_dir: str) -> ray.data.Dataset:
    nodes, _edges = build_kg_incremental(_crawl_dirs_for(sf_dir))
    return nodes
