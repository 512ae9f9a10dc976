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
from kg_covid_19_ray.functions.arrow_meta import read_parquet_clean


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
    quotient-graph contraction union-find (north star); oracle =
    recursive CTE. num_partitions derives from cluster CPUs."""
    edges = ray.data.from_items(
        [{"a": a, "b": b} for a, b in gz.SAMEAS_EDGES])
    return connected_components(edges)


COOCCUR_PREDICATE = "biolink:correlated_with"  # scibite_cord.py:327-340


def q_kg_cooccurrence(sf_dir: str):
    """Term-term co-occurrence edges (M6 pairwise exploder + D2 pair
    dedup, scibite_cord.py:327-340 / intact.py:175-230 semantics)."""
    return _cooccur_counts(
        canonical_mentions(sf_dir).select_columns(["doc_id", "curie"]))


def _cooccur_counts(m: ray.data.Dataset):
    """One ``correlated_with`` edge per unordered pair of canonical
    terms co-mentioned in a document, weighted by document count.

    Pairwise explosion is block-local (a page's mentions live in one
    block — same invariant as mention_edges, preserved by
    ``materialize()`` for callers that pin ``m``); pair counts are
    pre-aggregated per batch (combiner) so the shuffle moves one row
    per distinct pair per block.

    Round-4 rewrite (VERDICT item 6): the pair explosion is the
    triangles repeat/cumsum construction — zero per-doc Python — and
    the final reduce is a hash-bucket exchange + ONE pyarrow group_by
    sum per bucket. Pair cardinality is the largest key space in the
    system, so Ray's ``groupby(pair).aggregate(Sum)`` (per-GROUP
    Python, NOTES.md) is exactly the wrong reduce here."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from kg_covid_19_ray.stages.dedup import resolve_num_buckets
    num_buckets = resolve_num_buckets()  # combiner-bounded exchange

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        # distinct (doc, curie), sorted: within a doc-run the curies
        # ascend, so (earlier row, later row) pairs satisfy
        # subject < object — the oracle's a.curie < b.curie
        df = batch.drop_duplicates(["doc_id", "curie"]) \
                  .sort_values(["doc_id", "curie"], kind="mergesort")
        docs = df["doc_id"].to_numpy()
        cs = df["curie"].to_numpy()
        n = len(df)
        if n == 0:
            out = pd.DataFrame({"subject": pd.Series([], dtype=object),
                                "object": pd.Series([], dtype=object)})
        else:
            # pair each row with every LATER row of its doc-run
            # (repeat/cumsum, stages/triangles.py construction)
            run_start = np.empty(n, np.bool_)
            run_start[0] = True
            run_start[1:] = docs[1:] != docs[:-1]
            run_ids = np.cumsum(run_start) - 1
            counts = np.bincount(run_ids)
            ends = np.cumsum(counts)
            c = ends[run_ids] - np.arange(n) - 1  # partners after row
            firsts = np.repeat(np.arange(n), c)
            seg = np.cumsum(c) - c
            seconds = np.arange(c.sum()) - np.repeat(seg, c) \
                + np.repeat(np.arange(n) + 1, c)
            out = pd.DataFrame({"subject": cs[firsts],
                                "object": cs[seconds]})
        agg = out.groupby(["subject", "object"], sort=False) \
                 .size().rename("n_docs").reset_index()
        h = pd.util.hash_pandas_object(agg[["subject", "object"]],
                                       index=False).to_numpy()
        agg["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int64)
        return agg

    def reduce_bucket(t: pa.Table) -> pa.Table:
        agg = t.group_by(["subject", "object"],
                         use_threads=False).aggregate([("n_docs", "sum")])
        agg = agg.rename_columns(
            ["n_docs" if c == "n_docs_sum" else c
             for c in agg.column_names])
        return agg.select(["subject", "object", "n_docs"])

    counts = m.map_batches(pairs, batch_format="pandas",
                           batch_size=None) \
              .groupby("__bucket") \
              .map_groups(reduce_bucket, batch_format="pyarrow")

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["predicate"] = COOCCUR_PREDICATE
        return batch[["subject", "predicate", "object", "n_docs"]]

    return counts.map_batches(finalize, batch_format="pandas")


_COOCCUR_SELECT = f"""
SELECT a.curie AS subject,
       '{COOCCUR_PREDICATE}' AS predicate,
       b.curie AS object,
       count(*) AS n_docs
FROM (SELECT DISTINCT doc_id, curie FROM mentions) a
JOIN (SELECT DISTINCT doc_id, curie FROM mentions) b
  ON a.doc_id = b.doc_id AND a.curie < b.curie
GROUP BY a.curie, b.curie
"""


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
    "kg_cooccurrence": (q_kg_cooccurrence, _with(_COOCCUR_SELECT)),
}


def q_kg_pagerank(sf_dir: str):
    """Integer fixed-point PageRank over the mention-edge graph
    (stages/pagerank.py): which entities does the crawl concentrate
    authority on (duplicate edges dedup for free in the setup
    exchange; mention_edges is already one row per (page, term))."""
    from kg_covid_19_ray.stages.pagerank import pagerank_fixed_point

    edges = mention_edges(canonical_mentions(sf_dir))
    return pagerank_fixed_point(edges, "subject", "object", iterations=3)


def q_kg_edges_from_warc(sf_dir: str):
    """The flagship edge table built from WARC crawl archives instead
    of the Parquet pages table (sources/warc.py): the corpus is
    materialized once as multi-member-gzip .warc.gz files (the Common
    Crawl layout), read back through the strict WARC/HTTP parser, and
    fed to the SAME extract -> detect -> link -> dedup chain — so this
    query sharing kg_edges' oracle proves the ingestion path is
    byte-faithful end to end."""
    import hashlib
    import os

    from kg_covid_19_ray.sources.warc import read_warc, write_warc_fixture
    from kg_covid_19_ray.stages.extract import extract_text

    out = os.path.join(
        "/tmp/kg_ray_warc",
        hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12])
    write_warc_fixture(sf_dir, out)
    docs = extract_text(read_warc(out))
    return mention_edges(canonical_mentions(docs))


def q_kg_remapped_edges(sf_dir: str):
    """J3 id remap (merge.yaml:42-47) through the BUCKETED-JOIN plan
    (``broadcast_max=0`` forces the three hash substitutions — the
    scale path for maps proportional to node count): every publication
    node carries a synthetic pipe-xref ``ALT:<id>``, so the remap
    rewrites each ``WEB:*`` edge subject to ``ALT:WEB:*`` through the
    REAL map-derivation + substitution code. The oracle applies the
    same rewrite in SQL, which makes the whole join path value-hash
    checkable at driver time (it was previously pytest-only)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from kg_covid_19_ray.pipelines.merge_kg import remap_node_identifier

    nodes, edges = build_kg(sf_dir)

    def add_xrefs(batch: pa.Table) -> pa.Table:
        ids = batch["id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        alt = pc.binary_join_element_wise(
            pa.array(["ALT"] * batch.num_rows), pc.cast(ids, pa.string()),
            ":")
        xr = pc.if_else(
            pc.equal(batch["category"], "biolink:Publication"),
            alt, pa.nulls(batch.num_rows, pa.string()))
        return batch.append_column("xrefs", xr)

    nodes = nodes.map_batches(add_xrefs, batch_format="pyarrow")
    _nodes2, edges2 = remap_node_identifier(
        nodes, edges, category="biolink:Publication",
        alternative_property="xrefs", prefix="ALT", broadcast_max=0)
    return edges2


def q_kg_cooccur_stats(sf_dir: str):
    """Association-measure feature table for co-occurrence edge
    weighting: (subject, object, n_pair, df_subject, df_object,
    n_docs). PMI / lift / Jaccard are one division away — left to the
    consumer so every column stays exact int64 at any corpus size (a
    pre-multiplied lift would overflow int64 at web scale).

    Dataflow: the pair table (already pre-aggregated) + a term
    doc-frequency table small enough to broadcast (one row per
    gazetteer term — the classic small side), + a driver-side scalar
    count for n_docs."""
    import numpy as np
    import pandas as pd

    m = canonical_mentions(sf_dir).select_columns(["doc_id", "curie"])
    # term doc-frequency: block-local (doc, term) pairs are unique per
    # block (detector invariant), combiner + tiny groupby
    from ray.data.aggregate import Sum

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop_duplicates(["doc_id", "curie"]) \
            .groupby("curie", sort=False).size() \
            .rename("df").reset_index()

    dfreq = m.map_batches(df_partial, batch_format="pandas",
                          batch_size=None) \
        .groupby("curie").aggregate(Sum("df", alias_name="df"))
    df_map = {r["curie"]: int(r["df"])
              for r in dfreq.iter_rows()}  # |gazetteer| rows: broadcast
    n_docs = int(read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]).count())

    pairs = _cooccur_counts(m)

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "subject": batch["subject"],
            "object": batch["object"],
            "n_pair": batch["n_docs"].astype(np.int64),
            "df_subject": batch["subject"].map(df_map).astype(np.int64),
            "df_object": batch["object"].map(df_map).astype(np.int64),
        })
        out["n_docs"] = np.int64(n_docs)
        return out

    return pairs.map_batches(attach, batch_format="pandas")


_COOCCUR_STATS_SELECT = """
SELECT p.subject, p.object,
       p.n_docs AS n_pair,
       da.df AS df_subject,
       db.df AS df_object,
       (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs
FROM ({COOCCUR}) p
JOIN (SELECT curie, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM mentions GROUP BY curie) da ON da.curie = p.subject
JOIN (SELECT curie, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM mentions GROUP BY curie) db ON db.curie = p.object
"""


def q_kg_triangles(sf_dir: str):
    """Exact triangle count of the term co-occurrence graph
    (stages/triangles.py, degree-ordered orientation): tightly-knit
    topic clusters. Input is the already-deduped co-occurrence pair
    table — at web scale the pair aggregation has done the heavy
    dedup, so the triangle stage starts from distinct edges."""
    from kg_covid_19_ray.stages.triangles import count_triangles

    cooc = q_kg_cooccurrence(sf_dir)
    return count_triangles(cooc, "subject", "object")


_TRIANGLES_SELECT = """
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM tri_pairs e1
JOIN tri_pairs e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
JOIN tri_pairs e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
"""

_TRIANGLES_CTE = """
tri_pairs AS (
  SELECT DISTINCT a.curie AS lo, b.curie AS hi
  FROM (SELECT DISTINCT doc_id, curie FROM mentions) a
  JOIN (SELECT DISTINCT doc_id, curie FROM mentions) b
    ON a.doc_id = b.doc_id AND a.curie < b.curie)
"""


def q_kg_node_triangles(sf_dir: str):
    """Per-node triangle + degree table over the co-occurrence graph —
    the exact-integer core of local clustering coefficients (which
    terms sit inside densely interlinked topic clusters vs on
    bridges)."""
    from kg_covid_19_ray.stages.triangles import node_triangle_counts

    cooc = q_kg_cooccurrence(sf_dir)
    return node_triangle_counts(cooc, "subject", "object")


_NODE_TRIANGLES_SELECT = """
SELECT d.id,
       CAST(coalesce(t.c, 0) AS BIGINT) AS triangles,
       CAST(d.n AS BIGINT) AS degree
FROM (SELECT id, count(*) AS n FROM (
        SELECT lo AS id FROM tri_pairs
        UNION ALL SELECT hi FROM tri_pairs) GROUP BY id) d
LEFT JOIN (
  SELECT id, count(*) AS c FROM (
    SELECT e1.lo AS id FROM tri_pairs e1
      JOIN tri_pairs e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
      JOIN tri_pairs e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
    UNION ALL
    SELECT e1.hi FROM tri_pairs e1
      JOIN tri_pairs e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
      JOIN tri_pairs e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
    UNION ALL
    SELECT e2.hi FROM tri_pairs e1
      JOIN tri_pairs e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
      JOIN tri_pairs e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
  ) GROUP BY id) t ON t.id = d.id
"""


KCORE_K = 5
KCORE_ROUNDS = 3


def q_kg_kcore(sf_dir: str):
    """k-core peeling of the page↔term mention graph (stages/kcore.py):
    pages citing fewer than k distinct terms peel off, term degrees
    shrink, repeat — the dense-core graph-cleaning pass. Defined as
    exactly KCORE_ROUNDS deterministic rounds (pagerank's fixed-
    iteration trick), so the unrolled SQL oracle matches bit-for-bit
    whether or not the peel has converged."""
    from kg_covid_19_ray.stages.kcore import kcore_nodes

    edges = mention_edges(canonical_mentions(sf_dir))
    return kcore_nodes(edges, "subject", "object",
                       k=KCORE_K, rounds=KCORE_ROUNDS)


def _kcore_sql(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    """Unrolled peel: degree -> alive -> edge filter, ``rounds`` times,
    then the final-degree >= k node set."""
    ctes = [
        "kc_e0 AS (SELECT DISTINCT"
        " least('WEB:' || CAST(doc_id AS VARCHAR), curie) AS lo,"
        " greatest('WEB:' || CAST(doc_id AS VARCHAR), curie) AS hi"
        " FROM mentions)",
    ]
    for i in range(rounds):
        ctes.append(
            f"kc_d{i} AS (SELECT id, count(*) AS d FROM"
            f" (SELECT lo AS id FROM kc_e{i}"
            f"  UNION ALL SELECT hi FROM kc_e{i}) GROUP BY id)")
        ctes.append(
            f"kc_a{i} AS (SELECT id FROM kc_d{i} WHERE d >= {k})")
        ctes.append(
            f"kc_e{i+1} AS (SELECT e.lo, e.hi FROM kc_e{i} e"
            f" JOIN kc_a{i} x ON x.id = e.lo"
            f" JOIN kc_a{i} y ON y.id = e.hi)")
    ctes.append(
        f"kc_d{rounds} AS (SELECT id, count(*) AS d FROM"
        f" (SELECT lo AS id FROM kc_e{rounds}"
        f"  UNION ALL SELECT hi FROM kc_e{rounds}) GROUP BY id)")
    return (", ".join(ctes)
            + f" SELECT id FROM kc_d{rounds} WHERE d >= {k}")


def _pagerank_sql(iterations: int = 3, scale: int = 1_000_000) -> str:
    """Unrolled exact-integer recurrence — bit-identical to the Ray
    side because every op is int64 (+, SUM, floor division)."""
    teleport = (scale * 15) // 100
    ctes = [
        "pr_edges AS (SELECT DISTINCT 'WEB:' || CAST(doc_id AS VARCHAR)"
        " AS src, curie AS dst FROM mentions)",
        # DISTINCT-over-UNION-ALL, not a bare UNION: inside a WITH
        # RECURSIVE clause DuckDB treats a top-level UNION CTE body as
        # recursive-iteration structure and skips the dedup
        "pr_nodes AS (SELECT DISTINCT id FROM"
        " (SELECT src AS id FROM pr_edges"
        "  UNION ALL SELECT dst FROM pr_edges))",
        "pr_outdeg AS (SELECT src, count(*) AS d FROM pr_edges"
        " GROUP BY src)",
        f"pr_r0 AS (SELECT id, CAST({scale} AS BIGINT) AS r FROM pr_nodes)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"pr_s{i} AS (SELECT e.dst AS id,"
            f" CAST(SUM(r.r // o.d) AS BIGINT) AS s"
            f" FROM pr_edges e"
            f" JOIN pr_r{i-1} r ON r.id = e.src"
            f" JOIN pr_outdeg o ON o.src = e.src GROUP BY e.dst)")
        ctes.append(
            f"pr_r{i} AS (SELECT n.id,"
            f" CAST({teleport} + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT)"
            f" AS r FROM pr_nodes n LEFT JOIN pr_s{i} s ON s.id = n.id)")
    return (", ".join(ctes)
            + f" SELECT id, r AS rank_fp FROM pr_r{iterations}")


def _register_incremental() -> None:
    """Incremental build shares the from-scratch oracles: equality with
    ``kg_nodes`` / ``kg_edges`` is the whole point of the op."""
    from kg_covid_19_ray.pipelines.incremental import (
        q_kg_incr_edges,
        q_kg_incr_nodes,
    )
    REGISTRY["kg_incr_edges"] = (q_kg_incr_edges, _with(_EDGES_SELECT))
    REGISTRY["kg_incr_nodes"] = (q_kg_incr_nodes, _with(_NODES_SELECT))


_register_incremental()
REGISTRY["kg_pagerank"] = (
    q_kg_pagerank, _with(", " + _pagerank_sql().lstrip()))
REGISTRY["kg_triangles"] = (
    q_kg_triangles,
    _with(", " + _TRIANGLES_CTE.strip() + " " + _TRIANGLES_SELECT.strip()))
REGISTRY["kg_node_triangles"] = (
    q_kg_node_triangles,
    _with(", " + _TRIANGLES_CTE.strip() + " "
          + _NODE_TRIANGLES_SELECT.strip()))
REGISTRY["kg_cooccur_stats"] = (
    q_kg_cooccur_stats,
    _with(_COOCCUR_STATS_SELECT.format(COOCCUR=_COOCCUR_SELECT)))
REGISTRY["kg_edges_from_warc"] = (q_kg_edges_from_warc,
                                  _with(_EDGES_SELECT))
REGISTRY["kg_remapped_edges"] = (
    q_kg_remapped_edges,
    _with(_EDGES_SELECT.replace("'WEB:' ||", "'ALT:WEB:' ||")))
REGISTRY["kg_kcore"] = (q_kg_kcore, _with(", " + _kcore_sql()))
