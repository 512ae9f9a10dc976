"""Zhou host-protein transform — the PDF-table source plugin (S5;
reference transform_utils/zhou_host_proteins/zhou_transform.py:30-145).

Semantics, re-derived (not ported):

- input: supplementary-figure tables from a paper PDF, extracted with
  tabula over pages 5-7 and flattened via the multi-page header-zip
  (zhou_transform.py:81-85; the engine's ``sources/pdftable`` stage);
- every table row carries (Host Gene ID, Host Protein, Coronavirus,
  PubMed ID); an unknown coronavirus name RAISES
  (zhou_transform.py:94-99);
- per row, two node lines are written with NO dedup (the reference
  appends straight to nodes.tsv): the host gene
  (``NCBIGene:<id>``, name = Host Protein, biolink:Gene) and the virus
  (``NCBITaxon:<taxon>``, name = Coronavirus, biolink:OrganismalEntity);
- per row, one edge: gene --biolink:interacts_with--> virus,
  relation RO:0002437, type biolink:Association, publication
  ``PMID:<PubMed ID>`` (zhou_transform.py:60-62,131-143).
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data

from kg_covid_19_ray.sources.pdftable import read_pdf_tables

SOURCE_NAME = "zhou_host_proteins"
GENE_PREFIX = "NCBIGene:"
PUBMED_PREFIX = "PMID:"
TAXON_PREFIX = "NCBITaxon:"
GENE_CATEGORY = "biolink:Gene"
VIRUS_CATEGORY = "biolink:OrganismalEntity"
EDGE_PREDICATE = "biolink:interacts_with"
EDGE_RELATION = "RO:0002437"
EDGE_TYPE = "biolink:Association"

NODE_COLUMNS = ["id", "name", "category", "provided_by"]
EDGE_COLUMNS = ["subject", "predicate", "object", "relation",
                "provided_by", "type", "publication"]

# zhou_transform.py:64-72
CORONA_TAXON = {
    "IBV": 11120,
    "MHV": 502104,
    "HCoV-NL63": 277944,
    "HCoV-229E": 11137,
    "SARS": 227859,
    "MERS": 1335626,
}


def _rows_to_tables(batch: pa.Table) -> pa.Table:
    """(path, row_idx, row_json) -> interleaved node+edge payload rows
    tagged by table; split downstream by one cheap filter each."""
    n_id, n_name, n_cat = [], [], []
    e_subj, e_obj, e_pub = [], [], []
    for payload in batch["row_json"].to_pylist():
        row = json.loads(payload)
        corona = row["Coronavirus"]
        if corona not in CORONA_TAXON:
            raise ValueError(
                f"Can't find info for coronavirus {corona!r}")
        corona_curie = TAXON_PREFIX + str(CORONA_TAXON[corona])
        gene_curie = GENE_PREFIX + row["Host Gene ID"]
        n_id += [gene_curie, corona_curie]
        n_name += [row["Host Protein"], corona]
        n_cat += [GENE_CATEGORY, VIRUS_CATEGORY]
        e_subj.append(gene_curie)
        e_obj.append(corona_curie)
        e_pub.append(PUBMED_PREFIX + row["PubMed ID"])
    nodes = pa.table({
        "kind": pa.array(["node"] * len(n_id)),
        "id": pa.array(n_id, pa.string()),
        "name": pa.array(n_name, pa.string()),
        "category": pa.array(n_cat, pa.string()),
        "subject": pa.nulls(len(n_id), pa.string()),
        "object": pa.nulls(len(n_id), pa.string()),
        "publication": pa.nulls(len(n_id), pa.string()),
    })
    edges = pa.table({
        "kind": pa.array(["edge"] * len(e_subj)),
        "id": pa.nulls(len(e_subj), pa.string()),
        "name": pa.nulls(len(e_subj), pa.string()),
        "category": pa.nulls(len(e_subj), pa.string()),
        "subject": pa.array(e_subj, pa.string()),
        "object": pa.array(e_obj, pa.string()),
        "publication": pa.array(e_pub, pa.string()),
    })
    return pa.concat_tables([nodes, edges])


def transform(source: str) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """``source``: path/glob of PDF payload files (post-tabula JSON in
    this sandbox; real PDFs once a tabula backend exists). Returns the
    (nodes, edges) Datasets with the reference's exact headers and NO
    node dedup (parity: the reference appends per row)."""
    rows = read_pdf_tables(source).map_batches(
        _rows_to_tables, batch_format="pyarrow")

    def to_nodes(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = batch.filter(pc.equal(batch["kind"], "node"))
        n = b.num_rows
        return pa.table({
            "id": b["id"], "name": b["name"], "category": b["category"],
            "provided_by": pa.array([SOURCE_NAME] * n, pa.string()),
        })

    def to_edges(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = batch.filter(pc.equal(batch["kind"], "edge"))
        n = b.num_rows
        return pa.table({
            "subject": b["subject"],
            "predicate": pa.array([EDGE_PREDICATE] * n, pa.string()),
            "object": b["object"],
            "relation": pa.array([EDGE_RELATION] * n, pa.string()),
            "provided_by": pa.array([SOURCE_NAME] * n, pa.string()),
            "type": pa.array([EDGE_TYPE] * n, pa.string()),
            "publication": b["publication"],
        })

    nodes = rows.map_batches(to_nodes, batch_format="pyarrow")
    edges = rows.map_batches(to_edges, batch_format="pyarrow")
    return nodes, edges


def _fixture_rows(rows_per_page) -> tuple[list[list[list[str]]], int]:
    """3-page Suppl-Fig-3-shaped table: page 0 leads with the header
    row; every page carries 4-cell data rows."""
    header = ["Host Gene ID", "Host Protein", "Coronavirus", "PubMed ID"]
    coronas = list(CORONA_TAXON)
    pages, k = [], 0
    for p, n_rows in enumerate(rows_per_page):
        rows = [header] if p == 0 else []
        for _ in range(n_rows):
            rows.append([str(1000 + k), f"PROT{k}",
                         coronas[k % len(coronas)], str(30000000 + k)])
            k += 1
        pages.append(rows)
    return pages, k


def make_fixture_pdf_json(path: str, *, rows_per_page=(3, 2, 2)) -> int:
    """Deterministic post-tabula JSON fixture (the round-1 payload
    shape). Returns total data rows."""
    pages, k = _fixture_rows(rows_per_page)
    doc = [{"extraction_method": "lattice",
            "data": [[{"text": c} for c in row] for row in rows]}
           for rows in pages]
    with open(path, "w") as f:
        json.dump(doc, f)
    return k


def make_fixture_pdf(path: str, *, rows_per_page=(3, 2, 2)) -> int:
    """The SAME table as an actual PDF file (FlateDecode content
    streams), so the S5 decode seam runs real PDF parsing end-to-end.
    Returns total data rows."""
    from kg_covid_19_ray.functions.pdf import encode_table_pdf
    pages, k = _fixture_rows(rows_per_page)
    with open(path, "wb") as f:
        f.write(encode_table_pdf(pages))
    return k


def _register() -> None:
    from kg_covid_19_ray.pipelines.registry import register_transform

    @register_transform(SOURCE_NAME)
    def zhou_host_proteins(source):
        return transform(source)


_register()
