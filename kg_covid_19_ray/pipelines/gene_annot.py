"""SARS-CoV-2 gene-annotation transform (GPI nodes + GPA edges) —
reference parity (reference
transform_utils/sars_cov_2_gene_annot/sars_cov_2_gene_annot.py:30-225;
expectations tests/test_sars_cov_2_gene_annot.py:24-100).

Builders are behavior-exact over the parsed GPI/GPA row dicts
(sources/lines.parse_gpi_lines / parse_gpa_lines):

- node: id ``DB:DB_Object_ID``; name = first Symbol, full_name = first
  Name; synonym raw; Taxon -> ``NCBITaxon:<tax id>``; xrefs pipe-join;
- edge: first Qualifier as the biolink predicate, RO relation from the
  qualifier map (blank when unmapped); property columns take first
  list items; Interacting_taxon_ID gets the NCBITaxon prefix only when
  present; the reference looks up key ``Annotation_Extension`` which
  its own GPA parser never emits (it stores ``Annotation Extension``
  with a space) — so that column is always "" (quirk preserved);
- GPA subjects missing from the GPI get a stub node with a guessed
  category (sars_cov_2_gene_annot.py:60-70).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from kg_covid_19_ray.functions.curies import guess_biolink_category
from kg_covid_19_ray.sources.lines import read_gpa, read_gpi
from kg_covid_19_ray.stages.dedup import first_wins

SOURCE_NAME = "sars_cov_2_gene_annot"
NODE_HEADER = ["id", "name", "category", "full_name", "synonym",
               "in_taxon", "xrefs", "provided_by"]
EDGE_HEADER = ["subject", "predicate", "object", "relation",
               "provided_by", "type", "DB_References", "ECO_code",
               "With", "Interacting_taxon_ID", "Date", "Assigned_by",
               "Annotation_Extension", "Annotation_Properties"]

PROTEIN_NODE_TYPE = "biolink:Protein"
NCBI_TAXON_PREFIX = "NCBITaxon"
EDGE_LABEL_PREFIX = "biolink:"
EDGE_LABEL_TO_RO = {
    "enables": "RO:0002327",
    "involved_in": "RO:0002331",
    "part_of": "BFO:0000050",
}


def _first_or_blank(value) -> str:
    if isinstance(value, (list, tuple)):
        return value[0] if len(value) else ""
    return value or ""


def gpi_to_gene_node_data(rec: dict) -> list[str]:
    """sars_cov_2_gene_annot.py:169-225 (node row, header order)."""
    node_id = f"{rec.get('DB', '')}:{rec.get('DB_Object_ID', '')}"
    full_name = _first_or_blank(rec.get("DB_Object_Name"))
    name = _first_or_blank(rec.get("DB_Object_Symbol"))
    synonym = rec.get("DB_Object_Synonym") or ""
    taxon = rec.get("Taxon") or ""
    taxon = f"{NCBI_TAXON_PREFIX}:{taxon.split(':')[1]}" if taxon else ""
    xrefs = rec.get("DB_Xref")
    xrefs = "|".join(xrefs) if isinstance(xrefs, (list, tuple)) else \
        (xrefs or "")
    return [node_id, name, PROTEIN_NODE_TYPE, full_name, synonym, taxon,
            xrefs, SOURCE_NAME]


def gpa_to_edge_data(rec: dict) -> list[str]:
    """sars_cov_2_gene_annot.py:112-157 (edge row, header order)."""
    subj = f"{rec.get('DB', '')}:{rec.get('DB_Object_ID', '')}"
    qualifier = _first_or_blank(rec.get("Qualifier"))
    obj = rec.get("GO_ID") or ""
    relation = EDGE_LABEL_TO_RO.get(qualifier, "")
    edge = [subj, EDGE_LABEL_PREFIX + qualifier, obj, relation,
            SOURCE_NAME, "biolink:Association"]
    for key in ["DB:Reference", "ECO_Evidence_code", "With",
                "Interacting_taxon_ID", "Date", "Assigned_by",
                "Annotation_Extension", "Annotation_Properties"]:
        item = rec.get(key)
        item = _first_or_blank(item) if item else ""
        if key == "Interacting_taxon_ID" and item:
            item = f"{NCBI_TAXON_PREFIX}:{item}"
        edge.append(item)
    return edge


def transform(gpi_path: str, gpa_path: str
              ) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(nodes, edges): GPI nodes + stub nodes for unseen GPA subjects
    (first-wins dedup with GPI rank 0 < GPA rank 1), GPA edges."""
    def gpi_nodes(batch: pa.Table) -> pa.Table:
        rows = [gpi_to_gene_node_data(r) for r in batch.to_pylist()]
        cols = {h: pa.array([r[i] for r in rows], pa.string())
                for i, h in enumerate(NODE_HEADER)}
        cols["order_key"] = pa.array([0] * len(rows), pa.int64())
        return pa.table(cols)

    def gpa_edges(batch: pa.Table) -> pa.Table:
        rows = [gpa_to_edge_data(r) for r in batch.to_pylist()]
        return pa.table({h: pa.array([r[i] for r in rows], pa.string())
                         for i, h in enumerate(EDGE_HEADER)})

    def gpa_stub_nodes(batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch.to_pylist():
            subj = f"{r.get('DB', '')}:{r.get('DB_Object_ID', '')}"
            rows.append([subj, "", guess_biolink_category(subj),
                         "", "", "", "", SOURCE_NAME])
        cols = {h: pa.array([r[i] for r in rows], pa.string())
                for i, h in enumerate(NODE_HEADER)}
        cols["order_key"] = pa.array([1] * len(rows), pa.int64())
        return pa.table(cols)

    gpi = read_gpi(gpi_path)
    gpa = read_gpa(gpa_path)
    nodes = gpi.map_batches(gpi_nodes, batch_format="pyarrow").union(
        gpa.map_batches(gpa_stub_nodes, batch_format="pyarrow"))
    nodes = first_wins(nodes, ["id"], "order_key") \
        .drop_columns(["order_key"]).select_columns(NODE_HEADER)
    edges = gpa.map_batches(gpa_edges, batch_format="pyarrow")
    return nodes, edges


def _register() -> None:
    import os
    from kg_covid_19_ray.pipelines.registry import register_transform

    @register_transform("sars_cov_2_gene_annot")
    def gene_annot(source):
        return transform(os.path.join(source, "uniprot_sars-cov-2.gpi"),
                         os.path.join(source, "uniprot_sars-cov-2.gpa"))


_register()
