"""Gene-annotation reference-fixture parity
(tests/test_sars_cov_2_gene_annot.py:24-100 expectations over the
reference's GPI/GPA snippets)."""

from __future__ import annotations

import os

import pytest

from kg_covid_19_ray.pipelines import gene_annot as ga
from kg_covid_19_ray.sources.lines import read_gpa, read_gpi

RES = "/root/reference/tests/resources"
GPI = f"{RES}/uniprot_sars-cov-2_SNIPPET.gpi"
GPA = f"{RES}/uniprot_sars-cov-2_SNIPPET.gpa"

pytestmark = pytest.mark.skipif(not os.path.exists(GPI),
                                reason="reference fixtures unavailable")

EXPECTED_NODE = [
    "UniProtKB:P0DTD2", "P0DTD2", "biolink:Protein", "Protein 9b", "",
    "NCBITaxon:2697049", "PR:000050272|UniProtKB:P0DTD1-PRO_0000449637",
    "sars_cov_2_gene_annot",
]

EXPECTED_EDGE1 = [
    "UniProtKB:P0DTC1", "biolink:enables", "GO:0003723", "RO:0002327",
    "sars_cov_2_gene_annot", "biolink:Association", "GO_REF:0000043",
    "ECO:0000322", "UniProtKB-KW:KW-0694", "", "20200321", "UniProt",
    "", "go_evidence=IEA",
]


def _first_gpi_rec(ray_session=None):
    recs = read_gpi(GPI).take_all()
    # file order: P0DTD2 is the first record
    return next(r for r in recs if r["DB_Object_ID"] == "P0DTD2")


def test_gpi_to_gene_node_matches_reference(ray_session):
    node = ga.gpi_to_gene_node_data(_first_gpi_rec())
    assert len(node) == len(ga.NODE_HEADER)
    assert node == EXPECTED_NODE


def test_gpa_to_edge_matches_reference(ray_session):
    recs = read_gpa(GPA).take_all()
    edge1 = ga.gpa_to_edge_data(recs[0])
    edge2 = ga.gpa_to_edge_data(recs[1])
    assert len(edge1) == len(ga.EDGE_HEADER)
    assert edge1 == EXPECTED_EDGE1
    assert edge2[1] == "biolink:involved_in"
    assert edge2[3] == "RO:0002331"


def test_gene_annot_transform_end_to_end(ray_session):
    nodes, edges = ga.transform(GPI, GPA)
    ndf, edf = nodes.to_pandas(), edges.to_pandas()
    assert list(ndf.columns) == ga.NODE_HEADER
    assert list(edf.columns) == ga.EDGE_HEADER
    assert ndf["id"].is_unique
    # GPI-derived node wins over a GPA stub for the same subject
    row = ndf.set_index("id").loc["UniProtKB:P0DTD2"]
    assert row["full_name"] == "Protein 9b"
    # every GPA subject has a node (stub or GPI)
    assert set(edf["subject"]) <= set(ndf["id"])


def test_gene_annot_registered_as_plugin():
    from kg_covid_19_ray.pipelines.registry import TRANSFORM_REGISTRY
    assert "sars_cov_2_gene_annot" in TRANSFORM_REGISTRY
