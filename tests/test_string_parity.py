"""Reference-parity test for the STRING transform on the reference's
own fixtures (tests/test_string.py:78-140 golden expectations)."""

from __future__ import annotations

import os

import pytest

from kg_covid_19_ray.pipelines import string_ppi as sp

FIXDIR = "/root/reference/tests/resources/string"

EXPECTED_NODE_IDS = {
    "ENSEMBL:ENSP00000000233", "ENSEMBL:ENSP00000272298",
    "ENSEMBL:ENSP00000253401", "ENSEMBL:ENSP00000401445",
    "ENSEMBL:ENSP00000418915", "ENSEMBL:ENSP00000327801",
    "ENSEMBL:ENSP00000466298", "ENSEMBL:ENSP00000232564",
    "ENSEMBL:ENSP00000393379", "ENSEMBL:ENSP00000371253",
}


@pytest.mark.skipif(not os.path.isdir(FIXDIR),
                    reason="reference fixtures unavailable")
def test_string_matches_reference_outputs(ray_session):
    nodes, edges = sp.transform(FIXDIR)
    ndf, edf = nodes.to_pandas(), edges.to_pandas()

    # reference test_nodes_file: (10, 6), exact columns, exact id set
    assert ndf.shape == (10, 6)
    assert list(ndf.columns) == ["id", "name", "category", "description",
                                 "xrefs", "provided_by"]
    assert set(ndf["id"]) == EXPECTED_NODE_IDS
    # isoform suffix stripped from the UniProt xref (M13)
    row = ndf[ndf["id"] == "ENSEMBL:ENSP00000000233"]
    assert row["xrefs"].item() == "UniProtKB:P84085"

    # reference test_edges_file: (9, 20), exact columns
    assert edf.shape == (9, 20)
    assert list(edf.columns) == sp.EDGE_COLUMNS
    inter = edf[edf["predicate"] == "biolink:interacts_with"]
    assert (inter["relation"] == "RO:0002434").all()
    assert (inter["provided_by"] == "STRING").all()
    # scores stay strings until export (SURVEY §1.2)
    assert inter["combined_score"].map(lambda v: v.isdigit()).all()
    # edge endpoints refer to emitted nodes
    assert set(inter["subject"]) | set(inter["object"]) <= EXPECTED_NODE_IDS


def test_string_registered_as_plugin():
    from kg_covid_19_ray.pipelines.registry import TRANSFORM_REGISTRY
    assert "string_ppi" in TRANSFORM_REGISTRY
