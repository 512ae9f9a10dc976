"""Reference-parity test: run the engine's DrugCentral-style transform
on the REFERENCE'S OWN fixture
(/root/reference/tests/resources/drug_central/) and assert the exact
outputs the reference's test suite asserts
(tests/test_drug_central.py:71-137): shapes, columns, the full node-id
set, node uniqueness."""

from __future__ import annotations

import os

import pytest

from kg_covid_19_ray.pipelines import drug_central as dc

FIXTURE = ("/root/reference/tests/resources/drug_central/"
           "drug.target.interaction_SNIPPET.tsv.gz")

EXPECTED_NODE_IDS = {
    "DrugCentral:4", "UniProtKB:P35499", "UniProtKB:P10635",
    "UniProtKB:Q12809", "UniProtKB:Q9UK17", "UniProtKB:P34995",
    "UniProtKB:P35498", "UniProtKB:P22460", "UniProtKB:P46098",
    "DrugCentral:5", "UniProtKB:Q01668", "UniProtKB:Q13936",
    "DrugCentral:6", "UniProtKB:O15554", "UniProtKB:O60840",
    "DrugCentral:38", "UniProtKB:O15399", "UniProtKB:O60391",
    "UniProtKB:Q05586", "UniProtKB:Q12879", "UniProtKB:Q13224",
    "UniProtKB:Q14957", "UniProtKB:Q8TCU5",
}


@pytest.mark.skipif(not os.path.exists(FIXTURE),
                    reason="reference fixture unavailable")
def test_drug_central_matches_reference_outputs(ray_session):
    nodes, edges = dc.transform(FIXTURE)
    ndf, edf = nodes.to_pandas(), edges.to_pandas()

    # reference test_nodes_file: shape (23, 5), exact columns, id set
    assert ndf.shape == (23, 5)
    assert list(ndf.columns) == ["id", "name", "category", "TDL",
                                 "provided_by"]
    assert set(ndf["id"]) == EXPECTED_NODE_IDS
    # reference test_nodes_are_not_repeated
    assert ndf["id"].is_unique

    # reference test_edges_file: shape (21, 7), exact columns
    assert edf.shape == (21, 7)
    assert list(edf.columns) == ["subject", "predicate", "object",
                                 "relation", "provided_by", "comment",
                                 "type"]
    assert (edf["predicate"] == "biolink:molecularly_interacts_with").all()
    assert (edf["relation"] == "RO:0002436").all()
    assert (edf["type"] == "biolink:Association").all()
    # every edge endpoint resolves to an emitted node
    assert set(edf["subject"]) <= EXPECTED_NODE_IDS
    assert set(edf["object"]) <= EXPECTED_NODE_IDS

    # category attachment: drugs vs proteins
    cats = ndf.set_index("id")["category"]
    assert cats["DrugCentral:4"] == "biolink:Drug"
    assert cats["UniProtKB:P35499"] == "biolink:Protein"
    # first-wins kept the FIRST line's attributes
    assert ndf.set_index("id").loc["UniProtKB:P35499", "name"] == "SCN4A"


def test_drug_central_registered_as_plugin():
    from kg_covid_19_ray.pipelines.registry import TRANSFORM_REGISTRY
    assert "drug_central" in TRANSFORM_REGISTRY
