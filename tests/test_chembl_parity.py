"""ChEMBL reference-fixture parity (tests/test_chembl.py expectations
over tests/resources/chembl/*): activity parse count + exact property
key ORDER, end-to-end dynamic-header node/edge tables (A3)."""

from __future__ import annotations

import ast
import os

import pytest

from kg_covid_19_ray.pipelines import chembl

FIXDIR = "/root/reference/tests/resources/chembl"

pytestmark = pytest.mark.skipif(not os.path.isdir(FIXDIR),
                                reason="reference fixtures unavailable")

EXPECTED_CA_KEYS = [
    "standard_units", "standard_type", "standard_relation",
    "target_pref_name", "assay", "publications", "object", "subject",
    "assay_organism", "standard_value", "target_organism", "uo_units",
    "id", "predicate", "relation", "provided_by", "type",
]


def _data_files() -> dict:
    return {
        "molecules_data": f"{FIXDIR}/chembl_molecule_records.json",
        "assay_data": f"{FIXDIR}/chembl_assay_records.json",
        "document_data": f"{FIXDIR}/chembl_document_records.json",
        "activity_data": f"{FIXDIR}/chembl_activity_records.json",
    }


def test_parse_chembl_activity_matches_reference():
    """test_chembl.py:57-65: 5 edges from the activities snippet, the
    first edge's keys in the reference's exact insertion order."""
    with open(f"{FIXDIR}/chembl_activities.snippet.txt") as fh:
        activities = [ast.literal_eval(line) for line in fh]
    ca = chembl.parse_chembl_activity(activities)
    assert len(ca) == 5
    assert list(ca[0].keys()) == EXPECTED_CA_KEYS
    assert ca[0]["subject"].startswith("CHEMBL.COMPOUND:")
    assert ca[0]["assay"].startswith("CHEMBL.ASSAY:")
    assert ca[0]["provided_by"] == "ChEMBL SARS-CoV-2 subset"


def test_chembl_transform_dynamic_headers(ray_session):
    nodes, edges = chembl.transform(_data_files())
    ndf, edf = nodes.to_pandas(), edges.to_pandas()
    # A3: columns are the sorted union of base + observed properties
    assert list(ndf.columns) == sorted(ndf.columns)
    assert list(edf.columns) == sorted(edf.columns)
    assert {"id", "name", "category", "provided_by"} <= set(ndf.columns)
    assert {"subject", "predicate", "object", "relation",
            "type"} <= set(edf.columns)
    # molecule/assay/document/organism nodes all present
    cats = set(ndf["category"])
    assert {"biolink:Drug", "biolink:Assay", "biolink:Publication",
            "biolink:OrganismTaxon"} <= cats
    # target-organism remap: SARS-CoV-2 targets become the taxon CURIE
    assert (edf["object"].str.startswith("CHEMBL.TARGET:")
            | (edf["object"] == "NCBITaxon:2697049")).all()
    # uo_units underscore -> colon
    uo = edf.loc[edf["uo_units"] != "", "uo_units"]
    assert uo.str.contains(":").all() and not uo.str.contains("_").any()
    # taxon node emitted once with a TAXON_MAP name
    tax = ndf[ndf["id"] == "NCBITaxon:2697049"]
    assert len(tax) == 1 and tax["name"].item() in chembl.TAXON_MAP


def test_chembl_registered_as_plugin():
    from kg_covid_19_ray.pipelines.registry import TRANSFORM_REGISTRY
    assert "chembl" in TRANSFORM_REGISTRY
