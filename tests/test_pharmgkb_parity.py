"""PharmGKB reference-fixture parity (tests/test_pharmgkb.py:33-90
expectations over the reference's own snippets)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
import ray.data

from kg_covid_19_ray.pipelines import pharmgkb as pk

RES = "/root/reference/tests/resources"

pytestmark = pytest.mark.skipif(not os.path.isdir(RES),
                                reason="reference fixtures unavailable")


def test_parse_pharmgkb_line_matches_reference():
    with open(f"{RES}/relationships_SNIPPET.tsv") as fh:
        header = fh.readline().strip().split("\t")
        first = fh.readline()
    parsed = pk.parse_pharmgkb_line(first, header)
    assert sorted(parsed.keys()) == sorted([
        "Entity1_id", "Entity1_name", "Entity1_type", "Entity2_id",
        "Entity2_name", "Entity2_type", "Evidence", "Association",
        "PK", "PD"])
    assert parsed["Entity1_name"] == "ANKFN1"


def test_make_id_mapping_file_matches_reference():
    m = pk.make_id_mapping_file(f"{RES}/pharmgkb_gene_SNIPPET.tsv")
    assert sorted(m.keys()) == ["PA165392995", "PA24356"]
    assert pk.KEY_PARSED_IDS in m["PA24356"]
    assert m["PA24356"][pk.KEY_PARSED_IDS].get("UniProtKB") == "P04217"


@pytest.mark.parametrize("pharmgkb_id,expected", [
    ("PA164712302", "pharmgkb.drug:PA164712302"),  # no xref -> fallback
    ("PA131887008", "CHEBI:1391"),                 # ChEBI wins priority
])
def test_make_preferred_drug_id_matches_reference(pharmgkb_id, expected):
    drug_map = pk.make_id_mapping_file(f"{RES}/drugs.tsv")
    assert pk.make_preferred_drug_id(pharmgkb_id, drug_map, {}) == expected


def test_preferred_drug_ids_stage(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame(
        {"drug_id": ["PA131887008", "PA164712302", "PA_unknown"]}))
    out = pk.preferred_drug_ids(ds, f"{RES}/drugs.tsv").to_pandas()
    assert sorted(out["drug_id"]) == sorted([
        "CHEBI:1391", "pharmgkb.drug:PA164712302",
        "pharmgkb.drug:PA_unknown"])
