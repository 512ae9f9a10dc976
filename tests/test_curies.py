"""Unit tests for identifier functions — hand-written expectations that
pin the reference semantics (scibite_cord.py:361-418,
utils/transform_utils.py:185-218, utils/normalize_utils.py:7-46).
These are the independent check for the pre-contracted CURIEs that the
oracle SQL shares with the Ray path."""

from kg_covid_19_ray.functions.curies import (
    collapse_uniprot_isoform,
    contract_uri,
    guess_biolink_category,
    is_curie,
    is_iri,
    normalize_curie,
)
from kg_covid_19_ray.sources.gazetteer import link_raw_id, sameas_canonical_map


def test_is_curie():
    assert is_curie("UniProtKB:P35499")
    assert is_curie("CHEMBL.COMPOUND:CHEMBL25")
    assert not is_curie("http://example.org/x")  # has '/'
    assert not is_curie("plain text")
    assert not is_curie("noseparator")


def test_is_iri():
    assert is_iri("http://purl.obolibrary.org/obo/GO_0006412")
    assert is_iri("https://id.nlm.nih.gov/mesh/D018352")
    assert not is_iri("GO:0006412")


def test_contract_uri_obo():
    assert contract_uri("http://purl.obolibrary.org/obo/GO_0006412") == "GO:0006412"
    assert contract_uri("http://purl.obolibrary.org/obo/CHEBI_15365") == "CHEBI:15365"
    assert contract_uri("https://id.nlm.nih.gov/mesh/D018352") == "MESH:D018352"
    assert contract_uri("http://www.wikidata.org/entity/Q159") == "wikidata:Q159"


def test_contract_uri_passthrough_and_fallback():
    # already a CURIE -> unchanged
    assert contract_uri("CHEMBL.COMPOUND:CHEMBL25") == "CHEMBL.COMPOUND:CHEMBL25"
    # unmapped IRI -> unchanged (reference keeps the IRI when nothing contracts)
    assert contract_uri("http://unknown.example/x1") == "http://unknown.example/x1"
    # free text -> blank-prefix CURIE (scibite_cord.py:392)
    assert contract_uri("streamconcept") == ":streamconcept"


def test_contract_uri_hgnc_symbol():
    url = "http://www.genenames.org/cgi-bin/gene_symbol_report?match=ACE2"
    assert contract_uri(url, gene_symbol_map={"ACE2": "59272"}) == "NCBIGene:59272"
    # unknown symbol: passes through (no custom-map hit in this engine)
    url2 = "http://www.genenames.org/cgi-bin/gene_symbol_report?match=NOPE"
    assert contract_uri(url2, gene_symbol_map={"ACE2": "59272"}) == url2


def test_guess_biolink_category():
    assert guess_biolink_category("UniProtKB:P35499") == "biolink:Protein"
    assert guess_biolink_category("ComplexPortal:CPX-5742") == "biolink:Protein"
    assert guess_biolink_category("GO:0006412") == "biolink:OntologyClass"
    assert guess_biolink_category("CHEBI:15365") == "biolink:NamedThing"
    assert guess_biolink_category(":streamconcept") == "biolink:NamedThing"


def test_collapse_uniprot_isoform():
    assert collapse_uniprot_isoform("UniProtKB:P35499-2") == "UniProtKB:P35499"
    assert collapse_uniprot_isoform("uniprotkb:P84085-2") == "uniprotkb:P84085"
    # non-UniProt ids are NOT collapsed (reference prefix check)
    assert collapse_uniprot_isoform("ComplexPortal:CPX-5742") == "ComplexPortal:CPX-5742"
    assert collapse_uniprot_isoform("UniProtKB:P35499") == "UniProtKB:P35499"


def test_normalize_curie():
    m = {"DRUGBANK:DB00945": "CHEBI:15365", "CHEMBL.COMPOUND:CHEMBL25": ""}
    assert normalize_curie("DRUGBANK:DB00945", m) == "CHEBI:15365"
    # empty mapping value -> keep original (normalize_utils.py:40-41)
    assert normalize_curie("CHEMBL.COMPOUND:CHEMBL25", m) == "CHEMBL.COMPOUND:CHEMBL25"
    assert normalize_curie("GO:0006412", m) == "GO:0006412"


def test_link_raw_id_expectations():
    assert link_raw_id("http://purl.obolibrary.org/obo/GO_0006412") == (
        "GO:0006412", "", "biolink:OntologyClass")
    assert link_raw_id("UniProtKB:P35499-2") == (
        "UniProtKB:P35499", "", "biolink:Protein")
    # 2-letter country code -> wikidata + country-name override, NamedThing
    assert link_raw_id("RU") == (
        "wikidata:Q159", "Russian Federation", "biolink:NamedThing")
    assert link_raw_id("streamconcept") == (
        ":streamconcept", "", "biolink:NamedThing")


def test_sameas_canonical_map():
    m = sameas_canonical_map()
    # transitive chain CHEBI <-> CHEMBL <-> PUBCHEM all -> lexicographic min
    assert m["CHEBI:15365"] == "CHEBI:15365"
    assert m["CHEMBL.COMPOUND:CHEMBL25"] == "CHEBI:15365"
    assert m["PUBCHEM.COMPOUND:2244"] == "CHEBI:15365"
    assert m["UniProtKB:P63151"] == "UniProtKB:P35499"
    assert m["UniProtKB:P35499"] == "UniProtKB:P35499"


import pytest as _pytest


@_pytest.mark.parametrize("curie,category", [
    ("", "biolink:NamedThing"),
    ("UniProtKB", "biolink:Protein"),
    ("ComplexPortal", "biolink:Protein"),
    ("GO", "biolink:OntologyClass"),
])
def test_guess_category_reference_cases(curie, category):
    """Reference tests/test_transform_utils.py:14-24 parameter set."""
    from kg_covid_19_ray.functions.curies import guess_biolink_category
    assert guess_biolink_category(curie) == category


@_pytest.mark.parametrize("curie,collapsed", [
    ("foobar", "foobar"),
    ("ENSEMBL:ENSG00000178607", "ENSEMBL:ENSG00000178607"),
    ("UniprotKB:P63151-1", "UniprotKB:P63151"),
    ("uniprotkb:P63151-1", "uniprotkb:P63151"),
    ("UniprotKB:P63151-2", "UniprotKB:P63151"),
])
def test_collapse_isoform_reference_cases(curie, collapsed):
    """Reference tests/test_transform_utils.py:26-37 parameter set."""
    from kg_covid_19_ray.functions.curies import collapse_uniprot_isoform
    assert collapse_uniprot_isoform(curie) == collapsed
