"""ChEMBL SARS-CoV-2-subset transform — reference parity for the
canned-ES-records source with DYNAMIC headers (reference
transform_utils/chembl/chembl_transform.py:9-404; golden expectations
tests/test_chembl.py: 5 activity edges with the exact property-key
order).

Semantics, re-derived:

- records are Elasticsearch hits; the payload is ``_source`` (S2);
- ``parse_doc_fields`` walks a record keeping ALLOWED leaf keys, with
  quirks preserved for parity: an allowed key holding a dict keeps ALL
  its children (remapped, unfiltered); an allowed key holding a list
  of scalars stringifies the whole list repr; falsy scalars become
  ""; duplicate keys accumulate then pipe-join (M18);
- molecules -> Drug nodes (CHEMBL.COMPOUND:), assays -> Assay nodes
  (CHEMBL.ASSAY:, bao_format ``_``->``:``), documents -> Publication
  nodes (PMID > DOI > CHEMBL.DOCUMENT priority), plus one
  OrganismTaxon node per TAXON_MAP entry;
- activities -> interacts_with edges; targets naming a TAXON_MAP
  organism are remapped to the taxon CURIE; uo_units ``_``->``:``;
- headers are DYNAMIC (A3): base header + union of observed property
  keys, written in sorted() order (chembl_transform.py:79-89).

Execution: fixture-scale records parse as one list (the reference is
fully in-memory too); the conformed rows become Datasets whose columns
are the sorted dynamic union — at crawl scale the same parse runs in
``map_batches`` over JSONL shards and the union comes from
``pa.unify_schemas`` (merge_kg._union_with_schema_union).
"""

from __future__ import annotations

import json

import ray.data

SOURCE_NAME = "ChEMBL"
SUBSET = "SARS-CoV-2 subset"
PROVIDED_BY = f"{SOURCE_NAME} {SUBSET}"

TAXON_MAP = {
    "Severe acute respiratory syndrome coronavirus 2": "NCBITaxon:2697049",
    "SARS-CoV-2": "NCBITaxon:2697049",
}

NODE_BASE = ["id", "name", "category", "provided_by"]
EDGE_BASE = ["id", "subject", "predicate", "object", "relation",
             "provided_by", "type"]


def parse_doc_fields(record: dict, allowed: set,
                     remap: dict | None = None) -> dict:
    """chembl_transform.py:333-393, behavior-exact (see module doc)."""
    props: dict = {}

    def update(key, value):
        if key in props:
            if isinstance(props[key], str):
                props[key] = [props[key]]
            props[key].append(value)
        else:
            props[key] = value

    for k, v in record.items():
        if isinstance(v, dict):
            if k in allowed:
                for k2, v2 in v.items():
                    update(remap[k2] if remap and k2 in remap else k2, v2)
            else:
                for k2, v2 in parse_doc_fields(v, allowed, remap).items():
                    update(k2, v2)
        elif isinstance(v, list):
            if k in allowed:
                update(remap[k] if remap and k in remap else k,
                       str(v) if v else "")
            elif len(v) and isinstance(v[0], dict):
                for x in v:
                    for k2, v2 in parse_doc_fields(x, allowed,
                                                   remap).items():
                        update(k2, v2)
        else:
            if k in allowed:
                update(remap[k] if remap and k in remap else k,
                       str(v) if v else "")
    for k, v in props.items():
        if isinstance(v, list):
            props[k] = "|".join(v)
    return props


ACTIVITY_ALLOWED = {
    "assay_organism", "assay_chembl_id", "document_chembl_id",
    "target_chembl_id", "target_organism", "target_pref_name",
    "molecule_chembl_id", "standard_units", "standard_type",
    "standard_relation", "standard_value", "uo_units",
}
ACTIVITY_REMAP = {
    "molecule_chembl_id": "subject", "target_chembl_id": "object",
    "document_chembl_id": "publications", "assay_chembl_id": "assay",
}


def parse_chembl_activity(data: list[dict]) -> list[dict]:
    """chembl_transform.py:131-204 (edge rows with exact key order)."""
    edges = []
    for record in data:
        e = parse_doc_fields(record["_source"], ACTIVITY_ALLOWED,
                             ACTIVITY_REMAP)
        e["id"] = str(record["_source"]["activity_id"])
        e["predicate"] = "biolink:interacts_with"
        e["relation"] = "RO:0002436"
        e["subject"] = f"CHEMBL.COMPOUND:{e['subject']}"
        e["object"] = f"CHEMBL.TARGET:{e['object']}"
        if e.get("target_organism") in TAXON_MAP:
            e["object"] = TAXON_MAP[e["target_organism"]]
        e["assay"] = f"CHEMBL.ASSAY:{e['assay']}"
        if e["uo_units"]:
            e["uo_units"] = e["uo_units"].replace("_", ":")
        e["provided_by"] = PROVIDED_BY
        e["type"] = "biolink:Association"
        edges.append(e)
    return edges


MOLECULE_ALLOWED = {
    "molecule_type", "polymer_flag", "inorganic_flag", "natural_product",
    "synonyms", "molecule_properties", "canonical_smiles",
    "full_molformula", "pref_name",
}
MOLECULE_REMAP = {"pref_name": "name", "full_molformula":
                  "molecular_formula", "synonyms": "synonym"}


def parse_chembl_molecules(data: list[dict]) -> list[dict]:
    nodes = []
    for record in data:
        n = parse_doc_fields(record["_source"], MOLECULE_ALLOWED,
                             MOLECULE_REMAP)
        n["category"] = "biolink:Drug"
        n["id"] = f"CHEMBL.COMPOUND:{record['_source']['molecule_chembl_id']}"
        n["provided_by"] = PROVIDED_BY
        nodes.append(n)
    return nodes


ASSAY_ALLOWED = {
    "assay_type", "assay_tax_id", "assay_cell_type", "assay_tissue",
    "assay_strain", "description", "assay_chembl_id",
    "document_chembl_id", "tissue_chembl_id", "confidence_score",
    "bao_format", "bao_label",
}
ASSAY_REMAP = {"assay_cell_type": "cell_type", "assay_tissue": "tissue",
               "assay_strain": "strain", "assay_tax_id": "in_taxon",
               "document_chembl_id": "publications"}


def parse_chembl_assay(data: list[dict]) -> list[dict]:
    nodes = []
    for record in data:
        n = parse_doc_fields(record["_source"], ASSAY_ALLOWED, ASSAY_REMAP)
        n["id"] = f"CHEMBL.ASSAY:{record['_source']['assay_chembl_id']}"
        n["category"] = "biolink:Assay"
        n["node_type"] = "SIO:001007"
        if n["bao_format"]:
            n["bao_format"] = n["bao_format"].replace("_", ":")
        n["provided_by"] = PROVIDED_BY
        nodes.append(n)
    return nodes


DOCUMENT_ALLOWED = {"title", "pubmed_id", "doi"}


def parse_chembl_document(data: list[dict]) -> list[dict]:
    nodes = []
    for record in data:
        n = parse_doc_fields(record["_source"], DOCUMENT_ALLOWED)
        if n["pubmed_id"]:
            n["id"] = f"PMID:{n['pubmed_id']}"
        elif n["doi"]:
            n["id"] = f"DOI:{n['doi']}"
        else:
            n["id"] = \
                f"CHEMBL.DOCUMENT:{record['_source']['document_chembl_id']}"
        n["category"] = "biolink:Publication"
        n["provided_by"] = PROVIDED_BY
        nodes.append(n)
    return nodes


def _conform(rows: list[dict], base: list[str]) -> ray.data.Dataset:
    """A3 dynamic header: sorted union of base + observed keys, missing
    values empty-string, all values stringified."""
    header = sorted(set(base) | {k for r in rows for k in r})
    out = [{h: str(r.get(h, "")) for h in header} for r in rows]
    return ray.data.from_items(out)


def transform(data_files: dict[str, str]
              ) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """data_files: molecules_data/assay_data/document_data/activity_data
    JSON paths -> (nodes, edges) with sorted dynamic headers."""
    def load(path: str) -> list[dict]:
        with open(path) as fh:
            return json.load(fh)

    molecules = parse_chembl_molecules(load(data_files["molecules_data"]))
    assays = parse_chembl_assay(load(data_files["assay_data"]))
    documents = parse_chembl_document(load(data_files["document_data"]))
    activities = parse_chembl_activity(load(data_files["activity_data"]))
    # the reference's {v: k for ...} inverts TAXON_MAP to curie -> name
    organisms = [{"id": curie, "name": name,
                  "category": "biolink:OrganismTaxon"}
                 for curie, name in
                 {v: k for k, v in TAXON_MAP.items()}.items()]

    nodes = _conform(molecules + assays + documents + organisms, NODE_BASE)
    edges = _conform(activities, EDGE_BASE)
    return nodes, edges


def _register() -> None:
    from kg_covid_19_ray.pipelines.registry import register_transform

    @register_transform("chembl")
    def chembl(source):
        import os
        return transform({
            "molecules_data": os.path.join(source,
                                           "chembl_molecule_records.json"),
            "assay_data": os.path.join(source, "chembl_assay_records.json"),
            "document_data": os.path.join(source,
                                          "chembl_document_records.json"),
            "activity_data": os.path.join(source,
                                          "chembl_activity_records.json"),
        })


_register()
