"""PSI-MI XML (miXML) interaction source (M9 + M6): per-file XML parse
emitting interactor nodes and pairwise interaction edges.

Reference semantics (intact.py:130-364):

- interactor xref db -> CURIE prefix map (intact.py:54-62) and
  interactor type -> Biolink category map (intact.py:45-53);
- experiments give (publication, detection_method) context;
- an interaction with 2 participants emits one edge, 3 participants
  emit all 3 unordered pairs, <2 or >3 are skipped as degenerate
  (intact.py:175-230) — the M6 pairwise-combination exploder;
- per-file try/except skip semantics (intact.py:183-184): a bad file
  is counted, not fatal.

Execution shape: one file = one row of ``read_binary_files``; the XML
parse is a stateless ``flat_map`` task per file (SURVEY §2.2 M9).
"""

from __future__ import annotations

import itertools
import xml.etree.ElementTree as ET

import ray.data

# xref db -> CURIE prefix (intact.py:54-62 analog)
DB_PREFIX = {
    "uniprotkb": "UniProtKB",
    "chebi": "CHEBI",
    "complexportal": "ComplexPortal",
    "pubmed": "PMID",
}

# interactor type -> Biolink category (intact.py:45-53 analog)
TYPE_CATEGORY = {
    "protein": "biolink:Protein",
    "peptide": "biolink:Protein",
    "small molecule": "biolink:ChemicalSubstance",
    "rna": "biolink:RNAProduct",
}

EDGE_PREDICATE = "biolink:interacts_with"
EDGE_RELATION = "RO:0002437"
PROVIDED_BY = "mixml"


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _find_all(elem, name: str):
    return [e for e in elem.iter() if _strip_ns(e.tag) == name]


def _first(elem, name: str):
    found = _find_all(elem, name)
    return found[0] if found else None


def _interactor_curie(interactor) -> str | None:
    xref = _first(interactor, "xref")
    if xref is None:
        return None
    for ref in _find_all(xref, "primaryRef") + _find_all(xref, "secondaryRef"):
        db = (ref.get("db") or "").lower()
        if db in DB_PREFIX:
            return f"{DB_PREFIX[db]}:{ref.get('id')}"
    return None


def parse_mixml(xml_bytes: bytes) -> tuple[list[dict], list[dict]]:
    """One miXML document -> (node rows, edge rows)."""
    root = ET.fromstring(xml_bytes)
    nodes: list[dict] = []
    node_curie_by_local: dict[str, str] = {}
    for interactor in _find_all(root, "interactor"):
        local_id = interactor.get("id")
        curie = _interactor_curie(interactor)
        if curie is None:
            continue
        name_el = _first(interactor, "shortLabel")
        type_el = _first(interactor, "interactorType")
        type_name = ""
        if type_el is not None:
            lbl = _first(type_el, "shortLabel")
            type_name = (lbl.text or "").lower() if lbl is not None else ""
        node_curie_by_local[local_id] = curie
        nodes.append({
            "id": curie,
            "name": name_el.text if name_el is not None else "",
            "category": TYPE_CATEGORY.get(type_name, "biolink:NamedThing"),
            "provided_by": PROVIDED_BY,
        })

    # publication context from the first experiment (intact.py:240-260)
    publication = ""
    exp = _first(root, "experimentDescription")
    if exp is not None:
        bibref = _first(exp, "bibref")
        if bibref is not None:
            for ref in _find_all(bibref, "primaryRef"):
                if (ref.get("db") or "").lower() == "pubmed":
                    publication = f"PMID:{ref.get('id')}"

    edges: list[dict] = []
    for interaction in _find_all(root, "interaction"):
        refs = [r.text for r in _find_all(interaction, "interactorRef")]
        curies = sorted({node_curie_by_local[r] for r in refs
                         if r in node_curie_by_local})
        if len(curies) < 2 or len(curies) > 3:
            continue  # degenerate, intact.py:175-181
        for a, b in itertools.combinations(curies, 2):  # M6
            edges.append({
                "subject": a, "predicate": EDGE_PREDICATE, "object": b,
                "relation": EDGE_RELATION, "provided_by": PROVIDED_BY,
                "publication": publication,
                "num_participants": str(len(curies)),
            })
    return nodes, edges


def _rows(row: dict, index: int):
    try:
        nodes, edges = parse_mixml(row["bytes"])
    except ET.ParseError:
        return  # per-file skip (intact.py:183-184)
    if index == 0:
        yield from nodes
    else:
        yield from edges


def read_mixml_nodes(path: str) -> ray.data.Dataset:
    return ray.data.read_binary_files(path).flat_map(
        lambda r: _rows(r, 0))


def read_mixml_edges(path: str) -> ray.data.Dataset:
    return ray.data.read_binary_files(path).flat_map(
        lambda r: _rows(r, 1))
