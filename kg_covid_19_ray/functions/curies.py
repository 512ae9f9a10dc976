"""CURIE / IRI identifier functions (pure, per-value, unit-tested).

Re-implements the identifier semantics of the reference:

- IRI -> CURIE contraction with a custom prefix-map fallback and special
  HGNC-symbol handling  (reference
  ``kg_covid_19/transform_utils/scibite_cord/scibite_cord.py:361-418``);
- CURIE / IRI shape detection (``scibite_cord.py:396-418``);
- Biolink category guessing from the CURIE prefix (reference
  ``kg_covid_19/utils/transform_utils.py:185-202``);
- UniProt isoform collapse ``UniProtKB:P63151-2 -> UniProtKB:P63151``
  (``utils/transform_utils.py:205-218``).

These are plain Python functions over single values; the hot path applies
them only to the small set of *distinct* identifiers per batch (or, for
the static gazetteer, once at import), never per row.
"""

from __future__ import annotations

import re
from collections.abc import Mapping

# IRI prefix -> CURIE prefix. Stands in for prefixcommons' default context
# plus the reference's CUSTOM_CMAP fallback (scibite_cord.py:19-25).
# Longest-prefix-first matching.
CMAP: dict[str, str] = {
    "http://purl.obolibrary.org/obo/CHEBI_": "CHEBI:",
    "http://purl.obolibrary.org/obo/GO_": "GO:",
    "http://purl.obolibrary.org/obo/MONDO_": "MONDO:",
    "http://purl.obolibrary.org/obo/NCBITaxon_": "NCBITaxon:",
    "https://id.nlm.nih.gov/mesh/": "MESH:",
    "http://www.wikidata.org/entity/": "wikidata:",
    "https://www.uniprot.org/uniprot/": "UniProtKB:",
}

_HGNC_SYMBOL_URL = "http://www.genenames.org/cgi-bin/gene_symbol_report?match="

_CURIE_RE = re.compile(r"^[^ :]+:[^/ :]+$")  # scibite_cord.py:402-404
_IRI_RE = re.compile(r"^http[s]?://")  # scibite_cord.py:414-417
_UNIPROT_PREFIX_RE = re.compile(r"^uniprotkb:", re.IGNORECASE)
_ISOFORM_SUFFIX_RE = re.compile(r"\-\d+$")


def is_curie(s: str) -> bool:
    """True when ``s`` looks like ``prefix:local`` (scibite_cord.py:396-404)."""
    return bool(_CURIE_RE.match(s))


def is_iri(s: str) -> bool:
    """True when ``s`` starts with http(s):// (scibite_cord.py:406-418)."""
    return bool(_IRI_RE.match(s))


def contract_uri(
    raw_id: str,
    gene_symbol_map: Mapping[str, str] | None = None,
    cmap: Mapping[str, str] = CMAP,
) -> str:
    """Contract a raw hit identifier to a CURIE.

    Mirrors ``ScibiteCordTransform.contract_uri`` (scibite_cord.py:361-394):

    - HGNC gene-symbol report URLs resolve through the gene-info map to
      ``NCBIGene:<id>`` when the symbol is known;
    - IRIs contract via the prefix map (longest prefix wins); unmapped
      IRIs pass through unchanged;
    - strings already shaped like CURIEs pass through;
    - anything else becomes ``:<raw>`` (reference's blank-prefix CURIE).
    """
    if raw_id.startswith(_HGNC_SYMBOL_URL):
        symbol = raw_id.split("=")[-1]
        if gene_symbol_map and symbol in gene_symbol_map:
            return f"NCBIGene:{gene_symbol_map[symbol]}"
        return raw_id
    if is_iri(raw_id):
        for iri_prefix in sorted(cmap, key=len, reverse=True):
            if raw_id.startswith(iri_prefix):
                return cmap[iri_prefix] + raw_id[len(iri_prefix):]
        return raw_id
    if is_curie(raw_id):
        return raw_id
    return f":{raw_id}"


def guess_biolink_category(curie: str) -> str:
    """CURIE prefix -> Biolink category (utils/transform_utils.py:185-202)."""
    prefix = curie.split(":")[0]
    if prefix in {"UniProtKB", "ComplexPortal"}:
        return "biolink:Protein"
    if prefix == "GO":
        return "biolink:OntologyClass"
    return "biolink:NamedThing"


def collapse_uniprot_isoform(curie: str) -> str:
    """``UniProtKB:P63151-2`` -> ``UniProtKB:P63151``
    (utils/transform_utils.py:205-218; only applied to UniProtKB CURIEs,
    case-insensitive prefix check)."""
    if _UNIPROT_PREFIX_RE.match(curie):
        return _ISOFORM_SUFFIX_RE.sub("", curie)
    return curie


def normalize_curie(curie: str, sssom_map: Mapping[str, str]) -> str:
    """SSSOM ``subject_id -> object_id`` normalization
    (utils/normalize_utils.py:7-46): replace when mapped and the mapping
    is non-empty, else keep the original."""
    mapped = sssom_map.get(curie, "")
    return mapped if mapped else curie
