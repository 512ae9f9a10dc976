"""Static side tables: gazetteer, country codes, SSSOM map, same-as edges.

This module is the SINGLE SOURCE OF TRUTH for the dictionary side of the
KG pipeline, for both the Ray execution path and the DuckDB oracle SQL
(``__ray_entry__.oracle_sql`` builds its VALUES literals from these
tables, so Ray and SQL can never drift apart structurally; the *logic*
— contraction, dedup, clustering — is still computed independently by
each engine).

It plays the role of the reference's load-once lookup tables
(reference ``string_ppi.py:61-132``, ``scibite_cord.py:420-465``,
``utils/normalize_utils.py:7-46``): small dimension data loaded in actor
``__init__`` / broadcast to workers, never shuffled.

The gazetteer's surface forms are drawn from the deterministic synthetic
corpus vocabulary (``/root/testdata/sf*/documents.parquet``), and the raw
ids deliberately cover every identifier shape the reference handles:
OBO/MeSH IRIs (contraction), HGNC symbol URLs (gene-info rewrite),
UniProt isoforms (collapse), bare CURIEs (pass-through), 2-letter country
codes (wikidata map), and free text (``:<raw>`` fallback).
"""

from __future__ import annotations

from kg_covid_19_ray.functions.curies import (
    collapse_uniprot_isoform,
    contract_uri,
    guess_biolink_category,
)

PROVIDED_BY = "web_pages"  # per-source tag, analog of reference source_name

# 2-letter hit id -> (wikidata IRI, country name)
# (reference scibite_cord.py:190-203,454-465)
COUNTRY_CODE_MAP: dict[str, tuple[str, str]] = {
    "RU": ("http://www.wikidata.org/entity/Q159", "Russian Federation"),
    "DE": ("http://www.wikidata.org/entity/Q183", "Germany"),
}

# HGNC symbol -> NCBI gene id (reference scibite_cord.py:437-452 gene_info map)
GENE_SYMBOL_MAP: dict[str, str] = {
    "ACE2": "59272",
    "TMPRSS2": "7113",
}

# (surface form, raw hit id, preferred name, pipe-joined xrefs)
# gaz_idx = list position; the explicit deterministic order key that
# replaces the reference's file-order-dependent iteration (SURVEY §2.9).
GAZETTEER: list[tuple[str, str, str, str]] = [
    ("spark", "http://purl.obolibrary.org/obo/GO_0006412", "translation", ""),
    ("merge", "https://id.nlm.nih.gov/mesh/D018352", "Coronavirus Infections", ""),
    ("hash", "UniProtKB:P35499-2", "sodium channel SCN4A isoform 2", ""),
    ("vector", "UniProtKB:P63151", "PP2A subunit B", ""),
    ("stream", "streamconcept", "free-text stream concept", ""),
    ("window", "RU", "", ""),
    ("scan", "CHEMBL.COMPOUND:CHEMBL25", "aspirin",
     "CHEMBL.COMPOUND:CHEMBL25|PUBCHEM.COMPOUND:2244"),
    ("dup", "DRUGBANK:DB00945", "acetylsalicylic acid",
     "CHEBI:15365|CHEMBL.COMPOUND:CHEMBL25|PUBCHEM.COMPOUND:2244"),
    ("customer",
     "http://www.genenames.org/cgi-bin/gene_symbol_report?match=ACE2",
     "angiotensin converting enzyme 2", ""),
    ("batch", "http://purl.obolibrary.org/obo/CHEBI_15365", "acetylsalicylate",
     "DRUGBANK:DB00945|PUBCHEM.COMPOUND:2244"),
    ("filter", "ComplexPortal:CPX-5742", "spike glycoprotein complex", ""),
    ("query", "DE", "", ""),
]

# SSSOM subject_id -> object_id (empty object_id = no mapping; keep id).
# (reference utils/normalize_utils.py:24-44; maps/*.sssom.tsv)
SSSOM_MAP: dict[str, str] = {
    "DRUGBANK:DB00945": "CHEBI:15365",
    "MESH:D018352": "MONDO:0005091",
    "CHEMBL.COMPOUND:CHEMBL25": "",  # present but empty -> keep original
}

# Undirected same-as assertions feeding connected-components
# canonicalization (north_star "same-as clustering"; analog of the
# reference's merge-time remap_node_identifier, merge.yaml:42-47).
# Chain CHEBI<->CHEMBL<->PUBCHEM tests transitivity; the PUBCHEM member
# never appears as a node. Cluster canonical id = lexicographic min.
SAMEAS_EDGES: list[tuple[str, str]] = [
    ("CHEBI:15365", "CHEMBL.COMPOUND:CHEMBL25"),
    ("CHEMBL.COMPOUND:CHEMBL25", "PUBCHEM.COMPOUND:2244"),
    ("UniProtKB:P63151", "UniProtKB:P35499"),
]

# Preferred-xref priority (reference pharmgkb.py:191-253: CHEBI > CHEMBL >
# DRUGBANK > PUBCHEM).
XREF_PRIORITY: list[str] = [
    "CHEBI:", "CHEMBL.COMPOUND:", "DRUGBANK:", "PUBCHEM.COMPOUND:",
]


def link_raw_id(raw_id: str) -> tuple[str, str, str]:
    """Resolve one raw gazetteer hit id to (curie, name_override, category).

    Mirrors the reference's per-term branch in ``parse_annotation_doc``
    (scibite_cord.py:186-218): 2-letter ids go through the country-code
    map and get category NamedThing; everything else is contracted and
    isoform-collapsed, with the category guessed from the CURIE prefix.
    ``name_override`` is non-empty only for country codes (the reference
    takes the wikidata country name over the hit name).
    """
    if len(raw_id) == 2:
        if raw_id in COUNTRY_CODE_MAP:
            iri, name = COUNTRY_CODE_MAP[raw_id]
            return contract_uri(iri), name, "biolink:NamedThing"
        return contract_uri(raw_id), "", "biolink:NamedThing"
    curie = contract_uri(raw_id, gene_symbol_map=GENE_SYMBOL_MAP)
    curie = collapse_uniprot_isoform(curie)
    return curie, "", guess_biolink_category(curie)


def linked_gazetteer() -> list[dict]:
    """Gazetteer with linking applied (pre-SSSOM, pre-clustering).

    One dict per entry: ``{gaz_idx, surface, raw_id, curie, name,
    category, xrefs}``. ``name`` already reflects country-name override.
    """
    out = []
    for idx, (surface, raw_id, name, xrefs) in enumerate(GAZETTEER):
        curie, name_override, category = link_raw_id(raw_id)
        out.append({
            "gaz_idx": idx,
            "surface": surface,
            "raw_id": raw_id,
            "curie": curie,
            "name": name_override or name,
            "category": category,
            "xrefs": xrefs,
        })
    return out


def sameas_canonical_map() -> dict[str, str]:
    """member -> lexicographic-min id of its connected component.

    Driver-side union-find over the (tiny, static) same-as table; the
    distributed label-propagation in ``stages/cluster.py`` must agree
    with this (asserted in tests).
    """
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in SAMEAS_EDGES:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    return {m: find(m) for m in parent}


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def gazetteer_values_sql() -> str:
    """DuckDB VALUES literal: gaz(gaz_idx, surface, curie, name, category,
    xrefs). ``curie`` is post-link/pre-SSSOM — the contraction itself is
    unit-tested against hand-written expectations in
    ``tests/test_curies.py``; the SQL oracle independently re-derives
    everything downstream (detection scan, SSSOM, clustering, dedup)."""
    rows = ", ".join(
        f"({e['gaz_idx']}, {_q(e['surface'])}, {_q(e['curie'])}, "
        f"{_q(e['name'])}, {_q(e['category'])}, {_q(e['xrefs'])})"
        for e in linked_gazetteer()
    )
    return f"(VALUES {rows}) AS gaz(gaz_idx, surface, curie, name, category, xrefs)"


def sssom_values_sql() -> str:
    rows = ", ".join(f"({_q(k)}, {_q(v)})" for k, v in SSSOM_MAP.items())
    return f"(VALUES {rows}) AS sssom(subject_id, object_id)"


def sameas_values_sql() -> str:
    rows = ", ".join(f"({_q(a)}, {_q(b)})" for a, b in SAMEAS_EDGES)
    return f"(VALUES {rows}) AS sameas(a, b)"


# Shared SQL CTE chain computing normalized mentions from `documents`.
# Detection contract: corpus text is lowercase words separated by single
# spaces (no punctuation), so `' '||text||' '` LIKE `'% w %'` in SQL is
# equivalent to the engine's RE2 `\bw\b` scan.
MENTIONS_CTES_SQL = """
gaz AS (SELECT * FROM {gaz_values}),
sssom AS (SELECT * FROM {sssom_values}),
sameas AS (SELECT * FROM {sameas_values}),
und AS (
    SELECT a AS x, b AS y FROM sameas UNION SELECT b, a FROM sameas
    UNION SELECT a, a FROM sameas UNION SELECT b, b FROM sameas
),
reach(src, dst) AS (
    SELECT x, y FROM und
    UNION
    SELECT r.src, u.y FROM reach r JOIN und u ON r.dst = u.x
),
canon AS (SELECT src AS member, min(dst) AS canon FROM reach GROUP BY src),
mentions_raw AS (
    SELECT d.doc_id, g.gaz_idx, g.surface, g.curie, g.name, g.category
    FROM documents d
    JOIN gaz g ON (' ' || d.text || ' ') LIKE ('% ' || g.surface || ' %')
),
mentions_norm AS (
    SELECT m.doc_id, m.gaz_idx, m.surface,
           coalesce(nullif(s.object_id, ''), m.curie) AS curie,
           m.name, m.category
    FROM mentions_raw m LEFT JOIN sssom s ON m.curie = s.subject_id
),
mentions AS (
    SELECT m.doc_id, m.gaz_idx, m.surface,
           coalesce(c.canon, m.curie) AS curie, m.name, m.category
    FROM mentions_norm m LEFT JOIN canon c ON m.curie = c.member
)
"""


def mentions_ctes() -> str:
    """The WITH-clause body (no leading WITH) shared by all KG oracles."""
    return MENTIONS_CTES_SQL.format(
        gaz_values=gazetteer_values_sql(),
        sssom_values=sssom_values_sql(),
        sameas_values=sameas_values_sql(),
    )
