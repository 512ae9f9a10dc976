"""RDF sources (S7): N-Triples and OBO-graph-JSON readers.

The reference delegates both to KGX (ontology_transform.py:48-71
obojson -> TSV; gocam_transform.py:93-111 nt/ttl/rdfxml -> TSV). Here
they are native Ray Data readers:

- N-Triples is line-oriented: ``read_text`` + a vectorized regex parse
  per batch, IRIs contracted back to CURIEs with the same prefix map
  the exporter expands with (io/kgx.py) — ``write_ntriples`` then
  ``read_ntriples`` is an exact roundtrip;
- obojson is one nested JSON document per file: ``read_binary_files``
  + ``flat_map`` over ``graphs[].nodes`` / ``graphs[].edges``,
  yielding KGX-shaped node/edge rows (id contracted, category
  guessed — ontology_transform semantics).
"""

from __future__ import annotations

import json
import re

import pyarrow as pa
import ray.data

from kg_covid_19_ray.functions.curies import guess_biolink_category
from kg_covid_19_ray.io.kgx import EXPAND, _FALLBACK_BASE

_NT_RE = re.compile(r'^<([^>]*)> <([^>]*)> (?:<([^>]*)>|"([^"]*)") \.$')

# IRI base -> CURIE prefix, longest first (inverse of io/kgx.EXPAND)
_CONTRACT: list[tuple[str, str]] = sorted(
    ((base, prefix) for prefix, base in EXPAND.items()),
    key=lambda kv: len(kv[0]), reverse=True)


def contract_iri(iri: str) -> str:
    """IRI -> CURIE under the exporter's map; fallback-base IRIs carry
    their CURIE verbatim; unknown IRIs pass through."""
    if iri.startswith(_FALLBACK_BASE):
        return iri[len(_FALLBACK_BASE):]
    for base, prefix in _CONTRACT:
        if iri.startswith(base):
            return f"{prefix}:{iri[len(base):]}"
    return iri


def parse_ntriple_lines(batch: pa.Table,
                        *, text_col: str = "text") -> pa.Table:
    """Batch of raw lines -> (subject, predicate, object, is_literal);
    non-triple lines (comments, blanks) are dropped."""
    subs, preds, objs, lits = [], [], [], []
    for line in batch[text_col].to_pylist():
        m = _NT_RE.match(line.strip())
        if not m:
            continue
        s, p, o_iri, o_lit = m.groups()
        subs.append(contract_iri(s))
        preds.append(contract_iri(p))
        objs.append(o_lit if o_iri is None else contract_iri(o_iri))
        lits.append(o_iri is None)
    return pa.table({
        "subject": pa.array(subs, pa.string()),
        "predicate": pa.array(preds, pa.string()),
        "object": pa.array(objs, pa.string()),
        "is_literal": pa.array(lits, pa.bool_()),
    })


def read_ntriples(path: str) -> ray.data.Dataset:
    """Dataset(subject, predicate, object, is_literal) from a .nt file
    or a directory of part files."""
    return ray.data.read_text(path).map_batches(
        parse_ntriple_lines, batch_format="pyarrow")


def _contract_node_id(raw: str) -> str:
    return contract_iri(raw) if raw.startswith("http") else raw


def read_obojson_nodes(path: str) -> ray.data.Dataset:
    """KGX node rows (id, name, category) from graphs[].nodes
    (ontology_transform.py:65-71 analog)."""
    files = ray.data.read_binary_files(path)

    def nodes(row: dict):
        doc = json.loads(row["bytes"])
        for graph in doc.get("graphs", []):
            for n in graph.get("nodes", []):
                nid = _contract_node_id(n["id"])
                yield {"id": nid, "name": n.get("lbl", ""),
                       "category": guess_biolink_category(nid)}

    return files.flat_map(nodes)


def read_obojson_edges(path: str) -> ray.data.Dataset:
    """KGX edge rows (subject, predicate, object) from graphs[].edges."""
    files = ray.data.read_binary_files(path)

    def edges(row: dict):
        doc = json.loads(row["bytes"])
        for graph in doc.get("graphs", []):
            for e in graph.get("edges", []):
                yield {"subject": _contract_node_id(e["sub"]),
                       "predicate": e.get("pred", "biolink:related_to"),
                       "object": _contract_node_id(e["obj"])}

    return files.flat_map(edges)
