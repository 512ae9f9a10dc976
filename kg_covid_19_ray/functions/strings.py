"""Scalar string/record helpers (SURVEY §2.8): pipe-joined multivalue
handling, priority coalescing, quote/whitespace scrubbing, recursive
JSON flattening. Pure functions; hot paths apply them via vectorized
``pyarrow.compute`` where possible and only fall back to per-row Python
for the recursive flatten (the reference does the same, SURVEY M18).
"""

from __future__ import annotations

import re
from collections.abc import Mapping, Sequence

PIPE = "|"

_QUOTE_RE = re.compile(r'^"|"$')  # pharmgkb.py:238
_WS_RE = re.compile(r"[\n\t]")  # scibite_cord.py:157


def pipe_join(values: Sequence[str]) -> str:
    """Multi-value field -> pipe-joined string (chembl_transform.py:389-392,
    sars_cov_2_gene_annot.py:219-221)."""
    return PIPE.join(values)


def pipe_split(value: str) -> list[str]:
    """Pipe-joined string -> values; empty string -> [] (drug_central
    .py:177-180, scibite_cord.py:271)."""
    return value.split(PIPE) if value else []


def strip_quotes(value: str) -> str:
    """Strip one leading/trailing double quote (pharmgkb.py:238,
    drug_central.py:161)."""
    return _QUOTE_RE.sub("", value)


def scrub_whitespace(value: str) -> str:
    """Newlines/tabs -> spaces, so TSV rows stay one line
    (scibite_cord.py:157)."""
    return _WS_RE.sub(" ", value)


def get_item_by_priority(record: Mapping[str, str],
                         keys: Sequence[str]) -> str:
    """First non-blank value among ``keys``; raises KeyError when none
    (utils/transform_utils.py:88-107)."""
    for k in keys:
        v = record.get(k)
        if v:
            return v
    raise KeyError(f"no non-blank value among {list(keys)}")


# xref-prefix priority for preferred-id rewriting (pharmgkb.py:191-253)
XREF_PRIORITY = ("CHEBI", "CHEMBL.COMPOUND", "DrugBank", "PubChem Compound")


def preferred_xref(xrefs: Sequence[str],
                   priority: Sequence[str] = XREF_PRIORITY,
                   fallback: str | None = None) -> str | None:
    """Best xref CURIE by prefix priority; ``fallback`` when none match
    (M16; pharmgkb.py:191-253 preferred-id semantics)."""
    by_prefix = {}
    for x in xrefs:
        p = x.split(":", 1)[0]
        if p not in by_prefix:  # first occurrence wins within a prefix
            by_prefix[p] = x
    for p in priority:
        if p in by_prefix:
            return by_prefix[p]
    return fallback


def flatten_json(record, allowed: Sequence[str] | None = None,
                 remap: Mapping[str, str] | None = None,
                 _prefix: str = "") -> dict[str, str]:
    """Recursively flatten a nested dict/list record into a flat
    string dict (chembl_transform.py:333-393):

    - keeps only ``allowed`` leaf keys when given (match on the LEAF
      key name, as the reference's allowed_properties does);
    - renames leaf keys via ``remap``;
    - duplicate leaf keys accumulate and pipe-join, preserving
      encounter order.
    """
    out: dict[str, list[str]] = {}

    def walk(node, key: str):
        if isinstance(node, Mapping):
            for k, v in node.items():
                walk(v, k)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v, key)
        elif node is not None:
            if allowed is not None and key not in allowed:
                return
            name = (remap or {}).get(key, key)
            out.setdefault(name, []).append(str(node))

    walk(record, _prefix)
    return {k: pipe_join(v) for k, v in out.items()}
