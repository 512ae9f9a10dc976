"""PharmGKB identifier machinery — reference parity for the
xref-priority rewriting source (reference
transform_utils/pharmgkb/pharmgkb.py:185-400; expectations
tests/test_pharmgkb.py:33-90).

Pieces, re-derived with the reference's exact quirks:

- ``parse_pharmgkb_line`` (M1): tab-split zipped with the header;
- ``make_id_mapping_file`` (M17/ST7 side map): one row per PharmGKB
  accession; the Cross-references column is comma-split, per-item
  quote-stripped, split on the FIRST colon into parsed_ids{prefix:id}
  — note the raw header keeps its trailing newline on the last
  column, exactly as the reference's ``readline().split(sep)`` does;
- ``make_preferred_drug_id`` (M16): priority ChEBI > CHEMBL >
  DrugBank > PubChem over the Cross-references, where each item is
  rpartition'd on its LAST colon (so ``ChEBI:CHEBI:1391`` keys as
  ``ChEBI:CHEBI`` -> ``CHEBI:1391``; the reference's
  ``PubChem Compound:`` preference key can therefore never match —
  behavior preserved, not fixed); fallback ``pharmgkb.drug:<id>``;
- ``preferred_drug_ids``: the same rewrite as a broadcast-map Ray
  stage over an id column (engine-style M16 at scale).
"""

from __future__ import annotations

import re

import pandas as pd
import ray
import ray.data

KEY_PARSED_IDS = "parsed_ids"

PREFERRED_IDS = {
    "ChEBI:CHEBI": "CHEBI",
    "CHEMBL": "CHEMBL",
    "DrugBank": "DRUGBANK",
    "PubChem Compound:": "PUBCHEM",  # unreachable, mirrored verbatim
}

_QUOTE_RE = re.compile(r'^"|"$')


def parse_pharmgkb_line(line: str, header_items: list[str]) -> dict:
    """pharmgkb.py:349-360 (M1 header-zip)."""
    return dict(zip(header_items, line.strip().split("\t")))


def make_id_mapping_file(map_file: str, *, sep: str = "\t",
                         pharmgkb_id_col: str = "PharmGKB Accession Id",
                         id_key: str = "Cross-references",
                         id_sep: str = ",",
                         id_key_val_sep: str = ":") -> dict:
    """pharmgkb.py:361-399: {accession: row dict + parsed_ids}."""
    out: dict = {}
    with open(map_file, encoding="utf-8") as fh:
        header_items = fh.readline().split(sep)  # last col keeps \n
        if pharmgkb_id_col not in header_items:
            raise KeyError("Can't find PharmGKB id in map file!")
        for line in fh:
            dat = dict(zip(header_items, line.strip().split(sep)))
            if id_key in dat:
                for item in dat[id_key].split(id_sep):
                    if not item:
                        continue
                    item = item.strip('"')
                    key, value = item.split(id_key_val_sep, 1)
                    dat.setdefault(KEY_PARSED_IDS, {})[key] = value
            out[dat[pharmgkb_id_col]] = dat
    return out


def make_preferred_drug_id(pharmgkb_id: str, drug_id_map: dict,
                           preferred_ids: dict | None = None,
                           pharmgkb_prefix: str = "pharmgkb.drug") -> str:
    """pharmgkb.py:191-253 (M16 priority coalesce, behavior-exact)."""
    if not preferred_ids:
        preferred_ids = PREFERRED_IDS

    preferred = f"{pharmgkb_prefix}:{pharmgkb_id}"
    row = drug_id_map.get(pharmgkb_id)
    if row and row.get("Cross-references"):
        cr: dict[str, str] = {}
        for item in row["Cross-references"].split(","):
            item = _QUOTE_RE.sub("", item)
            prefix, _, value = item.rpartition(":")
            if prefix:
                cr[prefix] = value
        for pref_key, curie_prefix in preferred_ids.items():
            if cr.get(pref_key):
                preferred = f"{curie_prefix}:{cr[pref_key]}"
                break
    return preferred


def preferred_drug_ids(ds: ray.data.Dataset, drugs_tsv: str, *,
                       id_col: str = "drug_id") -> ray.data.Dataset:
    """Engine-style M16: rewrite an id column through the broadcast
    drug map (one ``ray.put``, read per batch)."""
    map_ref = ray.put(make_id_mapping_file(drugs_tsv))

    def rewrite(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(map_ref)
        batch = batch.copy()
        batch[id_col] = [make_preferred_drug_id(v, m)
                         for v in batch[id_col]]
        return batch

    return ds.map_batches(rewrite, batch_format="pandas")
