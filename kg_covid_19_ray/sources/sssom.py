"""SSSOM mapping-file loading (reference utils/normalize_utils.py:7-75).

The reference's ``normalize_curies`` loads a ``.sssom.tsv`` side file by
skipping exactly 11 metadata header lines, then reading the tab-
separated table whose column row carries ``subject_id``/``object_id``
(normalize_utils.py:24-33). The normalization rule (:36-45): an id with
a mapping is replaced by ``object_id``, an id whose mapping is PRESENT
BUT EMPTY keeps its original value, an absent id keeps its original
value.

Two load paths:

- ``load_sssom_map``: dict for the broadcast-small-side pattern — feed
  it straight to ``stages.linking.make_canonicalize`` (the engine's
  normalize stage);
- ``read_sssom``: the mapping as a ``ray.data.Dataset`` — the web-scale
  path when a mapping is too large to broadcast and must hash-join
  against the id column instead.

``load_ids_from_map`` mirrors normalize_utils.py:48-75 (all subject
ids with a given prefix, e.g. the chebi mapping step of
ontology_transform.py:79-97).
"""

from __future__ import annotations

import csv

import ray.data

SSSOM_HEADER_LINES = 11  # normalize_utils.py:27-29: fixed metadata block


def load_sssom_map(path: str) -> dict[str, str]:
    """subject_id -> object_id dict, EMPTY VALUES KEPT (an empty
    object_id means "mapping known to not exist: keep the original id",
    which consumers distinguish from an absent subject)."""
    with open(path) as f:
        for _ in range(SSSOM_HEADER_LINES):
            next(f)
        reader = csv.DictReader(f, delimiter="\t")
        return {row["subject_id"]: row["object_id"] for row in reader}


def load_ids_from_map(path: str, prefix: str) -> list[str]:
    """All subject ids carrying ``prefix`` (without the colon)."""
    with open(path) as f:
        for _ in range(SSSOM_HEADER_LINES):
            next(f)
        reader = csv.DictReader(f, delimiter="\t")
        return [row["subject_id"] for row in reader
                if row["subject_id"].split(":")[0] == prefix]


def read_sssom(path: str) -> ray.data.Dataset:
    """The mapping as a Dataset(subject_id, object_id) — for hash-join
    normalization when the map outgrows broadcast size. Empty mappings
    arrive as empty strings (same keep-original contract)."""
    from pyarrow import csv as pacsv

    return ray.data.read_csv(
        path,
        read_options=pacsv.ReadOptions(skip_rows=SSSOM_HEADER_LINES),
        parse_options=pacsv.ParseOptions(delimiter="\t"),
        convert_options=pacsv.ConvertOptions(
            include_columns=["subject_id", "object_id"],
            # keep blanks as "" (not null): empty-mapping-keeps-id is a
            # meaningful value, not missing data
            strings_can_be_null=False,
        ),
    )


def write_sssom(path: str, rows: list[dict], *,
                metadata: list[str] | None = None) -> None:
    """Fixture/export helper: write a mapping file in the reference's
    layout — 11 metadata lines, then the tab-separated table."""
    meta = list(metadata or [])
    while len(meta) < SSSOM_HEADER_LINES:
        meta.append(f"# sssom metadata line {len(meta) + 1}")
    cols = ["subject_id", "predicate_id", "object_id", "match_type"]
    with open(path, "w", newline="") as f:
        for line in meta[:SSSOM_HEADER_LINES]:
            f.write(line + "\n")
        w = csv.DictWriter(f, fieldnames=cols, delimiter="\t")
        w.writeheader()
        for r in rows:
            w.writerow({c: r.get(c, "") for c in cols})
