"""DrugCentral-style drug-target transform — the reference-parity
showcase plugin: runs on the REFERENCE'S OWN test fixture and
reproduces its documented outputs (reference
transform_utils/drug_central/drug_central.py:30-195 semantics;
expected shapes nodes (23,5) / edges (21,7) and the exact node-id set
from tests/test_drug_central.py:77-107).

Semantics, re-derived (not ported):

- gzip TSV with quoted header (M1 parse: strip quotes, zip header);
- keep rows with ORGANISM == species (M2) and a non-blank ACCESSION
  (rows without target info are skipped);
- pipe-split explode ACCESSION|GENE|TDL (M5): GENE list of mismatched
  length -> all names blank; short TDL list -> values repeated; a
  duplicate accession WITHIN a line keeps the LAST entry (the
  reference overwrites a dict slot);
- one Drug node per STRUCT_ID, one Protein node per accession —
  first occurrence wins across the file (D1), order = line number;
- one edge per (line, deduped protein entry), NO edge dedup.

Execution: one task per input file (per-file contiguity gives the
line-number order key — DrugCentral ships as a single .tsv.gz), then
the engine's standard first-wins shuffle for nodes.
"""

from __future__ import annotations

import gzip

import pyarrow as pa
import ray.data

from kg_covid_19_ray.functions.strings import get_item_by_priority
from kg_covid_19_ray.stages.dedup import first_wins

SOURCE_NAME = "drug_central"
SPECIES = "Homo sapiens"
DRUG_PREFIX = "DrugCentral:"
PROTEIN_PREFIX = "UniProtKB:"
DRUG_CATEGORY = "biolink:Drug"
PROTEIN_CATEGORY = "biolink:Protein"
EDGE_PREDICATE = "biolink:molecularly_interacts_with"
EDGE_RELATION = "RO:0002436"
EDGE_TYPE = "biolink:Association"

NODE_COLUMNS = ["id", "name", "category", "TDL", "provided_by"]
EDGE_COLUMNS = ["subject", "predicate", "object", "relation",
                "provided_by", "comment", "type"]


def _parse_file(data: bytes) -> list[dict]:
    """One fixture/file -> per-line field dicts with line order."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    lines = data.decode("utf-8").splitlines()
    header = [h.replace('"', "") for h in lines[0].strip().split("\t")]
    out = []
    for order, line in enumerate(lines[1:]):
        fields = [f.replace('"', "") for f in line.strip().split("\t")]
        rec = dict(zip(header, fields))
        rec["__order"] = order
        out.append(rec)
    return out


def _protein_entries(rec: dict) -> list[tuple[str, str, str]]:
    """M5 explode with the reference's length-mismatch rules and
    within-line last-wins accession dedup."""
    accessions = get_item_by_priority(rec, ["ACCESSION"]).split("|")
    genes = get_item_by_priority(rec, ["GENE"]).split("|")
    tdls = get_item_by_priority(rec, ["TDL"]).split("|")
    if len(accessions) != len(genes):
        genes = [""] * len(accessions)
    if len(accessions) != len(tdls):
        tdls = tdls * len(accessions)
    by_acc: dict[str, tuple[str, str, str]] = {}
    for acc, gene, tdl in zip(accessions, genes, tdls):
        by_acc[acc] = (acc, gene, tdl)  # last wins within the line
    return list(by_acc.values())


def transform(source_path: str) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """source_path: a drug.target.interaction TSV(.gz) file or dir."""
    files = ray.data.read_binary_files(source_path)

    def rows(file_row: dict):
        for rec in _parse_file(file_row["bytes"]):
            if rec.get("ORGANISM") != SPECIES:
                continue
            try:
                entries = _protein_entries(rec)
            except KeyError:
                continue  # no ACCESSION -> drug-only line, skipped
            drug_id = DRUG_PREFIX + get_item_by_priority(rec, ["STRUCT_ID"])
            base_order = rec["__order"] * 1000
            yield {"kind": "drug", "order_key": base_order,
                   "id": drug_id, "name": rec.get("DRUG_NAME", ""),
                   "TDL": "", "comment": "", "object": ""}
            for slot, (acc, gene, tdl) in enumerate(entries):
                yield {"kind": "protein",
                       "order_key": base_order + 1 + slot,
                       "id": PROTEIN_PREFIX + acc, "name": gene,
                       "TDL": tdl, "comment": "", "object": ""}
                yield {"kind": "edge", "order_key": base_order + 1 + slot,
                       "id": drug_id, "name": "", "TDL": "",
                       "comment": rec.get("ACT_COMMENT", ""),
                       "object": PROTEIN_PREFIX + acc}

    emitted = files.flat_map(rows)

    def node_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.not_equal(batch["kind"], "edge")
        t = batch.filter(mask)
        cat = pc.if_else(pc.equal(t["kind"], "drug"),
                         pa.scalar(DRUG_CATEGORY),
                         pa.scalar(PROTEIN_CATEGORY))
        return pa.table({
            "id": t["id"], "name": t["name"], "category": cat,
            "TDL": t["TDL"],
            "provided_by": pa.array([SOURCE_NAME] * t.num_rows),
            "order_key": t["order_key"],
        })

    nodes = emitted.map_batches(node_rows, batch_format="pyarrow")
    nodes = first_wins(nodes, ["id"], "order_key") \
        .drop_columns(["order_key"]).select_columns(NODE_COLUMNS)

    def edge_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = batch.filter(pc.equal(batch["kind"], "edge"))
        n = t.num_rows
        return pa.table({
            "subject": t["id"],
            "predicate": pa.array([EDGE_PREDICATE] * n),
            "object": t["object"],
            "relation": pa.array([EDGE_RELATION] * n),
            "provided_by": pa.array([SOURCE_NAME] * n),
            "comment": t["comment"],
            "type": pa.array([EDGE_TYPE] * n),
        })

    edges = emitted.map_batches(edge_rows, batch_format="pyarrow")
    return nodes, edges


def _register() -> None:
    from kg_covid_19_ray.pipelines.registry import register_transform

    @register_transform(SOURCE_NAME)
    def drug_central(source):
        return transform(source)


_register()
