"""STRING protein-links transform — second reference-parity plugin
(reference transform_utils/string_ppi/string_ppi.py:40-295 semantics;
golden expectations tests/test_string.py:78-140: nodes (10,6), edges
(9,20), isoform-collapsed UniProt xref).

Semantics, re-derived:

- three side maps loaded once (ST1/ST2): gene2ensembl.gz filtered to
  taxon 9606 -> {ENSP: ENSG}, {ENSG: NCBI}; gene_info.gz -> NCBI ->
  (symbol, description); HUMAN idmapping.dat.gz -> {name: accession}
  (last row wins, as the reference dict assignment does);
- the links file is space-separated with a header line; each line
  carries protein1/protein2 ("9606.ENSP...") plus combined_score and
  13 channel scores (all kept as strings until export, SURVEY §1.2);
- per protein occurrence: first sighting of its ENSG emits a Gene
  node + a has_gene_product edge to THAT line's protein; first
  sighting of the ENSP emits a Protein node whose xref is the
  isoform-collapsed UniProtKB curie (M13) when the idmapping knows
  the name;
- every line emits one interacts_with edge (no dedup).

Execution shape: the side maps are driver-built and broadcast
(``ray.put``) exactly like the reference's ``__init__`` loads — at
genome scale they stay broadcast dicts (100s of MB, node-local
zero-copy); line order provides the first-wins order key, realized
with the engine's hash-bucketed first_wins shuffle.
"""

from __future__ import annotations

import gzip
import os

import pyarrow as pa
import ray
import ray.data

from kg_covid_19_ray.functions.curies import collapse_uniprot_isoform
from kg_covid_19_ray.stages.dedup import first_wins

SOURCE_NAME = "STRING"
LINKS_FILE = "9606.protein.links.full.v11.5.txt.gz"

NODE_COLUMNS = ["id", "name", "category", "description", "xrefs",
                "provided_by"]
EDGE_CORE = ["subject", "predicate", "object", "relation", "provided_by",
             "type", "combined_score"]
EDGE_CHANNELS = ["neighborhood", "neighborhood_transferred", "fusion",
                 "cooccurence", "homology", "coexpression",
                 "coexpression_transferred", "experiments",
                 "experiments_transferred", "database",
                 "database_transferred", "textmining",
                 "textmining_transferred"]
EDGE_COLUMNS = EDGE_CORE + EDGE_CHANNELS


def load_maps(input_dir: str, species: tuple[str, ...] = ("9606",)):
    """Driver-side side-map build (string_ppi.py:61-132 semantics)."""
    protein_gene: dict[str, str] = {}
    ensembl2ncbi: dict[str, str] = {}
    gene_info: dict[str, dict] = {}
    with gzip.open(os.path.join(input_dir, "gene2ensembl.gz"),
                   "rt") as fh:
        for line in fh:
            rec = line.split("\t")
            if rec[0] not in species:
                continue
            ncbi, ensg = rec[1], rec[2]
            ensp = rec[6].split(".")[0]
            protein_gene.setdefault(ensp, ensg)
            gene_info.setdefault(ncbi, {"ENSEMBL": ensg})
            ensembl2ncbi.setdefault(ensg, ncbi)
    with gzip.open(os.path.join(input_dir, "gene_info.gz"), "rt") as fh:
        for line in fh:
            rec = line.split("\t")
            if rec[0] not in species:
                continue
            info = gene_info.setdefault(rec[1], {})
            info["symbol"] = rec[2]
            info["description"] = rec[8]
    name_to_uniprot: dict[str, str] = {}
    with gzip.open(os.path.join(input_dir, "HUMAN_9606_idmapping.dat.gz"),
                   "rt") as fh:
        for line in fh:
            items = line.strip().split("\t")
            name_to_uniprot[items[2]] = items[0]  # last wins
    return protein_gene, ensembl2ncbi, gene_info, name_to_uniprot


def transform(input_dir: str, data_file: str | None = None
              ) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    maps_ref = ray.put(load_maps(input_dir))
    links_path = os.path.join(input_dir, data_file or LINKS_FILE)
    files = ray.data.read_binary_files(links_path)

    def rows(file_row: dict):
        protein_gene, ensembl2ncbi, gene_info, name_to_uniprot = \
            ray.get(maps_ref)
        data = file_row["bytes"]
        if data[:2] == b"\x1f\x8b":
            data = gzip.decompress(data)
        lines = data.decode("utf-8").splitlines()
        header = [h.replace('"', "") for h in lines[0].strip().split(" ")]
        for lineno, line in enumerate(lines[1:]):
            rec = dict(zip(header, line.strip().split(" ")))
            proteins = []
            for slot, key in enumerate(("protein1", "protein2")):
                ensp = ".".join(rec[key].split(".")[1:])
                proteins.append(ensp)
                order = lineno * 10 + slot
                gene = protein_gene.get(ensp)
                if gene is not None:
                    info = gene_info[ensembl2ncbi[gene]]
                    yield {"kind": "gene_node", "order_key": order,
                           "id": f"ENSEMBL:{gene}",
                           "name": info.get("symbol", ""),
                           "category": "biolink:Gene",
                           "description": info.get("description", ""),
                           "xrefs": f"NCBIGene:{ensembl2ncbi[gene]}"}
                    yield {"kind": "gene_edge", "order_key": order,
                           "subject": f"ENSEMBL:{gene}",
                           "predicate": "biolink:has_gene_product",
                           "object": f"ENSEMBL:{ensp}",
                           "relation": "RO:0002205",
                           "provided_by": "NCBI", "type": "",
                           "combined_score": "",
                           **{c: "" for c in EDGE_CHANNELS}}
                uniprot = ""
                if ensp in name_to_uniprot:
                    uniprot = collapse_uniprot_isoform(
                        f"UniProtKB:{name_to_uniprot[ensp]}")
                yield {"kind": "protein_node", "order_key": order,
                       "id": f"ENSEMBL:{ensp}", "name": "",
                       "category": "biolink:Protein", "description": "",
                       "xrefs": uniprot}
            yield {"kind": "edge", "order_key": lineno * 10 + 9,
                   "subject": f"ENSEMBL:{proteins[0]}",
                   "predicate": "biolink:interacts_with",
                   "object": f"ENSEMBL:{proteins[1]}",
                   "relation": "RO:0002434",
                   "provided_by": SOURCE_NAME,
                   "type": "biolink:Association",
                   "combined_score": rec.get("combined_score", ""),
                   **{c: rec.get(c, "") for c in EDGE_CHANNELS}}

    emitted = files.flat_map(rows)

    def node_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = batch.filter(pc.is_in(batch["kind"], value_set=pa.array(
            ["gene_node", "protein_node"])))
        n = t.num_rows
        cols = {c: t[c] for c in
                ["id", "name", "category", "description", "xrefs"]}
        cols["provided_by"] = pa.array([SOURCE_NAME] * n)
        cols["order_key"] = t["order_key"]
        return pa.table(cols)

    nodes = emitted.map_batches(node_rows, batch_format="pyarrow")
    nodes = first_wins(nodes, ["id"], "order_key") \
        .drop_columns(["order_key"]).select_columns(NODE_COLUMNS)

    def edge_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = batch.filter(pc.equal(batch["kind"], "edge"))
        return pa.table({c: t[c] for c in EDGE_COLUMNS})

    def gene_edge_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = batch.filter(pc.equal(batch["kind"], "gene_edge"))
        cols = {c: t[c] for c in EDGE_COLUMNS}
        cols["order_key"] = t["order_key"]
        return pa.table(cols)

    gene_edges = emitted.map_batches(gene_edge_rows, batch_format="pyarrow")
    gene_edges = first_wins(gene_edges, ["subject"], "order_key") \
        .drop_columns(["order_key"]).select_columns(EDGE_COLUMNS)
    inter_edges = emitted.map_batches(edge_rows, batch_format="pyarrow")
    return nodes, gene_edges.union(inter_edges)


def _register() -> None:
    from kg_covid_19_ray.pipelines.registry import register_transform

    @register_transform("string_ppi")
    def string_ppi(source):
        return transform(source)


_register()
