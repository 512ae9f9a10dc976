"""CORD annotated-paper source — the reference's SciBite termite-hit
extraction (the M10 north-star analog) over its own zipped JSON
fixtures (reference scibite_cord.py:117-232; fixtures
tests/resources/scibite_cord/*.zip).

Semantics, re-derived:

- each zip holds per-paper JSON; hits live in ``termite_hits`` maps on
  the metadata block and every abstract/body_text block (M10 walk);
- a paper's terms are the UNION of hit ids in first-seen order; the
  first seen name per id populates the concept-name map (ST6);
- 2-letter ids are country codes: mapped to a wikidata IRI + name via
  the side TSV (M12) then contracted (M11); category NamedThing.
  Everything else contracts directly; category OntologyClass;
- edges: (CORD:paper, biolink:mentions, term curie, SIO:000255) — one
  per (paper, term) since terms are already per-paper unique (D2);
- nodes: a Publication per paper (title whitespace-scrubbed, M19) and
  a first-wins node per term (D1).

Execution: one Ray task per ZIP (``read_binary_files`` + flat_map —
the S4 zip pattern: archives never touch shared disk, they unpack in
worker memory); term-node dedup via the engine's first_wins shuffle.
"""

from __future__ import annotations

import io
import json
import zipfile

import pyarrow as pa
import ray.data

from kg_covid_19_ray.functions.curies import contract_uri
from kg_covid_19_ray.functions.strings import scrub_whitespace
from kg_covid_19_ray.stages.dedup import first_wins

SOURCE_NAME = "scibite_cord"
EDGE_PREDICATE = "biolink:mentions"
EDGE_RELATION = "SIO:000255"


def load_country_codes(tsv_path: str) -> dict[str, tuple[str, str]]:
    """code -> (wikidata IRI, name) (scibite_cord.py:454-465)."""
    out: dict[str, tuple[str, str]] = {}
    with open(tsv_path, encoding="utf-8") as fh:
        next(fh)  # header: item, code, name
        for line in fh:
            item, code, name = line.rstrip("\n").split("\t")[:3]
            out[code] = (item, name)
    return out


def _paper_terms(doc: dict) -> tuple[list[str], dict[str, str]]:
    """M10: union of hit ids across metadata + abstract + body_text in
    first-seen order, plus the id -> first-seen-name map."""
    terms: list[str] = []
    names: dict[str, str] = {}
    seen: set[str] = set()
    sections = [doc.get("metadata", {})]
    sections += doc.get("abstract", [])
    sections += doc.get("body_text", [])
    for sec in sections:
        for _typ, hits in (sec.get("termite_hits") or {}).items():
            for hit in hits:
                hid = hit["id"]
                if hid not in seen:
                    seen.add(hid)
                    terms.append(hid)
                    names[hid] = hit.get("name", "")
    return terms, names


def read_cord_papers(zip_paths: list[str]) -> ray.data.Dataset:
    """Dataset(paper_id, title, term_ids list, term_names list); one
    task per zip."""
    files = ray.data.read_binary_files(zip_paths)

    def papers(row: dict):
        zf = zipfile.ZipFile(io.BytesIO(row["bytes"]))
        for name in zf.namelist():
            if not name.endswith(".json"):
                continue
            try:
                doc = json.loads(zf.read(name))
            except (json.JSONDecodeError, UnicodeDecodeError):
                continue  # per-record skip (intact.py:183-184 semantics)
            terms, names = _paper_terms(doc)
            yield {
                "paper_id": doc["paper_id"],
                "title": scrub_whitespace(
                    doc.get("metadata", {}).get("title", "")),
                "term_ids": terms,
                "term_names": [names[t] for t in terms],
            }

    return files.flat_map(papers)


def _link_term(term: str, name: str,
               country_map: dict[str, tuple[str, str]]
               ) -> tuple[str, str, str]:
    """-> (curie, name, category) (scibite_cord.py:190-203)."""
    if len(term) == 2:
        if term in country_map:
            iri, cname = country_map[term]
            return contract_uri(iri), cname, "biolink:NamedThing"
        return contract_uri(term), "", "biolink:NamedThing"
    return contract_uri(term), name, "biolink:OntologyClass"


COOCCUR_PROVIDED_BY = f"{SOURCE_NAME} co-occurrences"


def cooccurrence_transform(input_dir: str,
                           zip_name: str = "cv19_scc_1_2.zip"
                           ) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """F2 co-occurrence TSV (scibite_cord.py:234-340, behavior-exact):
    one Publication node per first paper occurrence; term handling
    mirrors a reference QUIRK — the branch checks ``t not in seen`` but
    only ever adds the CONTRACTED curie (never the raw ``t``), so the
    branch always fires: term NODES are emitted at every occurrence
    (duplicates and all), while EDGES dedup through the
    ``(curie, paper)`` tuple set — one ``correlated_with`` edge
    (term -> paper, RO:0002610) per distinct pair (D2). Rows with
    empty entity_uris are skipped.

    Single task per zip: the TSV's row order IS the reference's seen-
    set order (S4 contiguity), so no shuffle is needed for parity."""
    import os

    country_map = load_country_codes(
        os.path.join(input_dir, "wikidata_country_codes.tsv"))
    files = ray.data.read_binary_files(
        os.path.join(input_dir, zip_name))

    def rows(file_row: dict):
        import csv
        zf = zipfile.ZipFile(io.BytesIO(file_row["bytes"]))
        tsv_name = next(n for n in zf.namelist() if n.endswith(".tsv"))
        text = zf.read(tsv_name).decode("utf-8")
        reader = csv.DictReader(io.StringIO(text), delimiter="\t")
        seen: set = set()
        for rec in reader:
            uris = rec.get("entity_uris")
            if not uris:
                continue
            terms = set(uris.split("|"))
            paper_id = rec["document_id"]
            if paper_id.endswith(".xml"):
                paper_id = paper_id[: -len(".xml")]
            paper_curie = f"CORD:{paper_id}"
            if paper_id not in seen:
                yield {"kind": "node", "id": paper_curie, "name": "",
                       "category": "biolink:Publication",
                       "subject": "", "object": ""}
                seen.add(paper_id)
            for t in terms:
                curie, name, category = _link_term(t, "", country_map)
                if t not in seen:  # always true: only curie gets added
                    yield {"kind": "node", "id": curie, "name": name,
                           "category": category,
                           "subject": "", "object": ""}
                    seen.add(curie)
                    if (curie, paper_curie) not in seen:
                        yield {"kind": "edge", "id": "", "name": "",
                               "category": "", "subject": curie,
                               "object": paper_curie}
                        seen.add((curie, paper_curie))

    emitted = files.flat_map(rows)

    def nodes_of(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = batch.filter(pc.equal(batch["kind"], "node"))
        return pa.table({
            "id": t["id"], "name": t["name"], "category": t["category"],
            "provided_by": pa.array([COOCCUR_PROVIDED_BY] * t.num_rows),
        })

    def edges_of(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = batch.filter(pc.equal(batch["kind"], "edge"))
        n = t.num_rows
        return pa.table({
            "subject": t["subject"],
            "predicate": pa.array(["biolink:correlated_with"] * n),
            "object": t["object"],
            "relation": pa.array(["RO:0002610"] * n),
            "provided_by": pa.array([COOCCUR_PROVIDED_BY] * n),
            "type": pa.array(["biolink:Association"] * n),
        })

    return (emitted.map_batches(nodes_of, batch_format="pyarrow"),
            emitted.map_batches(edges_of, batch_format="pyarrow"))


def cord_transform(input_dir: str, zip_names: list[str]
                   ) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(nodes, edges) from the CORD zips under ``input_dir``."""
    import os
    import ray

    country_ref = ray.put(load_country_codes(
        os.path.join(input_dir, "wikidata_country_codes.tsv")))
    papers = read_cord_papers(
        [os.path.join(input_dir, z) for z in zip_names])

    def edge_rows(batch: pa.Table) -> pa.Table:
        import ray as _ray
        cmap = _ray.get(country_ref)
        subs, objs = [], []
        for pid, terms in zip(batch["paper_id"].to_pylist(),
                              batch["term_ids"].to_pylist()):
            for t in terms:
                subs.append(f"CORD:{pid}")
                objs.append(_link_term(t, "", cmap)[0])
        n = len(subs)
        return pa.table({
            "subject": pa.array(subs, pa.string()),
            "predicate": pa.array([EDGE_PREDICATE] * n),
            "object": pa.array(objs, pa.string()),
            "relation": pa.array([EDGE_RELATION] * n),
            "provided_by": pa.array([SOURCE_NAME] * n),
        })

    edges = papers.map_batches(edge_rows, batch_format="pyarrow")

    def node_rows(batch: pa.Table) -> pa.Table:
        import zlib
        import ray as _ray
        cmap = _ray.get(country_ref)
        ids, names, cats, orders = [], [], [], []
        for pid, title, terms, tnames in zip(
                batch["paper_id"].to_pylist(),
                batch["title"].to_pylist(),
                batch["term_ids"].to_pylist(),
                batch["term_names"].to_pylist()):
            # deterministic (layout-independent) order key: papers rank
            # by id hash, terms by within-paper first-seen position
            base = zlib.crc32(pid.encode()) * 10_000
            ids.append(f"CORD:{pid}")
            names.append(title)
            cats.append("biolink:Publication")
            orders.append(base)
            for slot, (t, nm) in enumerate(zip(terms, tnames)):
                curie, lname, cat = _link_term(t, nm, cmap)
                ids.append(curie)
                names.append(lname)
                cats.append(cat)
                orders.append(base + 1 + slot)
        n = len(ids)
        return pa.table({
            "id": pa.array(ids, pa.string()),
            "name": pa.array(names, pa.string()),
            "category": pa.array(cats, pa.string()),
            "provided_by": pa.array([SOURCE_NAME] * n),
            "order_key": pa.array(orders, pa.int64()),
        })

    nodes = papers.map_batches(node_rows, batch_format="pyarrow")
    nodes = first_wins(nodes, ["id"], "order_key").drop_columns(["order_key"])
    return nodes, edges
