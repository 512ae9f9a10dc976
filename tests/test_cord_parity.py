"""CORD termite-hit extraction over the reference's OWN zipped
fixtures (tests/resources/scibite_cord/*.zip; the reference's own test
is smoke-only, so the oracle here is an independent in-test recount of
the fixture JSON)."""

from __future__ import annotations

import io
import json
import os
import zipfile

import pytest

from kg_covid_19_ray.sources import cord

FIXDIR = "/root/reference/tests/resources/scibite_cord"
ZIPS = ["pdf_json_part_1.zip", "pdf_json_part_2.zip"]

pytestmark = pytest.mark.skipif(not os.path.isdir(FIXDIR),
                                reason="reference fixtures unavailable")


def _expected_pairs() -> set[tuple[str, str]]:
    """Independent recount: every (paper, distinct hit id) pair."""
    pairs = set()
    for zname in ZIPS:
        zf = zipfile.ZipFile(os.path.join(FIXDIR, zname))
        for name in zf.namelist():
            if not name.endswith(".json"):
                continue
            doc = json.loads(zf.read(name))
            sections = [doc.get("metadata", {})]
            sections += doc.get("abstract", [])
            sections += doc.get("body_text", [])
            for sec in sections:
                for _t, hits in (sec.get("termite_hits") or {}).items():
                    for h in hits:
                        pairs.add((doc["paper_id"], h["id"]))
    return pairs


def test_cord_edges_match_fixture_recount(ray_session):
    cmap = cord.load_country_codes(
        os.path.join(FIXDIR, "wikidata_country_codes.tsv"))
    nodes, edges = cord.cord_transform(FIXDIR, ZIPS)
    edf = edges.to_pandas()
    expected = {(f"CORD:{pid}", cord._link_term(t, "", cmap)[0])
                for pid, t in _expected_pairs()}
    got = set(zip(edf["subject"], edf["object"]))
    assert got == expected
    assert (edf["predicate"] == "biolink:mentions").all()
    assert (edf["relation"] == "SIO:000255").all()


def test_cord_nodes_country_mapping_and_dedup(ray_session):
    nodes, _ = cord.cord_transform(FIXDIR, ZIPS)
    ndf = nodes.to_pandas()
    assert ndf["id"].is_unique  # D1 across papers and zips
    pubs = ndf[ndf["category"] == "biolink:Publication"]
    n_papers = len({pid for pid, _ in _expected_pairs()})
    assert len(pubs) >= n_papers  # papers w/o hits still get a node
    assert len(pubs) == 10  # JSON papers in the two pdf zips
    assert pubs["id"].str.startswith("CORD:").all()
    # M12 on THIS fixture: the side TSV is a 10-row snippet (AD..AO)
    # covering none of the papers' codes, so every country hit takes
    # the reference's unmapped path -> blank-prefix CURIE ":XX",
    # category NamedThing, empty name
    unmapped = ndf[ndf["id"].str.match(r"^:[A-Z]{2}$")]
    assert len(unmapped) > 0
    assert (unmapped["category"] == "biolink:NamedThing").all()
    assert (unmapped["name"] == "").all()


def test_cord_country_mapped_path():
    """M12 mapped path, driven by a code the snippet DOES contain."""
    cmap = cord.load_country_codes(
        os.path.join(FIXDIR, "wikidata_country_codes.tsv"))
    curie, name, cat = cord._link_term("AD", "", cmap)
    assert curie == "wikidata:Q228"
    assert name == "Andorra" and cat == "biolink:NamedThing"
    # unmapped 2-letter falls back to the blank-prefix CURIE
    assert cord._link_term("ZZ", "", cmap)[0] == ":ZZ"


def test_cord_dataset_invariant_to_zip_order(ray_session):
    a_nodes, _ = cord.cord_transform(FIXDIR, ZIPS)
    b_nodes, _ = cord.cord_transform(FIXDIR, list(reversed(ZIPS)))
    key = lambda df: sorted(map(tuple, df.astype(str).to_numpy()))
    assert key(a_nodes.to_pandas()) == key(b_nodes.to_pandas())


def test_cooccurrence_transform_reference_fixture(ray_session):
    """F2 co-occurrence parity over cv19_scc_1_2.zip: edges = distinct
    (contracted term, paper) pairs (D2); paper nodes one per paper;
    term nodes duplicated per occurrence (reference seen-set quirk,
    see sources/cord.cooccurrence_transform docstring)."""
    import csv as _csv
    import io as _io

    nodes, edges = cord.cooccurrence_transform(FIXDIR)
    ndf, edf = nodes.to_pandas(), edges.to_pandas()

    # independent recount from the raw TSV
    cmap = cord.load_country_codes(
        os.path.join(FIXDIR, "wikidata_country_codes.tsv"))
    zf = zipfile.ZipFile(os.path.join(FIXDIR, "cv19_scc_1_2.zip"))
    text = zf.read("cv19_scc.tsv").decode("utf-8")
    # emulate the reference's seen-set gating: the branch checks raw
    # ``t`` but adds the contracted curie — so it re-fires every time
    # EXCEPT for curie-shaped terms where contract(t) == t
    papers, pairs, term_rows, seen = set(), set(), 0, set()
    for rec in _csv.DictReader(_io.StringIO(text), delimiter="\t"):
        if not rec.get("entity_uris"):
            continue
        pid = rec["document_id"].removesuffix(".xml")
        papers.add(pid)
        for t in set(rec["entity_uris"].split("|")):
            curie = cord._link_term(t, "", cmap)[0]
            if t not in seen:
                term_rows += 1
                seen.add(curie)
                pairs.add((curie, f"CORD:{pid}"))

    assert set(zip(edf["subject"], edf["object"])) == pairs
    assert len(edf) == len(pairs)  # exact D2 dedup
    assert (edf["relation"] == "RO:0002610").all()
    assert (edf["predicate"] == "biolink:correlated_with").all()
    pubs = ndf[ndf["category"] == "biolink:Publication"]
    assert len(pubs) == len(papers)
    # term nodes: one row per gated occurrence (quirk preserved)
    assert len(ndf) == len(papers) + term_rows
    assert (ndf["provided_by"] == "scibite_cord co-occurrences").all()


def test_cord_reader_skips_corrupt_member(ray_session, tmp_path):
    """A corrupt JSON member must not kill the job (per-record skip)."""
    import json as _json
    src = zipfile.ZipFile(os.path.join(FIXDIR, ZIPS[0]))
    out_zip = tmp_path / "mixed.zip"
    with zipfile.ZipFile(out_zip, "w") as zf:
        names = [n for n in src.namelist() if n.endswith(".json")]
        zf.writestr(names[0], src.read(names[0]))  # one good paper
        zf.writestr("broken.json", b"{not json")
    papers = cord.read_cord_papers([str(out_zip)]).take_all()
    assert len(papers) == 1
    assert papers[0]["paper_id"] == _json.loads(
        src.read(names[0]))["paper_id"]
