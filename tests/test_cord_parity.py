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
