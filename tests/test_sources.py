"""Tests for the flat-file and XML source parsers (S3/M1/M7/M8/M9/M6)
over synthesized fixtures."""

from __future__ import annotations

import gzip

import pyarrow as pa
import pytest

from kg_covid_19_ray.sources import lines, mixml


def test_read_delimited_gzip_transparent(ray_session, tmp_path):
    p = tmp_path / "table.tsv.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("GENE\tTAXON\n")
        fh.write("BRCA1\t9606\n")
        fh.write("Trp53\t10090\n")
    ds = lines.read_delimited(str(p))
    df = ds.to_pandas()
    assert sorted(df["GENE"]) == ["BRCA1", "Trp53"]
    # M3-style taxon filter on the parsed table
    human = ds.filter(expr="TAXON == 9606").to_pandas()
    assert human["GENE"].tolist() == ["BRCA1"]


def test_parse_header_zip_quotes_and_mismatch(ray_session):
    batch = pa.table({"text": ['"a"\t"b"', "c\td", ""]})
    out = lines.parse_header_zip(batch, ["x", "y"])
    assert out["x"].to_pylist() == ["a", "c"]
    assert out["y"].to_pylist() == ["b", "d"]
    with pytest.raises(ValueError, match="field count"):
        lines.parse_header_zip(pa.table({"text": ["one\ttwo\tthree"]}),
                               ["x", "y"])


def test_read_delimited_comment_header(ray_session, tmp_path):
    p = tmp_path / "odd.tsv"
    p.write_text("# generated\nv1\tv2\nv3\tv4\n")
    ds = lines.read_delimited(str(p), header=["a", "b"], comment="#")
    df = ds.to_pandas().sort_values("a")
    assert df["a"].tolist() == ["v1", "v3"]


TTD_FIXTURE = """\
Title: fixture flat file
Some prologue text

--------------------------------
--------------------------------

T001\tNAME\tTarget one
T001\tUNIPROID\tP12345
T001\tDRUGINFO\tD0001\tDrug A
T001\tDRUGINFO\tD0002\tDrug B

T002\tNAME\tTarget two
T002\tUNIPROID\tQ99999
"""


def test_parse_stanzas_prologue_and_grouping():
    recs = lines.parse_stanzas(TTD_FIXTURE)
    assert [r["record_id"] for r in recs] == ["T001", "T002"]
    assert recs[0]["fields"]["NAME"] == ["Target one"]
    # duplicate abbrevs accumulate in order (dict-of-lists, ttd.py)
    assert recs[0]["fields"]["DRUGINFO"] == ["D0001\tDrug A",
                                             "D0002\tDrug B"]
    # prologue line never parsed as a record
    assert all(r["record_id"].startswith("T") for r in recs)


def test_read_stanza_files_gz(ray_session, tmp_path):
    p = tmp_path / "ttd.txt.gz"
    with gzip.open(p, "wb") as fh:
        fh.write(TTD_FIXTURE.encode())
    df = lines.read_stanza_files(str(p)).to_pandas()
    assert sorted(df["record_id"]) == ["T001", "T002"]
    row = df.set_index("record_id").loc["T001"]
    assert row["DRUGINFO"] == "D0001\tDrug A|D0002\tDrug B"


GPI_FIXTURE = """\
!gpi-version: 1.2
UniProtKB\tP0DTC2\tS\tSpike glycoprotein\tS|spike\tprotein\ttaxon:2697049\t\t\tdb_subset=Swiss-Prot
UniProtKB\tP0DTD1\trep\tReplicase\t\tprotein\ttaxon:2697049\t\t\t
"""


def test_read_gpi(ray_session, tmp_path):
    p = tmp_path / "prot.gpi"
    p.write_text(GPI_FIXTURE)
    df = lines.read_gpi(str(p)).to_pandas().sort_values("DB_Object_ID")
    assert df["DB_Object_ID"].tolist() == ["P0DTC2", "P0DTD1"]
    # reference splits Symbol/Name/Parent/Xref (behavior parity, see
    # sources/lines._GPI_SPLIT_IDX note); Synonym stays raw
    assert list(df.iloc[0]["DB_Object_Symbol"]) == ["S"]
    assert df.iloc[0]["DB_Object_Synonym"] == "S|spike"
    assert list(df.iloc[1]["DB_Object_Symbol"]) == ["rep"]


GPI_REFERENCE_FIXTURE = ("/root/reference/tests/resources/"
                         "uniprot_sars-cov-2_SNIPPET.gpi")


def test_read_gpi_reference_fixture_parity(ray_session):
    """Reference-fixture parity (test_gpi_file.py semantics over the
    snippet): both non-comment records parse, ragged short rows
    included, with the reference's split behavior."""
    import os
    import pytest as _pytest
    if not os.path.exists(GPI_REFERENCE_FIXTURE):
        _pytest.skip("reference fixture unavailable")
    rows = {r["DB_Object_ID"]: r
            for r in lines.read_gpi(GPI_REFERENCE_FIXTURE).take_all()}
    assert set(rows) == {"P0DTD2", "A0A663DJA2"}  # both records parse
    # 9-field row: DB_Xref split into both values
    assert list(rows["P0DTD2"]["DB_Xref"]) == [
        "PR:000050272", "UniProtKB:P0DTD1-PRO_0000449637"]
    # 7-field ragged row: trailing fields null
    assert rows["A0A663DJA2"]["DB_Xref"] is None
    assert rows["A0A663DJA2"]["Taxon"] == "taxon:2697049"


MIXML_FIXTURE = """<?xml version="1.0"?>
<entrySet xmlns="http://psi.hupo.org/mi/mif">
 <entry>
  <experimentList>
   <experimentDescription id="1">
    <bibref><xref>
      <primaryRef db="pubmed" id="12345"/>
    </xref></bibref>
   </experimentDescription>
  </experimentList>
  <interactorList>
   <interactor id="10">
    <names><shortLabel>protA</shortLabel></names>
    <xref><primaryRef db="uniprotkb" id="P11111"/></xref>
    <interactorType><names><shortLabel>protein</shortLabel></names>
    </interactorType>
   </interactor>
   <interactor id="11">
    <names><shortLabel>protB</shortLabel></names>
    <xref><primaryRef db="uniprotkb" id="P22222"/></xref>
    <interactorType><names><shortLabel>protein</shortLabel></names>
    </interactorType>
   </interactor>
   <interactor id="12">
    <names><shortLabel>chemC</shortLabel></names>
    <xref><primaryRef db="chebi" id="15377"/></xref>
    <interactorType><names><shortLabel>small molecule</shortLabel></names>
    </interactorType>
   </interactor>
   <interactor id="13">
    <names><shortLabel>lonely</shortLabel></names>
    <xref><primaryRef db="uniprotkb" id="P33333"/></xref>
    <interactorType><names><shortLabel>protein</shortLabel></names>
    </interactorType>
   </interactor>
  </interactorList>
  <interactionList>
   <interaction id="100">
    <participantList>
     <participant><interactorRef>10</interactorRef></participant>
     <participant><interactorRef>11</interactorRef></participant>
     <participant><interactorRef>12</interactorRef></participant>
    </participantList>
   </interaction>
   <interaction id="101">
    <participantList>
     <participant><interactorRef>13</interactorRef></participant>
    </participantList>
   </interaction>
  </interactionList>
 </entry>
</entrySet>
"""


def test_parse_mixml_nodes_edges():
    nodes, edges = mixml.parse_mixml(MIXML_FIXTURE.encode())
    by_id = {n["id"]: n for n in nodes}
    assert by_id["UniProtKB:P11111"]["category"] == "biolink:Protein"
    assert by_id["CHEBI:15377"]["category"] == "biolink:ChemicalSubstance"
    # 3 participants -> 3 unordered pairs (M6); 1 participant -> skipped
    assert len(edges) == 3
    pairs = {(e["subject"], e["object"]) for e in edges}
    assert ("CHEBI:15377", "UniProtKB:P11111") in pairs
    assert all(e["publication"] == "PMID:12345" for e in edges)
    assert all(e["num_participants"] == "3" for e in edges)


def test_read_mixml_datasets_and_bad_file_skip(ray_session, tmp_path):
    (tmp_path / "good.xml").write_text(MIXML_FIXTURE)
    (tmp_path / "bad.xml").write_text("<unclosed")
    nodes = mixml.read_mixml_nodes(str(tmp_path)).to_pandas()
    edges = mixml.read_mixml_edges(str(tmp_path)).to_pandas()
    assert len(nodes) == 4 and len(edges) == 3  # bad file skipped


def test_read_json_records_with_flatten(ray_session, tmp_path):
    """S2/S6: canned-JSON record ingestion (the ES-scroll / ChEMBL
    path) — read_json + the recursive flattener to a flat table."""
    import json as _json
    import ray.data
    from kg_covid_19_ray.functions.strings import flatten_json

    recs = [
        {"molecule": {"pref_name": "Water", "chebi": "CHEBI:15377"},
         "synonyms": [{"name": "H2O"}, {"name": "oxidane"}]},
        {"molecule": {"pref_name": "Ethanol", "chebi": "CHEBI:16236"},
         "synonyms": []},
    ]
    p = tmp_path / "records.jsonl"
    p.write_text("\n".join(_json.dumps(r) for r in recs))

    ds = ray.data.read_json(str(p))

    def flat(row: dict) -> dict:
        out = flatten_json(row, allowed=["pref_name", "chebi", "name"])
        return {"pref_name": out.get("pref_name", ""),
                "chebi": out.get("chebi", ""),
                "synonyms": out.get("name", "")}

    df = ds.map(flat).to_pandas().sort_values("pref_name")
    assert df["pref_name"].tolist() == ["Ethanol", "Water"]
    assert df.iloc[1]["synonyms"] == "H2O|oxidane"


TTD_REFERENCE_FIXTURE = ("/root/reference/tests/resources/"
                         "P1-01-TTD_target_download_SNIPPET.txt")


def test_parse_stanzas_reference_fixture_parity(ray_session):
    """Reference-fixture parity (tests/test_ttd_transform.py:44-80
    expectations): the engine's stanza parser reproduces the
    reference's parse of its own TTD snippet — record ids, GENENAME,
    both DRUGINFO entries, multi-accession UNIPROID."""
    import os
    import pytest as _pytest
    if not os.path.exists(TTD_REFERENCE_FIXTURE):
        _pytest.skip("reference fixture unavailable")
    recs = {r["record_id"]: r["fields"]
            for r in lines.parse_stanzas(open(TTD_REFERENCE_FIXTURE).read())}
    assert sorted(recs.keys()) == ["T17514", "T47101"]
    t = recs["T47101"]
    assert t["TARGETID"] == ["T47101"]
    assert t["GENENAME"] == ["FGFR1"]
    assert t["DRUGINFO"] == ["D09HNV\tIntedanib\tApproved",
                             "D01PZD\tRomiplostim\tApproved"]
    assert recs["T17514"]["UNIPROID"] == [
        "INHBA_HUMAN; INHBB_HUMAN; INHBC_HUMAN; INHBE_HUMAN"]


INTACT_FIXTURE = "/root/reference/tests/resources/intact_test.xml"
INTACT_3P_FIXTURE = ("/root/reference/tests/resources/"
                     "intact_3_participants.xml")


def test_mixml_reference_fixture_parity():
    """Reference-fixture parity (tests/test_intact.py:74-110): the
    engine's miXML parser on the reference's own IntAct fixtures
    reproduces its documented node/edge counts, the node id set, and
    the 3-participant pairwise explosion."""
    import os
    import pytest as _pytest
    if not os.path.exists(INTACT_FIXTURE):
        _pytest.skip("reference fixture unavailable")
    nodes, edges = mixml.parse_mixml(open(INTACT_FIXTURE, "rb").read())
    assert len(nodes) == 5 and len(edges) == 8
    assert nodes[0]["id"] == "UniProtKB:P20290"
    assert nodes[0]["name"] == "btf3_human"
    assert nodes[0]["category"] == "biolink:Protein"
    assert {n["id"] for n in nodes} == {
        "UniProtKB:P20290", "UniProtKB:P0C6X7-PRO_0000037317",
        "UniProtKB:P03901", "UniProtKB:P00403", "UniProtKB:Q9Y2D1"}

    n3, e3 = mixml.parse_mixml(open(INTACT_3P_FIXTURE, "rb").read())
    assert len(n3) == 3 and len(e3) == 3  # (1-2, 2-3, 1-3)
    assert all(e["num_participants"] == "3" for e in e3)
