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
    df = lines.read_gpi(str(p)).to_pandas().sort_values("db_object_id")
    assert df["db_object_id"].tolist() == ["P0DTC2", "P0DTD1"]
    assert list(df.iloc[0]["db_object_synonyms"]) == ["S", "spike"]
    assert df.iloc[1]["db_object_symbol"] == "rep"


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
