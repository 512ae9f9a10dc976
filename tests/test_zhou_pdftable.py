"""S5 PDF-table source + Zhou transform parity
(zhou_transform.py:30-145, transform_utils.py:28-67): multi-page
header-zip flattening, per-row node/edge emission with the reference's
exact headers, unknown-coronavirus raise."""

from __future__ import annotations

import json

import pytest

from kg_covid_19_ray.pipelines import zhou
from kg_covid_19_ray.sources.pdftable import (
    get_header_items,
    multi_page_table_to_list,
    read_pdf_tables,
)


def test_multi_page_table_to_list_header_zip():
    pages = [
        {"data": [
            [{"text": "A"}, {"text": "B"}],
            [{"text": "1"}, {"text": "2"}],
        ]},
        {"data": [[{"text": "3"}, {"text": "4"}]]},
    ]
    rows = multi_page_table_to_list(pages)
    assert rows == [{"A": "1", "B": "2"}, {"A": "3", "B": "4"}]
    # header was POPPED from page 0 (reference mutates in place)
    assert len(pages[0]["data"]) == 1


def test_get_header_items_pops_first_row():
    t = {"data": [[{"text": "x"}], [{"text": "v"}]]}
    assert get_header_items(t) == ["x"]
    assert t["data"] == [[{"text": "v"}]]


def test_read_pdf_tables_dataset(ray_session, tmp_path):
    p = tmp_path / "fig3.pdf.json"
    n = zhou.make_fixture_pdf_json(str(p))
    out = read_pdf_tables(str(p)).to_pandas()
    assert len(out) == n
    assert sorted(out.columns) == ["path", "row_idx", "row_json"]
    first = json.loads(
        out.sort_values("row_idx").iloc[0]["row_json"])
    assert first == {"Host Gene ID": "1000", "Host Protein": "PROT0",
                     "Coronavirus": "IBV", "PubMed ID": "30000000"}


def test_zhou_transform_parity(ray_session, tmp_path):
    p = tmp_path / "fig3.pdf.json"
    n = zhou.make_fixture_pdf_json(str(p))  # 7 rows over 3 pages
    nodes, edges = zhou.transform(str(p))
    ndf, edf = nodes.to_pandas(), edges.to_pandas()

    # reference headers, exactly (zhou_transform.py:40-48)
    assert list(ndf.columns) == ["id", "name", "category", "provided_by"]
    assert list(edf.columns) == ["subject", "predicate", "object",
                                 "relation", "provided_by", "type",
                                 "publication"]
    # two node lines per row, NO dedup (parity with the per-row append)
    assert len(ndf) == 2 * n
    assert len(edf) == n
    g = ndf.iloc[0]
    assert (g["id"], g["name"], g["category"], g["provided_by"]) == \
        ("NCBIGene:1000", "PROT0", "biolink:Gene", "zhou_host_proteins")
    v = ndf.iloc[1]
    assert (v["id"], v["name"], v["category"]) == \
        ("NCBITaxon:11120", "IBV", "biolink:OrganismalEntity")
    e = edf.iloc[0]
    assert (e["subject"], e["predicate"], e["object"], e["relation"],
            e["type"], e["publication"]) == \
        ("NCBIGene:1000", "biolink:interacts_with", "NCBITaxon:11120",
         "RO:0002437", "biolink:Association", "PMID:30000000")


def test_zhou_unknown_coronavirus_raises(ray_session, tmp_path):
    p = tmp_path / "bad.pdf.json"
    pages = [{"data": [
        [{"text": "Host Gene ID"}, {"text": "Host Protein"},
         {"text": "Coronavirus"}, {"text": "PubMed ID"}],
        [{"text": "1"}, {"text": "P"}, {"text": "NOT-A-CORONA"},
         {"text": "2"}],
    ]}]
    p.write_text(json.dumps(pages))
    nodes, _ = zhou.transform(str(p))
    with pytest.raises(Exception, match="NOT-A-CORONA"):
        nodes.to_pandas()
