"""Pure-stdlib PDF table codec (functions/pdf.py): encode/extract
round trips, structural conformance, page filtering, escape handling,
and the S5 seam running on REAL PDF bytes end-to-end (read_pdf_tables
+ Zhou transform parity with the JSON-fixture path)."""

from __future__ import annotations

import zlib

import pytest

from kg_covid_19_ray.functions import pdf
from kg_covid_19_ray.pipelines import zhou


TABLE = [
    [["H1", "H2", "H3"], ["a", "b", "c"], ["d", "e", "f"]],
    [["g", "h", "i"]],
]


def test_encode_extract_roundtrip():
    data = pdf.encode_table_pdf(TABLE)
    assert data.startswith(b"%PDF-1.4")
    out = pdf.extract_tables(data)
    assert [[ [c["text"] for c in row] for row in p["data"]]
            for p in out] == TABLE


def test_pdf_structure_xref_and_trailer():
    data = pdf.encode_table_pdf(TABLE)
    assert b"/Type /Catalog" in data and b"xref" in data
    assert data.rstrip().endswith(b"%%EOF")
    # startxref points at the xref table
    tail = data[data.rindex(b"startxref"):]
    pos = int(tail.split()[1])
    assert data[pos:pos + 4] == b"xref"
    # content streams are genuinely Flate-compressed
    assert b"/FlateDecode" in data


def test_extract_pages_filter_is_one_based():
    data = pdf.encode_table_pdf(TABLE)
    only2 = pdf.extract_tables(data, pages=[2])
    assert len(only2) == 1
    assert [c["text"] for c in only2[0]["data"][0]] == ["g", "h", "i"]


def test_escapes_roundtrip():
    weird = [[["a(b)c", "back\\slash", "par()ens"]]]
    out = pdf.extract_tables(pdf.encode_table_pdf(weird))
    assert [c["text"] for c in out[0]["data"][0]] == weird[0][0]


def test_extract_rejects_non_pdf_and_unsupported():
    with pytest.raises(ValueError, match="%PDF"):
        pdf.extract_tables(b"JUNK")
    # a TJ-array content stream must raise, not silently drop text
    raw = b"BT [(x)] TJ ET"
    comp = zlib.compress(raw)
    doc = (b"%PDF-1.4\n"
           b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
           b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
           b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> "
           b"endobj\n"
           b"4 0 obj << /Length " + str(len(comp)).encode()
           + b" /Filter /FlateDecode >>\nstream\n" + comp
           + b"\nendstream\nendobj\n")
    with pytest.raises(ValueError, match="TJ"):
        pdf.extract_tables(doc)


def test_td_relative_positioning():
    """Hand-written uncompressed stream using Td moves (the non-Tm
    subset path)."""
    raw = (b"BT /F1 10 Tf 1 0 0 1 50 700 Tm (r1c1) Tj "
           b"130 0 Td (r1c2) Tj -130 -16 Td (r2c1) Tj ET")
    doc = (b"%PDF-1.4\n"
           b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
           b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
           b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> "
           b"endobj\n"
           b"4 0 obj << /Length " + str(len(raw)).encode()
           + b" >>\nstream\n" + raw + b"\nendstream\nendobj\n")
    out = pdf.extract_tables(doc)
    grid = [[c["text"] for c in row] for row in out[0]["data"]]
    assert grid == [["r1c1", "r1c2"], ["r2c1"]]


def test_decoder_seam_prefers_real_pdf(tmp_path):
    from kg_covid_19_ray.sources.pdftable import _PdfDecoder
    dec = _PdfDecoder()
    assert dec.backend == "stdlib"  # no tabula/JVM in this container
    data = pdf.encode_table_pdf(TABLE)
    pages = dec.decode(data)
    assert [c["text"] for c in pages[0]["data"][0]] == ["H1", "H2", "H3"]
    # JSON payloads (round-1 fixture shape) still accepted
    assert dec.decode(b'[{"data": [[{"text": "x"}]]}]') == \
        [{"data": [[{"text": "x"}]]}]


def test_zhou_transform_real_pdf_matches_json_path(ray_session, tmp_path):
    """End-to-end S5: the SAME fixture as real PDF bytes and as
    post-tabula JSON must produce identical Zhou node/edge tables."""
    import pandas as pd

    pj = tmp_path / "fig3.pdf.json"
    pp = tmp_path / "fig3.pdf"
    n1 = zhou.make_fixture_pdf_json(str(pj))
    n2 = zhou.make_fixture_pdf(str(pp))
    assert n1 == n2
    nodes_j, edges_j = zhou.transform(str(pj))
    nodes_p, edges_p = zhou.transform(str(pp))
    pd.testing.assert_frame_equal(nodes_j.to_pandas(),
                                  nodes_p.to_pandas())
    pd.testing.assert_frame_equal(edges_j.to_pandas(),
                                  edges_p.to_pandas())
