"""Extraction invariant: byte-identical text per url (frozen golden)."""

import pyarrow as pa
import pyarrow.compute as pc

from kg_covid_19_ray.sources.pages import pages_batch_from_documents, read_pages
from kg_covid_19_ray.stages.extract import extract_text_batch


def test_template_roundtrip_handcrafted():
    docs = pa.table({
        "doc_id": pa.array([7, 8], pa.int64()),
        "text": pa.array(["alpha & <beta> gamma", "plain words here"]),
        "lang": pa.array(["en", "en"]),
        "source": pa.array(["srcX", "srcY"]),
    })
    pages = pages_batch_from_documents(docs)
    assert pages.schema.field("html").type == pa.binary()
    assert pages["url"].to_pylist() == [
        "https://example.org/srcX/doc-00000007",
        "https://example.org/srcY/doc-00000008",
    ]
    ext = extract_text_batch(pages)
    assert ext["text"].to_pylist() == docs["text"].to_pylist()
    assert ext["doc_id"].to_pylist() == [7, 8]
    assert ext["title"].to_pylist() == ["Doc 7", "Doc 8"]


def test_extraction_handles_extra_markup():
    html = (b"<html><head><title>T \t x</title>"
            b"<style>p{color:red}</style></head>"
            b"<body><script>var a=1;</script><p>hello &amp; goodbye</p>"
            b"</body></html>")
    batch = pa.table({
        "url": pa.array(["https://example.org/s/doc-00000001"]),
        "warc_ts": pa.array([0], pa.timestamp("us")),
        "html": pa.array([html], pa.binary()),
        "lang": pa.array(["en"]),
    })
    ext = extract_text_batch(batch)
    assert ext["text"].to_pylist() == ["hello & goodbye"]
    assert ext["title"].to_pylist() == ["T   x"]  # \t -> ' ' (scibite_cord.py:157)


def test_corpus_invariant_byte_identical(ray_session, sf_small):
    """extract(html) == ground-truth text for EVERY corpus row."""
    pages = read_pages(sf_small, include_text=True)

    def check(batch: pa.Table) -> pa.Table:
        ext = extract_text_batch(batch)
        eq = pc.fill_null(pc.equal(ext["text"], batch["text"]), False)
        return pa.table({
            "bad": pa.array([batch.num_rows - pc.sum(pc.cast(eq, pa.int64())).as_py()], pa.int64()),
            "n": pa.array([batch.num_rows], pa.int64()),
        })

    df = pages.map_batches(check, batch_format="pyarrow").to_pandas()
    assert df["n"].sum() == 500
    assert df["bad"].sum() == 0
