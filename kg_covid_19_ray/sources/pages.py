"""Common-Crawl-style pages table: deterministic synthesis + readers.

The engine's primary input (BASELINE.json ``input_hint``) is a Parquet
table ``pages(url:string, warc_ts:timestamp[us], html:binary,
text:string, lang:string)``. No such table ships with the sandbox, so it
is synthesized DETERMINISTICALLY (no RNG) from the driver-generated
``documents`` table: each document row becomes one web page whose HTML
embeds the document text in a fixed template. The ``text`` column holds
the ground-truth extraction result, so the per-row invariant
"byte-identical extracted text per url" is directly checkable:
``extract_text(html) == text`` for every row.

Synthesis is itself a vectorized ``map_batches`` stage, so building the
sf0.1 bench input is a parallel Ray job, not a driver loop.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from kg_covid_19_ray.functions.arrow_meta import read_parquet_clean

# Fixed template; escape/unescape are exact inverses for &, <, > (applied
# in the html.escape order: & first on escape, & last on unescape).
_HTML_PREFIX = "<html><head><title>"
_HTML_MID = "</title></head><body><p>"
_HTML_SUFFIX = "</p></body></html>"
_EPOCH_US = 1_583_020_800_000_000  # 2020-03-01T00:00:00Z in microseconds

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def _escape_html(col: pa.Array) -> pa.Array:
    col = pc.replace_substring(col, "&", "&amp;")
    col = pc.replace_substring(col, "<", "&lt;")
    col = pc.replace_substring(col, ">", "&gt;")
    return col


def doc_url(source_col: pa.Array, doc_id_col: pa.Array) -> pa.Array:
    """``https://example.org/<source>/doc-<doc_id 8-digit zero-padded>``."""
    padded = pc.utf8_lpad(pc.cast(doc_id_col, pa.string()), 8, "0")
    return pc.binary_join_element_wise(
        pa.array(["https://example.org"] * len(padded)),
        pc.cast(source_col, pa.string()),
        pc.binary_join_element_wise(
            pa.array(["doc-"] * len(padded)), padded, ""),
        "/",
    )


REPLICA_STRIDE = 1_000_000  # doc_id offset per corpus replica


def pages_batch_from_documents(batch: pa.Table,
                               replica: int = 0) -> pa.Table:
    """documents(doc_id, text, lang, source, ...) -> pages batch (Arrow).

    ``replica`` > 0 shifts doc ids by ``replica * REPLICA_STRIDE`` —
    used by the bench fixture to scale the corpus deterministically
    (same text, distinct urls/ids) without external data.
    """
    n = batch.num_rows
    doc_id = batch["doc_id"]
    if replica:
        doc_id = pc.add(pc.cast(doc_id, pa.int64()),
                        replica * REPLICA_STRIDE)
    text = pc.cast(batch["text"], pa.string())
    title = pc.binary_join_element_wise(
        pa.array(["Doc"] * n), pc.cast(doc_id, pa.string()), " ")
    html_str = pc.binary_join_element_wise(
        pa.array([_HTML_PREFIX] * n), title,
        pa.array([_HTML_MID] * n), _escape_html(text),
        pa.array([_HTML_SUFFIX] * n), "")
    warc_ts = pc.cast(
        pc.add(pc.multiply(pc.cast(doc_id, pa.int64()), 1_000_000),
               _EPOCH_US),
        pa.timestamp("us"))
    return pa.table({
        "url": doc_url(batch["source"], doc_id),
        "warc_ts": warc_ts,
        "html": pc.cast(html_str, pa.binary()),
        "text": text,
        "lang": pc.cast(batch["lang"], pa.string()),
    })


def read_pages(sf_dir: str, *, include_text: bool = False) -> ray.data.Dataset:
    """Pages Dataset for a testdata scale-factor directory.

    Reads only the needed ``documents`` columns (prune at the read), then
    synthesizes the page rows per batch. ``include_text=False`` drops the
    ground-truth ``text`` column so downstream stages must extract from
    ``html`` (the realistic path); invariant tests pass ``True``.
    """
    ds = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )
    ds = ds.map_batches(pages_batch_from_documents, batch_format="pyarrow")
    if not include_text:
        ds = ds.drop_columns(["text"])
    return ds


def write_pages_parquet(sf_dir: str, out_dir: str, *,
                        replicas: int = 1) -> str:
    """Materialize the synthesized pages table to Parquet (bench fixture:
    the timed pipeline then starts from an on-disk pages table, like a
    real crawl dump). ``replicas`` scales the corpus deterministically.
    Idempotent: skips when a _SUCCESS marker exists."""
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    ds = read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )

    def replicate(batch: pa.Table) -> pa.Table:
        tables = [pages_batch_from_documents(batch, replica=r)
                  for r in range(replicas)]
        return pa.concat_tables(tables)

    out = ds.map_batches(replicate, batch_format="pyarrow", batch_size=64)
    # many part files -> parallel-friendly read (row-group granularity of
    # one big file would cap read parallelism at a handful of tasks)
    out.repartition(max(32, replicas // 16)).write_parquet(out_dir)
    with open(marker, "w") as f:
        f.write("ok\n")
    return out_dir
