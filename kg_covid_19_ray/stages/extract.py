"""HTML -> text extraction stage (the per-row invariant stage).

Contract (BASELINE.json ``input_hint``): extraction must be
byte-identical per url to the ground-truth ``text`` column of the
synthesized pages table. The extraction function is FROZEN and
golden-tested (tests/test_extract.py); do not change it after fixtures
exist (SURVEY §7.4 "byte-identical extracted text per url").

This is the analog of the reference's whitespace scrubbing + text
walk over document blocks (scibite_cord.py:141-171,157): in this engine
it is one fully vectorized Arrow stage — regex tag strip + entity
unescape via RE2 kernels, zero Python per row. The ``html`` column is
dropped immediately after (project early; SURVEY §7.4 "wide text rows").
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# RE2 patterns (pyarrow.compute uses RE2: no lookarounds, (?s) supported).
_SCRIPT_STYLE_RE = r"(?s)<(script|style)[^>]*>.*?</(script|style)>"
_TAG_RE = r"<[^>]*>"
_TITLE_RE = r"(?s)<title>(?P<title>[^<]*)</title>"


def _unescape(col):
    # exact inverse of sources.pages._escape_html; &amp; LAST.
    col = pc.replace_substring(col, "&lt;", "<")
    col = pc.replace_substring(col, "&gt;", ">")
    col = pc.replace_substring(col, "&amp;", "&")
    return col


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """pages batch -> (url, warc_ts, lang, doc_id, title, text).

    - ``text``: strip script/style blocks, strip all tags, unescape
      entities — byte-identical to the source document text for the
      fixed synthesis template (whitespace between top-level template
      elements is never introduced by the template, so no collapse step
      is needed; adding one would break byte-identity).
    - ``title``: contents of <title> with tabs/newlines -> space
      (reference scibite_cord.py:157 ``re.sub(r"[\\n\\t]", " ", title)``).
    - ``doc_id``: parsed from the url tail (``.../doc-<8 digits>``).
    """
    html = pc.cast(batch["html"], pa.string())
    title_struct = pc.extract_regex(html, _TITLE_RE)
    title = pc.struct_field(title_struct, "title")
    title = pc.replace_substring_regex(title, r"[\n\t]", " ")
    title = _unescape(title)

    body = pc.replace_substring_regex(html, _SCRIPT_STYLE_RE, "")
    # drop the title element so its text doesn't leak into the body text
    body = pc.replace_substring_regex(body, _TITLE_RE, "")
    body = pc.replace_substring_regex(body, _TAG_RE, "")
    body = _unescape(body)

    ids = pc.struct_field(
        pc.extract_regex(batch["url"], r"doc-(?P<id>\d+)$"), "id")
    doc_id = pc.cast(ids, pa.int64())

    return pa.table({
        "url": batch["url"],
        "warc_ts": batch["warc_ts"],
        "lang": batch["lang"],
        "doc_id": doc_id,
        "title": title,
        "text": body,
    })


def extract_text(pages: ray.data.Dataset) -> ray.data.Dataset:
    """Apply extraction; html never flows past this stage."""
    return pages.map_batches(extract_text_batch, batch_format="pyarrow")
