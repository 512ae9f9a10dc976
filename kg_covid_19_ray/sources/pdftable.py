"""PDF table source (reference S5: zhou_transform.py:81-85 +
utils/transform_utils.py:28-68).

The reference extracts Suppl-Fig-3 tables from a paper PDF with
``tabula.io.read_pdf(output_format="json", pages=[5,6,7],
multiple_tables=True)`` and flattens the multi-page result to one list
of row dicts: the FIRST ROW OF THE FIRST PAGE is popped as the header
(``get_header_items``, transform_utils.py:56-67), then every remaining
row on every page zips against it (``multi_page_table_to_list``,
transform_utils.py:28-53) — rows with a cell count other than the
header's are kept (the reference only warns).

Engine shape: ``read_binary_files`` over the PDF payloads feeding a
STATEFUL PARSER ACTOR pool. The tabula step itself needs a JVM the
sandbox doesn't have, so ``_PdfDecoder`` tries tabula once per actor
and otherwise expects the payload to already BE the post-tabula JSON
(the deterministic fixture shape) — everything around the stub
(actor signature, per-file explode, row schema, header-zip semantics)
is real and tested.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data

EXPECTED_ROW_WIDTH = 4  # transform_utils.py:46: warn-only width check


def get_header_items(table_data: dict) -> list[str]:
    """First row of (the first page of) a table -> header texts.
    MUTATES ``table_data`` by popping the header row, exactly like
    transform_utils.py:56-67."""
    header = table_data["data"].pop(0)
    return [d["text"] for d in header]


def multi_page_table_to_list(multi_page_table: list[dict]) -> list[dict]:
    """Flatten tabula's page list to row dicts (transform_utils:28-53):
    header from page 0, every row on every page zipped against it
    (zip truncates at the shorter side, as in the reference)."""
    table_data: list[dict] = []
    header_items = get_header_items(multi_page_table[0])
    for this_page in multi_page_table:
        for row in this_page["data"]:
            items = [d["text"] for d in row]
            table_data.append(dict(zip(header_items, items)))
    return table_data


class _PdfDecoder:
    """PDF bytes -> tabula-style page list. Probes the tabula backend
    once per actor (the production path, needs a JVM); otherwise real
    ``%PDF`` payloads run through the pure-stdlib extractor
    (``functions.pdf.extract_tables``: object/xref parse, FlateDecode,
    text-operator interpretation, baseline row grouping) and
    pre-extracted tabula JSON payloads are accepted as-is (the round-1
    fixture shape)."""

    def __init__(self, pages: list[int] | None = None):
        self.pages = pages
        try:  # pragma: no cover - not installed in this container
            from tabula import io  # noqa: F401
            self.backend = "tabula"
        except ImportError:
            self.backend = "stdlib"

    def decode(self, payload: bytes) -> list[dict]:
        if self.backend == "tabula":  # pragma: no cover - no JVM here
            import tempfile

            from tabula import io
            with tempfile.NamedTemporaryFile(suffix=".pdf") as fh:
                fh.write(payload)
                fh.flush()
                return io.read_pdf(fh.name, output_format="json",
                                   pages=self.pages or "all",
                                   multiple_tables=True)
        if payload.lstrip()[:4] == b"%PDF":
            from kg_covid_19_ray.functions.pdf import extract_tables
            return extract_tables(payload, self.pages)
        return json.loads(payload.decode("utf-8"))


class PdfTableParser:
    """Actor-pool stage for ``map_batches`` over ``read_binary_files``
    rows (columns ``bytes``, ``path``): decoder built once per actor
    (``__init__``), each file exploded to its table rows with a
    ``row_idx`` order column (the explicit rank replacing file order)."""

    def __init__(self, pages: list[int] | None = None):
        self.decoder = _PdfDecoder(pages)

    def __call__(self, batch: pa.Table) -> pa.Table:
        paths, row_idx, payloads = [], [], []
        for path, data in zip(batch["path"].to_pylist(),
                              batch["bytes"].to_pylist()):
            rows = multi_page_table_to_list(self.decoder.decode(data))
            for i, row in enumerate(rows):
                paths.append(path)
                row_idx.append(i)
                payloads.append(json.dumps(row, sort_keys=True))
        return pa.table({
            "path": pa.array(paths, pa.string()),
            "row_idx": pa.array(row_idx, pa.int64()),
            "row_json": pa.array(payloads, pa.string()),
        })


def read_pdf_tables(path: str, *, pages: list[int] | None = None,
                    concurrency=(1, 4)) -> ray.data.Dataset:
    """-> Dataset(path, row_idx, row_json): one row per table row across
    all matched files. ``row_json`` keeps the header-zipped dict as a
    JSON string so heterogeneous tables can share one Arrow schema;
    callers project typed columns per table layout."""
    files = ray.data.read_binary_files(path, include_paths=True)
    return files.map_batches(PdfTableParser, batch_format="pyarrow",
                             concurrency=concurrency, num_cpus=1,
                             fn_constructor_args=(pages,))
