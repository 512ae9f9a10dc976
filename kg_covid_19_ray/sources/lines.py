"""Line-oriented flat-file sources (S3/M1/M7/M8): gzip-transparent
delimited readers, header-zip parsing, stanza/record-group parsing
(TTD-style), and GPI/GPA iterators.

Reference semantics re-expressed for Ray Data:

- S3 gzip line reader (string_ppi.py:77,115,171; drug_central.py:68):
  ``ray.data.read_csv`` reads .gz transparently (Arrow); for irregular
  files, ``read_text`` + a vectorized per-batch parser;
- M1 header-zip parser (utils/transform_utils.py:154-165,110-117):
  split-on-sep zipped with a parsed header, quote-stripped;
  ``len(header) != len(fields)`` raises, as the reference does;
- M7 stanza parser (ttd.py:208-278): records grouped between blank
  lines, prologue skipped until two dashed lines are seen. Stanza
  grouping needs file-order contiguity, so the unit of parallelism is
  the FILE (``read_binary_files`` + ``flat_map``), not the line —
  the documented partitioning assumption;
- M8 GPI/GPA iterators (sars_cov_2_gene_annot.py:228-307):
  ``!``-comment skipping, tab-split, ``|``-subsplit of multivalue
  columns, zip to named columns.
"""

from __future__ import annotations

import gzip
import re

import pyarrow as pa
import ray.data

from kg_covid_19_ray.functions.strings import strip_quotes

# ------------------------------------------------------------- S3 / M1


def read_delimited(path: str, *, sep: str = "\t",
                   header: list[str] | None = None,
                   comment: str | None = None) -> ray.data.Dataset:
    """Gzip-transparent delimited reader (S3). Regular files go through
    Arrow CSV (header in-file, .gz decompressed transparently);
    irregular files — comment lines, caller-known header — go through
    ``read_text`` + the vectorized header-zip parser (M1)."""
    import pyarrow.csv as pacsv

    if header is None and comment is None:
        return ray.data.read_csv(
            path, parse_options=pacsv.ParseOptions(delimiter=sep))
    if header is None:
        raise ValueError("comment-skipping read needs an explicit header")
    return ray.data.read_text(path).map_batches(
        lambda b: parse_header_zip(b, header, sep=sep, comment=comment),
        batch_format="pyarrow")


def parse_header_zip(batch: pa.Table, header: list[str], *,
                     sep: str = "\t", text_col: str = "text",
                     comment: str | None = None) -> pa.Table:
    """M1: split each line on ``sep``, strip quotes, zip with
    ``header``. A row whose field count mismatches the header raises
    (utils/transform_utils.py:80-81 contract)."""
    cols: dict[str, list[str]] = {h: [] for h in header}
    for line in batch[text_col].to_pylist():
        if not line or (comment is not None and line.startswith(comment)):
            continue
        if set(line.split(sep)) == {""}:
            continue
        fields = [strip_quotes(f) for f in line.rstrip("\n").split(sep)]
        if len(fields) != len(header):
            raise ValueError(
                f"field count {len(fields)} != header {len(header)}: "
                f"{line[:120]!r}")
        for h, f in zip(header, fields):
            cols[h].append(f)
    return pa.table({h: pa.array(v, pa.string()) for h, v in cols.items()})


# ------------------------------------------------------------------ M7

_DASHED_RE = re.compile(r"^-{2,}\s*$")  # ttd.py:225-236 dashed-line detect


def parse_stanzas(text: str, *, skip_dashed_prologue: bool = True
                  ) -> list[dict]:
    """TTD-style stanza parse of ONE file's text (M7, ttd.py:208-278):
    prologue dropped until two dashed lines pass; then blank-separated
    stanzas of ``record_id<TAB>abbrev<TAB>value`` lines accumulate into
    {record_id, fields: {abbrev: [values...]}}."""
    lines = text.splitlines()
    start = 0
    if skip_dashed_prologue:
        dashed_seen = 0
        for i, ln in enumerate(lines):
            if _DASHED_RE.match(ln):
                dashed_seen += 1
                if dashed_seen == 2:
                    start = i + 1
                    break
    out: list[dict] = []
    cur_id: str | None = None
    cur: dict[str, list[str]] = {}
    for ln in lines[start:]:
        if not ln.strip():
            if cur_id is not None:
                out.append({"record_id": cur_id, "fields": cur})
                cur_id, cur = None, {}
            continue
        parts = ln.split("\t")
        if len(parts) < 3:
            continue
        rid, abbrev, value = parts[0], parts[1], "\t".join(parts[2:])
        if cur_id is None:
            cur_id = rid
        cur.setdefault(abbrev, []).append(value)
    if cur_id is not None:
        out.append({"record_id": cur_id, "fields": cur})
    return out


def read_stanza_files(path: str) -> ray.data.Dataset:
    """Dataset of stanza records; one task per FILE (contiguity
    assumption — see module docstring)."""
    files = ray.data.read_binary_files(path)

    def records(row: dict):
        data = row["bytes"]
        if data[:2] == b"\x1f\x8b":
            data = gzip.decompress(data)
        for rec in parse_stanzas(data.decode("utf-8")):
            # flatten fields to a pipe-joined string map for Arrow
            yield {"record_id": rec["record_id"],
                   **{k: "|".join(v) for k, v in rec["fields"].items()}}

    return files.flat_map(records)


# ------------------------------------------------------------------ M8

GPI_COLUMNS = ["db", "db_object_id", "db_object_symbol", "db_object_name",
               "db_object_synonyms", "db_object_type", "taxon",
               "parent_object_id", "xrefs", "properties"]
_MULTIVALUE_GPI = {"db_object_name", "db_object_synonyms", "xrefs",
                   "properties"}


def parse_gpi_lines(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """M8 (sars_cov_2_gene_annot.py:228-271): skip ``!`` comments,
    tab-split to the GPI 1.2 column set, ``|``-subsplit the multivalue
    columns into list<string>."""
    cols: dict[str, list] = {c: [] for c in GPI_COLUMNS}
    for line in batch[text_col].to_pylist():
        if not line or line.startswith("!"):
            continue
        fields = line.rstrip("\n").split("\t")
        if len(fields) != len(GPI_COLUMNS):
            raise ValueError(
                f"GPI line has {len(fields)} fields, "
                f"expected {len(GPI_COLUMNS)}")
        for c, f in zip(GPI_COLUMNS, fields):
            cols[c].append(f.split("|") if c in _MULTIVALUE_GPI else f)
    out = {}
    for c, v in cols.items():
        typ = pa.list_(pa.string()) if c in _MULTIVALUE_GPI else pa.string()
        out[c] = pa.array(v, typ)
    return pa.table(out)


def read_gpi(path: str) -> ray.data.Dataset:
    return ray.data.read_text(path).map_batches(
        parse_gpi_lines, batch_format="pyarrow")
