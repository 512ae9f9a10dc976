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

    def flush():
        nonlocal cur_id, cur
        if cur_id is not None:
            out.append({"record_id": cur_id, "fields": cur})
        cur_id, cur = None, {}

    for ln in lines[start:]:
        if not ln.strip():
            flush()  # blank line closes a stanza
            continue
        parts = ln.split("\t")
        if len(parts) < 3:
            continue
        rid, abbrev, value = parts[0], parts[1], "\t".join(parts[2:])
        if rid != cur_id:
            flush()  # id change also closes it (ttd.py groups by id)
            cur_id = rid
        cur.setdefault(abbrev, []).append(value)
    flush()
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

GPI_COLUMNS = ["DB", "DB_Object_ID", "DB_Object_Symbol",
               "DB_Object_Name", "DB_Object_Synonym", "DB_Object_Type",
               "Taxon", "Parent_Object_ID", "DB_Xref", "Properties"]
# Indices pipe-split by the reference iterator
# (sars_cov_2_gene_annot.py:256-269). NOTE the reference's inline
# comments are off-by-one vs its own field list — it actually splits
# Symbol(2), Name(3), Parent_Object_ID(7) and DB_Xref(8); parity means
# matching the BEHAVIOR, so we split the same indices.
_GPI_SPLIT_IDX = {2, 3, 7, 8}


def parse_gpi_lines(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """M8 (sars_cov_2_gene_annot.py:228-271): skip ``!`` comments and
    single-field lines, tab-split to the GPI 1.2 column set (ragged
    short rows allowed — missing trailing fields become nulls, as the
    reference's zip truncation leaves keys absent), ``|``-subsplit the
    same columns the reference splits."""
    cols: dict[str, list] = {c: [] for c in GPI_COLUMNS}
    for line in batch[text_col].to_pylist():
        if not line or line.startswith("!"):
            continue
        fields = line.rstrip("\n").split("\t")
        if len(fields) == 1:
            continue
        for i, c in enumerate(GPI_COLUMNS):
            if i >= len(fields):
                cols[c].append(None)
            elif i in _GPI_SPLIT_IDX:
                cols[c].append(fields[i].split("|"))
            else:
                cols[c].append(fields[i])
    out = {}
    for i, c in enumerate(GPI_COLUMNS):
        typ = pa.list_(pa.string()) if i in _GPI_SPLIT_IDX else pa.string()
        out[c] = pa.array(cols[c], typ)
    return pa.table(out)


def read_gpi(path: str) -> ray.data.Dataset:
    return ray.data.read_text(path).map_batches(
        parse_gpi_lines, batch_format="pyarrow")


GPA_COLUMNS = ["DB", "DB_Object_ID", "Qualifier", "GO_ID", "DB:Reference",
               "ECO_Evidence_code", "With", "Interacting_taxon_ID", "Date",
               "Assigned_by", "Annotation Extension",
               "Annotation_Properties"]
_GPA_SPLIT_IDX = {2, 4, 6, 10}  # Qualifier, DB:Reference, With, Ann.Ext.


def parse_gpa_lines(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """M8 GPA 1.1 iterator (sars_cov_2_gene_annot.py:275-307): skip
    ``!`` comments and single-field lines; pipe-split Qualifier,
    DB:Reference, With and Annotation Extension; ragged rows null-pad
    (zip truncation in the reference)."""
    cols: dict[str, list] = {c: [] for c in GPA_COLUMNS}
    for line in batch[text_col].to_pylist():
        if not line or line.startswith("!"):
            continue
        fields = line.rstrip("\n").split("\t")
        if len(fields) == 1:
            continue
        for i, c in enumerate(GPA_COLUMNS):
            if i >= len(fields):
                cols[c].append(None)
            elif i in _GPA_SPLIT_IDX:
                cols[c].append(fields[i].split("|"))
            else:
                cols[c].append(fields[i])
    out = {}
    for i, c in enumerate(GPA_COLUMNS):
        typ = pa.list_(pa.string()) if i in _GPA_SPLIT_IDX else pa.string()
        out[c] = pa.array(cols[c], typ)
    return pa.table(out)


def read_gpa(path: str) -> ray.data.Dataset:
    return ray.data.read_text(path).map_batches(
        parse_gpa_lines, batch_format="pyarrow")
