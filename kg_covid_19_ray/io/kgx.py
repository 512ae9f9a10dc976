"""KGX-style TSV sinks and N-Triples export/import support (S8/S9).

The reference writes per-source ``nodes.tsv`` / ``edges.tsv`` with an
explicit header via ``write_node_edge_item`` (reference
utils/transform_utils.py:71-85, transform_utils/transform.py:28-34) and
exports the merged graph as tar'd TSV plus optional N-Triples
(merge.yaml:123-144). Here:

- ``write_kgx_tsv``: the SCALE path — a directory of header-carrying
  TSV part files, one per Ray block (each part is independently
  loadable; a downstream concat is trivial). Multi-valued list columns
  are pipe-joined and every value stringified at write time, matching
  the reference's all-strings TSV contract (SURVEY §1.2);
- ``write_kgx_tsv_single``: exact single-file layout for fixture-sized
  tables (driver-side iteration — small results only, like the
  reference's one open file handle);
- ``to_ntriple_lines`` / ``write_ntriples``: CURIE -> IRI expansion and
  line formatting as a vectorized batch transform feeding a
  no-quoting text sink. ``sources/rdf.read_ntriples`` inverts it.

Parquet (``Dataset.write_parquet`` / state/checkpoint.run_stage) stays
the internal checkpoint format; TSV/NT are export formats.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.csv as pacsv
import ray.data

from kg_covid_19_ray.functions.curies import CMAP

# CURIE prefix -> IRI base for export. Reverse of the contraction CMAP
# plus the engine-internal prefixes.
EXPAND: dict[str, str] = {curie[:-1]: iri for iri, curie in CMAP.items()}
EXPAND.update({
    "biolink": "https://w3id.org/biolink/vocab/",
    "SIO": "http://semanticscience.org/resource/SIO_",
    "WEB": "https://example.org/web/",
})
_FALLBACK_BASE = "https://example.org/curie/"


def expand_curie(curie: str) -> str:
    """CURIE -> IRI, longest-known-prefix; unmapped prefixes expand
    under a stable fallback base (so every id is a valid IRI and the
    roundtrip contraction is exact)."""
    prefix, _, local = curie.partition(":")
    base = EXPAND.get(prefix)
    if base is not None:
        return base + local
    return f"{_FALLBACK_BASE}{prefix}:{local}" if local else \
        f"{_FALLBACK_BASE}{curie}"


def _stringify(batch: pa.Table) -> pa.Table:
    """All-strings table: list columns pipe-joined, scalars cast."""
    cols = {}
    for name in batch.column_names:
        col = batch[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type) \
                or pa.types.is_fixed_size_list(col.type):
            col = pc.binary_join(pc.cast(col, pa.list_(pa.string())), "|")
        elif not pa.types.is_string(col.type):
            col = pc.cast(col, pa.string())
        cols[name] = pc.fill_null(col, "")
    return pa.table(cols)


def _tsv_line_table(batch: pa.Table) -> pa.Table:
    """Stringified batch -> one raw tab-joined line per row, plus the
    header line as metadata column (constant per batch). Structural
    characters inside cells are scrubbed to spaces — the reference
    relies on its upstream scrubber for this (M19,
    scibite_cord.py:157); the sink enforces the same invariant so a
    stray tab can never corrupt the column layout."""
    batch = _stringify(batch)
    cols = []
    for name in batch.column_names:
        col = batch[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cols.append(pc.replace_substring_regex(col, r"[\t\n\r]", " "))
    if len(cols) == 1:
        lines = cols[0]
    else:
        lines = pc.binary_join_element_wise(*cols, "\t")
    header = "\t".join(batch.column_names)
    return pa.table({
        "line": lines,
        "__header": pa.array([header] * batch.num_rows, pa.string()),
    })


class _RawTsvDatasink:
    """Raw header-carrying TSV part files (no quoting — the byte layout
    of the reference's ``write_node_edge_item``, transform_utils:71-85).
    Arrow's CSV writer always quotes the header row and any cell it
    considers structural, so the sink writes lines directly."""

    def __new__(cls, path: str):
        from ray.data.datasource import BlockBasedFileDatasink

        class _Sink(BlockBasedFileDatasink):
            def __init__(self, p):
                super().__init__(p, file_format="tsv")

            def write_block_to_file(self, block, file) -> None:
                t = block.to_arrow()
                if t.num_rows == 0:
                    return
                header = t["__header"][0].as_py()
                body = "\n".join(t["line"].to_pylist())
                file.write((header + "\n" + body + "\n").encode("utf-8"))

        return _Sink(path)


def write_kgx_tsv(ds: ray.data.Dataset, out_dir: str) -> None:
    """Directory of tab-separated, header-carrying part files — the
    distributed KGX TSV sink (one part per block; resumable output
    layout per the north rule). Raw cells, no quoting (reference
    write_node_edge_item parity)."""
    ds.map_batches(_tsv_line_table, batch_format="pyarrow") \
      .write_datasink(_RawTsvDatasink(out_dir))


def write_kgx_tsv_single(ds: ray.data.Dataset, out_path: str,
                         *, sort_by: list[str] | None = None) -> None:
    """Exact reference layout: ONE file, one header line, rows in a
    deterministic order. Driver-side iteration — fixture/export-sized
    tables only (the reference itself holds one open handle,
    utils/transform_utils.py:71-85)."""
    if sort_by:
        ds = ds.sort(sort_by)
    header_written = False
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as fh:
        for batch in ds.iter_batches(batch_format="pyarrow"):
            batch = _stringify(batch)
            if not header_written:
                fh.write("\t".join(batch.column_names) + "\n")
                header_written = True
            for row in zip(*(batch[c].to_pylist()
                             for c in batch.column_names)):
                fh.write("\t".join(row) + "\n")


def to_ntriple_lines(batch: pa.Table, *, subject_col: str = "subject",
                     predicate_col: str = "predicate",
                     object_col: str = "object") -> pa.Table:
    """Edge rows -> one N-Triples line per row (vectorized over the
    batch's distinct CURIEs; merge.yaml:123-144 nt export analog)."""
    out_lines = []
    cache: dict[str, str] = {}

    def ex(c: str) -> str:
        v = cache.get(c)
        if v is None:
            v = expand_curie(c)
            cache[c] = v
        return v

    for s, p, o in zip(batch[subject_col].to_pylist(),
                       batch[predicate_col].to_pylist(),
                       batch[object_col].to_pylist()):
        out_lines.append(f"<{ex(s)}> <{ex(p)}> <{ex(o)}> .")
    return pa.table({"line": pa.array(out_lines, pa.string())})


def _nt_args() -> dict:
    return {"write_options": pacsv.WriteOptions(
        include_header=False, quoting_style="none", delimiter="\t")}


def write_ntriples(edges: ray.data.Dataset, out_dir: str) -> None:
    """Directory of .nt part files (one per block)."""
    edges.map_batches(to_ntriple_lines, batch_format="pyarrow") \
         .write_csv(out_dir, arrow_csv_args_fn=_nt_args)


def write_merged_tar(nodes: ray.data.Dataset, edges: ray.data.Dataset,
                     out_path: str, *, filename: str = "merged-kg") -> None:
    """Merged-graph archive parity (reference merge.yaml:123-127:
    ``format: tsv, compression: tar.gz, filename: merged-kg``): one
    ``<out_path>`` tar.gz holding ``<filename>_nodes.tsv`` and
    ``<filename>_edges.tsv``.

    Scale shape: each table is first written as a DIRECTORY of
    header-carrying TSV parts by the distributed sink, then the parts
    are stream-concatenated disk-to-disk (headers of parts after the
    first skipped) and tar'd — no table is ever held in memory; the
    only single-threaded step is the unavoidable byte copy into the
    single archive the reference format demands."""
    import glob
    import shutil
    import tarfile
    import tempfile

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with tempfile.TemporaryDirectory(
            dir=os.path.dirname(out_path) or ".") as tmp:
        members = []
        for tag, ds in (("nodes", nodes), ("edges", edges)):
            part_dir = os.path.join(tmp, f"{tag}_parts")
            write_kgx_tsv(ds, part_dir)
            concat = os.path.join(tmp, f"{filename}_{tag}.tsv")
            with open(concat, "wb") as out:
                first = True
                for part in sorted(glob.glob(os.path.join(part_dir, "*"))):
                    with open(part, "rb") as src:
                        header = src.readline()
                        if first:
                            out.write(header)
                            first = False
                        shutil.copyfileobj(src, out)
                if first:
                    # empty dataset -> Ray wrote no part files; the
                    # reference always emits the header line, so derive
                    # it from the schema to keep the TSV well-formed
                    out.write(("\t".join(ds.schema().names) + "\n")
                              .encode("utf-8"))
            members.append(concat)
        with tarfile.open(out_path, "w:gz") as tar:
            for m in members:
                tar.add(m, arcname=os.path.basename(m))
