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


def _tsv_args() -> dict:
    # built lazily on the writing worker: WriteOptions is not picklable
    return {"write_options": pacsv.WriteOptions(delimiter="\t")}


def write_kgx_tsv(ds: ray.data.Dataset, out_dir: str) -> None:
    """Directory of tab-separated, header-carrying part files — the
    distributed KGX TSV sink (one part per block; resumable output
    layout per the north rule)."""
    ds.map_batches(_stringify, batch_format="pyarrow") \
      .write_csv(out_dir, arrow_csv_args_fn=_tsv_args)


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
