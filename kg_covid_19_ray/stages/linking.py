"""Entity linking + canonicalization stages (reference M11-M15).

All stages are stateless ``map_batches`` transforms that apply pure
per-value functions only to the DISTINCT identifiers of each batch
(dictionary-encode -> map dictionary -> take), so cost scales with the
number of distinct entities per batch, not rows.

- ``link_mentions_batch``: raw hit id -> CURIE (IRI contraction,
  HGNC-symbol rewrite, country-code map, isoform collapse) + name +
  Biolink category (scibite_cord.py:186-218,361-418;
  utils/transform_utils.py:185-218).
- ``canonicalize_batch``: SSSOM subject->object normalization
  (utils/normalize_utils.py:7-46) followed by same-as cluster remap
  (merge.yaml:42-47 ``remap_node_identifier`` analog) — both broadcast
  dict lookups.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

import pyarrow as pa
import pyarrow.compute as pc

from kg_covid_19_ray.sources.gazetteer import GAZETTEER, link_raw_id


def map_distinct(col, fn: Callable[[str], str]) -> pa.Array:
    """Apply ``fn`` to each DISTINCT value of a string column, fan back
    out via dictionary indices. Vectorized hot path for per-value Python
    functions."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    encoded = col.dictionary_encode()
    mapped = pa.array(
        [fn(v) if v is not None else None
         for v in encoded.dictionary.to_pylist()],
        pa.string(),
    )
    return mapped.take(encoded.indices)


# Static gazetteer: precompute linking once per process (tiny).
_LINKED = [link_raw_id(raw_id) for _, raw_id, _, _ in GAZETTEER]
_GAZ_NAME = [link[1] or name for link, (_, _, name, _) in zip(_LINKED, GAZETTEER)]


def link_mentions_batch(batch: pa.Table) -> pa.Table:
    """mentions(doc_id, gaz_idx, surface, raw_id) -> + curie, name, category.

    Fast path: gazetteer entries are static, so linking is a take() by
    ``gaz_idx``. The general per-value path (``map_distinct`` over
    ``raw_id`` with ``link_raw_id``) is exercised in tests and used by
    ``link_raw_ids_batch`` for non-gazetteer inputs.
    """
    idx = batch["gaz_idx"]
    if isinstance(idx, pa.ChunkedArray):
        idx = idx.combine_chunks()
    curies = pa.array([c for c, _, _ in _LINKED], pa.string()).take(idx)
    names = pa.array(_GAZ_NAME, pa.string()).take(idx)
    cats = pa.array([c for _, _, c in _LINKED], pa.string()).take(idx)
    return batch.append_column("curie", curies) \
                .append_column("name", names) \
                .append_column("category", cats)


def link_raw_ids_batch(batch: pa.Table, column: str = "raw_id") -> pa.Table:
    """General path: contract+collapse arbitrary raw ids (distinct-wise)."""
    curies = map_distinct(batch[column], lambda r: link_raw_id(r)[0])
    return batch.append_column("curie", curies)


def make_canonicalize(sssom_map: Mapping[str, str],
                      canon_map: Mapping[str, str],
                      column: str = "curie"):
    """Returns a map_batches fn applying SSSOM then cluster remap.

    Both maps are plain dicts captured in the task closure — the Ray
    broadcast-small-side pattern; at larger map sizes pass a
    ``ray.put`` handle and resolve in an actor ``__init__`` instead
    (see stages/mentions.MentionDetector for the actor shape).
    """
    def canonicalize_batch(batch: pa.Table) -> pa.Table:
        def norm(c: str) -> str:
            mapped = sssom_map.get(c, "")
            c2 = mapped if mapped else c
            return canon_map.get(c2, c2)
        col = map_distinct(batch[column], norm)
        pos = batch.schema.get_field_index(column)
        return batch.set_column(pos, column, col)
    return canonicalize_batch
