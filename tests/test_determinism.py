"""Determinism-under-parallelism: the property the reference gets for
free by being serial (SURVEY §5/§2.9). The engine must produce
IDENTICAL results regardless of block layout — the explicit
(doc_id, gaz_idx) order key replaces file order, and every dedup is
keyed on it."""

from __future__ import annotations

import pandas as pd
import pytest

from kg_covid_19_ray.pipelines.flagship import (
    build_kg,
    canonical_mentions,
    extracted_docs,
    mention_edges,
    pages_dataset,
)

SF = "/root/testdata/sf0.001"


def _key(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    return sorted(map(tuple, df.astype(str).to_numpy()))


@pytest.mark.parametrize("nblocks", [1, 7])
def test_kg_build_invariant_to_block_layout(ray_session, nblocks):
    pages = pages_dataset(SF).repartition(nblocks)
    nodes, edges = build_kg(pages)
    nodes_df, edges_df = nodes.to_pandas(), edges.to_pandas()

    ref_nodes, ref_edges = build_kg(SF)
    assert _key(nodes_df) == _key(ref_nodes.to_pandas())
    assert _key(edges_df) == _key(ref_edges.to_pandas())


def test_mention_edges_invariant_to_block_layout(ray_session):
    a = mention_edges(canonical_mentions(extracted_docs(SF).repartition(2)))
    b = mention_edges(canonical_mentions(extracted_docs(SF).repartition(5)))
    assert _key(a.to_pandas()) == _key(b.to_pandas())


def test_sorted_output_path(ray_session):
    """O5: build_kg(sort_output=True) materializes deterministic
    sorted order with identical content to the unsorted run."""
    nodes_s, edges_s = build_kg(SF, sort_output=True)
    ndf = nodes_s.to_pandas()
    edf = edges_s.to_pandas()
    assert ndf["id"].is_monotonic_increasing
    assert (edf[["subject", "object"]]
            .apply(tuple, axis=1).is_monotonic_increasing)
    nodes_u, edges_u = build_kg(SF)
    assert _key(ndf) == _key(nodes_u.to_pandas())
    assert _key(edf) == _key(edges_u.to_pandas())


def test_minhash_invariant_to_batch_layout(ray_session, tmp_path):
    """The vectorized signature stage hashes per batch (dictionary
    encode, reduceat segments) — the verified near-dup pairs must not
    depend on how documents are batched/partitioned."""
    import pandas as pd

    from kg_covid_19_ray.pipelines import dedup_ops
    from kg_covid_19_ray.sources.docgen import write_documents_parquet

    root = tmp_path / "docs"
    write_documents_parquet("/root/testdata/sf0.001",
                            str(root / "documents.parquet"), replicas=3)

    def run(**kw):
        import ray.data
        ds = ray.data.read_parquet(str(root / "documents.parquet"),
                                   columns=["doc_id", "text"])
        if kw.get("repartition"):
            ds = ds.repartition(kw["repartition"])
        bands = ds.map_batches(dedup_ops._minhash_bands,
                               batch_format="pandas",
                               batch_size=kw.get("batch_size", 8192))
        return bands.to_pandas().sort_values(
            ["band_hash", "doc_id"]).reset_index(drop=True)

    a = run(batch_size=8192)
    b = run(batch_size=173, repartition=7)
    pd.testing.assert_frame_equal(a, b)


def test_simhash_vectorized_equals_scalar_any_batching():
    """The vectorized signature path (per-batch dictionary encode +
    add.reduceat) must equal the scalar per-document definition
    regardless of how documents are grouped into batches."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from kg_covid_19_ray.pipelines import dedup_ops as D

    texts = ["alpha beta gamma", "x", "", "alpha alpha beta",
             "the quick brown fox", "beta gamma", "z z z z z"]
    scalar = np.array([D.simhash64(t) for t in texts], dtype=np.uint64)

    def batch_sigs(sub: list[str]) -> np.ndarray:
        t_arr = pa.array(pd.Series(sub).fillna(""), pa.string())
        toks = pa.compute.split_pattern(t_arr, " ")
        flat = pa.compute.list_flatten(toks)
        lens = pa.compute.list_value_length(toks).to_numpy() \
            .astype(np.int64)
        enc = flat.dictionary_encode()
        vh = np.array([int.from_bytes(
            hashlib.md5(t.encode()).digest()[:8], "little")
            for t in enc.dictionary.to_pylist()], dtype=np.uint64)
        bits = (((vh[:, None] >> D._SHIFTS[None, :]) & np.uint64(1))
                .astype(np.int64) * 2 - 1)
        tok_bits = bits[enc.indices.to_numpy(zero_copy_only=False)]
        offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
        acc = np.add.reduceat(tok_bits, offsets, axis=0)
        weights = np.uint64(1) << D._SHIFTS
        return ((acc > 0).astype(np.uint64) * weights[None, :]).sum(axis=1)

    for split in (len(texts), 3, 1):  # one batch / ragged / per-doc
        got = np.concatenate([batch_sigs(texts[i:i + split])
                              for i in range(0, len(texts), split)])
        assert (got == scalar).all()
