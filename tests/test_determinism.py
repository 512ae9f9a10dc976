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
