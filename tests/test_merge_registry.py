"""Tests for the transform plugin API (§2.10), the config-driven merge
(A3 schema union, D3 first-non-empty node unify, J3 id remap, A1
stats), and the CLI surface."""

from __future__ import annotations

import os

import pandas as pd
import pytest
import ray.data

from kg_covid_19_ray.pipelines import merge_kg
from kg_covid_19_ray.pipelines.registry import (
    TRANSFORM_REGISTRY,
    register_transform,
    run_transforms,
)


def _ds(rows: list[dict]) -> ray.data.Dataset:
    return ray.data.from_pandas(pd.DataFrame(rows))


@pytest.fixture()
def two_sources(ray_session):
    """Source A (rank 0) and B (rank 1) with overlapping node ids,
    heterogeneous schemas, and one duplicate edge."""
    a = merge_kg.SourceSpec(
        name="a",
        nodes=_ds([
            {"id": "X:1", "name": "", "category": "biolink:Protein",
             "provided_by": "a", "xrefs": "UniProtKB:P1"},
            {"id": "X:2", "name": "two", "category": "biolink:NamedThing",
             "provided_by": "a", "xrefs": ""},
        ]),
        edges=_ds([
            {"subject": "X:1", "predicate": "biolink:interacts_with",
             "object": "X:2", "relation": "RO:0002434", "provided_by": "a"},
        ]),
    )
    b = merge_kg.SourceSpec(
        name="b",
        nodes=_ds([
            # same id as A's first node: A wins per-column, but A's
            # name is empty -> B's name fills in (first NON-EMPTY)
            {"id": "X:1", "name": "one-from-b",
             "category": "biolink:Protein", "provided_by": "b",
             "description": "desc-b"},  # column A doesn't have (A3)
            {"id": "X:3", "name": "three", "category": "biolink:Drug",
             "provided_by": "b", "description": ""},
        ]),
        edges=_ds([
            # exact duplicate of A's edge but provided_by differs ->
            # BOTH survive (composite key includes provided_by)
            {"subject": "X:1", "predicate": "biolink:interacts_with",
             "object": "X:2", "relation": "RO:0002434", "provided_by": "b"},
            {"subject": "X:3", "predicate": "biolink:treats",
             "object": "X:1", "relation": "RO:0002606", "provided_by": "b"},
        ]),
    )
    return [a, b]


def test_merge_schema_union_and_first_nonempty(two_sources):
    nodes, edges = merge_kg.merge(merge_kg.MergeConfig(sources=two_sources))
    ndf = nodes.to_pandas().set_index("id")
    assert sorted(ndf.index) == ["X:1", "X:2", "X:3"]
    # A3: description column exists for all rows (null-filled for A)
    assert "description" in ndf.columns
    # D3: first non-empty per column — name comes from B (A's empty),
    # provided_by from A (rank order)
    assert ndf.loc["X:1", "name"] == "one-from-b"
    assert ndf.loc["X:1", "provided_by"] == "a"
    assert ndf.loc["X:1", "xrefs"] == "UniProtKB:P1"
    assert ndf.loc["X:1", "description"] == "desc-b"
    edf = edges.to_pandas()
    assert len(edf) == 3  # parallel edges with distinct provided_by kept


def test_merge_filters(two_sources):
    for spec in two_sources:
        spec.node_categories = ["biolink:Protein"]
        spec.edge_predicates = ["biolink:treats"]
    nodes, edges = merge_kg.merge(merge_kg.MergeConfig(sources=two_sources))
    assert sorted(nodes.to_pandas()["id"]) == ["X:1"]
    assert edges.to_pandas()["predicate"].tolist() == ["biolink:treats"]


def test_merge_remap_node_identifier(two_sources):
    cfg = merge_kg.MergeConfig(
        sources=two_sources,
        operations=[("remap_node_identifier",
                     {"category": "biolink:Protein",
                      "alternative_property": "xrefs",
                      "prefix": "UniProtKB"})])
    nodes, edges = merge_kg.merge(cfg)
    ids = set(nodes.to_pandas()["id"])
    assert "UniProtKB:P1" in ids and "X:1" not in ids
    edf = edges.to_pandas()
    assert set(edf["subject"]) | set(edf["object"]) >= {"UniProtKB:P1"}
    assert "X:1" not in set(edf["subject"]) | set(edf["object"])


def test_graph_stats(two_sources):
    nodes, edges = merge_kg.merge(merge_kg.MergeConfig(sources=two_sources))
    stats = merge_kg.graph_stats(nodes, edges)
    assert stats["total_nodes"] == 3 and stats["total_edges"] == 3
    assert stats["node_stats"]["biolink:Protein"] == 1
    assert stats["edges_by_source"] == {"a": 1, "b": 2}


def test_register_and_dispatch(ray_session, tmp_path):
    @register_transform("toy")
    def toy(source):
        return (_ds([{"id": "T:1", "name": "t", "category": "c",
                      "provided_by": "toy"}]),
                _ds([{"subject": "T:1", "predicate": "p", "object": "T:1",
                      "relation": "r", "provided_by": "toy"}]))

    try:
        out = run_transforms(None, str(tmp_path), sources=["toy"])
        assert os.path.isdir(out["toy"]["nodes"])
        back = ray.data.read_parquet(out["toy"]["edges"]).to_pandas()
        assert back.iloc[0]["subject"] == "T:1"
        with pytest.raises(KeyError):
            run_transforms(None, str(tmp_path), sources=["nope"])
    finally:
        TRANSFORM_REGISTRY.pop("toy", None)


def test_builtin_web_pages_registered():
    assert "web_pages" in TRANSFORM_REGISTRY


def test_cli_query_and_parser(ray_session, tmp_path, capsys):
    from kg_covid_19_ray import cli
    p = cli.build_parser()
    args = p.parse_args(["query", "kg_node_stats",
                         "--sf-dir", "/root/testdata/sf0.001"])
    assert args.fn(args) == 0
    out = capsys.readouterr().out
    assert "biolink:Publication" in out
    args = p.parse_args(["query", "no_such_query"])
    assert args.fn(args) == 2


def test_cli_error_paths(ray_session, tmp_path):
    """Reference tests/test_run.py:17-31 analogs: bad inputs fail
    loudly, not silently."""
    from kg_covid_19_ray import cli
    p = cli.build_parser()

    # unknown transform source -> KeyError from the registry
    args = p.parse_args(["transform", "--input", "/nonexistent",
                         "--output-dir", str(tmp_path),
                         "--sources", "no_such_source"])
    with pytest.raises(KeyError, match="no_such_source"):
        args.fn(args)

    # merge with a missing per-source dir -> read error
    args = p.parse_args(["merge", "--sources", str(tmp_path / "missing"),
                         "--output-dir", str(tmp_path / "out")])
    with pytest.raises(Exception):
        args.fn(args)

def test_merge_remap_join_path_matches_broadcast(two_sources, monkeypatch):
    """Forcing the bucketed-hash-substitution path (broadcast_max=0)
    must produce exactly the broadcast path's merged graph (round-4
    VERDICT item 3: the driver-collect retirement)."""
    cfg = merge_kg.MergeConfig(
        sources=two_sources,
        operations=[("remap_node_identifier",
                     {"category": "biolink:Protein",
                      "alternative_property": "xrefs",
                      "prefix": "UniProtKB"})])
    nodes_b, edges_b = merge_kg.merge(cfg)
    ref_n = nodes_b.to_pandas().sort_values("id").reset_index(drop=True)
    ref_e = edges_b.to_pandas().sort_values(
        ["subject", "object", "provided_by"]).reset_index(drop=True)

    monkeypatch.setenv("KG_RAY_REMAP_BROADCAST_MAX", "0")
    nodes_j, edges_j = merge_kg.merge(cfg)
    got_n = nodes_j.to_pandas().sort_values("id").reset_index(drop=True)
    got_e = edges_j.to_pandas().sort_values(
        ["subject", "object", "provided_by"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_n[sorted(got_n.columns)],
                                  ref_n[sorted(ref_n.columns)])
    pd.testing.assert_frame_equal(got_e[sorted(got_e.columns)],
                                  ref_e[sorted(ref_e.columns)])


def test_merge_remap_join_path_large_map(ray_session, monkeypatch):
    """Join path with a map of several thousand entries (map >>
    broadcast threshold): every node id and edge endpoint remapped."""
    monkeypatch.setenv("KG_RAY_REMAP_BROADCAST_MAX", "0")
    n = 3000
    nodes = _ds([{"id": f"ENS:{i:05d}", "name": f"n{i}",
                  "category": "biolink:Protein", "provided_by": "s",
                  "xrefs": f"UniProtKB:U{i:05d}"} for i in range(n)])
    edges = _ds([{"subject": f"ENS:{i:05d}",
                  "predicate": "biolink:interacts_with",
                  "object": f"ENS:{(i + 1) % n:05d}",
                  "relation": "RO:0002434", "provided_by": "s"}
                 for i in range(n)])
    spec = merge_kg.SourceSpec(name="s", nodes=nodes, edges=edges)
    cfg = merge_kg.MergeConfig(
        sources=[spec],
        operations=[("remap_node_identifier",
                     {"category": "biolink:Protein",
                      "alternative_property": "xrefs",
                      "prefix": "UniProtKB"})])
    out_n, out_e = merge_kg.merge(cfg)
    ids = set(out_n.to_pandas()["id"])
    assert ids == {f"UniProtKB:U{i:05d}" for i in range(n)}
    edf = out_e.to_pandas()
    assert len(edf) == n
    endpoints = set(edf["subject"]) | set(edf["object"])
    assert endpoints == {f"UniProtKB:U{i:05d}" for i in range(n)}
