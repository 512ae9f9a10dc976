"""Incremental KG build (pipelines/incremental.py): shard-wise
checkpointed builds merge to EXACTLY the from-scratch graph, resume
re-runs nothing, and appending a shard reuses history manifests — the
north-rule resumability story extended to corpus growth (the reference
recomputes everything per run; download_utils.py:50-56 is its only
cache)."""

from __future__ import annotations

import glob
import os

import pandas as pd

from kg_covid_19_ray.pipelines.flagship import build_kg
from kg_covid_19_ray.pipelines.incremental import build_kg_incremental

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _manifest_mtimes(root: str) -> dict[str, float]:
    return {p: os.stat(p).st_mtime_ns
            for p in glob.glob(os.path.join(root, "*", "*", "manifest.json"))}


def test_incremental_matches_full_build(ray_session, tmp_path):
    root = str(tmp_path)
    nodes_i, edges_i = build_kg_incremental(SF, checkpoint_root=root)
    nodes_f, edges_f = build_kg(SF)
    assert _canon(nodes_i.to_pandas()).equals(_canon(nodes_f.to_pandas()))
    assert _canon(edges_i.to_pandas()).equals(_canon(edges_f.to_pandas()))
    # 2 shards x 5 stages (docs, mentions, 3 artifacts), each committed
    # with a lineage manifest
    assert len(_manifest_mtimes(root)) == 10


def test_resume_recomputes_nothing(ray_session, tmp_path):
    root = str(tmp_path)
    nodes_1, _ = build_kg_incremental(SF, checkpoint_root=root)
    n1 = _canon(nodes_1.to_pandas())
    before = _manifest_mtimes(root)
    nodes_2, edges_2 = build_kg_incremental(SF, checkpoint_root=root)
    assert _manifest_mtimes(root) == before  # every stage resumed
    assert _canon(nodes_2.to_pandas()).equals(n1)
    assert edges_2.count() > 0


def test_adding_a_shard_reuses_history(ray_session, tmp_path):
    root = str(tmp_path)
    # crawl 1 arrives: build shard 0 only (a valid partial graph)
    nodes_0, edges_0 = build_kg_incremental(
        SF, checkpoint_root=root, shard_ids=[0])
    partial_edges = edges_0.count()
    assert nodes_0.count() > 0 and partial_edges > 0
    shard0 = _manifest_mtimes(root)
    assert len(shard0) == 5

    # crawl 2 arrives: extend to shards [0, 1] — shard 0 must resume
    nodes_all, edges_all = build_kg_incremental(
        SF, checkpoint_root=root, shard_ids=[0, 1])
    after = _manifest_mtimes(root)
    assert all(after[p] == t for p, t in shard0.items())
    assert len(after) == 10

    nodes_f, edges_f = build_kg(SF)
    assert edges_all.count() > partial_edges
    assert _canon(nodes_all.to_pandas()).equals(_canon(nodes_f.to_pandas()))
    assert _canon(edges_all.to_pandas()).equals(_canon(edges_f.to_pandas()))


def test_crawl_dirs_production_path(ray_session, tmp_path):
    """The per-crawl-dir shape: each shard reads ONLY its own dump dir
    (no corpus filter), merges to the exact from-scratch graph, and
    appending a new crawl dir leaves history manifests untouched."""
    from kg_covid_19_ray.pipelines.incremental import (
        split_pages_to_crawl_dirs)

    dirs = split_pages_to_crawl_dirs(
        SF, str(tmp_path / "crawls"), num_crawls=3)
    assert len(dirs) == 3 and all(os.path.isdir(d) for d in dirs)

    root = str(tmp_path / "ckpt")
    nodes_01, edges_01 = build_kg_incremental(
        dirs[:2], checkpoint_root=root)
    partial = edges_01.count()
    assert partial > 0
    history = _manifest_mtimes(root)
    assert len(history) == 10

    # the third crawl dump arrives: history shards resume untouched
    nodes_all, edges_all = build_kg_incremental(
        dirs, checkpoint_root=root)
    after = _manifest_mtimes(root)
    assert all(after[p] == t for p, t in history.items())
    assert len(after) == 15

    nodes_f, edges_f = build_kg(SF)
    assert edges_all.count() > partial
    assert _canon(nodes_all.to_pandas()).equals(_canon(nodes_f.to_pandas()))
    assert _canon(edges_all.to_pandas()).equals(_canon(edges_f.to_pandas()))
