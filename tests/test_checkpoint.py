"""Checkpoint/resume contract tests (state/checkpoint.py; north-rule
resumability): cache miss computes + commits a manifest, cache hit
skips the factory, fingerprint change recomputes, a half-written dir
(no manifest) is invalid and recomputes."""

from __future__ import annotations

import json
import os

import pandas as pd
import ray.data

from kg_covid_19_ray.state import checkpoint as cp


def _factory(calls: list):
    def make() -> ray.data.Dataset:
        calls.append(1)
        return ray.data.from_pandas(
            pd.DataFrame({"id": [1, 2, 3], "v": ["a", "b", "c"]}))
    return make


def test_run_stage_compute_then_resume(ray_session, tmp_path):
    root = str(tmp_path)
    calls: list = []
    out1 = cp.run_stage(root, "stage_a", "fp1", _factory(calls),
                        inputs=["input.parquet"])
    assert len(calls) == 1 and out1.count() == 3
    assert cp.is_complete(root, "stage_a", "fp1")

    out2 = cp.run_stage(root, "stage_a", "fp1", _factory(calls))
    assert len(calls) == 1  # resumed from checkpoint, factory skipped
    assert sorted(out2.to_pandas()["id"]) == [1, 2, 3]

    m = cp.load_manifest(root, "stage_a", "fp1")
    assert m["stage"] == "stage_a" and m["fingerprint"] == "fp1"
    assert m["total_rows"] == 3 and m["num_partitions"] >= 1
    assert m["inputs"] == ["input.parquet"]
    assert all("rows" in p and "bytes" in p for p in m["partitions"])


def test_run_stage_fingerprint_change_recomputes(ray_session, tmp_path):
    root = str(tmp_path)
    calls: list = []
    cp.run_stage(root, "s", "fp1", _factory(calls))
    cp.run_stage(root, "s", "fp2", _factory(calls))
    assert len(calls) == 2
    assert cp.is_complete(root, "s", "fp1")
    assert cp.is_complete(root, "s", "fp2")


def test_half_written_checkpoint_is_invalid(ray_session, tmp_path):
    root = str(tmp_path)
    calls: list = []
    cp.run_stage(root, "s", "fp", _factory(calls))
    # simulate a crash between data write and manifest commit
    stage_dir = os.path.join(root, "s", "fp")
    os.unlink(os.path.join(stage_dir, "manifest.json"))
    assert not cp.is_complete(root, "s", "fp")
    out = cp.run_stage(root, "s", "fp", _factory(calls))
    assert len(calls) == 2 and out.count() == 3
    assert cp.is_complete(root, "s", "fp")


def test_fingerprint_for_path_changes_with_extras(tmp_path):
    p = tmp_path / "f.txt"
    p.write_text("x")
    a = cp.fingerprint_for_path(str(p))
    b = cp.fingerprint_for_path(str(p), "config=1")
    assert a != b and len(a) == 16
    assert cp.fingerprint_for_path(str(p)) == a  # stable


def test_fingerprint_sees_nested_changes(tmp_path):
    """A file modified inside a SUBDIRECTORY must change the directory
    fingerprint (parent-dir mtimes don't propagate; the walk must be
    recursive)."""
    import os
    import time
    from kg_covid_19_ray.state.checkpoint import fingerprint_for_path

    root = tmp_path / "input"
    sub = root / "part=0"
    sub.mkdir(parents=True)
    f = sub / "data.parquet"
    f.write_bytes(b"v1")
    fp1 = fingerprint_for_path(str(root))
    # rewrite the nested file with different content size + mtime,
    # leaving the subdirectory entry itself untouched
    f.write_bytes(b"v2-longer")
    os.utime(f, (time.time() + 10, time.time() + 10))
    fp2 = fingerprint_for_path(str(root))
    assert fp1 != fp2


def test_empty_stage_output_is_resumable(ray_session, tmp_path):
    # Ray writes no part files for an empty dataset; run_stage must
    # still commit a readable (schema-bearing) checkpoint
    import pyarrow as pa

    root = str(tmp_path)

    def empty_factory() -> ray.data.Dataset:
        return ray.data.from_arrow(pa.table(
            {"id": pa.array([], pa.int64()),
             "v": pa.array([], pa.string())}))

    out = cp.run_stage(root, "empty_stage", "fp_e", empty_factory)
    assert out.count() == 0
    assert out.schema().names == ["id", "v"]
    # resume path reads the committed empty part, factory skipped
    calls: list = []

    def tracking():
        calls.append(1)
        return empty_factory()

    again = cp.run_stage(root, "empty_stage", "fp_e", tracking)
    assert calls == [] and again.count() == 0
    m = cp.load_manifest(root, "empty_stage", "fp_e")
    assert m["total_rows"] == 0 and m["num_partitions"] == 1
