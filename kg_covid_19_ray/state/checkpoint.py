"""Per-stage partitioned-Parquet checkpoints with lineage metadata.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics". The reference has no checkpointing at all — its only
resume story is the download cache (download_utils.py:50-56) and a
Jenkins fall-back to the last good raw copy (Jenkinsfile:85-92); a
failed transform always recomputes from scratch.

Model here:

- A checkpointed stage writes its output Dataset as a DIRECTORY of
  parquet part files under ``<root>/<stage>/<fingerprint>/`` — one file
  per Ray block, i.e. per partition of the stage output.
- After a successful write, a ``manifest.json`` records the lineage
  (stage name, input fingerprint, upstream stage names), per-partition
  metrics (file name, rows, bytes) and wall-clock. The manifest is
  written LAST, so a half-written checkpoint (no manifest) is invalid
  and gets re-run — write-then-commit.
- ``run_stage`` skips the compute entirely when a valid manifest with
  the same fingerprint exists and returns ``read_parquet`` over the
  checkpoint — the resume path. A fingerprint mismatch (input changed)
  re-runs into a fresh directory.

Fingerprints are caller-supplied content keys (e.g. input path + mtime,
or the upstream stage's fingerprint chained with the stage's config);
``fingerprint_for_path`` provides the file-input convention.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import ray.data


def fingerprint_for_path(path: str, *extra: str) -> str:
    """Content key for a file/dir input: path + recursive file stats +
    extras. Directories are walked RECURSIVELY (relative path + mtime +
    size of every file): a parquet part nested under a subdirectory
    does not bump its parent's mtime, so a shallow listing would resume
    a stale checkpoint over changed input."""
    h = hashlib.md5()
    h.update(path.encode())
    if os.path.isdir(path):
        for dirpath, dirnames, filenames in os.walk(path):
            dirnames.sort()
            for name in sorted(filenames):
                p = os.path.join(dirpath, name)
                rel = os.path.relpath(p, path)
                st = os.stat(p)
                h.update(f"{rel}:{st.st_mtime:.0f}:{st.st_size}".encode())
    elif os.path.exists(path):
        st = os.stat(path)
        h.update(f"{st.st_mtime:.0f}:{st.st_size}".encode())
    for e in extra:
        h.update(e.encode())
    return h.hexdigest()[:16]


def _manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, "manifest.json")


def is_complete(root: str, stage: str, fingerprint: str) -> bool:
    return os.path.exists(
        _manifest_path(os.path.join(root, stage, fingerprint)))


def load_manifest(root: str, stage: str, fingerprint: str) -> dict | None:
    p = _manifest_path(os.path.join(root, stage, fingerprint))
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def run_stage(
    root: str,
    stage: str,
    fingerprint: str,
    ds_factory,
    *,
    inputs: list[str] | None = None,
) -> ray.data.Dataset:
    """Execute (or resume) one checkpointed stage.

    ``ds_factory() -> Dataset`` is only called on a cache miss; its
    output is written to parquet, a manifest committed, and a fresh
    ``read_parquet`` over the checkpoint returned (so downstream lineage
    starts from disk — a retry domain boundary).
    """
    stage_dir = os.path.join(root, stage, fingerprint)
    if os.path.exists(_manifest_path(stage_dir)):
        return ray.data.read_parquet(stage_dir, file_extensions=["parquet"])

    t0 = time.time()
    ds = ds_factory()
    os.makedirs(stage_dir, exist_ok=True)
    # clear any half-written attempt (no manifest -> invalid)
    for name in os.listdir(stage_dir):
        os.unlink(os.path.join(stage_dir, name))
    ds.write_parquet(stage_dir)

    if not any(n.endswith(".parquet") for n in os.listdir(stage_dir)):
        # Ray writes NO part files for an empty dataset, which would
        # make this checkpoint (and every future resume of it)
        # unreadable. Commit one explicit empty part instead — an
        # empty stage output is a valid, resumable result.
        import pyarrow as pa
        import pyarrow.parquet as pq
        schema = ds.schema(fetch_if_missing=True)
        arrow_schema = getattr(schema, "base_schema", schema)
        if not isinstance(arrow_schema, pa.Schema):
            raise ValueError(
                f"stage '{stage}' produced no rows and its schema is "
                f"unknown; an empty checkpoint needs a schema to be "
                f"readable on resume")
        pq.write_table(arrow_schema.empty_table(),
                       os.path.join(stage_dir, "empty-0.parquet"))

    partitions = []
    total_rows = 0
    for name in sorted(os.listdir(stage_dir)):
        if not name.endswith(".parquet"):
            continue
        p = os.path.join(stage_dir, name)
        try:
            import pyarrow.parquet as pq
            rows = pq.read_metadata(p).num_rows
        except Exception:
            rows = None
        total_rows += rows or 0
        partitions.append({"file": name, "rows": rows,
                           "bytes": os.path.getsize(p)})

    manifest = {
        "stage": stage,
        "fingerprint": fingerprint,
        "inputs": inputs or [],
        "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "wall_sec": round(time.time() - t0, 3),
        "num_partitions": len(partitions),
        "total_rows": total_rows,
        "partitions": partitions,
    }
    tmp = _manifest_path(stage_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, _manifest_path(stage_dir))  # commit point
    return ray.data.read_parquet(stage_dir, file_extensions=["parquet"])
