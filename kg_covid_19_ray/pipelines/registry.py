"""Transform plugin API — the engine's user-extension surface
(SURVEY §2.10; reference transform_utils/transform.py:7-38 Transform
base class + transform.py:23-66 DATA_SOURCES registry/dispatcher).

A transform step is a callable ``(source: Dataset | str) ->
(nodes_ds, edges_ds)`` registered under a source name. The dispatcher
runs the requested steps — each an independent streaming Dataset DAG,
so per-source pipelines parallelize instead of the reference's serial
per-source loop (transform.py:59-66) — and writes per-source outputs
as partitioned Parquet (internal format) with a KGX TSV export option.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import ray.data

TransformStep = Callable[[Any], tuple[ray.data.Dataset, ray.data.Dataset]]

TRANSFORM_REGISTRY: dict[str, TransformStep] = {}


def register_transform(name: str) -> Callable[[TransformStep], TransformStep]:
    """Decorator: ``@register_transform("web_pages")`` — the analog of
    adding an entry to DATA_SOURCES (transform.py:23-38)."""

    def deco(fn: TransformStep) -> TransformStep:
        TRANSFORM_REGISTRY[name] = fn
        return fn

    return deco


def run_transforms(source: Any, output_dir: str,
                   sources: list[str] | None = None,
                   *, tsv: bool = False) -> dict[str, dict[str, str]]:
    """Dispatcher (transform.py:41-66 analog): run each registered (or
    requested) transform, write ``<output_dir>/<name>/{nodes,edges}``
    Parquet dirs (+ optional KGX TSV). Unknown names raise, like the
    reference's registry lookup. Returns {name: {nodes: path, edges:
    path}}."""
    names = sources if sources is not None else list(TRANSFORM_REGISTRY)
    unknown = [n for n in names if n not in TRANSFORM_REGISTRY]
    if unknown:
        raise KeyError(f"unregistered transform source(s): {unknown}")
    out: dict[str, dict[str, str]] = {}
    for name in names:
        nodes, edges = TRANSFORM_REGISTRY[name](source)
        base = os.path.join(output_dir, name)
        paths = {"nodes": os.path.join(base, "nodes"),
                 "edges": os.path.join(base, "edges")}
        nodes.write_parquet(paths["nodes"])
        edges.write_parquet(paths["edges"])
        if tsv:
            from kg_covid_19_ray.io.kgx import write_kgx_tsv
            write_kgx_tsv(ray.data.read_parquet(paths["nodes"]),
                          os.path.join(base, "nodes_tsv"))
            write_kgx_tsv(ray.data.read_parquet(paths["edges"]),
                          os.path.join(base, "edges_tsv"))
        out[name] = paths
    return out


def _register_builtin() -> None:
    """The flagship web-pages transform, registered the way a user
    plugin would be."""
    from kg_covid_19_ray.pipelines.flagship import build_kg

    @register_transform("web_pages")
    def web_pages(source):
        return build_kg(source)

    # reference-parity plugins self-register on import
    import importlib
    for mod in ("drug_central", "string_ppi", "chembl", "gene_annot",
                "zhou"):
        importlib.import_module(f"kg_covid_19_ray.pipelines.{mod}")


_register_builtin()
