"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline on sf0.001;
``queries()`` exposes every implemented operator/pipeline (SURVEY.md §2
plus the training-data operator suite); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for each SQL-expressible query.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in kg_covid_19_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: pages -> extract ->
    mentions -> link -> canonicalize -> dedup -> merged edge table."""
    from kg_covid_19_ray.pipelines.flagship import build_kg

    _nodes, edges = build_kg("/root/testdata/sf0.001")
    return edges


PIPELINE_MODULES = ("relational_queries", "textops", "dedup_ops",
                    "similarity", "holdouts", "multimodal", "windowed",
                    "sketches")


def _registry() -> dict[str, tuple[Callable[[str], Any], str | None]]:
    from kg_covid_19_ray.pipelines import kg_queries

    reg: dict[str, tuple[Callable[[str], Any], str | None]] = {}
    reg.update(kg_queries.REGISTRY)
    for mod_name in PIPELINE_MODULES:
        try:
            import importlib
            mod = importlib.import_module(
                f"kg_covid_19_ray.pipelines.{mod_name}")
            reg.update(mod.REGISTRY)
        except ModuleNotFoundError:
            continue
    return reg


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _registry().items()
            if sql is not None}
