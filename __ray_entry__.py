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

# Registry order = driver verification order. Entries never yet (or not
# last round) driver-verified run FIRST so a time-budgeted correctness
# sweep always covers the newest/least-proven queries before the
# long-green ones (round-3 VERDICT item 1).
VERIFY_FIRST = (
    # new/changed in round 4
    "holdout_connected", "dedup_embedding_lsh", "embedding_pair_topk_lsh",
    "text_tfidf_topterms", "text_decontaminate", "text_lm_surprisal",
    "kg_edges_from_warc", "kg_remapped_edges",
    "ann_ivf_join",
    "ann_ivf", "ann_ivf_kmeans", "kg_cooccurrence", "kg_cooccur_stats",
    "kg_triangles", "kg_node_triangles", "kg_incr_edges", "kg_incr_nodes",
    # no CORRECTNESS_r03 row (media real-decode, windowed, sketch)
    "media_features", "media_frame_sample", "media_near_dups",
    "media_thumbnails", "sketch_distinct_texts", "rel_sessions",
    "rel_sliding_count", "rel_asof_error_click", "rel_range_join",
    "rel_top_orders_per_cust", "rel_props_avg",
)


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
    ordered: dict[str, tuple[Callable[[str], Any], str | None]] = {}
    for name in VERIFY_FIRST:
        if name in reg:
            ordered[name] = reg[name]
    for name, val in reg.items():
        if name not in ordered:
            ordered[name] = val
    return ordered


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _registry().items()
            if sql is not None}
