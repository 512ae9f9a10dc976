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
                    "sketches", "webops")

# Registry order = driver verification order (a time-budgeted sweep
# covers a prefix). Queries whose SEMANTICS changed this round run
# first; after them everything is ordered by the round a query's green
# value-hash row was last recorded (read from the CORRECTNESS_r*.json
# files at import time), OLDEST first, so no query's proof goes stale —
# a 50-query budget re-proves the stalest rows every round (round-4
# VERDICT item 3). Never-verified queries sort as round 0 (earliest).
CHANGED_THIS_ROUND = (
    # round 5: dual-plan embedding routing, derived windowed buckets,
    # null-text tokenization fix, pyarrow join prep in the dedup verify,
    # mention-detector space-tokenizer fast path (feeds the kg_* chain),
    # pagerank derived iteration buckets + vectorized kernels,
    # decontamination Bloom dual plan
    "dedup_embedding", "embedding_pair_topk",
    "rel_sessions", "rel_sliding_count", "rel_asof_error_click",
    "text_tfidf_topterms", "text_lm_surprisal",
    "dedup_jaccard_topk", "dedup_minhash", "dedup_minhash_clusters",
    "rel_brand_margin",
    "kg_mentions", "kg_nodes", "kg_edges", "kg_pagerank",
    "text_decontaminate",
    # late round 5: new DSIR importance-sampling and CCNet-tercile
    # queries (never verified) and kg_pagerank's default plan switch
    # to bucket-pinned actors
    "text_importance_sample", "text_quality_percentile",
)


def _last_verified_round() -> dict[str, int]:
    """name -> latest round whose CORRECTNESS file records a fully
    green row (rows+schema+hash, no err) for that query."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    out: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                data = json.load(fh)
        except Exception:
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if (isinstance(row, dict) and not row.get("err")
                    and row.get("rows_match")
                    and row.get("schema_match") is not False
                    and row.get("hash_match") is not False):
                out[name] = max(out.get(name, 0), rnd)
    return out


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
    last = _last_verified_round()
    changed_rank = {n: i for i, n in enumerate(CHANGED_THIS_ROUND)}
    names = sorted(reg, key=lambda n: (
        changed_rank.get(n, len(changed_rank)), last.get(n, 0), n))
    return {name: reg[name] for name in names}


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _registry().items()
            if sql is not None}
