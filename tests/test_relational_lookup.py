"""Broadcast-dimension lookup stages (pipelines/relational): FK
violations must surface as nulls, never as a neighboring key's value
(ADVICE r2 — raw searchsorted resolves a missing key to the insertion
point's neighbor, or raises on out-of-range take)."""

from __future__ import annotations

import pyarrow as pa
import ray

from kg_covid_19_ray.pipelines.relational import _KeyLookup, _lookup_ref


def test_key_lookup_resolves_and_nulls_missing(ray_session):
    ref = _lookup_ref([10, 20, 30], ["a", "b", "c"])
    lk = _KeyLookup(ref, "k", "v")
    batch = pa.table({"k": pa.array([20, 10, 30, 20], pa.int64())})
    out = lk(batch)
    assert out["v"].to_pylist() == ["b", "a", "c", "b"]

    # missing interior key (15), below-min (5), above-max (99): all null
    bad = pa.table({"k": pa.array([15, 5, 99, 10], pa.int64())})
    out = lk(bad)
    assert out["v"].to_pylist() == [None, None, None, "a"]


def test_nation_enricher_nulls_missing_custkey(ray_session):
    from kg_covid_19_ray.pipelines.relational import _NationEnricher

    cust_ref = ray.put({1: 100, 2: 200})
    nation_ref = ray.put({100: "FRANCE", 200: "KENYA"})
    enr = _NationEnricher(cust_ref, nation_ref)
    batch = pa.table({"o_custkey": pa.array([2, 7, 1, 0], pa.int64())})
    out = enr(batch)
    assert out["n_name"].to_pylist() == ["KENYA", None, "FRANCE", None]
