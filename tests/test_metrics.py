"""Per-stage metrics taps (state/metrics): counter accuracy, dedup-hit
derivation, and the flagship wiring."""

from __future__ import annotations

import ray.data

from kg_covid_19_ray.state.metrics import Metrics, metered


def test_metered_counts_rows_and_batches(ray_session):
    m = Metrics("t1")
    m.reset()
    ds = ray.data.range(1000).repartition(4)
    out = metered(ds, "scan", m)
    assert out.count() == 1000
    snap = m.snapshot()
    assert snap["scan"]["rows"] == 1000
    assert snap["scan"]["batches"] == 4


def test_dedup_hits_from_in_out_taps(ray_session):
    from kg_covid_19_ray.stages.dedup import distinct

    m = Metrics("t2")
    m.reset()
    ds = ray.data.from_items([{"k": i % 10} for i in range(100)])
    tapped = metered(ds, "d.in", m)
    deduped = metered(distinct(tapped, ["k"]), "d.out", m)
    assert deduped.count() == 10
    assert m.dedup_hits("d") == 90


def test_flagship_metrics_wiring(ray_session, sf_small):
    from kg_covid_19_ray.pipelines.flagship import build_kg

    m = Metrics("t3")
    m.reset()
    _nodes, edges = build_kg(sf_small, metrics=m)
    n_edges = edges.count()
    snap = m.snapshot()
    assert snap["mention_dedup.out"]["rows"] == n_edges
    assert snap["mention_dedup.in"]["rows"] >= n_edges
    assert m.dedup_hits("mention_dedup") == \
        snap["mention_dedup.in"]["rows"] - n_edges
