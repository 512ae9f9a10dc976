"""Tests for the quarantine/dead-letter wrapper and the IVF ANN."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from kg_covid_19_ray.stages import quarantine as q
from kg_covid_19_ray.pipelines import similarity

SF = "/root/testdata/sf0.001"


def _parse(row: dict) -> dict:
    if row["v"] < 0:
        raise ValueError(f"negative value {row['v']}")
    return {"id": row["id"], "doubled": row["v"] * 2}


def test_quarantine_splits_good_and_bad(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame(
        {"id": [1, 2, 3, 4], "v": [10, -1, 30, -2]})).materialize()
    good, bad = q.map_with_quarantine(ds, _parse)
    gdf = good.to_pandas().sort_values("id")
    bdf = bad.to_pandas()
    assert gdf["doubled"].tolist() == [20, 60]
    assert len(bdf) == 2
    assert set(bdf["error_type"]) == {"ValueError"}
    assert "negative value -1" in set(bdf["error_msg"])
    assert q.error_counts(bad) == {"ValueError": 2}


def test_quarantine_all_good_and_all_bad(ray_session):
    all_good = ray.data.from_pandas(
        pd.DataFrame({"id": [1], "v": [5]})).materialize()
    g, b = q.map_with_quarantine(all_good, _parse)
    assert g.count() == 1 and b.count() == 0
    all_bad = ray.data.from_pandas(
        pd.DataFrame({"id": [1], "v": [-5]})).materialize()
    g2, b2 = q.map_with_quarantine(all_bad, _parse)
    assert b2.count() == 1


def test_ann_ivf_runs_and_recalls_at_small_scale(ray_session):
    """At sf0.001 (50 vectors, 32 cells, 4 probes) IVF candidate sets
    are dense enough that recall vs brute force must be substantial,
    and outputs must be a subset of valid (q, n) pairs with rounded
    cosines matching brute force on overlap."""
    bf = similarity.ann_bruteforce(SF).to_pandas()
    ivf = similarity.ann_ivf(SF).to_pandas()
    assert not ivf.empty
    assert not ivf.duplicated(["q_id", "n_id"]).any()
    bf_pairs = {(r.q_id, r.n_id): r.cos for r in bf.itertuples()}
    overlap = [(r.q_id, r.n_id, r.cos) for r in ivf.itertuples()
               if (r.q_id, r.n_id) in bf_pairs]
    assert overlap, "IVF found none of the exact top-k"
    for qid, nid, cos in overlap:
        assert abs(bf_pairs[(qid, nid)] - cos) < 1e-9
    recall = len(overlap) / len(bf_pairs)
    assert recall >= 0.3, f"recall {recall} suspiciously low"
