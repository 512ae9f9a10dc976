"""Dedup determinism under parallelism — the property the reference gets
for free by being serial (SURVEY §5)."""

import pandas as pd
import pyarrow as pa
import ray.data

from kg_covid_19_ray.stages.dedup import distinct, first_wins


def _rows():
    # id 'a' appears 3 times with different names; first = min order_key
    return [
        {"id": "a", "name": "third", "order_key": 30},
        {"id": "b", "name": "only", "order_key": 5},
        {"id": "a", "name": "FIRST", "order_key": 1},
        {"id": "c", "name": "late", "order_key": 99},
        {"id": "a", "name": "second", "order_key": 2},
        {"id": "c", "name": "EARLY", "order_key": 7},
    ]


def test_first_wins_basic(ray_session):
    ds = ray.data.from_items(_rows())
    out = first_wins(ds, ["id"], "order_key").to_pandas()
    got = dict(zip(out["id"], out["name"]))
    assert got == {"a": "FIRST", "b": "only", "c": "EARLY"}


def test_first_wins_parallelism_invariant(ray_session):
    """Same result at different block layouts / shuffled input order."""
    base = _rows()
    results = []
    for seed in (1, 2):
        ds = ray.data.from_items(base).random_shuffle(seed=seed).repartition(5)
        out = first_wins(ds, ["id"], "order_key").to_pandas()
        results.append(out.sort_values("id").reset_index(drop=True)[["id", "name"]])
    pd.testing.assert_frame_equal(results[0], results[1])
    assert dict(zip(results[0]["id"], results[0]["name"]))["a"] == "FIRST"


def test_distinct_composite_key(ray_session):
    rows = [{"s": "x", "o": str(i % 3), "junk": i} for i in range(30)]
    ds = ray.data.from_items(rows).repartition(4)
    out = distinct(ds, ["s", "o"]).to_pandas()
    assert len(out) == 3
    assert sorted(out.columns) == ["o", "s"]  # non-key columns dropped
