"""Distributed connected components vs a single-process union-find."""

import ray.data

from kg_covid_19_ray.sources.gazetteer import SAMEAS_EDGES, sameas_canonical_map
from kg_covid_19_ray.stages.cluster import (
    canonical_map_from_components,
    connected_components,
)


def _union_find(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    return {m: find(m) for m in parent}


def test_components_static_sameas(ray_session):
    ds = ray.data.from_items([{"a": a, "b": b} for a, b in SAMEAS_EDGES])
    got = canonical_map_from_components(connected_components(ds, num_partitions=2))
    assert got == sameas_canonical_map()


def test_components_chain_and_clique(ray_session):
    # a 12-node path (needs multiple propagation rounds), a triangle,
    # and an isolated pair
    edges = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(11)]
    edges += [("t1", "t2"), ("t2", "t3"), ("t3", "t1"), ("p1", "p2")]
    ds = ray.data.from_items([{"a": a, "b": b} for a, b in edges]).repartition(4)
    got = canonical_map_from_components(connected_components(ds, num_partitions=4))
    assert got == _union_find(edges)
    assert got["n11"] == "n00"
    assert got["t3"] == "t1"
    assert got["p2"] == "p1"


def test_long_chain_converges_via_pointer_jumping(ray_session):
    """A 100-node same-as chain (diameter 100) must fully collapse —
    plain propagation would exhaust max_rounds and silently return
    wrong components (regression for the pointer-jumping fix)."""
    import ray.data
    from kg_covid_19_ray.stages.cluster import connected_components
    edges = ray.data.from_items(
        [{"a": f"N:{i:04d}", "b": f"N:{i+1:04d}"} for i in range(100)])
    out = connected_components(edges, num_partitions=4).to_pandas()
    assert len(out) == 101
    assert out["canon"].nunique() == 1
    assert out["canon"].iloc[0] == "N:0000"


def test_hub_component_and_disjoint_pairs(ray_session):
    """Extreme label skew (one collapsed hub component) must not break
    the jump exchange (regression: Ray join loses schema on empty
    partitions), and disjoint pairs stay separate."""
    import ray.data
    from kg_covid_19_ray.stages.cluster import connected_components
    edges = ray.data.from_items(
        [{"a": "HUB:0", "b": f"S:{i:03d}"} for i in range(200)]
        + [{"a": f"X{i}:a", "b": f"Y{i}:b"} for i in range(5)])
    out = connected_components(edges, num_partitions=4).to_pandas()
    star = out[out["member"].str.startswith(("HUB", "S"))]
    assert star["canon"].nunique() == 1 and star["canon"].iloc[0] == "HUB:0"
    pairs = out[out["member"].str.startswith(("X", "Y"))]
    assert pairs["canon"].nunique() == 5
