"""k-core peeling (stages/kcore.py): exact agreement with a serial
reference peel, fixpoint behaviour, and layout independence."""

from __future__ import annotations

import random

import ray.data

from kg_covid_19_ray.stages.kcore import kcore_nodes


def _serial_peel(edges, k, rounds):
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    for _ in range(rounds):
        deg: dict = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        alive = {n for n, d in deg.items() if d >= k}
        es = {(a, b) for a, b in es if a in alive and b in alive}
    deg = {}
    for a, b in es:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return {n for n, d in deg.items() if d >= k}


def _run(edges, k, rounds, rep=None):
    ds = ray.data.from_items([{"subject": s, "object": o}
                              for s, o in edges])
    if rep:
        ds = ds.repartition(rep)
    df = kcore_nodes(ds, k=k, rounds=rounds).to_pandas()
    # Ray 2.49 to_pandas() drops columns on a 0-row dataset even when
    # the schema is declared — an empty core is the empty set
    return set(df["id"]) if "id" in df.columns else set()


def test_randomized_vs_serial(ray_session):
    rng = random.Random(31)
    for _ in range(3):
        edges = [(f"n{rng.randint(0, 20)}", f"n{rng.randint(0, 20)}")
                 for _ in range(rng.randint(10, 80))]
        k = rng.randint(2, 4)
        assert _run(edges, k, 3) == _serial_peel(edges, k, 3)


def test_chain_peels_to_nothing(ray_session):
    # a path graph has no 2-core; each round peels the two endpoints,
    # so enough rounds empty it and too few leave the inner superset
    chain = [(f"c{i:02d}", f"c{i+1:02d}") for i in range(8)]
    assert _run(chain, 2, 1) == _serial_peel(chain, 2, 1)
    assert len(_run(chain, 2, 1)) > 0  # superset after one round
    assert _run(chain, 2, 6) == set()  # converged: no 2-core

    # triangle + tail: the triangle IS the 2-core, tail peels away
    tri = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "t1"), ("t1", "t2")]
    assert _run(tri, 2, 4) == {"a", "b", "c"}


def test_layout_independence(ray_session):
    rng = random.Random(8)
    edges = [(f"n{rng.randint(0, 15)}", f"n{rng.randint(0, 15)}")
             for _ in range(60)]
    assert _run(edges, 3, 2, rep=1) == _run(edges, 3, 2, rep=13)
