"""Triangle counting (stages/triangles.py): exact agreement with a
brute-force reference on randomized graphs, block-layout independence
(the coalesced-partial-counts regression), and hub handling."""

from __future__ import annotations

import itertools
import random

import ray.data

from kg_covid_19_ray.stages.triangles import count_triangles


def _brute(edges) -> int:
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({x for e in es for x in e})
    return sum(1 for a, b, c in itertools.combinations(nodes, 3)
               if (a, b) in es and (b, c) in es and (a, c) in es)


def _run(edges, **kw) -> int:
    ds = ray.data.from_items([{"subject": s, "object": o}
                              for s, o in edges])
    return count_triangles(ds, **kw).to_pandas()["n_triangles"][0]


def test_randomized_vs_bruteforce(ray_session):
    rng = random.Random(13)
    for _ in range(4):
        edges = [(f"n{rng.randint(0, 18)}", f"n{rng.randint(0, 18)}")
                 for _ in range(rng.randint(3, 70))]
        assert _run(edges) == _brute(edges)


def test_block_layout_independence(ray_session):
    # regression: partial counts coalesce into shared output blocks at
    # low block counts; every row must be summed, not one per block
    rng = random.Random(5)
    edges = [(f"n{rng.randint(0, 12)}", f"n{rng.randint(0, 12)}")
             for _ in range(60)]
    want = _brute(edges)
    ds = ray.data.from_items([{"subject": s, "object": o}
                              for s, o in edges])
    for rep in (1, 4, 16):
        got = count_triangles(
            ds.repartition(rep)).to_pandas()["n_triangles"][0]
        assert got == want


def test_hub_star_plus_duplicates(ray_session):
    # a star has no triangles regardless of hub degree; duplicate and
    # reversed edge rows collapse; closing one spoke pair adds exactly
    # the one triangle
    star = [("hub", f"s{i}") for i in range(50)]
    assert _run(star + star + [(b, a) for a, b in star]) == 0
    assert _run(star + [("s0", "s1")]) == 1


def test_node_triangle_counts(ray_session):
    from kg_covid_19_ray.stages.triangles import node_triangle_counts
    rng = random.Random(23)
    edges = [(f"n{rng.randint(0, 14)}", f"n{rng.randint(0, 14)}")
             for _ in range(55)]
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({x for e in es for x in e})
    deg = {n: 0 for n in nodes}
    for a, b in es:
        deg[a] += 1
        deg[b] += 1
    tri = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    ds = ray.data.from_items([{"subject": s, "object": o}
                              for s, o in edges])
    df = node_triangle_counts(ds).to_pandas()
    got = {r.id: (r.triangles, r.degree) for r in df.itertuples()}
    assert got == {n: (tri[n], deg[n]) for n in nodes}
    # per-node totals are 3x the global count (each triangle has 3 corners)
    assert df["triangles"].sum() == 3 * _brute(edges)
