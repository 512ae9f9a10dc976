"""Integer fixed-point PageRank (stages/pagerank.py): exact agreement
with a serial reference recurrence, bit-identical results across
partition counts (the property that justifies the value-hash oracle),
and duplicate-edge handling."""

from __future__ import annotations

import pandas as pd
import ray.data

from kg_covid_19_ray.stages.pagerank import (
    DAMP_DEN,
    DAMP_NUM,
    pagerank_fixed_point,
)

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("d", "a"), ("e", "e"),  # self-loop + dangling-free mix
    ("f", "c"),  # f is dangling-source only; c is the hub
]


def _serial_pagerank(edges, iterations, scale=1_000_000):
    nodes = sorted({x for e in edges for x in e})
    out: dict = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    teleport = (scale * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    r = {n: scale for n in nodes}
    for _ in range(iterations):
        sums = {n: 0 for n in nodes}
        for s, d in edges:
            sums[d] += r[s] // out[s]
        r = {n: teleport + (DAMP_NUM * sums[n]) // DAMP_DEN for n in nodes}
    return r


def _run(edges, **kw) -> dict:
    ds = ray.data.from_items([{"subject": s, "object": o}
                              for s, o in edges])
    res = pagerank_fixed_point(ds, **kw).to_pandas()
    return dict(zip(res["id"], res["rank_fp"]))


def test_matches_serial_recurrence(ray_session):
    # plan="dataset" pinned: the default routes to the actor plan
    # (covered by test_actor_plan_*); these tests keep the Dataset-plan
    # kernels under coverage
    got = _run(EDGES, iterations=3, plan="dataset")
    want = _serial_pagerank(EDGES, 3)
    assert got == want
    # the hub actually accumulates authority
    assert got["c"] == max(got.values())


def test_bit_identical_across_partitionings(ray_session):
    a = _run(EDGES, iterations=4, num_partitions=2, plan="dataset")
    b = _run(EDGES, iterations=4, num_partitions=13, plan="dataset")
    assert a == b


def test_duplicate_edges_are_deduped(ray_session):
    got = _run(EDGES + EDGES, iterations=2, plan="dataset")
    want = _serial_pagerank(EDGES, 2)
    assert got == want


def test_actor_plan_bit_identical(ray_session):
    """The bucket-pinned actor plan (stages/pagerank_actors.py) is
    bit-identical to the Dataset plan AND the serial recurrence —
    integer associativity makes the result partitioning-independent,
    so the driver's kg_pagerank value-hash oracle holds under either
    KG_RAY_PR_PLAN setting."""
    got = _run(EDGES, iterations=3, plan="actor")
    assert got == _serial_pagerank(EDGES, 3)
    assert got == _run(EDGES, iterations=3, plan="dataset")


def test_actor_plan_dedups_and_single_bucket(ray_session):
    # duplicate edges dedup inside the bucket; B=1 exercises the
    # num_returns=1 tuple-unwrap path
    from kg_covid_19_ray.stages.pagerank_actors import pagerank_actor_plan
    ds = ray.data.from_items([{"subject": s, "object": o}
                              for s, o in EDGES + EDGES])
    res = pagerank_actor_plan(ds, iterations=2, num_actors=1).to_pandas()
    assert dict(zip(res["id"], res["rank_fp"])) == \
        _serial_pagerank(EDGES, 2)


def test_actor_plan_empty_graph(ray_session):
    from kg_covid_19_ray.stages.pagerank_actors import pagerank_actor_plan
    empty = ray.data.from_pandas(pd.DataFrame(
        {"subject": pd.Series([], dtype=object),
         "object": pd.Series([], dtype=object)}))
    assert pagerank_actor_plan(empty, num_actors=2).count() == 0


def test_empty_graphs_are_graceful(ray_session):
    # all four graph analytics return well-formed empty/zero results
    # on an empty edge table rather than crashing on schema-less blocks
    import pandas as pd
    from kg_covid_19_ray.stages.kcore import kcore_nodes
    from kg_covid_19_ray.stages.triangles import (
        count_triangles, node_triangle_counts)

    empty = ray.data.from_pandas(pd.DataFrame(
        {"subject": pd.Series([], dtype=object),
         "object": pd.Series([], dtype=object)}))
    assert pagerank_fixed_point(empty).count() == 0
    t = count_triangles(empty).to_pandas()
    assert t["n_triangles"].tolist() == [0]
    assert node_triangle_counts(empty).count() == 0
    assert kcore_nodes(empty, k=2, rounds=2).count() == 0
