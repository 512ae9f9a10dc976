"""KMV distinct-count sketch (pipelines/sketches.py): exact fallback
below k, estimation accuracy above k, and partition-layout
determinism (the property the value-hash oracle relies on)."""

from __future__ import annotations

import pandas as pd
import ray.data

from kg_covid_19_ray.pipelines.sketches import kmv_distinct


def _run(values, k, rep=None):
    ds = ray.data.from_pandas(pd.DataFrame({"c": values}))
    if rep:
        ds = ds.repartition(rep)
    return kmv_distinct(ds, "c", k=k).to_pandas().iloc[0]


def test_exact_below_k(ray_session):
    vals = [f"v{i}" for i in range(40)] * 3  # 40 distinct, duplicated
    row = _run(vals, k=64)
    assert row["k_used"] == 40
    assert row["distinct_estimate"] == 40  # exact fallback


def test_estimate_accuracy_and_layout_independence(ray_session):
    n = 5000
    vals = [f"item-{i:06d}" for i in range(n)]
    a = _run(vals, k=256, rep=3)
    b = _run(vals * 2, k=256, rep=17)  # duplicates must not matter
    assert dict(a) == dict(b)  # bit-identical across layouts + dups
    # KMV std error ~ 1/sqrt(k) ≈ 6.25%; allow 4 sigma
    assert abs(a["distinct_estimate"] - n) / n < 0.25


def test_empty_input(ray_session):
    row = _run([], k=8)
    assert row["k_used"] == 0 and row["distinct_estimate"] == 0


def test_text_repetition_kernel(ray_session, tmp_path):
    # vectorized distinct-per-row run counting vs the obvious per-row
    # set() (degenerate cases: all-same tokens, single token, empties)
    import pyarrow as pa
    import pyarrow.parquet as pq
    from kg_covid_19_ray.pipelines.textops import text_repetition

    texts = ["a a a a", "x", "", "b c b c d", "  ", "q w e r t y q"]
    sf = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), f"{sf}/documents.parquet")
    got = text_repetition(sf).to_pandas().set_index("doc_id")
    for i, t in enumerate(texts):
        toks = t.split(" ")
        assert got.loc[i, "n_tokens"] == len(toks)
        assert got.loc[i, "n_distinct_tokens"] == len(set(toks))


def test_kmv_hashes_null_semantics():
    """Nulls drop out of the sketch (SQL md5(NULL) IS NULL) and must
    not collide with a literal 'None' string (round-3 ADVICE)."""
    import hashlib

    import numpy as np

    from kg_covid_19_ray.pipelines.sketches import _kmv_hashes

    with_null = _kmv_hashes(["a", None, "b", None], k=64)
    no_null = _kmv_hashes(["a", "b"], k=64)
    assert np.array_equal(with_null, no_null)

    # a literal 'None' string IS a value and hashes as itself
    lit = _kmv_hashes(["None", None], k=64)
    exp = int(hashlib.md5(b"None").hexdigest()[:15], 16)
    assert lit.tolist() == [exp]
