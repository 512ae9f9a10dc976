"""Windowed-operator bucket-count scaling (round-4 VERDICT item 2).

The user-bucket exchanges route RAW event rows, so the bucket count
must grow with the input instead of pinning a constant 64 (which caps
parallelism and puts 1/64 of the corpus in one pandas task at 100x).
These tests pin (a) the derivation math and (b) that the kernels are
value-identical at any bucket count — compared against the DuckDB
oracle, the same contract the driver applies.
"""

from __future__ import annotations

import pandas as pd

from kg_covid_19_ray.pipelines import windowed

SF = "/root/testdata/sf0.001"


def test_derive_buckets_scales_with_rows(ray_session, monkeypatch):
    monkeypatch.setenv("KG_RAY_WINDOW_ROWS_PER_BUCKET", "1000")
    monkeypatch.setenv("KG_RAY_NUM_PARTITIONS", "8")
    assert windowed._derive_buckets(None) == 8        # floor: exchange width
    assert windowed._derive_buckets(100) == 8         # small input -> floor
    assert windowed._derive_buckets(8_000) == 8       # exactly at budget
    assert windowed._derive_buckets(64_000) == 64     # grows with rows
    assert windowed._derive_buckets(1_000_000) == 1000  # no fixed cap


def test_windowed_results_invariant_under_bucket_count(
        ray_session, monkeypatch):
    """Forcing ~1 row per bucket (the most fragmented routing possible)
    must not change any windowed result vs the DuckDB oracle."""
    from tests.oracle_harness import compare_query, duck_connection

    con = duck_connection(SF)
    monkeypatch.setenv("KG_RAY_WINDOW_ROWS_PER_BUCKET", "7")
    try:
        for name in ("rel_sessions", "rel_asof_error_click",
                     "rel_sliding_count", "rel_top_orders_per_cust"):
            fn, sql = windowed.REGISTRY[name]
            r = compare_query(name, fn, sql, SF, con)
            assert r["match"] is True, (name, r["detail"])
    finally:
        con.close()


def test_parquet_rows_is_metadata_only(tmp_path):
    pd.DataFrame({"a": range(123)}).to_parquet(tmp_path / "t.parquet")
    assert windowed._parquet_rows(str(tmp_path / "t.parquet")) == 123


def test_eventgen_replication_invariants(ray_session, tmp_path):
    """sources/eventgen expands the event stream with DISJOINT user
    populations per replica, so every per-user windowed result must
    scale exactly linearly — the ground truth the events_big bench
    entries rely on."""
    from kg_covid_19_ray.sources.eventgen import write_events_parquet

    out = str(tmp_path / "ev")
    n = write_events_parquet(SF, out, replicas=3)
    base_rows = windowed._parquet_rows(f"{SF}/events.parquet")
    assert n == 3 * base_rows
    assert windowed._parquet_rows(f"{out}/events.parquet") == n
    assert windowed.sessions(out).count() == 3 * windowed.sessions(SF).count()
    # event_ids stay globally unique across replicas
    import ray.data
    ds = ray.data.read_parquet(f"{out}/events.parquet",
                               columns=["event_id"])
    assert ds.unique("event_id") and len(ds.unique("event_id")) == n
