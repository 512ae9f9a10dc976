"""Driver-emulating oracle harness: run a Ray query and its DuckDB SQL
side by side on the same parquet tables and compare (row count, schema,
order-insensitive values) — the same contract the graft driver applies
at sf0.01 (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def compare_query(name: str, fn, sql: str | None, sf_dir: str,
                  con=None) -> dict:
    """Returns {name, rows, match, detail}. match is None for rows-only."""
    ray_df = to_pandas(fn(sf_dir))
    out = {"name": name, "rows": len(ray_df), "match": None, "detail": ""}
    if sql is None:
        return out
    own_con = con is None
    if own_con:
        con = duck_connection(sf_dir)
    try:
        sql_df = con.sql(sql).df()
    finally:
        if own_con:
            con.close()
    a, b = normalize(ray_df), normalize(sql_df)
    if list(a.columns) != list(b.columns):
        out["match"] = False
        out["detail"] = f"schema mismatch: ray={list(a.columns)} sql={list(b.columns)}"
        return out
    if len(a) != len(b):
        out["match"] = False
        out["detail"] = f"row count mismatch: ray={len(a)} sql={len(b)}"
        return out
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      check_exact=False, rtol=1e-9, atol=1e-9)
        out["match"] = True
    except AssertionError as exc:
        out["match"] = False
        out["detail"] = str(exc)[:800]
    return out
