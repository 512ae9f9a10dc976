"""Temporal / windowed operators over the events table — custom
operators Ray Data lacks natively (SURVEY §2.9 notes the reference has
no streaming concepts; these are the batch-mode equivalents a
training-data pipeline needs, composed from hash-bucket routing +
vectorized per-bucket kernels per the custom-operator guidance):

- gap-based SESSIONIZATION: a >30min gap (or a user change) opens a
  new session — session ids are one vectorized cumsum over the
  (user, ts)-sorted bucket, aggregated with a single C-level groupby;
- AS-OF JOIN: each error event matched to the most recent prior-or-
  equal click of the same user — ONE ``pandas.merge_asof(by=user)``
  per bucket (the per-user partitioning runs inside pandas' C code);
- SLIDING COUNT: per-user one-hour RANGE window via a composite-key
  searchsorted (each user's timestamps offset into a disjoint integer
  segment, so one global binary search respects user boundaries);
- JSON property aggregate: vectorized regex field extraction from the
  ``props`` JSON column (M18-at-scale: no per-row json.loads).

All three user-partitioned operators route users into hash buckets
and run one vectorized kernel per bucket:
``groupby(user).map_groups`` would pay one Python call per user —
O(users) interpreter crossings at corpus scale — while bucketing pays
one per bucket (stages/dedup bucketing rationale). A hot user still
lands in one bucket, but a bucket holds many users and all kernels are
linear in bucket rows. These buckets hold RAW event rows (unlike the
combiner-reduced aggregates in dedup_ops/textops), so the bucket
count is DERIVED from the input row count against a per-bucket row
budget (round-4 VERDICT: a fixed 64 capped parallelism at 64 tasks
and put 1/64 of the corpus in one pandas task's heap at 100x —
per-task OOM). The budget keeps each bucket's kernel input at a few
hundred MB of pandas regardless of corpus size; the floor is the
cluster-CPU-derived exchange width so small inputs still parallelize.

All rounding is half-away-from-zero (DuckDB ``round()`` semantics);
numpy's ``np.round`` is half-to-even and silently diverges on .5
boundaries, so it must never be used here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data
from kg_covid_19_ray.functions.arrow_meta import read_parquet_clean

SESSION_GAP_MIN = 30


def _round_half_away(arr: np.ndarray, ndigits: int) -> np.ndarray:
    scale = 10.0 ** ndigits
    return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale


# per-bucket row budget for raw-event-row exchanges: ~2M narrow event
# rows is a few hundred MB as a pandas kernel input — small enough for
# a worker heap, large enough that the kernel stays vectorization-
# dominated. Env-overridable for tests/experiments.
_ROWS_PER_BUCKET = 2_000_000


def _derive_buckets(n_rows: int | None) -> int:
    """Bucket count for a raw-row exchange: enough buckets that no
    single kernel task holds more than ``_ROWS_PER_BUCKET`` rows
    (expected, under hash balance), floored at the cluster-CPU-derived
    exchange width. Kernels are per-user-correct at ANY bucket count,
    so this only moves the parallelism/memory trade."""
    import os

    from kg_covid_19_ray.functions.partitions import derive_num_partitions
    budget = int(os.environ.get("KG_RAY_WINDOW_ROWS_PER_BUCKET",
                                str(_ROWS_PER_BUCKET)))
    base = derive_num_partitions()
    if not n_rows:
        return base
    return max(base, (n_rows + budget - 1) // budget)


def _parquet_rows(path: str) -> int:
    """Row count from parquet FOOTER metadata only — no data read."""
    import pyarrow.dataset as pads
    return pads.dataset(path).count_rows()


def _by_user_buckets(ds: ray.data.Dataset, kernel,
                     num_buckets: int) -> ray.data.Dataset:
    """Route rows by hash(user_id) % num_buckets and run ``kernel``
    once per bucket (vectorized over all of the bucket's users)."""

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch["user_id"],
                                       index=False).to_numpy()
        batch = batch.copy()
        batch["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int64)
        return batch

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return kernel(g.drop(columns="__bucket"))

    return ds.map_batches(add_bucket, batch_format="pandas") \
             .groupby("__bucket").map_groups(run, batch_format="pandas")


def _read_events(sf_dir: str, cols: list[str]) -> ray.data.Dataset:
    return read_parquet_clean(f"{sf_dir}/events.parquet", columns=cols)


def _event_buckets(sf_dir: str) -> int:
    return _derive_buckets(_parquet_rows(f"{sf_dir}/events.parquet"))


def sessions(sf_dir: str) -> ray.data.Dataset:
    """Per-user gap sessions: (user_id, session_idx, n_events,
    duration_sec, sum_value). One vectorized kernel per user-bucket —
    session boundaries are a cumsum over (user change | gap), the
    aggregate one C-level groupby."""
    ds = _read_events(sf_dir, ["ts", "user_id", "value"])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = g["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)
        sid = (new_user | gap).cumsum()
        agg = g.groupby(sid, sort=False).agg(
            user_id=("user_id", "first"),
            start=("ts", "min"), end=("ts", "max"),
            n_events=("ts", "size"), sum_value=("value", "sum"))
        dur = (agg["end"] - agg["start"]).dt.total_seconds()
        # per-user session index: sessions arrive user-grouped in sid
        # order, so cumcount within user is the per-user rank
        session_idx = agg.groupby("user_id", sort=False).cumcount()
        return pd.DataFrame({
            "user_id": agg["user_id"].to_numpy(),
            "session_idx": session_idx.to_numpy(dtype=np.int64),
            "n_events": agg["n_events"].to_numpy(dtype=np.int64),
            "duration_sec": _round_half_away(dur.to_numpy(), 6),
            "sum_value": _round_half_away(agg["sum_value"].to_numpy(), 6),
        })

    return _by_user_buckets(ds, kernel, _event_buckets(sf_dir))


SESSIONS_SQL = f"""
WITH o AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
    SELECT user_id, ts, value,
           -- CAST: DuckDB's windowed sum() is HUGEINT, which lands in
           -- pandas as float64 and hash-mismatches the int64 Ray column
           CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
               AS session_idx
    FROM o
)
SELECT user_id, session_idx,
       count(*) AS n_events,
       round(epoch(max(ts) - min(ts)), 6) AS duration_sec,
       round(sum(value), 6) AS sum_value
FROM s GROUP BY user_id, session_idx
"""


def asof_error_click(sf_dir: str) -> ray.data.Dataset:
    """As-of join: each error event paired with the same user's most
    recent prior-or-equal click (event id + gap seconds; unmatched
    errors keep nulls)."""
    ds = _read_events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    ds = ds.filter(expr="event_type == 'error' or event_type == 'click'")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        # merge_asof(by=user_id) does the per-user partitioning in C;
        # both sides need only a global ts sort
        g = g.sort_values("ts", kind="mergesort")
        errors = g[g["event_type"] == "error"]
        clicks = g[g["event_type"] == "click"]
        if errors.empty:
            return pd.DataFrame({
                "error_event_id": pd.Series([], dtype=np.int64),
                "user_id": pd.Series([], dtype=np.int64),
                "click_event_id": pd.Series([], dtype=np.float64),
                "gap_sec": pd.Series([], dtype=np.float64)})
        m = pd.merge_asof(
            errors[["event_id", "ts", "user_id"]],
            clicks[["event_id", "ts", "user_id"]].rename(
                columns={"event_id": "click_event_id", "ts": "click_ts"}),
            left_on="ts", right_on="click_ts", by="user_id",
            direction="backward")
        gap = (m["ts"] - m["click_ts"]).dt.total_seconds()
        return pd.DataFrame({
            "error_event_id": m["event_id"].to_numpy(dtype=np.int64),
            "user_id": m["user_id"].to_numpy(dtype=np.int64),
            # float64 with NaN for unmatched, matching how an SQL engine's
            # nullable-int result lands in pandas (avoids Int64-vs-float
            # hash divergence in the driver compare)
            "click_event_id": m["click_event_id"].astype(np.float64),
            "gap_sec": _round_half_away(gap.to_numpy(), 6),
        })

    return _by_user_buckets(ds, kernel, _event_buckets(sf_dir))


ASOF_ERROR_CLICK_SQL = """
SELECT e.event_id AS error_event_id,
       e.user_id,
       c.event_id AS click_event_id,
       round(epoch(e.ts - c.ts), 6) AS gap_sec
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts >= c.ts
"""


def props_avg(sf_dir: str) -> ray.data.Dataset:
    """Average of the JSON ``props.k`` field per event_type —
    vectorized regex extraction, partial (sum, count) combiner."""
    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["event_type", "props"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch["props"].str.extract(r'"k": (\d+)', expand=False) \
            .astype(np.float64)
        g = pd.DataFrame({"event_type": batch["event_type"], "k": k}) \
            .groupby("event_type", sort=False)["k"].agg(["sum", "count"])
        return g.reset_index().rename(columns={"sum": "k_sum",
                                               "count": "n"})

    totals = ds.map_batches(partial, batch_format="pandas") \
               .groupby("event_type").aggregate(
                   Sum("k_sum", alias_name="k_sum"),
                   Sum("n", alias_name="n"))

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": batch["event_type"],
            "avg_k": _round_half_away(
                (batch["k_sum"] / batch["n"]).to_numpy(), 6),
            "n": batch["n"].astype(np.int64),
        })

    return totals.map_batches(finalize, batch_format="pandas")


PROPS_AVG_SQL = """
SELECT event_type,
       round(avg(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS DOUBLE)), 6)
           AS avg_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


def sliding_count(sf_dir: str) -> ray.data.Dataset:
    """Sliding-window aggregate: for every event, the number of events
    by the same user in the preceding hour (inclusive). Per-user
    two-pointer sweep over the time-sorted group — O(n) per user, the
    batch-mode sliding window."""
    ds = _read_events(sf_dir, ["event_id", "ts", "user_id"])

    HOUR_US = 3_600_000_000  # microseconds

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        # composite-key trick: offset each user's timestamps into a
        # disjoint integer segment wider than (time span + window), so
        # ONE global searchsorted never crosses a user boundary.
        # Microsecond resolution (timestamps are parquet us) keeps
        # user_rank x segment_width far from int64 overflow.
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ts_us -= ts_us.min()
        user_rank = pd.factorize(g["user_id"], sort=False)[0]
        seg = ts_us.max() + 2 * HOUR_US + 1
        key = ts_us + user_rank * seg
        lo = np.searchsorted(key, key - HOUR_US, side="left")
        # RANGE frame: peer rows (identical ts) all count for each other,
        # so the upper bound is searchsorted side='right', not row index.
        hi = np.searchsorted(key, key, side="right")
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "user_id": g["user_id"].to_numpy(),
            "n_last_hour": (hi - lo).astype(np.int64),
        })

    return _by_user_buckets(ds, kernel, _event_buckets(sf_dir))


SLIDING_COUNT_SQL = """
SELECT event_id, user_id,
       count(*) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                            AND CURRENT ROW) AS n_last_hour
FROM events
"""

TOP_ORDERS_PER_CUST = 2


def top_orders_per_cust(sf_dir: str) -> ray.data.Dataset:
    """Per-group top-k (window-function rank analog): each customer's
    TOP_ORDERS_PER_CUST highest-value orders. Per-batch partial top-k
    per key (union-safe under the (price desc, orderkey asc) total
    order), final exact reduce."""
    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True], kind="mergesort") \
            .groupby("o_custkey", sort=False).head(TOP_ORDERS_PER_CUST)

    # the kernel is already multi-customer vectorized, so the final
    # reduce routes customers into hash buckets (one Python call per
    # bucket) instead of groupby(custkey).map_groups (one per customer).
    # The reduce input is combiner-bounded (<= TOP_ORDERS_PER_CUST per
    # customer per batch) but still grows with customers, so the bucket
    # count derives from the order count (a safe upper bound).
    pre = ds.map_batches(partial, batch_format="pandas")
    num_buckets = _derive_buckets(_parquet_rows(f"{sf_dir}/orders.parquet"))

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch["o_custkey"],
                                       index=False).to_numpy()
        batch = batch.copy()
        batch["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int64)
        return batch

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return partial(g.drop(columns="__bucket"))

    return pre.map_batches(add_bucket, batch_format="pandas") \
              .groupby("__bucket") \
              .map_groups(reduce_bucket, batch_format="pandas")


TOP_ORDERS_PER_CUST_SQL = f"""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey)
        <= {TOP_ORDERS_PER_CUST}
"""


# value-bucket ranges for the range join: [lo, hi) with a label.
# Deterministic constants; the small side of a range join is broadcast
# (searchsorted per batch), never shuffled.
VALUE_BUCKETS: list[tuple[float, float, str]] = [
    (0.0, 5.0, "low"),
    (5.0, 20.0, "mid"),
    (20.0, 100.0, "high"),
    (100.0, float("inf"), "extreme"),
]


def range_join_buckets(sf_dir: str) -> ray.data.Dataset:
    """Range join (custom operator Ray Data lacks): each event joined
    to the [lo, hi) bucket containing its value, aggregated to
    (event_type, bucket) counts + value sums. The bucket table is
    broadcast; assignment is one vectorized searchsorted per batch —
    no shuffle until the tiny final groupby."""
    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["event_type", "value"])
    los = np.array([b[0] for b in VALUE_BUCKETS])
    labels = np.array([b[2] for b in VALUE_BUCKETS])

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        idx = np.searchsorted(los, batch["value"].to_numpy(),
                              side="right") - 1
        idx = np.clip(idx, 0, len(labels) - 1)
        out = pd.DataFrame({"event_type": batch["event_type"],
                            "bucket": labels[idx],
                            "value": batch["value"]})
        g = out.groupby(["event_type", "bucket"], sort=False) \
               .agg(n=("value", "size"), value_sum=("value", "sum"))
        return g.reset_index()

    totals = ds.map_batches(assign, batch_format="pandas") \
               .groupby(["event_type", "bucket"]).aggregate(
                   Sum("n", alias_name="n"),
                   Sum("value_sum", alias_name="value_sum"))

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["n"] = batch["n"].astype(np.int64)
        batch["value_sum"] = _round_half_away(
            batch["value_sum"].to_numpy(), 2)
        return batch[["event_type", "bucket", "n", "value_sum"]]

    return totals.map_batches(finalize, batch_format="pandas")


_BUCKET_ROWS = ", ".join(
    f"({lo}, {'1e308' if hi == float('inf') else hi}, '{lab}')"
    for lo, hi, lab in VALUE_BUCKETS)

RANGE_JOIN_BUCKETS_SQL = f"""
WITH buckets(lo, hi, bucket) AS (VALUES {_BUCKET_ROWS})
SELECT event_type, bucket, count(*) AS n,
       round(sum(value), 2) AS value_sum
FROM events JOIN buckets
  ON events.value >= buckets.lo AND events.value < buckets.hi
GROUP BY event_type, bucket
"""


REGISTRY = {
    "rel_sessions": (sessions, SESSIONS_SQL),
    "rel_range_join": (range_join_buckets, RANGE_JOIN_BUCKETS_SQL),
    "rel_asof_error_click": (asof_error_click, ASOF_ERROR_CLICK_SQL),
    "rel_props_avg": (props_avg, PROPS_AVG_SQL),
    "rel_sliding_count": (sliding_count, SLIDING_COUNT_SQL),
    "rel_top_orders_per_cust": (top_orders_per_cust,
                                TOP_ORDERS_PER_CUST_SQL),
}
