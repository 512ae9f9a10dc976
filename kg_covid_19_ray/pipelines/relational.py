"""Generic relational operators over the star-schema tables.

These exercise the engine's filter / project / broadcast-join /
pre-aggregated groupby / sort / limit machinery (SURVEY §2.2 M1-M4,
§2.4-§2.7) on the TPC-H-ish driver tables. Patterns:

- column pruning + row-group predicate pushdown at the read;
- per-batch PARTIAL aggregation (combiner) before the groupby shuffle,
  so the exchange carries one row per (key, block) instead of all rows;
- small dimension tables broadcast once via ``ray.put`` and resolved in
  actor-pool ``__init__`` (the reference's load-once lookup dicts,
  string_ppi.py:53-59) — never a shuffle join for a dimension.

Float determinism note: aggregate outputs are rounded (2 or 4 dp) on
both the Ray and oracle sides; summands are 2-dp currency values, so
rounding is stable against summation-order differences.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from kg_covid_19_ray.functions.arrow_meta import read_parquet_clean
from kg_covid_19_ray.functions.partitions import derive_join_partitions

_Q1_CUTOFF = _dt.datetime(1998, 9, 2)


def _round_col(col, ndigits: int) -> pa.Array:
    # DuckDB round() is half-away-from-zero; pyarrow defaults to
    # half-to-even — pin the mode so both engines agree on boundaries.
    return pc.round(col, ndigits=ndigits, round_mode="half_towards_infinity")


def pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H-Q1-style summary with a per-batch combiner."""
    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") <= pa.scalar(_Q1_CUTOFF)),
    )

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.less_equal(batch["l_shipdate"], pa.scalar(_Q1_CUTOFF)))
        disc_price = pc.multiply(batch["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        batch = batch.append_column("disc_price", disc_price)
        return batch.group_by(["l_returnflag", "l_linestatus"]).aggregate([
            ("l_quantity", "sum"), ("l_extendedprice", "sum"),
            ("disc_price", "sum"), ("l_quantity", "count"),
        ])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity_sum", alias_name="sum_qty"),
        Sum("l_extendedprice_sum", alias_name="sum_base_price"),
        Sum("disc_price_sum", alias_name="sum_disc_price"),
        Sum("l_quantity_count", alias_name="count_order"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        avg_qty = pc.divide(batch["sum_qty"],
                            pc.cast(batch["count_order"], pa.float64()))
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "sum_qty": _round_col(batch["sum_qty"], 2),
            "sum_base_price": _round_col(batch["sum_base_price"], 2),
            "sum_disc_price": _round_col(batch["sum_disc_price"], 2),
            "avg_qty": _round_col(avg_qty, 4),
            "count_order": batch["count_order"],
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_quantity) / count(*), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


class _NationEnricher:
    """Actor-pool stage: broadcast customer->nation dimension resolved
    ONCE per actor in __init__ (ST1-style lookup state) into a
    sorted-key array, so each batch is one searchsorted + one Arrow
    take (C-level gather, no per-row dict access)."""

    def __init__(self, cust_ref, nation_ref):
        import numpy as np
        cust = ray.get(cust_ref)  # dict custkey -> nationkey
        nation = ray.get(nation_ref)  # dict nationkey -> name
        keys = np.fromiter(cust.keys(), np.int64, len(cust))
        names = np.array([nation.get(v, "?") for v in cust.values()],
                         dtype=object)
        order = np.argsort(keys)
        self.keys = keys[order]
        self.names = pa.array(names[order], pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc
        k = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(self.keys, k)
        # clip + equality check: an FK violation becomes null, not a
        # neighboring customer's nation (or an out-of-range take error)
        pos = np.clip(pos, 0, len(self.keys) - 1)
        names = pc.take(self.names, pa.array(pos, pa.int64()))
        hit = self.keys[pos] == k
        if not hit.all():
            names = pc.if_else(pa.array(hit), names,
                               pa.scalar(None, pa.string()))
        return batch.append_column("n_name", names)


def top_nations(sf_dir: str) -> ray.data.Dataset:
    """Revenue per nation: orders ⨝ customer ⨝ nation as a broadcast
    lookup, pre-aggregated, top-10 by revenue."""
    import pyarrow.parquet as pq

    cust_t = pq.read_table(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    nation_t = pq.read_table(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    cust_ref = ray.put(dict(zip(cust_t["c_custkey"].to_pylist(),
                                cust_t["c_nationkey"].to_pylist())))
    nation_ref = ray.put(dict(zip(nation_t["n_nationkey"].to_pylist(),
                                  nation_t["n_name"].to_pylist())))

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])
    enriched = orders.map_batches(
        _NationEnricher, batch_format="pyarrow", batch_size=65536,
        concurrency=(1, 4), num_cpus=1,
        fn_constructor_args=(cust_ref, nation_ref))

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by("n_name").aggregate([
            ("o_totalprice", "sum"), ("o_totalprice", "count")])

    agg = enriched.map_batches(partial, batch_format="pyarrow") \
        .groupby("n_name").aggregate(
            Sum("o_totalprice_sum", alias_name="revenue"),
            Sum("o_totalprice_count", alias_name="n_orders"))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": batch["n_name"],
            "revenue": _round_col(batch["revenue"], 2),
            "n_orders": batch["n_orders"],
        })

    out = agg.map_batches(finalize, batch_format="pyarrow")
    return out.sort([("revenue"), ("n_name")], descending=[True, False]).limit(10)


TOP_NATIONS_SQL = """
SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
LIMIT 10
"""


def returned_topk(sf_dir: str) -> ray.data.Dataset:
    """Filter + computed column + deterministic top-k (M2/O3 analogs)."""
    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_returnflag",
                 "l_extendedprice", "l_discount"],
        filter=(pc.field("l_returnflag") == "R"),
    )

    def compute(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        rev = _round_col(pc.multiply(
            batch["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), batch["l_discount"])), 2)
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "l_linenumber": batch["l_linenumber"],
            "revenue": rev,
        })

    ds = ds.map_batches(compute, batch_format="pyarrow")
    return ds.sort([("revenue"), ("l_orderkey"), ("l_linenumber")],
                   descending=[True, False, False]).limit(20)


RETURNED_TOPK_SQL = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 2) AS revenue
FROM lineitem
WHERE l_returnflag = 'R'
ORDER BY revenue DESC, l_orderkey, l_linenumber
LIMIT 20
"""


def events_hourly(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1h window aggregate per user (streaming-shaped analog:
    event-time windows as groupby over truncated timestamps)."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch["ts"], unit="hour")
        batch = pa.table({"user_id": batch["user_id"], "window_start": win,
                          "value": batch["value"]})
        return batch.group_by(["user_id", "window_start"]).aggregate(
            [("value", "sum"), ("value", "count")])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["user_id", "window_start"]).aggregate(
            Sum("value_sum", alias_name="sum_value"),
            Sum("value_count", alias_name="n_events"))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "window_start": batch["window_start"],
            "sum_value": _round_col(batch["sum_value"], 4),
            "n_events": batch["n_events"],
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


EVENTS_HOURLY_SQL = """
SELECT user_id, date_trunc('hour', ts) AS window_start,
       round(sum(value), 4) AS sum_value, count(*) AS n_events
FROM events
GROUP BY user_id, date_trunc('hour', ts)
"""


def nation_year_revenue(sf_dir: str) -> ray.data.Dataset:
    """TPC-H-Q5-flavored multi-join: lineitem ⨝ orders as a NATIVE
    distributed hash join (both sides large at scale), then customer /
    nation resolved via broadcast dicts (small dimensions), revenue
    summed per (nation, order year).

    Join strategy mix is deliberate: big-big -> `Dataset.join`
    (partitioned hash exchange), big-small -> `ray.put` broadcast
    lookup inside `map_batches` — the two canonical shapes."""
    import pyarrow.parquet as pq

    line = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def line_rev(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({"l_orderkey": batch["l_orderkey"],
                         "revenue": rev})

    line = line.map_batches(line_rev, batch_format="pyarrow")

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def order_proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": batch["o_orderkey"],
            "o_custkey": batch["o_custkey"],
            "o_year": pc.year(batch["o_orderdate"]),
        })

    orders = orders.map_batches(order_proj, batch_format="pyarrow")
    joined = line.join(orders, join_type="inner", num_partitions=derive_join_partitions(),
                       on=("l_orderkey",))

    cust_t = pq.read_table(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    nation_t = pq.read_table(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    cust_ref = ray.put(dict(zip(cust_t["c_custkey"].to_pylist(),
                                cust_t["c_nationkey"].to_pylist())))
    nation_ref = ray.put(dict(zip(nation_t["n_nationkey"].to_pylist(),
                                  nation_t["n_name"].to_pylist())))

    enriched = joined.map_batches(
        _NationEnricher, batch_format="pyarrow", batch_size=65536,
        concurrency=(1, 4), num_cpus=1,
        fn_constructor_args=(cust_ref, nation_ref))

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["n_name", "o_year"]).aggregate(
            [("revenue", "sum"), ("revenue", "count")])

    agg = enriched.map_batches(partial, batch_format="pyarrow") \
        .groupby(["n_name", "o_year"]).aggregate(
            Sum("revenue_sum", alias_name="revenue"),
            Sum("revenue_count", alias_name="n_lineitems"))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": batch["n_name"],
            "o_year": pc.cast(batch["o_year"], pa.int64()),
            "revenue": _round_col(batch["revenue"], 2),
            "n_lineitems": batch["n_lineitems"],
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


NATION_YEAR_REVENUE_SQL = """
SELECT n_name,
       year(o_orderdate) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name, o_year
"""


def _lookup_ref(keys, values):
    """Broadcastable (sorted int64 keys, aligned string values) pair
    for _KeyLookup — built once driver-side from small dimensions."""
    import numpy as np
    k = np.asarray(keys, dtype=np.int64)
    order = np.argsort(k)
    vals = np.asarray(list(values), dtype=object)[order]
    return ray.put((k[order], vals))


class _KeyLookup:
    """Generic broadcast dimension resolver: one searchsorted + one
    Arrow take per batch (no per-row Python), key/output columns
    parameterized. FK violations resolve to null (not a neighboring
    key's value): searchsorted positions are clipped and checked for
    key equality, so a missing/out-of-range key surfaces
    deterministically downstream instead of silently mis-joining."""

    def __init__(self, ref, key_col: str, out_col: str):
        import numpy as np  # noqa: F401 (worker-side import)
        self.keys, vals = ray.get(ref)
        self.values = pa.array(list(vals), pa.string())
        self.key_col, self.out_col = key_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        k = batch[self.key_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(self.keys, k)
        pos = np.clip(pos, 0, len(self.keys) - 1)
        vals = pc.take(self.values, pa.array(pos, pa.int64()))
        hit = self.keys[pos] == k
        if not hit.all():
            vals = pc.if_else(pa.array(hit), vals,
                              pa.scalar(None, pa.string()))
        return batch.append_column(self.out_col, vals)


def region_revenue(sf_dir: str) -> ray.data.Dataset:
    """Revenue per REGION through the supplier side (TPC-H-Q5 flavor):
    the three small dimensions (supplier -> nation -> region) are
    FOLDED driver-side into one suppkey -> region-name lookup and
    broadcast once — a dimension chain never needs three joins when
    each link is broadcast-sized. Lineitem is scanned once with a
    per-batch combiner."""
    import pyarrow.parquet as pq

    supp_t = pq.read_table(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"])
    nation_t = pq.read_table(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_regionkey"])
    region_t = pq.read_table(f"{sf_dir}/region.parquet",
                             columns=["r_regionkey", "r_name"])
    n2r = dict(zip(nation_t["n_nationkey"].to_pylist(),
                   nation_t["n_regionkey"].to_pylist()))
    r2n = dict(zip(region_t["r_regionkey"].to_pylist(),
                   region_t["r_name"].to_pylist()))
    ref = _lookup_ref(
        supp_t["s_suppkey"].to_pylist(),
        (r2n[n2r[sn]] for sn in supp_t["s_nationkey"].to_pylist()))

    line = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"])

    enriched = line.map_batches(
        _KeyLookup, batch_format="pyarrow", batch_size=65536,
        concurrency=(1, 4), num_cpus=1,
        fn_constructor_args=(ref, "l_suppkey", "r_name"))

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        t = pa.table({"r_name": batch["r_name"], "revenue": rev})
        return t.group_by("r_name").aggregate(
            [("revenue", "sum"), ("revenue", "count")])

    agg = enriched.map_batches(partial, batch_format="pyarrow") \
        .groupby("r_name").aggregate(
            Sum("revenue_sum", alias_name="revenue"),
            Sum("revenue_count", alias_name="n_lineitems"))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "r_name": batch["r_name"],
            "revenue": _round_col(batch["revenue"], 2),
            "n_lineitems": batch["n_lineitems"],
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


REGION_REVENUE_SQL = """
SELECT r_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def brand_margin(sf_dir: str) -> ray.data.Dataset:
    """Per-brand sales vs retail value: lineitem ⨝ part as a NATIVE
    distributed hash join (part is catalog-sized — a big-big join at
    web scale, unlike the broadcast dimension chains), then a small
    brand aggregate with a per-batch combiner."""
    line = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"])
    part = read_parquet_clean(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_retailprice"])

    def part_proj(batch: pa.Table) -> pa.Table:
        return pa.table({"l_partkey": batch["p_partkey"],
                         "p_brand": batch["p_brand"],
                         "p_retailprice": batch["p_retailprice"]})

    joined = line.join(
        part.map_batches(part_proj, batch_format="pyarrow"),
        join_type="inner", num_partitions=derive_join_partitions(),
        on=("l_partkey",))

    def _fixed4(col) -> pa.Array:
        # fixed-point (4 dp) int64: float sums are order-sensitive in
        # the last ulp, and a brand whose sum lands on a .005 rounding
        # boundary hash-diverged from the oracle; integer accumulation
        # is exact and order-insensitive on both engines
        return pc.cast(pc.round(pc.multiply(col, pa.scalar(10000.0)),
                                ndigits=0,
                                round_mode="half_towards_infinity"),
                       pa.int64())

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        retail = pc.multiply(pc.cast(batch["p_retailprice"], pa.float64()),
                             pc.cast(batch["l_quantity"], pa.float64()))
        t = pa.table({"p_brand": batch["p_brand"],
                      "revenue4": _fixed4(rev),
                      "retail4": _fixed4(retail),
                      "qty": pc.cast(batch["l_quantity"], pa.float64())})
        return t.group_by("p_brand").aggregate(
            [("revenue4", "sum"), ("retail4", "sum"), ("qty", "sum")])

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("p_brand").aggregate(
            Sum("revenue4_sum", alias_name="revenue4"),
            Sum("retail4_sum", alias_name="retail4"),
            Sum("qty_sum", alias_name="sum_qty"))

    def finalize(batch: pa.Table) -> pa.Table:
        def unscale(col) -> pa.Array:
            return _round_col(pc.divide(pc.cast(col, pa.float64()),
                                        pa.scalar(10000.0)), 2)
        return pa.table({
            "p_brand": batch["p_brand"],
            "sum_qty": _round_col(batch["sum_qty"], 2),
            "revenue": unscale(batch["revenue4"]),
            "retail_value": unscale(batch["retail4"]),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


BRAND_MARGIN_SQL = """
SELECT p_brand,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0)
                      AS BIGINT)) / 10000.0, 2) AS revenue,
       round(sum(CAST(round(p_retailprice * l_quantity * 10000, 0)
                      AS BIGINT)) / 10000.0, 2) AS retail_value
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""
