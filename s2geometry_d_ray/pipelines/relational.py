"""Relational query family over the TPC-H-ish sf_dir tables — demonstrates
the engine's general dataflow operators (filter/project/join/groupby/
window/top-k/distinct) with DuckDB-checkable oracles.

Scale discipline (ray_guide 'Aggregation at scale'):
  - reads prune columns at the source,
  - grouped aggregates are PRE-AGGREGATED inside map_batches (one row per
    key per block) before the tiny final combine,
  - dimension joins broadcast the small side (pandas merge per batch),
  - float aggregates are ROUND()ed identically on both sides.
At 100 TB the small-side broadcasts (customer at high SF) flip to the
shuffle-join pattern in pipelines/spatial_join.py:shuffle_join."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _read(sf_dir, table, columns):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _final_combine(partials_df, keys, sums=(), counts=()):
    """Driver-side combine of per-block partial aggregates (tiny input)."""
    agg = {c: "sum" for c in list(sums) + list(counts)}
    out = partials_df.groupby(list(keys), as_index=False).agg(agg)
    return out.sort_values(list(keys)).reset_index(drop=True)


def _cents(x):
    """Exact integer cents: per-row round-half-away, integer sums after.
    Summing BIGINT cents makes money aggregates bit-identical between the
    Ray pipeline and the DuckDB oracle regardless of addition order."""
    return np.floor(np.asarray(x, dtype=np.float64) * 100.0
                    + 0.5).astype(np.int64)


def q1_pricing_summary(sf_dir):
    """TPC-H Q1 shape: lineitem pricing summary by returnflag/linestatus."""
    cutoff = np.datetime64("1998-09-02")

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["l_shipdate"].to_numpy() <= cutoff]
        if df.empty:
            return pd.DataFrame({
                "l_returnflag": pd.Series([], dtype="str"),
                "l_linestatus": pd.Series([], dtype="str"),
                "sum_qty": pd.Series([], dtype="float64"),
                "sum_base_cents": pd.Series([], dtype="int64"),
                "sum_disc_cents": pd.Series([], dtype="int64"),
                "count_order": pd.Series([], dtype="int64")})
        df["base_cents"] = _cents(df["l_extendedprice"])
        df["disc_cents"] = _cents(df["l_extendedprice"]
                                  * (1 - df["l_discount"]))
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_cents=("base_cents", "sum"),
            sum_disc_cents=("disc_cents", "sum"),
            count_order=("l_orderkey", "size"))
        return g

    parts = _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_quantity", "l_extendedprice",
                   "l_discount", "l_returnflag", "l_linestatus",
                   "l_shipdate"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536).to_pandas()
    out = _final_combine(parts, ["l_returnflag", "l_linestatus"],
                         sums=["sum_qty", "sum_base_cents",
                               "sum_disc_cents"],
                         counts=["count_order"])
    out["sum_qty"] = out["sum_qty"].astype("int64")
    return out


def q3_top_orders(sf_dir):
    """Q3 shape: top-10 BUILDING-segment orders by open revenue.

    customer filter -> broadcast key set -> orders filter -> broadcast
    order-key set -> lineitem partial revenue -> tiny top-k."""
    cutoff = np.datetime64("1995-03-15")
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_mktsegment"]).to_pandas()
    ckeys = set(cust.loc[cust["c_mktsegment"] == "BUILDING",
                         "c_custkey"].tolist())
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]).to_pandas()
    okeys = set(orders.loc[
        orders["o_custkey"].isin(ckeys)
        & (orders["o_orderdate"].to_numpy() < cutoff),
        "o_orderkey"].tolist())

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[(df["l_shipdate"].to_numpy() > cutoff)
                & df["l_orderkey"].isin(okeys)]
        if df.empty:
            return pd.DataFrame({"l_orderkey": pd.Series([], dtype="int64"),
                                 "revenue_cents": pd.Series([],
                                                            dtype="int64")})
        df["revenue_cents"] = _cents(df["l_extendedprice"]
                                     * (1 - df["l_discount"]))
        return df.groupby("l_orderkey", as_index=False).agg(
            revenue_cents=("revenue_cents", "sum"))

    parts = _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_extendedprice", "l_discount",
                   "l_shipdate"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536).to_pandas()
    if parts.empty:
        return pd.DataFrame({"l_orderkey": pd.Series([], dtype="int64"),
                             "revenue_cents": pd.Series([], dtype="int64")})
    rev = parts.groupby("l_orderkey", as_index=False)["revenue_cents"].sum()
    rev = rev.sort_values(["revenue_cents", "l_orderkey"],
                          ascending=[False, True]).head(10)
    return rev.reset_index(drop=True)


def q5_nation_revenue(sf_dir):
    """Revenue per nation via customer->orders->lineitem joins (dimension
    sides broadcast)."""
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).to_pandas()
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).to_pandas()
    order_to_nation = orders.merge(
        cust, left_on="o_custkey", right_on="c_custkey").merge(
        nat, left_on="c_nationkey", right_on="n_nationkey")[
        ["o_orderkey", "n_name"]]
    lookup = dict(zip(order_to_nation["o_orderkey"],
                      order_to_nation["n_name"]))

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["n_name"] = df["l_orderkey"].map(lookup)
        df = df.dropna(subset=["n_name"])
        df["revenue_cents"] = _cents(df["l_extendedprice"]
                                     * (1 - df["l_discount"]))
        return df.groupby("n_name", as_index=False).agg(
            revenue_cents=("revenue_cents", "sum"),
            n_items=("l_orderkey", "size"))

    parts = _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_extendedprice",
                   "l_discount"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536).to_pandas()
    return _final_combine(parts, ["n_name"], sums=["revenue_cents"],
                          counts=["n_items"])


def part_brand_revenue(sf_dir):
    """part (small, broadcast) join lineitem -> revenue per brand."""
    part_df = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    brand = dict(zip(part_df["p_partkey"], part_df["p_brand"]))

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["p_brand"] = df["l_partkey"].map(brand)
        df = df.dropna(subset=["p_brand"])
        df["revenue_cents"] = _cents(df["l_extendedprice"]
                                     * (1 - df["l_discount"]))
        return df.groupby("p_brand", as_index=False).agg(
            revenue_cents=("revenue_cents", "sum"),
            n_items=("l_partkey", "size"))

    parts = _read(sf_dir, "lineitem",
                  ["l_partkey", "l_extendedprice",
                   "l_discount"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536).to_pandas()
    return _final_combine(parts, ["p_brand"], sums=["revenue_cents"],
                          counts=["n_items"])


def order_priority_counts(sf_dir):
    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return df.groupby("o_orderpriority", as_index=False).agg(
            n_orders=("o_orderkey", "size"))
    parts = _read(sf_dir, "orders",
                  ["o_orderkey", "o_orderpriority"]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    return _final_combine(parts, ["o_orderpriority"], counts=["n_orders"])


def events_hourly(sf_dir):
    """Streaming-shaped: tumbling 1h window counts + value sums."""
    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["hour"] = df["ts"].dt.floor("h")
        df["value_cents"] = _cents(df["value"])
        return df.groupby(["hour", "event_type"], as_index=False).agg(
            n_events=("event_id", "size"),
            total_value_cents=("value_cents", "sum"))
    parts = _read(sf_dir, "events",
                  ["event_id", "ts", "event_type", "value"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536).to_pandas()
    return _final_combine(parts, ["hour", "event_type"],
                          sums=["total_value_cents"], counts=["n_events"])


def events_user_stats(sf_dir):
    """Distinct users + totals per event type (set-union partials)."""
    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return df.groupby("event_type", as_index=False).agg(
            users=("user_id", lambda s: sorted(set(s))),  # list: Arrow-safe
            n_events=("event_id", "size"))
    parts = _read(sf_dir, "events",
                  ["event_id", "user_id", "event_type"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536).to_pandas()
    out = parts.groupby("event_type", as_index=False).agg(
        users=("users", lambda col: set().union(*[set(u) for u in col])),
        n_events=("n_events", "sum"))
    out["n_users"] = out["users"].map(len)
    return out[["event_type", "n_users", "n_events"]] \
        .sort_values("event_type").reset_index(drop=True)


def events_sessions(sf_dir):
    """Sessionization: per-user session count with 30-minute gap rule.
    groupby(user).map_groups over ts-sorted groups (the documented
    partitioning assumption: one group = one user's full history)."""
    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gaps = g["ts"].diff() > pd.Timedelta(minutes=30)
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "n_sessions": [int(gaps.sum()) + 1]})
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    out = ds.groupby("user_id").map_groups(
        sessions, batch_format="pandas").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_nation_revenue": q5_nation_revenue,
    "part_brand_revenue": part_brand_revenue,
    "order_priority_counts": order_priority_counts,
    "events_hourly": events_hourly,
    "events_user_stats": events_user_stats,
    "events_sessions": events_sessions,
}

ORACLE = {
    "q1_pricing_summary": (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, "
        "SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) "
        "AS sum_base_cents, "
        "SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
        "AS BIGINT)) AS sum_disc_cents, COUNT(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus"),
    "q3_top_orders": (
        "SELECT l_orderkey, "
        "SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
        "AS BIGINT)) AS revenue_cents "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < TIMESTAMP '1995-03-15' "
        "AND l_shipdate > TIMESTAMP '1995-03-15' "
        "GROUP BY l_orderkey "
        "ORDER BY revenue_cents DESC, l_orderkey LIMIT 10"),
    "q5_nation_revenue": (
        "SELECT n_name, "
        "SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
        "AS BIGINT)) AS revenue_cents, COUNT(*) AS n_items "
        "FROM nation JOIN customer ON c_nationkey = n_nationkey "
        "JOIN orders ON o_custkey = c_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey GROUP BY n_name"),
    "part_brand_revenue": (
        "SELECT p_brand, "
        "SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
        "AS BIGINT)) AS revenue_cents, COUNT(*) AS n_items FROM part "
        "JOIN lineitem ON l_partkey = p_partkey GROUP BY p_brand"),
    "order_priority_counts": (
        "SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders "
        "GROUP BY o_orderpriority"),
    "events_hourly": (
        "SELECT date_trunc('hour', ts) AS hour, event_type, "
        "COUNT(*) AS n_events, "
        "SUM(CAST(ROUND(value * 100) AS BIGINT)) AS total_value_cents "
        "FROM events GROUP BY hour, event_type"),
    "events_user_stats": (
        "SELECT event_type, COUNT(DISTINCT user_id) AS n_users, "
        "COUNT(*) AS n_events FROM events GROUP BY event_type"),
    "events_sessions": (
        "WITH w AS (SELECT user_id, CASE WHEN ts - lag(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) > "
        "INTERVAL 30 MINUTE OR lag(ts) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END AS new_session "
        "FROM events) "
        "SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions "
        "FROM w GROUP BY user_id"),
}
