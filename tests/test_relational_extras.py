"""Grouped top-k and exact distributed quantiles: combiner soundness
under forced block splits, and the quantile_disc index rule."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_customer_top_orders_matches_brute(ray_session):
    import pyarrow.parquet as pq

    from s2geometry_d_ray.pipelines.relational import customer_top_orders
    got = customer_top_orders(SF, n_buckets=5)
    t = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_custkey", "o_totalprice"]) \
        .to_pandas()
    t = t.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                      ascending=[True, False, True])
    t["rank"] = t.groupby("o_custkey").cumcount() + 1
    want = t[t["rank"] <= 3][["o_custkey", "o_orderkey",
                              "o_totalprice", "rank"]] \
        .sort_values(["o_custkey", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"rank": "int64"}), want.astype({"rank": "int64"}))


def test_quantile_index_rule_edges(ray_session):
    # per-block histogram + ceil(q*n)-1 walk vs numpy on the real column
    import pyarrow.parquet as pq

    from s2geometry_d_ray.pipelines.relational import (_QUANTILES,
                                                       lineitem_quantiles)
    got = lineitem_quantiles(SF)
    v = np.sort(pq.read_table(f"{SF}/lineitem.parquet",
                              columns=["l_quantity"])
                ["l_quantity"].to_numpy(zero_copy_only=False))
    for q, val in zip(got["q"], got["value"]):
        idx = max(0, int(np.ceil(q * len(v))) - 1)
        assert val == v[idx]
    assert list(got["q"]) == list(_QUANTILES)


def test_anti_join_matches_brute(ray_session):
    import pyarrow.parquet as pq

    from s2geometry_d_ray.pipelines.relational import customers_without_orders
    got = customers_without_orders(SF, n_buckets=3)
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_name"]).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_custkey", "o_orderdate"]).to_pandas()
    in95 = orders[(orders["o_orderdate"] >= np.datetime64("1995-01-01"))
                  & (orders["o_orderdate"] < np.datetime64("1996-01-01"))]
    want = cust[~cust["c_custkey"].isin(in95["o_custkey"])] \
        .sort_values("c_custkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0


def test_running_total_bucket_invariance(ray_session):
    from s2geometry_d_ray.pipelines.relational import events_running_total
    a = events_running_total(SF, n_buckets=3)
    b = events_running_total(SF, n_buckets=64)
    pd.testing.assert_frame_equal(a, b)
    # prefix-scan sanity: last running value per user == user's total
    import pyarrow.parquet as pq
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "value"]).to_pandas()
    cents = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    want = pd.DataFrame({"user_id": ev["user_id"], "c": cents}) \
        .groupby("user_id")["c"].sum()
    got = a.groupby("user_id")["running_cents"].max()
    assert (got == want).all()


def test_pivot_row_sums_match_event_counts(ray_session):
    import pyarrow.parquet as pq

    from s2geometry_d_ray.pipelines.relational import (_PIVOT_TYPES,
                                                       events_type_pivot)
    got = events_type_pivot(SF)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    want_tot = ev.groupby("user_id").size()
    tot = got.set_index("user_id")[[f"n_{t}" for t in _PIVOT_TYPES]] \
        .sum(axis=1)
    assert (tot == want_tot).all()
    want_click = ev[ev["event_type"] == "click"].groupby("user_id").size() \
        .reindex(got["user_id"], fill_value=0)
    assert (got.set_index("user_id")["n_click"] == want_click).all()


def test_grouped_quantiles_match_numpy_walk(ray_session):
    import pyarrow.parquet as pq

    from s2geometry_d_ray.pipelines.relational import (_GROUP_QUANTILES,
                                                       events_type_quantiles)
    got = events_type_quantiles(SF)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    for (et, q), grp in got.groupby(["event_type", "q"]):
        v = np.sort(ev[ev["event_type"] == et]["value"].to_numpy())
        idx = max(0, int(np.ceil(q * len(v))) - 1)
        assert grp["value"].iloc[0] == v[idx]
    assert sorted(set(got["q"])) == sorted(_GROUP_QUANTILES)
