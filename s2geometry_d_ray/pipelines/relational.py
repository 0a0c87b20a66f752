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
from ray.data.aggregate import Sum as RaySum

# Per-worker-process cache for broadcast plasma objects used by
# task-based lookup stages (the stages/join.py _INDEX_CACHE pattern).
_BCAST_CACHE: dict = {}


def _read(sf_dir, table, columns):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _join_partitions(sf_dir):
    """Hash-join partition count sized to the fact table: ~128 MiB of
    (compressed) lineitem per join partition, clamped to [8, 512].
    At 100 TB this scales the shuffle fan-out with the data instead of
    hard-coding a single-node constant."""
    import os
    try:
        sz = os.path.getsize(f"{sf_dir}/lineitem.parquet")
    except OSError:
        sz = 0
    return max(8, min(512, sz // (128 << 20) + 8))


def _filter_lt(col, cutoff):
    """Vectorized Arrow predicate batch filter (col < cutoff)."""
    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.less(t[col], pa.scalar(cutoff)))
    return f


def _final_combine(partials_df, keys, sums=(), counts=()):
    """Driver-side combine of per-block partial aggregates (tiny input)."""
    agg = {c: "sum" for c in list(sums) + list(counts)}
    out = partials_df.groupby(list(keys), as_index=False).agg(agg)
    return out.sort_values(list(keys)).reset_index(drop=True)


def _cents(x):
    """Exact integer cents: per-row round-half-AWAY-FROM-ZERO (matching
    DuckDB ROUND for negative values too — floor(x+0.5) alone is
    half-up and diverges at -0.005), integer sums after.  Summing
    BIGINT cents makes money aggregates bit-identical between the Ray
    pipeline and the DuckDB oracle regardless of addition order."""
    v = np.asarray(x, dtype=np.float64) * 100.0
    return (np.copysign(np.floor(np.abs(v) + 0.5), v)).astype(np.int64)


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

    Fully distributed (no fact table ever touches the driver):
      orders SEMI-JOIN building-customers (shuffle hash join)
      lineitem per-block partial revenue  SEMI-JOIN filtered orders
      -> groupby(l_orderkey) shuffle sum -> sort desc -> limit 10.
    The only driver materialization is the 10-row result."""
    cutoff = np.datetime64("1995-03-15")
    nparts = _join_partitions(sf_dir)

    building = _read(sf_dir, "customer",
                     ["c_custkey", "c_mktsegment"]).filter(
        expr="c_mktsegment == 'BUILDING'").select_columns(["c_custkey"])
    open_orders = _read(sf_dir, "orders",
                        ["o_orderkey", "o_custkey", "o_orderdate"]
                        ).map_batches(
        _filter_lt("o_orderdate", pd.Timestamp("1995-03-15")),
        batch_format="pyarrow").select_columns(
        ["o_orderkey", "o_custkey"]).join(
        building, join_type="left_semi", num_partitions=nparts,
        on=("o_custkey",), right_on=("c_custkey",)).select_columns(
        ["o_orderkey"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df["l_shipdate"].to_numpy() > cutoff]
        if df.empty:
            return pd.DataFrame({"l_orderkey": pd.Series([], dtype="int64"),
                                 "revenue_cents": pd.Series([],
                                                            dtype="int64")})
        df["revenue_cents"] = _cents(df["l_extendedprice"]
                                     * (1 - df["l_discount"]))
        return df.groupby("l_orderkey", as_index=False).agg(
            revenue_cents=("revenue_cents", "sum"))

    rev = _read(sf_dir, "lineitem",
                ["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536).join(
        open_orders, join_type="left_semi", num_partitions=nparts,
        on=("l_orderkey",), right_on=("o_orderkey",)).groupby(
        "l_orderkey").aggregate(RaySum("revenue_cents",
                                       alias_name="revenue_cents"))
    out = rev.sort(["revenue_cents", "l_orderkey"],
                   descending=[True, False]).limit(10).to_pandas()
    if out.empty:
        return pd.DataFrame({"l_orderkey": pd.Series([], dtype="int64"),
                             "revenue_cents": pd.Series([], dtype="int64")})
    return out.reset_index(drop=True)


def q5_nation_revenue(sf_dir):
    """Revenue per nation via customer->orders->lineitem joins.

    Distributed plan (no fact table on the driver):
      customer -> (sorted custkey, nationkey) arrays BROADCAST once via
      ray.put (customer is 10x smaller than orders, 60x smaller than
      lineitem — the classic small-side broadcast; at extreme SF flip to
      a shuffle join);
      orders maps o_custkey -> nationkey per batch (vectorized
      searchsorted against the broadcast arrays);
      lineitem per-block partial (l_orderkey, revenue, n_items)
        JOIN orders-with-nation on l_orderkey = shuffle hash join;
      per-batch partial groupby(c_nationkey) -> 25-row driver combine.
    n_name attaches at the very end from the tiny nation table."""
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nparts = _join_partitions(sf_dir)

    cust_df = _read(sf_dir, "customer",
                    ["c_custkey", "c_nationkey"]).to_pandas() \
        .sort_values("c_custkey")
    from ..state.broadcast import broadcast, fetch
    cust_ref = broadcast((cust_df["c_custkey"].to_numpy(np.int64),
                          cust_df["c_nationkey"].to_numpy(np.int64)))

    def attach_nation(batch: pa.Table) -> pa.Table:
        """Broadcast-lookup stage as PLAIN TASKS with a per-worker
        fetch cache (the stages/join.py _INDEX_CACHE pattern): a fixed
        actor pool here sat UPSTREAM of the hash join, and on a small
        cluster (the 4-CPU test session) pool actors + join aggregator
        actors together oversubscribed the CPUs and deadlocked the
        pipeline.  Tasks reserve nothing, and the plasma get is
        zero-copy and cached per worker process, so the broadcast-once
        semantics are unchanged."""
        from ..state.broadcast import cache_get_or_build
        ckeys, cnat = cache_get_or_build(
            _BCAST_CACHE, cust_ref.hex(), lambda: fetch(cust_ref))
        ok = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ckeys, ok)
        pos = np.minimum(pos, len(ckeys) - 1)
        hit = ckeys[pos] == ok
        t = batch.filter(pa.array(hit))
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "c_nationkey": pa.array(cnat[pos[hit]], pa.int64())})

    orders_nat = _read(sf_dir, "orders",
                       ["o_orderkey", "o_custkey"]).map_batches(
        attach_nation, batch_format="pyarrow", batch_size=65536)

    def li_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["revenue_cents"] = _cents(df["l_extendedprice"]
                                     * (1 - df["l_discount"]))
        return df.groupby("l_orderkey", as_index=False).agg(
            revenue_cents=("revenue_cents", "sum"),
            n_items=("l_orderkey", "size"))

    joined = _read(sf_dir, "lineitem",
                   ["l_orderkey", "l_extendedprice",
                    "l_discount"]).map_batches(
        li_partial, batch_format="pyarrow", batch_size=65536).join(
        orders_nat, join_type="inner", num_partitions=nparts,
        on=("l_orderkey",), right_on=("o_orderkey",))

    def nat_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return df.groupby("c_nationkey", as_index=False).agg(
            revenue_cents=("revenue_cents", "sum"),
            n_items=("n_items", "sum"))

    parts = joined.map_batches(
        nat_partial, batch_format="pyarrow", batch_size=65536).to_pandas()
    out = _final_combine(parts, ["c_nationkey"],
                         sums=["revenue_cents", "n_items"])
    out = out.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    return out[["n_name", "revenue_cents", "n_items"]] \
        .sort_values("n_name").reset_index(drop=True)


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
    """Distinct users + totals per event type.

    Scale-safe distinct: per-block dedup of (event_type, user_id) with an
    event count, a shuffle groupby on the pair (each distinct pair emerges
    exactly once globally), then a per-batch partial count-distinct and a
    tiny driver combine (one row per event type). Unbounded user
    cardinality never flows to the driver."""
    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return df.groupby(["event_type", "user_id"], as_index=False).agg(
            n=("event_id", "size"))

    pairs = _read(sf_dir, "events",
                  ["event_id", "user_id", "event_type"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536).groupby(
        ["event_type", "user_id"]).aggregate(
        RaySum("n", alias_name="n"))

    def count_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return df.groupby("event_type", as_index=False).agg(
            n_users=("user_id", "size"), n_events=("n", "sum"))

    parts = pairs.map_batches(
        count_partial, batch_format="pyarrow",
        batch_size=65536).to_pandas()
    out = _final_combine(parts, ["event_type"],
                         sums=["n_users", "n_events"])
    return out[["event_type", "n_users", "n_events"]] \
        .sort_values("event_type").reset_index(drop=True)


def events_sessions(sf_dir, n_buckets=64):
    """Sessionization: per-user session count with 30-minute gap rule.

    Scale shape: users are hashed into n_buckets and the shuffle groups
    by BUCKET, not by user — one vectorized multi-user sessionizer call
    per bucket (sort by (user, ts, event_id), one diff, one segment
    count) instead of one Python call per user.  The per-user
    map_groups form was the #1 remaining scale-killer (VERDICT r2); the
    bucketed combine is the same pattern that gave tile_counts its
    170x.  Partitioning assumption: a bucket holds the FULL history of
    each of its users (guaranteed by the groupby shuffle)."""
    from ..stages.asof import add_hash_bucket

    def add_bucket(batch: pa.Table) -> pa.Table:
        # ONE shared bucketing (stages/asof.py) repo-wide so bucketed
        # stages colocate and a hash fix can't silently miss a copy.
        return add_hash_bucket(batch, "user_id", n_buckets)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        start = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            same_user = uid[1:] == uid[:-1]
            small_gap = (ts[1:] - ts[:-1]) <= np.timedelta64(30, "m")
            start[1:] = ~(same_user & small_gap)
        out = pd.DataFrame({"user_id": uid, "n_sessions": start})
        return out.groupby("user_id", as_index=False, sort=True).agg(
            n_sessions=("n_sessions", "sum"))

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    out = ds.map_batches(add_bucket, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("bucket").map_groups(sessions, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


# Query parameters shared with the ORACLE strings below — deriving both
# sides from one constant is the _FRAME_EVERY_N lesson (ADVICE r4):
# a literal re-hardcoded in the SQL silently diverges when the default
# changes.
_ASOF_LEFT = "view"
_ASOF_RIGHT = "purchase"
_TOPK_PER_CUSTOMER = 3


def events_asof(sf_dir, left_type=_ASOF_LEFT, right_type=_ASOF_RIGHT,
                n_buckets=64):
    """As-of join: each `left_type` event matched to the SAME user's most
    recent `right_type` event at or before it (equal-ts rights are
    visible; ties among equal-ts rights break by max event_id); inner
    semantics — unmatched lefts are dropped.

    Scale shape: hash-bucket users, ONE groupby(bucket) shuffle, one
    vectorized multi-user merge per bucket (stages/asof.py — lexsort +
    maximum.accumulate, no per-user loop, no driver hop).  Oracle: the
    deterministic LAST_VALUE ... IGNORE NULLS window replay in DuckDB."""
    import pyarrow.compute as pc

    from ..stages.asof import add_hash_bucket, most_recent_right_at_or_before

    def prep(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch["event_type"],
                     value_set=pa.array([left_type, right_type]))
        t = batch.filter(m)
        isl = pc.cast(pc.equal(t["event_type"], pa.scalar(left_type)),
                      pa.int8())
        t = t.drop_columns(["event_type"]).append_column("is_left", isl)
        return add_hash_bucket(t, "user_id", n_buckets)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        key = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]")
        seq = g["event_id"].to_numpy()
        isl = g["is_left"].to_numpy()
        val = g["value"].to_numpy()
        order, match = most_recent_right_at_or_before(key, ts, isl, seq)
        lm = (isl[order] == 1) & (match >= 0)
        li = order[lm]                 # original rows of matched lefts
        ri = order[match[lm]]          # original rows of their rights
        gap = (ts[li] - ts[ri]).astype("timedelta64[us]") \
            .astype(np.int64)
        return pd.DataFrame({
            "event_id": seq[li].astype(np.int64),
            "user_id": key[li].astype(np.int64),
            "matched_event_id": seq[ri].astype(np.int64),
            "matched_value": val[ri].astype(np.float64),
            "gap_us": gap})

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type", "value"])
    out = ds.map_batches(prep, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("bucket").map_groups(merge, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def orders_distinct_sketch(sf_dir):
    """HyperLogLog sketch of COUNT(DISTINCT o_custkey): per-block
    register partials (<= 256 rows out per block), one tiny
    groupby(register).max merge — the mergeable-sketch shape that
    distinct-counts a 100 TB key column while moving kilobytes.  The
    query returns the REGISTER STATE (integer-exact, md5_number_lower
    replayed in SQL); hll_estimate() turns it into the cardinality."""
    from ray.data.aggregate import Max

    from ..stages.hll import hll_partial_kernel

    out = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        hll_partial_kernel("o_custkey"), batch_format="pyarrow",
        zero_copy_batch=True).groupby("register").aggregate(
        Max("rho", alias_name="rho")).to_pandas()
    return out.sort_values("register").reset_index(drop=True)


def customers_without_orders(sf_dir, n_buckets=64):
    """Distributed ANTI-join: customers with no order in 1995.  Both
    sides are hash-bucketed on the key and unioned into ONE shuffle;
    each bucket keeps left keys absent from its right-key set
    (vectorized np.isin).  The right side is date-filtered at the scan
    and pre-distinct-ed per block (<= |keys| rows per block) so the
    shuffle carries key sets, not the fact table — at a larger right
    side this plan is unchanged, which is the point of bucketing over
    broadcasting.  Oracle: NOT EXISTS."""
    from ..stages.asof import add_hash_bucket

    lo = np.datetime64("1995-01-01")
    hi = np.datetime64("1996-01-01")

    def prep_left(batch: pa.Table) -> pa.Table:
        t = pa.table({"c_custkey": batch["c_custkey"],
                      "c_name": batch["c_name"]})
        return add_hash_bucket(t, "c_custkey", n_buckets)

    def prep_right(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        k = np.unique(ck[(d >= lo) & (d < hi)])
        t = pa.table({"c_custkey": pa.array(k, pa.int64()),
                      "c_name": pa.nulls(len(k), pa.string())})
        return add_hash_bucket(t, "c_custkey", n_buckets)

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        right = g["c_name"].isna().to_numpy()
        keys = g["c_custkey"].to_numpy()
        keep = ~right & ~np.isin(keys, keys[right])
        return pd.DataFrame({
            "c_custkey": keys[keep].astype(np.int64),
            "c_name": g["c_name"].to_numpy()[keep].astype(str)})

    left = _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        prep_left, batch_format="pyarrow", zero_copy_batch=True)
    right = _read(sf_dir, "orders",
                  ["o_custkey", "o_orderdate"]).map_batches(
        prep_right, batch_format="pyarrow", zero_copy_batch=True)
    out = left.union(right).groupby("bucket") \
        .map_groups(anti, batch_format="pandas").to_pandas()
    if "c_custkey" not in out.columns:     # all-bucket-empty edge
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                            "c_name": pd.Series([], dtype="str")})
    return out.sort_values("c_custkey").reset_index(drop=True)


def customer_top_orders(sf_dir, k=_TOPK_PER_CUSTOMER, n_buckets=64):
    """Grouped top-k: each customer's k highest-price orders (ties by
    orderkey) — the per-key-rank operator global top-k (q3/q15) does
    not cover.

    Scale shape: a vectorized per-BLOCK top-k-per-key combiner prunes
    before the shuffle (sound: a global per-key top-k row is in its
    block's per-key top-k), then one hash-bucket groupby and the same
    vectorized rank per bucket — lexsort + segment cumcount, no per-key
    loop, no global sort.  Oracle: ROW_NUMBER window replay."""
    from ..stages.asof import add_hash_bucket

    def topk(ck, ok, price, kk):
        order = np.lexsort((ok, -price, ck))
        c = ck[order]
        new = np.ones(len(c), dtype=bool)
        new[1:] = c[1:] != c[:-1]
        seg = np.flatnonzero(new)
        sizes = np.diff(np.append(seg, len(c)))
        rank = np.arange(len(c), dtype=np.int64) - np.repeat(seg, sizes)
        keep = rank < kk
        return order[keep], rank[keep] + 1

    def prune(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        pr = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        idx, _ = topk(ck, ok, pr, k)
        return add_hash_bucket(batch.take(idx), "o_custkey", n_buckets)

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        ck = g["o_custkey"].to_numpy()
        ok = g["o_orderkey"].to_numpy()
        pr = g["o_totalprice"].to_numpy()
        idx, rank = topk(ck, ok, pr, k)
        return pd.DataFrame({
            "o_custkey": ck[idx], "o_orderkey": ok[idx],
            "o_totalprice": pr[idx], "rank": rank})

    out = _read(sf_dir, "orders",
                ["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
        prune, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("bucket").map_groups(rank_group, batch_format="pandas") \
        .to_pandas()
    return out.sort_values(["o_custkey", "rank"]).reset_index(drop=True)


_GROUP_QUANTILES = (0.5, 0.9)


def events_type_quantiles(sf_dir):
    """Grouped exact quantiles: per-event-type value median and p90 via
    the same per-block (group, value, count) histogram as
    lineitem_quantiles — merge is one groupby([type, value]) sum
    (bounded by distinct pairs, not rows), the quantile walk runs per
    group on the tiny merged histogram.  quantile_disc index rule."""
    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return df.groupby(["event_type", "value"]).size() \
            .rename("n").reset_index()

    # Merge DISTRIBUTED (review r5: a driver gather here would ship
    # O(blocks x distinct pairs) rows); only the bounded merged
    # histogram reaches the driver.
    hist = _read(sf_dir, "events", ["event_type", "value"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536) \
        .groupby(["event_type", "value"]) \
        .aggregate(RaySum("n", alias_name="n")) \
        .to_pandas().sort_values(["event_type", "value"])
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        cum = g["n"].to_numpy().cumsum()
        n = int(cum[-1])
        vals = g["value"].to_numpy()
        for q in _GROUP_QUANTILES:
            idx = max(0, int(np.ceil(q * n)) - 1)
            rows.append((et, q, vals[np.searchsorted(cum, idx,
                                                     side="right")]))
    return pd.DataFrame(rows, columns=["event_type", "q", "value"]) \
        .astype({"q": "float64", "value": "float64"})


_QUANTILES = (0.25, 0.5, 0.75, 0.95)


def lineitem_quantiles(sf_dir):
    """EXACT distributed quantiles of a bounded-cardinality numeric
    column via a value histogram: per-block (value, count) partials,
    one groupby(value) sum over <= |distinct| rows per block, and the
    quantile walk over the tiny merged histogram — no global sort.
    Index rule replicates DuckDB quantile_disc: idx = ceil(q*n) - 1,
    clamped at 0 (verified against a VALUES probe)."""
    def partial(batch: pa.Table) -> pa.Table:
        v = batch["l_quantity"].to_numpy(zero_copy_only=False)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"value": pa.array(u, pa.float64()),
                         "n": pa.array(c, pa.int64())})

    hist = _read(sf_dir, "lineitem", ["l_quantity"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("value").aggregate(RaySum("n", alias_name="n")) \
        .to_pandas().sort_values("value")
    cum = hist["n"].to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0
    vals = hist["value"].to_numpy()
    out = []
    for q in _QUANTILES:
        idx = max(0, int(np.ceil(q * n)) - 1)
        out.append(vals[np.searchsorted(cum, idx, side="right")])
    return pd.DataFrame({"q": np.asarray(_QUANTILES, dtype=np.float64),
                         "value": np.asarray(out, dtype=np.float64)})


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_type_pivot(sf_dir):
    """Pivot / wide aggregate: one row per user with per-event-type
    counts as COLUMNS.  Scale shape: the pivot happens INSIDE the
    per-block partial (unstack to the fixed type vocabulary), so the
    shuffle is a plain groupby(user).sum over k count columns — never a
    (user, type) long table wider than the block.  Unknown types fail
    loudly (the vocabulary is part of the schema contract)."""
    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        codes = pd.Categorical(df["event_type"],
                               categories=_PIVOT_TYPES)
        if codes.isna().any():
            bad = sorted(set(df["event_type"]) - set(_PIVOT_TYPES))
            raise ValueError(f"unknown event types {bad}")
        counts = pd.crosstab(df["user_id"], codes, dropna=False)
        counts = counts.reindex(columns=list(_PIVOT_TYPES), fill_value=0)
        counts.columns = [f"n_{t}" for t in _PIVOT_TYPES]
        return counts.reset_index().rename(columns={"index": "user_id"})

    parts = _read(sf_dir, "events",
                  ["user_id", "event_type"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536).to_pandas()
    out = _final_combine(parts, ["user_id"],
                         sums=[f"n_{t}" for t in _PIVOT_TYPES])
    return out[["user_id"] + [f"n_{t}" for t in _PIVOT_TYPES]] \
        .astype("int64").reset_index(drop=True)


def events_running_total(sf_dir, n_buckets=64):
    """Per-user running total (prefix scan) of event value ordered by
    (ts, event_id) — the cumulative window form the tumbling/session
    aggregates don't cover.  One bucket shuffle colocates each user's
    history; per bucket a single vectorized multi-user cumsum with
    segment reset (global cumsum minus per-segment base) — no per-user
    loop.  Values sum as integer cents so the running total is
    bit-identical to the SUM() OVER oracle regardless of addition
    order."""
    from ..stages.asof import add_hash_bucket

    def prep(batch: pa.Table) -> pa.Table:
        t = pa.table({"event_id": batch["event_id"],
                      "user_id": batch["user_id"], "ts": batch["ts"],
                      "cents": pa.array(_cents(
                          batch["value"].to_numpy(zero_copy_only=False)),
                          pa.int64())})
        return add_hash_bucket(t, "user_id", n_buckets)

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["event_id"].to_numpy(),
                            g["ts"].to_numpy(),
                            g["user_id"].to_numpy()))
        uid = g["user_id"].to_numpy()[order]
        eid = g["event_id"].to_numpy()[order]
        cents = g["cents"].to_numpy()[order]
        c = np.cumsum(cents)
        new = np.ones(len(uid), dtype=bool)
        new[1:] = uid[1:] != uid[:-1]
        seg = np.flatnonzero(new)
        sizes = np.diff(np.append(seg, len(uid)))
        base = np.repeat(c[seg] - cents[seg], sizes)
        return pd.DataFrame({"event_id": eid.astype(np.int64),
                             "user_id": uid.astype(np.int64),
                             "running_cents": (c - base).astype(np.int64)})

    out = _read(sf_dir, "events",
                ["event_id", "user_id", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("bucket").map_groups(scan, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q6_revenue_forecast(sf_dir):
    """TPC-H Q6 shape: revenue delta from discount-band lineitems in one
    ship-year.  Pure streaming filter + per-block partial sum -> one-row
    combine (the cheapest possible aggregate plan: no shuffle at all)."""
    lo = np.datetime64("1994-01-01")
    hi = np.datetime64("1995-01-01")

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        sd = df["l_shipdate"].to_numpy()
        m = ((sd >= lo) & (sd < hi)
             & (df["l_discount"].to_numpy() >= 0.05)
             & (df["l_discount"].to_numpy() <= 0.07)
             & (df["l_quantity"].to_numpy() < 24))
        df = df[m]
        rev = _cents(df["l_extendedprice"] * df["l_discount"]).sum() \
            if len(df) else 0
        return pd.DataFrame({"revenue_cents": [int(rev)],
                             "n_items": [int(len(df))]})

    parts = _read(sf_dir, "lineitem",
                  ["l_quantity", "l_extendedprice", "l_discount",
                   "l_shipdate"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536).to_pandas()
    return pd.DataFrame({
        "revenue_cents": [int(parts["revenue_cents"].sum())],
        "n_items": [int(parts["n_items"].sum())]})


def q15_top_suppliers(sf_dir, k=10):
    """TPC-H Q15 shape: top-k suppliers by one-quarter lineitem revenue.
    Per-block partial groupby(l_suppkey) (cardinality bounded by the
    supplier count) -> small driver combine -> broadcast-joined supplier
    names; rank ties broken by suppkey."""
    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1996-04-01")
    sup = _read(sf_dir, "supplier",
                ["s_suppkey", "s_name"]).to_pandas()

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        sd = df["l_shipdate"].to_numpy()
        df = df[(sd >= lo) & (sd < hi)]
        if df.empty:
            return pd.DataFrame({
                "l_suppkey": pd.Series([], dtype="int64"),
                "revenue_cents": pd.Series([], dtype="int64")})
        df["revenue_cents"] = _cents(df["l_extendedprice"]
                                     * (1 - df["l_discount"]))
        return df.groupby("l_suppkey", as_index=False).agg(
            revenue_cents=("revenue_cents", "sum"))

    parts = _read(sf_dir, "lineitem",
                  ["l_suppkey", "l_extendedprice", "l_discount",
                   "l_shipdate"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536).to_pandas()
    agg = parts.groupby("l_suppkey", as_index=False).agg(
        revenue_cents=("revenue_cents", "sum"))
    agg = agg.sort_values(["revenue_cents", "l_suppkey"],
                          ascending=[False, True]).head(k)
    out = agg.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rank", "l_suppkey", "s_name",
                "revenue_cents"]].reset_index(drop=True)


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_nation_revenue": q5_nation_revenue,
    "q6_revenue_forecast": q6_revenue_forecast,
    "q15_top_suppliers": q15_top_suppliers,
    "part_brand_revenue": part_brand_revenue,
    "order_priority_counts": order_priority_counts,
    "events_hourly": events_hourly,
    "events_user_stats": events_user_stats,
    "events_sessions": events_sessions,
    "events_asof": events_asof,
    "orders_distinct_sketch": orders_distinct_sketch,
    "lineitem_quantiles": lineitem_quantiles,
    "customer_top_orders": customer_top_orders,
    "customers_without_orders": customers_without_orders,
    "events_running_total": events_running_total,
    "events_type_pivot": events_type_pivot,
    "events_type_quantiles": events_type_quantiles,
}

# HLL register replay: hash = md5_number_lower(str(key)) (the simhash
# convention), register = low 8 bits, rho = 1 + leading zeros of the
# remaining 56-bit value; bit length via an exact powers-of-two VALUES
# table (no float log2).
_HLL_POW2 = ", ".join(f"({b}, {1 << b})" for b in range(56))
ORACLE_HLL = f"""
WITH lv(b, p) AS (VALUES {_HLL_POW2}),
h AS (SELECT md5_number_lower(CAST(o_custkey AS VARCHAR)) AS hv
      FROM orders),
r AS (SELECT CAST(hv % 256 AS BIGINT) AS register,
             CAST(hv // 256 AS BIGINT) AS x FROM h),
rh AS (SELECT register,
       57 - COALESCE((SELECT MAX(b) + 1 FROM lv WHERE p <= x), 0) AS rho
       FROM r)
SELECT register, CAST(MAX(rho) AS BIGINT) AS rho FROM rh GROUP BY register
"""

ORACLE = {
    "orders_distinct_sketch": ORACLE_HLL,
    "events_type_quantiles": (
        "WITH a AS (SELECT event_type, quantile_disc(value, ["
        + ", ".join(str(q) for q in _GROUP_QUANTILES)
        + "]) AS v FROM events GROUP BY event_type) "
        + " UNION ALL ".join(
            f"SELECT event_type, {q} AS q, v[{i + 1}] AS value FROM a"
            for i, q in enumerate(_GROUP_QUANTILES))),
    "events_type_pivot": (
        "SELECT user_id, "
        + ", ".join(
            f"COALESCE(SUM(CASE WHEN event_type = '{t}' THEN 1 END), 0)"
            f" AS n_{t}" for t in _PIVOT_TYPES)
        + " FROM events GROUP BY user_id"),
    "events_running_total": (
        "SELECT event_id, user_id, "
        "SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        "AS running_cents FROM events"),
    "customers_without_orders": (
        "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_orderdate >= DATE '1995-01-01' "
        "AND o.o_orderdate < DATE '1996-01-01')"),
    "customer_top_orders": (
        "SELECT o_custkey, o_orderkey, o_totalprice, "
        "CAST(rank AS BIGINT) AS rank FROM ("
        "SELECT o_custkey, o_orderkey, o_totalprice, ROW_NUMBER() OVER "
        "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)"
        f" AS rank FROM orders) WHERE rank <= {_TOPK_PER_CUSTOMER}"),
    "lineitem_quantiles": (
        "WITH a AS (SELECT quantile_disc(l_quantity, ["
        + ", ".join(str(q) for q in _QUANTILES)
        + "]) AS v FROM lineitem) "
        + " UNION ALL ".join(
            f"SELECT {q} AS q, v[{i + 1}] AS value FROM a"
            for i, q in enumerate(_QUANTILES))),
    # Deterministic as-of window replay: rights sort BEFORE lefts at
    # equal ts (so equal-ts rights are visible), max event_id among
    # equal-ts rights, inner semantics (NULL matches dropped).
    "events_asof": (
        "WITH ev AS ("
        "  SELECT event_id, user_id, ts, value,"
        f"  CASE WHEN event_type = '{_ASOF_LEFT}' THEN 1 ELSE 0 END"
        " AS is_left"
        f"  FROM events WHERE event_type IN"
        f" ('{_ASOF_LEFT}', '{_ASOF_RIGHT}')"
        "), w AS ("
        "  SELECT event_id, user_id, ts, is_left,"
        "    LAST_VALUE(CASE WHEN is_left = 0 THEN event_id END IGNORE NULLS)"
        "      OVER win AS m_id,"
        "    LAST_VALUE(CASE WHEN is_left = 0 THEN value END IGNORE NULLS)"
        "      OVER win AS m_value,"
        "    LAST_VALUE(CASE WHEN is_left = 0 THEN ts END IGNORE NULLS)"
        "      OVER win AS m_ts"
        "  FROM ev"
        "  WINDOW win AS (PARTITION BY user_id ORDER BY ts, is_left,"
        "                 event_id ROWS BETWEEN UNBOUNDED PRECEDING AND"
        "                 CURRENT ROW)"
        ") SELECT event_id, user_id, m_id AS matched_event_id,"
        " m_value AS matched_value,"
        " CAST(date_diff('microseconds', m_ts, ts) AS BIGINT) AS gap_us"
        " FROM w WHERE is_left = 1 AND m_id IS NOT NULL"),
    "q6_revenue_forecast": (
        "SELECT CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * l_discount "
        "* 100) AS BIGINT)), 0) AS BIGINT) AS revenue_cents, "
        "COUNT(*) AS n_items FROM lineitem "
        "WHERE l_shipdate >= DATE '1994-01-01' "
        "AND l_shipdate < DATE '1995-01-01' "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"),
    "q15_top_suppliers": (
        "WITH rev AS (SELECT l_suppkey, "
        "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
        "AS BIGINT)) AS BIGINT) AS revenue_cents FROM lineitem "
        "WHERE l_shipdate >= DATE '1996-01-01' "
        "AND l_shipdate < DATE '1996-04-01' GROUP BY l_suppkey), "
        "r AS (SELECT l_suppkey, revenue_cents, ROW_NUMBER() OVER "
        "(ORDER BY revenue_cents DESC, l_suppkey) AS rank FROM rev) "
        "SELECT CAST(rank AS BIGINT) AS rank, l_suppkey, s.s_name, "
        "revenue_cents FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey "
        "WHERE rank <= 10"),
    "q1_pricing_summary": (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, "
        "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) "
        "AS sum_base_cents, "
        "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
        "AS BIGINT)) AS BIGINT) AS sum_disc_cents, "
        "COUNT(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus"),
    "q3_top_orders": (
        "SELECT l_orderkey, "
        "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
        "AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < TIMESTAMP '1995-03-15' "
        "AND l_shipdate > TIMESTAMP '1995-03-15' "
        "GROUP BY l_orderkey "
        "ORDER BY revenue_cents DESC, l_orderkey LIMIT 10"),
    "q5_nation_revenue": (
        "SELECT n_name, "
        "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
        "AS BIGINT)) AS BIGINT) AS revenue_cents, COUNT(*) AS n_items "
        "FROM nation JOIN customer ON c_nationkey = n_nationkey "
        "JOIN orders ON o_custkey = c_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey GROUP BY n_name"),
    "part_brand_revenue": (
        "SELECT p_brand, "
        "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
        "AS BIGINT)) AS BIGINT) AS revenue_cents, COUNT(*) AS n_items "
        "FROM part "
        "JOIN lineitem ON l_partkey = p_partkey GROUP BY p_brand"),
    "order_priority_counts": (
        "SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders "
        "GROUP BY o_orderpriority"),
    "events_hourly": (
        "SELECT date_trunc('hour', ts) AS hour, event_type, "
        "COUNT(*) AS n_events, "
        "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) "
        "AS total_value_cents "
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
