"""Relational operator coverage: aggregates, joins, windows, as-of,
prefix sums, top-k, distinct — the graft of the reference's SQL-backed
aggregation layer (/root/reference/pkg/db/parser/repository.go) onto
the TPC-H-ish testdata tables. Every query has a DuckDB oracle twin
with matching column names.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min

from cosmwasm_etl_ray.functions.agg import grouped_agg, stats_with_distinct
from cosmwasm_etl_ray.functions.joins import broadcast_join, hash_join

_CUTOFF = "1998-09-02"


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


from cosmwasm_etl_ray.functions.money import cents as _cents


def _rev_e4(t: pa.Table) -> "pa.ChunkedArray":
    """Revenue l_extendedprice*(1-l_discount) in exact 1e-4 units (see
    functions/money.py — the engine's DECIMAL layer)."""
    from cosmwasm_etl_ray.functions.money import rev_e4

    return rev_e4(t["l_extendedprice"], t["l_discount"])


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape: filtered grouped aggregate with derived measure
    (A3-style multi-measure windowless agg). Money sums run in exact
    integer units (cents / 1e-4) so the result is bit-identical across
    batch orders and parallelism levels; averages derive from the exact
    sums."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp(_CUTOFF))))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
                "cents": _cents(t["l_extendedprice"]),
                "disc_e4": _rev_e4(t),
            }
        )

    agg = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys=["l_returnflag", "l_linestatus"],
        spec={
            "sum_qty": ("qty", "sum"),
            "cents": ("cents", "sum_checked"),
            "disc_e4": ("disc_e4", "sum_checked"),
            "count_order": ("qty", "count"),
        },
    )
    agg["sum_base_price"] = agg["cents"] / 100.0
    agg["sum_disc_price"] = agg["disc_e4"] / 10000.0
    agg["avg_qty"] = agg["sum_qty"] / agg["count_order"]
    agg["avg_price"] = agg["cents"] / 100.0 / agg["count_order"]
    return agg[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
         "sum_disc_price", "avg_qty", "avg_price", "count_order"]
    ]


def _li_rev_partials(sf_dir: str) -> "ray.data.Dataset":
    """lineitem scan → per-batch partial revenue sums per orderkey
    (exact 1e-4 int units) — the map-side combiner feeding a bucketed
    final fold inside hash_join."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev_partial(t: pa.Table) -> pa.Table:
        t2 = pa.table({"o_orderkey": t["l_orderkey"], "rev_e4": _rev_e4(t)})
        # certificate: the Arrow group_by sum below wraps silently on
        # int64 overflow — prove count × max|v| < 2^62 or raise
        from cosmwasm_etl_ray.functions.money import certify_sum_bound

        certify_sum_bound(t2["rev_e4"])
        return t2.group_by("o_orderkey").aggregate([("rev_e4", "sum")]).rename_columns(
            ["o_orderkey", "rev_e4"]
        )

    return li.map_batches(rev_partial, batch_format="pyarrow")


def _fold_rev(rhs: pd.DataFrame) -> pd.DataFrame:
    """Final fold of per-batch revenue partials — global per key inside
    each hash bucket. Certified wrap-free (same bound as the batch
    partial, over the partial values)."""
    from cosmwasm_etl_ray.functions.money import certify_sum_bound_np

    certify_sum_bound_np(rhs["rev_e4"].to_numpy())
    return rhs.groupby("o_orderkey", as_index=False, sort=False)["rev_e4"].sum()


def q3_top_orders(sf_dir: str) -> pd.DataFrame:
    """Join + grouped revenue + top-k — fully distributed: only the
    customer dimension's filtered key set is driver-resident. The
    orders fact table stays a Dataset (broadcast-filter by the customer
    key set inside the scan), lineitem revenue pre-aggregates per batch,
    and the single hash-partition shuffle both joins and final-reduces.
    Top-k = per-block top-10 candidates, then a tiny driver sort."""
    cust_keys = (
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .map_batches(
            lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")).select(
                ["c_custkey"]
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    building = np.sort(cust_keys["c_custkey"].to_numpy())
    keys_ref = ray.put(building)

    class FilterOrders:
        def __init__(self):
            self.keys = ray.get(keys_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = np.isin(t["o_custkey"].to_numpy(), self.keys)
            return t.filter(pa.array(mask)).select(["o_orderkey", "o_orderdate"])

    orders_dim = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(FilterOrders, batch_format="pyarrow", concurrency=(1, 8))

    joined = hash_join(
        orders_dim,
        _li_rev_partials(sf_dir),
        on="o_orderkey",
        right_fold=_fold_rev,
        left_cols=["o_orderkey", "o_orderdate"],
        right_cols={"o_orderkey": "int64", "rev_e4": "int64"},
    )

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["rev_e4", "o_orderkey"], ascending=[False, True], kind="stable"
        ).head(10)

    cand = joined.map_batches(local_top, batch_format="pandas", batch_size=None).to_pandas()
    top = cand.sort_values(
        ["rev_e4", "o_orderkey"], ascending=[False, True], kind="stable"
    ).head(10)
    top["revenue"] = top["rev_e4"] / 10000.0
    return top[["o_orderkey", "o_orderdate", "revenue"]].reset_index(drop=True)


def q5_nation_revenue(sf_dir: str) -> pd.DataFrame:
    """Star join, nothing customer-sized through the driver: only
    nation (25 rows, truly tiny) is broadcast — into a distributed
    customer scan that emits (o_custkey, n_name) pairs; orders picks
    up n_name via a distributed hash join, then hash-joins the
    pre-aggregated lineitem revenue. Final group count is 25, so the
    last reduce is trivially driver-safe."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas().rename(
        columns={"n_nationkey": "c_nationkey"}
    )
    cust_nation = broadcast_join(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        nation,
        on="c_nationkey",
    ).map_batches(
        lambda df: df[["c_custkey", "n_name"]].rename(
            columns={"c_custkey": "o_custkey"}
        ),
        batch_format="pandas",
    )

    orders_dim = hash_join(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        cust_nation,
        on="o_custkey",
        left_cols={"o_orderkey": "int64", "o_custkey": "int64"},
        right_cols={"o_custkey": "int64", "n_name": "object"},
    ).map_batches(lambda df: df[["o_orderkey", "n_name"]], batch_format="pandas")

    joined = hash_join(
        orders_dim,
        _li_rev_partials(sf_dir),
        on="o_orderkey",
        right_fold=_fold_rev,
        left_cols=["o_orderkey", "n_name"],
        right_cols={"o_orderkey": "int64", "rev_e4": "int64"},
    )
    agg = grouped_agg(
        joined, keys=["n_name"], spec={"rev_e4": ("rev_e4", "sum_checked")}, final="driver"
    )
    agg["revenue"] = agg["rev_e4"] / 10000.0
    return agg[["n_name", "revenue"]]


def part_brand_stats(sf_dir: str) -> pd.DataFrame:
    """Dimension broadcast join (J3 tokens-table pattern) + partial agg."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas().rename(
        columns={"p_partkey": "l_partkey"}
    )
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    return grouped_agg(
        broadcast_join(li, part, on="l_partkey"),
        keys=["p_brand"],
        spec={"n_items": ("l_quantity", "count"), "sum_qty": ("l_quantity", "sum")},
    )


def status_revenue_hashjoin(sf_dir: str) -> pd.DataFrame:
    """Two-large-sides partitioned hash join (J2): orders ⋈ lineitem on
    orderkey, revenue per order status. Demonstrates the tagged-union
    bucket join; for small sides prefer broadcast_join (see q3/q5).
    Revenue sums in exact 1e-4 integer units, so the ~1e11-magnitude
    totals are bit-identical regardless of reduction order (this used
    to be reported in millions to dodge float nondeterminism)."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["l_orderkey"], "rev_e4": _rev_e4(t)})

    joined = hash_join(
        orders,
        li.map_batches(rev, batch_format="pyarrow"),
        on="o_orderkey",
        right_cols={"o_orderkey": "int64", "rev_e4": "int64"},
    )
    agg = grouped_agg(
        joined,
        keys=["o_orderstatus"],
        spec={"rev_e4": ("rev_e4", "sum_checked"), "n_items": ("rev_e4", "count")},
    )
    agg["revenue"] = agg["rev_e4"] / 10000.0
    return agg[["o_orderstatus", "revenue", "n_items"]]


def events_window_stats(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling 30-min window per user: the pair_stats_30m analogue
    (A3/A4: count, distinct types, sum). ONE shuffle: per-batch count
    partials and deduped (user, window, type) rows flow as a tagged
    stream, shard by key hash, reduce vectorized per shard — the
    user × window key space never materializes on the driver."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type", "value"])

    def add_window(df: pd.DataFrame) -> pd.DataFrame:
        df["window_start"] = df["ts"].dt.floor("30min")
        return df.drop(columns=["ts"])

    windowed = ev.map_batches(add_window, batch_format="pandas")
    return stats_with_distinct(
        windowed,
        keys=["user_id", "window_start"],
        spec={"n_events": ("value", "count"), "sum_value": ("value", "sum")},
        distinct_col="event_type",
        distinct_name="n_types",
    )


def events_asof_signup(sf_dir: str) -> "ray.data.Dataset":
    """As-of (backward) join within key: for each purchase, the latest
    strictly-prior signup ts of the same user — the LATERAL as-of price
    join graft (/root/reference/pkg/db/parser/repository.go:321-325).
    Coarse-sharded by user hash; shift/ffill run per-user via vectorized
    groupby transforms."""
    from cosmwasm_etl_ray.functions.agg import sharded_map_groups

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        sign_ts = g["ts"].where(g["event_type"] == "signup")
        by_user = g["user_id"]
        g["last_signup_ts"] = (
            sign_ts.groupby(by_user, sort=False)
            .shift(1)
            .groupby(by_user, sort=False)
            .ffill()
        )
        out = g[g["event_type"] == "purchase"]
        return out[["event_id", "user_id", "ts", "last_signup_ts"]]

    return sharded_map_groups(ev, ["user_id"], per_shard)


def events_asof_order(sf_dir: str) -> "ray.data.Dataset":
    """TWO-DATASET as-of join (J4 proper): for each purchase event, the
    same user's latest order ON OR BEFORE the event — the reference's
    LEFT JOIN LATERAL price lookup joins events against a SEPARATE
    price table (/root/reference/pkg/db/parser/repository.go:321-325).
    Plan: tagged union of both tables, shard by user hash, vectorized
    pandas merge_asof per shard (both sides of a key in one shard)."""
    from cosmwasm_etl_ray.functions.agg import sharded_map_groups

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"]).filter(
        expr="event_type == 'purchase'"
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )

    # both tag fns emit the IDENTICAL column set and dtypes: a union of
    # two streams with different schemas makes group-block column sets
    # layout-dependent (Ray's "RefBundle with a different schema"
    # warning) and per_shard's column selection nondeterministically
    # KeyErrors. int64 columns that the other side must pad become
    # float64 on BOTH sides (NaN-representable); per_shard casts back.
    def tag_e(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": df["user_id"].astype("int64"),
             "event_id": df["event_id"].astype("float64"),
             "ts": df["ts"],
             "o_orderkey": pd.Series(np.nan, index=df.index, dtype="float64"),
             "o_orderdate": pd.Series(
                 pd.NaT, index=df.index, dtype="datetime64[us]"),
             "o_totalprice": pd.Series(np.nan, index=df.index, dtype="float64"),
             "_side": "E"}
        )

    def tag_o(df: pd.DataFrame) -> pd.DataFrame:
        # one order per (cust, date): max orderkey — the deterministic
        # tiebreak both the engine and the SQL twin apply
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="stable")
        df = df.drop_duplicates(["o_custkey", "o_orderdate"], keep="last")
        return pd.DataFrame(
            {"user_id": df["o_custkey"].astype("int64"),
             "event_id": pd.Series(np.nan, index=df.index, dtype="float64"),
             "ts": pd.Series(pd.NaT, index=df.index, dtype="datetime64[us]"),
             "o_orderkey": df["o_orderkey"].astype("float64"),
             "o_orderdate": df["o_orderdate"],
             "o_totalprice": df["o_totalprice"].astype("float64"),
             "_side": "O"}
        )

    unioned = ev.map_batches(tag_e, batch_format="pandas").union(
        orders.map_batches(tag_o, batch_format="pandas")
    )

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        left = g.loc[g["_side"] == "E", ["event_id", "user_id", "ts"]].sort_values(
            "ts", kind="stable"
        )
        left["event_id"] = left["event_id"].astype("int64")  # undo union padding
        right = g.loc[
            g["_side"] == "O", ["user_id", "o_orderdate", "o_orderkey", "o_totalprice"]
        ]
        # tag_o's dedup is per-batch (a combiner); the GLOBAL
        # (cust, date) → max-orderkey pick happens here, where all of a
        # user's orders are colocated
        right = right.sort_values(
            ["user_id", "o_orderdate", "o_orderkey"], kind="stable"
        ).drop_duplicates(["user_id", "o_orderdate"], keep="last")
        right = right.sort_values("o_orderdate", kind="stable")
        if left.empty:
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"),
                 "user_id": pd.Series(dtype="int64"),
                 "ts": pd.Series(dtype="datetime64[us]"),
                 "last_order_key": pd.Series(dtype="int64"),
                 "last_order_total": pd.Series(dtype="float64")}
            )
        if right.empty:
            out = left.copy()
            out["o_orderkey"] = np.nan
            out["o_totalprice"] = np.nan
        else:
            out = pd.merge_asof(
                left, right, left_on="ts", right_on="o_orderdate",
                by="user_id", direction="backward",
            )
        out["last_order_key"] = out["o_orderkey"].fillna(-1).astype("int64")
        out["last_order_total"] = out["o_totalprice"].fillna(-1.0)
        return out[["event_id", "user_id", "ts", "last_order_key", "last_order_total"]]

    return sharded_map_groups(unioned, ["user_id"], per_shard)


def orders_running_total(sf_dir: str) -> "ray.data.Dataset":
    """Per-customer ordered prefix sum (lp_history A2 pattern).
    Coarse-sharded by customer hash — one vectorized groupby-cumsum per
    shard instead of one task per customer (10k tiny groups)."""
    from cosmwasm_etl_ray.functions.agg import sharded_map_groups

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="stable")
        g["running_total"] = g.groupby("o_custkey", sort=False)["o_totalprice"].cumsum()
        return g[["o_custkey", "o_orderkey", "o_orderdate", "running_total"]]

    return sharded_map_groups(orders, ["o_custkey"], per_shard)


def global_stats(sf_dir: str) -> pd.DataFrame:
    """Global min/max/count (A10): tiny driver-side result."""
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    agg = orders.aggregate(
        Count(alias_name="n_orders"),
        Min("o_orderdate", alias_name="min_orderdate"),
        Max("o_orderdate", alias_name="max_orderdate"),
        Max("o_totalprice", alias_name="max_price"),
    )
    n_li = _read(sf_dir, "lineitem", ["l_orderkey"]).count()
    return pd.DataFrame(
        [
            {
                "n_orders": agg["n_orders"],
                "n_lineitems": n_li,
                "min_orderdate": agg["min_orderdate"],
                "max_orderdate": agg["max_orderdate"],
                "max_price": agg["max_price"],
            }
        ]
    )


def distinct_segments(sf_dir: str) -> pd.DataFrame:
    """DISTINCT over a column (A9/D-ops)."""
    vals = _read(sf_dir, "customer", ["c_mktsegment"]).unique("c_mktsegment")
    return pd.DataFrame({"c_mktsegment": sorted(vals)})


def top_users_by_value(sf_dir: str) -> pd.DataFrame:
    """Grouped sum + top-k sort-limit (O2 pattern), map-side partials."""
    ev = _read(sf_dir, "events", ["user_id", "value"])
    agg = grouped_agg(
        ev,
        keys=["user_id"],
        spec={"total_value": ("value", "sum"), "n_events": ("value", "count")},
    )
    return (
        agg.sort_values(["total_value", "user_id"], ascending=[False, True], kind="stable")
        .head(5)
        .reset_index(drop=True)
    )


HLL_REL_ERR_BAR = 0.10  # measured worst 0.040 (sf0.001, 200 distinct)


def approx_distinct_parts(sf_dir: str) -> pd.DataFrame:
    """COUNT(DISTINCT) two ways in one gate row: the exact distributed
    distinct (value-checked against SQL) next to its HyperLogLog
    estimate's error contract (the 100-TB path — register-max
    combiner, nothing row-sized shuffles; see functions/approx.py).
    hll_ok asserts |est/exact - 1| <= 0.10, measured worst 4%."""
    from cosmwasm_etl_ray.functions.agg import shard_exchange
    from cosmwasm_etl_ray.functions.approx import approx_distinct
    from cosmwasm_etl_ray.functions.hashing import stable_hash64

    def _scan():
        return _read(sf_dir, "lineitem", ["l_returnflag", "l_partkey"])

    def hll_part(df: pd.DataFrame) -> pd.DataFrame:
        from cosmwasm_etl_ray.functions.approx import hll_partial

        return hll_partial(
            df["l_returnflag"].to_numpy(),
            stable_hash64(df["l_partkey"].to_numpy()),
        )

    est = approx_distinct(_scan(), hll_part).set_index("g")["hll_est"]

    # exact: per-batch pair dedup -> partkey-sharded global dedup ->
    # per-flag partial counts -> tiny driver sum (shards x flags rows)
    pairs = _scan().map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas"
    )

    def count_shard(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.drop_duplicates()
            .groupby("l_returnflag", sort=False)
            .size()
            .rename("n_parts")
            .reset_index()
        )

    partials = shard_exchange(pairs, ["l_partkey"], count_shard, 16).to_pandas()
    exact = partials.groupby("l_returnflag", sort=False)["n_parts"].sum()

    out = exact.reset_index().sort_values("l_returnflag")
    out["n_parts"] = out["n_parts"].astype("int64")
    rel_err = np.abs(est.reindex(out["l_returnflag"]).to_numpy()
                     / out["n_parts"].to_numpy() - 1.0)
    out["hll_ok"] = rel_err <= HLL_REL_ERR_BAR
    return out.reset_index(drop=True)


QSKETCH_RANK_BAR = 0.02  # measured worst rank error 0.0031


def quantile_sketch_events(sf_dir: str) -> pd.DataFrame:
    """Mergeable-summary quantiles over an UNBOUNDED float measure
    (events.value per type) — the sketch path grouped_quantiles'
    docstring trades to: one streaming pass of <= k+1 weighted points
    per group per block, candidates-only exchange, then a count pass
    that grades the estimate's TRUE rank against the 2% contract
    (measured worst 0.31%). n_events is exact and value-checked."""
    from cosmwasm_etl_ray.functions.approx import (
        grouped_quantile_sketch,
        qsketch_partial,
    )

    def _scan():
        return _read(sf_dir, "events", ["event_type", "value"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        return qsketch_partial(
            df["event_type"].to_numpy(), df["value"].to_numpy()
        )

    qs = [50, 90, 99]
    est = grouped_quantile_sketch(_scan(), part, qs).set_index("g")
    est_ref = ray.put(est)

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        e = ray.get(est_ref)
        rows = []
        for g, sub in df.groupby("event_type", sort=False):
            v = sub["value"].to_numpy()
            row = {"event_type": g, "n": len(v)}
            for q in qs:
                t = e.loc[g, f"p{q:02d}"] if g in e.index else np.nan
                row[f"le{q}"] = int((v <= t).sum())
                row[f"lt{q}"] = int((v < t).sum())
            rows.append(row)
        return pd.DataFrame(rows)

    c = (
        _scan()
        .map_batches(counts, batch_format="pandas")
        .to_pandas()
        .groupby("event_type", sort=False)
        .sum()
    )
    out = pd.DataFrame(
        {"event_type": c.index.to_numpy(), "n_events": c["n"].astype("int64").to_numpy()}
    )
    for q in qs:
        lo = (q / 100.0 - QSKETCH_RANK_BAR) * c["n"]
        hi = (q / 100.0 + QSKETCH_RANK_BAR) * c["n"]
        out[f"p{q}_ok"] = (
            (c[f"le{q}"] >= lo) & (c[f"lt{q}"] <= hi)
        ).to_numpy()
    return out.sort_values("event_type").reset_index(drop=True)


def orders_late_exists(sf_dir: str) -> pd.DataFrame:
    """Correlated EXISTS rewritten as a pre-aggregated semi-join
    (TPC-H Q4 shape): EXISTS(lineitem l WHERE l.orderkey = o.orderkey
    AND l.shipdate > o.orderdate) ⟺ max(l.shipdate) > o.orderdate — so
    the fact side collapses to ONE row per orderkey (a partial-agg
    shuffle) BEFORE any join, instead of probing orders against the
    full lineitem table. Timestamps travel as int64 microseconds (no
    tz/unit drift across the exchange). Final count per priority is a
    5-group driver reduce. Reference analogue: the validation
    EXISTS-style pool checks run as aggregates, not row probes
    (/root/reference/pkg/db/parser/repository.go:321-325)."""

    def ship_us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "ship_us": pc.cast(t["l_shipdate"], pa.int64()),
            }
        )

    max_ship = grouped_agg(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
            ship_us, batch_format="pyarrow"
        ),
        keys=["o_orderkey"],
        spec={"max_ship_us": ("ship_us", "max")},
        final="shuffle",
    )

    def odate_us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "odate_us": pc.cast(t["o_orderdate"], pa.int64()),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    joined = hash_join(
        _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]).map_batches(
            odate_us, batch_format="pyarrow"
        ),
        max_ship,
        on="o_orderkey",
        left_cols={"o_orderkey": "int64", "odate_us": "int64", "o_orderpriority": "object"},
        right_cols={"o_orderkey": "int64", "max_ship_us": "int64"},
    ).map_batches(
        lambda df: df.loc[df["max_ship_us"] > df["odate_us"], ["o_orderpriority"]],
        batch_format="pandas",
    )
    return grouped_agg(
        joined,
        keys=["o_orderpriority"],
        spec={"n_late": ("o_orderpriority", "count")},
        final="driver",
    )


def custkey_order_hist(sf_dir: str) -> pd.DataFrame:
    """Order-count distribution over customers INCLUDING the zero
    bucket (TPC-H Q13 shape) without a customer⋈orders join: orders
    collapse to one (custkey, n_orders) row per customer via a
    partial-agg shuffle; the count-of-counts histogram is a second,
    tiny grouped agg; and the 0-orders bucket is total customers minus
    customers seen in orders (both distributed counts) — the LEFT JOIN
    exists only in the SQL twin. FK integrity (every o_custkey exists
    in customer) is the stated precondition, same as the reference's
    collector FKs."""
    per_cust = grouped_agg(
        _read(sf_dir, "orders", ["o_custkey", "o_orderkey"]),
        keys=["o_custkey"],
        spec={"n_orders": ("o_orderkey", "count")},
        final="shuffle",
    )
    hist = grouped_agg(
        per_cust,
        keys=["n_orders"],
        spec={"n_customers": ("o_custkey", "count")},
        final="driver",
    )
    total = _read(sf_dir, "customer", ["c_custkey"]).count()
    missing = int(total) - int(hist["n_customers"].sum())
    if missing > 0:
        hist = pd.concat(
            [hist, pd.DataFrame({"n_orders": [0], "n_customers": [missing]})],
            ignore_index=True,
        )
    hist["n_orders"] = hist["n_orders"].astype("int64")
    hist["n_customers"] = hist["n_customers"].astype("int64")
    return hist.sort_values("n_orders").reset_index(drop=True)


def orders_above_cust_avg(sf_dir: str) -> "ray.data.Dataset":
    """Correlated scalar subquery (o_totalprice > this customer's
    average) rewritten as aggregate + join-back: the per-customer mean
    derives from EXACT integer cent sums in ONE partial-agg shuffle,
    the orders stream joins back on custkey, and the comparison runs
    as integer cross-multiplication (price_cents · n > sum_cents — no
    float mean ever materializes, so the emitted row set is bit-stable
    under any partitioning). Output: the qualifying orders with the
    customer's exact average in cents."""
    def cents_proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "price_cents": _cents(t["o_totalprice"]),
            }
        )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(cents_proj, batch_format="pyarrow").materialize()
    per_cust = grouped_agg(
        orders,
        keys=["o_custkey"],
        spec={"sum_cents": ("price_cents", "sum_checked"), "n_orders": ("price_cents", "count")},
        final="shuffle",
    )
    joined = hash_join(
        orders,
        per_cust,
        on="o_custkey",
        left_cols={"o_custkey": "int64", "o_orderkey": "int64", "price_cents": "int64"},
        right_cols={"o_custkey": "int64", "sum_cents": "int64", "n_orders": "int64"},
    )

    def above(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["price_cents"] * df["n_orders"] > df["sum_cents"]
        out = df[keep].copy()
        out["avg_cents"] = out["sum_cents"] // out["n_orders"]
        return out[["o_orderkey", "o_custkey", "price_cents", "avg_cents"]]

    return joined.map_batches(above, batch_format="pandas")


_MELT_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def lineitem_unpivot_stats(sf_dir: str) -> pd.DataFrame:
    """UNPIVOT (wide → long reshape) as a streaming per-batch melt:
    each batch's four measure columns stack into (measure, cents) long
    rows — a pure flat map, no exchange — and the long stream reduces
    to one exact-integer row per measure (melt is the inverse of
    events_pivot's crosstab). Sums run in 1e-2 units so the ~1e11
    totals are bit-identical under any partitioning; the SQL twin is
    the UNION-ALL restatement of the same unpivot."""
    ds = _read(sf_dir, "lineitem", _MELT_MEASURES)

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        long = df.melt(value_vars=_MELT_MEASURES, var_name="measure")
        return pd.DataFrame(
            {
                "measure": long["measure"],
                "cents": np.round(long["value"].to_numpy() * 100).astype("int64"),
            }
        )

    out = grouped_agg(
        ds.map_batches(melt, batch_format="pandas"),
        keys=["measure"],
        spec={"total_e2": ("cents", "sum_checked"), "n": ("cents", "count")},
        final="driver",
    )
    return out.sort_values("measure").reset_index(drop=True)


BIG_QTY = 250  # big-order cutoff: ~p99 of per-order quantity sums


def big_orders(sf_dir: str) -> "ray.data.Dataset":
    """Large-group HAVING then join-back (TPC-H Q18 shape): per-order
    quantity totals reduce in ONE partial-agg shuffle (quantities are
    integral by generator contract — summed as int64, bit-exact),
    survivors filter map-side (HAVING sum > cutoff prunes to ~1% before
    the join moves anything), and only the survivors hash-join back to
    orders for the output attributes."""
    def qty(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
            }
        )

    totals = grouped_agg(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
            qty, batch_format="pyarrow"
        ),
        keys=["o_orderkey"],
        spec={"total_qty": ("qty", "sum")},
        final="shuffle",
    ).map_batches(lambda df: df[df["total_qty"] > BIG_QTY], batch_format="pandas")

    return hash_join(
        _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"]),
        totals,
        on="o_orderkey",
        left_cols=["o_orderkey", "o_orderdate", "o_totalprice"],
        right_cols={"o_orderkey": "int64", "total_qty": "int64"},
    )


def lineitem_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP in one distributed pass: only the FINEST level
    (returnflag × linestatus, 6 groups) aggregates across the cluster;
    the subtotal and grand-total levels derive on the driver by
    re-summing the finest cells — exact because the measures are
    associative integer sums, and free because the finest level is
    group-count-sized, not data-sized. NULL marks the rolled-up
    dimension exactly as SQL's ROLLUP does."""
    base = q1_prepped_agg(sf_dir)

    def level(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        if keys:
            out = df.groupby(keys, as_index=False)[["sum_qty", "n_items"]].sum()
        else:
            out = df[["sum_qty", "n_items"]].sum().to_frame().T
        for c in ("l_returnflag", "l_linestatus"):
            if c not in out.columns:
                out[c] = None
        out["sum_qty"] = out["sum_qty"].astype("int64")
        out["n_items"] = out["n_items"].astype("int64")
        return out[["l_returnflag", "l_linestatus", "sum_qty", "n_items"]]

    return pd.concat(
        [
            level(base, ["l_returnflag", "l_linestatus"]),
            level(base, ["l_returnflag"]),
            level(base, []),
        ],
        ignore_index=True,
    )


def q1_prepped_agg(sf_dir: str) -> pd.DataFrame:
    """The finest-level (returnflag, linestatus) integer aggregate the
    rollup derives from — one distributed partial-agg pass."""
    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
            }
        )

    return grouped_agg(
        _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"]).map_batches(
            prep, batch_format="pyarrow"
        ),
        keys=["l_returnflag", "l_linestatus"],
        spec={"sum_qty": ("qty", "sum"), "n_items": ("qty", "count")},
        final="driver",
    )


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot(sf_dir: str) -> pd.DataFrame:
    """Pivot (crosstab): event counts per user-decile bucket, one
    column per event type. The long-form (bucket, event_type) counts
    reduce distributed (one partial-agg pass, 50 cells); only the tiny
    cell table pivots wide on the driver. The column set is FIXED by
    contract (like every SQL pivot) — an unexpected event type fails
    loudly instead of silently widening the schema."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def bucket(t: pa.Table) -> pa.Table:
        import numpy as np

        u = t["user_id"].to_numpy(zero_copy_only=False)
        # DuckDB's // TRUNCATES toward zero on negatives while numpy
        # floors — sign-split divide mirrors the oracle exactly (same
        # hazard as label_centroids; no-op on today's non-negative ids)
        b = np.sign(u) * (np.abs(u) // 10)
        return pa.table(
            {
                "bucket": pa.array(b, type=pa.int64()),
                "event_type": t["event_type"],
            }
        )

    cells = grouped_agg(
        ev.map_batches(bucket, batch_format="pyarrow"),
        keys=["bucket", "event_type"],
        spec={"n": ("event_type", "count")},
        final="driver",
    )
    unknown = set(cells["event_type"]) - set(_PIVOT_TYPES)
    if unknown:
        raise ValueError(f"unexpected event types: {sorted(unknown)}")
    wide = (
        cells.pivot(index="bucket", columns="event_type", values="n")
        .reindex(columns=_PIVOT_TYPES)
        .fillna(0)
        .astype("int64")
        .reset_index()
    )
    wide.columns = ["bucket"] + [f"n_{t}" for t in _PIVOT_TYPES]
    return wide.sort_values("bucket").reset_index(drop=True)


def revenue_bigsum(sf_dir: str) -> pd.DataFrame:
    """Exact money sums PAST int64 — the DECIMAL(40)/big.Int headroom
    the reference carries (/root/reference/pkg/util/decimals.go:12-59,
    parser/dex/util.go:72-79). Each lineitem's rev_e4 rescales to 1e-10
    units (×1e8, per-element CHECKED multiply), driving the
    per-returnflag sums to ~1e23 ≫ 2^63; grouped_agg op "sum_exact"
    (hi/lo 32-bit split partials, Python-int final) carries them
    exactly and emits decimal strings. Oracle: HUGEINT sums → VARCHAR."""
    from cosmwasm_etl_ray.functions.money import scale_checked

    ds = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_discount"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "rev_e10": scale_checked(_rev_e4(t), 100_000_000),
            }
        )

    agg = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys=["l_returnflag"],
        spec={"big_rev": ("rev_e10", "sum_exact"), "n_items": ("rev_e10", "count")},
    )
    return agg.sort_values("l_returnflag").reset_index(drop=True)


def legacy_price_volume(sf_dir: str) -> pd.DataFrame:
    """LegacyDec price math, bit-compatible with the reference's
    aggregator (amount.Quo(10^decimals).Mul(price) over cosmos 18-digit
    fixed point, /root/reference/aggregator/task.go:436-521 and
    pkg/util/decimals.go:12-59): per lineitem, volume = quantity at 2
    decimals (legacy_from_int), a deterministic ~18-digit unit price,
    Mul with the cosmos chop (round to nearest, exact half to even),
    then EXACT per-flag sums (Python-int partials per batch — the sums
    pass 2^63) printed with the canonical 18-digit String(). Oracle:
    HUGEINT arithmetic reproducing the chop, half-even branch included."""
    from cosmwasm_etl_ray.functions.legacydec import (
        ONE,
        legacy_from_int,
        legacy_mul,
        legacy_str,
    )

    ds = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_partkey", "l_suppkey"]
    )

    def partial(t: pa.Table) -> pa.Table:
        qty = pc.round(t["l_quantity"]).to_numpy().astype(np.int64)
        price = (
            (t["l_partkey"].to_numpy() % 997 + 1) * 10**15
            + t["l_suppkey"].to_numpy() * 7
        )  # deterministic LegacyDec raw price in (0, 1) — fits int64
        prod = legacy_mul(legacy_from_int(qty, decimals=2), price.astype(object))
        g = pd.DataFrame(
            {"l_returnflag": t["l_returnflag"].to_numpy(zero_copy_only=False),
             "v": prod}
        ).groupby("l_returnflag")["v"].agg(["sum", "size"])
        return pa.table(
            {
                "l_returnflag": g.index.to_numpy(),
                "part": np.array([str(int(v)) for v in g["sum"]], dtype=object),
                "n": g["size"].to_numpy().astype(np.int64),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    totals: dict[str, int] = {}
    counts: dict[str, int] = {}
    for flag, p, n in zip(parts["l_returnflag"], parts["part"], parts["n"]):
        totals[flag] = totals.get(flag, 0) + int(p)
        counts[flag] = counts.get(flag, 0) + int(n)
    flags = sorted(totals)
    return pd.DataFrame(
        {
            "l_returnflag": flags,
            "vol_legacy": legacy_str([totals[f] for f in flags]),
            "n_items": np.array([counts[f] for f in flags], dtype=np.int64),
        }
    )


def events_prev_gap(sf_dir: str) -> "ray.data.Dataset":
    """Per-user gap to the previous event (µs) — the ordered per-key
    as-of pattern (J5, /root/reference/aggregator/task.go:558-578)
    routed through ``asof_join_groups``: shard by user hash, sort
    (user, ts) within the shard, per-key vectorized diff. Oracle:
    LAG window. First event per user → null gap (float NaN twin)."""
    from cosmwasm_etl_ray.functions.joins import asof_join_groups

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")  # ts-tie → id
        t = g["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "gap_us": t.diff().to_numpy(),
            }
        )

    return asof_join_groups(ev, "user_id", "ts", per_user)


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "revenue_bigsum": revenue_bigsum,
    "legacy_price_volume": legacy_price_volume,
    "events_prev_gap": events_prev_gap,
    "lineitem_rollup": lineitem_rollup,
    "events_pivot": events_pivot,
    "orders_late_exists": orders_late_exists,
    "custkey_order_hist": custkey_order_hist,
    "orders_above_cust_avg": orders_above_cust_avg,
    "lineitem_unpivot_stats": lineitem_unpivot_stats,
    "big_orders": big_orders,
    "approx_distinct_parts": approx_distinct_parts,
    "quantile_sketch_events": quantile_sketch_events,
    "q3_top_orders": q3_top_orders,
    "q5_nation_revenue": q5_nation_revenue,
    "part_brand_stats": part_brand_stats,
    "status_revenue_hashjoin": status_revenue_hashjoin,
    "events_window_stats": events_window_stats,
    "events_asof_signup": events_asof_signup,
    "events_asof_order": events_asof_order,
    "orders_running_total": orders_running_total,
    "global_stats": global_stats,
    "distinct_segments": distinct_segments,
    "top_users_by_value": top_users_by_value,
}

ORACLE_SQL = {
    "events_prev_gap": """
SELECT event_id, user_id,
       CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
       ) AS BIGINT) AS gap_us
FROM events
""",
    "legacy_price_volume": """
WITH t AS (
  SELECT l_returnflag,
         CAST(round(l_quantity) AS HUGEINT) * CAST(10000000000000000 AS HUGEINT) AS vol,
         CAST(l_partkey % 997 + 1 AS HUGEINT) * CAST(1000000000000000 AS HUGEINT)
           + CAST(l_suppkey AS HUGEINT) * 7 AS price
  FROM lineitem
), m AS (
  SELECT l_returnflag,
         (vol * price) // CAST(1000000000000000000 AS HUGEINT) AS q,
         (vol * price) % CAST(1000000000000000000 AS HUGEINT) AS r
  FROM t
), c AS (
  SELECT l_returnflag,
         q + CASE WHEN 2 * r > CAST(1000000000000000000 AS HUGEINT)
                    OR (2 * r = CAST(1000000000000000000 AS HUGEINT) AND q % 2 = 1)
                  THEN 1 ELSE 0 END AS v
  FROM m
), s AS (
  SELECT l_returnflag, sum(v) AS total, CAST(count(*) AS BIGINT) AS n_items
  FROM c GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(total // CAST(1000000000000000000 AS HUGEINT) AS VARCHAR)
         || '.'
         || lpad(CAST(total % CAST(1000000000000000000 AS HUGEINT) AS VARCHAR), 18, '0')
         AS vol_legacy,
       n_items
FROM s
""",
    "revenue_bigsum": """
SELECT l_returnflag,
       CAST(sum(
           CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))
                AS HUGEINT) * 100000000
       ) AS VARCHAR) AS big_rev,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
GROUP BY l_returnflag
""",
    "lineitem_rollup": """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    "events_pivot": """
SELECT user_id // 10 AS bucket,
       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
FROM events
GROUP BY user_id // 10
""",
    "orders_late_exists": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
)
GROUP BY o_orderpriority
""",
    "custkey_order_hist": """
SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
FROM (
    SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
)
GROUP BY n_orders
""",
    "lineitem_unpivot_stats": """
SELECT measure,
       CAST(sum(cents) AS BIGINT) AS total_e2,
       CAST(count(*) AS BIGINT) AS n
FROM (
        SELECT 'l_quantity' AS measure,
               CAST(round(l_quantity * 100) AS BIGINT) AS cents FROM lineitem
    UNION ALL
        SELECT 'l_extendedprice', CAST(round(l_extendedprice * 100) AS BIGINT)
        FROM lineitem
    UNION ALL
        SELECT 'l_discount', CAST(round(l_discount * 100) AS BIGINT)
        FROM lineitem
    UNION ALL
        SELECT 'l_tax', CAST(round(l_tax * 100) AS BIGINT) FROM lineitem
)
GROUP BY measure
""",
    # integer cross-multiplication comparison, exact // average —
    # mirrors the engine's no-float-mean arithmetic
    "orders_above_cust_avg": """
WITH c AS (
    SELECT o_custkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey
)
SELECT o.o_orderkey, o.o_custkey,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents,
       c.sum_cents // c.n_orders AS avg_cents
FROM orders o JOIN c USING (o_custkey)
WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) * c.n_orders > c.sum_cents
""",
    "big_orders": f"""
SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_orderdate, o.o_totalprice
HAVING sum(CAST(round(l.l_quantity) AS BIGINT)) > {BIG_QTY}
""",
    # exact distinct is value-checked; the HLL estimate is graded as
    # an error CONTRACT (bar 0.10, measured worst 0.040 — the same
    # discipline as the sketch recall bars in queries_textml)
    "approx_distinct_parts": """
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       true AS hll_ok
FROM lineitem GROUP BY l_returnflag
""",
    # the sketch's true measured rank must sit within 2% of q
    "quantile_sketch_events": """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       true AS p50_ok, true AS p90_ok, true AS p99_ok
FROM events GROUP BY event_type
""",
    # Money math mirrors the engine exactly: integral cents ×
    # (100 - integral discount percent) summed as BIGINT, divided once
    # at the end — both sides are exact, so the value hash is stable.
    "q1_pricing_summary": f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0
           AS sum_base_price,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) / 10000.0
           AS sum_disc_price,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) / count(*) AS avg_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 / count(*)
           AS avg_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
""",
    "q3_top_orders": """
SELECT o.o_orderkey, o.o_orderdate,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) / 10000.0
           AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
""",
    "q5_nation_revenue": """
SELECT n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) / 10000.0
           AS revenue
FROM nation n
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY n.n_name
""",
    "status_revenue_hashjoin": """
SELECT o.o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) / 10000.0
           AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus
""",
    "part_brand_stats": """
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_items,
       sum(l.l_quantity) AS sum_qty
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY p.p_brand
""",
    "events_window_stats": """
SELECT user_id,
       time_bucket(INTERVAL 30 MINUTE, ts) AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
       sum(value) AS sum_value
FROM events
GROUP BY user_id, time_bucket(INTERVAL 30 MINUTE, ts)
""",
    "events_asof_signup": """
SELECT event_id, user_id, ts, last_signup_ts FROM (
    SELECT event_id, user_id, ts, event_type,
           last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_signup_ts
    FROM events
) WHERE event_type = 'purchase'
""",
    "events_asof_order": """
WITH o AS (
    SELECT o_custkey, o_orderdate,
           max(o_orderkey) AS o_orderkey,
           max_by(o_totalprice, o_orderkey) AS o_totalprice
    FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, e.ts,
       coalesce(o.o_orderkey, -1) AS last_order_key,
       coalesce(o.o_totalprice, -1.0) AS last_order_total
FROM events e
ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
WHERE e.event_type = 'purchase'
""",
    "orders_running_total": """
SELECT o_custkey, o_orderkey, o_orderdate,
       sum(o_totalprice) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS running_total
FROM orders
""",
    "global_stats": """
SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_orders,
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_lineitems,
       (SELECT min(o_orderdate) FROM orders) AS min_orderdate,
       (SELECT max(o_orderdate) FROM orders) AS max_orderdate,
       (SELECT max(o_totalprice) FROM orders) AS max_price
""",
    "distinct_segments": """
SELECT DISTINCT c_mktsegment FROM customer
""",
    "top_users_by_value": """
SELECT user_id, sum(value) AS total_value, CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id
ORDER BY total_value DESC, user_id LIMIT 5
""",
}
