"""Relational operator coverage: aggregates, joins, windows, as-of,
prefix sums, top-k, distinct — the graft of the reference's SQL-backed
aggregation layer (/root/reference/pkg/db/parser/repository.go) onto
the TPC-H-ish testdata tables. Every query has a DuckDB oracle twin
with matching column names.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Min

from cosmwasm_etl_ray.functions.agg import grouped_agg
from cosmwasm_etl_ray.functions.joins import broadcast_join, hash_join

_CUTOFF = "1998-09-02"


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def q1_pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q1 shape: filtered grouped aggregate with derived measure
    (A3-style multi-measure windowless agg)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp(_CUTOFF))))
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "l_extendedprice": t["l_extendedprice"],
                "disc_price": disc,
            }
        )

    return grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys=["l_returnflag", "l_linestatus"],
        spec={
            "sum_qty": ("l_quantity", "sum"),
            "sum_base_price": ("l_extendedprice", "sum"),
            "sum_disc_price": ("disc_price", "sum"),
            "avg_qty": ("l_quantity", "mean"),
            "avg_price": ("l_extendedprice", "mean"),
            "count_order": ("l_returnflag", "count"),
        },
    )


def q3_top_orders(sf_dir: str) -> pd.DataFrame:
    """Join + grouped revenue + top-k. Physical plan: the BUILDING
    orders side is small after the segment semi-filter → broadcast it
    into the lineitem scan (hash_join stays the plan for two genuinely
    large sides; side-size drives the choice)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    building = set(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).to_pandas()
    dim = orders[orders["o_custkey"].isin(building)][["o_orderkey", "o_orderdate"]]

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"o_orderkey": t["l_orderkey"], "rev": r})

    joined = broadcast_join(
        li.map_batches(rev, batch_format="pyarrow"), dim, on="o_orderkey"
    )
    agg = grouped_agg(
        joined,
        keys=["o_orderkey", "o_orderdate"],
        spec={"revenue": ("rev", "sum")},
    )
    top = agg.sort_values(
        ["revenue", "o_orderkey"], ascending=[False, True], kind="stable"
    ).head(10)
    return top[["o_orderkey", "o_orderdate", "revenue"]].reset_index(drop=True)


def q5_nation_revenue(sf_dir: str) -> pd.DataFrame:
    """Star join via chained broadcast dimensions (region→nation→
    customer→orders collapse driver-side; all are small next to
    lineitem), then broadcast into the lineitem scan + partial agg."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).to_pandas()
    dim = (
        orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    )[["o_orderkey", "n_name"]]

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"o_orderkey": t["l_orderkey"], "rev": r})

    joined = broadcast_join(
        li.map_batches(rev, batch_format="pyarrow"), dim, on="o_orderkey"
    )
    return grouped_agg(joined, keys=["n_name"], spec={"revenue": ("rev", "sum")})


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
    bucket join; for small sides prefer broadcast_join (see q3/q5)."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"o_orderkey": t["l_orderkey"], "rev": r})

    joined = hash_join(orders, li.map_batches(rev, batch_format="pyarrow"), on="o_orderkey")
    agg = grouped_agg(
        joined,
        keys=["o_orderstatus"],
        spec={"revenue": ("rev", "sum"), "n_items": ("rev", "count")},
    )
    # group totals reach ~1e11 at sf0.1: double summation-order error
    # exceeds 4-decimal rounding at that magnitude — report in millions
    # so the order-insensitive value hash is stable
    agg["revenue_m"] = agg["revenue"] / 1e6
    return agg.drop(columns=["revenue"])


def events_window_stats(sf_dir: str) -> pd.DataFrame:
    """Tumbling 30-min window per user: the pair_stats_30m analogue
    (A3/A4: count, distinct types, sum). Counts/sums reduce via
    map-side partials; the exact distinct reduces via per-batch dedup
    of (user, window, type) triples then a final dedup+count — the
    partial-distinct pattern (triples are bounded by
    users × windows × type-alphabet, far below event count)."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type", "value"])

    def add_window(df: pd.DataFrame) -> pd.DataFrame:
        df["window_start"] = df["ts"].dt.floor("30min")
        return df.drop(columns=["ts"])

    windowed = ev.map_batches(add_window, batch_format="pandas")
    base = grouped_agg(
        windowed,
        keys=["user_id", "window_start"],
        spec={"n_events": ("value", "count"), "sum_value": ("value", "sum")},
    )

    def distinct_triples(df: pd.DataFrame) -> pd.DataFrame:
        return df[["user_id", "window_start", "event_type"]].drop_duplicates()

    triples = (
        windowed.map_batches(distinct_triples, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    n_types = (
        triples.groupby(["user_id", "window_start"])
        .size()
        .reset_index(name="n_types")
    )
    out = base.merge(n_types, on=["user_id", "window_start"])
    return out[["user_id", "window_start", "n_events", "n_types", "sum_value"]]


def events_asof_signup(sf_dir: str) -> "ray.data.Dataset":
    """As-of (backward) join within key: for each purchase, the latest
    strictly-prior signup ts of the same user — the LATERAL as-of price
    join graft (/root/reference/pkg/db/parser/repository.go:321-325)."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        sign_ts = g["ts"].where(g["event_type"] == "signup")
        g["last_signup_ts"] = sign_ts.shift(1).ffill()
        out = g[g["event_type"] == "purchase"]
        return out[["event_id", "user_id", "ts", "last_signup_ts"]]

    return ev.groupby("user_id").map_groups(per_user, batch_format="pandas")


def orders_running_total(sf_dir: str) -> "ray.data.Dataset":
    """Per-customer ordered prefix sum (lp_history A2 pattern)."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderdate", "o_orderkey"], kind="stable")
        g["running_total"] = g["o_totalprice"].cumsum()
        return g[["o_custkey", "o_orderkey", "o_orderdate", "running_total"]]

    return orders.groupby("o_custkey").map_groups(per_cust, batch_format="pandas")


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


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_nation_revenue": q5_nation_revenue,
    "part_brand_stats": part_brand_stats,
    "status_revenue_hashjoin": status_revenue_hashjoin,
    "events_window_stats": events_window_stats,
    "events_asof_signup": events_asof_signup,
    "orders_running_total": orders_running_total,
    "global_stats": global_stats,
    "distinct_segments": distinct_segments,
    "top_users_by_value": top_users_by_value,
}

ORACLE_SQL = {
    "q1_pricing_summary": f"""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
       avg(l_quantity) AS avg_qty,
       avg(l_extendedprice) AS avg_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
""",
    "q3_top_orders": """
SELECT o.o_orderkey, o.o_orderdate,
       sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
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
       sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
FROM nation n
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY n.n_name
""",
    "status_revenue_hashjoin": """
SELECT o.o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_items,
       sum(l.l_extendedprice * (1 - l.l_discount)) / 1e6 AS revenue_m
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
