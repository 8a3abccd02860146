"""Additional operator coverage: lag/as-of on the CDC stream,
gap-based sessionization, semi/anti joins, set ops, JSON extraction —
the remaining SURVEY §2 operator families as oracle-checked queries.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from cosmwasm_etl_ray.functions.agg import grouped_agg
from cosmwasm_etl_ray.sources.changes import CHANGES_CTE, changes_from_documents


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def cdc_prev_commit(sf_dir: str) -> "ray.data.Dataset":
    """Per change event: the key's previous commit (LAG over the
    per-key ordered stream — the in-stream as-of lookup, J5 analogue).
    Coarse-sharded by key hash, shift per key via vectorized groupby —
    not one task per (repo, path)."""
    from cosmwasm_etl_ray.functions.agg import sharded_map_groups

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["repo", "path", "commit"], kind="stable")
        prev = g.groupby(["repo", "path"], sort=False)["commit"].shift(1)
        # real nulls (not float NaN) so the Arrow block carries them as
        # string-typed nulls like the SQL twin
        g["prev_commit"] = prev.astype(object).where(prev.notna(), None)
        return g[["repo", "path", "commit", "op", "prev_commit"]]

    return sharded_map_groups(
        changes_from_documents(sf_dir), ["repo", "path"], per_shard
    )


def events_sessionize(sf_dir: str) -> "ray.data.Dataset":
    """Gap-based sessionization (30-min inactivity gap) per user — the
    streaming-window concern expressed as per-key ordered map_groups
    (ray_guide 'Streaming-shaped workloads'). Session id = cumulative
    count of gap-breaks; output = one row per session."""

    from cosmwasm_etl_ray.functions.agg import sharded_map_groups

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        by_user = g["user_id"]
        gap = (g["ts"] - g.groupby(by_user, sort=False)["ts"].shift(1)) > pd.Timedelta(
            minutes=30
        )
        g["session_id"] = gap.astype("int64").groupby(by_user, sort=False).cumsum()
        out = g.groupby(["user_id", "session_id"], sort=False).agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "count"),
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out.reset_index()[
            ["user_id", "session_id", "session_start", "session_end", "n_events"]
        ]

    return sharded_map_groups(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        ["user_id"],
        per_shard,
    )


def customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Anti-join: customers with no big order (> 300k). The key set of
    the filtered side is broadcast once; each batch filters against it
    (the reference's exception anti-join shape, J7). The key-set filter
    is pushed into the parquet read (row-group pruning)."""
    big = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=(pc.field("o_totalprice") > 300_000.0),
    ).to_pandas()
    have = set(big["o_custkey"])
    ref = ray.put(have)

    class Anti:
        def __init__(self):
            self.have = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df[~df["c_custkey"].isin(self.have)]

    out = (
        _read(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(Anti, batch_format="pandas", concurrency=(1, 4))
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                             "c_name": pd.Series(dtype="object")})
    return out.sort_values("c_custkey").reset_index(drop=True)


def nations_in_use(sf_dir: str) -> pd.DataFrame:
    """Set op: UNION of customer and supplier nation keys, distinct,
    joined to names (semi-join + union + distinct)."""
    # per-batch pc.unique partials + a tiny driver fold: one streaming
    # pass per table, no all-to-all (Dataset.unique shuffles; the key
    # domain here is ≤25 values, so the partials are trivially small)
    def _distinct(ds, col: str) -> set:
        parts = ds.map_batches(
            lambda t, c=col: pa.table({c: pc.unique(t[c])}),
            batch_format="pyarrow",
        ).to_pandas()
        return set(parts[col])

    c = _distinct(_read(sf_dir, "customer", ["c_nationkey"]), "c_nationkey")
    s = _distinct(_read(sf_dir, "supplier", ["s_nationkey"]), "s_nationkey")
    keys = sorted(c | s)
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    out = nation[nation["n_nationkey"].isin(keys)][["n_nationkey", "n_name"]]
    return out.sort_values("n_nationkey").reset_index(drop=True)


def _events_file_roundtrip(sf_dir: str, fmt: str) -> pd.DataFrame:
    """Change stream → JSONL/CSV files under /tmp → file-source read →
    grouped fidelity digest per (repo, op): count, max commit (pins the
    zero-padding), total content chars (pins ""-vs-null and embedded
    commas/quotes), max path/lang. The oracle computes the same digest
    straight from CHANGES_CTE — a hash match proves the text format
    round-trips every column byte-exactly (S2/S4 source seam on Ray's
    native file readers, sources/files.py)."""
    import shutil
    import tempfile

    from cosmwasm_etl_ray.sources import files as fsrc

    ev = changes_from_documents(sf_dir)
    tmp = tempfile.mkdtemp(prefix=f"cwer_{fmt}_", dir="/tmp")
    try:
        if fmt == "jsonl":
            fsrc.write_events_jsonl(ev, tmp)
            back = fsrc.read_events_jsonl(tmp)
        else:
            fsrc.write_events_csv(ev, tmp)
            back = fsrc.read_events_csv(tmp)

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "repo": t["repo"],
                    "op": t["op"],
                    "commit": t["commit"],
                    "path": t["path"],
                    "lang": t["lang"],
                    "content_len": pc.cast(
                        pc.utf8_length(t["content"]), pa.int64()
                    ),
                }
            )

        out = grouped_agg(
            back.map_batches(prep, batch_format="pyarrow"),
            keys=["repo", "op"],
            spec={
                "n": ("commit", "count"),
                "max_commit": ("commit", "max"),
                "sum_len": ("content_len", "sum"),
                "max_path": ("path", "max"),
                "max_lang": ("lang", "max"),
            },
        )
        return out.sort_values(["repo", "op"]).reset_index(drop=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def events_jsonl_source(sf_dir: str) -> pd.DataFrame:
    return _events_file_roundtrip(sf_dir, "jsonl")


def events_csv_source(sf_dir: str) -> pd.DataFrame:
    return _events_file_roundtrip(sf_dir, "csv")


def events_props_k(sf_dir: str) -> pd.DataFrame:
    """Semi-structured extraction: parse the JSON props column and
    aggregate by the extracted field (the Meta-JSON handling analogue,
    /root/reference/pkg/db/schemas/parser.models.go:7,39)."""
    ev = _read(sf_dir, "events", ["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        # vectorized C-regex extraction — no per-row json.loads. The
        # sign is part of the capture and bucketing FLOORS (numpy
        # floor_divide == DuckDB //; pc.divide truncates toward zero,
        # wrong for negative k), and rows with no k are excluded here
        # AND in the SQL twin — pandas groupby would silently drop a
        # NaN-key group while SQL GROUP BY emits a NULL row.
        import numpy as np

        ex = pc.extract_regex(
            t["props"].combine_chunks(), pattern=r'"k":\s*(?P<k>-?\d+)'
        )
        ks = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        valid = pc.is_valid(ks)
        kv = ks.filter(valid).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t["event_type"].combine_chunks().filter(valid),
                "k_bucket": pa.array(np.floor_divide(kv, 10), type=pa.int64()),
            }
        )

    return grouped_agg(
        ev.map_batches(extract, batch_format="pyarrow"),
        keys=["event_type", "k_bucket"],
        spec={"n": ("k_bucket", "count")},
    )


def events_error_click_match(sf_dir: str) -> "ray.data.Dataset":
    """Queue-consume 1:1 matching within a key: the n-th error of a
    user pairs with the n-th click (each click consumed by at most one
    error) — the graft of the reference's tax/transfer exact-match
    reconciliation (/root/reference/parser/dex/terraswap/columbusv2/
    app.go:200-268, M10/J8: multi-map consume in order)."""

    from cosmwasm_etl_ray.functions.agg import sharded_map_groups

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        errors = g[g["event_type"] == "error"].copy()
        clicks = g[g["event_type"] == "click"].copy()
        errors["rn"] = errors.groupby("user_id", sort=False).cumcount()
        clicks["rn"] = clicks.groupby("user_id", sort=False).cumcount()
        m = errors.merge(clicks, on=["user_id", "rn"], suffixes=("_e", "_c"))
        return pd.DataFrame(
            {
                "user_id": m["user_id"].astype("int64"),
                "error_event_id": m["event_id_e"].astype("int64"),
                "click_event_id": m["event_id_c"].astype("int64"),
            }
        )

    # pre-filter to the two matched types before the shuffle
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"]).map_batches(
        lambda t: t.filter(
            pc.is_in(t["event_type"], value_set=pa.array(["error", "click"]))
        ),
        batch_format="pyarrow",
    )
    return sharded_map_groups(ev, ["user_id"], per_shard)


RANGE_W_US = 86_400_000_000  # 1-day reaction window, microseconds


def events_clicks_after_error(sf_dir: str) -> "ray.data.Dataset":
    """Bounded-width RANGE JOIN: for every error event, the same
    user's clicks with ts in (error_ts, error_ts + 1 day] — counted
    per error (only errors with >= 1 click appear; the zero rows are a
    left-join variant). Exercises functions/joins.range_join: interval
    replication <= 2x, one (user, time-bucket) hash join, exact
    containment filter; timestamps are integer microseconds so the
    strict lower bound is a +1us shift, no float anywhere."""
    from cosmwasm_etl_ray.functions.agg import grouped_agg
    from cosmwasm_etl_ray.functions.joins import range_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def mk_intervals(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["event_type"] == "error"]
        us = e["ts"].astype("int64")
        return pd.DataFrame(
            {
                "event_id": e["event_id"].astype("int64"),
                "user_id": e["user_id"].astype("int64"),
                "start": us + 1,  # strict ts > error_ts
                "end": us + RANGE_W_US,
            }
        )

    def mk_points(df: pd.DataFrame) -> pd.DataFrame:
        c = df[df["event_type"] == "click"]
        return pd.DataFrame(
            {
                "user_id": c["user_id"].astype("int64"),
                "cts": c["ts"].astype("int64"),
            }
        )

    pairs = range_join(
        ev.map_batches(mk_intervals, batch_format="pandas"),
        ev.map_batches(mk_points, batch_format="pandas"),
        on="user_id",
        start_col="start",
        end_col="end",
        ts_col="cts",
        width=RANGE_W_US,
        left_cols={
            "event_id": "int64",
            "user_id": "int64",
            "start": "int64",
            "end": "int64",
        },
        right_cols={"user_id": "int64", "cts": "int64"},
    )
    return grouped_agg(
        pairs,
        keys=["event_id"],
        spec={"n_clicks": ("cts", "count")},
        final="shuffle",  # matched-error cardinality is corpus-scale
    )


def events_funnel(sf_dir: str) -> "ray.data.Dataset":
    """Ordered funnel conversion per user (view → click → purchase):
    the greedy minimal chain — t_view = first view, t_click = first
    click strictly after it, t_purchase = first purchase strictly
    after that — plus the furthest stage reached (0-3). The classic
    product-analytics sequence-match, expressed as ONE user-sharded
    exchange: all per-user chain state is three scalars, so each
    coarse shard resolves its users fully vectorized (masked groupby
    mins + in-pandas merges), and a hot user costs only that user's
    events. Reference analogue: the multi-step consume/match pattern
    of M10/J8 (/root/reference/parser/dex/dex.go:732-749's ordered
    popList matching), generalized to a timestamp funnel."""
    from cosmwasm_etl_ray.functions.agg import sharded_map_groups

    return sharded_map_groups(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"]),
        ["user_id"],
        funnel_shard,
    )


def funnel_shard(g: pd.DataFrame) -> pd.DataFrame:
    """One user-shard of the funnel (module-level so the property test
    can drive it against a per-user brute-force oracle)."""
    users = pd.DataFrame({"user_id": g["user_id"].unique()})
    v = (
        g.loc[g["event_type"] == "view"]
        .groupby("user_id", sort=False)["ts"]
        .min()
        .rename("t_view")
        .reset_index()
    )
    c = g.loc[g["event_type"] == "click", ["user_id", "ts"]].merge(v, on="user_id")
    c = (
        c.loc[c["ts"] > c["t_view"]]
        .groupby("user_id", sort=False)["ts"]
        .min()
        .rename("t_click")
        .reset_index()
    )
    p = g.loc[g["event_type"] == "purchase", ["user_id", "ts"]].merge(
        c, on="user_id"
    )
    p = (
        p.loc[p["ts"] > p["t_click"]]
        .groupby("user_id", sort=False)["ts"]
        .min()
        .rename("t_purchase")
        .reset_index()
    )
    out = (
        users.merge(v, on="user_id", how="left")
        .merge(c[["user_id", "t_click"]], on="user_id", how="left")
        .merge(p[["user_id", "t_purchase"]], on="user_id", how="left")
    )
    out["stage"] = (
        out["t_view"].notna().astype("int64")
        + out["t_click"].notna().astype("int64")
        + out["t_purchase"].notna().astype("int64")
    )
    return out[["user_id", "stage", "t_view", "t_click", "t_purchase"]]


def events_retention(sf_dir: str) -> "ray.data.Dataset":
    """Weekly retention cohorts: cohort = a user's first active week
    (epoch-days // 7 — integer-exact, no ISO-week library variance),
    and for every (cohort_week, offset_week) the number of users
    active offset weeks after their first. Shape: per-batch
    (user, week) DISTINCT projection (a combiner — events collapse to
    at most one row per user-week per block BEFORE any exchange), one
    user-sharded pass pins each user's min week and emits its
    (cohort, offset) pairs pre-counted per shard, and a tiny keyed sum
    finishes (cohort×offset cardinality is calendar-bounded, but the
    reduce still runs final="shuffle" — nothing funnels through the
    driver)."""
    from cosmwasm_etl_ray.functions.agg import grouped_agg, sharded_map_groups

    def user_weeks(df: pd.DataFrame) -> pd.DataFrame:
        days = df["ts"].to_numpy().astype("datetime64[D]").astype("int64")
        return pd.DataFrame(
            {"user_id": df["user_id"].to_numpy().astype("int64"),
             "week": days // 7}
        ).drop_duplicates(ignore_index=True)

    partials = sharded_map_groups(
        _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
            user_weeks, batch_format="pandas"
        ),
        ["user_id"],
        retention_shard,
    )
    return grouped_agg(
        partials,
        keys=["cohort_week", "offset_week"],
        spec={"n_users": ("n_users", "sum")},
        final="shuffle",
    )


def retention_shard(g: pd.DataFrame) -> pd.DataFrame:
    """One user-shard of the retention count (module-level for the
    property test): input (user_id, week) rows, distinct per user;
    output pre-counted (cohort_week, offset_week, n_users)."""
    g = g.drop_duplicates(["user_id", "week"])  # global distinct per user
    first = g.groupby("user_id", sort=False)["week"].transform("min")
    c = (
        pd.DataFrame(
            {
                "cohort_week": first.to_numpy().astype("int64"),
                "offset_week": (g["week"] - first).to_numpy().astype("int64"),
            }
        )
        .value_counts(["cohort_week", "offset_week"], sort=False)
        .reset_index(name="n_users")
    )
    c["n_users"] = c["n_users"].astype("int64")
    return c


def events_moving_avg(sf_dir: str) -> "ray.data.Dataset":
    """Bounded-frame window aggregate: per user, ordered by (ts,
    event_id), the moving average of `value` over the current row and
    the 2 preceding (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW). One
    user-sharded exchange; inside a shard the frame is three grouped
    SHIFTS summed in fixed oldest-first order — no rolling-window
    sliding accumulator, so the float result is the same 3-term sum
    DuckDB's window computes (and the gate rounds floats to 4dp
    anyway). The frame width is state of O(1) per key: the streaming
    form carries just the last 2 values per user across epochs, same
    as the reference's sliding recent-window prune (A5,
    /root/reference/aggregator/task.go:308)."""
    from cosmwasm_etl_ray.functions.agg import sharded_map_groups

    return sharded_map_groups(
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]),
        ["user_id"],
        moving_avg_shard,
    )


def moving_avg_shard(g: pd.DataFrame) -> pd.DataFrame:
    """One user-shard of the 3-row moving average (module-level for the
    property test)."""
    g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
    gb = g.groupby("user_id", sort=False)["value"]
    s1 = gb.shift(1)
    s2 = gb.shift(2)
    total = s2.fillna(0.0) + s1.fillna(0.0) + g["value"]
    n = 1 + s1.notna().astype("int64") + s2.notna().astype("int64")
    return pd.DataFrame(
        {
            "event_id": g["event_id"].astype("int64"),
            "user_id": g["user_id"].astype("int64"),
            "mov_avg": total / n,
        }
    )


QUERIES = {
    "events_error_click_match": events_error_click_match,
    "events_moving_avg": events_moving_avg,
    "events_clicks_after_error": events_clicks_after_error,
    "events_funnel": events_funnel,
    "events_retention": events_retention,
    "cdc_prev_commit": cdc_prev_commit,
    "events_sessionize": events_sessionize,
    "customers_without_orders": customers_without_orders,
    "nations_in_use": nations_in_use,
    "events_props_k": events_props_k,
    "events_jsonl_source": events_jsonl_source,
    "events_csv_source": events_csv_source,
}

_FILE_SOURCE_DIGEST_SQL = f"""
WITH {CHANGES_CTE.strip()}
SELECT repo, op,
       CAST(count("commit") AS BIGINT) AS n,
       max("commit") AS max_commit,
       CAST(sum(length(content)) AS BIGINT) AS sum_len,
       max(path) AS max_path,
       max(lang) AS max_lang
FROM changes
GROUP BY repo, op
"""

ORACLE_SQL = {
    # oldest-first 3-term sum; the gate rounds floats to 4dp so the
    # last-ulp association difference vs the window accumulator is moot
    "events_moving_avg": """
SELECT event_id, user_id,
       avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_avg
FROM events
""",
    # week = epoch-days // 7; both sides integer-truncate on positives
    "events_retention": """
WITH wk AS (
    SELECT DISTINCT user_id,
           CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
                AS BIGINT) AS week
    FROM events
),
cohorts AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id)
SELECT c.cohort_week,
       w.week - c.cohort_week AS offset_week,
       CAST(count(*) AS BIGINT) AS n_users
FROM wk w JOIN cohorts c USING (user_id)
GROUP BY 1, 2
""",
    # greedy minimal chain: first view, first click strictly after it,
    # first purchase strictly after that — stage = furthest reached
    "events_funnel": """
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (SELECT user_id, min(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id)
SELECT u.user_id,
       CAST(CASE WHEN v.t_view IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END
          AS BIGINT) AS stage,
       v.t_view, c.t_click, p.t_purchase
FROM u
LEFT JOIN v USING (user_id)
LEFT JOIN c USING (user_id)
LEFT JOIN p USING (user_id)
""",
    "events_clicks_after_error": """
SELECT e.event_id, CAST(count(*) AS BIGINT) AS n_clicks
FROM events e JOIN events c
  ON c.user_id = e.user_id AND c.event_type = 'click'
 AND c.ts > e.ts AND c.ts <= e.ts + INTERVAL 1 DAY
WHERE e.event_type = 'error'
GROUP BY e.event_id
""",
    "events_error_click_match": """
WITH ranked AS (
    SELECT user_id, event_id, event_type,
           row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS rn
    FROM events WHERE event_type IN ('error', 'click')
)
SELECT e.user_id,
       e.event_id AS error_event_id,
       c.event_id AS click_event_id
FROM ranked e
JOIN ranked c ON c.user_id = e.user_id AND c.rn = e.rn
WHERE e.event_type = 'error' AND c.event_type = 'click'
""",
    "cdc_prev_commit": f"""
WITH {CHANGES_CTE.strip()}
SELECT repo, path, "commit", op,
       lag("commit") OVER (PARTITION BY repo, path ORDER BY "commit") AS prev_commit
FROM changes
""",
    "events_sessionize": """
WITH ordered AS (
    SELECT user_id, event_id, ts,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_break
    FROM events
),
sess AS (
    SELECT user_id, event_id, ts,
           CAST(sum(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
    FROM ordered
)
SELECT user_id, session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, session_id
""",
    "customers_without_orders": """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
""",
    "nations_in_use": """
SELECT n_nationkey, n_name FROM nation
WHERE n_nationkey IN (
    SELECT c_nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
)
""",
    "events_props_k": """
SELECT event_type,
       CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_bucket,
       CAST(count(*) AS BIGINT) AS n
FROM events
WHERE json_extract(props, '$.k') IS NOT NULL
GROUP BY event_type, CAST(json_extract(props, '$.k') AS BIGINT) // 10
""",
    "events_jsonl_source": _FILE_SOURCE_DIGEST_SQL,
    "events_csv_source": _FILE_SOURCE_DIGEST_SQL,
}
