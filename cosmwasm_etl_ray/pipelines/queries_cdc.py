"""Oracle-checkable CDC queries over the documents-derived change stream.

Each function takes ``sf_dir`` and returns a Dataset / DataFrame; each
has an exact DuckDB twin in ``ORACLE_SQL`` built on the shared
``CHANGES_CTE``. These are the grafts of the reference's aggregation
layer (/root/reference/aggregator/task.go,
/root/reference/pkg/db/parser/repository.go):

- cdc_final_state   → the replayed "current state" table (A1 analogue,
                      the correctness oracle of the whole engine)
- cdc_live_counts   → per-repo live-path counts/bytes (pool-state sums)
- cdc_change_stats  → per (repo, window) change stats with distinct
                      counts (pair_stats_30m analogue, A3)
- cdc_history       → running cumulative per-repo prefix sums
                      (lp_history analogue, A2)
- cdc_first_seen    → first event per key (DISTINCT ON analogue, A9)
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Sum

from cosmwasm_etl_ray.config import EngineConfig
from cosmwasm_etl_ray.functions.hashing import sha256_hex
from cosmwasm_etl_ray.pipelines.replay import quick_final_state
from cosmwasm_etl_ray.sources.changes import CHANGES_CTE, changes_from_documents

_CFG = EngineConfig(num_partitions=32)

_WINDOW = 1_000_000  # commit-window size (the 30-min-window analogue)


def _final_state(sf_dir: str) -> "ray.data.Dataset":
    return quick_final_state(changes_from_documents(sf_dir), _CFG)


def cdc_final_state(sf_dir: str) -> "ray.data.Dataset":
    """Full replay; content replaced by its sha256 (the per-row
    invariant from BASELINE.json input_hint)."""

    def hash_content(t: pa.Table) -> pa.Table:
        t = t.append_column("content_sha256", sha256_hex(t["content"]))
        return t.select(["repo", "path", "commit", "lang", "content_sha256"])

    return _final_state(sf_dir).map_batches(hash_content, batch_format="pyarrow")


def cdc_live_counts(sf_dir: str) -> "ray.data.Dataset":
    """Per-repo live paths + content bytes — the replayed pool-state
    sums (/root/reference/pkg/db/parser/repository.go:147-152)."""

    def measures(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["repo"],
                "n_chars": pc.utf8_length(t["content"]).cast(pa.int64()),
            }
        )

    return (
        _final_state(sf_dir)
        .map_batches(measures, batch_format="pyarrow")
        .groupby("repo")
        .aggregate(
            Count(alias_name="live_paths"),
            Sum("n_chars", alias_name="total_chars"),
        )
    )


def _with_window(sf_dir: str) -> "ray.data.Dataset":
    def w(t: pa.Table) -> pa.Table:
        win = pc.divide(
            pc.cast(t["commit"], pa.int64()), pa.scalar(_WINDOW, pa.int64())
        )
        return t.append_column("window", win.cast(pa.int64()))

    return changes_from_documents(sf_dir).map_batches(w, batch_format="pyarrow")


def cdc_change_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per (repo, commit-window): event counts by op + distinct paths.
    Distinct counts are exact, computed per group (the reference's
    count(distinct hash) FILTER pattern,
    /root/reference/pkg/db/parser/repository.go:285-446)."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "repo": [g["repo"].iloc[0]],
                "window": [g["window"].iloc[0]],
                "n_events": [len(g)],
                "n_deletes": [int((g["op"] == "delete").sum())],
                "distinct_paths": [g["path"].nunique()],
            }
        )

    return (
        _with_window(sf_dir)
        .groupby(["repo", "window"])
        .map_groups(per_group, batch_format="pandas")
    )


def cdc_history(sf_dir: str) -> "ray.data.Dataset":
    """Running cumulative events per repo over windows — the lp_history
    prefix-sum-with-carry analogue
    (/root/reference/aggregator/task.go:104-219)."""
    win = (
        _with_window(sf_dir)
        .groupby(["repo", "window"])
        .aggregate(Count(alias_name="n"))
    )

    def cumsum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("window", kind="stable")
        g["cum_events"] = g["n"].cumsum().astype("int64")
        return g.drop(columns=["n"])

    return win.groupby("repo").map_groups(cumsum, batch_format="pandas")


def cdc_first_seen(sf_dir: str) -> "ray.data.Dataset":
    """First event per key — DISTINCT ON (key) ORDER BY commit analogue
    (/root/reference/pkg/db/parser/repository.go:677-743)."""

    def first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("commit", kind="stable").head(1)
        return g[["repo", "path", "commit", "op"]]

    return (
        changes_from_documents(sf_dir)
        .groupby(["repo", "path"])
        .map_groups(first, batch_format="pandas")
    )


_PREFIX = f"WITH {CHANGES_CTE.strip()}"

_FINAL_CTE = """
ranked AS (
    SELECT repo, path, "commit", lang, content, op,
           row_number() OVER (PARTITION BY repo, path ORDER BY "commit" DESC) AS rn
    FROM changes
),
final_state AS (
    SELECT repo, path, "commit", lang, content
    FROM ranked WHERE rn = 1 AND op <> 'delete'
)
"""

_WIN_EXPR = 'CAST(FLOOR(CAST("commit" AS BIGINT) / 1000000.0) AS BIGINT)'

ORACLE_SQL: dict[str, str] = {
    "cdc_final_state": f"""
{_PREFIX},
{_FINAL_CTE}
SELECT repo, path, "commit", lang, sha256(content) AS content_sha256
FROM final_state
""",
    "cdc_live_counts": f"""
{_PREFIX},
{_FINAL_CTE}
SELECT repo,
       CAST(count(*) AS BIGINT) AS live_paths,
       CAST(sum(length(content)) AS BIGINT) AS total_chars
FROM final_state GROUP BY repo
""",
    "cdc_change_stats": f"""
{_PREFIX}
SELECT repo,
       {_WIN_EXPR} AS window,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE op = 'delete') AS BIGINT) AS n_deletes,
       CAST(count(DISTINCT path) AS BIGINT) AS distinct_paths
FROM changes GROUP BY repo, {_WIN_EXPR}
""",
    "cdc_history": f"""
{_PREFIX},
win AS (
    SELECT repo, {_WIN_EXPR} AS "window", count(*) AS n
    FROM changes GROUP BY repo, {_WIN_EXPR}
)
SELECT repo, "window",
       CAST(sum(n) OVER (PARTITION BY repo ORDER BY "window") AS BIGINT) AS cum_events
FROM win
""",
    "cdc_first_seen": f"""
{_PREFIX}
SELECT repo, path, "commit", op
FROM (
    SELECT repo, path, "commit", op,
           row_number() OVER (PARTITION BY repo, path ORDER BY "commit") AS rn
    FROM changes
) WHERE rn = 1
""",
}

QUERIES = {
    "cdc_final_state": cdc_final_state,
    "cdc_live_counts": cdc_live_counts,
    "cdc_change_stats": cdc_change_stats,
    "cdc_history": cdc_history,
    "cdc_first_seen": cdc_first_seen,
}
