"""Validation: replayed state vs an independent batch recompute.

Graft of the reference's periodic validation
(/root/reference/parser/dex/dex.go:537-602): there, replayed pool sums
are compared against source snapshots with an exception anti-join; here
the incremental merge state is compared against a DIFFERENT code path —
a direct one-shot groupby fold over the raw committed offset range —
so a bug in the incremental path (carry-over, manifest, salting) cannot
hide. The comparison is a full-outer diff by key (J7), exceptions
excluded via a broadcast set (ST2).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import ray.data

from cosmwasm_etl_ray.config import EngineConfig
from cosmwasm_etl_ray.pipelines.replay import read_state
from cosmwasm_etl_ray.stages.normalize import FlagAndPartition


def _content_hash(s: pd.Series) -> pd.Series:
    return s.fillna("").map(lambda v: hashlib.sha256(v.encode()).hexdigest())


def independent_state(files: list[str], cfg: EngineConfig) -> "ray.data.Dataset":
    """One-shot batch recompute of final state from the raw log —
    deliberately NOT using the incremental fold: per key, take the row
    with max commit via a plain pandas idxmax inside map_groups."""
    ds = ray.data.read_parquet(files)
    flagged = ds.map_batches(
        FlagAndPartition(cfg.num_partitions), batch_format="pyarrow"
    )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["valid"]]
        if g.empty:
            return pd.DataFrame()
        last = g.loc[[g["commit"].idxmax()]]
        if last["op"].iloc[0] == "delete":
            return pd.DataFrame()
        return last.drop(columns=["valid", "pid", "op"])

    return flagged.groupby(["repo", "path"]).map_groups(
        per_key, batch_format="pandas"
    )


def validate_store(
    store,
    files: list[str],
    cfg: EngineConfig,
    exceptions: set[tuple[str, str]] | None = None,
) -> pd.DataFrame:
    """Full-outer diff of incremental state vs independent recompute.

    Returns a DataFrame of mismatches (empty = valid): one row per key
    present on only one side or with differing (commit, content sha).
    """
    exceptions = exceptions or set()
    eng = read_state(store).to_pandas()
    ind = independent_state(files, cfg).to_pandas()

    for df in (eng, ind):
        df["content_sha"] = _content_hash(df["content"])

    m = eng[["repo", "path", "commit", "content_sha"]].merge(
        ind[["repo", "path", "commit", "content_sha"]],
        on=["repo", "path"],
        how="outer",
        suffixes=("_state", "_src"),
        indicator=True,
    )
    bad = m[
        (m["_merge"] != "both")
        | (m["commit_state"] != m["commit_src"])
        | (m["content_sha_state"] != m["content_sha_src"])
    ].copy()
    if exceptions:
        keep = ~bad.apply(lambda r: (r["repo"], r["path"]) in exceptions, axis=1)
        bad = bad[keep]
    return bad.rename(columns={"_merge": "presence"})


def snapshot_state(store, epoch: int | None = None) -> str:
    """Persist a per-repo aggregate snapshot of the current state (the
    PoolInfo-snapshot analogue used for later validation / bootstrap)."""
    state = read_state(store, epoch)

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "repo": [df["repo"].iloc[0]],
                "live_paths": [len(df)],
                "total_chars": [int(df["content"].str.len().sum())],
                "max_commit": [df["commit"].max()],
            }
        )

    snap = state.groupby("repo").map_groups(agg, batch_format="pandas").to_pandas()
    e = epoch if epoch is not None else store.latest_epoch()
    out = store.snapshot_path(e if e is not None else 0)
    snap.sort_values("repo").to_parquet(out, index=False)
    return out
