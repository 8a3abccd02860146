"""Explicit hot-key detection + salting (the north-star skew path).

The default pipeline already neutralizes skew with the per-batch
combiner (fold_partial is associative — SURVEY §7.4), which needs no
coordination. This module implements the EXPLICIT alternative the north
star describes — detect per-key event counts, salt hot keys into
sub-partitions, two-phase reduce — for the Override/column-coalesce
mode where a per-batch combiner does not apply, and as the documented
pattern for any non-associative per-key fold:

    phase 0: cheap pre-agg — per-batch partial (key, n) counts →
             tiny groupby → keys with n > threshold (broadcast set)
    phase 1: salted partial reduce — groupby (pid, salt) where
             salt = commit_num % S for hot keys, 0 otherwise
    phase 2: final per-key reduce — groupby pid over the (few)
             partial rows per hot key

Whole-row LWW partials are order-mergeable (max-commit wins), so
salt-merge is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from cosmwasm_etl_ray.config import EngineConfig
from cosmwasm_etl_ray.stages.merge import fold_partial


def detect_hot_keys(
    ds: "ray.data.Dataset", threshold: int
) -> set[tuple[str, str]]:
    """Per-key event counts via partial-agg (combine inside map_batches,
    then a small groupby over partials) → keys above threshold."""

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["repo", "path"], sort=False).size().reset_index(name="n")
        return out

    counts = (
        ds.map_batches(partial_counts, batch_format="pandas", batch_size=65536)
        .groupby(["repo", "path"])
        .aggregate(Sum("n", alias_name="n_events"))
    )

    def above(tbl: pa.Table) -> pa.Table:
        # vectorized batch filter — a per-row Python lambda here was
        # the hot-set detector's slowest stage at corpus cardinality
        return tbl.filter(pa.compute.greater(tbl["n_events"], threshold))

    hot = counts.map_batches(above, batch_format="pyarrow").to_pandas()
    if hot.empty:
        # Ray's to_pandas() on an all-empty Dataset returns a COLUMN-LESS
        # frame (even from Arrow blocks) — hot["repo"] would KeyError
        return set()
    return set(zip(hot["repo"], hot["path"]))


def salted_final_state(
    ds: "ray.data.Dataset",
    cfg: EngineConfig,
    hot_keys: set[tuple[str, str]] | None = None,
) -> "ray.data.Dataset":
    """Two-phase salted reduce producing the same final state as the
    combiner path (tested equivalence). ``ds`` must already carry
    ``pid`` and ``valid``; invalid rows are dropped here."""
    if hot_keys is None:
        hot_keys = detect_hot_keys(ds, cfg.hot_key_threshold)
    hot_ref = ray.put(hot_keys)
    S = cfg.salt_factor

    class AssignSalt:
        def __init__(self):
            self.hot = ray.get(hot_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                # match the non-empty branch's schema exactly (it drops
                # 'valid') — mixed block schemas make downstream group
                # columns layout-dependent
                df = df.drop(columns=[c for c in ("valid",) if c in df.columns])
                df["salt"] = pd.Series(dtype="int32")
                return df
            df = df[df["valid"]].drop(columns=["valid"])
            is_hot = pd.MultiIndex.from_frame(df[["repo", "path"]]).isin(self.hot)
            commit_num = pd.to_numeric(df["commit"]).to_numpy(dtype=np.int64)
            df = df.assign(
                salt=np.where(is_hot, commit_num % S, 0).astype(np.int32)
            )
            return df

    salted = ds.map_batches(AssignSalt, batch_format="pandas", concurrency=(1, 8))

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        return fold_partial(g)

    partials = salted.groupby(["pid", "salt"]).map_groups(
        partial, batch_format="pandas"
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        f = fold_partial(g)
        f = f[f["op"] != "delete"]
        return f.drop(columns=[c for c in ("salt", "pid", "key64") if c in f.columns])

    return partials.groupby("pid").map_groups(final, batch_format="pandas")
