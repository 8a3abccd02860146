"""Distributed joins for Ray Data — the engine's J-operators (SURVEY §2.4).

Three strategies, chosen by side size (the reference always joins in
SQL; here the physical plan is explicit):

- ``broadcast_join``: small side is materialized once, shipped via
  ``ray.put`` and merged per batch inside map_batches — no shuffle
  (J1/J3/J9 pattern: dimension lookups).
- ``hash_join``: both sides large. Tag each side, union, add
  ``bucket = hash(key) % B``, groupby(bucket), pandas-merge the two
  tags inside each group — ONE shuffle total, the portable
  partitioned hash join (J2 pattern).
- ``asof_join_groups``: sort-within-key + pandas merge_asof per group
  (J4/J5 as-of price join pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from cosmwasm_etl_ray.functions.hashing import stable_hash64


def broadcast_join(
    large: "ray.data.Dataset",
    small_df: pd.DataFrame,
    on: list[str] | str,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Merge a driver-resident small side into every batch of the large
    side. The small frame is put in the object store ONCE; each task
    reads the shared copy (zero re-ship per batch)."""
    ref = ray.put(small_df)
    on = [on] if isinstance(on, str) else on

    class Joiner:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, on=on, how=how)

    return large.map_batches(Joiner, batch_format="pandas", concurrency=(1, 8))


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: list[str] | str,
    num_buckets: int = 32,
    how: str = "inner",
    suffixes: tuple[str, str] = ("_l", "_r"),
    right_fold=None,
) -> "ray.data.Dataset":
    """Partitioned hash join: tag sides, union, bucket by key hash,
    merge per bucket. Skewed keys should be pre-aggregated or salted by
    the caller; the bucket count B is independent of cluster size.

    ``right_fold(df) -> df``, if given, reduces the right side's rows
    inside each bucket before the merge. Because every row of a key
    lands in that key's bucket, a per-key fold here is a GLOBAL fold —
    the final-reduce half of a map-side partial aggregation (pre-agg
    the right side per batch upstream, fold the partials per bucket
    here) without a second shuffle.
    """
    on = [on] if isinstance(on, str) else on
    # Each side's column set, taken from the dataset schemas ONCE.
    # (Inferring by all-null content per bucket used to drop genuinely
    # nullable columns that happened to be all-null within one bucket.)
    left_cols = list(left.schema().names)
    right_cols = list(right.schema().names)

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            cols = [np.asarray(t[c].to_numpy(zero_copy_only=False)).astype("U") for c in on]
            bucket = (stable_hash64(*cols) % np.uint64(num_buckets)).astype(np.int32)
            t = t.append_column("_bucket", pa.array(bucket, type=pa.int32()))
            return t.append_column("_side", pa.array([side] * len(t), type=pa.string()))

        return fn

    unioned = left.map_batches(tag("L"), batch_format="pyarrow").union(
        right.map_batches(tag("R"), batch_format="pyarrow")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lhs = g.loc[g["_side"] == "L", [c for c in left_cols if c in g.columns]]
        rhs = g.loc[g["_side"] == "R", [c for c in right_cols if c in g.columns]]
        if right_fold is not None and not rhs.empty:
            rhs = right_fold(rhs)
        if lhs.empty or rhs.empty:
            if how == "inner":
                return pd.DataFrame()
            raise NotImplementedError("outer hash_join on empty side")
        return lhs.merge(rhs, on=on, how=how, suffixes=suffixes)

    return unioned.groupby("_bucket").map_groups(join_bucket, batch_format="pandas")


def asof_join_groups(
    events: "ray.data.Dataset",
    key: str,
    ts_col: str,
    fn,
) -> "ray.data.Dataset":
    """Per-key ordered processing: groupby(key) → sort by ts inside the
    group → apply fn (e.g. merge_asof / ffill). The per-key ordering
    contract mirrors the reference's as-of price search
    (/root/reference/aggregator/task.go:558-578)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.sort_values(ts_col, kind="stable"))

    return events.groupby(key).map_groups(per_key, batch_format="pandas")
