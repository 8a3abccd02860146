"""Map-side partial aggregation (the combiner pattern for groupbys).

A bare ``groupby(key).aggregate(...)`` sort-shuffles every row. When
group cardinality is small (stats tables, per-repo rollups), computing
per-batch partials inside ``map_batches`` and reducing the tiny partial
set is 5-20× faster and shuffles ~nothing. This is the same
partial/final structure the merge fold uses, applied to sums.

``grouped_agg`` supports sum / count / min / max / mean (mean
decomposes into sum+count partials). Two final-reduce modes:

- ``final="driver"`` (default): the partial set reduces driver-side —
  bounded by groups × batches; use when group cardinality is small
  (per-repo rollups, status codes).
- ``final="shuffle"``: partials shard by key hash and reduce inside a
  ``groupby(_shard).map_groups`` — the whole reduce stays distributed
  and vectorized (pandas groupby within each coarse shard, never one
  task per key). Use for high-cardinality keys (user × window).

``stats_with_distinct`` is the A3 windowed-stats pattern (counts/sums
PLUS an exact count-distinct) in ONE shuffle: per-batch count partials
and per-batch deduped distinct rows flow as one tagged stream, shard by
key hash, and each shard reduces both kinds vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from cosmwasm_etl_ray.functions.hashing import stable_hash64

_PARTIAL_OPS = {"sum": "sum", "count": "count", "min": "min", "max": "max"}


def _key_shard(df: pd.DataFrame, keys: list[str], shards: int) -> np.ndarray:
    cols = [np.asarray(df[k].to_numpy()).astype("U") for k in keys]
    return (stable_hash64(*cols) % np.uint64(shards)).astype(np.int32)


def grouped_agg(
    ds: "ray.data.Dataset",
    keys: list[str],
    spec: dict[str, tuple[str, str]],
    batch_size: int = 65536,
    final: str = "driver",
    shards: int = 64,
    driver_limit: int = 200_000,
):
    """spec: output_col → (source_col, op) with op ∈ sum|count|min|max|mean.
    final="driver" returns a pandas DataFrame (small by contract);
    final="shuffle" returns a Dataset (high-cardinality keys).

    Driver mode ENFORCES its small-cardinality contract: if the
    collected partial set exceeds ``driver_limit`` rows the reduce
    raises instead of silently funnelling a high-cardinality key
    through the driver — switch that caller to final="shuffle"."""
    # decompose means into sum+count partials
    plan: dict[str, tuple[str, str]] = {}
    means: dict[str, str] = {}
    count_col = None
    for out, (src, op) in spec.items():
        if op == "mean":
            plan[f"__sum_{out}"] = (src, "sum")
            means[out] = f"__sum_{out}"
            count_col = count_col or "__n"
        elif op == "count":
            count_col = "__n"
        else:
            plan[out] = (src, op)
    if any(op == "count" for _, op in spec.values()) or means:
        plan["__n"] = (keys[0], "count")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False)
        cols = {}
        for out, (src, op) in plan.items():
            cols[out] = getattr(g[src], _PARTIAL_OPS[op])()
        return pd.DataFrame(cols).reset_index()

    def reduce_partials(partials: pd.DataFrame) -> pd.DataFrame:
        g = partials.groupby(keys, sort=False)
        fin = {}
        for out, (src, op) in plan.items():
            if op in ("sum", "count"):
                fin[out] = g[out].sum()
            else:
                fin[out] = getattr(g[out], op)()
        res = pd.DataFrame(fin).reset_index()
        for out, sum_col in means.items():
            res[out] = res[sum_col] / res["__n"]
            res = res.drop(columns=[sum_col])
        for out, (src, op) in spec.items():
            if op == "count":
                res[out] = res["__n"]
        if "__n" in res.columns:
            res = res.drop(columns=["__n"])
        return res[keys + list(spec.keys())]  # order columns as spec

    partial_ds = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
    if final == "driver":
        partials = partial_ds.to_pandas()
        if len(partials) > driver_limit:
            raise ValueError(
                f"grouped_agg(final='driver') collected {len(partials)} "
                f"partial rows (> driver_limit={driver_limit}); the key "
                f"cardinality is too high for a driver reduce — use "
                f"final='shuffle'"
            )
        return reduce_partials(partials)

    # shuffle mode: shard partials by key hash; each shard holds ALL
    # partials of its keys, so the within-shard reduce is global —
    # nothing high-cardinality ever lands on the driver
    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_ashard"] = _key_shard(df, keys, shards)
        return df

    def reduce_shard(g: pd.DataFrame) -> pd.DataFrame:
        return reduce_partials(g.drop(columns=["_ashard"]))

    return (
        partial_ds.map_batches(add_shard, batch_format="pandas")
        .groupby("_ashard")
        .map_groups(reduce_shard, batch_format="pandas")
    )


def sharded_map_groups(
    ds: "ray.data.Dataset",
    keys: list[str],
    fn,
    shards: int = 64,
) -> "ray.data.Dataset":
    """Coarse-sharded per-key processing. ``groupby(key).map_groups``
    with 10k+ tiny keys pays one task + one pandas frame per key —
    pure overhead. Here rows shard by key hash (a key's rows land in
    exactly one shard) and ``fn`` receives a whole shard once; fn must
    handle ALL its keys vectorized (sort + groupby-transform), which
    preserves per-key semantics at ~shards tasks total."""

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_gshard"] = _key_shard(df, keys, shards)
        return df

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns=["_gshard"]))

    return (
        ds.map_batches(add_shard, batch_format="pandas")
        .groupby("_gshard")
        .map_groups(run, batch_format="pandas")
    )


def stats_with_distinct(
    ds: "ray.data.Dataset",
    keys: list[str],
    spec: dict[str, tuple[str, str]],
    distinct_col: str,
    distinct_name: str,
    shards: int = 64,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Grouped counts/sums PLUS an exact count-distinct in ONE shuffle
    (the pair_stats_30m shape: volume sums + count(distinct hash),
    /root/reference/pkg/db/parser/repository.go:285-446).

    Per batch: a count-partial frame (kind 'c') and a deduped
    (keys, distinct_col) frame (kind 'd') concat into one tagged
    stream; shard by key hash; each shard reduces sums and uniques
    vectorized. spec ops are limited to sum/count (associative)."""
    measure_cols = list(spec)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False)
        cols = {}
        for out, (src, op) in spec.items():
            cols[out] = getattr(g[src], _PARTIAL_OPS[op])()
        c = pd.DataFrame(cols).reset_index()
        c["_kind"] = "c"
        c[distinct_col] = df[distinct_col].iloc[:1].repeat(len(c)).to_numpy() if len(c) else []
        d = df[keys + [distinct_col]].drop_duplicates()
        d = d.assign(_kind="d", **{m: 0 for m in measure_cols})
        out = pd.concat([c, d[c.columns]], ignore_index=True)
        out["_ashard"] = _key_shard(out, keys, shards)
        return out

    def reduce_shard(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["_kind"] == "c"].groupby(keys, sort=False)[measure_cols].sum()
        d = (
            g.loc[g["_kind"] == "d", keys + [distinct_col]]
            .drop_duplicates()
            .groupby(keys, sort=False)
            .size()
            .rename(distinct_name)
        )
        out = c.join(d).reset_index()
        out[distinct_name] = out[distinct_name].fillna(0).astype("int64")
        return out

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
        .groupby("_ashard")
        .map_groups(reduce_shard, batch_format="pandas")
    )
