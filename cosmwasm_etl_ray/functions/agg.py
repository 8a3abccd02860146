"""Map-side partial aggregation (the combiner pattern for groupbys).

A bare ``groupby(key).aggregate(...)`` sort-shuffles every row. When
group cardinality is small (stats tables, per-repo rollups), computing
per-batch partials inside ``map_batches`` and reducing the tiny partial
set is 5-20× faster and shuffles ~nothing. This is the same
partial/final structure the merge fold uses, applied to sums.

``grouped_agg`` supports sum / count / min / max / mean (mean
decomposes into sum+count partials), plus two overflow-safe sums for
money-class integer measures (the reference carries DECIMAL(40)/big.Int
end to end — /root/reference/pkg/util/decimals.go:12-59):

- ``sum_checked``: int64 sum with a no-overflow CERTIFICATE — partials
  carry (sum, max|v|, count); every fold (batch and final) verifies
  count × max|v| < 2^62 and RAISES when the bound can't prove the int64
  sum didn't wrap. Same speed class as "sum"; loud instead of silently
  wrong.
- ``sum_exact``: arbitrary-precision exact sum — per-batch partials
  split each value into hi/lo 32-bit halves (two int64 sums, wrap-free
  for < 2^31-row batches), the small final fold recombines in Python
  ints and emits exact DECIMAL STRINGS (Arrow-safe past ±2^63).

Two final-reduce modes:

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
import pyarrow as pa

import ray
import ray.data

from cosmwasm_etl_ray.compat import cached_remote
from cosmwasm_etl_ray.functions.hashing import stable_hash64

_PARTIAL_OPS = {"sum": "sum", "count": "count", "min": "min", "max": "max"}


def _key_shard(df: pd.DataFrame, keys: list[str], shards: int) -> np.ndarray:
    cols = [np.asarray(df[k].to_numpy()).astype("U") for k in keys]
    return (stable_hash64(*cols) % np.uint64(shards)).astype(np.int32)


# --------------------------------------------- direct shard exchange

def _shard_split_blocks(n: int, keys: list[str], by_column: bool, *blocks):
    """Raw task: concat a run of blocks, split by shard (num_returns=n;
    None for empty shards). ``by_column=False``: shard = key-hash,
    mirroring ``_key_shard`` so the two exchange shapes co-locate
    identically. ``by_column=True``: keys[0] IS the precomputed integer
    shard column (taken mod n for safety)."""
    from cosmwasm_etl_ray.functions.hashing import split_table_by_shard
    from cosmwasm_etl_ray.functions.joins import _as_table

    tabs = [t for t in (_as_table(b) for b in blocks if b is not None) if t.num_rows]
    if not tabs:
        return None if n == 1 else tuple([None] * n)
    t = pa.concat_tables(tabs, promote_options="default")
    if n == 1:
        return t
    if by_column:
        shard = (
            t[keys[0]].to_numpy(zero_copy_only=False).astype(np.int64)
            % n
        ).astype(np.int32)
    else:
        cols = [
            np.asarray(t[k].to_numpy(zero_copy_only=False)).astype("U")
            for k in keys
        ]
        shard = (stable_hash64(*cols) % np.uint64(n)).astype(np.int32)
    return split_table_by_shard(t, shard, n)


def _shard_apply(fn, *splits):
    """Raw task: one shard's rows through ``fn``; returns (n_rows,
    table) so the driver fetches only counts. n == -1 means the shard
    saw no input (or fn produced a column-less frame); n == 0 carries
    a TYPED 0-row table so an all-filtered exchange still returns a
    Dataset with the output schema."""
    tabs = [t for t in splits if t is not None]
    if not tabs:
        return -1, None
    out = fn(pa.concat_tables(tabs, promote_options="default").to_pandas())
    if out is None or (not len(out) and not len(out.columns)):
        return -1, None
    from cosmwasm_etl_ray.functions.joins import from_pandas_stable

    return len(out), from_pandas_stable(out)


def shard_exchange(
    ds: "ray.data.Dataset",
    keys: list[str],
    fn,
    shards: int,
    by_column: bool = False,
) -> "ray.data.Dataset":
    """The direct raw-task form of shard-by-key-hash → apply-per-shard
    (the engine's third use of the exchange pattern, after the replay
    merge and hash_join): block refs drain on the driver, split tasks
    bucket them (grouped ≤ 2×NCPU so in-flight refs stay bounded), one
    task per shard runs ``fn`` — no groupby shuffle, no executor ramp.

    ``by_column=True``: keys[0] is an already-computed integer shard
    column (the raw-task twin of
    map_batches(add_shard).groupby(col).map_groups(fn)); ``fn`` sees
    the frame WITHOUT that column, like the groupby shape's drop."""
    from cosmwasm_etl_ray.functions.joins import _drain_block_refs

    if by_column:
        col = keys[0]
        inner = fn

        def fn(df: pd.DataFrame) -> pd.DataFrame:  # noqa: F811
            return inner(df.drop(columns=[col]))

    split = cached_remote(
        ("agg_split", shards), _shard_split_blocks, num_returns=shards
    )
    apply_t = cached_remote("agg_apply", _shard_apply, num_returns=2)

    blocks = _drain_block_refs(ds)
    ncpu = int(ray.cluster_resources().get("CPU", 32))
    # bound in-flight refs: split tasks × shards ≤ ~4k (the raylet
    # degrades past ~4k small objects — BASELINE.md); at shards=256
    # that caps split tasks at 16, not 2×NCPU
    n_tasks = max(1, min(len(blocks), 2 * ncpu, max(1, 4096 // shards)))
    per_shard: list[list] = [[] for _ in range(shards)]
    chunks = np.array_split(np.arange(len(blocks)), n_tasks) if blocks else []
    for idx in chunks:
        if not len(idx):
            continue
        refs = split.remote(shards, keys, by_column, *[blocks[i] for i in idx])
        if shards == 1:
            refs = [refs]
        for s, r in enumerate(refs):
            per_shard[s].append(r)

    fn_ref = ray.put(fn)  # ship the callable once, not per shard task
    count_refs, table_refs = [], []
    for s in range(shards):
        if not per_shard[s]:
            continue
        nref, tref = apply_t.remote(fn_ref, *per_shard[s])
        count_refs.append(nref)
        table_refs.append(tref)
    counts = ray.get(count_refs)
    keep = [t for n, t in zip(counts, table_refs) if n > 0]
    if not keep:
        # one typed 0-row table (if any shard ran fn) so downstream
        # column access works
        typed = [t for n, t in zip(counts, table_refs) if n == 0]
        if typed:
            return ray.data.from_arrow_refs(typed[:1])
        if blocks:
            # every split saw 0 rows => all input blocks are empty:
            # run fn ONCE on the typed empty input to recover the
            # output schema (cheap — the block is empty)
            from cosmwasm_etl_ray.functions.joins import _as_table

            try:
                t = _as_table(ray.get(blocks[0]))
                out = fn(t.to_pandas())
                if out is not None and len(out.columns):
                    # explicit Arrow conversion: Ray's pandas path
                    # drops columns on empty object-dtype frames
                    return ray.data.from_arrow(
                        pa.Table.from_pandas(
                            out.iloc[:0], preserve_index=False
                        )
                    )
            except Exception:
                pass  # fns that reject empty input keep old behavior
        return ray.data.from_pandas(pd.DataFrame())
    return ray.data.from_arrow_refs(keep)


def grouped_agg(
    ds: "ray.data.Dataset",
    keys: list[str],
    spec: dict[str, tuple[str, str]],
    batch_size: int = 65536,
    final: str = "driver",
    shards: int = 64,
    driver_limit: int = 200_000,
    exchange: str = "direct",
):
    """spec: output_col → (source_col, op) with op ∈
    sum|count|min|max|mean|sum_checked|sum_exact.
    final="driver" returns a pandas DataFrame (small by contract);
    final="shuffle" returns a Dataset (high-cardinality keys).

    sum_checked: int64 sum that RAISES when count × max|v| ≥ 2^62
    (the certificate that the sum provably didn't wrap — every subset
    prefix is bounded by Σ|v| ≤ count × max|v|). sum_exact: exact
    arbitrary-precision sum via hi/lo 32-bit split partials, emitted
    as decimal STRINGS (values past ±2^63 can't ride an int64 or an
    Arrow conversion). Both require an integer measure.

    Driver mode ENFORCES its small-cardinality contract: if the
    collected partial set exceeds ``driver_limit`` rows the reduce
    raises instead of silently funnelling a high-cardinality key
    through the driver — switch that caller to final="shuffle"."""
    # decompose means into per-column sum+count partials; count is the
    # per-column non-null count (SQL COUNT(col)/AVG(col) parity — a
    # shared row-count partial would diverge on nullable measures)
    plan: dict[str, tuple[str, str]] = {}
    means: dict[str, str] = {}
    checked: list[str] = []
    exact: list[str] = []
    derived: dict[str, tuple[str, str]] = {}  # aux col → (src, kind)
    _OPS = {"sum", "count", "min", "max", "mean", "sum_checked", "sum_exact"}
    for out, (src, op) in spec.items():
        if op not in _OPS:
            # entry-time, not a KeyError deep inside a Ray task
            raise ValueError(
                f"grouped_agg: unknown op {op!r} for {out!r} "
                f"(supported: {sorted(_OPS)})"
            )
        if op == "mean":
            plan[f"__sum_{out}"] = (src, "sum")
            plan[f"__cnt_{out}"] = (src, "count")
            means[out] = f"__sum_{out}"
        elif op == "sum_checked":
            derived[f"__abs_{out}"] = (src, "abs")
            plan[f"__cks_{out}"] = (src, "sum")
            plan[f"__ckm_{out}"] = (f"__abs_{out}", "max")
            plan[f"__ckc_{out}"] = (src, "count")
            checked.append(out)
        elif op == "sum_exact":
            derived[f"__hiv_{out}"] = (src, "hi")
            derived[f"__lov_{out}"] = (src, "lo")
            plan[f"__his_{out}"] = (f"__hiv_{out}", "sum")
            plan[f"__los_{out}"] = (f"__lov_{out}", "sum")
            exact.append(out)
        else:
            plan[out] = (src, op)

    _I64_MIN = np.iinfo(np.int64).min

    def _derive(df: pd.DataFrame) -> pd.DataFrame:
        if not derived:
            return df
        df = df.copy()
        for name, (src, kind) in derived.items():
            v = df[src].to_numpy()
            if v.dtype.kind not in "iu":
                raise ValueError(
                    f"grouped_agg: sum_checked/sum_exact need an integer "
                    f"measure; {src!r} is {v.dtype}"
                )
            v = v.astype(np.int64, copy=False)
            if kind == "abs":
                if len(v) and (v == _I64_MIN).any():
                    raise ValueError(
                        f"grouped_agg sum_checked: {src!r} holds INT64_MIN "
                        f"(|v| not representable) — use sum_exact"
                    )
                df[name] = np.abs(v)
            elif kind == "hi":
                df[name] = v >> 32  # arithmetic shift: exact for negatives
            else:
                df[name] = v & 0xFFFFFFFF
        return df

    def _certify(frame: pd.DataFrame) -> None:
        # count × max|v| < 2^62 ⇒ every int64 prefix sum was wrap-free
        # (float compare with a 2× margin absorbs the cast imprecision)
        for out in checked:
            bound = (
                frame[f"__ckm_{out}"].to_numpy().astype(np.float64)
                * frame[f"__ckc_{out}"].to_numpy()
            )
            if len(bound) and np.nanmax(bound) >= float(2**62):
                raise ValueError(
                    f"grouped_agg sum_checked({out!r}): count × max|v| "
                    f"≥ 2^62 — the int64 sum can't be certified wrap-free; "
                    f"use op 'sum_exact'"
                )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = _derive(df)
        g = df.groupby(keys, sort=False)
        cols = {}
        for out, (src, op) in plan.items():
            cols[out] = getattr(g[src], _PARTIAL_OPS[op])()
        res = pd.DataFrame(cols).reset_index()
        _certify(res)
        return res

    def reduce_partials(partials: pd.DataFrame) -> pd.DataFrame:
        if partials.empty and not set(keys) <= set(partials.columns):
            # a fully-empty upstream loses its columns (Ray empty
            # pandas blocks) — return the spec'd shape instead of a
            # KeyError in the groupby
            return pd.DataFrame(columns=keys + list(spec.keys()))
        g = partials.groupby(keys, sort=False)
        fin = {}
        for out, (src, op) in plan.items():
            if op in ("sum", "count"):
                if any(out == f"__{p}_{e}" for e in exact for p in ("his", "los")):
                    # hi/lo partial folds leave int64 range at scale
                    # (2^47-magnitude partials × many blocks) — the
                    # final set is small by contract, so Python-int
                    # (object) summation is exact and cheap here
                    fin[out] = g[out].apply(
                        lambda s: sum(int(x) for x in s)
                    )
                else:
                    fin[out] = g[out].sum()
            else:
                fin[out] = getattr(g[out], op)()
        res = pd.DataFrame(fin).reset_index()
        _certify(res)
        for out, sum_col in means.items():
            res[out] = res[sum_col] / res[f"__cnt_{out}"]
            res = res.drop(columns=[sum_col, f"__cnt_{out}"])
        for out in checked:
            res[out] = res[f"__cks_{out}"]
            res = res.drop(
                columns=[f"__cks_{out}", f"__ckm_{out}", f"__ckc_{out}"]
            )
        for out in exact:
            res[out] = [
                str((int(h) << 32) + int(lo))
                for h, lo in zip(res[f"__his_{out}"], res[f"__los_{out}"])
            ]
            res = res.drop(columns=[f"__his_{out}", f"__los_{out}"])
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
    if exchange == "direct":
        return shard_exchange(partial_ds, keys, reduce_partials, shards)

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
    exchange: str = "direct",
) -> "ray.data.Dataset":
    """Coarse-sharded per-key processing. ``groupby(key).map_groups``
    with 10k+ tiny keys pays one task + one pandas frame per key —
    pure overhead. Here rows shard by key hash (a key's rows land in
    exactly one shard) and ``fn`` receives a whole shard once; fn must
    handle ALL its keys vectorized (sort + groupby-transform), which
    preserves per-key semantics at ~shards tasks total.

    exchange="direct" (default) runs the shard exchange as raw tasks
    (see ``shard_exchange``); "dataset" keeps the groupby shape."""
    if exchange == "direct":
        return shard_exchange(ds, keys, fn, shards)

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
    exchange: str = "direct",
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
        if exchange != "direct":
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

    tagged = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
    if exchange == "direct":
        return shard_exchange(tagged, keys, reduce_shard, shards)
    return tagged.groupby("_ashard").map_groups(
        reduce_shard, batch_format="pandas"
    )


def grouped_topk(
    ds: "ray.data.Dataset",
    group_col: str,
    order_cols: list[str],
    k: int,
    ascending: "bool | list[bool]" = True,
    shards: int = 16,
) -> "ray.data.Dataset":
    """Exact top-k rows per group by ``order_cols`` (callers append a
    unique id as the last order column to make the cut total).

    The combiner discipline: every block keeps at most k rows per
    group it has seen (``sort_values().groupby().head(k)`` — a pure
    per-batch contraction), so only candidate rows — <= k x groups per
    block — reach the exchange; the final per-group cut runs over
    candidates, never the corpus. At 100 TB the corpus-side pass
    streams and the exchanged volume is bounded by k x groups x
    blocks, the same shape as ``vocab_topk``'s count combiner.

    Serves both selection directions: deterministic stratified
    sampling (k smallest seeded hashes per domain) and per-domain
    curation (k largest by a quality measure)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return (
            df.sort_values(order_cols, ascending=ascending, kind="stable")
            .groupby(group_col, sort=False)
            .head(k)
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return partial(g)

    # coalescing re-cut: top-k is idempotent under re-application, so a
    # second pass over many blocks' candidates bounds each shard task's
    # input by k x groups per coalesced batch, not per block
    cand = ds.map_batches(partial, batch_format="pandas").map_batches(
        partial, batch_format="pandas", batch_size=65536
    )
    return shard_exchange(cand, [group_col], final, shards)


def grouped_quantiles(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    qs_e2: list[int],
    shards: int = 16,
    mode: str = "disc",
) -> "ray.data.Dataset":
    """EXACT discrete quantiles per group over an integer measure.

    Quantiles are stated in CENTILES (``qs_e2=[50, 90, 99]``) so the
    rank is pure integer arithmetic — 1-based rank = ceil(q_e2*n/100),
    which is quantile_disc's rule (verified against DuckDB for every
    n in 1..119 x 8 centiles; a float ``ceil(q*n)`` misselects when
    q*n lands on an epsilon, e.g. 0.9*10 = 9.000000000000002).

    Shape: per-batch (group, value) counts — the combiner bounds the
    exchange by the measure's distinct cardinality per group, never
    row count — then one candidates-only exchange and a per-group
    sorted cumsum walk. Exactness is therefore affordable whenever the
    measure is discrete/bounded (lengths, counts, scores in fixed
    units); an unbounded-cardinality measure at 100 TB wants a sketch
    (t-digest) instead, which trades this oracle-exactness away."""
    if mode not in ("disc", "cont"):
        raise ValueError(
            f"grouped_quantiles: unknown mode {mode!r} (disc|cont)"
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {group_col: [], value_col: [], "_n": pd.Series([], dtype="int64")}
            )
        c = (
            df.groupby([group_col, value_col], sort=False)
            .size()
            .rename("_n")
            .reset_index()
        )
        return c

    def reduce_shard(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby([group_col, value_col], sort=False)["_n"]
            .sum()
            .reset_index()
        )
        rows = []
        for grp, sub in agg.groupby(group_col, sort=False):
            sub = sub.sort_values(value_col)
            cum = sub["_n"].cumsum().to_numpy()
            vals = sub[value_col].to_numpy()
            n = int(cum[-1])
            row = {group_col: grp}
            for q in qs_e2:
                if mode == "disc":
                    rank = max(1, -(-q * n // 100))  # exact ceil, 1-based
                    row[f"p{q:02d}"] = int(vals[np.searchsorted(cum, rank)])
                else:
                    # quantile_cont: 0-based position h = q·(n-1),
                    # linear interpolation between the straddling order
                    # statistics. lo/rem are EXACT integers (q_e2·(n-1)
                    # split by //100 and %100), so the straddle indices
                    # can't misselect on a float epsilon; the residual
                    # frac division is the same double both engines
                    # compute, and the gate rounds floats to 4dp.
                    num = q * (n - 1)
                    lo, rem = num // 100, num % 100
                    v_lo = float(vals[np.searchsorted(cum, lo + 1)])
                    v_hi = float(vals[np.searchsorted(cum, lo + 2)]) if rem else v_lo
                    row[f"p{q:02d}"] = v_lo + (rem / 100.0) * (v_hi - v_lo)
            rows.append(row)
        return pd.DataFrame(rows)

    def fold_counts(g: pd.DataFrame) -> pd.DataFrame:
        # coalescing pre-sum (same associative fold as the reducer):
        # shard-task input bounded by distinct (group, value) per
        # coalesced batch, not per block
        return (
            g.groupby([group_col, value_col], sort=False, as_index=False)[
                "_n"
            ].sum()
        )

    part = ds.map_batches(partial, batch_format="pandas").map_batches(
        fold_counts, batch_format="pandas", batch_size=65536
    )
    return shard_exchange(part, [group_col], reduce_shard, shards)
