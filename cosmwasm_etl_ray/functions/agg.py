"""Map-side partial aggregation (the combiner pattern for groupbys).

A bare ``groupby(key).aggregate(...)`` sort-shuffles every row. When
group cardinality is small (stats tables, per-repo rollups), computing
per-batch partials inside ``map_batches`` and reducing the tiny partial
set is 5-20× faster and shuffles ~nothing. This is the same
partial/final structure the merge fold uses, applied to sums.

``grouped_agg`` supports sum / count / min / max / mean (mean
decomposes into sum+count partials). The final reduce runs driver-side
on the partials (bounded by groups × batches — use only when group
cardinality is small; for high-cardinality keys keep the shuffle).
"""

from __future__ import annotations

import pandas as pd

import ray.data

_PARTIAL_OPS = {"sum": "sum", "count": "count", "min": "min", "max": "max"}


def grouped_agg(
    ds: "ray.data.Dataset",
    keys: list[str],
    spec: dict[str, tuple[str, str]],
    batch_size: int = 65536,
) -> pd.DataFrame:
    """spec: output_col → (source_col, op) with op ∈ sum|count|min|max|mean.
    Returns a pandas DataFrame (small by contract)."""
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

    partials = ds.map_batches(
        partial, batch_format="pandas", batch_size=batch_size
    ).to_pandas()

    g = partials.groupby(keys, sort=False)
    final = {}
    for out, (src, op) in plan.items():
        if op in ("sum", "count"):
            final[out] = g[out].sum()
        else:
            final[out] = getattr(g[out], op)()
    res = pd.DataFrame(final).reset_index()
    for out, sum_col in means.items():
        res[out] = res[sum_col] / res["__n"]
        res = res.drop(columns=[sum_col])
    for out, (src, op) in spec.items():
        if op == "count":
            res[out] = res["__n"]
    if "__n" in res.columns:
        res = res.drop(columns=["__n"])
    # order columns as spec
    return res[keys + list(spec.keys())]
