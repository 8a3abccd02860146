"""HyperLogLog approximate-distinct: fold laws and accuracy bars."""

import numpy as np
import pandas as pd
import ray.data

from cosmwasm_etl_ray.functions.approx import (
    HLL_M,
    approx_distinct,
    hll_estimate,
    hll_partial,
)
from cosmwasm_etl_ray.functions.hashing import stable_hash64


def _est(values, group="g"):
    g = np.array([group] * len(values), dtype=object)
    p = hll_partial(g, stable_hash64(np.asarray(values, dtype=object)))
    merged = p.groupby(["g", "reg"], sort=False)["rho"].max().reset_index()
    return float(hll_estimate(merged)["hll_est"][0])


def test_hll_accuracy_bands():
    for n, bar in ((100, 0.12), (2000, 0.05), (50000, 0.05)):
        est = _est([f"v{i}" for i in range(n)])
        assert abs(est / n - 1) < bar, (n, est)


def test_hll_merge_is_partition_invariant():
    vals = np.array([f"x{i}" for i in range(5000)], dtype=object)
    g = np.array(["a"] * 5000, dtype=object)
    h = stable_hash64(vals)
    whole = hll_partial(g, h)
    # fold the same data in 7 arbitrary slices (with overlap = retry)
    parts = [hll_partial(g[s], h[s]) for s in
             (slice(0, 1000), slice(500, 2500), slice(2500, 5000),
              slice(0, 5000, 2), slice(1, 5000, 2), slice(4000, 5000),
              slice(0, 100))]
    merged = (
        pd.concat([whole] + parts)
        .groupby(["g", "reg"], sort=False)["rho"].max().reset_index()
    )
    base = whole.groupby(["g", "reg"], sort=False)["rho"].max().reset_index()
    # idempotent + commutative fold: duplicates and overlap change nothing
    a = hll_estimate(merged)["hll_est"][0]
    b = hll_estimate(base)["hll_est"][0]
    assert a == b


def test_hll_register_rows_bounded():
    p = hll_partial(
        np.array(["a", "b"] * 50000, dtype=object),
        stable_hash64(np.arange(100000)),
    )
    assert len(p) <= 2 * HLL_M


def test_approx_distinct_distributed_matches_local(ray_session):
    df = pd.DataFrame(
        {
            "grp": np.repeat(["p", "q"], 3000),
            "val": [f"s{i % 2200}" for i in range(6000)],
        }
    )

    def part(b: pd.DataFrame) -> pd.DataFrame:
        return hll_partial(
            b["grp"].to_numpy(), stable_hash64(b["val"].to_numpy())
        )

    out = approx_distinct(ray.data.from_pandas(df).repartition(9), part)
    local_p = _est(df.loc[df["grp"] == "p", "val"].unique())
    got_p = float(out.loc[out["g"] == "p", "hll_est"].iloc[0])
    assert got_p == local_p  # identical, not merely close: order-free fold
    exact_p = df.loc[df["grp"] == "p", "val"].nunique()
    assert abs(got_p / exact_p - 1) < 0.08
