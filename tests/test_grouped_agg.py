"""grouped_agg (map-side partial aggregation) vs plain pandas."""

import numpy as np
import pandas as pd

import ray.data

from cosmwasm_etl_ray.functions.agg import grouped_agg


def test_grouped_agg_matches_pandas():
    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7, 10_000).astype(str),
            "k2": rng.integers(0, 3, 10_000),
            "x": rng.normal(size=10_000),
            "y": rng.integers(0, 100, 10_000),
        }
    )
    ds = ray.data.from_pandas(df).repartition(8)  # force multiple batches
    got = grouped_agg(
        ds,
        keys=["k", "k2"],
        spec={
            "sum_x": ("x", "sum"),
            "mean_x": ("x", "mean"),
            "n": ("x", "count"),
            "min_y": ("y", "min"),
            "max_y": ("y", "max"),
        },
        batch_size=1024,
    ).sort_values(["k", "k2"]).reset_index(drop=True)

    expect = (
        df.groupby(["k", "k2"], as_index=False)
        .agg(sum_x=("x", "sum"), mean_x=("x", "mean"), n=("x", "count"),
             min_y=("y", "min"), max_y=("y", "max"))
        .sort_values(["k", "k2"])
        .reset_index(drop=True)
    )
    expect["n"] = expect["n"].astype("int64")
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_grouped_agg_two_counts_and_only_counts():
    df = pd.DataFrame({"k": list("aabbc"), "v": [1, 2, 3, 4, 5]})
    ds = ray.data.from_pandas(df)
    got = grouped_agg(ds, keys=["k"], spec={"n1": ("v", "count"), "n2": ("k", "count")})
    assert got["n1"].tolist() == got["n2"].tolist() == [2, 2, 1]
