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


# ------------------------------------------------ mergeable quantile sketch


def test_qsketch_small_group_is_exact():
    from cosmwasm_etl_ray.functions.approx import qsketch_estimate, qsketch_partial

    v = np.arange(100, dtype=np.float64)
    p = qsketch_partial(np.array(["a"] * 100, dtype=object), v)
    est = qsketch_estimate(p, [50, 90]).set_index("g")
    # n <= k+1 keeps every value: DISC-exact (rank ceil(q*n))
    assert est.loc["a", "p50"] == v[49]
    assert est.loc["a", "p90"] == v[89]


def test_qsketch_rank_error_bound_across_blocks():
    from cosmwasm_etl_ray.functions.approx import qsketch_estimate, qsketch_partial

    rng = np.random.RandomState(3)
    vals = rng.lognormal(3, 1.2, 60000)
    g = np.array(["x"] * 60000, dtype=object)
    parts = [
        qsketch_partial(g[s : s + 4096], vals[s : s + 4096])
        for s in range(0, 60000, 4096)
    ]
    est = qsketch_estimate(pd.concat(parts), [50, 90, 99]).set_index("g")
    v = np.sort(vals)
    for q in (50, 90, 99):
        e = est.loc["x", f"p{q:02d}"]
        rank = np.searchsorted(v, e, side="right") / len(v)
        assert abs(rank - q / 100) < 0.01, (q, rank)


def test_grouped_quantile_sketch_distributed(ray_session):
    from cosmwasm_etl_ray.functions.approx import (
        grouped_quantile_sketch,
        qsketch_partial,
    )

    rng = np.random.RandomState(9)
    df = pd.DataFrame(
        {
            "t": np.repeat(["u", "w"], 5000),
            "value": rng.exponential(10, 10000),
        }
    )

    def part(b):
        return qsketch_partial(b["t"].to_numpy(), b["value"].to_numpy())

    out = grouped_quantile_sketch(
        ray.data.from_pandas(df).repartition(7), part, [50, 95]
    ).set_index("g")
    for g in ("u", "w"):
        v = np.sort(df.loc[df["t"] == g, "value"].to_numpy())
        for q in (50, 95):
            rank = np.searchsorted(v, out.loc[g, f"p{q:02d}"], side="right") / len(v)
            assert abs(rank - q / 100) < 0.02


# ------------------------------------------------- heavy hitters (MG)


def test_mg_compress_keeps_frequent_keys():
    from cosmwasm_etl_ray.functions.approx import mg_compress

    # 5 heavy keys (100 each) in a sea of 500 singletons
    c = pd.Series(
        np.r_[np.full(5, 100), np.ones(500)].astype(np.int64),
        index=[f"k{i}" for i in range(505)],
    )
    out = mg_compress(c, 16)
    assert len(out) <= 16
    assert set(f"k{i}" for i in range(5)) <= set(out.index)
    # undercount per compression <= n/(k+1)
    n = int(c.sum())
    assert (c.reindex(out.index) - out).max() <= n / 17


def test_heavy_hitters_exact_on_planted_stream(ray_session):
    from cosmwasm_etl_ray.functions.approx import heavy_hitters

    rng = np.random.RandomState(2)
    # 20% 'hot', 10% 'warm', rest spread over 5000 cold keys
    keys = np.r_[
        np.repeat(["hot"], 8000),
        np.repeat(["warm"], 4000),
        rng.choice([f"c{i}" for i in range(5000)], 28000),
    ]
    rng.shuffle(keys)
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys})).repartition(11)
    out = heavy_hitters(ds, key_fn=lambda df: df["k"], phi_e4=500)
    assert list(out["key"]) == ["hot", "warm"]
    assert list(out["n_events"]) == [8000, 4000]
    assert list(out["share_e4"]) == [2000, 1000]


def test_heavy_hitters_rejects_sub_bound_phi(ray_session):
    import pytest

    from cosmwasm_etl_ray.functions.approx import heavy_hitters

    ds = ray.data.from_pandas(pd.DataFrame({"k": ["a", "b"]}))
    with pytest.raises(AssertionError):
        heavy_hitters(ds, key_fn=lambda df: df["k"], phi_e4=10, k=256)


def test_partials_tolerate_empty_batches():
    from cosmwasm_etl_ray.functions.approx import (
        hll_partial,
        qsketch_partial,
    )
    from cosmwasm_etl_ray.functions.hashing import stable_hash64

    es = np.array([], dtype=object)
    p = hll_partial(es, stable_hash64(es))
    assert list(p.columns) == ["g", "reg", "rho"] and len(p) == 0
    q = qsketch_partial(es, np.array([], dtype=np.float64))
    assert list(q.columns) == ["g", "v", "w"] and len(q) == 0


# ------------------------------------------------------------- Bloom filter


def test_bloom_no_false_negatives_and_fp_rate():
    import numpy as np

    from cosmwasm_etl_ray.functions.approx import (
        bloom_from_positions,
        bloom_positions,
        bloom_probe,
    )

    vals = np.array([f"g {i} x" for i in range(20000)], dtype=object)
    w = bloom_from_positions(bloom_positions(vals))
    assert bloom_probe(w, vals).all()  # never a false negative
    other = np.array([f"h {i} y" for i in range(100000)], dtype=object)
    assert bloom_probe(w, other).mean() < 1e-3


def test_bloom_fold_is_order_free_and_idempotent():
    import numpy as np

    from cosmwasm_etl_ray.functions.approx import (
        bloom_from_positions,
        bloom_positions,
    )

    a = np.array(["p", "q", "r"], dtype=object)
    b = np.array(["r", "s"], dtype=object)
    wa = bloom_from_positions(bloom_positions(a))
    wb = bloom_from_positions(bloom_positions(b))
    both = bloom_from_positions(bloom_positions(np.concatenate([a, b])))
    assert ((wa | wb) == both).all()
    assert ((wb | wa) == both).all()
    assert ((both | wa) == both).all()  # idempotent under re-fold


def test_build_bloom_distributed_matches_local(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from cosmwasm_etl_ray.functions.approx import (
        bloom_from_positions,
        bloom_positions,
        build_bloom,
    )

    vals = [f"tok {i}" for i in range(5000)]
    ds = ray.data.from_pandas(pd.DataFrame({"gram": vals})).repartition(7)
    w = build_bloom(ds, "gram")
    local = bloom_from_positions(bloom_positions(np.array(vals, dtype=object)))
    assert (w == local).all()


def test_sketches_empty_input(ray_session):
    """The idle/all-filtered cases return typed empties instead of
    KeyError (HLL, quantile sketch, heavy hitters)."""
    import pandas as pd
    import ray.data

    from cosmwasm_etl_ray.functions.approx import (
        approx_distinct,
        grouped_quantile_sketch,
        heavy_hitters,
        hll_partial,
        qsketch_partial,
    )
    from cosmwasm_etl_ray.functions.hashing import stable_hash64

    ds = ray.data.from_pandas(
        pd.DataFrame({"g": ["x"], "v": [1.0]})
    ).map_batches(lambda df: df[df["v"] > 99], batch_format="pandas")

    def hpart(df):
        return hll_partial(df["g"].to_numpy(), stable_hash64(df["g"].to_numpy()))

    out = approx_distinct(ds, hpart)
    assert list(out.columns) == ["g", "hll_est"] and len(out) == 0

    def qpart(df):
        return qsketch_partial(df["g"].to_numpy(), df["v"].to_numpy())

    out = grouped_quantile_sketch(ds, qpart, qs_e2=[50])
    assert list(out.columns) == ["g", "p50"] and len(out) == 0

    out = heavy_hitters(ds, key_fn=lambda d: d["g"], phi_e4=100)
    assert len(out) == 0


def test_probe_minhash_index_empty_increment(ray_session, tmp_path):
    import pandas as pd
    import ray.data

    from cosmwasm_etl_ray.functions.sketch_index import (
        build_minhash_index,
        probe_minhash_index,
    )

    docs = ray.data.from_pandas(
        pd.DataFrame(
            {"doc_id": pd.Series([1, 2], dtype="int64"),
             "text": ["a b c d e", "f g h i j"]}
        )
    )
    d = str(tmp_path / "idx")
    build_minhash_index(docs, d)
    empty = docs.map_batches(
        lambda df: df[df["doc_id"] > 99], batch_format="pandas"
    )
    out = probe_minhash_index(d, empty).to_pandas()
    assert len(out) == 0
