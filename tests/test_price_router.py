"""Price/router derived stage: incremental == one-shot under epoch
barriers, carry-over across epochs, route rebuild only on edge-set
change, DAG gating of downstream tasks on the price cursor."""

import os

import numpy as np
import pandas as pd
import pytest

import ray.data

from cosmwasm_etl_ray.config import EngineConfig, GeneratorConfig
from cosmwasm_etl_ray.pipelines.price import (
    PriceTask,
    rel_size_stream,
    repo_lang_graph,
    routed_prices,
    shortest_routes,
)
from cosmwasm_etl_ray.pipelines.replay import replay_files
from cosmwasm_etl_ray.sources.generator import generate_change_stream
from cosmwasm_etl_ray.state.manifest import StateStore

CFG = EngineConfig(num_partitions=8, epoch_max_events=15_000, batch_size=4096)
BASE = "repo_1"  # the zipf-hot repo: active from the first events


@pytest.fixture(scope="module")
def replayed(tmp_path_factory):
    root = tmp_path_factory.mktemp("price")
    log = generate_change_stream(
        str(root / "log"),
        GeneratorConfig(
            seed=71, n_keys=800, n_events=60_000, events_per_file=7_500,
            malformed_frac=0.002, evolve_at_frac=None,
        ),
    )
    store = StateStore(str(root / "store"))
    replay_files(log["files"], store, CFG)
    return log, store


def _valid_changes(log) -> "ray.data.Dataset":
    import pyarrow.compute as pc

    def ok(t):
        m = pc.match_substring_regex(t["commit"], r"^[0-9]+$")
        return t.filter(pc.fill_null(m, False))

    return ray.data.read_parquet(log["files"]).map_batches(ok, batch_format="pyarrow")


def test_price_task_incremental_equals_oneshot(replayed):
    """Epoch-boundary invariance of the cross-key stage: per-epoch
    processing with carried state reproduces the single-pass stream."""
    log, store = replayed
    task = PriceTask(store, CFG, base=BASE)
    done = task.run()
    assert done == store.committed_epochs()

    got = (
        task.view()
        .sort_values(["commit"], kind="stable")
        .reset_index(drop=True)
    )
    expect = (
        rel_size_stream(_valid_changes(log), base=BASE)
        .to_pandas()
        .sort_values(["commit"], kind="stable")
        .reset_index(drop=True)
    )
    assert len(got) == len(expect) > 0
    pd.testing.assert_frame_equal(got, expect[got.columns.tolist()])


def test_price_task_rerun_is_incremental_noop(replayed):
    log, store = replayed
    task = PriceTask(store, CFG, base=BASE)
    task.run()
    assert task.run() == []  # cursor says done


def test_routes_deterministic_and_reachable(replayed):
    log, store = replayed
    from cosmwasm_etl_ray.pipelines.replay import read_state

    edges, sizes = repo_lang_graph(read_state(store))
    routes = shortest_routes(edges, base=BASE)
    assert len(routes) > 0
    # every route starts at its repo, ends at base, alternates repo/lang
    for r in routes.itertuples():
        nodes = r.route.split("->")
        assert nodes[0] == r.repo and nodes[-1] == BASE
        assert r.hops == len(nodes) - 1
        assert all(n.startswith("lang:") for n in nodes[1:-1:2])
    # deterministic across recomputation
    routes2 = shortest_routes(edges, base=BASE)
    pd.testing.assert_frame_equal(routes, routes2)

    prices = routed_prices(routes, sizes, base=BASE)
    per_repo = dict(zip(sizes["node"], sizes["chars"]))
    for p in prices.itertuples():
        assert p.price == per_repo[p.repo] / per_repo[BASE]


def test_route_table_rebuilt_only_on_edge_change(replayed):
    """A routes file exists at exactly the epochs whose edge-set key
    differs from the previous epoch's (ST4: rebuild on key-space
    change, never redundantly)."""
    import json

    log, store = replayed
    task = PriceTask(store, CFG, base=BASE)
    task.run()
    epochs = store.committed_epochs()
    keys = []
    for e in epochs:
        with open(task._carry_path(e)) as f:
            keys.append(json.load(f)["edges_key"])
    expected_rebuilds = [
        e for i, e in enumerate(epochs) if i == 0 or keys[i] != keys[i - 1]
    ]
    route_epochs = sorted(
        int(f.split("=")[1].split(".")[0])
        for f in os.listdir(task.root)
        if f.startswith("routes=")
    )
    assert route_epochs == expected_rebuilds
    assert len(task.latest_routes()) > 0


def test_lang_window_stats_gated_on_price_cursor(replayed):
    """Child task never runs ahead of its parent's cursor (the
    waitUntilReachingHeight analogue)."""
    log, store = replayed
    from cosmwasm_etl_ray.pipelines.aggregator import LangWindowStatsTask

    child = LangWindowStatsTask(store, CFG)
    assert child.run(parent_cursor=1) == [0, 1]  # parent only reached 1
    assert child.cursor() == 1
    assert child.run(parent_cursor=None) == store.committed_epochs()[2:]


def test_price_task_crash_resume(replayed):
    """Carry is written before the epoch parquet (the cursor): a crash
    between the two reprocesses the epoch deterministically."""
    import glob

    log, store = replayed
    task = PriceTask(store, CFG, base=BASE)
    task.run()
    full = task.view()

    # simulate the crash: last epoch's output dir (cursor) vanishes,
    # the carry file survives
    import shutil

    last = task.cursor()
    shutil.rmtree(task._out(last))
    assert task.cursor() == last - 1

    resumed = PriceTask(store, CFG, base=BASE)
    assert resumed.run() == [last]  # exactly the lost epoch reruns
    pd.testing.assert_frame_equal(resumed.view(), full)


def test_price_direct_matches_dataset(replayed, tmp_path):
    """The raw-task direct exchange and the Dataset (hash_join +
    sharded_map_groups) shape must produce identical per-event output,
    carries, and routes for every epoch."""
    log, store = replayed
    outs = {}
    for mode in ("direct", "dataset"):
        cfg = EngineConfig(
            num_partitions=8, epoch_max_events=15_000, batch_size=4096,
            price_exchange=mode,
        )
        s2 = StateStore(str(store.root))
        task = PriceTask.__new__(PriceTask)
        task.store, task.cfg, task.base = s2, cfg, BASE
        task.root = str(tmp_path / f"price_{mode}")
        os.makedirs(task.root, exist_ok=True)
        task.run()
        outs[mode] = (
            task.view().sort_values(["commit", "repo"], kind="stable")
            .reset_index(drop=True),
            task.latest_routes(),
        )
    pd.testing.assert_frame_equal(outs["direct"][0], outs["dataset"][0])
    pd.testing.assert_frame_equal(outs["direct"][1], outs["dataset"][1])


def test_valid_events_matches_replay_predicate():
    """The price task must drop exactly what the replay quarantines:
    a null-repo row that slips through crashes the dataset path's
    cumsum int cast and mis-seeds the direct path's carry
    (factorize code -1 indexes the last real repo)."""
    import pyarrow as pa

    from cosmwasm_etl_ray.pipelines.price import _valid_events
    from cosmwasm_etl_ray.stages.normalize import _valid_mask

    t = pa.table(
        {
            "repo": ["r", None, "r", "r", "r"],
            "path": ["p", "p", None, "p", "p"],
            "commit": ["0001", "0002", "0003", "bad", "0005"],
            "content": ["a"] * 5,
            "op": ["insert", "update", "update", "update", "weird"],
        }
    )
    out = _valid_events(t)
    assert out.num_rows == 1  # only the fully-valid first row
    assert out.num_rows == _valid_mask(t).to_pandas().sum()
