"""Incremental derived-table tasks: incremental == one-shot, carry-in,
idempotent re-run, parent-epoch coordination, sliding-window prune."""

import os

import pandas as pd
import pytest

from cosmwasm_etl_ray.config import EngineConfig, GeneratorConfig
from cosmwasm_etl_ray.pipelines.aggregator import (
    RepoHistoryTask,
    WindowStatsTask,
    run_all_tasks,
)
from cosmwasm_etl_ray.pipelines.replay import plan_epochs, replay_files
from cosmwasm_etl_ray.sources.generator import generate_change_stream
from cosmwasm_etl_ray.state.manifest import StateStore

CFG = EngineConfig(num_partitions=8, epoch_max_events=25_000, batch_size=4096)


@pytest.fixture(scope="module")
def replayed(tmp_path_factory):
    root = tmp_path_factory.mktemp("agg")
    log = generate_change_stream(
        str(root / "log"),
        GeneratorConfig(
            seed=29, n_keys=1_500, n_events=100_000, events_per_file=12_500,
            malformed_frac=0.002, evolve_at_frac=None,
        ),
    )
    store = StateStore(str(root / "store"))
    replay_files(log["files"], store, CFG)
    return log, store


def _oneshot(log) -> pd.DataFrame:
    raw = pd.concat([pd.read_parquet(f) for f in log["files"]], ignore_index=True)
    raw = raw[raw["commit"].str.fullmatch(r"[0-9]+")]
    raw["window"] = pd.to_numeric(raw["commit"]) // 20_000
    g = raw.groupby(["repo", "window"], as_index=False).agg(
        n_events=("op", "size"),
        n_deletes=("op", lambda s: int((s == "delete").sum())),
        content_bytes=("content", lambda s: int(s.str.len().sum())),
    )
    return g.sort_values(["repo", "window"]).reset_index(drop=True)


def test_incremental_window_stats_equals_oneshot(replayed):
    log, store = replayed
    task = WindowStatsTask(store, CFG, window=20_000)
    done = task.run()
    assert done == store.committed_epochs()
    got = task.view()
    expect = _oneshot(log)
    pd.testing.assert_frame_equal(
        got.astype({"n_events": "int64", "n_deletes": "int64"}),
        expect.astype({"n_events": "int64", "n_deletes": "int64"}),
        check_dtype=False,
    )
    # idempotent: second run processes nothing, view unchanged
    assert task.run() == []
    pd.testing.assert_frame_equal(task.view(), got, check_dtype=False)


def test_repo_history_carry_in_matches_totals(replayed):
    log, store = replayed
    task = RepoHistoryTask(store, CFG)
    task.run()
    got = task.view()
    expect = (
        _oneshot(log)
        .groupby("repo", as_index=False)["n_events"]
        .sum()
        .rename(columns={"n_events": "cum_events"})
        .sort_values("repo")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)
    # per-epoch rows are monotone per repo (prefix-sum property)
    for e in store.committed_epochs():
        df = pd.read_parquet(task._epoch_out(e))
        assert (df.groupby("repo")["cum_events"].diff().dropna() >= 0).all()


def test_derived_crash_resume(replayed):
    log, store = replayed
    task = WindowStatsTask(store, CFG, window=20_000)
    task.run()
    before = task.view()
    last = task.cursor()
    os.remove(task._epoch_out(last))  # simulate crash before commit
    assert task.cursor() == last - 1
    assert task.run() == [last]
    pd.testing.assert_frame_equal(task.view(), before, check_dtype=False)


def test_task_never_runs_ahead_of_parent(tmp_path):
    """A derived task with no committed replay epochs does nothing —
    the parent-wait (waitUntilReachingHeight) analogue."""
    store = StateStore(str(tmp_path / "empty"))
    assert run_all_tasks(store, CFG) == {
        "window_stats": [], "repo_history": [], "distinct_paths": [],
        "price": [], "lang_window_stats": [],
    }


def test_recent_view_prunes_old_windows(replayed):
    log, store = replayed
    task = WindowStatsTask(store, CFG, window=20_000)
    task.run()
    full = task.view()
    recent = task.recent_view(last_windows=1)
    assert recent["window"].min() == full["window"].max()
    assert len(recent) < len(full)


def test_lang_window_stats_two_dim_key(replayed):
    from cosmwasm_etl_ray.pipelines.aggregator import LangWindowStatsTask

    log, store = replayed
    task = LangWindowStatsTask(store, CFG, window=20_000)
    task.run()
    got = task.view()
    raw = pd.concat([pd.read_parquet(f) for f in log["files"]], ignore_index=True)
    raw = raw[raw["commit"].str.fullmatch(r"[0-9]+")]
    raw["window"] = pd.to_numeric(raw["commit"]) // 20_000
    expect = (
        raw.groupby(["lang", "window"], as_index=False)
        .agg(n_events=("op", "size"),
             n_deletes=("op", lambda s: int((s == "delete").sum())),
             content_bytes=("content", lambda s: int(s.str.len().sum())))
        .sort_values(["lang", "window"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


def test_epoch_source_files_skips_inflight_tmp(tmp_path):
    """A concurrent writer's 'x.parquet.tmp.<pid>' sorts inside the
    bare lexical [lo, hi] range — the range scan must take only
    committed .parquet files."""
    from cosmwasm_etl_ray.pipelines.aggregator import _epoch_source_files

    d = tmp_path / "log"
    d.mkdir()
    for n in ("f001.parquet", "f002.parquet", "f004.parquet"):
        (d / n).write_bytes(b"x")
    (d / "f002.parquet.tmp.9912").write_bytes(b"partial")
    files = _epoch_source_files(
        {"offset_range": (str(d / "f001.parquet"), str(d / "f004.parquet"))}
    )
    assert [f.rsplit("/", 1)[1] for f in files] == [
        "f001.parquet", "f002.parquet", "f004.parquet"
    ]


def test_empty_epoch_partial_keeps_numeric_dtypes(replayed):
    """A file-less epoch (quarantine/repair) commits a TYPED empty
    partial: an object-dtype empty parquet would poison view()'s
    concat to object for every numeric column."""
    from cosmwasm_etl_ray.pipelines.aggregator import WindowStatsTask

    log, store = replayed
    task = WindowStatsTask(store, CFG)
    task.run()
    before = task.view()
    # simulate a quarantine-style epoch with no source-file range
    fake_epoch = (store.latest_epoch() or 0) + 1000
    task.process_epoch(fake_epoch, {"offset_range": ("quarantine", "quarantine")})
    import pandas as pd
    empty = pd.read_parquet(task._epoch_out(fake_epoch))
    assert empty.empty
    for c in ("window", "n_events", "n_deletes", "content_bytes"):
        assert empty[c].dtype == "int64", (c, empty[c].dtype)
    merged = pd.concat([empty, before], ignore_index=True)
    assert merged["n_events"].dtype == "int64"


# ------------------------------------------- sketch-as-state (HLL task)


def test_distinct_paths_task_epoch_fold_equals_oneshot(replayed):
    import numpy as np

    from cosmwasm_etl_ray.functions.approx import hll_estimate, hll_partial
    from cosmwasm_etl_ray.functions.hashing import stable_hash64
    from cosmwasm_etl_ray.pipelines.aggregator import DistinctPathsTask

    log, store = replayed
    task = DistinctPathsTask(store, CFG)
    done = task.run()
    assert done == store.committed_epochs()
    got = task.view().set_index("repo")["distinct_paths_est"]

    raw = pd.concat(
        [pd.read_parquet(f) for f in log["files"]], ignore_index=True
    )
    p = hll_partial(
        raw["repo"].to_numpy(), stable_hash64(raw["path"].to_numpy())
    )
    merged = p.groupby(["g", "reg"], as_index=False)["rho"].max()
    oneshot = hll_estimate(merged).set_index("g")["hll_est"]
    # register fold across epochs == one pass over everything: IDENTICAL
    assert sorted(got.index) == sorted(oneshot.index)
    assert (got.reindex(oneshot.index).to_numpy()
            == oneshot.to_numpy()).all()
    # and the estimate is actually close to the exact distinct
    exact = raw.groupby("repo")["path"].nunique()
    big = exact[exact >= 500]
    rel = np.abs(got.reindex(big.index).to_numpy() / big.to_numpy() - 1)
    assert (rel < 0.08).all()


def test_distinct_paths_task_reprocess_is_idempotent(replayed):
    from cosmwasm_etl_ray.pipelines.aggregator import DistinctPathsTask

    _, store = replayed
    task = DistinctPathsTask(store, CFG)
    task.run()
    before = task.view()
    # crash-recovery shape: re-run an already-committed epoch
    task.process_epoch(0, store.manifest(0))
    pd.testing.assert_frame_equal(task.view(), before)
