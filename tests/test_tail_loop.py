"""Tail loop: picks up files appearing between polls, idle exit,
error backoff, derived tasks run per tick."""

import shutil

import pandas as pd
import pytest

from cosmwasm_etl_ray.config import EngineConfig, GeneratorConfig
from cosmwasm_etl_ray.pipelines.aggregator import WindowStatsTask
from cosmwasm_etl_ray.pipelines.replay import read_state
from cosmwasm_etl_ray.sources.generator import generate_change_stream
from cosmwasm_etl_ray.sources.tail import tail_changes
from cosmwasm_etl_ray.state.manifest import StateStore

CFG = EngineConfig(num_partitions=4, epoch_max_events=10_000, batch_size=4096)


def test_tail_picks_up_appended_files(tmp_path):
    src = tmp_path / "staging"
    log_dir = tmp_path / "log"
    log_dir.mkdir()
    info = generate_change_stream(
        str(src),
        GeneratorConfig(seed=31, n_keys=400, n_events=40_000, events_per_file=10_000,
                        malformed_frac=0.0, evolve_at_frac=None),
    )
    files = sorted(info["files"])
    # first two files exist before the tail starts
    for f in files[:2]:
        shutil.copy(f, log_dir)

    appended = {"i": 2}

    def sleeper(_):
        # the "upstream collector": appends one file per poll
        if appended["i"] < len(files):
            shutil.copy(files[appended["i"]], log_dir)
            appended["i"] += 1

    store = StateStore(str(tmp_path / "store"))
    summary = tail_changes(
        str(log_dir), store, CFG, max_idle_polls=2, sleep=sleeper
    )
    assert summary["applied_epochs"] == 4  # all four files, one epoch each
    assert summary["stopped"] == "idle"
    assert store.latest_epoch() == 3
    assert read_state(store).count() > 0
    # derived tasks followed the tail
    assert WindowStatsTask(store, CFG).cursor() == 3


def test_tail_error_backoff_then_raise(tmp_path):
    store = StateStore(str(tmp_path / "store"))
    sleeps = []

    class Boom(Exception):
        pass

    calls = {"n": 0}

    import cosmwasm_etl_ray.sources.tail as tailmod

    orig = tailmod.replay_files

    def failing(files, store, cfg):
        calls["n"] += 1
        raise Boom("source down")

    tailmod.replay_files = failing
    try:
        with pytest.raises(Boom):
            tail_changes(
                str(tmp_path), store, CFG, err_tolerance=2, sleep=sleeps.append
            )
    finally:
        tailmod.replay_files = orig
    assert calls["n"] == 3  # initial + 2 tolerated retries
    assert sleeps == [1.0, 2.0]  # exponential backoff 0.5*2^n


def test_tiered_source_fallback_once_per_chunk(tmp_path):
    import pyarrow as pa
    from cosmwasm_etl_ray.sources.tiered import TieredSource

    calls = []

    def fetch(chunk_id):
        calls.append(chunk_id)
        return pa.table({"repo": [f"r{chunk_id}"], "path": ["p"],
                         "commit": [f"{chunk_id:010d}"], "lang": ["go"],
                         "content": ["x"], "op": ["insert"]})

    src = TieredSource(str(tmp_path / "staging"), fetch)
    ds = src.read_range(0, 3)
    assert ds.count() == 4
    assert calls == [0, 1, 2, 3]
    # second read: fully staged, no fallback
    ds2 = src.read_range(0, 3)
    assert ds2.count() == 4
    assert calls == [0, 1, 2, 3]
    assert src.fallback_calls == 4
    # partial extension: only the new chunk is fetched
    src.read_range(2, 5)
    assert calls == [0, 1, 2, 3, 4, 5]


def test_paginated_backfill_resumable_and_retrying(tmp_path):
    """S6: pages staged before the offset marker advances; a crash
    mid-backfill resumes at the stored offset without refetching
    completed pages; transient errors retry with backoff."""
    import pyarrow as pa

    from cosmwasm_etl_ray.sources.tiered import PaginatedBackfill

    fetched = []
    fail_once = {10: True}  # one transient failure at offset 10

    def fetch_page(offset):
        if fail_once.pop(offset, False):
            raise ConnectionError("503")
        fetched.append(offset)
        table = pa.table({"offset": [offset] * 3, "v": list(range(3))})
        nxt = offset + 10 if offset < 40 else None
        return table, nxt

    sleeps = []
    bf = PaginatedBackfill(str(tmp_path / "bf"), fetch_page, sleep=sleeps.append)
    # "crash" after two pages
    files = bf.run(max_pages=2)
    assert len(files) == 2 and bf.collected_offset() == 20
    assert sleeps == [0.5]  # the offset-10 retry backoff

    # resume: only the remaining pages are fetched
    bf2 = PaginatedBackfill(str(tmp_path / "bf"), fetch_page, sleep=sleeps.append)
    files = bf2.run()
    assert bf2.collected_offset() is None  # complete
    assert [f.split("page-")[1][:10] for f in files] == [
        "0000000000", "0000000010", "0000000020", "0000000030", "0000000040"
    ]
    assert fetched == [0, 10, 20, 30, 40]  # every page fetched exactly once


def test_tail_runs_periodic_validation(tmp_path):
    """The validation cadence fires every validation_interval_epochs
    committed epochs: snapshot written, zero mismatches on a healthy
    store."""
    import glob
    import os

    from cosmwasm_etl_ray.config import EngineConfig

    log = generate_change_stream(
        str(tmp_path / "log"),
        GeneratorConfig(seed=33, n_keys=200, n_events=20_000, events_per_file=5_000,
                        malformed_frac=0.0, evolve_at_frac=None),
    )
    cfg = EngineConfig(num_partitions=4, epoch_max_events=5_000,
                       validation_interval_epochs=2)
    store = StateStore(str(tmp_path / "store"))
    summary = tail_changes(str(tmp_path / "log"), store, cfg,
                           max_idle_polls=1, sleep=lambda _: None)
    assert summary["applied_epochs"] == 4
    assert summary["validations"] >= 1
    assert summary["validation_mismatches"] == 0
    assert glob.glob(os.path.join(store.root, "snapshots", "*.parquet"))


def test_tail_derived_and_count_survive_transient_error(tmp_path):
    """A transient failure AFTER replay_files commits its epochs must
    not lose those epochs' derived tick or their applied count: the
    next tick re-runs the pending derived work even though replay_files
    returns [] for the already-committed epochs."""
    import cosmwasm_etl_ray.sources.tail as tailmod

    log = generate_change_stream(
        str(tmp_path / "log"),
        GeneratorConfig(seed=41, n_keys=200, n_events=20_000, events_per_file=5_000,
                        malformed_frac=0.0, evolve_at_frac=None),
    )
    store = StateStore(str(tmp_path / "store"))

    class Boom(Exception):
        pass

    orig = tailmod.run_all_tasks
    calls = {"n": 0}

    def flaky_derived(store, cfg):
        calls["n"] += 1
        if calls["n"] == 1:
            raise Boom("transient")
        return orig(store, cfg)

    tailmod.run_all_tasks = flaky_derived
    try:
        summary = tail_changes(
            str(tmp_path / "log"), store, CFG,
            max_idle_polls=2, err_tolerance=2, sleep=lambda _: None,
        )
    finally:
        tailmod.run_all_tasks = orig

    assert calls["n"] >= 2  # the failed tick re-armed, then succeeded
    assert summary["applied_epochs"] == 2  # counted at commit, not after derived
    assert WindowStatsTask(store, CFG).cursor() == store.latest_epoch()
