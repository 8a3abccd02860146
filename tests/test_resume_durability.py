"""Durable resume: epoch membership is decided by the committed
manifest's offset_range, never by re-planning epochs over the current
file list (a late-appended file used to be absorbed into an
already-committed partial epoch's slice and skipped forever).

Also: num_partitions is part of a store's identity and must not change
across resumes; GC must never delete an in-flight epoch's files.
"""

import glob
import os
import shutil

import pandas as pd
import pytest

from cosmwasm_etl_ray.config import EngineConfig, GeneratorConfig
from cosmwasm_etl_ray.pipelines.replay import (
    read_state,
    replay_files,
    serial_oracle_replay,
)
from cosmwasm_etl_ray.sources.generator import generate_change_stream
from cosmwasm_etl_ray.state.gc import gc_state
from cosmwasm_etl_ray.state.manifest import StateStore


@pytest.fixture(scope="module")
def four_files(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("resume_changes"))
    info = generate_change_stream(
        out,
        GeneratorConfig(seed=47, n_keys=600, n_events=40_000,
                        events_per_file=10_000, malformed_frac=0.0,
                        evolve_at_frac=None),
    )
    return sorted(info["files"])


def test_late_file_into_partial_epoch_not_skipped(four_files, tmp_path):
    """epoch_max_events=25k over 10k-row files → the second epoch is
    partially filled ([f2] alone). A file appended AFTER that epoch
    commits must start a NEW epoch, not vanish into the committed one."""
    cfg = EngineConfig(num_partitions=4, epoch_max_events=25_000, batch_size=4096)
    log_dir = tmp_path / "log"
    log_dir.mkdir()
    for f in four_files[:3]:
        shutil.copy(f, log_dir)

    store = StateStore(str(tmp_path / "store"))
    first = replay_files(sorted(glob.glob(str(log_dir / "*.parquet"))), store, cfg)
    assert len(first) == 2  # [f0,f1], [f2] — second epoch under-full

    shutil.copy(four_files[3], log_dir)  # the late file
    second = replay_files(sorted(glob.glob(str(log_dir / "*.parquet"))), store, cfg)
    assert len(second) == 1  # f3 becomes its own new epoch
    assert store.latest_epoch() == 2

    engine = read_state(store).to_pandas()
    oracle = serial_oracle_replay(
        pd.concat([pd.read_parquet(f) for f in four_files], ignore_index=True)
    )
    assert len(engine) == len(oracle)
    e = engine.set_index(["repo", "path"])["content"].to_dict()
    o = oracle.set_index(["repo", "path"])["content"].to_dict()
    assert e == o  # no lost or stale keys


def test_resume_cursor_file_missing_raises(four_files, tmp_path):
    cfg = EngineConfig(num_partitions=4, epoch_max_events=25_000, batch_size=4096)
    store = StateStore(str(tmp_path / "store"))
    replay_files(four_files[:2], store, cfg)
    with pytest.raises(ValueError, match="resume cursor"):
        replay_files([four_files[3]], store, cfg)  # f1 (the cursor) absent


def test_partition_count_change_refused(four_files, tmp_path):
    store = StateStore(str(tmp_path / "store"))
    replay_files(four_files[:2], store,
                 EngineConfig(num_partitions=4, epoch_max_events=15_000))
    assert store.manifest(store.latest_epoch())["num_partitions"] == 4
    with pytest.raises(ValueError, match="num_partitions"):
        replay_files(four_files, store,
                     EngineConfig(num_partitions=8, epoch_max_events=15_000))


def test_gc_keeps_inflight_epoch_files(four_files, tmp_path):
    cfg = EngineConfig(num_partitions=4, epoch_max_events=25_000)
    store = StateStore(str(tmp_path / "store"))
    replay_files(four_files[:2], store, cfg)  # commits epoch 0
    latest = store.latest_epoch()

    # simulate an in-flight epoch: partition files written, no manifest
    inflight_dir = os.path.join(store.state_dir, f"epoch={latest + 1}")
    os.makedirs(inflight_dir, exist_ok=True)
    inflight = os.path.join(inflight_dir, "part-00000.parquet")
    src = store.partition_files(latest)[min(store.partition_files(latest))]
    shutil.copy(src, inflight)

    gc_state(store, keep_manifests=1)
    assert os.path.exists(inflight)  # survived GC
