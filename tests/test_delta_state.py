"""Delta state layout (state/delta.py): bit-equality with the full
layout, chain-aware GC, compaction, crash resume, and the guard rails.
The layout exists because the 1B soak diagnosed the full layout's
per-epoch state rewrite as the scale limiter (SOAK_1B.json)."""

import dataclasses
import glob
import os

import pandas as pd
import pytest

from cosmwasm_etl_ray.config import EngineConfig, GeneratorConfig
from cosmwasm_etl_ray.pipelines.replay import (
    epoch_diff,
    lookup_state,
    read_state,
    replay_files,
)
from cosmwasm_etl_ray.sources.generator import generate_change_stream
from cosmwasm_etl_ray.state.delta import compact_state, partition_chains
from cosmwasm_etl_ray.state.gc import gc_state
from cosmwasm_etl_ray.state.manifest import StateStore

FULL = EngineConfig(
    num_partitions=8,
    epoch_max_events=15_000,
    batch_size=4096,
    merge_exchange="direct",
)
DELTA = dataclasses.replace(FULL, state_layout="delta")


@pytest.fixture(scope="module")
def change_log(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("changes"))
    return generate_change_stream(
        out,
        GeneratorConfig(
            seed=31, n_keys=1_200, n_events=60_000, events_per_file=7_500,
            malformed_frac=0.003, evolve_at_frac=0.5,
        ),
    )


def _final(store) -> pd.DataFrame:
    """Current state on the contract columns. The ``epoch`` column is
    schema-parity only and layout-DEPENDENT by nature (full stamps the
    partition's last rewrite epoch, delta the row's last write epoch;
    lookup_state drops it, no gate query reads it) — excluded from
    value comparisons."""
    df = read_state(store).to_pandas()
    assert "epoch" in df.columns  # schema parity across layouts
    return (
        df.drop(columns=["epoch"])
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def stores(change_log, tmp_path_factory):
    root = tmp_path_factory.mktemp("stores")
    full = StateStore(str(root / "full"))
    replay_files(change_log["files"], full, FULL)
    delta = StateStore(str(root / "delta"))
    replay_files(change_log["files"], delta, DELTA)
    return full, delta


@pytest.mark.usefixtures("ray_session")
def test_delta_equals_full_final_state(stores):
    full, delta = stores
    pd.testing.assert_frame_equal(_final(full), _final(delta))
    # and the write volume is append-only: every committed epoch left
    # its own per-pid files in place (nothing rewritten)
    chains = partition_chains(delta)
    assert max(len(c) for c in chains.values()) > 1


@pytest.mark.usefixtures("ray_session")
def test_delta_state_as_of_epoch(stores):
    full, delta = stores
    mid = full.committed_epochs()[1]
    a = (
        read_state(full, epoch=mid).to_pandas().drop(columns=["epoch"])
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    b = (
        read_state(delta, epoch=mid).to_pandas().drop(columns=["epoch"])
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_delta_lookup_prunes_to_probed_chains(stores):
    full, delta = stores
    want = _final(full).head(7)[["repo", "path"]]
    got_full, _ = lookup_state(full, want, FULL.num_partitions)
    got_delta, files = lookup_state(delta, want, DELTA.num_partitions)
    a = got_full.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    b = got_delta.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # pruning: only the probed pids' chains were read
    all_files = [f for c in partition_chains(delta).values() for f in c]
    assert len(files) < len(all_files)


@pytest.mark.usefixtures("ray_session")
def test_gc_collects_nothing_before_compaction(change_log, tmp_path):
    store = StateStore(str(tmp_path / "s"))
    replay_files(change_log["files"], store, DELTA)
    before = sorted(glob.glob(os.path.join(store.state_dir, "**/*.parquet"),
                              recursive=True))
    out = gc_state(store, keep_manifests=1)
    assert out["deleted"] == 0
    assert before == sorted(
        glob.glob(os.path.join(store.state_dir, "**/*.parquet"),
                  recursive=True)
    )


@pytest.mark.usefixtures("ray_session")
def test_compact_then_gc_then_resume(change_log, tmp_path):
    store = StateStore(str(tmp_path / "s"))
    # replay all but the last file, compact, gc, then resume the tail
    replay_files(change_log["files"][:-1], store, DELTA)
    want_mid = _final(store)
    m = compact_state(store)
    assert m is not None and m["offset_range"] == ["compact", "compact"]
    # state identical through the base generation
    pd.testing.assert_frame_equal(_final(store), want_mid)
    # gc sweeps the covered deltas; exactly one file per pid remains
    assert gc_state(store)["deleted"] > 0
    chains = partition_chains(store)
    assert all(len(c) == 1 for c in chains.values())
    pd.testing.assert_frame_equal(_final(store), want_mid)
    # resume appends new deltas after the base
    replay_files(change_log["files"], store, DELTA)
    ref = StateStore(str(tmp_path / "ref"))
    replay_files(change_log["files"], ref, FULL)
    pd.testing.assert_frame_equal(_final(store), _final(ref))
    # idempotent: nothing to compact twice on a single-link chain
    compact_state(store)
    assert gc_state(store)["deleted"] >= 0
    pd.testing.assert_frame_equal(_final(store), _final(ref))


@pytest.mark.usefixtures("ray_session")
def test_delta_crash_resume_reconverges(change_log, tmp_path):
    store = StateStore(str(tmp_path / "s"))
    # "crash": only the first half of the log was replayed
    replay_files(change_log["files"][:4], store, DELTA)
    # re-run over the whole log resumes from the file cursor
    replay_files(change_log["files"], store, DELTA)
    ref = StateStore(str(tmp_path / "ref"))
    replay_files(change_log["files"], ref, FULL)
    pd.testing.assert_frame_equal(_final(store), _final(ref))


@pytest.mark.usefixtures("ray_session")
def test_delta_guard_rails(change_log, tmp_path, stores):
    _, delta = stores
    with pytest.raises(ValueError, match="full-layout only"):
        epoch_diff(delta, 0, 1)
    for bad in (
        dataclasses.replace(DELTA, merge_exchange="streaming"),
        dataclasses.replace(DELTA, state_tier="actor"),
        dataclasses.replace(DELTA, override_coalesce=True),
    ):
        with pytest.raises(ValueError):
            replay_files(
                change_log["files"], StateStore(str(tmp_path / "x")), bad
            )
    # layout is store identity: a full replay over a delta store refuses
    store = StateStore(str(tmp_path / "mix"))
    replay_files(change_log["files"][:2], store, DELTA)
    with pytest.raises(ValueError, match="state_layout"):
        replay_files(change_log["files"], store, FULL)


@pytest.mark.usefixtures("ray_session")
def test_crash_mid_compaction_is_invisible_delta(change_log, tmp_path):
    """A compactor that crashed after writing base files but BEFORE
    the manifest commit leaves an orphan epoch=L+1 dir. The resumed
    replay commits its own epoch L+1 delta files into that dir
    (tmp+rename overwrites shared pid names; non-overlapping orphans
    are simply never referenced), chains stay correct, and GC sweeps
    the unreferenced orphan bytes once L+1 commits."""
    from cosmwasm_etl_ray.state.delta import _compact_pid

    import ray as _ray

    store = StateStore(str(tmp_path / "s"))
    replay_files(change_log["files"][:4], store, DELTA)
    latest = store.latest_epoch()
    chains = partition_chains(store)
    # simulate the crash: fold two pids into epoch=L+1 base files,
    # then "die" before commit_epoch
    orphan_dir = os.path.join(store.state_dir, f"epoch={latest + 1}")
    os.makedirs(orphan_dir, exist_ok=True)
    some = dict(list(chains.items())[:2])
    _ray.get([
        _compact_pid.remote(
            c, os.path.join(orphan_dir, f"part-{pid:05d}.parquet")
        )
        for pid, c in some.items()
    ])
    # orphan is invisible: reads and chains unchanged
    assert partition_chains(store) == chains
    # resume replays the rest (its epoch L+1 shares the orphan's dir)
    replay_files(change_log["files"], store, DELTA)
    ref = StateStore(str(tmp_path / "ref"))
    replay_files(change_log["files"], ref, FULL)
    pd.testing.assert_frame_equal(_final(store), _final(ref))
    # once a real compaction + gc run, nothing stale survives
    compact_state(store)
    gc_state(store)
    pd.testing.assert_frame_equal(_final(store), _final(ref))
    assert all(len(c) == 1 for c in partition_chains(store).values())
