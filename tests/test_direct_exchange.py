"""Direct (raw-task) merge exchange vs the streaming groupby path.

cfg.merge_exchange="direct" replaces groupby("pid").map_groups with a
spawn-free raw-task exchange and pid-level epoch chaining
(replay._replay_files_direct). These tests pin the invariant that the
two exchanges are observationally identical: same final state, same
quarantine side output, same crash-resume reconvergence.
"""

import glob
import os

import pandas as pd
import pytest

import ray.data

from cosmwasm_etl_ray.config import EngineConfig, GeneratorConfig
from cosmwasm_etl_ray.pipelines.replay import (
    apply_epoch,
    read_state,
    replay_files,
    serial_oracle_replay,
)
from cosmwasm_etl_ray.sources.generator import generate_change_stream
from cosmwasm_etl_ray.state.manifest import StateStore

STREAM_CFG = EngineConfig(
    num_partitions=8, epoch_max_events=15_000, batch_size=4096
)
DIRECT_CFG = EngineConfig(
    num_partitions=8,
    epoch_max_events=15_000,
    batch_size=4096,
    merge_exchange="direct",
)


@pytest.fixture(scope="module")
def change_log(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("changes"))
    return generate_change_stream(
        out,
        GeneratorConfig(
            seed=29, n_keys=1_500, n_events=60_000, events_per_file=7_500,
            malformed_frac=0.004, evolve_at_frac=0.5,
        ),
    )


def _final(store) -> pd.DataFrame:
    return (
        read_state(store)
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )


def test_direct_equals_streaming(change_log, tmp_path):
    s_store = StateStore(str(tmp_path / "stream"))
    replay_files(change_log["files"], s_store, STREAM_CFG)
    d_store = StateStore(str(tmp_path / "direct"))
    manifests = replay_files(change_log["files"], d_store, DIRECT_CFG)

    cols = ["repo", "path", "commit", "content"]
    pd.testing.assert_frame_equal(_final(s_store)[cols], _final(d_store)[cols])

    # manifest accounting identical too (counts drive the cursor/monitoring)
    assert sum(m["counts"]["quarantined"] for m in manifests) == change_log[
        "n_malformed"
    ]
    q = glob.glob(
        os.path.join(d_store.quarantine_dir, "**/*.parquet"), recursive=True
    )
    qrows = sum(len(pd.read_parquet(f)) for f in q)
    assert qrows == change_log["n_malformed"]


def test_direct_matches_serial_oracle(change_log, tmp_path):
    store = StateStore(str(tmp_path / "store"))
    replay_files(change_log["files"], store, DIRECT_CFG)
    engine = _final(store)
    raw = pd.concat(
        [pd.read_parquet(f) for f in change_log["files"]], ignore_index=True
    )
    oracle = (
        serial_oracle_replay(raw)
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    cols = ["repo", "path", "commit", "content"]
    pd.testing.assert_frame_equal(engine[cols], oracle[cols])


def test_direct_crash_resume_reconverges(change_log, tmp_path):
    """Crash before a manifest commit mid-chain; the re-run (also direct)
    must overwrite orphan state files and reconverge."""
    full = StateStore(str(tmp_path / "full"))
    replay_files(change_log["files"], full, DIRECT_CFG)
    expected = _final(full)

    class CrashingStore(StateStore):
        def __init__(self, root, crash_at):
            super().__init__(root)
            self.crash_at = crash_at

        def commit_epoch(self, epoch, *a, **k):
            if epoch >= self.crash_at:
                raise RuntimeError("simulated crash before manifest commit")
            return super().commit_epoch(epoch, *a, **k)

    crash_root = str(tmp_path / "crash")
    with pytest.raises(RuntimeError):
        replay_files(
            change_log["files"], CrashingStore(crash_root, 2), DIRECT_CFG
        )
    store = StateStore(crash_root)
    assert store.latest_epoch() == 1  # epochs 0-1 committed, 2+ lost
    leftover = glob.glob(
        os.path.join(store.state_dir, "epoch=2", "*.parquet")
    )
    assert leftover  # orphan partition files from the in-flight wave

    replay_files(change_log["files"], store, DIRECT_CFG)
    cols = ["repo", "path", "commit", "content"]
    pd.testing.assert_frame_equal(expected[cols], _final(store)[cols])


def test_apply_epoch_direct_single(change_log, tmp_path):
    """apply_epoch (the tail loop's entry) honors merge_exchange=direct
    via _direct_exchange_stats and matches the streaming manifest."""
    s = StateStore(str(tmp_path / "s"))
    d = StateStore(str(tmp_path / "d"))
    files = change_log["files"][:2]
    ms = apply_epoch(ray.data.read_parquet(files), s, 0, STREAM_CFG)
    md = apply_epoch(ray.data.read_parquet(files), d, 0, DIRECT_CFG)
    assert ms["counts"] == md["counts"]
    cols = ["repo", "path", "commit", "content"]
    pd.testing.assert_frame_equal(_final(s)[cols], _final(d)[cols])


def test_direct_override_mode(tmp_path):
    """Override coalesce (last-write full replace, no combine) under the
    direct exchange equals the streaming result."""
    log = generate_change_stream(
        str(tmp_path / "log"),
        GeneratorConfig(seed=7, n_keys=300, n_events=8_000,
                        events_per_file=2_000, malformed_frac=0.0,
                        evolve_at_frac=None),
    )
    base = dict(num_partitions=4, epoch_max_events=4_000, batch_size=2048,
                override_coalesce=True)
    s = StateStore(str(tmp_path / "s"))
    replay_files(log["files"], s, EngineConfig(**base))
    d = StateStore(str(tmp_path / "d"))
    replay_files(log["files"], d, EngineConfig(**base, merge_exchange="direct"))
    cols = ["repo", "path", "commit", "content"]
    pd.testing.assert_frame_equal(_final(s)[cols], _final(d)[cols])


def test_dict_encoded_exchange_equals_plain(change_log, tmp_path):
    """cfg.exchange_dict_cols is a WIRE format only (VERDICT r4 #2
    A/B): dictionary-encoding repo/lang through the direct exchange
    must leave the final state — values AND dtypes (no Categorical
    leaking into the on-disk schema) — bit-identical on both the disk
    and actor state tiers."""
    plain = StateStore(str(tmp_path / "plain"))
    replay_files(change_log["files"], plain, DIRECT_CFG)
    want = _final(plain)
    assert all(dt == object for dt in want[["repo", "lang"]].dtypes)

    import dataclasses

    for tier in ("disk", "actor"):
        cfg = dataclasses.replace(
            DIRECT_CFG,
            exchange_dict_cols=("repo", "lang"),
            state_tier=tier,
        )
        store = StateStore(str(tmp_path / f"dict_{tier}"))
        replay_files(change_log["files"], store, cfg)
        got = _final(store)
        assert all(dt == object for dt in got[["repo", "lang"]].dtypes)
        pd.testing.assert_frame_equal(got, want)
