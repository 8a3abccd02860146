"""CLI entry points (subprocess — each owns its Ray session) + metrics."""

import json
import subprocess
import sys

from cosmwasm_etl_ray.config import EngineConfig, GeneratorConfig
from cosmwasm_etl_ray.pipelines.replay import replay_files
from cosmwasm_etl_ray.sources.generator import generate_change_stream
from cosmwasm_etl_ray.state.manifest import StateStore
from cosmwasm_etl_ray.state.metrics import store_metrics


def _run_cli(*args):
    out = subprocess.run(
        [sys.executable, "-m", "cosmwasm_etl_ray.cli", *args],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "HOME": "/root", "RAY_ADDRESS": "local",
             "PYTHONPATH": "/root/repo"},
        # a wedged child Ray session (e.g. object-store contention from
        # other local clusters) must FAIL the test, not hang the suite.
        # 900 s: a clean run is ~50 s, but neighbor steal windows slow
        # the whole suite ~1.3-3× (BASELINE.md probes) — one observed
        # 600 s flake was contention, not a wedge
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    text = out.stdout.strip()
    try:
        return json.loads(text)  # metrics prints indented multi-line JSON
    except json.JSONDecodeError:
        return json.loads(text.splitlines()[-1])


def test_cli_replay_then_metrics_and_gc(tmp_path):
    log = generate_change_stream(
        str(tmp_path / "log"),
        GeneratorConfig(seed=91, n_keys=200, n_events=10_000, events_per_file=2_500,
                        malformed_frac=0.01, evolve_at_frac=None),
    )
    store_dir = str(tmp_path / "store")
    res = _run_cli("replay", "--log-dir", str(tmp_path / "log"),
                   "--store", store_dir, "--epoch-events", "5000",
                   "--partitions", "4")
    assert res["applied_epochs"] == 2 and res["cursor"] == 1

    m = _run_cli("metrics", "--store", store_dir)
    assert m["cursor_epoch"] == 1
    assert m["total_applied_events"] + m["total_quarantined"] == 10_000
    assert m["partitions"]["count"] == 4
    assert m["state_live_rows"] <= m["state_rows"]

    g = _run_cli("gc", "--store", store_dir)
    assert g["deleted"] >= 0 and g["kept"] == 4


def test_metrics_rollup_matches_manifests(tmp_path):
    log = generate_change_stream(
        str(tmp_path / "log"),
        GeneratorConfig(seed=92, n_keys=100, n_events=5_000, events_per_file=2_500,
                        malformed_frac=0.0, evolve_at_frac=None),
    )
    store = StateStore(str(tmp_path / "store"))
    cfg = EngineConfig(num_partitions=4, epoch_max_events=2_500)
    replay_files(log["files"], store, cfg)
    m = store_metrics(store)
    assert m["epochs_committed"] == 2
    assert m["total_applied_events"] == 5_000
    assert [e["epoch"] for e in m["per_epoch"]] == [0, 1]
    assert m["partitions"]["skew_ratio"] >= 1


def test_cli_diagnose_dry_run_and_repair(tmp_path):
    log = generate_change_stream(
        str(tmp_path / "log"),
        GeneratorConfig(seed=93, n_keys=150, n_events=8_000, events_per_file=2_000,
                        malformed_frac=0.01, evolve_at_frac=None),
    )
    # diagnose is a pure dry run: full parse + fold, nothing written
    d = _run_cli("diagnose", "--log-dir", str(tmp_path / "log"),
                 "--start", "0", "--end", "2", "--partitions", "4")
    assert d["files"] == 2 and d["events"] == 4_000
    assert d["valid"] + d["would_quarantine"] == 4_000
    assert 0 < d["live_keys"] <= 150
    assert not (tmp_path / "store").exists()

    # replay, snapshot, corrupt nothing: repair reports a clean store
    store_dir = str(tmp_path / "store")
    _run_cli("replay", "--log-dir", str(tmp_path / "log"),
             "--store", store_dir, "--epoch-events", "4000",
             "--partitions", "4")
    import ray

    from cosmwasm_etl_ray.pipelines.replay import read_state

    snap_path = str(tmp_path / "snap.parquet")
    read_state(StateStore(store_dir)).to_pandas().to_parquet(snap_path, index=False)
    r = _run_cli("repair", "--store", store_dir, "--snapshot", snap_path,
                 "--partitions", "4")
    assert r == {"n_insert": 0, "n_update": 0, "n_delete": 0, "epoch": None}


def test_cli_quarantine_bootstrap_export(tmp_path):
    log = generate_change_stream(
        str(tmp_path / "log"),
        GeneratorConfig(seed=94, n_keys=100, n_events=6_000, events_per_file=3_000,
                        malformed_frac=0.02, evolve_at_frac=None),
    )
    store_dir = str(tmp_path / "store")
    _run_cli("replay", "--log-dir", str(tmp_path / "log"), "--store", store_dir,
             "--epoch-events", "3000", "--partitions", "4")

    q = _run_cli("quarantine", "--store", store_dir)
    assert q["pending_files"] > 0  # malformed rows landed in quarantine
    qr = _run_cli("quarantine", "--store", store_dir, "--replay",
                  "--partitions", "4")
    assert qr["replayed"] and qr["epoch"] == 2
    # quarantine epoch doesn't break file-based resume
    r = _run_cli("replay", "--log-dir", str(tmp_path / "log"), "--store", store_dir,
                 "--epoch-events", "3000", "--partitions", "4")
    assert r["applied_epochs"] == 0

    out_dir = str(tmp_path / "export")
    x = _run_cli("export", "--store", store_dir, "--out", out_dir)
    assert x["files"] > 0

    # bootstrap a fresh store from the exported state
    import pandas as pd

    snap = pd.concat(
        [pd.read_parquet(f) for f in
         __import__("glob").glob(out_dir + "/*.parquet")], ignore_index=True
    )
    snap_path = str(tmp_path / "snap.parquet")
    snap.to_parquet(snap_path, index=False)
    b_dir = str(tmp_path / "boot")
    b = _run_cli("bootstrap", "--store", b_dir, "--snapshot", snap_path,
                 "--partitions", "4")
    assert b["epoch"] == 0 and b["counts"]["applied_events"] == len(snap)
