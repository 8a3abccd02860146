"""Measure the disk-tier vs actor-tier crossover under simulated
remote state storage (VERDICT r3 #6).

The disk path re-reads each partition's prior state file every epoch —
free when the files are page-cached locally (measured 46 s vs the
actor tier's 51 s at 16 epochs on this box), but a real multi-node
deployment keeps state on remote storage. GRAFT_STATE_READ_MBPS
throttles the state-read helper (stages/merge.read_state_table) to a
simulated remote-storage bandwidth; the actor tier pays the throttled
read once per RECOVERY, the disk tier once per partition per EPOCH.

Runs both tiers (the actor tier in its composed direct-prep shape)
over the same change log in fresh Ray sessions per (tier, throttle)
cell and prints one JSON line per cell.

Usage: python tools/crossover_state_tier.py [n_events] [n_epochs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CHILD = """
import json, os, sys, time
import ray
ray.init(address="local", num_cpus=16, include_dashboard=False,
         logging_level="ERROR",
         runtime_env={"env_vars": {"GRAFT_STATE_READ_MBPS":
                                   os.environ.get("GRAFT_STATE_READ_MBPS", "0")}})
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
from cosmwasm_etl_ray.config import EngineConfig
from cosmwasm_etl_ray.pipelines.replay import replay_files, read_state
from cosmwasm_etl_ray.state.manifest import StateStore

files = json.loads(os.environ["XOVER_FILES"])
tier = os.environ["XOVER_TIER"]
epoch_events = int(os.environ["XOVER_EPOCH_EVENTS"])
cfg = EngineConfig(
    num_partitions=32, epoch_max_events=epoch_events, batch_size=65536,
    state_tier=tier, merge_exchange="direct", pipeline_epochs=True,
    actor_state_shards=8,
)
store = StateStore(os.environ["XOVER_STORE"])
t0 = time.time()
manifests = replay_files(files, store, cfg)
wall = time.time() - t0
n_live = read_state(store).count()
print(json.dumps({"tier": tier, "wall_s": round(wall, 2),
                  "epochs": len(manifests), "live_rows": n_live}))
ray.shutdown()
"""


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    sys.path.insert(0, "/root/repo")
    from cosmwasm_etl_ray.config import GeneratorConfig
    from cosmwasm_etl_ray.sources.generator import generate_change_stream

    log_dir = f"/tmp/xover_log_n{n_events}"
    if not os.path.exists(os.path.join(log_dir, "_DONE")):
        import shutil

        shutil.rmtree(log_dir, ignore_errors=True)
        generate_change_stream(
            log_dir,
            GeneratorConfig(
                seed=42, n_keys=max(1000, n_events // 10), n_events=n_events,
                events_per_file=n_events // n_epochs, malformed_frac=0.001,
                evolve_at_frac=None,
            ),
        )
        open(os.path.join(log_dir, "_DONE"), "w").close()
    files = sorted(
        os.path.join(log_dir, f) for f in os.listdir(log_dir)
        if f.endswith(".parquet")
    )

    results = []
    for mbps in ["0", "200", "50"]:
        for tier in ["disk", "actor"]:
            store = f"/tmp/xover_store_{tier}_{mbps}_{time.time_ns()}"
            env = dict(
                os.environ,
                GRAFT_STATE_READ_MBPS=mbps,
                XOVER_FILES=json.dumps(files),
                XOVER_TIER=tier,
                XOVER_STORE=store,
                XOVER_EPOCH_EVENTS=str(n_events // n_epochs),
            )
            p = subprocess.run(
                [sys.executable, "-c", CHILD], env=env,
                capture_output=True, text=True, timeout=1800,
            )
            line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
            if not line:
                print(f"FAIL tier={tier} mbps={mbps}: {p.stderr[-500:]}")
                return 1
            rec = json.loads(line[-1])
            rec["state_read_mbps"] = int(mbps)
            results.append(rec)
            print(json.dumps(rec))
            import shutil

            shutil.rmtree(store, ignore_errors=True)

    # sanity: every cell converged to the same live state size
    sizes = {r["live_rows"] for r in results}
    print(json.dumps({"all_cells_same_live_rows": len(sizes) == 1,
                      "live_rows": sorted(sizes)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
