"""Change-log tail loop — the collector graft.

The reference collector tails the chain height-by-height: read the
local cursor, read the source head, collect the gap, sleep+poll when
caught up, exit cleanly at ``until``
(/root/reference/collector/collector.go:48-106), with exponential
backoff on errors (/root/reference/cmd/parser/dex/main.go:54-79) and a
same-head tolerance before declaring a stall
(/root/reference/parser/dex/dex.go:366-377).

Here the "chain" is a directory the upstream system appends
commit-contiguous Parquet files to; the cursor is the replay store's
manifest epoch. One tick = replay every complete new epoch; derived
tasks run after (the aggregator scheduler tick).
"""

from __future__ import annotations

import glob
import os
import time

from cosmwasm_etl_ray.config import DEFAULT_CONFIG, EngineConfig
from cosmwasm_etl_ray.pipelines.aggregator import run_all_tasks
from cosmwasm_etl_ray.pipelines.replay import replay_files


def list_log_files(log_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(log_dir, "*.parquet")))


def tail_changes(
    log_dir: str,
    store,
    cfg: EngineConfig = DEFAULT_CONFIG,
    poll_interval: float = 1.0,
    max_idle_polls: int = 3,
    until_files: int | None = None,
    run_derived: bool = True,
    err_tolerance: int = 3,
    sleep=time.sleep,
) -> dict:
    """Tail until `until_files` files are processed or `max_idle_polls`
    consecutive polls see no new work. Returns a summary dict."""
    idle = 0
    errors = 0
    ticks = 0
    applied_epochs = 0
    while True:
        try:
            files = list_log_files(log_dir)
            if until_files is not None:
                files = files[:until_files]
            manifests = replay_files(files, store, cfg)
            if run_derived and manifests:
                run_all_tasks(store, cfg)
            errors = 0
        except Exception:
            errors += 1
            if errors > err_tolerance:
                raise
            sleep(min(60.0, 0.5 * (2**errors)))  # exponential backoff
            continue

        ticks += 1
        applied_epochs += len(manifests)
        caught_up = until_files is not None and len(files) >= until_files
        if manifests:
            idle = 0
        else:
            idle += 1  # same-head tolerance
        if caught_up or idle >= max_idle_polls:
            return {
                "ticks": ticks,
                "applied_epochs": applied_epochs,
                "stopped": "until" if caught_up else "idle",
            }
        sleep(poll_interval)
