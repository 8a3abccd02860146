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
    run_validation: bool = True,
    err_tolerance: int = 3,
    sleep=time.sleep,
) -> dict:
    """Tail until `until_files` files are processed or `max_idle_polls`
    consecutive polls see no new work. Returns a summary dict.

    Every ``cfg.validation_interval_epochs`` committed epochs, a state
    snapshot is written and the replayed state is validated against the
    independent recompute — the reference's periodic snapshot +
    validation worker (/root/reference/parser/dex/dex.go:390-455,
    pool/validation interval defaults
    /root/reference/configs/parser.config.go:9-12). Mismatch counts
    are reported in the summary (advisory, like the reference's
    validation log — repair is the operator's explicit action)."""
    idle = 0
    errors = 0
    ticks = 0
    applied_epochs = 0
    derived_pending = False
    validations = 0
    validation_mismatches = 0
    validation_exceptions = 0
    validated_through = -1
    while True:
        try:
            files = list_log_files(log_dir)
            if until_files is not None:
                files = files[:until_files]
            manifests = replay_files(files, store, cfg)
            # count + schedule IMMEDIATELY after the commits land: if a
            # later step in this tick raises transiently, the next
            # tick's replay_files returns [] for the already-committed
            # epochs — derived work and the epoch count must not be
            # lost with it
            applied_epochs += len(manifests)
            if manifests:
                derived_pending = True
            if run_derived and derived_pending:
                run_all_tasks(store, cfg)
                derived_pending = False
            latest = store.latest_epoch()
            # gated by the epoch INTERVAL, not this tick's manifests —
            # a validation skipped by a transient error re-arms on the
            # next tick (validated_through only advances on success)
            if (
                run_validation
                and cfg.validation_interval_epochs
                and latest is not None
                and (latest + 1) // cfg.validation_interval_epochs
                > (validated_through + 1) // cfg.validation_interval_epochs
            ):
                from cosmwasm_etl_ray.stages.validate import (
                    snapshot_state,
                    validate_and_except,
                )

                snapshot_state(store)
                # mismatched keys are appended to the durable exception
                # table (the reference's flagged-token append), so the
                # NEXT periodic pass skips them until operator repair
                bad, n_new_exceptions = validate_and_except(store, files, cfg)
                validations += 1
                validation_mismatches += len(bad)
                validation_exceptions += n_new_exceptions
                validated_through = latest
            errors = 0
        except Exception:
            errors += 1
            if errors > err_tolerance:
                raise
            sleep(min(60.0, 0.5 * (2**errors)))  # exponential backoff
            continue

        ticks += 1
        caught_up = until_files is not None and len(files) >= until_files
        if manifests:
            idle = 0
        else:
            idle += 1  # same-head tolerance
        if caught_up or idle >= max_idle_polls:
            return {
                "ticks": ticks,
                "applied_epochs": applied_epochs,
                "validations": validations,
                "validation_mismatches": validation_mismatches,
                "validation_exceptions": validation_exceptions,
                "stopped": "until" if caught_up else "idle",
            }
        sleep(poll_interval)
