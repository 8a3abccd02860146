"""The CDC replay pipeline: tail → normalize → shuffle → merge → commit.

Graft of the reference parser's Run loop
(/root/reference/parser/dex/dex.go:87-267): the contiguous height
range becomes a contiguous range of change-log files (an epoch), the
per-height parse becomes vectorized map_batches, the one-transaction
insert+cursor becomes per-partition Parquet writes + a manifest commit,
and quarantine rows become a side output under the same epoch.

Execution shape per epoch (all lazy until the merge consumes):

    read_parquet(files)                       # prune columns upstream
      ├─ valid_events   → PartitionAssigner   # map_batches, pyarrow
      │                 → fold_partial        # COMBINER map_batches
      │                 → groupby("pid")      # THE one shuffle
      │                 → MergeWithState      # actor-pool map_groups
      │                 → stats rows (P)      # tiny take
      └─ quarantine_events → write_parquet    # dead-letter side output
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from cosmwasm_etl_ray.config import DEFAULT_CONFIG, EngineConfig
from cosmwasm_etl_ray.stages.merge import (
    KEY_COLS,
    OP_COL,
    MergeWithState,
    fold_lww_arrow,
    fold_override,
    fold_partial,
    fold_partial_arrow,
)
from cosmwasm_etl_ray.stages.normalize import FlagAndPartition


def plan_epochs(files: list[str], cfg: EngineConfig) -> list[list[str]]:
    """Slice the change log's file list into epochs of ≤ epoch_max_events,
    on file boundaries only (files are commit-contiguous, like height
    batches — /root/reference/pkg/db/parser/repository.go:143-164 never
    splits a height across batches)."""
    epochs: list[list[str]] = []
    cur: list[str] = []
    cur_rows = 0
    for f in sorted(files):
        n = pq.read_metadata(f).num_rows
        if cur and cur_rows + n > cfg.epoch_max_events:
            epochs.append(cur)
            cur, cur_rows = [], 0
        cur.append(f)
        cur_rows += n
    if cur:
        epochs.append(cur)
    return epochs


def _flag_and_combine(
    changes: "ray.data.Dataset", cfg: EngineConfig
) -> "ray.data.Dataset":
    """The pre-shuffle half of an epoch: flag+partition, then (unless
    override mode) the LWW combiner. Depends only on the epoch's OWN
    input — never on prior state — so epoch e+1's instance may run
    while epoch e's merge is still holding the shuffle barrier."""
    flagged = changes.map_batches(
        FlagAndPartition(cfg.num_partitions, ruleset=cfg.rules),
        batch_format="pyarrow",
    )
    if not cfg.override_coalesce:
        flagged = flagged.map_batches(
            fold_partial_arrow,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )
    return flagged


def apply_epoch(
    changes: "ray.data.Dataset",
    store,
    epoch: int,
    cfg: EngineConfig = DEFAULT_CONFIG,
    offset_range: tuple[str, str] = ("", ""),
    input_rows: int | None = None,
    preflagged: "ray.data.Dataset | None" = None,
) -> dict:
    """Apply one epoch of change events to the store — ONE pass over
    the input: flag+partition → combiner → shuffle → merge (which also
    writes the quarantine side output per partition). Idempotent:
    re-running a committed epoch is a no-op; re-running an uncommitted
    (crashed) epoch overwrites the same partition files.

    ``preflagged``: an already flag+combined dataset for this epoch
    (the pipelined replay prefetches it while the previous epoch's
    merge runs); when given, ``changes`` is ignored."""
    if store.is_committed(epoch):
        return store.manifest(epoch)

    # num_partitions is part of the store's identity: pid = hash(key) % P
    # routes keys to state files, so replaying with a different P would
    # silently send a key's new events to a different partition than its
    # existing state row. Manifests record P; refuse a mismatch.
    latest = store.latest_epoch()
    if latest is not None:
        committed_p = store.manifest(latest).get("num_partitions")
        if committed_p is not None and committed_p != cfg.num_partitions:
            raise ValueError(
                f"store was built with num_partitions={committed_p}; "
                f"config asks for {cfg.num_partitions} — refusing to mix"
            )

    prior = store.partition_files()

    flagged = preflagged if preflagged is not None else _flag_and_combine(changes, cfg)
    merge = MergeWithState(
        store.state_dir,
        epoch,
        prior,
        override=cfg.override_coalesce,
        quarantine_root=store.quarantine_dir,
    )

    def merge_fn(group):
        return merge(group)

    mg_kwargs = {}
    if cfg.merge_concurrency:
        mg_kwargs["concurrency"] = cfg.merge_concurrency
    stats = (
        flagged.groupby("pid")
        .map_groups(merge_fn, batch_format="pyarrow", **mg_kwargs)
        .to_pandas()
    )

    quarantined = int(stats["quarantined"].sum()) if len(stats) else 0
    touched = {
        int(r.pid): {
            "file": r.file,
            "rows": int(r.rows),
            "live_rows": int(r.live_rows),
        }
        for r in stats.itertuples()
    }
    counts = {
        "input_events": int(input_rows) if input_rows is not None else None,
        "applied_events": (
            int(input_rows) - quarantined if input_rows is not None else None
        ),
        "quarantined": quarantined,
        "touched_partitions": len(touched),
    }
    return store.commit_epoch(
        epoch, touched, offset_range, counts, num_partitions=cfg.num_partitions
    )


def pending_files(files: list[str], store) -> tuple[list[str], int]:
    """Durable resume point: the files not yet covered by a committed
    manifest, plus the next epoch number. Epoch membership is decided by
    the committed manifest's ``offset_range`` high file — NOT by
    re-planning epochs over the current file list, which would silently
    absorb a file appended after commit into an already-committed
    epoch's slice and skip it forever (a partially-filled last epoch
    plus a late file used to do exactly that)."""
    files = sorted(files)
    latest = store.latest_epoch()
    if latest is None:
        return files, 0
    fileset = set(files)
    # walk manifests newest-first to the most recent FILE cursor —
    # bootstrap/repair/quarantine/direct epochs carry no file range
    # and are skipped
    for e in reversed(store.committed_epochs()):
        hi = store.manifest(e)["offset_range"][1]
        if not hi or hi in ("bootstrap", "repair", "quarantine"):
            continue
        if hi in fileset:
            return files[files.index(hi) + 1 :], latest + 1
        raise ValueError(
            f"resume cursor file {hi!r} is missing from the change log; "
            "the source was truncated or the log dir is wrong"
        )
    # no file-based cursor at all: every listed file is pending
    return files, latest + 1


def replay_files(
    files: list[str], store, cfg: EngineConfig = DEFAULT_CONFIG
) -> list[dict]:
    """Tail the change log: resume from the cursor (the last committed
    manifest's offset_range), apply every remaining epoch in order. The
    epoch barrier is the reference's parent-height wait analogue
    (/root/reference/aggregator/task.go:785-811): epoch e+1's merge
    reads epoch e's state."""
    todo, start = pending_files(files, store)
    epochs = plan_epochs(todo, cfg)
    if cfg.state_tier == "actor" and epochs:
        return _replay_files_actor(epochs, start, store, cfg)
    if cfg.pipeline_epochs and len(epochs) > 1:
        return _replay_files_pipelined(epochs, start, store, cfg)
    out = []
    for i, batch in enumerate(epochs):
        e = start + i
        ds = ray.data.read_parquet(batch)
        rows = sum(pq.read_metadata(f).num_rows for f in batch)
        out.append(
            apply_epoch(ds, store, e, cfg, (batch[0], batch[-1]), input_rows=rows)
        )
    return out


def _replay_files_pipelined(
    epochs: list[list[str]], start: int, store, cfg: EngineConfig
) -> list[dict]:
    """Disk-tier replay with epoch-level pipelining: while epoch e's
    merge holds the shuffle barrier, epoch e+1's read+flag+combine
    materializes on a background thread (it depends only on its own
    input files, never on e's state). Epoch e+1's MERGE still starts
    only after e's manifest commits — ordering, idempotency and crash
    recovery are identical to the serial loop."""
    from concurrent.futures import ThreadPoolExecutor

    from cosmwasm_etl_ray.compat import ensure_thread_safe_lazy_imports

    ensure_thread_safe_lazy_imports()

    def prep(batch: list[str]) -> "ray.data.Dataset":
        return _flag_and_combine(ray.data.read_parquet(batch), cfg).materialize()

    out = []
    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(prep, epochs[0])
        for i, batch in enumerate(epochs):
            flagged = fut.result()
            if i + 1 < len(epochs):
                fut = pool.submit(prep, epochs[i + 1])
            e = start + i
            rows = sum(pq.read_metadata(f).num_rows for f in batch)
            out.append(
                apply_epoch(
                    flagged,
                    store,
                    e,
                    cfg,
                    (batch[0], batch[-1]),
                    input_rows=rows,
                    preflagged=flagged,
                )
            )
    return out


def _replay_files_actor(
    epochs: list[list[str]], start: int, store, cfg: EngineConfig
) -> list[dict]:
    """Actor-resident replay (cfg.state_tier="actor"): ONE StateShard
    pool is recovered from the last committed checkpoint and holds the
    merge state in RAM across ALL epochs — no per-epoch state-file
    re-read (the disk path's deliberate cheap-restart cost). Each epoch
    still checkpoints its dirty partitions + manifest, so crash
    recovery is identical: load the last committed epoch, re-apply the
    tail. Quarantine rows are dropped (counted in the manifest), not
    persisted — the dead-letter side output belongs to the disk path."""
    from cosmwasm_etl_ray.state.actor_state import ActorStateTier

    latest = store.latest_epoch()
    if latest is not None:
        committed_p = store.manifest(latest).get("num_partitions")
        if committed_p is not None and committed_p != cfg.num_partitions:
            raise ValueError(
                f"store was built with num_partitions={committed_p}; "
                f"config asks for {cfg.num_partitions} — refusing to mix"
            )

    tier = ActorStateTier.from_store(store, cfg, num_actors=cfg.actor_state_shards)
    out = []
    for i, batch in enumerate(epochs):
        e = start + i
        if store.is_committed(e):
            out.append(store.manifest(e))
            continue
        rows = sum(pq.read_metadata(f).num_rows for f in batch)
        stats = tier.apply_changes(ray.data.read_parquet(batch))
        out.append(
            tier.flush(
                store,
                e,
                offset_range=(batch[0], batch[-1]),
                input_rows=rows,
                applied_rows=rows - stats["invalid"],
            )
        )
    return out


def read_state(store, epoch: int | None = None) -> "ray.data.Dataset":
    """The live current-state table (tombstones dropped) as a Dataset."""
    files = list(store.partition_files(epoch).values())
    ds = ray.data.read_parquet(files)
    return ds.map_batches(
        lambda df: df[df[OP_COL] != "delete"].drop(
            columns=[c for c in (OP_COL, "pid", "key64") if c in df.columns]
        ),
        batch_format="pandas",
    )


def quick_final_state(
    changes: "ray.data.Dataset", cfg: EngineConfig = DEFAULT_CONFIG
) -> "ray.data.Dataset":
    """Single-shot replay with no persistent store (for oracle-checked
    queries and tests): same operators, minus the sink. The final fold
    runs in Arrow (override mode is the pandas exception, like the
    merge stage)."""
    flagged = changes.map_batches(
        FlagAndPartition(cfg.num_partitions, ruleset=cfg.rules),
        batch_format="pyarrow",
    )
    if cfg.override_coalesce:

        def fold_and_finalize_pd(g: pd.DataFrame) -> pd.DataFrame:
            g = g[g["valid"]].drop(columns=["valid"])
            f = fold_override(g)
            return f[f[OP_COL] != "delete"].drop(
                columns=[c for c in ("pid", "key64") if c in f.columns]
            )

        return flagged.groupby("pid").map_groups(
            fold_and_finalize_pd, batch_format="pandas"
        )

    flagged = flagged.map_batches(
        fold_partial_arrow, batch_format="pyarrow", batch_size=cfg.batch_size
    )

    def fold_and_finalize(g: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        g = g.filter(g["valid"].combine_chunks()).drop_columns(["valid"])
        f = fold_lww_arrow(g)
        f = f.filter(pc.not_equal(f[OP_COL], pa.scalar("delete")))
        return f.drop_columns([c for c in ("pid", "key64") if c in f.column_names])

    return flagged.groupby("pid").map_groups(
        fold_and_finalize, batch_format="pyarrow"
    )


def serial_oracle_replay(changes_df: pd.DataFrame) -> pd.DataFrame:
    """Independent serial reference apply (plain dict LWW) — the test
    oracle (SURVEY.md §5): NOT built on the engine's fold code."""
    state: dict[tuple[str, str], dict] = {}
    df = changes_df.sort_values("commit", kind="stable")
    for row in df.to_dict("records"):
        if not row.get("commit") or not str(row["commit"]).isdigit():
            continue
        key = (row["repo"], row["path"])
        if row["op"] == "delete":
            state.pop(key, None)
        elif row["op"] in ("insert", "update"):
            state[key] = row
    rows = [
        {k: v for k, v in r.items() if k != "op"} for r in state.values()
    ]
    return pd.DataFrame(rows)
