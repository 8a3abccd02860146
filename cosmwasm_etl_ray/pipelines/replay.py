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
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from cosmwasm_etl_ray.compat import cached_remote
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


def _split_block_by_pid(t: "pa.Table", num_partitions: int):
    """One raw task of the direct exchange: slice a combined block into
    one sub-table per pid (single argsort + zero-copy take + slices).
    Returns a ``num_returns=P`` tuple; empty pids return None so the
    object store holds a tiny marker, not an empty table."""
    from cosmwasm_etl_ray.functions.hashing import split_table_by_shard

    pid = (
        t["pid"].to_numpy(zero_copy_only=False) if t.num_rows else None
    )
    return split_table_by_shard(t, pid, num_partitions)


def _merge_pid_parts(merge: MergeWithState, *parts):
    """One raw merge task: concatenate a pid's slices (in block order —
    the same positional tie-break the groupby path sees) and run the
    unchanged MergeWithState on the group."""
    tables = [
        _dict_decode_cols(p)
        for p in parts
        if p is not None and p.num_rows > 0
    ]
    if not tables:
        return None
    group = pa.concat_tables(tables, promote_options="permissive")
    return merge(group)


def _dict_encode_cols(t: "pa.Table", cols: tuple) -> "pa.Table":
    """Dictionary-encode repeating passthrough columns for the
    exchange leg (int32 indices + small dict instead of repeated
    strings through the object store). Decoded back at merge entry —
    purely a wire format."""
    import pyarrow.compute as pc

    for c in cols:
        if c in t.column_names:
            i = t.schema.get_field_index(c)
            t = t.set_column(
                i, c, pc.dictionary_encode(t[c].combine_chunks())
            )
    return t


def _dict_decode_cols(t: "pa.Table") -> "pa.Table":
    """Undo _dict_encode_cols: cast any dictionary column back to its
    value type so the merge fold and the on-disk state never see the
    wire encoding."""
    import pyarrow.types as pt

    for i, f in enumerate(t.schema):
        if pt.is_dictionary(f.type):
            t = t.set_column(
                i, f.name, t[f.name].cast(f.type.value_type)
            )
    return t


def _prep_split_shard(
    path: str,
    row_groups: list[int],
    num_partitions: int,
    ruleset,
    combine: bool,
    dict_cols: tuple = (),
):
    """One raw prep task of the direct replay: read a shard (a run of
    parquet row groups) → flag+partition → LWW-combine → split by pid.
    Fusing the whole pre-shuffle half into one task (instead of a
    read→map→map Dataset execution) removes the streaming executor's
    per-execution ramp and its per-operator CPU allocation, which
    measurably cap the replay at ~45% utilization on an idle 32-CPU
    box (BASELINE.md). Task count = input shards, so parallelism
    follows the data, not the operator plan."""
    t = pq.ParquetFile(path).read_row_groups(row_groups)
    fp = FlagAndPartition(num_partitions, ruleset=ruleset)
    out = fp(t)
    if combine:
        out = fold_partial_arrow(out)
    if dict_cols:
        out = _dict_encode_cols(out, dict_cols)
    return _split_block_by_pid(out, num_partitions)


def _plan_shards(files: list[str], target_rows: int) -> list[tuple[str, list[int]]]:
    """Slice an epoch's files into prep shards of ≈target_rows
    consecutive row groups (never crossing a file). Shard granularity =
    row-group granularity, so writers control read parallelism with
    row_group_size (the generator writes 65536-row groups)."""
    shards: list[tuple[str, list[int]]] = []
    for f in sorted(files):
        md = pq.read_metadata(f)
        cur: list[int] = []
        cur_rows = 0
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            if cur and cur_rows + n > target_rows:
                shards.append((f, cur))
                cur, cur_rows = [], 0
            cur.append(rg)
            cur_rows += n
        if cur:
            shards.append((f, cur))
    return shards


def _check_partition_compat(store, P: int, layout: str = "full") -> None:
    """num_partitions is part of the store's identity: pid = hash(key) % P
    routes keys to state files, so replaying with a different P would
    silently send a key's new events to a different partition than its
    existing state row. Manifests record P; refuse a mismatch. Shared by
    every replay path (serial, direct, actor, actor-direct). The state
    layout is equally identity (a full reader over delta chains would
    serve one epoch's slice as the whole state) — refuse that too."""
    latest = store.latest_epoch()
    if latest is not None:
        m = store.manifest(latest)
        committed_p = m.get("num_partitions")
        if committed_p is not None and committed_p != P:
            raise ValueError(
                f"store was built with num_partitions={committed_p}; "
                f"config asks for {P} — refusing to mix"
            )
        committed_layout = m.get("layout") or "full"
        if committed_layout != layout:
            raise ValueError(
                f"store was built with state_layout={committed_layout!r}; "
                f"config asks for {layout!r} — refusing to mix"
            )


def _launch_prep_tasks(
    batch: list[str], P: int, cfg: EngineConfig, prep, ruleset_ref, ncpu: int
) -> tuple[int, list[list]]:
    """Fan out one epoch's read→flag→combine→pid-split prep tasks and
    return (input_rows, per_pid ref lists). Shared by the direct and
    actor-direct replay paths — the shard-cap tuning below must stay
    common to both.

    Shard cap: in-flight ObjectRefs per epoch are shards × P, and the
    raylet measurably degrades past ~4k small objects in flight
    (BASELINE.md: 32M-row run 69.8 s → 11.0 s with coarser shards).
    Bound shards/epoch at 2×NCPU — enough to fill every core — by
    raising the per-shard row target on large epochs."""
    rows = sum(pq.read_metadata(f).num_rows for f in batch)
    target = max(cfg.batch_size, -(-rows // (2 * ncpu)))
    per_pid: list[list] = [[] for _ in range(P)]
    for path, rgs in _plan_shards(batch, target):
        refs = prep.remote(
            path,
            rgs,
            P,
            ruleset_ref,
            not cfg.override_coalesce,
            tuple(cfg.exchange_dict_cols),
        )
        if P == 1:
            refs = [refs]
        for p, r in enumerate(refs):
            per_pid[p].append(r)
    return rows, per_pid


def _merge_pid_chain(
    state_root: str,
    epoch: int,
    pid: int,
    override: bool,
    quarantine_root: str | None,
    committed_prior: str | None,
    prev,
    *parts,
):
    """One link of the pid-chained merge: fold THIS pid's epoch slices
    onto its state as of the previous epoch. ``prev`` is the (stats,
    state_file) result of this pid's task for epoch-1 — passing its
    ObjectRef makes Ray start this task only after the predecessor
    finished, so epochs pipeline at PARTITION granularity with no
    global per-epoch barrier (pid A can be three epochs ahead of a
    straggling pid B; keys never move between pids, so only the chain
    orders anything). Returns (stats_table | None, state_file | None)
    for the next link."""
    prior = prev[1] if prev is not None else committed_prior
    tables = [
        _dict_decode_cols(p)
        for p in parts
        if p is not None and p.num_rows > 0
    ]
    if not tables:
        return (None, prior)
    group = pa.concat_tables(tables, promote_options="permissive")
    merge = MergeWithState(
        state_root,
        epoch,
        {pid: prior} if prior else {},
        override=override,
        quarantine_root=quarantine_root,
    )
    stats = merge(group)
    return (stats, stats["file"][0].as_py())


def _direct_exchange_stats(
    flagged: "ray.data.Dataset", merge: MergeWithState, num_partitions: int
) -> pd.DataFrame:
    """Spawn-free exchange replacing ``groupby("pid").map_groups``:
    stream the combined blocks out of the dataset, split each by pid
    with a raw task, then run ONE raw merge task per touched partition.

    Why raw Ray here (the documented Dataset-API exception): Ray Data's
    hash-shuffle operator creates and force-shuts-down its aggregator
    actor pool per dataset execution — a measured ~1.7 s fixed cost per
    epoch at any CPU count (BASELINE.md), which dominates small/medium
    epochs and caps multi-epoch scaling. The raw-task exchange has no
    per-epoch pool. Partitioning assumption: ``pid`` is already
    assigned upstream (FlagAndPartition) and P is fixed by the store,
    so this is a pure routing exchange, not a repartition decision.

    Scale bound: the driver holds O(blocks × P) ObjectRefs during one
    epoch. At the 100-TB shape either raise the block size or use
    cfg.merge_exchange="streaming" — crossover in BASELINE.md."""
    import ray as _ray

    P = num_partitions
    split = cached_remote(
        ("replay_split", P), _split_block_by_pid, num_returns=P
    )
    mtask = cached_remote("replay_merge", _merge_pid_parts)

    per_pid: list[list] = [[] for _ in range(P)]
    for bundle in flagged.iter_internal_ref_bundles():
        for block_ref, _md in bundle.blocks:
            refs = split.remote(block_ref, P)
            if P == 1:
                refs = [refs]
            for p, r in enumerate(refs):
                per_pid[p].append(r)

    merge_ref = _ray.put(merge)
    stats_refs = [mtask.remote(merge_ref, *parts) for parts in per_pid if parts]
    tables = [t for t in _ray.get(stats_refs) if t is not None]
    if not tables:
        return pd.DataFrame(
            columns=[
                "pid",
                "rows",
                "live_rows",
                "merged_partials",
                "quarantined",
                "file",
            ]
        )
    return pa.concat_tables(tables).to_pandas()


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

    _check_partition_compat(store, cfg.num_partitions)

    prior = store.partition_files()

    flagged = preflagged if preflagged is not None else _flag_and_combine(changes, cfg)
    merge = MergeWithState(
        store.state_dir,
        epoch,
        prior,
        override=cfg.override_coalesce,
        quarantine_root=store.quarantine_dir,
    )

    if cfg.merge_exchange == "direct" and not cfg.merge_concurrency:
        stats = _direct_exchange_stats(flagged, merge, cfg.num_partitions)
    else:

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
        if not hi or hi in ("bootstrap", "repair", "quarantine", "compact"):
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
    if cfg.state_layout == "delta" and epochs:
        if cfg.merge_exchange != "direct" or cfg.state_tier != "disk":
            raise ValueError(
                "state_layout='delta' requires merge_exchange='direct' "
                "and state_tier='disk' (the production path); got "
                f"exchange={cfg.merge_exchange!r}, tier={cfg.state_tier!r}"
            )
        if cfg.override_coalesce:
            raise ValueError(
                "state_layout='delta' is whole-row LWW only: Override "
                "column-coalesce folds are not associative across "
                "epochs, so delta chains cannot reproduce them"
            )
    if cfg.state_tier == "actor" and epochs:
        if cfg.merge_exchange == "direct":
            return _replay_files_actor_direct(epochs, start, store, cfg)
        return _replay_files_actor(epochs, start, store, cfg)
    if (
        cfg.merge_exchange == "direct"
        and not cfg.merge_concurrency
        and epochs
    ):
        return _replay_files_direct(epochs, start, store, cfg)
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


def _replay_files_direct(
    epochs: list[list[str]], start: int, store, cfg: EngineConfig
) -> list[dict]:
    """Direct-exchange replay with PID-LEVEL epoch chaining — the
    engine's fast path for multi-epoch backlogs.

    Per epoch, the read+flag+combine dataset streams on the driver's
    main thread (``iter_internal_ref_bundles``) and each combined block
    is split by pid with a raw task. The merge for (epoch e, pid p) is
    a raw task whose FIRST argument is the ObjectRef of (e-1, p)'s
    result — Ray's dependency tracking replaces the global per-epoch
    shuffle barrier with 64 independent per-partition chains, so epoch
    e+1's drain and e's merges overlap without threads (the threaded
    prefetch in _replay_files_pipelined measurably collapses under the
    direct drain — two driver threads fighting over submission).

    Durability is unchanged: each link writes its partition file
    tmp+rename, the driver commits manifests strictly in epoch order,
    and a crash leaves later epochs' orphan files that the re-run
    overwrites (an epoch exists only when its manifest does).
    Backpressure: at most MAX_WAVES epochs of split outputs are in
    flight; the driver commits (blocks on) the oldest wave first."""
    import ray as _ray

    MAX_WAVES = 2
    P = cfg.num_partitions
    delta = cfg.state_layout == "delta"
    _check_partition_compat(store, P, layout=cfg.state_layout)

    prep = cached_remote(("replay_prep", P), _prep_split_shard, num_returns=P)
    chain = cached_remote("replay_chain", _merge_pid_chain)
    ruleset_ref = _ray.put(cfg.rules) if cfg.rules is not None else None

    committed_prior = store.partition_files()  # pid -> newest state file
    prev_refs: dict[int, object] = {}
    pending: list[tuple] = []
    out: list[dict] = []

    def _commit(entry) -> dict:
        e, offset_range, rows, refs = entry
        results = _ray.get(refs)
        stats_tables = [r[0] for r in results if r[0] is not None]
        if stats_tables:
            stats = pa.concat_tables(stats_tables).to_pandas()
        else:
            stats = pd.DataFrame(
                columns=["pid", "rows", "live_rows", "quarantined", "file"]
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
            "input_events": int(rows),
            "applied_events": int(rows) - quarantined,
            "quarantined": quarantined,
            "touched_partitions": len(touched),
        }
        return store.commit_epoch(
            e,
            touched,
            offset_range,
            counts,
            num_partitions=P,
            layout=cfg.state_layout,
        )

    for i, batch in enumerate(epochs):
        e = start + i
        if store.is_committed(e):
            out.append(store.manifest(e))
            continue
        ncpu = int(_ray.cluster_resources().get("CPU", 32))
        rows, per_pid = _launch_prep_tasks(batch, P, cfg, prep, ruleset_ref, ncpu)
        wave = []
        for p in range(P):
            # delta layout: no prior-state read and no pid chaining —
            # each epoch folds ONLY its own rows into an append-only
            # delta file (the read side folds the chain), so merges
            # across epochs are fully independent tasks
            ref = chain.remote(
                store.state_dir,
                e,
                p,
                cfg.override_coalesce,
                store.quarantine_dir,
                None if delta else committed_prior.get(p),
                None if delta else prev_refs.get(p),
                *per_pid[p],
            )
            prev_refs[p] = ref
            wave.append(ref)
        pending.append((e, (batch[0], batch[-1]), rows, wave))
        while len(pending) >= MAX_WAVES:
            out.append(_commit(pending.pop(0)))

    for entry in pending:
        out.append(_commit(entry))
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

    _check_partition_compat(store, cfg.num_partitions)

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


def _replay_files_actor_direct(
    epochs: list[list[str]], start: int, store, cfg: EngineConfig
) -> list[dict]:
    """The COMPOSED multi-node path (all three levers together):

    - direct fused prep (``merge_exchange="direct"``): read→flag→
      combine→pid-split as raw tasks, no Dataset executor ramp;
    - actor-resident merge state (``state_tier="actor"``): prep's
      per-pid slices ship STRAIGHT to the owning StateShard actor (the
      ObjectRefs pass through — nothing lands on the driver), and the
      prior state never re-reads from disk between epochs — the lever
      that wins when state lives on remote/throttled storage
      (tools/crossover_state_tier.py measures the crossover);
    - epoch overlap (``pipeline_epochs``): epoch e+1's prep tasks run
      while e's applies and flush drain (checkpoint purity holds — e+1
      slices are SUBMITTED to the actors only after flush(e) returns).

    Durability is unchanged: every epoch checkpoints dirty partitions +
    manifest; crash recovery loads the last committed epoch and
    re-applies the tail. Quarantine rows drop shard-side (counted in
    the manifest) like the plain actor path."""
    import ray as _ray

    from cosmwasm_etl_ray.state.actor_state import ActorStateTier

    P = cfg.num_partitions
    _check_partition_compat(store, P)

    tier = ActorStateTier.from_store(store, cfg, num_actors=cfg.actor_state_shards)
    prep = cached_remote(("replay_prep", P), _prep_split_shard, num_returns=P)
    ruleset_ref = _ray.put(cfg.rules) if cfg.rules is not None else None
    ncpu = int(_ray.cluster_resources().get("CPU", 32))

    def launch_prep(batch: list[str]):
        return _launch_prep_tasks(batch, P, cfg, prep, ruleset_ref, ncpu)

    order = [(start + i, b) for i, b in enumerate(epochs)]
    preps: dict[int, tuple] = {}

    def maybe_launch(i: int) -> None:
        if i < len(order) and cfg.pipeline_epochs:
            e, batch = order[i]
            if not store.is_committed(e) and i not in preps:
                preps[i] = launch_prep(batch)

    out: list[dict] = []
    maybe_launch(0)
    for i, (e, batch) in enumerate(order):
        if store.is_committed(e):
            out.append(store.manifest(e))
            maybe_launch(i + 1)
            continue
        rows, per_pid = preps.pop(i) if i in preps else launch_prep(batch)
        # overlap: the NEXT epoch's prep tasks stream while this
        # epoch's applies + flush drain on the actors
        maybe_launch(i + 1)
        apply_refs = []
        for p in range(P):
            h = tier._handle(p)
            for r in per_pid[p]:
                apply_refs.append(h.apply.remote(p, r))
        counts = _ray.get(apply_refs)
        invalid = sum(c[1] for c in counts)
        out.append(
            tier.flush(
                store,
                e,
                offset_range=(batch[0], batch[-1]),
                input_rows=rows,
                applied_rows=rows - invalid,
            )
        )
    return out


def _empty_state_table() -> "pa.Table":
    """Typed empty state table (the canonical change-log value columns
    minus the store-internal op/pid/key64) — ONE definition shared by
    read_state and lookup_state so an empty store cannot produce two
    different schemas (the mixed-schema-union hazard)."""
    return pa.table(
        {
            "repo": pa.array([], pa.string()),
            "path": pa.array([], pa.string()),
            "commit": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "content": pa.array([], pa.string()),
        }
    )


def read_state(store, epoch: int | None = None) -> "ray.data.Dataset":
    """The live current-state table (tombstones dropped) as a Dataset.
    Layout-aware: a delta-layout store folds per-pid chains instead of
    reading single partition files (state/delta.py)."""
    from cosmwasm_etl_ray.state.delta import read_state_delta, store_layout

    if store_layout(store) == "delta":
        return read_state_delta(store, epoch)
    files = list(store.partition_files(epoch).values())
    if not files:
        # empty store (nothing committed yet): a typed empty Dataset —
        # read_parquet([]) raises, and callers index these columns
        return ray.data.from_arrow(_empty_state_table())
    ds = ray.data.read_parquet(files)

    def live_rows(t: "pa.Table") -> "pa.Table":
        # Arrow-native (zero-copy from the object store): the wide
        # content strings never convert to pandas just for a tombstone
        # filter — this is a serving path over the whole state
        t = t.filter(pc.not_equal(t[OP_COL], pa.scalar("delete")))
        return t.drop_columns(
            [c for c in (OP_COL, "pid", "key64") if c in t.column_names]
        )

    return ds.map_batches(live_rows, batch_format="pyarrow")


def lookup_state(
    store, keys: "pd.DataFrame", num_partitions: int
) -> tuple["ray.data.Dataset", list[str]]:
    """Point lookups on the merge store: read ONLY the partition files
    the requested (repo, path) keys hash to — the serving path of the
    state store. |files read| = |distinct pids of the key set|, not the
    partition count, so a handful of keys touches a handful of files
    whatever the store's width (the same path-pruning discipline as the
    persistent IVF probe). Tombstoned keys simply miss. Returns the
    (live-rows) Dataset and the pruned file list (tests assert on it).
    Layout-aware: delta stores fold only the probed pids' chains.
    """
    from cosmwasm_etl_ray.state.delta import lookup_state_delta, store_layout

    if store_layout(store) == "delta":
        return lookup_state_delta(store, keys, num_partitions)
    import numpy as np

    from cosmwasm_etl_ray.functions.hashing import assign_partition

    pids = np.unique(
        assign_partition(
            keys["repo"].to_numpy(dtype=object),
            keys["path"].to_numpy(dtype=object),
            num_partitions,
        )
    )
    pfiles = store.partition_files()
    files = [pfiles[int(p)] for p in pids if int(p) in pfiles]
    key_ref = ray.put(keys[["repo", "path"]].drop_duplicates())

    def probe(df: "pd.DataFrame") -> "pd.DataFrame":
        want = ray.get(key_ref)
        hit = df.merge(want, on=["repo", "path"], how="inner")
        hit = hit[hit[OP_COL] != "delete"]
        return hit.drop(
            columns=[
                c for c in (OP_COL, "pid", "key64", "epoch")
                if c in hit.columns
            ]
        )

    if not files:
        return ray.data.from_arrow(_empty_state_table()), []
    # scan-level pushdown: the repo membership test runs inside the
    # parquet read (decode skips non-matching rows; statistics can skip
    # whole row groups) — the probe's exact (repo, path) merge still
    # does the precise cut
    import pyarrow.compute as pc

    repo_set = pa.array(sorted(set(keys["repo"])), pa.string())
    ds = ray.data.read_parquet(
        files, filter=pc.field("repo").isin(repo_set)
    ).map_batches(probe, batch_format="pandas")
    return ds, files


def _diff_pid(old_file: str | None, new_file: str) -> "pa.Table":
    """Diff one partition between two committed epochs: live rows only
    (tombstones are state-internal), classified insert/update/delete by
    a full-outer key merge. Commits strictly increase per key, so an
    update always changes the commit — (key, commit) equality means
    unchanged."""
    cols = ["repo", "path", "commit", OP_COL]
    new = pq.read_table(new_file, columns=cols).to_pandas()
    new = new[new[OP_COL] != "delete"][["repo", "path", "commit"]]
    if old_file is None:
        old = new.iloc[0:0]
    else:
        old = pq.read_table(old_file, columns=cols).to_pandas()
        old = old[old[OP_COL] != "delete"][["repo", "path", "commit"]]
    m = old.merge(
        new, on=["repo", "path"], how="outer",
        suffixes=("_old", "_new"), indicator=True,
    )
    kind = pd.Series("update", index=m.index, dtype="object")
    kind[m["_merge"] == "right_only"] = "insert"
    kind[m["_merge"] == "left_only"] = "delete"
    changed = (m["_merge"] != "both") | (m["commit_old"] != m["commit_new"])
    m = m[changed]
    out = pd.DataFrame(
        {
            "repo": m["repo"],
            "path": m["path"],
            "kind": kind[changed],
            "commit": m["commit_new"].where(
                m["_merge"] != "left_only", m["commit_old"]
            ),
        }
    )
    # explicit schema: a touched partition whose LIVE view is unchanged
    # (e.g. tombstone rewritten) yields zero changed rows, and a bare
    # from_pandas would infer all-null columns — the mixed-schema union
    # hazard at exchange boundaries
    schema = pa.schema(
        [("repo", pa.string()), ("path", pa.string()),
         ("kind", pa.string()), ("commit", pa.string())]
    )
    return pa.Table.from_pandas(
        out.reset_index(drop=True), schema=schema, preserve_index=False
    )


def epoch_diff(store, e_old: int, e_new: int) -> "ray.data.Dataset":
    """The change feed BETWEEN two committed epochs, read delta-bounded:
    manifest lineage says which partitions epoch (e_old, e_new] touched,
    and ONLY those pids' old+new files are read — IO follows the delta,
    not the store width (the CDC-out analogue of the reference's
    synced-height incremental consumers). One raw task per touched pid;
    rows classify insert/update/delete by full-outer key merge.
    Full-layout only: delta chains carry no per-epoch full partition
    files to diff (compact first, or replay with state_layout='full')."""
    from cosmwasm_etl_ray.state.delta import store_layout as _sl

    if _sl(store) == "delta":
        raise ValueError(
            "epoch_diff is full-layout only: delta chains have no "
            "per-epoch full partition files to diff — compact first "
            "(state/delta.compact_state) or replay with "
            "state_layout='full'"
        )
    from cosmwasm_etl_ray.compat import cached_remote

    new_parts = store.manifest(e_new)["partitions"]
    old_files = store.partition_files(e_old)
    touched = {
        int(pid): info["file"]
        for pid, info in new_parts.items()
        if e_old < info["epoch"] <= e_new
    }
    if not touched:
        return ray.data.from_arrow(
            pa.table(
                {
                    "repo": pa.array([], pa.string()),
                    "path": pa.array([], pa.string()),
                    "kind": pa.array([], pa.string()),
                    "commit": pa.array([], pa.string()),
                }
            )
        )
    task = cached_remote("epoch_diff_pid", _diff_pid)
    refs = [
        task.remote(old_files.get(pid), f)
        for pid, f in sorted(touched.items())
    ]
    return ray.data.from_arrow_refs(refs)


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
