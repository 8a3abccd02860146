"""In-memory actor state tier — the raw-Ray-actor path.

The disk-backed ``MergeWithState`` path is the default (state survives
any process death; epoch = checkpoint). This module is the LOW-LATENCY
streaming alternative the Dataset API cannot express: a pool of
``StateShard`` actors holds the current table in RAM across epochs (the
reference's in-process pair key set, ST1 —
/root/reference/parser/dex/dezswap/app.go:42-68), applying folded
partials as they stream in, and CHECKPOINTS into the same manifest
store (so crash recovery = load the last flushed epoch and re-apply the
tail — identical reconvergence semantics).

Routing: pid → actor ``pid % num_actors``; a pid's rows live on exactly
one actor, so applies are partition-local and require no cross-actor
coordination. Apply order does not matter (LWW by commit is order-free),
so concurrent in-flight applies are safe.

This is deliberately raw ``@ray.remote`` — the one place the engine
drops below the Dataset API, per the design rule (shared mutable state
only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from cosmwasm_etl_ray.config import EngineConfig
from cosmwasm_etl_ray.stages.merge import (
    STATE_CODEC,
    fold_lww_arrow,
    fold_partial_arrow,
)
from cosmwasm_etl_ray.stages.normalize import FlagAndPartition


@ray.remote
class StateShard:
    """Owns the in-memory state tables for pids ≡ shard (mod actors).
    State lives as Arrow tables end-to-end: applies concatenate (with
    permissive promotion for additive schema evolution) and fold via
    fold_lww_arrow — the wide content strings never convert to
    Python/pandas objects, and the inbound slices arrive zero-copy
    through the object store."""

    def __init__(self):
        self.tables: dict[int, pa.Table] = {}
        self.pending: dict[int, list] = {}
        self.dirty: set[int] = set()

    def apply(self, pid: int, partial: "pa.Table") -> tuple[int, int]:
        # applies only BUFFER (zero-copy table refs); the LWW fold is
        # deferred to the epoch fold point (_fold_pid, at flush /
        # read). LWW is order-free, so folding once per epoch over
        # [prior, *partials] is exactly the per-apply fold's result —
        # without re-taking the full state table per inbound batch.
        #
        # Accepts RAW flagged slices too (the composed direct-prep
        # path ships _prep_split_shard outputs straight here): a
        # ``valid`` column is filtered shard-side (invalid rows drop,
        # counted), None/empty parts no-op. Returns (applied, invalid).
        if partial is None or partial.num_rows == 0:
            return (0, 0)
        if any(pa.types.is_dictionary(f.type) for f in partial.schema):
            # exchange wire encoding (cfg.exchange_dict_cols): decode
            # before buffering so state tables never mix encodings
            from cosmwasm_etl_ray.pipelines.replay import _dict_decode_cols

            partial = _dict_decode_cols(partial)
        if "valid" in partial.column_names:
            valid = partial["valid"].combine_chunks()
            n_ok = int(pc.sum(valid).as_py() or 0)
            n_bad = partial.num_rows - n_ok
            if n_bad:
                partial = partial.filter(valid)
            partial = partial.drop_columns(["valid"])
        else:
            n_ok, n_bad = partial.num_rows, 0
        if partial.num_rows:
            self.pending.setdefault(pid, []).append(partial)
            self.dirty.add(pid)
        return (n_ok, n_bad)

    def _fold_pid(self, pid: int) -> None:
        parts = self.pending.pop(pid, [])
        if not parts:
            return
        base = ([self.tables[pid]] if pid in self.tables else []) + parts
        allrows = (
            pa.concat_tables(base, promote_options="permissive")
            if len(base) > 1
            else base[0]
        )
        # fold_lww_arrow keeps the max-commit row per key (ties → later
        # input position; prior is concatenated first, like the disk
        # path) and returns rows key-sorted
        self.tables[pid] = fold_lww_arrow(allrows).combine_chunks()

    def _fold_all(self) -> None:
        for pid in list(self.pending):
            self._fold_pid(pid)

    def snapshot(self) -> dict[int, "pa.Table"]:
        self._fold_all()
        return self.tables

    def load(self, tables: dict[int, "pa.Table"]) -> int:
        self.tables.update(tables)
        return sum(t.num_rows for t in tables.values())

    def live_count(self) -> int:
        self._fold_all()
        return sum(
            int(pc.sum(pc.not_equal(t["op"], pa.scalar("delete"))).as_py() or 0)
            for t in self.tables.values()
        )

    def flush_shard(self, state_dir: str, epoch: int) -> list[dict]:
        """Checkpoint this shard's DIRTY partitions as the epoch's
        state files — written BY the actor (parallel across shards,
        nothing crosses the driver), tmp+rename like the disk path.
        Untouched pids keep resolving to their older epoch files via
        store.partition_files(). Dirty set clears on success; a crash
        before the manifest commit leaves the epoch uncommitted, and
        resume re-applies it (LWW is idempotent)."""
        import os

        import pyarrow.parquet as pq

        os.makedirs(os.path.join(state_dir, f"epoch={epoch}"), exist_ok=True)
        out = []
        for pid in sorted(self.dirty):
            self._fold_pid(pid)
            t = self.tables[pid]
            if "pid" not in t.column_names:
                t = t.append_column(
                    "pid", pa.array([pid] * t.num_rows, pa.int64())
                )
            path = os.path.join(
                state_dir, f"epoch={epoch}", f"part-{pid:05d}.parquet"
            )
            tmp = f"{path}.tmp.{os.getpid()}"
            pq.write_table(t, tmp, **STATE_CODEC)
            os.replace(tmp, path)
            live = int(
                pc.sum(pc.not_equal(t["op"], pa.scalar("delete"))).as_py() or 0
            )
            out.append(
                {
                    "pid": int(pid),
                    "file": path,
                    "rows": t.num_rows,
                    "live_rows": live,
                }
            )
        self.dirty.clear()
        return out


class ActorStateTier:
    def __init__(self, cfg: EngineConfig, num_actors: int = 8):
        self.cfg = cfg
        self.actors = [StateShard.remote() for _ in range(num_actors)]

    def _handle(self, pid: int):
        return self.actors[pid % len(self.actors)]

    def apply_changes(self, changes: "ray.data.Dataset") -> dict:
        """Stream an epoch of changes into the actors: flag+partition →
        Arrow combiner → per-batch pid-sliced routing to the owning
        shard, ALL Arrow (the slices move zero-copy through the object
        store; nothing converts to pandas). Returns {"applied":
        folded-partial rows shipped, "invalid": dropped rows}. Invalid
        rows are dropped here (the quarantine side output belongs to
        the durable sink)."""
        actors = self.actors

        def route(t: pa.Table) -> pa.Table:
            valid = t["valid"].combine_chunks()
            n_ok = int(pc.sum(valid).as_py() or 0)
            n_bad = t.num_rows - n_ok
            t = t.filter(valid).drop_columns(["valid"])
            pids = t["pid"].to_numpy(zero_copy_only=False)
            refs = []
            for pid in np.unique(pids):
                refs.append(
                    actors[int(pid) % len(actors)].apply.remote(
                        int(pid), t.filter(pa.array(pids == pid))
                    )
                )
            ray.get(refs)  # backpressure: don't outrun the shards
            return pa.table(
                {
                    "applied": pa.array([n_ok], pa.int64()),
                    "invalid": pa.array([n_bad], pa.int64()),
                }
            )

        flagged = changes.map_batches(
            FlagAndPartition(self.cfg.num_partitions, ruleset=self.cfg.rules),
            batch_format="pyarrow",
        ).map_batches(
            fold_partial_arrow, batch_format="pyarrow", batch_size=self.cfg.batch_size
        )
        stats = flagged.map_batches(route, batch_format="pyarrow").to_pandas()
        if not len(stats):
            return {"applied": 0, "invalid": 0}
        return {
            "applied": int(stats["applied"].sum()),
            "invalid": int(stats["invalid"].sum()),
        }

    # ---- checkpointing into the durable store ----
    def flush(
        self,
        store,
        epoch: int,
        offset_range=("actor", "actor"),
        input_rows: int | None = None,
        applied_rows: int | None = None,
    ) -> dict:
        """Checkpoint every shard's DIRTY partitions as the epoch's
        partition files + manifest — the same exactly-once layout the
        disk path produces, so read_state() and resume work unchanged.
        Each actor writes its own files in parallel; only the tiny
        stats rows reach the driver."""
        shard_stats = ray.get(
            [a.flush_shard.remote(store.state_dir, epoch) for a in self.actors]
        )
        touched = {
            r["pid"]: {
                "file": r["file"],
                "rows": r["rows"],
                "live_rows": r["live_rows"],
            }
            for rows in shard_stats
            for r in rows
        }
        counts = {
            "input_events": input_rows,
            "applied_events": applied_rows,
            "quarantined": (
                input_rows - applied_rows
                if input_rows is not None and applied_rows is not None
                else 0
            ),
            "touched_partitions": len(touched),
        }
        return store.commit_epoch(
            epoch,
            touched,
            offset_range,
            counts,
            num_partitions=self.cfg.num_partitions,
        )

    @classmethod
    def from_store(cls, store, cfg: EngineConfig, num_actors: int = 8):
        """Recover the tier from the last flushed checkpoint. Uses the
        same (optionally throttled) state read as the disk merge —
        paid ONCE per recovery here vs once per epoch there."""
        from cosmwasm_etl_ray.stages.merge import read_state_table

        tier = cls(cfg, num_actors=num_actors)
        per_actor: list[dict[int, pa.Table]] = [{} for _ in range(num_actors)]
        for pid, path in store.partition_files().items():
            per_actor[pid % num_actors][pid] = read_state_table(path)
        ray.get(
            [
                tier.actors[i].load.remote(per_actor[i])
                for i in range(num_actors)
                if per_actor[i]
            ]
        )
        return tier

    def live_count(self) -> int:
        return sum(ray.get([a.live_count.remote() for a in self.actors]))
