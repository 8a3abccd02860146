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

import pandas as pd

import ray
import ray.data

from cosmwasm_etl_ray.config import EngineConfig
from cosmwasm_etl_ray.stages.merge import (
    MergeWithState,
    _to_arrow,
    fold_partial,
    fold_partial_arrow,
)
from cosmwasm_etl_ray.stages.normalize import FlagAndPartition


@ray.remote
class StateShard:
    """Owns the in-memory state frames for pids ≡ shard (mod actors)."""

    def __init__(self):
        self.frames: dict[int, pd.DataFrame] = {}

    def apply(self, pid: int, partial: pd.DataFrame) -> int:
        prior = self.frames.get(pid)
        allrows = (
            pd.concat([prior, partial], ignore_index=True)
            if prior is not None
            else partial
        )
        self.frames[pid] = fold_partial(allrows)
        return len(self.frames[pid])

    def snapshot(self) -> dict[int, pd.DataFrame]:
        return self.frames

    def load(self, frames: dict[int, pd.DataFrame]) -> int:
        self.frames.update(frames)
        return sum(len(f) for f in frames.values())

    def live_count(self) -> int:
        return sum(int((f["op"] != "delete").sum()) for f in self.frames.values())


class ActorStateTier:
    def __init__(self, cfg: EngineConfig, num_actors: int = 8):
        self.cfg = cfg
        self.actors = [StateShard.remote() for _ in range(num_actors)]

    def _handle(self, pid: int):
        return self.actors[pid % len(self.actors)]

    def apply_changes(self, changes: "ray.data.Dataset") -> int:
        """Stream an epoch of changes into the actors: flag+partition →
        Arrow combiner → per-batch routing to the owning shard. Returns
        applied row count. Invalid rows are dropped here (the quarantine
        path belongs to the durable sink)."""
        actors = self.actors

        def route(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["valid"]].drop(columns=["valid"])
            refs = []
            for pid, g in df.groupby("pid", sort=False):
                refs.append(actors[int(pid) % len(actors)].apply.remote(int(pid), g))
            ray.get(refs)  # backpressure: don't outrun the shards
            return pd.DataFrame({"applied": [len(df)]})

        flagged = changes.map_batches(
            FlagAndPartition(self.cfg.num_partitions, ruleset=self.cfg.rules),
            batch_format="pyarrow",
        ).map_batches(
            fold_partial_arrow, batch_format="pyarrow", batch_size=self.cfg.batch_size
        )
        stats = flagged.map_batches(route, batch_format="pandas").to_pandas()
        return int(stats["applied"].sum()) if len(stats) else 0

    # ---- checkpointing into the durable store ----
    def flush(self, store, epoch: int, offset_range=("actor", "actor")) -> dict:
        """Write every shard's frames as the epoch's partition files +
        manifest — the same exactly-once layout the disk path produces,
        so read_state() and resume work unchanged."""
        merge = MergeWithState(store.state_dir, epoch, {}, override=False)
        touched = {}
        for shard in ray.get([a.snapshot.remote() for a in self.actors]):
            for pid, frame in shard.items():
                f = frame.copy()
                f["pid"] = pid
                row = merge(_to_arrow(f))  # merge stage is Arrow-native
                touched[int(pid)] = {
                    "file": row["file"][0].as_py(),
                    "rows": int(row["rows"][0].as_py()),
                    "live_rows": int(row["live_rows"][0].as_py()),
                }
        counts = {
            "input_events": None,
            "applied_events": None,
            "quarantined": 0,
            "touched_partitions": len(touched),
        }
        return store.commit_epoch(epoch, touched, offset_range, counts)

    @classmethod
    def from_store(cls, store, cfg: EngineConfig, num_actors: int = 8):
        """Recover the tier from the last flushed checkpoint."""
        tier = cls(cfg, num_actors=num_actors)
        per_actor: list[dict[int, pd.DataFrame]] = [
            {} for _ in range(num_actors)
        ]
        for pid, path in store.partition_files().items():
            df = pd.read_parquet(path)
            per_actor[pid % num_actors][pid] = df
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
