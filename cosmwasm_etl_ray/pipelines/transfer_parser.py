"""Epoch-driven transfer parser: the reference parser's Run loop on
the transfer domain, with the exactly-once sink.

The reference parses one height range per iteration and commits parsed
txs + the cursor in one transaction
(/root/reference/parser/dex/dex.go:87-267,
/root/reference/parser/dex/repo/repository.go:63-122). Here the tx-id
key space splits into contiguous EPOCHS (a tx's logs never span
epochs — the same invariant as one height, which is what makes the
per-tx duplicate eliminator epoch-local); each epoch runs

    raw logs (tx in [lo, hi)) -> decode -> mapper family -> eliminate
      -> shuffle by pair-hash pid -> per-partition Parquet write
      -> manifest commit {offset_range=(lo,hi), per-pid lineage}

through the SAME exactly-once discipline as the CDC replay sink: data
files land tmp+rename (task retries self-overwrite, never append), and
the epoch exists only once its manifest does — a crash mid-epoch
leaves no visible state, a re-run of a committed epoch is a no-op skip
(`state/manifest.StateStore`).

Unlike the CDC merge store (latest state per partition), this sink is
APPEND-shaped — every epoch contributes its own partition files, like
the reference's INSERT of parsed txs — so readers collect each
committed epoch's files from its manifest (`ledger()`).

At 100-TB scale the raw-log source is commit-partitioned storage and
``plan_epochs`` becomes the tail loop's next-range query; the sink
layout (hash(pair) partitions per epoch) lets downstream pair-level
consumers prune to one partition across all epochs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from cosmwasm_etl_ray.functions.hashing import stable_hash64
from cosmwasm_etl_ray.sources.rawlogs import raw_logs_from_lineitem
from cosmwasm_etl_ray.stages.transfers import (
    TransferMapperFamily,
    decode_raw_logs_batch,
    eliminate_duplicate_transfers,
)
from cosmwasm_etl_ray.state.manifest import StateStore

LEDGER_COLS = ["tx_id", "log_idx", "pair", "token", "ttype", "amount"]


class _WritePartition:
    """One pid group -> one epoch partition file + a lineage row."""

    def __init__(self, root: str, epoch: int):
        self.root = root
        self.epoch = epoch
        os.makedirs(os.path.join(root, f"epoch={epoch}"), exist_ok=True)

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["pid"].iloc[0])
        out = os.path.join(
            self.root, f"epoch={self.epoch}", f"part-{pid:05d}.parquet"
        )
        tmp = f"{out}.tmp.{os.getpid()}"
        table = pa.Table.from_pandas(
            g[LEDGER_COLS].reset_index(drop=True), preserve_index=False
        )
        pq.write_table(table, tmp)
        os.replace(tmp, out)
        return pd.DataFrame({"pid": [pid], "file": [out], "rows": [len(g)]})


class TransferParserPipeline:
    """Run the transfer parse epoch by epoch into an exactly-once
    append store; resumable from the last committed manifest."""

    def __init__(
        self,
        sf_dir: str,
        store_root: str,
        n_epochs: int = 4,
        num_partitions: int = 16,
    ):
        self.sf_dir = sf_dir
        self.store = StateStore(store_root)
        self.n_epochs = n_epochs
        self.num_partitions = num_partitions
        self.family = TransferMapperFamily()

    # -- planning -----------------------------------------------------
    def plan_epochs(self) -> list[tuple[int, int]]:
        """Contiguous tx-id ranges covering [1, max_tx]. The tail-loop
        seam: at scale this asks the source for the next uncommitted
        range instead of scanning (S1/S2)."""
        hi = ray.data.read_parquet(
            f"{self.sf_dir}/lineitem.parquet", columns=["l_orderkey"]
        ).max("l_orderkey")
        hi = int(hi) + 1
        step = max(1, (hi + self.n_epochs - 1) // self.n_epochs)
        return [(lo, min(lo + step, hi)) for lo in range(1, hi, step)]

    # -- one epoch ----------------------------------------------------
    def run_epoch(self, epoch: int, lo: int, hi: int) -> dict:
        if self.store.is_committed(epoch):
            return {"epoch": epoch, "skipped": True}

        # decoded feeds two consumers (mapper + quarantine side output)
        decoded = (
            raw_logs_from_lineitem(self.sf_dir, tx_range=(lo, hi))
            .map_batches(decode_raw_logs_batch, batch_format="pyarrow")
            .materialize()
        )
        mapped = decoded.map_batches(self.family, batch_format="pyarrow")
        ledger = eliminate_duplicate_transfers(mapped)

        P = self.num_partitions
        n_quarantined = self._write_quarantine(decoded, epoch)

        def add_pid(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["pid"] = (
                stable_hash64(df["pair"].to_numpy()) % np.uint64(P)
            ).astype(np.int64)
            return df

        writer = _WritePartition(self.store.root, epoch)

        def write_partition(g: pd.DataFrame) -> pd.DataFrame:
            return writer(g)

        stats = (
            ledger.map_batches(add_pid, batch_format="pandas")
            .groupby("pid")
            .map_groups(write_partition, batch_format="pandas")
            .to_pandas()  # tiny: one lineage row per touched partition
        )
        touched = {
            int(r.pid): {"file": r.file, "rows": int(r.rows)}
            for r in stats.itertuples()
        }
        self.store.commit_epoch(
            epoch,
            touched,
            offset_range=(str(lo), str(hi)),
            counts={
                "rows": int(stats["rows"].sum()),
                "quarantined": n_quarantined,
            },
            num_partitions=P,
        )
        return {"epoch": epoch, "skipped": False, "rows": int(stats["rows"].sum())}

    def _write_quarantine(self, decoded: "ray.data.Dataset", epoch: int) -> int:
        """Malformed logs (no amount attr — undecodable under every
        rule) land as dead-letter rows under the SAME epoch, committed
        by the same manifest (the reference upserts quarantines in the
        parsed-tx transaction, /root/reference/parser/dex/repo/
        repository.go:63-122). Deterministic per-pid files keep re-runs
        idempotent."""
        import pyarrow.compute as pc

        bad = decoded.map_batches(
            lambda t: t.filter(pc.is_null(t["amount_str"])),
            batch_format="pyarrow",
        )
        qdir = self.store.quarantine_dir
        P = self.num_partitions

        def add_pid(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["pid"] = (
                stable_hash64(df["tx_id"].to_numpy()) % np.uint64(P)
            ).astype(np.int64)
            return df

        def write_q(g: pd.DataFrame) -> pd.DataFrame:
            pid = int(g["pid"].iloc[0])
            out_dir = os.path.join(qdir, f"epoch={epoch}")
            os.makedirs(out_dir, exist_ok=True)
            out = os.path.join(out_dir, f"part-{pid:05d}.parquet")
            tmp = f"{out}.tmp.{os.getpid()}"
            pq.write_table(
                pa.Table.from_pandas(
                    g.drop(columns=["pid"]).reset_index(drop=True),
                    preserve_index=False,
                ),
                tmp,
            )
            os.replace(tmp, out)
            return pd.DataFrame({"pid": [pid], "rows": [len(g)]})

        stats = (
            bad.map_batches(add_pid, batch_format="pandas")
            .groupby("pid")
            .map_groups(write_q, batch_format="pandas")
            .to_pandas()
        )
        return int(stats["rows"].sum()) if len(stats) else 0

    # -- whole run ----------------------------------------------------
    def run(self, max_concurrent: int = 2) -> list[dict]:
        """Epochs are INDEPENDENT here (append sink, no cross-epoch
        state — unlike the CDC merge), so waves of them run
        concurrently: each thread drives its own Ray Dataset job and
        the cluster interleaves them (the same shape as the
        aggregator's concurrent tick). ``ledger()`` reads only each
        manifest's own-epoch entries, so commit order doesn't matter."""
        plan = self.plan_epochs()
        if max_concurrent <= 1 or len(plan) == 1:
            return [self.run_epoch(e, lo, hi) for e, (lo, hi) in enumerate(plan)]

        from concurrent.futures import ThreadPoolExecutor

        from cosmwasm_etl_ray.compat import ensure_thread_safe_lazy_imports

        ensure_thread_safe_lazy_imports()
        results: list[dict | None] = [None] * len(plan)
        with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
            futs = {
                pool.submit(self.run_epoch, e, lo, hi): e
                for e, (lo, hi) in enumerate(plan)
            }
            for f, e in futs.items():
                results[e] = f.result()  # first error propagates
        return results

    # -- readers ------------------------------------------------------
    def epoch_files(self) -> list[str]:
        """Every committed epoch's OWN files (the append view — each
        manifest also carries forward prior epochs' entries, which we
        filter back out by their recorded epoch)."""
        files = []
        for e in self.store.committed_epochs():
            m = self.store.manifest(e)
            files += [
                info["file"]
                for info in m["partitions"].values()
                if info["epoch"] == e
            ]
        return sorted(files)

    def ledger(self) -> "ray.data.Dataset":
        files = self.epoch_files()
        if not files:
            return ray.data.from_arrow(
                pa.table({c: pa.array([], pa.int64()) for c in LEDGER_COLS})
            )
        return ray.data.read_parquet(files)
