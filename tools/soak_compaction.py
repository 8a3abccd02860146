"""Many-epoch append-store soak: measure what compaction buys.

Builds a K× stress lineitem (orderkey-shifted concat, staying
tx-ordered so row-group pruning keeps working), runs the transfer
parser at E epochs × P partitions (E×P small files), then times a full
ledger scan before compaction, the compaction itself, and the scan
after compaction + GC. Prints one JSON line.

Usage: python tools/soak_compaction.py [--mult 4] [--epochs 32] [--parts 32]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def build_stress(sf_dir: str, out_dir: str, mult: int) -> str:
    """K copies of lineitem with shifted l_orderkey, written tx-ordered
    in bounded row groups (the pruning-friendly layout the 100-TB
    source contract assumes)."""
    src = pq.read_table(f"{sf_dir}/lineitem.parquet")
    hi = pc.max(src["l_orderkey"]).as_py() + 1
    parts = []
    for k in range(mult):
        t = src.set_column(
            src.schema.get_field_index("l_orderkey"),
            "l_orderkey",
            pc.add(src["l_orderkey"], pa.scalar(k * hi, pa.int64())),
        )
        parts.append(t)
    big = pa.concat_tables(parts)
    out = os.path.join(out_dir, "lineitem.parquet")
    pq.write_table(big, out, row_group_size=262144)
    return out


def timed_scan(pipe) -> tuple[float, int, int]:
    files = pipe.epoch_files()
    t0 = time.time()
    n = pipe.ledger().count()
    return time.time() - t0, len(files), int(n)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--mult", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=32)
    ap.add_argument("--parts", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from cosmwasm_etl_ray.pipelines.transfer_parser import TransferParserPipeline

    work = tempfile.mkdtemp(prefix="soak_compact_", dir="/tmp")
    try:
        src_dir = os.path.join(work, "src")
        os.makedirs(src_dir)
        build_stress(args.sf_dir, src_dir, args.mult)

        pipe = TransferParserPipeline(
            src_dir,
            os.path.join(work, "store"),
            n_epochs=args.epochs,
            num_partitions=args.parts,
        )
        t0 = time.time()
        pipe.run(max_concurrent=8)
        parse_s = time.time() - t0

        scan_before_s, files_before, rows_before = timed_scan(pipe)
        t0 = time.time()
        pipe.compact()
        compact_s = time.time() - t0
        gc = pipe.gc_compacted()
        scan_after_s, files_after, rows_after = timed_scan(pipe)
        assert rows_before == rows_after, (rows_before, rows_after)
        leftover = glob.glob(os.path.join(pipe.store.root, "epoch=*", "*.parquet"))

        print(
            json.dumps(
                {
                    "metric": "compaction_soak",
                    "mult": args.mult,
                    "epochs": args.epochs,
                    "parts": args.parts,
                    "ledger_rows": rows_before,
                    "parse_s": round(parse_s, 2),
                    "files_before": files_before,
                    "files_after": files_after,
                    "scan_before_s": round(scan_before_s, 2),
                    "scan_after_s": round(scan_after_s, 2),
                    "compact_s": round(compact_s, 2),
                    "gc_deleted": gc["deleted"],
                    "epoch_files_left": len(leftover),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
