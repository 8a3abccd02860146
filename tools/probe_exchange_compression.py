"""A/B probe: does compressing the content column through the direct
exchange pay on this box?

The replay's direct exchange ships Arrow tables (pid-partitioned event
shards) through the object store; at 32-way the measured bottleneck is
shared DRAM moving those bytes (BASELINE.md "8→32 ceiling"). Arrow IPC
zstd compresses the bench corpus 4.0× (lz4 2.0×) at ~0.25 GB/s/core —
this probe measures the END-TO-END exchange leg both ways at full
parallelism on real bench data: split tasks emit shards, merge tasks
fetch+concat them, variant `raw` ships pa.Table (zero-copy plasma),
variants `lz4`/`zstd` ship IPC-compressed bytes (CPU to shrink the
memcpy). Run AFTER a clean-window check; judge by the aggregate
events/s ratio, not absolute wall.

Usage: python tools/probe_exchange_compression.py [n_files=8] [shards=32]
"""

from __future__ import annotations

import glob
import io
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.ipc as ipc
import pyarrow.parquet as pq

import ray

CACHE = "/tmp/cdc_bench_cache/v3-seed42-n8000000"


def _pack(tab: pa.Table, codec: str | None):
    if codec is None:
        return tab
    buf = io.BytesIO()
    with ipc.new_stream(
        buf, tab.schema, options=ipc.IpcWriteOptions(compression=codec)
    ) as w:
        w.write_table(tab)
    return buf.getvalue()


def _unpack(obj):
    if isinstance(obj, (bytes, memoryview)):
        return ipc.open_stream(obj).read_all()
    return obj


@ray.remote
def split(path: str, shards: int, codec: str | None):
    t = pq.read_table(path)
    h = np.mod(
        np.arange(t.num_rows), shards
    )  # round-robin stand-in for the pid hash — same byte volume
    order = np.argsort(h, kind="stable")
    t = t.take(pa.array(order))
    counts = np.bincount(h, minlength=shards)
    outs, off = [], 0
    for c in counts:
        outs.append(_pack(t.slice(off, int(c)), codec))
        off += int(c)
    return tuple(outs) if shards > 1 else outs[0]


@ray.remote
def merge(*parts):
    tabs = [_unpack(p) for p in parts]
    t = pa.concat_tables(tabs, promote_options="default")
    # touch the content column like the LWW fold does (argmax scan)
    import pyarrow.compute as pc

    n = t.num_rows
    _ = pc.max(pc.utf8_length(t["content"]))
    return n


def run(codec: str | None, files: list[str], shards: int) -> float:
    t0 = time.time()
    refs = [
        split.options(num_returns=shards).remote(f, shards, codec)
        for f in files
    ]
    per_shard = [[] for _ in range(shards)]
    for r in refs:
        rs = r if shards > 1 else [r]
        for s, ref in enumerate(rs):
            per_shard[s].append(ref)
    totals = ray.get([merge.remote(*per_shard[s]) for s in range(shards)])
    dt = time.time() - t0
    return sum(totals) / dt


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    shards = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    files = sorted(glob.glob(f"{CACHE}/*.parquet"))[:n_files]
    if not files:
        raise SystemExit(f"no bench cache at {CACHE} — run bench.py once")
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    out = {}
    for codec in (None, None, "lz4_frame", "zstd"):  # first run warms
        rate = run(codec, files, shards)
        out[codec or "raw"] = rate
        print(f"{codec or 'raw':10s} {rate/1e6:7.2f}M rows/s")
    base = out["raw"]
    for k, v in out.items():
        if k != "raw":
            print(f"{k}: {v / base:.2f}x vs raw")
    ray.shutdown()


if __name__ == "__main__":
    main()
