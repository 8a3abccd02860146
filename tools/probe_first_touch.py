"""Measure page-population cost: RSS growth vs recycled pages.

Motivation: on this sandbox, GROWING a process's anonymous RSS
populates pages at ~20-70 MB/s (host-side overcommit/ballooning must
back each new guest page), while writing already-owned pages runs at
DRAM speed (40-70 GB/s here) — a 3 orders-of-magnitude gap. glibc
munmaps any free above M_MMAP_THRESHOLD (dynamic, capped at 32 MiB),
so numpy temps larger than the cap leave the process on every free;
under multi-process competition (32 Ray workers) the freed pages
migrate, and the next allocation re-enters the slow growth path. The
engine raises the threshold at import (cosmwasm_etl_ray/_malloc.py) so
each worker's peak working set stays arena-resident. Measured engine
effect: MinHash sketch stage 4.87 s -> 1.78 s, headline replay
2.10 s -> 1.78 s, systematic 0.3-1.1 s gains across the pandas-heavy
sweep rows (see BASELINE.md).

Prints:
  grow_touch_mbps     population rate while RSS grows (chunks kept)
  warm_touch_mbps     write rate on pages the process already owns
  churn_default_s     5x 96MiB alloc/touch/free, glibc defaults
                      (single quiet process: the kernel often hands
                      back the just-freed pages, so this UNDERSTATES
                      the cost in a busy multi-worker session)
  churn_tuned_s       same loop after mallopt(M_MMAP_THRESHOLD, 1GiB)

Run:  python tools/probe_first_touch.py   (no Ray; ~20 s)
"""

from __future__ import annotations

import ctypes
import json
import subprocess
import sys
import time

import numpy as np

_CHILD = "child"


def _touch_rates() -> dict:
    # grow: keep four 64 MiB chunks so RSS rises monotonically —
    # every page is NEW to the process (the slow path)
    kept = []
    t0 = time.perf_counter()
    for _ in range(4):
        x = np.empty(8_388_608, dtype=np.uint64)  # 64 MiB
        x[::512] = 1  # one write per 4 KiB page
        kept.append(x)
    grow = 256 / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    for x in kept:
        x[::512] = 2
    warm = 256 / (time.perf_counter() - t0)
    del kept
    return {"grow_touch_mbps": round(grow, 1), "warm_touch_mbps": round(warm, 1)}


def _churn(seconds_budget: float = 30.0) -> float:
    # buffer ABOVE glibc's dynamic-threshold cap (32 MiB): smaller
    # blocks self-heal (a munmap raises the threshold to that size),
    # so only >cap temps — a full-corpus sketch matrix, a big join
    # frame — churn forever at defaults. 5 x 96 MiB alloc/touch/free.
    t0 = time.perf_counter()
    for _ in range(5):
        x = np.empty((64, 196_608), dtype=np.uint64)  # ~96 MiB
        x[:, ::512] = 1
        del x
        if time.perf_counter() - t0 > seconds_budget:
            break
    return time.perf_counter() - t0


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == _CHILD:
        # child mode: measure churn in a FRESH process (the parent's
        # arena state would otherwise contaminate the default-setting
        # measurement), tuned or not per argv[2]
        if sys.argv[2] == "tuned":
            libc = ctypes.CDLL("libc.so.6")
            libc.mallopt(ctypes.c_int(-3), ctypes.c_int(1 << 30))
            libc.mallopt(ctypes.c_int(-1), ctypes.c_int(1 << 30))
        print(json.dumps({"churn_s": round(_churn(), 3)}))
        return

    out = _touch_rates()
    for mode in ("default", "tuned"):
        r = subprocess.run(
            [sys.executable, __file__, _CHILD, mode],
            capture_output=True,
            text=True,
            env={"PATH": "/usr/bin:/bin", "GRAFT_MALLOC_TUNE": "0"},
            check=True,
        )
        out[f"churn_{mode}_s"] = json.loads(r.stdout)["churn_s"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
