"""glibc allocator tuning for slow-first-touch hosts.

On virtualized/overcommitted hosts, populating a FRESH anonymous page
can be orders of magnitude slower than writing a recycled one (this box
measures 33 MB/s first-touch vs 3.6-6.4 GB/s on reused pages — host
memory ballooning, not guest CPU). glibc serves any malloc above
M_MMAP_THRESHOLD (default 128 KiB) with a private mmap and munmaps it
on free, so every large numpy/pandas temp — a (perms × shingles)
MinHash matrix, a join probe buffer, a pivot frame — repays the
first-touch cost on EVERY batch: measured 0.84 s for ten 25 MiB
alloc/touch/free cycles at default settings vs 0.000 s with the
threshold raised (pages recycle through the arena free list instead of
returning to the kernel).

Arrow is unaffected (its memory pool is jemalloc, which retains and
reuses by default) — this tunes exactly the numpy/pandas side of the
engine. On hosts with fast first-touch the change is harmless: RSS
high-water stays (frees no longer trim), but per-worker peak usage
bounds it and the object store is untouched.

Applied once at package import in every process that imports the
engine (driver AND Ray workers — workers import the module to
deserialize tasks). Opt out with GRAFT_MALLOC_TUNE=0.
"""

from __future__ import annotations

import ctypes
import os

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_ONE_GIB = 1 << 30

_applied = False


def tune_malloc() -> bool:
    """Raise glibc's mmap/trim thresholds so large short-lived buffers
    recycle through the arena instead of round-tripping the kernel.
    Idempotent; returns True when the tune is active."""
    global _applied
    if _applied:
        return True
    if os.environ.get("GRAFT_MALLOC_TUNE", "1").lower() in ("0", "false", "no"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6")
        ok1 = libc.mallopt(ctypes.c_int(_M_MMAP_THRESHOLD), ctypes.c_int(_ONE_GIB))
        ok2 = libc.mallopt(ctypes.c_int(_M_TRIM_THRESHOLD), ctypes.c_int(_ONE_GIB))
        _applied = bool(ok1) and bool(ok2)
    except OSError:  # non-glibc platform: leave defaults
        _applied = False
    return _applied
