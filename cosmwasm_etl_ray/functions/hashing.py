"""Hashing primitives used across the engine.

- ``sha256_hex``: the per-row content invariant (BASELINE.json
  ``input_hint``) — must agree byte-for-byte with DuckDB's ``sha256``.
  The reference hashes raw tx bytes the same way for IDs
  (/root/reference/collector/datastore/datastore.go:426-459).
- ``stable_hash64``: deterministic 64-bit string hash for partition
  assignment (``pid = hash(repo, path) % P``). Uses pandas' SipHash
  with its fixed default key, so the partition → file mapping is
  stable across processes, runs and cluster sizes (SURVEY.md §7.4
  determinism requirement). Correctness of the LWW fold never depends
  on the hash — only file layout does.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def sha256_hex(values) -> pa.Array:
    """Vectorized-enough sha256 hex over a string Arrow array.

    hashlib releases the GIL and dominates the cost; the Python loop
    is the iteration only. Called inside map_batches so it scales out.
    """
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    out = [
        hashlib.sha256(v.encode("utf-8")).hexdigest() if v is not None else None
        for v in values.to_pylist()
    ]
    return pa.array(out, type=pa.string())


_MIX = np.uint64(0x9E3779B97F4A7C15)  # 64-bit golden-ratio mix constant


def stable_hash64(*cols: np.ndarray) -> np.ndarray:
    """Combine string columns into one deterministic uint64 per row.

    Each column is SipHashed independently and mixed arithmetically —
    4-5× faster than joining strings first (no unicode concatenation),
    same determinism guarantees."""
    h = pd.util.hash_array(np.asarray(cols[0], dtype=object), categorize=False)
    for c in cols[1:]:
        h = h * _MIX ^ pd.util.hash_array(np.asarray(c, dtype=object), categorize=False)
    return h


def assign_partition(repo: np.ndarray, path: np.ndarray, num_partitions: int) -> np.ndarray:
    return (stable_hash64(repo, path) % np.uint64(num_partitions)).astype(np.int32)


def split_table_by_shard(t, shard, n: int):
    """Slice an Arrow table into n sub-tables by a precomputed shard id
    array (single stable argsort + zero-copy slices; None for empty
    shards). THE shared splitter for every direct raw-task exchange
    (replay pid split, hash_join buckets, shard_exchange, price):
    num_returns=1 delivers a task's return as ONE value, so n == 1
    returns the bare table (or None), never a 1-tuple.
    """
    import numpy as np
    import pyarrow as pa

    if t is None or t.num_rows == 0:
        return None if n == 1 else tuple([None] * n)
    if n == 1:
        return t
    order = np.argsort(shard, kind="stable")
    st = t.take(pa.array(order))
    s = shard[order]
    bounds = np.searchsorted(s, np.arange(n + 1))
    return tuple(
        st.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        if bounds[i + 1] > bounds[i]
        else None
        for i in range(n)
    )
