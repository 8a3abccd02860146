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
