"""Tiered change source: staged Parquet first, live-source fallback.

Graft of the reference's collector-or-fallback source
(/root/reference/parser/dex/srcstore/collector_datastore.go:27-84):
the parser prefers the collector's staged store and falls back to the
live chain when a height is missing — and of the collector itself
(S7), which stages what it fetches so the next reader hits the fast
tier. Here:

- the staged tier is a directory of ``chunk-{i:06d}.parquet`` files;
- ``fetch(chunk_id)`` is the live-source callback (in production an
  API/git reader; in tests a deterministic generator);
- a fetched chunk is staged via tmp+rename (idempotent under races),
  so fallback happens at most once per chunk.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


class TieredSource:
    def __init__(self, staging_dir: str, fetch):
        """fetch: chunk_id -> pyarrow.Table (the live-source tier)."""
        self.staging_dir = staging_dir
        self.fetch = fetch
        self.fallback_calls = 0
        os.makedirs(staging_dir, exist_ok=True)

    def _path(self, chunk_id: int) -> str:
        return os.path.join(self.staging_dir, f"chunk-{chunk_id:06d}.parquet")

    def ensure_chunk(self, chunk_id: int) -> str:
        """Staged path for a chunk, fetching + staging on miss."""
        p = self._path(chunk_id)
        if not os.path.exists(p):
            table = self.fetch(chunk_id)
            self.fallback_calls += 1
            tmp = p + f".tmp.{os.getpid()}"
            pq.write_table(table, tmp)
            os.replace(tmp, p)
        return p

    def read_range(self, first_chunk: int, last_chunk: int) -> "ray.data.Dataset":
        """Dataset over a contiguous chunk range, staging misses."""
        files = [self.ensure_chunk(c) for c in range(first_chunk, last_chunk + 1)]
        return ray.data.read_parquet(files)
