"""Resumable partitioned export of the training-corpus chunk stream —
the prep-side twin of the CDC epoch sink's commit discipline: one
directory per doc-hash shard, each committed by an atomic tmp+rename
(pid-suffixed tmp, concurrent-writer safe), the export manifest written
LAST so the export "exists" only when its manifest does. A re-run
skips every shard directory already committed and recomputes only the
missing ones — at 100 TB the writer restarts from where it died
instead of from zero.

Shard assignment is ``doc_id % num_shards`` — a pure function of the
row, so the resume filter pushes into the stream (no bookkeeping join)
and the layout is cluster-size-independent.

Reference analogue: the collector sink's upsert + GREATEST cursor
(/root/reference/collector/collector.go) makes re-runs idempotent; here
idempotency is directory-grain (rename atomicity) instead of row-grain.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import ray.data

EXPORT_SHARDS = 16
_MANIFEST = "export_manifest.json"

_CHUNK_SCHEMA = {
    "doc_id": "int64",
    "chunk_id": "int64",
    "chunk_text": "object",
    "n_tokens": "int64",
}


def _shard_dir(out_dir: str, sid: int) -> str:
    return os.path.join(out_dir, f"shard={sid}")


def _commit_dir(tmp: str, final: str) -> None:
    """Atomic rename; if a concurrent writer already committed the
    shard, theirs wins and ours is discarded (both hold identical
    deterministic content)."""
    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)


def export_corpus(
    sf_dir: str, out_dir: str, num_shards: int = EXPORT_SHARDS
) -> dict:
    """Export ``pretrain_corpus(sf_dir)`` under ``out_dir`` as
    ``shard=K/part-0.parquet`` directories. Returns the manifest dict
    ``{"shards": {sid: n_rows}, "n_rows": total}``. Safe to re-run:
    committed shards are skipped (their chunk rows are filtered out of
    the stream before any compute downstream of the decision join)."""
    from cosmwasm_etl_ray.functions.agg import shard_exchange
    from cosmwasm_etl_ray.pipelines.queries_dataprep import pretrain_corpus

    os.makedirs(out_dir, exist_ok=True)
    missing = [
        s for s in range(num_shards) if not os.path.isdir(_shard_dir(out_dir, s))
    ]

    if missing:
        missing_set = set(missing)

        def tag_and_filter(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["shard"] = (df["doc_id"].to_numpy() % num_shards).astype("int64")
            return df[df["shard"].isin(missing_set)]

        chunks = pretrain_corpus(sf_dir).map_batches(
            tag_and_filter, batch_format="pandas"
        )

        def write_shard(df: pd.DataFrame) -> pd.DataFrame:
            rows = []
            # the exchange routes every row of a shard VALUE to one
            # task; a task may hold several values (hash co-location)
            for sid, g in df.groupby("shard", sort=False):
                final = _shard_dir(out_dir, int(sid))
                tmp = f"{final}.tmp.{os.getpid()}"
                os.makedirs(tmp, exist_ok=True)
                g.drop(columns=["shard"]).sort_values(
                    ["doc_id", "chunk_id"]
                ).to_parquet(os.path.join(tmp, "part-0.parquet"), index=False)
                _commit_dir(tmp, final)
                rows.append({"shard": int(sid), "n_rows": len(g)})
            return pd.DataFrame(rows)

        shard_exchange(
            chunks, ["shard"], write_shard, shards=min(num_shards, 32)
        ).materialize()

        # shards with zero chunk rows still need a committed (empty)
        # directory, or every re-run would recompute them
        for s in missing:
            final = _shard_dir(out_dir, s)
            if not os.path.isdir(final):
                tmp = f"{final}.tmp.{os.getpid()}"
                os.makedirs(tmp, exist_ok=True)
                pd.DataFrame(
                    {c: pd.Series([], dtype=t) for c, t in _CHUNK_SCHEMA.items()}
                ).to_parquet(os.path.join(tmp, "part-0.parquet"), index=False)
                _commit_dir(tmp, final)

    # manifest from the committed files' own metadata (covers shards
    # written by earlier runs), tmp+rename last
    shards: dict[str, int] = {}
    for s in range(num_shards):
        f = os.path.join(_shard_dir(out_dir, s), "part-0.parquet")
        shards[str(s)] = pq.read_metadata(f).num_rows
    manifest = {"shards": shards, "n_rows": int(sum(shards.values()))}
    tmp = os.path.join(out_dir, f"{_MANIFEST}.tmp.{os.getpid()}")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))
    return manifest


def read_export(out_dir: str) -> "ray.data.Dataset":
    """Read a committed export back (manifest required — a dir without
    one is an unfinished write)."""
    with open(os.path.join(out_dir, _MANIFEST)) as fh:
        manifest = json.load(fh)
    paths = [
        os.path.join(_shard_dir(out_dir, int(s)), "part-0.parquet")
        for s, n in sorted(manifest["shards"].items(), key=lambda kv: int(kv[0]))
        if n > 0  # empty shard files carry no row groups worth a read task
    ]
    return ray.data.read_parquet(paths)
