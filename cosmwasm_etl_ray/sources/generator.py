"""Seeded synthetic change-stream generator (FIXTURES.md §1).

Writes a binlog-style Parquet change log under ``out_dir`` as
``changes-{i:05d}.parquet`` files of ``events_per_file`` rows each, in
global commit order — the analogue of the reference collector's
per-height staging store (/root/reference/collector/repo/repository.go:88-139).
Files are the tail unit: the replay driver consumes contiguous file
ranges as epochs, the way the reference parser consumes contiguous
height ranges (/root/reference/parser/dex/dex.go:141).

Properties (deterministic under the seed):
- Zipf-skewed repo popularity → hot (repo, path) keys for the salting
  path;
- keys appear mid-stream (create_pair analogue);
- ``delete_frac`` tombstones;
- ``malformed_frac`` rows with an empty ``commit`` (quarantine path,
  /root/reference/pkg/eventlog/util.go:58-114 ambiguity analogue);
- from ``evolve_at_frac`` of the stream onward an additive nullable
  ``mode`` column appears (schema-evolution replay test).

Generation is a plain numpy program (no Ray): the generator is test
infrastructure, not a pipeline stage — at real scale the binlog is
produced by the upstream system, not by us.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from cosmwasm_etl_ray.config import GeneratorConfig
from cosmwasm_etl_ray.sources.changes import COMMIT_WIDTH

_WORDS = np.array(
    "the fast key order sort table scan merge part window small hash join query "
    "row data slow filter customer line batch value stream group".split(),
    dtype=object,
)


def generate_change_stream(out_dir: str, cfg: GeneratorConfig) -> dict:
    """Write the change log; returns a small summary dict."""
    rng = np.random.default_rng(cfg.seed)
    os.makedirs(out_dir, exist_ok=True)

    n = cfg.n_events
    # key universe: key i belongs to repo zipf(i); first event for a key
    # is its insert. Assign each event a key with popularity skew.
    key_repo = rng.zipf(cfg.zipf_a, size=cfg.n_keys) % cfg.n_repos
    key_ids = rng.integers(0, cfg.n_keys, size=n)
    # force first occurrence order = key creation order (mid-stream creation)
    first_seen = np.zeros(cfg.n_keys, dtype=bool)

    commit = np.arange(1, n + 1, dtype=np.int64)
    u = rng.random(n)
    op = np.where(u < cfg.delete_frac, "delete", "update").astype(object)
    # first event per key is always an insert
    seen_order = np.full(cfg.n_keys, -1, dtype=np.int64)
    first_idx = np.unique(key_ids, return_index=True)[1]
    op[first_idx] = "insert"
    del first_seen, seen_order

    repo = np.char.add("repo_", key_repo[key_ids].astype("U6")).astype(object)
    path = np.char.add("src/k", key_ids.astype("U10")).astype(object)

    # content: pool of pre-joined sentences + per-event version suffix
    # (vectorized — a per-row join loop would dominate at bench scale)
    pool_n = min(n, 16_384)
    pool_words = _WORDS[
        rng.integers(0, len(_WORDS), size=(pool_n, max(1, cfg.content_len // 5)))
    ]
    pool = np.array([" ".join(w) for w in pool_words], dtype=object)
    content = np.char.add(
        np.char.add(pool[rng.integers(0, pool_n, size=n)].astype("U"), " #v"),
        np.arange(n).astype("U12"),
    ).astype(object)
    content[op == "delete"] = ""
    lang = np.array(["go", "py", "rs", "md", "ts"], dtype=object)[
        key_ids % 5
    ].astype(object)

    commit_s = np.char.zfill(commit.astype("U20"), COMMIT_WIDTH).astype(object)
    # malformed rows: empty commit → quarantine
    bad = rng.random(n) < cfg.malformed_frac
    commit_s[bad] = ""

    mode = None
    if cfg.evolve_at_frac is not None:
        evolve_at = int(n * cfg.evolve_at_frac)
        mode = np.full(n, None, dtype=object)
        tail = np.arange(evolve_at, n)
        mode[tail] = np.where(tail % 3 == 0, "binary", "text").astype(object)

    files = []
    per = cfg.events_per_file
    for i, start in enumerate(range(0, n, per)):
        sl = slice(start, min(start + per, n))
        cols = {
            "repo": pa.array(repo[sl], type=pa.string()),
            "path": pa.array(path[sl], type=pa.string()),
            "commit": pa.array(commit_s[sl], type=pa.string()),
            "lang": pa.array(lang[sl], type=pa.string()),
            "content": pa.array(content[sl], type=pa.string()),
            "op": pa.array(op[sl], type=pa.string()),
        }
        # schema evolution: files wholly before the evolution point lack
        # the column entirely (additive evolution — read side backfills)
        if mode is not None and sl.stop > int(n * cfg.evolve_at_frac):
            cols["mode"] = pa.array(mode[sl], type=pa.string())
        fname = os.path.join(out_dir, f"changes-{i:05d}.parquet")
        pq.write_table(pa.table(cols), fname)
        files.append(fname)

    return {
        "n_events": n,
        "n_files": len(files),
        "files": files,
        "n_keys": cfg.n_keys,
        "n_malformed": int(bad.sum()),
    }
