"""Deterministic change-event stream derived from the ``documents`` table.

This is the oracle-checkable change stream: the SAME pure-integer
formulas are implemented twice — vectorized numpy inside a Ray
``map_batches`` here, and as a DuckDB CTE string (``CHANGES_CTE``) used
by ``oracle_sql()`` — so the driver can verify the full CDC replay
end-to-end against SQL.

Shape (FIXTURES.md §1, grafting the reference's per-height RawTx
batches /root/reference/parser/dto.go:9-17 onto the repo-content
domain):

    repo:string, path:string, commit:string (zero-padded, lexicographic
    = numeric), lang:string, content:string ("" on delete), op:string

Formulas (d = doc_id, k = 0..K(d)-1):

    K(d)      = 1 + d % 5 + (45 if d % 101 == 0 else 0)   # hot keys
    repo(d)   = 'mono'            if d % 7 == 0           # hot repo
                f'repo_{d%23:02d}' otherwise
    path(d)   = f'src/f{d}'
    commitnum = k * 1_000_000 + d                         # monotone in k
    op(d,k)   = 'insert' if k == 0
                'delete' if (d*7 + k*13) % 11 == 0
                'update' otherwise
    content   = '' on delete else text + ' v' + str(k)

Keys appear mid-stream in commit order d (the create_pair analogue,
/root/reference/parser/dex/dezswap/app.go:62-71); every 101st key is
hot (salting test); 'mono' holds ~14% of keys (skewed repo).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

COMMIT_WIDTH = 10
_K_BASE = 5
_HOT_EVERY = 101
_HOT_EXTRA = 45
_MONO_EVERY = 7
_N_REPOS = 23
_COMMIT_STRIDE = 1_000_000


def _k_of(d: np.ndarray) -> np.ndarray:
    return 1 + d % _K_BASE + np.where(d % _HOT_EVERY == 0, _HOT_EXTRA, 0)


def expand_documents_batch(batch: pa.Table) -> pa.Table:
    """documents batch → change-event rows (vectorized numpy expansion)."""
    if batch.num_rows == 0:  # empty block: emit the schema, not ends[-1]
        empty = pa.array([], type=pa.string())
        return pa.table(
            {c: empty for c in ("repo", "path", "commit", "lang", "content", "op")}
        )
    d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    text = np.asarray(batch["text"].to_pylist(), dtype=object)
    lang = np.asarray(batch["lang"].to_pylist(), dtype=object)

    counts = _k_of(d)
    idx = np.repeat(np.arange(len(d)), counts)           # source row per event
    # k = 0..K-1 within each run
    ends = np.cumsum(counts)
    k = np.arange(ends[-1]) - np.repeat(ends - counts, counts)

    dd = d[idx]
    commitnum = k * _COMMIT_STRIDE + dd
    is_del = ((dd * 7 + k * 13) % 11 == 0) & (k > 0)
    op = np.where(k == 0, "insert", np.where(is_del, "delete", "update")).astype(object)

    repo = np.where(
        dd % _MONO_EVERY == 0,
        "mono",
        np.char.add("repo_", np.char.zfill((dd % _N_REPOS).astype("U2"), 2)),
    ).astype(object)
    path = np.char.add("src/f", dd.astype("U20")).astype(object)
    commit = np.char.zfill(commitnum.astype("U20"), COMMIT_WIDTH).astype(object)

    content = np.char.add(
        np.char.add(text[idx].astype("U"), " v"), k.astype("U20")
    ).astype(object)
    content[is_del] = ""

    return pa.table(
        {
            "repo": pa.array(repo, type=pa.string()),
            "path": pa.array(path, type=pa.string()),
            "commit": pa.array(commit, type=pa.string()),
            "lang": pa.array(lang[idx], type=pa.string()),
            "content": pa.array(content, type=pa.string()),
            "op": pa.array(op, type=pa.string()),
        }
    )


def read_documents(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )


def changes_from_documents(sf_dir: str) -> "ray.data.Dataset":
    """The change-event Dataset for an sf dir (lazy, streams)."""
    return read_documents(sf_dir).map_batches(
        expand_documents_batch, batch_format="pyarrow"
    )


# The same expansion as a DuckDB CTE over the pre-registered `documents`
# view. `range(0,50)` bounds K(d) (max 1 + 4 + 45 = 50).
CHANGES_CTE = """
changes AS (
    SELECT
        CASE WHEN d.doc_id % 7 = 0 THEN 'mono'
             ELSE 'repo_' || lpad(CAST(d.doc_id % 23 AS VARCHAR), 2, '0') END AS repo,
        'src/f' || CAST(d.doc_id AS VARCHAR) AS path,
        lpad(CAST(s.k * 1000000 + d.doc_id AS VARCHAR), 10, '0') AS "commit",
        d.lang AS lang,
        CASE WHEN s.k > 0 AND (d.doc_id * 7 + s.k * 13) % 11 = 0 THEN ''
             ELSE d.text || ' v' || CAST(s.k AS VARCHAR) END AS content,
        CASE WHEN s.k = 0 THEN 'insert'
             WHEN (d.doc_id * 7 + s.k * 13) % 11 = 0 THEN 'delete'
             ELSE 'update' END AS op
    FROM documents d
    CROSS JOIN (SELECT unnest(range(0, 50)) AS k) s
    WHERE s.k < 1 + d.doc_id % 5
               + (CASE WHEN d.doc_id % 101 = 0 THEN 45 ELSE 0 END)
)
"""
