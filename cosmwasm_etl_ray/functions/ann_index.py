"""Persistent IVF index: build ONCE, query many — the 100 TB shape for
similarity search.

``ivf_topk`` (functions/similarity.py) trains its coarse quantizer and
scans the whole corpus per call — right for ad-hoc queries, wrong for a
serving path. Here the corpus is indexed once into LIST-PARTITIONED
Parquet (hive layout ``list_id=<l>/``) plus a tiny sidecar (centroids +
params); a query probes its n_probe nearest lists and the read prunes
to exactly those partitions — I/O scales with n_probe/n_lists of the
corpus, not the corpus.

Build is a normal streaming pipeline (sample → k-means on the driver →
broadcast centroids → map_batches assign → partitioned write); the
index is immutable and versioned by directory (rebuild = write a new
dir, swap the pointer — the same idempotent-artifact discipline as the
state manifests).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

import ray
import ray.data

from cosmwasm_etl_ray.functions.similarity import (
    _embedding_matrix,
    _kmeans_lite,
    _normalize,
)


def build_ivf_index(
    db: "ray.data.Dataset",
    index_dir: str,
    n_lists: int = 16,
    seed: int = 11,
    train_cap: int = 4096,
) -> dict:
    """Index a (vec_id, embedding) dataset. Returns the sidecar meta."""
    n = db.count()
    frac = min(1.0, train_cap / max(n, 1))
    sample_df = db.random_sample(frac, seed=seed).to_pandas()
    if len(sample_df) < n_lists:
        sample_df = db.limit(max(n_lists, 1)).to_pandas()
    sample = _normalize(np.array(sample_df["embedding"].tolist()))
    centroids = _kmeans_lite(sample, n_lists, seed=seed)
    cref = ray.put(centroids)

    class Assign:
        def __init__(self):
            self.centroids = ray.get(cref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            X = _normalize(_embedding_matrix(batch))
            batch = batch.copy()
            assign = np.argmax(X @ self.centroids.T, axis=1).astype("int32")
            batch["list_id"] = assign  # hive partition key (lives in the path)
            batch["list_assign"] = assign  # survives inside the files
            return batch

    db.map_batches(Assign, batch_format="pandas", concurrency=(1, 8)).write_parquet(
        index_dir, partition_cols=["list_id"]
    )
    meta = {
        "n_lists": int(len(centroids)),
        "dim": int(centroids.shape[1]),
        "seed": seed,
        "n_vectors": int(n),
        "centroids": centroids.tolist(),
    }
    tmp = os.path.join(index_dir, f"_meta.json.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, "_meta.json"))
    return meta


def query_ivf_index(
    index_dir: str,
    queries_df: pd.DataFrame,
    k: int = 10,
    n_probe: int = 4,
) -> "ray.data.Dataset":
    """Exact-cosine top-k over each query's n_probe nearest lists. The
    Parquet read is PARTITION-PRUNED to the union of probed lists;
    per-query probe masks keep the semantics identical to ivf_topk with
    the same quantizer."""
    with open(os.path.join(index_dir, "_meta.json")) as f:
        meta = json.load(f)
    centroids = np.array(meta["centroids"], dtype=np.float64)

    Q = _normalize(np.array(queries_df["embedding"].tolist()))
    qids = queries_df["vec_id"].to_numpy()
    qprobe = np.argsort(-(Q @ centroids.T), axis=1)[:, :n_probe]  # (q, probe)
    needed = sorted({int(v) for v in qprobe.ravel()})

    # PATH-level pruning: only the probed lists' files are read
    import glob as _glob

    probe_files = [
        f
        for l in needed
        for f in sorted(
            _glob.glob(os.path.join(index_dir, f"list_id={l}", "*.parquet"))
        )
    ]
    lists = ray.data.read_parquet(probe_files)
    ref = ray.put((qids, Q, qprobe))

    class Probe:
        def __init__(self):
            self.qids, self.Q, self.qprobe = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            X = _normalize(_embedding_matrix(batch))
            ids = batch["vec_id"].to_numpy()
            xlist = batch["list_assign"].to_numpy()  # stored, not recomputed
            rows = []
            for qi in range(len(self.qids)):
                mask = np.isin(xlist, self.qprobe[qi])
                if not mask.any():
                    continue
                sims = self.Q[qi] @ X[mask].T
                for j, s in zip(ids[mask], sims):
                    rows.append((self.qids[qi], j, s))
            return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos"])

    partials = lists.map_batches(
        Probe, batch_format="pandas", batch_size=4096, concurrency=(1, 8)
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cos", "neighbor_id"], ascending=[False, True], kind="stable"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
