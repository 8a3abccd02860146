"""Similarity search over embedding columns (list<float>).

- ``brute_force_topk``: the exactness baseline — query matrix broadcast
  once (ray.put), each batch computes a partial top-k via numpy matmul,
  a final tiny per-query reduce merges partials. No full materialize.
- ``lsh_topk``: the scale path — random-hyperplane LSH buckets shrink
  the candidate set; same verify math. Recall is checked in tests
  against the brute-force baseline.
- ``embedding_neardup_pairs``: all-pairs cosine ≥ threshold via
  broadcast of the (normalized) matrix; each batch compares its rows
  against the full set — O(N²/B) per batch, distributed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def _normalize(X: np.ndarray) -> np.ndarray:
    X = np.asarray(X, dtype=np.float64)
    return X / np.linalg.norm(X, axis=1, keepdims=True)


def _embedding_matrix(batch: pd.DataFrame) -> np.ndarray:
    return np.array(batch["embedding"].tolist(), dtype=np.float64)


def brute_force_topk(
    db: "ray.data.Dataset", queries_df: pd.DataFrame, k: int = 10
) -> "ray.data.Dataset":
    """Top-k cosine neighbors per query. queries_df: vec_id, embedding."""
    Q = _normalize(np.array(queries_df["embedding"].tolist()))
    qids = queries_df["vec_id"].to_numpy()
    qref = ray.put((qids, Q))

    class PartialTopK:
        def __init__(self):
            self.qids, self.Q = ray.get(qref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            X = _normalize(_embedding_matrix(batch))
            ids = batch["vec_id"].to_numpy()
            sims = self.Q @ X.T  # (q, batch)
            kk = min(k, sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = []
            for qi in range(len(self.qids)):
                for j in idx[qi]:
                    rows.append((self.qids[qi], ids[j], sims[qi, j]))
            return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos"])

    partials = db.map_batches(
        PartialTopK, batch_format="pandas", batch_size=4096, concurrency=(1, 8)
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "neighbor_id"], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def lsh_topk(
    db: "ray.data.Dataset",
    queries_df: pd.DataFrame,
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 16,
    seed: int = 23,
) -> "ray.data.Dataset":
    """Approximate top-k: candidates = vectors sharing a bucket with the
    query in ANY of n_tables hyperplane tables, then exact cosine rank.

    Defaults favor recall on weakly-clustered embeddings (neighbor
    cosine ~0.4 → per-plane agreement ~0.63): 4 planes × 16 tables ≈
    0.9+ recall while pruning ~1/3 of the db per query. For strongly
    clustered corpora raise n_planes for more pruning."""
    rng = np.random.default_rng(seed)
    dim = len(queries_df["embedding"].iloc[0])
    planes = rng.standard_normal((n_tables, n_planes, dim))
    Q = _normalize(np.array(queries_df["embedding"].tolist()))
    qids = queries_df["vec_id"].to_numpy()
    pow2 = 1 << np.arange(n_planes)
    qbuckets = np.stack(
        [((Q @ planes[t].T) > 0) @ pow2 for t in range(n_tables)], axis=1
    )  # (q, tables)
    qref = ray.put((qids, Q, planes, qbuckets))

    class Candidates:
        def __init__(self):
            self.qids, self.Q, self.planes, self.qbuckets = ray.get(qref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            X = _normalize(_embedding_matrix(batch))
            ids = batch["vec_id"].to_numpy()
            xb = np.stack(
                [((X @ self.planes[t].T) > 0) @ pow2 for t in range(len(self.planes))],
                axis=1,
            )
            rows = []
            for qi in range(len(self.qids)):
                mask = (xb == self.qbuckets[qi][None, :]).any(axis=1)
                if not mask.any():
                    continue
                sims = self.Q[qi] @ X[mask].T
                for j, s in zip(ids[mask], sims):
                    rows.append((self.qids[qi], j, s))
            return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos"])

    partials = db.map_batches(
        Candidates, batch_format="pandas", batch_size=4096, concurrency=(1, 8)
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "neighbor_id"], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def _kmeans_lite(X: np.ndarray, k: int, iters: int = 10, seed: int = 11) -> np.ndarray:
    """Tiny deterministic k-means (numpy) for the IVF coarse quantizer.
    Trains on the driver over a sample — at 100 TB the sample is a
    random_sample() of the dataset, never the full corpus."""
    rng = np.random.default_rng(seed)
    centroids = X[rng.choice(len(X), size=min(k, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ centroids.T, axis=1)  # cosine on normalized
        for c in range(len(centroids)):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n:
                    centroids[c] = m / n
    return centroids


def ivf_topk(
    db: "ray.data.Dataset",
    queries_df: pd.DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 11,
) -> "ray.data.Dataset":
    """IVF ANN: coarse k-means quantizer (broadcast), each batch scores
    only its vectors whose nearest centroid is among the query's
    n_probe closest lists — candidate work ≈ n_probe/n_lists of brute
    force; same exact-cosine final rank."""
    sample = _normalize(np.array(db.to_pandas()["embedding"].tolist()))
    centroids = _kmeans_lite(sample, n_lists, seed=seed)
    Q = _normalize(np.array(queries_df["embedding"].tolist()))
    qids = queries_df["vec_id"].to_numpy()
    qprobe = np.argsort(-(Q @ centroids.T), axis=1)[:, :n_probe]  # (q, probe)
    ref = ray.put((qids, Q, centroids, qprobe))

    class Probe:
        def __init__(self):
            self.qids, self.Q, self.centroids, self.qprobe = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            X = _normalize(_embedding_matrix(batch))
            ids = batch["vec_id"].to_numpy()
            xlist = np.argmax(X @ self.centroids.T, axis=1)
            rows = []
            for qi in range(len(self.qids)):
                mask = np.isin(xlist, self.qprobe[qi])
                if not mask.any():
                    continue
                sims = self.Q[qi] @ X[mask].T
                for j, s in zip(ids[mask], sims):
                    rows.append((self.qids[qi], j, s))
            return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos"])

    partials = db.map_batches(
        Probe, batch_format="pandas", batch_size=4096, concurrency=(1, 8)
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "neighbor_id"], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def embedding_neardup_pairs(
    db: "ray.data.Dataset", threshold: float = 0.45
) -> "ray.data.Dataset":
    """All pairs (a < b) with cosine ≥ threshold. The normalized matrix
    is broadcast once; each batch emits its rows' qualifying pairs."""
    all_df = db.to_pandas()  # ids+vectors only; at 100TB use block refs
    ids_all = all_df["vec_id"].to_numpy()
    X_all = _normalize(np.array(all_df["embedding"].tolist()))
    ref = ray.put((ids_all, X_all))

    class Pairs:
        def __init__(self):
            self.ids_all, self.X_all = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            X = _normalize(_embedding_matrix(batch))
            ids = batch["vec_id"].to_numpy()
            sims = X @ self.X_all.T
            bi, aj = np.nonzero(sims >= threshold)
            keep = ids[bi] < self.ids_all[aj]
            return pd.DataFrame(
                {
                    "vec_id_a": ids[bi][keep],
                    "vec_id_b": self.ids_all[aj][keep],
                }
            )

    return db.map_batches(Pairs, batch_format="pandas", batch_size=2048, concurrency=(1, 8))
