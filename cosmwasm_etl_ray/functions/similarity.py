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


def train_sample(
    db: "ray.data.Dataset", cap: int, seed: int, min_rows: int = 1, n: int | None = None
) -> pd.DataFrame:
    """Bounded DETERMINISTIC training sample: keep rows whose
    seed-salted multiplicative hash of vec_id falls below cap/n — a
    pure per-row predicate, so the sampled set is independent of block
    layout, task boundaries, and cluster load. (Ray's ``random_sample``
    draws per task: the same seed returned different sets when the box
    was under contention, which once flipped IVF centroids between a
    persistent-index build and its in-memory twin mid-test.) Runs
    distributed; only the ≤cap sample lands on the driver.

    The returned frame is SORTED by vec_id: k-means seeds centroids by
    row POSITION (`X[rng.choice(len(X))]`), so the sample's order must
    be as layout-independent as its membership — `to_pandas()` row
    order follows block arrival, which varies run to run."""
    import pyarrow as pa

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty and "vec_id" not in df.columns:
            # Ray's to_pandas() on an all-empty Dataset is COLUMN-LESS;
            # restore the column names so the sort (and callers that
            # index the sample) see the schema instead of a KeyError
            df = pd.DataFrame(columns=db.schema().names)
        return df.sort_values("vec_id", kind="stable").reset_index(drop=True)

    if n is None:  # caller may pass a known count to skip re-executing db
        n = db.count()
    if n == 0:
        # typed empty without collecting: schema() alone beats
        # to_pandas()-then-schema() (each re-executes the upstream)
        return pd.DataFrame(columns=db.schema().names)
    if n <= max(cap, min_rows):
        return canon(db.to_pandas())
    thresh = np.uint64(int((1 << 32) * min(1.0, cap / n)))
    mult = np.uint64(2654435761 + 2 * seed)  # stays odd: bijective mod 2^64

    def keep(t: "pa.Table") -> "pa.Table":
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * mult) % np.uint64(1 << 32)
        return t.filter(pa.array(h < thresh))

    out = db.map_batches(keep, batch_format="pyarrow").to_pandas()
    if len(out) < min_rows:  # tiny-corpus fallback
        out = db.limit(max(min_rows, 1)).to_pandas()
    return canon(out)


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
    force; same exact-cosine final rank.

    The quantizer trains on a bounded deterministic sample of the
    corpus (never the full dataset on the driver): a few thousand
    vectors are plenty for a coarse k-means at any corpus size."""
    train_cap = max(4096, 256 * n_lists)
    sample_df = train_sample(db, train_cap, seed, min_rows=n_lists)
    sample = _normalize(np.array(sample_df["embedding"].tolist()))
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
    db: "ray.data.Dataset",
    threshold: float = 0.45,
    method: str = "auto",
    with_cos: bool = False,
) -> "ray.data.Dataset":
    """All pairs (a < b) with cosine ≥ threshold.

    Three physical plans, all free of driver materialization:

    - ``lsh``: hyperplane-bucketed candidates + exact within-bucket
      verify — sub-quadratic, for high thresholds (cos ≥ ~0.7) where
      bucket collision keeps recall ~1.
    - ``centroid``: coarse k-means buckets (multi-assign) + exact
      within-bucket verify — the sub-quadratic plan for LOW thresholds,
      where hyperplane LSH provably can't prune (at cos≈0.45 the
      per-plane collision probability is ~0.65 and the tables needed
      for recall cost more than brute force). Candidate work ≈
      N²·m²/n_lists; recall is a measured CONTRACT (the gate bands it),
      precision 1.0 (exact verify). This is the 100 TB path below 0.7.
    - ``exact``: blocked all-pairs — the TRUTH/measurement harness, and
      the only exhaustive-guarantee plan. The corpus is materialized
      into the OBJECT STORE as per-chunk (ids, matrix) blocks; a
      Dataset over chunk-index pairs (i ≤ j) drives tasks that fetch
      exactly two chunks each and matmul them. O(N²) compute spread
      over the cluster, O(chunk²) memory per task, nothing on the
      driver — but nc² tasks: use it to CALIBRATE the contract on a
      sample, never as the at-scale operator.
    - ``auto`` picks lsh when threshold ≥ 0.7, else centroid.

    ``with_cos=True`` (exact method only) adds the cosine column —
    the recall-contract gates band their truth by it.
    """
    if method == "auto":
        method = "lsh" if threshold >= 0.7 else "centroid"
    if method == "lsh":
        return _neardup_pairs_lsh(db, threshold)
    if method == "centroid":
        return _neardup_pairs_centroid(db, threshold)

    def pack(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy()
        X = _normalize(_embedding_matrix(batch))
        return pd.DataFrame({"ids": [ids.tobytes()], "X": [X.tobytes()],
                             "n": [len(ids)], "dim": [X.shape[1]]})

    chunk_refs = db.map_batches(
        pack, batch_format="pandas", batch_size=4096
    ).to_arrow_refs()

    def unpack(tbl) -> list[tuple[np.ndarray, np.ndarray]]:
        out = []
        for row in tbl.to_pylist():
            ids = np.frombuffer(row["ids"], dtype=np.int64)
            X = np.frombuffer(row["X"], dtype=np.float64).reshape(row["n"], row["dim"])
            out.append((ids, X))
        return out

    nc = len(chunk_refs)
    idx = [{"i": i, "j": j} for i in range(nc) for j in range(i, nc)]
    pairs_idx = ray.data.from_items(idx)

    def compare(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for i, j in zip(batch["i"], batch["j"]):
            for ids_a, A in unpack(ray.get(chunk_refs[int(i)])):
                for ids_b, B in unpack(ray.get(chunk_refs[int(j)])):
                    sims = A @ B.T
                    ai, bj = np.nonzero(sims >= threshold)
                    lo = np.minimum(ids_a[ai], ids_b[bj])
                    hi = np.maximum(ids_a[ai], ids_b[bj])
                    keep = lo < hi  # drop self-pairs; orient a < b
                    cols = {"vec_id_a": lo[keep], "vec_id_b": hi[keep]}
                    if with_cos:
                        cols["cos"] = sims[ai, bj][keep]
                    frames.append(pd.DataFrame(cols))
        if not frames:
            empty = {"vec_id_a": pd.Series(dtype="int64"),
                     "vec_id_b": pd.Series(dtype="int64")}
            if with_cos:
                empty["cos"] = pd.Series(dtype="float64")
            return pd.DataFrame(empty)
        return pd.concat(frames, ignore_index=True).drop_duplicates(
            ["vec_id_a", "vec_id_b"]
        )

    return pairs_idx.map_batches(compare, batch_format="pandas", batch_size=1)


def _neardup_pairs_lsh(
    db: "ray.data.Dataset",
    threshold: float,
    n_planes: int = 8,
    n_tables: int = 12,
    seed: int = 29,
    shards: int = 256,
    max_bucket: int = 4096,
) -> "ray.data.Dataset":
    """Sub-quadratic near-dup: random-hyperplane buckets (n_tables
    independent tables), all-pairs + exact cosine verify within each
    bucket, global pair dedup. Recall for a pair at cosine c is
    1-(1-p^b)^T with p = 1 - arccos(c)/π — at c=0.7, 8 planes × 12
    tables ≈ 0.98; precision is 1.0 (exact verify)."""
    rng = np.random.default_rng(seed)
    # dim probed lazily from the first batch inside the actor
    planes_seed = rng.integers(0, 2**31)

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        X = _normalize(_embedding_matrix(batch))
        ids = batch["vec_id"].to_numpy()
        prng = np.random.default_rng(planes_seed)
        planes = prng.standard_normal((n_tables, n_planes, X.shape[1]))
        pow2 = 1 << np.arange(n_planes)
        parts = []
        for t in range(n_tables):
            b = ((X @ planes[t].T) > 0) @ pow2
            parts.append(pd.DataFrame({
                "vec_id": ids,
                "bkey": t * (1 << n_planes) + b,
                "emb": [v.tobytes() for v in X],
            }))
        out = pd.concat(parts, ignore_index=True)
        out["_shard"] = (out["bkey"] % shards).astype("int32")
        return out

    melted = db.map_batches(bucketize, batch_format="pandas", batch_size=4096)
    return _verify_bucketed_pairs(melted, threshold, max_bucket)


def _verify_bucketed_pairs(
    melted: "ray.data.Dataset", threshold: float, max_bucket: int
) -> "ray.data.Dataset":
    """Shared tail of the bucketed near-dup plans (lsh/centroid):
    within-bucket all-pairs + exact cosine verify inside each hash
    shard (candidate-bounded — Σ bucket², never corpus²), then global
    pair dedup. Input: (vec_id, bkey, emb-bytes, _shard) melt."""

    def pairs_in_shard(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby("bkey", sort=False):
            grp = grp.drop_duplicates("vec_id").sort_values("vec_id")
            if len(grp) < 2 or len(grp) > max_bucket:
                continue
            ids = grp["vec_id"].to_numpy()
            X = np.vstack([np.frombuffer(e, dtype=np.float64) for e in grp["emb"]])
            sims = X @ X.T
            a, b = np.triu_indices(len(ids), 1)
            keep = sims[a, b] >= threshold
            out.append(pd.DataFrame({"doc_a": ids[a][keep], "doc_b": ids[b][keep]}))
        if not out:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64")})
        return pd.concat(out, ignore_index=True).drop_duplicates()

    from cosmwasm_etl_ray.functions.dedup import dedup_pairs_dataset

    pairs = melted.groupby("_shard").map_groups(pairs_in_shard, batch_format="pandas")
    uniq = dedup_pairs_dataset(pairs)
    return uniq.map_batches(
        lambda df: df.rename(columns={"doc_a": "vec_id_a", "doc_b": "vec_id_b"}),
        batch_format="pandas",
    )


def _neardup_pairs_centroid(
    db: "ray.data.Dataset",
    threshold: float,
    n_lists: int = 32,
    n_assign: int = 3,
    n_tables: int = 2,
    seed: int = 17,
    shards: int = 64,
    max_bucket: int = 8192,
) -> "ray.data.Dataset":
    """Centroid-bucketed near-dup for thresholds BELOW the hyperplane-LSH
    regime (VERDICT r3 #2 — the former all-pairs path): a coarse
    k-means quantizer trains on a bounded deterministic sample
    (broadcast once via ray.put), every vector melts into its n_assign
    nearest lists, and pairs verify exactly within each list. A pair is
    discovered iff its members share ≥1 assigned list — the multi-assign
    is the 'adjacent-bucket margin': weak pairs (cos 0.4-0.6) usually
    straddle a centroid boundary that a single-assign IVF would split.

    n_tables independent quantizers (different k-means seeds) multiply
    recall the way LSH tables do — a mid-cosine pair missed by one
    partition of the space is usually recovered by another (recall ≈
    1-(1-p)^T for per-table share-probability p).

    Candidate work ≈ Σ bucket² ≈ N²·n_tables·n_assign²/n_lists —
    sub-quadratic whenever n_lists ≫ n_tables·n_assign² and buckets
    stay balanced (max_bucket caps degenerates, same discipline as the
    MinHash-LSH banding). Recall is a measured CONTRACT
    (queries_textml bands it against the exact truth); precision is
    1.0 (exact verify). Scale n_lists ~ O(√N) to hold per-bucket size
    as the corpus grows."""
    train_cap = max(4096, 256 * n_lists)
    sample_df = train_sample(db, train_cap, seed, min_rows=n_lists)
    sample = _normalize(np.array(sample_df["embedding"].tolist()))
    cents = np.stack(
        [_kmeans_lite(sample, n_lists, seed=seed + 101 * t) for t in range(n_tables)]
    )  # (T, k, dim)
    cref = ray.put(cents)

    class Assign:
        def __init__(self):
            self.C = ray.get(cref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            X = _normalize(_embedding_matrix(batch))
            ids = batch["vec_id"].to_numpy()
            emb_bytes = [v.tobytes() for v in X]
            parts = []
            for t in range(len(self.C)):
                sims = X @ self.C[t].T
                m = min(n_assign, sims.shape[1])
                top = np.argpartition(-sims, m - 1, axis=1)[:, :m]
                for a in range(m):
                    parts.append(
                        pd.DataFrame(
                            {
                                "vec_id": ids,
                                "bkey": (t * n_lists + top[:, a]).astype(np.int64),
                                "emb": emb_bytes,
                            }
                        )
                    )
            out = pd.concat(parts, ignore_index=True)
            out["_shard"] = (out["bkey"] % shards).astype("int32")
            return out

    melted = db.map_batches(
        Assign, batch_format="pandas", batch_size=4096, concurrency=(1, 8)
    )
    return _verify_bucketed_pairs(melted, threshold, max_bucket)
