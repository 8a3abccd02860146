"""Text/ML-family soak: the sketch operators at 20-40× the bench corpus.

The driver's documents table tops out at 5,000 rows (sf0.1); this
script generates a deterministic corpus of the SAME shape (seeded
word-model docs ~50 tokens from a small vocabulary, plus every-13th-
word-dropped near-dup copies at doc_id + PLANT_OFFSET — the structure
`queries_textml.augmented_docs` plants) at soak scale, plus clustered
64-d embeddings, and times the family end-to-end:

  minhash  — MinHash-LSH → coarse-sharded candidates → distributed
             verify joins (the full `minhash_dedup_pairs` path),
             with planted-pair recall measured, not assumed
  simhash  — fingerprint → 8×8-block LSH → hamming verify
  exact    — `exact_dedup_keep_min` on the 20-char prefix key
  ann      — brute-force cosine top-k (the exact baseline) and IVF
             (sampled-kmeans quantizer, pruned probe) with recall@10
             against the brute-force truth

Usage:  python tools/soak_textml.py [--docs 100000] [--out /tmp/textml_soak]
Prints one JSON line; record results in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLANT_OFFSET = 10_000_000
VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window join shuffle block merge "
    "state epoch commit repo path lang token index probe bucket shard"
).split()
N_CLUSTERS = 32
DIM = 64


def gen_corpus(out_dir: str, n_docs: int, chunk: int = 20_000) -> None:
    """Chunked deterministic corpus write (one chunk in memory at a
    time — the generator discipline from sources/generator.py)."""
    docs_dir = os.path.join(out_dir, "docs")
    os.makedirs(docs_dir, exist_ok=True)
    vocab = np.array(VOCAB, dtype=object)
    for c0 in range(0, n_docs, chunk):
        n = min(chunk, n_docs - c0)
        rng = np.random.default_rng(4242 + c0)
        lens = rng.integers(30, 70, size=n)
        texts = [
            " ".join(vocab[rng.integers(0, len(vocab), size=L)]) for L in lens
        ]
        ids = np.arange(c0, c0 + n, dtype=np.int64)
        # near-dup plant: drop every 13th word (offset 5), id + OFFSET
        mut = [
            " ".join(w for i, w in enumerate(t.split()) if i % 13 != 5)
            for t in texts
        ]
        t = pa.table(
            {
                "doc_id": np.concatenate([ids, ids + PLANT_OFFSET]),
                "text": texts + mut,
            }
        )
        pq.write_table(t, os.path.join(docs_dir, f"chunk-{c0:09d}.parquet"))


def gen_embeddings(out_dir: str, n_vecs: int, chunk: int = 50_000) -> None:
    emb_dir = os.path.join(out_dir, "emb")
    os.makedirs(emb_dir, exist_ok=True)
    crng = np.random.default_rng(7)
    centers = crng.normal(size=(N_CLUSTERS, DIM)).astype(np.float32)
    for c0 in range(0, n_vecs, chunk):
        n = min(chunk, n_vecs - c0)
        rng = np.random.default_rng(77 + c0)
        which = rng.integers(0, N_CLUSTERS, size=n)
        X = centers[which] + 0.3 * rng.normal(size=(n, DIM)).astype(np.float32)
        t = pa.table(
            {
                "vec_id": np.arange(c0, c0 + n, dtype=np.int64),
                "embedding": list(X),
            }
        )
        pq.write_table(t, os.path.join(emb_dir, f"chunk-{c0:09d}.parquet"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--out", default="/tmp/textml_soak")
    ap.add_argument("--keep", action="store_true", help="reuse generated data")
    args = ap.parse_args()

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    if not args.keep and os.path.isdir(args.out):
        shutil.rmtree(args.out)
    if not os.path.isdir(args.out):
        t0 = time.time()
        gen_corpus(args.out, args.docs)
        gen_embeddings(args.out, args.docs)
        gen_sec = round(time.time() - t0, 2)
    else:
        gen_sec = 0.0

    from cosmwasm_etl_ray.functions.dedup import (
        exact_dedup_keep_min,
        minhash_dedup_pairs,
        simhash_dedup_pairs,
    )
    from cosmwasm_etl_ray.functions.similarity import brute_force_topk, ivf_topk

    res: dict = {"docs": args.docs, "gen_sec": gen_sec}

    docs = ray.data.read_parquet(os.path.join(args.out, "docs"))

    # ---- MinHash-LSH verified pairs + planted recall
    t0 = time.time()
    pairs = minhash_dedup_pairs(docs, threshold=0.5).to_pandas()
    res["minhash_sec"] = round(time.time() - t0, 2)
    res["minhash_pairs"] = int(len(pairs))
    lo = np.minimum(pairs["doc_a"], pairs["doc_b"])
    hi = np.maximum(pairs["doc_a"], pairs["doc_b"])
    planted_hit = int(((hi - lo) == PLANT_OFFSET).sum())
    res["minhash_planted_recall"] = round(planted_hit / args.docs, 4)

    # ---- SimHash pairs (block width tracks corpus size: occupancy
    # 2·docs / 2^bits must stay well under the hot-bucket cap)
    block_bits = 8 if args.docs * 2 <= 60_000 else 16
    t0 = time.time()
    sh = simhash_dedup_pairs(docs, block_bits=block_bits).to_pandas()
    res["simhash_sec"] = round(time.time() - t0, 2)
    res["simhash_block_bits"] = block_bits
    res["simhash_pairs"] = int(len(sh))
    lo = np.minimum(sh["doc_a"], sh["doc_b"])
    hi = np.maximum(sh["doc_a"], sh["doc_b"])
    res["simhash_planted_recall"] = round(
        int(((hi - lo) == PLANT_OFFSET).sum()) / args.docs, 4
    )

    # ---- exact prefix dedup (20-char key, min-doc_id representative)
    def key20(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column("key20", pc.utf8_slice_codeunits(t["text"], 0, 20))

    t0 = time.time()
    kept = exact_dedup_keep_min(docs, key20, "key20").count()
    res["exact_sec"] = round(time.time() - t0, 2)
    res["exact_kept"] = int(kept)

    # ---- ANN: brute-force truth vs IVF, recall@10
    emb = ray.data.read_parquet(os.path.join(args.out, "emb"))
    qrng = np.random.default_rng(5)
    centers = np.random.default_rng(7).normal(size=(N_CLUSTERS, DIM)).astype(
        np.float32
    )
    Q = centers[qrng.integers(0, N_CLUSTERS, size=20)] + 0.3 * qrng.normal(
        size=(20, DIM)
    ).astype(np.float32)
    qdf = pd.DataFrame(
        {"vec_id": np.arange(20, dtype=np.int64), "embedding": list(Q)}
    )
    t0 = time.time()
    truth = brute_force_topk(emb, qdf, k=10).to_pandas()
    res["ann_brute_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    approx = ivf_topk(emb, qdf, k=10, n_lists=64, n_probe=8).to_pandas()
    res["ann_ivf_sec"] = round(time.time() - t0, 2)
    tset = set(zip(truth["query_id"], truth["neighbor_id"]))
    aset = set(zip(approx["query_id"], approx["neighbor_id"]))
    res["ann_ivf_recall_at_10"] = round(len(tset & aset) / max(1, len(tset)), 4)

    # ---- persistent IVF index: assignment paid ONCE at build, probes
    # read only their partition-pruned lists — the serving-path shape
    from cosmwasm_etl_ray.functions.ann_index import (
        build_ivf_index,
        query_ivf_index,
    )

    idx_dir = os.path.join(args.out, "ivf_index")
    if os.path.isdir(idx_dir):
        shutil.rmtree(idx_dir)
    t0 = time.time()
    build_ivf_index(emb, idx_dir, n_lists=64)
    res["ann_index_build_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    served = query_ivf_index(idx_dir, qdf, k=10, n_probe=8).to_pandas()
    res["ann_index_probe_sec"] = round(time.time() - t0, 2)
    sset = set(zip(served["query_id"], served["neighbor_id"]))
    res["ann_index_recall_at_10"] = round(len(tset & sset) / max(1, len(tset)), 4)

    # ---- PQ family: 32x-compressed codes (ADC scan), two-stage
    # rerank, and the IVF+PQ composite (path-pruned + compressed)
    import glob as _glob

    from cosmwasm_etl_ray.functions.ann_index import (
        build_ivfpq_index,
        build_pq_index,
        query_ivfpq_index,
        query_pq_index,
        query_pq_index_rerank,
    )

    def _recall(df: pd.DataFrame) -> float:
        s = set(zip(df["query_id"], df["neighbor_id"]))
        return round(len(tset & s) / max(1, len(tset)), 4)

    pq_dir = os.path.join(args.out, "pq_index")
    if os.path.isdir(pq_dir):
        shutil.rmtree(pq_dir)
    t0 = time.time()
    build_pq_index(emb, pq_dir, m=16)
    res["pq_build_sec"] = round(time.time() - t0, 2)
    res["pq_code_mb"] = round(
        sum(
            os.path.getsize(f)
            for f in _glob.glob(os.path.join(pq_dir, "codes", "*.parquet"))
        )
        / 1e6,
        2,
    )
    res["emb_mb"] = round(
        sum(
            os.path.getsize(f)
            for f in _glob.glob(os.path.join(args.out, "emb", "*.parquet"))
        )
        / 1e6,
        2,
    )
    t0 = time.time()
    res["pq_recall_at_10"] = _recall(query_pq_index(pq_dir, qdf, k=10).to_pandas())
    res["pq_scan_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    res["pq_rerank_recall_at_10"] = _recall(
        query_pq_index_rerank(pq_dir, qdf, emb, k=10, candidates=50).to_pandas()
    )
    res["pq_rerank_sec"] = round(time.time() - t0, 2)

    ivfpq_dir = os.path.join(args.out, "ivfpq_index")
    if os.path.isdir(ivfpq_dir):
        shutil.rmtree(ivfpq_dir)
    t0 = time.time()
    build_ivfpq_index(emb, ivfpq_dir, n_lists=64, m=16)
    res["ivfpq_build_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    res["ivfpq_recall_at_10"] = _recall(
        query_ivfpq_index(ivfpq_dir, qdf, k=10, n_probe=8).to_pandas()
    )
    res["ivfpq_probe_sec"] = round(time.time() - t0, 2)

    print(json.dumps(res))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
