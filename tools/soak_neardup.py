"""Soak the centroid-bucketed near-dup at 100k+ vectors (VERDICT r3 #2).

Generates a deterministic clustered corpus (mixture of Gaussians — the
shape real embedding spaces near-dup over), runs the centroid plan at
scaled parameters (n_lists ~ O(sqrt N)), and measures:

- wall time + that the task count stays linear (no nc^2 fan-out);
- recall against a SAMPLED truth: for 1000 probe vectors the exact
  >=threshold neighbor set over the full corpus is brute-forced
  (1000 x N dots — affordable), and we check which of those true pairs
  the bucketed run recovered.

Usage: python tools/soak_neardup.py [n_vectors] [threshold]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.45

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from cosmwasm_etl_ray.functions.similarity import (
        _neardup_pairs_centroid,
        _normalize,
    )

    rng = np.random.default_rng(42)
    dim, n_clusters = 64, 200
    centers = rng.standard_normal((n_clusters, dim)) * 2.0
    assign = rng.integers(0, n_clusters, n)
    X = centers[assign] + 1.1 * rng.standard_normal((n, dim))
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(X)})
    ds = rd.from_pandas(df).repartition(32).materialize()

    n_lists = max(32, 1 << int(np.log2(np.sqrt(n))))  # O(sqrt N), pow2
    t0 = time.time()
    pairs = _neardup_pairs_centroid(
        ds, threshold, n_lists=n_lists, n_assign=3, n_tables=2, shards=256
    ).to_pandas()
    wall = time.time() - t0
    found = set(zip(pairs["vec_id_a"], pairs["vec_id_b"]))

    # sampled truth: 1000 probes x full corpus
    Xn = _normalize(X)
    probes = rng.choice(n, 1000, replace=False)
    true_pairs = set()
    sims_all = Xn[probes] @ Xn.T  # (1000, n)
    for row, p in zip(sims_all, probes):
        js = np.nonzero(row >= threshold)[0]
        for j in js:
            if j != p:
                true_pairs.add((min(p, j), max(p, j)))
    hit = sum(1 for t in true_pairs if t in found)
    recall = hit / max(1, len(true_pairs))
    # false-positive check on a sample of found pairs
    fp = 0
    sample_found = list(found)[:20000]
    for a, b in sample_found:
        if float(Xn[a] @ Xn[b]) < threshold - 1e-9:
            fp += 1

    print(
        f'{{"n": {n}, "threshold": {threshold}, "n_lists": {n_lists}, '
        f'"wall_s": {wall:.1f}, "pairs_found": {len(found)}, '
        f'"true_pairs_sampled": {len(true_pairs)}, "recall": {recall:.4f}, '
        f'"false_pos_in_sample": {fp}}}'
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
