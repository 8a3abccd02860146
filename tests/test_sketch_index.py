"""Persistent sketch artifacts: LSH ANN index and MinHash bucket index
(build once / query many, path-pruned probes — the ann_index.py
discipline extended to the whole sketch family)."""

import glob
import os

import numpy as np
import pandas as pd

import ray.data

from cosmwasm_etl_ray.functions.ann_index import build_lsh_index, query_lsh_index
from cosmwasm_etl_ray.functions.dedup import (
    MinHasher,
    candidate_pairs_from_buckets,
)
from cosmwasm_etl_ray.functions.similarity import lsh_topk
from cosmwasm_etl_ray.functions.sketch_index import (
    build_minhash_index,
    index_candidate_pairs,
    probe_minhash_index,
)
from cosmwasm_etl_ray.pipelines.queries_textml import _split_queries_db, augmented_docs


def _topk_frame(res) -> pd.DataFrame:
    df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def test_persistent_lsh_index_matches_inmemory(tmp_path, sf_dir):
    """query_lsh_index == lsh_topk with the same planes: the persisted
    bucket lists + vector store reproduce the in-memory candidate set
    exactly (same seed → same hyperplanes → same buckets)."""
    qdf, db = _split_queries_db(sf_dir)
    idx = str(tmp_path / "lsh")
    meta = build_lsh_index(db, idx, n_planes=4, n_tables=16, seed=23)
    assert meta["n_tables"] == 16

    got = _topk_frame(query_lsh_index(idx, qdf, k=10))
    expect = _topk_frame(lsh_topk(db, qdf, k=10, n_planes=4, n_tables=16, seed=23))
    pd.testing.assert_frame_equal(got, expect)

    # layout: one directory per (table, bucket); probes read only those
    parts = glob.glob(os.path.join(idx, "buckets", "tb=*"))
    assert len(parts) > 16  # multiple buckets across 16 tables


def test_minhash_index_candidates_match_fresh_sketch(tmp_path, sf_dir):
    """index_candidate_pairs over the persisted buckets == candidates
    from sketching the corpus fresh (same params)."""
    docs = augmented_docs(sf_dir)
    idx = str(tmp_path / "mh")
    build_minhash_index(docs, idx, num_perm=64, bands=16, ngram=3, seed=7)

    def pairset(ds):
        df = ds.to_pandas()
        return {(int(a), int(b)) for a, b in zip(df["doc_a"], df["doc_b"])}

    fresh_bucketed = docs.map_batches(
        MinHasher(num_perm=64, bands=16, ngram=3, seed=7),
        batch_format="pandas",
        batch_size=1024,
    )
    got = pairset(index_candidate_pairs(idx))
    expect = pairset(candidate_pairs_from_buckets(fresh_bucketed, dedup=True))
    assert got == expect and len(got) > 0


def test_minhash_index_increment_probe(tmp_path, sf_dir):
    """The 100-TB money path: index the ORIGINAL docs once, then probe
    only the PERTURBED increment — candidates must recover most planted
    (d+1e6 → d) pairs, sketching only the increment and reading only
    the matching bucket shards."""
    aug = augmented_docs(sf_dir).materialize()
    originals = aug.filter(expr="doc_id < 1000000")
    increment = aug.filter(expr="doc_id >= 1000000")

    idx = str(tmp_path / "mh_inc")
    build_minhash_index(originals, idx, n_shards=64)

    cands = probe_minhash_index(idx, increment).to_pandas()
    found = {(int(n), int(o)) for n, o in zip(cands["doc_new"], cands["doc_indexed"])}
    n_docs = originals.count()
    hits = sum((d + 1_000_000, d) in found for d in range(n_docs))
    assert hits / n_docs >= 0.8, f"increment-probe recall {hits / n_docs}"
    # pruning is real: the probe plan reads shard dirs, not the corpus
    assert len(glob.glob(os.path.join(idx, "buckets", "bshard=*"))) == 64


# ---------------------------------------------- IVF incremental append


def test_ivf_append_covers_all_vectors_and_is_crash_safe(tmp_path, sf_dir):
    import json

    import pyarrow.compute as pc

    from cosmwasm_etl_ray.functions.ann_index import (
        append_ivf_index,
        build_ivf_index,
        query_ivf_index,
    )

    qdf, db = _split_queries_db(sf_dir)

    def half(par):
        def f(t):
            return t.filter(pc.equal(pc.bit_wise_and(t["vec_id"], 1), par))

        return f

    d = str(tmp_path / "idx")
    build_ivf_index(db.map_batches(half(1), batch_format="pyarrow"), d,
                    n_lists=8, seed=11)
    base_meta = json.load(open(os.path.join(d, "_meta.json")))

    # an UNREGISTERED increment directory is invisible to queries
    os.makedirs(os.path.join(d, "inc-0", "list_id=0"), exist_ok=True)
    pre = query_ivf_index(d, qdf, k=10, n_probe=8).to_pandas()
    even_ids = set(
        db.map_batches(half(0), batch_format="pyarrow")
        .to_pandas()["vec_id"]
    )
    assert not (set(pre["neighbor_id"]) & even_ids)

    # real append: the stale dir is swept, the generation registers
    meta = append_ivf_index(db.map_batches(half(0), batch_format="pyarrow"), d)
    assert meta["n_increments"] == 1
    assert meta["n_vectors"] == base_meta["n_vectors"] + len(even_ids)
    post = query_ivf_index(d, qdf, k=10, n_probe=8).to_pandas()
    # appended vectors are now reachable neighbors
    assert set(post["neighbor_id"]) & even_ids
    # and every query still returns a full k
    assert (post.groupby("query_id").size() == 10).all()
