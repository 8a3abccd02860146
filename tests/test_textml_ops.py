"""Training-data operator tests: dedup recall, ANN recall, text stages.

The near-dup corpora contain planted pairs (doc d vs its perturbed
copy d+10^6), so recall is measurable without an external oracle.
"""

import numpy as np
import pandas as pd

from cosmwasm_etl_ray.functions.similarity import brute_force_topk, lsh_topk
from cosmwasm_etl_ray.pipelines.queries_textml import (
    ann_topk,
    augmented_docs,
    lang_id,
    minhash_pairs,
    simhash_pairs,
    text_features,
)

import ray.data


def as_df(res) -> pd.DataFrame:
    return res if isinstance(res, pd.DataFrame) else res.to_pandas()


def planted_recall(pairs: pd.DataFrame, n_docs: int) -> float:
    found = {
        (min(a, b), max(a, b)) for a, b in zip(pairs["doc_a"], pairs["doc_b"])
    }
    hits = sum((d, d + 1_000_000) in found for d in range(n_docs))
    return hits / n_docs


def test_minhash_lsh_finds_planted_neardups(sf_dir):
    pairs = as_df(minhash_pairs(sf_dir))
    rec = planted_recall(pairs, 500)
    assert rec >= 0.85, f"minhash recall {rec}"
    # verified pairs carry their jaccard and meet the threshold
    assert (pairs["jaccard"] >= 0.5).all()


def test_simhash_finds_planted_neardups(sf_dir):
    pairs = as_df(simhash_pairs(sf_dir))
    rec = planted_recall(pairs, 500)
    assert rec >= 0.8, f"simhash recall {rec}"
    assert (pairs["hamming"] <= 16).all()
    # not degenerate: false-pair volume bounded
    assert len(pairs) < 5 * 500


def test_lsh_ann_recall_vs_brute_force(sf_dir):
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = emb.filter(lambda r: r["vec_id"] < 5).to_pandas()
    db = emb.filter(lambda r: r["vec_id"] >= 5)
    exact = brute_force_topk(db, qdf, k=10).to_pandas()
    approx = lsh_topk(db, qdf, k=10).to_pandas()
    e = exact.groupby("query_id")["neighbor_id"].apply(set)
    a = approx.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [len(e[q] & a.get(q, set())) / 10 for q in e.index]
    assert np.mean(recalls) >= 0.5, recalls  # 8 planes x 4 tables, small db


def test_brute_force_topk_is_exact(sf_dir):
    res = ann_topk(sf_dir).to_pandas()
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet").to_pandas()
    X = np.array(emb["embedding"].tolist(), dtype=np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    dbm = ids >= 5
    for q in range(5):
        sims = X[ids == q][0] @ X[dbm].T
        order = np.lexsort((ids[dbm], -sims))
        expected = ids[dbm][order][:10].tolist()
        got = res[res["query_id"] == q].sort_values("rank")["neighbor_id"].tolist()
        assert got == expected, f"query {q}"


def test_augmented_corpus_deterministic(sf_dir):
    a = augmented_docs(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = augmented_docs(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 1000


def test_lang_id_and_features_deterministic_schema(sf_dir):
    li = lang_id(sf_dir).to_pandas()
    assert set(li.columns) == {"doc_id", "lang_pred"}
    assert li["lang_pred"].isin(["en", "es", "de", "fr"]).all()
    tf = text_features(sf_dir).to_pandas()
    assert set(tf.columns) == {"doc_id", "rolling_fp"}
    tf2 = text_features(sf_dir).to_pandas()
    assert tf.sort_values("doc_id").reset_index(drop=True).equals(
        tf2.sort_values("doc_id").reset_index(drop=True)
    )


def test_dedup_clusters_pair_planted_docs(sf_dir):
    from cosmwasm_etl_ray.pipelines.queries_textml import neardup_clusters

    cl = neardup_clusters(sf_dir).set_index("doc_id")["cluster_id"]
    # most planted (d, d+1e6) pairs share a cluster with id = d
    hits = sum(
        d in cl.index and d + 1_000_000 in cl.index and cl[d] == cl[d + 1_000_000] == d
        for d in range(500)
    )
    assert hits >= 425  # matches minhash recall floor


def test_neardup_lsh_matches_exact_at_high_threshold(ray_session):
    """The sub-quadratic LSH near-dup path: precision 1.0 (exact verify
    within bucket), recall ~1 for genuinely-near pairs (cos ≈ 0.99)."""
    from cosmwasm_etl_ray.functions.similarity import embedding_neardup_pairs

    rng = np.random.default_rng(5)
    base = rng.standard_normal((60, 32))
    noisy = base[:20] + 0.15 * rng.standard_normal((20, 32))
    ids = list(range(60)) + [1000 + i for i in range(20)]
    df = pd.DataFrame({"vec_id": ids, "embedding": list(np.vstack([base, noisy]))})
    ds = ray.data.from_pandas(df)

    def pairset(d):
        return {(a, b) for a, b in zip(d["vec_id_a"], d["vec_id_b"])}

    exact = pairset(embedding_neardup_pairs(ds, 0.8, method="exact").to_pandas())
    lsh = pairset(embedding_neardup_pairs(ds, 0.8, method="lsh").to_pandas())
    assert len(exact) >= 20  # the planted pairs qualify
    assert lsh <= exact  # no false positives — verify is exact
    assert len(lsh & exact) / len(exact) >= 0.9  # recall


def test_neardup_centroid_low_threshold(ray_session):
    """The sub-quadratic path BELOW the LSH regime (auto dispatches
    here for threshold < 0.7): multi-assign k-means buckets, exact
    within-bucket verify — precision 1.0, recall ≥ 0.85 on clustered
    vectors with mid-cosine (0.45-0.7) neighbor structure."""
    from cosmwasm_etl_ray.functions.similarity import embedding_neardup_pairs

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((6, 32)) * 2
    X = np.vstack(
        [c + 0.9 * rng.standard_normal((40, 32)) for c in centers]
    )  # in-cluster cosines spread across ~0.3-0.8
    df = pd.DataFrame({"vec_id": list(range(len(X))), "embedding": list(X)})
    ds = ray.data.from_pandas(df)

    def pairset(d):
        return {(a, b) for a, b in zip(d["vec_id_a"], d["vec_id_b"])}

    exact = pairset(embedding_neardup_pairs(ds, 0.45, method="exact").to_pandas())
    got = pairset(embedding_neardup_pairs(ds, 0.45).to_pandas())  # auto→centroid
    assert len(exact) >= 100
    assert got <= exact  # exact verify ⇒ zero false positives
    assert len(got & exact) / len(exact) >= 0.85


def test_neardup_exact_with_cos_column(ray_session):
    """with_cos=True (truth harness) carries the cosine for banding."""
    from cosmwasm_etl_ray.functions.similarity import embedding_neardup_pairs

    rng = np.random.default_rng(3)
    X = rng.standard_normal((30, 16))
    X[1] = X[0] + 0.1 * rng.standard_normal(16)
    ds = ray.data.from_pandas(
        pd.DataFrame({"vec_id": list(range(30)), "embedding": list(X)})
    )
    out = embedding_neardup_pairs(ds, 0.9, method="exact", with_cos=True).to_pandas()
    assert {"vec_id_a", "vec_id_b", "cos"} <= set(out.columns)
    assert ((out["cos"] >= 0.9) & (out["cos"] <= 1.0 + 1e-12)).all()
    assert (0, 1) in set(zip(out["vec_id_a"], out["vec_id_b"]))


def test_ivf_ann_recall_vs_brute_force(sf_dir):
    from cosmwasm_etl_ray.functions.similarity import ivf_topk

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qdf = emb.filter(lambda r: r["vec_id"] < 5).to_pandas()
    db = emb.filter(lambda r: r["vec_id"] >= 5)
    exact = brute_force_topk(db, qdf, k=10).to_pandas()
    approx = ivf_topk(db, qdf, k=10, n_lists=16, n_probe=4).to_pandas()
    e = exact.groupby("query_id")["neighbor_id"].apply(set)
    a = approx.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [len(e[q] & a.get(q, set())) / 10 for q in e.index]
    import numpy as np
    assert np.mean(recalls) >= 0.5, recalls


def test_persistent_ivf_index_matches_inmemory(tmp_path, sf_dir):
    """Build-once IVF index (list-partitioned Parquet + sidecar) returns
    exactly what the in-memory ivf_topk computes with the same
    quantizer; the query read prunes to the probed partitions."""
    from cosmwasm_etl_ray.functions.ann_index import build_ivf_index, query_ivf_index
    from cosmwasm_etl_ray.functions.similarity import ivf_topk
    from cosmwasm_etl_ray.pipelines.queries_textml import _split_queries_db

    qdf, db = _split_queries_db(sf_dir)
    idx = str(tmp_path / "ivf")
    meta = build_ivf_index(db, idx, n_lists=16, seed=11)
    assert meta["n_lists"] == 16 and meta["n_vectors"] == 495

    got = (
        query_ivf_index(idx, qdf, k=10, n_probe=8)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    expect = (
        ivf_topk(db, qdf, k=10, n_lists=16, n_probe=8, seed=11)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expect)

    # the index layout is one directory per list (hive partitioning)
    import os

    parts = [d for d in os.listdir(idx) if d.startswith("list_id=")]
    assert len(parts) == 16


def test_labelprop_clusters_equal_union_find(ray_session):
    """Distributed min-label propagation == driver union-find on a
    graph with diameter > 1 (chain) plus separate components."""
    from cosmwasm_etl_ray.functions.dedup import cluster_pairs, cluster_pairs_labelprop

    pairs = pd.DataFrame(
        {
            "doc_a": [0, 1, 2,  20, 21,  30],
            "doc_b": [1, 2, 3,  21, 22,  31],
        }
    )
    uf = cluster_pairs(pairs).sort_values("doc_id").reset_index(drop=True)
    lp = cluster_pairs_labelprop(ray.data.from_pandas(pairs), shards=4)
    pd.testing.assert_frame_equal(lp, uf, check_dtype=False)
    assert set(lp["cluster_id"]) == {0, 20, 30}


# -------------------------------------------------------- model inference


def test_linear_scorer_exact_and_batch_invariant(ray_session, sf_dir):
    import numpy as np
    import ray.data

    from cosmwasm_etl_ray.functions.inference import (
        INFER_SCALE,
        infer_weights,
        score_embeddings,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = score_embeddings(ds).to_pandas().sort_values("vec_id")

    # driver-side exact reference
    ref = ds.to_pandas().sort_values("vec_id")
    emb = np.stack(ref["embedding"].to_numpy()).astype(np.float64)
    q = np.floor(emb * INFER_SCALE).astype(np.int64)
    logits = q @ infer_weights().T
    assert (out["pred"].to_numpy() == logits.argmax(axis=1)).all()
    assert (out["top_logit"].to_numpy() == logits.max(axis=1)).all()

    # batch size must not change the result (stateless stage)
    small = score_embeddings(ds.repartition(13)).to_pandas().sort_values("vec_id")
    assert (small["pred"].to_numpy() == out["pred"].to_numpy()).all()


def test_repetition_stats_semantics():
    import pandas as pd

    from cosmwasm_etl_ray.functions.text import repetition_stats_batch

    df = pd.DataFrame(
        {
            "doc_id": pd.Series([1, 2, 3], dtype="int64"),
            # doc1: 2-grams: "a b","b a","a b" -> top=2, n=3;
            #       3-grams: "a b a","b a b" -> n=2, dup=0
            # doc2: "x x x x": 2-grams all "x x" -> top=3, n=3;
            #       3-grams both "x x x" -> n=2 dup=1
            # doc3: single token -> all zeros
            "text": ["a b a b", "x x x x", "solo"],
        }
    )
    out = repetition_stats_batch(df).set_index("doc_id")
    assert out.loc[1].tolist() == [3, 2, 2, 0]
    assert out.loc[2].tolist() == [3, 3, 2, 1]
    assert out.loc[3].tolist() == [0, 0, 0, 0]


def test_ann_filtered_respects_predicate(ray_session, sf_dir):
    import numpy as np

    from cosmwasm_etl_ray.pipelines.queries_textml import ann_filtered

    out = ann_filtered(sf_dir).to_pandas()
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet").to_pandas()
    labels = emb.set_index("vec_id")["label"]
    assert (labels.reindex(out["neighbor_id"]).to_numpy() < 5).all()
    assert (out["neighbor_id"].to_numpy() >= 5).all()
    assert out.groupby("query_id").size().eq(10).all()

    # exact reference: filtered brute force on the driver
    db = emb[(emb["vec_id"] >= 5) & (emb["label"] < 5)]
    X = np.stack(db["embedding"].to_numpy()).astype(np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    q = emb[emb["vec_id"] < 5]
    Q = np.stack(q["embedding"].to_numpy()).astype(np.float64)
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sims = Q @ X.T
    ids = db["vec_id"].to_numpy()
    for i, qid in enumerate(q["vec_id"].to_numpy()):
        order = np.lexsort((ids, -sims[i]))[:10]
        got = out[out["query_id"] == qid].sort_values("rank")["neighbor_id"]
        assert list(got) == list(ids[order])


def test_dup_spans_semantics(ray_session):
    import pandas as pd
    import ray.data

    from cosmwasm_etl_ray.functions.dedup import SPAN_W, dup_spans

    base = " ".join(f"t{i}" for i in range(SPAN_W))  # exactly one window
    docs = pd.DataFrame(
        {
            "doc_id": pd.Series([1, 2, 3, 4], dtype="int64"),
            "text": [
                base + " x y",       # 3 windows; first == doc 2's window
                base,                # 1 window, shared with doc 1
                "a b c",             # too short: 0 windows
                " ".join(f"u{i}" for i in range(SPAN_W + 4)),  # 5 unique
            ],
        }
    )
    out = (
        dup_spans(ray.data.from_pandas(docs).repartition(3))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out["n_windows"].tolist() == [3, 1, 0, 5]
    assert out["n_dup_windows"].tolist() == [1, 1, 0, 0]


def test_label_centroids_exact_and_layout_invariant(ray_session, sf_dir):
    import numpy as np

    from cosmwasm_etl_ray.pipelines.queries_textml import label_centroids

    out = label_centroids(sf_dir)
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet").to_pandas()
    q = np.floor(np.stack(emb["embedding"].to_numpy()).astype(np.float64) * 1000).astype(np.int64)
    labels = emb["label"].to_numpy().astype(np.int64)
    for lab in np.unique(labels):
        s = q[labels == lab].sum(axis=0)
        n = (labels == lab).sum()
        want = np.sign(s) * (np.abs(s) // n)  # truncating division
        got = out[out["label"] == lab].sort_values("dim")["centroid_q"].to_numpy()
        assert (got == want).all()


def test_semantic_neardup_matches_driver_scan(ray_session, sf_dir):
    import numpy as np

    from cosmwasm_etl_ray.pipelines.queries_textml import (
        SEM_BAR,
        semantic_neardup,
    )

    out = (
        semantic_neardup(sf_dir).to_pandas()
        .sort_values(["label", "a", "b"]).reset_index(drop=True)
    )
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet").to_pandas()
    rows = []
    for lab, g in emb.groupby("label"):
        X = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        ids = g["vec_id"].to_numpy()
        sims = X @ X.T
        iu, ju = np.triu_indices(len(ids), k=1)
        m = sims[iu, ju] >= SEM_BAR
        for i, j in zip(iu[m], ju[m]):
            a, b = sorted((int(ids[i]), int(ids[j])))
            rows.append((int(lab), a, b))
    want = sorted(rows)
    got = list(out.itertuples(index=False, name=None))
    assert got == want
    # pairs never cross buckets
    lab = emb.set_index("vec_id")["label"]
    assert (lab.reindex(out["a"]).to_numpy() == lab.reindex(out["b"]).to_numpy()).all()


def test_pq_index_deterministic_compressed_and_recalls(ray_session, sf_dir, tmp_path):
    """PQ index: (a) two builds over the same corpus produce identical
    code tables (seeded sub-quantizers on the deterministic sample),
    (b) the serving artifact is an order of magnitude smaller than the
    embeddings, (c) ADC top-10 overlaps the exact top-10 by >= the
    gate bar for every query."""
    import glob
    import os

    import pyarrow.parquet as pq

    from cosmwasm_etl_ray.functions.ann_index import (
        build_pq_index,
        query_pq_index,
    )
    from cosmwasm_etl_ray.pipelines.queries_textml import _split_queries_db

    qdf, db = _split_queries_db(sf_dir)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    meta = build_pq_index(db, a, m=16, seed=11)
    build_pq_index(db, b, m=16, seed=11)
    assert meta["m"] == 16 and meta["dim"] == 64

    def codes(root):
        files = sorted(glob.glob(os.path.join(root, "codes", "*.parquet")))
        df = pd.concat([pq.read_table(f).to_pandas() for f in files])
        return df.sort_values("vec_id").reset_index(drop=True)

    pd.testing.assert_frame_equal(codes(a), codes(b))

    code_bytes = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(a, "codes", "*.parquet"))
    )
    emb_bytes = os.path.getsize(os.path.join(sf_dir, "embeddings.parquet"))
    assert code_bytes * 4 < emb_bytes  # ~32x raw; parquet overhead eats some

    approx = query_pq_index(a, qdf, k=10).to_pandas()
    exact = brute_force_topk(db, qdf, k=10).to_pandas()
    e = exact.groupby("query_id")["neighbor_id"].apply(set)
    g = approx.groupby("query_id")["neighbor_id"].apply(set)
    assert approx.groupby("query_id").size().eq(10).all()
    assert all(len(e[q] & g[q]) >= 3 for q in e.index)


def test_pq_append_increment(ray_session, sf_dir, tmp_path):
    """Append to a PQ index without retraining: base built on the even
    half, odd half appended against the frozen codebooks — the result
    equals a query over a fresh index whose codebooks came from the
    same (even-half) training sample; an unregistered increment dir is
    invisible."""
    import os

    from cosmwasm_etl_ray.functions.ann_index import (
        append_pq_index,
        build_pq_index,
        query_pq_index,
    )
    from cosmwasm_etl_ray.pipelines.queries_textml import _split_queries_db

    qdf, db = _split_queries_db(sf_dir)
    even = db.map_batches(
        lambda df: df[df["vec_id"] % 2 == 0], batch_format="pandas"
    )
    odd = db.map_batches(
        lambda df: df[df["vec_id"] % 2 == 1], batch_format="pandas"
    )
    idx = str(tmp_path / "pq")
    meta0 = build_pq_index(even, idx, m=16, seed=11)
    base_only = query_pq_index(idx, qdf, k=10).to_pandas()
    meta1 = append_pq_index(odd, idx)
    assert meta1["n_increments"] == 1
    assert meta1["n_vectors"] == meta0["n_vectors"] + meta1["n_appended"]
    full = query_pq_index(idx, qdf, k=10).to_pandas()
    # appended vectors participate: some odd neighbor appears somewhere
    assert (full["neighbor_id"] % 2 == 1).any()
    # and the increment is a strict superset corpus: every query still
    # returns a full k
    assert full.groupby("query_id").size().eq(10).all()
    # re-query of base dirs only (simulate unregistered increment):
    # meta rollback makes the increment invisible
    import json as _json

    mpath = os.path.join(idx, "_meta.json")
    m = _json.load(open(mpath))
    m["n_increments"] = 0
    _json.dump(m, open(mpath, "w"))
    pd.testing.assert_frame_equal(
        query_pq_index(idx, qdf, k=10).to_pandas(), base_only
    )
