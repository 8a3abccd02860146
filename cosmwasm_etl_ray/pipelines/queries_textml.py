"""Training-data operators as queries(): text analysis, dedup family,
similarity search. Oracle twins where SQL can express the semantics;
rows-only otherwise (sketch-based ops).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from cosmwasm_etl_ray.functions.dedup import (
    exact_dedup_keep_min,
    minhash_dedup_pairs,
    simhash_dedup_pairs,
)
from cosmwasm_etl_ray.functions.similarity import (
    brute_force_topk,
    embedding_neardup_pairs,
    ivf_topk,
    lsh_topk,
)
from cosmwasm_etl_ray.functions.text import (
    LangId,
    QualityScorer,
    rolling_fingerprint,
    token_stats_batch,
)


def _docs(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _emb(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def augmented_docs(sf_dir: str) -> "ray.data.Dataset":
    """documents ∪ perturbed copies (every 13th word dropped, id+10^6) —
    the deterministic near-dup corpus for the sketch operators (3-gram
    Jaccard of a pair ≈ 0.6-0.8, inside MinHash-LSH's detection band)."""

    def perturb(df: pd.DataFrame) -> pd.DataFrame:
        mut = df.copy()
        mut["doc_id"] = mut["doc_id"] + 1_000_000
        mut["text"] = mut["text"].map(
            lambda s: " ".join(w for i, w in enumerate(s.split()) if i % 13 != 5)
        )
        return pd.concat([df, mut], ignore_index=True)

    return _docs(sf_dir).map_batches(perturb, batch_format="pandas")


# ---- oracle-checked ----

def text_stats(sf_dir: str) -> "ray.data.Dataset":
    return _docs(sf_dir).map_batches(token_stats_batch, batch_format="pyarrow")


def quality_scores(sf_dir: str) -> "ray.data.Dataset":
    return _docs(sf_dir).map_batches(
        QualityScorer, batch_format="pandas", batch_size=2048, concurrency=(1, 4)
    )


def doc_fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """md5 content fingerprint (the sha256-style id hashing the
    reference applies to raw tx bytes)."""
    import hashlib

    def fp(t: pa.Table) -> pa.Table:
        out = [hashlib.md5(s.encode()).hexdigest() for s in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "fp_md5": pa.array(out, type=pa.string())})

    return _docs(sf_dir).map_batches(fp, batch_format="pyarrow")


def dedup_exact_prefix(sf_dir: str) -> "ray.data.Dataset":
    """Exact dedup on a normalized key (20-char prefix): hash-partition
    by key, keep min doc_id per group."""

    def key(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "key20": pc.utf8_slice_codeunits(t["text"], 0, 20),
            }
        )

    return exact_dedup_keep_min(_docs(sf_dir), key, "key20")


# Recall bars for the centroid-bucketed near-dup per cosine band
# (floor(cos*10)); set well under the measured deterministic recall at
# sf0.01 AND sf0.1 (seed 17, 32 lists × 3 assigns × 2 quantizer
# tables: band4 .94/1.0, band5 .92/1.0, band6 1.0/1.0).
_NEARDUP_BARS = {4: 0.75, 5: 0.8}
_NEARDUP_DEFAULT_BAR = 0.9


def embedding_neardup(sf_dir: str) -> pd.DataFrame:
    """Recall contract for the CENTROID-BUCKETED near-dup at threshold
    0.45 (below the hyperplane-LSH regime — VERDICT r3 #2). The
    production path is candidate-bounded (multi-assign k-means buckets,
    Σ bucket² work, no nc² task fan-out); the exact all-pairs plan runs
    ONLY as the truth harness, affordable at gate scale. Bands by true
    cosine: "of the n_pairs true pairs in band b, the bucketed plan
    recovered ≥ bar(b)". The SQL twin restates the band structure
    (cband, n_pairs — hash-checked exactly) plus the contract
    (recall_ok all true).

    Band + threshold use a QUANTIZED cosine — components floored to
    int(1e6·e), dot/norms exact in float64 (|q|≤~5e5 ⇒ 64-dim sums
    ≪ 2^53), then one correctly-rounded divide/sqrt chain — so numpy
    and DuckDB produce the bit-identical double and floor(·*10) can
    never flip a band between engine and oracle (BLAS accumulation
    order vs DuckDB's sequential loop differ at the last ulp on raw
    float cosines; a boundary-straddling pair would flake the hash)."""
    db = _emb(sf_dir).materialize()  # consumed by truth + centroid passes
    # exact truth at a slightly LOWER float threshold: |float cos −
    # quantized cos| ≤ ~1e-4, so 0.449 catches every pair whose
    # quantized cosine lands ≥ 0.45
    truth = embedding_neardup_pairs(
        db, threshold=0.449, method="exact"
    ).to_pandas()
    got = embedding_neardup_pairs(db, threshold=0.45).to_pandas()  # centroid
    found = set(zip(got["vec_id_a"], got["vec_id_b"]))
    emb = db.to_pandas()  # 500-2000 rows — gate-scale only
    q = {
        int(v): np.floor(np.asarray(e, dtype=np.float64) * 1e6)
        for v, e in zip(emb["vec_id"], emb["embedding"])
    }
    norm = {v: np.sqrt(np.dot(a, a)) for v, a in q.items()}
    qcos = np.array(
        [
            np.dot(q[a], q[b]) / (norm[a] * norm[b])
            for a, b in zip(truth["vec_id_a"], truth["vec_id_b"])
        ]
    )
    truth = truth[qcos >= 0.45].reset_index(drop=True)
    truth["cband"] = np.floor(qcos[qcos >= 0.45] * 10).astype("int64")
    truth["hit"] = [
        (a, b) in found for a, b in zip(truth["vec_id_a"], truth["vec_id_b"])
    ]
    g = (
        truth.groupby("cband")
        .agg(n_pairs=("hit", "size"), frac=("hit", "mean"))
        .reset_index()
    )
    g["recall_ok"] = [
        f >= _NEARDUP_BARS.get(int(b), _NEARDUP_DEFAULT_BAR)
        for b, f in zip(g["cband"], g["frac"])
    ]
    return (
        g[["cband", "n_pairs", "recall_ok"]]
        .astype({"cband": "int64", "n_pairs": "int64"})
        .sort_values("cband")
        .reset_index(drop=True)
    )


def _split_queries_db(sf_dir: str):
    """queries = vec_id < 5, db = the rest (expression filters push into
    the scan; no per-row Python)."""
    emb = _emb(sf_dir)
    qdf = emb.filter(expr="vec_id < 5").to_pandas()
    db = emb.filter(expr="vec_id >= 5")
    return qdf, db


def ann_topk(sf_dir: str) -> "ray.data.Dataset":
    """Brute-force cosine top-10: queries = vec_id < 5, db = the rest."""
    qdf, db = _split_queries_db(sf_dir)
    return brute_force_topk(db, qdf, k=10)


def label_centroids(sf_dir: str) -> pd.DataFrame:
    """Per-label embedding centroid (the class-mean vector behind
    semantic routing / SemDeDup cluster summaries), with EXACT integer
    semantics: quantize each component to floor(e * 1000) BEFORE the
    sum (int64 sums are order-free, so the distributed fold is exact
    where a float mean would hash-flake), centroid = integer-division
    mean. Shape: per-batch (label, dim) partial sums + counts — each
    batch contracts to <= 10 x 64 rows — then one tiny driver fold."""
    import ray.data as rd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        q = np.floor(emb * 1000).astype(np.int64)  # (n, D)
        labels = df["label"].to_numpy().astype(np.int64)
        out = []
        for lab in np.unique(labels):
            m = labels == lab
            out.append(
                pd.DataFrame(
                    {
                        "label": lab,
                        "dim": np.arange(q.shape[1], dtype=np.int64),
                        "s": q[m].sum(axis=0),
                        "n": int(m.sum()),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    parts = (
        rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
        )
        .map_batches(partial, batch_format="pandas")
        .to_pandas()  # <= 10 labels x 64 dims x n_blocks rows
    )
    g = parts.groupby(["label", "dim"], sort=True, as_index=False).agg(
        s=("s", "sum"), n=("n", "sum")
    )
    # DuckDB's // TRUNCATES toward zero on negatives (numpy floors):
    # mirror the truncation exactly with a sign-split integer divide
    s = g["s"].to_numpy()
    n = g["n"].to_numpy()
    g["centroid_q"] = np.sign(s) * (np.abs(s) // n)
    out = g[["label", "dim", "centroid_q"]].copy()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


SEM_BAR = 0.4  # checked gap >= 1.2e-4 to the nearest pair at every sf


def semantic_neardup(sf_dir: str) -> "ray.data.Dataset":
    """SemDeDup-shaped near-duplicate pairs: exact cosine >= SEM_BAR
    WITHIN a semantic bucket (label here; at scale the bucket is a
    k-means/IVF assignment — see label_centroids). The bucket bound
    turns the O(n²) scan into sum-of-cluster² — one shard_exchange
    routes each bucket wholly to one task, the within-bucket scan is
    one normalized matmul. Output is the integer pair list (cosine
    itself never leaves the task: float columns hash-flake)."""
    from cosmwasm_etl_ray.functions.agg import shard_exchange

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        # a task may hold several labels (hash co-location): scan each
        for lab, g in df.groupby("label", sort=False):
            X = np.stack(g["embedding"].to_numpy()).astype(np.float64)
            X = X / np.linalg.norm(X, axis=1, keepdims=True)
            ids = g["vec_id"].to_numpy().astype(np.int64)
            sims = X @ X.T
            iu, ju = np.triu_indices(len(ids), k=1)
            m = sims[iu, ju] >= SEM_BAR
            a, b = ids[iu[m]], ids[ju[m]]
            outs.append(
                pd.DataFrame(
                    {
                        "label": np.full(m.sum(), int(lab), dtype=np.int64),
                        "a": np.minimum(a, b),
                        "b": np.maximum(a, b),
                    }
                )
            )
        return (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in ("label", "a", "b")}
            )
        )

    return shard_exchange(ds, ["label"], per_bucket, shards=16)


def dup_spans_docs(sf_dir: str) -> "ray.data.Dataset":
    """Exact duplicated-span signal (the substring-dedup modality):
    per doc, how many of its 16-token windows occur in >= 2 docs."""
    from cosmwasm_etl_ray.functions.dedup import dup_spans

    return dup_spans(_docs(sf_dir))


def ann_filtered(sf_dir: str) -> "ray.data.Dataset":
    """Predicate-constrained vector search (filtered ANN): top-10
    cosine among db vectors with label < 5 — the filter is pushed to
    the parquet SCAN (pyarrow dataset predicate), so excluded vectors
    never enter the object store, and the top-k math is unchanged."""
    import pyarrow.dataset as pads

    qdf, _ = _split_queries_db(sf_dir)
    db = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filter=(pads.field("vec_id") >= 5) & (pads.field("label") < 5),
    )
    return brute_force_topk(db, qdf, k=10)


# ---- rows-only (sketches / heuristics not SQL-expressible) ----

def lang_id(sf_dir: str) -> "ray.data.Dataset":
    return _docs(sf_dir).map_batches(
        LangId, batch_format="pandas", batch_size=2048, concurrency=(1, 4)
    )


def text_features(sf_dir: str) -> "ray.data.Dataset":
    """Rolling-hash winnowing fingerprint (rows-only)."""

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "rolling_fp": rolling_fingerprint(df["text"]).astype("int64"),
            }
        )

    return _docs(sf_dir).map_batches(feats, batch_format="pandas", batch_size=2048)


# The three MinHash-family queries share ONE LSH + verify run: the
# exact Jaccard is computed once at the loosest threshold (0.3) and the
# tighter views filter it — candidates and the two verify joins are not
# recomputed per query (they used to run 3×, the 3 slowest bench rows).
_PAIR_CACHE: dict[str, pd.DataFrame] = {}


def _minhash_pairs_03(sf_dir: str) -> pd.DataFrame:
    if sf_dir not in _PAIR_CACHE:
        _PAIR_CACHE[sf_dir] = (
            minhash_dedup_pairs(augmented_docs(sf_dir), threshold=0.3)
            .to_pandas()  # verified pair list: tiny by LSH construction
        )
    return _PAIR_CACHE[sf_dir]


def minhash_pairs(sf_dir: str) -> pd.DataFrame:
    """Raw MinHash-LSH verified pair list (the product API; the gate
    query dedup_minhash grades it against exact ground truth)."""
    p = _minhash_pairs_03(sf_dir)
    return p[p["jaccard"] >= 0.5].reset_index(drop=True)


def simhash_pairs(sf_dir: str) -> "ray.data.Dataset":
    """Raw SimHash near-dup pair list (product API)."""
    return simhash_dedup_pairs(augmented_docs(sf_dir), max_hamming=16)


# Recall-contract gate queries for the sketch family: LSH *discovery*
# is probabilistic (not SQL-expressible pair-for-pair), but the PLANTED
# pair set (d, d+10^6) with its exact 3-gram Jaccard IS — so each
# sketch is graded per jaccard band: "of the n_pairs true pairs in
# band b, the sketch recovered ≥ bar(b)". The SQL twin restates the
# band structure (jband, n_pairs — hash-checked exactly) plus the
# contract (recall_ok all true). Bars sit well under the measured
# deterministic recall at sf0.01 AND sf0.1 (fixed seeds, fixed corpus:
# minhash .87/.95/1.0 and sf0.1 .78/.97/.99 for bands 5/6/7; simhash
# ≥.80/.91/.94; clusters track minhash).
_RECALL_BARS = {5: 0.6, 6: 0.8, 7: 0.85}
_DEFAULT_BAR = 0.9

_TRUTH_CACHE: dict[str, pd.DataFrame] = {}


def _planted_truth(sf_dir: str) -> pd.DataFrame:
    """Exact jaccard for every planted pair (≥ 0.3), computed once per
    process — the same distributed run dedup_ngram_jaccard gates."""
    if sf_dir not in _TRUTH_CACHE:
        _TRUTH_CACHE[sf_dir] = dedup_ngram_jaccard(sf_dir).to_pandas()
    return _TRUTH_CACHE[sf_dir]


def _banded_recall(sf_dir: str, hit_fn) -> pd.DataFrame:
    truth = _planted_truth(sf_dir)
    t = truth[truth["jaccard"] >= 0.5].copy()
    t["jband"] = np.floor(t["jaccard"] * 10).astype("int64")
    t["hit"] = hit_fn(t)
    g = (
        t.groupby("jband")
        .agg(n_pairs=("hit", "size"), frac=("hit", "mean"))
        .reset_index()
    )
    g["recall_ok"] = [
        f >= _RECALL_BARS.get(int(b), _DEFAULT_BAR)
        for b, f in zip(g["jband"], g["frac"])
    ]
    return (
        g[["jband", "n_pairs", "recall_ok"]]
        .astype({"jband": "int64", "n_pairs": "int64"})
        .sort_values("jband")
        .reset_index(drop=True)
    )


def dedup_minhash(sf_dir: str) -> pd.DataFrame:
    """MinHash-LSH recall contract per true-jaccard band (see above)."""
    p = minhash_pairs(sf_dir)
    found = set(zip(p["doc_a"], p["doc_b"]))
    return _banded_recall(
        sf_dir,
        lambda t: [(a, b) in found for a, b in zip(t["doc_a"], t["doc_b"])],
    )


def dedup_minhash_indexed(sf_dir: str) -> pd.DataFrame:
    """Recall contract over the PERSISTENT MinHash band-bucket index
    (functions/sketch_index.py): candidates come from the persisted
    hive-partitioned buckets (same permutations, seed 7), the exact
    Jaccard verify is the same distributed two-join pass — the
    sketch-once/dedup-many serving shape under the gate, like
    ann_*_indexed for the ANN family."""
    import tempfile

    from cosmwasm_etl_ray.functions.dedup import verify_pairs_jaccard
    from cosmwasm_etl_ray.functions.sketch_index import (
        build_minhash_index,
        index_candidate_pairs,
    )

    key = (sf_dir, "minhash")
    if key not in _INDEX_CACHE:
        d = tempfile.mkdtemp(prefix="cwel_minhash_idx_")
        build_minhash_index(augmented_docs(sf_dir), d)
        _INDEX_CACHE[key] = d
    cands = index_candidate_pairs(_INDEX_CACHE[key])
    p = verify_pairs_jaccard(
        cands, augmented_docs(sf_dir), threshold=0.5
    ).to_pandas()
    found = set(zip(p["doc_a"], p["doc_b"]))
    return _banded_recall(
        sf_dir,
        lambda t: [(a, b) in found for a, b in zip(t["doc_a"], t["doc_b"])],
    )


def dedup_increment_probe(sf_dir: str) -> pd.DataFrame:
    """INCREMENTAL dedup — the recurring-ingest money path: the base
    corpus is indexed once; only the increment (the perturbed +10^6
    copies) is sketched; the bucket read is path-pruned to the
    increment's band hashes; candidates verify with the same exact
    Jaccard. The planted pairs are exactly the increment-vs-corpus
    near-dups, so the recall contract matches dedup_minhash's bands."""
    import tempfile

    from cosmwasm_etl_ray.functions.dedup import verify_pairs_jaccard
    from cosmwasm_etl_ray.functions.sketch_index import (
        build_minhash_index,
        probe_minhash_index,
    )

    key = (sf_dir, "minhash_base")
    if key not in _INDEX_CACHE:
        d = tempfile.mkdtemp(prefix="cwel_minhash_base_idx_")
        build_minhash_index(_docs(sf_dir), d)
        _INDEX_CACHE[key] = d

    increment = augmented_docs(sf_dir).filter(expr="doc_id >= 1000000")
    cands = probe_minhash_index(_INDEX_CACHE[key], increment)

    def as_pair(df: pd.DataFrame) -> pd.DataFrame:
        # canonical orientation: indexed (base) id is doc_a, new is doc_b
        return pd.DataFrame({"doc_a": df["doc_indexed"], "doc_b": df["doc_new"]})

    p = verify_pairs_jaccard(
        cands.map_batches(as_pair, batch_format="pandas"),
        augmented_docs(sf_dir),
        threshold=0.5,
        # probe pairs dedup only per batch; a pair colliding in many
        # bands would otherwise verify up to `bands` times
        dedup_cands=True,
    ).to_pandas()
    found = set(zip(p["doc_a"], p["doc_b"]))
    return _banded_recall(
        sf_dir,
        lambda t: [(a, b) in found for a, b in zip(t["doc_a"], t["doc_b"])],
    )


def dedup_simhash(sf_dir: str) -> pd.DataFrame:
    """SimHash recall contract per true-jaccard band (see above)."""
    p = simhash_pairs(sf_dir).to_pandas()
    found = set(zip(p["doc_a"], p["doc_b"]))
    return _banded_recall(
        sf_dir,
        lambda t: [
            (a, b) in found or (b, a) in found
            for a, b in zip(t["doc_a"], t["doc_b"])
        ],
    )


def dedup_ngram_jaccard(sf_dir: str) -> "ray.data.Dataset":
    """Exact word-3-gram Jaccard over an ENUMERATED candidate stream —
    the known-candidate verify twin of dedup_minhash (whose LSH
    *discovers* candidates probabilistically, hence rows-only): the
    perturbed-corpus structure makes the true candidates (d, d+10^6)
    enumerable, so the whole pipeline — candidate stream, distributed
    two-join text attach, exact Jaccard — is SQL-checkable."""
    from cosmwasm_etl_ray.functions.dedup import verify_pairs_jaccard

    docs = augmented_docs(sf_dir)

    def cands(t: pa.Table) -> pa.Table:
        base = t.filter(pc.less(t["doc_id"], pa.scalar(1_000_000)))
        return pa.table(
            {
                "doc_a": base["doc_id"],
                "doc_b": pc.add(base["doc_id"], pa.scalar(1_000_000)),
            }
        )

    return verify_pairs_jaccard(
        docs.map_batches(cands, batch_format="pyarrow"), docs, ngram=3, threshold=0.3
    )


def neardup_clusters(sf_dir: str) -> pd.DataFrame:
    """Raw near-dup clusters (product API): MinHash-LSH pairs →
    connected components, cluster_id = min doc_id in the component
    (the keep-representative)."""
    from cosmwasm_etl_ray.functions.dedup import cluster_pairs

    p = _minhash_pairs_03(sf_dir)
    return cluster_pairs(p[p["jaccard"] >= 0.5])


def dedup_clusters(sf_dir: str) -> pd.DataFrame:
    """End-to-end cluster contract per true-jaccard band: a planted
    pair counts as recovered when BOTH docs land in the same cluster —
    grading LSH discovery AND the connected-components step together
    (transitive closure may recover pairs LSH missed directly)."""
    cl = neardup_clusters(sf_dir)
    lab = dict(zip(cl["doc_id"], cl["cluster_id"]))
    return _banded_recall(
        sf_dir,
        lambda t: [
            lab.get(a, -1) == lab.get(b, -2)
            for a, b in zip(t["doc_a"], t["doc_b"])
        ],
    )


def media_meta(sf_dir: str) -> "ray.data.Dataset":
    """Multimodal plumbing through the oracle gate: synthesize binary
    media from documents, decode via the actor-pool FakeDecoder (byte
    histogram + payload sha256 — the codec itself is the documented
    stub), frame-sample videos, and join decode metadata with sampled
    frame counts. Every output column is SQL-derivable from the
    deterministic synthesis, so the whole binary-column pipeline —
    large_binary schema, small batches, actor setup-once, flat_map
    frame layout — is hash-checked, not just pytest-checked."""
    from cosmwasm_etl_ray.functions.agg import grouped_agg
    from cosmwasm_etl_ray.functions.joins import hash_join
    from cosmwasm_etl_ray.stages.multimodal import (
        FakeDecoder,
        FrameSampler,
        synthesize_media,
    )

    # two consumers below (decode branch + frame branch) — materialize
    # once or the read + binary synthesis executes twice
    media = synthesize_media(_docs(sf_dir)).materialize()
    feats = media.map_batches(
        FakeDecoder, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    ).map_batches(
        lambda t: t.select(["media_id", "kind", "payload_sha256", "n_bytes"]),
        batch_format="pyarrow",
    )
    frames = media.map_batches(FrameSampler(), batch_format="pyarrow", batch_size=512)
    n_sampled = grouped_agg(
        frames,
        keys=["media_id"],
        spec={"n_sampled_frames": ("frame_index", "count")},
        final="shuffle",
    )
    return hash_join(
        feats,
        n_sampled,
        on="media_id",
        left_cols={"media_id": "int64", "kind": "object",
                   "payload_sha256": "object", "n_bytes": "int64"},
        right_cols={"media_id": "int64", "n_sampled_frames": "int64"},
    )


def media_resize(sf_dir: str) -> "ray.data.Dataset":
    """Resize stage through the oracle gate: synthesize binary media,
    nearest-neighbor byte resize in the actor-pool FakeResizer, emit
    the resized payload's length + sha256 — the SQL twin rebuilds the
    identical subsample index math over the deterministic payload."""
    from cosmwasm_etl_ray.stages.multimodal import FakeResizer, synthesize_media

    media = synthesize_media(_docs(sf_dir))
    return media.map_batches(
        FakeResizer, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    ).map_batches(
        lambda t: t.select(["media_id", "resized_len", "resized_sha256"]),
        batch_format="pyarrow",
    )


def media_bmp_stats(sf_dir: str) -> "ray.data.Dataset":
    """REAL image decode through the oracle gate: payloads are
    spec-compliant 24-bit BMPs (pure-numpy codec, no external libs —
    stages/multimodal.py encode_bmp24), the actor-pool BmpDecoder
    parses the actual header + bottom-up BGR pixel grid, and the
    DECODED per-channel sums hash-check against a DuckDB twin that
    regenerates the deterministic pixel field ((id·7+y·5+x·3+c·11)
    mod 256) with cross-joined ranges. A header, stride-padding, or
    channel-order bug anywhere in encode OR decode flips the sums."""
    from cosmwasm_etl_ray.stages.multimodal import (
        BmpDecoder,
        synthesize_bmp_media,
    )

    media = synthesize_bmp_media(_docs(sf_dir))
    return media.map_batches(
        BmpDecoder, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


def media_bmp_resize(sf_dir: str) -> "ray.data.Dataset":
    """REAL 2-D nearest-neighbor pixel resize through the gate: decode
    the BMP, resample to 16×16 via out[ty,tx] = px[(ty·h)//16,
    (tx·w)//16], emit exact channel sums of the RESIZED image — the
    SQL twin reruns the same index math over the regenerated pixels."""
    from cosmwasm_etl_ray.stages.multimodal import (
        BmpResizer,
        synthesize_bmp_media,
    )

    media = synthesize_bmp_media(_docs(sf_dir))
    return media.map_batches(
        BmpResizer, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


def media_wav_stats(sf_dir: str) -> "ray.data.Dataset":
    """REAL audio decode through the gate: payloads are canonical
    16-bit mono PCM WAVs (pure-numpy RIFF codec), the actor-pool
    WavDecoder walks the chunk list and emits exact integer stats of
    the DECODED samples; the twin regenerates the closed-form waveform
    ((id·13 + i·7) mod 65536 − 32768) in SQL."""
    from cosmwasm_etl_ray.stages.multimodal import (
        WavDecoder,
        synthesize_wav_media,
    )

    media = synthesize_wav_media(_docs(sf_dir))
    return media.map_batches(
        WavDecoder, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


def media_y4m_frames(sf_dir: str) -> "ray.data.Dataset":
    """REAL video decode + frame sampling through the gate: payloads
    are YUV4MPEG2 streams (the ffmpeg/x264 uncompressed interchange
    format — ASCII header + FRAME markers + planar C420), the
    actor-pool Y4mFrameSampler parses the stream, keeps every 2nd
    frame, and emits exact plane sums of the DECODED pixels; the twin
    regenerates the closed-form planes in SQL."""
    from cosmwasm_etl_ray.stages.multimodal import (
        Y4mFrameSampler,
        synthesize_y4m_media,
    )

    media = synthesize_y4m_media(_docs(sf_dir))
    return media.map_batches(
        Y4mFrameSampler,
        fn_constructor_kwargs={"stride": 2},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )


def media_png_stats(sf_dir: str) -> "ray.data.Dataset":
    """REAL COMPRESSED image decode through the gate: payloads are
    spec-compliant PNGs (CRC-framed chunks, per-row predictive filters,
    stdlib-zlib DEFLATE — stages/multimodal.py encode_png_rgb8), with
    the filter type cycled per row/doc so the corpus exercises every
    unfilter branch (None/Sub/Up/Average/Paeth). The actor-pool
    PngDecoder verifies CRCs, inflates and unfilters, and the DECODED
    per-channel sums hash-check against a DuckDB twin regenerating the
    closed-form pixel field — a bug anywhere in chunk framing, filter
    math, or the inflate round-trip flips the sums."""
    from cosmwasm_etl_ray.stages.multimodal import (
        PngDecoder,
        synthesize_png_media,
    )

    media = synthesize_png_media(_docs(sf_dir))
    return media.map_batches(
        PngDecoder, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


def media_gif_stats(sf_dir: str) -> "ray.data.Dataset":
    """REAL LZW decode through the gate: payloads are spec-compliant
    GIF89a images (stages/multimodal.py encode_gif8 — variable-width
    LSB-first codes, CLEAR/EOI, 12-bit dictionary growth with the
    non-early-change width rule, 255-byte sub-blocks), with the
    dictionary reset point cycled per doc ({4096, 24, 32, 64, 20})
    so the corpus exercises no-reset streams, tight reset loops, and
    the reset_at == 2^width CLEAR boundary. The actor-pool GifDecoder
    LZW-decompresses, maps indices through the color table, and the
    DECODED per-channel sums hash-check against a DuckDB twin
    regenerating the closed-form index field and palette — a bug
    anywhere in bit packing, width sync, reset handling, or framing
    flips the sums."""
    from cosmwasm_etl_ray.stages.multimodal import (
        GifDecoder,
        synthesize_gif_media,
    )

    media = synthesize_gif_media(_docs(sf_dir))
    return media.map_batches(
        GifDecoder, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


def media_jpeg_stats(sf_dir: str) -> "ray.data.Dataset":
    """REAL entropy-coded-DCT decode through the gate: payloads are
    spec-compliant baseline JPEGs (stages/multimodal.py
    encode_jpeg_gray — marker framing, canonical Huffman tables
    carried in DHT, zigzag, DC prediction, byte stuffing, vectorized
    DCT). The corpus is block-constant, which roundtrips the lossy
    codec EXACTLY (only DC coefficients survive and the DC quantizer
    equals the DCT's DC gain), so the actor-pool JpegDecoder's decoded
    pixel sums hash-check against a DuckDB twin regenerating the
    closed-form per-block field — a bug anywhere in Huffman decode,
    DC prediction, dequant, dezigzag, or the IDCT flips the sums."""
    from cosmwasm_etl_ray.stages.multimodal import (
        JpegDecoder,
        synthesize_jpeg_media,
    )

    media = synthesize_jpeg_media(_docs(sf_dir))
    return media.map_batches(
        JpegDecoder, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


def media_avi_frames(sf_dir: str) -> "ray.data.Dataset":
    """REAL compressed-video decode through the gate: payloads are
    MJPEG AVIs (stages/multimodal.py encode_avi_mjpeg — RIFF/LIST
    chunk tree, avih/strh/strf headers, per-frame baseline JPEGs in
    '00dc' chunks with even-byte padding, idx1 index). The actor-pool
    AviFrameSampler walks the container, entropy-decodes every 2nd
    frame only, and the sampled DECODED pixel sums hash-check against
    a DuckDB twin regenerating the closed-form block-constant frames
    — container framing, frame sampling, and the full JPEG decode
    path all sit on the hash."""
    from cosmwasm_etl_ray.stages.multimodal import (
        AviFrameSampler,
        synthesize_avi_media,
    )

    media = synthesize_avi_media(_docs(sf_dir))
    return media.map_batches(
        AviFrameSampler,
        fn_constructor_kwargs={"stride": 2},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )


def media_flac_stats(sf_dir: str) -> "ray.data.Dataset":
    """REAL compressed-audio decode through the gate: payloads are
    FLAC-style streams (stages/multimodal.py encode_flac16 — fLaC
    framing, STREAMINFO with stream MD5, CRC-8/16-protected frames,
    fixed linear predictors with Golomb-Rice residual coding — the
    predictive+unary compression family, lossless). The actor-pool
    FlacDecoder CRC/MD5-verifies and reconstructs, and the DECODED
    sample stats hash-check against a DuckDB twin regenerating the
    closed-form waveform — a bug anywhere in Rice coding, predictor
    reconstruction, or framing flips the stats (or trips a CRC)."""
    from cosmwasm_etl_ray.stages.multimodal import (
        FlacDecoder,
        synthesize_flac_media,
    )

    media = synthesize_flac_media(_docs(sf_dir))
    return media.map_batches(
        FlacDecoder, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


def media_quarantine(sf_dir: str) -> "ray.data.Dataset":
    """Robust decode with a quarantine path through the gate: one bit
    is flipped mid-payload in every 29th FLAC stream
    (stages/multimodal.py corrupt_payloads), and the actor-pool
    RobustMediaDecoder must keep the stream flowing — good rows carry
    decode_ok + the exact decoded-sample sum, corrupt rows carry
    decode_ok=false and a zero stat. FLAC's CRC-8/16 + MD5 layers
    guarantee the flipped bit RAISES rather than mis-decoding, so the
    quarantined set is exactly (doc_id % 29 == 0) and the twin is
    closed-form. This is the reference's skip-don't-abort discipline
    (Code!=0 tx skip) applied to media payloads."""
    from cosmwasm_etl_ray.stages.multimodal import (
        RobustMediaDecoder,
        corrupt_payloads,
        synthesize_flac_media,
    )

    media = corrupt_payloads(synthesize_flac_media(_docs(sf_dir)), every=29)
    return media.map_batches(
        RobustMediaDecoder, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


def media_flv_frames(sf_dir: str) -> "ray.data.Dataset":
    """REAL inter-frame video decode through the gate: payloads are
    FLV Screen Video v1 streams (stages/multimodal.py
    encode_flv_screenvideo — FLV tag chain with verified
    back-pointers, 16x16 block grid, keyframe + changed-blocks-only
    inter frames, per-block zlib BGR). The actor-pool FlvDecoder
    replays the temporal block updates and the summed DECODED pixels
    hash-check against a DuckDB twin computing each block's
    last-refresh frame in closed form — both the changed-block
    detection and the copy-forward path sit on the hash."""
    from cosmwasm_etl_ray.stages.multimodal import (
        FlvDecoder,
        synthesize_flv_media,
    )

    media = synthesize_flv_media(_docs(sf_dir))
    return media.map_batches(
        FlvDecoder, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


def media_transcode(sf_dir: str) -> "ray.data.Dataset":
    """Transcode-at-the-edge through the gate: GIF payloads decode
    (LZW + color table), re-encode as PNG (adaptive filters + DEFLATE)
    in an actor-pool stage, and the PNGs decode again for stats —
    both codecs sit on one hash, end to end lossless. This is the
    ingest-normalization shape a heterogeneous 100 TB media corpus
    needs (many source formats -> one canonical storage format). The
    twin is the media_gif_stats field: transcoding must preserve every
    pixel."""
    from cosmwasm_etl_ray.stages.multimodal import (
        GifToPngTranscoder,
        PngDecoder,
        synthesize_gif_media,
    )

    media = synthesize_gif_media(_docs(sf_dir))
    png = media.map_batches(
        GifToPngTranscoder, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )
    return png.map_batches(
        PngDecoder, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


def media_dispatch(sf_dir: str) -> "ray.data.Dataset":
    """Format-SNIFFING dispatch decode through the gate: the media
    table is heterogeneous (doc_id % 3 selects BMP / PNG / GIF) with
    NO format column — the actor-pool MediaSniffDecoder identifies
    each payload by magic bytes, routes it to the right codec, and
    emits a unified decoded-pixel sum. The twin regenerates each
    format's closed-form field behind a CASE on doc_id % 3 — a wrong
    sniff, wrong route, or wrong decode all flip the hash."""
    from cosmwasm_etl_ray.stages.multimodal import (
        MediaSniffDecoder,
        synthesize_mixed_media,
    )

    media = synthesize_mixed_media(_docs(sf_dir))
    return media.map_batches(
        MediaSniffDecoder, batch_format="pyarrow", batch_size=256, concurrency=(1, 4)
    )


def lsh_neighbors(sf_dir: str) -> "ray.data.Dataset":
    """Raw LSH approximate top-10 (product API)."""
    qdf, db = _split_queries_db(sf_dir)
    return lsh_topk(db, qdf, k=10)


def ivf_neighbors(sf_dir: str) -> "ray.data.Dataset":
    """Raw IVF approximate top-10 (product API)."""
    qdf, db = _split_queries_db(sf_dir)
    return ivf_topk(db, qdf, k=10, n_probe=8)


_EXACT_TOPK_CACHE: dict[str, pd.DataFrame] = {}


def _exact_topk(sf_dir: str) -> pd.DataFrame:
    """Exact top-10, computed once per process — shared by ann_topk's
    oracle duals (both recall queries compare against it)."""
    if sf_dir not in _EXACT_TOPK_CACHE:
        qdf, db = _split_queries_db(sf_dir)
        _EXACT_TOPK_CACHE[sf_dir] = brute_force_topk(db, qdf, k=10).to_pandas()
    return _EXACT_TOPK_CACHE[sf_dir]


def _ann_contract(sf_dir: str, approx: pd.DataFrame, bar: int) -> pd.DataFrame:
    """Per-query recall CONTRACT vs the exact top-k: the approximate
    result must return a full k and overlap the exact top-10 by ≥ bar.
    The oracle twin states the contract (n_returned = 10, all true),
    so a recall or plumbing regression in the deterministic sketch
    flips a row and fails the hash — the ANN analogue of checking an
    inexact operator against an exact oracle."""
    exact = _exact_topk(sf_dir)
    e = exact.groupby("query_id")["neighbor_id"].apply(set)
    a = approx.groupby("query_id")["neighbor_id"].apply(set)
    n_ret = approx.groupby("query_id").size()
    qs = sorted(int(q) for q in e.index)
    return pd.DataFrame(
        {
            "query_id": qs,
            "n_returned": [int(n_ret.get(q, 0)) for q in qs],
            "recall_ok": [len(e[q] & a.get(q, set())) >= bar for q in qs],
        }
    )


def ann_lsh(sf_dir: str) -> pd.DataFrame:
    """LSH ANN recall contract (bar 5/10) — runs the full distributed
    lsh_topk pipeline, then grades it against the exact top-10."""
    return _ann_contract(sf_dir, lsh_neighbors(sf_dir).to_pandas(), bar=5)


def ann_ivf(sf_dir: str) -> pd.DataFrame:
    """IVF ANN recall contract (bar 3/10, n_probe=8)."""
    return _ann_contract(sf_dir, ivf_neighbors(sf_dir).to_pandas(), bar=3)


# Persistent-index twins: the build-once / query-many serving shape
# (hive-partitioned lists or buckets + path-pruned probe reads) under
# the SAME recall contracts. tests/test_sketch_index.py and
# test_textml_ops.py pin indexed == in-memory result-for-result; here
# the driver gate holds the contract end to end.
_INDEX_CACHE: dict[tuple[str, str], str] = {}


def _built_index(sf_dir: str, kind: str) -> str:
    """Build the persistent ANN index once per process per sf dir —
    repeated queries hit the artifact, exactly the product usage."""
    key = (sf_dir, kind)
    if key not in _INDEX_CACHE:
        import tempfile

        from cosmwasm_etl_ray.functions.ann_index import (
            build_ivf_index,
            build_lsh_index,
        )

        _, db = _split_queries_db(sf_dir)
        d = tempfile.mkdtemp(prefix=f"cwel_{kind}_idx_")
        if kind == "ivf":
            build_ivf_index(db, d, n_lists=16, seed=11)
        elif kind == "pq":
            from cosmwasm_etl_ray.functions.ann_index import build_pq_index

            build_pq_index(db, d, m=16, seed=11)
        elif kind == "ivfpq":
            from cosmwasm_etl_ray.functions.ann_index import build_ivfpq_index

            build_ivfpq_index(db, d, n_lists=16, m=16, seed=11)
        else:
            build_lsh_index(db, d, n_planes=4, n_tables=16, seed=23)
        _INDEX_CACHE[key] = d
    return _INDEX_CACHE[key]


def ann_pq(sf_dir: str) -> pd.DataFrame:
    """Recall contract over the PRODUCT-QUANTIZATION index
    (functions/ann_index.build_pq_index / query_pq_index): vectors
    compress to m=16 uint8 codes (32× smaller than the 64-d float64
    embeddings), queries score by asymmetric-distance table gathers
    over the codes ONLY — the serving scan never touches the
    full-precision vectors. Bar 3 under measured deterministic recall
    (min 4/10 at sf0.1, 7/10 at sf0.01; seeded sub-quantizers on the
    deterministic train sample)."""
    from cosmwasm_etl_ray.functions.ann_index import query_pq_index

    qdf, _ = _split_queries_db(sf_dir)
    approx = query_pq_index(_built_index(sf_dir, "pq"), qdf, k=10).to_pandas()
    return _ann_contract(sf_dir, approx, bar=3)


def ann_pq_rerank(sf_dir: str) -> pd.DataFrame:
    """Two-stage retrieval contract (ADC candidates from the PQ codes,
    exact-cosine rerank of just those rows —
    functions/ann_index.query_pq_index_rerank): 50 candidates buy back
    everything the 32× compression gives up — measured deterministic
    recall 10/10 at sf0.01 AND sf0.1; bar 8."""
    from cosmwasm_etl_ray.functions.ann_index import query_pq_index_rerank

    qdf, db = _split_queries_db(sf_dir)
    approx = query_pq_index_rerank(
        _built_index(sf_dir, "pq"), qdf, db, k=10, candidates=50
    ).to_pandas()
    return _ann_contract(sf_dir, approx, bar=8)


def ann_ivfpq(sf_dir: str) -> pd.DataFrame:
    """Recall contract over the IVF+PQ composite
    (functions/ann_index.build_ivfpq_index): probe reads prune to
    n_probe/n_lists of the FILES and every file holds 32×-compressed
    codes — probe IO ≈ (10/16)·(1/32) of a brute full-precision scan.
    Bar 3 under measured deterministic recall (min 4/10 at sf0.1,
    6/10 at sf0.01 with n_probe=10)."""
    from cosmwasm_etl_ray.functions.ann_index import query_ivfpq_index

    qdf, _ = _split_queries_db(sf_dir)
    approx = query_ivfpq_index(
        _built_index(sf_dir, "ivfpq"), qdf, k=10, n_probe=10
    ).to_pandas()
    return _ann_contract(sf_dir, approx, bar=3)


def ann_ivf_indexed(sf_dir: str) -> pd.DataFrame:
    """Recall contract over the PERSISTENT IVF index (same quantizer
    seed as ann_ivf — probe reads prune to n_probe/n_lists of the
    corpus by file path)."""
    from cosmwasm_etl_ray.functions.ann_index import query_ivf_index

    qdf, _ = _split_queries_db(sf_dir)
    approx = query_ivf_index(
        _built_index(sf_dir, "ivf"), qdf, k=10, n_probe=8
    ).to_pandas()
    return _ann_contract(sf_dir, approx, bar=3)


def ann_ivf_appended(sf_dir: str) -> pd.DataFrame:
    """Recall contract over an INCREMENTALLY GROWN IVF index: the base
    generation is built (and its quantizer trained) on only the odd
    half of the corpus, the even half is appended against the frozen
    centroids (functions/ann_index.append_ivf_index — directory-
    granular tmp+rename, sidecar-registered generations), and queries
    must still clear the same bar as the fresh-built index — the
    serving-path guarantee that incremental ingest doesn't silently
    rot recall (measured 7-9/10 at sf0.01, green at sf0.1 too; bar 3)."""
    import pyarrow.compute as pc

    from cosmwasm_etl_ray.functions.ann_index import (
        append_ivf_index,
        build_ivf_index,
        query_ivf_index,
    )

    key = (sf_dir, "ivf_appended")
    if key not in _INDEX_CACHE:
        import tempfile

        qdf, db = _split_queries_db(sf_dir)

        def _half(par):
            def f(t):
                return t.filter(pc.equal(pc.bit_wise_and(t["vec_id"], 1), par))

            return f

        d = tempfile.mkdtemp(prefix="cwel_ivf_app_")
        build_ivf_index(
            db.map_batches(_half(1), batch_format="pyarrow"), d,
            n_lists=16, seed=11,
        )
        append_ivf_index(db.map_batches(_half(0), batch_format="pyarrow"), d)
        _INDEX_CACHE[key] = d
    qdf, _ = _split_queries_db(sf_dir)
    approx = query_ivf_index(_INDEX_CACHE[key], qdf, k=10, n_probe=8).to_pandas()
    return _ann_contract(sf_dir, approx, bar=3)


def ann_lsh_indexed(sf_dir: str) -> pd.DataFrame:
    """Recall contract over the PERSISTENT LSH tables (same planes as
    ann_lsh; candidates resolve via a distributed hash join against
    the primary vector store)."""
    from cosmwasm_etl_ray.functions.ann_index import query_lsh_index

    qdf, _ = _split_queries_db(sf_dir)
    approx = query_lsh_index(_built_index(sf_dir, "lsh"), qdf, k=10).to_pandas()
    return _ann_contract(sf_dir, approx, bar=5)


def embed_score(sf_dir: str) -> "ray.data.Dataset":
    """Batched model inference over the embedding column: the
    int-quantized linear classifier from functions/inference.py —
    weights once per actor, one exact-integer matmul per batch,
    deterministic argmax. The inference plumbing a reward/quality
    scorer would use, with a SQL-restatable model body."""
    from cosmwasm_etl_ray.functions.inference import score_embeddings

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return score_embeddings(ds)


def repetition_stats(sf_dir: str) -> "ray.data.Dataset":
    """Gopher-style repetition signals (top-2-gram mass, duplicated
    3-gram occurrences) as exact per-doc integer counts — the quality
    signals a repetition filter thresholds. Pure streaming map, one
    explode per n."""
    from cosmwasm_etl_ray.functions.text import repetition_stats_batch

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(repetition_stats_batch, batch_format="pandas")


QUERIES = {
    "text_stats": text_stats,
    "embed_score": embed_score,
    "repetition_stats": repetition_stats,
    "ann_filtered": ann_filtered,
    "dup_spans": dup_spans_docs,
    "label_centroids": label_centroids,
    "semantic_neardup": semantic_neardup,
    "quality_scores": quality_scores,
    "doc_fingerprints": doc_fingerprints,
    "dedup_exact_prefix": dedup_exact_prefix,
    "embedding_neardup": embedding_neardup,
    "ann_topk": ann_topk,
    "lang_id": lang_id,
    "text_features": text_features,
    "dedup_minhash": dedup_minhash,
    "dedup_minhash_indexed": dedup_minhash_indexed,
    "dedup_increment_probe": dedup_increment_probe,
    "dedup_simhash": dedup_simhash,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_clusters": dedup_clusters,
    "ann_lsh": ann_lsh,
    "ann_ivf": ann_ivf,
    "ann_pq": ann_pq,
    "ann_pq_rerank": ann_pq_rerank,
    "ann_ivfpq": ann_ivfpq,
    "ann_lsh_indexed": ann_lsh_indexed,
    "ann_ivf_indexed": ann_ivf_indexed,
    "ann_ivf_appended": ann_ivf_appended,
    "media_meta": media_meta,
    "media_resize": media_resize,
    "media_bmp_stats": media_bmp_stats,
    "media_png_stats": media_png_stats,
    "media_gif_stats": media_gif_stats,
    "media_jpeg_stats": media_jpeg_stats,
    "media_avi_frames": media_avi_frames,
    "media_flac_stats": media_flac_stats,
    "media_quarantine": media_quarantine,
    "media_flv_frames": media_flv_frames,
    "media_transcode": media_transcode,
    "media_dispatch": media_dispatch,
    "media_bmp_resize": media_bmp_resize,
    "media_wav_stats": media_wav_stats,
    "media_y4m_frames": media_y4m_frames,
}

from cosmwasm_etl_ray.functions.text import FP_BASE, FP_MOD, FP_WINDOW, LangId

_POWS = "[" + ", ".join(
    str(pow(FP_BASE, FP_WINDOW - 1 - k, FP_MOD)) for k in range(FP_WINDOW)
) + "]"


def _lang_case_sql() -> str:
    scores = {
        lang: " + ".join(
            f"CASE WHEN position('{g}' IN text) > 0 THEN 1 ELSE 0 END"
            for g in prof
        )
        for lang, prof in LangId.PROFILES.items()
    }
    inner = ", ".join(f"({expr}) AS s_{lang}" for lang, expr in scores.items())
    # first-max-wins in profile order, mirroring the engine's strict->
    return f"""
SELECT doc_id,
       CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
            WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
            WHEN s_de >= s_fr THEN 'de'
            ELSE 'fr' END AS lang_pred
FROM (SELECT doc_id, {inner} FROM documents)
"""

ORACLE_SQL = {
    # the identical model unrolled in SQL: the same closed-form integer
    # weights, the same floor(e * 1000) quantization (via DOUBLE — both
    # sides promote float32 -> float64 before the multiply, so the
    # floor is bit-identical), exact BIGINT logits, ties to smallest c
    "embed_score": """
WITH w AS (
    SELECT c.c AS c, d.d AS d,
           (c.c * 1000003 + d.d * 7919 + 12345) % 2000001 - 1000000 AS w
    FROM (SELECT unnest(generate_series(0, 9)) AS c) c,
         (SELECT unnest(generate_series(0, 63)) AS d) d
),
q AS (
    SELECT vec_id, d.d AS d,
           CAST(floor(CAST(embedding[d.d + 1] AS DOUBLE) * 1000) AS BIGINT) AS q
    FROM embeddings, (SELECT unnest(generate_series(0, 63)) AS d) d
),
logits AS (
    SELECT q.vec_id, w.c, CAST(sum(w.w * q.q) AS BIGINT) AS logit
    FROM q JOIN w USING (d) GROUP BY q.vec_id, w.c
)
SELECT vec_id, CAST(c AS BIGINT) AS pred, logit AS top_logit
FROM (
    SELECT vec_id, c, logit,
           row_number() OVER (
               PARTITION BY vec_id ORDER BY logit DESC, c ASC
           ) AS rn
    FROM logits
)
WHERE rn = 1
""",
    "repetition_stats": """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g2 AS (
    SELECT doc_id, t[i] || ' ' || t[i+1] AS gram
    FROM tok, LATERAL (
        SELECT unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
    ) s
),
g3 AS (
    SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
    FROM tok, LATERAL (
        SELECT unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
    ) s
),
a2 AS (
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_2grams,
           CAST(max(c) AS BIGINT) AS top2gram_n
    FROM (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY doc_id, gram)
    GROUP BY doc_id
),
a3 AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_3grams,
           CAST(count(*) - count(DISTINCT gram) AS BIGINT) AS dup3gram_n
    FROM g3 GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a2.n_2grams, 0) AS BIGINT) AS n_2grams,
       CAST(COALESCE(a2.top2gram_n, 0) AS BIGINT) AS top2gram_n,
       CAST(COALESCE(a3.n_3grams, 0) AS BIGINT) AS n_3grams,
       CAST(COALESCE(a3.dup3gram_n, 0) AS BIGINT) AS dup3gram_n
FROM documents d LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)
""",
    "text_stats": """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
FROM documents
""",
    "quality_scores": """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
       CAST(len(list_filter(string_split(text, ' '),
                x -> list_contains(['the','a','of','to','and'], x))) AS DOUBLE)
           / len(string_split(text, ' ')) AS stop_ratio
FROM documents
""",
    "doc_fingerprints": """
SELECT doc_id, md5(text) AS fp_md5 FROM documents
""",
    "dedup_exact_prefix": """
SELECT substr(text, 1, 20) AS key20,
       CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS group_size
FROM documents GROUP BY substr(text, 1, 20)
""",
    # quantized cosine (floor(1e6·e) components, exact-double dot and
    # norms, one rounded divide) — bit-identical to the engine's numpy
    # computation, so the band floor can never straddle an ulp
    "embedding_neardup": """
WITH qe AS (
    SELECT vec_id,
           list_transform(embedding,
               e -> floor(CAST(e AS DOUBLE) * 1000000)) AS q
    FROM embeddings
), qn AS (
    SELECT vec_id, q, sqrt(list_inner_product(q, q)) AS nrm FROM qe
), pairs AS (
    SELECT list_inner_product(a.q, b.q) / (a.nrm * b.nrm) AS qcos
    FROM qn a JOIN qn b ON a.vec_id < b.vec_id
)
SELECT CAST(floor(qcos * 10) AS BIGINT) AS cband,
       CAST(count(*) AS BIGINT) AS n_pairs,
       true AS recall_ok
FROM pairs WHERE qcos >= 0.45
GROUP BY 1
""",
    "ann_topk": """
SELECT query_id, neighbor_id, rank FROM (
    SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
           row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, d.embedding) DESC,
                        d.vec_id
           ) AS rank
    FROM embeddings q JOIN embeddings d ON d.vec_id >= 5
    WHERE q.vec_id < 5
) WHERE rank <= 10
""",
    # the same floor(e*1000) quantization as embed_score, summed in
    # exact integers; // is DuckDB's truncating integer division, which
    # the engine mirrors sign-split
    "label_centroids": """
WITH q AS (
    SELECT label, d.d AS dim,
           CAST(floor(CAST(embedding[d.d + 1] AS DOUBLE) * 1000) AS BIGINT) AS qv
    FROM embeddings, (SELECT unnest(generate_series(0, 63)) AS d) d
)
SELECT CAST(label AS BIGINT) AS label, dim,
       CAST(sum(qv) // count(*) AS BIGINT) AS centroid_q
FROM q GROUP BY label, dim
""",
    "semantic_neardup": f"""
SELECT CAST(a.label AS BIGINT) AS label,
       a.vec_id AS a, b.vec_id AS b
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {SEM_BAR}
""",
    "dup_spans": """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
win AS (
    SELECT doc_id, array_to_string(list_slice(t, i, i + 15), ' ') AS w
    FROM tok, LATERAL (
        SELECT unnest(generate_series(1, greatest(len(t) - 15, 0))) AS i
    ) s
),
d AS (
    SELECT w FROM (
        SELECT w, count(DISTINCT doc_id) AS nd FROM win GROUP BY w
    ) WHERE nd >= 2
)
SELECT t.doc_id,
       CAST(greatest(len(t.t) - 15, 0) AS BIGINT) AS n_windows,
       CAST(COALESCE(h.n_dup, 0) AS BIGINT) AS n_dup_windows
FROM tok t LEFT JOIN (
    SELECT doc_id, count(*) AS n_dup FROM win
    WHERE w IN (SELECT w FROM d) GROUP BY doc_id
) h USING (doc_id)
""",
    "ann_filtered": """
SELECT query_id, neighbor_id, rank FROM (
    SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
           row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, d.embedding) DESC,
                        d.vec_id
           ) AS rank
    FROM embeddings q JOIN embeddings d ON d.vec_id >= 5 AND d.label < 5
    WHERE q.vec_id < 5
) WHERE rank <= 10
""",
    "lang_id": _lang_case_sql(),
    # Karp-Rabin min-window-hash: identical polynomial mod the same
    # 31-bit prime, evaluated over codepoints in plain BIGINT SQL
    "text_features": f"""
SELECT doc_id,
       CAST(CASE WHEN length(text) = 0 THEN 0
            WHEN length(text) <= {FP_WINDOW} THEN
                list_sum(list_transform(range(1, length(text) + 1),
                    i -> CAST(unicode(text[i]) AS BIGINT) * ({_POWS})[{FP_WINDOW} - length(text) + i]
                )) % {FP_MOD}
            ELSE
                list_min(list_transform(range(1, length(text) - {FP_WINDOW - 2}),
                    i -> list_sum(list_transform(range(0, {FP_WINDOW}),
                        k -> CAST(unicode(text[i + k]) AS BIGINT) * ({_POWS})[k + 1]
                    )) % {FP_MOD}
                ))
       END AS BIGINT) AS rolling_fp
FROM documents
""",
    # recall contracts: every query must return a full k and overlap
    # the exact top-10 by the stated bar — a regression in the
    # deterministic sketches flips a row and fails the hash
    "ann_lsh": """
SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_returned, true AS recall_ok
FROM embeddings WHERE vec_id < 5
""",
    "ann_ivf": """
SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_returned, true AS recall_ok
FROM embeddings WHERE vec_id < 5
""",
    "ann_pq": """
SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_returned, true AS recall_ok
FROM embeddings WHERE vec_id < 5
""",
    "ann_pq_rerank": """
SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_returned, true AS recall_ok
FROM embeddings WHERE vec_id < 5
""",
    "ann_ivfpq": """
SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_returned, true AS recall_ok
FROM embeddings WHERE vec_id < 5
""",
    "ann_lsh_indexed": """
SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_returned, true AS recall_ok
FROM embeddings WHERE vec_id < 5
""",
    "ann_ivf_indexed": """
SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_returned, true AS recall_ok
FROM embeddings WHERE vec_id < 5
""",
    "ann_ivf_appended": """
SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_returned, true AS recall_ok
FROM embeddings WHERE vec_id < 5
""",
    # the media synthesis is deterministic from documents: payload =
    # utf-8(text) ×3, kind = doc_id%3, n_frames = doc_id%24+1 sampled
    # every 8th frame — all SQL-derivable
    "media_meta": """
SELECT doc_id AS media_id,
       ['image', 'audio', 'video'][doc_id % 3 + 1] AS kind,
       sha256(repeat(text, 3)) AS payload_sha256,
       CAST(3 * octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST((doc_id % 24 + 1 + 7) // 8 AS BIGINT) AS n_sampled_frames
FROM documents
""",
    # REAL BMP decode twin: regenerate the deterministic pixel field
    # ((id*7 + y*5 + x*3 + c*11) % 256) with cross-joined ranges and
    # sum per channel — equals the engine's sums over DECODED pixels
    # iff encode and decode both honor the BMP spec end to end
    "media_bmp_stats": """
SELECT d.doc_id AS media_id,
       CAST(8 + d.doc_id % 9 AS BIGINT) AS width,
       CAST(8 + d.doc_id % 7 AS BIGINT) AS height,
       CAST(sum((d.doc_id * 7 + t.y * 5 + s.x * 3) % 256) AS BIGINT) AS sum_r,
       CAST(sum((d.doc_id * 7 + t.y * 5 + s.x * 3 + 11) % 256) AS BIGINT) AS sum_g,
       CAST(sum((d.doc_id * 7 + t.y * 5 + s.x * 3 + 22) % 256) AS BIGINT) AS sum_b
FROM documents d
CROSS JOIN range(14) t(y)
CROSS JOIN range(16) s(x)
WHERE t.y < 8 + d.doc_id % 7 AND s.x < 8 + d.doc_id % 9
GROUP BY d.doc_id
""",
    # REAL PNG decode twin: regenerate the closed-form pixel field
    # ((id·5 + y·7 + x·11 + c·13) mod 256) and aggregate — equals the
    # engine's sums over pixels decoded back through CRC-checked
    # chunks, inflate, and all five unfilter branches
    "media_png_stats": """
SELECT d.doc_id AS media_id,
       CAST(9 + d.doc_id % 8 AS BIGINT) AS width,
       CAST(9 + d.doc_id % 6 AS BIGINT) AS height,
       CAST(sum((d.doc_id * 5 + t.y * 7 + s.x * 11) % 256) AS BIGINT) AS sum_r,
       CAST(sum((d.doc_id * 5 + t.y * 7 + s.x * 11 + 13) % 256) AS BIGINT) AS sum_g,
       CAST(sum((d.doc_id * 5 + t.y * 7 + s.x * 11 + 26) % 256) AS BIGINT) AS sum_b
FROM documents d
CROSS JOIN range(15) t(y)
CROSS JOIN range(17) s(x)
WHERE t.y < 9 + d.doc_id % 6 AND s.x < 9 + d.doc_id % 8
GROUP BY d.doc_id
""",
    # REAL GIF/LZW decode twin: regenerate the closed-form index field
    # ((id*3 + y*5 + x*7) mod 16) and map it through the fixed palette
    # formula ((i*37+11, i*59+23, i*83+47) mod 256) — equals the
    # engine's sums over pixels decoded back through sub-block
    # reassembly and the variable-width LZW stream (resets included)
    "media_gif_stats": """
SELECT d.doc_id AS media_id,
       CAST(10 + d.doc_id % 5 AS BIGINT) AS width,
       CAST(10 + d.doc_id % 7 AS BIGINT) AS height,
       CAST(sum(((d.doc_id * 3 + t.y * 5 + s.x * 7) % 16 * 37 + 11) % 256) AS BIGINT) AS sum_r,
       CAST(sum(((d.doc_id * 3 + t.y * 5 + s.x * 7) % 16 * 59 + 23) % 256) AS BIGINT) AS sum_g,
       CAST(sum(((d.doc_id * 3 + t.y * 5 + s.x * 7) % 16 * 83 + 47) % 256) AS BIGINT) AS sum_b
FROM documents d
CROSS JOIN range(16) t(y)
CROSS JOIN range(14) s(x)
WHERE t.y < 10 + d.doc_id % 7 AND s.x < 10 + d.doc_id % 5
GROUP BY d.doc_id
""",
    # REAL JPEG decode twin: the gate corpus is constant per 8x8 block
    # ((id*7 + (y//8)*13 + (x//8)*29) mod 256), which survives the
    # lossy DCT path exactly — regenerate the field and sum
    "media_jpeg_stats": """
SELECT d.doc_id AS media_id,
       CAST(9 + d.doc_id % 7 AS BIGINT) AS width,
       CAST(11 + d.doc_id % 6 AS BIGINT) AS height,
       CAST(sum((d.doc_id * 7 + (t.y // 8) * 13 + (s.x // 8) * 29) % 256) AS BIGINT) AS sum_gray
FROM documents d
CROSS JOIN range(16) t(y)
CROSS JOIN range(15) s(x)
WHERE t.y < 11 + d.doc_id % 6 AND s.x < 9 + d.doc_id % 7
GROUP BY d.doc_id
""",
    # REAL MJPEG-AVI decode twin: every-2nd-frame sample over the
    # regenerated block-constant frames (exact through the per-frame
    # JPEG; n_frames = 3 + id%4, sampled = even f < n)
    "media_avi_frames": """
WITH dims AS (
    SELECT doc_id, 11 + doc_id % 6 AS h, 9 + doc_id % 7 AS w,
           3 + doc_id % 4 AS n FROM documents
)
SELECT d.doc_id AS media_id,
       CAST(d.n AS BIGINT) AS n_frames,
       CAST((d.n + 1) // 2 AS BIGINT) AS n_sampled,
       CAST(sum((d.doc_id * 5 + f.f * 17 + (t.y // 8) * 13
                 + (s.x // 8) * 29) % 256) AS BIGINT) AS sum_gray
FROM dims d
CROSS JOIN range(6) f(f)
CROSS JOIN range(16) t(y)
CROSS JOIN range(15) s(x)
WHERE f.f < d.n AND f.f % 2 = 0 AND t.y < d.h AND s.x < d.w
GROUP BY d.doc_id, d.n
""",
    # Transcode twin: GIF -> PNG -> decode must preserve every pixel,
    # so the expectation is exactly the media_gif_stats field
    "media_transcode": """
SELECT d.doc_id AS media_id,
       CAST(10 + d.doc_id % 5 AS BIGINT) AS width,
       CAST(10 + d.doc_id % 7 AS BIGINT) AS height,
       CAST(sum(((d.doc_id * 3 + t.y * 5 + s.x * 7) % 16 * 37 + 11) % 256) AS BIGINT) AS sum_r,
       CAST(sum(((d.doc_id * 3 + t.y * 5 + s.x * 7) % 16 * 59 + 23) % 256) AS BIGINT) AS sum_g,
       CAST(sum(((d.doc_id * 3 + t.y * 5 + s.x * 7) % 16 * 83 + 47) % 256) AS BIGINT) AS sum_b
FROM documents d
CROSS JOIN range(16) t(y)
CROSS JOIN range(14) s(x)
WHERE t.y < 10 + d.doc_id % 7 AND s.x < 10 + d.doc_id % 5
GROUP BY d.doc_id
""",
    # Dispatch twin: the mixed corpus is doc_id % 3 -> BMP / PNG / GIF,
    # each regenerated from its own closed-form field
    "media_dispatch": """
WITH base AS (SELECT doc_id, doc_id % 3 AS m FROM documents),
bmp AS (
    SELECT b.doc_id, 'bmp' AS kind,
           CAST(sum((b.doc_id * 7 + y.y * 5 + x.x * 3 + c.c * 11) % 256) AS BIGINT) AS sum_px
    FROM base b
    CROSS JOIN range(15) y(y) CROSS JOIN range(17) x(x) CROSS JOIN range(3) c(c)
    WHERE b.m = 0 AND y.y < 8 + b.doc_id % 7 AND x.x < 8 + b.doc_id % 9
    GROUP BY b.doc_id
),
png AS (
    SELECT b.doc_id, 'png' AS kind,
           CAST(sum((b.doc_id * 5 + y.y * 7 + x.x * 11 + c.c * 13) % 256) AS BIGINT) AS sum_px
    FROM base b
    CROSS JOIN range(15) y(y) CROSS JOIN range(17) x(x) CROSS JOIN range(3) c(c)
    WHERE b.m = 1 AND y.y < 9 + b.doc_id % 6 AND x.x < 9 + b.doc_id % 8
    GROUP BY b.doc_id
),
gif AS (
    SELECT b.doc_id, 'gif' AS kind,
           CAST(sum(((b.doc_id * 3 + y.y * 5 + x.x * 7) % 16 * 37 + 11) % 256
                    + ((b.doc_id * 3 + y.y * 5 + x.x * 7) % 16 * 59 + 23) % 256
                    + ((b.doc_id * 3 + y.y * 5 + x.x * 7) % 16 * 83 + 47) % 256) AS BIGINT) AS sum_px
    FROM base b
    CROSS JOIN range(16) y(y) CROSS JOIN range(14) x(x)
    WHERE b.m = 2 AND y.y < 10 + b.doc_id % 7 AND x.x < 10 + b.doc_id % 5
    GROUP BY b.doc_id
)
SELECT doc_id AS media_id, kind, sum_px FROM bmp
UNION ALL SELECT doc_id AS media_id, kind, sum_px FROM png
UNION ALL SELECT doc_id AS media_id, kind, sum_px FROM gif
""",
    # 2-D nearest-neighbor resize twin: same (ty*h)//16, (tx*w)//16
    # source-index math over the regenerated pixels (all non-negative,
    # so DuckDB's truncating // equals numpy's flooring //)
    "media_bmp_resize": """
WITH dims AS (
    SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents
)
SELECT d.doc_id AS media_id,
       CAST(sum((d.doc_id * 7 + ((t.y * d.h) // 16) * 5
                 + ((s.x * d.w) // 16) * 3) % 256) AS BIGINT) AS sum_r,
       CAST(sum((d.doc_id * 7 + ((t.y * d.h) // 16) * 5
                 + ((s.x * d.w) // 16) * 3 + 11) % 256) AS BIGINT) AS sum_g,
       CAST(sum((d.doc_id * 7 + ((t.y * d.h) // 16) * 5
                 + ((s.x * d.w) // 16) * 3 + 22) % 256) AS BIGINT) AS sum_b
FROM dims d
CROSS JOIN range(16) t(y)
CROSS JOIN range(16) s(x)
GROUP BY d.doc_id
""",
    # REAL WAV decode twin: regenerate the closed-form waveform
    # ((id*13 + i*7) % 65536 - 32768 over n = 64 + id%97 samples) and
    # aggregate — equals the engine's stats over DECODED samples iff
    # the RIFF encode and chunk-walking decode are both spec-correct
    "media_wav_stats": """
SELECT d.doc_id AS media_id,
       CAST(64 + d.doc_id % 97 AS BIGINT) AS n_samples,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(sum((d.doc_id * 13 + t.i * 7) % 65536 - 32768) AS BIGINT) AS sum_amp,
       CAST(sum(abs((d.doc_id * 13 + t.i * 7) % 65536 - 32768)) AS BIGINT)
           AS sum_abs_amp,
       CAST(min((d.doc_id * 13 + t.i * 7) % 65536 - 32768) AS BIGINT) AS min_amp,
       CAST(max((d.doc_id * 13 + t.i * 7) % 65536 - 32768) AS BIGINT) AS max_amp
FROM documents d
CROSS JOIN range(161) t(i)
WHERE t.i < 64 + d.doc_id % 97
GROUP BY d.doc_id
""",
    # REAL FLAC decode twin: regenerate the closed-form waveform
    # ((id*17 + i*11) % 65536 - 32768 over n = 96 + id%113 samples) —
    # equals the engine's stats over samples decoded back through
    # Rice residuals + fixed predictors iff the whole codec is exact
    "media_flac_stats": """
SELECT d.doc_id AS media_id,
       CAST(96 + d.doc_id % 113 AS BIGINT) AS n_samples,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(sum((d.doc_id * 17 + t.i * 11) % 65536 - 32768) AS BIGINT) AS sum_amp,
       CAST(sum(abs((d.doc_id * 17 + t.i * 11) % 65536 - 32768)) AS BIGINT)
           AS sum_abs_amp,
       CAST(min((d.doc_id * 17 + t.i * 11) % 65536 - 32768) AS BIGINT) AS min_amp,
       CAST(max((d.doc_id * 17 + t.i * 11) % 65536 - 32768) AS BIGINT) AS max_amp
FROM documents d
CROSS JOIN range(209) t(i)
WHERE t.i < 96 + d.doc_id % 113
GROUP BY d.doc_id
""",
    # Robust-decode quarantine twin: the fault set is exactly
    # doc_id % 29 == 0 (one flipped bit, guaranteed to trip FLAC's
    # CRC/MD5); good rows reproduce the closed-form waveform sum
    "media_quarantine": """
SELECT d.doc_id AS media_id,
       d.doc_id % 29 <> 0 AS decode_ok,
       CASE WHEN d.doc_id % 29 <> 0 THEN
           CAST((SELECT sum((d.doc_id * 17 + t.i * 11) % 65536 - 32768)
                 FROM range(209) t(i)
                 WHERE t.i < 96 + d.doc_id % 113) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS sum_amp
FROM documents d
""",
    # REAL inter-frame (FLV Screen Video) twin: each 16x16 block's
    # content is field(g) where g = max(0, f - ((y//16 + x//16 + f) % 2))
    # is its last refresh frame — temporal copy-forward in closed form
    "media_flv_frames": """
WITH dims AS (
    SELECT doc_id, 12 + doc_id % 8 AS h, 12 + doc_id % 11 AS w,
           2 + doc_id % 4 AS n FROM documents
), px AS (
    SELECT d.doc_id, d.n,
           GREATEST(0, f.f - ((t.y // 16 + s.x // 16 + f.f) % 2)) AS g,
           t.y, s.x
    FROM dims d
    CROSS JOIN range(5) f(f)
    CROSS JOIN range(19) t(y)
    CROSS JOIN range(22) s(x)
    WHERE f.f < d.n AND t.y < d.h AND s.x < d.w
)
SELECT doc_id AS media_id,
       CAST(n AS BIGINT) AS n_frames,
       CAST(sum((doc_id * 7 + g * 9 + y * 5 + x * 3) % 256) AS BIGINT) AS sum_r,
       CAST(sum((doc_id * 7 + g * 9 + y * 5 + x * 3 + 11) % 256) AS BIGINT) AS sum_g,
       CAST(sum((doc_id * 7 + g * 9 + y * 5 + x * 3 + 22) % 256) AS BIGINT) AS sum_b
FROM px GROUP BY doc_id, n
""",
    # REAL Y4M decode twin: regenerate the closed-form planes
    # (Y = (id*3 + f*17 + y*5 + x*7) % 256 on the full grid, U/V on the
    # quarter-res C420 grid) for every 2nd frame and sum — equals the
    # engine's sums over frames DECODED from the RIFF-style stream
    "media_y4m_frames": """
WITH dims AS (
    SELECT doc_id, 8 + 2 * (doc_id % 5) AS w, 8 + 2 * (doc_id % 4) AS h,
           2 + doc_id % 5 AS n
    FROM documents
), sampled AS (
    SELECT d.doc_id, d.w, d.h, t.f
    FROM dims d CROSS JOIN range(7) t(f)
    WHERE t.f < d.n AND t.f % 2 = 0
), ysum AS (
    SELECT s.doc_id, s.f,
           sum((s.doc_id * 3 + s.f * 17 + yy.y * 5 + xx.x * 7) % 256) AS sum_y
    FROM sampled s CROSS JOIN range(14) yy(y) CROSS JOIN range(16) xx(x)
    WHERE yy.y < s.h AND xx.x < s.w
    GROUP BY s.doc_id, s.f
), csum AS (
    SELECT s.doc_id, s.f,
           sum((s.doc_id + s.f * 29 + cy.y * 3 + cx.x) % 256) AS sum_u,
           sum((s.doc_id + s.f * 29 + cy.y * 3 + cx.x + 64) % 256) AS sum_v
    FROM sampled s CROSS JOIN range(7) cy(y) CROSS JOIN range(8) cx(x)
    WHERE cy.y < s.h // 2 AND cx.x < s.w // 2
    GROUP BY s.doc_id, s.f
)
SELECT y.doc_id AS media_id,
       CAST(y.f AS BIGINT) AS frame_index,
       CAST(y.sum_y AS BIGINT) AS sum_y,
       CAST(c.sum_u AS BIGINT) AS sum_u,
       CAST(c.sum_v AS BIGINT) AS sum_v
FROM ysum y JOIN csum c ON y.doc_id = c.doc_id AND y.f = c.f
""",
    # nearest-neighbor byte subsample: out[i] = payload[(i*n)//256]
    # (ASCII corpus: chars == bytes, the same assumption media_meta
    # already leans on for sha256 over the repeated text)
    "media_resize": """
SELECT media_id,
       CAST(length(r) AS BIGINT) AS resized_len,
       sha256(r) AS resized_sha256
FROM (
    SELECT doc_id AS media_id,
           array_to_string(list_transform(range(0, 256),
               i -> substring(p, CAST(i * n // 256 AS BIGINT) + 1, 1)), '') AS r
    FROM (SELECT doc_id, repeat(text, 3) AS p,
                 length(repeat(text, 3)) AS n
          FROM documents)
)
""",
}

# enumerated planted candidates (d, d+1e6), exact 3-gram Jaccard — the
# SQL rebuilds the perturbed corpus with the same every-13th-word drop
# and the same n-gram/set math. Shared by dedup_ngram_jaccard (raw
# pair check) and the three banded recall contracts.
_NGRAM_PAIRS_CTES = """
WITH g AS (
    SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
p AS (
    SELECT doc_id, list_filter(ws, (w, i) -> (i - 1) % 13 <> 5) AS ws FROM g
),
grams AS (
    SELECT doc_id,
           CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                ELSE list_distinct(list_transform(range(1, len(ws) - 1),
                     i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) END AS gs
    FROM g
),
pgrams AS (
    SELECT doc_id,
           CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                ELSE list_distinct(list_transform(range(1, len(ws) - 1),
                     i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) END AS gs
    FROM p
),
pairs AS (
    SELECT a.doc_id AS doc_a,
           CAST(a.doc_id + 1000000 AS BIGINT) AS doc_b,
           CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
               / (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs))) AS jaccard
    FROM grams a JOIN pgrams b ON b.doc_id = a.doc_id
)
"""

ORACLE_SQL["dedup_ngram_jaccard"] = (
    _NGRAM_PAIRS_CTES + "SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.3"
)

# banded recall contract: the band structure (jband, n_pairs) is
# hash-checked exactly against the engine's distributed exact-Jaccard
# run; recall_ok = true states the contract the deterministic sketch
# must meet per band (bars in _RECALL_BARS, set under measured recall)
_BANDED_RECALL_SQL = _NGRAM_PAIRS_CTES + """
SELECT CAST(floor(jaccard * 10) AS BIGINT) AS jband,
       CAST(count(*) AS BIGINT) AS n_pairs,
       true AS recall_ok
FROM pairs WHERE jaccard >= 0.5
GROUP BY 1
"""

ORACLE_SQL["dedup_minhash"] = _BANDED_RECALL_SQL
ORACLE_SQL["dedup_minhash_indexed"] = _BANDED_RECALL_SQL
ORACLE_SQL["dedup_increment_probe"] = _BANDED_RECALL_SQL
ORACLE_SQL["dedup_simhash"] = _BANDED_RECALL_SQL
ORACLE_SQL["dedup_clusters"] = _BANDED_RECALL_SQL
