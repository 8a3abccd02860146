"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference's dedup surface is exact-with-multiplicity anti-joins and
ON-CONFLICT upserts (SURVEY §2.7); a training-data engine needs the
near-dup family too. All operators follow the sketch pattern from the
Ray guide: compute sketches per batch (actor pool — permutation tables
built once per actor), explode to (bucket, doc) rows, groupby(bucket)
for candidates, verify, emit pairs.

Scale notes (documented partitioning assumptions):
- the LSH groupby shuffles one row per (doc, band) — bands × docs rows
  of a few bytes, not the documents themselves;
- candidate verification joins pair ids back to texts; here the corpus
  is broadcast (small); at 100 TB replace with two hash_joins of the
  pair list against the documents table on doc_id;
- bucket groups are capped (``max_bucket``) so a degenerate bucket
  (e.g. empty-string docs) cannot produce O(n²) pairs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_M61 = np.uint64((1 << 61) - 1)


def _hash_tokens(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hashes of token strings (md5-based, seedless)."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
            for t in tokens
        ),
        dtype=np.uint64,
        count=len(tokens),
    )


def word_ngrams(text: str, n: int = 3) -> list[str]:
    ws = text.split()
    if len(ws) < n:
        return [" ".join(ws)] if ws else []
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


class MinHasher:
    """Actor-pool stage: doc → (band_id, band_hash) rows.

    num_perm permutations a*h+b mod 2^61-1 with a fixed seed; bands of
    rows_per_band rows each. Emits ``bands`` rows per doc.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, ngram: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _M61, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _M61, size=num_perm, dtype=np.uint64)
        self.bands = bands
        self.rpb = num_perm // bands
        self.ngram = ngram

    def signature(self, text: str) -> np.ndarray:
        h = _hash_tokens(word_ngrams(text, self.ngram))
        if len(h) == 0:
            return np.zeros(len(self.a), dtype=np.uint64)
        # (perm, shingle) min — vectorized
        vals = (h[None, :] * self.a[:, None] + self.b[:, None]) % _M61
        return vals.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_band, out_hash = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sig = self.signature(text)
            for b in range(self.bands):
                band = sig[b * self.rpb : (b + 1) * self.rpb]
                bh = hashlib.md5(band.tobytes()).hexdigest()[:16]
                out_doc.append(doc_id)
                out_band.append(b)
                out_hash.append(bh)
        return pd.DataFrame(
            {"doc_id": out_doc, "band_id": out_band, "band_hash": out_hash}
        )


def candidate_pairs_from_buckets(
    bucketed: "ray.data.Dataset", max_bucket: int = 64
) -> "ray.data.Dataset":
    """groupby (band_id, band_hash) → all-pairs within bucket (capped),
    then distinct pairs via a second tiny groupby."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())[:max_bucket]
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        a, b = np.triu_indices(len(ids), 1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    cands = bucketed.groupby(["band_id", "band_hash"]).map_groups(
        pairs, batch_format="pandas"
    )

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cands.groupby(["doc_a", "doc_b"]).map_groups(first, batch_format="pandas")


class JaccardVerifier:
    """Verify candidate pairs against exact n-gram Jaccard. The corpus
    (doc_id → text) is broadcast once per actor via ray.put."""

    def __init__(self, corpus_ref, ngram: int = 3, threshold: float = 0.5):
        self.corpus = ray.get(corpus_ref)
        self.ngram = ngram
        self.threshold = threshold

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        jac = []
        for a, b in zip(df["doc_a"], df["doc_b"]):
            sa = set(word_ngrams(self.corpus.get(a, ""), self.ngram))
            sb = set(word_ngrams(self.corpus.get(b, ""), self.ngram))
            denom = len(sa | sb)
            jac.append(len(sa & sb) / denom if denom else 0.0)
        out = df.assign(jaccard=jac)
        return out[out["jaccard"] >= self.threshold]


def minhash_dedup_pairs(
    docs: "ray.data.Dataset",
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
) -> "ray.data.Dataset":
    """Full MinHash-LSH near-dup pipeline → verified pairs
    (doc_a, doc_b, jaccard)."""
    bucketed = docs.map_batches(
        MinHasher(num_perm=num_perm, bands=bands, ngram=ngram),
        batch_format="pandas",
        batch_size=1024,
    )
    cands = candidate_pairs_from_buckets(bucketed)
    corpus = {r["doc_id"]: r["text"] for r in docs.iter_rows()}
    ref = ray.put(corpus)

    class Verify(JaccardVerifier):
        def __init__(self):
            super().__init__(ref, ngram=ngram, threshold=threshold)

    return cands.map_batches(Verify, batch_format="pandas", concurrency=(1, 4))


class SimHasher:
    """64-bit SimHash over word bigrams (unigrams degenerate on small
    vocabularies — near-identical word SETS everywhere); emits the
    fingerprint plus eight 8-bit blocking keys (pairs within hamming ≤ 7
    share at least one block by pigeonhole; hamming ~10-16 detected
    with high probability)."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        fps = np.zeros(len(df), dtype=np.uint64)
        for i, text in enumerate(df["text"]):
            h = _hash_tokens(list(set(word_ngrams(text, 2))))
            if len(h) == 0:
                continue
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
            vote = (2 * bits - 1).sum(axis=0)
            fp = np.uint64(0)
            for j in np.nonzero(vote > 0)[0]:
                fp |= np.uint64(1) << np.uint64(j)
            fps[i] = fp
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "simhash": fps.astype("int64")})
        for blk in range(8):
            out[f"block{blk}"] = ((fps >> np.uint64(8 * blk)) & np.uint64(0xFF)).astype("int64")
        return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.astype(np.uint64)) ^ (b.astype(np.uint64))
    cnt = np.zeros(len(x), dtype=np.int64)
    while x.any():
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def simhash_dedup_pairs(
    docs: "ray.data.Dataset", max_hamming: int = 16
) -> "ray.data.Dataset":
    """SimHash near-dup: fingerprint → 8×8-bit-block LSH → verify
    hamming. Blocks guarantee recall for hamming ≤ 7 (pigeonhole) and
    detect hamming ~10-16 with high probability."""
    fps = docs.map_batches(SimHasher(), batch_format="pandas", batch_size=2048)

    out = []
    for blk in range(8):
        def pairs(g: pd.DataFrame, _blk=blk) -> pd.DataFrame:
            g = g.drop_duplicates("doc_id").sort_values("doc_id")
            ids = g["doc_id"].to_numpy()
            sh = g["simhash"].to_numpy()
            if len(ids) < 2 or len(ids) > 256:
                return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []}).astype("int64")
            a, b = np.triu_indices(len(ids), 1)
            hd = hamming64(sh[a], sh[b])
            keep = hd <= max_hamming
            return pd.DataFrame(
                {"doc_a": ids[a][keep], "doc_b": ids[b][keep], "hamming": hd[keep]}
            )

        out.append(
            fps.groupby(f"block{blk}").map_groups(pairs, batch_format="pandas")
        )

    all_pairs = out[0]
    for o in out[1:]:
        all_pairs = all_pairs.union(o)

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return all_pairs.groupby(["doc_a", "doc_b"]).map_groups(
        first, batch_format="pandas"
    )


def exact_dedup_keep_min(
    docs: "ray.data.Dataset", key_fn_batch, key_name: str
) -> "ray.data.Dataset":
    """Exact dedup: add key column per batch, groupby(key), keep the
    min-doc_id representative (hash-partition + per-group first — D2)."""
    keyed = docs.map_batches(key_fn_batch, batch_format="pyarrow")

    def keep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable")
        return pd.DataFrame(
            {
                key_name: [g[key_name].iloc[0]],
                "keep_doc_id": [g["doc_id"].iloc[0]],
                "group_size": [len(g)],
            }
        )

    return keyed.groupby(key_name).map_groups(keep, batch_format="pandas")
