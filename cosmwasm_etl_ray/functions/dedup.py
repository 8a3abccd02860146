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
- candidate verification joins the pair list back to texts with two
  distributed hash_joins on doc_id (no corpus broadcast, no driver
  materialization — the LSH-pruned pair list is the only small thing);
- bucket groups are capped (``max_bucket``) so a degenerate bucket
  (e.g. empty-string docs) cannot produce O(n²) pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from cosmwasm_etl_ray.functions.joins import hash_join

_M61 = np.uint64((1 << 61) - 1)
_FNV_OFFSET = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)


def _hash_tokens(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hashes of token strings (pandas SipHash with its
    fixed default key — deterministic across processes, vectorized)."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(tokens, dtype=object), categorize=False)


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
        # ODD multipliers: x → a·x + b (mod 2^64) is a BIJECTION of the
        # 64-bit hash space, i.e. a true random permutation family for
        # min-wise hashing — and pure wrapping arithmetic, no 64-bit
        # modulo (numpy uint64 % has no vector unit and dominated the
        # whole sketch stage: 0.86 s vs 0.03 s per 1024-doc batch)
        self.a = rng.integers(1, _M61, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, _M61, size=num_perm, dtype=np.uint64)
        self.bands = bands
        self.rpb = num_perm // bands
        self.ngram = ngram

    def signature(self, text: str) -> np.ndarray:
        h = _hash_tokens(word_ngrams(text, self.ngram))
        if len(h) == 0:
            return np.zeros(len(self.a), dtype=np.uint64)
        # (perm, shingle) min — vectorized
        vals = h[None, :] * self.a[:, None] + self.b[:, None]
        return vals.min(axis=1)

    def signatures_batch(self, texts) -> np.ndarray:
        """All signatures of a batch in one shot: concatenate every
        doc's shingle hashes, one (perm × shingles) multiply-add, then
        segment-min per doc via minimum.reduceat."""
        shingle_lists = [word_ngrams(t, self.ngram) for t in texts]
        counts = np.array([max(1, len(s)) for s in shingle_lists])
        flat: list[str] = []
        for s in shingle_lists:
            flat.extend(s if s else [""])
        h = _hash_tokens(flat)
        vals = h[None, :] * self.a[:, None] + self.b[:, None]
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        return np.minimum.reduceat(vals, starts, axis=1)  # (perm, docs)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:  # reduceat on a 0-doc batch raises IndexError
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "band_id": pd.Series([], dtype="int64"),
                    "band_hash": pd.Series([], dtype="int64"),
                }
            )
        sigs = self.signatures_batch(df["text"].tolist())  # (perm, n)
        # band hash = FNV-1a fold of the band's signature rows —
        # fully vectorized over the doc axis (bands × rows_per_band
        # numpy ops per batch instead of an md5 call per (doc, band))
        bh = np.empty((self.bands, n), dtype=np.uint64)
        for b in range(self.bands):
            acc = np.full(n, _FNV_OFFSET, dtype=np.uint64)
            for r in range(b * self.rpb, (b + 1) * self.rpb):
                acc = (acc ^ sigs[r]) * _FNV_PRIME
            bh[b] = acc
        out_doc = np.repeat(df["doc_id"].to_numpy(), self.bands)
        out_band = np.tile(np.arange(self.bands), n)
        # doc-major layout to match repeat/tile above
        out_hash = bh.T.reshape(-1).view(np.int64)
        return pd.DataFrame(
            {"doc_id": out_doc, "band_id": out_band, "band_hash": out_hash}
        )


def dedup_pairs_dataset(pairs: "ray.data.Dataset", shards: int = 64) -> "ray.data.Dataset":
    """Global distinct over (doc_a, doc_b) pair rows: shard by pair hash
    (a pair always lands in one shard), drop_duplicates within shard —
    one coarse shuffle instead of a per-pair groupby."""

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pshard"] = ((df["doc_a"] * 1000003 + df["doc_b"]) % shards).astype("int32")
        return df

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["doc_a", "doc_b"])

    from cosmwasm_etl_ray.functions.agg import shard_exchange

    return shard_exchange(
        pairs.map_batches(add_shard, batch_format="pandas"),
        ["_pshard"], uniq, shards, by_column=True,
    )


def candidate_pairs_from_buckets(
    bucketed: "ray.data.Dataset",
    max_bucket: int = 64,
    shards: int = 256,
    dedup: bool = True,
) -> "ray.data.Dataset":
    """(band_id, band_hash) buckets → all-pairs within bucket (capped),
    distinct. Buckets are sharded coarsely (hash(band_hash) % shards)
    so the shuffle has ``shards`` groups, and the within-shard pandas
    groupby is vectorized — avoids per-tiny-bucket task overhead."""

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_shard"] = (
            df["band_hash"].to_numpy().view(np.uint64) % np.uint64(shards)
        ).astype("int32")
        return df

    def pairs_in_shard(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby(["band_id", "band_hash"], sort=False):
            ids = np.sort(grp["doc_id"].unique())[:max_bucket]
            if len(ids) < 2:
                continue
            a, b = np.triu_indices(len(ids), 1)
            out_a.append(ids[a])
            out_b.append(ids[b])
        if not out_a:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
        ).drop_duplicates()

    from cosmwasm_etl_ray.functions.agg import shard_exchange

    cands = shard_exchange(
        bucketed.map_batches(add_shard, batch_format="pandas"),
        ["_shard"], pairs_in_shard, shards, by_column=True,
    )
    if not dedup:
        return cands
    return dedup_pairs_dataset(cands)


def verify_pairs_jaccard(
    cands: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    ngram: int = 3,
    threshold: float = 0.5,
    num_buckets: int = 16,
    dedup_cands: bool = False,
) -> "ray.data.Dataset":
    """Exact n-gram Jaccard verification of candidate pairs WITHOUT
    broadcasting the corpus: two distributed hash_joins attach text_a /
    text_b to each pair on doc_id, then a map_batches computes the
    Jaccard. Only the LSH-pruned pair list (tiny) crosses the joins
    twice; documents move once per join, never to the driver."""

    def rename(side: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({f"doc_{side}": t["doc_id"], f"text_{side}": t["text"]})

        return fn

    # duplicates of a pair share doc_a, so they colocate in the first
    # join's bucket: a left_fold dedup there is GLOBAL — it replaces
    # the dedicated pair-dedup shuffle the pipeline used to pay
    left_fold = (
        (lambda l: l.drop_duplicates(["doc_a", "doc_b"])) if dedup_cands else None
    )
    with_a = hash_join(
        cands,
        docs.map_batches(rename("a"), batch_format="pyarrow"),
        on="doc_a",
        num_buckets=num_buckets,
        left_fold=left_fold,
        left_cols={"doc_a": "int64", "doc_b": "int64"},
        right_cols={"doc_a": "int64", "text_a": "object"},
    )
    with_b = hash_join(
        with_a,
        docs.map_batches(rename("b"), batch_format="pyarrow"),
        on="doc_b",
        num_buckets=num_buckets,
        left_cols={"doc_a": "int64", "doc_b": "int64", "text_a": "object"},
        right_cols={"doc_b": "int64", "text_b": "object"},
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        jac = np.empty(len(df), dtype=np.float64)
        for i, (ta, tb) in enumerate(zip(df["text_a"], df["text_b"])):
            sa = set(word_ngrams(ta, ngram))
            sb = set(word_ngrams(tb, ngram))
            denom = len(sa | sb)
            jac[i] = len(sa & sb) / denom if denom else 0.0
        out = df[["doc_a", "doc_b"]].assign(jaccard=jac)
        return out[out["jaccard"] >= threshold]

    return with_b.map_batches(verify, batch_format="pandas")


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
    cands = candidate_pairs_from_buckets(bucketed, dedup=False)
    return verify_pairs_jaccard(
        cands, docs, ngram=ngram, threshold=threshold, dedup_cands=True
    )


class SimHasher:
    """64-bit SimHash over word bigrams (unigrams degenerate on small
    vocabularies — near-identical word SETS everywhere); emits the
    fingerprint plus 64/block_bits blocking keys (pairs within hamming
    ≤ n_blocks-1 share at least one block by pigeonhole; larger
    distances detected with high probability).

    ``block_bits`` is the LSH scale knob: expected bucket occupancy is
    corpus_size / 2^block_bits, and the hot-bucket cap sheds buckets
    past ``max_bucket`` — so 8-bit blocks saturate (every bucket hot →
    zero candidates) past ~max_bucket × 256 docs. Pick block_bits with
    corpus / 2^bits ≲ max_bucket/4: 8 for ≤10^5 docs, 16 up to ~10^9,
    32 beyond (measured: the 500k-doc soak sheds 100% of 8-bit buckets
    but recalls through 16-bit ones). Fewer, wider blocks trade the
    pigeonhole guarantee down (4 blocks ⇒ exact only to hamming 3).

    Vectorized over the whole batch: every doc's distinct-bigram hashes
    concatenate into one array, the 64-bit → bit-matrix expansion runs
    once, and per-doc bit votes come from a segmented ``add.reduceat``
    — no Python loop over documents."""

    def __init__(self, block_bits: int = 8):
        if 64 % block_bits:
            raise ValueError("block_bits must divide 64")
        self.block_bits = block_bits
        self.n_blocks = 64 // block_bits

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        gram_lists = [sorted(set(word_ngrams(t, 2))) for t in df["text"]]
        counts = np.array([len(g) for g in gram_lists], dtype=np.int64)
        flat: list[str] = []
        for g in gram_lists:
            flat.extend(g)
        fps = np.zeros(n, dtype=np.uint64)
        if flat:
            h = _hash_tokens(flat)
            bits = (
                (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
            ).astype(np.int64)  # (tokens, 64)
            nonempty = counts > 0
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])[nonempty]
            sums = np.add.reduceat(bits, starts, axis=0)  # (docs≠∅, 64)
            # vote > 0  ⇔  popcount > n_tokens/2  ⇔  2*sum > n_tokens
            votes = (2 * sums) > counts[nonempty][:, None]
            pow2 = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
            fps[nonempty] = np.where(votes, pow2, np.uint64(0)).sum(
                axis=1, dtype=np.uint64
            )
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "simhash": fps.astype("int64")})
        mask = np.uint64((1 << self.block_bits) - 1)
        for blk in range(self.n_blocks):
            out[f"block{blk}"] = (
                (fps >> np.uint64(self.block_bits * blk)) & mask
            ).astype("int64")
        return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.astype(np.uint64)) ^ (b.astype(np.uint64))
    cnt = np.zeros(len(x), dtype=np.int64)
    while x.any():
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def simhash_dedup_pairs(
    docs: "ray.data.Dataset",
    max_hamming: int = 16,
    block_bits: int = 8,
    max_bucket: int = 256,
) -> "ray.data.Dataset":
    """SimHash near-dup: fingerprint → (64/block_bits)-block LSH →
    verify hamming. Blocks guarantee recall for hamming ≤ n_blocks-1
    (pigeonhole) and detect larger distances with high probability.
    ``block_bits`` must track corpus size (see SimHasher docstring):
    at 8 bits every bucket exceeds ``max_bucket`` past ~65k docs and
    candidate generation silently dries up."""
    n_blocks = 64 // block_bits
    fps = docs.map_batches(
        SimHasher(block_bits), batch_format="pandas", batch_size=2048
    )

    # melt the blocking keys into rows → ONE shuffle on a coarse
    # shard of (block_id, block_val) instead of n_blocks groupbys
    def melt(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for blk in range(n_blocks):
            parts.append(
                pd.DataFrame(
                    {
                        "doc_id": df["doc_id"],
                        "simhash": df["simhash"],
                        "bkey": (blk << block_bits) + df[f"block{blk}"],
                    }
                )
            )
        out = pd.concat(parts, ignore_index=True)
        out["_shard"] = (out["bkey"] % 256).astype("int32")
        return out

    melted = fps.map_batches(melt, batch_format="pandas")

    def pairs_in_shard(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_h = [], [], []
        for _, grp in g.groupby("bkey", sort=False):
            grp = grp.drop_duplicates("doc_id").sort_values("doc_id")
            ids = grp["doc_id"].to_numpy()
            sh = grp["simhash"].to_numpy()
            if len(ids) < 2 or len(ids) > max_bucket:
                continue
            a, b = np.triu_indices(len(ids), 1)
            hd = hamming64(sh[a], sh[b])
            keep = hd <= max_hamming
            out_a.append(ids[a][keep])
            out_b.append(ids[b][keep])
            out_h.append(hd[keep])
        if not out_a:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []}).astype("int64")
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a),
                "doc_b": np.concatenate(out_b),
                "hamming": np.concatenate(out_h),
            }
        ).drop_duplicates(["doc_a", "doc_b"])

    from cosmwasm_etl_ray.functions.agg import shard_exchange

    all_pairs = shard_exchange(melted, ["_shard"], pairs_in_shard, 256, by_column=True)
    return dedup_pairs_dataset(all_pairs)


def cluster_pairs(pairs_df: pd.DataFrame) -> pd.DataFrame:
    """Connected components over verified near-dup pairs → (doc_id,
    cluster_id=min doc in component). Union-find on the driver: the
    verified pair set is orders of magnitude smaller than the corpus
    (LSH pruning), which is the condition the Ray guide sets for
    driver-side union-find; at larger pair volumes use
    ``cluster_pairs_labelprop`` (distributed min-label propagation,
    identical output, tested equal)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    rows = sorted((n, find(n)) for n in parent)
    return pd.DataFrame(rows, columns=["doc_id", "cluster_id"])


def cluster_pairs_labelprop(
    pairs: "ray.data.Dataset", max_iters: int = 20, shards: int = 32
) -> pd.DataFrame:
    """Connected components by distributed MIN-LABEL PROPAGATION — the
    scale path cluster_pairs' driver union-find falls back to when the
    verified pair set itself is too large to collect. Per round: every
    node's label flows to its neighbors (one hash_join), each node
    takes the min of its own and incoming labels (one sharded reduce);
    labels only decrease, so an unchanged label SUM is a fixpoint.
    Rounds needed = graph diameter (near-dup clusters are shallow).
    Produces exactly cluster_pairs' output: (doc_id, cluster_id = min
    doc in component)."""
    from cosmwasm_etl_ray.functions.agg import sharded_map_groups
    from cosmwasm_etl_ray.functions.joins import hash_join

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [
                df[["doc_a", "doc_b"]].rename(columns={"doc_a": "u", "doc_b": "v"}),
                df[["doc_a", "doc_b"]].rename(columns={"doc_b": "u", "doc_a": "v"})[
                    ["u", "v"]
                ],
            ],
            ignore_index=True,
        )

    edges = pairs.map_batches(both_dirs, batch_format="pandas").materialize()

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"v": df["u"], "label": df["u"]}).drop_duplicates()

    labels = edges.map_batches(init_labels, batch_format="pandas")

    def min_per_node(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("v", as_index=False)["label"].min()

    labels = sharded_map_groups(labels, ["v"], min_per_node, shards=shards).materialize()
    prev_sum = None
    converged = False
    for _ in range(max_iters):
        # neighbor messages: edge (u, v) ⋈ label(v) → (u, label)
        msgs = hash_join(
            edges,
            labels,
            on="v",
            left_cols={"u": "int64", "v": "int64"},
            right_cols={"v": "int64", "label": "int64"},
        ).map_batches(
            lambda df: pd.DataFrame({"v": df["u"], "label": df["label"]}),
            batch_format="pandas",
        )
        labels = sharded_map_groups(
            labels.union(msgs), ["v"], min_per_node, shards=shards
        ).materialize()
        s = int(labels.sum("label"))
        if s == prev_sum:  # labels only decrease: equal sum ⇒ fixpoint
            converged = True
            break
        prev_sum = s
    if not converged:
        # exiting by max_iters means a component with diameter >
        # max_iters carries NON-minimal labels — silently diverging
        # from cluster_pairs' union-find, which callers are told this
        # matches exactly. Fail loudly; the caller raises max_iters.
        raise RuntimeError(
            f"cluster_pairs_labelprop did not reach a fixpoint in "
            f"{max_iters} rounds (component diameter exceeds max_iters)"
        )

    out = labels.to_pandas().rename(columns={"v": "doc_id", "label": "cluster_id"})
    return out.sort_values("doc_id").reset_index(drop=True)


def exact_dedup_keep_min(
    docs: "ray.data.Dataset", key_fn_batch, key_name: str, shards: int = 64
) -> "ray.data.Dataset":
    """Exact dedup: add key column per batch, keep the min-doc_id
    representative per key (D2). Scale shape: a map-side PARTIAL
    (per-batch min/count per key) shrinks the shuffle to per-batch
    distinct keys, then the partials shard by key hash and fold
    vectorized per COARSE shard — never one pandas group per distinct
    key (at corpus-scale cardinality that pays per-key task/frame
    overhead everywhere)."""
    from cosmwasm_etl_ray.functions.agg import sharded_map_groups

    keyed = docs.map_batches(key_fn_batch, batch_format="pyarrow")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(key_name, sort=False, as_index=False).agg(
            keep_doc_id=("doc_id", "min"), group_size=("doc_id", "size")
        )

    partials = keyed.map_batches(partial, batch_format="pandas")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key_name, sort=False, as_index=False).agg(
            keep_doc_id=("keep_doc_id", "min"), group_size=("group_size", "sum")
        )
        return out[[key_name, "keep_doc_id", "group_size"]]

    return sharded_map_groups(partials, [key_name], fold, shards=shards)


# ---------------------------------------------- duplicated-span detection

SPAN_W = 16  # tokens per window (the classic substring-dedup span)


def dup_spans(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Cross-document duplicated-span signal — the exact-substring
    analogue of suffix-array training-data dedup, shaped for Ray: per
    doc, how many of its SPAN_W-token windows also occur in at least
    one OTHER document. Output (doc_id, n_windows, n_dup_windows) is
    exact integers.

    Plan: one window explode with a map-side (doc, win, c) partial
    (a doc lives wholly in its batch, so the partial is complete); the
    cross-doc count is a win-keyed grouped_agg (windows whose doc
    count >= 2 are the SMALL survivor set); survivors join back to the
    per-doc partials (win-keyed hash join), and the per-doc dup count
    folds inside the final doc-keyed join — windows never broadcast,
    and only duplicated windows ride the second exchange.

    The exploded window stream is ~SPAN_W× the corpus text, so it is
    NEVER materialized: each of its two consumers re-derives it from
    ``docs`` (an explode recompute beats pinning 16× the corpus in the
    object store; pass a re-readable input such as a parquet read)."""
    from cosmwasm_etl_ray.functions.agg import grouped_agg
    from cosmwasm_etl_ray.functions.dataprep import _explode_grams
    from cosmwasm_etl_ray.functions.joins import hash_join

    def explode_wins(df: pd.DataFrame) -> pd.DataFrame:
        g = _explode_grams(df, n=SPAN_W, dedup=False)
        out = (
            g.groupby(["doc_id", "gram"], sort=False)
            .size()
            .rename("c")
            .reset_index()
            .rename(columns={"gram": "win"})
        )
        out["c"] = out["c"].astype("int64")
        return out

    def wins_stream() -> "ray.data.Dataset":
        # each call is an independent lazy re-derivation (see docstring)
        return docs.map_batches(explode_wins, batch_format="pandas")

    survivors = grouped_agg(
        wins_stream(),
        keys=["win"],
        spec={"n_docs": ("doc_id", "count")},  # (doc, win) rows are distinct
        final="shuffle",  # window cardinality is corpus-scale
    ).map_batches(
        lambda df: df.loc[df["n_docs"] >= 2, ["win"]], batch_format="pandas"
    )

    hits = hash_join(
        wins_stream(),
        survivors,
        on="win",
        left_cols={"doc_id": "int64", "win": "object", "c": "int64"},
        right_cols={"win": "object"},
    )

    def hit_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("doc_id", sort=False, as_index=False)["c"].sum()
        out = out.rename(columns={"c": "n_dup_windows"})
        out["n_dup_windows"] = out["n_dup_windows"].astype("int64")
        return out

    def totals(df: pd.DataFrame) -> pd.DataFrame:
        n_tok = df["text"].str.split(" ").str.len().to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_windows": np.maximum(n_tok - SPAN_W + 1, 0).astype("int64"),
            }
        )

    def fold_hits(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("doc_id", sort=False, as_index=False)["n_dup_windows"].sum()
        out["n_dup_windows"] = out["n_dup_windows"].astype("int64")
        return out

    joined = hash_join(
        docs.map_batches(totals, batch_format="pandas"),
        hits.map_batches(hit_partial, batch_format="pandas"),
        on="doc_id",
        how="left",
        left_cols={"doc_id": "int64", "n_windows": "int64"},
        right_cols={"doc_id": "int64", "n_dup_windows": "int64"},
        right_fold=fold_hits,
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_windows": df["n_windows"].astype("int64"),
                "n_dup_windows": pd.to_numeric(df["n_dup_windows"], errors="coerce")
                .fillna(0)
                .astype("int64"),
            }
        )

    return joined.map_batches(finalize, batch_format="pandas")
