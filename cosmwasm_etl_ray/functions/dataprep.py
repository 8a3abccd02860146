"""Training-data preparation operators: document chunking, deterministic
dataset splits, train/eval decontamination, PII scan/redaction.

These extend the engine's training-data family (dedup/similarity/text)
with the remaining ops a 100-TB pretraining pipeline runs before
tokenization. Reference provenance: the per-record normalizers and
rule-driven record rewrites of SURVEY §2.2 (M16-M18 scalar fns,
M1/M2 rule filters) generalized to document streams — e.g. the
reference's per-log attribute extraction loop
(/root/reference/parser/dex/dezswap/mapper.go) is the same
record→derived-records shape as chunking, and its exception-set
anti-join (/root/reference/parser/dex/dex.go:669-689) is the same
membership-test shape as decontamination.

Scale notes (the design constraints, per op):

- ``chunk_batch``: pure flat map — one input row fans out to
  ``ceil((n_tok-overlap)/stride)`` chunk rows inside the SAME
  ``map_batches`` call, so the stage streams block-by-block with no
  shuffle; chunk text is sliced by precomputed char offsets (one
  ``str.split`` per doc, O(1) substring per chunk — no re-join).
- ``split_batch``: stateless vectorized hash (Knuth multiplicative,
  wrap-exact in uint64), zero shuffle; the assignment is a pure
  function of ``doc_id`` so any stage downstream can recompute it
  instead of joining it.
- decontamination: the eval side is SMALL BY CONTRACT (an eval set is
  thousands of docs even when the train side is 100 TB) — its distinct
  gram set is built distributedly, collected once, ``ray.put`` once,
  and every scoring task reads the same object-store copy. The train
  side streams: explode → per-doc distinct → hash-table membership
  (pandas isin) → segment sum. No shuffle on the big side.
- ``PiiScanner``: actor-pool stage — regexes compile once per actor in
  ``__init__``; per batch it's C-regex over a pandas column.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

# ---------------------------------------------------------------- chunking

CHUNK_SIZE = 16  # tokens per chunk (sized to the corpus: avg doc ~54 tokens)
CHUNK_STRIDE = 12  # tokens between chunk starts (overlap = 4)


def chunk_batch(
    df: pd.DataFrame, chunk_size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> pd.DataFrame:
    """Fixed-size token windows with overlap (context-window prep /
    RAG chunking). Sliding-window plan: starts at 0, stride apart;
    a doc with n <= chunk_size tokens is one chunk; otherwise
    ceil((n - chunk_size) / stride) + 1 chunks so the last window
    always reaches the end of the doc.

    Chunk text is carved by char offsets (cumsum of token lengths),
    not token re-joins: one split per doc, one substring per chunk.
    """
    out_id, out_cid, out_ntok, out_text = [], [], [], []
    for doc_id, text in zip(df["doc_id"].to_numpy(), df["text"].to_numpy()):
        toks = text.split(" ")
        n = len(toks)
        lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n)
        # starts[i] = char offset where token i begins; starts[n]-1 = len(text)+...
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens + 1, out=starts[1:])
        n_chunks = 1 if n <= chunk_size else -(-(n - chunk_size) // stride) + 1
        for c in range(n_chunks):
            s = c * stride
            e = min(s + chunk_size, n)
            out_id.append(doc_id)
            out_cid.append(c)
            out_ntok.append(e - s)
            out_text.append(text[starts[s] : starts[e] - 1])
    return pd.DataFrame(
        {
            "doc_id": pd.Series(out_id, dtype="int64"),
            "chunk_id": pd.Series(out_cid, dtype="int64"),
            "n_chunk_tokens": pd.Series(out_ntok, dtype="int64"),
            "chunk_text": pd.Series(out_text, dtype="object"),
        }
    )


def chunk_documents(
    docs: "ray.data.Dataset", chunk_size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> "ray.data.Dataset":
    def chunks(df: pd.DataFrame) -> pd.DataFrame:
        return chunk_batch(df, chunk_size, stride)

    return docs.map_batches(chunks, batch_format="pandas")


# ---------------------------------------------------- deterministic splits

SPLIT_MULT = 2654435761  # Knuth multiplicative hash constant (2^32 * phi)
SPLIT_MOD = 1 << 32
TRAIN_BOUND = 80  # bucket < 80 -> train
VAL_BOUND = 90  # 80 <= bucket < 90 -> val; else test


def split_bucket(doc_id: np.ndarray) -> np.ndarray:
    """bucket in [0, 100) = (doc_id * SPLIT_MULT) % 2^32 % 100.

    Computed in uint64 so the multiply wraps mod 2^64; because
    2^32 | 2^64 the result mod 2^32 equals exact integer arithmetic —
    the DuckDB twin states the same value via HUGEINT.
    """
    h = doc_id.astype(np.uint64) * np.uint64(SPLIT_MULT)
    return ((h % np.uint64(SPLIT_MOD)) % np.uint64(100)).astype(np.int64)


def split_batch(df: pd.DataFrame) -> pd.DataFrame:
    b = split_bucket(df["doc_id"].to_numpy())
    split = np.where(b < TRAIN_BOUND, "train", np.where(b < VAL_BOUND, "val", "test"))
    n_spaces = df["text"].str.count(" ").to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].astype("int64").to_numpy(),
            "split": split,
            "n_tokens": n_spaces + 1,
        }
    )


# ------------------------------------------- deterministic global shuffle

SHUFFLE_SEED = 17
SHUFFLE_BUCKETS = 1024  # power of 2; order-preserving ranges of the hash space


def shuffle_hash(doc_id: np.ndarray, seed: int = SHUFFLE_SEED) -> np.ndarray:
    """Reproducible shuffle key in [0, 2^32): ((id + seed) * Knuth)
    % 2^32, wrap-exact in uint64 (same discipline as ``split_bucket``
    — the DuckDB twin states it via HUGEINT). A different seed is a
    different, equally uniform permutation."""
    h = (doc_id.astype(np.uint64) + np.uint64(seed)) * np.uint64(SPLIT_MULT)
    return (h % np.uint64(SPLIT_MOD)).astype(np.int64)


def deterministic_shuffle(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    seed: int = SHUFFLE_SEED,
    buckets: int = SHUFFLE_BUCKETS,
    shards: int = 64,
) -> "ray.data.Dataset":
    """Assign every row its global position 0..N-1 in the reproducible
    training order ``ORDER BY (shuffle_hash(id, seed), id)`` — the
    seed-stable replacement for ``Dataset.random_shuffle`` (whose
    per-task draws shift under load; see functions/similarity.
    train_sample for the filter-shaped sibling).

    Distributed rank WITHOUT a global sort: the hash's top
    log2(buckets) bits are an order-preserving range partition, so

        pass 1: per-block bucket histograms -> driver prefix sums
                (``buckets`` int64s — O(buckets) driver state, fixed)
        pass 2: shard_exchange by bucket; each bucket lands whole in
                one task, which sorts it by (hash, id) and emits
                position = bucket_offset + local_rank

    Two streaming passes over the input (the same I/O a sort-based
    rank pays for its sample+sort), nothing corpus-sized on the
    driver, and the output is identical at any cluster size. At 100 TB
    raise ``buckets`` so a bucket (~N/buckets rows) fits one task's
    heap; ties are broken by the unique id so the order is total."""
    if buckets & (buckets - 1):
        raise ValueError("buckets must be a power of two")
    shift = 32 - int(buckets).bit_length() + 1  # hash >> shift in [0, buckets)

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        b = shuffle_hash(df[id_col].to_numpy(), seed) >> shift
        bc = np.bincount(b, minlength=buckets)
        nz = np.flatnonzero(bc)
        return pd.DataFrame(
            {"bucket": nz.astype(np.int64), "n": bc[nz].astype(np.int64)}
        )

    def fold_hist(g: pd.DataFrame) -> pd.DataFrame:
        # coalescing pre-sum: the driver receives <= buckets rows per
        # coalesced batch, not per block (10^6 blocks x 1024 buckets
        # would otherwise land on the driver raw)
        return g.groupby("bucket", sort=False, as_index=False)["n"].sum()

    parts = (
        ds.map_batches(hist, batch_format="pandas")
        .map_batches(fold_hist, batch_format="pandas", batch_size=64 * buckets)
        .to_pandas()
    )
    counts = np.zeros(buckets, dtype=np.int64)
    if len(parts):
        np.add.at(counts, parts["bucket"].to_numpy(), parts["n"].to_numpy())
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    off_ref = ray.put(offsets)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                id_col: ids,
                "_bucket": (shuffle_hash(ids, seed) >> shift).astype(np.int64),
            }
        )

    def rank_shard(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        ids = df[id_col].to_numpy().astype(np.int64)
        h = shuffle_hash(ids, seed)
        b = (h >> shift).astype(np.int64)  # recomputed: pure fn of id
        order = np.lexsort((ids, h, b))
        sb = b[order]
        run_start = np.flatnonzero(np.r_[True, sb[1:] != sb[:-1]])
        run_id = np.cumsum(np.r_[True, sb[1:] != sb[:-1]]) - 1
        local = np.arange(len(sb)) - run_start[run_id]
        return pd.DataFrame({id_col: ids[order], "pos": off[sb] + local})

    from cosmwasm_etl_ray.functions.agg import shard_exchange

    return shard_exchange(
        ds.map_batches(add_bucket, batch_format="pandas"),
        ["_bucket"], rank_shard, min(shards, buckets), by_column=True,
    )


# ------------------------------------------------- deterministic mixture

# per-domain epoch weights (the pretraining-mixture knob): weight 2.3
# means every doc appears twice and 30% of docs (chosen by hash, not
# RNG) appear a third time — deterministic up/down-sampling
MIX_WEIGHTS = {"en": 2.25, "de": 1.0, "fr": 0.5, "es": 1.5, "zh": 0.0}
MIX_SEED = 101


def mixture_copies(
    doc_id: np.ndarray, lang: np.ndarray, weights: dict[str, float]
) -> np.ndarray:
    """Copy count per doc: floor(w) everywhere, +1 for the docs whose
    seeded hash fraction falls under frac(w). The fraction is exact in
    integer arithmetic — frac_e2(w) is stated in CENTIBUCKETS (w is
    contractually a multiple of 0.01), compared against hash % 100, so
    the SQL twin restates it wrap-free via HUGEINT."""
    w = np.array([weights.get(str(l), 1.0) for l in lang])
    base = np.floor(w).astype(np.int64)
    frac_e2 = np.rint((w - base) * 100).astype(np.int64)
    h = (doc_id.astype(np.uint64) + np.uint64(MIX_SEED)) * np.uint64(SPLIT_MULT)
    bucket = ((h % np.uint64(SPLIT_MOD)) % np.uint64(100)).astype(np.int64)
    return base + (bucket < frac_e2)


def mixture_expand(
    docs: "ray.data.Dataset", weights: dict[str, float] | None = None
) -> "ray.data.Dataset":
    """Materialize the epoch mixture: one output row per (doc, copy).
    Pure streaming flat map — copy counts are a per-row function, rows
    replicate with np.repeat inside the batch, no shuffle, nothing on
    the driver; downstream the copies get distinct training positions
    by shuffling on (doc_id, copy_idx). Zero-weight domains drop here,
    at the read edge, before any downstream stage pays for them."""
    weights = MIX_WEIGHTS if weights is None else weights

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        n = mixture_copies(
            df["doc_id"].to_numpy(), df["lang"].to_numpy(), weights
        )
        idx = np.repeat(np.arange(len(df)), n)
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy().astype(np.int64)[idx],
                "lang": df["lang"].to_numpy()[idx],
            }
        )
        # copy_idx = 0..n_i-1 within each doc's replicated run
        starts = np.concatenate(([0], np.cumsum(n)[:-1]))
        out["copy_idx"] = np.arange(len(out), dtype=np.int64) - starts[idx]
        return out

    return docs.map_batches(expand, batch_format="pandas")


# ------------------------------------------------------- decontamination

NGRAM = 3


def _explode_grams(
    df: pd.DataFrame, n: int = NGRAM, dedup: bool = True
) -> pd.DataFrame:
    """(doc_id, gram) rows — per-doc word-n-grams (DISTINCT per doc by
    default; ``dedup=False`` keeps every occurrence for frequency
    signals), vectorized by one explode: tokens with positions, grams
    built by shifted concatenation inside each doc."""
    toks = df["text"].str.split(" ")
    counts = toks.str.len().to_numpy(dtype=np.int64)
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks]) if len(df) else np.array([], dtype=object)
    doc_ids = np.repeat(df["doc_id"].to_numpy(dtype=np.int64), counts)
    # gram starting at i is valid when tokens i, i+1, i+2 share a doc
    if len(flat) >= n:
        same = doc_ids[: len(doc_ids) - n + 1] == doc_ids[n - 1 :]
        idx = np.nonzero(same)[0]
        # pandas object-dtype concat is a C loop (np.char is ~10x slower)
        grams = pd.Series(flat[idx], dtype=object)
        for k in range(1, n):
            grams = grams + " " + pd.Series(flat[idx + k], dtype=object)
        g = pd.DataFrame({"doc_id": doc_ids[idx], "gram": grams.to_numpy()})
    else:
        g = pd.DataFrame({"doc_id": np.array([], dtype=np.int64), "gram": np.array([], dtype=object)})
    return g.drop_duplicates(ignore_index=True) if dedup else g


def _eval_grams_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch distinct word-3-grams of the eval (test-split) rows —
    THE definition of the eval side, shared by the broadcast-exact and
    Bloom decontamination paths so they cannot desynchronize."""
    b = split_bucket(df["doc_id"].to_numpy())
    g = _explode_grams(df[b >= VAL_BOUND])[["gram"]]
    return g.drop_duplicates(ignore_index=True)  # per-block distinct


def eval_gram_set(docs: "ray.data.Dataset") -> np.ndarray:
    """Distinct word-3-grams of the eval (test-split) docs, built
    distributedly and collected once — the SMALL side by contract."""
    # the eval side is small by contract: per-block distincts stream to
    # the driver and dedupe there — no Aggregate shuffle for a side
    # that fits in one broadcast object
    grams = docs.map_batches(_eval_grams_batch, batch_format="pandas").to_pandas()
    return np.sort(grams["gram"].drop_duplicates().to_numpy(dtype=object))


class ContaminationScorer:
    """Actor-pool stage: per train doc, how many of its distinct
    word-3-grams appear in ANY eval doc (membership against the
    broadcast eval-gram array — one object-store read per actor, a
    C hash-table isin per batch)."""

    def __init__(self, eval_grams_ref, bar: float = 0.5):
        grams = (
            ray.get(eval_grams_ref)
            if isinstance(eval_grams_ref, ray.ObjectRef)
            else eval_grams_ref
        )
        # pd.Index caches its hash engine: the table over the eval
        # grams builds ONCE per actor, not once per batch (Series.isin
        # would rehash all m grams on every call)
        self.eval_idx = pd.Index(grams)
        self.bar = bar

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        b = split_bucket(df["doc_id"].to_numpy())
        g = _explode_grams(df[b < TRAIN_BOUND])
        if g.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_grams": pd.Series([], dtype="int64"),
                    "n_hit": pd.Series([], dtype="int64"),
                    "contaminated": pd.Series([], dtype="bool"),
                }
            )
        # cached-Index lookup = C hash probe per gram; np.isin on
        # object strings is an O(n*m) scan
        hit = self.eval_idx.get_indexer(g["gram"].to_numpy()) >= 0
        agg = (
            pd.DataFrame({"doc_id": g["doc_id"], "hit": hit})
            .groupby("doc_id", sort=False)
            .agg(n_grams=("hit", "size"), n_hit=("hit", "sum"))
            .reset_index()
        )
        agg["n_grams"] = agg["n_grams"].astype("int64")
        agg["n_hit"] = agg["n_hit"].astype("int64")
        agg["contaminated"] = agg["n_hit"] >= self.bar * agg["n_grams"]
        return agg


def decontaminate(docs: "ray.data.Dataset", bar: float = 0.5) -> "ray.data.Dataset":
    """Train/eval n-gram decontamination: eval = the deterministic
    test split, train = the train split; a train doc is contaminated
    when >= ``bar`` of its distinct 3-grams appear in the eval set.
    ``docs`` is consumed twice (eval build + train scan) — pass a
    materialized Dataset when the upstream is expensive."""
    grams_ref = ray.put(eval_gram_set(docs))
    return docs.map_batches(
        ContaminationScorer,
        fn_constructor_args=(grams_ref, bar),
        batch_format="pandas",
        concurrency=(1, 8),
    )


def decontaminate_bloom(
    docs: "ray.data.Dataset", bar: float = 0.5
) -> "ray.data.Dataset":
    """Scale-path decontamination — same value-exact output as
    ``decontaminate`` but the eval gram set is NEVER broadcast: a fixed
    128 KiB Bloom filter over the eval grams (built distributedly,
    OR-fold of per-block sketches) prunes the train gram stream to
    candidates (Bloom has no false negatives), and the candidates alone
    flow through a distributed gram join against the eval grams for the
    exact verdict. Bloom proposes, the join disposes: the sketch only
    sizes the exchange, never the answer. At 100 TB the broadcast is
    128 KiB regardless of eval size, and the gram join carries only the
    ~contaminated fraction of the corpus.

    Exchanges: one gram-keyed join over candidates, one doc-keyed left
    join folding per-doc hit counts against per-doc gram totals."""
    from cosmwasm_etl_ray.functions.approx import bloom_probe, build_bloom
    from cosmwasm_etl_ray.functions.joins import hash_join

    # the eval grams feed two consumers (sketch build + join side):
    # materialize so the corpus isn't re-read
    egrams = docs.map_batches(_eval_grams_batch, batch_format="pandas").materialize()
    words_ref = ray.put(build_bloom(egrams, "gram"))

    class BloomScorer:
        """Per batch: explode train grams, keep Bloom-positive
        candidates, and emit one totals row per doc (is_total=True)
        so zero-candidate docs survive to the output."""

        def __init__(self):
            self.words = ray.get(words_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            b = split_bucket(df["doc_id"].to_numpy())
            g = _explode_grams(df[b < TRAIN_BOUND])
            cand = g[bloom_probe(self.words, g["gram"].to_numpy())]
            totals = g.groupby("doc_id", sort=False).size()
            return pd.DataFrame(
                {
                    "doc_id": np.concatenate(
                        [totals.index.to_numpy(), cand["doc_id"].to_numpy()]
                    ).astype("int64"),
                    "gram": np.concatenate(
                        [
                            np.full(len(totals), "", dtype=object),
                            cand["gram"].to_numpy(dtype=object),
                        ]
                    ),
                    "n_grams": np.concatenate(
                        [totals.to_numpy(), np.zeros(len(cand), dtype=np.int64)]
                    ).astype("int64"),
                    "is_total": np.concatenate(
                        [np.ones(len(totals), bool), np.zeros(len(cand), bool)]
                    ),
                }
            )

    comb = docs.map_batches(
        BloomScorer, batch_format="pandas", concurrency=(1, 8)
    ).materialize()  # two consumers: totals stream + candidate stream

    def take_totals(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["is_total"], ["doc_id", "n_grams"]]

    def take_cand(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[~df["is_total"], ["doc_id", "gram"]]

    totals = comb.map_batches(take_totals, batch_format="pandas")
    cand = comb.map_batches(take_cand, batch_format="pandas")

    hits = hash_join(
        cand,
        egrams,
        on="gram",
        left_cols={"doc_id": "int64", "gram": "object"},
        right_cols={"gram": "object"},
        # per-block distinct only upstream; every copy of a gram lands
        # in its bucket, so the in-bucket dedup is a GLOBAL distinct
        right_fold=lambda df: df.drop_duplicates(ignore_index=True),
    )

    def hit_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("doc_id", sort=False).size().rename("n_hit").reset_index()
        out["n_hit"] = out["n_hit"].astype("int64")
        return out

    def hit_fold(df: pd.DataFrame) -> pd.DataFrame:
        # partials fold globally per doc: the doc-keyed bucket holds
        # every partial of its docs
        out = df.groupby("doc_id", sort=False, as_index=False)["n_hit"].sum()
        out["n_hit"] = out["n_hit"].astype("int64")
        return out

    joined = hash_join(
        totals,
        hits.map_batches(hit_partial, batch_format="pandas"),
        on="doc_id",
        how="left",
        left_cols={"doc_id": "int64", "n_grams": "int64"},
        right_cols={"doc_id": "int64", "n_hit": "int64"},
        right_fold=hit_fold,
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        n_hit = (
            pd.to_numeric(df["n_hit"], errors="coerce")
            .fillna(0)
            .astype("int64")
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_grams": df["n_grams"].astype("int64"),
                "n_hit": n_hit,
                "contaminated": n_hit >= bar * df["n_grams"].astype("int64"),
            }
        )

    return joined.map_batches(finalize, batch_format="pandas")


# ------------------------------------------------------------ PII scanning

EMAIL_RE = r"[a-z0-9-]+@[a-z0-9.-]+"
PHONE_RE = r"555-[0-9]{4}"
REDACTION = "[PII]"


def inject_pii_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Deterministic PII planting (the corpus has none): every 7th doc
    gains an email token, every 11th a phone token — mirrored exactly
    by the SQL twin so the scanner's output is hash-checkable."""
    out = df.copy()
    ids = out["doc_id"].to_numpy()
    email = np.where(
        ids % 7 == 0,
        pd.Series(ids).map(lambda i: f" contact-{i}@example.com").to_numpy(dtype=object),
        "",
    )
    phone = np.where(
        ids % 11 == 0,
        pd.Series(ids).map(lambda i: f" call 555-{i % 10000:04d}").to_numpy(dtype=object),
        "",
    )
    out["text"] = out["text"].to_numpy(dtype=object) + email + phone
    return out


class PiiScanner:
    """Actor-pool stage: compiled regexes live in the actor; per batch
    counts matches and measures the redacted text (email pass then
    phone pass, same order as the SQL twin)."""

    def __init__(self):
        self.email = re.compile(EMAIL_RE)
        self.phone = re.compile(PHONE_RE)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"]
        # the COMPILED patterns from __init__ (pandas accepts them) —
        # passing the raw strings would recompile via the re cache per
        # call and leave the actor state unused
        n_emails = text.str.count(self.email).astype("int64")
        n_phones = text.str.count(self.phone).astype("int64")
        clean = text.str.replace(self.email, REDACTION, regex=True).str.replace(
            self.phone, REDACTION, regex=True
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_emails": n_emails,
                "n_phones": n_phones,
                "clean_chars": clean.str.len().astype("int64"),
            }
        )


def pii_scan(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(inject_pii_batch, batch_format="pandas").map_batches(
        PiiScanner, batch_format="pandas", concurrency=(1, 8)
    )


# ------------------------------------------------------- corpus cleaning

MIN_TOKENS = 20
MIN_STOP_RATIO = 0.02
DUP_PREFIX = 20


class CorpusAnnotator:
    """Actor-pool stage: one pass annotates every doc with the signals
    the cleaning rules consume — token count, stopword ratio, predicted
    language (the LangId profiles live in the actor), and the exact-dup
    prefix key. One batch in, one batch out; the dup GROUP decision
    needs a key-wide view and happens downstream."""

    def __init__(self):
        from cosmwasm_etl_ray.functions.text import STOPWORDS, LangId

        self.lang = LangId()
        self.stops = list(STOPWORDS)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks = df["text"].str.split(" ")
        n_tok = toks.str.len().astype("int64")
        exploded = toks.explode()
        stop_n = (
            exploded.isin(self.stops)
            .groupby(level=0)
            .sum()
            .reindex(df.index, fill_value=0)
            .astype("int64")
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "key20": df["text"].str.slice(0, DUP_PREFIX),
                "n_tok": n_tok,
                "stop_ratio": stop_n / n_tok,
                "lang_pred": self.lang(df)["lang_pred"].to_numpy(),
            }
        )


def corpus_filter(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """The composed cleaning pass a pretraining pipeline runs before
    tokenization: per-doc keep/drop with the FIRST failing rule as the
    reason — too_short (< MIN_TOKENS), non_english (LangId), low_quality
    (stopword ratio < MIN_STOP_RATIO), exact_dup (not the min-doc_id
    representative of its 20-char-prefix group).

    Shape: one annotator pass (actor pool), a min-per-key reduce for
    the dup winners (map-side partial -> key-sharded fold), and a
    partitioned hash join of the two — no driver materialization, no
    per-key groups."""
    from cosmwasm_etl_ray.functions.agg import grouped_agg
    from cosmwasm_etl_ray.functions.joins import hash_join

    ann = docs.map_batches(
        CorpusAnnotator, batch_format="pandas", concurrency=(1, 8)
    ).materialize()  # two consumers below: the join probe and the winners

    winners = grouped_agg(
        ann,
        keys=["key20"],
        spec={"keep_doc_id": ("doc_id", "min")},
        final="shuffle",  # prefix-key cardinality is corpus-scale
    )

    joined = hash_join(
        ann,
        winners,
        on="key20",
        left_cols={
            "doc_id": "int64",
            "key20": "object",
            "n_tok": "int64",
            "stop_ratio": "float64",
            "lang_pred": "object",
        },
        right_cols={"key20": "object", "keep_doc_id": "int64"},
    )

    def decide(df: pd.DataFrame) -> pd.DataFrame:
        reason = np.select(
            [
                df["n_tok"].to_numpy() < MIN_TOKENS,
                df["lang_pred"].to_numpy(dtype=object) != "en",
                df["stop_ratio"].to_numpy() < MIN_STOP_RATIO,
                df["doc_id"].to_numpy() != df["keep_doc_id"].to_numpy(),
            ],
            ["too_short", "non_english", "low_quality", "exact_dup"],
            default="ok",
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "keep": reason == "ok",
                "reason": reason,
            }
        )

    return joined.map_batches(decide, batch_format="pandas")


# ----------------------------------------------------------- vocabulary

TOPK_VOCAB = 50


def vocab_topk(docs: "ray.data.Dataset", k: int = TOPK_VOCAB) -> pd.DataFrame:
    """Global token frequencies, top-k (vocabulary building / BPE seed
    counts). The classic explode + combine shape: per-batch
    ``value_counts`` collapses each block to one row per distinct
    token BEFORE any exchange (the same partial-agg discipline as the
    replay combiner), the per-token reduce shuffles by token, and
    only per-block top-k survivors reach the driver for the final cut.
    Ties break token-ascending (mirrored by the SQL twin)."""
    from cosmwasm_etl_ray.functions.agg import grouped_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        counts = df["text"].str.split(" ").explode().value_counts()
        return pd.DataFrame(
            {"token": counts.index.to_numpy(dtype=object), "n": counts.to_numpy()}
        )

    totals = grouped_agg(
        docs.map_batches(partial, batch_format="pandas"),
        keys=["token"],
        spec={"n": ("n", "sum")},
        final="shuffle",  # vocab cardinality is corpus-scale
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "token"], ascending=[False, True]).head(k)

    cand = totals.map_batches(block_topk, batch_format="pandas").to_pandas()
    out = (
        cand.sort_values(["n", "token"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out


TFIDF_TOPK = 3
TFIDF_SCALE = 1_000_000


def tfidf_top_terms(
    docs: "ray.data.Dataset", k: int = TFIDF_TOPK
) -> "ray.data.Dataset":
    """Per-document top-k characteristic terms by an integer-exact
    TF-IDF-style rank (keyword extraction / near-dup feature prep).

    score = tf * TFIDF_SCALE // df — the corpus-size factor N of
    classic tf·ln(N/df) is constant per corpus, so it cancels inside
    the per-doc ranking; dropping it (and the ln, whose libm varies
    bit-for-bit across engines) keeps the score integer-exact and the
    SQL twin hash-matchable. Ties break token-ascending.

    Scale shape: the TF partial is COMPLETE per batch (a document is
    one input row, so its (doc, term) counts never span blocks); DF is
    corpus-cardinality, so it reduces through the token-sharded
    exchange (grouped_agg final="shuffle"), never the driver; DF joins
    back to the TF stream through the bucketed hash_join (big ⋈ big —
    the IDF table is corpus-vocabulary-sized, NOT broadcastable at
    100 TB); the per-doc cut is the grouped_topk combiner, so only
    ≤ k rows per doc per block reach the final exchange."""
    from cosmwasm_etl_ray.functions.agg import grouped_agg, grouped_topk
    from cosmwasm_etl_ray.functions.joins import hash_join

    def tf_rows(df: pd.DataFrame) -> pd.DataFrame:
        ex = df.set_index("doc_id")["text"].str.split(" ").explode()
        c = (
            pd.DataFrame(
                {"doc_id": ex.index.to_numpy(), "token": ex.to_numpy(dtype=object)}
            )
            .value_counts(["doc_id", "token"], sort=False)
            .reset_index(name="tf")
        )
        return pd.DataFrame(
            {
                "doc_id": c["doc_id"].to_numpy().astype("int64"),
                "token": c["token"].to_numpy(dtype=object),
                "tf": c["tf"].to_numpy().astype("int64"),
            }
        )

    # two consumers (DF reduce + join left side) — materialize once
    tf = docs.map_batches(tf_rows, batch_format="pandas").materialize()

    dfreq = grouped_agg(
        tf,
        keys=["token"],
        # tf rows are distinct (doc, token) by construction, so the
        # row count per token IS the document frequency
        spec={"df": ("doc_id", "count")},
        final="shuffle",
    )

    joined = hash_join(
        tf,
        dfreq,
        on="token",
        left_cols={"doc_id": "int64", "token": "object", "tf": "int64"},
        right_cols={"token": "object", "df": "int64"},
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["doc_id", "token", "tf", "df"]].copy()
        out["score"] = (
            out["tf"].to_numpy() * TFIDF_SCALE // out["df"].to_numpy()
        ).astype("int64")
        return out

    return grouped_topk(
        joined.map_batches(score, batch_format="pandas"),
        "doc_id",
        ["score", "token"],
        k,
        ascending=[False, True],
    )


# ------------------------------------------------------ sequence packing

PACK_CAPACITY = 128  # token budget per packed sequence
PACK_SHARDS = 64


def pack_sequences(
    docs: "ray.data.Dataset",
    capacity: int = PACK_CAPACITY,
    shards: int = PACK_SHARDS,
) -> "ray.data.Dataset":
    """Greedy sequence packing (context-window fill for training):
    docs shard by ``doc_id % shards``; within a shard, docs are walked
    in doc_id order and appended to the current pack unless they would
    overflow ``capacity``, which closes it (an oversized doc gets a
    pack of its own). The walk is inherently serial PER SHARD — the
    shard count is the parallelism knob, and pack ids are
    shard-local, so the layout is deterministic and cluster-size
    independent (same discipline as the replay's fixed P partitions)."""

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "shard": (df["doc_id"] % shards).astype("int64"),
                "n_tokens": df["text"].str.count(" ").astype("int64") + 1,
            }
        )
        return out

    def pack_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        # the exchange strips the shard column; recompute (pure fn of id)
        g["shard"] = (g["doc_id"] % shards).astype("int64")
        ntok = g["n_tokens"].to_numpy()
        pack = np.zeros(len(g), dtype=np.int64)
        pid, fill = 0, 0
        first = True
        for i, n in enumerate(ntok):
            if not first and fill + n > capacity:
                pid += 1
                fill = 0
            pack[i] = pid
            fill += n
            first = False
        g["pack_id"] = pack
        return g[["doc_id", "shard", "pack_id", "n_tokens"]]

    from cosmwasm_etl_ray.functions.agg import shard_exchange

    return shard_exchange(
        docs.map_batches(add_shard, batch_format="pandas"),
        ["shard"], pack_shard, shards, by_column=True,
    )


# --------------------------------------- content-defined chunking (CDC)

CDC_DIV = 8  # boundary when token hash % DIV == 0 -> ~DIV-token chunks
CDC_POW_N = 48  # modular power table length (char positions wrap past it)


def _cdc_pows() -> np.ndarray:
    from cosmwasm_etl_ray.functions.text import FP_BASE, FP_MOD

    return np.array(
        [pow(FP_BASE, j, FP_MOD) for j in range(CDC_POW_N)], dtype=np.int64
    )


def cdc_chunk_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Content-defined chunk boundaries: a chunk ENDS at every token
    whose codepoint-polynomial hash (mod the 31-bit prime, positions
    wrapping past CDC_POW_N — restated verbatim in the SQL twin) is
    divisible by CDC_DIV. Unlike fixed-stride chunk_batch, inserting
    text into a document only re-chunks the window around the edit —
    every boundary downstream of unchanged content stays put, which is
    what makes chunk-level dedup survive document revisions (the same
    reason the replay keys on content-stable (repo, path))."""
    from cosmwasm_etl_ray.functions.text import FP_MOD

    pows = _cdc_pows()
    rows_id, rows_cid, rows_txt, rows_n = [], [], [], []
    for doc_id, text in zip(df["doc_id"].to_numpy(), df["text"].to_numpy()):
        toks = str(text).split(" ")
        th = np.empty(len(toks), dtype=np.int64)
        for i, w in enumerate(toks):
            codes = np.frombuffer(w.encode("utf-32-le"), dtype=np.uint32)
            th[i] = int(
                (codes.astype(np.int64)
                 * pows[np.arange(len(codes)) % CDC_POW_N]).sum() % FP_MOD
            ) if len(codes) else 0
        bound = th % CDC_DIV == 0
        cid = np.zeros(len(toks), dtype=np.int64)
        cid[1:] = np.cumsum(bound[:-1])
        for c in np.unique(cid):
            m = cid == c
            rows_id.append(doc_id)
            rows_cid.append(int(c))
            rows_txt.append(" ".join(np.array(toks, dtype=object)[m]))
            rows_n.append(int(m.sum()))
    return pd.DataFrame(
        {
            "doc_id": pd.Series(rows_id, dtype="int64"),
            "chunk_id": pd.Series(rows_cid, dtype="int64"),
            "chunk_text": pd.Series(rows_txt, dtype="object"),
            "n_tokens": pd.Series(rows_n, dtype="int64"),
        }
    )
