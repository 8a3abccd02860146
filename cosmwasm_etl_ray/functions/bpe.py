"""Distributed BPE tokenizer training (Sennrich-style, over the
word-frequency dictionary) and encoding.

Scale shape: the ONE heavy pass is the corpus scan that builds the
word-frequency table (map-side Counters -> grouped_agg shuffle — the
same partial/fold discipline as vocab_topk). Training then iterates
over the DISTINCT-WORD table, which is bounded by vocabulary size
(~10^6-10^7 at web scale), NOT corpus size — it lives sharded across
long-lived actors (block refs passed zero-copy via plasma), and each
merge round is one tiny exact reduce (partial pair-count dicts ->
driver argmax, global tie-break) plus one broadcast apply. The merge
table itself is n_merges rows — trivially small. Encoding broadcasts
the rank table (ray.put once) and memoizes per distinct word inside
each actor.

The round-0 pair counts are exactly SQL-expressible and gate the
distributed machinery (bpe_pair_counts); the full iterative train is
pinned against an independent clean-room serial reference in
tests/test_bpe.py (the cdc_final_state dict-replay-oracle pattern) —
iterative argmax chains are not SQL-expressible, so bpe_merges is the
repo's one rows-only gate entry, documented as such.

Reference analogue: the aggregator's iterative window folds keep
state resident across rounds (/root/reference/aggregator/repo/repo.go);
here the resident state is the sharded symbol table.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

WORD_RE = re.compile(r"[a-z]+")
MAX_WORD_LEN = 30  # cap mirrored in the SQL twin's range() bound


def _batch_word_counts(t: pa.Table) -> pa.Table:
    c: Counter = Counter()
    for s in t["text"].to_pylist():
        if s:
            for w in WORD_RE.findall(s.lower()):
                c[w[:MAX_WORD_LEN]] += 1
    return pa.table(
        {
            "word": pa.array(list(c.keys()), type=pa.string()),
            "freq": pa.array(list(c.values()), type=pa.int64()),
        }
    )


def word_freqs(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distributed word-frequency table: per-batch Counter partials,
    then a shuffle-mode grouped sum (word cardinality is unbounded —
    never a driver funnel)."""
    from cosmwasm_etl_ray.functions.agg import grouped_agg

    partials = docs.map_batches(
        _batch_word_counts, batch_format="pyarrow", batch_size=4096
    )
    return grouped_agg(
        partials, ["word"], {"freq": ("freq", "sum")}, final="shuffle"
    )


def pair_counts(docs: "ray.data.Dataset", min_count: int = 40) -> "ray.data.Dataset":
    """Round-0 BPE statistics: adjacent-character pair counts over the
    corpus (weighted by word frequency == direct occurrence counts),
    thresholded (no top-k LIMIT, so no tie hazard). Exactly
    SQL-expressible — this is the full-value gate for the distributed
    word-freq machinery bpe_train builds on."""

    def explode(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for w, f in zip(t["word"].to_pylist(), t["freq"].to_pylist()):
            for i in range(len(w) - 1):
                c[w[i : i + 2]] += f
        pairs = list(c.keys())
        return pa.table(
            {
                "left_ch": pa.array([p[0] for p in pairs], type=pa.string()),
                "right_ch": pa.array([p[1] for p in pairs], type=pa.string()),
                "cnt": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    from cosmwasm_etl_ray.functions.agg import grouped_agg

    exploded = word_freqs(docs).map_batches(
        explode, batch_format="pyarrow", batch_size=65536
    )
    summed = grouped_agg(
        exploded, ["left_ch", "right_ch"], {"cnt": ("cnt", "sum")}, final="shuffle"
    )

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["cnt"], min_count))

    return summed.map_batches(keep, batch_format="pyarrow")


def _merge_word(sym: tuple, left: str, right: str) -> tuple:
    """Apply one merge to a symbol tuple, left-to-right non-overlapping
    (standard BPE application order)."""
    out = []
    i = 0
    n = len(sym)
    while i < n:
        if i + 1 < n and sym[i] == left and sym[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


@ray.remote
class BpeShard:
    """One shard of the distinct-word symbol table, resident across
    merge rounds. Holds (symbols tuple, freq) rows; count_pairs
    returns this shard's exact weighted pair counts, apply_merge
    rewrites only the words that contain the pair (an inverted
    occurrence index would prune further at 10^7 vocab — the rewrite
    is O(shard) here and the shard is vocabulary-, not corpus-,
    sized)."""

    def __init__(self, *blocks):
        words: list = []
        freqs: list = []
        for b in blocks:
            t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            words.extend(t["word"].to_pylist())
            freqs.extend(t["freq"].to_pylist())
        self.syms = [tuple(w) for w in words]
        self.freqs = np.asarray(freqs, dtype=np.int64)

    def count_pairs(self) -> dict:
        c: Counter = Counter()
        for sym, f in zip(self.syms, self.freqs):
            f = int(f)
            for i in range(len(sym) - 1):
                c[(sym[i], sym[i + 1])] += f
        return dict(c)

    def apply_merge(self, left: str, right: str) -> None:
        for idx, sym in enumerate(self.syms):
            for i in range(len(sym) - 1):
                if sym[i] == left and sym[i + 1] == right:
                    self.syms[idx] = _merge_word(sym, left, right)
                    break


def bpe_train(
    docs: "ray.data.Dataset",
    n_merges: int = 15,
    min_freq: int = 2,
    n_shards: int = 8,
) -> pd.DataFrame:
    """Learn n_merges BPE merges over the corpus. Returns the merge
    table (rank, left, right, freq) — deterministic regardless of
    sharding: every round reduces EXACT pair counts and breaks ties
    globally by (count desc, left asc, right asc)."""
    from cosmwasm_etl_ray.functions.joins import _drain_block_refs

    refs = _drain_block_refs(word_freqs(docs))
    n_shards = max(1, min(n_shards, len(refs)))
    shards = [
        BpeShard.remote(*refs[i::n_shards]) for i in range(n_shards)
    ]
    merges: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(n_merges):
            total: Counter = Counter()
            for part in ray.get([s.count_pairs.remote() for s in shards]):
                total.update(part)
            if not total:
                break
            (left, right), cnt = min(
                total.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            if cnt < min_freq:
                break
            merges.append((rank, left, right, int(cnt)))
            ray.get([s.apply_merge.remote(left, right) for s in shards])
    finally:
        for s in shards:
            ray.kill(s)
    return pd.DataFrame(merges, columns=["rank", "left", "right", "freq"]).astype(
        {"rank": "int64", "freq": "int64"}
    )


def _encode_word(w: str, ranks: dict) -> tuple:
    """Classic BPE encode of one word: repeatedly merge the
    lowest-rank adjacent pair until none applies."""
    sym = tuple(w)
    while len(sym) > 1:
        best = None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, sym[i], sym[i + 1])
        if best is None:
            return sym
        sym = _merge_word(sym, best[1], best[2])
    return sym


def bpe_encode(
    docs: "ray.data.Dataset", merges: pd.DataFrame
) -> "ray.data.Dataset":
    """Tokenize every doc with a trained merge table: ranks broadcast
    once (ray.put), per-distinct-word memo inside each actor, output
    (doc_id, n_words, n_tokens, n_chars)."""
    ranks = {
        (l, r): int(k)
        for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
    }
    ref = ray.put(ranks)

    class Encode:
        def __init__(self):
            self.ranks = ray.get(ref)
            self.memo: dict[str, int] = {}

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, nw, nt, nc = [], [], [], []
            for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
                words = [
                    w[:MAX_WORD_LEN] for w in WORD_RE.findall((s or "").lower())
                ]
                toks = 0
                for w in words:
                    n = self.memo.get(w)
                    if n is None:
                        n = len(_encode_word(w, self.ranks))
                        self.memo[w] = n
                    toks += n
                ids.append(did)
                nw.append(len(words))
                nt.append(toks)
                nc.append(sum(len(w) for w in words))
            return pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "n_words": pa.array(nw, type=pa.int64()),
                    "n_tokens": pa.array(nt, type=pa.int64()),
                    "n_chars": pa.array(nc, type=pa.int64()),
                }
            )

    return docs.map_batches(
        Encode, batch_format="pyarrow", batch_size=1024, concurrency=(1, 8)
    )


# Fixed demo tokenizer for the exact encode gate: multi-level merges
# (er->ers, th->the, in->ing) exercise composition. The SQL twin is
# GENERATED from this same constant (chained replace() over a spaced
# representation), so engine and oracle cannot drift.
FIXED_MERGES: list[tuple[str, str]] = [
    ("e", "r"),
    ("o", "r"),
    ("i", "n"),
    ("s", "t"),
    ("a", "r"),
    ("p", "ar"),
    ("er", "s"),
    ("t", "h"),
    ("th", "e"),
    ("a", "n"),
    ("o", "n"),
    ("in", "g"),
]


def encode_tokens_sequential(w: str, merges: list[tuple[str, str]]) -> int:
    """Token count after applying merges SEQUENTIALLY in rank order
    (each merge applied left-to-right non-overlapping across the whole
    word before the next) — the original Sennrich apply order, and the
    semantics a chained SQL replace() reproduces exactly."""
    sym = tuple(w)
    for l, r in merges:
        sym = _merge_word(sym, l, r)
    return len(sym)


def bpe_encode_fixed(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Tokenize with the FIXED_MERGES tokenizer (sequential apply) —
    per-doc word and token counts, memoized per distinct word in each
    actor. The exact-gate twin of the learned-tokenizer bpe_encode."""

    class Encode:
        def __init__(self):
            self.memo: dict[str, int] = {}

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, nw, nt = [], [], []
            for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
                words = [
                    w[:MAX_WORD_LEN] for w in WORD_RE.findall((s or "").lower())
                ]
                toks = 0
                for w in words:
                    n = self.memo.get(w)
                    if n is None:
                        n = encode_tokens_sequential(w, FIXED_MERGES)
                        self.memo[w] = n
                    toks += n
                ids.append(did)
                nw.append(len(words))
                nt.append(toks)
            return pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "n_words": pa.array(nw, type=pa.int64()),
                    "n_tokens": pa.array(nt, type=pa.int64()),
                }
            )

    return docs.map_batches(
        Encode, batch_format="pyarrow", batch_size=1024, concurrency=(1, 8)
    )


def fixed_merges_sql() -> str:
    """The DuckDB twin for bpe_encode_fixed, GENERATED from
    FIXED_MERGES. Each token is wrapped as ``|tok|`` (word ->
    ``|u||n||d|...``) so the merge pattern ``|l||r|`` anchors BOTH
    sides to full tokens: the pattern's inner ``||`` can only align
    with a between-token boundary and the outer bars pin l and r to
    whole tokens, so a token-suffix + next-token-prefix can never
    spell a merge (the 'er|st' =/= 'er s' hazard a space-separated
    encoding has). The replacement ``|lr|`` regenerates both outer
    bars, so adjacent repeats keep chaining left-to-right exactly
    like _merge_word's non-overlapping scan. Token count per word =
    bar count / 2. Zero-word docs keep (0, 0) rows via the LEFT JOIN
    back onto documents (the doc_fluency twin pattern)."""
    expr = "regexp_replace(w, '(.)', '|\\1|', 'g')"
    for l, r in FIXED_MERGES:
        expr = f"replace({expr}, '|{l}||{r}|', '|{l}{r}|')"
    return f"""
WITH words AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
    FROM documents
), capped AS (
    SELECT doc_id, substr(w, 1, 30) AS w FROM words
), enc AS (
    SELECT doc_id, {expr} AS s FROM capped
), agg AS (
    SELECT doc_id, count(*) AS n_words,
           sum((len(s) - len(replace(s, '|', ''))) // 2) AS n_tokens
    FROM enc GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_words, 0) AS BIGINT) AS n_words,
       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
"""


def bpe_train_sql(n_merges: int = 15, min_freq: int = 2) -> str:
    """Full-value DuckDB twin for bpe_train, GENERATED as one CTE
    chain with n_merges rounds. Each round k restates the engine's
    exact loop in SQL over the distinct-word table:

      t{k}: split the wrapped ``|tok|`` symbolization into tokens
      p{k}: overlapping adjacent-pair counts weighted by word freq
            (the same per-index scan as BpeShard.count_pairs)
      b{k}: global argmax with the engine's tie-break
            (count desc, left asc, right asc; binary collation ==
            Python str ordering on [a-z] tokens), min_freq floor
      s{k+1}: replace('|l||r|' -> '|lr|') — exactly _merge_word's
            left-to-right non-overlapping apply (see fixed_merges_sql
            for the boundary-anchoring argument)

    If a round's best count falls below min_freq, b{k} is empty, the
    COALESCE(chr(1)) no-op replace keeps s unchanged, and every later
    round is empty too — the engine's `break`. Output (rank, left,
    right, freq) matches bpe_train's frame column-for-column."""
    parts = [
        "WITH words AS (\n"
        "    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w\n"
        "    FROM documents\n"
        "), w0 AS (\n"
        f"    SELECT substr(w, 1, {MAX_WORD_LEN}) AS w,"
        " CAST(count(*) AS BIGINT) AS f\n"
        "    FROM words GROUP BY 1\n"
        "), s0 AS MATERIALIZED (\n"
        "    SELECT regexp_replace(w, '(.)', '|\\1|', 'g') AS s, f FROM w0\n"
        ")"
    ]
    for k in range(n_merges):
        parts.append(
            f", t{k} AS (\n"
            f"    SELECT string_split(trim(s, '|'), '||') AS toks, f FROM s{k}\n"
            f"), p{k} AS (\n"
            f"    SELECT toks[u.i] AS l, toks[u.i + 1] AS r,\n"
            f"           CAST(sum(f) AS BIGINT) AS cnt\n"
            f"    FROM t{k}, LATERAL (SELECT unnest(generate_series(1,"
            f" len(toks) - 1)) AS i) u\n"
            f"    GROUP BY 1, 2\n"
            f"), b{k} AS MATERIALIZED (\n"
            f"    SELECT {k} AS rnk, l, r, cnt FROM p{k}\n"
            f"    WHERE cnt >= {min_freq}\n"
            f"    ORDER BY cnt DESC, l, r LIMIT 1\n"
            f"), s{k + 1} AS MATERIALIZED (\n"
            f"    SELECT replace(s,\n"
            f"        COALESCE((SELECT '|' || l || '||' || r || '|'"
            f" FROM b{k}), chr(1)),\n"
            f"        COALESCE((SELECT '|' || l || r || '|'"
            f" FROM b{k}), chr(1))) AS s, f\n"
            f"    FROM s{k}\n"
            f")"
        )
    union = "\nUNION ALL\n".join(f"SELECT * FROM b{k}" for k in range(n_merges))
    parts.append(
        "\nSELECT CAST(rnk AS BIGINT) AS \"rank\", l AS \"left\","
        " r AS \"right\", cnt AS freq\n"
        f"FROM ({union})\nORDER BY \"rank\"\n"
    )
    return "".join(parts)


def encode_tokens_replace_chain(w: str, merges: list[tuple[str, str]]) -> int:
    """Python simulation of the SQL twin's replace chain over the
    wrapped ``|tok|`` representation — str.replace and DuckDB
    replace() share left-to-right non-overlapping semantics, so this
    IS the oracle's per-word computation. Pinned equal to
    encode_tokens_sequential by a hypothesis property test."""
    s = "".join(f"|{c}|" for c in w)
    for l, r in merges:
        s = s.replace(f"|{l}||{r}|", f"|{l}{r}|")
    return (len(s) - len(s.replace("|", ""))) // 2


# Hard ceiling on the bigram-model driver pull. The [a-z] char-pair
# vocabulary is <= 26^2 = 676; the margin covers a future alphabet
# widening, but re-pointing this at WORD bigrams (unbounded) must
# crash loudly, not OOM the driver — the grouped_agg driver_limit
# discipline.
BIGRAM_MODEL_DRIVER_LIMIT = 65536


def bigram_model(docs: "ray.data.Dataset") -> dict:
    """Corpus character-bigram model: ONE distributed pass (the
    pair_counts machinery, threshold 1), reduced to a dict. The model
    is bounded by the alphabet (<= 26^2 entries for [a-z] pairs), so
    the driver pull is constant-size no matter the corpus — the
    train-side of the CCNet-style model-based quality filter.
    to_pandas(limit=BIGRAM_MODEL_DRIVER_LIMIT) raises before the
    driver materializes an unbounded result."""
    df = pair_counts(docs, min_count=1).to_pandas(
        limit=BIGRAM_MODEL_DRIVER_LIMIT
    )
    return {
        l + r: int(c)
        for l, r, c in zip(df["left_ch"], df["right_ch"], df["cnt"])
    }


def doc_fluency(docs: "ray.data.Dataset", model: dict | None = None) -> "ray.data.Dataset":
    """Model-based quality scoring, the perplexity-filter shape
    (CCNet trains a KenLM on a reference corpus and scores documents;
    here the model is the corpus's own bigram counts and the score is
    integer-exact so the gate can hash it): broadcast the model once
    (ray.put), score every doc as the sum over its in-word adjacent
    char pairs of the model count. High fluency = built from the
    corpus's common bigrams; rare-gibberish docs score near zero per
    pair. Output (doc_id, n_pairs, fluency)."""
    if model is None:
        # Two consumers of docs (pair_counts pass, then Score) —
        # materialize once so the corpus read doesn't re-execute.
        docs = docs.materialize()
        model = bigram_model(docs)
    ref = ray.put(model)

    class Score:
        def __init__(self):
            self.model = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, np_, fl = [], [], []
            for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
                pairs = 0
                score = 0
                for w in WORD_RE.findall((s or "").lower()):
                    w = w[:MAX_WORD_LEN]
                    for i in range(len(w) - 1):
                        pairs += 1
                        score += self.model.get(w[i : i + 2], 0)
                ids.append(did)
                np_.append(pairs)
                fl.append(score)
            return pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "n_pairs": pa.array(np_, type=pa.int64()),
                    "fluency": pa.array(fl, type=pa.int64()),
                }
            )

    return docs.map_batches(
        Score, batch_format="pyarrow", batch_size=1024, concurrency=(1, 8)
    )
