"""Data-preparation operators as queries(): sliding-window chunking,
deterministic hash splits + stratification summary, train-vs-eval
n-gram decontamination, PII scan/redaction, top-k vocabulary, greedy
sequence packing, and the composed corpus_filter cleaning pass. Every
query has a full-value DuckDB oracle twin (same column names; the
twins restate the hash / gram / regex / recursive-walk semantics in
plain SQL).
"""

from __future__ import annotations

import pandas as pd

import ray.data

from cosmwasm_etl_ray.functions.dataprep import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    EMAIL_RE,
    PACK_CAPACITY,
    PACK_SHARDS,
    PHONE_RE,
    REDACTION,
    SPLIT_MULT,
    TFIDF_SCALE,
    TFIDF_TOPK,
    TOPK_VOCAB,
    TRAIN_BOUND,
    VAL_BOUND,
    chunk_documents,
    corpus_filter,
    decontaminate,
    pack_sequences,
    pii_scan,
    split_batch,
    tfidf_top_terms,
    vocab_topk,
)


def _docs(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


def doc_chunks(sf_dir: str) -> "ray.data.Dataset":
    """Sliding token windows (context-window / RAG chunk prep): pure
    flat map, one input row -> ceil((n-overlap)/stride) chunk rows,
    chunk text included so the hash check covers content."""
    return chunk_documents(_docs(sf_dir))


def sample_split(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic train/val/test assignment by multiplicative hash
    of doc_id — a pure per-row function, recomputable anywhere in the
    pipeline instead of joined."""
    return _docs(sf_dir).map_batches(split_batch, batch_format="pandas")


def split_summary(sf_dir: str) -> pd.DataFrame:
    """Per (lang, split) doc and token counts — the stratification
    check over the deterministic split (partial agg per batch, tiny
    final reduce: 4 langs x 3 splits)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = split_batch(df)
        s["lang"] = df["lang"].to_numpy()
        return (
            s.groupby(["lang", "split"], sort=False)
            .agg(n_docs=("doc_id", "size"), sum_tokens=("n_tokens", "sum"))
            .reset_index()
        )

    parts = docs.map_batches(partial, batch_format="pandas").to_pandas()
    out = (
        parts.groupby(["lang", "split"], sort=True)
        .agg(n_docs=("n_docs", "sum"), sum_tokens=("sum_tokens", "sum"))
        .reset_index()
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sum_tokens"] = out["sum_tokens"].astype("int64")
    return out


def decontaminate_train(sf_dir: str) -> "ray.data.Dataset":
    """Train-vs-eval n-gram decontamination: eval = the test split's
    distinct word-3-grams (small side, built distributedly, broadcast
    once); a train doc is contaminated when >= 50% of its distinct
    3-grams appear in the eval set."""
    return decontaminate(_docs(sf_dir), bar=0.5)


def decontaminate_bloom_train(sf_dir: str) -> "ray.data.Dataset":
    """Sketch-gated decontamination: a 128 KiB Bloom filter over the
    eval grams replaces the eval-set broadcast; Bloom-positive
    candidate grams alone flow through a distributed verify join, so
    the output is value-exact (identical SQL twin to
    decontaminate_train) while the broadcast stays O(1) in eval size."""
    from cosmwasm_etl_ray.functions.dataprep import decontaminate_bloom

    return decontaminate_bloom(_docs(sf_dir), bar=0.5)


def pii_scan_docs(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic PII plant + compiled-regex actor-pool scan and
    redaction measure."""
    return pii_scan(_docs(sf_dir))


def vocab_topk_docs(sf_dir: str) -> pd.DataFrame:
    """Top-k global token frequencies (vocab building): per-block
    value_counts combiner -> token-keyed shuffle reduce -> per-block
    top-k -> tiny driver cut."""
    return vocab_topk(_docs(sf_dir))


def pack_sequences_docs(sf_dir: str) -> "ray.data.Dataset":
    """Greedy context-window packing: serial walk per doc_id-shard,
    shard-local pack ids (cluster-size-independent layout)."""
    return pack_sequences(_docs(sf_dir))


def tfidf_top_terms_docs(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc top-3 characteristic terms by integer-exact TF-IDF rank:
    per-batch complete TF rows -> token-sharded DF reduce -> bucketed
    DF⋈TF join -> grouped_topk cut."""
    return tfidf_top_terms(_docs(sf_dir))


def corpus_filter_docs(sf_dir: str) -> "ray.data.Dataset":
    """Composed cleaning pass: keep/drop + first-failing-rule reason
    (length, language, quality, exact-dup representative)."""
    return corpus_filter(_docs(sf_dir))


ENCODE_VOCAB_K = 20  # < the corpus's 31 distinct tokens: OOV -> 0 is live


def encode_docs(sf_dir: str) -> "ray.data.Dataset":
    """Tokenize-to-ids against the LEARNED vocabulary — the last step
    before training: vocab_topk's frequency cut becomes the id table
    (token_id = 1-based frequency rank, OOV = 0), broadcast once via
    ray.put, and the corpus streams through one exploding map_batches
    emitting (doc_id, pos, token_id) rows. The vocab is small by
    construction (top-k); the big side never shuffles."""
    from cosmwasm_etl_ray.functions.dataprep import vocab_topk

    vocab = vocab_topk(_docs(sf_dir), k=ENCODE_VOCAB_K)
    ids = {t: i + 1 for i, t in enumerate(vocab["token"])}
    ref = ray.put(ids)

    def enc(df: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(ref)
        ex = df.set_index("doc_id")["text"].str.split(" ").explode()
        out = pd.DataFrame(
            {
                "doc_id": ex.index.to_numpy().astype("int64"),
                "pos": ex.groupby(level=0).cumcount().to_numpy(),
                "token_id": ex.map(lut).fillna(0).astype("int64").to_numpy(),
            }
        )
        return out

    return _docs(sf_dir).map_batches(enc, batch_format="pandas")


def cdc_chunks(sf_dir: str) -> "ray.data.Dataset":
    """Content-defined chunking: boundaries keyed on token-content
    hashes, so edits only re-chunk their neighborhood and chunk-level
    dedup survives document revisions. Pure streaming flat map."""
    from cosmwasm_etl_ray.functions.dataprep import cdc_chunk_batch

    return _docs(sf_dir).map_batches(cdc_chunk_batch, batch_format="pandas")


def shuffle_order(sf_dir: str) -> "ray.data.Dataset":
    """Reproducible global training order: position 0..N-1 by
    (shuffle_hash(doc_id, seed), doc_id) — distributed rank via
    order-preserving hash buckets (histogram pass -> driver prefix
    offsets -> per-bucket local rank), never a full sort and never
    ``random_shuffle`` (not reproducible under load)."""
    from cosmwasm_etl_ray.functions.dataprep import deterministic_shuffle

    return deterministic_shuffle(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    )


def mixture_epoch(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic pretraining mixture: per-lang epoch weights,
    fractional copies resolved by seeded hash (never RNG), one output
    row per (doc, copy) — a pure streaming flat map, zero-weight
    domains dropped at the read edge."""
    from cosmwasm_etl_ray.functions.dataprep import mixture_expand

    return mixture_expand(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
        )
    )


SAMPLE_SEED = 29
SAMPLE_K = 40
TOPK_PER_DOMAIN = 25


def stratified_sample(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic k-per-domain sample: the k smallest seeded hashes
    per lang (a hash-rank reservoir — reproducible, order-free, and a
    pure combiner: each block keeps <= k rows per lang before the
    candidates-only exchange)."""
    from cosmwasm_etl_ray.functions.agg import grouped_topk
    from cosmwasm_etl_ray.functions.dataprep import shuffle_hash

    def add_h(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": df["lang"].to_numpy(),
                "doc_id": df["doc_id"].astype("int64").to_numpy(),
                "_h": shuffle_hash(df["doc_id"].to_numpy(), SAMPLE_SEED),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).map_batches(add_h, batch_format="pandas")
    out = grouped_topk(ds, "lang", ["_h", "doc_id"], SAMPLE_K)
    return out.map_batches(
        lambda df: df[["lang", "doc_id"]], batch_format="pandas"
    )


def domain_topk(sf_dir: str) -> "ray.data.Dataset":
    """Per-domain curation cut: the k largest docs per lang by
    (n_chars desc, doc_id asc) — the 'keep the best per domain'
    selection, same combiner shape as stratified_sample."""
    from cosmwasm_etl_ray.functions.agg import grouped_topk

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    return grouped_topk(
        ds, "lang", ["n_chars", "doc_id"], TOPK_PER_DOMAIN,
        ascending=[False, True],
    )


def domain_quantiles(sf_dir: str) -> "ray.data.Dataset":
    """Exact per-domain length quantiles (corpus profiling / filter
    calibration): (group, value)-count combiner -> candidates-only
    exchange -> integer-exact discrete quantile walk."""
    from cosmwasm_etl_ray.functions.agg import grouped_quantiles

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )
    return grouped_quantiles(ds, "lang", "n_chars", [50, 90, 99])


def domain_quantiles_cont(sf_dir: str) -> "ray.data.Dataset":
    """Interpolated (quantile_cont) per-domain quantiles over the same
    (group, value)-count combiner as the discrete variant: the
    straddling order statistics are selected by EXACT integer position
    arithmetic (q·(n-1) split by //100 and %100 — a float position can
    misselect on an epsilon), only the final interpolation runs in
    float, which the gate rounds to 4dp."""
    from cosmwasm_etl_ray.functions.agg import grouped_quantiles

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )
    return grouped_quantiles(ds, "lang", "n_chars", [25, 50, 75, 90], mode="cont")


def pretrain_chunks(sf_dir: str, doc_pred=None) -> "ray.data.Dataset":
    """The composed flagship prep pipeline — what a pretraining run
    actually executes before tokenization: clean (corpus_filter's
    keep/drop rules) -> keep only the train split (the split is a pure
    function of doc_id, so it's a row filter, never a join) ->
    content-defined chunking of the survivors. One hash join total
    (keep decisions back to the text column); every other step
    streams. Output = the train-ready chunk rows.

    ``doc_pred(doc_id_array) -> bool mask``, if given, restricts the
    output to matching docs and is pushed onto BOTH join inputs — the
    cleaning decisions still run corpus-wide (the exact-dup winner is
    a corpus-wide min by definition), but the text payload, the join,
    and the chunking only touch selected docs. This is the resume
    lever corpus_export uses to skip committed shards."""
    from cosmwasm_etl_ray.functions.dataprep import (
        cdc_chunk_batch,
        split_bucket,
    )
    from cosmwasm_etl_ray.functions.joins import hash_join

    decisions = corpus_filter(_docs(sf_dir))

    def keep_train(df: pd.DataFrame) -> pd.DataFrame:
        m = df["keep"].to_numpy() & (
            split_bucket(df["doc_id"].to_numpy()) < TRAIN_BOUND
        )
        if doc_pred is not None:
            m &= doc_pred(df["doc_id"].to_numpy())
        return df.loc[m, ["doc_id"]].astype({"doc_id": "int64"})

    ids = decisions.map_batches(keep_train, batch_format="pandas")
    docs = _docs(sf_dir)
    if doc_pred is not None:

        def prefilter(df: pd.DataFrame) -> pd.DataFrame:
            return df[doc_pred(df["doc_id"].to_numpy())]

        docs = docs.map_batches(prefilter, batch_format="pandas")
    survivors = hash_join(
        docs,
        ids,
        on="doc_id",
        left_cols={"doc_id": "int64", "text": "object"},
        right_cols={"doc_id": "int64"},
    )
    return survivors.map_batches(cdc_chunk_batch, batch_format="pandas")


def pretrain_corpus(sf_dir: str) -> "ray.data.Dataset":
    """The gate row: the full composed pipeline (no doc predicate)."""
    return pretrain_chunks(sf_dir)


def bpe_pair_counts(sf_dir: str) -> "ray.data.Dataset":
    """Round-0 BPE pair statistics through the gate: distributed
    word-frequency table (map Counters -> shuffle grouped sum, the
    exact machinery bpe_train builds on) -> weighted adjacent-char
    pair counts, thresholded (no LIMIT, no tie hazard). Full-value
    DuckDB twin regenerates the same counts via regexp word
    extraction and a position-range explode."""
    from cosmwasm_etl_ray.functions.bpe import pair_counts

    return pair_counts(_docs(sf_dir), min_count=40)


def bpe_merges(sf_dir: str) -> pd.DataFrame:
    """Distributed BPE training (15 merges over the sharded-actor
    distinct-word table; exact global argmax per round, deterministic
    tie-break). Full-value gated: the DuckDB twin (bpe_train_sql) is
    a GENERATED 15-round CTE chain that re-derives each round's
    argmax and replace-applies it over a boundary-anchored ``|tok|``
    symbolization — the iterative train restated as SQL, not a
    rows-only check. The serial clean-room reference in
    tests/test_bpe.py additionally pins the engine."""
    from cosmwasm_etl_ray.functions.bpe import bpe_train

    return bpe_train(_docs(sf_dir), n_merges=15)


def bpe_encode_fixed_q(sf_dir: str) -> "ray.data.Dataset":
    """BPE ENCODING under the gate, exactly: tokenize with the fixed
    demo tokenizer (functions/bpe.py FIXED_MERGES — multi-level
    merges, sequential rank-order apply). The DuckDB twin is GENERATED
    from the same constant (chained replace() over spaced chars, the
    exact left-to-right non-overlapping semantics), so the serving
    path of a trained tokenizer is full-value hash-gated even though
    training itself is iterative."""
    from cosmwasm_etl_ray.functions.bpe import bpe_encode_fixed

    return bpe_encode_fixed(_docs(sf_dir))


def doc_fluency_q(sf_dir: str) -> "ray.data.Dataset":
    """Model-based quality scoring through the gate, the CCNet
    perplexity-filter shape made integer-exact: pass 1 trains the
    corpus char-bigram model (distributed pair counts, alphabet-
    bounded), pass 2 broadcasts it (ray.put once) and scores every
    doc as the sum of model counts over its in-word adjacent pairs.
    The twin recomputes model and scores in SQL (self-join) — exact
    integers, no float-perplexity hash hazard."""
    from cosmwasm_etl_ray.functions.bpe import doc_fluency

    return doc_fluency(_docs(sf_dir))


QUERIES = {
    "doc_chunks": doc_chunks,
    "bpe_pair_counts": bpe_pair_counts,
    "bpe_merges": bpe_merges,
    "bpe_encode_fixed": bpe_encode_fixed_q,
    "doc_fluency": doc_fluency_q,
    "pretrain_corpus": pretrain_corpus,
    "cdc_chunks": cdc_chunks,
    "encode_docs": encode_docs,
    "shuffle_order": shuffle_order,
    "mixture_epoch": mixture_epoch,
    "stratified_sample": stratified_sample,
    "domain_topk": domain_topk,
    "domain_quantiles": domain_quantiles,
    "domain_quantiles_cont": domain_quantiles_cont,
    "corpus_filter": corpus_filter_docs,
    "sample_split": sample_split,
    "split_summary": split_summary,
    "decontaminate_train": decontaminate_train,
    "decontaminate_bloom": decontaminate_bloom_train,
    "pii_scan": pii_scan_docs,
    "vocab_topk": vocab_topk_docs,
    "tfidf_top_terms": tfidf_top_terms_docs,
    "pack_sequences": pack_sequences_docs,
}


# bucket = (doc_id * SPLIT_MULT) % 2^32 % 100, exact via HUGEINT
_BUCKET = (
    f"CAST(CAST(doc_id AS HUGEINT) * {SPLIT_MULT} % 4294967296 % 100 AS BIGINT)"
)

# (doc_id, gram) distinct word-3-grams with the split bucket attached
_GRAMS_CTE = f"""
WITH tok AS (
    SELECT doc_id, {_BUCKET} AS bucket, string_split(text, ' ') AS t
    FROM documents
),
grams AS (
    SELECT DISTINCT doc_id, bucket,
           t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
    FROM tok, LATERAL (
        SELECT unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
    ) s
)
"""

# The content-defined-chunking walk restated in SQL, parameterized on
# the source relation (``documents`` for cdc_chunks, the cleaned train
# survivors for pretrain_corpus): the token polynomial uses the SAME
# modular power table (positions wrap past 48); a boundary falls AFTER
# a token whose hash % 8 == 0; chunk_id = boundaries strictly before
# the token.
_CDC_BODY = """tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM {CDC_SRC}),
pos AS (
    SELECT doc_id, s.i AS i, t[s.i] AS w,
           COALESCE(list_sum(list_transform(range(1, length(t[s.i]) + 1),
               j -> CAST(unicode(t[s.i][j]) AS BIGINT)
                    * ([1, 1000003, 1426104154, 1049561761, 1604566856, 1953433226, 2061642598, 57298384, 1544709545, 1274554124, 633364108, 66148026, 1433149184, 206851044, 1744706798, 1828017126, 777862745, 1404488248, 1649104745, 1165208113, 2014147668, 880634293, 1135908413, 345644589, 1690498176, 1973092481, 1162832078, 1088933145, 1141496910, 1106960586, 511362668, 1101097070, 1755612077, 70289850, 773619593, 1667445264, 81400643, 519562394, 1759132002, 280152192, 905803544, 1954073326, 65952445, 1272574318, 801347224, 1072778093, 1560508135, 874758915])[((j - 1) % 48) + 1]
           )), 0) % 2147483647 AS th
    FROM tok, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) s
),
marked AS (
    SELECT doc_id, i, w,
           COALESCE(sum(CASE WHEN th % 8 = 0 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY i
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS chunk_id
    FROM pos
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       string_agg(w, ' ' ORDER BY i) AS chunk_text,
       CAST(count(*) AS BIGINT) AS n_tokens
FROM marked GROUP BY doc_id, chunk_id
"""

from cosmwasm_etl_ray.functions.bpe import (
    bpe_train_sql as _bpe_train_sql,
    fixed_merges_sql as _fixed_merges_sql,
)

ORACLE_SQL = {
    # BPE encode with the fixed tokenizer: twin GENERATED from
    # FIXED_MERGES (chained replace over the boundary-anchored |tok|
    # encoding) — one constant drives both sides
    "bpe_encode_fixed": _fixed_merges_sql(),
    # Distributed BPE training: the iterative argmax chain restated
    # as a generated 15-round CTE chain (see bpe_train_sql) — the
    # last rows-only gate entry upgraded to full-value
    "bpe_merges": _bpe_train_sql(n_merges=15, min_freq=2),
    # Model-based fluency twin: the bigram model and the per-doc
    # scores both recomputed in SQL (docs with no [a-z] pairs keep
    # n_pairs = fluency = 0 via the LEFT JOINs)
    "doc_fluency": """
WITH words AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
    FROM documents
), capped AS (
    SELECT doc_id, substr(w, 1, 30) AS w FROM words WHERE len(w) >= 2
), pairs AS (
    SELECT doc_id, substr(w, t.i + 1, 2) AS p
    FROM capped CROSS JOIN range(29) t(i)
    WHERE t.i < len(w) - 1
), model AS (
    SELECT p, count(*) AS c FROM pairs GROUP BY p
)
SELECT d.doc_id,
       CAST(count(p.p) AS BIGINT) AS n_pairs,
       CAST(COALESCE(sum(m.c), 0) AS BIGINT) AS fluency
FROM documents d
LEFT JOIN pairs p ON p.doc_id = d.doc_id
LEFT JOIN model m ON m.p = p.p
GROUP BY d.doc_id
""",
    # Round-0 BPE pair counts: words = lowercase [a-z]+ runs capped at
    # 30 chars (range(29) positions), adjacent chars counted per
    # OCCURRENCE (the engine's word-freq weighting collapses to the
    # same counts); threshold matches min_count=40
    "bpe_pair_counts": """
WITH words AS (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
    FROM documents
), wt AS (
    SELECT substr(w, 1, 30) AS w FROM words WHERE len(w) >= 2
), pairs AS (
    SELECT substr(wt.w, t.i + 1, 1) AS left_ch,
           substr(wt.w, t.i + 2, 1) AS right_ch
    FROM wt CROSS JOIN range(29) t(i)
    WHERE t.i < len(wt.w) - 1
)
SELECT left_ch, right_ch, CAST(count(*) AS BIGINT) AS cnt
FROM pairs GROUP BY left_ch, right_ch HAVING count(*) >= 40
""",
    "doc_chunks": f"""
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS t,
           len(string_split(text, ' ')) AS n_tok
    FROM documents
),
plan AS (
    SELECT doc_id, t, n_tok,
           CASE WHEN n_tok <= {CHUNK_SIZE} THEN 1
                ELSE CAST(ceil((n_tok - {CHUNK_SIZE}) / {CHUNK_STRIDE}.0) AS BIGINT) + 1
           END AS n_chunks
    FROM tok
)
SELECT doc_id,
       gs.chunk_id,
       CAST(least({CHUNK_SIZE}, n_tok - gs.chunk_id * {CHUNK_STRIDE}) AS BIGINT)
           AS n_chunk_tokens,
       array_to_string(
           list_slice(t, gs.chunk_id * {CHUNK_STRIDE} + 1,
                         gs.chunk_id * {CHUNK_STRIDE} + {CHUNK_SIZE}), ' ')
           AS chunk_text
FROM plan, LATERAL (
    SELECT unnest(generate_series(0, n_chunks - 1)) AS chunk_id
) gs
""",
    "domain_quantiles": """
SELECT lang,
       CAST(quantile_disc(n_chars, 0.50) AS BIGINT) AS p50,
       CAST(quantile_disc(n_chars, 0.90) AS BIGINT) AS p90,
       CAST(quantile_disc(n_chars, 0.99) AS BIGINT) AS p99
FROM documents GROUP BY lang
""",
    "domain_quantiles_cont": """
SELECT lang,
       quantile_cont(n_chars, 0.25) AS p25,
       quantile_cont(n_chars, 0.50) AS p50,
       quantile_cont(n_chars, 0.75) AS p75,
       quantile_cont(n_chars, 0.90) AS p90
FROM documents GROUP BY lang
""",
    # the learned vocab restated: id = 1-based rank by (count desc,
    # token asc) over the SAME top-k cut; OOV tokens encode to 0
    "encode_docs": """
WITH vocab AS (
    SELECT token,
           row_number() OVER (ORDER BY n DESC, token ASC) AS token_id
    FROM (
        SELECT token, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token ORDER BY n DESC, token ASC LIMIT 20
    )
),
tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pos AS (
    SELECT doc_id, s.i - 1 AS pos, t[s.i] AS w
    FROM tok, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) s
)
SELECT p.doc_id, CAST(p.pos AS BIGINT) AS pos,
       CAST(COALESCE(v.token_id, 0) AS BIGINT) AS token_id
FROM pos p LEFT JOIN vocab v ON v.token = p.w
""",
    "cdc_chunks": None,  # assigned below from _CDC_BODY
    # k smallest seeded hashes per lang == row_number over the same key
    "stratified_sample": f"""
SELECT lang, doc_id FROM (
    SELECT lang, doc_id,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY CAST(CAST(doc_id + {SAMPLE_SEED} AS HUGEINT)
                             * 2654435761 % 4294967296 AS BIGINT),
                        doc_id
           ) AS rn
    FROM documents
) WHERE rn <= {SAMPLE_K}
""",
    "domain_topk": f"""
SELECT doc_id, lang, n_chars FROM (
    SELECT doc_id, lang, n_chars,
           row_number() OVER (
               PARTITION BY lang ORDER BY n_chars DESC, doc_id
           ) AS rn
    FROM documents
) WHERE rn <= {TOPK_PER_DOMAIN}
""",
    # the mixture restated: weights as (base, centibucket frac) VALUES,
    # +1 copy when the seeded hash bucket < frac, copies unrolled by
    # generate_series; unknown langs default to weight 1.0 (LEFT JOIN
    # + COALESCE mirrors the engine's dict .get default)
    "mixture_epoch": """
WITH w(lang, base, frac_e2) AS (
    VALUES ('en', 2, 25), ('de', 1, 0), ('fr', 0, 50),
           ('es', 1, 50), ('zh', 0, 0)
),
n AS (
    SELECT d.doc_id, d.lang,
           COALESCE(w.base, 1)
           + CASE WHEN CAST(CAST(d.doc_id + 101 AS HUGEINT) * 2654435761
                            % 4294967296 % 100 AS BIGINT)
                       < COALESCE(w.frac_e2, 0)
                  THEN 1 ELSE 0 END AS n_copies
    FROM documents d LEFT JOIN w ON w.lang = d.lang
)
SELECT n.doc_id, n.lang, CAST(g.copy_idx AS BIGINT) AS copy_idx
FROM n, LATERAL (
    SELECT unnest(generate_series(0, n_copies - 1)) AS copy_idx
) g
""",
    # the shuffle key restated exactly (HUGEINT, wrap-free), position =
    # dense rank over (key, doc_id) — the engine's bucketed rank must
    # equal the one-shot window function
    "shuffle_order": """
SELECT doc_id,
       row_number() OVER (
           ORDER BY CAST(CAST(doc_id + 17 AS HUGEINT) * 2654435761
                         % 4294967296 AS BIGINT),
                    doc_id
       ) - 1 AS pos
FROM documents
""",
    "sample_split": f"""
SELECT doc_id,
       CASE WHEN {_BUCKET} < {TRAIN_BOUND} THEN 'train'
            WHEN {_BUCKET} < {VAL_BOUND} THEN 'val'
            ELSE 'test' END AS split,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
           AS n_tokens
FROM documents
""",
    "split_summary": f"""
SELECT lang,
       CASE WHEN {_BUCKET} < {TRAIN_BOUND} THEN 'train'
            WHEN {_BUCKET} < {VAL_BOUND} THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT)
           AS sum_tokens
FROM documents
GROUP BY 1, 2
""",
    "decontaminate_train": _GRAMS_CTE
    + f"""
, eval_grams AS (
    SELECT DISTINCT gram FROM grams WHERE bucket >= {VAL_BOUND}
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN gram IN (SELECT gram FROM eval_grams)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       sum(CASE WHEN gram IN (SELECT gram FROM eval_grams)
                THEN 1 ELSE 0 END) >= 0.5 * count(*) AS contaminated
FROM grams
WHERE bucket < {TRAIN_BOUND}
GROUP BY doc_id
""",
    "corpus_filter": """
WITH q AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tok,
           CAST(len(list_filter(string_split(text, ' '),
                    x -> list_contains(['the','a','of','to','and'], x)))
               AS DOUBLE) / len(string_split(text, ' ')) AS stop_ratio,
           substr(text, 1, 20) AS key20
    FROM documents
),
l AS (
    {LANG_SQL}
),
w AS (
    SELECT key20, min(doc_id) AS keep_doc_id FROM q GROUP BY key20
)
SELECT doc_id,
       reason = 'ok' AS keep,
       reason
FROM (
    SELECT q.doc_id,
           CASE WHEN q.n_tok < 20 THEN 'too_short'
                WHEN l.lang_pred <> 'en' THEN 'non_english'
                WHEN q.stop_ratio < 0.02 THEN 'low_quality'
                WHEN q.doc_id <> w.keep_doc_id THEN 'exact_dup'
                ELSE 'ok' END AS reason
    FROM q
    JOIN l USING (doc_id)
    JOIN w USING (key20)
) v
""",
    "vocab_topk": f"""
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT {TOPK_VOCAB}
""",
    # integer-exact TF-IDF rank: score = tf * SCALE // df (the corpus
    # constant N and the ln of classic tf*ln(N/df) cancel/are dropped
    # so the twin is bit-exact — // truncation matches numpy on the
    # all-positive operands)
    "tfidf_top_terms": f"""
WITH tf AS (
    SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents)
    GROUP BY doc_id, token
),
dfr AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
ranked AS (
    SELECT tf.doc_id, tf.token, tf.tf, dfr.df,
           tf.tf * {TFIDF_SCALE} // dfr.df AS score,
           row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf * {TFIDF_SCALE} // dfr.df DESC, tf.token ASC
           ) AS rn
    FROM tf JOIN dfr USING (token)
)
SELECT doc_id, token, tf, df, CAST(score AS BIGINT) AS score
FROM ranked WHERE rn <= {TFIDF_TOPK}
""",
    # the greedy per-shard walk restated as a recursive CTE: one row
    # per shard advances per step, carrying (pack_id, fill) — the
    # transition is exactly the engine's "overflow closes the pack"
    "pack_sequences": f"""
WITH RECURSIVE docs AS (
    SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
           CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
               AS n_tokens,
           row_number() OVER (PARTITION BY doc_id % {PACK_SHARDS}
                              ORDER BY doc_id) AS rn
    FROM documents
),
walk AS (
    SELECT shard, rn, doc_id, n_tokens,
           CAST(0 AS BIGINT) AS pack_id, n_tokens AS fill
    FROM docs WHERE rn = 1
    UNION ALL
    SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
           CASE WHEN w.fill + d.n_tokens > {PACK_CAPACITY}
                THEN w.pack_id + 1 ELSE w.pack_id END,
           CASE WHEN w.fill + d.n_tokens > {PACK_CAPACITY}
                THEN d.n_tokens ELSE w.fill + d.n_tokens END
    FROM walk w JOIN docs d ON d.shard = w.shard AND d.rn = w.rn + 1
)
SELECT doc_id, shard, pack_id, n_tokens FROM walk
""",
    "pii_scan": f"""
WITH aug AS (
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 7 = 0
                   THEN ' contact-' || doc_id || '@example.com' ELSE '' END
           || CASE WHEN doc_id % 11 = 0
                   THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   ELSE '' END AS text
    FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(length(
           regexp_replace(
               regexp_replace(text, '{EMAIL_RE}', '{REDACTION}', 'g'),
               '{PHONE_RE}', '{REDACTION}', 'g')
       ) AS BIGINT) AS clean_chars
FROM aug
""",
}

# splice the shared LangId CASE expression (the same profiles the
# engine's actor compiles) into the corpus_filter twin
from cosmwasm_etl_ray.pipelines.queries_textml import _lang_case_sql  # noqa: E402

ORACLE_SQL["corpus_filter"] = ORACLE_SQL["corpus_filter"].replace(
    "{LANG_SQL}", _lang_case_sql().strip()
)

ORACLE_SQL["cdc_chunks"] = "WITH " + _CDC_BODY.format(CDC_SRC="documents")

# the sketch path must produce the EXACT same rows — one twin, two
# physical plans (broadcast-exact vs bloom-prune + verify join)
ORACLE_SQL["decontaminate_bloom"] = ORACLE_SQL["decontaminate_train"]

# the composition restated: the corpus_filter twin as a CTE, the split
# bucket as a WHERE, then the SAME cdc walk over the survivors
ORACLE_SQL["pretrain_corpus"] = (
    f"""WITH cf AS ({ORACLE_SQL['corpus_filter']}),
survivors AS (
    SELECT doc_id, text
    FROM documents JOIN cf USING (doc_id)
    WHERE cf.keep AND {_BUCKET} < {TRAIN_BOUND}
),
"""
    + _CDC_BODY.format(CDC_SRC="survivors")
)
