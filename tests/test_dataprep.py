"""Data-prep operator family: chunking, deterministic splits,
decontamination, PII scan — unit semantics plus the oracle-shape
invariants the driver gate relies on."""

import numpy as np
import pandas as pd
import ray.data

from cosmwasm_etl_ray.functions.dataprep import (
    ContaminationScorer,
    PiiScanner,
    chunk_batch,
    eval_gram_set,
    inject_pii_batch,
    split_batch,
    split_bucket,
)
from cosmwasm_etl_ray.pipelines.queries_dataprep import (
    doc_chunks,
    decontaminate_train,
    sample_split,
)


def _df(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"), "text": texts})


# ------------------------------------------------------------- chunking


def test_chunk_short_doc_single_chunk():
    out = chunk_batch(_df(["a b c"]), chunk_size=4, stride=3)
    assert len(out) == 1
    assert out.loc[0, "chunk_text"] == "a b c"
    assert out.loc[0, "n_chunk_tokens"] == 3


def test_chunk_windows_cover_and_overlap():
    toks = [f"t{i}" for i in range(10)]
    out = chunk_batch(_df([" ".join(toks)]), chunk_size=4, stride=3)
    # starts 0,3,6 then the last window must reach the end: ceil(6/3)+1 = 3
    assert list(out["chunk_id"]) == [0, 1, 2]
    assert out.loc[0, "chunk_text"] == "t0 t1 t2 t3"
    assert out.loc[1, "chunk_text"] == "t3 t4 t5 t6"
    assert out.loc[2, "chunk_text"] == "t6 t7 t8 t9"
    # reassembling chunk texts with stride-overlap dedup gives the doc back
    assert out.loc[2, "n_chunk_tokens"] == 4


def test_chunk_exact_boundary_no_empty_tail():
    # n == chunk_size + stride: exactly 2 chunks, no empty third
    toks = [f"w{i}" for i in range(7)]
    out = chunk_batch(_df([" ".join(toks)]), chunk_size=4, stride=3)
    assert list(out["chunk_id"]) == [0, 1]
    assert out.loc[1, "chunk_text"] == "w3 w4 w5 w6"


def test_chunk_offsets_match_token_join():
    # char-offset slicing must equal ' '.join of the token window
    texts = ["alpha bb c dddd ee fff gg", "x", ""]
    out = chunk_batch(_df(texts), chunk_size=3, stride=2)
    for _, r in out.iterrows():
        toks = texts[int(r["doc_id"])].split(" ")
        s = int(r["chunk_id"]) * 2
        assert r["chunk_text"] == " ".join(toks[s : s + 3])


# ---------------------------------------------------------------- splits


def test_split_bucket_is_deterministic_and_exact():
    ids = np.array([0, 1, 2, 12345, 10**9], dtype=np.int64)
    b = split_bucket(ids)
    expect = [(int(i) * 2654435761) % (2**32) % 100 for i in ids]
    assert list(b) == expect


def test_split_batch_assignment_bounds():
    df = _df(["a b"] * 200, ids=list(range(200)))
    out = split_batch(df)
    assert set(out["split"]) <= {"train", "val", "test"}
    frac_train = (out["split"] == "train").mean()
    assert 0.6 < frac_train < 0.95  # ~0.8 by construction
    assert (out["n_tokens"] == 2).all()


# ------------------------------------------------------- decontamination


def test_contamination_scorer_counts_distinct_gram_hits():
    # train doc 0: grams {a b c, b c d}; eval grams contain 'a b c' only
    eval_grams = np.sort(np.array(["a b c"], dtype=object))
    # choose an id that lands in the train bucket
    tid = next(i for i in range(100) if split_bucket(np.array([i]))[0] < 80)
    scorer = ContaminationScorer(eval_grams, bar=0.5)
    out = scorer(_df(["a b c d"], ids=[tid]))
    assert len(out) == 1
    assert out.loc[0, "n_grams"] == 2
    assert out.loc[0, "n_hit"] == 1
    assert bool(out.loc[0, "contaminated"])  # 1 >= 0.5 * 2


def test_contamination_gramless_and_eval_rows_dropped():
    tid = next(i for i in range(100) if split_bucket(np.array([i]))[0] < 80)
    eid = next(i for i in range(100) if split_bucket(np.array([i]))[0] >= 90)
    scorer = ContaminationScorer(np.array(["x y z"], dtype=object), bar=0.5)
    # 2-token doc has no 3-grams; eval doc is excluded from scoring
    out = scorer(_df(["a b", "x y z x y z"], ids=[tid, eid]))
    assert len(out) == 0


def test_eval_gram_set_distributed(ray_session):
    eid = next(i for i in range(100) if split_bucket(np.array([i]))[0] >= 90)
    tid = next(i for i in range(100) if split_bucket(np.array([i]))[0] < 80)
    ds = ray.data.from_pandas(_df(["p q r s", "train only text"], ids=[eid, tid]))
    grams = eval_gram_set(ds)
    assert list(grams) == ["p q r", "q r s"]


# ------------------------------------------------------------------ PII


def test_pii_inject_and_scan_roundtrip():
    # id 0: both email (0%7==0) and phone (0%11==0); id 1: neither
    df = inject_pii_batch(_df(["hello world", "plain doc"], ids=[0, 1]))
    assert "contact-0@example.com" in df.loc[0, "text"]
    assert "555-0000" in df.loc[0, "text"]
    assert df.loc[1, "text"] == "plain doc"
    out = PiiScanner()(df)
    assert out.loc[0, "n_emails"] == 1
    assert out.loc[0, "n_phones"] == 1
    assert out.loc[1, "n_emails"] == 0
    # redaction replaced both matches with [PII]
    clean = len("hello world contact-0@example.com call 555-0000".replace(
        "contact-0@example.com", "[PII]").replace("555-0000", "[PII]"))
    assert out.loc[0, "clean_chars"] == clean


# ------------------------------------------- end-to-end over testdata


def test_dataprep_queries_end_to_end(ray_session, sf_dir):
    chunks = doc_chunks(sf_dir).to_pandas()
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet").to_pandas()
    assert chunks["doc_id"].nunique() == len(docs)
    # every doc's token count is recoverable from its chunk plan
    g = chunks.groupby("doc_id")
    n_chunks = g.size()
    last_tok = g["n_chunk_tokens"].last()
    n_tok = docs.set_index("doc_id")["text"].str.count(" ") + 1
    recovered = (n_chunks - 1) * 12 + last_tok
    assert (recovered == n_tok.reindex(recovered.index)).all()

    splits = sample_split(sf_dir).to_pandas()
    assert len(splits) == len(docs)

    cont = decontaminate_train(sf_dir).to_pandas()
    train_ids = splits.loc[splits["split"] == "train", "doc_id"]
    with_grams = n_tok.reindex(train_ids).ge(3)
    assert len(cont) == int(with_grams.sum())
    assert (cont["n_hit"] <= cont["n_grams"]).all()


# -------------------------------------------------- vocab + packing


def test_vocab_topk_counts_and_tiebreak(ray_session):
    ds = ray.data.from_pandas(_df(["b a a", "b c", "c b"]))
    from cosmwasm_etl_ray.functions.dataprep import vocab_topk

    out = vocab_topk(ds, k=2)
    # counts: a=2, b=3, c=2 -> top2 = b(3), then tie a/c broken asc -> a
    assert list(out["token"]) == ["b", "a"]
    assert list(out["n"]) == [3, 2]


def test_pack_sequences_greedy_overflow(ray_session):
    from cosmwasm_etl_ray.functions.dataprep import pack_sequences

    # one shard (shards=1): docs of 3,3,3 tokens, capacity 7:
    # pack0 = [d0(3), d1(3)] (fill 6), d2 overflows -> pack1
    ds = ray.data.from_pandas(_df(["a b c", "d e f", "g h i"]))
    out = pack_sequences(ds, capacity=7, shards=1).to_pandas().sort_values("doc_id")
    assert list(out["pack_id"]) == [0, 0, 1]
    # oversized doc gets its own pack
    ds2 = ray.data.from_pandas(_df(["a b", " ".join(["w"] * 10), "c d"]))
    out2 = pack_sequences(ds2, capacity=5, shards=1).to_pandas().sort_values("doc_id")
    assert list(out2["pack_id"]) == [0, 1, 2]


def test_pack_sequences_respects_capacity(ray_session, sf_dir):
    from cosmwasm_etl_ray.functions.dataprep import pack_sequences

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    out = pack_sequences(docs).to_pandas()
    fills = out.groupby(["shard", "pack_id"])["n_tokens"].sum()
    singles = out.groupby(["shard", "pack_id"])["n_tokens"].size()
    # a pack over capacity must be a single oversized doc
    assert ((fills <= 128) | (singles == 1)).all()


def test_corpus_filter_reasons(ray_session, sf_dir):
    from cosmwasm_etl_ray.pipelines.queries_dataprep import corpus_filter_docs

    out = corpus_filter_docs(sf_dir).to_pandas()
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet").to_pandas()
    assert len(out) == len(docs)
    assert set(out["reason"]) <= {"ok", "too_short", "non_english",
                                  "low_quality", "exact_dup"}
    assert (out["keep"] == (out["reason"] == "ok")).all()
    # first-rule-wins: every too_short doc really is < 20 tokens
    n_tok = docs.set_index("doc_id")["text"].str.count(" ") + 1
    short = out.loc[out["reason"] == "too_short", "doc_id"]
    assert (n_tok.reindex(short) < 20).all()
    # exact_dup rows are never the min doc_id of their prefix group
    key20 = docs.set_index("doc_id")["text"].str.slice(0, 20)
    dup = out.loc[out["reason"] == "exact_dup", "doc_id"]
    for d in dup:
        grp = key20[key20 == key20.loc[d]].index
        assert d != grp.min()


# -------------------------------------------- deterministic global shuffle


def test_shuffle_order_is_exact_global_rank(ray_session):
    from cosmwasm_etl_ray.functions.dataprep import (
        deterministic_shuffle,
        shuffle_hash,
    )

    ids = np.arange(1, 1001, dtype=np.int64) * 3  # gaps: ids need not be dense
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ids})).repartition(7)
    out = deterministic_shuffle(ds, buckets=64, shards=8).to_pandas()
    # a permutation of 0..N-1
    assert sorted(out["pos"]) == list(range(len(ids)))
    # equal to the one-shot rank by (hash, id)
    h = shuffle_hash(ids)
    order = np.lexsort((ids, h))
    expect_pos = np.empty(len(ids), dtype=np.int64)
    expect_pos[order] = np.arange(len(ids))
    got = out.sort_values("doc_id").reset_index(drop=True)
    assert (got["pos"].to_numpy() == expect_pos).all()


def test_shuffle_order_param_independent(ray_session):
    from cosmwasm_etl_ray.functions.dataprep import deterministic_shuffle

    ids = np.arange(500, dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids})
    a = deterministic_shuffle(
        ray.data.from_pandas(df).repartition(3), buckets=32, shards=4
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = deterministic_shuffle(
        ray.data.from_pandas(df).repartition(11), buckets=256, shards=16
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (a["pos"].to_numpy() == b["pos"].to_numpy()).all()


def test_shuffle_order_seed_changes_permutation(ray_session):
    from cosmwasm_etl_ray.functions.dataprep import deterministic_shuffle

    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64)})
    a = deterministic_shuffle(ray.data.from_pandas(df), seed=17).to_pandas()
    b = deterministic_shuffle(ray.data.from_pandas(df), seed=18).to_pandas()
    a = a.sort_values("doc_id")["pos"].to_numpy()
    b = b.sort_values("doc_id")["pos"].to_numpy()
    assert sorted(a) == sorted(b)
    assert (a != b).any()


# ------------------------------------------------- deterministic mixture


def test_mixture_copies_semantics():
    from cosmwasm_etl_ray.functions.dataprep import mixture_copies

    ids = np.arange(1000, dtype=np.int64)
    n_en = mixture_copies(ids, np.array(["en"] * 1000, dtype=object),
                          {"en": 2.25})
    assert set(np.unique(n_en)) <= {2, 3}
    assert 0.15 < (n_en == 3).mean() < 0.35  # ~25% get the extra copy
    n_zh = mixture_copies(ids, np.array(["zh"] * 1000, dtype=object),
                          {"zh": 0.0})
    assert (n_zh == 0).all()
    # unknown lang defaults to weight 1.0 (exactly one copy)
    n_unk = mixture_copies(ids, np.array(["xx"] * 1000, dtype=object), {})
    assert (n_unk == 1).all()


def test_mixture_expand_copy_indices(ray_session):
    from cosmwasm_etl_ray.functions.dataprep import (
        mixture_copies,
        mixture_expand,
    )

    df = pd.DataFrame(
        {
            "doc_id": np.arange(200, dtype=np.int64),
            "lang": np.tile(np.array(["en", "de", "fr", "zh"], dtype=object), 50),
        }
    )
    out = (
        mixture_expand(ray.data.from_pandas(df).repartition(5))
        .to_pandas()
        .sort_values(["doc_id", "copy_idx"])
        .reset_index(drop=True)
    )
    # per-doc copy_idx is 0..n-1 and n matches mixture_copies exactly
    expect = mixture_copies(
        df["doc_id"].to_numpy(), df["lang"].to_numpy(),
        __import__("cosmwasm_etl_ray.functions.dataprep",
                   fromlist=["MIX_WEIGHTS"]).MIX_WEIGHTS,
    )
    got_counts = out.groupby("doc_id")["copy_idx"].agg(["size", "min", "max"])
    nonzero = expect > 0
    assert (got_counts["size"].to_numpy()
            == expect[nonzero]).all()
    assert (got_counts["min"] == 0).all()
    assert (got_counts["max"].to_numpy() == expect[nonzero] - 1).all()
    assert not set(df.loc[df["lang"] == "zh", "doc_id"]) & set(out["doc_id"])


# --------------------------------------- content-defined chunking (CDC)


def test_cdc_chunks_cover_and_are_insertion_stable():
    from cosmwasm_etl_ray.functions.dataprep import cdc_chunk_batch

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    base = cdc_chunk_batch(_df([text]))
    # chunks reassemble the doc exactly, ids contiguous from 0
    joined = " ".join(base.sort_values("chunk_id")["chunk_text"])
    assert joined == text
    assert list(base["chunk_id"]) == list(range(len(base)))
    assert int(base["n_tokens"].sum()) == len(text.split(" "))

    # content-defined: a PREFIX edit leaves every downstream boundary
    # intact — the suffix chunk set is unchanged (what fixed-stride
    # chunking cannot do)
    edited = cdc_chunk_batch(_df(["XX YY " + text]))
    tail = set(base["chunk_text"]) - {base["chunk_text"].iloc[0]}
    assert tail <= set(edited["chunk_text"])


def test_cdc_chunk_empty_and_single_token():
    from cosmwasm_etl_ray.functions.dataprep import cdc_chunk_batch

    out = cdc_chunk_batch(_df(["", "solo"]))
    assert list(out["doc_id"]) == [0, 1]
    assert (out["chunk_id"] == 0).all()
    assert list(out["chunk_text"]) == ["", "solo"]


# ------------------------------------------------------- token encoding


def test_encode_docs_round_trip(ray_session, sf_dir):
    from cosmwasm_etl_ray.functions.dataprep import vocab_topk
    from cosmwasm_etl_ray.pipelines.queries_dataprep import (
        ENCODE_VOCAB_K,
        encode_docs,
    )

    out = encode_docs(sf_dir).to_pandas()
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet").to_pandas()
    vocab = vocab_topk(
        ray.data.from_pandas(docs[["doc_id", "text"]]), k=ENCODE_VOCAB_K
    )
    inv = {i + 1: t for i, t in enumerate(vocab["token"])}
    # ids in range, one row per token position, per-doc positions dense
    assert out["token_id"].between(0, ENCODE_VOCAB_K).all()
    n_tok = docs.set_index("doc_id")["text"].str.count(" ") + 1
    sizes = out.groupby("doc_id").size()
    assert (sizes == n_tok.reindex(sizes.index)).all()
    assert (out.groupby("doc_id")["pos"].max() == sizes - 1).all()
    # decode a doc: in-vocab ids give back their exact tokens
    d0 = docs.iloc[0]
    toks = d0["text"].split(" ")
    enc0 = out[out["doc_id"] == d0["doc_id"]].sort_values("pos")
    for pos, tid in zip(enc0["pos"], enc0["token_id"]):
        if tid:
            assert inv[tid] == toks[pos]
        else:
            assert toks[pos] not in set(vocab["token"])


# ------------------------------------------------ composed flagship


def test_pretrain_corpus_composition(ray_session, sf_dir):
    """pretrain_corpus == cdc_chunks restricted to keep & train docs:
    the composition must drop exactly the filtered/eval docs and leave
    surviving docs' chunk rows byte-identical to the standalone pass."""
    from cosmwasm_etl_ray.pipelines.queries_dataprep import (
        cdc_chunks,
        corpus_filter_docs,
        pretrain_corpus,
    )

    out = pretrain_corpus(sf_dir).to_pandas()
    dec = corpus_filter_docs(sf_dir).to_pandas()
    keep = dec.loc[dec["keep"], "doc_id"].to_numpy()
    train = keep[split_bucket(keep) < 80]
    assert set(out["doc_id"]) == set(train)

    ref = cdc_chunks(sf_dir).to_pandas()
    ref = ref[ref["doc_id"].isin(train)]
    key = ["doc_id", "chunk_id"]
    a = out.sort_values(key).reset_index(drop=True)
    b = ref.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[b.columns], b)


def test_decontaminate_bloom_equals_exact(ray_session, sf_dir):
    """The sketch path is value-exact: bloom-pruned + verify join
    output == the broadcast-exact path, row for row."""
    from cosmwasm_etl_ray.functions.dataprep import decontaminate_bloom

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    a = (
        decontaminate_bloom(docs).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        decontaminate_train(sf_dir).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[b.columns], b)


def test_tfidf_top_terms_small(ray_session):
    """Hand-checkable corpus: ubiquitous terms rank below rare ones,
    score is tf*SCALE//df, ties break token-ascending, k bounds rows."""
    from cosmwasm_etl_ray.functions.dataprep import TFIDF_SCALE, tfidf_top_terms

    docs = pd.DataFrame(
        {
            "doc_id": pd.Series([1, 2, 3], dtype="int64"),
            "text": [
                "the cat sat",        # cat df=1, sat df=2, the df=3
                "the dog sat",        # dog df=1
                "the the fox",        # tf(the)=2, fox df=1
            ],
        }
    )
    out = (
        tfidf_top_terms(ray.data.from_pandas(docs).repartition(3), k=2)
        .to_pandas()
        .sort_values(["doc_id", "score", "token"],
                     ascending=[True, False, True])
        .reset_index(drop=True)
    )
    # doc 1: cat 1/1 > sat 1/2 (the 1/3 cut by k=2)
    d1 = out[out["doc_id"] == 1]
    assert list(d1["token"]) == ["cat", "sat"]
    assert list(d1["score"]) == [TFIDF_SCALE, TFIDF_SCALE // 2]
    # doc 3: fox 1/1 vs the 2/3 -> fox wins (1e6 > 666666)
    d3 = out[out["doc_id"] == 3]
    assert list(d3["token"]) == ["fox", "the"]
    assert list(d3["score"]) == [TFIDF_SCALE, 2 * TFIDF_SCALE // 3]
    assert (out.groupby("doc_id").size() <= 2).all()
    assert out["score"].dtype == np.int64 and out["tf"].dtype == np.int64
