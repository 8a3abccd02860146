"""Distributed BPE training vs an independent clean-room serial
reference (the cdc_final_state dict-replay-oracle pattern): the
sharded-actor trainer must produce the EXACT merge table the obvious
single-process implementation produces, regardless of sharding."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data as rd

from cosmwasm_etl_ray.functions.bpe import (
    MAX_WORD_LEN,
    WORD_RE,
    _encode_word,
    _merge_word,
    bpe_encode,
    bpe_train,
    pair_counts,
)

SF = "/root/testdata/sf0.001"


def _serial_bpe(texts, n_merges, min_freq=2):
    """Clean-room reference: dict word-freqs, Counter pair counts,
    global (count desc, pair asc) argmax, left-to-right merges."""
    wf = Counter()
    for s in texts:
        for w in WORD_RE.findall((s or "").lower()):
            wf[w[:MAX_WORD_LEN]] += 1
    syms = {w: tuple(w) for w in wf}
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for w, f in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_freq:
            break
        merges.append((rank, l, r, cnt))
        for w in wf:
            s = syms[w]
            for i in range(len(s) - 1):
                if s[i] == l and s[i + 1] == r:
                    syms[w] = _merge_word(s, l, r)
                    break
    return (
        pd.DataFrame(merges, columns=["rank", "left", "right", "freq"]),
        syms,
        wf,
    )


def test_bpe_train_matches_serial_reference(ray_session):
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = bpe_train(docs, n_merges=12)
    ref, _, _ = _serial_bpe(docs.to_pandas()["text"], 12)
    assert got.values.tolist() == ref.values.tolist()
    # sharding-independence: 1 shard == 8 shards
    got1 = bpe_train(docs, n_merges=12, n_shards=1)
    assert got1.values.tolist() == got.values.tolist()


def test_bpe_encode_invariants(ray_session):
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    merges = bpe_train(docs, n_merges=12)
    enc = bpe_encode(docs, merges).to_pandas()
    assert len(enc) == docs.count()
    # tokens never exceed chars, never fall below words; totals exact
    assert (enc["n_tokens"] <= enc["n_chars"]).all()
    assert (enc["n_tokens"] >= enc["n_words"]).all()
    # the merge table actually compresses this corpus
    assert enc["n_tokens"].sum() < enc["n_chars"].sum()
    # per-word property: encoded symbols concatenate back to the word,
    # and full-rank encoding agrees with the serial trainer's final
    # symbol table (same corpus -> same segmentation)
    ref_merges, syms, wf = _serial_bpe(docs.to_pandas()["text"], 12)
    ranks = {
        (l, r): int(k)
        for k, l, r in zip(ref_merges["rank"], ref_merges["left"], ref_merges["right"])
    }
    for w in list(wf)[:500]:
        toks = _encode_word(w, ranks)
        assert "".join(toks) == w
        assert toks == syms[w], w


def test_bpe_pair_counts_threshold_and_weighting(ray_session):
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": pa.array(["abab abab", "ab Zab", None], type=pa.string()),
            }
        )
    )
    out = pair_counts(docs, min_count=2).to_pandas()
    got = {
        (l, r): c
        for l, r, c in zip(out["left_ch"], out["right_ch"], out["cnt"])
    }
    # 'abab' x2 occurrences (ab x2, ba x1 each), 'ab' x1, 'zab' x1
    # (lowercased; None text skipped); 'za' (count 1) falls below the
    # threshold and must be absent
    assert got == {("a", "b"): 6, ("b", "a"): 2}


def test_fixed_tokenizer_sequential_semantics():
    """encode_tokens_sequential applies merges in rank order, each
    left-to-right non-overlapping — the semantics the generated SQL
    twin's chained replace() reproduces. Multi-level merges compose
    (er->ers, th->the, in->ing); token counts are consistent with
    manual derivations."""
    from cosmwasm_etl_ray.functions.bpe import (
        FIXED_MERGES,
        encode_tokens_sequential,
    )

    # 'parsers': p a r s e r s -> (e,r): p a r s er s -> (a,r):
    # p ar s er s -> (p,ar): par s er s -> (er,s): par s ers -> 3 tokens
    assert encode_tokens_sequential("parsers", FIXED_MERGES) == 3
    # 'the': t h e -> (t,h): th e -> (th,e): the -> 1 token
    assert encode_tokens_sequential("the", FIXED_MERGES) == 1
    # 'thing': t h i n g -> (i,n): t h in g -> (t,h): th in g ->
    # (in,g): th ing -> 2
    assert encode_tokens_sequential("thing", FIXED_MERGES) == 2
    # left-to-right non-overlap: 'aaa' with a hypothetical (a,a) merge
    from cosmwasm_etl_ray.functions.bpe import _merge_word

    assert _merge_word(tuple("aaa"), "a", "a") == ("aa", "a")


def test_doc_fluency_model_and_scores(ray_session):
    """Two-pass model-based scoring: the broadcast bigram model equals
    a serial count, and per-doc fluency equals the sum of model counts
    over the doc's own pairs — including a gibberish doc scoring only
    its self-contributed counts and an empty doc scoring zero."""
    import pyarrow as pa
    import ray.data as rd

    from cosmwasm_etl_ray.functions.bpe import bigram_model, doc_fluency

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "text": pa.array(
                    ["the the the", "then", "xq xq", ""], type=pa.string()
                ),
            }
        )
    )
    m = bigram_model(docs)
    # th: 3 (the) + 1 (then) = 4; he: 4; en: 1; xq: 2
    assert m == {"th": 4, "he": 4, "en": 1, "xq": 2}
    out = (
        doc_fluency(docs, m)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc1: pairs th,he x3 -> 3*(4+4)=24; doc2: th,he,en -> 9;
    # doc3: xq x2 -> 4; doc4: none
    assert out["n_pairs"].tolist() == [6, 3, 2, 0]
    assert out["fluency"].tolist() == [24, 9, 4, 0]


def test_replace_chain_equals_sequential_on_collision_words():
    """The SQL twin's replace chain over the wrapped |tok| encoding
    must equal sequential tuple-apply even on words where a
    token-suffix + next-token-prefix spells a merge pattern — the
    exact hazard a space-separated encoding has ('er|st' vs 'er s';
    understand/asthma/interstate flip under the naive encoding)."""
    from cosmwasm_etl_ray.functions.bpe import (
        FIXED_MERGES,
        encode_tokens_replace_chain,
        encode_tokens_sequential,
    )

    for w in [
        "understand", "asthma", "interstate", "erst", "sth",
        "ers", "erers", "sts", "thethe", "parst", "aning",
    ]:
        assert encode_tokens_sequential(w, FIXED_MERGES) == (
            encode_tokens_replace_chain(w, FIXED_MERGES)
        ), w


def test_replace_chain_equals_sequential_property():
    """Property pin: for random words and random merge tables
    (including multi-char merge operands built from earlier merges),
    str.replace over the wrapped encoding == _merge_word sequential
    apply. str.replace and DuckDB replace() share left-to-right
    non-overlapping semantics, so this pins the oracle itself."""
    from hypothesis import given, settings, strategies as st

    from cosmwasm_etl_ray.functions.bpe import (
        encode_tokens_replace_chain,
        encode_tokens_sequential,
    )

    @st.composite
    def merges_and_word(draw):
        n = draw(st.integers(1, 8))
        merges = []
        toks = [c for c in "abc"]
        for _ in range(n):
            l = draw(st.sampled_from(toks))
            r = draw(st.sampled_from(toks))
            merges.append((l, r))
            toks.append(l + r)
        w = draw(st.text(alphabet="abc", min_size=0, max_size=16))
        return merges, w

    @settings(max_examples=300, deadline=None)
    @given(merges_and_word())
    def check(mw):
        merges, w = mw
        assert encode_tokens_sequential(w, merges) == (
            encode_tokens_replace_chain(w, merges)
        )

    check()


def test_bpe_train_sql_matches_serial_reference():
    """The generated 15-round CTE chain recomputes the merge table
    from the data (full-value twin, not rows-only): equal to the
    clean-room serial reference on a corpus chosen to exercise
    repeated pairs, ties, and the min_freq early stop."""
    import duckdb

    from cosmwasm_etl_ray.functions.bpe import bpe_train_sql

    texts = [
        "the theory of the thing is thin",
        "banana bandana and an anthem",
        "aaa aaaa aa understand interstate",
        "zq!! 123",
    ]
    ref, _, _ = _serial_bpe(texts, 15)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") t(doc_id, text)"
    )
    got = con.execute(bpe_train_sql(15, 2)).fetchdf()
    assert got["rank"].tolist() == ref["rank"].tolist()
    assert got["left"].tolist() == ref["left"].tolist()
    assert got["right"].tolist() == ref["right"].tolist()
    assert got["freq"].tolist() == ref["freq"].tolist()


def test_bigram_model_driver_limit_is_loud(ray_session, monkeypatch):
    """Re-pointing bigram_model at an unbounded pair vocabulary must
    crash loudly at the driver pull, not OOM: the to_pandas limit."""
    import cosmwasm_etl_ray.functions.bpe as bpe_mod

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1], type=pa.int64()),
                "text": pa.array(["abc bcd cde def"], type=pa.string()),
            }
        )
    )
    monkeypatch.setattr(bpe_mod, "BIGRAM_MODEL_DRIVER_LIMIT", 2)
    with pytest.raises(ValueError):
        bpe_mod.bigram_model(docs)
