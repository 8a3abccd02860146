"""Text analysis stages: token counting, quality scoring, language ID,
fingerprinting. All run as vectorized map_batches (stateless) or
actor-pool stages (pattern compile once per actor).

These extend the reference's per-record normalizers (SURVEY §2.2
M16-M18 scalar functions) to the training-data-pipeline domain.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = ("the", "a", "of", "to", "and")


def token_stats_batch(t: pa.Table) -> pa.Table:
    """Whitespace token count + char count, pure pyarrow kernels."""
    n_chars = pc.utf8_length(t["text"]).cast(pa.int64())
    n_spaces = pc.count_substring(t["text"], " ").cast(pa.int64())
    n_tokens = pc.add(n_spaces, 1)
    return pa.table(
        {"doc_id": t["doc_id"], "n_chars": n_chars, "n_tokens": n_tokens}
    )


class QualityScorer:
    """Actor-pool stage: stopword ratio + avg token length. The
    stopword set and splitter live in the actor (built once); counting
    runs as vectorized explode + isin, never a Python loop per row."""

    def __init__(self):
        self.stops = list(STOPWORDS)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks = df["text"].str.split(" ")
        n_tokens = toks.str.len().astype("int64")
        exploded = toks.explode()
        stop_n = (
            exploded.isin(self.stops).groupby(level=0).sum()
            .reindex(df.index, fill_value=0)
            .astype("int64")
        )
        n_chars = df["text"].str.len().astype("int64")
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": n_tokens,
                "avg_token_len": (n_chars - (n_tokens - 1)) / n_tokens,
                "stop_ratio": stop_n / n_tokens,
            }
        )
        return out


class LangId:
    """Heuristic n-gram language ID: scores character-trigram overlap
    against tiny per-language profiles (a deterministic stand-in for a
    fasttext-style model; the model load happens once per actor)."""

    PROFILES = {
        "en": ("the", " th", "he ", "ing", "and", " an", "nd ", "ion"),
        "es": ("de ", " de", "la ", " la", "os ", "ción", "ent", "que"),
        "de": ("der", "ein", "ich", "sch", "und", " un", "en ", "cht"),
        "fr": ("le ", " le", "es ", "ent", "de ", " de", "ion", "que"),
    }

    def __init__(self):
        self.profiles = {k: list(v) for k, v in self.PROFILES.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized: presence of each profile trigram via C substring
        search, summed per language; first-max-wins in profile order
        (the tiebreak the SQL oracle twin mirrors). Set-of-grams ∩
        profile ≡ count of profile grams PRESENT in the text."""
        scores = np.zeros((len(df), len(self.profiles)), dtype=np.int64)
        text = df["text"]
        for j, (lang, prof) in enumerate(self.profiles.items()):
            for g in prof:
                scores[:, j] += text.str.contains(g, regex=False).to_numpy()
        best = np.argmax(scores, axis=1)  # argmax → first max (dict order)
        langs = np.array(list(self.profiles), dtype=object)
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "lang_pred": langs[best]}
        )


FP_BASE = 1000003
FP_MOD = (1 << 31) - 1  # 31-bit prime: window sums stay far below int64 overflow
FP_WINDOW = 16


def rolling_fingerprint(texts: pd.Series, window: int = FP_WINDOW) -> np.ndarray:
    """Karp-Rabin rolling-hash document fingerprint: min of the
    codepoint-polynomial hashes of every `window`-length slice (a
    winnowing-style representative). Arithmetic is mod a 31-bit prime
    so the value is reproducible EXACTLY in plain BIGINT SQL — the
    DuckDB oracle twin evaluates the identical polynomial."""
    pow_arr = np.array(
        [pow(FP_BASE, window - 1 - k, FP_MOD) for k in range(window)], dtype=np.int64
    )

    def fp(s: str) -> int:
        if not s:
            return 0
        codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        L = len(codes)
        if L <= window:
            return int((codes * pow_arr[window - L :]).sum() % FP_MOD)
        w = np.lib.stride_tricks.sliding_window_view(codes, window)
        hashes = (w * pow_arr).sum(axis=1) % FP_MOD
        return int(hashes.min())

    return texts.map(fp).to_numpy(dtype=np.int64)


# -------------------------------------------------- repetition signals


def repetition_stats_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style repetition signals per doc, as exact integer
    counts (the filter thresholds are a policy choice downstream; the
    signals themselves are value-exact): total and most-frequent
    2-gram occurrences, total and duplicated 3-gram occurrences.
    Vectorized: one token explode per n, pandas hash-groupby counts —
    no per-row loop. Emits a row for EVERY input doc (zero counts for
    docs too short to have grams)."""
    from cosmwasm_etl_ray.functions.dataprep import _explode_grams

    df = df.reset_index(drop=True)
    ids = df["doc_id"].astype("int64")

    g2 = _explode_grams(df, 2, dedup=False)
    g3 = _explode_grams(df, 3, dedup=False)

    vc2 = (
        g2.groupby(["doc_id", "gram"], sort=False)
        .size()
        .groupby(level=0)
        .agg(["sum", "max"])
    )
    a3 = g3.groupby("doc_id", sort=False)["gram"].agg(["size", "nunique"])

    out = pd.DataFrame(
        {
            "doc_id": ids,
            "n_2grams": vc2["sum"].reindex(ids, fill_value=0).to_numpy(),
            "top2gram_n": vc2["max"].reindex(ids, fill_value=0).to_numpy(),
            "n_3grams": a3["size"].reindex(ids, fill_value=0).to_numpy(),
            "dup3gram_n": (a3["size"] - a3["nunique"])
            .reindex(ids, fill_value=0)
            .to_numpy(),
        }
    )
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out
