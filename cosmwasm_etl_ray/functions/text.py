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
    stopword set and splitter live in the actor (built once)."""

    def __init__(self):
        self.stops = set(STOPWORDS)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ")
        n_tokens = toks.str.len().astype("int64")
        stop_n = toks.map(lambda ws: sum(w in self.stops for w in ws))
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
        self.profiles = {k: set(v) for k, v in self.PROFILES.items()}

    def _score(self, text: str) -> str:
        grams = {text[i : i + 3] for i in range(max(0, len(text) - 2))}
        best, best_s = "en", -1
        for lang, prof in self.profiles.items():
            s = len(grams & prof)
            if s > best_s:
                best, best_s = lang, s
        return best

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "lang_pred": df["text"].map(self._score),
            }
        )


def rolling_fingerprint(texts: pd.Series, window: int = 16) -> np.ndarray:
    """Karp-Rabin rolling-hash document fingerprint: min of window
    hashes (a winnowing-style representative), deterministic."""
    B, M = np.uint64(1000003), np.uint64(0xFFFFFFFFFFFFFFFF)

    def fp(s: str) -> np.uint64:
        if not s:
            return np.uint64(0)
        codes = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(codes) <= window:
            h = np.uint64(0)
            for c in codes:
                h = (h * B + c) & M
            return h
        pows = np.ones(window, dtype=np.uint64)
        for i in range(1, window):
            pows[i] = (pows[i - 1] * B) & M
        # hash of each window via cumulative trick (vectorized convolution)
        w = np.lib.stride_tricks.sliding_window_view(codes, window)
        hashes = (w * pows[::-1]).sum(axis=1, dtype=np.uint64) & M
        return hashes.min()

    return texts.map(fp).to_numpy(dtype=np.uint64)
