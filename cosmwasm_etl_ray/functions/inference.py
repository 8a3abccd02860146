"""Batched model inference as a Ray Data stage — the "score every
embedding with a model" step of a training-data pipeline (quality
classifiers, topic routers, reward-model filters).

The model is a deterministic integer-quantized linear classifier:
weights come from a closed-form integer formula so the exact same
model is restatable in SQL (the driver's oracle hashes values, and a
float matmul would flake on summation order), and embeddings quantize
to int64 before the matmul so the logits are EXACT integers. The
plumbing is the real inference shape regardless of the model body:

- weights built ONCE per actor in ``__init__`` (here from the formula
  — zero bytes shipped; a learned model would be one ``ray.put`` ref),
- the list<float> column stacked to one contiguous matrix per batch,
- one matmul per batch (never a per-row loop),
- argmax with a deterministic tie-break (first max = smallest class).

Reference analogue: the per-batch scalar scoring functions of
/root/reference/parser/dex/dex.go are per-row Go; here scoring is a
vectorized actor-pool stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

INFER_CLASSES = 10
INFER_DIM = 64
INFER_SCALE = 1000  # quantization: q_d = floor(e_d * SCALE), exact int64
_W_MOD = 2000001
_W_OFF = 1000000


def infer_weights(
    n_classes: int = INFER_CLASSES, dim: int = INFER_DIM
) -> np.ndarray:
    """(C, D) int64 weights in [-1e6, 1e6] from the closed-form
    integer formula — the same expression the SQL twin unrolls with
    generate_series, so both sides run the identical model."""
    c = np.arange(n_classes, dtype=np.int64)[:, None]
    d = np.arange(dim, dtype=np.int64)[None, :]
    return (c * 1000003 + d * 7919 + 12345) % _W_MOD - _W_OFF


class LinearScorer:
    """Actor-pool inference stage: weights materialize once per actor,
    every batch is one int64 matmul. Logit magnitude is bounded by
    C-independent 1e6 * SCALE * dim * max|e| << 2^63 — no overflow."""

    def __init__(self, n_classes: int = INFER_CLASSES, dim: int = INFER_DIM):
        self.W = infer_weights(n_classes, dim)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        q = np.floor(emb * INFER_SCALE).astype(np.int64)
        logits = q @ self.W.T
        pred = logits.argmax(axis=1)  # ties -> first max = smallest class
        top = logits[np.arange(len(q)), pred]
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].astype("int64"),
                "pred": pred.astype("int64"),
                "top_logit": top.astype("int64"),
            }
        )


def score_embeddings(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Run the classifier over an embeddings Dataset — pure streaming,
    no shuffle; batch_size bounds the per-task matrix at
    4096 x dim x 8 B."""
    return ds.map_batches(
        LinearScorer,
        batch_format="pandas",
        concurrency=(1, 8),
        batch_size=4096,
    )
