"""Model-inference stage: a fasttext-shaped quality classifier.

The production pattern this exercises is batched ML inference inside a
Ray Data actor pool (quality / toxicity / domain classifiers are the
standard corpus-filtering step after heuristics — e.g. the GPT-3 /
Llama WebText-similarity filters): the MODEL IS LOADED ONCE PER ACTOR
in ``__init__`` (here: materializing the weight table; in production:
reading a .bin artifact from shared storage) and ``__call__`` scores a
whole Arrow batch vectorized — hashed token-bigram features → one
weight gather → segment-mean → sigmoid. No per-row Python in the hot
path: the per-batch cost is one vectorized hash pass (the same
repo-owned family the sketches use), one ``np.take``, one
``reduceat``.

Only empty/whitespace-only docs take the no-feature sigmoid(bias)
path — sub-bigram docs still yield one clipped shingle.

The container has no fasttext/sklearn, so the weights are a
deterministic splitmix64 function of the feature index instead of a
trained artifact (documented stand-in, same plumbing); scores are
therefore meaningless as *quality* but exact, reproducible, and
layout-independent — which is what the tests pin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.scalar import _splitmix64
from ..functions.text import batch_shingle_hashes


class QualityClassifier:
    """Callable-class stage for ``map_batches(QualityClassifier,
    concurrency=N)``: linear model over hashed token bigrams.

    score = sigmoid(mean_w + bias) where mean_w averages the weight of
    each bigram feature (hash % dim). Docs with NO feature — empty or
    whitespace-only — score sigmoid(bias); a doc with fewer than 2
    tokens still gets one clipped shingle feature
    (batch_shingle_hashes' documented n<k case). ``label`` thresholds
    the score.
    """

    def __init__(self, dim: int = 1 << 18, seed: int = 23, threshold: float = 0.5):
        self.dim = dim
        self.threshold = threshold
        # "model load": one dim-sized table per ACTOR, never per batch
        idx = np.arange(dim, dtype=np.uint64) ^ _splitmix64(
            np.array([seed], dtype=np.uint64)
        )
        self.weights = (
            _splitmix64(idx).astype(np.float64) / np.float64(2**64) * 2.0 - 1.0
        )
        self.bias = 0.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        grams = batch_shingle_hashes(texts, k=2)
        lens = np.array([len(g) for g in grams], dtype=np.int64)
        flat = (
            np.concatenate([g for g in grams if len(g)])
            if lens.sum()
            else np.empty(0, dtype=np.uint64)
        )
        w = self.weights.take((flat % np.uint64(self.dim)).astype(np.int64))
        offs = np.concatenate([[0], np.cumsum(lens)])[:-1]
        # reduceat misbehaves on empty segments / trailing offsets:
        # compute sums only where lens > 0
        sums = np.zeros(len(lens), dtype=np.float64)
        nz = lens > 0
        if nz.any():
            sums[nz] = np.add.reduceat(w, offs[nz])
        mean = np.where(nz, sums / np.maximum(lens, 1), 0.0)
        score = 1.0 / (1.0 + np.exp(-(mean + self.bias)))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_features": pa.array(lens, pa.int64()),
                "score": pa.array(np.round(score, 6), pa.float64()),
                "label": pa.array(
                    np.where(score >= self.threshold, "keep", "drop").tolist(),
                    pa.string(),
                ),
            }
        )
