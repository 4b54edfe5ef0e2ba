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


def _hashed_features(texts: list, dim: int):
    """THE featurization shared by inference and training (they must
    never drift): hashed token-bigram indices per doc. Returns
    (idx int64 flat feature indices, lens int64[n] features per doc,
    offs int64[n] start offset per doc). A doc's feature vector is the
    occurrence-mean: x[f] = count_f / len — so w·x == mean of w at the
    occurrence indices, exactly the inference scoring rule."""
    grams = batch_shingle_hashes(texts, k=2)
    lens = np.array([len(g) for g in grams], dtype=np.int64)
    flat = (
        np.concatenate([g for g in grams if len(g)])
        if lens.sum()
        else np.empty(0, dtype=np.uint64)
    )
    idx = (flat % np.uint64(dim)).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])[:-1]
    return idx, lens, offs


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

    def __init__(self, dim: int = 1 << 18, seed: int = 23, threshold: float = 0.5,
                 weights=None, bias: float = 0.0):
        self.dim = dim
        self.threshold = threshold
        if weights is not None:
            # trained artifact (train_classifier output, or a ray.put
            # ObjectRef to one — resolved here so the table ships to
            # each actor once via the object store, never per batch)
            try:
                import ray

                if isinstance(weights, ray.ObjectRef):
                    weights = ray.get(weights)
            except ImportError:
                pass
            w = np.asarray(weights, dtype=np.float64)
            if w.shape != (dim,):
                raise ValueError(f"weights shape {w.shape} != ({dim},)")
            self.weights = w
            self.bias = float(bias)
            return
        # "model load": one dim-sized table per ACTOR, never per batch
        # (deterministic stand-in — no ML runtime in the container)
        idx = np.arange(dim, dtype=np.uint64) ^ _splitmix64(
            np.array([seed], dtype=np.uint64)
        )
        self.weights = (
            _splitmix64(idx).astype(np.float64) / np.float64(2**64) * 2.0 - 1.0
        )
        self.bias = 0.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        idx, lens, offs = _hashed_features(texts, self.dim)
        w = self.weights.take(idx)
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


def train_classifier(ds, *, label_col: str, text_col: str = "text",
                     dim: int = 1 << 16, epochs: int = 8, lr: float = 2.0,
                     l2: float = 0.0):
    """Distributed full-batch logistic-regression training for the
    quality classifier — the FineWeb-Edu/Llama-style step where a
    linear model over hashed n-gram features is fit to (weak) document
    labels, here expressed as mergeable gradient partials so the corpus
    streams and nothing materializes:

    * per epoch, the current (weights, bias) broadcast once via
      ``ray.put`` and every batch emits ONE partial row —
      (Σ gradient [dim floats], Σ bias-grad, n, Σ loss, Σ correct) —
      folded on the driver in constant memory (O(blocks · dim) bytes
      pulled per epoch; dim = 2^16 → 512 KiB/block. At larger dims,
      fold through a tree of ray tasks — same partials, documented);
    * featurization is ``_hashed_features`` — byte-identical to
      inference scoring, so a trained model deploys with zero skew;
    * full-batch GD (not SGD): the update is a sum of per-doc terms,
      so it is layout-independent to float-summation tolerance —
      the same job trains the same model at 8 and 32 CPUs (SGD's
      sequential updates would not be).

    ``label_col`` must be 0/1 (int or bool). Returns {"weights":
    float64[dim], "bias": float, "dim": dim, "history": [{"loss",
    "acc"} per epoch]}. Deploy via
    ``QualityClassifier(dim=dim, weights=model["weights"],
    bias=model["bias"])`` (pass a ``ray.put`` ref as weights to ship
    the table through the object store once)."""
    import ray

    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    history = []
    for _ in range(epochs):
        wref = ray.put((w, b))

        def partials(batch: pa.Table) -> pa.Table:
            cw, cb = ray.get(wref)
            texts = batch[text_col].to_pylist()
            y = batch[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
            idx, lens, offs = _hashed_features(texts, dim)
            wv = cw.take(idx)
            sums = np.zeros(len(lens), dtype=np.float64)
            nz = lens > 0
            if nz.any():
                sums[nz] = np.add.reduceat(wv, offs[nz])
            mean = np.where(nz, sums / np.maximum(lens, 1), 0.0)
            p = 1.0 / (1.0 + np.exp(-(mean + cb)))
            err = p - y
            # occurrence-level gradient: doc i contributes err_i/len_i
            # at each of its len_i feature indices (aligned with idx:
            # flat features concatenate docs in order, empties vanish)
            per_occ = np.repeat(err / np.maximum(lens, 1), lens)
            grad = np.zeros(dim, dtype=np.float64)
            np.add.at(grad, idx, per_occ)
            eps = 1e-12
            loss = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum()
            correct = int(((p >= 0.5) == (y >= 0.5)).sum())
            return pa.table(
                {
                    "grad": pa.array([grad.tolist()], pa.list_(pa.float64())),
                    "gbias": pa.array([float(err.sum())], pa.float64()),
                    "n": pa.array([len(y)], pa.int64()),
                    "loss": pa.array([float(loss)], pa.float64()),
                    "correct": pa.array([correct], pa.int64()),
                }
            )

        g = np.zeros(dim, dtype=np.float64)
        gb = 0.0
        n_total = 0
        loss_total = 0.0
        correct_total = 0
        pds = ds.map_batches(partials, batch_format="pyarrow")
        for blk in pds.iter_batches(batch_size=64, batch_format="pyarrow"):
            for gv, gbv, nv, lv, cv in zip(
                blk["grad"].to_pylist(), blk["gbias"].to_pylist(),
                blk["n"].to_pylist(), blk["loss"].to_pylist(),
                blk["correct"].to_pylist(),
            ):
                g += np.asarray(gv, dtype=np.float64)
                gb += gbv
                n_total += nv
                loss_total += lv
                correct_total += cv
        if n_total == 0:
            raise ValueError("train_classifier: empty dataset")
        w = w - lr * (g / n_total + l2 * w)
        b = b - lr * (gb / n_total)
        history.append(
            {"loss": loss_total / n_total, "acc": correct_total / n_total}
        )
    return {"weights": w, "bias": b, "dim": dim, "history": history}
