"""Distributed classifier training: single-process parity, layout
independence, learnability, and deploy contract with the inference
stage."""

from __future__ import annotations

import numpy as np
import pytest


def _local_train(texts, labels, dim, epochs, lr):
    """Reference single-process full-batch GD on the SAME featurization
    — the update rule train_classifier distributes."""
    from textextract_ray.stages.classify import _hashed_features

    idx, lens, offs = _hashed_features(texts, dim)
    y = np.asarray(labels, dtype=np.float64)
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    n = len(y)
    for _ in range(epochs):
        wv = w.take(idx)
        sums = np.zeros(n, dtype=np.float64)
        nz = lens > 0
        if nz.any():
            sums[nz] = np.add.reduceat(wv, offs[nz])
        mean = np.where(nz, sums / np.maximum(lens, 1), 0.0)
        p = 1.0 / (1.0 + np.exp(-(mean + b)))
        err = p - y
        per_occ = np.repeat(err / np.maximum(lens, 1), lens)
        grad = np.zeros(dim, dtype=np.float64)
        np.add.at(grad, idx, per_occ)
        w = w - lr * grad / n
        b = b - lr * err.sum() / n
    return w, b


@pytest.fixture(scope="module")
def labeled_corpus(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(3)
    good_words = ["research", "method", "analysis", "theory", "result", "data"]
    bad_words = ["buy", "click", "free", "winner", "casino", "pills"]
    rows = []
    for i in range(120):
        src = good_words if i % 2 == 0 else bad_words
        toks = [src[rng.randint(len(src))] for _ in range(30)]
        rows.append({"doc_id": i, "text": " ".join(toks), "label": 1 - (i % 2)})
    return rd.from_items(rows), rows


def test_matches_local_gd(labeled_corpus):
    ds, rows = labeled_corpus
    from textextract_ray.stages.classify import train_classifier

    model = train_classifier(ds, label_col="label", dim=1 << 12, epochs=3, lr=2.0)
    w, b = _local_train(
        [r["text"] for r in rows], [r["label"] for r in rows], 1 << 12, 3, 2.0
    )
    assert np.allclose(model["weights"], w, atol=1e-9)
    assert abs(model["bias"] - b) < 1e-9


def test_layout_independence(labeled_corpus):
    ds, _ = labeled_corpus
    from textextract_ray.stages.classify import train_classifier

    a = train_classifier(ds.repartition(1), label_col="label", dim=1 << 12, epochs=2)
    b = train_classifier(ds.repartition(9), label_col="label", dim=1 << 12, epochs=2)
    assert np.allclose(a["weights"], b["weights"], atol=1e-9)
    assert abs(a["bias"] - b["bias"]) < 1e-9


def test_learns_planted_signal_and_deploys(labeled_corpus):
    import ray

    ds, rows = labeled_corpus
    from textextract_ray.stages.classify import QualityClassifier, train_classifier

    model = train_classifier(ds, label_col="label", dim=1 << 12, epochs=12, lr=4.0)
    assert model["history"][-1]["acc"] >= 0.95
    assert model["history"][-1]["loss"] < model["history"][0]["loss"]
    # deploy through the inference stage with the trained table shipped
    # once via the object store
    scored = ds.map_batches(
        QualityClassifier,
        batch_format="pyarrow",
        concurrency=(1, 2),
        fn_constructor_kwargs=dict(
            dim=model["dim"],
            weights=ray.put(model["weights"]),
            bias=model["bias"],
        ),
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    truth = np.array([r["label"] for r in rows])
    pred = (scored["score"].to_numpy() >= 0.5).astype(int)
    assert (pred == truth).mean() >= 0.95
    # trained scores actually separate the classes
    assert scored["score"][truth == 1].min() > scored["score"][truth == 0].max()


def test_weights_shape_validated():
    from textextract_ray.stages.classify import QualityClassifier

    with pytest.raises(ValueError, match="weights shape"):
        QualityClassifier(dim=16, weights=np.zeros(8))


def test_empty_dataset_raises(ray_session):
    import ray.data as rd

    from textextract_ray.stages.classify import train_classifier

    ds = rd.from_items([{"doc_id": 1, "text": "x", "label": 1}]).filter(
        lambda r: False
    )
    with pytest.raises(ValueError, match="empty"):
        train_classifier(ds, label_col="label", dim=256, epochs=1)
