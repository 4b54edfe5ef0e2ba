"""Similarity search: brute-force exact top-k + IVF recall."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def vec_ds(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(5)
    mat = rng.randn(300, 16).astype(np.float32)
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(300)]
    return rd.from_items(rows), mat


def _exact_topk(mat, qmat, k):
    def unit(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1
        return m / n

    sims = unit(qmat.astype(np.float64)) @ unit(mat.astype(np.float64)).T
    return [np.argsort(-sims[q], kind="stable")[:k].tolist() for q in range(len(qmat))]


def test_brute_force_matches_numpy(vec_ds):
    ds, mat = vec_ds
    from textextract_ray.stages.similarity import brute_force_topk

    queries = {"query_id": np.arange(3, dtype=np.int64), "mat": mat[:3]}
    out = brute_force_topk(ds, queries, k=5).to_pandas()
    expected = _exact_topk(mat, mat[:3], 5)
    for q in range(3):
        got = out[out.query_id == q].sort_values("score", ascending=False)["vec_id"].tolist()
        assert got == expected[q]


def test_batch_invariance(vec_ds):
    ds, mat = vec_ds
    from textextract_ray.stages.similarity import brute_force_topk

    queries = {"query_id": np.arange(2, dtype=np.int64), "mat": mat[:2]}
    a = brute_force_topk(ds, queries, k=7).to_pandas()
    b = brute_force_topk(ds.repartition(11), queries, k=7).to_pandas()
    key = ["query_id", "vec_id"]
    assert a[key].sort_values(key).values.tolist() == b[key].sort_values(key).values.tolist()


def test_ivf_recall_reasonable(vec_ds):
    ds, mat = vec_ds
    from textextract_ray.stages.similarity import ivf_topk

    queries = {"query_id": np.arange(3, dtype=np.int64), "mat": mat[:3]}
    out = ivf_topk(ds, queries, k=10, n_centroids=8, nprobe=4).to_pandas()
    expected = _exact_topk(mat, mat[:3], 10)
    recalls = []
    for q in range(3):
        got = set(out[out.query_id == q]["vec_id"].tolist())
        recalls.append(len(got & set(expected[q])) / 10)
    assert np.mean(recalls) >= 0.5  # nprobe=4 of 8 buckets
    # the query vector itself is always found (it sits in a probed bucket)
    for q in range(3):
        assert q in set(out[out.query_id == q]["vec_id"].tolist())
