"""Product quantization (PQ/ADC): code compactness, recall with exact
rerank, determinism across layouts, and the shared rerank contract."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pq_ds(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(17)
    # clustered corpus: 8 orthogonal-ish directions + noise, so cosine
    # neighborhoods are meaningful and PQ has structure to exploit
    dirs = rng.randn(8, 32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    mat = np.concatenate(
        [dirs[i] * 3.0 + 0.3 * rng.randn(50, 32) for i in range(8)]
    ).astype(np.float32)
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(len(mat))]
    return rd.from_items(rows), mat


def _exact_topk_ids(mat, qmat, k):
    def unit(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1
        return m / n

    sims = unit(qmat.astype(np.float64)) @ unit(mat.astype(np.float64)).T
    out = []
    for q in range(len(qmat)):
        order = np.lexsort((np.arange(mat.shape[0]), -sims[q]))[:k]
        out.append(order.tolist())
    return out


def test_pq_codes_are_m_bytes(pq_ds):
    ds, mat = pq_ds
    from textextract_ray.stages.similarity import pq_encode, train_pq

    pq = train_pq(ds, m=8, n_codes=32, seed=29)
    assert pq["codebooks"].shape == (8, 32, 4)
    codes = pq_encode(ds, pq).to_pandas()
    assert len(codes) == len(mat)
    assert all(len(c) == 8 for c in codes["pqcode"])  # 8 bytes per vector
    assert all(0 <= v < 32 for c in codes["pqcode"] for v in c)


def test_pq_topk_recall_with_rerank(pq_ds):
    ds, mat = pq_ds
    from textextract_ray.stages.similarity import pq_encode, pq_topk, train_pq

    pq = train_pq(ds, m=8, n_codes=64, seed=29)
    codes = pq_encode(ds, pq)
    queries = {"query_id": np.arange(4, dtype=np.int64), "mat": mat[[0, 50, 100, 150]]}
    out = pq_topk(codes, queries, pq, k=10, rerank_ds=ds, rerank_mult=4).to_pandas()
    expected = _exact_topk_ids(mat, mat[[0, 50, 100, 150]], 10)
    for q in range(4):
        got = set(out[out.query_id == q]["vec_id"].tolist())
        rec = len(got & set(expected[q])) / 10.0
        assert rec >= 0.7, f"query {q} recall {rec}"
    # reranked scores are EXACT cosine: cross-check one query's top hit
    def unit(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1
        return m / n

    g = out[out.query_id == 0].sort_values(["score", "vec_id"], ascending=[False, True])
    top_id = int(g.iloc[0]["vec_id"])
    exact = float(
        unit(mat[[0]].astype(np.float64)) @ unit(mat[[top_id]].astype(np.float64)).T
    )
    assert abs(float(g.iloc[0]["score"]) - exact) < 1e-9


def test_pq_topk_no_rerank_shape_and_order(pq_ds):
    ds, mat = pq_ds
    from textextract_ray.stages.similarity import pq_encode, pq_topk, train_pq

    pq = train_pq(ds, m=4, n_codes=32, seed=29)
    codes = pq_encode(ds, pq)
    queries = {"query_id": np.array([7], dtype=np.int64), "mat": mat[[10]]}
    out = pq_topk(codes, queries, pq, k=5).to_pandas()
    assert len(out) == 5
    s = out.sort_values(["score", "vec_id"], ascending=[False, True])["score"].tolist()
    assert s == sorted(s, reverse=True)


def test_pq_layout_independence(pq_ds):
    ds, mat = pq_ds
    from textextract_ray.stages.similarity import pq_encode, pq_topk, train_pq

    queries = {"query_id": np.arange(2, dtype=np.int64), "mat": mat[:2]}
    outs = []
    for parts in (2, 9):
        d = ds.repartition(parts)
        pq = train_pq(d, m=8, n_codes=32, seed=29)
        out = pq_topk(pq_encode(d, pq), queries, pq, k=8).to_pandas()
        outs.append(
            out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
        )
    # hash-sampled training + deterministic tie rule: same codes, same
    # top-k at any parallelism
    assert outs[0]["vec_id"].tolist() == outs[1]["vec_id"].tolist()
    assert np.allclose(outs[0]["score"], outs[1]["score"], atol=1e-12)


def test_train_pq_rejects_indivisible_dim(pq_ds):
    ds, _ = pq_ds
    from textextract_ray.stages.similarity import train_pq

    with pytest.raises(ValueError, match="not divisible"):
        train_pq(ds, m=5)


def test_train_pq_rejects_oversized_codebook(pq_ds):
    """Codes are stored as uint8; n_codes > 256 would silently wrap
    mod 256 in pq_encode, so train_pq must reject it up front."""
    ds, _ = pq_ds
    from textextract_ray.stages.similarity import train_pq

    with pytest.raises(ValueError, match="n_codes"):
        train_pq(ds, m=8, n_codes=300, seed=29)
