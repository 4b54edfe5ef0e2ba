"""Distributed Lloyd k-means over an embedding column.

The existing IVF / SemDeDup paths train centroids on a budget-capped
hash sample pulled to the driver (``similarity.train_centroids``) —
correct and cheap, but the centroids only ever see the sample. This
module adds the full-corpus refinement those paths were missing: each
Lloyd iteration is ONE streaming pass where every batch emits a single
mergeable partial row of per-centroid ``(count, Σx)`` sufficient
statistics (the ``embedding_pca`` shape), so

* the corpus is never materialized — blocks stream, partials fold;
* the driver pull per iteration is O(blocks · k · d) floats, never the
  vectors (k=16, d=64 → 8 KiB per block);
* centroids broadcast once per iteration via ``ray.put`` and are read
  per actor, not re-shipped per batch.

Spherical (cosine) k-means throughout, matching the engine's
similarity convention: rows and centroids are unit-normalized and
assignment is argmax dot. Determinism: assignments are exact argmax
over float64 dots with ties broken toward the LOWER centroid index
(numpy argmax), and per-centroid sums fold in block order, so results
are reproducible to float-summation tolerance (~1e-9 relative) across
layouts — the same contract ``embedding_pca`` documents. Empty
clusters keep their previous centroid (no resampling mid-iteration:
resampling would make iteration t+1 depend on block arrival order).

No counterpart in the reference (no vector ops there); this is the
training-data-pipeline clustering primitive (SemDeDup/NVIDIA-curator
style corpus clustering, IVF coarse quantizer training).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _as_matrix, _unit


def _lloyd_pass(ds, cents: np.ndarray, *, vec_col: str):
    """One full-corpus Lloyd iteration: returns (new_cents, shift,
    counts). ``shift`` is the max centroid movement (L2) — the
    convergence signal; ``counts`` the per-centroid member counts."""
    import ray

    k, d = cents.shape
    cref = ray.put(cents)

    def partials(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _unit(_as_matrix(batch[vec_col]))  # float64
        assign = (x @ c.T).argmax(axis=1)
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        sums = np.zeros((k, d), dtype=np.float64)
        np.add.at(sums, assign, x)
        return pa.table(
            {
                "counts": pa.array([counts.tolist()], pa.list_(pa.int64())),
                "sums": pa.array([sums.ravel().tolist()], pa.list_(pa.float64())),
            }
        )

    total_counts = np.zeros(k, dtype=np.int64)
    total_sums = np.zeros((k, d), dtype=np.float64)
    pds = ds.map_batches(partials, batch_format="pyarrow")
    # constant-memory driver fold: one (k + k·d) row per block
    for b in pds.iter_batches(batch_size=256, batch_format="pyarrow"):
        for cnt, sm in zip(b["counts"].to_pylist(), b["sums"].to_pylist()):
            total_counts += np.asarray(cnt, dtype=np.int64)
            total_sums += np.asarray(sm, dtype=np.float64).reshape(k, d)

    new = cents.astype(np.float64).copy()
    nz = total_counts > 0
    means = total_sums[nz] / total_counts[nz, None]
    norms = np.linalg.norm(means, axis=1)
    norms[norms == 0] = 1.0
    new[nz] = means / norms[:, None]
    shift = float(np.linalg.norm(new - cents, axis=1).max()) if k else 0.0
    return new.astype(cents.dtype, copy=False), shift, total_counts


def kmeans_refine(ds, cents: np.ndarray, *, vec_col: str = "embedding",
                  iters: int = 2, tol: float = 1e-6):
    """Refine centroids with up to ``iters`` full-corpus Lloyd passes
    (early-stops when the max centroid shift falls below ``tol``).
    Returns (centroids, history) where history is a list of per-pass
    dicts {"shift": float, "counts": int64[k]}."""
    history = []
    for _ in range(iters):
        cents, shift, counts = _lloyd_pass(ds, cents, vec_col=vec_col)
        history.append({"shift": shift, "counts": counts})
        if shift < tol:
            break
    return cents, history


def kmeans_fit(ds, *, n_clusters: int = 16, vec_col: str = "embedding",
               id_col: str = "vec_id", refine_iters: int = 3,
               sample_frac: float = 0.2, sample_budget_rows: int = 100_000,
               sample_iters: int = 10, seed: int = 13, tol: float = 1e-6):
    """Full k-means fit: budget-capped hash-sample initialization
    (``similarity.train_centroids`` — layout-independent sample, local
    Lloyd on the sample only) followed by ``refine_iters`` distributed
    full-corpus passes. Returns (centroids float64[k, d], history)."""
    from .similarity import train_centroids

    cents = train_centroids(
        ds, vec_col=vec_col, id_col=id_col, n_centroids=n_clusters,
        sample_frac=sample_frac, sample_budget_rows=sample_budget_rows,
        iters=sample_iters, seed=seed,
    ).astype(np.float64)
    return kmeans_refine(ds, cents, vec_col=vec_col, iters=refine_iters, tol=tol)


def kmeans_assign(ds, cents: np.ndarray, *, vec_col: str = "embedding",
                  id_col: str = "vec_id"):
    """Streaming cluster assignment: (id, cluster int32, sim float64)
    per row. Centroids broadcast once; one matmul per batch; never
    materializes — callers write or aggregate the result."""
    import ray

    cref = ray.put(np.asarray(cents, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _unit(_as_matrix(batch[vec_col]))
        sims = x @ c.T
        a = sims.argmax(axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(a.astype(np.int32), pa.int32()),
                "sim": pa.array(sims[np.arange(len(a)), a], pa.float64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def cluster_sizes(ds, cents: np.ndarray, *, vec_col: str = "embedding"):
    """Per-cluster member counts in one pass WITHOUT a groupby shuffle:
    reuses the Lloyd partial fold (counts only are inspected)."""
    _, _, counts = _lloyd_pass(ds, np.asarray(cents, np.float64), vec_col=vec_col)
    return counts
