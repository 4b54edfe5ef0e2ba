"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast via
``ray.put`` ONCE and read per actor (never re-shipped per batch); each
batch does one numpy matmul and emits only its local top-k per query, so
the final exact merge shuffles k·num_queries·num_blocks rows, not the
corpus. Scale path: IVF — coarse centroids (trained on a deterministic
sample) bucket the corpus; queries probe the nearest nprobe buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _as_matrix(col) -> np.ndarray:
    # float64: match the SQL oracle's double arithmetic closely enough
    # that 6-decimal-rounded scores agree
    return np.array(col.to_pylist(), dtype=np.float64)


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


class BatchTopK:
    """Actor-pool stage: local cosine top-k of each batch against the
    broadcast query matrix. Queries are fetched once per actor."""

    def __init__(self, queries_ref, vec_col: str, id_col: str, k: int):
        import ray

        q = ray.get(queries_ref)  # {"query_id": int64[nq], "mat": float32[nq, d]}
        self.qids = q["query_id"]
        self.qmat = _unit(q["mat"].astype(np.float64))
        self.vec_col = vec_col
        self.id_col = id_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _unit(_as_matrix(batch[self.vec_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = self.qmat @ vecs.T  # [nq, nb]
        k = min(self.k, sims.shape[1])
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[0]):
            # lexsort (score desc, id asc): argpartition would discard
            # score-TIED candidates at the local k-boundary arbitrarily,
            # making the global result depend on block layout
            order = np.lexsort((ids, -sims[qi]))[:k]
            out_q.append(np.full(k, self.qids[qi], dtype=np.int64))
            out_id.append(ids[order])
            out_s.append(sims[qi, order].astype(np.float64))
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )


def brute_force_topk(ds, queries: dict, *, vec_col="embedding", id_col="vec_id", k=10):
    """Exact cosine top-k: per-batch partial top-k, then a small
    per-query merge. ``queries`` = {"query_id": int64 array,
    "mat": float32 [nq, d]}. Returns (query_id, vec_id, score) rows,
    exactly k per query, ties broken by smaller vec_id (deterministic).
    """
    import ray

    qref = ray.put(queries)
    partial = ds.map_batches(
        BatchTopK,
        batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_kwargs=dict(queries_ref=qref, vec_col=vec_col, id_col=id_col, k=k),
    )

    def merge(group: pa.Table) -> pa.Table:
        # pyarrow in/out: a pandas merge emitting PandasBlockSchema
        # blocks next to empty pyarrow blocks triggers Ray's
        # mixed-schema RefBundle warning and a needless conversion
        order = pc.sort_indices(
            group, sort_keys=[("score", "descending"), ("vec_id", "ascending")]
        )
        return group.take(order[: min(k, len(group))])

    return partial.groupby("query_id").map_groups(merge, batch_format="pyarrow")


# --- IVF (scale path) --------------------------------------------------------

def train_centroids(ds, *, vec_col="embedding", id_col="vec_id", n_centroids=16,
                    sample_frac=0.2, sample_budget_rows=100_000, iters=10,
                    seed=13) -> np.ndarray:
    """Deterministic mini k-means on a sampled subset (driver-side on
    the SAMPLE only — the corpus itself is never materialized).

    The sample is selected by a stable hash of the id column, NOT
    ``random_sample``: Ray's sampler draws per-block, so its output
    depends on block layout / parallelism — the same job at 8 and 32
    CPUs would train different centroids and return different top-k.
    Hash-selection is layout-independent (same rows at any cluster
    size).

    ``sample_budget_rows`` is an ABSOLUTE cap on the pulled sample:
    fraction-only sampling is corpus-proportional (20 % of 10^12 rows
    is not a sample, it is the corpus — VERDICT r2 finding 3). When
    the fraction would exceed the budget, the effective fraction
    shrinks to ~budget/count and the hash-bucket granularity refines so
    the cut can express it; k-means on ≥10^5 hash-spread rows trains
    the same centroids for all practical purposes. For corpora where
    frac × count ≤ budget the selection is bit-identical to the
    budget-free behavior (goldens unchanged)."""
    import math

    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.scalar import stable_bucket

    n_buckets = 1000
    count = ds.count()  # parquet metadata count — no full scan
    if count * sample_frac > sample_budget_rows:
        sample_frac = sample_budget_rows / max(count, 1)
        n_buckets = max(1000, math.ceil(count / sample_budget_rows) * 10)
    cut = max(1, int(sample_frac * n_buckets))

    def pick(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch[id_col], n_buckets)
        return batch.filter(pa.array(b < cut))

    # sort by id: take_all() returns blocks in streaming completion
    # order, which varies with parallelism — the trained centroids must
    # not depend on row arrival order
    sample = sorted(
        ds.map_batches(pick, batch_format="pyarrow").take_all(),
        key=lambda r: r[id_col],
    )
    mat = _unit(np.array([r[vec_col] for r in sample], dtype=np.float32))
    rng = np.random.RandomState(seed)
    cents = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    for _ in range(iters):
        assign = (mat @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def ivf_topk(ds, queries: dict, *, vec_col="embedding", id_col="vec_id", k=10,
             n_centroids=16, nprobe=4, seed=13):
    """IVF approximate top-k: assign rows to their nearest centroid,
    keep only rows whose centroid is among the query's nprobe nearest,
    then exact cosine within the probed subset. Centroids broadcast
    once; assignment is one matmul per batch."""
    import ray

    cents = train_centroids(ds, vec_col=vec_col, n_centroids=n_centroids, seed=seed)
    qmat = _unit(queries["mat"].astype(np.float32))
    probe = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]  # [nq, nprobe]
    probed_sets = [set(row.tolist()) for row in probe]
    state = {"cents": cents, "queries": queries, "probed": probed_sets, "k": k}
    sref = ray.put(state)

    class ProbedTopK:
        def __init__(self):
            s = ray.get(sref)
            self.cents = s["cents"]
            self.qids = s["queries"]["query_id"]
            self.qmat = _unit(s["queries"]["mat"].astype(np.float32))
            self.probed = s["probed"]
            self.k = s["k"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _unit(_as_matrix(batch[vec_col]))
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            assign = (vecs @ self.cents.T).argmax(axis=1)
            out_q, out_id, out_s = [], [], []
            sims = self.qmat @ vecs.T
            for qi in range(len(self.qids)):
                mask = np.isin(assign, list(self.probed[qi]))
                if not mask.any():
                    continue
                s = sims[qi][mask]
                sel_ids = ids[mask]
                k = min(self.k, len(s))
                # tie-stable like BatchTopK: score desc, then id asc, so
                # block layout can't change which tied candidate survives
                idx = np.lexsort((sel_ids, -s))[:k]
                out_q.append(np.full(k, self.qids[qi], dtype=np.int64))
                out_id.append(sel_ids[idx])
                out_s.append(s[idx].astype(np.float64))
            if not out_q:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "score": pa.array([], pa.float64()),
                    }
                )
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
                    "score": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    partial = ds.map_batches(ProbedTopK, batch_format="pyarrow", concurrency=(1, 8))

    def merge(group: pa.Table) -> pa.Table:
        # pyarrow in/out: a pandas merge emitting PandasBlockSchema
        # blocks next to empty pyarrow blocks triggers Ray's
        # mixed-schema RefBundle warning and a needless conversion
        order = pc.sort_indices(
            group, sort_keys=[("score", "descending"), ("vec_id", "ascending")]
        )
        return group.take(order[: min(k, len(group))])

    return partial.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def embedding_pca(ds, *, k: int = 8, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Distributed PCA over an embedding column via mergeable
    sufficient statistics — the standard pattern for corpus-scale
    linear algebra:

    1. each batch emits ONE row of partials: (n, Σx, XᵀX) — O(d²)
       floats per BLOCK, so the driver pull is O(blocks·d²), never the
       vectors;
    2. the driver assembles the covariance (d×d, tiny — d=64 here),
       eigendecomposes, and fixes each component's sign by forcing its
       largest-|coefficient| positive (eigenvector sign is otherwise
       arbitrary → would break run determinism);
    3. the top-k projection broadcasts once via ``ray.put`` and a
       streaming map projects every vector: coords = (x − μ) @ W.

    Returns (projected pandas frame sorted by id, explained-variance
    ratios). Projection columns are pc0..pc{k-1} float64. Summation
    order varies with block layout, so values are reproducible to
    float tolerance (~1e-9 relative), not bit-exact — callers that
    need exactness round, as the oracles do."""
    import ray

    def partials(batch: pa.Table) -> pa.Table:
        x = _as_matrix(batch[vec_col])
        return pa.table(
            {
                "n": pa.array([x.shape[0]], pa.int64()),
                "s": pa.array([x.sum(axis=0).tolist()]),
                "xtx": pa.array([(x.T @ x).ravel().tolist()]),
            }
        )

    parts = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    if n < 2:
        raise ValueError("embedding_pca needs at least 2 vectors")
    s = np.sum(np.stack([np.asarray(v, np.float64) for v in parts["s"]]), axis=0)
    xtx = np.sum(np.stack([np.asarray(v, np.float64) for v in parts["xtx"]]), axis=0)
    d = s.shape[0]
    mean = s / n
    cov = (xtx.reshape(d, d) - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    w = evecs[:, order]
    flip = np.sign(w[np.argmax(np.abs(w), axis=0), np.arange(w.shape[1])])
    flip[flip == 0] = 1.0
    w = w * flip
    evr = evals[order] / max(evals.sum(), 1e-300)
    wref = ray.put((mean, w))

    def project(batch: pa.Table) -> pa.Table:
        mu, ww = ray.get(wref)
        x = _as_matrix(batch[vec_col])
        coords = (x - mu) @ ww
        cols = {id_col: batch[id_col]}
        for j in range(coords.shape[1]):
            cols[f"pc{j}"] = pa.array(coords[:, j], pa.float64())
        return pa.table(cols)

    out = (
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values(id_col)
        .reset_index(drop=True)
    )
    return out, evr
