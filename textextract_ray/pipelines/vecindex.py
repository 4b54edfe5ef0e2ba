"""Disk-backed vector index (IVF layout on Parquet) + hybrid search.

The persistent counterpart of ``stages/similarity.ivf_topk``: that
operator trains centroids and probes in one job, re-scanning (and
re-assigning) the corpus per query batch. At 100 TB the index must be
built ONCE and queried many times from storage, opening only the
partitions a query can match — the same economics as the BM25 index
(`pipelines/search.py`), with k-means cells playing the role of term
ranges:

* ``build_vector_index`` — fit distributed Lloyd k-means
  (`stages/kmeans.py`: per pass the corpus ships only (count, sum)
  partials), then ONE assignment pass hive-partitions the (id, vector,
  cluster) rows by cell (``_part=N/`` dirs). Centroids + meta commit
  atomically next to the data. Shuffle-free: the write is per-batch
  tagging, rows are co-FILED by cell, never globally sorted.
* ``vector_search`` — nearest ``nprobe`` cells per query from the
  O(k·d) centroid table (driver-side), then a pruned read of ONLY the
  probed ``_part`` dirs; exact cosine within them, per-block local
  top-k, small per-query merge. Query cost is O(rows in probed cells),
  independent of corpus size; ``vector_search.last_pruning`` records
  (cells_read, cells_total) so tests pin that pruning actually prunes.
* ``hybrid_search`` — BM25 lexical ranking + vector ranking fused by
  Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009:
  score = Σ 1/(rrf_k + rank)) — the standard lexical+dense retrieval
  combiner. Pure driver arithmetic over two ≤fetch_k result lists.

The index stores vectors as written by the embedder (fixed-size or
variable list<float>); cells with zero rows simply have no directory.
Like the BM25 index, the one corpus-scale artifact is the clustered
vector file set — the irreducible size of the index itself.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..stages.similarity import _as_matrix, _unit

_META = "meta.json"
_CENTROIDS = "centroids.parquet"
_VECTORS = "vectors"


def build_vector_index(
    emb_ds,
    index_dir: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    refine_iters: int = 2,
    seed: int = 13,
) -> dict:
    """Build the cell-partitioned vector layout under ``index_dir``.
    ``emb_ds`` rows need (id_col, vec_col). Returns the committed meta
    dict. NOTE: k-means runs ``refine_iters`` + 1 streaming passes plus
    the assignment/write pass — if ``emb_ds`` is a lazy embed chain,
    persist it to parquet first or each pass re-embeds (embed.py)."""
    import ray

    from ..stages.kmeans import kmeans_fit

    cents, _hist = kmeans_fit(
        emb_ds, n_clusters=n_clusters, vec_col=vec_col, id_col=id_col,
        refine_iters=refine_iters, seed=seed,
    )
    cents = np.asarray(cents, dtype=np.float64)
    cref = ray.put(cents)

    def tag(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _unit(_as_matrix(batch[vec_col]))
        a = (x @ c.T).argmax(axis=1).astype(np.int32)
        # cluster kept BOTH as the hive partition key (_part) and as a
        # data column: a pruned read of a file subset does not
        # reconstruct hive values, and per-query probe masks need it
        return pa.table(
            {
                id_col: batch[id_col],
                vec_col: batch[vec_col],
                "cluster": pa.array(a, pa.int32()),
                "_part": pa.array(a, pa.int32()),
            }
        )

    # pointer-commit protocol (mirrors the meta/centroids tmp+rename
    # below, extended to the corpus-scale artifact): vectors write into
    # a UNIQUE directory, the meta.json rename atomically repoints the
    # index at it, and only then are superseded vector dirs removed —
    # a rebuild into an existing index_dir can never leave stale
    # _part files for vector_search to silently read, and a crash
    # mid-build leaves the previous index fully intact.
    import secrets
    import shutil

    os.makedirs(index_dir, exist_ok=True)
    vec_dir_name = f"{_VECTORS}-{secrets.token_hex(8)}"
    emb_ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, vec_dir_name), partition_cols=["_part"]
    )

    d = cents.shape[1]
    cent_tbl = pa.table(
        {
            "cluster": pa.array(np.arange(len(cents), dtype=np.int32)),
            "centroid": pa.FixedSizeListArray.from_arrays(
                pa.array(cents.ravel(), pa.float64()), d
            ),
        }
    )
    tmp = os.path.join(index_dir, _CENTROIDS + ".tmp")
    pq.write_table(cent_tbl, tmp)
    os.replace(tmp, os.path.join(index_dir, _CENTROIDS))
    meta = {
        "dim": int(d),
        "n_clusters": int(len(cents)),
        "id_col": id_col,
        "vec_col": vec_col,
        "vectors_dir": vec_dir_name,
    }
    tmp = os.path.join(index_dir, _META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(tmp, os.path.join(index_dir, _META))
    # committed — drop superseded vector dirs (best-effort cleanup)
    for name in os.listdir(index_dir):
        if name.startswith(_VECTORS) and name != vec_dir_name:
            shutil.rmtree(os.path.join(index_dir, name), ignore_errors=True)
    return meta


def _load_meta(index_dir: str):
    with open(os.path.join(index_dir, _META)) as fh:
        meta = json.load(fh)
    cent_tbl = pq.read_table(os.path.join(index_dir, _CENTROIDS))
    k = cent_tbl.num_rows
    cents = np.array(cent_tbl["centroid"].to_pylist(), dtype=np.float64).reshape(
        k, meta["dim"]
    )
    return meta, cents


def vector_search(index_dir: str, queries: dict, *, k: int = 10,
                  nprobe: int = 4, stats: dict | None = None):
    """Approximate top-k over a ``build_vector_index`` layout.
    ``queries`` = {"query_id": int64 array, "mat": float [nq, d]}.
    Returns a Dataset of (query_id, vec_id, score) — exactly ≤k rows
    per query, ties broken by smaller id (same contract as
    brute_force_topk / ivf_topk, so consumers are interchangeable).

    Pass a dict as ``stats`` to receive this call's pruning numbers
    ({"cells_read", "cells_total"}) — per-call and race-free; the
    ``vector_search.last_pruning`` attribute remains as a last-call-
    wins debugging aid only."""
    import ray
    import ray.data as rd

    meta, cents = _load_meta(index_dir)
    id_col = meta["id_col"]
    vec_col = meta["vec_col"]
    qmat = _unit(np.asarray(queries["mat"], dtype=np.float64))
    if qmat.shape[1] != meta["dim"]:
        raise ValueError(
            f"query dim {qmat.shape[1]} != index dim {meta['dim']}"
        )
    nprobe = min(nprobe, len(cents))
    sims_qc = qmat @ cents.T
    probe = np.argsort(-sims_qc, axis=1)[:, :nprobe]  # [nq, nprobe]
    probed_sets = [row.tolist() for row in probe]
    union = sorted({c for row in probed_sets for c in row})
    vector_search.last_pruning = (len(union), meta["n_clusters"])
    if stats is not None:
        stats["cells_read"] = len(union)
        stats["cells_total"] = meta["n_clusters"]

    vec_dir = meta.get("vectors_dir", _VECTORS)
    paths = []
    for c in union:
        d = os.path.join(index_dir, vec_dir, f"_part={c}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )
    if not paths:
        return rd.from_arrow(empty)

    state = {"qids": np.asarray(queries["query_id"], dtype=np.int64),
             "qmat": qmat, "probed": probed_sets, "k": k}
    sref = ray.put(state)

    class CellTopK:
        def __init__(self):
            s = ray.get(sref)
            self.qids, self.qmat = s["qids"], s["qmat"]
            self.probed = [set(p) for p in s["probed"]]
            self.k = s["k"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _unit(_as_matrix(batch[vec_col]))
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            cl = batch["cluster"].to_numpy(zero_copy_only=False)
            sims = self.qmat @ vecs.T
            out_q, out_id, out_s = [], [], []
            for qi in range(len(self.qids)):
                mask = np.isin(cl, list(self.probed[qi]))
                if not mask.any():
                    continue
                s = sims[qi][mask]
                sel = ids[mask]
                kk = min(self.k, len(s))
                idx = np.lexsort((sel, -s))[:kk]
                out_q.append(np.full(kk, self.qids[qi], dtype=np.int64))
                out_id.append(sel[idx])
                out_s.append(s[idx].astype(np.float64))
            if not out_q:
                return empty
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "vec_id": pa.array(
                        np.concatenate(out_id).astype(np.int64), pa.int64()
                    ),
                    "score": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    partial = rd.read_parquet(paths).map_batches(
        CellTopK, batch_format="pyarrow", concurrency=(1, 8)
    )

    def merge(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("score", "descending"), ("vec_id", "ascending")]
        )
        return group.take(order[: min(k, len(group))])

    return partial.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def hybrid_search(
    text_index_dir: str,
    vec_index_dir: str,
    query: str,
    *,
    k: int = 10,
    nprobe: int = 4,
    rrf_k: int = 60,
    fetch_k: int | None = None,
    ngrams=(1, 2),
) -> pd.DataFrame:
    """Lexical + dense retrieval fused by Reciprocal Rank Fusion:
    rrf(doc) = Σ_systems 1/(rrf_k + rank_system(doc)), docs absent from
    a system contribute nothing for it. Both indexes must share doc
    ids. Returns (doc_id, rrf, bm25_rank, vec_rank) — top-k by
    (rrf desc, doc_id asc); ranks are 1-based, <NA> when unranked."""
    from .embed import embed_query
    from .search import bm25_search

    fetch_k = fetch_k or max(k * 3, 30)
    meta, _cents = _load_meta(vec_index_dir)
    lex = bm25_search(text_index_dir, query, k=fetch_k)
    lex_ids = lex[lex.columns[0]].to_numpy(dtype=np.int64)

    qv = embed_query(query, dim=meta["dim"], ngrams=ngrams)
    hits = vector_search(
        vec_index_dir,
        {"query_id": np.array([0], dtype=np.int64), "mat": qv[None, :]},
        k=fetch_k, nprobe=nprobe,
    ).to_pandas()
    hits = hits.sort_values(["score", "vec_id"], ascending=[False, True])
    vec_ids = hits["vec_id"].to_numpy(dtype=np.int64)

    scores: dict[int, float] = {}
    ranks: dict[int, list] = {}
    for sys_i, ids in enumerate((lex_ids, vec_ids)):
        for r, doc in enumerate(ids, start=1):
            doc = int(doc)
            scores[doc] = scores.get(doc, 0.0) + 1.0 / (rrf_k + r)
            ranks.setdefault(doc, [None, None])[sys_i] = r
    rows = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pd.DataFrame(
        {
            "doc_id": pd.array([d for d, _ in rows], dtype="int64"),
            "rrf": [s for _, s in rows],
            "bm25_rank": pd.array([ranks[d][0] for d, _ in rows],
                                  dtype="Int64"),
            "vec_rank": pd.array([ranks[d][1] for d, _ in rows],
                                 dtype="Int64"),
        }
    )
