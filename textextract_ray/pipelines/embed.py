"""Deterministic text embeddings + corpus topic labeling.

The missing bridge between the text column and the vector stack: every
similarity operator in this engine (ANN brute/IVF/int8/PQ, SemDeDup,
k-means, PCA) consumes an ``embedding`` column, but until now that
column had to arrive pre-computed. ``embed_text_ds`` produces it from
raw text with a fully deterministic, training-free embedder:

* **hashing-trick bag of token n-grams** (Weinberger et al. 2009,
  arXiv:0902.2206): each token n-gram's 64-bit hash — the engine's
  shared ``batch_shingle_hashes`` family, so embeddings and MinHash
  sketches can never disagree about tokenization — IS its feature id;
* **signed random projection** (Charikar 2002, STOC — the SimHash
  construction): dimension ``64·w + j`` of an occurrence's projection
  row is bit ``j`` of ``splitmix64(hash ^ mix(w))`` mapped to ±1, so
  the dense projection matrix is NEVER materialized or shipped — it is
  recomputed from the occurrence hash itself, one vectorized
  ``unpackbits`` per 64 output dims;
* a document's raw vector is the sum of its occurrences' ±1 rows
  (term frequency falls out of summation), L2-normalized. Empty and
  whitespace-only docs embed to the zero vector (cosine 0 vs all).

Scale shape: ZERO shuffle, zero state — a pure per-batch map; each
occurrence costs ``dim`` sign lookups and one segment-sum, processed
in occurrence-bounded slices so batch memory stays ≤ ~32 MB regardless
of document sizes. Layout-independent by construction (per-doc
function of content only), so retries/repartitions are byte-stable.

This is NOT a semantic embedding — no pretrained model exists in this
container — but it is the real plumbing with honest geometry: shared
vocabulary ⇒ high cosine, disjoint vocabulary ⇒ ~0, which is exactly
what the lexical stand-in promises. Swap ``embed_batch`` for a model
call inside the same actor signature in production.

``cluster_topics`` composes the embedder with the distributed Lloyd
trainer (`stages/kmeans.py`) into the standard corpus-exploration
recipe (e.g. the clustering stage of SemDeDup, arXiv:2303.09540, or
corpus datasheet topic breakdowns): fit k-means on embeddings, then
label every cluster with its most DISTINCTIVE terms — highest lift =
(in-cluster term share) / (corpus term share) — via one extra corpus
pass that ships only pre-combined (cluster, term, count) partials.

Reference parity note: the reference has no embeddings; this module
exists for the training-data-pipeline brief (similarity search over
text corpora). Reference-shaped pieces reused: actor-pool batch shape
(src/ocr.py:22-41 singleton-session analogue), deterministic pure
per-record transform contract (backend/routes/api_routes.py:78).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.scalar import _splitmix64
from ..functions.text import batch_shingle_hashes

# Domain-separation constant for projection words (arbitrary odd
# 64-bit; changing it changes every embedding — version it like the
# extractor version if embeddings are persisted across runs). Kept as
# Python ints: the per-word mix computes in arbitrary-precision int
# masked to 64 bits, because numpy SCALAR uint64 ops warn on wraparound
# (array ops wrap silently) — dim > 64 would log on every batch.
_PROJ_SEED = 0xE3B0C44298FC1C14
_GOLDEN = 0x9E3779B97F4A7C15
_M64 = (1 << 64) - 1

# Occurrence-slice bound: slice × dim float32 ≤ ~128 MB at dim=256.
_OCC_CHUNK = 1 << 17


def _occurrence_hashes(texts: list, ngrams) -> tuple[np.ndarray, np.ndarray]:
    """Flat uint64 occurrence-hash array + per-doc lengths. Each doc's
    occurrences are the concatenation of its k-gram hash arrays for
    every k in ``ngrams`` (order irrelevant — summation commutes)."""
    per_k = [batch_shingle_hashes(texts, k=k) for k in ngrams]
    n = len(texts)
    lens = np.zeros(n, dtype=np.int64)
    parts = []
    for d in range(n):
        for gk in per_k:
            g = gk[d]
            if len(g):
                lens[d] += len(g)
                parts.append(g)
    flat = np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
    return flat, lens


def _sign_matrix(h: np.ndarray, dim: int) -> np.ndarray:
    """(len(h), dim) float32 ±1 projection rows recomputed from the
    occurrence hashes: word w of a row is splitmix64(h ^ mix(w)),
    little-endian bits → {0,1} → {-1,+1}."""
    n_words = (dim + 63) // 64
    cols = []
    for w in range(n_words):
        mix = np.uint64((_PROJ_SEED + w * _GOLDEN) & _M64)
        hw = _splitmix64(h ^ mix)
        bits = np.unpackbits(
            hw.astype("<u8").view(np.uint8).reshape(-1, 8),
            axis=1, bitorder="little",
        )
        cols.append(bits)
    b = np.concatenate(cols, axis=1)[:, :dim] if n_words > 1 else cols[0][:, :dim]
    return b.astype(np.float32) * 2.0 - 1.0


def embed_batch(texts: list, *, dim: int = 64, ngrams=(1, 2)) -> np.ndarray:
    """(n, dim) float32 unit-row embedding matrix for a batch of
    strings. Pure function of each text alone — batch composition and
    order cannot affect any row (the layout-invariance contract)."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    n = len(texts)
    out = np.zeros((n, dim), dtype=np.float32)
    if n == 0:
        return out
    flat, lens = _occurrence_hashes(texts, ngrams)
    if len(flat) == 0:
        return out
    offs = np.concatenate([[0], np.cumsum(lens)])
    # doc-aligned occurrence slices: each slice covers whole docs and
    # at most ~_OCC_CHUNK occurrences (single giant docs still go
    # through in one piece — their slice is just that doc).
    doc_lo = 0
    while doc_lo < n:
        doc_hi = doc_lo + 1
        while doc_hi < n and offs[doc_hi + 1] - offs[doc_lo] <= _OCC_CHUNK:
            doc_hi += 1
        lo, hi = offs[doc_lo], offs[doc_hi]
        if hi > lo:
            signs = _sign_matrix(flat[lo:hi], dim)
            seg = lens[doc_lo:doc_hi]
            nz = np.flatnonzero(seg > 0)
            if len(nz):
                # reduceat over nonzero-length docs only: empty docs
                # occupy no occurrence rows, so consecutive nonzero
                # offsets still bound exactly the right row ranges.
                starts = (offs[doc_lo:doc_hi][nz] - lo).astype(np.int64)
                sums = np.add.reduceat(signs, starts, axis=0)
                out[doc_lo + nz] = sums
        doc_lo = doc_hi
    norms = np.linalg.norm(out, axis=1)
    norms[norms == 0] = 1.0
    return out / norms[:, None]


def embed_query(text: str, *, dim: int = 64, ngrams=(1, 2)) -> np.ndarray:
    """Driver-side single-text embedding — byte-identical kernel to
    the corpus side (they must never drift, same rule as the
    classifier's shared featurization)."""
    return embed_batch([text], dim=dim, ngrams=ngrams)[0]


def embed_text_ds(ds, *, text_col: str = "text", id_col: str = "doc_id",
                  dim: int = 64, ngrams=(1, 2), keep_cols=()):
    """Dataset-returning embedder: (id, embedding fixed_size_list
    <float32, dim>[, keep_cols...]) per row. ZERO shuffle; the output
    plugs directly into brute_force_topk / ivf_topk / quantized_topk /
    pq_topk / kmeans_fit / semantic dedup (vec_col="embedding").

    NOTE for iterative consumers (kmeans_fit runs one corpus pass per
    Lloyd iteration): Ray re-executes this lazy map per pass — persist
    the embeddings (write_parquet → read_parquet) first when the
    corpus is large enough that re-embedding dominates."""

    def to_vecs(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "").to_pylist()
        mat = embed_batch(texts, dim=dim, ngrams=ngrams)
        cols = {id_col: batch[id_col]}
        for c in keep_cols:
            cols[c] = batch[c]
        cols["embedding"] = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), pa.float32()), dim
        )
        return pa.table(cols)

    return ds.map_batches(to_vecs, batch_format="pyarrow", zero_copy_batch=True)


def semantic_decontaminate_against(
    ds,
    bench_ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = None,
    dim: int = 64,
    ngrams=(1, 2),
    threshold: float = 0.85,
    max_bench_rows: int = 2_000_000,
):
    """Embedding-space test-set decontamination: flag corpus documents
    whose embedding is within cosine ``threshold`` of ANY benchmark
    document — the vector complement of the engine's two lexical
    decontaminators (`textops.decontaminate`: exact n-gram membership;
    `stages.dedup.fuzzy_decontaminate_against`: MinHash near-dup). A
    reworded eval item that keeps its vocabulary but shares few exact
    grams and disagrees on shingle sets still lands close in bag-of-
    ngram embedding space (the SemDeDup argument, arXiv:2303.09540,
    pointed at contamination instead of redundancy).

    Scale shape — ZERO shuffle, one corpus pass: the benchmark side is
    eval-set-sized by nature, so its embedding matrix (n_bench × dim
    float32, budget-guarded by ``max_bench_rows``) builds once and
    broadcasts via ``ray.put``; each corpus batch embeds itself with
    the SAME deterministic kernel and takes one (batch × bench) matmul
    for the max cosine. Deterministic and layout-independent (pure
    function of text + benchmark set); empty docs embed to the zero
    vector and are never contaminated.

    Returns (id, max_cosine, bench_idx, contaminated): bench_idx is
    the 0-based row of the nearest benchmark doc in ``bench_ds`` scan
    order (-1 when the corpus doc is empty), the audit pointer."""
    import ray

    btc = bench_text_col or text_col
    # bench_idx is documented as bench_ds SCAN-ORDER position, so the
    # matrix must build in dataset order — a worker-side map + iterate
    # can interleave blocks by completion (preserve_order defaults
    # False). The bench side is eval-set-sized by contract: budget-
    # check, pull the text column in order, embed driver-side.
    # ONE pull (limit max_bench_rows+1), budget enforced on its length:
    # count() + to_pandas() would execute the upstream bench pipeline
    # twice — double the cost, and the documented bench_idx scan-order
    # audit pointer could drift between the two runs if the upstream
    # were ever nondeterministic (ADVICE r4)
    bench_df = bench_ds.select_columns([btc]).limit(max_bench_rows + 1).to_pandas()
    # an empty Dataset's to_pandas can drop the column entirely
    texts = (
        bench_df[btc].fillna("").tolist() if btc in bench_df.columns else []
    )
    n_bench = len(texts)
    if n_bench > max_bench_rows:
        raise ValueError(
            f"benchmark side exceeds max_bench_rows={max_bench_rows}; "
            "semantic decontamination broadcasts the bench matrix — "
            "cluster it first (kmeans_fit) or use the membership path"
        )
    if n_bench == 0:
        raise ValueError("semantic_decontaminate_against: empty benchmark set")
    mats = [
        embed_batch(texts[i : i + 4096], dim=dim, ngrams=ngrams)
        for i in range(0, len(texts), 4096)
    ]
    bench = np.vstack(mats)  # rows already L2-normalized by embed_batch
    bref = ray.put(bench)

    def probe(batch: pa.Table) -> pa.Table:
        b = ray.get(bref)
        mat = embed_batch(
            pc.fill_null(batch[text_col], "").to_pylist(), dim=dim, ngrams=ngrams
        )
        sims = mat @ b.T  # both sides unit-norm (or zero) -> cosine
        best = sims.argmax(axis=1).astype(np.int64)
        mx = sims[np.arange(len(mat)), best].astype(np.float64)
        empty = ~mat.any(axis=1)
        best[empty] = -1
        mx[empty] = 0.0
        return pa.table(
            {
                id_col: batch[id_col],
                "max_cosine": pa.array(np.round(mx, 6), pa.float64()),
                "bench_idx": pa.array(best, pa.int64()),
                "contaminated": pa.array(mx >= threshold, pa.bool_()),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def cluster_topics(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   n_clusters: int = 8, dim: int = 64, ngrams=(1, 2),
                   top_k: int = 10, min_count: int = 2, refine_iters: int = 3,
                   seed: int = 13, budget_rows: int = 5_000_000):
    """Corpus topic discovery: k-means over deterministic embeddings +
    per-cluster distinctive-term labels. Returns a pandas frame of
    ≤ n_clusters·top_k rows (cluster, term, count, share, lift) ranked
    per cluster by (lift desc, count desc, term asc).

    Dataflow (all corpus passes stream; nothing O(corpus) is pulled):

    1. ``kmeans_fit`` on ``embed_text_ds(ds)`` — per Lloyd pass the
       corpus ships only (count, sum) partials (see stages/kmeans.py).
    2. ONE labeling pass: centroids broadcast once; each batch embeds,
       assigns, tokenizes (the shared vocab-operator tokenizer), and
       emits PRE-COMBINED (cluster, term, count) partials — the only
       shuffle is the keys-only groupby of those partials.
    3. Per-cluster/term totals reaggregate the AGGREGATE table
       (hierarchical-rollup rule); term totals attach via the public
       budget-guarded broadcast lookup join.
    4. ``lift = (count / cluster_tokens) / (term_total / all_tokens)``,
       candidates under ``min_count`` dropped, winners selected by
       per-cluster local-top-k nomination (each block nominates its
       own top_k per cluster — a block can contribute at most top_k
       winners, so nominations are exact), O(blocks·k·clusters) pull.
    """
    import ray

    from ..stages.kmeans import kmeans_fit
    from .relational import broadcast_lookup_join_ds

    emb = embed_text_ds(ds, text_col=text_col, id_col=id_col, dim=dim,
                        ngrams=ngrams)
    cents, _hist = kmeans_fit(
        emb, n_clusters=n_clusters, vec_col="embedding", id_col=id_col,
        refine_iters=refine_iters, seed=seed,
    )
    cref = ray.put(np.asarray(cents, dtype=np.float64))

    def label_partials(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        texts = pc.fill_null(batch[text_col], "").to_pylist()
        mat = embed_batch(texts, dim=dim, ngrams=ngrams).astype(np.float64)
        assign = (mat @ c.T).argmax(axis=1).astype(np.int32)
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        low = pc.utf8_lower(pc.fill_null(col, ""))
        toks = pc.split_pattern_regex(low, pattern="[^a-z]+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        mask = pc.not_equal(flat, "")
        flat = flat.filter(mask)
        parents = parents.filter(mask)
        if len(flat) == 0:
            return pa.table({
                "cluster": pa.array([], pa.int32()),
                "term": pa.array([], pa.string()),
                "count": pa.array([], pa.int64()),
            })
        df = pd.DataFrame({
            "cluster": assign[parents.to_numpy(zero_copy_only=False)],
            "term": flat.to_pandas(),
        })
        agg = df.groupby(["cluster", "term"], as_index=False, sort=False).size()
        return pa.table({
            "cluster": pa.array(agg["cluster"].to_numpy(), pa.int32()),
            "term": pa.array(agg["term"], pa.string()),
            "count": pa.array(agg["size"].to_numpy(), pa.int64()),
        })

    partials = ds.map_batches(label_partials, batch_format="pyarrow",
                              zero_copy_batch=True)
    agg = partials.groupby(["cluster", "term"]).sum("count")
    agg = agg.map_batches(
        lambda b: b.rename_columns(["cluster", "term", "count"]),
        batch_format="pyarrow",
    )

    # per-cluster token totals: O(n_clusters) rows — driver-safe pull
    ctot_df = agg.groupby("cluster").sum("count").to_pandas()
    if len(ctot_df) == 0:
        return pd.DataFrame({
            "cluster": pd.Series([], dtype=np.int32),
            "term": pd.Series([], dtype=object),
            "count": pd.Series([], dtype=np.int64),
            "share": pd.Series([], dtype=np.float64),
            "lift": pd.Series([], dtype=np.float64),
        })
    cluster_tokens = dict(zip(ctot_df["cluster"], ctot_df["sum(count)"]))
    all_tokens = float(sum(cluster_tokens.values()))

    # corpus-wide term totals (vocab-size, keys-only) attach to the
    # min_count-filtered candidates via the budgeted broadcast join
    term_tot = agg.groupby("term").sum("count").map_batches(
        lambda b: b.rename_columns(["term", "term_total"]),
        batch_format="pyarrow",
    )
    cand = agg.map_batches(
        lambda b: b.filter(pc.greater_equal(b["count"], min_count)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    cand = broadcast_lookup_join_ds(cand, term_tot, on="term",
                                    dim_cols=["term_total"],
                                    budget_rows=budget_rows)

    ctok_items = sorted(cluster_tokens.items())
    ctok_keys = np.array([k for k, _ in ctok_items], dtype=np.int64)
    ctok_vals = np.array([v for _, v in ctok_items], dtype=np.float64)

    def score_and_nominate(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        ct = ctok_vals[np.searchsorted(ctok_keys, df["cluster"].to_numpy())]
        share = df["count"].to_numpy(dtype=np.float64) / ct
        lift = share / (df["term_total"].to_numpy(dtype=np.float64) / all_tokens)
        df["share"] = share
        df["lift"] = lift
        df = df.sort_values(["cluster", "lift", "count", "term"],
                            ascending=[True, False, False, True])
        df = df.groupby("cluster", sort=False).head(top_k)
        return pa.Table.from_pandas(df.drop(columns=["term_total"]),
                                    preserve_index=False)

    nom = cand.map_batches(score_and_nominate, batch_format="pyarrow").to_pandas()
    if len(nom) == 0:
        return pd.DataFrame({
            "cluster": pd.Series([], dtype=np.int32),
            "term": pd.Series([], dtype=object),
            "count": pd.Series([], dtype=np.int64),
            "share": pd.Series([], dtype=np.float64),
            "lift": pd.Series([], dtype=np.float64),
        })
    nom = nom.sort_values(["cluster", "lift", "count", "term"],
                          ascending=[True, False, False, True])
    out = nom.groupby("cluster", sort=True).head(top_k).reset_index(drop=True)
    return out[["cluster", "term", "count", "share", "lift"]]
