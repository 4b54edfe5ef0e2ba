"""Content-defined chunking (gear-hash CDC) + chunk-level dedup stats.

Fixed-size chunking breaks under insertion: one added byte shifts every
later chunk boundary, so near-identical documents share no chunks.
Content-defined chunking (the rolling-gear-hash family behind storage
dedup systems; FastCDC, Xia et al., USENIX ATC 2016 — public
literature) cuts where a rolling hash of the last W bytes hits a mask,
so boundaries are a pure function of LOCAL content and re-synchronize
within one chunk of any edit. For training corpora this gives a
tokenizer-independent way to (a) measure byte-level duplication that
survives insertions/deletions (where exact doc-hash dedup sees 0 %)
and (b) nominate near-duplicate documents by shared-chunk fraction.

Algorithm notes:
- 32-bit gear: ``h_t = (h_{t-1} << 1) + G[b_t]`` over a random byte
  table G (derived from the repo-owned splitmix64 family, so chunk
  boundaries are deterministic across processes). Because shifts
  overflow out of the register, ``h_t`` depends on exactly the last
  32 bytes — which makes the recurrence EXACTLY equal to
  ``Σ_{j<32} G[b_{t-j}] << j`` and therefore vectorizable as 32
  shifted adds over the whole flat byte array (no per-byte Python).
- candidate boundary after byte t when ``h_t & (avg_size-1) == 0``
  (``avg_size`` a power of two); the min/max walk over CANDIDATES is
  a Python loop of O(chunks) steps, ~1/avg_size of bytes — the
  per-batch cost stays O(bytes) vectorized + O(bytes/avg) interpreted.
- chunk identity = the engine hash of the chunk BYTES (zero-copy
  LargeBinary slices through ``hash_utf8``'s binary path), so equal
  text ⇒ equal chunk ids across documents and runs.

Scale shape: ``cdc_chunks_ds`` is a zero-shuffle 1→N flat map whose
output is (id, idx, hash, len) — 28 B per ~avg_size input bytes; the
dedup stats shuffle ships ONLY that projection (groupby chunk_hash),
never text, and the duplicated-hash set returns to a broadcast probe,
the same keys-only pattern as the url dedup scan
(pipelines/extract_pipeline.py). Reference parity: none (the reference
has no corpus dedup); training-data-pipeline brief operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.scalar import _splitmix64, hash_utf8

# deterministic 256-entry gear table from the repo hash family
_GEAR32 = (
    _splitmix64(np.arange(256, dtype=np.uint64) ^ np.uint64(0xCDC0_51AB))
    & np.uint64(0xFFFFFFFF)
).astype(np.uint32)

CDC_DUP_BROADCAST_BUDGET = 50_000_000  # 8 B/hash -> ~400 MB object


def _gear_hash32(flat: np.ndarray) -> np.ndarray:
    """Vectorized 32-bit gear hash at every position of ``flat``
    (uint8): h[t] = sum_{j<32} G[flat[t-j]] << j — exactly the
    sequential gear recurrence, 32 shifted adds, no Python loop over
    bytes."""
    g = _GEAR32[flat]
    n = len(g)
    h = np.zeros(n, dtype=np.uint32)
    for j in range(32):
        if j >= n:
            break
        h[j:] += g[: n - j] << np.uint32(j)
    return h


def _doc_boundaries(
    h: np.ndarray, start: int, end: int, min_size: int, avg_mask: int,
    max_size: int,
) -> list:
    """Greedy candidate walk for one doc over precomputed gear hashes;
    returns chunk END offsets (exclusive, doc-relative upper bounds as
    absolute flat positions)."""
    cand = start + np.nonzero((h[start:end] & np.uint32(avg_mask)) == 0)[0] + 1
    ends = []
    pos = start
    ci = 0
    nc = len(cand)
    while end - pos > max_size:
        lo = pos + min_size
        hi = pos + max_size
        while ci < nc and cand[ci] < lo:
            ci += 1
        if ci < nc and cand[ci] <= hi:
            cut = int(cand[ci])
            ci += 1
        else:
            cut = hi
        ends.append(cut)
        pos = cut
    # tail: still honor a candidate past min_size if one lands before
    # the natural end (keeps boundaries content-defined to the end)
    while pos < end:
        lo = pos + min_size
        while ci < nc and cand[ci] < lo:
            ci += 1
        if ci < nc and cand[ci] < end:
            cut = int(cand[ci])
            ci += 1
        else:
            cut = end
        ends.append(cut)
        pos = cut
    return ends


def cdc_chunk_table(
    texts, ids, *, min_size: int = 64, avg_size: int = 256,
    max_size: int = 1024,
) -> pa.Table:
    """One batch: documents -> (doc_id, chunk_idx, chunk_hash,
    chunk_len). Pure function of row content (batch-composition
    independent: hashes are computed on a per-doc basis over the
    concatenated buffer, and candidates below ``min_size`` — where the
    32-byte gear window could cross the previous document — are never
    taken because ``min_size >= 32`` is enforced)."""
    if min_size < 32:
        raise ValueError("min_size must be >= 32 (gear window width)")
    if avg_size & (avg_size - 1) or avg_size < 1:
        raise ValueError("avg_size must be a power of two")
    if not (min_size <= avg_size <= max_size):
        raise ValueError("need min_size <= avg_size <= max_size")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    tb = texts.cast(pa.large_binary())
    n = len(tb)
    offs = np.frombuffer(tb.buffers()[1], dtype=np.int64)[
        tb.offset : tb.offset + n + 1
    ]
    data = (
        np.frombuffer(tb.buffers()[2], dtype=np.uint8)
        if tb.buffers()[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    h = _gear_hash32(data)
    ids64 = np.asarray(ids, dtype=np.int64)
    doc_col, idx_col, end_col = [], [], []
    for d in range(n):
        s, e = int(offs[d]), int(offs[d + 1])
        if e <= s:
            continue
        ends = _doc_boundaries(h, s, e, min_size, avg_size - 1, max_size)
        doc_col.append(np.full(len(ends), ids64[d], np.int64))
        idx_col.append(np.arange(len(ends), dtype=np.int32))
        end_col.append(np.asarray(ends, dtype=np.int64))
    if not doc_col:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int32()),
                "chunk_hash": pa.array([], pa.int64()),
                "chunk_len": pa.array([], pa.int64()),
            }
        )
    doc_ids = np.concatenate(doc_col)
    idxs = np.concatenate(idx_col)
    ends = np.concatenate(end_col)
    # start of chunk i = end of chunk i-1, except each doc's first
    # chunk starts at the doc's first byte; docs are contiguous in the
    # flat buffer and chunks partition each doc, so ends are globally
    # monotone and [starts[0], ends...] is a valid offsets vector
    first_mask = idxs == 0
    starts = np.empty_like(ends)
    starts[1:] = ends[:-1]
    starts[first_mask] = offs[:-1][np.diff(offs) > 0]
    lens = ends - starts
    # zero-copy chunk slices over the ORIGINAL data buffer -> engine
    # hash of the chunk bytes (hash_utf8's binary path)
    slice_offsets = np.concatenate(([starts[0]], ends)).astype(np.int64)
    slices = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        len(ends),
        [None, pa.py_buffer(slice_offsets.tobytes()), tb.buffers()[2]],
    )
    hashes = hash_utf8(slices)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "chunk_idx": pa.array(idxs, pa.int32()),
            "chunk_hash": pa.array(hashes.view(np.int64), pa.int64()),
            "chunk_len": pa.array(lens, pa.int64()),
        }
    )


def cdc_chunks_ds(
    docs, *, id_col: str = "doc_id", text_col: str = "text",
    min_size: int = 64, avg_size: int = 256, max_size: int = 1024,
):
    """Dataset of documents -> Dataset of CDC chunk records (zero
    shuffle, 1→N flat map)."""

    def kernel(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "")
        return cdc_chunk_table(
            texts,
            batch[id_col].to_numpy(zero_copy_only=False),
            min_size=min_size,
            avg_size=avg_size,
            max_size=max_size,
        )

    return docs.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def cdc_dedup_stats_ds(
    docs, *, id_col: str = "doc_id", text_col: str = "text",
    min_size: int = 64, avg_size: int = 256, max_size: int = 1024,
    broadcast_budget: int = CDC_DUP_BROADCAST_BUDGET,
):
    """Per-document duplication profile via shared CDC chunks:
    (doc_id, n_chunks, n_bytes, dup_bytes, dup_fraction) where
    dup_fraction = bytes in chunks whose hash occurs in MORE THAN ONE
    document / total bytes. Survives insertions that defeat whole-doc
    hashing; thresholding dup_fraction nominates near-dup documents.

    Two keys-only shuffles: the chunk projection into
    groupby(chunk_hash) (dedup across docs first, so a chunk repeated
    WITHIN one doc does not count), then the per-doc rollup. The
    duplicated-hash set broadcasts once (budget-guarded)."""
    import ray

    chunks = cdc_chunks_ds(
        docs, id_col=id_col, text_col=text_col,
        min_size=min_size, avg_size=avg_size, max_size=max_size,
    )
    mat = chunks.materialize()  # reused by both passes

    def hash_doc_pairs(batch: pa.Table) -> pa.Table:
        # distinct (hash, doc) per batch, cuts within-doc repeats early
        t = pa.table({"h": batch["chunk_hash"], "d": batch["doc_id"]})
        return t.group_by(["h", "d"]).aggregate([])

    dup = (
        mat.map_batches(hash_doc_pairs, batch_format="pyarrow")
        .groupby("h")
        .count()
        .map_batches(
            lambda b: b.filter(pc.greater(b["count()"], 1)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    if len(dup) > broadcast_budget:
        raise ValueError(
            f"cdc_dedup_stats_ds: {len(dup)} duplicated chunk hashes "
            f"exceed broadcast_budget={broadcast_budget}; raise the "
            "budget or co-partition chunks and stats by hash buckets"
        )
    dup_sorted = np.sort(dup["h"].to_numpy(np.int64))
    dref = ray.put(dup_sorted)

    def rollup(batch: pa.Table) -> pa.Table:
        ds_ = ray.get(dref)
        h = batch["chunk_hash"].to_numpy(zero_copy_only=False)
        ln = batch["chunk_len"].to_numpy(zero_copy_only=False)
        if len(ds_):
            pos = np.minimum(np.searchsorted(ds_, h), len(ds_) - 1)
            is_dup = ds_[pos] == h
        else:
            is_dup = np.zeros(len(h), bool)
        return pa.table(
            {
                id_col: batch["doc_id"],
                "n_chunks": pa.array(np.ones(len(h), np.int64)),
                "n_bytes": pa.array(ln),
                "dup_bytes": pa.array(np.where(is_dup, ln, 0)),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        mat.map_batches(rollup, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("n_chunks"), Sum("n_bytes"), Sum("dup_bytes"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        nb = batch["sum(n_bytes)"].to_numpy(zero_copy_only=False).astype(np.float64)
        db = batch["sum(dup_bytes)"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_chunks": batch["sum(n_chunks)"],
                "n_bytes": batch["sum(n_bytes)"],
                "dup_bytes": batch["sum(dup_bytes)"],
                "dup_fraction": pa.array(
                    np.where(nb > 0, db / np.maximum(nb, 1), 0.0)
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def cdc_corpus_summary(docs, **kw) -> pd.DataFrame:
    """Corpus-level CDC dedup ratio: total bytes, bytes after chunk
    dedup (each distinct chunk hash counted once), and the ratio — the
    storage-dedup headline number. One keys-only groupby."""
    chunks = cdc_chunks_ds(docs, **kw)

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"h": batch["chunk_hash"], "ln": batch["chunk_len"]}
        )

    from ray.data.aggregate import Max, Sum

    per_hash = (
        chunks.map_batches(project, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("ln"), Max("ln"))
    )
    from ray.data.aggregate import Count

    tot = per_hash.aggregate(
        Sum("sum(ln)"), Sum("max(ln)"), Count()
    )
    total_bytes = int(tot["sum(sum(ln))"] or 0)
    unique_bytes = int(tot["sum(max(ln))"] or 0)
    return pd.DataFrame(
        [
            {
                "total_bytes": total_bytes,
                "unique_chunk_bytes": unique_bytes,
                "distinct_chunks": int(tot["count()"] or 0),
                "dedup_ratio": (
                    total_bytes / unique_bytes if unique_bytes else 1.0
                ),
            }
        ]
    )
