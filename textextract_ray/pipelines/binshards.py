"""Indexed binary token shards — the training-loader handoff format.

A tokenized corpus leaves the engine as parquet ``(doc_id, ids
list<int32>)`` rows, but pretraining data loaders consume *memory-
mappable flat token streams*: one ``.bin`` of concatenated token ids
per shard plus a tiny ``.idx`` of document offsets, the layout
popularized by fairseq/Megatron-LM's "indexed dataset" (public format
family; this module defines its own minimal framing, it does not
implement theirs byte-for-byte). The loader then reads token windows
by offset arithmetic — no parquet decode, no per-doc object overhead.

Ray-Data shape (two bounded steps, mirroring the clustered-write
pattern in ``storage.py``):

1. ``write_token_shards`` tags each doc's shard with ONE vectorized
   map (hash-strided or contiguous by an order column — zero shuffle),
   hive-writes ``_shard=N/`` parquet, then fans out ONE Ray task per
   shard that streams the shard's fragments, sorts by the order key,
   and emits ``shard-N.bin`` + ``shard-N.idx`` with the engine's
   tmp+fsync+rename commit (reference src/updater.py:548,667-679) and
   a crc32 recorded in ``_binshards.json``.  The per-task sort bounds
   memory at one shard's tokens — the caller sizes ``num_shards`` so a
   shard fits a worker heap, exactly the contract the bin-packers
   document for their buckets.  At 100 TB: shards convert in parallel
   across the cluster, each task touches only its own directory, and a
   resumed conversion skips shards whose committed pair already
   verifies.

2. ``read_token_shards`` turns the layout back into a Dataset —
   shard names become read tasks via ``from_items → map_batches`` so
   decoding streams one shard per task; ``load_shard`` is the plain
   single-process loader a trainer rank would use (np.memmap over the
   .bin, offsets from the .idx).

Determinism: within a shard, docs are ordered by ``order_col``
(ties by doc id), so the byte output is a pure function of the row
multiset — pinned by the layout-invariance test.

``dtype='uint16'`` halves the bytes when the vocab fits (< 65536), the
standard trick for sub-50k-vocab corpora; values are range-checked at
write time so truncation can never be silent.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

_MAGIC = b"TXRIDX01"
_DTYPES = {"uint16": 1, "int32": 2, "int64": 3}
_CODES = {v: k for k, v in _DTYPES.items()}
_META = "_binshards.json"


def _idx_bytes(doc_ids: np.ndarray, lengths: np.ndarray, dtype: str) -> bytes:
    n = len(doc_ids)
    head = _MAGIC + np.array([_DTYPES[dtype], n], dtype="<i8").tobytes()
    offsets = np.concatenate(([0], np.cumsum(lengths, dtype=np.int64)))
    return (
        head
        + doc_ids.astype("<i8").tobytes()
        + offsets.astype("<i8").tobytes()
    )


def _parse_idx(raw: bytes):
    if raw[:8] != _MAGIC:
        raise ValueError("not a TXRIDX01 index file")
    code, n = np.frombuffer(raw, dtype="<i8", count=2, offset=8)
    dtype = _CODES[int(code)]
    doc_ids = np.frombuffer(raw, dtype="<i8", count=int(n), offset=24)
    offsets = np.frombuffer(
        raw, dtype="<i8", count=int(n) + 1, offset=24 + 8 * int(n)
    )
    return dtype, doc_ids, offsets


@ray.remote(num_cpus=1)
def _convert_shard(
    shard_dir: str, out_bin: str, out_idx: str, order_col: str,
    id_col: str, ids_col: str, dtype: str,
) -> dict:
    """One shard: parquet fragments -> sorted flat token stream ->
    committed .bin/.idx pair. Holds one shard's tokens, never the
    corpus."""
    frags = sorted(
        os.path.join(shard_dir, f)
        for f in os.listdir(shard_dir)
        if f.endswith(".parquet")
    )
    cols = list(dict.fromkeys([order_col, id_col, ids_col]))
    tables = [pq.read_table(f, columns=cols) for f in frags]
    t = pa.concat_tables(tables).combine_chunks()
    order = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    perm = np.lexsort((ids, order))
    lists = t[ids_col]
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    taken = lists.take(pa.array(perm, pa.int64()))
    import pyarrow.compute as pc

    lengths = pc.list_value_length(taken).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = taken.flatten().to_numpy(zero_copy_only=False)
    if dtype == "uint16" and len(flat) and (flat.min() < 0 or flat.max() > 65535):
        raise ValueError(
            "write_token_shards: token id outside uint16 range — "
            "use dtype='int32'"
        )
    flat = flat.astype(np.dtype(dtype).newbyteorder("<"))
    payload = flat.tobytes()
    for path, blob in (
        (out_bin, payload),
        (out_idx, _idx_bytes(ids[perm], lengths, dtype)),
    ):
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(blob)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)
    return {
        "bin": os.path.basename(out_bin),
        "idx": os.path.basename(out_idx),
        "n_docs": int(len(lengths)),
        "n_tokens": int(lengths.sum()),
        "crc32": zlib.crc32(payload) & 0xFFFFFFFF,
    }


def write_token_shards(
    ds,
    out_dir: str,
    *,
    num_shards: int = 8,
    id_col: str = "doc_id",
    ids_col: str = "ids",
    order_col: str = None,
    dtype: str = "int32",
) -> pd.DataFrame:
    """Write ``ds`` (``id_col`` int64, ``ids_col`` list of token ids)
    as ``num_shards`` indexed binary shards under ``out_dir``.

    Shard assignment: ``order_col // ceil(n/num_shards)`` when an
    order column is given (contiguous curriculum ranges — shard 0 is
    the first slice of the training order), else strided by the id
    (``id % num_shards``, balanced for dense ids). Either way it is a
    pure per-batch map — the only data movement is the hive write
    itself. Returns the manifest (one row per shard)."""
    if dtype not in _DTYPES:
        raise ValueError(f"dtype must be one of {sorted(_DTYPES)}")
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    key = order_col or id_col
    if order_col is not None:
        from ray.data.aggregate import Max, Min

        bounds = ds.aggregate(Min(order_col), Max(order_col))
        lo = int(bounds[f"min({order_col})"])
        span = int(bounds[f"max({order_col})"]) - lo + 1
        width = (span + num_shards - 1) // num_shards

        def assign(batch: pa.Table) -> pa.Table:
            o = batch[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.append_column(
                "_shard", pa.array((o - lo) // width, pa.int32())
            )

    else:

        def assign(batch: pa.Table) -> pa.Table:
            i = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.append_column(
                "_shard", pa.array(i % num_shards, pa.int32())
            )

    stage = str(out_dir) + "._stage"
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        stage, partition_cols=["_shard"]
    )
    os.makedirs(out_dir, exist_ok=True)
    futs = []
    for d in sorted(os.listdir(stage)):
        if not d.startswith("_shard="):
            continue
        n = int(d.split("=", 1)[1])
        futs.append(
            _convert_shard.remote(
                os.path.join(stage, d),
                os.path.join(out_dir, f"shard-{n:05d}.bin"),
                os.path.join(out_dir, f"shard-{n:05d}.idx"),
                key,
                id_col,
                ids_col,
                dtype,
            )
        )
    rows = ray.get(futs)
    manifest = {"dtype": dtype, "id_col": id_col, "shards": rows}
    tmp = os.path.join(out_dir, _META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, os.path.join(out_dir, _META))
    import shutil

    shutil.rmtree(stage)
    return pd.DataFrame(rows)


def load_shard(out_dir: str, shard: str, *, verify: bool = False):
    """Single-process loader (what a trainer rank runs): returns
    (doc_ids int64[n], offsets int64[n+1], tokens memmap). ``verify``
    re-checksums the .bin against the manifest."""
    with open(os.path.join(out_dir, _META)) as fh:
        m = json.load(fh)
    row = next(r for r in m["shards"] if r["bin"] == shard or r["idx"] == shard)
    with open(os.path.join(out_dir, row["idx"]), "rb") as fh:
        dtype, doc_ids, offsets = _parse_idx(fh.read())
    tokens = np.memmap(
        os.path.join(out_dir, row["bin"]),
        dtype=np.dtype(dtype).newbyteorder("<"),
        mode="r",
    )
    if verify:
        crc = zlib.crc32(tokens.tobytes()) & 0xFFFFFFFF
        if crc != row["crc32"]:
            raise ValueError(f"checksum mismatch for {row['bin']}")
    if offsets[-1] != len(tokens):
        raise ValueError(
            f"{row['idx']}: offsets end at {offsets[-1]} but .bin holds "
            f"{len(tokens)} tokens"
        )
    return doc_ids, offsets, tokens


def read_token_shards(out_dir: str):
    """Layout -> Dataset of (doc_id, ids list<int32>, n_tokens): one
    decode task per shard (``from_items`` of shard names fanned through
    ``map_batches(batch_size=1)``), so a huge layout streams shard by
    shard instead of loading anywhere whole."""
    import ray.data as rd

    with open(os.path.join(out_dir, _META)) as fh:
        m = json.load(fh)
    names = [r["bin"] for r in m["shards"]]

    val_np = np.int64 if m["dtype"] == "int64" else np.int32
    val_pa = pa.int64() if m["dtype"] == "int64" else pa.int32()

    def decode(batch: pa.Table) -> pa.Table:
        out = []
        for name in batch["shard"].to_pylist():
            doc_ids, offsets, tokens = load_shard(out_dir, name)
            out.append(
                pa.table(
                    {
                        m["id_col"]: pa.array(doc_ids, pa.int64()),
                        "ids": pa.LargeListArray.from_arrays(
                            offsets,
                            pa.array(
                                np.ascontiguousarray(tokens).astype(val_np),
                                val_pa,
                            ),
                        ),
                        "n_tokens": pa.array(
                            np.diff(offsets), pa.int64()
                        ),
                    }
                )
            )
        return pa.concat_tables(out)

    return rd.from_items([{"shard": n} for n in names]).map_batches(
        decode, batch_format="pyarrow", batch_size=1
    )
