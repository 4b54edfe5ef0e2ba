"""Training-output sharding: dense id renumbering + data-parallel
shard assignment.

The packers deliberately emit GLOBALLY-UNIQUE-BUT-SPARSE ids
(``pack_bins``' ``bin_id = bucket << 32 | local_bin``) because dense
numbering needs global coordination; their docstrings promise "a
consumer needing dense ids renumbers with the same two-pass
bucket-offset pattern pack_sequences uses". This module IS that
consumer pattern, as a public operator:

* ``dense_rank_ds`` — add ``out_col`` = the 0-based dense rank of
  ``key_col`` in global sorted-key order (SQL ``dense_rank() - 1``).
  Two passes, both range-bucketed by the key so rank order is
  preserved: pass A ships a keys-only (bucket, key) projection into
  one groupby and counts DISTINCT keys per bucket (O(num_buckets)
  rows to the driver → exclusive offsets); pass B co-locates full
  rows per bucket and assigns ``offset + local_dense_rank`` with one
  vectorized ``np.unique(..., return_inverse)``. No global sort; the
  deliberate all-to-alls carry the key projection and the row table
  once each.

* ``assign_shards_ds`` — deterministic data-parallel assignment:
  ``shard = id % world_size`` (strided round-robin over dense ids —
  every shard gets within ±1 of the same id count, and consecutive
  ids land on different readers, the standard interleave). A pure
  per-batch map, ZERO shuffle; compose after ``dense_rank_ds`` when
  ids are sparse.

Together: ``pack_bins_ds → dense_rank_ds(bin_id) →
assign_shards_ds(world_size)`` turns a packed corpus into
``world_size`` balanced reader streams — write with
``partition_cols=["shard"]`` and each trainer rank reads exactly its
directory (the same hive-pruning economics as the clustered-write
operator).

Reference parity: none (the reference has no training consumer);
training-data-pipeline brief operator. The two-pass offset pattern
cites ``pack_sequences_ds`` (pipelines/textops.py) as the template.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _range_bucket_bounds(ds, key_col: str, num_buckets: int):
    """(lo, width, nb) for a contiguous range cut of int64 keys —
    ceil-width division (never multiply: snowflake-scale ids cannot
    overflow). None on an empty dataset."""
    from ray.data.aggregate import Max, Min

    bounds = ds.select_columns([key_col]).aggregate(Min(key_col), Max(key_col))
    if not bounds or bounds.get(f"min({key_col})") is None:
        return None
    lo, hi = int(bounds[f"min({key_col})"]), int(bounds[f"max({key_col})"])
    span = hi - lo + 1
    nb = min(num_buckets, span)
    width = (span + nb - 1) // nb
    return lo, width, nb


def dense_rank_ds(ds, key_col: str, *, out_col: str = "dense_id",
                  num_buckets: int = 64):
    """Append ``out_col`` = 0-based dense rank of ``key_col`` over the
    whole dataset (equal keys share a rank; ranks are contiguous in
    sorted-key order). Keys must be integer-typed; the result stays a
    Dataset. Layout-independent: rank is a pure function of the global
    key multiset."""
    import ray

    cut = _range_bucket_bounds(ds, key_col, num_buckets)
    if cut is None:
        return ds.map_batches(
            lambda b: b.append_column(out_col, pa.array([], pa.int64())),
            batch_format="pyarrow",
        )
    lo, width, _nb = cut

    def key_partials(batch: pa.Table) -> pa.Table:
        keys = np.unique(
            batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table({"_k": pa.array(keys, pa.int64())})

    # pass A: distinct keys per bucket (batch-level pre-dedup, then the
    # keys-only groupby dedups across batches), O(num_buckets) to driver
    per_bucket = (
        ds.map_batches(key_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_k")
        .count()
        .map_batches(
            lambda b: pa.table(
                {
                    "_bucket": pa.array(
                        (
                            b["_k"].to_numpy(zero_copy_only=False).astype(np.int64)
                            - lo
                        )
                        // width,
                        pa.int32(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("_bucket")
        .count()
        .to_pandas()
        .sort_values("_bucket")
    )
    counts = per_bucket["count()"].to_numpy(np.int64)
    buckets = per_bucket["_bucket"].to_numpy(np.int64)
    offsets = dict(
        zip(buckets, np.cumsum(counts) - counts)  # exclusive prefix
    )
    oref = ray.put(offsets)

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "_bucket", pa.array((k - lo) // width, pa.int32())
        )

    def rank_bucket(tbl: pa.Table) -> pa.Table:
        offs = ray.get(oref)
        k = tbl[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        base = offs[int((k[0] - lo) // width)]
        _, inv = np.unique(k, return_inverse=True)
        out = tbl.drop_columns(["_bucket"]).append_column(
            out_col, pa.array(base + inv.astype(np.int64), pa.int64())
        )
        return out

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(rank_bucket, batch_format="pyarrow")
    )


def assign_shards_ds(ds, world_size: int, *, id_col: str = "dense_id",
                     out_col: str = "shard"):
    """Append ``out_col`` = ``id_col % world_size`` — the strided
    data-parallel reader assignment (dense ids ⇒ every shard holds
    within ±1 of the same id count). ZERO shuffle; write the result
    with ``partition_cols=[out_col]`` so each trainer rank reads only
    its directory."""
    if world_size < 1:
        raise ValueError(f"world_size must be >= 1, got {world_size}")

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            out_col, pa.array(ids % world_size, pa.int32())
        )

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)
