"""Explicit key-skew diagnostics and salted two-phase aggregation.

Every wide operator in this engine (groupby, co-group dedup, bucketed
joins) assumes its key distribution is benign; at web scale it never
is — a handful of hosts own double-digit percentages of a crawl, and a
single hot key turns an all-to-all into one straggler task. This
module makes the skew story explicit and testable instead of implicit:

* ``key_skew_report`` — ONE streaming pass measures the distribution:
  per-batch pre-combined (key, n) partials ride the only shuffle
  (keys-only, O(batches × distinct-in-batch) rows), the aggregated
  table yields exact total/distinct/mean without leaving the cluster,
  and the exact global top-k hot keys come from the engine's shared
  local-top nomination kernel (O(blocks·k) driver pull). The report
  recommends a per-key salt factor ``ceil(n / target_rows_per_task)``
  — the number of subtasks a hot key must split into so no task
  exceeds the target.

* ``salt_hot_keys`` — appends an int32 salt-bucket column: rows of a
  hot key get ``stable_bucket(id) % salt`` (deterministic in a
  caller-named id column — retries and layout changes land every row
  in the same bucket; no RNG), cold rows get 0. The hot set is
  broadcast once via ``ray.put``; the per-batch cost is one
  vectorized ``is_in`` probe. A SEPARATE bucket column (grouped as
  ``[key, bucket]``) rather than a string-encoded composite key is
  deliberate: arbitrary keys make any in-band encoding non-injective
  (a cold key could equal a hot key's salted spelling), while a
  second column cannot collide.

* ``grouped_sum_salted`` — the two-phase aggregation the salt exists
  for: phase 1 groups by (key, bucket) — a hot key's rows now spread
  over ``salt`` groups, bounding every task — and phase 2 drops the
  bucket and re-aggregates the O(distinct + hot·salt) phase-1 table.
  Associative aggregates only (sum here); parity with the direct
  one-shuffle groupby is pinned in pytest against DuckDB.

Scale shape: nothing here ships corpus payloads — the report shuffles
pre-combined counters, salting is a shuffle-free map, and the second
aggregation pass runs over an already-aggregated table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

_MAX_SALT = 100_000


def _key_counts_ds(ds, key_col: str):
    """(key, n) aggregated counts: per-batch value_counts partials,
    one keys-only groupby sum."""

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = pc.value_counts(col)
        return pa.table(
            {key_col: vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .aggregate(Sum("n", alias_name="n"))
    )


def key_skew_report(
    ds,
    key_col: str,
    *,
    top_k: int = 20,
    target_rows_per_task: int = 1_000_000,
):
    """Measure key skew in one streaming pass.

    Returns a dict with exact ``total_rows``, ``distinct_keys``,
    ``mean_rows_per_key``, ``max_share`` (top-1 key's row fraction),
    ``skew_ratio`` (top-1 count / mean), and ``top`` — a pandas frame
    of the ``top_k`` hottest keys with columns (key, n, share, salt)
    where ``salt`` is the recommended split factor (1 = no salting
    needed). Deterministic and layout-invariant; the corpus never
    shuffles (only pre-combined counters do)."""
    from .textops import _exact_top

    counts = _key_counts_ds(ds, key_col).materialize()
    total = counts.sum("n") or 0
    distinct = counts.count()
    top = _exact_top(counts, key_col, "n", top_k).reset_index(drop=True)
    if total == 0:
        top["share"] = pd.Series(dtype="float64")
        top["salt"] = pd.Series(dtype="int64")
        return {
            "total_rows": 0,
            "distinct_keys": 0,
            "mean_rows_per_key": 0.0,
            "max_share": 0.0,
            "skew_ratio": 0.0,
            "top": top,
        }
    mean = total / distinct
    top["share"] = top["n"] / total
    top["salt"] = (
        np.minimum(np.ceil(top["n"] / target_rows_per_task), _MAX_SALT)
        .astype(np.int64)
        .clip(1)
    )
    top1 = int(top["n"].iloc[0]) if len(top) else 0
    return {
        "total_rows": int(total),
        "distinct_keys": int(distinct),
        "mean_rows_per_key": float(mean),
        "max_share": float(top1 / total),
        "skew_ratio": float(top1 / mean),
        "top": top,
    }


def salt_hot_keys(
    ds, key_col: str, id_col: str, hot_keys, salt: int, out_col: str = "salt_bucket"
):
    """Append int32 ``out_col``: ``stable_bucket(id) % salt`` for rows
    whose key is in ``hot_keys``, 0 for everything else. Deterministic
    in the id column; the hot set is broadcast once via ``ray.put``."""
    import ray

    from ..functions.scalar import stable_bucket

    if not 1 <= salt <= _MAX_SALT:
        raise ValueError(f"salt must be in [1, {_MAX_SALT}], got {salt}")
    hot_ref = ray.put(pa.array(sorted({str(k) for k in hot_keys}), pa.string()))

    def add(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        is_hot = pc.is_in(keys.cast(pa.string()), value_set=ray.get(hot_ref))
        hot_mask = is_hot.to_numpy(zero_copy_only=False)
        if hot_mask.any():
            buckets = stable_bucket(batch[id_col], salt).astype(np.int32)
            out = np.where(hot_mask, buckets, np.int32(0))
        else:
            out = np.zeros(batch.num_rows, np.int32)
        return batch.append_column(out_col, pa.array(out, pa.int32()))

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def grouped_sum_salted(
    ds,
    key_col: str,
    value_col: str,
    *,
    id_col: str,
    hot_keys,
    salt: int,
    out_col: str | None = None,
):
    """Two-phase grouped sum with hot-key salting: phase 1 sums per
    (key, salt-bucket) — no task ever co-locates a whole hot key —
    and phase 2 drops the bucket and re-sums the already-aggregated
    table. Returns a Dataset with columns (key_col, out_col); exactly
    equal to the direct one-shuffle groupby sum (sum is associative
    and int sums are order-free; float callers accept the usual
    reassociation jitter, same as any distributed sum)."""
    out_col = out_col or f"sum_{value_col}"
    salted = salt_hot_keys(ds, key_col, id_col, hot_keys, salt)
    phase1 = (
        salted.select_columns([key_col, "salt_bucket", value_col])
        .groupby([key_col, "salt_bucket"])
        .aggregate(Sum(value_col, alias_name=out_col))
    )
    return (
        phase1.select_columns([key_col, out_col])
        .groupby(key_col)
        .aggregate(Sum(out_col, alias_name=out_col))
    )
