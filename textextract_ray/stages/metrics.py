"""Counters / metering aggregation (reference usage_stats analogue).

The reference upserts one (user_id, date) row per request into
usage_stats (models.py:397-425) and derives monthly/period sums and
remaining quota from it (models.py:127-308). Here the same shapes are
computed as partial-aggregate-then-merge over the extraction output:
each batch emits ONE partial counter row, so the final groupby shuffles
O(blocks) rows — never O(docs).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from ..schemas import COUNTERS_SCHEMA


def partial_counters(partition_id: int):
    """map_batches kernel: one partial counters row per batch."""

    def kernel(batch: pa.Table) -> pa.Table:
        status = batch["status"]

        def n(s: str) -> int:
            return int(pc.sum(pc.equal(status, s).cast(pa.int64())).as_py() or 0)

        row = {
            "partition_id": [partition_id],
            "docs": [batch.num_rows],
            "bytes_in": [int(pc.sum(batch["request_size_bytes"]).as_py() or 0)],
            "bytes_out": [int(pc.sum(batch["response_size_bytes"]).as_py() or 0)],
            "ok_count": [n("ok")],
            "empty_count": [n("empty")],
            "invalid_count": [n("invalid")],
            "unsupported_count": [n("unsupported")],
            "parse_failures": [n("parse_error")],
            "processing_time_ms_total": [int(pc.sum(batch["processing_time_ms"]).as_py() or 0)],
        }
        return pa.Table.from_pydict(row, schema=COUNTERS_SCHEMA)

    return kernel


def aggregate_counters(extracted_ds, partition_id: int) -> dict:
    """Counters dict for one partition (drives the manifest)."""
    partials = extracted_ds.map_batches(
        partial_counters(partition_id), batch_format="pyarrow"
    )
    aggs = [
        Sum(f.name, alias_name=f.name)
        for f in COUNTERS_SCHEMA
        if f.name != "partition_id"
    ]
    merged = partials.groupby("partition_id").aggregate(*aggs).to_pandas()
    if len(merged) == 0:
        return {f.name: 0 for f in COUNTERS_SCHEMA} | {"partition_id": partition_id}
    return {k: int(v) for k, v in merged.iloc[0].items()}


def counters_report(counters_rows: list) -> pd.DataFrame:
    """Final job report (the profile-assembly join J2 analogue,
    reference user_routes.py:11-44): per-partition counters + derived
    mean processing time and failure rate. Driver-side — the counters
    table is O(partitions), always small."""
    df = pd.DataFrame(counters_rows)
    if len(df):
        df["processing_time_ms_mean"] = df["processing_time_ms_total"] / df["docs"].clip(lower=1)
        df["failure_rate"] = df["parse_failures"] / df["docs"].clip(lower=1)
    return df.sort_values("partition_id").reset_index(drop=True) if len(df) else df
