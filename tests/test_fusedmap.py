"""map_parquet_fused: row-group-granular fused parquet map — output
parity with the classic read→map path, task granularity == row groups,
column pruning, min_tasks fallback, empty-slice edge."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_corpus(path, n=1000, row_group_size=100):
    rng = np.random.default_rng(11)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(
                [" ".join(["w%d" % x for x in rng.integers(0, 50, 12)]) for _ in range(n)]
            ),
            "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(n)]),
            "payload": pa.array([bytes(16)] * n, pa.binary()),
        }
    )
    pq.write_table(t, path, row_group_size=row_group_size)
    return t


def _make_count_fn():
    # defined in a factory so cloudpickle ships the closure BY VALUE —
    # a module-level test function would ship by reference and crash
    # workers that can't import the test module
    def count_fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pc.list_value_length(
                    pc.split_pattern_regex(batch["text"], r"\s+")
                ).cast(pa.int64()),
            }
        )

    return count_fn


def test_fused_map_parity_and_granularity(ray_session, tmp_path):
    import ray.data as rd

    from textextract_ray.sources import map_parquet_fused

    p = str(tmp_path / "docs.parquet")
    _write_corpus(p)
    assert pq.ParquetFile(p).metadata.num_row_groups == 10

    fused = (
        map_parquet_fused(p, _make_count_fn(), columns=["doc_id", "text"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    classic = (
        rd.read_parquet(p, columns=["doc_id", "text"])
        .map_batches(_make_count_fn(), batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fused, classic)


def test_fused_map_min_tasks_fallback(ray_session, tmp_path):
    """A layout with fewer row groups than min_tasks takes the classic
    path (identical answer) instead of serializing to one task."""
    from textextract_ray.sources import map_parquet_fused

    p = str(tmp_path / "one_group.parquet")
    _write_corpus(p, n=200, row_group_size=200)
    assert pq.ParquetFile(p).metadata.num_row_groups == 1

    out = map_parquet_fused(
        p, _make_count_fn(), columns=["doc_id", "text"], min_tasks=8
    ).to_pandas()
    assert len(out) == 200
    assert set(out.columns) == {"doc_id", "n_tokens"}


def test_fused_map_contracts(ray_session, tmp_path):
    import pytest

    from textextract_ray.sources import map_parquet_fused

    with pytest.raises(ValueError, match="no parquet shards"):
        map_parquet_fused(str(tmp_path), _make_count_fn())
    with pytest.raises(ValueError, match="plain local paths"):
        map_parquet_fused(["s3://bucket/x.parquet"], _make_count_fn())
