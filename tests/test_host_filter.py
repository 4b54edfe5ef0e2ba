"""Domain-level quality filter: per-host flag-fraction conviction with
a min-docs floor, DuckDB parity on the stats rollup, small-host
immunity, audit mode, and layout invariance."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(df, parts=None):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    return ds.repartition(parts) if parts else ds


def _frame():
    rows = []
    # spam.com: 20 docs, 15 flagged (0.75) -> convicted
    rows += [(f"https://spam.com/p{i}", i < 15) for i in range(20)]
    # good.com: 30 docs, 3 flagged (0.1) -> kept
    rows += [(f"https://good.com/p{i}", i < 3) for i in range(30)]
    # tiny.com: 3 docs, all flagged -> below min_docs, immune
    rows += [(f"https://tiny.com/p{i}", True) for i in range(3)]
    # edge.com: 10 docs, exactly 5 flagged (0.5) -> NOT > 0.5, kept
    rows += [(f"https://edge.com/p{i}", i < 5) for i in range(10)]
    df = pd.DataFrame(rows, columns=["url", "low_quality"])
    df["doc_id"] = np.arange(len(df), dtype=np.int64)
    return df


def test_host_filter_semantics(ray_session):
    from textextract_ray.pipelines.textops import host_flag_filter_ds

    df = _frame()
    kept = (
        host_flag_filter_ds(
            _ds(df, 4), flag_col="low_quality", min_docs=10, max_flag_frac=0.5
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    hosts = kept["url"].str.extract(r"https://([^/]+)/")[0].unique().tolist()
    assert sorted(hosts) == ["edge.com", "good.com", "tiny.com"]
    assert len(kept) == len(df) - 20  # all spam.com docs dropped
    assert list(kept.columns) == ["url", "low_quality", "doc_id"]


def test_host_filter_audit_duckdb_parity(ray_session):
    from textextract_ray.pipelines.textops import host_flag_filter_ds

    df = _frame()
    stats = (
        host_flag_filter_ds(
            _ds(df, 7), flag_col="low_quality", min_docs=10,
            max_flag_frac=0.5, audit=True,
        )
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host, "
        "count(*) AS n_docs, sum(CASE WHEN low_quality THEN 1 ELSE 0 END) "
        "AS n_flagged FROM df GROUP BY 1 ORDER BY 1"
    ).df()
    assert stats["host"].tolist() == want["host"].tolist()
    assert stats["n_docs"].tolist() == want["n_docs"].astype(int).tolist()
    assert stats["n_flagged"].tolist() == want["n_flagged"].astype(int).tolist()
    assert stats.set_index("host")["host_bad"].to_dict() == {
        "edge.com": False, "good.com": False, "spam.com": True, "tiny.com": False,
    }


def test_host_filter_layout_invariance(ray_session):
    from textextract_ray.pipelines.textops import host_flag_filter_ds

    df = _frame()
    a = (
        host_flag_filter_ds(_ds(df, 2), flag_col="low_quality")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        host_flag_filter_ds(_ds(df, 13), flag_col="low_quality")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
