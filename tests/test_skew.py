"""Skew diagnostics + salted two-phase aggregation: exact report
fields vs pandas, DuckDB parity for the salted sum, determinism and
layout invariance, and the actual skew-bounding property (a hot key's
rows really spread across salt buckets)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _skewed_df(n_hot=5000, n_cold_keys=50, rows_per_cold=20, seed=7):
    rng = np.random.default_rng(seed)
    keys = ["hot.example.com"] * n_hot + [
        f"cold{i % n_cold_keys}.example.com" for i in range(n_cold_keys * rows_per_cold)
    ]
    n = len(keys)
    return pd.DataFrame(
        {
            "host": keys,
            "row_id": np.arange(n, dtype=np.int64),
            "value": rng.integers(0, 100, n).astype(np.int64),
        }
    )


def _ds(df, parts=1):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    return ds.repartition(parts) if parts > 1 else ds


def test_key_skew_report_exact(ray_session):
    from textextract_ray.pipelines.skew import key_skew_report

    df = _skewed_df()
    rep = key_skew_report(_ds(df, 7), "host", top_k=5, target_rows_per_task=1000)
    assert rep["total_rows"] == len(df)
    assert rep["distinct_keys"] == df["host"].nunique()
    assert rep["top"]["host"].iloc[0] == "hot.example.com"
    assert rep["top"]["n"].iloc[0] == 5000
    assert rep["max_share"] == pytest.approx(5000 / len(df))
    assert rep["skew_ratio"] == pytest.approx(5000 / (len(df) / df["host"].nunique()))
    # 5000 rows at 1000/task -> salt 5; cold keys need no salt
    assert rep["top"]["salt"].iloc[0] == 5
    assert (rep["top"]["salt"].iloc[1:] == 1).all()
    # layout invariance
    rep2 = key_skew_report(_ds(df, 1), "host", top_k=5, target_rows_per_task=1000)
    pd.testing.assert_frame_equal(rep["top"], rep2["top"])
    assert rep == {**rep2, "top": rep["top"]} or rep["total_rows"] == rep2["total_rows"]


def test_key_skew_report_empty(ray_session):
    from textextract_ray.pipelines.skew import key_skew_report

    rep = key_skew_report(_ds(_skewed_df().iloc[:0]), "host")
    assert rep["total_rows"] == 0 and rep["distinct_keys"] == 0
    assert len(rep["top"]) == 0


def test_salt_hot_keys_spreads_and_is_deterministic(ray_session):
    from textextract_ray.pipelines.skew import salt_hot_keys

    df = _skewed_df()
    out = (
        salt_hot_keys(_ds(df, 5), "host", "row_id", ["hot.example.com"], salt=8)
        .to_pandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    hot = out[out["host"] == "hot.example.com"]
    cold = out[out["host"] != "hot.example.com"]
    # cold rows untouched; hot rows actually spread over the buckets
    assert (cold["salt_bucket"] == 0).all()
    assert hot["salt_bucket"].nunique() == 8
    # roughly balanced: no bucket owns more than 2x its fair share
    assert hot["salt_bucket"].value_counts().max() <= 2 * 5000 / 8
    # deterministic under a different layout
    out2 = (
        salt_hot_keys(_ds(df, 1), "host", "row_id", ["hot.example.com"], salt=8)
        .to_pandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_salt_bounds():
    import ray.data as rd  # noqa: F401

    from textextract_ray.pipelines.skew import salt_hot_keys

    with pytest.raises(ValueError):
        salt_hot_keys(None, "k", "i", [], salt=0)
    with pytest.raises(ValueError):
        salt_hot_keys(None, "k", "i", [], salt=1_000_000)


def test_grouped_sum_salted_duckdb_parity(ray_session):
    import duckdb

    from textextract_ray.pipelines.skew import grouped_sum_salted

    con = duckdb.connect()
    df = _skewed_df()
    got = (
        grouped_sum_salted(
            _ds(df, 6),
            "host",
            "value",
            id_col="row_id",
            hot_keys=["hot.example.com"],
            salt=8,
        )
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    con.register("skewt", df)
    want = con.execute(
        "select host, sum(value) as sum_value from skewt group by host order by host"
    ).df()
    want["sum_value"] = want["sum_value"].astype("int64")
    got["sum_value"] = got["sum_value"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_grouped_sum_salted_cold_key_shaped_like_salted_form(ray_session):
    """A cold key cannot collide with a hot key's salted spelling —
    the bucket is a separate column, not an in-band encoding."""
    from textextract_ray.pipelines.skew import grouped_sum_salted

    df = pd.DataFrame(
        {
            "host": ["x"] * 10 + ["0003|x"] * 4,
            "row_id": np.arange(14, dtype=np.int64),
            "value": np.ones(14, dtype=np.int64),
        }
    )
    got = (
        grouped_sum_salted(
            _ds(df, 3), "host", "value", id_col="row_id", hot_keys=["x"], salt=4
        )
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    assert dict(zip(got["host"], got["sum_value"])) == {"x": 10, "0003|x": 4}
