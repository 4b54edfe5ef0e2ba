"""The driver's correctness gate, replicated in pytest: every
oracle_sql() entry must match its queries() result at sf0.001
(row count + columns + order-insensitive values).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest


def _to_pandas(obj):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def entrymod():
    import __ray_entry__

    return __ray_entry__


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _oracle_names():
    import __ray_entry__

    return sorted(__ray_entry__.oracle_sql())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(name, entrymod, con, sf_dir, ray_session):
    res = _normalize(_to_pandas(entrymod.queries()[name](sf_dir)))
    exp = _normalize(con.execute(entrymod.oracle_sql()[name]).fetchdf())
    assert list(res.columns) == list(exp.columns)
    assert len(res) == len(exp)
    for c in res.columns:
        a, b = res[c], exp[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            assert np.isclose(a.astype(float), b.astype(float), rtol=1e-9, atol=1e-9).all(), c
        else:
            assert (a.astype(str) == b.astype(str)).all(), c


def test_every_query_runs(entrymod, sf_dir, ray_session):
    """Rows-only smoke for queries without an oracle."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name, fn in qs.items():
        if name in oracles:
            continue
        df = _to_pandas(fn(sf_dir))
        assert df is not None and len(df) >= 0, name


def test_entry_smoke(ray_session, entrymod):
    ds = entrymod.entry()
    df = _to_pandas(ds)
    assert len(df) > 0
    assert "extracted_text" in df.columns


def test_approx_distinct_close_to_exact(entrymod, sf_dir, ray_session, con):
    df = entrymod.queries()["approx_distinct"](sf_dir)
    exact = {
        "documents.text": con.execute("SELECT count(DISTINCT text) FROM documents").fetchone()[0],
        "events.user_id": con.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0],
        "orders.o_custkey": con.execute("SELECT count(DISTINCT o_custkey) FROM orders").fetchone()[0],
    }
    for _, row in df.iterrows():
        true = exact[row["table_col"]]
        assert abs(row["approx_distinct"] - true) / max(true, 1) < 0.05, row["table_col"]
