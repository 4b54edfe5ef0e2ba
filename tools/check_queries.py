"""Local replica of the driver's correctness gate: run each queries()
entry and its oracle_sql() side by side at a given sf, compare row
count, schema (column names), and order-insensitive values.

Usage: python tools/check_queries.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(obj, rd.Dataset):
            return obj.to_pandas()
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"FAIL: unknown query names: {sorted(unknown)}")
        return 1
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = normalize(to_pandas(fn(sf_dir)))
        except Exception as exc:
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(res)} (rows-only, no oracle)")
            continue
        exp = normalize(con.execute(oracles[name]).fetchdf())
        if list(res.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(res.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(res) != len(exp):
            print(f"FAIL {name}: rows {len(res)} != {len(exp)}")
            failures += 1
            continue
        mismatch = None
        dtype_bad = None
        for c in res.columns:
            a, b = res[c], exp[c]
            # Driver parity: its value hash is dtype-sensitive (int64
            # 99111 vs float64 99111.0 hash differently even when values
            # match). Flag any kind mismatch instead of coercing it away.
            if a.dtype.kind != b.dtype.kind:
                dtype_bad = (c, a.dtype, b.dtype)
                break
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                eq = np.isclose(
                    a.astype(float), b.astype(float), rtol=1e-9, atol=1e-9,
                    equal_nan=True,
                ).all()
            else:
                eq = (a.astype(str) == b.astype(str)).all()
            if not eq:
                mismatch = c
                break
        if dtype_bad:
            c, da, db = dtype_bad
            print(f"FAIL {name}: column {c} dtype {da} != oracle dtype {db} (driver hash is dtype-sensitive)")
            failures += 1
            continue
        if mismatch:
            bad = (res[mismatch].astype(str) != exp[mismatch].astype(str)).idxmax()
            print(
                f"FAIL {name}: column {mismatch} differs, e.g. row {bad}: "
                f"{res[mismatch].iloc[bad]!r} != {exp[mismatch].iloc[bad]!r}"
            )
            failures += 1
        else:
            print(f"ok   {name}: rows={len(res)} MATCH")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
