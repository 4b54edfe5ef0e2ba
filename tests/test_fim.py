"""Fill-in-the-middle transform: reconstruction invariant (P+M+S is a
permutation layout of the original), deterministic hash selection,
rate behavior, short-doc bypass, layout invariance, seed independence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from textextract_ray.pipelines.textops import (
    FIM_MIDDLE,
    FIM_PREFIX,
    FIM_SUFFIX,
)


def _docs(n=80) -> pd.DataFrame:
    rows = []
    for i in range(n):
        rows.append((i, f"def fn_{i}(x):\n    return x * {i} + {i * 7} # unicode é{i}"))
    rows.append((n, "tiny"))  # below min_chars: always passes through
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _run(df, repartition=None, **kw) -> pd.DataFrame:
    import ray.data as rd

    from textextract_ray.pipelines.textops import fim_transform_ds

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    if repartition:
        ds = ds.repartition(repartition)
    out = fim_transform_ds(ds, **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _reconstruct(t: str) -> str:
    assert t.startswith(FIM_PREFIX)
    rest = t[len(FIM_PREFIX):]
    p, rest = rest.split(FIM_SUFFIX, 1)
    s, m = rest.split(FIM_MIDDLE, 1)
    return p + m + s


def test_fim_reconstruction_and_rate(ray_session):
    df = _docs()
    got = _run(df, rate=0.5)
    orig = df.set_index("doc_id")["text"]
    n_applied = 0
    for _, r in got.iterrows():
        if r["fim_applied"]:
            n_applied += 1
            assert _reconstruct(r["text"]) == orig[r["doc_id"]]
            assert len(r["text"].split(FIM_SUFFIX, 1)[1].split(FIM_MIDDLE, 1)[1]) > 0
        else:
            assert r["text"] == orig[r["doc_id"]]
    assert 20 <= n_applied <= 60  # ~50% of 80 eligible docs
    assert not got.loc[got["doc_id"] == 80, "fim_applied"].iloc[0]  # tiny doc


def test_fim_deterministic_and_layout_invariant(ray_session):
    df = _docs()
    a = _run(df, rate=0.4)
    b = _run(df.sample(frac=1.0, random_state=7).reset_index(drop=True),
             repartition=5, rate=0.4)
    pd.testing.assert_frame_equal(a, b)


def test_fim_rate_bounds_and_seed_independence(ray_session):
    df = _docs()
    none = _run(df, rate=0.0)
    assert not none["fim_applied"].any()
    assert (none["text"] == df.sort_values("doc_id")["text"].values).all()
    all_ = _run(df, rate=1.0)
    assert all_["fim_applied"].sum() == 80  # all but the tiny doc
    s1 = _run(df, rate=0.5, seed=1)["fim_applied"].to_numpy()
    s2 = _run(df, rate=0.5, seed=2)["fim_applied"].to_numpy()
    assert (s1 != s2).any()  # different epochs select differently
